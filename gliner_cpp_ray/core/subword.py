"""Subword tokenizers: per-word encode WITHOUT special tokens.

The reference delegates to HuggingFace ``tokenizers`` via a C++ shim and
calls ``tokenizer->Encode(word)`` once per prompt word with no special
tokens (/root/reference/src/processor.cpp:7-11,75-78).  Two
implementations:

* ``HFSubwordTokenizer`` — the real thing, gated behind an import-try on
  the ``tokenizers`` wheel (absent in this sandbox).  Same tokenizer.json
  ⇒ identical ids ⇒ numeric parity with the reference when combined with
  the same ONNX model.
* ``HashSubwordTokenizer`` — deterministic stand-in: stable CRC32-based
  ids, long words split into multiple subtokens so the ``words_mask`` /
  padding layout (first-subtoken marking, per-row SEP placement) is
  exercised exactly as with a real vocab.

Both memoize per-word results: web text repeats words heavily and the
encode loop is per-word Python.
"""

from __future__ import annotations

import zlib
from typing import Protocol


class SubwordTokenizer(Protocol):
    def encode(self, word: str) -> list[int]:
        """Subtoken ids for one word, no special tokens."""
        ...


class HashSubwordTokenizer:
    """Deterministic fake vocab. ids in [10, 10+vocab_size); CLS=1/SEP=2 free."""

    def __init__(self, vocab_size: int = 30000, max_chars_per_piece: int = 8):
        self.vocab_size = vocab_size
        self.max_chars = max_chars_per_piece
        self._memo: dict[str, list[int]] = {}

    def encode(self, word: str) -> list[int]:
        ids = self._memo.get(word)
        if ids is None:
            n = self.max_chars
            pieces = [word[i : i + n] for i in range(0, len(word), n)] or [""]
            ids = [
                10 + (zlib.crc32(p.encode("utf-8")) % self.vocab_size)
                for p in pieces
            ]
            self._memo[word] = ids
        return ids


class HFSubwordTokenizer:
    """Tokenizer loaded from a HuggingFace ``tokenizer.json``.

    Uses the ``tokenizers`` wheel when installed (byte-exact HF
    semantics); otherwise falls back to the pure-Python implementation
    in ``core/subword_json.py`` (WordPiece / BPE / Unigram per-word
    encode from the public format — the reference's A2+A3 path without
    the wheel).  Same tokenizer.json ⇒ identical ids ⇒ numeric parity
    with the reference when combined with the same ONNX model.
    """

    def __init__(self, tokenizer_json_path: str):
        self._tok = None
        try:
            from tokenizers import Tokenizer  # type: ignore

            self._tok = Tokenizer.from_file(tokenizer_json_path)
            self.backend = "tokenizers"
        except ImportError:
            import warnings

            from gliner_cpp_ray.core.subword_json import PureSubwordTokenizer

            self._pure = PureSubwordTokenizer(tokenizer_json_path)
            self.backend = "pure-python"
            # parity-sensitive runs need a signal about which encoder ran:
            # the pure path implements Precompiled charsmaps and Unigram
            # byte-fallback, but uncommon normalizers (BertNormalizer
            # cleanups) still fall back to identity (warn once per
            # process, not per actor call — Python dedupes by
            # message/module/lineno by default)
            warnings.warn(
                "tokenizers wheel not installed: falling back to the "
                "pure-Python subword encoder (inspect .backend)",
                RuntimeWarning,
                stacklevel=2,
            )
        self._memo: dict[str, list[int]] = {}

    def encode(self, word: str) -> list[int]:
        ids = self._memo.get(word)
        if ids is None:
            if self._tok is not None:  # pragma: no cover - wheel absent here
                ids = list(self._tok.encode(word, add_special_tokens=False).ids)
            else:
                ids = self._pure.encode(word)
            self._memo[word] = ids
        return ids
