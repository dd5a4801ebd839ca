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
    """Real HuggingFace tokenizer (requires the ``tokenizers`` wheel)."""

    def __init__(self, tokenizer_json_path: str):
        try:
            from tokenizers import Tokenizer  # type: ignore
        except ImportError as exc:  # pragma: no cover - wheel absent in sandbox
            raise ImportError(
                "the 'tokenizers' package is not installed; use "
                "HashSubwordTokenizer or install tokenizers for numeric parity"
            ) from exc
        self._tok = Tokenizer.from_file(tokenizer_json_path)
        self._memo: dict[str, list[int]] = {}

    def encode(self, word: str) -> list[int]:  # pragma: no cover - needs wheel
        ids = self._memo.get(word)
        if ids is None:
            ids = list(self._tok.encode(word, add_special_tokens=False).ids)
            self._memo[word] = ids
        return ids
