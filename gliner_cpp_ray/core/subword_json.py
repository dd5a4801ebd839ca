"""Pure-Python HuggingFace ``tokenizer.json`` subword encoder.

The reference loads a serialized HF tokenizer and calls
``tokenizer->Encode(word)`` once per prompt word with no special tokens
(/root/reference/src/processor.cpp:7-11,75-78 via tokenizers-cpp
``FromBlobJSON``).  The ``tokenizers`` wheel is absent in this sandbox,
so this module implements the per-word encode path of the public
tokenizer.json format directly, from the format's public documentation:

* models: **WordPiece** (BERT greedy longest-match-first with the
  ``##`` continuation prefix), **BPE** (rank-ordered merge loop, with
  optional byte-level alphabet), **Unigram** (Viterbi maximum-likelihood
  segmentation with SentencePiece's unk penalty and consecutive-unk
  fusion).
* normalizers: Lowercase / NFC / NFD / NFKC / NFKD / Replace / Prepend /
  Strip / Sequence, and SentencePiece ``Precompiled`` charsmaps via the
  darts-trie interpreter in ``core/charsmap.py`` (grapheme-segmented
  transduction, matching the HF ``spm_precompiled`` semantics the
  reference runs through tokenizers-cpp).
* pre-tokenizers (as they affect a single word): **Metaspace**
  (``▁`` replacement + prefix scheme, the DeBERTa/SentencePiece case)
  and **ByteLevel** (GPT-2 bytes-to-unicode alphabet +
  ``add_prefix_space``).  Whitespace splitting variants are no-ops for
  single-word input.

Scope: per-word ids without special tokens — exactly the slice of the
format the reference consumes.  Everything here derives from the open
tokenizer.json schema and the public BERT/GPT-2/SentencePiece
algorithms.
"""

from __future__ import annotations

import json
import unicodedata
from functools import lru_cache


@lru_cache(maxsize=1)
def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's public byte→printable-unicode table (ByteLevel alphabet)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _apply_normalizer(spec: dict | None, text: str) -> str:
    if not spec:
        return text
    t = spec.get("type")
    if t == "Sequence":
        for sub in spec.get("normalizers", []):
            text = _apply_normalizer(sub, text)
        return text
    if t == "Lowercase":
        return text.lower()
    if t in ("NFC", "NFD", "NFKC", "NFKD"):
        return unicodedata.normalize(t, text)
    if t == "Replace":
        pat = spec.get("pattern", {})
        if "String" in pat:
            return text.replace(pat["String"], spec.get("content", ""))
        if "Regex" in pat:
            import re

            return re.sub(pat["Regex"], spec.get("content", ""), text)
        return text
    if t == "Prepend":
        return spec.get("prepend", "") + text
    if t == "Strip":
        if spec.get("strip_left", True):
            text = text.lstrip()
        if spec.get("strip_right", True):
            text = text.rstrip()
        return text
    if t == "Precompiled":
        b64 = spec.get("precompiled_charsmap")
        if b64:
            from gliner_cpp_ray.core.charsmap import precompiled_from_b64

            return precompiled_from_b64(b64).normalize(text)
        return text
    # BertNormalizer cleanups etc.: identity fallback — documented limitation
    return text


def _apply_pre_tokenizer(spec: dict | None, word: str) -> str:
    """Single-word slice of the pre-tokenizer: transforms that change the
    TEXT fed to the model (Metaspace/ByteLevel); splitters are no-ops for
    one word."""
    if not spec:
        return word
    t = spec.get("type")
    if t == "Sequence":
        for sub in spec.get("pretokenizers", []):
            word = _apply_pre_tokenizer(sub, word)
        return word
    if t == "Metaspace":
        rep = spec.get("replacement", "▁")
        scheme = spec.get("prepend_scheme")
        if scheme is None:
            scheme = "always" if spec.get("add_prefix_space", True) else "never"
        word = word.replace(" ", rep)
        if scheme != "never" and not word.startswith(rep):
            word = rep + word
        return word
    if t == "ByteLevel":
        table = _bytes_to_unicode()
        if spec.get("add_prefix_space", True) and not word.startswith(" "):
            word = " " + word
        return "".join(table[b] for b in word.encode("utf-8"))
    return word


class _WordPiece:
    def __init__(self, model: dict):
        self.vocab: dict[str, int] = model["vocab"]
        self.prefix = model.get("continuing_subword_prefix", "##")
        self.unk = model.get("unk_token", "[UNK]")
        self.max_chars = model.get("max_input_chars_per_word", 100)

    def encode(self, word: str) -> list[int]:
        if len(word) > self.max_chars:
            return [self.vocab[self.unk]]
        ids, start = [], 0
        while start < len(word):
            end, cur = len(word), None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = self.prefix + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.vocab[self.unk]]  # whole word -> UNK
            ids.append(cur)
            start = end
        return ids


class _BPE:
    def __init__(self, model: dict):
        self.vocab: dict[str, int] = model["vocab"]
        merges = model.get("merges", [])
        # tokenizer.json stores merges as "a b" strings (or [a, b] pairs)
        self.ranks: dict[tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            a, b = m.split(" ", 1) if isinstance(m, str) else (m[0], m[1])
            self.ranks[(a, b)] = i
        self.unk = model.get("unk_token")
        self.cont_prefix = model.get("continuing_subword_prefix") or ""
        self.eow_suffix = model.get("end_of_word_suffix") or ""

    def encode(self, word: str) -> list[int]:
        if not word:
            return []
        parts = list(word)
        if self.cont_prefix:
            parts = [parts[0]] + [self.cont_prefix + c for c in parts[1:]]
        if self.eow_suffix:
            parts[-1] = parts[-1] + self.eow_suffix
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        out = []
        for p in parts:
            if p in self.vocab:
                out.append(self.vocab[p])
            elif self.unk is not None:
                out.append(self.vocab[self.unk])
            # else: drop (HF BPE without unk skips unknown chars)
        return out


class _Unigram:
    _UNK_PENALTY = 10.0  # SentencePiece's public kUnkPenalty

    def __init__(self, model: dict):
        self.pieces = [(p, float(s)) for p, s in model["vocab"]]
        self.unk_id = model.get("unk_id")
        self.byte_fallback = bool(model.get("byte_fallback", False))
        self.scores = {p: s for p, s in self.pieces}
        self.ids = {p: i for i, (p, _) in enumerate(self.pieces)}
        self.max_len = max((len(p) for p, _ in self.pieces), default=1)
        min_score = min((s for _, s in self.pieces), default=0.0)
        self.unk_score = min_score - self._UNK_PENALTY

    def encode(self, word: str) -> list[int]:
        n = len(word)
        if n == 0:
            return []
        # Viterbi: best[i] = (score, start, piece_or_None) ending at i
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, str | None]] = [(0, None)] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            hi = min(n, i + self.max_len)
            for j in range(i + 1, hi + 1):
                piece = word[i:j]
                s = self.scores.get(piece)
                if s is not None and best[i] + s > best[j]:
                    best[j] = best[i] + s
                    back[j] = (i, piece)
            # single-char unk fallback
            j = i + 1
            if best[i] + self.unk_score > best[j]:
                best[j] = best[i] + self.unk_score
                back[j] = (i, None)
        segs: list[tuple[str, bool]] = []  # (text, is_unk), reversed
        i = n
        while i > 0:
            i0, piece = back[i]
            segs.append((word[i0:i] if piece is None else piece, piece is None))
            i = i0
        segs.reverse()
        out: list[int] = []
        k = 0
        while k < len(segs):
            text, is_unk = segs[k]
            if not is_unk:
                out.append(self.ids[text])
                k += 1
                continue
            # SentencePiece fuses consecutive unk chars into ONE segment;
            # with byte_fallback the fused segment becomes <0xXX> byte
            # tokens (all must exist in vocab), else a single unk id.
            j = k
            fused: list[str] = []
            while j < len(segs) and segs[j][1]:
                fused.append(segs[j][0])
                j += 1
            if self.byte_fallback:
                byte_ids = [
                    self.ids.get(f"<0x{b:02X}>")
                    for b in "".join(fused).encode("utf-8")
                ]
                if all(b is not None for b in byte_ids):
                    out.extend(byte_ids)
                    k = j
                    continue
            if self.unk_id is not None:
                out.append(self.unk_id)
            k = j
        return out


class PureSubwordTokenizer:
    """Per-word encode (no special tokens) from a ``tokenizer.json``
    file — the wheel-free implementation of the reference's A2 (file
    loader) + A3 (subword encode) operators."""

    def __init__(self, tokenizer_json_path: str):
        with open(tokenizer_json_path, encoding="utf-8") as f:
            spec = json.load(f)
        self.normalizer = spec.get("normalizer")
        self.pre_tokenizer = spec.get("pre_tokenizer")
        model = spec.get("model") or {}
        mtype = model.get("type")
        if mtype == "WordPiece":
            self.model = _WordPiece(model)
        elif mtype == "BPE":
            self.model = _BPE(model)
        elif mtype == "Unigram":
            self.model = _Unigram(model)
        else:
            raise ValueError(f"unsupported tokenizer.json model type: {mtype!r}")
        self._memo: dict[str, list[int]] = {}

    def encode(self, word: str) -> list[int]:
        ids = self._memo.get(word)
        if ids is None:
            text = _apply_normalizer(self.normalizer, word)
            text = _apply_pre_tokenizer(self.pre_tokenizer, text)
            ids = self.model.encode(text)
            self._memo[word] = ids
        return ids
