"""SentencePiece ``Precompiled`` charsmap normalization, wheel-free.

Unigram tokenizer.json files carry a ``Precompiled`` normalizer — a
serialized character-sequence → replacement transducer (NMT/NFKC-style
mappings such as fullwidth→ASCII, ligature expansion) that SentencePiece
ships pre-built instead of as rules.  The reference applies it through
tokenizers-cpp (the HF ``tokenizers`` Rust crate → ``spm_precompiled``);
this module implements the same public formats directly so the
pure-Python encode path (``core/subword_json.py``) matches on non-ASCII
input instead of falling back to identity (the r2 documented gap).

Blob layout (public: sentencepiece ``normalizer.cc``
``DecodePrecompiledCharsMap``):

    [uint32 LE trie_size] [trie: darts-clone double array] [pool]

where the trie maps UTF-8 key bytes → uint31 value = byte offset of the
NUL-terminated replacement in ``pool``.

Double-array unit decoding (public: darts-clone ``darts.h``):

    offset(u)   = (u >> 10) << ((u & (1 << 9)) >> 6)
    has_leaf(u) = (u >> 8) & 1
    value(u)    = u & 0x7FFFFFFF          (on the unit at the leaf slot)
    label(u)    = u & (0x80000000 | 0xFF)

Normalization semantics follow the HF ``spm_precompiled`` crate (what
tokenizers-cpp runs), which — unlike sentencepiece's raw
longest-prefix ``NormalizePrefix`` — segments the input into grapheme
clusters first: a grapheme under 6 UTF-8 bytes is transduced as a
whole if the trie holds an exact entry for it; otherwise each char of
the grapheme is transduced independently (exact match, else copied).

``build_precompiled`` constructs a blob from a plain mapping — used by
the tests (no real model files in this sandbox) and by users who want
custom charsmaps without SentencePiece installed.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np
import regex

_GRAPHEME = regex.compile(r"\X")


class Precompiled:
    """Parsed precompiled charsmap: darts trie + replacement pool."""

    def __init__(self, blob: bytes):
        if len(blob) < 4:
            raise ValueError("precompiled charsmap blob too short")
        (trie_size,) = struct.unpack_from("<I", blob, 0)
        if 4 + trie_size > len(blob):
            raise ValueError("precompiled charsmap trie size out of range")
        if trie_size % 4:
            raise ValueError("precompiled charsmap trie not 4-byte aligned")
        self.units = np.frombuffer(blob, dtype="<u4", count=trie_size // 4,
                                   offset=4)
        self.pool = blob[4 + trie_size:]

    # -- darts-clone traversal ------------------------------------------
    def common_prefix_search(self, key: bytes) -> list[tuple[int, int]]:
        """All (matched_byte_length, value) prefixes of ``key``."""
        units = self.units
        n = len(units)
        if n == 0:
            return []
        out: list[tuple[int, int]] = []
        unit = int(units[0])
        node_pos = (unit >> 10) << ((unit & 512) >> 6)
        for i, c in enumerate(key):
            pos = node_pos ^ c
            if pos >= n:
                break
            unit = int(units[pos])
            if unit & 0x800000FF != c:  # label mismatch (or leaf slot)
                break
            node_pos = pos ^ ((unit >> 10) << ((unit & 512) >> 6))
            if (unit >> 8) & 1 and node_pos < n:
                out.append((i + 1, int(units[node_pos]) & 0x7FFFFFFF))
        return out

    def _replacement(self, value: int) -> str:
        end = self.pool.index(b"\0", value)
        return self.pool[value:end].decode("utf-8")

    def transduce(self, chunk: str) -> str | None:
        """Replacement for ``chunk`` iff the trie holds the WHOLE chunk
        (grapheme-aligned exact lookup, per spm_precompiled)."""
        b = chunk.encode("utf-8")
        for length, value in self.common_prefix_search(b):
            if length == len(b):
                return self._replacement(value)
        return None

    def normalize(self, text: str) -> str:
        out: list[str] = []
        for g in _GRAPHEME.findall(text):
            if len(g.encode("utf-8")) < 6:
                r = self.transduce(g)
                if r is not None:
                    out.append(r)
                    continue
            for ch in g:
                r = self.transduce(ch)
                out.append(ch if r is None else r)
        return "".join(out)


@lru_cache(maxsize=8)
def precompiled_from_b64(b64: str) -> Precompiled:
    """Cached decode of tokenizer.json's base64 ``precompiled_charsmap``
    (one parse per distinct charsmap per process, not per word)."""
    import base64

    return Precompiled(base64.b64decode(b64))


# -- builder (test fixtures / custom charsmaps) --------------------------

class _Node:
    __slots__ = ("children", "value")

    def __init__(self):
        self.children: dict[int, _Node] = {}
        self.value: int | None = None


def build_precompiled(mappings: dict[str, str]) -> bytes:
    """Serialize ``{key: replacement}`` into the precompiled-charsmap
    blob format (uint32 size + darts double array + NUL-terminated
    pool).  Keys are UTF-8 byte strings; first-fit offset placement —
    compact enough for test-sized maps, format-exact for any size."""
    root = _Node()
    pool = bytearray()
    for key in sorted(mappings):
        if not key:
            raise ValueError("empty charsmap key")
        node = root
        for b in key.encode("utf-8"):
            node = node.children.setdefault(b, _Node())
        node.value = len(pool)
        pool += mappings[key].encode("utf-8") + b"\0"

    units: dict[int, int] = {0: 0}
    occupied = {0}

    def place(node: _Node, pos: int) -> None:
        labels = sorted(node.children)
        slots_for = ([0] if node.value is not None else []) + labels
        o = 1
        while True:
            if any((pos ^ o ^ c) in occupied for c in slots_for):
                o += 1
                continue
            break
        if o >= 1 << 21:
            raise ValueError("charsmap trie too large for direct offsets")
        units[pos] |= o << 10
        for c in slots_for:
            occupied.add(pos ^ o ^ c)
        if node.value is not None:
            units[pos ^ o] = 0x80000000 | node.value
        for c in labels:
            child = node.children[c]
            units[pos ^ o ^ c] = c | (0x100 if child.value is not None else 0)
        for c in labels:
            place(node.children[c], pos ^ o ^ c)

    place(root, 0)
    size = max(units) + 1
    arr = np.zeros(size, dtype="<u4")
    for pos, u in units.items():
        arr[pos] = u
    trie = arr.tobytes()
    return struct.pack("<I", len(trie)) + trie + bytes(pool)
