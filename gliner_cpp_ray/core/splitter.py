"""Word splitting with UTF-8 *byte* offsets.

Reproduces the reference ``WhitespaceTokenSplitter``
(/root/reference/src/tokenizer_utils.cpp:99-147): PCRE2 pattern
``\\w+(?:[-_]\\w+)*|\\S`` compiled with ``PCRE2_UTF | PCRE2_UCP``,
left-to-right non-overlapping matches, each token carrying half-open
``[start, end)`` **byte** offsets into the UTF-8 encoding of the text
(the Unicode golden in /root/reference/tests/test.cpp:116-148 pins byte,
not codepoint, offsets: ``"你好"`` → ``{0, 6}``).

The third-party ``regex`` module's ``\\w`` matches PCRE2's UCP ``\\w``
(including combining marks — ``नमस्ते`` stays one token), which the
stdlib ``re`` does not; verified against the reference goldens in
``tests/test_splitter.py``.
"""

from __future__ import annotations

import numpy as np
import regex

# Compiled once per process; the splitter itself is stateless beyond this.
_PATTERN = regex.compile(r"\w+(?:[-_]\w+)*|\S", regex.UNICODE)


def _codepoint_to_byte_index(text: str) -> np.ndarray:
    """Map codepoint index -> byte offset in the UTF-8 encoding.

    Vectorized: UTF-8 continuation bytes are exactly those with the top
    two bits ``10``; character start positions are the rest.
    Returns an array of length ``len(text) + 1`` (last entry = total bytes).
    """
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    is_start = (raw & 0xC0) != 0x80
    starts = np.flatnonzero(is_start)
    return np.append(starts, len(raw)).astype(np.int64)


class WordSplitter:
    """Callable word splitter: text -> (byte_starts, byte_ends, token_texts)."""

    __slots__ = ()

    def __call__(self, text: str) -> tuple[np.ndarray, np.ndarray, list[str]]:
        cps: list[int] = []
        cpe: list[int] = []
        texts: list[str] = []
        for m in _PATTERN.finditer(text):
            s, e = m.span()
            cps.append(s)
            cpe.append(e)
            texts.append(m.group())
        cp_starts = np.asarray(cps, dtype=np.int64)
        cp_ends = np.asarray(cpe, dtype=np.int64)
        if len(text) == 0 or text.isascii():
            # Fast path: byte offsets == codepoint offsets.
            return cp_starts, cp_ends, texts
        cp2b = _codepoint_to_byte_index(text)
        return cp2b[cp_starts], cp2b[cp_ends], texts
