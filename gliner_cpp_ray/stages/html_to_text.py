"""Deterministic HTML→text extraction (pipeline stage B3).

The extraction contract (SURVEY.md §1.2, BASELINE.json:input_hint): for
every page, ``extract_text(html) == text`` **byte-identically**.  The
rules are fixed and deterministic:

1. strip HTML comments;
2. drop ``head`` and non-content elements (script/style/nav/footer/
   header/aside/noscript/template) with their contents;
3. block-level tags (p, h1-6, li, div, ... and <br>) become newlines;
4. all remaining tags are removed; HTML entities are unescaped;
5. lines are stripped; empty lines dropped; joined with "\\n".

``normalize_text`` applies step 5 alone — the generator uses it so raw
source text and extracted text agree byte-for-byte.

Ray mapping: stateless ``map_batches`` function (``html_to_docs``) over
zero-copy Arrow batches; regexes are compiled once per process at import.
"""

from __future__ import annotations

import hashlib
import re
from html import unescape

import pyarrow as pa

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_DROP = re.compile(
    r"<(head|script|style|nav|footer|header|aside|noscript|template)\b[^>]*>"
    r".*?</\1\s*>",
    re.S | re.I,
)
_BLOCK = re.compile(
    r"</?(?:p|h[1-6]|li|ul|ol|div|section|article|main|table|thead|tbody|"
    r"tr|td|th|blockquote|pre|figure|figcaption)\b[^>]*>|<br\s*/?>",
    re.I,
)
_TAG = re.compile(r"<[^>]+>")


def normalize_text(raw: str) -> str:
    """Line-level normalization shared by generator and extractor."""
    return "\n".join(ln for ln in (l.strip() for l in raw.split("\n")) if ln)


def extract_text(html: str) -> str:
    s = _COMMENT.sub("", html)
    s = _DROP.sub("", s)
    s = _BLOCK.sub("\n", s)
    s = _TAG.sub("", s)
    return normalize_text(unescape(s))


def doc_id_of(url: str) -> str:
    return hashlib.sha1(url.encode("utf-8")).hexdigest()[:16]


def html_to_docs(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang) -> docs(url, doc_id, text, lang, n_bytes).

    Stateless per-batch transform; emits the ``docs`` schema of
    SURVEY.md §1.2.  The input ``text`` column (ground truth) is NOT
    consumed here — extraction works from ``html`` alone.
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = [extract_text(h.decode("utf-8")) for h in htmls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "doc_id": pa.array([doc_id_of(u) for u in urls], pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": batch.column("lang"),
            "n_bytes": pa.array(
                [len(t.encode("utf-8")) for t in texts], pa.int64()
            ),
        }
    )
