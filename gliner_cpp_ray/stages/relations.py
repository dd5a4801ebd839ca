"""Relation extraction (B6): pattern match over adjacent mention pairs.

A stateless, vectorized ``map_batches`` transform over the ``mentions``
table.  Thanks to the adjacency context emitted by the NER stage
(``gap_next`` / ``next_*``), no doc-text join is needed: a triple fires
when the exact byte gap between two adjacent mentions equals a relation
connective for their (subj_label, obj_label) pair (world.RELATIONS).

Output ``triples`` schema (flat span columns — shuffle-friendly variant
of SURVEY.md §1.2's struct spans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gliner_cpp_ray.sources import world

TRIPLES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_label", pa.string()),
        ("obj_label", pa.string()),
        ("subj_start", pa.int64()),
        ("subj_end", pa.int64()),
        ("prob", pa.float32()),
    ]
)

_SEP = "\x1f"


def _pattern_table(
    relations: dict[str, tuple[str, str, str]] | None = None,
) -> dict[str, str]:
    """(subj_label SEP connective SEP obj_label) -> predicate."""
    rels = relations or world.RELATIONS
    return {
        f"{sl}{_SEP}{conn}{_SEP}{ol}": pred for pred, (sl, conn, ol) in rels.items()
    }


_DEFAULT_PATTERNS = _pattern_table()


def extract_relations(batch: pa.Table, patterns: dict[str, str] | None = None) -> pa.Table:
    """mentions -> triples (vectorized key lookup, no Python row loop)."""
    pats = patterns or _DEFAULT_PATTERNS
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {f.name: pa.array([], f.type) for f in TRIPLES_SCHEMA},
            schema=TRIPLES_SCHEMA,
        )
    sep = pa.scalar(_SEP)
    key = pc.binary_join_element_wise(
        batch.column("label"), batch.column("gap_next"), batch.column("next_label"), sep
    )
    # dictionary-encode, then Python-dict lookup ONLY over the distinct
    # keys of the batch (no per-row string hashing)
    enc = pc.dictionary_encode(key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key)
    dict_preds = np.array(
        [pats.get(k) for k in enc.dictionary.to_pylist()], dtype=object
    )
    codes = np.asarray(enc.indices, dtype=np.int64)
    preds_per_row = dict_preds[codes]
    idx = np.flatnonzero(preds_per_row != None)  # noqa: E711 (object array)
    sel = batch.take(pa.array(idx))
    prob = pc.min_element_wise(sel.column("prob"), sel.column("next_prob"))
    return pa.table(
        {
            "doc_id": sel.column("doc_id"),
            "url": sel.column("url"),
            "subj": sel.column("text"),
            "pred": pa.array(preds_per_row[idx], pa.string()),
            "obj": sel.column("next_text"),
            "subj_label": sel.column("label"),
            "obj_label": sel.column("next_label"),
            "subj_start": sel.column("start"),
            "subj_end": sel.column("end"),
            "prob": prob,
        },
        schema=TRIPLES_SCHEMA,
    )
