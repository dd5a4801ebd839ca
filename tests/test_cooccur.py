"""Unit tests for the entity co-occurrence kernels (stages/cooccur.py).

The end-to-end Ray path is covered by the driver-equivalent harness
(test_queries_oracle.py::kg_cooccurrence); these pin the per-batch
combiner and the whole-bucket pair reduce in isolation.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from gliner_cpp_ray.stages.cooccur import doc_canon_partial, pair_bucket_reduce


def _canon_map_empty():
    # canon_of falls back to the normalized-surface NIL cluster when the
    # map has no entry, so an empty map exercises the surface path
    return {"qid": {}, "surface": {}}


def test_doc_canon_partial_dedups_within_batch():
    batch = pa.table(
        {
            "doc_id": ["d1", "d1", "d1", "d2"],
            "text": ["Kyiv", "Kyiv", "Dnipro", "Kyiv"],
            "label": ["location", "location", "location", "location"],
        }
    )
    out = doc_canon_partial(batch, _canon_map_empty()).to_pandas()
    # d1 mentions Kyiv twice -> one row; d1 keeps 2 distinct canons
    assert len(out) == 3
    assert out.groupby("doc_id").size().to_dict() == {"d1": 2, "d2": 1}
    # same surface+label resolves to the same canon in both docs
    k1 = set(out[out.doc_id == "d1"].canon_id)
    k2 = set(out[out.doc_id == "d2"].canon_id)
    assert k2 <= k1


def test_doc_canon_partial_empty():
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "label": pa.array([], pa.string()),
        }
    )
    out = doc_canon_partial(empty, _canon_map_empty())
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "canon_id"]


def test_pair_bucket_reduce_counts_docs():
    g = pd.DataFrame(
        {
            "doc_id": ["d1", "d1", "d1", "d2", "d2", "d3"],
            "canon_id": ["A", "B", "C", "A", "B", "A"],
            "__bucket": [0] * 6,
        }
    )
    out = pair_bucket_reduce(g).sort_values(["canon_a", "canon_b"])
    got = {(r.canon_a, r.canon_b): r.n for r in out.itertuples()}
    # (A,B) in d1+d2; (A,C),(B,C) only d1; d3 has a single entity -> none
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    assert out["n"].dtype == np.int64


def test_pair_bucket_reduce_dedups_and_orders():
    # duplicate (doc, canon) rows surviving the batch combiner (same doc
    # split across two read batches) must not double-count, and pairs
    # must come out with canon_a < canon_b regardless of row order
    g = pd.DataFrame(
        {
            "doc_id": ["d1", "d1", "d1"],
            "canon_id": ["B", "A", "B"],
            "__bucket": [0, 0, 0],
        }
    )
    out = pair_bucket_reduce(g)
    assert out.to_dict("records") == [{"canon_a": "A", "canon_b": "B", "n": 1}]


def test_pair_bucket_reduce_empty():
    out = pair_bucket_reduce(pd.DataFrame({"doc_id": [], "canon_id": []}))
    assert list(out.columns) == ["canon_a", "canon_b", "n"]
    assert len(out) == 0
    assert out["n"].dtype == np.int64
