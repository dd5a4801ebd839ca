"""Snapshot diff: full-outer keyed comparison of two table versions.

The incremental-pipeline staple: a crawl (or any upstream table) is
re-materialized periodically, and downstream consumers want the DELTA —
which keys appeared, disappeared, or changed — instead of reprocessing
the whole snapshot.  Same shape as a CDC reconciliation or an
iceberg/delta snapshot compare.

``snapshot_diff(old, new, key, val_cols)`` emits one row per key whose
state differs between the snapshots:

* ``change = 'added'``   — key only in ``new``;
* ``change = 'removed'`` — key only in ``old``;
* ``change = 'changed'`` — key in both, any value column differs;
* keys with identical values are dropped (the diff is the output).

Value columns are emitted twice, as ``old_<col>`` / ``new_<col>``, with
the integer sentinel −1 where the side is absent — typed sentinels, not
NULLs, so the output schema is dtype-stable and hash-checkable against a
SQL ``FULL OUTER JOIN ... COALESCE(v, -1)`` transcription.

Scale shape: each side is projected to (key, vals) and tagged with a
side marker map-side; ONE key-hash bucket shuffle co-locates both
versions of every key, and the per-bucket reduce is a C-level pandas
outer merge + vectorized compare.  Movement: |old| + |new| projected
rows through one exchange — never a broadcast, never a driver collect;
the output is delta-sized.  Int64 value columns only (web-corpus
measures): the sentinel coalesce keeps every output column int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gliner_cpp_ray.stages.joins import add_bucket
from gliner_cpp_ray.stages.sizing import default_buckets


def snapshot_diff(old, new, key: str, val_cols: list[str],
                  n_buckets: int | None = None):
    """Dataset × Dataset -> Dataset(key, change, old_*, new_*).

    Both inputs must carry ``key`` (non-null) and every ``val_cols``
    column (int64); each side is assumed keyed (≤ 1 row per key — the
    output of ``latest_by_key`` or any grouped aggregate qualifies)."""
    n_buckets = default_buckets(n_buckets)
    cols = [key, *val_cols]

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols).append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )
            return add_bucket(t, key, n_buckets)

        return fn

    out_schema = pa.schema(
        [(key, pa.int64()), ("change", pa.string())]
        + [(f"old_{c}", pa.int64()) for c in val_cols]
        + [(f"new_{c}", pa.int64()) for c in val_cols]
    )

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        o = g.loc[g["__side"] == 0, cols]
        n = g.loc[g["__side"] == 1, cols]
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        state = m["_merge"].to_numpy()
        added = state == "right_only"
        removed = state == "left_only"
        out = {key: m[key].to_numpy(np.int64),
               "change": np.where(added, "added",
                                  np.where(removed, "removed", "changed"))}
        same = ~added & ~removed
        for c in val_cols:
            ov = m[f"{c}_o"].fillna(-1).to_numpy(np.int64)
            nv = m[f"{c}_n"].fillna(-1).to_numpy(np.int64)
            out[f"old_{c}"] = ov
            out[f"new_{c}"] = nv
            same &= ov == nv
        keep = ~same
        return pa.table(
            {k: pa.array(v[keep]) for k, v in out.items()}, schema=out_schema
        )

    lt = old.map_batches(tag(0), batch_format="pyarrow")
    rt = new.map_batches(tag(1), batch_format="pyarrow")
    return (
        lt.union(rt)
        .repartition(max(n_buckets, 8))  # coalesce slivers pre-shuffle
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
