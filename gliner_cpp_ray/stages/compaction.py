"""Latest-wins compaction (CDC / upsert semantics): one full row per
key — the row with the greatest (order, tie) value.

The crawl-refresh staple: a Common-Crawl-style pages table accumulates
one row per (url, warc_ts) fetch; downstream stages want exactly the
newest fetch per url.  Same shape as Kafka log compaction or an
iceberg/delta MERGE collapse.

Scale shape: a per-batch vectorized combiner keeps only each key's
in-batch winner FIRST (sort + boundary mask — no per-key Python), so
the single key-hash shuffle carries at most one row per (key, batch),
not one per version; the per-bucket reduce repeats the identical
combiner on the survivors.  Hot keys (a url refetched millions of
times) collapse inside every map task before they can skew the
exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _keep_latest(df: pd.DataFrame, key: str, order_cols: list[str]) -> pd.DataFrame:
    """Vectorized in-frame winner: sort by (key, *order) ascending and
    keep each key's LAST row — the greatest (order, tie) per key."""
    if not len(df):
        return df
    df = df.sort_values([key, *order_cols], kind="stable")
    keys = df[key].to_numpy()
    last = np.ones(len(df), dtype=bool)
    last[:-1] = keys[1:] != keys[:-1]
    return df[last]


def latest_by_key(ds, key: str, order_cols: list[str],
                  n_buckets: int | None = None):
    """-> Dataset with every input column, one row per key: the row
    maximizing ``order_cols`` lexicographically (append a unique id as
    the final order column to make the winner deterministic)."""
    from gliner_cpp_ray.stages.joins import add_bucket
    from gliner_cpp_ray.stages.sizing import default_buckets

    n_buckets = default_buckets(n_buckets)

    def combine(t: pa.Table) -> pa.Table:
        df = _keep_latest(t.to_pandas(), key, order_cols)
        return add_bucket(
            pa.Table.from_pandas(df, preserve_index=False), key, n_buckets
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _keep_latest(g.drop(columns="__bucket"), key, order_cols)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
