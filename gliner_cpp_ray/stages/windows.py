"""Windowed / stream-shaped aggregation operators over an event log.

Ray Data is a batch engine with no event-time watermarks; stream-shaped
semantics are expressed over the events table treated as an ordered,
partitioned log (see /opt/skills/guides/ray_guide.md, "Streaming-shaped
workloads"):

* ``tumbling_counts`` — fixed windows: vectorized bucket assignment in
  ``map_batches`` + one grouped aggregate (partial-friendly);
* ``sliding_counts`` — overlapping windows built FROM the tumbling
  aggregate: each event contributes to ``span/step`` buckets, so the
  slide runs over the (tiny) bucket table, never over raw events;
* ``session_counts`` — per-key gap-based sessions via
  ``groupby(key).map_groups`` over ts-sorted groups (the ordering
  assumption: one group = one key, sorted here, not globally).

All emit integer columns for exact oracle comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def add_time_bucket(batch: pa.Table, ts_col: str = "ts", size_s: int = 3600,
                    out_col: str = "bucket") -> pa.Table:
    us = batch.column(ts_col).cast(pa.int64())
    bucket = pc.divide(us, size_s * US)  # int64 floor division
    return batch.append_column(out_col, bucket)


def tumbling_counts(ds, ts_col: str = "ts", size_s: int = 3600,
                    extra_keys: tuple[str, ...] = ()):
    """-> Dataset(bucket[, *extra_keys], n)."""
    from ray.data.aggregate import Count

    keyed = ds.map_batches(
        add_time_bucket, fn_kwargs={"ts_col": ts_col, "size_s": size_s},
        batch_format="pyarrow",
    )
    keys = ["bucket", *extra_keys]
    return keyed.groupby(keys).aggregate(Count(alias_name="n"))


def sliding_counts(ds, ts_col: str = "ts", step_s: int = 3600,
                   span_steps: int = 3) -> pd.DataFrame:
    """Sliding count: for each step bucket b, events in buckets
    (b - span_steps, b].  Computed from the tumbling aggregate (small),
    finished with a dense rolling sum on the driver."""
    base = tumbling_counts(ds, ts_col, step_s).to_pandas()
    base = base.sort_values("bucket").set_index("bucket")
    full = np.arange(base.index.min(), base.index.max() + 1, dtype=np.int64)
    dense = base.reindex(full, fill_value=0)
    rolled = dense["n"].rolling(span_steps, min_periods=1).sum().astype(np.int64)
    out = pd.DataFrame({"bucket": full, "n_window": rolled.to_numpy()})
    # only emit rows where the window is non-empty
    return out[out["n_window"] > 0].reset_index(drop=True)


def session_counts(ds, key_col: str = "user_id", ts_col: str = "ts",
                   gap_s: int = 1800):
    """-> Dataset(key, n_sessions): sessions split at > gap_s gaps."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values().to_numpy()
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        n = 1 + int((gaps > gap_s * US).sum())
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "n_sessions": np.array([n], np.int64)}
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
