"""Table profiling — the ANALYZE-TABLE / zone-map statistics primitive.

Query planners, data-skipping indexes and ingest health checks all need
per-column statistics (row count, null count, value bounds) computed in
one pass without shuffling the data.  ``table_profile`` does exactly
that: each batch emits ONE long-format partial row per profiled column
(column, n, nulls, vmin, vmax) — so the only exchange is a grouped
fold over a table whose size is tasks x columns, never rows — and the
final reduce is a tiny groupby(column) with (sum, sum, min, max).

Integer-exact contract: int64 columns are profiled as-is; float64
columns are floor-quantized to micro units per value BEFORE min/max
(floor is monotone, so ``min(floor(x*1e6)) == floor(min(x)*1e6)`` and
the bounds replicate any SQL engine's ``min/max`` bit-for-bit after the
same quantization).

All-null caveat: a column with zero non-null values corpus-wide keeps
the int64 min/max identity sentinels (documented divergence from SQL's
NULL); ``n_nulls == n_rows`` flags the case exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_I64_MAX = np.iinfo(np.int64).max
_I64_MIN = np.iinfo(np.int64).min

_PROFILE_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("min_v", pa.int64()),
        ("max_v", pa.int64()),
    ]
)


def _quantized(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64())
    return pc.cast(pc.floor(pc.multiply(col, 1_000_000.0)), pa.int64())


def table_profile(ds, cols: list[str]):
    """-> Dataset(column, n_rows, n_nulls, min_v, max_v), one row per
    profiled column (int64 raw; float64 floor-quantized to micro).

    Movement: tasks x len(cols) partial rows into one tiny grouped
    fold — the data itself is never shuffled.
    """
    if not cols:
        raise ValueError("cols must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, vmins, vmaxs = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            if t.num_rows > col.null_count:
                q = _quantized(col)
                vmins.append(pc.min(q).as_py())
                vmaxs.append(pc.max(q).as_py())
            else:
                vmins.append(_I64_MAX)
                vmaxs.append(_I64_MIN)
        return pa.table(
            {
                "column": names,
                "n_rows": pa.array(ns, pa.int64()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "min_v": pa.array(vmins, pa.int64()),
                "max_v": pa.array(vmaxs, pa.int64()),
            },
            schema=_PROFILE_SCHEMA,
        )

    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    return bucketed_group_agg(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow"),
        "column",
        specs=[
            ("sum", "n_rows", "n_rows"),
            ("sum", "n_nulls", "n_nulls"),
            ("min", "min_v", "min_v"),
            ("max", "max_v", "max_v"),
        ],
        n_buckets=8,  # column-count-bounded input; fan-out buys nothing
    )
