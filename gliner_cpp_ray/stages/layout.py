"""Z-order (Morton-curve) data layout — multi-column clustering for
scan pruning.

The lakehouse layout primitive (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
rows sorted by the bit-interleave of two dimension keys land in files
whose min/max ranges are tight in BOTH dimensions, so a reader
filtering on either column prunes most files.  Two stages:

* ``morton_interleave16`` — vectorized 16-bit × 16-bit bit-interleave
  (x in even bit positions, y in odd) → one int64 z-value per row.
  Pure per-row arithmetic, map-side only, and deliberately
  SQL-expressible (a 16-term bit sum) so the oracle replicates it.
* ``zorder_file_assignment`` — file id = (global z-rank - 1) //
  rows_per_file, the exact contiguous-chunk assignment a layout
  rewrite job needs.  Rank comes from ``packing.global_order_rank``
  (the two-level value-range scan: one count row per range bucket to
  the driver, local sort + offset per bucket — never a global sort
  materialized on one node).

Scale notes: z-values of web-scale key domains need the full key
width; the 16-bit masks here match the synthetic corpus and the SQL
oracle — widen the loop bound (and the literal in the oracle) for
wider keys, the shapes are width-independent.  File count scales with
corpus size; the driver holds one int per RANGE BUCKET (10×CPUs), not
per file.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def morton_interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """z = interleave of the low 16 bits of x (even positions) and y
    (odd positions).  Vectorized: 16 shift-mask-or steps."""
    x = x.astype(np.int64) & 0xFFFF
    y = y.astype(np.int64) & 0xFFFF
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_file_assignment(ds, x_col: str, y_col: str, id_col: str,
                           rows_per_file: int,
                           n_buckets: int | None = None):
    """-> Dataset(id, zval, file_id): the layout-rewrite plan.  Rows
    sorted by (zval, id) are chunked into files of ``rows_per_file``;
    ``file_id`` is the chunk index."""
    from gliner_cpp_ray.stages.packing import global_order_rank

    def add_z(t: pa.Table) -> pa.Table:
        z = morton_interleave16(
            t.column(x_col).to_numpy(zero_copy_only=False),
            t.column(y_col).to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {id_col: t.column(id_col), "zval": pa.array(z, pa.int64())}
        )

    zds = ds.map_batches(add_z, batch_format="pyarrow")
    ranked, _ = global_order_rank(zds, "zval", id_col, n_buckets)

    def assign(t: pa.Table) -> pa.Table:
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t.column(id_col),
                "zval": t.column("zval"),
                "file_id": pa.array(
                    ((rank - 1) // rows_per_file).astype(np.int64)
                ),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow")


def parquet_zonemaps(files: list[str], col: str):
    """Zone maps for a Parquet file set: per-file min/max of ``col``
    read from FOOTER METADATA ONLY — no data pages move.  Returns a
    Dataset(file, zmin, zmax); the stat read distributes over the file
    list (one task per batch of paths), so a million-file lake scans
    its footers in parallel, and only the (file-count-bounded) zone
    table ever reaches the planner."""
    import pyarrow.parquet as pq
    import ray.data as rd

    def stats(t: pa.Table) -> pa.Table:
        paths, mins, maxs = [], [], []
        for path in t.column("item").to_pylist():
            md = pq.ParquetFile(path).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            zmin, zmax = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    zmin, zmax = None, None
                    break
                zmin = st.min if zmin is None else min(zmin, st.min)
                zmax = st.max if zmax is None else max(zmax, st.max)
            paths.append(path)
            mins.append(zmin)
            maxs.append(zmax)
        return pa.table(
            {
                "file": pa.array(paths, pa.string()),
                "zmin": pa.array(mins, pa.int64()),
                "zmax": pa.array(maxs, pa.int64()),
            }
        )

    return rd.from_items(files).map_batches(stats, batch_format="pyarrow")


def zonemap_prune(zonemaps: "pd.DataFrame", lo: int | None = None,
                  hi: int | None = None) -> list[str]:
    """Files whose [zmin, zmax] MAY intersect (lo, hi) — missing stats
    (NaN) are conservatively kept.  Runs on the file-count-bounded zone
    table at the driver; the pruned-out files are never opened again."""
    keep = np.ones(len(zonemaps), bool)
    if lo is not None:
        keep &= ~(zonemaps["zmax"].to_numpy() <= lo)  # NaN-safe: ~False
    if hi is not None:
        keep &= ~(zonemaps["zmin"].to_numpy() >= hi)
    return zonemaps["file"][keep].tolist()
