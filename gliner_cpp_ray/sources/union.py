"""Mixed-schema Parquet union source (schema evolution reader).

A long-lived lake accretes files written under different schema
versions (columns added over time).  Ray's ``read_parquet`` over one
directory assumes one schema; this source reads SEVERAL directories
whose schemas differ and presents ONE dataset under the union-by-name
schema — missing columns null-filled, column order normalized — the
``UNION ALL BY NAME`` / Iceberg schema-evolution read path.

Driver cost: one footer read per DIRECTORY (not per file) to derive
the union schema; the data read itself is the ordinary distributed
``read_parquet`` per directory plus a vectorized map-side normalize.
On type conflicts the FIRST directory's type wins; widening casts are
applied to later directories (Arrow ``cast``), anything uncastable
raises rather than silently corrupting.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _dir_schema(path: str) -> pa.Schema:
    if os.path.isdir(path):
        for root, _dirs, names in sorted(os.walk(path)):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    return pq.read_schema(os.path.join(root, n))
        raise FileNotFoundError(f"no parquet files under {path}")
    return pq.read_schema(path)


def union_schema(paths: list[str]) -> pa.Schema:
    """Union-by-name schema across directories; first occurrence of a
    field name fixes its type."""
    fields: dict[str, pa.Field] = {}
    for p in paths:
        for f in _dir_schema(p):
            fields.setdefault(f.name, f)
    return pa.schema(list(fields.values()))


def read_parquet_union(paths: list[str], columns: list[str] | None = None):
    """Read several Parquet directories with differing schemas as ONE
    dataset under the union-by-name schema (missing columns null,
    order normalized).  ``columns`` prunes at every read."""
    import ray.data as rd

    schema = union_schema(paths)
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def normalize(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(schema.names, cols)))

    parts = []
    for p in paths:
        have = [c for c in schema.names if c in set(_dir_schema(p).names)]
        parts.append(
            rd.read_parquet(p, columns=have).map_batches(
                normalize, batch_format="pyarrow"
            )
        )
    ds = parts[0]
    return ds.union(*parts[1:]) if len(parts) > 1 else ds
