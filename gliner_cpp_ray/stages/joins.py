"""Join strategies (guide: "Joins and lookups").

* ``broadcast_lookup_join`` — small side broadcast as a dict; vectorized
  pandas map inside ``map_batches``.  No shuffle.  THE default when one
  side fits in memory (dimension tables, vocab, alias dicts).
* ``bucketed_hash_join`` — both sides large: add ``bucket = hash(key) %
  B`` to each side, null-pad to a common schema, union, and merge within
  each ``groupby(bucket)`` group with pandas.  One shuffle per side; B
  sets merge granularity.  This is the portable partitioned hash join
  that works on any Ray version (``Dataset.join`` landed only recently)
  and keeps B and skew handling explicit.
* ``broadcast_semi_join`` / ``broadcast_anti_join`` — key-set broadcast,
  vectorized ``is_in`` filter.  No shuffle.

Skew note: a hot join key floods one bucket; the fix is salting the
probe side and replicating the build side per salt (see stages/skew.py
for the aggregation analog).  The KG pipeline itself avoids keyed skew
by pre-aggregating before every shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)


def add_bucket(batch: pa.Table, key: str, n_buckets: int,
               out_col: str = "__bucket") -> pa.Table:
    """Deterministic hash bucket for an integer key (wrapping uint64
    multiply — overflow-safe, stable across processes)."""
    v = batch.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
    h = (v.astype(np.uint64) * _KNUTH) >> np.uint64(16)
    bucket = (h % np.uint64(n_buckets)).astype(np.int64)
    return batch.append_column(out_col, pa.array(bucket))


def bucketed_hash_join(left, right, on: str, n_buckets: int = 16,
                       how: str = "inner", suffix: str = "_r"):
    """Partitioned hash join of two Datasets on an integer key column.

    ``how`` in {"inner", "left"}.  Right-side columns that collide with
    left names (other than ``on``) are renamed with ``suffix`` first.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    lschema = left.schema()  # ray.data.Schema: .names + arrow .types
    rschema = right.schema()
    lcols = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rename = {
        c: c + suffix for c in rschema.names if c != on and c in set(lcols)
    }
    if rename:
        # portable rename (Dataset.rename_columns trips on pandas blocks)
        right = right.map_batches(
            lambda t: t.rename_columns([rename.get(c, c) for c in t.schema.names]),
            batch_format="pyarrow",
        )
        rschema = right.schema()
    rtypes = dict(zip(rschema.names, rschema.types))
    rcols = [c for c in rschema.names if c != on]

    # common schema: on + left columns + right columns (+ side marker)
    def pad(side_cols, schema_types):
        def fn(t: pa.Table, side: int) -> pa.Table:
            t = add_bucket(t, on, n_buckets)
            n = t.num_rows
            arrays, names = [], []
            for name, typ in schema_types:
                names.append(name)
                if name in t.schema.names:
                    arrays.append(t.column(name))
                else:
                    arrays.append(pa.nulls(n, typ))
            names += ["__bucket", "__side"]
            arrays += [t.column("__bucket"), pa.array(np.full(n, side, np.int8))]
            return pa.table(dict(zip(names, arrays)))

        return fn

    types = [(n, ltypes[n]) for n in lcols]
    types += [(c, rtypes[c]) for c in rcols]
    padder = pad(None, types)
    lt = left.map_batches(lambda t: padder(t, 0), batch_format="pyarrow")
    rt = right.map_batches(lambda t: padder(t, 1), batch_format="pyarrow")

    out_cols = lcols + rcols
    # The union null-pads each side's missing columns, and pandas
    # upcasts int64-with-nulls to float64 inside the merge group — so
    # integer columns must be restored to (nullable) Int64 on the way
    # out, or every downstream aggregate silently goes float and
    # hash-diverges from an integer oracle.
    int_cols = {n for n, t in types if pa.types.is_integer(t)}

    def _restore_ints(df: pd.DataFrame) -> pd.DataFrame:
        for c in df.columns:
            if c in int_cols and df[c].dtype.kind == "f":
                df[c] = df[c].astype("Int64")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == 0, lcols]
        rg = g.loc[g["__side"] == 1, [on, *rcols]]
        if lg.empty or (rg.empty and how == "inner"):
            return pd.DataFrame(
                {c: pd.Series(dtype="Int64" if c in int_cols else "object")
                 for c in out_cols}
            )
        return _restore_ints(lg.merge(rg, on=on, how=how))

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def broadcast_lookup_join(ds, lookup: dict, key: str, out_col: str,
                          default=None):
    """Map-side join against a broadcast dict (pass a small dict, or at
    cluster scale ``ray.get`` an object ref inside the fn)."""

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = df[key].map(lookup)
        if default is not None:
            df[out_col] = df[out_col].fillna(default)
        return df

    return ds.map_batches(attach, batch_format="pandas")


def broadcast_semi_join(ds, keys, key: str):
    """Keep rows whose key is in the broadcast key set."""
    key_arr = pa.array(sorted(keys))

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(key), value_set=key_arr))

    return ds.map_batches(filt, batch_format="pyarrow")


def broadcast_anti_join(ds, keys, key: str):
    """Drop rows whose key is in the broadcast key set."""
    key_arr = pa.array(sorted(keys))

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column(key), value_set=key_arr))
        )

    return ds.map_batches(filt, batch_format="pyarrow")
