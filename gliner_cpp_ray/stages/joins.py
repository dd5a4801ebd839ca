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
* ``asof_join_bucketed`` / ``interval_join_bucketed`` — non-equi joins
  Ray Data has no native operator for, composed from the same
  bucket-shuffle plan: co-partition by key hash, merge per bucket with a
  sorted ``merge_asof`` / equi-merge + between-filter.

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

from gliner_cpp_ray.stages.sizing import default_buckets

_KNUTH = np.uint64(2654435761)


def add_bucket(batch: pa.Table, key: str, n_buckets: int,
               out_col: str = "__bucket") -> pa.Table:
    """Deterministic hash bucket for a join key.

    Integer keys: wrapping uint64 multiply (overflow-safe, stable
    across processes).  Any other type (string, date, …): vectorized
    ``pd.util.hash_pandas_object`` (fixed internal hash key — the same
    process-stable hash the KG edge reduce buckets with)."""
    col = batch.column(key)
    if pa.types.is_integer(col.type):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = v.astype(np.uint64) * _KNUTH >> np.uint64(16)
    else:
        h = pd.util.hash_pandas_object(
            col.to_pandas(), index=False
        ).to_numpy()
    bucket = (h % np.uint64(n_buckets)).astype(np.int64)
    return batch.append_column(out_col, pa.array(bucket))



def _as_arrow_type(t) -> pa.DataType:
    """Normalize a ``ray.data.Schema`` type entry to Arrow: for
    arrow-block datasets it already IS a ``pa.DataType``, but for
    pandas-block datasets Ray reports numpy dtypes (and bare ``object``
    for strings)."""
    if isinstance(t, pa.DataType):
        return t
    if t is object or getattr(t, "kind", None) == "O":
        return pa.string()
    return pa.from_numpy_dtype(t)


def bucketed_hash_join(left, right, on: str, n_buckets: int | None = None,
                       how: str = "inner", suffix: str = "_r"):
    """Partitioned hash join of two Datasets on a key column (integer
    fast path; string/other types bucket via the process-stable pandas
    hash).

    ``how`` in {"inner", "left"}.  Right-side columns that collide with
    left names (other than ``on``) are renamed with ``suffix`` first.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    n_buckets = default_buckets(n_buckets)
    lschema = left.schema()  # ray.data.Schema: .names + .types
    rschema = right.schema()
    lcols = list(lschema.names)
    ltypes = {n: _as_arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
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
    rtypes = {n: _as_arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
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

    out_schema = pa.schema(types)

    def merge(g: pd.DataFrame) -> pa.Table:
        lg = g.loc[g["__side"] == 0, lcols]
        rg = g.loc[g["__side"] == 1, [on, *rcols]]
        if lg.empty or (rg.empty and how == "inner"):
            return out_schema.empty_table()
        return _merged_to_arrow(
            _restore_int_dtypes(lg.merge(rg, on=on, how=how), int_cols),
            out_schema,
        )

    return (
        lt.union(rt)
        .repartition(max(n_buckets, 8))  # coalesce slivers pre-shuffle
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def _pad_union_by_bucket(left, right, key: str, n_buckets: int | None):
    """Shared shuffle plan for the non-equi joins: bucket both sides on
    the (integer) join key, null-pad each side to the common schema with
    a ``__side`` marker, and union.  Callers group by ``__bucket`` and
    merge per group — ONE shuffle per side, co-locating every row of a
    key in a single bucket group (the partitioning assumption all the
    bucketed joins rely on).

    Returns ``(unioned, lcols, rcols, int_cols, out_schema)``.
    """
    n_buckets = default_buckets(n_buckets)
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != key]
    types = [(n, _as_arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    types += [
        (c, _as_arrow_type(t))
        for c, t in zip(rschema.names, rschema.types)
        if c != key
    ]

    def pad(t: pa.Table, side: int) -> pa.Table:
        t = add_bucket(t, key, n_buckets)
        n = t.num_rows
        arrays, names = [], []
        for name, typ in types:
            names.append(name)
            if name in t.schema.names:
                arrays.append(t.column(name))
            else:
                arrays.append(pa.nulls(n, typ))
        names += ["__bucket", "__side"]
        arrays += [t.column("__bucket"), pa.array(np.full(n, side, np.int8))]
        return pa.table(dict(zip(names, arrays)))

    lt = left.map_batches(lambda t: pad(t, 0), batch_format="pyarrow")
    rt = right.map_batches(lambda t: pad(t, 1), batch_format="pyarrow")
    int_cols = {n for n, t in types if pa.types.is_integer(t)}
    # COALESCE before the groupby shuffle: the union arrives as one
    # sliver block per upstream read/map task (e.g. 128 × ~1.5k rows),
    # and groupby's sort pays per-block fixed costs that dwarf the data
    # at that granularity — same lesson as the KG edge reduce
    unioned = lt.union(rt).repartition(max(n_buckets, 8))
    return unioned, lcols, rcols, int_cols, pa.schema(types)


def _restore_int_dtypes(df: pd.DataFrame, int_cols: set) -> pd.DataFrame:
    # the union null-pads each side's missing columns and pandas upcasts
    # int64-with-nulls to float64 — restore nullable Int64 so downstream
    # aggregates stay integer and hash-match integer oracles
    for c in df.columns:
        if c in int_cols and df[c].dtype.kind == "f":
            df[c] = df[c].astype("Int64")
    return df


def _merged_to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Convert a per-bucket merge result to an Arrow block with the
    declared join schema.  Emitting Arrow (not pandas) from the merge
    matters downstream: Ray's sort-based groupby/aggregate over pandas
    blocks with nullable Int64 extension columns runs an object path
    that measured 17x slower than the same aggregate over Arrow int64
    blocks (22.7s vs 1.3s on a 600k-row join output at sf0.1)."""
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


def asof_join_bucketed(left, right, key: str, left_ts: str, right_ts: str,
                       tiebreak: str, n_buckets: int | None = None):
    """Distributed backward as-of join (an operator Ray Data lacks):
    for each left row, attach the right row with the largest
    ``right_ts <= left_ts`` for the same ``key`` — ties on ``right_ts``
    broken by the largest ``tiebreak`` value.

    Semantics match pandas ``merge_asof(direction="backward")`` and the
    SQL window form ``row_number() OVER (PARTITION BY left_row ORDER BY
    right_ts DESC, tiebreak DESC) = 1``.  Inner semantics: left rows
    with no match are dropped.

    Partitioning assumption: all rows of a key land in one hash bucket
    (see ``_pad_union_by_bucket``); within a bucket the merge sorts both
    sides by timestamp, so cost is O(bucket log bucket), never all-pairs.
    """
    unioned, lcols, rcols, int_cols, out_schema = _pad_union_by_bucket(
        left, right, key, n_buckets
    )
    out_cols = lcols + rcols

    def merge(g: pd.DataFrame) -> pa.Table:
        lg = g.loc[g["__side"] == 0, lcols].sort_values(left_ts)
        rg = g.loc[g["__side"] == 1, [key, *rcols]].sort_values(
            [right_ts, tiebreak]
        )
        if lg.empty or rg.empty:
            return out_schema.empty_table()
        # rg sorted by (ts, tiebreak): merge_asof takes the LAST row with
        # right_ts <= left_ts per group, i.e. max-ts then max-tiebreak
        m = pd.merge_asof(
            lg, rg, left_on=left_ts, right_on=right_ts, by=key,
            direction="backward", allow_exact_matches=True,
        )
        m = m.dropna(subset=[right_ts])  # inner semantics
        return _merged_to_arrow(
            _restore_int_dtypes(m[out_cols], int_cols), out_schema
        )

    return (
        unioned.groupby("__bucket").map_groups(merge, batch_format="pandas")
    )


def interval_join_bucketed(points, intervals, key: str, point_col: str,
                           lo_col: str, hi_col: str, n_buckets: int | None = None):
    """Distributed interval (range) join: inner-join each point row to
    every interval row of the same ``key`` with ``lo <= point < hi``.

    Both sides may be corpus-sized; they are co-partitioned by hashing
    ``key`` (one shuffle per side), and each bucket group does a
    vectorized equi-merge on ``key`` followed by a between-filter — so
    per-bucket cost is O(matching key pairs), not bucket².  Half-open
    ``[lo, hi)`` matches the SQL ``p >= lo AND p < hi``.
    """
    unioned, pcols, icols, int_cols, out_schema = _pad_union_by_bucket(
        points, intervals, key, n_buckets
    )
    out_cols = pcols + icols

    def merge(g: pd.DataFrame) -> pa.Table:
        pg = g.loc[g["__side"] == 0, pcols]
        ig = g.loc[g["__side"] == 1, [key, *icols]]
        if pg.empty or ig.empty:
            return out_schema.empty_table()
        m = pg.merge(ig, on=key, how="inner")
        m = m[(m[point_col] >= m[lo_col]) & (m[point_col] < m[hi_col])]
        return _merged_to_arrow(
            _restore_int_dtypes(m[out_cols], int_cols), out_schema
        )

    return (
        unioned.groupby("__bucket").map_groups(merge, batch_format="pandas")
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
