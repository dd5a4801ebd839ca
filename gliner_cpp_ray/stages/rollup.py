"""ROLLUP (hierarchical grouping-sets) counts derived from ONE pass.

``GROUP BY ROLLUP(k1, .., kn)`` asks for n+1 aggregation levels.  The
naive plan re-scans the input once per level; the scale-correct plan
aggregates the FINEST level once (the only corpus-sized shuffle) and
derives every coarser level by re-aggregating the finest result — a
table bounded by the key-combination cardinality, not the corpus.
That derivation is valid for any re-aggregable measure (count/sum/min/
max); this module implements additive counts.

NULL markers are replaced by typed sentinels ('__all__' for strings,
-1 for ints) so the output is dtype-stable for exact oracle hashing —
the SQL side applies the same ``coalesce``.
"""

from __future__ import annotations

import pyarrow as pa


ALL_STR = "__all__"
ALL_INT = -1


def rollup_counts(finest_ds, keys: list[str], count_col: str = "n"):
    """``finest_ds``: Dataset((*keys), n) — the finest-level counts
    (one groupby over the corpus, done by the caller so it can fuse
    bucket/key derivation into its own map stage).  Returns a Dataset
    with one row per ROLLUP level: (*keys, n), coarser levels carrying
    sentinels in the rolled-up key columns."""
    from ray.data.aggregate import Sum

    finest = finest_ds.materialize()  # small: one row per combination
    # sentinel typing comes from one Arrow batch (the Dataset-level
    # schema may report pandas-block dtypes, not Arrow types)
    try:
        probe = next(
            iter(finest.iter_batches(batch_size=1, batch_format="pyarrow"))
        )
    except StopIteration:
        raise ValueError(
            "rollup_counts needs a non-empty finest table to type the "
            "rolled-up sentinel columns"
        ) from None
    sentinels = {
        k: (ALL_STR if pa.types.is_string(probe.schema.field(k).type)
            else ALL_INT)
        for k in keys
    }

    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept, rolled = keys[:depth], keys[depth:]

        def coarsen(t: pa.Table, kept=kept, rolled=rolled) -> pa.Table:
            cols = {k: t.column(k) for k in kept}
            for k in rolled:
                s = sentinels[k]
                cols[k] = pa.array(
                    [s] * t.num_rows,
                    pa.string() if s == ALL_STR else pa.int64(),
                )
            cols[count_col] = t.column(count_col)
            return pa.table(cols)

        lvl = finest.map_batches(coarsen, batch_format="pyarrow")
        if kept:
            lvl = lvl.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))
        else:
            # grand total: single global sum, one row
            import ray.data as rd

            total = lvl.sum(count_col) or 0
            row = {k: sentinels[k] for k in keys}
            row[count_col] = total
            lvl = rd.from_items([row])
        levels.append(lvl)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def pivot_counts(ds, key_col: str, cat_col: str, categories: list[str],
                 prefix: str = "n_"):
    """PIVOT: one wide count column per category
    (``count(*) FILTER (WHERE cat = c)``), grouped by ``key_col``.

    The category list must be known up front (pass the enum, or
    pre-compute distinct values on a bounded column) — that is what
    keeps the output schema static and the plan a single aggregate.
    Scale shape: indicator columns are added map-side (vectorized
    ``pc.equal`` + cast), then ONE grouped Sum per category rides the
    same key-hash exchange with Ray's per-block partial aggregation —
    the shuffle carries one wide row per (block, key), never one row
    per (key, category) pair."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def widen(t: pa.Table) -> pa.Table:
        cols = {key_col: t.column(key_col)}
        cat = t.column(cat_col)
        for c in categories:
            cols[prefix + c] = pc.equal(cat, c).cast(pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            *[Sum(prefix + c, alias_name=prefix + c) for c in categories]
        )
    )
