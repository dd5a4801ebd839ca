"""Deterministic weighted sampling with replacement.

Training-data mixtures are usually drawn in proportion to a per-document
weight (token count, quality score, source multiplier).  The classic
streaming approaches (Efraimidis–Spirakis keys, A-ExpJ reservoirs) need
float logs and an order-dependent reservoir — neither is reproducible
bit-for-bit across engines.  This operator instead uses the CUMULATIVE
WEIGHT LINE, which is exact in int64 end to end:

* order documents by id; doc i owns the half-open interval
  ``[cum_i − w_i, cum_i)`` on ``[0, W)`` where ``cum`` is the inclusive
  prefix sum of weights and ``W`` the total;
* probe j (j = 0..m−1) lands at ``pos_j = md5_u60(str(j)) mod W``;
* the sample for probe j is the document whose interval contains
  ``pos_j``.

Each probe is an independent uniform draw over the weight mass, so the
scheme is sampling WITH replacement, and every quantity (hash, mod,
prefix sum, interval test) is integer arithmetic a SQL engine replicates
literally — the sample itself hash-checks, not just its size.

Scale shape — the two-level distributed prefix sum (same construction
as ``stages/packing.py``): order-preserving id-range buckets, ONE small
groupby puts one weight-sum row per bucket on the driver (~10·CPUs rows,
never corpus rows), the driver's exclusive scan yields per-bucket
offsets, and each bucket finishes locally (sort by id, local cumsum +
offset, ``searchsorted`` of the ≤ m probe positions that fall inside its
weight range).  The m probe positions are computed once on the driver
(m is the sample size — user-bounded, tiny next to the corpus) and ride
into tasks as closure state; corpus rows cross the wire exactly once,
in the single bucket shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from gliner_cpp_ray.stages.sizing import cluster_cpus


def probe_positions(m: int, total_weight: int) -> np.ndarray:
    """``pos_j = md5_u60(str(j)) mod total_weight`` for j in [0, m) —
    the md5-u60 idiom shared with the KMV/MinHash sketches, so DuckDB
    replicates it as ``CAST(concat('0x', substr(md5(CAST(j AS
    VARCHAR)), 1, 15)) AS BIGINT) % W``."""
    return np.fromiter(
        (
            int(hashlib.md5(str(j).encode()).hexdigest()[:15], 16)
            % total_weight
            for j in range(m)
        ),
        np.int64,
        m,
    )


def weighted_sample_with_replacement(ds, id_col: str, weight_col: str,
                                     m: int = 64,
                                     n_buckets: int | None = None):
    """Dataset(id, weight, ...) -> Dataset(sample_id, id) — ``m``
    deterministic draws proportional to ``weight`` (ints > 0;
    zero-weight rows own an empty interval and are never drawn).

    Ids must be non-negative integers (web-corpus doc ids); duplicates
    of the (sample_id) key never occur, duplicates of id occur exactly
    when a document is drawn more than once."""
    if n_buckets is None:
        n_buckets = max(8, 10 * cluster_cpus())

    weights = ds.select_columns([id_col, weight_col]).materialize()
    total = weights.sum(weight_col)
    if not total:  # empty corpus or all-zero weights: no mass to draw
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"sample_id": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64())})
        )
    probes = probe_positions(m, int(total))
    order = np.argsort(probes, kind="stable")
    probes_sorted = probes[order]
    sample_ids_sorted = order.astype(np.int64)

    max_id = int(weights.max(id_col))
    span = max(1, (max_id + n_buckets) // n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(ids // span, pa.int64()))

    bucketed = weights.map_batches(add_bucket, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    sums = (
        bucketed.groupby("__bucket")
        .aggregate(Sum(weight_col, alias_name="s"))
        .to_pandas()  # ONE row per id-range bucket — bounded by n_buckets
        .sort_values("__bucket")
    )
    offsets = dict(
        zip(
            sums["__bucket"].astype(np.int64),
            np.concatenate([[0], sums["s"].to_numpy(np.int64).cumsum()[:-1]]),
        )
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        w = g[weight_col].to_numpy(np.int64)
        base = int(offsets[int(g["__bucket"].iloc[0])])
        cum = base + w.cumsum()  # inclusive; doc i owns [cum_i - w_i, cum_i)
        # probes that land inside this bucket's weight range
        lo = np.searchsorted(probes_sorted, base, side="left")
        hi = np.searchsorted(probes_sorted, cum[-1] if len(cum) else base,
                             side="left")
        pos = probes_sorted[lo:hi]
        if not len(pos):
            return pd.DataFrame(
                {"sample_id": np.zeros(0, np.int64),
                 id_col: np.zeros(0, np.int64)}
            )
        # first interval with cum > pos; zero-weight rows can never win
        # (their cum equals their predecessor's, so it is never the
        # strictly-greater one searchsorted(right) finds first)
        idx = np.searchsorted(cum, pos, side="right")
        return pd.DataFrame(
            {
                "sample_id": sample_ids_sorted[lo:hi],
                id_col: g[id_col].to_numpy(np.int64)[idx],
            }
        )

    return bucketed.groupby("__bucket").map_groups(
        finish, batch_format="pandas"
    )


def negative_samples(ds, id_col: str, k: int = 4,
                     n_buckets: int | None = None):
    """Deterministic NEGATIVE SAMPLING for contrastive training: each
    document draws ``k`` pseudo-random other documents from the corpus
    — uniformly, reproducibly, engine-independently.

    Scheme: documents get dense 0-based positions under ORDER BY id
    (the two-level range scan of ``global_order_rank`` — one count row
    per bucket to the driver).  Draw j of doc d targets position
    ``md5_u60(str(d) + '#' + str(j)) mod N``; a self-hit shifts to the
    next position mod N.  Positions resolve to ids with ONE bucketed
    hash join of the (N·k)-row probe table against the rank table —
    both corpus-shaped, both distributed, and every step (md5, mod,
    shift, rank) is replicated literally by a SQL engine.

    -> Dataset(id_col, probe, neg_<id_col>).
    """
    import hashlib

    from gliner_cpp_ray.stages.joins import bucketed_hash_join
    from gliner_cpp_ray.stages.packing import global_order_rank

    if k < 1:
        raise ValueError("k must be >= 1")
    ranked, n_total = global_order_rank(
        ds.select_columns([id_col]), id_col, id_col
    )
    if n_total < 2:
        raise ValueError("need >= 2 documents to draw negatives")
    out_neg = f"neg_{id_col}"

    def probes(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        rnk = t.column("rank").to_numpy(zero_copy_only=False) - 1  # 0-based
        # per-(id, j) md5 — the repo-wide SQL-replicable hash idiom
        # (a Python loop, like every md5 sketch partial: bounded by
        # batch_size * k calls per task, distributed across the pool)
        tgt = np.fromiter(
            (
                int(
                    hashlib.md5(f"{d}#{j}".encode()).hexdigest()[:15], 16
                ) % n_total
                for d in ids
                for j in range(k)
            ),
            np.int64,
            len(ids) * k,
        )
        rep_rnk = np.repeat(rnk, k)
        tgt = np.where(tgt == rep_rnk, (tgt + 1) % n_total, tgt)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, k)),
                "probe": pa.array(
                    np.tile(np.arange(k, dtype=np.int64), len(ids))
                ),
                "pos": pa.array(tgt),
            }
        )

    probe_ds = ranked.map_batches(probes, batch_format="pyarrow")
    lookup = ranked.map_batches(
        lambda t: pa.table(
            {
                "pos": pa.array(
                    t.column("rank").to_numpy(zero_copy_only=False) - 1
                ),
                out_neg: t.column(id_col),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        probe_ds,
        lookup,
        on="pos",
        n_buckets=n_buckets,
        left_schema=pa.schema(
            [(id_col, pa.int64()), ("probe", pa.int64()), ("pos", pa.int64())]
        ),
        right_schema=pa.schema([("pos", pa.int64()), (out_neg, pa.int64())]),
    )
    return joined.map_batches(
        lambda t: t.select([id_col, "probe", out_neg]),
        batch_format="pyarrow",
    )
