"""Mergeable sketches for distributed approximate analytics.

KMV (k-minimum-values) distinct-count sketch: hash every value, keep
the k smallest distinct hashes; the k-th smallest, seen as a fraction
``t`` of the hash space, estimates distinct count as ``(k-1)/t``
(Bar-Yossef et al., RANDOM'02 — the classic bottom-k estimator).

Why this sketch here: it is **mergeable** (union of partials = take the
k smallest over their union), which is the property that makes a
sketch a Ray Data operator — per-batch partials in ``map_batches``,
one tiny driver merge, no shuffle of the raw column.  And because the
hash is md5 (SQL-expressible), the DuckDB oracle replicates the
ESTIMATE bit-exactly — the integer estimator below uses pure int64
arithmetic so Ray and SQL agree to the last digit, making this the
rare approximate operator with a full hash-checked oracle.

At 10^12 rows: each task ships k hashes (k·16 bytes) to the driver —
movement is O(tasks·k), independent of cardinality or corpus size.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


_K_DEFAULT = 64
_HASH_BITS = 32  # estimator works on the first 32 hash bits


def _kmv_hashes(values, k: int) -> list[str]:
    """k smallest distinct md5 hex digests of the stringified values."""
    hs = {hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values}
    return sorted(hs)[:k]


class KmvPartial:
    """Per-batch partial: the k smallest distinct value-hashes."""

    def __init__(self, col: str, k: int = _K_DEFAULT):
        self.col = col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = _kmv_hashes(batch.column(self.col).to_pylist(), self.k)
        return pa.table({"h": pa.array(hs, pa.string())})


def kmv_estimate_from_hashes(hashes: list[str], k: int = _K_DEFAULT) -> int:
    """Bottom-k estimate in pure int64 arithmetic (bit-exact vs SQL).

    With fewer than k distinct hashes the count is EXACT (we saw every
    distinct value).  Otherwise ``(k-1) * 2^32 // kth_hash_as_uint32``
    using the first 8 hex chars — both sides integer, no float drift.
    """
    hs = sorted(set(hashes))[:k]
    if len(hs) < k:
        return len(hs)
    kth = int(hs[k - 1][:8], 16)
    if kth == 0:  # pragma: no cover - 2^-32 corner
        return len(hs)
    return (k - 1) * (1 << _HASH_BITS) // kth


def kmv_distinct_count(ds, col: str, k: int = _K_DEFAULT) -> int:
    """Distributed distinct-count estimate of ``ds[col]``.

    Per-batch ``KmvPartial`` → driver merge of ≤ k hashes per block
    (the ONLY data that leaves the workers) → integer estimator."""
    # instance -> plain tasks on the warm worker pool (setup is two
    # scalars; actor-pool spin-up dominated the query at bench scale)
    partial = ds.map_batches(
        KmvPartial(col=col, k=k), batch_format="pyarrow"
    )
    merged = partial.to_pandas()["h"].tolist()
    return kmv_estimate_from_hashes(merged, k)


class HistogramPartial:
    """Per-batch fixed-bin histogram partial: one (bin, n) row per
    non-empty bin.  Fixed edges (``lo + i·w``) make partials combinable
    with a plain Sum — and make the binning an exact SQL expression, so
    the quantile ESTIMATE is oracle-checkable despite being approximate.
    """

    def __init__(self, col: str, lo: float, hi: float, n_bins: int):
        self.col = col
        self.lo = float(lo)
        self.w = (float(hi) - float(lo)) / n_bins
        self.n_bins = n_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        v = batch.column(self.col).to_numpy(zero_copy_only=False).astype(
            "float64"
        )
        bins = np.clip(
            np.floor((v - self.lo) / self.w), 0, self.n_bins - 1
        ).astype("int64")
        counts = np.bincount(bins, minlength=self.n_bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )


def histogram_quantile_bins(ds, col: str, lo: float, hi: float,
                            n_bins: int = 64, q_pcts=(50, 90, 99)):
    """Approximate quantiles as BIN INDICES: for each q, the smallest
    bin whose cumulative count reaches ``ceil(q% · total)``.

    Distributed shape: per-batch histogram partials (≤ n_bins rows per
    task — combinable), one small groupby-sum, and only n_bins rows
    reach the driver; nothing scales with the corpus.  Reporting the
    integer bin index (resolution (hi-lo)/n_bins) rather than an
    interpolated float keeps the Ray/SQL comparison exact.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        HistogramPartial(col=col, lo=lo, hi=hi, n_bins=n_bins),
        batch_format="pyarrow",
    )
    bins = (
        partial.groupby("bin").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    if "bin" not in bins.columns:  # empty input drops the aggregate schema
        bins = pd.DataFrame({"bin": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64")})
    bins = bins.sort_values("bin")
    total = int(bins["n"].sum()) if len(bins) else 0
    cum = bins["n"].cumsum()
    out_q, out_bin = [], []
    for q in q_pcts:
        # integer ceil(q% of total) — bit-exact vs the SQL oracle;
        # an empty input has no bin to report: emit -1 (stable schema)
        need = (q * total + 99) // 100
        idx = int(bins.loc[cum >= need, "bin"].iloc[0]) if total else -1
        out_q.append(int(q))
        out_bin.append(idx)
    return pd.DataFrame(
        {"q_pct": out_q, "bin": out_bin, "total": [total] * len(out_q)}
    ).astype("int64")
