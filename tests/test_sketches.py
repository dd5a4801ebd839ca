"""KMV distinct-count sketch: mergeability + accuracy + exact-below-k."""

import numpy as np
import pandas as pd

from gliner_cpp_ray.stages.sketches import (
    _kmv_hashes,
    kmv_distinct_count,
    kmv_estimate_from_hashes,
)


def test_exact_when_under_k():
    hs = _kmv_hashes(range(40), 64)
    assert kmv_estimate_from_hashes(hs, 64) == 40


def test_estimate_within_tolerance():
    # bottom-k standard error ~ 1/sqrt(k-2) ~ 13% at k=64
    true_n = 5000
    hs = _kmv_hashes(range(true_n), 64)
    est = kmv_estimate_from_hashes(hs, 64)
    assert abs(est - true_n) / true_n < 0.35


def test_merge_equals_single_pass():
    """Union of per-partition partials == one-pass sketch (mergeability:
    the property that makes it a map_batches + tiny-reduce operator)."""
    values = list(range(3000))
    whole = kmv_estimate_from_hashes(_kmv_hashes(values, 64), 64)
    parts = []
    for i in range(7):
        parts.extend(_kmv_hashes(values[i::7], 64))
    assert kmv_estimate_from_hashes(parts, 64) == whole


def test_distributed_matches_local(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"user_id": np.arange(2000) % 700})
    ds = rd.from_pandas(df).repartition(6)
    est = kmv_distinct_count(ds, "user_id", k=64)
    local = kmv_estimate_from_hashes(
        _kmv_hashes((np.arange(2000) % 700).tolist(), 64), 64
    )
    assert est == local == 968  # deterministic (an unlucky-but-fixed
    # +38% draw at n=700: bottom-k stderr is ~13% at k=64, and this
    # particular md5 draw sits at 2.9 sigma — pinned exactly since the
    # sketch has no RNG)


def test_histogram_quantile_bins(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import histogram_quantile_bins

    rng = np.random.default_rng(12)
    vals = rng.uniform(0, 1000, 4000)
    df = pd.DataFrame({"v": vals})
    out = histogram_quantile_bins(
        rd.from_pandas(df).repartition(6), "v", lo=0.0, hi=1000.0,
        n_bins=50, q_pcts=(50, 90, 99),
    )
    # partitioning-independent (combinable partials)
    out2 = histogram_quantile_bins(
        rd.from_pandas(df).repartition(13), "v", lo=0.0, hi=1000.0,
        n_bins=50, q_pcts=(50, 90, 99),
    )
    pd.testing.assert_frame_equal(out, out2)
    assert out["total"].tolist() == [4000] * 3
    # bin index must bracket the exact quantile (bin width = 20)
    for q_pct, bin_idx in zip(out["q_pct"], out["bin"]):
        exact = np.quantile(vals, q_pct / 100)
        assert bin_idx * 20 <= exact + 20 and (bin_idx + 1) * 20 >= exact - 20


def test_histogram_quantile_bins_empty_input(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import histogram_quantile_bins

    empty = pd.DataFrame({"v": pd.Series(dtype="float64")})
    out = histogram_quantile_bins(
        rd.from_pandas(empty), "v", lo=0.0, hi=100.0, n_bins=10,
    )
    assert out["bin"].tolist() == [-1, -1, -1]
    assert out["total"].tolist() == [0, 0, 0]


def test_grouped_histogram_quantiles(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import grouped_histogram_quantile_bins

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 3000),
            "v": rng.uniform(0, 100, 3000),
        }
    )
    out = grouped_histogram_quantile_bins(
        rd.from_pandas(df).repartition(6), "g", "v", lo=0.0, hi=100.0,
        n_bins=10, q_pcts=(50, 90), n_buckets=4,
    ).to_pandas()
    # exact replication: per group, smallest bin whose cumcount reaches
    # ceil(q% of the group total)
    for (g, q), row in out.set_index(["g", "q_pct"]).iterrows():
        vals = df.loc[df["g"] == g, "v"]
        bins = np.clip(np.floor(vals / 10.0), 0, 9).astype(int)
        counts = np.bincount(bins, minlength=10)
        total = counts.sum()
        need = (q * total + 99) // 100
        exp_bin = int(np.argmax(counts.cumsum() >= need))
        assert row["bin"] == exp_bin, (g, q)
        assert row["total"] == total
    assert len(out) == 6  # 3 groups x 2 quantiles
    # uniform data: p50 lands mid-range, p90 high
    assert set(out.loc[out["q_pct"] == 50, "bin"]) <= {4, 5}
    assert set(out.loc[out["q_pct"] == 90, "bin"]) <= {8, 9}


def test_cms_estimates_upper_bound_and_exactness(ray_session):
    """CM estimates are exact when no collisions occur (w >> vocab) and
    are always >= the true count (classic upper-bound property)."""
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import cms_term_estimates

    docs = pd.DataFrame(
        {
            "text": [
                "apple banana apple",
                "banana cherry",
                "  apple  ",
                "",
                "durian durian durian durian",
            ]
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    got = (
        cms_term_estimates(ds, ["apple", "banana", "cherry", "absent"], w=4096)
        .to_pandas()
        .set_index("term")["est_n"]
        .to_dict()
    )
    true = {"absent": 0, "apple": 3, "banana": 2, "cherry": 1}
    for t, n in true.items():
        assert got[t] >= n  # never underestimates
    # with w=4096 and a 5-word vocabulary, collisions are (deterministically)
    # absent for this seed — estimates are exact
    assert got == true


def test_cms_merge_is_order_independent(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import cms_build

    docs = pd.DataFrame({"text": [f"w{i % 7} filler" for i in range(100)]})
    m1 = cms_build(rd.from_pandas(docs).repartition(1))
    m8 = cms_build(rd.from_pandas(docs).repartition(8))
    assert (m1 == m8).all()


def test_kmv_overlap_exact_when_unsaturated(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import kmv_overlap

    a = rd.from_arrow(pa.table({"x": pa.array(list(range(20)) * 3, pa.int64())}))
    b = rd.from_arrow(pa.table({"y": pa.array(list(range(10, 40)), pa.int64())}))
    est = kmv_overlap(a, b, "x", "y", k=64)
    assert est["est_a"] == 20 and est["est_b"] == 30
    assert est["est_union"] == 40 and est["est_intersection"] == 10


def test_kmv_overlap_saturated_within_tolerance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import kmv_overlap

    n, k = 3000, 256
    a = rd.from_arrow(pa.table({"x": pa.array(range(n), pa.int64())}))
    b = rd.from_arrow(
        pa.table({"x": pa.array(range(n // 2, n + n // 2), pa.int64())})
    )
    est = kmv_overlap(a, b, "x", "x", k=k)
    # bottom-k relative error ~ 1/sqrt(k); allow 4 sigma
    tol = 4 / (k ** 0.5)
    assert abs(est["est_union"] - 1.5 * n) < 1.5 * n * tol
    assert abs(est["est_intersection"] - n // 2) < n // 2 * (2 * tol)


def test_equiwidth_histogram_integer_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import equiwidth_histogram

    # lo=0, hi=99 -> w = 99//4 + 1 = 25; bins [0,25),[25,50),[50,75),[75,100)
    vals = list(range(100))
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    rows = {r["bin"]: r for r in equiwidth_histogram(ds, "x", 4).take_all()}
    assert {b: r["n"] for b, r in rows.items()} == {0: 25, 1: 25, 2: 25, 3: 25}
    assert rows[2]["bin_lo"] == 50
    assert sum(r["n"] for r in rows.values()) == len(vals)


def test_equiwidth_histogram_single_value(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import equiwidth_histogram

    ds = rd.from_arrow(pa.table({"x": pa.array([7, 7, 7], pa.int64())}))
    (row,) = equiwidth_histogram(ds, "x", 4).take_all()
    assert (row["bin"], row["bin_lo"], row["n"]) == (0, 7, 3)


def test_exact_order_statistic_matches_sorted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import exact_order_statistic

    rng = np.random.RandomState(7)
    # wide int64 range + heavy duplicates force several refinement
    # rounds with tiny n_bins
    vals = np.concatenate(
        [
            rng.randint(-(10**15), 10**15, 500),
            np.full(200, 123_456_789),
        ]
    )
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    srt = np.sort(vals)
    for rank in [0, 1, len(vals) // 2, len(vals) - 1]:
        got = exact_order_statistic(ds, "x", rank=rank, n_bins=16)
        assert got["value"] == srt[rank], rank
    med = exact_order_statistic(ds, "x", n_bins=16)
    assert med["value"] == srt[(len(vals) - 1) // 2]
    assert med["n"] == len(vals)


def test_exact_order_statistic_rejects_bad_rank(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import exact_order_statistic

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError):
        exact_order_statistic(ds, "x", rank=2)


def test_grouped_mad_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import grouped_mad

    rng = np.random.RandomState(5)
    k = rng.randint(0, 8, 300).astype(np.int64)
    v = rng.randint(-1000, 1000, 300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v}))
    got = {
        r["k"]: (r["median"], r["mad"])
        for r in grouped_mad(ds, ["k"], "v").take_all()
    }

    def lomed(a):
        return int(np.sort(a)[(len(a) - 1) // 2])

    for key in np.unique(k):
        vals = v[k == key]
        m = lomed(vals)
        assert got[int(key)] == (m, lomed(np.abs(vals - m))), key


def test_hll_register_merge_equals_single_pass(ray_session):
    """HLL registers are a max-merge sketch: the distributed per-batch
    partial merge must equal a single-process register build, and the
    estimate must be within the theoretical ~1.04/sqrt(16)=26%% band."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import (
        _HLL_REST_BITS,
        _hll_rho,
        _md5_u60,
        hll_distinct_count,
        hll_estimate_from_registers,
    )

    vals = np.arange(5000, dtype=np.int64) % 1200  # 1200 distinct
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(7)
    est = hll_distinct_count(ds, "v")

    regs = {}
    mask = (1 << _HLL_REST_BITS) - 1
    for v in set(vals.tolist()):
        h = _md5_u60(str(v))
        regs[h >> _HLL_REST_BITS] = max(
            regs.get(h >> _HLL_REST_BITS, 0), _hll_rho(h & mask)
        )
    assert est == hll_estimate_from_registers(regs)
    assert abs(est - 1200) / 1200 < 0.30


def test_hll_rho_saturation():
    from gliner_cpp_ray.stages.sketches import _HLL_REST_BITS, _hll_rho

    assert _hll_rho(0) == _HLL_REST_BITS + 1
    assert _hll_rho(1) == _HLL_REST_BITS
    assert _hll_rho(1 << (_HLL_REST_BITS - 1)) == 1


def test_order_statistics_survive_full_int64_span(ray_session):
    """A column spanning more than int64 (min near -2^62, max near
    +2^62) used to wrap in the (v - lo) // w binning and misbin; the
    uint64 _safe_bins path must select exactly as a sort does."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import (
        equiwidth_histogram,
        exact_multi_order_statistic,
        exact_order_statistic,
        exact_weighted_order_statistic,
    )

    vals = np.array(
        [-(2**62) - 3, -(2**61), -5, 0, 7, 2**60, 2**62 + 9], np.int64
    )
    srt = np.sort(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))

    for rank in [0, 3, len(vals) - 1]:
        got = exact_order_statistic(ds, "x", rank=rank, n_bins=4)
        assert got["value"] == srt[rank], rank

    multi = exact_multi_order_statistic(ds, "x", [0, 2, 6], n_bins=4)
    assert multi == [int(srt[0]), int(srt[2]), int(srt[6])]

    wds = rd.from_arrow(
        pa.table(
            {
                "x": pa.array(vals, pa.int64()),
                "w": pa.array(np.ones(len(vals), np.int64)),
            }
        )
    )
    wm = exact_weighted_order_statistic(wds, "x", "w", n_bins=4)
    # target_w = (7+1)//2 = 4 -> 4th smallest by weight = srt[3]
    assert wm["value"] == int(srt[3])

    hist = equiwidth_histogram(ds, "x", 4).take_all()
    assert sum(r["n"] for r in hist) == len(vals)
    assert all(0 <= r["bin"] < 4 for r in hist)
    assert min(r["bin_lo"] for r in hist) == int(srt[0])
