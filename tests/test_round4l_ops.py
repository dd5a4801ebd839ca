"""Unit tests for the round-4l operators: interval-union coverage,
exact OLS trend slopes, and the global-threshold floor equivalence."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _mini_sf(tmp_path, events: pd.DataFrame) -> str:
    """A minimal sf_dir containing just an events table."""
    d = str(tmp_path)
    t = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            "ts": pa.array(events["ts"]).cast(pa.timestamp("us")),
            "user_id": pa.array(events["user_id"], pa.int64()),
            "event_type": pa.array(events["event_type"], pa.string()),
            "value": pa.array(
                np.zeros(len(events), np.float64), pa.float64()
            ),
            "props": pa.array([""] * len(events), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_coverage_merges_overlaps_and_counts_gaps(ray_session, tmp_path):
    from gliner_cpp_ray.pipelines.queries import q_user_coverage_time

    S = 300 * 1_000_000  # span in µs
    base = pd.Timestamp("2024-01-01").value // 1000
    ev = pd.DataFrame(
        {
            # user 1: overlap (100s apart), then a far gap -> 400s + 300s
            # user 2: duplicate ts -> one span only
            "ts": pd.to_datetime(
                [
                    base,
                    base + 100 * 1_000_000,
                    base + 10_000 * 1_000_000,
                    base,
                    base,
                ],
                unit="us",
            ),
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["view"] * 5,
        }
    )
    sf = _mini_sf(tmp_path, ev)
    got = (
        q_user_coverage_time(sf)
        .to_pandas()
        .set_index("user_id")["covered_us"]
        .to_dict()
    )
    assert got[1] == (100 * 1_000_000 + S) + S
    assert got[2] == S


def test_coverage_adjacent_intervals_do_not_double_count(
    ray_session, tmp_path
):
    from gliner_cpp_ray.pipelines.queries import q_user_coverage_time

    base = pd.Timestamp("2024-01-01").value // 1000
    # exactly touching: [0,300) + [300,600) -> 600s, no overlap, no gap
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [base, base + 300 * 1_000_000], unit="us"
            ),
            "user_id": [7, 7],
            "event_type": ["view", "view"],
        }
    )
    got = q_user_coverage_time(_mini_sf(tmp_path, ev)).to_pandas()
    assert got["covered_us"].iloc[0] == 600 * 1_000_000


def test_trend_slope_exact_on_linear_counts(ray_session, tmp_path):
    from gliner_cpp_ray.pipelines.queries import q_event_type_trend_slopes

    base = pd.Timestamp("2024-01-01").value // 1000
    HR = 3600 * 1_000_000
    # type "up": k+1 events in hour k for k=0..3 -> slope exactly 1
    ts, ut = [], []
    for k in range(4):
        for _ in range(k + 1):
            ts.append(base + k * HR)
            ut.append("up")
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": [0] * len(ts),
            "event_type": ut,
        }
    )
    got = q_event_type_trend_slopes(_mini_sf(tmp_path, ev))
    row = got[got["event_type"] == "up"].iloc[0]
    assert row["n_hours"] == 4
    num, den = int(row["slope_num"]), int(row["slope_den"])
    assert den > 0 and num == den  # slope exactly 1 count/hour


def test_threshold_floor_compare_equivalent_to_rational():
    # v > a/b  <=>  v > floor(a/b)  for integers v, a >= 0, b > 0
    rng = np.random.default_rng(4)
    for _ in range(2000):
        a = int(rng.integers(0, 10**12))
        b = int(rng.integers(1, 10**6))
        v = int(rng.integers(0, max(1, (a // b) * 2 + 2)))
        assert (v * b > a) == (v > a // b)


def test_weighted_order_statistic_small_cases(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import exact_weighted_order_statistic

    t = pa.table(
        {
            "v": pa.array([10, 20, 30], pa.int64()),
            "w": pa.array([1, 1, 10], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    # total 12, target (12+1)//2 = 6 -> cum: 10->1, 20->2, 30->12
    est = exact_weighted_order_statistic(ds, "v", "w")
    assert est == {"value": 30, "target_w": 6, "total_w": 12}
    # all weight on the smallest value
    t2 = pa.table(
        {
            "v": pa.array([5, 100], pa.int64()),
            "w": pa.array([100, 1], pa.int64()),
        }
    )
    est2 = exact_weighted_order_statistic(rd.from_arrow(t2), "v", "w")
    assert est2["value"] == 5
    # explicit extreme targets
    assert exact_weighted_order_statistic(
        rd.from_arrow(t), "v", "w", target_w=1
    )["value"] == 10
    assert exact_weighted_order_statistic(
        rd.from_arrow(t), "v", "w", target_w=12
    )["value"] == 30


def test_weighted_order_statistic_matches_unweighted_on_unit_weights(
    ray_session,
):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import (
        exact_order_statistic,
        exact_weighted_order_statistic,
    )

    rng = np.random.default_rng(11)
    v = rng.integers(-(10**9), 10**9, size=500).astype(np.int64)
    t = pa.table(
        {"v": pa.array(v), "w": pa.array(np.ones(500, np.int64))}
    )
    ds = rd.from_arrow(t)
    # unit weights: weighted target K == unweighted rank K-1
    got = exact_weighted_order_statistic(ds, "v", "w", target_w=250)
    want = exact_order_statistic(ds, "v", rank=249)
    assert got["value"] == want["value"] == int(np.sort(v)[249])


def test_multi_order_statistic_matches_sorted_array(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import exact_multi_order_statistic

    rng = np.random.default_rng(3)
    # duplicate-heavy: values from a tiny domain force shared bins
    v = rng.integers(0, 50, size=1000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
    ranks = [0, 1, 123, 500, 999]
    got = exact_multi_order_statistic(ds, "v", ranks)
    want = [int(np.sort(v)[r]) for r in ranks]
    assert got == want


def test_multi_order_statistic_wide_domain(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import exact_multi_order_statistic

    rng = np.random.default_rng(9)
    v = rng.integers(-(2**62), 2**62, size=300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
    ranks = [i * 300 // 8 for i in range(1, 8)]
    got = exact_multi_order_statistic(ds, "v", ranks)
    assert got == [int(np.sort(v)[r]) for r in ranks]


def test_peak_window_crosses_midnight(ray_session, tmp_path):
    """The winning 5-min window starts before a day boundary and its
    events continue after it — only the halo (ghost-cell) copies make
    the count exact."""
    from gliner_cpp_ray.pipelines.queries import q_events_peak_5min

    mid = pd.Timestamp("2024-01-02").value // 1000  # midnight boundary
    # anchor 100s before midnight: window [mid-100s, mid+200s) holds 5
    # events; any same-day-only count would see at most 2
    ts = [
        mid - 100 * 1_000_000,
        mid - 50 * 1_000_000,
        mid + 10 * 1_000_000,
        mid + 60 * 1_000_000,
        mid + 199 * 1_000_000,
        # decoy cluster of 3 well inside day 1
        mid - 40_000 * 1_000_000,
        mid - 39_990 * 1_000_000,
        mid - 39_980 * 1_000_000,
    ]
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": [1] * len(ts),
            "event_type": ["view"] * len(ts),
        }
    )
    got = q_events_peak_5min(_mini_sf(tmp_path, ev))
    assert int(got["n_events"].iloc[0]) == 5
    assert int(got["window_start_us"].iloc[0]) == mid - 100 * 1_000_000


def test_partition_checksums_match_direct_xor(ray_session):
    """XOR partials merged across buckets equal a single-pass digest."""
    import hashlib

    from gliner_cpp_ray.pipelines.queries import q_orders_partition_checksums

    sf = "/root/testdata/sf0.001"
    got = (
        q_orders_partition_checksums(sf)
        .to_pandas()
        .set_index("part_id")
        .sort_index()
    )
    df = pd.read_parquet(f"{sf}/orders.parquet")
    import pyarrow as _pa

    price = (df["o_totalprice"] * 1_000_000.0).apply(np.floor).astype(np.int64)
    ts = df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    s = (
        df["o_orderkey"].astype(str) + "|" + df["o_custkey"].astype(str)
        + "|" + df["o_orderstatus"] + "|" + price.astype(str)
        + "|" + ts.astype(str) + "|" + df["o_orderpriority"]
    )
    h = np.fromiter(
        (int(hashlib.md5(x.encode()).hexdigest()[:15], 16) for x in s),
        np.int64, len(s),
    )
    part = df["o_orderkey"].to_numpy() // 4096
    want = pd.DataFrame({"p": part, "h": h}).groupby("p")["h"].agg(
        lambda x: int(np.bitwise_xor.reduce(x.to_numpy()))
    )
    for p, row in got.iterrows():
        assert row["checksum"] == want.loc[p]


def test_islands_rank_pairing_small_case(ray_session, tmp_path):
    """Keys {1,2,3, 7, 9,10} (status F) -> islands of len 3, 1, 2."""
    import os

    import pyarrow.parquet as _pq

    from gliner_cpp_ray.pipelines.queries import q_orderkey_islands

    keys = [1, 2, 3, 7, 9, 10, 20]
    status = ["F"] * 6 + ["O"]  # key 20 filtered out
    t = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([0] * 7, pa.int64()),
            "o_orderstatus": pa.array(status, pa.string()),
            "o_totalprice": pa.array([1.0] * 7, pa.float64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1995-01-01")] * 7
            ).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 7, pa.string()),
        }
    )
    _pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))
    got = (
        q_orderkey_islands(str(tmp_path))
        .to_pandas()
        .set_index("island_len")["n_islands"]
        .to_dict()
    )
    assert got == {3: 1, 1: 1, 2: 1}
