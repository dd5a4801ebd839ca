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
