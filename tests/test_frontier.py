"""Pareto frontier: distributed aggregate vs O(n²) brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rand_df(n, k, lo=0, hi=40, seed=11):
    rng = np.random.default_rng(seed)
    d = {f"c{i}": rng.integers(lo, hi, n).astype(np.int64) for i in range(k)}
    d["rid"] = np.arange(n, dtype=np.int64)
    return pd.DataFrame(d)


def test_skyline2_mask_matches_bruteforce():
    from gliner_cpp_ray.stages.frontier import (
        pareto_frontier_reference,
        skyline2_mask,
    )

    df = _rand_df(500, 2, hi=25)  # small domain -> many ties/duplicates
    got = skyline2_mask(df["c0"].to_numpy(), df["c1"].to_numpy())
    want = pareto_frontier_reference(df, ["c0", "c1"])
    assert (got == want).all()


def test_skyline_nd_mask_matches_bruteforce():
    from gliner_cpp_ray.stages.frontier import (
        pareto_frontier_reference,
        skyline_nd_mask,
    )

    df = _rand_df(400, 3, hi=8, seed=3)
    got = skyline_nd_mask([df[f"c{i}"].to_numpy() for i in range(3)])
    want = pareto_frontier_reference(df, ["c0", "c1", "c2"])
    assert (got == want).all()


def test_duplicate_frontier_points_all_kept():
    from gliner_cpp_ray.stages.frontier import skyline2_mask

    x = np.array([5, 5, 3, 3, 1], np.int64)
    y = np.array([9, 9, 9, 2, 10], np.int64)
    # (5,9) twice: neither dominates the other -> both kept.
    # (3,9): dominated by (5,9) (strict in x).  (3,2): dominated.
    # (1,10): top y -> kept.
    assert skyline2_mask(x, y).tolist() == [True, True, False, False, True]


def test_pareto_frontier_distributed(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.frontier import (
        pareto_frontier,
        pareto_frontier_reference,
    )

    df = _rand_df(4000, 2, hi=60, seed=29)
    got = (
        pareto_frontier(
            rd.from_pandas(df).repartition(9), ["c0", "c1"], ["rid"]
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = df[pareto_frontier_reference(df, ["c0", "c1"])]
    want = (
        want[["rid", "c0", "c1"]].sort_values("rid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
