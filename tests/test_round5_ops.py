"""Unit tests for the round-5 primitives: range-partitioned merge join
and subsequence-pattern support."""

import numpy as np
import pyarrow as pa
import pytest


def test_range_merge_join_matches_hash_join(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import range_merge_join

    rng = np.random.RandomState(11)
    lk = rng.randint(0, 200, 2000).astype(np.int64)
    rk = np.arange(0, 200, 2, dtype=np.int64)  # half the keys match
    left = rd.from_arrow(
        pa.table({"k": lk, "lv": np.arange(2000, dtype=np.int64)})
    ).repartition(5)
    right = rd.from_arrow(
        pa.table({"k": rk, "rv": rk * 10})
    ).repartition(3)

    got = (
        range_merge_join(left, right, "k", n_parts=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.DataFrame({"k": lk, "lv": np.arange(2000)})
        .merge(pd.DataFrame({"k": rk, "rv": rk * 10}), on="k")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["lv"].to_numpy() == want["lv"].to_numpy()).all()
    assert (got["rv"].to_numpy() == want["rv"].to_numpy()).all()


def test_range_merge_join_duplicate_keys_cross_product(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import range_merge_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "lv": pa.array([10, 11, 20], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 3], pa.int64()),
                  "rv": pa.array([100, 101, 300], pa.int64())})
    )
    got = range_merge_join(left, right, "k", n_parts=2).to_pandas()
    assert len(got) == 4  # 2x2 for key 1, nothing for 2 or 3
    assert set(zip(got["lv"], got["rv"])) == {
        (10, 100), (10, 101), (11, 100), (11, 101)
    }


def _brute_triples(seq, A):
    out = set()
    n = len(seq)
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                out.add((seq[i], seq[j], seq[k]))
    return out


def test_subsequence_triple_support_matches_bruteforce(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import subsequence_triple_support

    rng = np.random.RandomState(5)
    A = 4
    rows = {"uid": [], "ts": [], "eid": [], "code": []}
    truth = {}
    eid = 0
    for uid in range(30):
        L = rng.randint(0, 12)
        seq = rng.randint(0, A, L).tolist()
        for t, c in enumerate(seq):
            rows["uid"].append(uid)
            rows["ts"].append(t)
            rows["eid"].append(eid)
            rows["code"].append(c)
            eid += 1
        for trip in _brute_triples(seq, A):
            truth[trip] = truth.get(trip, 0) + 1

    ds = rd.from_arrow(
        pa.table(
            {
                "uid": pa.array(rows["uid"], pa.int64()),
                "ts": pa.array(rows["ts"], pa.int64()),
                "eid": pa.array(rows["eid"], pa.int64()),
                "code": pa.array(rows["code"], pa.int64()),
            }
        )
    ).repartition(4)
    got = {
        (r["c1"], r["c2"], r["c3"]): r["n_keys"]
        for r in subsequence_triple_support(
            ds, ["uid"], "ts", "eid", "code", A
        ).take_all()
    }
    assert got == truth


def test_subsequence_triple_support_rejects_wide_alphabet(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import subsequence_triple_support

    ds = rd.from_arrow(pa.table({"uid": [1], "ts": [1], "eid": [1],
                                 "code": [0]}))
    with pytest.raises(ValueError):
        subsequence_triple_support(ds, ["uid"], "ts", "eid", "code", 63)
