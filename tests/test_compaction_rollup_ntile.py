"""Latest-wins compaction (stages/compaction.py), ROLLUP derivation
(stages/rollup.py), exact global NTILE (stages/packing.py).  E2E oracle
equivalence is covered by test_queries_oracle.py; these pin semantics
on edge cases: ties, all-equal values, N < tiles, multi-level rollup.
"""

import numpy as np
import pandas as pd
import ray.data as rd


def test_latest_by_key_ties_and_batches(ray_session):
    from gliner_cpp_ray.stages.compaction import latest_by_key

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": [5, 9, 9, 1, 1, 7],
            "id": [10, 11, 12, 20, 21, 30],
            "payload": ["a", "b", "c", "d", "e", "f"],
        }
    )
    got = (
        latest_by_key(rd.from_pandas(df).repartition(4), "k", ["ts", "id"],
                      n_buckets=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # ties on ts resolved by larger id
    assert got["id"].tolist() == [12, 21, 30]
    assert got["payload"].tolist() == ["c", "e", "f"]
    assert list(got.columns) == ["k", "ts", "id", "payload"]


def test_rollup_counts_three_levels(ray_session):
    from gliner_cpp_ray.stages.rollup import rollup_counts

    finest = pd.DataFrame(
        {
            "a": ["x", "x", "y"],
            "b": [1, 2, 1],
            "n": [3, 4, 5],
        }
    )
    got = (
        rollup_counts(rd.from_pandas(finest), keys=["a", "b"])
        .to_pandas()
        .set_index(["a", "b"])["n"]
        .to_dict()
    )
    assert got == {
        ("x", 1): 3, ("x", 2): 4, ("y", 1): 5,   # finest passthrough
        ("x", -1): 7, ("y", -1): 5,              # per-a level
        ("__all__", -1): 12,                     # grand total
    }


def _sql_ntile(n: int, t: int) -> list[int]:
    q, rem = divmod(n, t)
    out = []
    for tile in range(1, t + 1):
        out += [tile] * (q + 1 if tile <= rem else q)
    return out


def test_ntile_matches_sql_rule(ray_session):
    from gliner_cpp_ray.stages.packing import ntile_global

    rng = np.random.default_rng(7)
    for n, tiles in [(10, 4), (3, 5), (16, 4), (7, 3)]:
        vals = rng.integers(0, 50, n)  # duplicates likely
        df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": vals})
        got = (
            ntile_global(
                rd.from_pandas(df).repartition(3), "v", "id", tiles,
                n_buckets=4,
            )
            .to_pandas()
        )
        order = df.sort_values(["v", "id"])["id"].tolist()
        want = dict(zip(order, _sql_ntile(n, tiles)))
        assert {int(r.id): int(r.tile) for r in got.itertuples()} == want


def test_ntile_all_equal_values(ray_session):
    from gliner_cpp_ray.stages.packing import ntile_global

    df = pd.DataFrame({"id": np.arange(9, dtype=np.int64),
                       "v": np.full(9, 42, dtype=np.int64)})
    got = (
        ntile_global(rd.from_pandas(df).repartition(2), "v", "id", 4)
        .to_pandas()
        .sort_values("id")
    )
    # single degenerate range bucket; order falls back to id
    assert got["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3, 4, 4]


def test_morton_interleave_known_values():
    from gliner_cpp_ray.stages.layout import morton_interleave16

    x = np.array([0b101, 0, 0xFFFF, 3])
    y = np.array([0b011, 1, 0xFFFF, 0])
    z = morton_interleave16(x, y)
    # x bits land even (pos 0,2,4 <- 1,0,1), y odd (pos 1,3,5 <- 1,1,0):
    # z = 1 + 2 + 8 + 16 = 27
    assert z[0] == 27
    assert z[1] == 2          # y bit 0 -> position 1
    assert z[2] == (1 << 32) - 1
    assert z[3] == 0b0101     # x bits 0,1 -> positions 0,2


def test_zorder_file_assignment(ray_session):
    from gliner_cpp_ray.stages.layout import (
        morton_interleave16, zorder_file_assignment)

    rng = np.random.default_rng(3)
    n = 50
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 1 << 16, n),
            "y": rng.integers(0, 1 << 16, n),
        }
    )
    got = (
        zorder_file_assignment(
            rd.from_pandas(df).repartition(3), "x", "y", "id",
            rows_per_file=7, n_buckets=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    z = morton_interleave16(df["x"].to_numpy(), df["y"].to_numpy())
    order = np.lexsort((df["id"].to_numpy(), z))
    want_file = np.empty(n, dtype=np.int64)
    want_file[order] = np.arange(n) // 7
    assert got["zval"].tolist() == z.tolist()
    assert got["file_id"].tolist() == want_file.tolist()


def test_snapshot_diff_all_branches(ray_session):
    """added / removed / changed emitted; identical states dropped;
    sentinel -1 on the absent side; int64 dtypes throughout."""
    import ray.data as rd

    from gliner_cpp_ray.stages.diff import snapshot_diff

    old = pd.DataFrame(
        {"k": np.array([1, 2, 3, 4], np.int64),
         "v": np.array([10, 20, 30, 40], np.int64)}
    )
    new = pd.DataFrame(
        {"k": np.array([2, 3, 5], np.int64),
         "v": np.array([20, 31, 50], np.int64)}
    )
    out = (
        snapshot_diff(
            rd.from_pandas(old).repartition(3),
            rd.from_pandas(new).repartition(2),
            "k", ["v"], n_buckets=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1 removed, k=2 unchanged (dropped), k=3 changed, k=4 removed,
    # k=5 added
    assert out["k"].tolist() == [1, 3, 4, 5]
    assert out["change"].tolist() == ["removed", "changed", "removed", "added"]
    assert out["old_v"].tolist() == [10, 30, 40, -1]
    assert out["new_v"].tolist() == [-1, 31, -1, 50]
    assert all(out[c].dtype == np.int64 for c in ("k", "old_v", "new_v"))
