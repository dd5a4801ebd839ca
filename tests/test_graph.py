"""Distributed CC (min-label propagation) vs the driver union-find."""

import numpy as np
import pandas as pd
import pytest

from gliner_cpp_ray.state.union_find import connected_components


def _check(edges, ray_session, max_rounds=32):
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import cc_label_propagation

    df = pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    got = (
        cc_label_propagation(rd.from_pandas(df).repartition(3),
                             max_rounds=max_rounds)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    want = connected_components(edges)
    # union-find roots are min-ids (union picks the smaller rep), so the
    # two contracts line up exactly
    assert got == {int(k): int(v) for k, v in want.items()}


def test_cc_two_triangles_and_bridge(ray_session):
    _check([(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)], ray_session)


def test_cc_separate_components_and_singletons_via_self_edges(ray_session):
    _check([(5, 6), (7, 7), (20, 21), (21, 22), (23, 22)], ray_session)


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(3)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 120, size=(150, 2))]
    _check(edges, ray_session)


def test_cc_path_graph_needs_diameter_rounds(ray_session):
    # a 12-node path: min label walks one hop per round
    _check([(i, i + 1) for i in range(11)], ray_session, max_rounds=16)


def test_cc_nonconvergence_raises(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import cc_label_propagation

    df = pd.DataFrame([(i, i + 1) for i in range(10)], columns=["a", "b"])
    with pytest.raises(RuntimeError):
        cc_label_propagation(rd.from_pandas(df), max_rounds=2)


def test_cc_empty_edge_list(ray_session):
    """Zero pairs (plausible at small corpora / tight thresholds) must
    yield an empty labeling, not a TypeError from sum-over-empty."""
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import cc_label_propagation

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    out = cc_label_propagation(rd.from_pandas(empty))
    assert out.count() == 0


# ---------------------------------------------------------------- BFS


def _bfs_reference(edges, seeds, max_hops):
    """Driver-side reference BFS (dict adjacency, queue)."""
    adj = {}
    for s, d in edges:
        adj.setdefault(int(s), []).append(int(d))
    dist = {int(s): 0 for s in seeds}
    frontier = list(dist)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def _check_bfs(edges, seeds, max_hops, ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import bfs_hop_distance

    edf = pd.DataFrame(edges, columns=["src_id", "dst_id"]).astype("int64")
    sdf = pd.DataFrame({"node_id": list(seeds)}).astype("int64")
    got = (
        bfs_hop_distance(
            rd.from_pandas(edf).repartition(3),
            rd.from_pandas(sdf),
            max_hops=max_hops,
        )
        .to_pandas()
        .set_index("node_id")["hops"]
        .to_dict()
    )
    assert got == _bfs_reference(edges, seeds, max_hops)


def test_bfs_chain_cap_and_multi_seed(ray_session):
    # chain 0->1->..->9, seeds {0, 7}: cap at 3 hops; 7 pulls the tail in
    edges = [(i, i + 1) for i in range(9)]
    _check_bfs(edges, [0, 7], 3, ray_session)


def test_bfs_cycle_and_unreached(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (5, 6)]  # 5/6 unreachable from seed
    _check_bfs(edges, [0], 4, ray_session)


def test_bfs_directedness(ray_session):
    # edges point INTO the seed: nothing but the seed is labeled
    edges = [(1, 0), (2, 0), (3, 1)]
    _check_bfs(edges, [0], 4, ray_session)


def test_bfs_random_graph_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    edges = [tuple(p) for p in rng.integers(0, 80, size=(200, 2))]
    _check_bfs(edges, [0, 13, 26], 3, ray_session)


# --------------------------------------------------------------- SSSP


def _sssp_reference(edges, seeds, rounds):
    """Driver-side reference: ``rounds`` synchronous Bellman-Ford
    relaxations (the oracle semantics weighted_sssp must match)."""
    dist = {int(s): 0 for s in seeds}
    for _ in range(rounds):
        cur = dict(dist)
        for u, v, w in edges:
            du = cur.get(int(u))
            if du is not None and du + int(w) < dist.get(int(v), float("inf")):
                dist[int(v)] = du + int(w)
    return dist


def _check_sssp(edges, seeds, rounds, ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import weighted_sssp

    edf = pd.DataFrame(edges, columns=["u", "v", "w"]).astype("int64")
    sdf = pd.DataFrame({"node_id": list(seeds)}).astype("int64")
    got = (
        weighted_sssp(
            rd.from_pandas(edf).repartition(3),
            rd.from_pandas(sdf),
            rounds=rounds,
        )
        .to_pandas()
        .set_index("node_id")["dist"]
        .to_dict()
    )
    assert got == _sssp_reference(edges, seeds, rounds)


def test_sssp_cheap_detour_beats_direct_edge(ray_session):
    # direct 0->2 costs 10; detour 0->1->2 costs 3 but needs 2 hops
    edges = [(0, 2, 10), (0, 1, 1), (1, 2, 2)]
    assert _sssp_reference(edges, [0], 1)[2] == 10  # 1 round: direct only
    _check_sssp(edges, [0], 1, ray_session)
    _check_sssp(edges, [0], 2, ray_session)  # 2 rounds: detour wins (3)


def test_sssp_multi_seed_cycle_and_unreached(ray_session):
    edges = [(0, 1, 5), (1, 2, 5), (2, 0, 1), (3, 4, 2), (9, 0, 1)]
    _check_sssp(edges, [0, 3], 4, ray_session)  # 9 stays unreached


def test_sssp_round_cap_is_exact(ray_session):
    # chain of 6 unit edges: round cap k labels exactly k+1 nodes
    edges = [(i, i + 1, 1) for i in range(6)]
    for k in (1, 3, 6):
        _check_sssp(edges, [0], k, ray_session)


def test_sssp_random_graph_matches_reference(ray_session):
    rng = np.random.default_rng(11)
    uv = rng.integers(0, 60, size=(150, 2))
    w = rng.integers(1, 9, size=(150, 1))
    edges = [tuple(r) for r in np.hstack([uv, w])]
    _check_sssp(edges, [0, 17], 3, ray_session)
