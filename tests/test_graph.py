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
