"""Unit tests for the link-graph operators (stages/linkgraph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from gliner_cpp_ray.stages.linkgraph import (
    _src_ids,
    extract_page_links,
    page_link_edges,
    pagerank,
)


def _batch(urls, htmls):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array([h.encode() for h in htmls], pa.binary()),
        }
    )


def test_extract_attributes_links_to_the_right_source_row():
    b = _batch(
        [
            "https://site001.example.org/p/00000001",
            "https://site002.example.org/p/00000002",
            "https://site003.example.org/p/00000003",
        ],
        [
            '<a href="https://x/p/00000002">a</a> <a href="https://x/p/00000002">b</a>',
            '<nav><a href="/">Home</a></nav>no page links',
            '<a href="https://x/p/00000001">c</a>',
        ],
    )
    t = extract_page_links(b).to_pandas().sort_values(["src_id", "dst_id"])
    assert t.values.tolist() == [[1, 2, 2], [3, 1, 1]]


def test_extract_empty_batch():
    t = extract_page_links(_batch([], []))
    assert t.num_rows == 0
    assert t.schema.names == ["src_id", "dst_id", "n"]


def test_src_ids_parse():
    ids = _src_ids(pa.array(["https://a/p/00000042", "https://b/p/00000007"]))
    assert ids.tolist() == [42, 7]


def _pagerank_numpy(edges, n_nodes, n_iters=3):
    """Literal integer-arithmetic reference."""
    edges = sorted(set(edges))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1_000_000 for v in range(n_nodes)}
    for _ in range(n_iters):
        nxt = {v: 150_000 for v in range(n_nodes)}
        for s, d in edges:
            nxt[d] += (r[s] * 17) // (20 * deg[s])
        r = nxt
    return r


@pytest.mark.parametrize("seed", [0, 1])
def test_pagerank_matches_integer_reference(ray_session, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 40
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(120)
    ]
    uniq = sorted(set(edges))
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in uniq], pa.int64()),
                "dst_id": pa.array([e[1] for e in uniq], pa.int64()),
            }
        )
    )
    nodes_ds = rd.from_arrow(
        pa.table({"node_id": pa.array(list(range(n)), pa.int64())})
    )
    got = (
        pagerank(edges_ds, nodes_ds, n_iters=3)
        .to_pandas()
        .set_index("node_id")["rank_micro"]
        .to_dict()
    )
    want = _pagerank_numpy(edges, n)
    assert got == want


def test_pagerank_no_edges_keeps_teleport_rank(ray_session):
    import ray.data as rd

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([], pa.int64()),
                "dst_id": pa.array([], pa.int64()),
            }
        )
    )
    nodes_ds = rd.from_arrow(pa.table({"node_id": pa.array([0, 1, 2], pa.int64())}))
    got = pagerank(edges_ds, nodes_ds, n_iters=2).to_pandas()
    assert sorted(got["rank_micro"].tolist()) == [150_000] * 3


def test_page_link_edges_on_generated_corpus(ray_session):
    import os
    import re

    import ray.data as rd

    from gliner_cpp_ray.sources.pages import ensure_corpus

    corpus = ensure_corpus(300, 7)
    ds = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
    got = page_link_edges(ds).to_pandas()
    # brute-force reference over the same files
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(corpus, "pages")).to_table(
        columns=["url", "html"]
    )
    ref: dict[tuple, int] = {}
    pat = re.compile(r'href="[^"]*/p/(\d{8})"')
    for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        src = int(re.search(r"/p/(\d+)$", u).group(1))
        for m in pat.finditer(h.decode()):
            k = (src, int(m.group(1)))
            ref[k] = ref.get(k, 0) + 1
    got_d = {
        (int(r.src_id), int(r.dst_id)): int(r.n) for r in got.itertuples()
    }
    assert got_d == ref
    assert len(ref) > 100  # the corpus really contains links


def test_count_distinct_pairs_width_safe():
    """ids >= 2^32 must take the structured-view path and stay exact
    (the u64 pack would corrupt them)."""
    from gliner_cpp_ray.stages.linkgraph import _count_distinct_pairs

    big = np.int64(1) << np.int64(40)
    src = np.array([big, big, 1, 1], np.int64)
    dst = np.array([2, 2, big + 5, 3], np.int64)
    s, d, n = _count_distinct_pairs(src, dst)
    got = {(int(a), int(b)): int(c) for a, b, c in zip(s, d, n)}
    assert got == {(int(big), 2): 2, (1, int(big + 5)): 1, (1, 3): 1}


def test_src_ids_raise_on_nonmatching_url():
    import pyarrow as pa
    import pytest

    from gliner_cpp_ray.stages.linkgraph import _src_ids

    urls = pa.array(["https://a.example.org/p/00000001", "https://a.example.org/about"])
    with pytest.raises(ValueError, match="do not match"):
        _src_ids(urls)


def test_page_href_matches_nine_digit_ids():
    """Link extraction must not silently drop ids past the 8-digit pad
    (>= 1e8 pages)."""
    from gliner_cpp_ray.stages.linkgraph import extract_page_links

    html = (
        '<p><a href="https://h.example.org/p/123456789">x</a>'
        '<a href="https://h.example.org/p/00000002">y</a></p>'
    ).encode()
    t = pa.table(
        {"url": ["https://h.example.org/p/100000000"], "html": [html]}
    )
    out = extract_page_links(t).to_pydict()
    got = set(zip(out["src_id"], out["dst_id"]))
    assert got == {(100000000, 123456789), (100000000, 2)}


def _hits_numpy(edges, n, n_iters=2, shift=0):
    """Reference exact-integer HITS on the driver."""
    h = {i: 1_000_000 for i in range(n)}
    a = {}
    for _ in range(n_iters):
        a = {i: 0 for i in range(n)}
        for s, d in edges:
            a[d] += h[s]
        a = {i: v >> shift for i, v in a.items()}
        h = {i: 0 for i in range(n)}
        for s, d in edges:
            h[s] += a[d]
        h = {i: v >> shift for i, v in h.items()}
    return a, h


@pytest.mark.parametrize("seed,shift", [(0, 0), (1, 0), (2, 3)])
def test_hits_matches_integer_reference(ray_session, seed, shift):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import hits_scores

    rng = np.random.default_rng(seed)
    n = 40
    edges = sorted(
        {(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(120)}
    )
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in edges], pa.int64()),
                "dst_id": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    nodes_ds = rd.from_arrow(
        pa.table({"node_id": pa.array(list(range(n)), pa.int64())})
    )
    got = (
        hits_scores(edges_ds, nodes_ds, n_iters=2, scale_shift=shift)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    want_a, want_h = _hits_numpy(edges, n, 2, shift)
    assert got["auth_micro"].tolist() == [want_a[i] for i in range(n)]
    assert got["hub_micro"].tolist() == [want_h[i] for i in range(n)]


def test_hits_isolated_nodes_score_zero(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import hits_scores

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([0], pa.int64()),
                "dst_id": pa.array([1], pa.int64()),
            }
        )
    )
    nodes_ds = rd.from_arrow(pa.table({"node_id": pa.array([0, 1, 2], pa.int64())}))
    got = (
        hits_scores(edges_ds, nodes_ds, n_iters=2)
        .to_pandas()
        .set_index("node_id")
    )
    # node 2 is isolated: both scores 0
    assert got.loc[2, "auth_micro"] == 0 and got.loc[2, "hub_micro"] == 0
    # node 0 points at 1: auth(0)=0, hub(1)=0
    assert got.loc[0, "auth_micro"] == 0
    assert got.loc[1, "hub_micro"] == 0


def _triangles_numpy(edges):
    """Reference per-node triangle counts on the undirected graph."""
    import itertools

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


@pytest.mark.parametrize("seed", [0, 3])
def test_triangle_counts_match_reference(ray_session, seed):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import triangle_counts

    rng = np.random.default_rng(seed)
    n = 25
    edges = sorted(
        {(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(90)}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in edges], pa.int64()),
                "dst_id": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = (
        triangle_counts(ds)
        .to_pandas()
        .set_index("node_id")["n_triangles"]
        .to_dict()
    )
    want = _triangles_numpy(edges)
    assert got == want
    assert want  # the random graph actually has triangles


def test_triangle_counts_rejects_wide_ids(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import triangle_counts

    ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([1 << 31], pa.int64()),
                "dst_id": pa.array([5], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="2\\^31|int64|struct"):
        triangle_counts(ds).to_pandas()


def test_k_core_peel_uses_induced_subgraph(ray_session):
    """Round 2 must recompute degrees on the subgraph induced by round
    1's survivors: node 4 survives round 1 (deg 2) but loses its edge
    to the peeled node 5 and falls below k in round 2."""
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import k_core_nodes

    # triangle {1,2,3} + tail 3-4-5; a duplicate reverse edge and a
    # self-loop exercise the undirected-distinct prep
    edges = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([1, 2, 1, 3, 4, 2, 5], pa.int64()),
                "dst_id": pa.array([2, 3, 3, 4, 5, 1, 5], pa.int64()),
            }
        )
    )
    one = {
        r["node_id"]: r["deg"]
        for r in k_core_nodes(edges, k=2, n_rounds=1).take_all()
    }
    assert one == {1: 2, 2: 2, 3: 3, 4: 2}
    two = {
        r["node_id"]: r["deg"]
        for r in k_core_nodes(edges, k=2, n_rounds=2).take_all()
    }
    assert two == {1: 2, 2: 2, 3: 3}


def test_k_core_rejects_bad_params(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import k_core_nodes

    edges = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([1], pa.int64()),
                "dst_id": pa.array([2], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError):
        k_core_nodes(edges, k=0)
    with pytest.raises(ValueError):
        k_core_nodes(edges, k=2, n_rounds=0)


def _ppr_numpy(edges, n_nodes, seed_mod, n_iters=3):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: (1_000_000 if v % seed_mod == 0 else 0) for v in range(n_nodes)}
    for _ in range(n_iters):
        nxt = {v: (150_000 if v % seed_mod == 0 else 0) for v in range(n_nodes)}
        for s, d in edges:
            nxt[d] += (r[s] * 17) // (20 * deg[s])
        r = nxt
    return r


@pytest.mark.parametrize("seed", [0, 1])
def test_personalized_pagerank_matches_integer_reference(ray_session, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 40
    edges = sorted(
        {(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(120)}
    )
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in edges], pa.int64()),
                "dst_id": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    nodes_ds = rd.from_arrow(
        pa.table({"node_id": pa.array(list(range(n)), pa.int64())})
    )
    got = (
        pagerank(edges_ds, nodes_ds, n_iters=3, seed_mod=7)
        .to_pandas()
        .set_index("node_id")["rank_micro"]
        .to_dict()
    )
    assert got == _ppr_numpy(edges, n, seed_mod=7)
    # non-seed nodes with no in-links get exactly 0 mass
    isolated_nonseed = [
        v for v in range(n)
        if v % 7 and not any(d == v for _, d in edges)
    ]
    for v in isolated_nonseed:
        assert got[v] == 0


def test_cocitation_topk_small_graph(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import cocitation_topk

    # srcs 100,101,102; 100->(1,2,3), 101->(1,2), 102->(2,3)
    # pair counts: (1,2):2 (1,3):1 (2,3):2
    edges = [(100, 1), (100, 2), (100, 3), (101, 1), (101, 2),
             (102, 2), (102, 3)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in edges], pa.int64()),
                "dst_id": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = (
        cocitation_topk(ds, k=2)
        .to_pandas()
        .sort_values(["node_id", "n_common", "partner_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    rows = {(r.node_id, r.partner_id): r.n_common for r in got.itertuples()}
    assert rows == {
        (1, 2): 2, (1, 3): 1,
        (2, 1): 2, (2, 3): 2,
        (3, 2): 2, (3, 1): 1,
    }


def test_cocitation_hub_cut_excludes_high_degree_sources(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import cocitation_topk

    # hub 200 links to 10 targets; under deg_cap=5 it contributes nothing
    edges = [(200, i) for i in range(10)] + [(201, 0), (201, 1)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([e[0] for e in edges], pa.int64()),
                "dst_id": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = cocitation_topk(ds, k=3, deg_cap=5).to_pandas()
    pairs = {(r.node_id, r.partner_id): r.n_common for r in got.itertuples()}
    assert pairs == {(0, 1): 1, (1, 0): 1}


def test_host_reciprocity_exact_ratio(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import host_reciprocity

    # host edges: 0->1, 1->0 (reciprocal), 0->2 (one-way), 2->2 (self,
    # ignored)
    t = pa.table(
        {
            "src_host": pa.array([0, 1, 0, 2], pa.int64()),
            "dst_host": pa.array([1, 0, 2, 2], pa.int64()),
            "n": pa.array([5, 1, 2, 9], pa.int64()),
        }
    )
    got = (
        host_reciprocity(rd.from_arrow(t))
        .to_pandas()
        .set_index("host_id")
        .sort_index()
    )
    assert got.loc[0, "n_out_hosts"] == 2
    assert got.loc[0, "n_reciprocal"] == 1
    assert got.loc[0, "recip_micro"] == 500_000
    assert got.loc[1, "n_out_hosts"] == 1
    assert got.loc[1, "recip_micro"] == 1_000_000
    assert 2 not in got.index  # only a self-loop: no out edges
