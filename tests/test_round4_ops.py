"""Round-4 operators: integer-exact BM25, KG relation composition,
intra-host link components.  E2E oracle equivalence is covered by
test_queries_oracle.py (parametrized over the registry); these pin the
operator-level semantics with hand-computed expectations.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _bm25_expected(docs: dict[str, str], terms: list[str], scale=10_000):
    """Closed-form reference: same scaled-int arithmetic, plain Python."""
    toks = {d: t.lower().split() for d, t in docs.items()}
    n = len(docs)
    tot = sum(len(v) for v in toks.values())
    av = (1000 * tot) // n
    out = {}
    for d, tt in toks.items():
        dl = len(tt)
        score = 0
        hit = False
        for term in terms:
            tf = tt.count(term)
            if tf == 0:
                continue
            hit = True
            df = sum(1 for v in toks.values() if term in v)
            w = (scale * n) // df
            score += (w * 22 * tf * av) // (10 * tf * av + 3 * av + 9000 * dl)
        if hit:
            out[d] = score
    return out


def test_bm25_scores_integer_exact(ray_session):
    from gliner_cpp_ray.stages.retrieval import bm25_topk

    docs = {
        "d1": "scan scan scan window",
        "d2": "scan agg",
        # long doc: length normalizer must penalize vs d2's same tf
        "d3": "scan " + "filler " * 60,
        "d4": "nothing relevant here",
    }
    terms = ["scan", "agg"]
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()]
    )
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(ds, terms, k=10).take_all()
    }
    assert got == _bm25_expected(docs, terms)
    # saturation + length: d1 (tf=3, short) > d2 (tf=1+agg) handled by
    # exact values above; the long doc must score strictly below d2's
    # scan contribution
    assert got["d3"] < got["d2"]


def test_bm25_zero_floored_contribution_keeps_doc(ray_session):
    """A doc whose every per-term contribution floors to 0 must still
    rank (the SQL oracle keeps every doc with a tf row)."""
    from gliner_cpp_ray.stages.retrieval import Bm25Scorer

    batch = pa.table({"doc_id": ["a"], "text": ["scan " + "x " * 50]})
    out = Bm25Scorer({"scan": 0}, avgdl_milli=1000, k=5)(batch)
    assert out.num_rows == 1 and out.column("score_micro")[0].as_py() == 0


def test_intra_host_components_match_union_find(ray_session):
    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.graph import cc_label_propagation
    from gliner_cpp_ray.state.union_find import UnionFind

    rng = np.random.default_rng(5)
    n = 400
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    keep = (src % N_HOSTS) == (dst % N_HOSTS)
    # synthesize some guaranteed intra-host pairs (same residue class)
    extra_s = rng.integers(0, 2, 40) * N_HOSTS + 7
    extra_d = rng.integers(0, 2, 40) * N_HOSTS + 7
    src = np.concatenate([src[keep], extra_s])
    dst = np.concatenate([dst[keep], extra_d])
    edges = rd.from_arrow(
        pa.table({"src_id": src.astype("int64"), "dst_id": dst.astype("int64")})
    )
    got = {
        r["node"]: r["label"]
        for r in cc_label_propagation(edges, "src_id", "dst_id").take_all()
    }
    uf = UnionFind()
    for a, b in zip(src.tolist(), dst.tolist()):
        uf.union(a, b)
    want = {x: uf.find(x) for x in set(src.tolist()) | set(dst.tolist())}
    assert got == want


def test_bm25_randomized_vs_closed_form(ray_session):
    """Random corpora: distributed BM25 == the plain-Python scaled-int
    reference for every doc, across batch splits."""
    from gliner_cpp_ray.stages.retrieval import bm25_topk

    rng = np.random.default_rng(11)
    vocab = ["scan", "agg", "dup", "alpha", "beta", "gamma"]
    for trial in range(5):
        docs = {
            f"d{i:03d}": " ".join(
                rng.choice(vocab, size=rng.integers(1, 40))
            )
            for i in range(int(rng.integers(5, 40)))
        }
        terms = ["scan", "agg"]
        ds = rd.from_items(
            [{"doc_id": k, "text": v} for k, v in docs.items()]
        ).repartition(3)  # force multi-batch stats + scoring
        got = {
            r["doc_id"]: r["score_micro"]
            for r in bm25_topk(ds, terms, k=1000).take_all()
        }
        assert got == _bm25_expected(docs, terms), f"trial {trial}"


def test_grouped_kmv_matches_direct_estimator(ray_session):
    """Grouped KMV per-group estimates == running the global estimator
    on each group's values directly, across batch splits."""
    from gliner_cpp_ray.stages.sketches import (
        _kmv_hashes,
        grouped_kmv_distinct,
        kmv_estimate_from_hashes,
    )

    rng = np.random.default_rng(3)
    groups = ["a", "b", "c"]
    rows = [
        {"g": groups[int(rng.integers(3))], "u": int(rng.integers(0, 500))}
        for _ in range(3000)
    ]
    ds = rd.from_items(rows).repartition(5)
    got = {
        r["g"]: (r["k"], r["estimate"])
        for r in grouped_kmv_distinct(ds, "g", "u", k=64).take_all()
    }
    for g in groups:
        vals = [r["u"] for r in rows if r["g"] == g]
        want = kmv_estimate_from_hashes(_kmv_hashes(vals, 64), 64)
        assert got[g] == (64, want)
