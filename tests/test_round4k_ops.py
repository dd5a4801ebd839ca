"""Unit tests for the round-4k operators: char-run stats and the
watermark-admission replay."""

import numpy as np
import pyarrow as pa

from gliner_cpp_ray.stages.text_analysis import char_run_stats
from gliner_cpp_ray.stages.windows import watermark_admitted_counts


def _runs(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = char_run_stats(t)
    return {
        int(d): (int(nc), int(nr), int(mx), int(ppm))
        for d, nc, nr, mx, ppm in zip(
            out.column("doc_id").to_pylist(),
            out.column("n_chars").to_pylist(),
            out.column("n_runs").to_pylist(),
            out.column("max_run").to_pylist(),
            out.column("run_ppm").to_pylist(),
        )
    }


def test_char_run_stats_basics():
    got = _runs(["abc", "aaab", "", "x", "aabbaa"])
    assert got[0] == (3, 3, 1, 1_000_000)
    assert got[1] == (4, 2, 3, 500_000)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (1, 1, 1, 1_000_000)
    # aabbaa: runs aa|bb|aa -> 3 runs, max 2
    assert got[4] == (6, 3, 2, 500_000)


def test_char_run_stats_runs_never_cross_doc_boundaries():
    # adjacent docs ending/starting with the same char must not merge
    got = _runs(["aaa", "aaa"])
    assert got[0] == (3, 1, 3, 333_333)
    assert got[1] == (3, 1, 3, 333_333)


def test_char_run_stats_counts_codepoints():
    # astral-plane codepoints count as ONE char (matching SQL length())
    got = _runs(["\U0001F600\U0001F600b", "你你好"])
    assert got[0] == (3, 2, 2, 666_666)
    assert got[1] == (3, 2, 2, 666_666)


def test_watermark_admission_drops_late_event(ray_session):
    import ray.data as rd

    B = 100  # bucket_us
    L = 10  # lateness_us
    # ingestion order (event_id) vs event time (ts):
    #  id 0: ts 50  (bucket 0)  wm=-inf        -> admitted
    #  id 1: ts 250 (bucket 2)  wm=50          -> admitted (wm jumps to 250)
    #  id 2: ts 90  (bucket 0)  wm=250 >= 110  -> DROPPED (window 0 closed)
    #  id 3: ts 205 (bucket 2)  wm=250 < 310   -> admitted
    #  id 4: ts 115 (bucket 1)  wm=250 >= 210  -> DROPPED
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array([50, 250, 90, 205, 115], pa.int64()),
        }
    )
    out = (
        watermark_admitted_counts(
            rd.from_arrow(t), ts_col="ts", id_col="event_id",
            bucket_us=B, lateness_us=L,
        )
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    assert out.loc[0].tolist() == [1, 1]
    assert out.loc[1].tolist() == [0, 1]
    assert out.loc[2].tolist() == [2, 0]


def test_watermark_crosses_range_buckets(ray_session):
    """The watermark must propagate ACROSS ingestion-range buckets:
    with n_buckets large, each id lands in its own range bucket and the
    incoming-watermark scan does the work."""
    import ray.data as rd

    n = 64
    ids = np.arange(n, dtype=np.int64)
    # one early spike at id 0 pushes the watermark to 10_000; every
    # later event has ts ~ [0, 100) (bucket 0, closes at 100 + 10) so
    # all are late-dropped; the spike itself is admitted (bucket 100)
    ts = np.full(n, 50, np.int64)
    ts[0] = 10_000
    t = pa.table({"event_id": pa.array(ids), "ts": pa.array(ts)})
    out = (
        watermark_admitted_counts(
            rd.from_arrow(t), ts_col="ts", id_col="event_id",
            bucket_us=100, lateness_us=10, n_buckets=32,
        )
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    assert out.loc[100].tolist() == [1, 0]
    assert out.loc[0].tolist() == [0, n - 1]


def test_sentence_stats_edges():
    from gliner_cpp_ray.stages.text_analysis import sentence_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["One. Two! Three?", "no punctuation", "", "...  !! "],
                pa.string(),
            ),
        }
    )
    out = sentence_stats(t)
    assert out.column("n_sentences").to_pylist() == [3, 1, 0, 0]
    assert out.column("n_tokens").to_pylist() == [3, 2, 0, 2]
    # "One. Two! Three?": 3 tokens / 3 sentences = 1.0
    assert out.column("wps_ppm").to_pylist()[0] == 1_000_000
    assert out.column("wps_ppm").to_pylist()[2] == 0


def test_grouped_ntile_matches_sql_rule(ray_session):
    import duckdb
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import ntile_per_group

    rng = np.random.RandomState(5)
    n = 300
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            # ties on purpose: the (val, id) tie-break must match SQL
            "v": pa.array(rng.randint(0, 20, n).astype(np.int64)),
        }
    )
    got = (
        ntile_per_group(rd.from_arrow(t), "g", "v", "id", tiles=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT g, id, CAST(ntile(4) OVER (PARTITION BY g ORDER BY v, id) "
        "AS BIGINT) AS tile FROM t ORDER BY id"
    ).df()
    assert got["tile"].tolist() == want["tile"].tolist()


def test_grouped_ntile_single_value_group(ray_session):
    """A group where every row has the same value degrades to one range
    bucket and must still tile by (val, id) order."""
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import ntile_per_group

    t = pa.table(
        {
            "g": pa.array(["x"] * 6),
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "v": pa.array(np.zeros(6, np.int64)),
        }
    )
    got = (
        ntile_per_group(rd.from_arrow(t), "g", "v", "id", tiles=4)
        .to_pandas()
        .sort_values("id")
    )
    # 6 rows / 4 tiles -> sizes 2,2,1,1 under SQL's rule
    assert got["tile"].tolist() == [1, 1, 2, 2, 3, 4]


def test_sequence_ngram_counts_respects_key_runs(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import sequence_ngram_counts

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 10, 20], pa.int64()),
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "s": pa.array(["a", "b", "a", "b", "a", "b"]),
        }
    )
    out = sequence_ngram_counts(
        rd.from_arrow(t), key_cols=["k"], ts_col="ts", id_col="id",
        state_col="s", n=3,
    ).to_pandas()
    got = {
        (r.s0, r.s1, r.s2): int(r.n) for r in out.itertuples(index=False)
    }
    # key 1: aba, bab; key 2 too short for any trigram
    assert got == {("a", "b", "a"): 1, ("b", "a", "b"): 1}


def test_nearest_join_prefers_closer_and_breaks_ties_backward(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import nearest_join_bucketed

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "lt": pa.array([100, 10, 55, 7], pa.int64()),
            "lid": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "rt": pa.array([50, 60, 60, 200], pa.int64()),
            "rid": pa.array([10, 11, 12, 13], pa.int64()),
        }
    )
    out = (
        nearest_join_bucketed(
            rd.from_arrow(left), rd.from_arrow(right),
            key="k", left_ts="lt", right_ts="rt", tiebreak="rid",
            n_buckets=4,
        )
        .to_pandas()
        .set_index("lid")
    )
    # lt=100: dist 50/40/40/100 -> rt=60, max rid among ties = 12
    assert out.loc[0, "rid"] == 12
    # lt=10: nearest is rt=50 (forward-only from below? no: 50 is after)
    assert out.loc[1, "rid"] == 10
    # lt=55: back (50, d=5) vs fwd (60, d=5) -> backward wins the tie
    assert out.loc[2, "rid"] == 10
    # k=2 has no right rows -> dropped (inner semantics)
    assert 3 not in out.index


def test_label_prop_communities_two_clusters(ray_session):
    """Two dense triangles joined by one bridge must NOT merge (unlike
    connected components)."""
    import ray.data as rd

    from gliner_cpp_ray.stages.graph import label_prop_communities

    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    bridge = [(2, 10)]
    edges = pa.table(
        {
            "src_id": pa.array([a for a, _ in tri1 + tri2 + bridge], pa.int64()),
            "dst_id": pa.array([b for _, b in tri1 + tri2 + bridge], pa.int64()),
        }
    )
    nodes = pa.table(
        {"node_id": pa.array([0, 1, 2, 10, 11, 12, 99], pa.int64())}
    )
    out = (
        label_prop_communities(
            rd.from_arrow(edges), rd.from_arrow(nodes), n_rounds=3,
            n_buckets=4,
        )
        .to_pandas()
        .set_index("node_id")["community"]
    )
    assert len(set(out.loc[[0, 1, 2]])) == 1
    assert len(set(out.loc[[10, 11, 12]])) == 1
    assert out.loc[0] != out.loc[10]  # the bridge does not merge them
    assert out.loc[99] == 99  # isolated node keeps its own label


def test_session_item_pairs_splits_on_gap(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import session_item_pairs

    # user 1: session A = {x, y}, then (gap) session B = {x, z}
    # user 2: one session {y, z}
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([0, 10, 1000, 1010, 5, 6], pa.int64()),
            "id": pa.array(np.arange(6, dtype=np.int64)),
            "it": pa.array(["x", "y", "x", "z", "y", "z"]),
        }
    )
    out = session_item_pairs(
        rd.from_arrow(t), key_cols=["k"], ts_col="ts", id_col="id",
        item_col="it", gap_us=100,
    ).to_pandas()
    got = {
        (r.item_a, r.item_b): int(r.n_sessions)
        for r in out.itertuples(index=False)
    }
    assert got == {("x", "y"): 1, ("x", "z"): 1, ("y", "z"): 1}


def test_grouped_pareto_matches_reference(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.frontier import (
        grouped_pareto_frontier,
        pareto_frontier_reference,
    )

    rng = np.random.RandomState(11)
    n = 400
    df = {
        "g": rng.choice(["p", "q"], n).tolist(),
        "id": np.arange(n, dtype=np.int64),
        "a": rng.randint(0, 50, n).astype(np.int64),
        "b": rng.randint(0, 50, n).astype(np.int64),
    }
    t = pa.table(df)
    got = (
        grouped_pareto_frontier(
            rd.from_arrow(t), "g", ["a", "b"], ["id"], n_buckets=4
        )
        .to_pandas()
        .sort_values("id")["id"]
        .tolist()
    )
    import pandas as pd

    pdf = pd.DataFrame(df)
    want = []
    for _, grp in pdf.groupby("g"):
        keep = pareto_frontier_reference(grp, ["a", "b"])
        want.extend(grp.loc[keep, "id"].tolist())
    assert got == sorted(want)
