"""Driver-contract queries + DuckDB oracle SQL (see __ray_entry__.py).

One entry per implemented operator family from SURVEY.md §2 (Part B) and
the training-data operator suite.  Each callable takes ``sf_dir`` and
returns a Dataset / DataFrame / Table; ``ORACLE_SQL`` holds the
equivalent ANSI SQL for every SQL-expressible query (same column names —
the driver hash-compares values after sorting columns by name).

Float discipline: aggregate queries emit INTEGER columns (counts,
``floor(x * 1e6)`` micro-units) so Ray and DuckDB hash identically;
cosine scores are excluded from compared outputs (ranks are compared,
computed with identical tie-breaking).

KG queries run over the deterministic synthetic pages corpus (generated
idempotently under /tmp, sized by sf) with closed-form expected triples
as the oracle side.  EVERY query carries a full oracle — the hash
families were chosen SQL-expressible by design (md5-u60/u64 word and
shingle hashes, Mersenne-31 universal permutations, literal
hyperplane/centroid constants), so even the approximate operators
(MinHash/SimHash/LSH/IVF/KMV/CMS/histogram) are hash-checked rather
than waived as rows-only.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from gliner_cpp_ray.pipelines.kg import (
    KGPipelineConfig,
    run_kg_delta,
    run_kg_pipeline,
)
from gliner_cpp_ray.sources.pages import (
    N_HOSTS as _N_HOSTS,
    corpus_dir_for,
    ensure_corpus,
    n_pages_for_sf,
)
from gliner_cpp_ray.stages.dedup import (
    MinHashSigner,
    exact_dedup,
    minhash_dedup_clusters,
    ngram_jaccard_pairs,
)
from gliner_cpp_ray.stages.html_to_text import html_to_docs
from gliner_cpp_ray.stages.similarity import (
    LshBucketer,
    NearDupScorer,
    brute_force_topk,
    lsh_near_dup_pairs,
    lsh_topk,
)
from gliner_cpp_ray.stages.text_analysis import (
    LangId,
    fingerprints,
    quality_counts,
    token_counts,
)

KG_SEED = 7
KG_OUT_VERSION = "v1"
_SQL_SF = "/root/testdata/sf0.01"  # the driver's correctness scale


def _sf_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(_sf_path(sf_dir, table), columns=columns)


def _path_bytes(path: str) -> int:
    """Total parquet bytes under ``path`` (a file or a directory)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    )


def _join_buckets(sf_dir: str, *tables: str) -> int:
    """Data-scaled bucket count for a bucketed join over sf tables.

    The call site knows its input files, so bucket count follows INPUT
    BYTES (capped at 2×cluster CPUs) per ``bytes_scaled_partitions`` —
    not raw cluster size.  Two reasons this beats ``default_buckets``
    here: (1) small inputs pay ~0.1 s of fixed cost per extra bucket
    across the repartition+groupby pair for zero gain (the r3 bench
    regression on the as-of/interval joins was exactly 16→64 buckets on
    a 5 MB input); (2) on the FIXED input of the two-cluster-size
    scaling run, data-scaled buckets keep shuffle shape identical at
    both CPU counts instead of inflating fixed costs 4× at the larger
    one."""
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    total = sum(_path_bytes(_sf_path(sf_dir, t)) for t in tables)
    return bytes_scaled_partitions(total)


def _ray_session_tag() -> str:
    """Current Ray session identity for cache invalidation: a cached
    MaterializedDataset's blocks die with the session, so a cache hit
    from a previous ``ray.init`` must be treated as a miss."""
    try:
        import ray

        if ray.is_initialized():
            return ray.get_runtime_context().get_job_id() or "none"
    except Exception:
        pass
    return "none"


# per-sf_dir caches for materialized SMALL intermediates that several
# registry queries share (the driver runs them back-to-back in one
# process).  Keyed by (sf_dir, ray session) — see _ray_session_tag.
_QUERY_CACHE: dict[tuple[str, str, str], Any] = {}


def _cached(kind: str, sf_dir: str, build):
    key = (kind, sf_dir, _ray_session_tag())
    got = _QUERY_CACHE.get(key)
    if got is None:
        got = _QUERY_CACHE[key] = build()
    return got


def _corpus(sf_dir: str) -> str:
    return ensure_corpus(n_pages_for_sf(sf_dir), KG_SEED)


def _kg_out(corpus_dir: str) -> str:
    name = os.path.basename(os.path.normpath(corpus_dir))
    return os.path.join("/tmp/kgray_out", KG_OUT_VERSION, name)


def _run_kg(sf_dir: str):
    corpus = _corpus(sf_dir)
    out = _kg_out(corpus)
    run_kg_pipeline(os.path.join(corpus, "pages"), out, KGPipelineConfig())
    return corpus, out


def _read_out(out: str, stage: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out, stage), file_extensions=["parquet"])


# oracle-side path constants (driver compares at sf0.01)
_ORACLE_CORPUS = corpus_dir_for(n_pages_for_sf(_SQL_SF), KG_SEED)


# --------------------------------------------------------------------- KG

def q_kg_extracted_text(sf_dir: str):
    """HTML→text over every page; byte-identity vs the ground-truth text."""
    import ray.data as rd

    corpus = _corpus(sf_dir)
    ds = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "html", "lang"]
    )
    return ds.map_batches(html_to_docs, batch_format="pyarrow").select_columns(
        ["url", "text"]
    )


def q_kg_triples(sf_dir: str):
    _, out = _run_kg(sf_dir)
    return _read_out(out, "linked").select_columns(["doc_id", "subj", "pred", "obj"])


def q_kg_edges(sf_dir: str):
    _, out = _run_kg(sf_dir)
    return _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon", "weight"]
    )


def q_kg_edge_timespan(sf_dir: str):
    """Temporal KG: every canonical edge annotated with the crawl
    interval that supports it — weight plus the first/last ``warc_ts``
    (epoch µs) of the pages its triples were extracted from.  Scale
    shape: the per-triple `linked` table joins the pages (url → ts)
    dimension with ONE bucketed hash join; each joined block then
    canon-rewrites and pre-aggregates map-side (the same integer-coded
    dictionary path as the edges stage, canon map broadcast once via
    ``ray.put``), so the final exchange carries one (edge, count, min,
    max) partial per distinct edge per block — never a per-occurrence
    row.  Mergeable min/max make the timespan a single distributed
    aggregate."""
    import pickle

    import ray
    import ray.data as rd

    from gliner_cpp_ray.stages.canonicalize import _canon_codes, _dict_codes
    from gliner_cpp_ray.stages.joins import (
        bucketed_group_agg,
        bucketed_hash_join,
    )

    corpus, out = _run_kg(sf_dir)
    with open(os.path.join(out, "canon", "canon_map.pkl"), "rb") as f:
        canon_map = pickle.load(f)
    cm_ref = ray.put(canon_map)

    pages_ts = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "warc_ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "url": t.column("url"),
                "ts_us": t.column("warc_ts").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    cols = ["url", "subj", "pred", "obj", "subj_label", "obj_label",
            "subj_qid", "obj_qid"]
    linked = _read_out(out, "linked").select_columns(cols)
    joined = bucketed_hash_join(
        linked, pages_ts, on="url",
        # triple-volume-scaled exchange (tiny at bench scale, 2×CPU at
        # corpus scale)
        n_buckets=bytes_scaled_partitions(
            _path_bytes(os.path.join(out, "linked"))
        ),
        left_schema=pa.schema([(c, pa.string()) for c in cols]),
        right_schema=pa.schema([("url", pa.string()), ("ts_us", pa.int64())]),
    )

    empty = pa.table(
        {
            "subj_canon": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj_canon": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "tmin": pa.array([], pa.int64()),
            "tmax": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        cm = ray.get(cm_ref)  # zero-copy plasma read, once per task
        vocab: dict = {}
        subj_c = _canon_codes(cm, t, "subj", "subj_label", "subj_qid", vocab)
        obj_c = _canon_codes(cm, t, "obj", "obj_label", "obj_qid", vocab)
        pred_i, pred_d = _dict_codes(t.column("pred"))
        group = (subj_c * len(pred_d) + pred_i) * len(vocab) + obj_c
        df = pd.DataFrame(
            {"g": group, "ts": t.column("ts_us").to_numpy(zero_copy_only=False)}
        )
        agg = df.groupby("g", sort=False)["ts"].agg(["size", "min", "max"])
        uniq = agg.index.to_numpy()
        canon_arr = np.array(sorted(vocab, key=vocab.get), dtype=object)
        obj_u = uniq % len(vocab)
        rest = uniq // len(vocab)
        pred_u = rest % len(pred_d)
        subj_u = rest // len(pred_d)
        return pa.table(
            {
                "subj_canon": pa.array(canon_arr[subj_u], pa.string()),
                "pred": pa.array(
                    np.array(pred_d, dtype=object)[pred_u], pa.string()
                ),
                "obj_canon": pa.array(canon_arr[obj_u], pa.string()),
                "n": pa.array(agg["size"].to_numpy(np.int64)),
                "tmin": pa.array(agg["min"].to_numpy(np.int64)),
                "tmax": pa.array(agg["max"].to_numpy(np.int64)),
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(
        partials,
        ["subj_canon", "pred", "obj_canon"],
        specs=[
            ("sum", "n", "weight"),
            ("min", "tmin", "first_seen_us"),
            ("max", "tmax", "last_seen_us"),
        ],
    )


def q_kg_negative_edges(sf_dir: str):
    """Deterministic negative sampling for KG link-prediction training
    (TransE-style corrupted triples): every canonical edge draws one
    pseudo-random REPLACEMENT OBJECT of the same label — uniformly over
    that label's node set, reproducibly, engine-independently.

    Scheme (the md5-u60 idiom shared with C117 doc negatives, made
    PER-GROUP): nodes get dense 1-based positions within their label
    (``seq_numbers_per_key`` — one composite-key bucket shuffle);
    edge (s,p,o) targets position ``md5_u60(s|p|o) mod n_label``
    (0-based), a self-hit shifts to the next position mod n_label; the
    target resolves to a node id with ONE bucketed join on the
    (label, position) composite key.  Per-label counts are a
    label-bounded driver dict (labels are a fixed ontology, never
    corpus-scaled).  A single-node label degenerates to a self
    negative — kept, so the closed form stays total (documented, absent
    in this corpus).  Output: (subj_canon, pred, obj_canon,
    neg_obj_canon)."""
    import hashlib

    from gliner_cpp_ray.stages.joins import bucketed_hash_join
    from gliner_cpp_ray.stages.windows import seq_numbers_per_key

    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    _, out = _run_kg(sf_dir)
    # node/edge-volume-scaled exchanges: at bench scale these tables are
    # tiny and fixed per-bucket costs would dominate; at 100 TB the
    # bytes-derived count restores 2×CPU buckets
    nb_nodes = bytes_scaled_partitions(_path_bytes(os.path.join(out, "nodes")))
    nb_edges = bytes_scaled_partitions(_path_bytes(os.path.join(out, "edges")))
    nodes = _read_out(out, "nodes").select_columns(["canon_id", "label"])
    pos = seq_numbers_per_key(
        nodes, ["label"], ts_col="canon_id", id_col="canon_id",
        out_col="pos", n_buckets=nb_nodes,
    )
    ranked = bucketed_hash_join(
        nodes, pos, on="canon_id", n_buckets=nb_nodes,
        left_schema=pa.schema(
            [("canon_id", pa.string()), ("label", pa.string())]
        ),
        right_schema=pa.schema(
            [("canon_id", pa.string()), ("pos", pa.int64())]
        ),
    ).materialize()  # consumed twice: object-side join + target resolve

    # label → node count: fixed-ontology bounded, rides as a plain dict
    from ray.data.aggregate import Count

    n_of = {
        r["label"]: int(r["n"])
        for r in nodes.groupby("label")
        .aggregate(Count(alias_name="n"))
        .take_all()
    }

    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon"]
    )
    obj_ranked = ranked.map_batches(
        lambda t: pa.table(
            {
                "obj_canon": t.column("canon_id"),
                "label": t.column("label"),
                "obj_pos": t.column("pos"),
            }
        ),
        batch_format="pyarrow",
    )
    with_pos = bucketed_hash_join(
        edges, obj_ranked, on="obj_canon", n_buckets=nb_edges,
        left_schema=pa.schema(
            [("subj_canon", pa.string()), ("pred", pa.string()),
             ("obj_canon", pa.string())]
        ),
        right_schema=pa.schema(
            [("obj_canon", pa.string()), ("label", pa.string()),
             ("obj_pos", pa.int64())]
        ),
    )

    def probes(t: pa.Table) -> pa.Table:
        s = t.column("subj_canon").to_pylist()
        p = t.column("pred").to_pylist()
        o = t.column("obj_canon").to_pylist()
        lab = t.column("label").to_pylist()
        opos = t.column("obj_pos").to_numpy(zero_copy_only=False)
        # per-edge md5 — bounded by batch rows, like every md5 partial
        tgt = np.fromiter(
            (
                int(
                    hashlib.md5(f"{a}|{b}|{c}".encode()).hexdigest()[:15],
                    16,
                ) % n_of[l]
                for a, b, c, l in zip(s, p, o, lab)
            ),
            np.int64,
            len(s),
        )
        n_arr = np.fromiter((n_of[l] for l in lab), np.int64, len(lab))
        tgt = np.where(tgt == opos - 1, (tgt + 1) % n_arr, tgt)
        key = pa.array([f"{l}#{x + 1}" for l, x in zip(lab, tgt)])
        return pa.table(
            {
                "subj_canon": t.column("subj_canon"),
                "pred": t.column("pred"),
                "obj_canon": t.column("obj_canon"),
                "lp": key,
            }
        )

    probe_ds = with_pos.map_batches(probes, batch_format="pyarrow")
    target = ranked.map_batches(
        lambda t: pa.table(
            {
                "lp": pa.array(
                    [
                        f"{l}#{x}"
                        for l, x in zip(
                            t.column("label").to_pylist(),
                            t.column("pos").to_pylist(),
                        )
                    ]
                ),
                "neg_obj_canon": t.column("canon_id"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        probe_ds, target, on="lp", n_buckets=nb_edges,
        left_schema=pa.schema(
            [("subj_canon", pa.string()), ("pred", pa.string()),
             ("obj_canon", pa.string()), ("lp", pa.string())]
        ),
        right_schema=pa.schema(
            [("lp", pa.string()), ("neg_obj_canon", pa.string())]
        ),
    )
    return joined.map_batches(
        lambda t: t.select(
            ["subj_canon", "pred", "obj_canon", "neg_obj_canon"]
        ),
        batch_format="pyarrow",
    )


def _incr_batches(corpus: str, n_pages: int) -> tuple[str, str]:
    """Split the synthetic corpus into two deterministic crawl batches
    (base = first ~80% of page ids, delta = the rest), written once
    under /tmp and reused.  Streaming: each batch is a filtered Ray
    read + write, never a driver-side table pull."""
    import shutil

    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import _src_ids

    cutoff = max(1, int(n_pages * 0.8))
    split_root = os.path.join(
        "/tmp/kgray_incr", os.path.basename(os.path.normpath(corpus))
    )
    base_dir = os.path.join(split_root, "base")
    delta_dir = os.path.join(split_root, "delta")
    marker = os.path.join(split_root, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(split_root, ignore_errors=True)
        for d, want_base in ((base_dir, True), (delta_dir, False)):

            def keep(t: pa.Table, want_base=want_base) -> pa.Table:
                ids = _src_ids(t.column("url"))
                mask = (ids < cutoff) if want_base else (ids >= cutoff)
                return t.filter(pa.array(mask))

            rd.read_parquet(os.path.join(corpus, "pages")).map_batches(
                keep, batch_format="pyarrow"
            ).write_parquet(d)
        with open(marker, "w") as f:
            f.write("ok\n")
    return base_dir, delta_dir


def q_kg_incremental_edges(sf_dir: str):
    """Incremental crawl ingestion (north-rule resumability, active
    form): the corpus arrives as two batches — the base is built with
    ``run_kg_pipeline``, the delta merged with ``run_kg_delta`` (NER
    runs over the delta pages ONLY; the downstream wide stages recompute
    because their checkpoints embed the mentions lineage).  The merged
    edge table must be bit-identical to a full recompute over
    base ∪ delta, so the oracle is the same closed-form SQL as
    ``kg_edges``."""

    def build():
        corpus = _corpus(sf_dir)
        base_dir, delta_dir = _incr_batches(corpus, n_pages_for_sf(sf_dir))
        out = _kg_out(corpus) + "_incr"
        cfg = KGPipelineConfig()
        run_kg_pipeline(base_dir, out, cfg)
        run_kg_delta(delta_dir, out, cfg)
        return out

    out = _cached("kg_incr", sf_dir, build)
    return _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon", "weight"]
    )


def q_kg_mentions_by_label(sf_dir: str):
    from ray.data.aggregate import Count

    _, out = _run_kg(sf_dir)
    ds = _read_out(out, "mentions")
    return ds.groupby("label").aggregate(Count(alias_name="n_mentions"))


def q_kg_nodes(sf_dir: str):
    _, out = _run_kg(sf_dir)
    return _read_out(out, "nodes").select_columns(
        ["canon_id", "label", "mention_count"]
    )


def q_kg_cooccurrence(sf_dir: str):
    """Entity co-mention graph: documents co-mentioning each unordered
    canonical-entity pair (context-free canon, as in the node stage).
    One doc-hash shuffle + whole-bucket vectorized pair expansion —
    see stages/cooccur.py for the 100-TB shape."""
    import pickle

    from gliner_cpp_ray.stages.cooccur import cooccurrence_counts

    _, out = _run_kg(sf_dir)
    with open(os.path.join(out, "canon", "canon_map.pkl"), "rb") as f:
        canon_map = pickle.load(f)
    mentions = _read_out(out, "mentions").select_columns(
        ["doc_id", "text", "label"]
    )
    # data-scaled shuffle parallelism: the caller can see the checkpoint
    # parquet bytes, so the doc-hash bucket count follows input volume
    # (floor 8) instead of cluster CPUs — see _join_buckets for why
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    mbytes = _path_bytes(os.path.join(out, "mentions"))
    # three registry queries consume this pair table (kg_cooccurrence,
    # kg_top_cooccurring, kg_entity_cards) and the driver runs them in
    # one process — cache the materialized table (pair-bounded: one row
    # per co-mentioned canon pair, object-store-resident)
    return _cached(
        "kg_cooccur",
        sf_dir,
        lambda: cooccurrence_counts(
            mentions, canon_map, n_buckets=bytes_scaled_partitions(mbytes)
        ).materialize(),
    )


def q_kg_top_cooccurring(sf_dir: str):
    """Top-3 co-occurring partners per entity (related-entity ranking,
    the KG serving primitive built on C48): symmetrize the pair table
    inside ``map_batches`` — the pair aggregate is already
    vocabulary²-bounded — then the shuffle-bounded per-group top-k
    (C33) with a deterministic partner-name tie-break."""
    from gliner_cpp_ray.stages.skew import grouped_top_k

    _SYM_NAMES = ["entity", "partner", "n_docs"]

    def symmetrize(t: pa.Table) -> pa.Table:
        fwd = t.select(["canon_a", "canon_b", "n_docs"]).rename_columns(_SYM_NAMES)
        rev = t.select(["canon_b", "canon_a", "n_docs"]).rename_columns(_SYM_NAMES)
        return pa.concat_tables([fwd, rev])

    co = q_kg_cooccurrence(sf_dir)
    sym = co.map_batches(symmetrize, batch_format="pyarrow")
    return grouped_top_k(sym, "entity", "n_docs", "partner", k=3)


def _link_graph(sf_dir: str):
    """(edges, nodes) of the crawl link graph, materialized ONCE per
    (sf_dir, ray session): four registry queries (page_links, pagerank,
    hits, link_triangles) consume the same full-corpus regex scan, and
    both tables are distinct-edge / node-id bounded — small relative to
    the corpus, spillable in the object store."""
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import _src_ids, page_link_edges

    def build():
        corpus = _corpus(sf_dir)
        pages = rd.read_parquet(
            os.path.join(corpus, "pages"), columns=["url", "html"]
        )
        edges = page_link_edges(pages).materialize()

        def node_ids(t: pa.Table) -> pa.Table:
            return pa.table({"node_id": pa.array(_src_ids(t.column("url")))})

        nodes = (
            rd.read_parquet(os.path.join(corpus, "pages"), columns=["url"])
            .map_batches(node_ids, batch_format="pyarrow")
            .materialize()
        )
        return edges, nodes

    return _cached("link_graph", sf_dir, build)


def q_page_links(sf_dir: str):
    """Crawl link-graph edges: one regex pass per batch over html, packed
    per-batch pair combiner, exact groupby-sum — raw link occurrences
    never cross the wire."""
    return _link_graph(sf_dir)[0]


def q_pagerank(sf_dir: str):
    """Fixed-iteration PageRank over the crawl link graph in EXACT
    integer arithmetic — rank state stays a distributed Dataset, one
    bucketed join + one groupby-sum per iteration."""
    from gliner_cpp_ray.stages.linkgraph import pagerank

    edges, nodes = _link_graph(sf_dir)
    return pagerank(edges, nodes, n_iters=3)


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (random walk with restart) from a
    deterministic seed set (node_id % 17 == 0) — the TrustRank-style
    seeded-authority / crawl-seeding prior.  Same integer arithmetic
    and data movement as global PageRank; the seed test is a map-side
    id predicate, so no extra join."""
    from gliner_cpp_ray.stages.linkgraph import pagerank

    edges, nodes = _link_graph(sf_dir)
    return pagerank(edges, nodes, n_iters=3, seed_mod=17)


def q_cocitation_topk(sf_dir: str):
    """Per-page top-3 co-cited partners (pages sharing in-link sources)
    — related-page mining with the standard hub cut (sources with
    out-degree > 64 excluded, replicated by the oracle)."""
    from gliner_cpp_ray.stages.linkgraph import cocitation_topk

    edges, _ = _link_graph(sf_dir)
    return cocitation_topk(edges, k=3, deg_cap=64)


def q_host_reciprocity(sf_dir: str):
    """Per-host reciprocal-link ratio over the host link graph — the
    mutual-endorsement (link-farm / mirror-ring) signal.  Exact integer
    ratio in micro-units."""
    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.linkgraph import host_link_edges, host_reciprocity

    edges, _ = _link_graph(sf_dir)
    return host_reciprocity(host_link_edges(edges, N_HOSTS))


def q_degree_distribution(sf_dir: str):
    """Out-degree distribution of the crawl link graph (n_nodes per
    distinct-out-degree — the power-law / crawl-health curve): one
    grouped count over the cached distinct edge table, a key-bounded
    LEFT join to give link-less pages degree 0, and a degree-keyed
    count.  All exchanges node-bounded."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    edges, nodes = _link_graph(sf_dir)
    deg = bucketed_group_agg(
        edges.map_batches(
            lambda t: t.select(["src_id"]), batch_format="pyarrow"
        ),
        "src_id", "count", out_col="deg",
    )
    labeled = bucketed_hash_join(
        nodes, deg.map_batches(
            lambda t: t.rename_columns(["node_id", "deg"]),
            batch_format="pyarrow",
        ),
        on="node_id", how="left",
        left_schema=pa.schema([("node_id", pa.int64())]),
        right_schema=pa.schema([("node_id", pa.int64()), ("deg", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {"deg": pc.coalesce(t.column("deg").cast(pa.int64()),
                                pa.scalar(0, pa.int64()))}
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(labeled, "deg", "count", out_col="n_nodes",
                              n_buckets=8)


def q_link_k_core(sf_dir: str):
    """Bounded k-core peel of the crawl link graph (k=6, 2 rounds):
    per round, edges are semi-filtered to surviving endpoints (two
    bucketed joins) and one degree groupby re-thresholds — density
    cores vs crawl periphery.  stages/linkgraph.py:k_core_nodes."""
    from gliner_cpp_ray.stages.linkgraph import k_core_nodes

    edges, _ = _link_graph(sf_dir)
    return k_core_nodes(edges, k=6, n_rounds=2)


def q_hits(sf_dir: str):
    """Fixed-iteration HITS hubs/authorities over the crawl link graph
    in EXACT integer arithmetic — two bucketed join + groupby-sum
    half-steps per iteration, score state distributed end to end."""
    from gliner_cpp_ray.stages.linkgraph import hits_scores

    edges, nodes = _link_graph(sf_dir)
    return hits_scores(edges, nodes, n_iters=2)


def q_link_triangles(sf_dir: str):
    """Per-node triangle counts on the undirected link graph —
    degree-ordered orientation tames hub skew (one apex per triangle,
    out-degree O(sqrt(E)) on any graph)."""
    from gliner_cpp_ray.stages.linkgraph import triangle_counts

    edges, _ = _link_graph(sf_dir)
    return triangle_counts(edges)


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance over the crawl link graph (seed
    proximity for crawl-frontier scoring): frontier-only expansion —
    per hop one bucketed join of edges against the CURRENT frontier,
    one distinct, one anti join vs visited; O(1) driver per hop."""
    from gliner_cpp_ray.stages.graph import bfs_hop_distance

    edges, nodes = _link_graph(sf_dir)

    def pick_seeds(t: pa.Table) -> pa.Table:
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 101 == 0))

    seeds = nodes.map_batches(pick_seeds, batch_format="pyarrow")
    return bfs_hop_distance(edges, seeds, max_hops=4)


def q_doc_chunks(sf_dir: str):
    """Fixed-token chunking with overlap (window 64, stride 48) — the
    RAG / pretraining windowing step.  Pure per-batch map, one Arrow
    regex split + numpy span arithmetic + one take/binary_join per
    batch; no shuffle at any corpus size."""
    from gliner_cpp_ray.stages.packing import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: chunk_documents(t, window=64, stride=48),
        batch_format="pyarrow",
    )


def q_anchor_texts(sf_dir: str):
    """Top incoming anchor text per target page — the link-graph signal
    entity linking and IR features feed on."""
    import ray.data as rd

    from gliner_cpp_ray.stages.linkgraph import top_anchor_per_target

    corpus = _corpus(sf_dir)
    ds = rd.read_parquet(os.path.join(corpus, "pages"), columns=["html"])
    return top_anchor_per_target(ds)


def q_host_links(sf_dir: str):
    """Host-level link-graph rollup from the page edge table (pure map +
    groupby-sum; html is scanned once by the page-edge extraction)."""
    import ray.data as rd

    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.linkgraph import host_link_edges, page_link_edges

    corpus = _corpus(sf_dir)
    ds = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
    return host_link_edges(page_link_edges(ds), N_HOSTS)


def q_host_route_costs(sf_dir: str):
    """Crawl-cost map: cheapest multi-hop route cost from the seed
    hosts (every 50th host id) to every host within 4 hops, where an
    edge h1→h2 costs ``1_000_000 // (1 + n_links)`` — well-linked hosts
    are cheap to discover.  Weighted SSSP via frontier-pruned
    Bellman-Ford (stages/graph.py:weighted_sssp): per round one
    bucketed join of edges against only the just-improved nodes + two
    node-bounded group-mins; result identical to 4 synchronous
    relaxations (the unrolled-CTE oracle)."""
    import ray.data as rd

    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.graph import weighted_sssp
    from gliner_cpp_ray.stages.linkgraph import host_link_edges, page_link_edges

    corpus = _corpus(sf_dir)
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "html"]
    )

    def weigh(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": t.column("src_host"),
                "v": t.column("dst_host"),
                "w": pa.array(1_000_000 // (1 + n)),
            }
        )

    edges = host_link_edges(page_link_edges(pages), N_HOSTS).map_batches(
        weigh, batch_format="pyarrow"
    )
    seeds = rd.from_items([{"host": h} for h in range(0, N_HOSTS, 50)])
    return weighted_sssp(edges, seeds, rounds=4, node_col="host")


def q_host_stats(sf_dir: str):
    """Per-host crawl rollup (host parsed from url; page count + total
    extracted-text chars) — trivially distributive groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    corpus = _corpus(sf_dir)
    ds = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "text"])

    def host_chars(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("url"), r"^https://(?P<host>[^/]+)/")
        return pa.table(
            {
                "host": pc.struct_field(ex, "host"),
                "chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(host_chars, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="n_pages"), Sum("chars", alias_name="total_chars"))
    )


# ------------------------------------------------------------- documents

def q_doc_stats_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )


def q_dedup_exact_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = exact_dedup(ds)
    return kept.select_columns(["content_hash", "doc_id"])


def q_doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprints, batch_format="pyarrow").select_columns(
        ["doc_id", "content_md5"]
    )


def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_counts, batch_format="pyarrow")


def q_text_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_counts, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    # instance -> plain tasks: LangId's state (5 tiny stopword arrays)
    # builds in microseconds; an actor pool paid 1-2 s spin-up per run
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangId(), batch_format="pyarrow")


# three registry queries (minhash_clusters, minhash_dedup_keep,
# leakage_safe_split) consume the same cluster table; the driver runs
# them back-to-back, so the materialized Dataset (one (doc_id,
# cluster_id) row per doc — object-store-resident, spillable) is cached
# per sf_dir instead of re-running the whole signature+LSH+verify
# pipeline three times
def _minhash_clusters_cached(sf_dir: str):
    def build():
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        return minhash_dedup_clusters(ds, threshold=0.8).materialize()

    return _cached("minhash_clusters", sf_dir, build)


def q_minhash_clusters(sf_dir: str):
    """MinHash+LSH near-dup clustering.  The signer's hash chain
    (byte-shingle pack, Mersenne-31 universal permutations, md5-u60
    band keys) is SQL-expressible BY DESIGN so the DuckDB oracle
    (``_minhash_sql``) replicates signatures, banding, flood cap,
    verification and the component fixpoint literally — a full
    hash-matched check, not rows-only."""
    return _minhash_clusters_cached(sf_dir)


def q_minhash_dedup_keep(sf_dir: str):
    """End-to-end dedup composition: MinHash+LSH clustering → keep one
    canonical doc per near-dup cluster (the min doc_id — each cluster's
    own id).  The streaming filter never materializes the corpus."""
    clusters = _minhash_clusters_cached(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("doc_id"), t.column("cluster_id"))
        return t.filter(m).select(["doc_id"])

    return clusters.map_batches(keep, batch_format="pyarrow")


_TFIDF_TERMS = ["scan", "window", "agg", "dup"]


def q_tfidf_topk(sf_dir: str):
    """Integer-exact TF-IDF ranked retrieval (log-free idf variant so
    the score arithmetic is pure int64 and the oracle replicates it
    bit-for-bit).  DF pass is query-bounded; score pass carries a
    per-batch top-k combiner."""
    from gliner_cpp_ray.stages.retrieval import tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, _TFIDF_TERMS, k=20)


def _tfidf_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in _TFIDF_TERMS)
    return (
        f"WITH tt AS (SELECT doc_id, lower({_TRIM_SQL}) AS t FROM documents), "
        "lst AS (SELECT doc_id, list_filter(string_split_regex(t, '\\s+'), "
        "x -> x <> '') AS l FROM tt), "
        "tok AS (SELECT doc_id, unnest(l) AS w FROM lst), "
        f"q AS (SELECT * FROM (VALUES {terms}) t(w)), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok JOIN q USING (w) "
        "GROUP BY doc_id, w), "
        "dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w), "
        "n AS (SELECT count(*) AS n FROM documents), "
        "sc AS (SELECT tf.doc_id, "
        "CAST(sum(tf.tf * ((1000000 * n.n) // dfq.df)) AS BIGINT) AS score_micro "
        "FROM tf JOIN dfq USING (w) CROSS JOIN n GROUP BY tf.doc_id) "
        "SELECT doc_id, score_micro, CAST(row_number() OVER ("
        "ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank "
        "FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20"
    )


def q_bm25_topk(sf_dir: str):
    """Integer-exact BM25 ranked retrieval (C52): log-free idf + the
    k1=1.2 / b=0.75 length normalizer carried through scaled int64
    rationals — same two-pass streaming shape as TF-IDF (query-bounded
    stats shuffle, broadcast weights, per-batch top-k combiner)."""
    from gliner_cpp_ray.stages.retrieval import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, _TFIDF_TERMS, k=20)


def _bm25_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in _TFIDF_TERMS)
    return (
        f"WITH tt AS (SELECT doc_id, lower({_TRIM_SQL}) AS t FROM documents), "
        "lst AS (SELECT doc_id, list_filter(string_split_regex(t, '\\s+'), "
        "x -> x <> '') AS l FROM tt), "
        "tok AS (SELECT doc_id, unnest(l) AS w FROM lst), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id), "
        "av AS (SELECT n, (1000 * tot) // n AS avgdl_milli FROM "
        "(SELECT (SELECT count(*) FROM documents) AS n, "
        "(SELECT count(*) FROM tok) AS tot)), "
        f"q AS (SELECT * FROM (VALUES {terms}) t(w)), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok JOIN q USING (w) "
        "GROUP BY doc_id, w), "
        "dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w), "
        # per-(doc,term) contribution floored exactly as the Ray side:
        # (w_t · 22·tf·avgdl_milli) // (10·tf·avgdl_milli + 3·avgdl_milli
        # + 9000·dl) with w_t = (10000·N)//df
        "sc AS (SELECT tf.doc_id, CAST(sum("
        "(((10000 * av.n) // dfq.df) * (22 * tf.tf * av.avgdl_milli)) // "
        "(10 * tf.tf * av.avgdl_milli + 3 * av.avgdl_milli + 9000 * dl.dl)"
        ") AS BIGINT) AS score_micro "
        "FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN av "
        "GROUP BY tf.doc_id) "
        "SELECT doc_id, score_micro, CAST(row_number() OVER ("
        "ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank "
        "FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20"
    )


def q_kg_inferred_country(sf_dir: str):
    """KG relation composition (C53): infer a country for every entity
    with a city-valued edge (org headquartered_in CITY, person born_in
    CITY) by composing with the city→country edges (located_in ∪
    capital_of).  The location side is vocabulary-bounded (one row per
    (city, country) canon pair), so it is collected once and broadcast
    map-side — the corpus-scale entity side never shuffles for the
    join; one (subj, country) groupby-sum lands the result."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges")
    loc_preds = pa.array(["located_in", "capital_of"])
    ent_preds = pa.array(["headquartered_in", "born_in"])

    def loc_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("pred"), value_set=loc_preds))

    # city→country weight table: canon-vocabulary-bounded (≤ |cities|
    # × |countries| in any world), safe to collect and broadcast
    loc = (
        edges.map_batches(loc_rows, batch_format="pyarrow")
        .groupby(["subj_canon", "obj_canon"])
        .aggregate(Sum("weight", alias_name="w_loc"))
        .to_pandas()
        .rename(columns={"subj_canon": "city", "obj_canon": "country"})
    )

    def compose(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("pred"), value_set=ent_preds))
        df = pd.DataFrame(
            {
                "subj_canon": t.column("subj_canon").to_pandas(),
                "city": t.column("obj_canon").to_pandas(),
                "w_ent": t.column("weight").to_pandas(),
            }
        )
        j = df.merge(loc, on="city")
        return pa.table(
            {
                "subj_canon": pa.array(j["subj_canon"], pa.string()),
                "obj_canon": pa.array(j["country"], pa.string()),
                "support": pa.array(
                    (j["w_ent"].to_numpy() * j["w_loc"].to_numpy()).astype("int64")
                ),
            }
        )

    return (
        edges.map_batches(compose, batch_format="pyarrow")
        .groupby(["subj_canon", "obj_canon"])
        .aggregate(Count(alias_name="n_paths"), Sum("support", alias_name="support"))
    )


def q_host_link_components(sf_dir: str):
    """Weakly connected components of the INTRA-host link graph (C54):
    site-structure clusters — which pages of one host link into one
    navigable group.  Host membership is a pure function of the page id
    (sources/pages.url_of), so the filter is map-side arithmetic on the
    cached edge table; components come from the distributed
    label-propagation CC (the same stage the dedup keep-list gates to
    under adversarial dup density)."""
    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.graph import cc_label_propagation

    edges, _ = _link_graph(sf_dir)

    def intra(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((src % N_HOSTS) == (dst % N_HOSTS)))

    cc = cc_label_propagation(
        edges.map_batches(intra, batch_format="pyarrow"),
        a_col="src_id",
        b_col="dst_id",
    )
    return cc.map_batches(
        lambda t: t.rename_columns(["node_id", "component"]),
        batch_format="pyarrow",
    )


def q_customer_name_near_dup(sf_dir: str):
    """Fuzzy-string near-dup join (C56): distinct customer-name pairs
    within Levenshtein distance 1, via the FastSS deletion-neighborhood
    candidate generator (complete by construction) + exact DP verify —
    the short-string analog of the MinHash/SimHash document paths."""
    from gliner_cpp_ray.stages.dedup import edit_distance_pairs

    ds = _read(sf_dir, "customer", columns=["c_name"])
    pairs = edit_distance_pairs(ds, "c_name", d=1)
    return pairs.map_batches(
        lambda t: t.rename_columns(["name_a", "name_b"]),
        batch_format="pyarrow",
    )


def q_top_collocations(sf_dir: str):
    """PMI collocations (C57): top-20 adjacent-bigram collocations by
    pointwise mutual information, integer-exact via the monotone
    ``(SCALE·n_ab·N)//(n_a·n_b)`` transform — one combined
    unigram+bigram count shuffle, constituent counts attached by two
    bucketed hash joins (no vocabulary broadcast), top-k combiner."""
    from gliner_cpp_ray.stages.text_analysis import pmi_collocations

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pmi_collocations(ds, k=20, min_count=5)


def _collocations_sql() -> str:
    return (
        f"WITH tt AS (SELECT doc_id, lower({_TRIM_SQL}) AS t FROM documents), "
        "lst AS (SELECT doc_id, list_filter(string_split_regex(t, '\\s+'), "
        "x -> x <> '') AS l FROM tt), "
        "tok AS (SELECT doc_id, unnest(l) AS w, "
        "unnest(range(len(l))) AS i FROM lst), "
        "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM tok GROUP BY w), "
        "nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok), "
        "bg AS (SELECT t1.w AS w1, t2.w AS w2, "
        "CAST(count(*) AS BIGINT) AS n_ab FROM tok t1 JOIN tok t2 "
        "ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 GROUP BY 1, 2), "
        "sc AS (SELECT bg.w1, bg.w2, bg.n_ab, "
        "CAST((1000000 * bg.n_ab * nu.n) // (a.n_w * b.n_w) AS BIGINT) "
        "AS score_micro FROM bg JOIN uni a ON bg.w1 = a.w "
        "JOIN uni b ON bg.w2 = b.w CROSS JOIN nu WHERE bg.n_ab >= 5) "
        "SELECT w1, w2, n_ab, score_micro, CAST(row_number() OVER ("
        "ORDER BY score_micro DESC, w1, w2) AS BIGINT) AS rank "
        "FROM sc ORDER BY score_micro DESC, w1, w2 LIMIT 20"
    )


def q_event_funnel(sf_dir: str):
    """Ordered 3-step conversion funnel (signup -> click -> purchase
    within 72 h of signup), per-user step timestamps — stages/funnel.py.
    One user-hash bucket shuffle over the step-filtered log."""
    from gliner_cpp_ray.stages.funnel import funnel_within

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_within(
        ds, steps=["signup", "click", "purchase"], window_s=72 * 3600
    )


def _funnel_sql() -> str:
    return (
        "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'signup' GROUP BY user_id), "
        "s2 AS (SELECT s1.user_id, min(e.ts) AS t2 FROM s1 JOIN events e "
        "ON e.user_id = s1.user_id AND e.event_type = 'click' "
        "AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 72 HOUR "
        "GROUP BY 1), "
        "s3 AS (SELECT s2.user_id, min(e.ts) AS t3 FROM s2 "
        "JOIN s1 ON s1.user_id = s2.user_id JOIN events e "
        "ON e.user_id = s2.user_id AND e.event_type = 'purchase' "
        "AND e.ts >= s2.t2 AND e.ts <= s1.t1 + INTERVAL 72 HOUR "
        "GROUP BY 1) "
        "SELECT s1.user_id, CAST(1 "
        "+ CASE WHEN t2 IS NULL THEN 0 ELSE 1 END "
        "+ CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) "
        "AS stage_reached, "
        "CAST(epoch_us(t1) AS BIGINT) AS t1_us, "
        "CAST(coalesce(epoch_us(t2), -1) AS BIGINT) AS t2_us, "
        "CAST(coalesce(epoch_us(t3), -1) AS BIGINT) AS t3_us "
        "FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)"
    )


def q_weekly_retention(sf_dir: str):
    """Cohort retention grid: distinct active users per (first-event
    cohort week, week offset) — stages/funnel.py.  One user-hash bucket
    shuffle of per-batch-distinct (user, week) rows; disjoint partial
    counts summed by a tiny grid groupby."""
    from gliner_cpp_ray.stages.funnel import weekly_retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return weekly_retention(ds)


def q_dup_substring_stats(sf_dir: str):
    """Substring-level exact dedup (Lee et al. 2022 shape): per doc,
    how many of its 24-char windows occur in >= 2 distinct docs —
    stages/substring.py rolling-hash self-join.  The double 31-bit
    polynomial hash is replicated LITERALLY in the oracle (codepoint
    extraction + power-table literals), so the bucketing is
    hash-checked, not trusted."""
    from gliner_cpp_ray.stages.substring import repeated_kgram_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return repeated_kgram_stats(ds, k=24)


def _kgram_h_cte(k: int = 24) -> str:
    """Shared WITH-prefix ending in ``h(doc_id, h)`` — the O(total
    chars) transcription of the double rolling hash (the naive
    per-position form is O(chars * k) and 43x slower in DuckDB).

    Algebra: with per-char contributions ``c(i) = cp[i] * invB^(i-1)``
    (1-based i) and their per-doc prefix sums ``T``, the window hash at
    end position ``i`` is ``B^(i-1) * (T(i) - T(i-k)) mod M`` — exactly
    ``sum_j cp[p+j] * B^(k-1-j)`` for ``p = i-k+1``, the same value the
    Ray stage (stages/substring.kgram_hashes) computes.  Power/inverse
    tables come from a recursive CTE; every product stays < 2^62 and
    every prefix sum < 2^46, so BIGINT is exact throughout."""
    from gliner_cpp_ray.stages.substring import B1, B2, MOD

    i1, i2 = pow(B1, MOD - 2, MOD), pow(B2, MOD - 2, MOD)
    return (
        "WITH RECURSIVE "
        "d AS (SELECT doc_id, text, length(text) AS L FROM documents), "
        "pows(i, p1, q1, p2, q2) AS ("
        "SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT), "
        "CAST(1 AS BIGINT), CAST(1 AS BIGINT) "
        f"UNION ALL SELECT i+1, (p1*{B1})%{MOD}, (q1*{i1})%{MOD}, "
        f"(p2*{B2})%{MOD}, (q2*{i2})%{MOD} "
        "FROM pows WHERE i < (SELECT max(L) FROM d)), "
        "chars AS (SELECT doc_id, unnest(generate_series(1, L)) AS i, "
        f"text FROM d WHERE L >= {k}), "
        "contrib AS (SELECT c.doc_id, c.i, pw.p1, pw.p2, "
        "(CAST(unicode(substr(c.text, CAST(c.i AS INT), 1)) AS BIGINT) "
        f"* pw.q1) % {MOD} AS c1, "
        "(CAST(unicode(substr(c.text, CAST(c.i AS INT), 1)) AS BIGINT) "
        f"* pw.q2) % {MOD} AS c2 "
        "FROM chars c JOIN pows pw ON pw.i = c.i - 1), "
        "pref AS (SELECT doc_id, i, p1, p2, "
        "sum(c1) OVER w AS t1, sum(c2) OVER w AS t2 FROM contrib "
        "WINDOW w AS (PARTITION BY doc_id ORDER BY i "
        "ROWS UNBOUNDED PRECEDING)), "
        "pref2 AS (SELECT doc_id, i, p1, p2, t1, t2, "
        f"lag(t1, {k}, 0) OVER w2 AS t1p, lag(t2, {k}, 0) OVER w2 AS t2p "
        "FROM pref WINDOW w2 AS (PARTITION BY doc_id ORDER BY i)), "
        "h AS (SELECT doc_id, "
        f"((p1 * ((t1 - t1p) % {MOD})) % {MOD}) * 2147483648 "
        f"+ (p2 * ((t2 - t2p) % {MOD})) % {MOD} AS h "
        f"FROM pref2 WHERE i >= {k}), "
    )


def _dup_substring_sql(k: int = 24) -> str:
    """Per-doc repeated-window stats over the shared ``h`` CTE
    (see ``_kgram_h_cte``)."""
    return _kgram_h_cte(k) + (
        "dup AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS c "
        "FROM h GROUP BY h) WHERE c >= 2), "
        "dg AS (SELECT doc_id, count(*) AS n FROM h "
        "WHERE h IN (SELECT h FROM dup) GROUP BY doc_id) "
        f"SELECT d.doc_id, CAST(greatest(L - {k - 1}, 0) AS BIGINT) "
        "AS n_grams, CAST(coalesce(dg.n, 0) AS BIGINT) AS dup_grams "
        "FROM d LEFT JOIN dg ON d.doc_id = dg.doc_id"
    )


def _source_mirror_sql(k: int = 24) -> str:
    """Literal transcription of stages/dedup.source_mirror_overlap:
    distinct (source, window-hash) sets over the shared ``h`` CTE,
    pairwise intersection / union / exact-integer Jaccard."""
    return _kgram_h_cte(k) + (
        "p AS (SELECT DISTINCT dd.source, h.h FROM h "
        "JOIN documents dd USING (doc_id)), "
        "sz AS (SELECT source, count(*) AS n FROM p GROUP BY source), "
        "inter AS (SELECT x.source AS src_a, y.source AS src_b, "
        "count(*) AS ni FROM p x JOIN p y "
        "ON x.h = y.h AND x.source < y.source GROUP BY 1, 2) "
        "SELECT src_a, src_b, CAST(ni AS BIGINT) AS n_common, "
        "CAST(sa.n + sb.n - ni AS BIGINT) AS n_union, "
        "CAST(1000000 * ni // (sa.n + sb.n - ni) AS BIGINT) "
        "AS jaccard_micro "
        "FROM inter JOIN sz sa ON sa.source = src_a "
        "JOIN sz sb ON sb.source = src_b"
    )


def q_latest_event_per_user(sf_dir: str):
    """Latest-wins compaction (CDC/upsert collapse): each user's newest
    full event row, ties broken by event_id — stages/compaction.py.
    Per-batch winner combiner first, so the single key-hash shuffle
    carries one row per (user, batch), hot keys collapse map-side."""
    from gliner_cpp_ray.stages.compaction import latest_by_key

    ds = _read(sf_dir, "events")
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_type": t.column("event_type"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return latest_by_key(ds, "user_id", ["ts_us", "event_id"])


def q_user_value_diff(sf_dir: str):
    """Snapshot diff (CDC reconciliation): compare each user's latest
    value in the first half of the log against the second half —
    added / removed / changed per user, identical states dropped —
    stages/diff.py:snapshot_diff.  The halves are split at the integer
    midpoint of the epoch-µs range (one cheap min/max aggregate), each
    side collapses through the latest-wins combiner, and the diff is
    ONE key-hash shuffle + a per-bucket outer merge."""
    from ray.data.aggregate import Max, Min

    from gliner_cpp_ray.stages.compaction import latest_by_key
    from gliner_cpp_ray.stages.diff import snapshot_diff

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed 3×: min/max + both half filters
    mm = ds.aggregate(Min("ts_us"), Max("ts_us"))
    cut = (int(mm["min(ts_us)"]) + int(mm["max(ts_us)"])) // 2

    def half(keep_old: bool):
        side = ds.map_batches(
            lambda t, old=keep_old: t.filter(
                pc.less(t.column("ts_us"), cut) if old
                else pc.greater_equal(t.column("ts_us"), cut)
            ),
            batch_format="pyarrow",
        )
        return latest_by_key(side, "user_id", ["ts_us", "event_id"])

    return snapshot_diff(
        half(True), half(False), "user_id", ["value_micro"]
    )


def q_user_snapshot_applied(sf_dir: str):
    """CDC MERGE with tombstones: the first half of the event log
    collapses to a per-user snapshot, the second half replays as a
    delta stream (latest op per user wins; 'signup' = tombstone, any
    other type upserts the value) —
    stages/compaction.py:apply_cdc_delta.  Two key-hash exchanges, no
    driver state; the half split reuses the min/max midpoint cut."""
    from ray.data.aggregate import Max, Min

    from gliner_cpp_ray.stages.compaction import apply_cdc_delta, latest_by_key

    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value",
                                   "event_type"]
    )
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "value_micro": _micro(t.column("value")),
                "op": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed 3x: min/max + both half filters
    mm = ds.aggregate(Min("ts_us"), Max("ts_us"))
    cut = (int(mm["min(ts_us)"]) + int(mm["max(ts_us)"])) // 2

    def half(old: bool):
        return ds.map_batches(
            lambda t, o=old: t.filter(
                pc.less(t.column("ts_us"), cut) if o
                else pc.greater_equal(t.column("ts_us"), cut)
            ),
            batch_format="pyarrow",
        )

    base = latest_by_key(
        half(True), "user_id", ["ts_us", "event_id"]
    ).select_columns(["user_id", "value_micro"])
    return apply_cdc_delta(
        base, half(False), "user_id", ["value_micro"],
        op_col="op", order_cols=["ts_us", "event_id"], delete_op="signup",
    )


def q_customer_golden_records(sf_dir: str):
    """Entity-resolution survivorship (MDM golden records): FastSS
    name near-dup pairs BLOCKED on nation → distributed connected
    components → one golden row per cluster (min name, max balance,
    member count) — stages/survivorship.py:golden_records, the
    relational analog of the KG canonicalization chain.  Blocking is
    load-bearing: unblocked distance-1 links chain the sequentially
    numbered names into one mega-cluster."""
    from gliner_cpp_ray.stages.dedup import edit_distance_pairs
    from gliner_cpp_ray.stages.survivorship import golden_records

    raw = _read(sf_dir, "customer",
                columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    records = raw.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "acctbal_micro": _micro(t.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
    )
    # blocking applied AT pair generation (block-prefixed deletion
    # keys): cross-nation distance-1 candidates — ~96% on sequential
    # names — never reach the shuffle or the downstream key joins;
    # identical final pair set to unblocked-generate + post-filter
    pairs = edit_distance_pairs(
        raw.select_columns(["c_name", "c_nationkey"]), "c_name", d=1,
        block_col="c_nationkey",
    ).map_batches(
        lambda t: t.rename_columns(["c_name_a", "c_name_b"]),
        batch_format="pyarrow",
    )
    schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("c_nationkey", pa.int64()), ("acctbal_micro", pa.int64())]
    )
    return golden_records(
        records, pairs, "c_custkey", "c_name",
        take_min=["c_name"], take_max=["acctbal_micro"],
        records_schema=schema, block_col="c_nationkey",
    )


def q_doc_negative_samples(sf_dir: str):
    """Deterministic contrastive negative sampling: each doc draws 4
    pseudo-random other docs via md5-u60 position probes over the dense
    ORDER BY doc_id ranking — stages/sampling.py:negative_samples.
    Rank scan + one bucketed position join; fully SQL-replicated."""
    from gliner_cpp_ray.stages.sampling import negative_samples

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return negative_samples(ds, "doc_id", k=4)


def q_term_postings(sf_dir: str):
    """Inverted-index build with bounded posting heads: per term, its
    DF and the first 8 doc ids comma-joined — the retrieval-serving
    artifact; posting heads ride a per-batch min-k combiner so the
    shuffle never carries full postings."""
    from gliner_cpp_ray.stages.retrieval import term_postings

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return term_postings(ds, head_k=8)


def q_media_frame_index(sf_dir: str):
    """Multimodal frame-sampling pipeline end-to-end with a FULL
    oracle: build a deterministic synthetic video payload per document
    (header + n_frames 8×4 frames, every pixel = doc_id % 251), explode
    it through the ACTOR-POOL ``FrameSampleStage`` (stride 2; small
    batches — the memory-aware shape for large binary rows), then
    reduce each sampled frame to (len, byte-sum).  The decode/explode
    runs on REAL bytes; the oracle is the closed form the construction
    implies, so the whole actor plumbing is hash-checked, not
    rows-only."""
    from gliner_cpp_ray.stages.multimodal import _MAGIC, FrameSampleStage
    from gliner_cpp_ray.stages.sizing import default_concurrency

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def to_payload(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        payloads = []
        for did, nc in zip(ids, nch):
            n_frames = 1 + int(nc) % 5
            fill = int(did) % 251
            payloads.append(
                _MAGIC
                + (8).to_bytes(2, "little")
                + (4).to_bytes(2, "little")
                + bytes([fill]) * (8 * 4 * n_frames)
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    frames = ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": 2},
        concurrency=(1, default_concurrency()[1]),
        batch_size=64,
        batch_format="pyarrow",
    )

    def stats(t: pa.Table) -> pa.Table:
        frames_b = t.column("frame").to_pylist()
        sums = np.fromiter(
            (sum(f) for f in frames_b), np.int64, count=len(frames_b)
        )
        lens = np.fromiter(
            (len(f) for f in frames_b), np.int64, count=len(frames_b)
        )
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "frame_idx": t.column("frame_idx").cast(pa.int64()),
                "frame_len": pa.array(lens),
                "frame_sum": pa.array(sums),
            }
        )

    return frames.map_batches(stats, batch_format="pyarrow")


def q_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-count over ``events.user_id`` — the
    register-array cardinality sketch (16 registers, md5-u60 hash,
    exact-integer raw estimator), stages/sketches.py:hll_distinct_count.
    Movement is tasks × 16 register rows; the oracle transcribes the
    bucket/rho arithmetic (``length(to_base(rest, 2))`` for the bit
    length) and the HUGEINT floor estimator, so the APPROXIMATE
    estimate itself is hash-checked."""
    from gliner_cpp_ray.stages.sketches import hll_distinct_count

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = hll_distinct_count(ds, "user_id")
    return pd.DataFrame({"m": [16], "estimate": [est]}).astype("int64")


def q_large_order_customers(sf_dir: str):
    """TPC-H-Q18-shaped large-order report: orders whose total lineitem
    quantity exceeds 250, attributed to their customer, top 20 by order
    value.  Scale shape: quantities pre-aggregate per order through the
    block-partial combiner in ``bucketed_group_agg`` (the HAVING filter
    then drops ~98% of orders BEFORE any join), and both joins
    (orders, customer) are key-partitioned bucketed hash joins — the
    customer dimension scales with the corpus, so no broadcast.  The
    final sort runs over the filtered survivors only."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    nb = _join_buckets(sf_dir, "lineitem", "orders")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    li = li.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                # quantities are integral by generation; a lossy cast
                # raises rather than rounding silently
                "qty": t.column("l_quantity").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    sums = bucketed_group_agg(
        li, "o_orderkey", specs=[("sum", "qty", "sum_qty")], n_buckets=nb
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("sum_qty"), 250)),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "c_custkey": t.column("o_custkey"),
                "total_micro": _micro(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        sums, orders, on="o_orderkey", n_buckets=nb,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("sum_qty", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("c_custkey", pa.int64()),
             ("total_micro", pa.int64())]
        ),
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j2 = bucketed_hash_join(
        j1, cust, on="c_custkey", n_buckets=nb,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("sum_qty", pa.int64()),
             ("c_custkey", pa.int64()), ("total_micro", pa.int64())]
        ),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string())]
        ),
    )
    return j2.sort(
        ["total_micro", "o_orderkey"], descending=[True, False]
    ).limit(20)


def q_promo_revenue_ppm(sf_dir: str):
    """TPC-H-Q14-shaped promo revenue share: the fraction (exact ppm)
    of lineitem revenue coming from PROMO-type parts.  ONE bucketed
    hash join (lineitem ⋈ part on partkey — the part dimension scales
    with the corpus, no broadcast), then a two-cell combinable sum per
    block; the driver sees one (promo, total) pair per task and
    finishes the share in Python bigints (ppm numerator exceeds int64;
    the oracle rides HUGEINT for the same step)."""
    from gliner_cpp_ray.stages.joins import bucketed_hash_join

    nb = _join_buckets(sf_dir, "lineitem", "part")
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "rev_micro": pc.divide(
                    pc.multiply(
                        _micro(t.column("l_extendedprice")),
                        pc.subtract(
                            pa.scalar(1000, pa.int64()),
                            pc.cast(
                                pc.floor(
                                    pc.multiply(t.column("l_discount"), 1000.0)
                                ),
                                pa.int64(),
                            ),
                        ),
                    ),
                    1000,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    j = bucketed_hash_join(
        li, part, on="p_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("p_partkey", pa.int64()), ("rev_micro", pa.int64())]
        ),
        right_schema=pa.schema(
            [("p_partkey", pa.int64()), ("p_type", pa.string())]
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = t.column("rev_micro").to_numpy(zero_copy_only=False)
        promo = pc.equal(t.column("p_type"), "PROMO").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_micro": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_micro": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo = int(parts["promo_micro"].sum())
    total = int(parts["total_micro"].sum())
    return pd.DataFrame(
        {
            "promo_micro": [promo],
            "total_micro": [total],
            "share_ppm": [promo * 1_000_000 // total],
        }
    ).astype("int64")


def q_brand_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shaped brand sourcing stats: per part brand, how many
    DISTINCT suppliers ship it and how many lineitems it moved.  The
    grouped COUNT(DISTINCT) decomposes into two exact aggregates: the
    corpus-sized (brand, suppkey) pair count (ONE bucketed shuffle with
    block-partial combining), then a combination-bounded re-aggregate
    (25 brands × 100 suppliers) for both outputs."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    nb = _join_buckets(sf_dir, "lineitem", "part")
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li = li.map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    j = bucketed_hash_join(
        li, part, on="p_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("p_partkey", pa.int64()), ("l_suppkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("p_partkey", pa.int64()), ("p_brand", pa.string())]
        ),
    )
    pairs = bucketed_group_agg(
        j.select_columns(["p_brand", "l_suppkey"]),
        ["p_brand", "l_suppkey"],
        specs=[("count", None, "n")],
        n_buckets=nb,
    )
    return bucketed_group_agg(
        pairs, "p_brand",
        specs=[("count", None, "n_suppliers"), ("sum", "n", "n_items")],
        n_buckets=8,
    )


def q_events_csv_roundtrip(sf_dir: str):
    """CSV sink + source: write the (int-coded) events through Ray's
    CSV sink, read them back with the CSV source, aggregate — the
    text-format counterpart of the JSONL roundtrip.  The oracle
    aggregates the original Parquet, so any loss in the CSV roundtrip
    (dtype drift, quoting, row loss) fails the hash."""
    import shutil

    import ray.data as rd

    out = os.path.join(
        "/tmp/kgray_out/csv_rt",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    ).write_csv(out)

    from ray.data.aggregate import Count, Sum

    back = rd.read_csv(out)
    return back.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value_micro", alias_name="sum_value_micro"),
    )


def q_docs_partitioned_roundtrip(sf_dir: str):
    """Hive-partitioned Parquet sink + source: write documents
    partitioned by ``lang`` (one directory per partition — the
    resumable/prunable output layout this repo's sinks standardize on),
    read the partitioned tree back (partition values re-derived from
    directory names), aggregate per lang.  The oracle aggregates the
    original table, so partition-column round-trip loss fails the
    hash."""
    import shutil

    import ray.data as rd

    out = os.path.join(
        "/tmp/kgray_out/parquet_part",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ds.write_parquet(out, partition_cols=["lang"])

    from ray.data.aggregate import Count, Sum

    back = rd.read_parquet(out).map_batches(
        # hive partition values read back as dictionary<string>
        lambda t: pa.table(
            {
                "lang": t.column("lang").cast(pa.string()),
                "n_chars": t.column("n_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return back.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
    )


def q_doc_keywords(sf_dir: str):
    """Per-document top-3 keywords by integer corpus TF-IDF — the
    metadata-enrichment operator (C118), stages/retrieval.py:doc_keywords.
    Vocabulary-bounded DF shuffle + term-bucketed tf⋈df join +
    shuffle-bounded per-doc top-k; every score int64-exact."""
    from gliner_cpp_ray.stages.retrieval import doc_keywords

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return doc_keywords(ds, k=3)


def q_frequent_part_pairs(sf_dir: str):
    """Market-basket frequent pairs (C119): unordered part pairs bought
    together in >= 2 orders — per-batch distinct (order, part) combiner,
    ONE order-hash shuffle, whole-bucket vectorized pair expansion
    (volume Σ basket², corpus-independent), pair-keyed grouped sum,
    support filter.  stages/cooccur.py:basket_pair_counts."""
    from gliner_cpp_ray.stages.cooccur import basket_pair_counts

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "basket": t.column("l_orderkey"),
                "part": t.column("l_partkey"),
            }
        ),
        batch_format="pyarrow",
    )
    return basket_pair_counts(ds, "basket", "part", min_support=2)


_SESSION_STATS_GAP_US = 86_400_000_000  # 1 day


def q_session_stats(sf_dir: str):
    """Per-session rollup (C120): one row per (user, session) with the
    session ordinal, event count, value sum and start/end time — the
    aggregate ``event_session_ids`` labels events for, computed in the
    SAME single key-hash exchange (no label-then-join second shuffle).
    stages/windows.py:session_stats_per_key."""
    from gliner_cpp_ray.stages.windows import session_stats_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return session_stats_per_key(
        ds, ["user_id"], "us", "event_id", "value_micro",
        gap_us=_SESSION_STATS_GAP_US,
    )


def q_user_value_outliers(sf_dir: str):
    """Robust per-user outlier counts (C121): events whose |value −
    per-user median| exceeds 3× the per-user MAD — the quality-pipeline
    anomaly flag built on the exact grouped median/MAD machinery.  Two
    grouped-median exchanges (inside ``grouped_mad``), one key-bounded
    join back to the value stream, one grouped conditional count."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.sketches import grouped_mad

    ds = _read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "x": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: median/MAD pass + flag pass
    mad = grouped_mad(ds, ["user_id"], "x")
    j = bucketed_hash_join(
        ds, mad, on="user_id",
        left_schema=pa.schema([("user_id", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("median", pa.int64()),
             ("mad", pa.int64())]
        ),
    )

    def flag(t: pa.Table) -> pa.Table:
        dev = pc.abs(pc.subtract(t.column("x"), t.column("median")))
        out = pc.cast(
            pc.greater(dev, pc.multiply(t.column("mad"), 3)), pa.int64()
        )
        return pa.table({"user_id": t.column("user_id"), "flag": out})

    return bucketed_group_agg(
        j.map_batches(flag, batch_format="pyarrow"),
        "user_id",
        specs=[("count", None, "n_events"), ("sum", "flag", "n_outliers")],
    )


def q_events_running_total(sf_dir: str):
    """Per-user running value total (C122): ``sum(value) OVER
    (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` —
    the cumulative lifetime-spend feature; ONE key-hash exchange +
    per-bucket global cumsum rebased at key-run starts.
    stages/windows.py:running_sum_per_key."""
    from gliner_cpp_ray.stages.windows import running_sum_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return running_sum_per_key(
        ds, ["user_id"], "us", "event_id", "value_micro",
        out_col="run_total_micro",
    )


def q_user_customer_overlap(sf_dir: str):
    """Distributed set operations on key sets (C123): |events-only|,
    |orders-only| and |both| over DISTINCT events.user_id vs DISTINCT
    orders.o_custkey — INTERSECT / EXCEPT as one co-partitioned merge.
    Shape: per-batch distinct combiner per side, tagged union, ONE
    key-hash grouped max per side flag, then a 4-row flag-combo count —
    key sets never reach the driver."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    def side(ds, col, bit):
        def tag(t: pa.Table) -> pa.Table:
            u = pc.unique(t.column(col).combine_chunks())
            return pa.table(
                {
                    "k": u,
                    "f_events": pa.array(np.full(len(u), 1 - bit, np.int64)),
                    "f_orders": pa.array(np.full(len(u), bit, np.int64)),
                }
            )

        return ds.map_batches(tag, batch_format="pyarrow")

    ev = side(_read(sf_dir, "events", columns=["user_id"]), "user_id", 0)
    od = side(_read(sf_dir, "orders", columns=["o_custkey"]), "o_custkey", 1)
    flags = bucketed_group_agg(
        ev.union(od), "k",
        specs=[("max", "f_events", "in_e"), ("max", "f_orders", "in_o")],
    )

    def combo(t: pa.Table) -> pa.Table:
        e = t.column("in_e").to_numpy(zero_copy_only=False)
        o = t.column("in_o").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_events_only": pa.array([int((e & ~o.astype(bool)).sum())],
                                          pa.int64()),
                "n_orders_only": pa.array([int((o & ~e.astype(bool)).sum())],
                                          pa.int64()),
                "n_both": pa.array([int((e & o).sum())], pa.int64()),
            }
        )

    parts = flags.map_batches(combo, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([parts.sum().astype("int64")])


def q_events_hourly_dense(sf_dir: str):
    """Gap-filled hourly series (C124): the tumbling hourly count with
    EVERY bucket between the corpus min and max hour present (zero
    rows for silent hours) — the resample/densify step before
    time-series models.  The dense axis comes from a ``ray.data.range``
    generator source (never a driver-side arange), left-joined to the
    sparse counts by bucket hash; span is time-range-bounded, not
    corpus-bounded."""
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    HOUR = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts"]).map_batches(
        lambda t: pa.table(
            {
                "bucket": pc.divide(
                    t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                    HOUR,
                )
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: min/max scalars + counts
    lo, hi = int(ds.min("bucket")), int(ds.max("bucket"))
    counts = bucketed_group_agg(ds, "bucket", agg="count", out_col="n")
    dense = rd.range(hi - lo + 1).map_batches(
        lambda t: pa.table(
            {"bucket": pc.add(t.column("id"), pa.scalar(lo, pa.int64()))}
        ),
        batch_format="pyarrow",
    )
    j = bucketed_hash_join(
        dense, counts, on="bucket", how="left",
        left_schema=pa.schema([("bucket", pa.int64())]),
        right_schema=pa.schema([("bucket", pa.int64()), ("n", pa.int64())]),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "bucket": t.column("bucket"),
                "n": pc.fill_null(t.column("n"), 0).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_label_embedding_centroid(sf_dir: str):
    """Per-label embedding centroid (C125): mean vector per label over
    int-quantized components (floor(x·1e6); mean = sum // n) so every
    coordinate is bit-reproducible — the class-prototype / cluster-
    profile aggregate.  Per-batch partials emit labels×64 (label, dim,
    sum, n) rows; ONE (label, dim)-keyed grouped sum; nothing
    corpus-sized moves."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(t.column("embedding").to_pandas().to_numpy())
        q = np.floor(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        labs = np.unique(lab)
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lv in labs:
            m = lab == lv
            s = q[m].sum(axis=0)
            rows_l.append(np.full(q.shape[1], lv, np.int64))
            rows_d.append(np.arange(q.shape[1], dtype=np.int64))
            rows_s.append(s)
            rows_n.append(np.full(q.shape[1], int(m.sum()), np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(rows_l)),
                "dim": pa.array(np.concatenate(rows_d)),
                "s": pa.array(np.concatenate(rows_s)),
                "n": pa.array(np.concatenate(rows_n)),
            }
        )

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        specs=[("sum", "s", "s"), ("sum", "n", "n")],
    )
    def finish(t: pa.Table) -> pa.Table:
        # component sums CAN be negative: integer division must agree
        # between engines — Arrow pc.divide and DuckDB // BOTH truncate
        # toward zero (measured: -7 // 2 = -3 in DuckDB), so the mean
        # is defined as the truncated quotient (NOT Python's floor //)
        return pa.table(
            {
                "label": t.column("label"),
                "dim": t.column("dim"),
                "centroid_micro": pc.divide(t.column("s"), t.column("n")),
                "n_vecs": t.column("n"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_burst_hours(sf_dir: str):
    """Burst detection over the tumbling hourly series (C142): hours
    whose event count exceeds 2× the series' exact lower median — the
    traffic-anomaly flag.  The grouped count is distributed (hour keys
    are span-bounded); the median-of-buckets and threshold filter run
    over the aggregated series on the driver (time-span-bounded, one
    row per observed hour — stated bound, same rationale as
    `orders_monthly_growth`).  Output (bucket, n) for burst hours."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    HOUR = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts"]).map_batches(
        lambda t: pa.table(
            {
                "bucket": pc.divide(
                    t.column("ts").cast(pa.int64()), HOUR
                )
            }
        ),
        batch_format="pyarrow",
    )
    m = bucketed_group_agg(
        ds, "bucket", agg="count", out_col="n"
    ).to_pandas()  # span-bounded: one row per observed hour
    counts = np.sort(m["n"].to_numpy())
    med = int(counts[(len(counts) - 1) // 2])  # exact lower median
    out = m[m["n"] > 2 * med].sort_values("bucket").reset_index(drop=True)
    return pd.DataFrame(
        {
            "bucket": out["bucket"].astype(np.int64),
            "n": out["n"].astype(np.int64),
        }
    )


def q_label_centroid_distances(sf_dir: str):
    """Label separation report (C143): exact squared L2 distance (in
    micro² units) between every pair of per-label embedding centroids —
    the class-separability diagnostic read before training a classifier
    on the labels.  Builds on the C125 centroid shape (per-batch
    labels×d partials, ONE (label, dim) grouped sum); the centroid
    table is labels×64-bounded, so the pairwise expansion happens
    driver-side on that bounded table with exact int64 arithmetic
    (component deltas < 2·10⁶ micro ⇒ Σ of 64 squares < 2.6e14,
    comfortable int64 headroom)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(t.column("embedding").to_pandas().to_numpy())
        q = np.floor(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        labs = np.unique(lab)
        d = q.shape[1]
        rows_l, rows_d, rows_s, rows_n = [], [], [], []
        for lv in labs:
            mask = lab == lv
            rows_l.append(np.full(d, lv, np.int64))
            rows_d.append(np.arange(d, dtype=np.int64))
            rows_s.append(q[mask].sum(axis=0))
            rows_n.append(np.full(d, int(mask.sum()), np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(rows_l)),
                "dim": pa.array(np.concatenate(rows_d)),
                "s": pa.array(np.concatenate(rows_s)),
                "n": pa.array(np.concatenate(rows_n)),
            }
        )

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        specs=[("sum", "s", "s"), ("sum", "n", "n")],
    ).to_pandas()  # labels×64-bounded
    s_, n_ = agg["s"].to_numpy(), agg["n"].to_numpy()
    # TRUNCATED quotient (toward zero), matching DuckDB `//` and Arrow
    # pc.divide on negative component sums — numpy // floors instead
    agg["c"] = np.where(s_ >= 0, s_ // n_, -((-s_) // n_))
    piv = agg.pivot(index="label", columns="dim", values="c")
    labs = piv.index.to_numpy().astype(np.int64)
    mat = piv.to_numpy().astype(np.int64)
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            delta = mat[i] - mat[j]
            rows.append((labs[i], labs[j], int((delta * delta).sum())))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "sq_dist_micro2"])
    return out.astype(
        {"label_a": np.int64, "label_b": np.int64, "sq_dist_micro2": np.int64}
    )


def q_kg_entity_cards(sf_dir: str):
    """KG entity cards (C141): the serving-side summary row per
    canonical entity — document reach (distinct docs mentioning it) plus
    its strongest co-mention partner — the "entity page" a KG product
    renders.  Composition of verified parts: canon resolution identical
    to the co-occurrence stage (batch-distinct (doc, canon) combiner),
    exact distinct-doc counts via two key exchanges ((canon, doc) then
    canon), the partner from the C48 pair table through the
    shuffle-bounded grouped top-k (k=1), stitched with one
    key-partitioned LEFT join; entities with no co-mention coalesce to
    ('', 0) on both engines."""
    import pickle

    from gliner_cpp_ray.stages.cooccur import doc_canon_partial
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.skew import grouped_top_k

    _, out = _run_kg(sf_dir)
    with open(os.path.join(out, "canon", "canon_map.pkl"), "rb") as f:
        canon_map = pickle.load(f)
    mentions = _read_out(out, "mentions").select_columns(
        ["doc_id", "text", "label"]
    )
    pairs = mentions.map_batches(
        lambda t: doc_canon_partial(t, canon_map), batch_format="pyarrow"
    )
    distinct = bucketed_group_agg(
        pairs, ["canon_id", "doc_id"], agg="count", out_col="cnt"
    )
    base = bucketed_group_agg(
        distinct, "canon_id", agg="count", out_col="n_docs"
    ).map_batches(
        lambda t: pa.table(
            {"entity": t.column("canon_id"), "n_docs": t.column("n_docs")}
        ),
        batch_format="pyarrow",
    )

    _SYM = ["entity", "partner", "n_docs"]

    def symmetrize(t: pa.Table) -> pa.Table:
        fwd = t.select(["canon_a", "canon_b", "n_docs"]).rename_columns(_SYM)
        rev = t.select(["canon_b", "canon_a", "n_docs"]).rename_columns(_SYM)
        return pa.concat_tables([fwd, rev])

    co = q_kg_cooccurrence(sf_dir)
    top1 = grouped_top_k(
        co.map_batches(symmetrize, batch_format="pyarrow"),
        "entity", "n_docs", "partner", k=1,
    ).map_batches(
        lambda t: pa.table(
            {
                "entity": t.column("entity"),
                "top_partner": t.column("partner"),
                "top_n_docs": t.column("n_docs"),
            }
        ),
        batch_format="pyarrow",
    )
    j = bucketed_hash_join(
        base, top1, on="entity", how="left",
        left_schema=pa.schema(
            [("entity", pa.string()), ("n_docs", pa.int64())]
        ),
        right_schema=pa.schema(
            [("entity", pa.string()), ("top_partner", pa.string()),
             ("top_n_docs", pa.int64())]
        ),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "entity": t.column("entity"),
                "n_docs": t.column("n_docs"),
                "top_partner": pc.fill_null(t.column("top_partner"), ""),
                "top_n_docs": pc.fill_null(
                    t.column("top_n_docs"), 0
                ).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_host_fetch_gaps(sf_dir: str):
    """Crawl politeness audit (C139): per-host min / max / mean gap
    between consecutive fetches (warc_ts order, url tie-break) over the
    crawl corpus — the rate-limit compliance report a crawler ops team
    reads.  Pure reuse of the interarrival machinery keyed by host
    (ONE key-hash exchange); hosts fetched once are absent."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import interarrival_per_key

    pages = rd.read_parquet(
        os.path.join(_corpus(sf_dir), "pages"), columns=["url", "warc_ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "host": pc.struct_field(
                    pc.extract_regex(
                        t.column("url"), r"^https://(?P<host>[^/]+)/"
                    ),
                    "host",
                ),
                "warc_ts": t.column("warc_ts"),
                "url": t.column("url"),
            }
        ),
        batch_format="pyarrow",
    )
    return interarrival_per_key(
        pages, key_col="host", ts_col="warc_ts", id_col="url"
    )


def q_user_value_gini(sf_dir: str):
    """Exact integer Gini concentration of per-user event value (C140):
    numerator Σ(2·rank − n − 1)·v over ascending (v, user_id) rank —
    the whale-dominance / inequality metric, bit-exact because every
    term is int64 (no float Lorenz approximation).  Scale shape: ONE
    key-hash grouped sum builds per-user totals; the rank comes from
    the two-level value-range scan (``global_order_rank`` — one count
    row per range bucket to the driver, never a global sort); partial
    Σ terms reduce task-bounded.  The ppm ratio is computed driver-side
    with arbitrary-precision Python ints and guarded: if the numerator
    exceeds int64 (possible past ~n·total ≈ 2^63; here document-bounded)
    Ray raises rather than wrap where the HUGEINT oracle would differ."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.packing import global_order_rank

    ev = _read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "v": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    totals = bucketed_group_agg(ev, "user_id", agg="sum", val_col="v",
                                out_col="v")
    ranked, n = global_order_rank(totals, val_col="v", id_col="user_id")

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(object)
        r = t.column("rank").to_numpy(zero_copy_only=False).astype(object)
        # object-dtype Python ints: exact regardless of magnitude
        g = int(((2 * r - n - 1) * v).sum()) if len(v) else 0
        s = int(v.sum()) if len(v) else 0
        return pa.table(
            {
                "g": pa.array([g], pa.int64()),  # raises on > int64
                "s": pa.array([s], pa.int64()),
                "c": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = ranked.map_batches(partial, batch_format="pyarrow").to_pandas()
    g, s = int(parts["g"].sum()), int(parts["s"].sum())
    assert int(parts["c"].sum()) == n
    ppm = (1_000_000 * g) // (n * s) if n and s else 0
    return pd.DataFrame(
        {
            "n_users": [np.int64(n)],
            "total_micro": [np.int64(s)],
            "gini_num_micro": [np.int64(g)],
            "gini_ppm": [np.int64(ppm)],
        }
    )


def q_forecast_revenue_q6(sf_dir: str):
    """TPC-H-Q6-shaped what-if: revenue that would be recovered by
    eliminating 1997 discounts in the 1-3% band on small quantities
    (< 24) — a pure filter + scalar sum, the cheapest possible full
    scan: predicate pushed map-side at the read, one-row partials,
    8-bucket final sum.  Discount micro-integerized so the band test
    and the product are exact int64 (revenue = floor(price·1e6) ·
    disc_milli // 1000 micro units)."""
    lo = int(np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64())
        disc_milli = pc.cast(
            pc.floor(pc.multiply(t.column("l_discount"), 1000.0)), pa.int64()
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(sd, pa.scalar(lo, pa.int64())),
                pc.less(sd, pa.scalar(hi, pa.int64())),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc_milli, pa.scalar(10, pa.int64())),
                    pc.less_equal(disc_milli, pa.scalar(30, pa.int64())),
                ),
                pc.less(t.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        t2 = t.filter(keep)
        dm = pc.cast(
            pc.floor(pc.multiply(t2.column("l_discount"), 1000.0)), pa.int64()
        )
        rev = pc.divide(
            pc.multiply(_micro(t2.column("l_extendedprice")), dm),
            pa.scalar(1000, pa.int64()),
        )
        s = pc.sum(rev).as_py() or 0
        n = t2.num_rows
        return pa.table(
            {
                "s": pa.array([int(s)], pa.int64()),
                "n": pa.array([int(n)], pa.int64()),
            }
        )

    parts = (
        _read(
            sf_dir, "lineitem",
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # one row per read task — task-bounded
    )
    return pd.DataFrame(
        {
            "revenue_micro": [np.int64(parts["s"].sum())],
            "n_items": [np.int64(parts["n"].sum())],
        }
    )


def q_orders_monthly_growth(sf_dir: str):
    """Month-over-month order growth (C135): monthly order counts plus
    the delta vs the previous OBSERVED month — the trend line every ops
    dashboard opens with.  Distributed grouped count (months are a
    calendar-bounded key set, 8 buckets); the lag-delta runs over the
    aggregated ~O(100)-row series on the driver (time-bounded, stated
    here), matching SQL ``lag OVER (ORDER BY ym)`` with first-month
    delta coalesced to 0."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ds = _read(sf_dir, "orders", columns=["o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "ym": pc.add(
                    pc.multiply(
                        pc.year(t.column("o_orderdate")).cast(pa.int64()),
                        pa.scalar(100, pa.int64()),
                    ),
                    pc.month(t.column("o_orderdate")).cast(pa.int64()),
                )
            }
        ),
        batch_format="pyarrow",
    )
    m = bucketed_group_agg(
        ds, "ym", agg="count", out_col="n_orders", n_buckets=8
    ).to_pandas()  # calendar-bounded: one row per observed month
    m = m.sort_values("ym").reset_index(drop=True)
    delta = m["n_orders"].diff().fillna(0).astype(np.int64)
    return pd.DataFrame(
        {
            "ym": m["ym"].astype(np.int64),
            "n_orders": m["n_orders"].astype(np.int64),
            "delta": delta,
        }
    )


def q_event_dwell_by_type(sf_dir: str):
    """Dwell time by event type (C136): the gap from each event to the
    same user's next event, attributed to the EARLIER event's type —
    "time spent per screen".  ONE key-hash exchange + per-bucket
    partials; stages/windows.py:dwell_by_attr."""
    from gliner_cpp_ray.stages.windows import dwell_by_attr

    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    )
    return dwell_by_attr(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        attr_col="event_type",
    )


def q_embedding_quantize_int8(sf_dir: str):
    """Per-dimension int8 quantization codes (C137): min/max scale each
    embedding dimension into [-127, 127] — the vector-compression prep
    ANN serving runs (4× memory cut before PQ/serving).  Pass 1 is a
    64-row bounded distributed min/max (per-batch partials, tiny
    grouped reduce, broadcast back as plain task state); pass 2 is a
    pure vectorized map emitting (vec_id, dim, code).  All arithmetic
    int64-exact on micro-quantized components: code =
    ((xq-mn)·254)//(mx-mn) − 127, constant dims code 0."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def to_q(t: pa.Table):
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(t.column("embedding").to_pandas().to_numpy())
        q = np.floor(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        return vid, q

    def bounds_partial(t: pa.Table) -> pa.Table:
        _, q = to_q(t)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mn": pa.array(q.min(axis=0)),
                "mx": pa.array(q.max(axis=0)),
            }
        )

    b = bucketed_group_agg(
        ds.map_batches(bounds_partial, batch_format="pyarrow"),
        "dim", specs=[("min", "mn", "mn"), ("max", "mx", "mx")],
        n_buckets=8,
    ).to_pandas()  # dimensionality-bounded: one row per dim
    mn = np.zeros(len(b), np.int64)
    mx = np.zeros(len(b), np.int64)
    mn[b["dim"].to_numpy()] = b["mn"].to_numpy()
    mx[b["dim"].to_numpy()] = b["mx"].to_numpy()
    span = mx - mn

    def codes(t: pa.Table) -> pa.Table:
        vid, q = to_q(t)
        d = q.shape[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(
                span == 0, 0,
                (q - mn) * 254 // np.where(span == 0, 1, span) - 127,
            ).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(vid))),
                "code": pa.array(c.ravel()),
            }
        )

    return ds.map_batches(codes, batch_format="pyarrow")


def q_corpus_clean_survivors(sf_dir: str):
    """End-to-end corpus cleaning composition (C133): the doc_ids that
    survive the full dedup+quality gauntlet — (a) canonical of their
    EXACT-content group (min doc_id per md5(text)), (b) canonical of
    their MinHash near-dup cluster (doc_id == cluster_id, cached
    cluster table shared with the other cluster queries), (c) at least
    5 whitespace tokens.  This is the assembly a pretraining pipeline
    actually ships: each filter stays streaming, and membership tests
    are ADAPTIVE exact semi joins (broadcast key set when small, bloom
    prefilter + bucketed verify when not — joins.py:bloom_semi_join),
    so the corpus-sized stream is filtered map-side wherever the keep
    sets allow."""
    from gliner_cpp_ray.stages.dedup import exact_dedup
    from gliner_cpp_ray.stages.joins import bloom_semi_join
    from gliner_cpp_ray.stages.text_analysis import _re2_trim

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def long_enough(t: pa.Table) -> pa.Table:
        trimmed = _re2_trim(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        n = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.list_value_length(toks).cast(pa.int64()),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(
                    pc.greater_equal(n, pa.scalar(5, pa.int64()))
                )
            }
        )

    base = ds.map_batches(long_enough, batch_format="pyarrow")
    exact_keep = exact_dedup(ds).select_columns(["doc_id"])
    cl = _minhash_clusters_cached(sf_dir)
    near_keep = cl.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    s1 = bloom_semi_join(base, exact_keep, on="doc_id")
    return bloom_semi_join(s1, near_keep, on="doc_id")


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of the TF-IDF and BM25 retrieval runs
    (C134): ``rrf = Σ 1e6 // (60 + rank)`` over both systems' top-20
    lists for the shared query — the standard zero-tuning ranked-list
    combiner.  Both inputs are k-bounded (20 rows each), so the union
    + grouped sum moves 40 rows; every contribution is exact int64
    floor arithmetic."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.retrieval import bm25_topk, tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def contrib(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "c": pc.divide(
                    pa.scalar(1_000_000, pa.int64()),
                    pc.add(t.column("rank"), pa.scalar(60, pa.int64())),
                ),
            }
        )

    u = (
        tfidf_topk(ds, _TFIDF_TERMS, k=20)
        .map_batches(contrib, batch_format="pyarrow")
        .union(
            bm25_topk(ds, _TFIDF_TERMS, k=20)
            .map_batches(contrib, batch_format="pyarrow")
        )
    )
    return bucketed_group_agg(
        u, "doc_id", agg="sum", val_col="c", out_col="rrf_micro", n_buckets=8
    )


def q_minhash_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram (C130): how big do MinHash+LSH
    clusters get — the dup-density diagnostic a dedup policy is tuned
    against (singleton share, largest-mirror size).  Reuses the
    per-session cached cluster table (one MinHash run serves the four
    cluster-derived queries); two tiny grouped counts follow
    (cluster_id -> size, size -> n_clusters), nothing corpus-sized
    past the cached table."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    clusters = _minhash_clusters_cached(sf_dir)
    sizes = bucketed_group_agg(
        clusters, "cluster_id", agg="count", out_col="size"
    )
    return bucketed_group_agg(
        sizes, "size", agg="count", out_col="n_clusters", n_buckets=8
    )


def q_order_first_ship_latency(sf_dir: str):
    """Order fulfilment latency histogram (C131): whole days between
    an order's placement and its FIRST line shipment, counted per
    latency — the SLA / ops-health curve.  Scale shape: per-order min
    shipdate via one key-hash grouped min (combiner inside the
    bucketed agg), key-partitioned join back to orders on orderkey,
    then a bounded-domain grouped count (latency days are
    calendar-bounded, 8 buckets).  All int64 (epoch-us floor-div)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    first = bucketed_group_agg(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "ship_us": t.column("l_shipdate").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        "o_orderkey", agg="min", val_col="ship_us", out_col="ship0",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    j = bucketed_hash_join(
        first, orders, on="o_orderkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("ship0", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]
        ),
    )
    DAY = 86_400_000_000
    lat = j.map_batches(
        lambda t: pa.table(
            {
                "latency_days": pc.divide(
                    pc.subtract(
                        t.column("ship0"),
                        t.column("o_orderdate").cast(pa.int64()),
                    ),
                    pa.scalar(DAY, pa.int64()),
                )
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        lat, "latency_days", agg="count", out_col="n_orders", n_buckets=8
    )


def q_user_rfm_segments(sf_dir: str):
    """RFM user segmentation (C132): quartile each user on Recency
    (last event time), Frequency (event count) and Monetary (micro-unit
    value sum) and emit the 3-digit segment code — the classic
    marketing / retention cut.  Scale shape: ONE key-hash grouped
    aggregate builds the per-user triple; each dimension ranks through
    ``ntile_global`` (two-level value-range scan — one count row per
    range bucket to the driver, never a global sort); two
    key-partitioned joins stitch the tile columns back.  Tie rule is
    SQL's: NTILE(4) OVER (ORDER BY dim, user_id)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.packing import ntile_global

    ev = _read(
        sf_dir, "events", columns=["user_id", "ts", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "t_us": t.column("ts").cast(pa.int64()),
                "v_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    base = bucketed_group_agg(
        ev, "user_id",
        specs=[("max", "t_us", "rec"), ("count", None, "freq"),
               ("sum", "v_micro", "mon")],
    ).materialize()  # user-bounded; consumed by three rank passes

    tiles = {}
    for dim, out in (("rec", "r_tile"), ("freq", "f_tile"), ("mon", "m_tile")):
        t = ntile_global(
            base.select_columns(["user_id", dim]), val_col=dim,
            id_col="user_id", tiles=4,
        ).map_batches(
            lambda tt, o=out: pa.table(
                {"user_id": tt.column("user_id"), o: tt.column("tile")}
            ),
            batch_format="pyarrow",
        )
        tiles[out] = t

    j = bucketed_hash_join(
        tiles["r_tile"], tiles["f_tile"], on="user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("r_tile", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("f_tile", pa.int64())]
        ),
    )
    j = bucketed_hash_join(
        j, tiles["m_tile"], on="user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("r_tile", pa.int64()),
             ("f_tile", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("m_tile", pa.int64())]
        ),
    )
    return j.map_batches(
        lambda t: t.append_column(
            "rfm_code",
            pc.add(
                pc.add(
                    pc.multiply(t.column("r_tile"), pa.scalar(100, pa.int64())),
                    pc.multiply(t.column("f_tile"), pa.scalar(10, pa.int64())),
                ),
                t.column("m_tile"),
            ),
        ),
        batch_format="pyarrow",
    )


def q_doc_segment_dedup(sf_dir: str):
    """Cross-document segment (pseudo-paragraph) dedup stats (C126):
    the CCNet/MassiveText paragraph-hash boilerplate signal over the
    documents table — per doc, how many of its non-overlapping 8-token
    segments occur verbatim in at least one OTHER document.  Two key
    exchanges (segment hash, then doc id); md5-u60 segment hashes so
    the oracle replicates the bucketing literally;
    stages/dedup.py:segment_dedup_stats."""
    from gliner_cpp_ray.stages.dedup import segment_dedup_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return segment_dedup_stats(ds, seg_len=8)


def q_nation_trade_volume(sf_dir: str):
    """TPC-H-Q7-shaped shipping-volume report: revenue flowing between
    NATION_12 and NATION_19 (both directions kept separate) by ship
    year, 1996-1997 — the cross-border trade rollup.  Scale shape:
    the supplier/customer sides reduce to (key, nationkey) streams
    filtered MAP-SIDE to the two nations (tiny fraction survives);
    three bucketed hash joins partition on their join key
    (lineitem⋈supplier on suppkey, orders⋈customer on custkey, then
    orderkey); the cross-nation predicate filters the joined stream
    before ONE 4-row grouped sum.  Revenue integer-exact in micro
    units (same formula as the Q5 plan)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    pick = nation.filter(
        pc.is_in(
            nation.column("n_name"),
            value_set=pa.array(["NATION_12", "NATION_19"]),
        )
    )
    nkeys = pick.column("n_nationkey").cast(pa.int64()).combine_chunks()
    names = dict(
        zip(
            pick.column("n_nationkey").to_pylist(),
            pick.column("n_name").to_pylist(),
        )
    )
    lo = int(np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64))
    yr97 = int(
        np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64)
    )

    def _keyed(key_col: str, nat_col: str):
        def fn(t: pa.Table) -> pa.Table:
            nat = t.column(nat_col).cast(pa.int64())
            mask = pc.is_in(nat, value_set=nkeys)
            return pa.table(
                {
                    key_col: t.column(key_col).filter(mask),
                    nat_col: nat.filter(mask),
                }
            )

        return fn

    def line_prep(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(sd, lo), pc.less(sd, hi))
        t = t.filter(keep)
        sd = t.column("l_shipdate").cast(pa.int64())
        year = pc.add(
            pa.scalar(1996, pa.int64()),
            pc.cast(
                pc.greater_equal(sd, pa.scalar(yr97, pa.int64())), pa.int64()
            ),
        )
        rev = pc.divide(
            pc.multiply(
                _micro(t.column("l_extendedprice")),
                pc.subtract(
                    pa.scalar(1000, pa.int64()),
                    pc.cast(
                        pc.floor(pc.multiply(t.column("l_discount"), 1000.0)),
                        pa.int64(),
                    ),
                ),
            ),
            pa.scalar(1000, pa.int64()),
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "l_year": year,
                "rev_micro": rev,
            }
        )

    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(line_prep, batch_format="pyarrow")
    supp = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t, f=_keyed("s_suppkey", "s_nationkey"): pa.table(
            {
                "l_suppkey": f(t).column("s_suppkey"),
                "s_nationkey": f(t).column("s_nationkey"),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        line, supp, on="l_suppkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("l_year", pa.int64()), ("rev_micro", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.select(
            ["l_orderkey", "l_year", "rev_micro", "s_nationkey"]
        ),
        batch_format="pyarrow",
    )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t, f=_keyed("c_custkey", "c_nationkey"): pa.table(
            {
                "o_custkey": f(t).column("c_custkey"),
                "c_nationkey": f(t).column("c_nationkey"),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j2 = bucketed_hash_join(
        orders, cust, on="o_custkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "c_nationkey": t.column("c_nationkey"),
            }
        ),
        batch_format="pyarrow",
    )

    j3 = bucketed_hash_join(
        j1, j2, on="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_year", pa.int64()),
             ("rev_micro", pa.int64()), ("s_nationkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("s_nationkey"), t.column("c_nationkey"))
        ).select(["s_nationkey", "c_nationkey", "l_year", "rev_micro"]),
        batch_format="pyarrow",
    )
    agg = bucketed_group_agg(
        j3, ["s_nationkey", "c_nationkey", "l_year"],
        agg="sum", val_col="rev_micro", out_col="revenue_micro",
        n_buckets=8,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "supp_nation": pa.array(
                    [names[k] for k in t.column("s_nationkey").to_pylist()],
                    pa.string(),
                ),
                "cust_nation": pa.array(
                    [names[k] for k in t.column("c_nationkey").to_pylist()],
                    pa.string(),
                ),
                "l_year": t.column("l_year"),
                "revenue_micro": t.column("revenue_micro"),
            }
        ),
        batch_format="pyarrow",
    )


def q_wealthy_inactive_customers(sf_dir: str):
    """TPC-H-Q22-shaped opportunity report: customers with an account
    balance above the positive-balance mean who have LAPSED — no order
    on/after 2000-01-01 — counted per market segment.  Scale shape:
    the mean is a scalar distributed aggregate (sum+count of micro-unit
    balances in one pass, threshold = sum // count broadcast into the
    filter — never a sort or a second scan); the lapse predicate is a
    bucketed anti join on custkey against the date-filtered order
    stream (filter pushed MAP-SIDE so only recent-order custkeys
    shuffle); ONE tiny per-segment grouped rollup ends the plan.  All
    int64: balance micro units, truncated-quotient mean (matches
    DuckDB ``//``)."""
    from gliner_cpp_ray.stages.joins import bucketed_anti_join, bucketed_group_agg

    cust = _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "bal_micro": _micro(t.column("c_acctbal")),
                "c_mktsegment": t.column("c_mktsegment"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: scalar mean + filtered anti join

    def pos_partial(t: pa.Table) -> pa.Table:
        b = t.column("bal_micro")
        pos = pc.greater(b, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "s": pa.array(
                    [pc.sum(b.filter(pos)).as_py() or 0], pa.int64()
                ),
                "n": pa.array([int(pc.sum(pos).as_py() or 0)], pa.int64()),
            }
        )

    parts = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    s, n = int(parts["s"].sum()), int(parts["n"].sum())
    thr = int(np.int64(s) // np.int64(n)) if s >= 0 else -((-s) // n)
    # DuckDB // truncates toward zero; balances sum positive here, and
    # the branch above keeps the two engines identical if they didn't

    rich = cust.map_batches(
        lambda t: t.filter(
            pc.greater(t.column("bal_micro"), pa.scalar(thr, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    cut = int(
        np.datetime64("2000-01-01").astype("datetime64[us]").astype(np.int64)
    )
    recent = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey").filter(
                    pc.greater_equal(
                        t.column("o_orderdate").cast(pa.int64()),
                        pa.scalar(cut, pa.int64()),
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    inactive = bucketed_anti_join(rich, recent, on="c_custkey")
    return bucketed_group_agg(
        inactive, "c_mktsegment",
        specs=[("count", None, "n_custs"), ("sum", "bal_micro", "total_bal_micro")],
        n_buckets=8,
    )


def q_user_interarrival(sf_dir: str):
    """Per-user inter-event gap profile: min / max / truncated-mean
    microsecond gap between consecutive events (ordered by ts then
    event_id) — the burstiness / bot-cadence feature.  ONE key-hash
    exchange on user_id; per-bucket vectorized sort + diff with gaps
    located by key-run boundaries (no per-user loop); users with a
    single event have no gaps and are absent on both engines."""
    from gliner_cpp_ray.stages.windows import interarrival_per_key

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return interarrival_per_key(
        ds, key_col="user_id", ts_col="ts", id_col="event_id"
    )


def q_token_rarity_hist(sf_dir: str):
    """Per-document token-rarity histogram (bucket = floor(log2 of the
    corpus-wide token count)) — the unigram-LM quality signal; the
    (doc, term) × vocabulary bucketed join keeps everything
    corpus-shaped distributed."""
    from gliner_cpp_ray.stages.text_analysis import token_rarity_hist

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_rarity_hist(ds)


def q_source_mirror_overlap(sf_dir: str):
    """Cross-source partial-mirror detection: exact Jaccard overlap of
    the distinct 24-char window fingerprint sets per source pair —
    which ingest feeds ship the same text (fragment-level, so partial
    mirrors register too)."""
    from gliner_cpp_ray.stages.dedup import source_mirror_overlap

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    return source_mirror_overlap(ds, k=24)


def q_source_dup_rates(sf_dir: str):
    """Dedup-health dashboard: per document source, total docs and docs
    whose exact text hash occurs >= 2 times CORPUS-WIDE (cross-source
    duplicates count on every side).  One hash-keyed grouped count
    (corpus-bounded), a hash-bounded join back, and a tiny per-source
    sum — the ingest-quality report run before choosing dedup policy."""
    from gliner_cpp_ray.stages.dedup import add_content_hash
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["source", "text"]).map_batches(
        lambda t: add_content_hash(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: hash counts + labeled rows
    counts = bucketed_group_agg(
        ds.map_batches(lambda t: t.select(["content_hash"]),
                       batch_format="pyarrow"),
        "content_hash", "count", out_col="n_copies",
    )
    labeled = bucketed_hash_join(
        ds, counts, on="content_hash",
        left_schema=pa.schema(
            [("source", pa.string()), ("content_hash", pa.string())]
        ),
        right_schema=pa.schema(
            [("content_hash", pa.string()), ("n_copies", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "source": t.column("source"),
                "is_dup": pc.cast(
                    pc.greater_equal(t.column("n_copies"), 2), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        labeled, "source",
        specs=[("count", None, "n_docs"), ("sum", "is_dup", "n_dup_docs")],
        n_buckets=8,
    )


def q_user_value_mad(sf_dir: str):
    """Robust per-user spread: exact lower-median + median absolute
    deviation of event micro-values (outlier-resistant dispersion — a
    corrupt page can't move it the way variance moves) —
    stages/sketches.py:grouped_mad (two grouped medians + key-bounded
    joins, all int64)."""
    from gliner_cpp_ray.stages.sketches import grouped_mad

    ds = _read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: center pass + deviation join
    return grouped_mad(ds, ["user_id"], "value_micro")


_SESSION_GAP_US = 1800 * 1_000_000  # 30 min, matches event_sessions


def q_event_session_ids(sf_dir: str):
    """Per-event session assignment: each event's 1-based session
    ordinal within its user (new session after a > 30 min gap) — the
    labeling step that `event_sessions` (counts) builds on —
    stages/windows.py:session_ids_per_key.  One user-hash shuffle,
    vectorized diff + run-relative cumsum."""
    from gliner_cpp_ray.stages.windows import session_ids_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return session_ids_per_key(
        ds, ["user_id"], "ts_us", "event_id", gap_us=_SESSION_GAP_US
    )


def q_user_median_value(sf_dir: str):
    """EXACT per-user lower-median event value (micro units) — the
    exact grouped order statistic next to the approximate per-group
    histogram quantiles — stages/sketches.py:grouped_exact_median.
    One user-hash shuffle; per-bucket run-length median picks."""
    from gliner_cpp_ray.stages.sketches import grouped_exact_median

    ds = _read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_exact_median(
        ds, ["user_id"], "value_micro", out_col="median_micro"
    )


_BAND_US = 10 * 3600 * 1_000_000  # 10 hours


def q_event_pairs_banded(sf_dir: str):
    """Banded self-join (stream-stream join within δ): every ordered
    pair of same-user events at most 10 h apart — session stitching /
    co-event mining — stages/joins.py:banded_self_pairs.  One user-hash
    shuffle; the per-bucket band scan is ONE global searchsorted over a
    monotone-shifted timeline, pairs expand via grouped arange."""
    from gliner_cpp_ray.stages.joins import banded_self_pairs

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return banded_self_pairs(
        ds, ["user_id"], "ts_us", "event_id", band=_BAND_US
    )


_DECAY_HALFLIFE_US = 2 * 86_400 * 1_000_000  # 2 days


def q_user_value_decayed(sf_dir: str):
    """Recency-weighted per-user value: each event's micro-value halves
    per elapsed 2-day half-life from the corpus max timestamp (integer
    right-shift — order-independent, int64-exact), summed per user —
    stages/windows.py:time_decayed_sum.  The anchor is one column-
    pruned max(ts) scalar; the sum is one grouped exchange."""
    from gliner_cpp_ray.stages.windows import time_decayed_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    max_ts = _read(sf_dir, "events", columns=["ts"]).max("ts")
    ref = int(np.datetime64(max_ts, "us").astype(np.int64))
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return time_decayed_sum(
        ds, "user_id", "ts", "value_micro",
        halflife_us=_DECAY_HALFLIFE_US, ref_ts_us=ref,
    )


def q_event_seq_numbers(sf_dir: str):
    """Per-user 1-based event sequence numbers (row_number under
    PARTITION BY user ORDER BY ts, id) — the ordinal backbone of
    sessionization / n-th-touch features —
    stages/windows.py:seq_numbers_per_key.  One user-hash bucket
    shuffle, per-bucket vectorized sort + run-relative cumcount."""
    from gliner_cpp_ray.stages.windows import seq_numbers_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return seq_numbers_per_key(ds, ["user_id"], "ts", "event_id")


def q_user_event_history(sf_dir: str):
    """Per-user training-sequence assembly: each user's first 8 event
    types by (ts, id), comma-joined — the example-construction
    primitive, stages/packing.py:assemble_key_histories.  One user-hash
    shuffle; per-key output bounded at 8 short values."""
    from gliner_cpp_ray.stages.packing import assemble_key_histories

    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return assemble_key_histories(
        ds, ["user_id"], "ts", "event_id", "event_type", head_k=8
    )


def q_lineitem_profile(sf_dir: str):
    """ANALYZE-TABLE column statistics for lineitem's measure columns
    (row/null counts + exact micro-quantized bounds) — the planner /
    zone-map primitive, stages/profile.py:table_profile.  One pass;
    the only exchange is tasks x columns partial rows."""
    from gliner_cpp_ray.stages.profile import table_profile

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return table_profile(_read(sf_dir, "lineitem", columns=cols), cols)


def q_events_debounced(sf_dir: str):
    """Debounce / telemetry log-dedup: keep an event iff it is the
    first for its (user_id, event_type) key or arrives more than one
    hour after the PREVIOUS raw event of that key — lag semantics
    (every row compares to its immediate predecessor under
    ORDER BY (ts, event_id), not to the last KEPT row) —
    stages/windows.py:debounce_events.  One key-hash bucket shuffle,
    per-bucket vectorized sort + diff."""
    from gliner_cpp_ray.stages.windows import debounce_events

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )
    return debounce_events(
        ds, ["user_id", "event_type"], "ts", "event_id", gap_s=3600
    )


def q_customers_inactive(sf_dir: str):
    """Exact distributed anti join (churn query): customers with NO
    order since 2000-01-01 — stages/joins.py:bloom_anti_join.
    Adaptive plan: broadcast inverted is_in at this key cardinality;
    at scale, the Bloom split emits bloom-negative rows (provably
    unmatched) map-side with zero shuffle and routes only
    bloom-positive suspects through the exact bucketed anti check."""
    from gliner_cpp_ray.stages.joins import bloom_anti_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cutoff = np.datetime64("2000-01-01")

    def recent_keys(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            t.column("o_orderdate").cast(pa.timestamp("us")),
            pa.scalar(cutoff.astype("datetime64[us]").item(),
                      pa.timestamp("us")),
        )
        return pa.table({"c_custkey": t.column("o_custkey").filter(keep)})

    recent = orders.map_batches(recent_keys, batch_format="pyarrow")
    return bloom_anti_join(cust, recent, on="c_custkey")


def q_top_building_orders(sf_dir: str):
    """TPC-H-Q3-shaped 3-table pipeline: top-10 highest-revenue orders
    from BUILDING-segment customers, order placed before / lineitem
    shipped after 1998-06-01.  Scale shape: the segment key set
    semi-filters orders adaptively (broadcast is_in here, Bloom split
    at scale — joins.py:bloom_semi_join); lineitem revenue is
    pre-aggregated per order (Ray's block-partial Sum) so the ONE
    corpus-sized exchange carries (orderkey, partial) rows; the
    order⋈revenue join is bucket-hashed; the final top-10 is a
    per-batch combiner + k-row reduce (skew.py:global_top_k) — no full
    sort.  Revenue is integer-exact in nano units:
    floor(price·1e6) × (1000 − floor(discount·1e3))."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import bloom_semi_join, bucketed_hash_join
    from gliner_cpp_ray.stages.skew import global_top_k

    cutoff_us = int(
        np.datetime64("1998-06-01").astype("datetime64[us]").astype(np.int64)
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey").filter(
                    pc.equal(t.column("c_mktsegment"), "BUILDING")
                )
            }
        ),
        batch_format="pyarrow",
    )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        d_us = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.less(d_us, cutoff_us)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").filter(keep),
                "o_custkey": t.column("o_custkey").filter(keep),
                "o_date_us": d_us.filter(keep),
                "o_orderpriority": t.column("o_orderpriority").filter(keep),
            }
        )

    o = bloom_semi_join(
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        keys,
        on="o_custkey",
    ).drop_columns(["o_custkey"])

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep_li(t: pa.Table) -> pa.Table:
        s_us = t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.greater(s_us, cutoff_us)
        price = _micro(t.column("l_extendedprice").filter(keep)).to_numpy(
            zero_copy_only=False
        )
        disc = np.floor(
            t.column("l_discount").filter(keep).to_numpy(zero_copy_only=False)
            * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey").filter(keep),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
            }
        )

    rev = (
        li.map_batches(prep_li, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("rev_nano", alias_name="revenue_nano"))
    )
    joined = bucketed_hash_join(
        rev,
        o,
        on="o_orderkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("revenue_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_date_us", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    return global_top_k(joined, "revenue_nano", "o_orderkey", k=10)


def q_returned_revenue_topk(sf_dir: str):
    """TPC-H-Q10-shaped 4-table pipeline: top-20 customers by revenue
    from RETURNED lineitems, with name and nation.  Scale shape: the
    returnflag filter prunes at the read; lineitem revenue pre-aggs
    per order (block-partial Sum) so the corpus-sized exchange carries
    (orderkey, partial) rows; order→customer attribution is one
    bucketed join + one custkey group-sum; the customer dimension join
    is bucket-hashed; the 25-row nation dimension rides map-side as a
    plain dict; the final top-20 is a per-batch combiner + k-row
    reduce — no full sort.  Revenue integer-exact in nano units:
    floor(price·1e6) × (1000 − floor(discount·1e3))."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.skew import global_top_k

    li = rd.read_parquet(
        _sf_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    )

    def li_rev(t: pa.Table) -> pa.Table:
        price = _micro(t.column("l_extendedprice")).to_numpy(
            zero_copy_only=False
        )
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
            }
        )

    rev = (
        li.map_batches(li_rev, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("rev_nano", alias_name="r"))
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    per_order = bucketed_hash_join(
        rev, orders, on="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("r", pa.int64())]),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
    )
    per_cust = bucketed_group_agg(
        per_order.map_batches(
            lambda t: t.select(["o_custkey", "r"]), batch_format="pyarrow"
        ),
        "o_custkey", "sum", val_col="r", out_col="revenue_nano",
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey", "revenue_nano"]),
        batch_format="pyarrow",
    )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    labeled = bucketed_hash_join(
        per_cust, cust, on="c_custkey",
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("revenue_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string()),
             ("c_nationkey", pa.int32())]
        ),
    )

    # 25-row nation dimension: map-side dict, never a shuffle
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    n_name_of = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    def add_nation(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "n_name": pa.array([n_name_of[int(k)] for k in nk],
                                   pa.string()),
                "revenue_nano": t.column("revenue_nano"),
            }
        )

    full = labeled.map_batches(add_nation, batch_format="pyarrow")
    return global_top_k(full, "revenue_nano", "c_custkey", k=20)


def q_cust_order_distribution(sf_dir: str):
    """TPC-H-Q13-shaped customer order-count distribution INCLUDING
    zero-order customers, without materializing the customer ⟕ orders
    outer join: each orders block emits per-custkey PARTIAL counts
    (an Arrow value_counts combiner), the customer key column unions in
    with count 0, one custkey-bucket group-sum yields every customer's
    order count (zeros included), and the histogram is a second groupby
    over the tiny bounded count domain.  Exchange volume: per-block
    distinct custkeys + one int64 row per customer — never
    |orders| × |customer| outer-join rows.  Exactness vs the LEFT JOIN
    oracle relies on o_custkey ⊆ customer (the corpus invariant
    fk_orphan_audit reports as 0 orphans)."""
    from ray.data.aggregate import Count

    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t.column("o_custkey").combine_chunks().value_counts()
        return pa.table(
            {
                "c_custkey": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    def zero_counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "n": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    partials = orders.map_batches(partial_counts, batch_format="pyarrow")
    zeros = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        zero_counts, batch_format="pyarrow"
    )
    per_cust = bucketed_group_agg(
        partials.union(zeros), "c_custkey", "sum", val_col="n",
        out_col="c_count",
        # key volume tracks the customer table: bytes-scaled buckets
        n_buckets=bytes_scaled_partitions(
            _path_bytes(_sf_path(sf_dir, "customer"))
        ),
    )
    return (
        per_cust.map_batches(
            lambda t: t.select(["c_count"]), batch_format="pyarrow"
        )
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
    )


def q_small_qty_part_revenue(sf_dir: str):
    """TPC-H-Q17-shaped small-quantity revenue by brand: over the
    'Brand#1x' part family, the lineitem revenue from rows whose
    quantity is below 20% of that part's average quantity.  Scale
    shape: the brand's part keys never ship as rows — bloom_semi_join
    prunes lineitem map-side (broadcast key set while small, Bloom
    bitmap + exact verify at scale) to ~1/5 of the corpus before any
    exchange; the per-part (sum, count) threshold stats are ONE
    bucketed group-agg over the survivors; the stats rejoin the
    surviving rows with ONE more bucketed join — the 'self-join of
    aggregates' plan for SQL's correlated AVG subquery.  Bloom false
    positives drop at the inner part-dimension join, so the result is
    exact.  Integer-exact threshold: qty < avg/5 ⇔
    5·qty_micro·cnt < sum_qty_micro (qty ≤ 50 ⇒ safe in int64 while a
    part's lineitem count stays < ~3.6·10^10; TPC-H holds it near 30
    at every sf)."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import (
        bloom_semi_join,
        bucketed_group_agg,
        bucketed_hash_join,
    )
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    # the brand filter keeps ~1/5 of lineitem: bytes-scaled buckets
    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "lineitem")) // 5)

    brand_dim = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
            }
        ).filter(pc.starts_with(t.column("p_brand"), "Brand#1")),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "q": _micro(t.column("l_quantity")),
                "p": _micro(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    li_f = bloom_semi_join(li, brand_dim, on="l_partkey", n_buckets=nb)

    stats = bucketed_group_agg(
        li_f.map_batches(
            lambda t: t.select(["l_partkey", "q"]), batch_format="pyarrow"
        ),
        "l_partkey",
        specs=[("sum", "q", "s"), ("count", None, "c")],
        n_buckets=nb,
    )
    # per-part stats ⋈ brand dimension: both sides are per-part tables;
    # the inner join also discards any Bloom false-positive parts
    dim = bucketed_hash_join(
        stats, brand_dim, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("s", pa.int64()), ("c", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("p_brand", pa.string())]
        ),
    )
    joined = bucketed_hash_join(
        li_f, dim, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("q", pa.int64()), ("p", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("s", pa.int64()),
             ("c", pa.int64()), ("p_brand", pa.string())]
        ),
    )

    def qualify(t: pa.Table) -> pa.Table:
        q = t.column("q").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(5 * q * c < s))
        # per-block partial so the final 25-brand groupby moves one row
        # per (block, brand), not one per qualifying lineitem
        df = kept.select(["p_brand", "p"]).to_pandas()
        g = df.groupby("p_brand", sort=False)["p"].agg(["size", "sum"])
        return pa.table(
            {
                "p_brand": pa.array(g.index, pa.string()),
                "n_small": pa.array(g["size"].to_numpy(np.int64)),
                "revenue_micro": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    return (
        joined.map_batches(qualify, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n_small", alias_name="n_small"),
            Sum("revenue_micro", alias_name="revenue_micro"),
        )
    )


def q_fk_orphan_audit(sf_dir: str):
    """Referential-integrity audit across every FK edge of the schema —
    the lake-hygiene report run before joins are trusted: per relation,
    total child rows and rows whose FK has NO parent.  Each check is
    the adaptive exact anti join (bloom-negative rows resolved
    map-side with zero shuffle; only suspects shuffle), so the audit
    costs ~one pruned-column scan per edge.  Returns a 6-row table —
    aggregate-sized, never corpus-sized."""
    from gliner_cpp_ray.stages.joins import bloom_anti_join

    rels = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    names, totals, orphans = [], [], []
    for name, child, ck, parent, pk in rels:
        c = _read(sf_dir, child, columns=[ck]).map_batches(
            lambda t, ck=ck: pa.table({"k": t.column(ck).cast(pa.int64())}),
            batch_format="pyarrow",
        )
        p = _read(sf_dir, parent, columns=[pk]).map_batches(
            lambda t, pk=pk: pa.table({"k": t.column(pk).cast(pa.int64())}),
            batch_format="pyarrow",
        )
        names.append(name)
        totals.append(c.count())
        orphans.append(bloom_anti_join(c, p, on="k").count())
    return pa.table(
        {
            "relation": pa.array(names, pa.string()),
            "n_rows": pa.array(totals, pa.int64()),
            "n_orphans": pa.array(orphans, pa.int64()),
        }
    )


def q_embedding_kmeans(sf_dir: str):
    """Full-corpus distributed k-means (IVF coarse-quantizer training):
    3 deterministic Lloyd iterations over every embedding, k=8 —
    stages/similarity.py:kmeans_fit_distributed.  Each iteration is one
    fixed-size-accumulator aggregate (per-block vectorized assignment +
    partial sums, broadcast centroids); integer-exact micro arithmetic
    end to end so DuckDB replicates the fit bit-for-bit."""
    from gliner_cpp_ray.stages.similarity import kmeans_fit_distributed

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_fit_distributed(ds, k=8, n_iter=3)


def _kmeans_sql(k: int = 8, n_iter: int = 3) -> str:
    """Literal SQL transcription of kmeans_fit_distributed: micro
    quantization, stable-argmin assignment (ORDER BY dd, cell), exact
    integer floor-division centroid update, empty cells keeping the
    previous centroid."""
    parts = [
        # the DOUBLE cast is load-bearing: FLOAT * 1000000 would
        # multiply in single precision and misround ~0.4% of cells by
        # one micro unit vs numpy's float64 path
        "ev AS (SELECT vec_id, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
        "AS BIGINT) AS x, "
        "unnest(range(len(embedding))) AS d FROM embeddings)",
        "c0 AS (SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 "
        "AS BIGINT) AS cell, d, x FROM ev WHERE vec_id IN "
        f"(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
    ]
    prev = "c0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"dist{i} AS (SELECT e.vec_id, c.cell, "
            "sum((e.x - c.x) * (e.x - c.x)) AS dd "
            f"FROM ev e JOIN {prev} c ON e.d = c.d "
            "GROUP BY e.vec_id, c.cell)"
        )
        parts.append(
            f"asg{i} AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
            "row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) "
            f"AS rn FROM dist{i}) WHERE rn = 1)"
        )
        parts.append(
            # exact integer FLOOR division (numpy floor_divide): DuckDB
            # // truncates toward zero and floor(double s/n) misrounds
            # when the true quotient sits just below an integer, so
            # emulate floor explicitly for negative sums
            f"m{i} AS (SELECT a.cell, e.d, "
            "CAST(sum(e.x) // count(*) - CASE WHEN sum(e.x) < 0 "
            "AND sum(e.x) % count(*) <> 0 THEN 1 ELSE 0 END AS BIGINT) "
            f"AS x FROM asg{i} a JOIN ev e USING (vec_id) "
            "GROUP BY a.cell, e.d)"
        )
        parts.append(
            f"c{i} AS (SELECT * FROM m{i} UNION ALL "
            f"SELECT p.* FROM {prev} p WHERE p.cell NOT IN "
            f"(SELECT DISTINCT cell FROM m{i}))"
        )
        prev = f"c{i}"
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT cell, CAST(d AS BIGINT) AS dim, x AS c_micro FROM {prev}"
    )


def q_lineitem_pareto(sf_dir: str):
    """Pareto frontier (skyline) of lineitem maximizing
    (l_quantity, l_extendedprice): rows no other row beats on both
    criteria — stages/frontier.py.  ONE Dataset.aggregate whose
    accumulator is the running frontier (per-block vectorized 2-D
    skyline, tree merge); movement is O(tasks × frontier), frontier
    bounded by distinct quantity values."""
    from gliner_cpp_ray.stages.frontier import pareto_frontier

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "qty_micro": _micro(t.column("l_quantity")),
                "price_micro": _micro(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    return pareto_frontier(
        ds, ["qty_micro", "price_micro"], ["l_orderkey", "l_linenumber"]
    )


def q_user_event_pivot(sf_dir: str):
    """PIVOT: per-user wide counts, one column per event type —
    stages/rollup.py:pivot_counts.  Indicator columns map-side, one
    grouped Sum exchange with block partials; the shuffle carries one
    wide row per (block, user), never a (user, type) pair row."""
    from gliner_cpp_ray.stages.rollup import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(
        ds, "user_id", "event_type",
        ["click", "error", "purchase", "signup", "view"],
    )


def q_user_top_event_type(sf_dir: str):
    """Per-group MODE: each user's most frequent event type (ties →
    lexicographically smallest).  (user, type) counts via the bucketed
    vectorized grouped aggregate, then the per-batch top-k combiner
    takes k=1 per user — stages/joins.py:bucketed_group_agg +
    stages/skew.py:grouped_top_k."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.skew import grouped_top_k

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = bucketed_group_agg(
        ds, ["user_id", "event_type"], "count", out_col="n"
    )
    return grouped_top_k(counts, "user_id", "n", "event_type", k=1)


def q_events_value_delta(sf_dir: str):
    """Per-key first difference (lag delta): value − lag(value) per
    user under ORDER BY (ts, event_id); first-of-key rows omitted —
    stages/windows.py:lag_delta_per_key.  One bucket shuffle,
    per-bucket vectorized shifted subtraction, micro-int exact."""
    from gliner_cpp_ray.stages.windows import lag_delta_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "user_id": t.column("user_id"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return lag_delta_per_key(
        ds, ["user_id"], "ts", "event_id", "value_micro",
        out_col="delta_micro",
    )


def q_event_transitions(sf_dir: str):
    """Markov transition matrix: counts of consecutive (event_type →
    next event_type) pairs per user, ordered by (ts, event_id) —
    stages/windows.py:transition_counts.  One bucket shuffle +
    per-bucket vectorized shift; partials merged by a tiny grouped
    Sum (≤ |types|² rows)."""
    from gliner_cpp_ray.stages.windows import transition_counts

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return transition_counts(
        ds, ["user_id"], "ts", "event_id", "event_type"
    )


def q_embedding_moments(sf_dir: str):
    """Exact corpus Gram matrix (PCA/whitening sufficient statistic):
    sum of x_i·x_j over every embedding, upper triangle —
    stages/similarity.py:embedding_second_moments.  One fixed-size
    (d, d) aggregate; movement O(tasks × d²)."""
    from gliner_cpp_ray.stages.similarity import embedding_second_moments

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_second_moments(ds)


def q_sliding_distinct_users(sf_dir: str):
    """Sliding-window COUNT DISTINCT (3h window, 1h step): distinct
    active users per window — stages/windows.py:sliding_distinct.
    Distinct counts don't roll, so the plan ships the distinct
    (bucket, user) pair set through two pair-bounded exchanges
    (dedupe, then span-replicate + per-window nunique)."""
    from gliner_cpp_ray.stages.windows import sliding_distinct

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    return sliding_distinct(ds, "ts", "user_id", step_s=3600, span_steps=3)


def q_events_type_hour_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP(event_type, hour): the finest level is
    the ONLY corpus-sized aggregate; every coarser level re-aggregates
    the finest (combination-bounded) table — stages/rollup.py."""
    from gliner_cpp_ray.stages.rollup import rollup_counts
    from gliner_cpp_ray.stages.windows import tumbling_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    finest = tumbling_counts(ds, size_s=3600, extra_keys=("event_type",))
    return rollup_counts(finest, keys=["event_type", "bucket"])


def q_order_price_ntile(sf_dir: str):
    """Exact per-row NTILE(4) over (price, key): global rank via the
    two-level value-range scan (one small groupby to the driver, local
    sort + offset per bucket) — stages/packing.py:ntile_global."""
    from gliner_cpp_ray.stages.packing import ntile_global

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "price_micro": _micro(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    return ntile_global(ds, "price_micro", "o_orderkey", tiles=4)


def q_events_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source: write the (int-coded) events through Ray's
    JSON sink, read them back with the JSON source, aggregate — proves
    the engine's non-Parquet source/sink path end-to-end.  The oracle
    aggregates the original Parquet, so any loss in the JSON roundtrip
    (dtype drift, row loss) fails the hash."""
    import shutil

    import ray.data as rd

    out = os.path.join(
        "/tmp/kgray_out/jsonl_rt",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    ).write_json(out)

    from ray.data.aggregate import Count, Sum

    back = rd.read_json(out)
    return back.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value_micro", alias_name="sum_value_micro"),
    )


def q_orders_zorder_files(sf_dir: str):
    """Z-order layout plan: Morton-interleave (custkey, order day),
    chunk the z-sorted order into 1000-row files — the lakehouse
    OPTIMIZE ZORDER BY primitive, stages/layout.py.  Rank via the
    two-level value-range scan (packing.global_order_rank)."""
    from gliner_cpp_ray.stages.layout import zorder_file_assignment

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "x": t.column("o_custkey").cast(pa.int64()),
                "y": pc.divide(
                    t.column("o_orderdate").cast(pa.timestamp("us")).cast(
                        pa.int64()
                    ),
                    86_400_000_000,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return zorder_file_assignment(ds, "x", "y", "o_orderkey",
                                  rows_per_file=1000)


def _zorder_sql() -> str:
    z = (
        "CAST(list_sum(list_transform(generate_series(0,15), "
        "i -> (({v} >> CAST(i AS INT)) & 1) "
        "* (CAST(1 AS BIGINT) << CAST(2*i{off} AS INT)))) AS BIGINT)"
    )
    zx = z.format(v="x", off="")
    zy = z.format(v="y", off="+1")
    return (
        "WITH d AS (SELECT o_orderkey, (o_custkey & 65535) AS x, "
        "((CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)) & 65535) "
        "AS y FROM orders), "
        f"z AS (SELECT o_orderkey, {zx} + {zy} AS zval FROM d) "
        "SELECT o_orderkey, zval, "
        "CAST((row_number() OVER (ORDER BY zval, o_orderkey) - 1) // 1000 "
        "AS BIGINT) AS file_id FROM z"
    )


def q_leakage_safe_split(sf_dir: str):
    """Near-dup-aware train/test split: every member of a MinHash
    near-dup cluster lands on the SAME side (split keyed on cluster_id,
    not doc_id), so train/test contamination through near-duplicates is
    impossible by construction.  Same md5-prefix predicate as
    ``train_test_split`` — shuffle-free given the cluster map."""
    from gliner_cpp_ray.stages.skew import train_test_split

    clusters = _minhash_clusters_cached(sf_dir)
    return train_test_split(clusters, "cluster_id", 80).select_columns(
        ["doc_id", "split"]
    )


def _leakage_split_sql() -> str:
    from gliner_cpp_ray.stages.skew import split_threshold_hex

    th = split_threshold_hex(80)
    return (
        f"SELECT doc_id, CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)),"
        f" 1, 8) < '{th}' THEN 'train' ELSE 'test' END AS split "
        f"FROM ({_minhash_sql()}) t"
    )


_CMS_TERMS = ["scan", "window", "agg", "dup", "zzz-absent"]


def q_cms_term_counts(sf_dir: str):
    """Count-Min sketch occurrence estimates for query terms.  The
    sketch is ONE distributed aggregate whose accumulator is the fixed
    (d, w) count matrix — movement O(tasks · d·w) regardless of corpus
    size; md5-u60 term hash + Mersenne-31 universal family make every
    step SQL-expressible, so the approximate ESTIMATES themselves are
    hash-checked (the KMV discipline applied to Count-Min)."""
    from gliner_cpp_ray.stages.sketches import cms_term_estimates

    ds = _read(sf_dir, "documents", columns=["text"])
    return cms_term_estimates(ds, _CMS_TERMS, d=4, w=1024)


def _cms_sql() -> str:
    from gliner_cpp_ray.stages.sketches import cms_params

    a, b = cms_params(4)
    perm = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(4)
    )
    terms = ", ".join(
        f"('{t}')" for t in sorted(set(_CMS_TERMS))
    )
    u60 = "CAST(concat('0x', substr(md5({0}), 1, 15)) AS BIGINT)"
    cell = "((p.a * ({0} % 2147483647) + p.b) % 2147483647) % 1024"
    return (
        f"WITH tt AS (SELECT lower({_TRIM_SQL}) AS t FROM documents), "
        "lst AS (SELECT list_filter(string_split_regex(t, '\\s+'), "
        "x -> x <> '') AS l FROM tt), "
        "tok AS (SELECT unnest(l) AS w FROM lst), "
        f"xh AS (SELECT {u60.format('w')} AS x FROM tok), "
        f"perm AS (SELECT * FROM (VALUES {perm}) t(i, a, b)), "
        f"cells AS (SELECT p.i, {cell.format('x.x')} AS cell, "
        "count(*) AS n FROM xh x CROSS JOIN perm p GROUP BY p.i, cell), "
        f"q AS (SELECT * FROM (VALUES {terms}) t(term)), "
        f"qc AS (SELECT q.term, p.i, {cell.format(u60.format('q.term'))} AS cell "
        "FROM q CROSS JOIN perm p) "
        "SELECT qc.term, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est_n "
        "FROM qc LEFT JOIN cells c ON c.i = qc.i AND c.cell = qc.cell "
        "GROUP BY qc.term"
    )


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT word-trigram Jaccard near-dup pairs: MinHash-LSH over the
    hashed n-gram sets generates candidates, then each candidate is
    verified by exact set Jaccard (streamed, never driver-side).  The
    DuckDB oracle replicates the whole chain literally — tokenizer,
    trigrams, md5-u60 hashes, signature family, banding, flood cap and
    the exact intersection/union arithmetic (``_ngram_jaccard_sql``)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.5, n=3)


def q_simhash_pairs(sf_dir: str):
    """SimHash banded near-dup pairs.  The word hash is md5-u64 (first
    8 digest bytes, big-endian) precisely so the DuckDB oracle can
    replicate the 64-bit signature — per-occurrence ±1 bit votes,
    banding and the Hamming verify — bit-exactly in SQL
    (``_simhash_sql``), turning this from a rows-only check into a full
    hash-matched one."""
    from gliner_cpp_ray.stages.dedup import simhash_near_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, max_hamming=3)


def q_ngram_contamination(sf_dir: str):
    """Benchmark-contamination check: deterministic 80/20 doc split,
    then per TEST doc the count of its distinct word-trigram hashes
    that occur anywhere in the TRAIN side.  Train grams reduce to a
    vocabulary-bounded distinct set; the test side joins against it on
    the int64 hash (bucketed shuffle join) — no text crosses the wire
    and nothing corpus-proportional reaches the driver."""
    from gliner_cpp_ray.stages.dedup import ngram_contamination

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_contamination(ds, n=3, train_pct=80)


# deterministic PII suffix injected per doc on BOTH sides (testdata text
# is digit-free word soup, so redaction over the raw column would be a
# no-op); the expression is pure doc_id arithmetic so the DuckDB oracle
# concatenates the identical bytes
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or +141555' || CAST(doc_id AS VARCHAR) || "
    "' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
    "CAST(doc_id % 100 AS VARCHAR) || ' end'"
)


def q_pii_redact(sf_dir: str):
    """PII redaction (emails / E.164 phones / IPv4) with per-category
    counts, over deterministically PII-injected text.  The operator
    itself (stages/text_analysis.pii_redact) is one RE2 count + one RE2
    replace per category — a pure streaming map at 100 TB."""
    from gliner_cpp_ray.stages.text_analysis import pii_redact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        # test scaffolding, not the operator: vectorized string concat
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = pd.Series(ids).astype(str)
        suffix = (
            " contact user" + s + "@example.com or +141555" + s
            + " at 10.0." + pd.Series(ids % 256).astype(str)
            + "." + pd.Series(ids % 100).astype(str) + " end"
        )
        txt = pc.binary_join_element_wise(
            t.column("text"), pa.array(suffix, pa.string()), ""
        )
        return pa.table({"doc_id": t.column("doc_id"), "text": txt})

    return ds.map_batches(inject, batch_format="pyarrow").map_batches(
        pii_redact, batch_format="pyarrow"
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (token/distinct-token/bigram
    counts + most-frequent-bigram count) as exact integers."""
    from gliner_cpp_ray.stages.text_analysis import repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pyarrow")


# training-mix rates for the dataset_mixture query: exercises the
# always-keep (>=100), fractional and default-drop (0) paths; zh docs
# fall through to the default
_MIXTURE_RATES = {"en": 100, "de": 50, "fr": 25, "es": 10}


def q_dataset_mixture(sf_dir: str):
    """Deterministic weighted source mixing (keep-rate per lang, md5
    threshold on doc_id) — emits kept-doc counts per source."""
    from ray.data.aggregate import Count

    from gliner_cpp_ray.stages.skew import dataset_mixture

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return (
        dataset_mixture(ds, "doc_id", "lang", _MIXTURE_RATES, default_pct=0)
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"))
    )


def q_sequence_packing(sf_dir: str):
    """Fixed-token-budget sequence packing via distributed prefix sum:
    pack_id = (running token total over doc_id order) // 512.  One
    small groupby (one row per range bucket reaches the driver) + a
    per-bucket vectorized finish."""
    from gliner_cpp_ray.stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counts = ds.map_batches(token_counts, batch_format="pyarrow")
    return pack_sequences(counts, budget=512)


def q_global_shuffle(sf_dir: str):
    """Deterministic global training shuffle: every doc's rank under
    the md5 hash order, as an explicit (doc_id, pos) artifact — uniform,
    run/cluster-size invariant, resumable mid-epoch."""
    from gliner_cpp_ray.stages.packing import global_shuffle_positions

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return global_shuffle_positions(ds)


# ------------------------------------------------------------ embeddings

def _query_vectors(sf_dir: str, n: int = 8):
    """The n query vectors (vec_id < n) via row-group predicate
    pushdown — the driver never loads the full embedding column."""
    import pyarrow.dataset as pads

    dset = pads.dataset(_sf_path(sf_dir, "embeddings"))
    t = dset.to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n
    )
    ids = np.asarray(t.column("vec_id"))
    order = np.argsort(ids, kind="stable")
    qm = np.stack(
        [np.asarray(x) for x in t.column("embedding").to_pylist()]
    )[order]
    return ids[order], qm


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for query vectors vec_id < 8."""
    qids, qm = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, qm, qids, k=10)


# LSH configuration shared by the bucketed queries AND their oracles —
# the oracle SQL embeds these exact hyperplanes as literals, so the
# driver verifies the bucketed semantics (codes, hamming prune, band
# collision) rather than treating LSH as un-checkable.
_LSH_SEED = 23
_LSH_DIM = 64  # embeddings testdata dim at every sf
_ANN_BITS = 16
_ANN_MAX_HAMMING = 6  # prunes ~77% of candidates (binom(16,.5) tail)
_NDUP_BITS = 32
_NDUP_BANDS = 4


def q_ann_topk_lsh(sf_dir: str):
    """Bucketed approximate top-10: score only vectors whose 16-bit LSH
    code is within hamming 6 of the query code — the scale path (the
    exact ``ann_topk`` is the small-N verify).  Oracle-checked: the SQL
    replicates the same hyperplanes + hamming filter literally."""
    qids, qm = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(
        ds, qm, qids, k=10, bits=_ANN_BITS, max_hamming=_ANN_MAX_HAMMING,
        seed=_LSH_SEED,
    )


# IVF configuration shared by the query AND its oracle (the SQL embeds
# the deterministically-trained centroids as literals, so the inverted-
# file semantics — assignment, probe selection, in-cell scoring — are
# hash-checked like the LSH paths, not waived)
_IVF_CELLS = 8
_IVF_PROBE = 3
_IVF_SAMPLE = 512


def _ivf_sample_and_queries(sf_dir: str):
    """Driver-side bounded reads: the k-means SAMPLE (vec_id <
    _IVF_SAMPLE, row-group predicate pushdown — never the full column at
    scale) and the 8 query vectors."""
    import pyarrow.dataset as pads

    dset = pads.dataset(_sf_path(sf_dir, "embeddings"))
    t = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < _IVF_SAMPLE,
    )
    ids = np.asarray(t.column("vec_id"))
    order = np.argsort(ids, kind="stable")
    m = np.stack(
        [np.asarray(x) for x in t.column("embedding").to_pylist()]
    ).astype(np.float64)[order]
    ids = ids[order]
    qsel = ids < 8
    return m, ids[qsel], m[qsel]


_IVF_CENTROID_CACHE: dict[str, np.ndarray] = {}


def _ivf_centroids() -> np.ndarray:
    """The IVF index is TRAINED ONCE on a canonical training shard (the
    first ``_IVF_SAMPLE`` vectors of the sf0.01 table) and applied to
    whatever corpus is queried — how a real inverted-file index works
    (train offline, assign online), and what makes the centroid literals
    in the oracle SQL valid at every sf."""
    from gliner_cpp_ray.stages.similarity import kmeans_centroids

    if _SQL_SF not in _IVF_CENTROID_CACHE:
        sample, _, _ = _ivf_sample_and_queries(_SQL_SF)
        _IVF_CENTROID_CACHE[_SQL_SF] = kmeans_centroids(
            sample, _IVF_CELLS, n_iter=5
        )
    return _IVF_CENTROID_CACHE[_SQL_SF]


def _ivf_index_dir(sf_dir: str) -> str:
    """Cell-partitioned IVF index for a corpus, built ONCE and cached
    under /tmp (the offline index-build job at a real deployment):
    parquet partitioned by ``cell`` so probes prune the read itself.
    Built into a temp dir then atomically renamed, so concurrent
    callers never see a half-written index."""
    import hashlib as _hl
    import shutil
    import tempfile

    from gliner_cpp_ray.stages.similarity import build_ivf_index

    key = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = "/tmp/kgray_ivf/v1"
    final = os.path.join(root, key)
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=f"{key}.build-")
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    build_ivf_index(ds, _ivf_centroids(), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, final)
    except OSError:  # another process won the race — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def q_ann_topk_ivf(sf_dir: str):
    """IVF approximate top-10 over a CELL-PARTITIONED index: vectors are
    materialized once into parquet partitioned by their nearest-centroid
    cell (offline index build, cached), and each query wave reads ONLY
    its ``n_probe=3`` probed cells — the read is pruned, not just the
    scoring, which is what an inverted file buys at 100 TB.  Centroids
    come from a one-off deterministic training pass (fixed init, 5
    Lloyd iterations, no RNG) over the canonical training shard, so the
    oracle replicates the whole index as SQL literals — verified 100%
    cell-assignment agreement numpy vs DuckDB (min relative distance
    margin 9e-4, ~1000x the float noise floor)."""
    from gliner_cpp_ray.stages.similarity import ivf_topk_indexed

    _, qids, qm = _ivf_sample_and_queries(sf_dir)
    return ivf_topk_indexed(
        _ivf_index_dir(sf_dir), qm, qids, _ivf_centroids(), k=10,
        n_probe=_IVF_PROBE,
    )


def q_embedding_near_dup_lsh(sf_dir: str):
    """Bucketed near-dup pairs: candidates only within shared LSH bands
    (no broadcast matrix, no all-pairs — the 100 TB shape), cosine-
    verified at 0.4.  Oracle replicates the band filter literally."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_near_dup_pairs(
        ds, dim=_LSH_DIM, threshold=0.4, bits=_NDUP_BITS, bands=_NDUP_BANDS,
        seed=_LSH_SEED,
    )


def q_embedding_dup_components(sf_dir: str):
    """Distributed connected components (min-label propagation,
    ``stages/graph.py``) over the LSH near-dup pair graph — the scale
    path for component labeling when the pair list outgrows the driver
    union-find.  Oracle: a recursive CTE computing the same min-label
    fixpoint over the identical (hyperplane-literal) pair set."""
    from gliner_cpp_ray.stages.graph import cc_label_propagation

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = lsh_near_dup_pairs(
        ds, dim=_LSH_DIM, threshold=0.4, bits=_NDUP_BITS, bands=_NDUP_BANDS,
        seed=_LSH_SEED,
    )
    return cc_label_propagation(pairs.select_columns(["a", "b"]))


def q_embedding_near_dup(sf_dir: str):
    """Exact all-pairs cosine > 0.4 (a < b; threshold chosen so the
    testdata embeddings — random vectors, max pair cosine ~0.51 — yield a
    non-degenerate result).

    This is deliberately the SMALL-N VERIFY path: exact all-pairs needs
    the reference matrix somewhere, so it is read once driver-side and
    shipped as task-closure state (one object-store copy per worker —
    not re-pickled per task).  The 100 TB path is
    ``embedding_near_dup_lsh``, which needs no reference matrix at all."""
    tbl = pq.read_table(
        _sf_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ref_ids = np.asarray(tbl.column("vec_id"))
    ref = np.stack([np.asarray(x) for x in tbl.column("embedding").to_pylist()])
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = ds.map_batches(
        NearDupScorer(ref_ids=ref_ids, ref_matrix=ref, threshold=0.4),
        batch_format="pyarrow",
    )
    df = pairs.select_columns(["a", "b"]).to_pandas()
    if df.empty:  # keep a stable schema even when no pair clears threshold
        df = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
    return df


# ------------------------------------------------------------ multimodal

def q_media_byte_stats(sf_dir: str):
    """Multimodal plumbing over real driver data: derive an opaque
    ``binary`` payload column (utf-8 bytes of the document text — the
    schema/actor shape is identical for image/audio payloads) and run
    the byte-feature stage with a SMALL batch size, the memory-aware
    pattern for large binary rows."""
    from gliner_cpp_ray.stages.multimodal import byte_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pc.cast(t.column("text"), pa.binary()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        lambda t: byte_stats(t, id_col="doc_id"),
        batch_format="pyarrow",
        batch_size=64,
    )


# ---------------------------------------------------------------- events

def _micro(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.floor(pc.multiply(col, 1_000_000.0)), pa.int64())


def q_top_users_by_value(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"user_id": t.column("user_id"), "value_micro": _micro(t.column("value"))}
        ),
        batch_format="pyarrow",
    )
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    agg = bucketed_group_agg(
        ds, "user_id",
        specs=[("count", None, "n_events"), ("sum", "value_micro", "total_micro")],
    )
    return agg.sort(["total_micro", "user_id"], descending=[True, False]).limit(20)


def q_events_hourly(sf_dir: str):
    from gliner_cpp_ray.stages.windows import tumbling_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    return tumbling_counts(ds, size_s=3600, extra_keys=("event_type",))


def q_events_sliding_3h(sf_dir: str):
    from gliner_cpp_ray.stages.windows import sliding_counts

    ds = _read(sf_dir, "events", columns=["ts"])
    return sliding_counts(ds, step_s=3600, span_steps=3)


def q_event_sessions(sf_dir: str):
    """Sessionization: per user, count sessions split at >30 min gaps."""
    from gliner_cpp_ray.stages.windows import session_counts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return session_counts(ds, gap_s=1800)


def q_events_rolling_value(sf_dir: str):
    """Per-user trailing-3-row rolling value sum, per EVENT — the
    feature-engineering window shape (ROWS BETWEEN k PRECEDING).  One
    key-hash bucket shuffle; per-bucket sort + C-level rolling."""
    from gliner_cpp_ray.stages.windows import rolling_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return rolling_per_key(
        ds, "user_id", "ts", "value_micro", "event_id", window=3
    )


def q_max_order_by_cust(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "total_micro": _micro(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    return bucketed_group_agg(
        ds, "o_custkey",
        specs=[("max", "total_micro", "max_total_micro"),
               ("count", None, "n_orders")],
    )


def q_distinct_event_types(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": pd.Series(vals, dtype="object")})


def q_events_by_type_salted(sf_dir: str):
    """Grouped count with salted two-phase aggregation (hot-key safe)."""
    from gliner_cpp_ray.stages.skew import salted_group_count

    ds = _read(sf_dir, "events", columns=["event_type"])
    return salted_group_count(ds, "event_type", n_salts=8)


def q_docs_sample_by_lang(sf_dir: str):
    """Deterministic stratified sample: the 20 hash-rank-smallest docs
    per language — per-stratum caps for a training mix, stable across
    runs/partitionings, exactly reproducible in SQL."""
    from gliner_cpp_ray.stages.skew import stratified_sample

    ds = _read(sf_dir, "documents", columns=["lang", "doc_id"])
    return stratified_sample(ds, "lang", "doc_id", n_per_stratum=20)


def q_docs_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling WITH replacement: 64 draws over
    documents proportional to ``n_chars`` — the mixture-construction
    primitive (sample by token mass, not per-doc uniform).  Probes are
    md5-u60 positions on the cumulative weight line; the assignment is
    the two-level distributed prefix sum, so every draw is int64-exact
    and hash-checks — stages/sampling.py:weighted_sample_with_replacement."""
    from gliner_cpp_ray.stages.sampling import (
        weighted_sample_with_replacement,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample_with_replacement(ds, "doc_id", "n_chars", m=64)


def q_term_doc_frequency(sf_dir: str):
    """Top-50 terms by document frequency (df desc, term asc) — the
    combinable inverted-index / TF-IDF vocabulary building block; raw
    tokens never leave the workers, only per-batch (term, df) partials."""
    from gliner_cpp_ray.stages.text_analysis import term_doc_frequency

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return term_doc_frequency(ds, top_k=50)


def q_top_terms_per_lang(sf_dir: str):
    """Per-language top-10 most frequent terms (grouped heavy hitters):
    vectorized per-batch (lang, term, n) partials, one bucketed exact
    sum, then the shuffle-bounded grouped top-k."""
    from gliner_cpp_ray.stages.text_analysis import top_terms_per_group

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    return top_terms_per_group(ds, group_col="lang", text_col="text", k=10)


def q_host_crawl_budget(sf_dir: str):
    """Crawl-budget allocation: each host keeps its first
    ``n_pages//4 + 1`` page ids — variable-k grouped selection (big
    hosts get proportional slots, every host at least one) —
    stages/skew.py:budget_capped_head, one host-hash exchange."""
    import ray.data as rd

    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.linkgraph import _src_ids
    from gliner_cpp_ray.stages.skew import budget_capped_head

    pages = rd.read_parquet(
        os.path.join(_corpus(sf_dir), "pages"), columns=["url"]
    )
    ds = pages.map_batches(
        lambda t: pa.table(
            {
                "host": pa.array(_src_ids(t.column("url")) % N_HOSTS),
                "pid": pa.array(_src_ids(t.column("url"))),
            }
        ),
        batch_format="pyarrow",
    )
    return budget_capped_head(ds, ["host"], ["pid"], "pid")


def q_priority_revenue_share(sf_dir: str):
    """Ratio-to-total contribution: each order priority's share of
    total order value in exact micro fractions
    (``share_micro = priority_sum * 1e6 // grand_total``) — the
    contribution-analysis window (`sum() OVER ()`) as two combinable
    aggregates + one tiny broadcast scalar, no second pass over rows."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ds = _read(
        sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "price_micro": _micro(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: group sums + grand total
    total = int(ds.sum("price_micro"))
    agg = bucketed_group_agg(
        ds, "o_orderpriority",
        specs=[("count", None, "n_orders"), ("sum", "price_micro", "sum_micro")],
        n_buckets=8,
    )
    # finish driver-side: the agg is GROUP-bounded (5 priorities) and
    # sum_micro * 1e6 exceeds int64 — Python bigints keep the share
    # exact (the SQL side rides DuckDB's HUGEINT for the same step)
    out = agg.to_pandas()
    out["share_ppm"] = [
        int(s) * 1_000_000 // total for s in out["sum_micro"]
    ]
    out["share_ppm"] = out["share_ppm"].astype("int64")
    return out


def q_user_order_join_skew(sf_dir: str):
    """Join-skew advisor (EXPLAIN-style diagnostics as an operator):
    the 10 hottest keys of a prospective events⋈orders join on
    user/customer key — per-side row counts + per-key output size,
    computed from key-bounded count tables so the fact tables never
    shuffle — stages/joins.py:join_skew_report."""
    from gliner_cpp_ray.stages.joins import join_skew_report

    return join_skew_report(
        _read(sf_dir, "events", columns=["user_id"]),
        _read(sf_dir, "orders", columns=["o_custkey"]),
        "user_id", "o_custkey", k=10,
    )


def q_local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-shaped 6-table plan: revenue from EUROPE customers
    buying from suppliers in their OWN nation, orders placed in 1996.
    Scale shape: the 5/25-row region/nation dims resolve driver-side
    (broadcast closure); orders are date-filtered MAP-SIDE at the read;
    three bucketed hash joins (orders⋈customer on custkey,
    lineitem⋈supplier on suppkey, then the two sides on orderkey) all
    partition on their join key; the local-supplier predicate
    (c_nationkey == s_nationkey) filters the joined stream before ONE
    tiny nation-level grouped sum.  Revenue is integer-exact:
    ``(floor(price·1e6) · (1000 − floor(disc·1e3))) // 1000`` micro
    units per item — int64 sums hold ~3.7e8 average-revenue items per
    nation group before overflow (document-bound, not checked)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    region = pq.read_table(_sf_path(sf_dir, "region"))
    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    rkeys = region.filter(
        pc.equal(region.column("r_name"), "EUROPE")
    ).column("r_regionkey").combine_chunks()
    nat_euro = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=rkeys)
    )
    nkeys = nat_euro.column("n_nationkey").combine_chunks()
    names = dict(
        zip(
            nat_euro.column("n_nationkey").to_pylist(),
            nat_euro.column("n_name").to_pylist(),
        )
    )
    lo = int(np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64))

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(
                    t.column("o_orderdate").cast(pa.int64()), lo
                ),
                pc.less(t.column("o_orderdate").cast(pa.int64()), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    def _euro_keyed(key_col: str, nat_col: str, out_key: str):
        def fn(t: pa.Table) -> pa.Table:
            nat = t.column(nat_col).cast(pa.int64())
            mask = pc.is_in(nat, value_set=nkeys.cast(pa.int64()))
            return pa.table(
                {
                    out_key: t.column(key_col).filter(mask),
                    nat_col: nat.filter(mask),
                }
            )

        return fn

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        _euro_keyed("c_custkey", "c_nationkey", "o_custkey"),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        orders, cust, on="o_custkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
    )

    line = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev_micro": pc.divide(
                    pc.multiply(
                        _micro(t.column("l_extendedprice")),
                        pc.subtract(
                            pa.scalar(1000, pa.int64()),
                            pc.cast(
                                pc.floor(
                                    pc.multiply(
                                        t.column("l_discount"), 1000.0
                                    )
                                ),
                                pa.int64(),
                            ),
                        ),
                    ),
                    pa.scalar(1000, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        _euro_keyed("s_suppkey", "s_nationkey", "l_suppkey"),
        batch_format="pyarrow",
    )
    j2 = bucketed_hash_join(
        line, supp, on="l_suppkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("rev_micro", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "s_nationkey": t.column("s_nationkey"),
                "rev_micro": t.column("rev_micro"),
            }
        ),
        batch_format="pyarrow",
    )

    j3 = bucketed_hash_join(
        j2, j1, on="o_orderkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("s_nationkey", pa.int64()),
             ("rev_micro", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
             ("c_nationkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_nationkey"), t.column("s_nationkey"))
        ).select(["s_nationkey", "rev_micro"]),
        batch_format="pyarrow",
    )
    agg = bucketed_group_agg(
        j3, "s_nationkey",
        specs=[("count", None, "n_items"), ("sum", "rev_micro", "revenue_micro")],
        n_buckets=8,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "n_name": pa.array(
                    [names[k] for k in t.column("s_nationkey").to_pylist()],
                    pa.string(),
                ),
                "n_items": t.column("n_items"),
                "revenue_micro": t.column("revenue_micro"),
            }
        ),
        batch_format="pyarrow",
    )


def q_trending_terms(sf_dir: str):
    """Trending terms per crawl minute: top-5 terms by occurrence
    count for each warc_ts minute window over the synthetic crawl's
    extracted text — the time x text heavy-hitters composition (trend
    dashboards, burst detection; the corpus stamps one fetch per
    second, so minutes give real window counts at every sf).  Same
    vectorized partial + bucketed sum + shuffle-bounded grouped top-k
    machinery as `top_terms_per_lang`, keyed by time window."""
    import ray.data as rd

    from gliner_cpp_ray.stages.text_analysis import top_terms_per_group

    pages = rd.read_parquet(
        os.path.join(_corpus(sf_dir), "pages"), columns=["warc_ts", "text"]
    )
    ds = pages.map_batches(
        lambda t: pa.table(
            {
                "win": pc.cast(
                    pc.divide(
                        t.column("warc_ts").cast(pa.int64()), 60_000_000
                    ),
                    pa.string(),
                ),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    return top_terms_per_group(ds, group_col="win", text_col="text", k=5)


def q_docs_above_median_chars(sf_dir: str):
    """Per-language count of documents whose n_chars bin exceeds the
    language's median bin — the sketch → broadcast → filter selection
    pattern (only the per-group threshold table touches the driver)."""
    from gliner_cpp_ray.stages.sketches import count_above_group_quantile

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return count_above_group_quantile(
        ds, group_col="lang", col="n_chars", lo=0.0, hi=640.0, n_bins=64,
        q_pct=50,
    )


def q_event_props_k_stats(sf_dir: str):
    """Fill rate + sum of the integer ``k`` field extracted from the
    semi-structured ``props`` JSON column, per event type — one
    vectorized RE2 kernel, zero-shuffle map + combinable groupby."""
    from gliner_cpp_ray.stages.semistructured import props_field_stats

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    return props_field_stats(ds, field="k", props_col="props",
                             group_col="event_type")


def q_order_price_quantiles(sf_dir: str):
    """Approximate p50/p90/p99 of ``o_totalprice`` via a fixed-bin
    distributed histogram (combinable per-batch partials; only 64 bin
    rows reach the driver).  Reported as integer bin indices so the
    approximate estimate itself hash-matches the SQL replica."""
    from gliner_cpp_ray.stages.sketches import histogram_quantile_bins

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    return histogram_quantile_bins(
        ds, "o_totalprice", lo=0.0, hi=512_000.0, n_bins=64,
        q_pcts=(50, 90, 99),
    )


def q_price_quantiles_by_status(sf_dir: str):
    """Per-GROUP approximate quantiles: p50/p90/p99 bin of
    ``o_totalprice`` per order status.  Combinable (group, bin, n)
    partials, one group-bucket shuffle, vectorized per-bucket reduce —
    nothing reaches the driver."""
    from gliner_cpp_ray.stages.sketches import grouped_histogram_quantile_bins

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    return grouped_histogram_quantile_bins(
        ds, "o_orderstatus", "o_totalprice", lo=0.0, hi=512_000.0,
        n_bins=64, q_pcts=(50, 90, 99),
    )


_KMV_K = 64


def q_distinct_users_kmv(sf_dir: str):
    """KMV (bottom-k) distinct-count sketch over ``events.user_id`` —
    the mergeable-sketch operator: per-batch k-min partials, one tiny
    driver merge (k hashes per block cross the wire, nothing else).
    The md5 hash and the pure-int64 estimator are replicated in the
    oracle SQL, so the APPROXIMATE estimate itself is hash-checked."""
    from gliner_cpp_ray.stages.sketches import kmv_distinct_count

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = kmv_distinct_count(ds, "user_id", k=_KMV_K)
    return pd.DataFrame({"k": [_KMV_K], "estimate": [est]}).astype("int64")


def q_custkey_overlap_kmv(sf_dir: str):
    """KMV set-overlap estimate between the distinct customer keys
    referenced by orders and the customer table's key set — the
    cross-corpus dedup-sizing / join-cardinality sketch,
    stages/sketches.py:kmv_overlap.  O(tasks*k) hashes move; the
    md5-based estimator is replicated literally by the oracle so the
    APPROXIMATE answer itself hash-checks."""
    from gliner_cpp_ray.stages.sketches import kmv_overlap

    est = kmv_overlap(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        _read(sf_dir, "customer", columns=["c_custkey"]),
        "o_custkey", "c_custkey", k=_KMV_K,
    )
    return pd.DataFrame([est]).astype("int64")


def q_order_price_histogram(sf_dir: str):
    """Exact 16-bin equi-width histogram of micro-quantized order
    totals between the column's own min/max — integer edges, so the
    distribution profile hash-checks bit-for-bit.
    stages/sketches.py:equiwidth_histogram (two pruned passes)."""
    from gliner_cpp_ray.stages.sketches import equiwidth_histogram

    ds = _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
        lambda t: pa.table({"price_micro": _micro(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    )
    return equiwidth_histogram(ds, "price_micro", n_bins=16)


def q_lineitem_exact_median(sf_dir: str):
    """EXACT lower-median of micro-quantized l_extendedprice via
    distributed selection (iterative histogram refinement: 3-4 pruned
    scans, tasks x 4096 bincount rows per scan, n_bins ints of driver
    state) — stages/sketches.py:exact_order_statistic."""
    from gliner_cpp_ray.stages.sketches import exact_order_statistic

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {"price_micro": _micro(t.column("l_extendedprice"))}
        ),
        batch_format="pyarrow",
    ).materialize()  # scanned once per refinement round
    est = exact_order_statistic(ds, "price_micro")
    return pd.DataFrame([est]).astype("int64")


def q_distinct_users_per_type(sf_dir: str):
    """Grouped KMV distinct-count (C55): distinct users PER event type,
    fully distributed — per-batch grouped bottom-k partials, ONE
    bucket-hash shuffle of (group, hash) rows, per-group estimator
    inside whole-bucket reduces; the driver never sees a hash.  Same
    md5 + pure-int64 estimator as C20, so every per-group ESTIMATE is
    itself hash-checked by the oracle."""
    from gliner_cpp_ray.stages.sketches import grouped_kmv_distinct

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_kmv_distinct(ds, "event_type", "user_id", k=_KMV_K)


def q_train_test_split(sf_dir: str):
    """Deterministic hash split; emits per-split counts."""
    from ray.data.aggregate import Count

    from gliner_cpp_ray.stages.skew import train_test_split

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return (
        train_test_split(ds, "doc_id", 80)
        .groupby("split")
        .aggregate(Count(alias_name="n_docs"))
    )


def q_order_lineitem_join(sf_dir: str):
    """Large-large bucketed hash join: lineitem ⋈ orders, revenue per
    order priority (micro-unit ints for exact oracle comparison)."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import bucketed_hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "price_micro": _micro(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = bucketed_hash_join(
        li, orders, on="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "orders"),
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_items"),
            Sum("price_micro", alias_name="revenue_micro"),
        )
    )


def q_events_asof_order(sf_dir: str):
    """Backward as-of join (custom non-equi operator): each event is
    matched to its user's most recent order with ``o_orderdate <= ts``
    (ties on date broken by max ``o_orderkey``), then aggregated per
    matched order priority.  ``sum_orderkey`` checksums exactly WHICH
    order matched every event, so the per-row as-of semantics are
    hash-verified, not just the counts."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import asof_join_bucketed

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ev = ev.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = asof_join_bucketed(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        tiebreak="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "events", "orders"),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_events"),
        Sum("o_orderkey", alias_name="sum_orderkey"),
        Sum("value_micro", alias_name="sum_value_micro"),
    )


def q_events_in_order_window(sf_dir: str):
    """Interval (range) join: events falling inside each order's 2-day
    activity window ``[2024-01-01 + (o_orderkey % 28) days, +2 days)``
    for the same user — a deterministic window derivation that puts the
    1995-2001 order dates inside the 2024 event month, so the non-equi
    predicate is selective rather than empty.  Both sides corpus-sized,
    co-partitioned by user hash (one shuffle per side)."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import interval_join_bucketed

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    ev = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )

    def windows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        day_us = np.int64(86_400_000_000)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        lo = base + ((k % 28) * day_us).astype("timedelta64[us]")
        return pa.table(
            {
                "user_id": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "win_lo": pa.array(lo),
                "win_hi": pa.array(lo + (2 * day_us).astype("timedelta64[us]")),
            }
        )

    wins = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        windows, batch_format="pyarrow"
    )
    joined = interval_join_bucketed(
        ev, wins, key="user_id", point_col="ts", lo_col="win_lo",
        hi_col="win_hi",
        n_buckets=_join_buckets(sf_dir, "events", "orders"),
    )
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    return bucketed_group_agg(
        joined, "o_orderkey",
        specs=[("count", None, "n_events"),
               ("sum", "value_micro", "sum_value_micro")],
        n_buckets=_join_buckets(sf_dir, "events", "orders"),
    )


# ----------------------------------------------------------- relational

def q_orders_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation with scale-correct movement: orders
    are PRE-AGGREGATED to one row per custkey (combinable Count — the
    only corpus-sized shuffle), then bucket-hash-joined against the
    customer table (also corpus-sized at real TPC-H scale, so it must
    NOT be a driver-side dict), and only the 25-row nation dim is
    broadcast."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import bucketed_hash_join, broadcast_lookup_join

    nat = pq.read_table(_sf_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nation_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    per_cust = (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    # per_cust ends in an aggregate: pass its (known) schema so the
    # join's schema probe doesn't execute the whole shuffle twice
    joined = bucketed_hash_join(
        per_cust,
        cust,
        on="o_custkey",
        n_buckets=_join_buckets(sf_dir, "orders", "customer"),
        left_schema=pa.schema(
            [("o_custkey", pa.int64()), ("n", pa.int64())]
        ),
    )
    with_nation = broadcast_lookup_join(
        joined, nation_of, key="c_nationkey", out_col="nation"
    )
    return (
        with_nation.groupby("nation")
        .aggregate(Sum("n", alias_name="n_orders"))
    )


def q_top_orders_per_status(sf_dir: str):
    """Per-group top-k by value: the 3 highest-price orders per order
    status (deterministic id tie-break).  Per-batch combiner bounds the
    shuffle at tasks × groups × k rows."""
    from gliner_cpp_ray.stages.skew import grouped_top_k

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderkey", "o_totalprice"]
    )
    return grouped_top_k(
        ds, "o_orderstatus", "o_totalprice", "o_orderkey", k=3
    )


def q_lineitem_europe_semi(sf_dir: str):
    """Bloom-prefiltered EXACT semi join: lineitems supplied by European
    suppliers, counted per returnflag.  The 25-row region/nation dims
    resolve driver-side; the supplier key set builds a distributed Bloom
    bitmap (one fixed-size OR-aggregate) that drops non-matching
    lineitems MAP-SIDE, and the surviving fraction is verified by an
    exact bucketed join — at 100 TB the big side shuffles ~matching
    fraction + FP rate instead of 100%."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import bloom_semi_join

    region = pq.read_table(_sf_path(sf_dir, "region"))
    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    rkeys = region.filter(
        pc.equal(region.column("r_name"), "EUROPE")
    ).column("r_regionkey").combine_chunks()
    nkeys = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=rkeys)
    ).column("n_nationkey").combine_chunks()

    supp_keys = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_suppkey": t.filter(
                    pc.is_in(t.column("s_nationkey"), value_set=nkeys)
                ).column("s_suppkey")
            }
        ),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir, "lineitem", columns=["l_suppkey", "l_returnflag", "l_orderkey"]
    )
    semi = bloom_semi_join(
        li, supp_keys, on="l_suppkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "supplier"),
    )
    return semi.groupby("l_returnflag").aggregate(
        Count(alias_name="n_items"),
        Sum("l_orderkey", alias_name="sum_orderkey"),
    )


def q_lineitem_pricing(sf_dir: str):
    """Q1-style grouped aggregate with predicate pushdown at the read."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        _sf_path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        filter=pads.field("l_quantity") < 25.0,
    )

    def micro(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_micro": _micro(t.column("l_quantity")),
                "price_micro": _micro(t.column("l_extendedprice")),
            }
        )

    return (
        ds.map_batches(micro, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n_items"),
            Sum("qty_micro", alias_name="sum_qty_micro"),
            Sum("price_micro", alias_name="sum_price_micro"),
        )
    )


def q_late_order_priority(sf_dir: str):
    """TPC-H-Q4-shaped order-priority report: 1997 orders with at least
    one lineitem shipped more than 90 days after the order date,
    counted per priority.  Scale shape: the correlated EXISTS
    (ship > orderdate + 90d) folds into ``max(l_shipdate) per order``
    — a per-block partial-max combiner, so the ONE corpus-sized
    exchange carries (orderkey, max) rows; the order side is
    date-filtered MAP-SIDE before the bucketed join; the final
    per-priority count is a tiny grouped rollup."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    lo = int(np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64))
    d90 = 90 * 86_400_000_000

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: (lambda d: pa.table(
            {
                "o_orderkey": t.column("o_orderkey").filter(
                    pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
                ),
                "o_date_us": d.filter(
                    pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
                ),
                "o_orderpriority": t.column("o_orderpriority").filter(
                    pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
                ),
            }
        ))(t.column("o_orderdate").cast(pa.int64())),
        batch_format="pyarrow",
    )
    max_ship = bucketed_group_agg(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "ship_us": t.column("l_shipdate").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        "o_orderkey", agg="max", val_col="ship_us", out_col="max_ship_us",
        n_buckets=_join_buckets(sf_dir, "lineitem"),
    )
    joined = bucketed_hash_join(
        orders, max_ship, on="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "orders"),
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_date_us", pa.int64()),
             ("o_orderpriority", pa.string())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("max_ship_us", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.filter(
            pc.greater(
                t.column("max_ship_us"),
                pc.add(t.column("o_date_us"), pa.scalar(d90, pa.int64())),
            )
        ).select(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        joined, "o_orderpriority", agg="count", out_col="n_late", n_buckets=8
    )


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H-Q15-shaped top-supplier report: the supplier(s) with the
    maximum lineitem revenue over 1996-H1, with ties kept (Q15 keeps
    every supplier at the max).  Scale shape: per-supplier revenue is
    ONE key-hash grouped sum (supplier keys scale with the corpus →
    bucketed_group_agg, not Dataset.groupby); the global max is a
    scalar distributed aggregate (per-batch partial max, k-row driver
    reduce) broadcast back into a filter — never a sort; the name join
    runs AFTER the max filter so it moves only the winner rows.
    Revenue integer-exact in nano units:
    floor(price·1e6) × (1000 − floor(discount·1e3))."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    lo = int(np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1996-07-01").astype("datetime64[us]").astype(np.int64))

    def prep(t: pa.Table) -> pa.Table:
        s = t.column("l_shipdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(s, lo), pc.less(s, hi))
        t = t.filter(keep)
        price = _micro(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
            }
        )

    rev = bucketed_group_agg(
        _read(
            sf_dir, "lineitem",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(prep, batch_format="pyarrow"),
        "s_suppkey", agg="sum", val_col="rev_nano", out_col="total_rev_nano",
        n_buckets=_join_buckets(sf_dir, "lineitem"),
    ).materialize()  # consumed twice: scalar max + winner filter

    # scalar max: one int64 per batch to the driver (bounded by task count)
    parts = rev.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.max(t.column("total_rev_nano")).as_py() or 0],
                           pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    best = int(parts["m"].max())

    winners = rev.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("total_rev_nano"), pa.scalar(best, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return bucketed_hash_join(
        winners, supp, on="s_suppkey", n_buckets=8,
        left_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("total_rev_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string())]
        ),
    ).map_batches(
        lambda t: t.select(["s_suppkey", "s_name", "total_rev_nano"]),
        batch_format="pyarrow",
    )


def q_disjunctive_brand_revenue(sf_dir: str):
    """TPC-H-Q19-shaped disjunctive-predicate revenue: total discounted
    revenue from three (brand, size-range, quantity-range) arms OR-ed
    together.  Scale shape: the part side is filtered MAP-SIDE to the
    three arms' union (brand ∈ 3 of ~25 × small sizes) carrying only
    (partkey, brand, size); the corpus-sized lineitem stream is
    Bloom-pruned on those partkeys BEFORE the bucketed join, so the
    join moves only plausible rows; the OR evaluates vectorized on the
    joined batch; ONE scalar sum ends the plan.  Revenue integer-exact
    in nano units."""
    from gliner_cpp_ray.stages.joins import bloom_semi_join, bucketed_hash_join

    arms = [  # (brand, size_max, qty_lo, qty_hi) — sizes 1..N, qty inclusive
        ("Brand#12", 5, 1, 11),
        ("Brand#23", 10, 10, 20),
        ("Brand#34", 15, 20, 30),
    ]
    brands = pa.array([a[0] for a in arms])
    size_cap = max(a[1] for a in arms)

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(
        lambda t: (lambda keep: pa.table(
            {
                "l_partkey": t.column("p_partkey").filter(keep),
                "p_brand": t.column("p_brand").filter(keep),
                "p_size": t.column("p_size").cast(pa.int64()).filter(keep),
            }
        ))(pc.and_(
            pc.is_in(t.column("p_brand"), value_set=brands),
            pc.and_(
                pc.greater_equal(t.column("p_size").cast(pa.int64()), 1),
                pc.less_equal(t.column("p_size").cast(pa.int64()), size_cap),
            ),
        )),
        batch_format="pyarrow",
    ).materialize()  # tiny: 3 brands × small sizes; reused bloom + join side

    def li_prep(t: pa.Table) -> pa.Table:
        price = _micro(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty_micro": _micro(t.column("l_quantity")),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
            }
        )

    li = bloom_semi_join(
        _read(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow"),
        part, on="l_partkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "part"),
    )
    joined = bucketed_hash_join(
        li, part, on="l_partkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "part"),
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("qty_micro", pa.int64()),
             ("rev_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("p_brand", pa.string()),
             ("p_size", pa.int64())]
        ),
    )

    def arm_sum(t: pa.Table) -> pa.Table:
        qty = t.column("qty_micro")
        size = t.column("p_size")
        brand = t.column("p_brand")
        keep = None
        for b, smax, qlo, qhi in arms:
            m = pc.and_(
                pc.and_(
                    pc.equal(brand, b),
                    pc.less_equal(size, pa.scalar(smax, pa.int64())),
                ),
                pc.and_(
                    pc.greater_equal(qty, pa.scalar(qlo * 1_000_000, pa.int64())),
                    pc.less_equal(qty, pa.scalar(qhi * 1_000_000, pa.int64())),
                ),
            )
            keep = m if keep is None else pc.or_(keep, m)
        s = pc.sum(t.column("rev_nano").filter(keep)).as_py() or 0
        return pa.table({"revenue_nano": pa.array([s], pa.int64())})

    parts = joined.map_batches(arm_sum, batch_format="pyarrow").to_pandas()
    total = int(parts["revenue_nano"].sum())
    return pd.DataFrame({"revenue_nano": pd.array([total], dtype="int64")})


def q_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped waiting-supplier report: for finished ('F')
    orders with lineitems from ≥2 distinct suppliers where EXACTLY ONE
    supplier shipped late (>60 days after the order date), charge that
    supplier one wait; return every charged supplier with its count.
    Scale shape: the order date/status joins the lineitem stream once
    (status filter MAP-SIDE); the multi-supplier / sole-late-supplier
    logic folds into SUMS — per (order, supplier) max(late), then per
    order (count, sum(late), sum(suppkey·late)) so the single late
    supplier's identity comes out of arithmetic, not a re-join; the
    final per-supplier count and name join are supplier-sized."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    d60 = 60 * 86_400_000_000

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(
        lambda t: (lambda keep: pa.table(
            {
                "o_orderkey": t.column("o_orderkey").filter(keep),
                "o_date_us": t.column("o_orderdate").cast(pa.int64()).filter(keep),
            }
        ))(pc.equal(t.column("o_orderstatus"), "F")),
        batch_format="pyarrow",
    )
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "ship_us": t.column("l_shipdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nb = _join_buckets(sf_dir, "lineitem", "orders")
    flagged = bucketed_hash_join(
        li, orders, on="o_orderkey", n_buckets=nb,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("ship_us", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_date_us", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "late": pc.cast(
                    pc.greater(
                        t.column("ship_us"),
                        pc.add(t.column("o_date_us"),
                               pa.scalar(d60, pa.int64())),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    per_supp = bucketed_group_agg(
        flagged, ["o_orderkey", "l_suppkey"],
        agg="max", val_col="late", out_col="late", n_buckets=nb,
    ).map_batches(
        lambda t: t.append_column(
            "key_late", pc.multiply(t.column("l_suppkey"), t.column("late"))
        ),
        batch_format="pyarrow",
    )
    per_order = bucketed_group_agg(
        per_supp, "o_orderkey",
        specs=[("count", None, "n_supp"), ("sum", "late", "n_late"),
               ("sum", "key_late", "late_key")],
        n_buckets=nb,
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("late_key").filter(
                    pc.and_(
                        pc.greater_equal(t.column("n_supp"),
                                         pa.scalar(2, pa.int64())),
                        pc.equal(t.column("n_late"), pa.scalar(1, pa.int64())),
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    numwait = bucketed_group_agg(
        per_order, "s_suppkey", agg="count", out_col="numwait",
        n_buckets=_join_buckets(sf_dir, "supplier"),
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return bucketed_hash_join(
        numwait, supp, on="s_suppkey",
        n_buckets=_join_buckets(sf_dir, "supplier"),
        left_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("numwait", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string())]
        ),
    ).map_batches(
        lambda t: t.select(["s_suppkey", "s_name", "numwait"]),
        batch_format="pyarrow",
    )


def q_host_lang_mix(sf_dir: str):
    """Per-host dominant language: for every crawl host, the language
    with the most pages (ties → lexicographically smallest lang), its
    page count, the host's total pages, and the dominant share in ppm.
    The CommonCrawl-style "is this host monolingual?" audit.  Scale
    shape: hosts scale with the corpus, so the (host, lang) counts are
    ONE key-hash bucketed group-count (never Dataset.groupby's
    per-key Python reduce); the per-host winner is the bounded
    grouped-top-k combiner (k=1); host totals come from a second
    host-keyed group-sum and ONE bucketed join — all exchanges carry
    (host × lang)-bounded rows, not pages."""
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.skew import grouped_top_k

    corpus = _corpus(sf_dir)
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "lang"]
    ).map_batches(
        lambda t: pa.table(
            {
                "host": pc.struct_field(
                    pc.extract_regex(t.column("url"),
                                     r"^https://(?P<host>[^/]+)/"),
                    "host",
                ),
                "lang": t.column("lang"),
            }
        ),
        batch_format="pyarrow",
    )
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    counts = bucketed_group_agg(
        pages, ["host", "lang"], agg="count", out_col="n_top",
        n_buckets=bytes_scaled_partitions(
            _path_bytes(os.path.join(corpus, "pages"))
        ),
    ).materialize()  # (host × lang)-bounded; consumed twice
    top1 = grouped_top_k(counts, "host", "n_top", "lang", k=1).map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host"),
                "top_lang": t.column("lang"),
                "n_top": t.column("n_top"),
            }
        ),
        batch_format="pyarrow",
    )
    totals = bucketed_group_agg(
        counts, "host", agg="sum", val_col="n_top", out_col="n_pages",
        n_buckets=8,
    )
    return bucketed_hash_join(
        top1, totals, on="host", n_buckets=8,
        left_schema=pa.schema(
            [("host", pa.string()), ("top_lang", pa.string()),
             ("n_top", pa.int64())]
        ),
        right_schema=pa.schema(
            [("host", pa.string()), ("n_pages", pa.int64())]
        ),
    ).map_batches(
        # int64 headroom: n_top·10^6 overflows only past 9.2·10^12
        # pages on ONE host — ~10× the size of the entire indexed web
        lambda t: t.append_column(
            "top_ppm",
            pc.divide(
                pc.multiply(t.column("n_top"),
                            pa.scalar(1_000_000, pa.int64())),
                t.column("n_pages"),
            ),
        ),
        batch_format="pyarrow",
    )


def q_charset_audit(sf_dir: str):
    """Per-language charset audit over extracted page text: page count,
    total chars, chars outside printable ASCII (``[ -~]``), and the
    non-ASCII share in ppm — the mojibake / transliteration health
    check a multilingual crawl pipeline runs before tokenizer training.
    Scale shape: the regex strip + length runs vectorized map-side
    (Arrow RE2 kernel, zero-copy batches); only (lang, partial sums)
    leave each task into a bounded-key grouped sum."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    corpus = _corpus(sf_dir)
    ds = rd.read_parquet(os.path.join(corpus, "pages"),
                         columns=["lang", "text"])

    def audit(t: pa.Table) -> pa.Table:
        text = t.column("text")
        total = pc.utf8_length(text).cast(pa.int64())
        stripped = pc.replace_substring_regex(text, "[ -~]", "")
        return pa.table(
            {
                "lang": t.column("lang"),
                "chars": total,
                "non_ascii": pc.utf8_length(stripped).cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(audit, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_pages"),
            Sum("chars", alias_name="total_chars"),
            Sum("non_ascii", alias_name="non_ascii_chars"),
        )
    )
    def finish(t: pa.Table) -> pa.Table:
        # lang-bounded rows; Python ints keep the ppm exact past the
        # int64 ceiling (non_ascii·10^6 overflows once a language holds
        # >9.2 TB of non-ASCII text — realistic at 100 TB corpus scale)
        na = t.column("non_ascii_chars").to_pylist()
        tc = t.column("total_chars").to_pylist()
        return t.append_column(
            "non_ascii_ppm",
            pa.array([x * 1_000_000 // y for x, y in zip(na, tc)],
                     pa.int64()),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) sink + source roundtrip: write the
    int-coded events through ``sources/ipc.py`` (one IPC file per
    block, streamed manifest), read them back with the IPC source,
    aggregate.  The oracle aggregates the original Parquet, so any
    loss in the IPC roundtrip (dtype drift, truncation, row loss)
    fails the hash — including the timestamp column, which CSV would
    have to re-parse but IPC carries as native Arrow."""
    import shutil

    from ray.data.aggregate import Count, Max, Sum

    from gliner_cpp_ray.sources.ipc import read_ipc, write_ipc

    out = os.path.join(
        "/tmp/kgray_out/ipc_rt",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", columns=["event_type", "value", "ts"])
    manifest = write_ipc(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "event_type": t.column("event_type"),
                    "value_micro": _micro(t.column("value")),
                    "ts_us": t.column("ts").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        out,
    )
    n_files = len(manifest.to_pandas())  # consume → force the writes
    assert n_files > 0

    return (
        read_ipc(out)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value_micro", alias_name="sum_value_micro"),
            Max("ts_us", alias_name="max_ts_us"),
        )
    )


def q_events_trailing_1h(sf_dir: str):
    """Per-user trailing one-hour value sum for EVERY event — the
    time-RANGE window frame (includes timestamp peers) that the ROWS
    frame of `events_rolling_value` cannot express.  One key-hash
    exchange; the reduce is sort + two vectorized searchsorted passes
    + an int64 cumsum difference (stages/windows.py:trailing_range_sum)."""
    from gliner_cpp_ray.stages.windows import trailing_range_sum

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    out = trailing_range_sum(
        ds, "user_id", "ts_us", "value_micro", "event_id",
        range_us=3_600_000_000,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "range_sum_micro": t.column("range_sum"),
            }
        ),
        batch_format="pyarrow",
    )


def q_nation_part_margin(sf_dir: str):
    """TPC-H-Q9-shaped profit report: per (supplier nation, ship year),
    the margin on 'widget' parts — revenue minus retail cost of the
    shipped quantity.  Scale shape: the part side filters MAP-SIDE on
    the name predicate carrying only (partkey, retail_micro); the fact
    stream is Bloom-pruned before the partkey bucketed join; the
    supplier join buckets on suppkey; the 25-row nation name map
    broadcasts; ONE (nation × year)-bounded grouped sum ends the plan.
    Margin integer-exact in nano units: price_micro·(1000−disc_milli)
    − retail_micro·qty·1000."""
    from gliner_cpp_ray.stages.joins import (
        bloom_semi_join,
        broadcast_lookup_join,
        bucketed_group_agg,
        bucketed_hash_join,
    )

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]
    ).map_batches(
        lambda t: (lambda keep: pa.table(
            {
                "l_partkey": t.column("p_partkey").filter(keep),
                "retail_micro": _micro(t.column("p_retailprice")).filter(keep),
            }
        ))(pc.match_substring(t.column("p_name"), "widget")),
        batch_format="pyarrow",
    ).materialize()  # name-filtered slice; bloom build + join side

    def li_prep(t: pa.Table) -> pa.Table:
        price = _micro(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "l_year": pc.year(t.column("l_shipdate")).cast(pa.int64()),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
                "qty": pc.cast(pc.floor(t.column("l_quantity")), pa.int64()),
            }
        )

    nb = _join_buckets(sf_dir, "lineitem", "part")
    li = bloom_semi_join(
        _read(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(li_prep, batch_format="pyarrow"),
        part, on="l_partkey", n_buckets=nb,
    )
    with_part = bucketed_hash_join(
        li, part, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("l_year", pa.int64()), ("rev_nano", pa.int64()),
             ("qty", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("retail_micro", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "l_year": t.column("l_year"),
                "margin_nano": pc.subtract(
                    t.column("rev_nano"),
                    pc.multiply(
                        pc.multiply(t.column("retail_micro"), t.column("qty")),
                        pa.scalar(1000, pa.int64()),
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_nationkey": t.column("s_nationkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        with_part, supp, on="s_suppkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "supplier"),
        left_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("l_year", pa.int64()),
             ("margin_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
    )
    agg = bucketed_group_agg(
        joined, ["s_nationkey", "l_year"],
        agg="sum", val_col="margin_nano", out_col="margin_nano", n_buckets=8,
    )
    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    names = dict(
        zip(nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist())
    )
    return broadcast_lookup_join(
        agg, names, key="s_nationkey", out_col="nation"
    ).map_batches(
        lambda t: t.select(["nation", "l_year", "margin_nano"]),
        batch_format="pyarrow",
    )


def q_regional_market_share(sf_dir: str):
    """TPC-H-Q8-shaped market-share report: among ECONOMY-type parts
    sold to EUROPE-region customers with 1996-1997 orders, NATION_7
    suppliers' share of revenue per order year (exact ppm).  Scale
    shape: region→nation resolves to a broadcast key set filtering
    customers MAP-SIDE; those custkeys Bloom-semi-filter orders; the
    part type slice Bloom-prunes lineitem before its bucketed join;
    the supplier join carries only the one-bit 'target nation' flag;
    the order join buckets on orderkey; TWO sums per year (total,
    flagged) come out of ONE bounded grouped aggregate."""
    from gliner_cpp_ray.stages.joins import (
        bloom_semi_join,
        bucketed_group_agg,
        bucketed_hash_join,
    )

    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    region = pq.read_table(_sf_path(sf_dir, "region"))
    europe = region.filter(pc.equal(region.column("r_name"), "EUROPE"))
    rkey = europe.column("r_regionkey")[0].as_py()
    eu_nations = pa.array(
        nation.filter(pc.equal(nation.column("n_regionkey"), rkey))
        .column("n_nationkey").cast(pa.int64()).to_pylist(),
        pa.int64(),
    )
    target = nation.filter(pc.equal(nation.column("n_name"), "NATION_7"))
    target_key = target.column("n_nationkey")[0].as_py()

    lo = int(np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64))

    cust_keys = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey").filter(
                    pc.is_in(t.column("c_nationkey").cast(pa.int64()),
                             value_set=eu_nations)
                )
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: (lambda d: (lambda keep: pa.table(
            {
                "o_orderkey": t.column("o_orderkey").filter(keep),
                "o_custkey": t.column("o_custkey").filter(keep),
                "o_year": pc.year(t.column("o_orderdate")).cast(
                    pa.int64()).filter(keep),
            }
        ))(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))))(
            t.column("o_orderdate").cast(pa.int64())
        ),
        batch_format="pyarrow",
    )
    eu_orders = bloom_semi_join(
        orders, cust_keys, on="o_custkey",
        n_buckets=_join_buckets(sf_dir, "orders", "customer"),
    ).drop_columns(["o_custkey"])

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("p_partkey").filter(
                    pc.equal(t.column("p_type"), "ECONOMY")
                )
            }
        ),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        price = _micro(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "o_orderkey": t.column("l_orderkey"),
                "s_suppkey": t.column("l_suppkey"),
                "rev_nano": pa.array(price * (1000 - disc), pa.int64()),
            }
        )

    li = bloom_semi_join(
        _read(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_orderkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow"),
        part, on="l_partkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "part"),
    ).drop_columns(["l_partkey"])

    supp = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "is_target": pc.cast(
                    pc.equal(t.column("s_nationkey").cast(pa.int64()),
                             pa.scalar(int(target_key), pa.int64())),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    li_s = bucketed_hash_join(
        li, supp, on="s_suppkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "supplier"),
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("s_suppkey", pa.int64()),
             ("rev_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("is_target", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "rev_nano": t.column("rev_nano"),
                "target_nano": pc.multiply(t.column("rev_nano"),
                                           t.column("is_target")),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        li_s, eu_orders, on="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "orders"),
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("rev_nano", pa.int64()),
             ("target_nano", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
        ),
    )
    agg = bucketed_group_agg(
        joined, "o_year",
        specs=[("sum", "rev_nano", "total_nano"),
               ("sum", "target_nano", "target_nano")],
        n_buckets=8,
    )
    def finish(t: pa.Table) -> pa.Table:
        # year-bounded rows; Python ints avoid the int64 overflow of
        # target_nano·10^6 (~10^20) that DuckDB's HUGEINT absorbs
        tot = t.column("total_nano").to_pylist()
        tgt = t.column("target_nano").to_pylist()
        return t.append_column(
            "share_ppm",
            pa.array([x * 1_000_000 // y for x, y in zip(tgt, tot)],
                     pa.int64()),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_orders_zonemap_scan(sf_dir: str):
    """Zone-map pruned scan: orders land in price-band-partitioned
    Parquet; a high-price aggregate then reads FOOTER STATS for every
    file (metadata only, distributed), prunes the files whose
    [min,max] cannot match, and scans ONLY the survivors with the
    residual filter — the Iceberg/Delta data-skipping read path.  The
    oracle aggregates the raw table, so a wrong prune (dropped
    matching file) or a missing residual filter fails the hash.
    Driver holds one (file, min, max) row per file — file-count
    bounded, never rows."""
    import shutil

    import ray.data as rd

    from gliner_cpp_ray.stages.layout import parquet_zonemaps, zonemap_prune

    out = os.path.join(
        "/tmp/kgray_out/zonemap",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(out, ignore_errors=True)
    band = 50_000 * 1_000_000  # 50k-price bands → ~10 partitions
    _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: (lambda m: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "total_micro": m,
                "band": pc.divide(m, pa.scalar(band, pa.int64())),
            }
        ))(_micro(t.column("o_totalprice"))),
        batch_format="pyarrow",
    ).write_parquet(out, partition_cols=["band"])

    files = [
        os.path.join(root, n)
        for root, _d, names in sorted(os.walk(out))
        for n in sorted(names) if n.endswith(".parquet")
    ]
    zones = parquet_zonemaps(files, "total_micro").to_pandas()
    cut = 400_000 * 1_000_000
    survivors = zonemap_prune(zones, lo=cut)
    assert len(survivors) < len(files), "zone maps pruned nothing"

    from ray.data.aggregate import Count, Sum

    scanned = rd.read_parquet(survivors, columns=["total_micro"]).map_batches(
        lambda t: t.filter(
            pc.greater(t.column("total_micro"), pa.scalar(cut, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    res = scanned.aggregate(
        Count(alias_name="n_orders"),
        Sum("total_micro", alias_name="total_micro"),
    )  # Dataset.aggregate returns a scalar dict
    return pd.DataFrame(
        {
            "n_orders": pd.array([int(res["n_orders"])], dtype="int64"),
            "total_micro": pd.array([int(res["total_micro"])], dtype="int64"),
        }
    )


def q_docs_schema_union(sf_dir: str):
    """Schema-evolution read: documents split into a v1 directory
    (doc_id, lang, n_chars) and a v2 directory that added a ``quality``
    column; ``sources/union.py:read_parquet_union`` reads both under
    the union-by-name schema (v1 rows null-filled) and ONE grouped
    aggregate proves no row, column, or null was lost.  The oracle
    recomputes the split from the source table, checking the whole
    write→union-read path end-to-end."""
    import shutil

    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.sources.union import read_parquet_union

    root = os.path.join(
        "/tmp/kgray_out/schema_union",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(root, ignore_errors=True)
    v1, v2 = os.path.join(root, "v1"), os.path.join(root, "v2")
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ds.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0)
        ),
        batch_format="pyarrow",
    ).write_parquet(v1)
    ds.map_batches(
        lambda t: (lambda f: f.append_column(
            "quality",
            pc.subtract(
                f.column("n_chars"),
                pc.multiply(
                    pc.divide(f.column("n_chars"), pa.scalar(7, pa.int64())),
                    pa.scalar(7, pa.int64()),
                ),
            ),  # n_chars % 7 (Arrow has no mod kernel; int divide truncates)
        ))(t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 1))),
        batch_format="pyarrow",
    ).write_parquet(v2)

    back = read_parquet_union([v1, v2])

    def prep(t: pa.Table) -> pa.Table:
        q = t.column("quality")
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_chars": t.column("n_chars"),
                "q_filled": pc.coalesce(q, pa.scalar(0, pa.int64())),
                "has_q": pc.cast(pc.is_valid(q), pa.int64()),
            }
        )

    return (
        back.map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("q_filled", alias_name="sum_quality"),
            Sum("has_q", alias_name="n_with_quality"),
        )
    )


def q_kg_entity_salience(sf_dir: str):
    """Per-document MOST SALIENT entity: the canonical entity with the
    most mentions in the doc (ties → lexicographically smallest) plus
    its count — the doc-level KG feature serving doc→entity linking.
    Scale shape: canon resolution runs once per batch-distinct
    (surface, label) inside ``doc_canon_counts`` (never per row); the
    per-batch (doc, canon, n) partials group-sum through ONE key-hash
    exchange; the winner comes from the shuffle-bounded grouped top-k
    combiner (k=1)."""
    import pickle

    from gliner_cpp_ray.stages.cooccur import doc_canon_counts
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.skew import grouped_top_k

    _, out = _run_kg(sf_dir)
    with open(os.path.join(out, "canon", "canon_map.pkl"), "rb") as f:
        canon_map = pickle.load(f)
    counts = bucketed_group_agg(
        _read_out(out, "mentions")
        .select_columns(["doc_id", "text", "label"])
        .map_batches(
            lambda t: doc_canon_counts(t, canon_map), batch_format="pyarrow"
        ),
        ["doc_id", "canon_id"], agg="sum", val_col="n", out_col="n",
    )
    return grouped_top_k(counts, "doc_id", "n", "canon_id", k=1).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "top_entity": t.column("canon_id"),
                "n_mentions": t.column("n"),
            }
        ),
        batch_format="pyarrow",
    )


def q_events_contract_audit(sf_dir: str):
    """Data-contract gate over the event log: per-rule violation counts
    (null/zero user, non-positive value, timestamp outside the corpus
    era, unknown event type, malformed props JSON) — the validation
    report a training pipeline emits before ingestion.  Scale shape:
    every rule evaluates vectorized map-side; one (rules × tasks)-row
    exchange, tiny grouped sum (stages/contract.py)."""
    from gliner_cpp_ray.stages.contract import contract_audit

    known = pa.array(["click", "view", "purchase", "signup", "error"])
    lo = int(np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("2030-01-01").astype("datetime64[us]").astype(np.int64))

    rules = [
        ("user_id_positive",
         lambda t: pc.or_kleene(
             pc.is_null(t.column("user_id")),
             pc.less_equal(t.column("user_id"), pa.scalar(0, pa.int64())),
         )),
        ("value_positive",
         lambda t: pc.or_kleene(
             pc.is_null(t.column("value")),
             pc.less_equal(t.column("value"), pa.scalar(0.0)),
         )),
        ("ts_in_era",
         lambda t: pc.invert(
             pc.and_(
                 pc.greater_equal(t.column("ts").cast(pa.int64()), lo),
                 pc.less(t.column("ts").cast(pa.int64()), hi),
             )
         )),
        ("event_type_known",
         lambda t: pc.invert(
             pc.is_in(t.column("event_type"), value_set=known)
         )),
        ("props_json_object",
         lambda t: pc.invert(
             pc.and_(
                 pc.starts_with(t.column("props"), "{"),
                 pc.ends_with(t.column("props"), "}"),
             )
         )),
    ]
    ds = _read(sf_dir, "events",
               columns=["user_id", "value", "ts", "event_type", "props"])
    return contract_audit(ds, rules)


def q_events_late_arrivals(sf_dir: str):
    """Out-of-order-arrival audit: treating event_id as INGESTION order,
    per user — total events, events that arrived with an event-time
    EARLIER than the running event-time maximum (the rows a streaming
    engine's watermark would count late), and the worst lateness in µs.
    The stream-health report that sizes watermark delay.  Scale shape:
    ONE key-hash exchange; the per-bucket reduce is a sort + C-level
    grouped cummax + vectorized compare, aggregated per user inside the
    bucket (each user fully co-located)."""
    from gliner_cpp_ray.stages.joins import add_bucket
    from gliner_cpp_ray.stages.sizing import default_buckets

    n_buckets = default_buckets(None)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": np.zeros(0, np.int64),
                    "n_events": np.zeros(0, np.int64),
                    "n_out_of_order": np.zeros(0, np.int64),
                    "max_lateness_us": np.zeros(0, np.int64),
                }
            )
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        grp = g.groupby("user_id", sort=False)
        cm = grp["ts_us"].cummax().to_numpy(dtype=np.int64)
        pos = grp.cumcount().to_numpy()
        idx = np.arange(len(g))
        prev_cm = np.where(pos > 0, cm[np.maximum(idx - 1, 0)], np.int64(0))
        late = (pos > 0) & (ts < prev_cm)
        lateness = np.where(late, prev_cm - ts, 0).astype(np.int64)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "one": np.ones(len(g), np.int64),
                "late": late.astype(np.int64),
                "lateness": lateness,
            }
        ).groupby("user_id", sort=False).agg(
            n_events=("one", "sum"),
            n_out_of_order=("late", "sum"),
            max_lateness_us=("lateness", "max"),
        ).reset_index()
        return out.astype({"n_events": np.int64,
                           "n_out_of_order": np.int64,
                           "max_lateness_us": np.int64})

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    return (
        ds.map_batches(
            lambda t: add_bucket(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "event_id": t.column("event_id"),
                        "ts_us": t.column("ts").cast(pa.int64()),
                    }
                ),
                "user_id", n_buckets,
            ),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(
            lambda g: reduce_bucket(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
    )


def q_join_size_stats(sf_dir: str):
    """Join-size statistic — the planner input that decides broadcast
    vs shuffle vs salt: the EXACT row count |events ⋈ orders ON
    user_id = o_custkey| plus the matching-key count, computed WITHOUT
    running the join.  Scale shape: per-key counts on each side are
    corpus-sized grouped sums; the dot product moves only the two
    (key, n) tables through one bucketed join; the scalar sum uses
    unbounded ints at the driver (a hot key's n_a·n_b product can pass
    int64 long before the join itself would be runnable)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    ev = bucketed_group_agg(
        _read(sf_dir, "events", columns=["user_id"]).map_batches(
            lambda t: pa.table({"k": t.column("user_id")}),
            batch_format="pyarrow",
        ),
        "k", agg="count", out_col="n_a",
        n_buckets=_join_buckets(sf_dir, "events"),
    )
    orders = bucketed_group_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
            lambda t: pa.table({"k": t.column("o_custkey")}),
            batch_format="pyarrow",
        ),
        "k", agg="count", out_col="n_b",
        n_buckets=_join_buckets(sf_dir, "orders"),
    )
    joined = bucketed_hash_join(
        ev, orders, on="k",
        n_buckets=_join_buckets(sf_dir, "events", "orders"),
        left_schema=pa.schema([("k", pa.int64()), ("n_a", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("n_b", pa.int64())]),
    )
    parts = joined.map_batches(
        lambda t: pa.table(
            {
                "rows": pa.array(
                    [int(pc.sum(pc.multiply(t.column("n_a"),
                                            t.column("n_b"))).as_py() or 0)],
                    pa.int64(),
                ),
                "keys": pa.array([t.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()  # task-count-bounded partials
    return pd.DataFrame(
        {
            "join_rows": pd.array([int(parts["rows"].sum())], dtype="int64"),
            "n_keys": pd.array([int(parts["keys"].sum())], dtype="int64"),
        }
    )


def q_kg_edge_confidence(sf_dir: str):
    """Edge confidence enrichment: every canonical edge annotated with
    its share of the SUBJECT's total support (exact ppm) — the
    normalized score a KG consumer thresholds on instead of raw counts.
    Scale shape: subject totals are one key-hash grouped sum over the
    (already edge-granular) edges table; one subj-keyed bucketed join;
    ppm vectorized (weight·10^6 needs >9.2·10^12 supporting pages per
    edge to overflow int64 — orders beyond any real crawl)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon", "weight"]
    )
    totals = bucketed_group_agg(
        edges, "subj_canon", agg="sum", val_col="weight",
        out_col="subj_weight",
    )
    return bucketed_hash_join(
        edges, totals, on="subj_canon",
        left_schema=pa.schema(
            [("subj_canon", pa.string()), ("pred", pa.string()),
             ("obj_canon", pa.string()), ("weight", pa.int64())]
        ),
        right_schema=pa.schema(
            [("subj_canon", pa.string()), ("subj_weight", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "subj_canon": t.column("subj_canon"),
                "pred": t.column("pred"),
                "obj_canon": t.column("obj_canon"),
                "weight": t.column("weight"),
                "conf_ppm": pc.divide(
                    pc.multiply(t.column("weight"),
                                pa.scalar(1_000_000, pa.int64())),
                    t.column("subj_weight"),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_near_dup_recall_report(sf_dir: str):
    """LSH quality evaluation: exact all-pairs near-dup count vs the
    banded-LSH path's count and their overlap, with recall in ppm —
    the tuning report that decides band/bit parameters before a 100 TB
    run (where only the LSH path is runnable, so its recall must be
    measured at sample scale first).  The intersection joins the two
    pair tables on a width-safe string pair key; every input is
    dup-density bounded."""
    from gliner_cpp_ray.stages.joins import bucketed_hash_join

    def pair_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": pc.binary_join_element_wise(
                    pc.cast(t.column("a"), pa.string()),
                    pc.cast(t.column("b"), pa.string()),
                    ":",
                )
            }
        )

    exact = q_embedding_near_dup(sf_dir)
    import ray.data as rd

    exact_ds = rd.from_arrow(
        pa.Table.from_pandas(exact, preserve_index=False)
    ) if isinstance(exact, pd.DataFrame) else exact
    lsh_ds = q_embedding_near_dup_lsh(sf_dir)

    ek = exact_ds.map_batches(pair_key, batch_format="pyarrow").materialize()
    lk = lsh_ds.map_batches(pair_key, batch_format="pyarrow").materialize()
    n_exact, n_lsh = ek.count(), lk.count()
    n_common = bucketed_hash_join(
        ek, lk, on="pk", n_buckets=8,
        left_schema=pa.schema([("pk", pa.string())]),
        right_schema=pa.schema([("pk", pa.string())]),
    ).count()
    return pd.DataFrame(
        {
            "n_exact": pd.array([n_exact], dtype="int64"),
            "n_lsh": pd.array([n_lsh], dtype="int64"),
            "n_common": pd.array([n_common], dtype="int64"),
            "recall_ppm": pd.array(
                [n_common * 1_000_000 // max(n_exact, 1)], dtype="int64"
            ),
        }
    )


def q_kg_pred_signatures(sf_dir: str):
    """Ontology profile of the graph: per predicate, the observed
    (subject label, object label) signatures with edge counts and total
    support — the audit that catches schema drift (a 'born_in' edge
    whose object suddenly labels as 'person').  Scale shape: the node
    label map joins the edge table TWICE on canon strings (bucketed;
    edges and nodes are both already canonical/bounded by the graph,
    not the corpus); one (pred × label²)-bounded grouped rollup ends
    the plan."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    _, out = _run_kg(sf_dir)
    nodes = _read_out(out, "nodes").select_columns(["canon_id", "label"])
    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon", "weight"]
    )
    subj_labeled = bucketed_hash_join(
        edges.map_batches(
            lambda t: t.rename_columns(
                ["canon_id", "pred", "obj_canon", "weight"]
            ),
            batch_format="pyarrow",
        ),
        nodes, on="canon_id",
        left_schema=pa.schema(
            [("canon_id", pa.string()), ("pred", pa.string()),
             ("obj_canon", pa.string()), ("weight", pa.int64())]
        ),
        right_schema=pa.schema(
            [("canon_id", pa.string()), ("label", pa.string())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "canon_id": t.column("obj_canon"),
                "pred": t.column("pred"),
                "subj_label": t.column("label"),
                "weight": t.column("weight"),
            }
        ),
        batch_format="pyarrow",
    )
    both = bucketed_hash_join(
        subj_labeled, nodes, on="canon_id",
        left_schema=pa.schema(
            [("canon_id", pa.string()), ("pred", pa.string()),
             ("subj_label", pa.string()), ("weight", pa.int64())]
        ),
        right_schema=pa.schema(
            [("canon_id", pa.string()), ("label", pa.string())]
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "pred": t.column("pred"),
                "subj_label": t.column("subj_label"),
                "obj_label": t.column("label"),
                "weight": t.column("weight"),
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        both, ["pred", "subj_label", "obj_label"],
        specs=[("count", None, "n_edges"), ("sum", "weight", "total_weight")],
        n_buckets=8,
    )


def q_user_first_touch(sf_dir: str):
    """First-touch attribution: per FIRST event type (each user's
    earliest event by (ts, event_id)), how many users start there and
    how many of them ever purchase — acquisition-channel conversion in
    exact ppm.  Scale shape: the first touch is the grouped-top-1
    combiner ASCENDING (shuffle bounded at tasks × users × 1); the
    converted flag is a per-user grouped max of a one-bit column; one
    user-keyed bucketed join + a type-bounded rollup finish."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.skew import grouped_top_k

    ds = _read(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "is_purchase": pc.cast(
                    pc.equal(t.column("event_type"), "purchase"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: first-touch scan + converted flag

    # first event per user: grouped_top_k ASCENDING orders by
    # (ts_us, event_id) — the id column is its built-in tie-break, so
    # this equals row_number() OVER (... ORDER BY ts, event_id) = 1
    first = grouped_top_k(
        ds.map_batches(
            lambda t: t.select(["user_id", "ts_us", "event_id", "event_type"]),
            batch_format="pyarrow",
        ),
        "user_id", "ts_us", "event_id", k=1, descending=False,
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "first_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )
    converted = bucketed_group_agg(
        ds, "user_id", agg="max", val_col="is_purchase", out_col="converted",
    )
    joined = bucketed_hash_join(
        first, converted, on="user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("first_type", pa.string())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("converted", pa.int64())]
        ),
    )
    agg = bucketed_group_agg(
        joined, "first_type",
        specs=[("count", None, "n_users"), ("sum", "converted", "n_converted")],
        n_buckets=8,
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "conv_ppm",
            pc.divide(
                pc.multiply(t.column("n_converted"),
                            pa.scalar(1_000_000, pa.int64())),
                t.column("n_users"),
            ),
        ),
        batch_format="pyarrow",
    )


def q_kg_ambiguous_surfaces(sf_dir: str):
    """Linker ambiguity report: for every surface the alias dictionary
    maps to MORE THAN ONE candidate entity (the NIL clusters entity
    disambiguation would have to crack), its observed mention and
    document counts — the report that prioritizes which ambiguities a
    context-sensitive linker should learn first.  Scale shape: the
    ambiguous-surface map is ontology-bounded task state; tagging runs
    once per batch-distinct (surface, label); counts flow through one
    (surface, label, doc) group-sum then a surface-bounded rollup."""
    from gliner_cpp_ray.sources import world
    from gliner_cpp_ray.sources.pages import is_ambiguous_surface
    from gliner_cpp_ray.stages.canonicalize import _dict_codes
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    amb: dict[tuple[str, str], str] = {}
    for lbl, entries in world.all_surfaces().items():
        for surface, _canon, _qid in entries:
            if is_ambiguous_surface(surface, lbl):
                amb[(surface, lbl)] = world.normalize_surface(surface)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "surface": pa.array([], pa.string()),
                    "label": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                }
            )
        si, sd = _dict_codes(t.column("text"))
        li, ld = _dict_codes(t.column("label"))
        combined = si * np.int64(len(ld)) + li
        uniq, inverse = np.unique(combined, return_inverse=True)
        norm_of = np.array(
            [amb.get((sd[int(c) // len(ld)], ld[int(c) % len(ld)]), "")
             for c in uniq],
            dtype=object,
        )
        keep_u = norm_of != ""
        keep = keep_u[inverse]
        return pa.table(
            {
                "surface": pa.array(
                    norm_of[inverse][keep].tolist(), pa.string()
                ),
                "label": t.column("label").filter(pa.array(keep)),
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
            }
        )

    _, out = _run_kg(sf_dir)
    tagged = _read_out(out, "mentions").select_columns(
        ["doc_id", "text", "label"]
    ).map_batches(tag, batch_format="pyarrow")
    per_doc = bucketed_group_agg(
        tagged, ["surface", "label", "doc_id"], agg="count", out_col="n",
    )
    return bucketed_group_agg(
        per_doc, ["surface", "label"],
        specs=[("count", None, "n_docs"), ("sum", "n", "n_mentions")],
        n_buckets=8,
    )


def q_kg_entity_components(sf_dir: str):
    """Connected components of the canonical ENTITY graph (edges
    undirected): per component its label — the lexicographically
    smallest member canon — and size.  The graph-health rollup that
    surfaces whether the KG is one giant hairball or many islands.
    Scale shape: entities hash to md5-u60 int keys so the distributed
    min-label propagation (`graph.cc_label_propagation`) runs on
    int64s; the string label comes back from ONE per-component min over
    the (hash → canon) map — matching SQL's min-string semantics
    exactly."""
    import hashlib

    from gliner_cpp_ray.stages.graph import cc_label_propagation
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    def h60(s: str) -> int:  # md5-u60: int64-safe, repo-wide convention
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(["subj_canon", "obj_canon"])

    def hash_pair(t: pa.Table) -> pa.Table:
        sa = [h60(s) for s in t.column("subj_canon").to_pylist()]
        ob = [h60(s) for s in t.column("obj_canon").to_pylist()]
        return pa.table(
            {
                "a": pa.array(sa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "subj_canon": t.column("subj_canon"),
                "obj_canon": t.column("obj_canon"),
            }
        )

    hashed = edges.map_batches(hash_pair, batch_format="pyarrow").materialize()
    labels = cc_label_propagation(hashed, a_col="a", b_col="b")

    # (hash -> canon) map is 1:1 by construction (node id = hash of the
    # canon); a keyed count dedupes the pairs without touching strings
    names = bucketed_group_agg(
        hashed.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [t.column("a").combine_chunks(),
                         t.column("b").combine_chunks()]
                    ),
                    "canon": pa.concat_arrays(
                        [t.column("subj_canon").combine_chunks().cast(pa.string()),
                         t.column("obj_canon").combine_chunks().cast(pa.string())]
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["node", "canon"], agg="count", out_col="n",
    ).drop_columns(["n"])
    joined = bucketed_hash_join(
        labels, names, on="node",
        left_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("canon", pa.string())]),
    )

    # final rollup keeps the STRING min (the lexicographically smallest
    # member canon), so it reduces via pandas per label-hash bucket
    from gliner_cpp_ray.stages.joins import add_bucket
    from gliner_cpp_ray.stages.sizing import default_buckets

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"component": pd.array([], dtype="string"),
                 "n_nodes": np.zeros(0, np.int64)}
            )
        out = g.groupby("label", sort=False).agg(
            component=("canon", "min"), n_nodes=("canon", "size")
        ).reset_index(drop=True)
        out["n_nodes"] = out["n_nodes"].astype(np.int64)
        return out[["component", "n_nodes"]]

    return (
        joined.map_batches(
            lambda t: add_bucket(t, "label", default_buckets(8)),
            batch_format="pyarrow",
        )
        .groupby("__bucket")
        .map_groups(
            lambda g: reduce_bucket(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
    )


def q_ship_priority_mix(sf_dir: str):
    """TPC-H-Q12-shaped shipment/priority mix: lineitems shipped in
    1997, classified by whether their order is high-priority
    ('1-URGENT'/'2-HIGH'), counted per line status.  Scale shape: the
    date band is pruned AT THE READ (row-group predicate pushdown —
    filtered row groups never leave storage), the priority
    classification rides the ONE orderkey-partitioned bucketed join as
    two 0/1 flag columns, and the rollup is a tiny grouped sum over
    |linestatus| keys."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    from datetime import datetime

    li = rd.read_parquet(
        _sf_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linestatus"],
        filter=(
            (pads.field("l_shipdate") >= datetime(1997, 1, 1))
            & (pads.field("l_shipdate") < datetime(1998, 1, 1))
        ),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "l_linestatus": t.column("l_linestatus"),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = bucketed_hash_join(
        li, orders, on="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "lineitem", "orders"),
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("l_linestatus", pa.string())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
    )

    def flags(t: pa.Table) -> pa.Table:
        hi = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        ).cast(pa.int64())
        return pa.table(
            {
                "l_linestatus": t.column("l_linestatus"),
                "hi": hi,
                "lo": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )

    return bucketed_group_agg(
        joined.map_batches(flags, batch_format="pyarrow"),
        "l_linestatus",
        specs=[("sum", "hi", "n_high"), ("sum", "lo", "n_low")],
        n_buckets=8,
    )


def q_doc_run_length_stats(sf_dir: str):
    """Character-run compression stats per document (see
    ``stages/text_analysis.char_run_stats``): the sub-token low-entropy
    spam signal.  Zero shuffle — one vectorized codepoint-diff pass per
    batch."""
    from gliner_cpp_ray.stages.text_analysis import char_run_stats

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        char_run_stats, batch_format="pyarrow"
    )


def q_ann_topk_filtered(sf_dir: str):
    """Metadata-FILTERED vector retrieval: brute-force cosine top-10
    restricted to embeddings whose ``label`` is in {0, 1, 2} — the
    serving-side shape behind 'nearest neighbors among docs matching a
    filter'.  The filter is pushed to the READ (row-group predicate on
    a non-projected column), so pruned vectors never enter the object
    store — the right plan when the filter is selective; a
    post-scoring filter would waste ~70% of the matmul here."""
    import pyarrow.dataset as pads
    import ray.data as rd

    qids, qm = _query_vectors(sf_dir)
    ds = rd.read_parquet(
        _sf_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filter=pads.field("label").isin([0, 1, 2]),
    )
    return brute_force_topk(ds, qm, qids, k=10)


def q_events_windowed_admitted(sf_dir: str):
    """Watermark-admission replay (see
    ``stages/windows.watermark_admitted_counts``): per hourly window,
    how many events a streaming engine with a 10-minute allowed
    lateness would have admitted vs dropped, replayed deterministically
    over the batch log in ingestion (event_id) order.  The prefix-max
    over arrival order distributes as a two-level range scan — one
    (bucket, max_ts) row per range bucket to the driver, never rows."""
    from gliner_cpp_ray.stages.windows import watermark_admitted_counts

    ev = _read(sf_dir, "events", columns=["event_id", "ts"])
    return watermark_admitted_counts(
        ev, ts_col="ts", id_col="event_id",
        bucket_us=3_600_000_000, lateness_us=600_000_000,
    )


def q_host_pagerank_mass(sf_dir: str):
    """Host-level centrality rollup: total PageRank mass + page count
    per host — the 'which SITES hold the authority' dashboard over the
    page-level C39 ranks.  Reuses the session-cached link graph and the
    exact-integer pagerank; the rollup is a map-side ``% N_HOSTS`` plus
    one host-keyed grouped sum (host table is N_HOSTS-bounded)."""
    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.linkgraph import pagerank

    edges, nodes = _link_graph(sf_dir)
    pr = pagerank(edges, nodes, n_iters=3)

    def to_host(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": pa.array((nid % N_HOSTS).astype(np.int64)),
                "rank_micro": t.column("rank_micro"),
            }
        )

    return bucketed_group_agg(
        pr.map_batches(to_host, batch_format="pyarrow"),
        "host",
        specs=[("sum", "rank_micro", "rank_mass"), ("count", None, "n_pages")],
        n_buckets=8,
    )


def q_doc_length_percentile(sf_dir: str):
    """Per-document GLOBAL percentile rank of length (rank under ORDER
    BY (n_chars, doc_id) plus an exact-ppm percentile) — the
    length-curriculum / outlier-trim feature.  Fourth reuse of the
    packing-module two-level value-range scan: no global sort, one
    count row per range bucket to the driver."""
    from gliner_cpp_ray.stages.packing import global_order_rank

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    ranked, n_total = global_order_rank(ds, "n_chars", "doc_id")
    denom = max(n_total, 1)

    def finish(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": t.column("n_chars").cast(pa.int64()),
                "rank": t.column("rank").cast(pa.int64()),
                "pct_ppm": pa.array((r * 1_000_000 // denom).astype(np.int64)),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def q_kg_two_hop_paths(sf_dir: str):
    """2-hop path counts over the canonical KG: for every (subj, obj)
    reachable through an intermediate entity, how many distinct mids
    connect them — the generic relation-composition statistic above the
    specific ``kg_inferred_country`` rule (link prediction / inference
    candidates).  Scale shape: the edge table is graph-bounded; pred
    dropped to distinct (subj, obj) pairs via one grouped count, then
    ONE mid-keyed bucketed self-join + a pair-keyed grouped count.
    Self-pairs (subj == obj) excluded."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(["subj_canon", "obj_canon"])
    # distinct canonical pairs (edges are (subj, pred, obj)-granular)
    dist = bucketed_group_agg(
        edges, ["subj_canon", "obj_canon"], agg="count", out_col="n",
        n_buckets=8,
    )
    e1 = dist.map_batches(
        lambda t: pa.table(
            {"mid": t.column("obj_canon"), "subj_canon": t.column("subj_canon")}
        ),
        batch_format="pyarrow",
    )
    e2 = dist.map_batches(
        lambda t: pa.table(
            {"mid": t.column("subj_canon"), "obj2": t.column("obj_canon")}
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        e1, e2, on="mid", n_buckets=8,
        left_schema=pa.schema(
            [("mid", pa.string()), ("subj_canon", pa.string())]
        ),
        right_schema=pa.schema([("mid", pa.string()), ("obj2", pa.string())]),
    ).map_batches(
        lambda t: (
            lambda keep: pa.table(
                {
                    "subj_canon": t.column("subj_canon").filter(keep),
                    "obj_canon": t.column("obj2").filter(keep),
                }
            )
        )(pc.invert(pc.equal(t.column("subj_canon"), t.column("obj2")))),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        joined, ["subj_canon", "obj_canon"], agg="count", out_col="n_paths",
        n_buckets=8,
    )


def q_event_value_quartile_by_type(sf_dir: str):
    """Per-GROUP exact NTILE: each event's value quartile WITHIN its
    event type (``NTILE(4) OVER (PARTITION BY event_type ORDER BY
    value_micro, event_id)``) — per-segment score normalization.  Uses
    ``packing.ntile_per_group``: the grouped two-level value-range scan,
    so a hot type's rank work spreads across its value range instead of
    one per-type sort task."""
    from gliner_cpp_ray.stages.packing import ntile_per_group

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ds = ev.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "value_micro": _micro(t.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    return ntile_per_group(
        ds, "event_type", "value_micro", "event_id", tiles=4
    )


def q_doc_sentence_stats(sf_dir: str):
    """Readability stats (see ``stages/text_analysis.sentence_stats``):
    sentence count, token count, exact-ppm words-per-sentence.  Zero
    shuffle."""
    from gliner_cpp_ray.stages.text_analysis import sentence_stats

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        sentence_stats, batch_format="pyarrow"
    )


def q_event_type_trigrams(sf_dir: str):
    """Top-20 behavioral 3-step sequences: counts of consecutive
    event-type trigrams per user timeline (``lead()`` ×2 in SQL), ranked
    by count with a lexicographic tie-break.  The n-gram table is
    |event_types|³-bounded, so the final top-k finishes on the driver;
    the corpus-sized work is ``windows.sequence_ngram_counts``'s single
    key-hash exchange."""
    from gliner_cpp_ray.stages.windows import sequence_ngram_counts

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    counts = sequence_ngram_counts(
        ev, key_cols=["user_id"], ts_col="ts", id_col="event_id",
        state_col="event_type", n=3,
    )
    df = counts.to_pandas()  # |event_types|^3-bounded (125 rows here)
    df = df.sort_values(
        ["n", "s0", "s1", "s2"], ascending=[False, True, True, True]
    ).head(20).reset_index(drop=True)
    df["n"] = df["n"].astype(np.int64)
    return df[["s0", "s1", "s2", "n"]]


def q_link_communities(sf_dir: str):
    """Deterministic label-propagation communities over the crawl link
    graph (see ``stages/graph.label_prop_communities``): 3 synchronous
    rounds, most-frequent-neighbor-label with smallest-label tie-break —
    density communities, not components (a bridge does not merge two
    clusters).  Reuses the session-cached link graph."""
    from gliner_cpp_ray.stages.graph import label_prop_communities

    edges, nodes = _link_graph(sf_dir)
    return label_prop_communities(edges, nodes, n_rounds=3)


def q_events_nearest_order(sf_dir: str):
    """NEAREST-in-time join (custom non-equi operator, see
    ``joins.nearest_join_bucketed``): each event matched to its user's
    temporally closest order — before OR after, unlike the backward
    as-of — ties to the earlier order, then max orderkey; aggregated
    per matched priority.  ``sum_orderkey`` and ``sum_absdt_us``
    checksum exactly WHICH order matched every event and at what
    distance, so the per-row nearest semantics are hash-verified."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, nearest_join_bucketed

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "odate_us": t.column("o_orderdate").cast(pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )
    j = nearest_join_bucketed(
        ev, orders, key="user_id", left_ts="ts_us", right_ts="odate_us",
        tiebreak="o_orderkey",
        n_buckets=_join_buckets(sf_dir, "events", "orders"),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_orderkey": t.column("o_orderkey"),
                "adt": pc.abs(
                    pc.subtract(t.column("ts_us"), t.column("odate_us"))
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(
        j, "o_orderpriority",
        specs=[("count", None, "n_events"),
               ("sum", "o_orderkey", "sum_orderkey"),
               ("sum", "adt", "sum_absdt_us")],
        n_buckets=8,
    )


def q_lineitem_corr_stats(sf_dir: str):
    """Exact sufficient statistics for the quantity↔price Pearson
    correlation: (n, n·Σxy−ΣxΣy, n·Σxx−Σx², n·Σyy−Σy²) — the profiling
    stat behind 'are these columns related' decisions.  Each block
    emits ONE six-int partial row (x = whole-unit quantity, y =
    whole-dollar price keep every per-block sum inside int64 at
    million-row blocks); the driver finish runs in Python unbounded
    ints and the cross terms are emitted as STRINGS because n·Σy²
    exceeds int64 at sf0.1 already (the oracle's HUGEINT does the
    same)."""
    li = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        y = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    # ^ tasks-bounded: one row per input block
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    sxy = int(parts["sxy"].sum())
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype=np.int64),
            "cov_num": [str(n * sxy - sx * sy)],
            "var_x": [str(n * sxx - sx * sx)],
            "var_y": [str(n * syy - sy * sy)],
        }
    )


def q_user_activity_span(sf_dir: str):
    """Per-user activity span: distinct active DAYS plus first/last day
    (epoch days) — the engagement-tenure feature.  Per-batch Arrow
    distinct combiner collapses same-day repeats map-side; one
    (user, day) grouped count makes the pair set globally distinct; the
    per-user rollup is a second user-keyed grouped aggregate over the
    pair-bounded table."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        tab = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(t.column("ts").cast(pa.int64()),
                                 pa.scalar(86_400_000_000, pa.int64())),
            }
        )
        return tab.group_by(["user_id", "day"]).aggregate([])

    pairs = bucketed_group_agg(
        ev.map_batches(proj, batch_format="pyarrow"),
        ["user_id", "day"], agg="count", out_col="__m",
        n_buckets=_join_buckets(sf_dir, "events"),
    )
    return bucketed_group_agg(
        pairs, "user_id",
        specs=[("count", None, "n_active_days"),
               ("min", "day", "first_day"),
               ("max", "day", "last_day")],
        n_buckets=8,
    )


# phrase list for the phrase-match query, shared with its oracle (the
# SQL embeds the same literals); chosen from the generator's vocabulary
# so counts are non-trivial at every sf
_PHRASES = ["batch batch", "hash join", "table scan", "sort merge",
            "window window"]


def q_phrase_match_counts(sf_dir: str):
    """Exact phrase statistics for a fixed phrase list: per phrase, the
    number of documents containing it and the total non-overlapping
    occurrence count — the phrase-query building block TF-IDF/BM25's
    unigram tokenization can't answer.  Zero shuffle: one Arrow
    ``count_substring`` kernel per phrase per batch, (phrases × tasks)
    partial rows, one tiny grouped sum."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    docs = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        ph, nd, no = [], [], []
        for p in _PHRASES:
            c = pc.count_substring(t.column("text"), p)
            cn = c.to_numpy(zero_copy_only=False)
            ph.append(p)
            nd.append(int((cn > 0).sum()))
            no.append(int(cn.sum()))
        return pa.table(
            {
                "phrase": pa.array(ph, pa.string()),
                "nd": pa.array(nd, pa.int64()),
                "no": pa.array(no, pa.int64()),
            }
        )

    return bucketed_group_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        "phrase",
        specs=[("sum", "nd", "n_docs"), ("sum", "no", "n_occurrences")],
        n_buckets=8,
    )


def q_session_type_pairs(sf_dir: str):
    """Within-session event-type co-occurrence (see
    ``windows.session_item_pairs``): sessions (30-min gap, the registry
    sessionization) containing both types of each unordered pair."""
    from gliner_cpp_ray.stages.windows import session_item_pairs

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    return session_item_pairs(
        ev, key_cols=["user_id"], ts_col="ts", id_col="event_id",
        item_col="event_type", gap_us=1_800_000_000,
    )


def q_orders_weekday_profile(sf_dir: str):
    """Day-of-week seasonality: order count + exact micro-unit revenue
    per weekday.  The weekday index is pure integer arithmetic on epoch
    days ((day + 4) mod 7, 0 = Monday — 1970-01-01 was a Thursday), so
    both engines compute it bit-identically with no calendar library.
    One map + one 7-row grouped sum."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def proj(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        wd = (us // 86_400_000_000 + 4) % 7
        return pa.table(
            {
                "weekday": pa.array(wd.astype(np.int64)),
                "price_micro": _micro(t.column("o_totalprice")),
            }
        )

    return bucketed_group_agg(
        orders.map_batches(proj, batch_format="pyarrow"),
        "weekday",
        specs=[("count", None, "n_orders"),
               ("sum", "price_micro", "revenue_micro")],
        n_buckets=8,
    )


def q_kg_edge_trend(sf_dir: str):
    """Temporal KG edge trend: every canonical edge's support split
    into crawls BEFORE vs AFTER the corpus midpoint timestamp — the
    'is this fact gaining or losing support' signal above
    ``kg_edge_timespan``'s first/last interval.  Same scale shape as
    timespan: one url-keyed bucketed join to the pages (url → ts)
    dimension, map-side canon rewrite + per-block (count, early-count)
    partials, one mergeable grouped aggregate.  The midpoint is two
    column-pruned scalars ((min+max)//2), broadcast."""
    import pickle

    import ray
    import ray.data as rd

    from gliner_cpp_ray.stages.canonicalize import _canon_codes, _dict_codes
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    corpus, out = _run_kg(sf_dir)
    with open(os.path.join(out, "canon", "canon_map.pkl"), "rb") as f:
        canon_map = pickle.load(f)
    cm_ref = ray.put(canon_map)

    pages_ts = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "warc_ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "url": t.column("url"),
                "ts_us": t.column("warc_ts").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: midpoint scalars + the join
    mid = (int(pages_ts.min("ts_us")) + int(pages_ts.max("ts_us"))) // 2

    cols = ["url", "subj", "pred", "obj", "subj_label", "obj_label",
            "subj_qid", "obj_qid"]
    linked = _read_out(out, "linked").select_columns(cols)
    joined = bucketed_hash_join(
        linked, pages_ts, on="url",
        n_buckets=bytes_scaled_partitions(
            _path_bytes(os.path.join(out, "linked"))
        ),
        left_schema=pa.schema([(c, pa.string()) for c in cols]),
        right_schema=pa.schema([("url", pa.string()), ("ts_us", pa.int64())]),
    )

    empty = pa.table(
        {
            "subj_canon": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj_canon": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "ne": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        cm = ray.get(cm_ref)
        vocab: dict = {}
        subj_c = _canon_codes(cm, t, "subj", "subj_label", "subj_qid", vocab)
        obj_c = _canon_codes(cm, t, "obj", "obj_label", "obj_qid", vocab)
        pred_i, pred_d = _dict_codes(t.column("pred"))
        group = (subj_c * len(pred_d) + pred_i) * len(vocab) + obj_c
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"g": group, "e": (ts < mid).astype(np.int64)}
        )
        agg = df.groupby("g", sort=False)["e"].agg(["size", "sum"])
        uniq = agg.index.to_numpy()
        canon_arr = np.array(sorted(vocab, key=vocab.get), dtype=object)
        obj_u = uniq % len(vocab)
        rest = uniq // len(vocab)
        pred_u = rest % len(pred_d)
        subj_u = rest // len(pred_d)
        return pa.table(
            {
                "subj_canon": pa.array(canon_arr[subj_u], pa.string()),
                "pred": pa.array(
                    np.array(pred_d, dtype=object)[pred_u], pa.string()
                ),
                "obj_canon": pa.array(canon_arr[obj_u], pa.string()),
                "n": pa.array(agg["size"].to_numpy(np.int64)),
                "ne": pa.array(agg["sum"].to_numpy(np.int64)),
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    summed = bucketed_group_agg(
        partials,
        ["subj_canon", "pred", "obj_canon"],
        specs=[("sum", "n", "weight"), ("sum", "ne", "n_early")],
    )
    return summed.map_batches(
        lambda t: t.append_column(
            "n_late", pc.subtract(t.column("weight"), t.column("n_early"))
        ),
        batch_format="pyarrow",
    )


def q_link_avg_neighbor_degree(sf_dir: str):
    """Average out-degree of each page's out-neighbors (with exact
    integer sum and ppm mean) — the degree-assortativity signal: hubs
    linking to hubs vs hubs linking to leaves.  One grouped count for
    the degree table, one dst-keyed LEFT bucketed join (dangling
    targets count degree 0), one src-keyed grouped rollup — all
    node/edge-bounded over the session-cached distinct edge table."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    edges, _ = _link_graph(sf_dir)
    pairs = edges.select_columns(["src_id", "dst_id"])
    deg = bucketed_group_agg(
        pairs.map_batches(
            lambda t: pa.table({"node": t.column("src_id")}),
            batch_format="pyarrow",
        ),
        "node", agg="count", out_col="deg", n_buckets=8,
    )
    joined = bucketed_hash_join(
        pairs.map_batches(
            lambda t: pa.table(
                {"node": t.column("dst_id"), "src": t.column("src_id")}
            ),
            batch_format="pyarrow",
        ),
        deg, on="node", how="left", n_buckets=8,
        left_schema=pa.schema([("node", pa.int64()), ("src", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "nd": pc.coalesce(
                    t.column("deg").cast(pa.int64()), pa.scalar(0, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )
    summed = bucketed_group_agg(
        joined, "src",
        specs=[("count", None, "out_deg"), ("sum", "nd", "sum_nbr_out_deg")],
        n_buckets=8,
    )
    return summed.map_batches(
        lambda t: pa.table(
            {
                "node_id": t.column("src"),
                "out_deg": t.column("out_deg"),
                "sum_nbr_out_deg": t.column("sum_nbr_out_deg"),
                "avg_nbr_deg_ppm": pc.divide(
                    pc.multiply(
                        t.column("sum_nbr_out_deg"),
                        pa.scalar(1_000_000, pa.int64()),
                    ),
                    t.column("out_deg"),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_ann_recall_report(sf_dir: str):
    """ANN quality evaluation: per query, how many of the EXACT top-10
    the LSH-pruned path recovered (recall in exact ppm) — the
    sample-scale tuning report run before trusting the approximate path
    at 100 TB, the retrieval analog of ``near_dup_recall_report``.  The
    corpus-scale work is inside the two retrieval operators; the
    comparison is k-bounded driver arithmetic."""
    exact = q_ann_topk(sf_dir)
    approx = q_ann_topk_lsh(sf_dir)
    ek = exact.groupby("query_id")["vec_id"].apply(set)
    ak = approx.groupby("query_id")["vec_id"].apply(set)
    rows = []
    for qid in sorted(ek.index):
        e = ek.loc[qid]
        a = ak.get(qid, set())
        rows.append(
            (int(qid), len(e), len(e & a), len(e & a) * 1_000_000 // len(e))
        )
    return pd.DataFrame(
        rows, columns=["query_id", "n_exact", "n_common", "recall_ppm"]
    ).astype(np.int64)


def q_order_pareto_by_status(sf_dir: str):
    """Per-status Pareto frontier of orders maximizing (price, recency)
    — 'best trade-offs per segment' (see
    ``frontier.grouped_pareto_frontier``): map-side per-group local
    skylines, ONE group-hash exchange of frontier candidates only."""
    from gliner_cpp_ray.stages.frontier import grouped_pareto_frontier

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderstatus", "o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderkey": t.column("o_orderkey"),
                "price_micro": _micro(t.column("o_totalprice")),
                "odate_us": t.column("o_orderdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_pareto_frontier(
        orders, "o_orderstatus", ["price_micro", "odate_us"], ["o_orderkey"]
    )


# --------------------------------------------------- round-4l additions

def q_kg_triple_pr_report(sf_dir: str):
    """The north rule's acceptance bar (triple P/R vs the reference)
    as a first-class, driver-checked query: per predicate, the exact
    MULTISET precision/recall (ppm) of the pipeline's emitted
    (doc_id, subj, pred, obj) triples against the corpus's closed-form
    expected triples.  Scale shape: tag each side with (got, exp)
    indicator columns, union the two streams, ONE 4-key bucketed
    group-agg yields per-triple (n_got, n_exp); matched = Σ min(got,
    exp) computed map-side per block; the finish is a predicate-bounded
    groupby (the ontology has a handful of predicates).  Nothing
    driver-side ever sees a triple row — only the per-pred totals.
    The oracle asserts P = R = 1.0 (the test suite pins exact multiset
    equality; tests/test_kg_pipeline.py:50), so any extraction drift
    shows up as a hash fail on the matched counts."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    corpus, out = _run_kg(sf_dir)
    keys = ["doc_id", "subj", "pred", "obj"]

    def tag(flag: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    "g": pa.array(
                        np.full(n, 1 if flag == "g" else 0, np.int64)
                    ),
                    "e": pa.array(
                        np.full(n, 1 if flag == "e" else 0, np.int64)
                    ),
                }
            )

        return fn

    got = _read_out(out, "linked").map_batches(
        lambda t, _f=tag("g"): _f(t.select(keys)), batch_format="pyarrow"
    )
    exp = rd.read_parquet(
        os.path.join(corpus, "expected_triples"), columns=keys
    ).map_batches(tag("e"), batch_format="pyarrow")

    per_triple = bucketed_group_agg(
        got.union(exp), keys,
        specs=[("sum", "g", "n_got"), ("sum", "e", "n_exp")],
        n_buckets=bytes_scaled_partitions(
            _path_bytes(os.path.join(corpus, "expected_triples"))
        ),
    )

    def partials(t: pa.Table) -> pa.Table:
        g = t.column("n_got").to_numpy(zero_copy_only=False)
        e = t.column("n_exp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_emitted": pa.array(g),
                "n_expected": pa.array(e),
                "n_matched": pa.array(np.minimum(g, e)),
            }
        )

    totals = (
        per_triple.map_batches(partials, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(
            Sum("n_expected", alias_name="n_expected"),
            Sum("n_emitted", alias_name="n_emitted"),
            Sum("n_matched", alias_name="n_matched"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        m = t.column("n_matched").to_numpy(zero_copy_only=False)
        em = t.column("n_emitted").to_numpy(zero_copy_only=False)
        ex = t.column("n_expected").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_expected": t.column("n_expected"),
                "n_emitted": t.column("n_emitted"),
                "n_matched": t.column("n_matched"),
                # Guarded denominators: a total extraction regression
                # (em == 0) degrades to a clean 0 instead of a numpy
                # divide-by-zero warning (matched ≤ emitted, so the
                # maximum(…, 1) floor never changes a nonzero case).
                "precision_ppm": pa.array(
                    np.where(em > 0, m * 1_000_000 // np.maximum(em, 1), 0)
                ),
                "recall_ppm": pa.array(
                    np.where(ex > 0, m * 1_000_000 // np.maximum(ex, 1), 0)
                ),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")


def q_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shaped minimum-cost supplier per part: over parts of
    one size class, the EUROPE supplier with the lowest observed unit
    cost (lineitem as the part↔supplier link), ties broken by smallest
    suppkey — SQL's correlated MIN subquery as the distributed
    'argmin join-back' plan.  Scale shape: the region→nation side is a
    driver-tiny dimension (broadcast set); lineitem prunes MAP-SIDE
    with two bloom semi-joins (part size class ~2%, then European
    suppliers ~1/5) before any exchange; per-part MIN is one bucketed
    group-agg; the argmin rows come back with ONE bucketed join +
    equality filter; a second (tiny) group-agg picks min suppkey; the
    supplier attributes attach with a final suppkey-bucketed join.
    Unit cost is integer-exact ppm: price_micro·10^6 // qty_micro
    (price ≤ ~10^5 ⇒ numerator ≤ ~10^17 < 2^63)."""
    from gliner_cpp_ray.stages.joins import (
        bloom_semi_join,
        bucketed_group_agg,
        bucketed_hash_join,
    )

    nation = pq.read_table(_sf_path(sf_dir, "nation"))
    region = pq.read_table(_sf_path(sf_dir, "region"))
    eur_key = region.filter(pc.equal(region.column("r_name"), "EUROPE"))[
        "r_regionkey"
    ][0].as_py()
    eur_nations = nation.filter(
        pc.equal(nation.column("n_regionkey"), eur_key)
    )
    nset = set(eur_nations.column("n_nationkey").to_pylist())
    nname = dict(
        zip(
            eur_nations.column("n_nationkey").to_pylist(),
            eur_nations.column("n_name").to_pylist(),
        )
    )

    supp = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(
                t.column("s_nationkey").cast(pa.int64()),
                value_set=pa.array(sorted(nset), pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
    part_dim = _read(sf_dir, "part", columns=["p_partkey", "p_size"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t.column("p_partkey")}
        ).filter(pc.equal(t.column("p_size"), 15)),
        batch_format="pyarrow",
    )
    supp_dim = supp.map_batches(
        lambda t: pa.table({"l_suppkey": t.column("s_suppkey")}),
        batch_format="pyarrow",
    )

    nb = _join_buckets(sf_dir, "lineitem") // 4 or None

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "cost_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(
                            _micro(t.column("l_extendedprice")),
                            pa.scalar(1_000_000, pa.int64()),
                        ),
                        _micro(t.column("l_quantity")),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    li = bloom_semi_join(li, part_dim, on="l_partkey", n_buckets=nb)
    li = bloom_semi_join(li, supp_dim, on="l_suppkey", n_buckets=nb)

    mins = bucketed_group_agg(
        li.map_batches(
            lambda t: t.select(["l_partkey", "cost_ppm"]),
            batch_format="pyarrow",
        ),
        "l_partkey", "min", val_col="cost_ppm", out_col="min_cost_ppm",
        n_buckets=nb,
    )
    cand = bucketed_hash_join(
        li, mins, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("cost_ppm", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("min_cost_ppm", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("cost_ppm"), t.column("min_cost_ppm"))
        ).select(["l_partkey", "l_suppkey", "min_cost_ppm"]),
        batch_format="pyarrow",
    )
    winners = bucketed_group_agg(
        cand, ["l_partkey", "min_cost_ppm"], "min", val_col="l_suppkey",
        out_col="s_suppkey", n_buckets=nb,
    )

    sdim = supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_name": t.column("s_name"),
                "n_name": pa.array(
                    [nname[k] for k in t.column("s_nationkey").to_pylist()],
                    pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = bucketed_hash_join(
        winners, sdim, on="s_suppkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("min_cost_ppm", pa.int64()),
             ("s_suppkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string()),
             ("n_name", pa.string())]
        ),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "min_cost_ppm": t.column("min_cost_ppm"),
                "s_suppkey": t.column("s_suppkey"),
                "s_name": t.column("s_name"),
                "n_name": t.column("n_name"),
            }
        ),
        batch_format="pyarrow",
    )


def q_part_value_share(sf_dir: str):
    """TPC-H-Q11-shaped global-threshold HAVING: parts whose lineitem
    revenue exceeds 5/4 of the MEAN part revenue (the 'above-average
    concentration' audit — a fixed corpus-share cut goes degenerate as
    the part count scales, a mean-relative one keeps the same meaning
    at every sf).  The distributed plan for SQL's scalar subquery: one
    partkey-bucketed group-agg builds the per-part totals (map-side
    partials — raw rows never reach the exchange), the global total
    and part count are two scalars off that same table, and the
    threshold filter is map-side with the scalar baked into the task
    closure.  Exactness without overflow: v > 5T/(4n) is evaluated as
    v > floor(5T/(4n)) — equivalent over integers — with the floor
    taken in Python unbounded ints on the driver, so the distributed
    compare stays a single int64 column-vs-scalar (the direct
    v·4n > 5T form would outgrow int64 near sf 50; the SQL twin keeps
    that form because its sums are already HUGEINT)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "p": _micro(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    per_part = bucketed_group_agg(
        li, "l_partkey", "sum", val_col="p", out_col="value_micro",
        n_buckets=_join_buckets(sf_dir, "lineitem"),
    ).materialize()  # consumed twice: global scalars + threshold filter
    total = int(per_part.sum("value_micro"))
    n_parts = per_part.count()
    thr = (5 * total) // (4 * n_parts)  # v > 5T/4n ⟺ v > floor(5T/4n)
    return per_part.map_batches(
        lambda t: t.filter(
            pc.greater(t.column("value_micro"), pa.scalar(thr, pa.int64()))
        ),
        batch_format="pyarrow",
    )


def q_excess_part_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped dominant-supplier audit: suppliers that shipped
    more than 30 % of some part's total 1996 quantity, with how many
    parts they dominate.  Scale shape: the year filter prunes at the
    Parquet read; ONE (partkey, suppkey)-bucketed group-agg builds the
    fine-grained quantity table; the per-part totals RE-AGGREGATE that
    bounded fine table (never the raw rows — the rollup trick); fine ⋈
    totals is one partkey-bucketed join; the >30 % filter compares
    10·fine > 3·total in int64 (no division); the per-supplier count is
    a second small group-agg, and supplier names attach with a final
    suppkey-bucketed join."""
    from gliner_cpp_ray.stages.joins import (
        bucketed_group_agg,
        bucketed_hash_join,
    )

    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "q": _micro(t.column("l_quantity")),
            }
        ).filter(
            pc.and_(
                pc.greater_equal(
                    t.column("l_shipdate").cast(pa.int64()), lo
                ),
                pc.less(t.column("l_shipdate").cast(pa.int64()), hi),
            )
        ),
        batch_format="pyarrow",
    )
    nb = _join_buckets(sf_dir, "lineitem") // 4 or None
    fine = bucketed_group_agg(
        li, ["l_partkey", "l_suppkey"], "sum", val_col="q",
        out_col="supp_qty", n_buckets=nb,
    )
    tot = bucketed_group_agg(
        fine.map_batches(
            lambda t: t.select(["l_partkey", "supp_qty"]),
            batch_format="pyarrow",
        ),
        "l_partkey", "sum", val_col="supp_qty", out_col="part_qty",
        n_buckets=nb,
    )
    joined = bucketed_hash_join(
        fine, tot, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("supp_qty", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("part_qty", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table({"s_suppkey": t.column("l_suppkey")}).filter(
            pc.greater(
                pc.multiply(t.column("supp_qty"), pa.scalar(10, pa.int64())),
                pc.multiply(t.column("part_qty"), pa.scalar(3, pa.int64())),
            )
        ),
        batch_format="pyarrow",
    )
    per_supp = bucketed_group_agg(
        joined, "s_suppkey", "count", out_col="n_parts", n_buckets=nb,
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return bucketed_hash_join(
        per_supp, supp, on="s_suppkey", n_buckets=nb,
        left_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("n_parts", pa.int64())]
        ),
        right_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string())]
        ),
    )


def q_event_type_trend_slopes(sf_dir: str):
    """Per-type exact OLS trend of hourly event volume: for each
    event_type, the least-squares slope of (hour index, hourly count)
    over the corpus's FULL hour range (empty hours count 0 — a trend
    over observed hours only would be biased toward busy periods).
    Scale shape: the only corpus-sized pass is the (type, hour)
    tumbling aggregate; the finish runs on that bounded table (types ×
    span hours) with Python unbounded ints, emitting the slope as an
    exact NUMERATOR/DENOMINATOR string pair — the cross terms
    (n·Σxy − Σx·Σy) outgrow int64 long before they outgrow exactness,
    and DuckDB's HUGEINT casts to the same decimal string (documented
    bound: exact while |num| < 10^38, ~sf 10^6)."""
    from gliner_cpp_ray.stages.windows import tumbling_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    base = tumbling_counts(ds, size_s=3600, extra_keys=("event_type",))
    # bounded: |event types| × |hours in the corpus span| rows
    df = base.to_pandas()
    lo, hi = int(df["bucket"].min()), int(df["bucket"].max())
    span = hi - lo + 1
    rows = []
    for etype, g in df.groupby("event_type", sort=True):
        y = np.zeros(span, np.int64)
        y[g["bucket"].to_numpy(np.int64) - lo] = g["n"].to_numpy(np.int64)
        n = span
        sx = n * (n - 1) // 2
        sxx = (n - 1) * n * (2 * n - 1) // 6
        sy = int(y.sum())
        sxy = int((np.arange(n, dtype=np.int64) * y).sum())
        num = n * sxy - sx * sy  # Python unbounded ints
        den = n * sxx - sx * sx
        rows.append((etype, n, str(num), str(den)))
    return pd.DataFrame(
        rows, columns=["event_type", "n_hours", "slope_num", "slope_den"]
    )


def q_user_coverage_time(sf_dir: str):
    """Interval-union coverage per user: total time covered by the
    union of that user's [ts, ts+300 s) activity intervals —
    overlapping intervals counted ONCE (the sessionization dual: how
    much wall-clock was the user active).  Scale shape: one user-hash
    bucket exchange, then a per-bucket vectorized sweep (sort by
    (user, start), per-user running max of interval ends via
    np.maximum.accumulate on segment-reset offsets, covered =
    Σ max(0, end − max(start, prev_max_end))) — int64-exact epoch µs,
    no per-row Python.  The SQL twin is the windowed prev-max-end
    formulation."""
    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    span_us = 300 * 1_000_000
    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "events")))

    ds = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        lambda t: add_group_bucket(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "s": t.column("ts").cast(pa.int64()),
                }
            ),
            ["user_id"], nb,
        ),
        batch_format="pyarrow",
    )

    def sweep(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "s"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        e = s + span_us
        # constant span ⇒ ends are non-decreasing within a user, so the
        # running max of preceding ends IS the previous row's end; each
        # interval adds min(span, e − prev_e), a fresh user adds span
        new_user = np.empty(len(u), bool)
        if len(u):
            new_user[0] = True
            new_user[1:] = u[1:] != u[:-1]
        prev_e = np.roll(e, 1)
        add = np.where(
            new_user, np.int64(span_us), np.minimum(span_us, e - prev_e)
        )
        out = pd.DataFrame({"user_id": u, "covered_us": add}).groupby(
            "user_id", sort=False
        )["covered_us"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.groupby("__bucket").map_groups(sweep, batch_format="pandas")


def q_lineitem_weighted_median(sf_dir: str):
    """EXACT quantity-WEIGHTED lower median of micro-quantized
    l_extendedprice — 'the price at which half the shipped volume is
    cheaper', the inventory-planning statistic the unweighted median
    can't answer.  Distributed selection with weight-sum bins
    (stages/sketches.py:exact_weighted_order_statistic): 3-4 pruned
    scans, tasks × 4096 (bin, weight) rows per scan, no row ever
    shuffled; every step integer arithmetic (np.add.at int64 — the
    bincount float-weights path would round past 2^53)."""
    from gliner_cpp_ray.stages.sketches import exact_weighted_order_statistic

    ds = _read(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"]
    ).map_batches(
        lambda t: pa.table(
            {
                "price_micro": _micro(t.column("l_extendedprice")),
                "w": _micro(t.column("l_quantity")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # scanned once per refinement round
    est = exact_weighted_order_statistic(ds, "price_micro", "w")
    return pd.DataFrame([est]).astype("int64")


def q_docs_with_all_terms(sf_dir: str):
    """Boolean-AND retrieval: documents containing ALL THREE query
    terms ('scan', 'merge', 'customer') under the shared whitespace
    tokenization — the conjunctive-query postings intersection.  Scale
    shape: the per-doc token scan filters to the 3-term vocabulary
    MAP-SIDE (per-batch distinct (doc, term) pairs — only query-term
    postings ever leave a worker, the corpus's full token stream never
    shuffles), then one doc-keyed group-count keeps docs whose distinct
    matched-term count equals the query length."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.text_analysis import _re2_trim

    terms = ["customer", "merge", "scan"]
    tset = pa.array(terms, pa.string())

    def pairs(t: pa.Table) -> pa.Table:
        # tokenization pinned to token_counts's SQL-matchable form
        # (RE2 \s+ split of RE2-trimmed text, lowercased)
        trimmed = _re2_trim(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.utf8_lower(pc.list_flatten(toks))
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        )
        nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = pc.is_in(flat, value_set=tset).to_numpy(zero_copy_only=False)
        keep &= nonempty[parents]
        sub = pd.DataFrame(
            {
                "doc_id": doc_ids[parents[keep]],
                "term": flat.to_pandas().to_numpy()[keep],
            }
        ).drop_duplicates()
        # a document never spans batches, so batch-local (doc, term)
        # distinctness IS global distinctness
        return pa.Table.from_pandas(sub, preserve_index=False)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_terms = bucketed_group_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        "doc_id", "count", out_col="n_terms",
        n_buckets=_join_buckets(sf_dir, "documents"),
    )
    return n_terms.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("n_terms"), pa.scalar(len(terms), pa.int64()))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def q_event_type_lag_corr(sf_dir: str):
    """Lagged cross-correlation between two event streams: for lags
    0-3 hours, the exact covariance numerator/denominators between
    'click' and 'purchase' hourly volumes over the corpus's full hour
    span (zero-filled) — does one stream LEAD the other.  Scale shape:
    the only corpus-sized pass is the (type, hour) tumbling aggregate
    (filtered to the two types map-side); the lag arithmetic runs on
    the bounded hour table in Python unbounded ints, shipping the
    cross terms as exact strings exactly like the Pearson and trend
    operators (HUGEINT-as-VARCHAR twin)."""
    from gliner_cpp_ray.stages.windows import tumbling_counts

    A, B = "click", "purchase"
    ds = _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
        lambda t: t.filter(
            pc.is_in(
                t.column("event_type"),
                value_set=pa.array([A, B], pa.string()),
            )
        ),
        batch_format="pyarrow",
    )
    base = tumbling_counts(ds, size_s=3600, extra_keys=("event_type",))
    df = base.to_pandas()  # bounded: 2 types × corpus hour span
    lo, hi = int(df["bucket"].min()), int(df["bucket"].max())
    span = hi - lo + 1
    a = np.zeros(span, np.int64)
    b = np.zeros(span, np.int64)
    for arr, etype in ((a, A), (b, B)):
        g = df[df["event_type"] == etype]
        arr[g["bucket"].to_numpy(np.int64) - lo] = g["n"].to_numpy(np.int64)
    rows = []
    for lag in range(4):
        # pair a[t] with b[t + lag]; n overlapping positions
        aa, bb = a[: span - lag], b[lag:]
        n = int(len(aa))
        sa, sb = int(aa.sum()), int(bb.sum())
        sab = int((aa * bb).sum())
        num = n * sab - sa * sb  # Python unbounded ints
        rows.append((lag, n, str(num)))
    return pd.DataFrame(rows, columns=["lag_hours", "n_hours", "cov_num"])


def q_doc_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: corpus ground-truth lang ×
    predicted lang with doc counts — the eval report that turns the
    lang_id heuristic's quality into a measured number (the
    approximate-path-needs-a-measured-recall rule, applied to
    classification).  Adds ONE lang-pair-bounded groupby over the
    lang_id map output; the heuristic itself is the same
    SQL-transcribable stage the lang_id query checks."""
    from ray.data.aggregate import Count

    lang_id = LangId()

    def predict(t: pa.Table) -> pa.Table:
        # LangId emits (doc_id, pred_lang) row-aligned with its input;
        # carry the ground-truth label through
        return lang_id(t).append_column("lang", t.column("lang"))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return (
        ds.map_batches(predict, batch_format="pyarrow")
        .select_columns(["lang", "pred_lang"])
        .groupby(["lang", "pred_lang"])
        .aggregate(Count(alias_name="n_docs"))
    )


def q_kg_node_degree_profile(sf_dir: str):
    """Per-canonical-node graph profile over the DISTINCT edge set:
    out-degree (edges as subject), in-degree (edges as object), and
    distinct predicates used as subject — the node-centric KG shape
    summary feeding ontology QA.  Scale shape: edges are already
    (subj, pred, obj)-distinct rows; each edge emits two tagged
    (node, out, in, pred) partials map-side, ONE node-keyed bucketed
    group pass sums degrees and counts distinct subject-predicates
    inside the per-bucket reduce (graph-bounded, never corpus-bounded)."""
    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon"]
    )
    nb = bytes_scaled_partitions(_path_bytes(os.path.join(out, "edges")))

    def emit(t: pa.Table) -> pa.Table:
        n = t.num_rows
        both = pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("subj_canon").combine_chunks(),
                        t.column("obj_canon").combine_chunks(),
                    ]
                ),
                "is_out": pa.array(
                    np.concatenate(
                        [np.ones(n, np.int64), np.zeros(n, np.int64)]
                    )
                ),
                "pred": pa.concat_arrays(
                    [
                        t.column("pred").combine_chunks(),
                        pa.array([""] * n, pa.string()),
                    ]
                ),
            }
        )
        return add_group_bucket(both, ["node"], nb)

    def reduce(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__bucket")
        is_out = g["is_out"].to_numpy()
        grp = g.groupby("node", sort=False)
        out_deg = grp["is_out"].sum().rename("out_deg")
        in_deg = (grp.size() - out_deg).rename("in_deg")
        preds = (
            g[is_out == 1]
            .drop_duplicates(["node", "pred"])
            .groupby("node", sort=False)
            .size()
            .rename("n_preds_out")
        )
        out = pd.concat([out_deg, in_deg], axis=1).join(
            preds, how="left"
        ).fillna(0).reset_index()
        for c in ("out_deg", "in_deg", "n_preds_out"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        edges.map_batches(emit, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce, batch_format="pandas")
    )


def q_orders_range_bounds(sf_dir: str):
    """Equi-depth range-partition boundaries: the 7 exact octile split
    points of micro-quantized o_totalprice — the planning statistic a
    range partitioner / sorted sink needs BEFORE it can shuffle.  All
    seven ranks resolve in one SHARED iterative refinement
    (stages/sketches.py:exact_multi_order_statistic): ranks that land
    in the same histogram bin keep sharing a candidate range, ranks
    that split own disjoint ranges, so each round is still one scan of
    the pruned column — 7 boundaries never cost 7 selections."""
    from gliner_cpp_ray.stages.sketches import exact_multi_order_statistic

    ds = _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
        lambda t: pa.table({"price_micro": _micro(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    ).materialize()  # scanned once per refinement round
    n = ds.count()
    ranks = [i * n // 8 for i in range(1, 8)]
    vals = exact_multi_order_statistic(ds, "price_micro", ranks)
    return pd.DataFrame(
        {
            "bound_idx": np.arange(1, 8, dtype=np.int64),
            "target_rank": np.asarray(ranks, np.int64),
            "value": np.asarray(vals, np.int64),
        }
    )


def q_orders_partition_checksums(sf_dir: str):
    """Anti-entropy partition checksums: per orderkey range (width
    4096), the row count and the XOR of md5-u60 row digests over ALL
    columns — the replica-consistency / migration-audit primitive (two
    stores agree iff every partition's (n, checksum) pair agrees;
    XOR is order-insensitive and mergeable, so the digest never needs
    a sort).  Scale shape: row digests and per-partition XOR partials
    fold MAP-SIDE (sort + np.bitwise_xor.reduceat — one partial row
    per partition per task), then ONE partition-keyed bucket pass
    merges partials; partition count is corpus/4096, so the bucketed
    machinery (not a key-walking groupby) does the merge."""
    import hashlib

    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "orders")))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # flatnonzero([True]) would index into it
            return add_group_bucket(
                pa.table(
                    {
                        "part_id": pa.array([], pa.int64()),
                        "n_rows": pa.array([], pa.int64()),
                        "checksum": pa.array([], pa.int64()),
                    }
                ),
                ["part_id"], nb,
            )
        df = t.to_pandas()
        s = (
            df["o_orderkey"].astype(str)
            + "|" + df["o_custkey"].astype(str)
            + "|" + df["o_orderstatus"]
            + "|" + _micro(t.column("o_totalprice")).to_pandas().astype(str)
            + "|" + t.column("o_orderdate").cast(pa.int64()).to_pandas()
            .astype(str)
            + "|" + df["o_orderpriority"]
        )
        h = np.fromiter(
            (
                int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16)
                for x in s
            ),
            np.int64, len(s),
        )
        part = df["o_orderkey"].to_numpy() // 4096
        order = np.argsort(part, kind="mergesort")
        part, h = part[order], h[order]
        starts = np.flatnonzero(
            np.concatenate([[True], part[1:] != part[:-1]])
        )
        xors = np.bitwise_xor.reduceat(h, starts)
        counts = np.diff(np.concatenate([starts, [len(part)]]))
        out = pa.table(
            {
                "part_id": pa.array(part[starts]),
                "n_rows": pa.array(counts.astype(np.int64)),
                "checksum": pa.array(xors),
            }
        )
        return add_group_bucket(out, ["part_id"], nb)

    def reduce(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("part_id", kind="mergesort")
        part = g["part_id"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], part[1:] != part[:-1]])
        )
        out = pd.DataFrame(
            {
                "part_id": part[starts],
                "n_rows": np.add.reduceat(
                    g["n_rows"].to_numpy(np.int64), starts
                ),
                "checksum": np.bitwise_xor.reduceat(
                    g["checksum"].to_numpy(np.int64), starts
                ),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = _read(sf_dir, "orders")
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce, batch_format="pandas")
    )


def q_event_value_var_by_type(sf_dir: str):
    """Per-type exact variance sufficient statistics: (n, Σv, and the
    variance numerator n·Σv² − (Σv)² as a decimal string) over
    milli-quantized event values — the dispersion profile behind
    anomaly thresholds, with the second moment carried EXACTLY.
    Scale shape: per-block (type, n, Σv, Σv²) partials via one pandas
    groupby (type-bounded rows out per task; Σv² int64-safe per block:
    v ≤ ~5·10^5 milli ⇒ v² ≤ 2.5·10^11, > 3·10^7 rows per block before
    overflow); the cross-block fold and the numerator run on the
    driver in Python unbounded ints over the tasks×types partial
    table, and the numerator ships as a string — the HUGEINT-as-
    VARCHAR twin the Pearson/trend operators established."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.floor(pc.multiply(t.column("value"), 1_000.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "v": v,
                "vv": v * v,
            }
        )
        g = df.groupby("event_type", sort=False).agg(
            n=("v", "size"), sv=("v", "sum"), svv=("vv", "sum")
        ).reset_index()
        for c in ("n", "sv", "svv"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    rows = []
    for etype, g in part.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        sv = int(g["sv"].sum())
        svv = sum(int(x) for x in g["svv"])  # Python unbounded ints
        rows.append((etype, n, sv, str(n * svv - sv * sv)))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "sum_milli", "var_num"]
    )


def q_new_users_daily(sf_dir: str):
    """Daily new-user curve: per day, users seen for the FIRST time,
    plus the cumulative user count — the growth-accounting report
    (distinct-to-date without ever running a running-distinct).  Scale
    shape: first-seen day is one user-keyed bucketed MIN (per-batch
    partials); the daily rollup + cumulative sum finish on the
    day-bounded table (corpus time span, not corpus rows)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(
                    t.column("ts").cast(pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    first = bucketed_group_agg(
        ds, "user_id", "min", val_col="day", out_col="day",
        n_buckets=_join_buckets(sf_dir, "events"),
    )
    daily = bucketed_group_agg(
        first.map_batches(
            lambda t: t.select(["day"]), batch_format="pyarrow"
        ),
        "day", "count", out_col="n_new", n_buckets=8,
    ).to_pandas()  # bounded: one row per day in the corpus span
    daily = daily.sort_values("day").reset_index(drop=True)
    daily["cum_users"] = daily["n_new"].cumsum().astype(np.int64)
    return daily


def q_retrieval_rank_agreement(sf_dir: str):
    """Rank agreement between the two retrieval scorers: Kendall
    concordant/discordant pair counts between the TF-IDF and BM25
    top-20 rankings over their COMMON documents — the ranking-eval
    report quantifying how much the scorer choice actually reorders
    results.  The corpus work is the two retrieval operators
    themselves (per-batch top-k combiners); the agreement finish is
    k²-bounded on the driver, exact integers only."""
    from gliner_cpp_ray.stages.retrieval import bm25_topk, tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    a = tfidf_topk(ds, _TFIDF_TERMS, k=20).to_pandas()  # k-bounded
    b = bm25_topk(ds, _TFIDF_TERMS, k=20).to_pandas()  # k-bounded
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    ra = m["rank_a"].to_numpy(np.int64)
    rb = m["rank_b"].to_numpy(np.int64)
    da = ra[:, None] - ra[None, :]
    db = rb[:, None] - rb[None, :]
    prod = da * db
    iu = np.triu_indices(len(m), k=1)
    concordant = int((prod[iu] > 0).sum())
    discordant = int((prod[iu] < 0).sum())
    return pd.DataFrame(
        {
            "n_common": [len(m)],
            "concordant": [concordant],
            "discordant": [discordant],
        }
    ).astype("int64")


def q_kg_functional_violations(sf_dir: str):
    """Functional-predicate audit: per predicate, how many canonical
    subjects exist and how many carry MORE THAN ONE distinct object —
    the ontology-consistency gate (capital_of / born_in style
    predicates should show zero multi-object subjects; a linker or
    canonicalizer regression shows up as a nonzero count, not a silent
    drift).  Scale shape: edges are already distinct triples, so one
    (pred, subj)-keyed bucketed count gives per-subject object
    multiplicities; the per-pred rollup is predicate-bounded."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(["subj_canon", "pred"])
    per_subj = bucketed_group_agg(
        edges, ["pred", "subj_canon"], "count", out_col="n_obj",
        n_buckets=bytes_scaled_partitions(
            _path_bytes(os.path.join(out, "edges"))
        ),
    )

    def partials(t: pa.Table) -> pa.Table:
        n = t.column("n_obj").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_subjects": pa.array(np.ones(len(n), np.int64)),
                "n_multi_obj": pa.array((n >= 2).astype(np.int64)),
            }
        )

    return (
        per_subj.map_batches(partials, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(
            Sum("n_subjects", alias_name="n_subjects"),
            Sum("n_multi_obj", alias_name="n_multi_obj"),
        )
    )


def q_ner_span_length_profile(sf_dir: str):
    """NER span-length profile: per entity label, how many emitted
    mentions are 1-word, 2-word, … spans — the decoder-audit histogram
    (a span-enumeration or greedy-decode regression shifts this
    distribution before it shifts aggregate P/R).  One vectorized map
    over the mentions stage output (RE2 whitespace split + list
    length), then a (label × span-length)-bounded groupby."""
    from ray.data.aggregate import Count

    _, out = _run_kg(sf_dir)
    mentions = _read_out(out, "mentions").select_columns(["label", "text"])

    def lengths(t: pa.Table) -> pa.Table:
        n_words = pc.list_value_length(
            pc.split_pattern_regex(t.column("text"), r"\s+")
        ).cast(pa.int64())
        return pa.table({"label": t.column("label"), "n_words": n_words})

    return (
        mentions.map_batches(lengths, batch_format="pyarrow")
        .groupby(["label", "n_words"])
        .aggregate(Count(alias_name="n_mentions"))
    )


def q_orders_backlog_timeseries(sf_dir: str):
    """Open-order backlog over time: for every boundary day, how many
    orders are 'open' (between their order date and their last
    lineitem ship date) — the interval-stabbing count timeseries,
    computed as boundary deltas (+1 at open, −1 after close) instead
    of any per-day interval scan.  Scale shape: last-ship is one
    orderkey-bucketed MAX over lineitem; one more orderkey-bucketed
    join attaches the open date; each order emits two (day, ±1)
    partials map-side; the daily rollup + prefix sum finish on the
    day-bounded table (corpus TIME span, not corpus rows)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    DAY_US = 86_400_000_000
    nb = _join_buckets(sf_dir, "lineitem") // 4 or None

    last = bucketed_group_agg(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "ship_us": t.column("l_shipdate").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        "o_orderkey", "max", val_col="ship_us", out_col="last_us",
        n_buckets=nb,
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "open_us": t.column("o_orderdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        orders, last, on="o_orderkey", n_buckets=nb,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("open_us", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("last_us", pa.int64())]
        ),
    )

    def deltas(t: pa.Table) -> pa.Table:
        d0 = (
            t.column("open_us").to_numpy(zero_copy_only=False) // DAY_US
        )
        d1 = (
            t.column("last_us").to_numpy(zero_copy_only=False) // DAY_US
            + 1
        )
        n = len(d0)
        return pa.table(
            {
                "day": pa.array(np.concatenate([d0, d1])),
                "delta": pa.array(
                    np.concatenate(
                        [np.ones(n, np.int64), -np.ones(n, np.int64)]
                    )
                ),
            }
        )

    daily = bucketed_group_agg(
        joined.map_batches(deltas, batch_format="pyarrow"),
        "day", "sum", val_col="delta", out_col="dn", n_buckets=8,
    ).to_pandas()  # bounded: one row per boundary day in the time span
    daily = daily.sort_values("day").reset_index(drop=True)
    daily["n_open"] = daily["dn"].cumsum().astype(np.int64)
    return daily[["day", "n_open"]]


def q_part_pair_lift(sf_dir: str):
    """Co-purchase LIFT: for each frequent part pair, the association
    strength lift = P(a,b) / (P(a)·P(b)) in exact ppm — the
    normalization that separates 'bought together because both are
    popular' from real affinity.  Scale shape: pair supports come from
    the basket-pair machinery (per-batch distinct combiner, one
    basket-hash exchange); per-part basket counts are ONE part-keyed
    bucketed count over the same distinct pairs; two part-keyed
    bucketed joins attach them; the basket total is one scalar.
    Integer-exact: lift_ppm = n_ab·N·10^6 // (n_a·n_b) — numerator
    int64-safe while n_ab·N < 9.2·10^12 (documented: holds through
    ~sf 10^3 at TPC-H pair densities)."""
    from gliner_cpp_ray.stages.cooccur import basket_pair_counts
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    nb = _join_buckets(sf_dir, "lineitem") // 4 or None
    base = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "basket": t.column("l_orderkey").to_numpy(
                        zero_copy_only=False
                    ),
                    "part": t.column("l_partkey").to_numpy(
                        zero_copy_only=False
                    ),
                }
            ).drop_duplicates(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    # distinct (basket, part) rows — the shared base for pair counts,
    # per-part counts and the basket total
    distinct = bucketed_group_agg(
        base, ["basket", "part"], "count", out_col="m", n_buckets=nb,
    ).map_batches(
        lambda t: t.select(["basket", "part"]), batch_format="pyarrow"
    ).materialize()

    n_baskets = int(
        bucketed_group_agg(
            distinct.map_batches(
                lambda t: t.select(["basket"]), batch_format="pyarrow"
            ),
            "basket", "count", out_col="m", n_buckets=nb,
        ).count()
    )
    per_part = bucketed_group_agg(
        distinct.map_batches(
            lambda t: t.select(["part"]), batch_format="pyarrow"
        ),
        "part", "count", out_col="c", n_buckets=nb,
    )
    pairs = basket_pair_counts(distinct, "basket", "part", min_support=2)
    # pairs: (part_a, part_b, n) — attach per-part counts with two joins
    pa_schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("n_ab", pa.int64())]
    )
    pairs = pairs.map_batches(
        lambda t: pa.table(
            {
                "part_a": t.column("part_a"),
                "part_b": t.column("part_b"),
                "n_ab": t.column("n"),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        pairs,
        per_part.map_batches(
            lambda t: pa.table(
                {"part_a": t.column("part"), "ca": t.column("c")}
            ),
            batch_format="pyarrow",
        ),
        on="part_a", n_buckets=nb,
        left_schema=pa_schema,
        right_schema=pa.schema([("part_a", pa.int64()), ("ca", pa.int64())]),
    )
    j2 = bucketed_hash_join(
        j1,
        per_part.map_batches(
            lambda t: pa.table(
                {"part_b": t.column("part"), "cb": t.column("c")}
            ),
            batch_format="pyarrow",
        ),
        on="part_b", n_buckets=nb,
        left_schema=pa.schema(
            list(pa_schema) + [pa.field("ca", pa.int64())]
        ),
        right_schema=pa.schema([("part_b", pa.int64()), ("cb", pa.int64())]),
    )
    return j2.map_batches(
        lambda t: pa.table(
            {
                "part_a": t.column("part_a"),
                "part_b": t.column("part_b"),
                "n_ab": t.column("n_ab"),
                "lift_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(
                            t.column("n_ab"),
                            pa.scalar(n_baskets * 1_000_000, pa.int64()),
                        ),
                        pc.multiply(t.column("ca"), t.column("cb")),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_hub_clustering_coeffs(sf_dir: str):
    """Local clustering coefficients for the top-20 link-graph hubs:
    per hub, its undirected degree, possible wedges deg·(deg−1)/2 and
    CLOSED wedges (edges between its neighbors) — 'do hub neighbors
    interlink' is the community-structure probe a global triangle
    count can't localize.  Scale shape: the distinct undirected edge
    table is edge-bounded; hub selection is the tasks×k-bounded global
    top-k; the 20 hub NEIGHBOR SETS broadcast (driver bound Σ deg(h),
    stated), and closed wedges count MAP-SIDE per edge block with one
    sorted-membership test per hub — the edge table is scanned once,
    nothing reshuffles."""
    import ray

    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.skew import global_top_k

    edges, _ = _link_graph(sf_dir)
    und = edges.map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "a": np.minimum(
                        t.column("src_id").to_numpy(zero_copy_only=False),
                        t.column("dst_id").to_numpy(zero_copy_only=False),
                    ),
                    "b": np.maximum(
                        t.column("src_id").to_numpy(zero_copy_only=False),
                        t.column("dst_id").to_numpy(zero_copy_only=False),
                    ),
                }
            ).query("a != b").drop_duplicates(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    und = bucketed_group_agg(
        und, ["a", "b"], "count", out_col="m",
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).materialize()  # distinct undirected edges; consumed three times

    deg = bucketed_group_agg(
        und.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("a").combine_chunks(),
                            t.column("b").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "node", "count", out_col="deg", n_buckets=8,
    )
    hubs = global_top_k(deg, "deg", "node", k=20).to_pandas()  # k-bounded
    hub_ids = hubs["node"].to_numpy(np.int64)

    # neighbor sets of the 20 hubs: bounded by Σ deg(hub) — collected
    # once and broadcast to every edge task
    def hub_pairs(t: pa.Table, hub_ids=hub_ids) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "hub": np.concatenate([a, b]),
                "nb": np.concatenate([b, a]),
            }
        )
        df = df[np.isin(df["hub"].to_numpy(), hub_ids)]
        return pa.Table.from_pandas(df, preserve_index=False)

    nbr = und.map_batches(hub_pairs, batch_format="pyarrow").to_pandas()
    nbr_sets = {
        int(h): np.sort(g["nb"].to_numpy(np.int64))
        for h, g in nbr.groupby("hub")
    }
    sets_ref = ray.put(nbr_sets)

    def closed_partial(t: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        hs, ns = [], []
        for h, s in sets.items():
            ia = s[np.searchsorted(s, a) % max(1, len(s))] == a
            ib = s[np.searchsorted(s, b) % max(1, len(s))] == b
            hs.append(h)
            ns.append(int((ia & ib).sum()))
        return pa.table(
            {
                "node_id": pa.array(np.asarray(hs, np.int64)),
                "n_closed": pa.array(np.asarray(ns, np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    closed = (
        und.map_batches(closed_partial, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("n_closed", alias_name="n_closed"))
        .to_pandas()  # 20 rows
    )
    out = hubs.rename(columns={"node": "node_id"}).merge(
        closed, on="node_id", how="left"
    )
    out["n_closed"] = out["n_closed"].fillna(0).astype(np.int64)
    out["n_wedges"] = (out["deg"] * (out["deg"] - 1) // 2).astype(np.int64)
    return out[["node_id", "deg", "n_wedges", "n_closed"]]


def q_kg_edges_sort_audit(sf_dir: str):
    """Sorted-sink audit of the edges output: per Parquet file (in
    lexicographic path order), its row count, whether subj_canon is
    sorted WITHIN the file, and whether the file starts at or after the
    previous file's maximum — together these verify the B13 global-
    sort contract from the FILES alone, the check a resumable run does
    before trusting partial output.  Scale shape: one task per file
    (the file list distributes, never the rows to the driver); the
    cross-file boundary check runs on the file-bounded (min, max)
    table."""
    import ray.data as rd

    _, out = _run_kg(sf_dir)
    root = os.path.join(out, "edges")
    files = sorted(
        os.path.join(r, f)
        for r, _, names in os.walk(root)
        for f in names
        if f.endswith(".parquet")
    )

    def stats(batch: dict) -> dict:
        outc = {"path": [], "n_rows": [], "is_sorted": [],
                "mn": [], "mx": []}
        for p in batch["path"]:
            col = pq.read_table(p, columns=["subj_canon"]).column(
                "subj_canon"
            )
            v = col.to_pandas().to_numpy()
            outc["path"].append(p)
            outc["n_rows"].append(len(v))
            outc["is_sorted"].append(
                int(bool((v[:-1] <= v[1:]).all())) if len(v) else 1
            )
            outc["mn"].append(v[0] if len(v) else "")
            outc["mx"].append(v[-1] if len(v) else "")
        return outc

    per_file = (
        rd.from_items([{"path": p} for p in files])
        .map_batches(stats)
        .to_pandas()  # file-bounded
        .sort_values("path")
        .reset_index(drop=True)
    )
    # Zero-row files carry no (mn, mx) evidence and the SQL twin's
    # read_parquet(file_row_number=true) never emits a row for them, so
    # drop them here too — both engines then audit the same file set.
    per_file = per_file[per_file["n_rows"] > 0].reset_index(drop=True)
    prev_mx = per_file["mx"].shift(1).fillna("")  # "" <= any string
    per_file["starts_after_prev"] = np.where(
        per_file["mn"] >= prev_mx, 1, 0
    ).astype(np.int64)
    per_file["file_idx"] = np.arange(len(per_file), dtype=np.int64)
    per_file["n_rows"] = per_file["n_rows"].astype(np.int64)
    per_file["is_sorted"] = per_file["is_sorted"].astype(np.int64)
    return per_file[["file_idx", "n_rows", "is_sorted", "starts_after_prev"]]


def q_dedup_normalized_docs(sf_dir: str):
    """Normalization-aware exact dedup: duplicate groups under
    (lowercase + whitespace-collapse + edge-trim) — the cheap
    canonicalization pass that catches trivially-reformatted copies
    byte-exact dedup misses, run BEFORE the expensive near-dup
    machinery.  The documents table carries no such copies, so the
    query unions in a DETERMINISTIC perturbed replica of every 10th
    doc (uppercased + trailing double space, id offset 10^9 — the
    synthetic-fixture pattern the multimodal ops established): the
    result must be exactly one group per perturbed doc with the
    ORIGINAL id as keeper, which hash-verifies the normalization
    semantics end-to-end (the corpus is case-roundtrip-stable: no
    ß/İ-style characters, checked).  Scale shape: normalization + md5
    digests are map-side; one hash-keyed bucketed group pass computes
    (min keeper, count); singleton groups drop map-side after the
    reduce."""
    import hashlib

    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    OFFSET = 1_000_000_000

    def norm_hash(t: pa.Table, perturb: bool) -> pa.Table:
        if perturb:
            ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids_np % 10 == 0))
            ids = pc.add(t.column("doc_id"), pa.scalar(OFFSET, pa.int64()))
            txt = pc.binary_join_element_wise(
                pc.utf8_upper(t.column("text")), "  ", ""
            )
        else:
            ids = t.column("doc_id")
            txt = t.column("text")
        norm = pc.replace_substring_regex(
            pc.utf8_lower(txt), r"\s+", " "
        )
        norm = pc.replace_substring_regex(norm, r"^ | $", "")
        hs = [
            hashlib.md5(x.encode("utf-8")).hexdigest()
            for x in norm.to_pylist()
        ]
        return pa.table(
            {
                "norm_hash": pa.array(hs, pa.string()),
                "doc_id": ids,
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    both = ds.map_batches(
        lambda t: norm_hash(t, False), batch_format="pyarrow"
    ).union(
        ds.map_batches(lambda t: norm_hash(t, True), batch_format="pyarrow")
    )
    groups = bucketed_group_agg(
        both,
        "norm_hash",
        specs=[("min", "doc_id", "keeper_doc_id"), ("count", None, "n_docs")],
        n_buckets=_join_buckets(sf_dir, "documents"),
    )
    return groups.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n_docs"), pa.scalar(2, pa.int64()))
        ).select(["norm_hash", "keeper_doc_id", "n_docs"]),
        batch_format="pyarrow",
    )


def q_host_mention_density(sf_dir: str):
    """Entity-mention density per host over English pages: docs,
    whitespace tokens, NER mentions and mentions-per-million-tokens —
    the crawl-quality signal ranking which hosts actually yield
    knowledge per byte.  Scale shape: both sides reduce MAP-SIDE to
    host-keyed partials (hosts are corpus-bounded dimensions); the
    join and density arithmetic run on the host-bounded tables."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    corpus = _corpus(sf_dir)
    _, out = _run_kg(sf_dir)

    def page_partials(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("lang"), "en")
        sub = pa.table(
            {"url": t.column("url"), "text": t.column("text")}
        ).filter(keep)
        host = pc.extract_regex(
            sub.column("url"), r"^https://(?P<h>[^/]+)/"
        )
        trimmed = pc.replace_substring_regex(
            sub.column("text"), r"^\s+|\s+$", ""
        )
        n_tok = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.list_value_length(
                pc.split_pattern_regex(trimmed, r"\s+")
            ).cast(pa.int64()),
        )
        return pa.table(
            {
                # fill_null('') mirrors DuckDB regexp_extract, which
                # yields '' (not NULL) for a non-matching URL — keeps
                # the two engines grouping non-conforming URLs alike.
                "host": pc.fill_null(pc.struct_field(host, "h"), ""),
                "n_docs": pa.array(np.ones(sub.num_rows, np.int64)),
                "n_tokens": n_tok,
            }
        )

    pages = (
        rd.read_parquet(
            os.path.join(corpus, "pages"), columns=["url", "text", "lang"]
        )
        .map_batches(page_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .to_pandas()  # host-bounded
    )

    def mention_partials(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(
            t.column("url"), r"^https://(?P<h>[^/]+)/"
        )
        return pa.table(
            {
                "host": pc.fill_null(pc.struct_field(host, "h"), ""),
                "n_mentions": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    mentions = (
        _read_out(out, "mentions")
        .select_columns(["url"])
        .map_batches(mention_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .to_pandas()  # host-bounded
    )
    m = pages.merge(mentions, on="host", how="left")
    m["n_mentions"] = m["n_mentions"].fillna(0).astype(np.int64)
    m["density_ppm"] = np.where(
        m["n_tokens"] > 0,
        m["n_mentions"] * 1_000_000 // np.maximum(1, m["n_tokens"]),
        0,
    ).astype(np.int64)
    return m[["host", "n_docs", "n_tokens", "n_mentions", "density_ppm"]]


def q_events_peak_5min(sf_dir: str):
    """Peak 5-minute burst: the event-anchored window [t, t+300 s)
    containing the most events (tie → earliest anchor) — the incident
    headline 'when was load worst', EXACT at any scale via HALO
    partitioning: events bucket by DAY, each bucket also receives a
    copy of the next day's first 300 s (the ghost cells), so every
    anchor's full window is local; per bucket one sort + two
    searchsorted passes count all windows, one candidate row per
    bucket survives, and the driver picks the global (max n, min t).
    The quadratic self-join the SQL twin runs is exactly what this
    shape avoids."""
    DAY_US = 86_400_000_000
    SPAN_US = 300 * 1_000_000

    def emit(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        anchor = np.ones(len(us), bool)
        # halo copy: events within SPAN of their day's start also serve
        # the PREVIOUS day's anchors (counted there, never anchored)
        halo_mask = (us - day * DAY_US) < SPAN_US
        h_us = us[halo_mask]
        return pa.table(
            {
                "day": pa.array(np.concatenate([day, day[halo_mask] - 1])),
                "us": pa.array(np.concatenate([us, h_us])),
                "is_anchor": pa.array(
                    np.concatenate(
                        [anchor, np.zeros(halo_mask.sum(), bool)]
                    )
                ),
            }
        )

    def best_per_day(g: pd.DataFrame) -> pa.Table:
        us = np.sort(g["us"].to_numpy(np.int64))
        anchors = np.sort(
            g.loc[g["is_anchor"], "us"].to_numpy(np.int64)
        )
        if not len(anchors):
            return pa.table(
                {
                    "window_start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        n = (
            np.searchsorted(us, anchors + SPAN_US, side="left")
            - np.searchsorted(us, anchors, side="left")
        )
        best = int(np.lexsort((anchors, -n))[0])
        return pa.table(
            {
                "window_start_us": pa.array([int(anchors[best])], pa.int64()),
                "n_events": pa.array([int(n[best])], pa.int64()),
            }
        )

    cand = (
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("day")
        .map_groups(best_per_day, batch_format="pandas")
        .to_pandas()  # one row per day — time-span bounded
    )
    cand = cand.sort_values(
        ["n_events", "window_start_us"], ascending=[False, True]
    )
    return cand.head(1).reset_index(drop=True)


def q_kg_entity_alias_recall(sf_dir: str):
    """Alias-dictionary recall: per canonical entity, how many of its
    KNOWN (unambiguous) alias surfaces the crawl actually produced —
    the dictionary-QA report that says which aliases are dead weight
    and which entities are under-covered.  Ambiguous surfaces are
    excluded on both engines (they map to >1 canon; same rule as the
    ambiguity report).  Scale shape: the corpus pass is one distinct
    (surface, label) bucketed group over mentions; everything after is
    vocabulary-bounded (the alias dictionary), the same boundary the
    canonicalization stage states."""
    from gliner_cpp_ray.sources import world
    from gliner_cpp_ray.sources.pages import is_ambiguous_surface
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    _, out = _run_kg(sf_dir)
    mentions = _read_out(out, "mentions").select_columns(["text", "label"])
    seen_pairs = bucketed_group_agg(
        mentions, ["text", "label"], "count", out_col="m",
    ).to_pandas()  # vocabulary-bounded: distinct (surface, label) pairs

    known: dict[tuple[str, str], set] = {}
    surface_to_canon: dict[tuple[str, str], str] = {}
    for lbl, entries in world.all_surfaces().items():
        for surface, canon, _qid in entries:
            if is_ambiguous_surface(surface, lbl):
                continue
            known.setdefault((lbl, canon), set()).add(surface)
            surface_to_canon[(surface, lbl)] = canon

    seen: dict[tuple[str, str], set] = {}
    for text, lbl in zip(seen_pairs["text"], seen_pairs["label"]):
        canon = surface_to_canon.get((text, lbl))
        if canon is not None:
            seen.setdefault((lbl, canon), set()).add(text)

    rows = []
    for (lbl, canon), surfaces in sorted(known.items()):
        n_known = len(surfaces)
        n_seen = len(seen.get((lbl, canon), ()))
        rows.append(
            (lbl, canon, n_known, n_seen, n_seen * 1_000_000 // n_known)
        )
    df = pd.DataFrame(
        rows,
        columns=["label", "canon_id", "n_known", "n_seen", "coverage_ppm"],
    )
    for c in ("n_known", "n_seen", "coverage_ppm"):
        df[c] = df[c].astype(np.int64)
    return df


def q_embedding_norm_topk(sf_dir: str):
    """Vector-QA: the 10 embeddings with the largest squared L2 norm
    (micro²-exact int64; norm outliers are the classic bad-embedding /
    exploding-encoder signal caught before they poison ANN scores).
    One vectorized map computes per-vector norms; the global top-k
    combiner bounds everything after at tasks × k rows."""
    from gliner_cpp_ray.stages.skew import global_top_k

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        vid = t.column("vec_id")
        emb = np.stack(t.column("embedding").to_pandas().to_numpy())
        q = np.floor(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        return pa.table(
            {"vec_id": vid, "norm2_micro2": pa.array((q * q).sum(axis=1))}
        )

    return global_top_k(
        ds.map_batches(norms, batch_format="pyarrow"),
        "norm2_micro2", "vec_id", k=10,
    )


def q_orders_octile_revenue(sf_dir: str):
    """Banded revenue rollup over the equi-depth octile plan: classify
    every order into its price band (band = number of split points
    strictly below the price) and roll up count + revenue per band —
    the query that CONSUMES the range-partitioner bounds, closing the
    plan→execute loop.  The 7 bounds broadcast in the task closure;
    banding is one searchsorted per batch; the rollup is 8 rows."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.sketches import exact_multi_order_statistic

    ds = _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
        lambda t: pa.table({"price_micro": _micro(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    ).materialize()  # refinement rounds + the banding pass
    n = ds.count()
    ranks = [i * n // 8 for i in range(1, 8)]
    bounds = np.asarray(
        exact_multi_order_statistic(ds, "price_micro", ranks), np.int64
    )

    def band(t: pa.Table) -> pa.Table:
        v = t.column("price_micro").to_numpy(zero_copy_only=False)
        # count of bounds strictly below v == searchsorted side='left'
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return pa.table(
            {"band_idx": pa.array(b), "price_micro": t.column("price_micro")}
        )

    return (
        ds.map_batches(band, batch_format="pyarrow")
        .groupby("band_idx")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_micro", alias_name="revenue_micro"),
        )
    )


def q_orderkey_islands(sf_dir: str):
    """Gaps-and-islands over the orderkey sequence: the histogram of
    contiguous-key run lengths — the id-space fragmentation report
    (allocation patterns, tombstone density, partition-pruning
    potential).  Distributed without the classic row_number trick's
    global sort of the DATA: each key emits (k, self), (k+1, prev),
    (k−1, next) tags; one key-bucketed group pass flags island STARTS
    (self ∧ ¬prev) and ENDS (self ∧ ¬next); the i-th start pairs with
    the i-th end, so both tiny tables get exact global ranks via the
    two-level value-range scan and ONE rank-keyed join yields run
    lengths; the histogram is a bounded rollup."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join
    from gliner_cpp_ray.stages.packing import global_order_rank

    def tags(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(k)
        z = np.zeros(n, np.int64)
        o = np.ones(n, np.int64)
        return pa.table(
            {
                "k": pa.array(np.concatenate([k, k + 1, k - 1])),
                "s": pa.array(np.concatenate([o, z, z])),
                "p": pa.array(np.concatenate([z, o, z])),
                "nx": pa.array(np.concatenate([z, z, o])),
            }
        )

    nb = _join_buckets(sf_dir, "orders")
    # the raw orderkey space is dense (one island); the fragmentation
    # question is asked of a SUBSET — here the finished ('F') orders,
    # filtered map-side at the read
    keys = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda t: pa.table({"o_orderkey": t.column("o_orderkey")}).filter(
            pc.equal(t.column("o_orderstatus"), "F")
        ),
        batch_format="pyarrow",
    )
    flags = bucketed_group_agg(
        keys.map_batches(tags, batch_format="pyarrow"),
        "k",
        specs=[("sum", "s", "s"), ("sum", "p", "p"), ("sum", "nx", "nx")],
        n_buckets=nb,
    ).materialize()  # consumed twice: starts and ends

    def pick(flag_col: str):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater(t.column("s"), pa.scalar(0, pa.int64())),
                pc.equal(t.column(flag_col), pa.scalar(0, pa.int64())),
            )
            return pa.table({"k": t.column("k")}).filter(keep)

        return fn

    starts = flags.map_batches(pick("p"), batch_format="pyarrow")
    ends = flags.map_batches(pick("nx"), batch_format="pyarrow")
    rs, _ = global_order_rank(starts, "k", "k")
    re_, _ = global_order_rank(ends, "k", "k")
    joined = bucketed_hash_join(
        rs.map_batches(
            lambda t: pa.table(
                {"rank": t.column("rank"), "start_k": t.column("k")}
            ),
            batch_format="pyarrow",
        ),
        re_.map_batches(
            lambda t: pa.table(
                {"rank": t.column("rank"), "end_k": t.column("k")}
            ),
            batch_format="pyarrow",
        ),
        on="rank", n_buckets=nb,
        left_schema=pa.schema([("rank", pa.int64()), ("start_k", pa.int64())]),
        right_schema=pa.schema([("rank", pa.int64()), ("end_k", pa.int64())]),
    )
    from ray.data.aggregate import Count

    return (
        joined.map_batches(
            lambda t: pa.table(
                {
                    "island_len": pc.add(
                        pc.subtract(t.column("end_k"), t.column("start_k")),
                        pa.scalar(1, pa.int64()),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("island_len")
        .aggregate(Count(alias_name="n_islands"))
    )


def q_kg_orphan_nodes(sf_dir: str):
    """Orphan-entity audit: per label, how many canonical nodes carry
    NO edge (mentioned in the corpus but never in a relation) — the
    'known but factless' inventory that tells a KG product where
    extraction coverage ends.  The edge-endpoint set is
    ontology-bounded (one id per canonical entity; stated bound), so
    it collects once and broadcasts; the node table flags orphans
    map-side and the rollup is label-bounded."""
    from ray.data.aggregate import Sum

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "obj_canon"]
    )
    eps = set()
    # ontology-bounded: one entry per canonical entity with any edge
    for t in edges.iter_batches(batch_format="pyarrow"):
        eps.update(t.column("subj_canon").to_pylist())
        eps.update(t.column("obj_canon").to_pylist())
    ep_arr = pa.array(sorted(eps), pa.string())

    nodes = _read_out(out, "nodes").select_columns(["canon_id", "label"])

    def flag(t: pa.Table) -> pa.Table:
        orphan = pc.invert(pc.is_in(t.column("canon_id"), value_set=ep_arr))
        return pa.table(
            {
                "label": t.column("label"),
                "n_nodes": pa.array(np.ones(t.num_rows, np.int64)),
                "n_orphans": orphan.cast(pa.int64()),
            }
        )

    return (
        nodes.map_batches(flag, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("n_nodes", alias_name="n_nodes"),
            Sum("n_orphans", alias_name="n_orphans"),
        )
    )


def q_link_assortativity_stats(sf_dir: str):
    """Global degree-assortativity sufficient statistics: over every
    distinct directed edge, the exact 6-sum vector (n, Σx, Σy, Σxy,
    Σx², Σy²) of (out-degree(src), out-degree(dst)) — the one number
    ('do hubs link to hubs?') behind the per-node profile C190, with
    the cross terms shipped as exact decimal strings per the Pearson
    precedent.  Scale shape: the degree table derives once; two
    src/dst-keyed bucketed joins attach degrees to edges (dangling
    targets count 0); per-block int64 partials (degree² per edge —
    documented headroom) fold to a tasks-bounded table the driver
    finishes in Python unbounded ints."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    edges, _ = _link_graph(sf_dir)
    ed = edges.map_batches(
        lambda t: t.select(["src_id", "dst_id"]), batch_format="pyarrow"
    )
    deg = bucketed_group_agg(
        ed.map_batches(
            lambda t: pa.table({"node": t.column("src_id")}),
            batch_format="pyarrow",
        ),
        "node", "count", out_col="deg", n_buckets=8,
    )
    j1 = bucketed_hash_join(
        ed.map_batches(
            lambda t: pa.table(
                {"node": t.column("src_id"), "dst_id": t.column("dst_id")}
            ),
            batch_format="pyarrow",
        ),
        deg, on="node", how="left",
        left_schema=pa.schema([("node", pa.int64()), ("dst_id", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t.column("dst_id"),
                "x": pc.coalesce(t.column("deg"), pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    j2 = bucketed_hash_join(
        j1, deg, on="node", how="left",
        left_schema=pa.schema([("node", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "x": t.column("x"),
                "y": pc.coalesce(t.column("deg"), pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )

    def partials(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([np.int64(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
            }
        )

    part = j2.map_batches(partials, batch_format="pyarrow").to_pandas()
    vals = {
        c: sum(int(v) for v in part[c]) for c in part.columns
    }  # Python unbounded ints
    return pd.DataFrame(
        {
            "n_edges": [np.int64(vals["n"])],
            "sum_x": [str(vals["sx"])],
            "sum_y": [str(vals["sy"])],
            "sum_xy": [str(vals["sxy"])],
            "sum_xx": [str(vals["sxx"])],
            "sum_yy": [str(vals["syy"])],
        }
    )


def q_cms_error_report(sf_dir: str):
    """Count-Min error report: per query term, the EXACT occurrence
    count next to the sketch estimate and the overcount (est − exact,
    ≥ 0 by the CMS one-sided guarantee) — the eval that turns 'the
    sketch is probably fine' into a measured number, the same
    discipline the LSH/ANN recall reports apply to their approximate
    paths.  The exact side is one map-side token filter + term-bounded
    rollup; the sketch side is the existing single-aggregate CMS."""
    from ray.data.aggregate import Sum

    est = _as_pandas(q_cms_term_counts(sf_dir))  # |terms| rows

    tset = pa.array(sorted(set(_CMS_TERMS)), pa.string())

    def exact_partial(t: pa.Table) -> pa.Table:
        from gliner_cpp_ray.stages.text_analysis import _re2_trim

        trimmed = _re2_trim(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.utf8_lower(pc.list_flatten(toks))
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        )
        nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        keep = pc.is_in(flat, value_set=tset).to_numpy(zero_copy_only=False)
        keep &= nonempty[parents]
        vc = pd.Series(
            flat.to_pandas().to_numpy()[keep]
        ).value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    exact = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="exact_n"))
        .to_pandas()  # term-bounded
    )
    m = est.merge(exact, on="term", how="left")
    m["exact_n"] = m["exact_n"].fillna(0).astype(np.int64)
    m["over_n"] = (m["est_n"] - m["exact_n"]).astype(np.int64)
    return m[["term", "exact_n", "est_n", "over_n"]]


def q_kg_pred_pair_counts(sf_dir: str):
    """Predicate co-occurrence on subjects: for each unordered
    predicate pair, how many canonical subjects carry BOTH — the
    schema-mining signal ('entities with a capital also export') that
    feeds ontology design.  Distinct (subject, predicate) rows reduce
    once, then the basket-pair machinery (subject-hash exchange,
    per-bucket pair expansion bounded by preds-per-subject²) counts
    pairs; output is predicate²-bounded."""
    from gliner_cpp_ray.stages.cooccur import basket_pair_counts
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(["subj_canon", "pred"])
    distinct = bucketed_group_agg(
        edges, ["subj_canon", "pred"], "count", out_col="m",
    ).map_batches(
        lambda t: pa.table(
            {"basket": t.column("subj_canon"), "pred": t.column("pred")}
        ),
        batch_format="pyarrow",
    )
    return basket_pair_counts(distinct, "basket", "pred", min_support=1)


def _as_pandas(r):
    if isinstance(r, pd.DataFrame):
        return r
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r.to_pandas()


def q_supplier_part_markup(sf_dir: str):
    """Per-supplier sale-vs-catalog markup: Σ(sale price) relative to
    Σ(catalog retail price of the parts shipped), as an exact ppm
    ratio of sums — the pricing-policy outlier report.  Scale shape:
    part retail prices attach with ONE partkey-bucketed join (the only
    corpus-sized exchange); per-supplier sums are one bucketed
    group-agg; the ppm ratio computes as divmod-split integer
    arithmetic (q·10^6 + r·10^6//d) because the naive Σsale·10^6
    already overflows int64 at sf 0.01 — caught by the oracle hash on
    first run."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg, bucketed_hash_join

    nb = _join_buckets(sf_dir, "lineitem") // 4 or None
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "sale": _micro(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_retailprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("p_partkey"),
                "retail": _micro(t.column("p_retailprice")),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        li, part, on="l_partkey", n_buckets=nb,
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("sale", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("retail", pa.int64())]
        ),
    )
    sums = bucketed_group_agg(
        joined.map_batches(
            lambda t: t.select(["l_suppkey", "sale", "retail"]),
            batch_format="pyarrow",
        ),
        "l_suppkey",
        specs=[
            ("count", None, "n_lines"),
            ("sum", "sale", "sale_micro"),
            ("sum", "retail", "retail_micro"),
        ],
        n_buckets=nb,
    )
    def ppm(t: pa.Table) -> pa.Table:
        s = t.column("sale_micro").to_numpy(zero_copy_only=False)
        d = t.column("retail_micro").to_numpy(zero_copy_only=False)
        # exact floor(s*1e6/d): unbounded Python ints via object dtype —
        # s·1e6 overflows int64 at sf 0.01 already, and the divmod-split
        # rescue only buys two decades; rows here are SUPPLIER-bounded
        # (one per supplier per bucket), so object-math cost is dim-sized
        out = (s.astype(object) * 1_000_000 // d.astype(object)).astype(
            np.int64
        )
        return t.append_column("markup_ppm", pa.array(out))

    return sums.map_batches(ppm, batch_format="pyarrow")


def q_events_benford_digits(sf_dir: str):
    """First-significant-digit distribution of event values (micro
    units) — the Benford's-law forensic audit that flags fabricated or
    truncated numeric feeds.  The digit is taken from the DECIMAL
    string (no float log anywhere, so there is no boundary rounding at
    powers of ten); one map + a 9-row groupby."""
    from ray.data.aggregate import Count

    def digits(t: pa.Table) -> pa.Table:
        v = _micro(t.column("value"))
        first = pc.utf8_slice_codeunits(
            pc.cast(v, pa.string()), 0, 1
        )
        return pa.table({"digit": first})

    return (
        _read(sf_dir, "events", columns=["value"])
        .map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Count(alias_name="n"))
    )


def q_user_type_diversity(sf_dir: str):
    """Engagement-breadth histogram: how many users touched exactly k
    distinct event types — the audience-segmentation signal behind
    'power users use everything'.  Scale shape: per-batch distinct
    (user, type) combiner, one user-keyed bucketed distinct-count, then
    a k-bounded histogram (k ≤ |event types|)."""
    from ray.data.aggregate import Count

    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    pairs = _read(
        sf_dir, "events", columns=["user_id", "event_type"]
    ).map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "user_id": t.column("user_id").to_numpy(
                        zero_copy_only=False
                    ),
                    "event_type": t.column("event_type").to_pandas(),
                }
            ).drop_duplicates(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    distinct = bucketed_group_agg(
        pairs, ["user_id", "event_type"], "count", out_col="m",
        n_buckets=_join_buckets(sf_dir, "events"),
    )
    per_user = bucketed_group_agg(
        distinct.map_batches(
            lambda t: t.select(["user_id"]), batch_format="pyarrow"
        ),
        "user_id", "count", out_col="n_types",
        n_buckets=_join_buckets(sf_dir, "events"),
    )
    return (
        per_user.map_batches(
            lambda t: t.select(["n_types"]), batch_format="pyarrow"
        )
        .groupby("n_types")
        .aggregate(Count(alias_name="n_users"))
    )


def q_kg_qid_profile(sf_dir: str):
    """Linker-output profile: per predicate, the linked-triple count
    and the distinct subject/object QID counts — the entity-resolution
    fan-in report (how many distinct identities each relation actually
    connects; a linker regression collapses or splits these counts
    before anything else drifts).  Scale shape: one pred-keyed count
    plus two per-batch-distinct (pred, qid) bucketed reductions; every
    output is predicate-bounded."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    _, out = _run_kg(sf_dir)
    linked = _read_out(out, "linked").select_columns(
        ["pred", "subj_qid", "obj_qid"]
    )

    def count_distinct(col: str, out_col: str) -> pd.DataFrame:
        d = bucketed_group_agg(
            linked.map_batches(
                lambda t, c=col: pa.table(
                    {"pred": t.column("pred"), "q": t.column(c)}
                ),
                batch_format="pyarrow",
            ),
            ["pred", "q"], "count", out_col="m",
        )
        return (
            bucketed_group_agg(
                d.map_batches(
                    lambda t: t.select(["pred"]), batch_format="pyarrow"
                ),
                "pred", "count", out_col=out_col, n_buckets=8,
            ).to_pandas()  # predicate-bounded
        )

    tri = bucketed_group_agg(
        linked.map_batches(
            lambda t: t.select(["pred"]), batch_format="pyarrow"
        ),
        "pred", "count", out_col="n_triples", n_buckets=8,
    ).to_pandas()  # predicate-bounded
    m = tri.merge(count_distinct("subj_qid", "n_subj_qids"), on="pred")
    m = m.merge(count_distinct("obj_qid", "n_obj_qids"), on="pred")
    for c in ("n_triples", "n_subj_qids", "n_obj_qids"):
        m[c] = m[c].astype(np.int64)
    return m


def q_kg_mention_offset_audit(sf_dir: str):
    """The BYTE-OFFSET contract as a driver-checked query: per label,
    how many emitted mentions' (start, end) byte offsets slice the
    page's extracted text to EXACTLY the mention surface (the
    reference's offset semantics, reference tests/test.cpp goldens) —
    the oracle pins exact = total, so any off-by-one or codepoint-vs-
    byte regression in the decoder becomes a hash fail, not a silent
    drift.  Scale shape: ONE url-bucketed join of mentions against the
    pruned (url, text) page dimension; the slice check is per-mention
    work inside the reduce (mention-bounded, the ner-stage precedent);
    the rollup is label-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import bucketed_hash_join

    corpus, out = _run_kg(sf_dir)
    mentions = _read_out(out, "mentions").select_columns(
        ["url", "start", "end", "text", "label"]
    ).map_batches(
        lambda t: t.rename_columns(
            ["url", "start", "end", "mtext", "label"]
        ),
        batch_format="pyarrow",
    )
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "text"]
    )
    joined = bucketed_hash_join(
        mentions, pages, on="url",
        left_schema=pa.schema(
            [("url", pa.string()), ("start", pa.int64()),
             ("end", pa.int64()), ("mtext", pa.string()),
             ("label", pa.string())]
        ),
        right_schema=pa.schema(
            [("url", pa.string()), ("text", pa.string())]
        ),
    )

    def check(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ok = np.fromiter(
            (
                p.encode("utf-8")[s:e].decode("utf-8", "replace") == m
                for p, s, e, m in zip(
                    df["text"], df["start"], df["end"], df["mtext"]
                )
            ),
            np.int64, len(df),
        )
        return pa.table(
            {
                "label": pa.array(df["label"].to_numpy(), pa.string()),
                "n_mentions": pa.array(np.ones(len(df), np.int64)),
                "n_offset_exact": pa.array(ok),
            }
        )

    return (
        joined.map_batches(check, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("n_mentions", alias_name="n_mentions"),
            Sum("n_offset_exact", alias_name="n_offset_exact"),
        )
    )


def q_events_cube(sf_dir: str):
    """CUBE over (event_type, weekday) — all four grouping sets
    ((type, weekday), (type), (weekday), ()) in ONE pass via map-side
    grouping-set replication: each batch pre-aggregates to the finest
    (type, weekday) partial, then derives the three coarser partials
    from that already-reduced table, so the exchange carries at most
    |types|·7·4 partial rows per task regardless of input size (the
    classic distributed-CUBE plan: replicate partials, not rows).
    Weekday is pure epoch arithmetic ((epoch_days + 4) % 7, 0 = Sunday)
    and value quantizes to int64 milli, so the SQL twin (GROUP BY CUBE
    + GROUPING ids) matches bit-for-bit.  gid = 2·GROUPING(event_type)
    + GROUPING(weekday); aggregated-out keys coalesce to '' / -1."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        wd = ((ts // 86_400_000_000 + 4) % 7).astype(np.int64)
        vm = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 1000
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "weekday": wd,
                "vm": vm,
            }
        )
        fine = (
            df.groupby(["event_type", "weekday"], sort=False)
            .agg(n_events=("vm", "size"), value_milli=("vm", "sum"))
            .reset_index()
        )
        sets = [fine.assign(gid=0)]
        by_type = (
            fine.groupby("event_type", sort=False)[["n_events", "value_milli"]]
            .sum()
            .reset_index()
            .assign(weekday=-1, gid=1)
        )
        by_wd = (
            fine.groupby("weekday", sort=False)[["n_events", "value_milli"]]
            .sum()
            .reset_index()
            .assign(event_type="", gid=2)
        )
        total = pd.DataFrame(
            {
                "event_type": [""],
                "weekday": [-1],
                "n_events": [fine["n_events"].sum()],
                "value_milli": [fine["value_milli"].sum()],
                "gid": [3],
            }
        )
        out = pd.concat([sets[0], by_type, by_wd, total], ignore_index=True)
        return pa.table(
            {
                "gid": pa.array(out["gid"].to_numpy(np.int64)),
                "event_type": pa.array(out["event_type"], pa.string()),
                "weekday": pa.array(out["weekday"].to_numpy(np.int64)),
                "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
                "value_milli": pa.array(out["value_milli"].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_type", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["gid", "event_type", "weekday"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_milli", alias_name="value_milli"),
        )
    )


def q_orders_snapshot_diff(sf_dir: str):
    """Keyed row-hash snapshot diff (table reconciliation): classify
    every order key as same / changed / added / removed between the
    base table and a DETERMINISTIC perturbed snapshot derived map-side
    from the same read (key%11==3 deleted; surviving key%7==2 rows get
    price +1.000000; every key%13==5 row also yields an added replica
    at key+10^9) — the CDC-audit primitive answering 'what changed
    between two loads' without shipping row bodies.  Scale shape: each
    side projects map-side to (key, status, digest) with digest =
    md5-u60 over ALL columns (the checksum-audit idiom); ONE key-hash
    bucket exchange classifies per key (keys are unique within a side,
    so each bucket merge is a vectorized outer merge), and per-bucket
    (status, kind) partials finish in a bounded global groupby
    (|status| x 4 rows)."""
    import hashlib

    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "orders")))
    OFF = 1_000_000_000

    def _dig(key, cust, status, pm, dt, prio):
        s = (
            pd.Series(key).astype(str)
            + "|" + pd.Series(cust).astype(str)
            + "|" + pd.Series(status.to_numpy() if hasattr(status, "to_numpy") else status)
            + "|" + pd.Series(pm).astype(str)
            + "|" + pd.Series(dt).astype(str)
            + "|" + pd.Series(prio.to_numpy() if hasattr(prio, "to_numpy") else prio)
        )
        return np.fromiter(
            (
                int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16)
                for x in s
            ),
            np.int64, len(s),
        )

    def project(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        key = df["o_orderkey"].to_numpy()
        cust = df["o_custkey"].to_numpy()
        status = df["o_orderstatus"]
        prio = df["o_orderpriority"]
        pm = _micro(t.column("o_totalprice")).to_numpy()
        dt = t.column("o_orderdate").cast(pa.int64()).to_numpy()

        base_h = _dig(key, cust, status, pm, dt, prio)

        keep = key % 11 != 3
        pm2 = pm + np.where(key % 7 == 2, 1_000_000, 0)
        snap_h = _dig(
            key[keep], cust[keep], status[keep], pm2[keep], dt[keep],
            prio[keep],
        )
        rep = key % 13 == 5
        rep_h = _dig(
            key[rep] + OFF, cust[rep], status[rep], pm[rep], dt[rep],
            prio[rep],
        )

        out = pa.table(
            {
                "key": pa.array(
                    np.concatenate([key, key[keep], key[rep] + OFF])
                ),
                "status": pa.array(
                    pd.concat(
                        [status, status[keep], status[rep]],
                        ignore_index=True,
                    ),
                    pa.string(),
                ),
                "h": pa.array(np.concatenate([base_h, snap_h, rep_h])),
                "side": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(key), np.int64),
                            np.ones(int(keep.sum()) + int(rep.sum()),
                                    np.int64),
                        ]
                    )
                ),
            }
        )
        return add_group_bucket(out, ["key"], nb)

    def classify(g: pd.DataFrame) -> pa.Table:
        a = g[g["side"] == 0][["key", "status", "h"]]
        b = g[g["side"] == 1][["key", "status", "h"]]
        m = a.merge(b, on="key", how="outer", suffixes=("_a", "_b"))
        kind = np.where(
            m["h_b"].isna(), "removed",
            np.where(
                m["h_a"].isna(), "added",
                np.where(m["h_a"] != m["h_b"], "changed", "same"),
            ),
        )
        st = m["status_a"].fillna(m["status_b"])
        out = (
            pd.DataFrame({"status": st, "kind": kind})
            .groupby(["status", "kind"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.table(
            {
                "status": pa.array(out["status"], pa.string()),
                "kind": pa.array(out["kind"], pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "orders")
        .map_batches(project, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(classify, batch_format="pandas")
        .groupby(["status", "kind"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_user_seq3_support(sf_dir: str):
    """Sequential-pattern mining: support (number of users) of EVERY
    length-3 subsequence pattern — order-preserving, gaps allowed,
    repeats allowed — over per-user time-ordered event-type sequences
    (the behavioral-motif primitive behind funnel discovery; unlike
    the contiguous trigram query, 'signup … view … purchase' counts
    however many events sit between the steps).  Event types map to
    single chars via their sorted rank so the SQL twin can express
    subsequence containment as LIKE '%x%y%z%'.  Scale shape: the
    alphabet is a driver-tiny dimension (one distinct scan); ONE
    user-hash bucket exchange assembles sequences, each bucket reduces
    to a dense A^3 support partial via the first-occurrence/suffix-mask
    argument (stages/packing.py:subsequence_triple_support — per-user
    cost O(len + A^2), never 125 LIKE scans), and the final groupby
    moves buckets x A^3 tiny rows."""
    from gliner_cpp_ray.stages.packing import subsequence_triple_support

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])
    alphabet = sorted(ds.unique("event_type"))  # dimension-bounded
    A = len(alphabet)
    vals = pa.array(alphabet, pa.string())

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts").cast(pa.int64()),
                "event_id": t.column("event_id"),
                "code": pc.index_in(
                    t.column("event_type"), value_set=vals
                ).cast(pa.int64()),
            }
        )

    supp = subsequence_triple_support(
        ds.map_batches(project, batch_format="pyarrow"),
        ["user_id"], "ts", "event_id", "code", A,
    )

    def to_pattern(t: pa.Table) -> pa.Table:
        c1 = t.column("c1").to_numpy(zero_copy_only=False)
        c2 = t.column("c2").to_numpy(zero_copy_only=False)
        c3 = t.column("c3").to_numpy(zero_copy_only=False)
        pat = [
            chr(97 + a) + chr(97 + b) + chr(97 + c)
            for a, b, c in zip(c1, c2, c3)
        ]
        return pa.table(
            {
                "pattern": pa.array(pat, pa.string()),
                "n_users": t.column("n_keys"),
            }
        )

    return supp.map_batches(to_pattern, batch_format="pyarrow")


def q_order_priority_merge_revenue(sf_dir: str):
    """Fact→dimension join executed as an equi-depth RANGE-partitioned
    sort-merge join (stages/joins.py:range_merge_join) instead of the
    hash-bucket plan: split points are the exact equi-depth boundaries
    of the lineitem orderkey column, both sides move once keyed by
    contiguous key RANGE, and each partition joins by sorted positional
    merge — the strategy of choice when the join output must stay
    key-clustered (sorted sink, subsequent merge) or when hash
    bucketing would destroy an existing range layout.  Result: revenue
    by order priority — deliberately the same aggregate family as the
    hash-join twins so the two strategies are directly comparable in
    the bench.  Scale shape: one count + boundary refinement
    (tasks × bins rows/round), one exchange per side, priority-bounded
    final groupby."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import range_merge_join

    def li(t: pa.Table) -> pa.Table:
        price = _micro(t.column("l_extendedprice")).to_numpy()
        disc = pc.cast(
            pc.floor(pc.multiply(t.column("l_discount"), 1000.0)),
            pa.int64(),
        ).to_numpy()
        return pa.table(
            {
                "okey": t.column("l_orderkey"),
                "revenue_micro": pa.array(price * (1000 - disc) // 1000),
            }
        )

    left = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li, batch_format="pyarrow")
    right = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "okey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )

    n_rows = pq.ParquetFile(
        _sf_path(sf_dir, "lineitem")
    ).metadata.num_rows  # footer-only: saves a full count() pass
    joined = range_merge_join(left, right, "okey", n_rows=n_rows)
    return (
        joined.groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_items"),
            Sum("revenue_micro", alias_name="revenue_micro"),
        )
    )


def q_order_cohort_revenue(sf_dir: str):
    """Cohort-retention matrix over orders: customers cohorted by their
    FIRST order month, then (cohort_month, months_since_first) cells
    with order count and revenue — the classic lifecycle analysis that
    shows whether later cohorts spend like earlier ones.  Month index
    is pure integer calendar arithmetic (months since 1970-01, via
    numpy datetime64[M] on the Ray side and year·12+month−1−23640 in
    SQL — identical civil-calendar semantics, no float dates).  Scale
    shape: per-customer min-month is a customer-scale bucketed
    group-agg (never a driver table); the cohort attaches back with ONE
    custkey-bucketed hash join (cohort side schema passed statically so
    its shuffle runs once); the final matrix groupby is
    calendar-bounded (span² / 2 cells)."""
    from ray.data.aggregate import Count, Sum

    from gliner_cpp_ray.stages.joins import (
        bucketed_group_agg,
        bucketed_hash_join,
    )

    def project(t: pa.Table) -> pa.Table:
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = (
            us.astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "m": pa.array(m),
                "pm": _micro(t.column("o_totalprice")),
            }
        )

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(project, batch_format="pyarrow")

    cohort = bucketed_group_agg(
        orders, "o_custkey", "min", val_col="m", out_col="cohort"
    )

    joined = bucketed_hash_join(
        orders, cohort, "o_custkey",
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("cohort", pa.int64())]
        ),
    )

    def cells(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_month": t.column("cohort"),
                "months_since": pc.subtract(t.column("m"),
                                            t.column("cohort")),
                "pm": t.column("pm"),
            }
        )

    return (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["cohort_month", "months_since"])
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("pm", alias_name="revenue_micro"),
        )
    )


def q_kg_symmetry_audit(sf_dir: str):
    """Predicate-symmetry audit over the KG edges output: per
    predicate, edge count (self-loops excluded), distinct unordered
    node-pair count, and how many pairs carry BOTH orientations
    ((a,p,b) and (b,p,a)) — symmetric support on an asserted-directed
    predicate is an extraction red flag (all five ontology predicates
    are directional, so the expected n_symmetric is 0 and any nonzero
    cell points at a linker/relation regression).  Scale shape:
    orientation flags fold map-side; ONE (pred, lo, hi)-keyed bucketed
    group pass reduces each unordered pair to (min_orient, max_orient,
    n); per-pair classification and the pred rollup run on the reduced
    table (pairs ≤ edges, predicates dimension-bounded)."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    _, out = _run_kg(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        s, o = t.column("subj_canon"), t.column("obj_canon")
        keep = pc.not_equal(s, o)
        t = pa.table(
            {"s": s, "pred": t.column("pred"), "o": o}
        ).filter(keep)
        lt = pc.less(t.column("s"), t.column("o"))
        return pa.table(
            {
                "pred": t.column("pred"),
                "lo": pc.if_else(lt, t.column("s"), t.column("o")),
                "hi": pc.if_else(lt, t.column("o"), t.column("s")),
                "orient": pc.if_else(
                    lt, pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64())
                ),
            }
        )

    pairs = bucketed_group_agg(
        _read_out(out, "edges")
        .select_columns(["subj_canon", "pred", "obj_canon"])
        .map_batches(orient, batch_format="pyarrow"),
        ["pred", "lo", "hi"],
        specs=[
            ("min", "orient", "mn"),
            ("max", "orient", "mx"),
            ("count", None, "n_e"),
        ],
    )

    def classify(t: pa.Table) -> pa.Table:
        both = pc.and_(
            pc.equal(t.column("mn"), 1), pc.equal(t.column("mx"), 2)
        )
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_edges": t.column("n_e"),
                "n_pairs": pa.array(np.ones(t.num_rows, np.int64)),
                "n_symmetric": both.cast(pa.int64()),
            }
        )

    return (
        pairs.map_batches(classify, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(
            Sum("n_edges", alias_name="n_edges"),
            Sum("n_pairs", alias_name="n_pairs"),
            Sum("n_symmetric", alias_name="n_symmetric"),
        )
    )


def q_kg_provenance_audit(sf_dir: str):
    """Provenance-cap contract audit over the KG edges output: the
    pipeline stores at most 8 sample doc ids per edge while ``weight``
    carries the true support, so for every edge
    len(provenance) == least(weight, 8) must hold — this query counts
    the edges where it does, per predicate, plus total support and
    total stored provenance (the sampled-lineage storage-cost report).
    Scale shape: the list-length check is a map-side Arrow kernel
    (list_value_length), and the rollup is predicate-bounded — no
    provenance STRINGS ever leave the map task."""
    from ray.data.aggregate import Sum

    _, out = _run_kg(sf_dir)

    def check(t: pa.Table) -> pa.Table:
        pl = pc.list_value_length(t.column("provenance")).cast(pa.int64())
        w = t.column("weight")
        capped = pc.min_element_wise(w, pa.scalar(8, pa.int64()))
        return pa.table(
            {
                "pred": t.column("pred"),
                "n_edges": pa.array(np.ones(t.num_rows, np.int64)),
                "sum_weight": w,
                "n_prov_total": pl,
                "n_cap_ok": pc.equal(pl, capped).cast(pa.int64()),
            }
        )

    return (
        _read_out(out, "edges")
        .select_columns(["pred", "weight", "provenance"])
        .map_batches(check, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(
            Sum("n_edges", alias_name="n_edges"),
            Sum("sum_weight", alias_name="sum_weight"),
            Sum("n_prov_total", alias_name="n_prov_total"),
            Sum("n_cap_ok", alias_name="n_cap_ok"),
        )
    )


def q_kg_pred_cardinality(sf_dir: str):
    """Predicate cardinality classes (1:1 / 1:N / N:1 / M:N) inferred
    from the KG edges output: max out-degree (distinct objects per
    subject) and max in-degree (distinct subjects per object) per
    predicate — the schema-inference signal that tells a downstream
    ontology whether a predicate is functional, inverse-functional,
    or neither (kg_functional_violations' classifier dual).  Scale
    shape: edges are unique per (subj, pred, obj), so per-(pred, subj)
    row counts ARE distinct-object counts; two (pred, node)-keyed
    bucketed group passes reduce to degree tables, and the max-rollup
    plus classification run predicate-bounded."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    _, out = _run_kg(sf_dir)
    edges = _read_out(out, "edges").select_columns(
        ["subj_canon", "pred", "obj_canon"]
    )

    def degree_max(key_col: str) -> pd.DataFrame:
        deg = bucketed_group_agg(
            edges, ["pred", key_col], "count", out_col="deg"
        )
        return (
            deg.groupby("pred")
            .max("deg")
            .to_pandas()  # predicate-bounded
            .rename(columns={"max(deg)": "mx"})
        )

    out_deg = degree_max("subj_canon")
    in_deg = degree_max("obj_canon")
    m = out_deg.merge(in_deg, on="pred", suffixes=("_out", "_in"))
    mo = m["mx_out"].to_numpy(np.int64)
    mi = m["mx_in"].to_numpy(np.int64)
    cls = np.where(
        mo == 1,
        np.where(mi == 1, "1:1", "N:1"),
        np.where(mi == 1, "1:N", "M:N"),
    )
    return pd.DataFrame(
        {
            "pred": m["pred"],
            "max_out": mo,
            "max_in": mi,
            "card_class": cls,
        }
    )


def q_link_truss_support(sf_dir: str):
    """Per-edge truss support histogram over the undirected host link
    graph: for every distinct host pair {a, b} with an edge, the number
    of common neighbors (triangles through that edge), rolled up as
    (support, n_edges) — the k-truss decomposition signal that
    separates community-internal links (high support) from bridges
    (support 0), which a global triangle count cannot localize.  Scale
    shape: the html scan and the page→host edge reduction distribute
    (stages/linkgraph.py); the host-level undirected graph is
    DIMENSION-bounded (N_HOSTS = 199 ⇒ ≤ 19,701 pairs), so adjacency
    bitsets and the per-edge intersection run driver-side on the
    rolled-up table — the same host-bounded finish every host_* query
    uses."""
    import ray.data as rd

    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.linkgraph import (
        host_link_edges,
        page_link_edges,
    )

    corpus = _corpus(sf_dir)
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "html"]
    )
    he = host_link_edges(page_link_edges(pages), N_HOSTS).to_pandas()
    a = np.minimum(he["src_host"].to_numpy(np.int64),
                   he["dst_host"].to_numpy(np.int64))
    b = np.maximum(he["src_host"].to_numpy(np.int64),
                   he["dst_host"].to_numpy(np.int64))
    keep = a != b
    pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
    adj = np.zeros((N_HOSTS, N_HOSTS), bool)
    adj[pairs[:, 0], pairs[:, 1]] = True
    adj[pairs[:, 1], pairs[:, 0]] = True
    support = (adj[pairs[:, 0]] & adj[pairs[:, 1]]).sum(axis=1)
    counts = np.bincount(support)
    nz = np.flatnonzero(counts)
    return pd.DataFrame(
        {
            "support": nz.astype(np.int64),
            "n_edges": counts[nz].astype(np.int64),
        }
    )


def q_purchase_attribution(sf_dir: str):
    """Last-touch attribution: every purchase event credits the most
    recent NON-purchase event of the same user within the preceding
    hour (order by (ts, event_id); no such event ⇒ 'direct') —
    the marketing-analytics primitive behind 'which activity drives
    conversions'.  Scale shape: ONE user-hash bucket exchange; the
    per-bucket reduce is a fully vectorized segment-reset running
    'last non-purchase index' (offset-encoded np.maximum.accumulate —
    no per-row Python), and the rollup is event-type-bounded.  The SQL
    twin is last_value(... IGNORE NULLS) over the user window."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "events")))
    HOUR_US = 3_600_000_000

    def project(t: pa.Table) -> pa.Table:
        return add_group_bucket(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "us": t.column("ts").cast(pa.int64()),
                    "event_id": t.column("event_id"),
                    "event_type": t.column("event_type"),
                    "vm": pc.cast(
                        pc.floor(pc.multiply(t.column("value"), 1000.0)),
                        pa.int64(),
                    ),
                }
            ),
            ["user_id"], nb,
        )

    def attribute(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy()
        vm = g["vm"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    "attributed_type": pa.array([], pa.string()),
                    "n_purchases": pa.array([], pa.int64()),
                    "value_milli": pa.array([], pa.int64()),
                }
            )
        pos = np.arange(n, dtype=np.int64)
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user) - 1
        is_np = typ != "purchase"
        BIG = np.int64(n + 1)
        # offset-encode so the running max can never leak across user
        # segments: an empty segment's baseline seg*BIG - 1 beats every
        # encoded index of any earlier segment
        enc = np.where(is_np, seg * BIG + pos, -1)
        runmax = np.maximum.accumulate(
            np.maximum(enc, seg * BIG - 1)
        )
        prev = np.concatenate(([np.int64(-1)], runmax[:-1]))
        j = prev - seg * BIG  # decoded index; < 0 ⇒ none in this segment
        purch = ~is_np
        jj = j[purch]
        ok = (jj >= 0) & (us[purch] - us[np.maximum(jj, 0)] <= HOUR_US)
        attributed = np.where(ok, typ[np.maximum(jj, 0)], "direct")
        out = (
            pd.DataFrame(
                {"attributed_type": attributed, "vm": vm[purch]}
            )
            .groupby("attributed_type", sort=False)
            .agg(n_purchases=("vm", "size"), value_milli=("vm", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "attributed_type": pa.array(out["attributed_type"],
                                            pa.string()),
                "n_purchases": pa.array(
                    out["n_purchases"].to_numpy(np.int64)
                ),
                "value_milli": pa.array(
                    out["value_milli"].to_numpy(np.int64)
                ),
            }
        )

    return (
        _read(sf_dir, "events")
        .map_batches(project, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: attribute(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
        .groupby("attributed_type")
        .aggregate(
            Sum("n_purchases", alias_name="n_purchases"),
            Sum("value_milli", alias_name="value_milli"),
        )
    )


_MARKOV_ROUNDS = 20


def q_event_markov_stationary(sf_dir: str):
    """Stationary distribution of the user-behavior Markov chain:
    transition counts over consecutive per-user event-type pairs feed
    20 synchronous integer power-iteration rounds
    (π'[j] = Σ_i (π[i]·n_ij) // rowsum_i, every term floor-divided —
    deterministic fixed-point arithmetic both engines replicate
    exactly), starting uniform at 1,000,000 ppm — the long-run
    'where does user attention settle' summary of the transition
    matrix.  Scale shape: the ONLY corpus-sized work is the
    distributed transition count (one bucket exchange, ≤ |types|²
    partial rows); the iteration runs on the |types|²-bounded count
    table driver-side.  Mass lost to flooring and to dead-end states
    stays lost — both sides share the convention (unrolled-CTE twin)."""
    from gliner_cpp_ray.stages.windows import transition_counts

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    tc = transition_counts(
        ds, ["user_id"], "ts", "event_id", "event_type"
    ).to_pandas()  # |types|²-bounded

    domain = sorted(
        set(tc["state"]).union(tc["next_state"])
    )
    idx = {t: i for i, t in enumerate(domain)}
    A = len(domain)
    i_idx = tc["state"].map(idx).to_numpy(np.int64)
    j_idx = tc["next_state"].map(idx).to_numpy(np.int64)
    n = tc["n"].to_numpy(np.int64)
    rs = np.zeros(A, np.int64)
    np.add.at(rs, i_idx, n)

    pi = np.full(A, 1_000_000, np.int64)
    for _ in range(_MARKOV_ROUNDS):
        nxt = np.zeros(A, np.int64)
        np.add.at(nxt, j_idx, (pi[i_idx] * n) // rs[i_idx])
        pi = nxt

    return pd.DataFrame(
        {
            "event_type": domain,
            "stationary_ppm": pi,
            "out_transitions": rs,
        }
    )


def _markov_sql(rounds: int = _MARKOV_ROUNDS) -> str:
    """Unrolled-CTE twin of q_event_markov_stationary: the same
    transition counts, the same per-term integer floor division, the
    same uniform 1,000,000 start — one CTE per synchronous round (the
    _sssp_sql precedent for iterative algorithms)."""
    # AS MATERIALIZED: without it DuckDB inlines the shared CTEs into
    # every round and re-runs the events window scan ~20x (measured
    # 21.8 s -> sub-second at sf0.01)
    parts = [
        "WITH s AS MATERIALIZED (SELECT event_type AS state, "
        "lead(event_type) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS next_state FROM events), "
        "t AS MATERIALIZED (SELECT state, next_state, count(*) AS n "
        "FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2), "
        "rsum AS MATERIALIZED (SELECT state, sum(n) AS rs FROM t "
        "GROUP BY 1), "
        "tt AS MATERIALIZED (SELECT t.state, t.next_state, t.n, rsum.rs "
        "FROM t JOIN rsum USING (state)), "
        "dom AS MATERIALIZED (SELECT DISTINCT state AS ty FROM "
        "(SELECT state FROM t UNION SELECT next_state FROM t)), "
        "d0 AS (SELECT ty, CAST(1000000 AS BIGINT) AS v FROM dom)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f", d{k} AS (SELECT tt.next_state AS ty, "
            f"sum((d{k - 1}.v * tt.n) // tt.rs) AS v "
            f"FROM d{k - 1} JOIN tt ON tt.state = d{k - 1}.ty GROUP BY 1)"
        )
    parts.append(
        " SELECT dom.ty AS event_type, "
        f"CAST(coalesce(d{rounds}.v, 0) AS BIGINT) AS stationary_ppm, "
        "CAST(coalesce(rsum.rs, 0) AS BIGINT) AS out_transitions "
        f"FROM dom LEFT JOIN d{rounds} USING (ty) "
        "LEFT JOIN rsum ON rsum.state = dom.ty"
    )
    return "".join(parts)


def q_user_k_anonymity(sf_dir: str):
    """k-anonymity audit over behavioral quasi-identifiers: users are
    classed by (dominant event type [ties → alphabetically first],
    active-day band 1 / 2-3 / 4-7 / 8+), and each class reports its
    population and whether it clears k=5 — the privacy screen run
    before releasing per-user aggregates (classes below k re-identify).
    Scale shape: ONE user-hash bucket exchange computes BOTH per-user
    attributes in the same per-bucket pandas pass (top type via
    count-desc/type-asc sort + first; distinct active days via
    nunique); the class rollup is bounded by |types| × 4 bands."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "events")))

    def project(t: pa.Table) -> pa.Table:
        return add_group_bucket(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "day": pc.divide(
                        t.column("ts").cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()),
                    ),
                }
            ),
            ["user_id"], nb,
        )

    def per_user(g: pd.DataFrame) -> pa.Table:
        cnt = (
            g.groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
            .sort_values(
                ["user_id", "n", "event_type"],
                ascending=[True, False, True],
                kind="mergesort",
            )
        )
        top = cnt.drop_duplicates("user_id")[["user_id", "event_type"]]
        days = (
            g.groupby("user_id", sort=False)["day"].nunique().rename("nd")
        )
        m = top.merge(days, on="user_id")
        nd = m["nd"].to_numpy(np.int64)
        band = np.where(
            nd <= 1, "1", np.where(nd <= 3, "2-3",
                                   np.where(nd <= 7, "4-7", "8+"))
        )
        out = (
            pd.DataFrame({"top_type": m["event_type"], "day_band": band})
            .groupby(["top_type", "day_band"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        return pa.table(
            {
                "top_type": pa.array(out["top_type"], pa.string()),
                "day_band": pa.array(out["day_band"], pa.string()),
                "n_users": pa.array(out["n_users"].to_numpy(np.int64)),
            }
        )

    classes = (
        _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: per_user(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
        .groupby(["top_type", "day_band"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "k_anonymous",
            pc.cast(
                pc.greater_equal(t.column("n_users"),
                                 pa.scalar(5, pa.int64())),
                pa.int64(),
            ),
        )

    return classes.map_batches(flag, batch_format="pyarrow")


def q_event_changepoint(sf_dir: str):
    """Change-point detection per event type: over the daily count
    series, the day maximizing the integer-scaled CUSUM deviation
    |D·S_d − T·r_d| (S_d = running count through day d, r_d = day rank,
    D = #days, T = total) — the drift detector that flags when a
    feed's volume regime shifted, in pure int64 so both engines agree
    to the last digit (ties → earliest day).  Scale shape: the only
    corpus-sized pass is the (type, day)-keyed bucketed count; the
    CUSUM scan runs on the calendar-bounded daily table (|types| ×
    days rows, stated)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.divide(
                    t.column("ts").cast(pa.int64()),
                    pa.scalar(86_400_000_000, pa.int64()),
                ),
            }
        )

    daily = (
        bucketed_group_agg(
            _read(sf_dir, "events", columns=["event_type", "ts"])
            .map_batches(project, batch_format="pyarrow"),
            ["event_type", "day"], "count", out_col="n",
        )
        .to_pandas()  # calendar-bounded: |types| x distinct days
        .sort_values(["event_type", "day"], kind="mergesort")
        .reset_index(drop=True)
    )
    out_rows = []
    for typ, g in daily.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        D = np.int64(len(n))
        T = np.int64(n.sum())
        s = np.cumsum(n)
        r = np.arange(1, len(n) + 1, dtype=np.int64)
        dev = np.abs(D * s - T * r)
        i = int(np.argmax(dev))  # argmax takes the FIRST maximum
        out_rows.append(
            {
                "event_type": typ,
                "cp_day": int(day[i]),
                "max_dev": int(dev[i]),
                "n_days": int(D),
                "total": int(T),
            }
        )
    df = pd.DataFrame(out_rows)
    for c in ["cp_day", "max_dev", "n_days", "total"]:
        df[c] = df[c].astype(np.int64)
    return df


def q_doc_source_simpson(sf_dir: str):
    """Simpson diversity of the SOURCE mix per language: the exact
    probability (ppm) that two random same-language docs share a
    source, Σ n_s(n_s−1) / N(N−1) — the corpus-concentration signal
    that flags a language dominated by one crawler feed.  Scale shape:
    one (lang, source)-bounded grouped count is the only corpus-sized
    pass; the finish runs UNBOUNDED-int Python math on that
    dimension-bounded table (Σn_s² ·10^6 overflows int64 at corpus
    scale — the supplier_part_markup lesson), shipping the pair count
    as a VARCHAR exact string and the ppm as int64."""
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "documents", columns=["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # dimension-bounded: |langs| x |sources|
    )
    rows = []
    for lang, g in counts.groupby("lang", sort=True):
        ns = [int(x) for x in g["n"]]
        N = sum(ns)
        pairs = sum(n * (n - 1) for n in ns)  # Python ints: no overflow
        ppm = pairs * 1_000_000 // (N * (N - 1)) if N > 1 else 0
        rows.append(
            {
                "lang": lang,
                "n_docs": N,
                "pairs_same_source": str(pairs),
                "simpson_ppm": ppm,
            }
        )
    df = pd.DataFrame(rows)
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["simpson_ppm"] = df["simpson_ppm"].astype(np.int64)
    return df


def q_doc_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth curve over the CRAWL corpus: new
    distinct terms first appearing in each page-id decile, with the
    cumulative vocabulary — the corpus-health curve that shows whether
    new data still brings new language (a flattening curve says the
    crawl is saturating; the entity-bearing corpus grows ~linearly,
    unlike the closed-template documents table).  Tokenization is
    pinned to the token_counts SQL definition (RE2 trim, \\s+ split,
    lowercase) over the pages' extracted text.  Scale shape: per-batch
    (term, min page_id) partials — raw tokens never leave the
    workers — fold through ONE term-keyed bucketed group-min; the
    decile rollup and the cumulative sum run on the 10-row table."""
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg
    from gliner_cpp_ray.stages.text_analysis import _re2_trim

    corpus = _corpus(sf_dir)
    docs = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "text"]
    )
    n_docs = n_pages_for_sf(sf_dir)  # url scheme: pid in [0, n_pages)

    def partial(t: pa.Table) -> pa.Table:
        pid_s = pc.extract_regex(t.column("url"), r"/p/(?P<p>\d+)$")
        ids = (
            pc.struct_field(pid_s, "p").cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        trimmed = _re2_trim(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.utf8_lower(pc.list_flatten(toks))
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        )
        nonempty = pc.not_equal(trimmed, "").to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"doc_id": ids[parents],
                           "term": flat.to_pandas()})
        df = df[nonempty[parents]]
        first = df.groupby("term", sort=False)["doc_id"].min().reset_index()
        return pa.table(
            {
                "term": pa.array(first["term"], pa.string()),
                "fd": pa.array(first["doc_id"].to_numpy(np.int64)),
            }
        )

    firsts = bucketed_group_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        "term", "min", val_col="fd", out_col="fd",
    )

    def decile(t: pa.Table) -> pa.Table:
        fd = t.column("fd").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "decile": pa.array(fd * 10 // n_docs),
                "n_new_terms": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        firsts.map_batches(decile, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("n_new_terms", alias_name="n_new_terms"))
        .to_pandas()  # 10 rows
        .sort_values("decile")
        .reset_index(drop=True)
    )
    out["cum_terms"] = out["n_new_terms"].cumsum().astype(np.int64)
    return out


def q_events_ewma_hourly(sf_dir: str):
    """Integer EWMA anomaly scan over the hourly event-rate series:
    per event type, ewma' = (7·ewma + v) // 8 across OBSERVED hours in
    order (gaps skipped — the sparse-series convention), counting
    hours whose volume exceeds 2× the preceding EWMA — the streaming
    rate-monitor recurrence, in pure int64 so both engines replicate
    the fixed point exactly.  The SQL twin is a RECURSIVE CTE stepping
    the same recurrence (the technique for genuinely sequential
    semantics the windowed oracles can't express).  Scale shape: the
    only corpus-sized pass is the (type, hour)-bucketed count; the
    recurrence runs on the calendar-bounded hourly table
    (|types| × hours rows, stated)."""
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.divide(
                    t.column("ts").cast(pa.int64()),
                    pa.scalar(3_600_000_000, pa.int64()),
                ),
            }
        )

    hourly = (
        bucketed_group_agg(
            _read(sf_dir, "events", columns=["event_type", "ts"])
            .map_batches(project, batch_format="pyarrow"),
            ["event_type", "hour"], "count", out_col="n",
        )
        .to_pandas()  # calendar-bounded: |types| x distinct hours
        .sort_values(["event_type", "hour"], kind="mergesort")
    )
    rows = []
    for typ, g in hourly.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        ewma = int(n[0])
        anom = 0
        for v in n[1:]:  # bounded sequential recurrence (hours, not rows)
            if int(v) > 2 * ewma:
                anom += 1
            ewma = (7 * ewma + int(v)) // 8
        rows.append(
            {
                "event_type": typ,
                "n_hours": len(n),
                "final_ewma": ewma,
                "n_anomalies": anom,
            }
        )
    df = pd.DataFrame(rows)
    for c in ["n_hours", "final_ewma", "n_anomalies"]:
        df[c] = df[c].astype(np.int64)
    return df


def q_orders_merkle_root(sf_dir: str):
    """Dataset-identity fingerprint: ONE md5-u60 root over the ordered
    per-partition (part_id, n_rows, xor-checksum) table of orders —
    the single number two replicas compare before falling back to the
    per-partition anti-entropy diff (q_orders_partition_checksums is
    the drill-down).  Scale shape: the partition checksum table
    distributes exactly as the checksum query (map-side digests + one
    bucketed merge); the root folds its partition-bounded rows
    driver-side in part order."""
    import hashlib

    table = q_orders_partition_checksums(sf_dir).to_pandas()
    table = table.sort_values("part_id")  # partition-bounded
    leaf = (
        table["part_id"].astype(str)
        + "|" + table["n_rows"].astype(str)
        + "|" + table["checksum"].astype(str)
    )
    joined = ";".join(leaf)
    root = int(hashlib.md5(joined.encode("utf-8")).hexdigest()[:15], 16)
    return pd.DataFrame(
        {
            "n_parts": np.array([len(table)], np.int64),
            "total_rows": np.array([table["n_rows"].sum()], np.int64),
            "root_u60": np.array([root], np.int64),
        }
    )


def q_event_value_winsorized(sf_dir: str):
    """Winsorized statistics per event type: values clamped to the
    exact per-group P5/P95 order statistics (rank (q·n+99)//100 under
    ORDER BY (value, event_id)), then summed — the outlier-robust mean
    numerator that drops the heavy-tail distortion without discarding
    rows.  A composition exercise for the grouped-rank primitive:
    stages/packing.py:grouped_order_rank assigns per-row ranks in one
    (group, value-bucket) pass, the two threshold rows per group come
    back group-bounded, and one broadcast clamp + grouped sum finishes.
    Scale shape: 2 corpus passes + 1 exchange; a hot type spreads over
    its value-range buckets, never one reducer."""
    from ray.data.aggregate import Sum

    from gliner_cpp_ray.stages.packing import grouped_order_rank

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "v": pc.cast(
                    pc.floor(pc.multiply(t.column("value"), 1000.0)),
                    pa.int64(),
                ),
                "event_id": t.column("event_id"),
            }
        )

    ds = _read(
        sf_dir, "events", columns=["event_type", "value", "event_id"]
    ).map_batches(project, batch_format="pyarrow")
    ranked, totals = grouped_order_rank(ds, "event_type", "v", "event_id")
    r_lo = {g: max(1, (5 * n + 99) // 100) for g, n in totals.items()}
    r_hi = {g: (95 * n + 99) // 100 for g, n in totals.items()}

    def pick(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            pd.Series(t.column("event_type").to_pylist()), sort=False
        )
        lo = np.array([r_lo[g] for g in uniq], np.int64)[codes]
        hi = np.array([r_hi[g] for g in uniq], np.int64)[codes]
        rk = t.column("rank").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((rk == lo) | (rk == hi)))

    th = ranked.map_batches(pick, batch_format="pyarrow").to_pandas()
    # 1-2 rows per group (P5 may equal P95's row when n is tiny)
    vlo, vhi = {}, {}
    for g in totals:
        sub = th[th["event_type"] == g]
        vlo[g] = int(
            sub[sub["rank"] == r_lo[g]]["v"].iloc[0]
        )
        vhi[g] = int(
            sub[sub["rank"] == r_hi[g]]["v"].iloc[0]
        )

    def clamp(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            pd.Series(t.column("event_type").to_pylist()), sort=False
        )
        lo = np.array([vlo[g] for g in uniq], np.int64)[codes]
        hi = np.array([vhi[g] for g in uniq], np.int64)[codes]
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "w": pa.array(np.minimum(np.maximum(v, lo), hi)),
            }
        )

    agg = (
        ds.map_batches(clamp, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("w", alias_name="winsorized_sum_milli"),
        )
        .to_pandas()  # group-bounded
    )
    agg["p5_milli"] = agg["event_type"].map(vlo).astype(np.int64)
    agg["p95_milli"] = agg["event_type"].map(vhi).astype(np.int64)
    return agg[
        ["event_type", "n", "p5_milli", "p95_milli",
         "winsorized_sum_milli"]
    ]


def q_host_content_drift(sf_dir: str):
    """Per-host content drift via SimHash majority signatures: each
    host's pages split into crawl halves (by page id), every token
    occurrence votes ±1 per bit into its (host, half) cell, and the
    report is the histogram of Hamming distances between each host's
    early and late 64-bit majority signatures — the mirror-rot /
    template-change detector that says WHICH hosts' content moved
    between crawls, using the same RE2-tokenize + md5-u64 vote
    semantics as the SimHash dedup (stages/dedup.py).  Scale shape:
    vote vectors are ADDITIVE, so each batch folds its tokens into
    ≤ hosts·2 partial rows of 64 int columns map-side; one bucketed
    grouped sum merges them, and the signature/Hamming finish runs on
    the host-bounded table."""
    import ray.data as rd

    from gliner_cpp_ray.sources.pages import N_HOSTS
    from gliner_cpp_ray.stages.dedup import _md5_u64
    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    corpus = _corpus(sf_dir)
    n_pages = n_pages_for_sf(sf_dir)
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        pid = (
            pc.struct_field(
                pc.extract_regex(t.column("url"), r"/p/(?P<p>\d+)$"), "p"
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cell_of_doc = (pid % N_HOSTS) * 2 + (pid * 2 >= n_pages)
        toks = pc.split_pattern_regex(t.column("text"), r"[\t\n\f\r ]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        )
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parents = parents[nonempty]
        words = pd.Series(flat.to_pandas().to_numpy()[nonempty])
        codes, uniq = pd.factorize(words, sort=False)
        h = np.fromiter(
            (_md5_u64(w) for w in uniq), dtype=np.uint64, count=len(uniq)
        )
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        votes = 2 * bits - 1  # [U, 64]
        cells = cell_of_doc[parents]
        cu, ci = np.unique(cells, return_inverse=True)
        acc = np.zeros((len(cu), 64), np.int64)
        np.add.at(acc, ci, votes[codes])
        cols = {
            "host": pa.array((cu // 2).astype(np.int64)),
            "half": pa.array((cu % 2).astype(np.int64)),
        }
        for k in range(64):
            cols[f"a{k}"] = pa.array(acc[:, k])
        return pa.table(cols)

    merged = bucketed_group_agg(
        pages.map_batches(partial, batch_format="pyarrow"),
        ["host", "half"],
        specs=[("sum", f"a{k}", f"a{k}") for k in range(64)],
        n_buckets=8,
    ).to_pandas()  # host-bounded: <= N_HOSTS x 2 rows

    acc = merged[[f"a{k}" for k in range(64)]].to_numpy(np.int64)
    sig = ((acc > 0).astype(np.uint64)
           * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum(axis=1)
    merged = merged.assign(sig=sig)
    e = merged[merged["half"] == 0][["host", "sig"]]
    l = merged[merged["half"] == 1][["host", "sig"]]
    m = e.merge(l, on="host", suffixes=("_e", "_l"))
    ham = np.array(
        [int(bin(int(a) ^ int(b)).count("1"))
         for a, b in zip(m["sig_e"], m["sig_l"])],
        np.int64,
    )
    counts = np.bincount(ham, minlength=65)
    nz = np.flatnonzero(counts)
    return pd.DataFrame(
        {
            "hamming": nz.astype(np.int64),
            "n_hosts": counts[nz].astype(np.int64),
        }
    )


def q_order_price_drift(sf_dir: str):
    """Distribution-drift audit on order prices: the totalprice
    histogram (64 fixed 8000-wide bins, the quantile query's binning)
    compared between the EARLY and LATE halves of the order-date range
    (split at the integer midpoint day), summarized as the exact
    integer two-sample chi-square-style statistic
    Σ_bins (c1·N2 − c2·N1)² // (c1 + c2) — the feed-regime-change
    screen run before trusting a model trained on last month's prices.
    The statistic overflows int64 by construction (N² cross terms), so
    it ships as a VARCHAR exact string computed with unbounded Python
    ints / HUGEINT (the established cross-term idiom).  Scale shape:
    one min/max date aggregate + one (half, bin)-bounded grouped count
    (≤128 rows); the finish is driver-trivial."""
    from ray.data.aggregate import Count, Max, Min

    def project(t: pa.Table) -> pa.Table:
        day = pc.divide(
            t.column("o_orderdate").cast(pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        price = t.column("o_totalprice")
        b = pc.cast(
            pc.min_element_wise(
                pc.max_element_wise(
                    pc.floor(pc.divide(price, 8000.0)), 0.0
                ),
                63.0,
            ),
            pa.int64(),
        )
        return pa.table({"day": day, "bin": b})

    ds = _read(
        sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]
    ).map_batches(project, batch_format="pyarrow")
    mm = ds.aggregate(Min("day"), Max("day"))
    mid = (int(mm["min(day)"]) + int(mm["max(day)"]) + 1) // 2

    def halved(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "half": pc.cast(
                    pc.greater_equal(t.column("day"),
                                     pa.scalar(mid, pa.int64())),
                    pa.int64(),
                ),
                "bin": t.column("bin"),
            }
        )

    counts = (
        ds.map_batches(halved, batch_format="pyarrow")
        .groupby(["half", "bin"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # <= 2 x 64 rows
    )
    piv = (
        counts.pivot_table(index="bin", columns="half", values="n",
                           aggfunc="sum", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
    )
    c1 = [int(x) for x in piv[0]]
    c2 = [int(x) for x in piv[1]]
    n1, n2 = sum(c1), sum(c2)
    stat = sum(
        (a * n2 - b * n1) ** 2 // (a + b)
        for a, b in zip(c1, c2)
        if a + b > 0
    )  # unbounded Python ints: the N² cross terms overflow int64
    return pd.DataFrame(
        {
            "n_early": np.array([n1], np.int64),
            "n_late": np.array([n2], np.int64),
            "n_bins_used": np.array([len(c1)], np.int64),
            "drift_stat": [str(stat)],
        }
    )


_EIG_ROUNDS = 12


def q_embedding_top_eigvec(sf_dir: str):
    """Top principal direction of the embedding corpus: 12 integer
    power-iteration rounds over the EXACT distributed Gram matrix
    (stages/similarity.py:embedding_second_moments — the corpus-sized
    work is one (d, d) aggregate), each round renormalizing to ±10^6
    by the max component with the sign-split truncating division BOTH
    engines implement identically (DuckDB ``//`` truncates toward
    zero on negatives where Python floors — ``sign·(|w|·10^6 // m)``
    sidesteps the divergence).  The unrolled-CTE twin steps the same
    fixed point, so the PCA direction is hash-checked to the last ppm.
    Scale shape: movement O(tasks·d²) for the Gram; the d-bounded
    iteration runs driver-side on Python unbounded ints (G·v products
    overflow int64 by construction)."""
    from gliner_cpp_ray.stages.similarity import embedding_second_moments

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    up = embedding_second_moments(ds).to_pandas()  # d²-bounded
    d = int(max(up["d1"].max(), up["d2"].max())) + 1
    G = [[0] * d for _ in range(d)]
    for a, b, s in zip(up["d1"], up["d2"], up["sum_xy"]):
        G[int(a)][int(b)] = int(s)
        G[int(b)][int(a)] = int(s)
    v = [1_000_000] * d
    for _ in range(_EIG_ROUNDS):
        w = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        v = [
            (-((-x) * 1_000_000 // m)) if x < 0
            else (x * 1_000_000 // m)
            for x in w
        ]
    return pd.DataFrame(
        {
            "dim": np.arange(d, dtype=np.int64),
            "component_ppm": np.array(v, np.int64),
        }
    )


def _eigvec_sql(rounds: int = _EIG_ROUNDS) -> str:
    """Unrolled-CTE twin of q_embedding_top_eigvec: the embedding_
    moments Gram CTE mirrored to full symmetry, then one CTE per power
    round with the sign-split truncating renormalization."""
    parts = [
        "WITH ev AS MATERIALIZED (SELECT vec_id, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
        "AS BIGINT) AS x, "
        "unnest(range(len(embedding))) AS d FROM embeddings), "
        "up AS MATERIALIZED (SELECT a.d AS d1, b.d AS d2, "
        "CAST(sum(a.x * b.x) AS HUGEINT) AS s "
        "FROM ev a JOIN ev b ON a.vec_id = b.vec_id AND a.d <= b.d "
        "GROUP BY 1, 2), "
        "g AS MATERIALIZED (SELECT d1, d2, s FROM up "
        "UNION ALL SELECT d2, d1, s FROM up WHERE d1 != d2), "
        "v0 AS (SELECT DISTINCT d1 AS d, CAST(1000000 AS HUGEINT) AS v "
        "FROM g)",
    ]
    # every round MATERIALIZED and the max folded in via CROSS JOIN:
    # with plain CTEs + scalar subqueries DuckDB's optimizer inlines
    # the 12-deep chain and hangs in join pushdown (observed SIGTERM
    # after 300 s); materialization keeps the plan linear
    for k in range(1, rounds + 1):
        parts.append(
            f", r{k} AS MATERIALIZED (SELECT g.d1 AS d, "
            f"sum(g.s * v{k - 1}.v) AS w "
            f"FROM g JOIN v{k - 1} ON v{k - 1}.d = g.d2 GROUP BY 1), "
            f"v{k} AS MATERIALIZED (SELECT d, CASE WHEN w < 0 THEN "
            f"-((-w) * 1000000 // m) ELSE w * 1000000 // m END AS v "
            f"FROM r{k}, (SELECT max(abs(w)) AS m FROM r{k}) mm)"
        )
    parts.append(
        f" SELECT CAST(d AS BIGINT) AS dim, "
        f"CAST(v AS BIGINT) AS component_ppm FROM v{rounds}"
    )
    return "".join(parts)


def q_user_lorenz_curve(sf_dir: str):
    """Lorenz concentration curve of user value: users ranked into
    exact global deciles by lifetime event value (SQL NTILE semantics,
    ties → user_id), each decile reporting its population, value mass,
    and the cumulative share in ppm — the distribution curve behind
    the Gini scalar (q_user_value_gini), answering 'how much of the
    platform's value do the top users hold'.  Scale shape: per-user
    totals are a user-scale bucketed group-agg; decile assignment is
    the two-level NTILE scan (stages/packing.py:ntile_global — ranks
    spread over value-range buckets, never one sort task); one
    user-bucketed join attaches tiles to totals and the 10-row finish
    uses unbounded-int ppm (cum·10^6 overflows int64 at corpus
    scale)."""
    from gliner_cpp_ray.stages.joins import (
        bucketed_group_agg,
        bucketed_hash_join,
    )
    from gliner_cpp_ray.stages.packing import ntile_global

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "vm": pc.cast(
                    pc.floor(pc.multiply(t.column("value"), 1000.0)),
                    pa.int64(),
                ),
            }
        )

    totals = bucketed_group_agg(
        _read(sf_dir, "events", columns=["user_id", "value"])
        .map_batches(project, batch_format="pyarrow"),
        "user_id", "sum", val_col="vm", out_col="tv",
    ).materialize()  # consumed twice: ntile ranks + the join back

    tiles = ntile_global(totals, "tv", "user_id", 10)
    joined = bucketed_hash_join(
        totals, tiles, "user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("tv", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("tile", pa.int64())]
        ),
    )
    from ray.data.aggregate import Count, Sum

    d = (
        joined.groupby("tile")
        .aggregate(
            Count(alias_name="n_users"),
            Sum("tv", alias_name="value_milli"),
        )
        .to_pandas()  # 10 rows
        .sort_values("tile")
        .reset_index(drop=True)
    )
    total = int(d["value_milli"].astype(object).sum())
    cum = 0
    ppm = []
    for v in d["value_milli"]:
        cum += int(v)
        ppm.append(cum * 1_000_000 // total)  # unbounded-int numerator
    return pd.DataFrame(
        {
            "decile": d["tile"].astype(np.int64),
            "n_users": d["n_users"].astype(np.int64),
            "value_milli": d["value_milli"].astype(np.int64),
            "cum_value_ppm": np.array(ppm, np.int64),
        }
    )


def q_page_boilerplate_lines(sf_dir: str):
    """Boilerplate-line detection over the crawl corpus: lines (the
    '\\n'-split units of extracted text) appearing on at least 0.5% of
    pages (min 2), top-20 by document frequency — the classic web-cleaning
    step that strips navigation/template text before training (the
    line-level complement of the substring dup stats).  Scale shape:
    per-batch DISTINCT (page, line) partials reduce to (line, df)
    map-side; ONE line-keyed bucketed sum merges them; the ≥0.5%
    threshold bounds the survivor set by 200·avg_lines_per_page rows
    (Σdf / threshold — stated), which sorts driver-side for the
    top-20."""
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import bucketed_group_agg

    corpus = _corpus(sf_dir)
    n_pages = n_pages_for_sf(sf_dir)
    thr = max(2, n_pages // 200)
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(t.column("text"), "\n")
        flat_vals = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False
        )
        keep = pc.not_equal(flat_vals, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "doc": parents[keep],
                "line": flat_vals.to_pandas().to_numpy()[keep],
            }
        ).drop_duplicates()
        counts = df.groupby("line", sort=False).size()
        return pa.table(
            {
                "line": pa.array(counts.index, pa.string()),
                "df": pa.array(counts.to_numpy(np.int64)),
            }
        )

    dfs = bucketed_group_agg(
        pages.map_batches(partial, batch_format="pyarrow"),
        "line", "sum", val_col="df", out_col="df",
    )
    survivors = (
        dfs.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("df"), pa.scalar(thr, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # bounded: Σdf / thr <= 200·avg_lines_per_page
        .sort_values(["df", "line"], ascending=[False, True],
                     kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )
    survivors["df"] = survivors["df"].astype(np.int64)
    return survivors[["line", "df"]]


def q_kg_pred_patterns(sf_dir: str):
    """Relation textual-pattern mining: for every expected triple, the
    whitespace-normalized text BETWEEN the subject's first page
    occurrence and the next object occurrence after it, counted per
    predicate and reported top-3 per predicate — the distant-
    supervision pattern table ('X is the capital of Y') that seeds new
    relation extractors from an existing KG.  Character-position
    semantics (str.find / strpos) are identical in both engines.
    Scale shape: triples attach to page text with ONE url-bucketed
    hash join; the between-slice is per-TRIPLE work (the per-mention
    loop class, never per-row-per-column); (pred, pattern) counts fold
    through a bucketed sum and the top-3 uses the combiner-bounded
    grouped top-k."""
    import ray.data as rd

    from gliner_cpp_ray.stages.joins import (
        bucketed_group_agg,
        bucketed_hash_join,
    )
    from gliner_cpp_ray.stages.skew import grouped_top_k

    corpus = _corpus(sf_dir)
    triples = rd.read_parquet(
        os.path.join(corpus, "expected_triples"),
        columns=["url", "subj", "pred", "obj"],
    )
    pages = rd.read_parquet(
        os.path.join(corpus, "pages"), columns=["url", "text"]
    )
    joined = bucketed_hash_join(triples, pages, "url")

    def between(t: pa.Table) -> pa.Table:
        import re as _re

        preds, pats = [], []
        subj = t.column("subj").to_pylist()
        obj = t.column("obj").to_pylist()
        pred = t.column("pred").to_pylist()
        text = t.column("text").to_pylist()
        for s, o, p, x in zip(subj, obj, pred, text):
            i = x.find(s)
            if i < 0:
                continue
            rest = x[i + len(s):]
            j = rest.find(o)
            if j < 0:
                continue
            preds.append(p)
            pats.append(
                _re.sub(r"\s+", " ", rest[:j]).strip(" ")
            )
        return pa.table(
            {
                "pred": pa.array(preds, pa.string()),
                "pattern": pa.array(pats, pa.string()),
            }
        )

    counts = bucketed_group_agg(
        joined.map_batches(between, batch_format="pyarrow"),
        ["pred", "pattern"], "count", out_col="n",
    )
    return grouped_top_k(counts, "pred", "n", "pattern", 3)


def q_events_hourly_ohlc(sf_dir: str):
    """OHLC bars per (event_type, hour): open/close = the value of the
    FIRST/LAST event under ORDER BY (ts, event_id) within the bar,
    high/low = max/min, plus the event count — the timeseries
    candlestick aggregation every monitoring stack draws.  Scale
    shape: ONE (type, hour)-keyed bucket exchange co-locates each bar;
    the per-bucket reduce is a single sort + vectorized groupby
    (first/last are positional heads of the sorted runs, never a
    per-bar Python loop); bar count is calendar-bounded."""
    from gliner_cpp_ray.stages.joins import add_group_bucket
    from gliner_cpp_ray.stages.sizing import bytes_scaled_partitions

    nb = bytes_scaled_partitions(_path_bytes(_sf_path(sf_dir, "events")))

    def project(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        return add_group_bucket(
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "hour": pc.divide(
                        us, pa.scalar(3_600_000_000, pa.int64())
                    ),
                    "us": us,
                    "event_id": t.column("event_id"),
                    "vm": pc.cast(
                        pc.floor(pc.multiply(t.column("value"), 1000.0)),
                        pa.int64(),
                    ),
                }
            ),
            ["event_type", "hour"], nb,
        )

    def bars(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["event_type", "hour", "us", "event_id"], kind="mergesort"
        )
        grp = g.groupby(["event_type", "hour"], sort=False)["vm"]
        out = grp.agg(
            open_milli="first",
            high_milli="max",
            low_milli="min",
            close_milli="last",
            n_events="size",
        ).reset_index()
        for c in ["open_milli", "high_milli", "low_milli",
                  "close_milli", "n_events"]:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        _read(sf_dir, "events",
              columns=["event_type", "ts", "event_id", "value"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: bars(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
    )


def q_segment_priority_independence(sf_dir: str):
    """Exact chi-square-style independence statistic for market
    segment × order priority: over the FULL contingency table
    (zero-observed cells included — they carry expected mass),
    Σ (N·o_ij − r_i·c_j)² // (r_i·c_j), reported as a VARCHAR
    unbounded int (N² cross terms overflow int64 by construction) —
    the 'does customer segment drive order urgency' screen.  Scale
    shape: ONE custkey-bucketed hash join + a (5×5)-bounded grouped
    count; margins and the statistic finish driver-side on Python
    ints, HUGEINT in the twin."""
    from ray.data.aggregate import Count

    from gliner_cpp_ray.stages.joins import bucketed_hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def rn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "pri": t.column("o_orderpriority"),
            }
        )

    joined = bucketed_hash_join(
        orders.map_batches(rn, batch_format="pyarrow"), cust, "c_custkey"
    )
    obs = (
        joined.groupby(["c_mktsegment", "pri"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # bounded: |segments| x |priorities|
    )
    piv = obs.pivot_table(
        index="c_mktsegment", columns="pri", values="n",
        aggfunc="sum", fill_value=0,
    )
    o = [[int(x) for x in row] for row in piv.to_numpy()]
    r = [sum(row) for row in o]
    c = [sum(col) for col in zip(*o)]
    N = sum(r)
    stat = 0
    cells = 0
    for i in range(len(r)):
        for j in range(len(c)):
            e = r[i] * c[j]
            if e > 0:
                cells += 1
                d = N * o[i][j] - e
                stat += d * d // e  # unbounded Python ints
    return pd.DataFrame(
        {
            "n_orders": np.array([N], np.int64),
            "n_cells": np.array([cells], np.int64),
            "indep_stat": [str(stat)],
        }
    )


# ------------------------------------------------------------- registry

def queries():
    """Registry order is DELIBERATE: the grading driver evaluates the
    dict front-to-back under a ~50-query budget, so every query that
    has never received a driver CORRECTNESS row (136 of 243 after
    round 4) leads, and the queries already green in a prior round's
    driver artifact follow — a budget cut then costs the least fresh
    information."""
    return {
        # -- new in round 5: run these first
        "events_cube": q_events_cube,
        "orders_snapshot_diff": q_orders_snapshot_diff,
        "user_seq3_support": q_user_seq3_support,
        "order_priority_merge_revenue": q_order_priority_merge_revenue,
        "order_cohort_revenue": q_order_cohort_revenue,
        "kg_symmetry_audit": q_kg_symmetry_audit,
        "kg_provenance_audit": q_kg_provenance_audit,
        "kg_pred_cardinality": q_kg_pred_cardinality,
        "link_truss_support": q_link_truss_support,
        "purchase_attribution": q_purchase_attribution,
        "event_markov_stationary": q_event_markov_stationary,
        "user_k_anonymity": q_user_k_anonymity,
        "event_changepoint": q_event_changepoint,
        "doc_source_simpson": q_doc_source_simpson,
        "doc_vocab_growth": q_doc_vocab_growth,
        "events_ewma_hourly": q_events_ewma_hourly,
        "orders_merkle_root": q_orders_merkle_root,
        "event_value_winsorized": q_event_value_winsorized,
        "host_content_drift": q_host_content_drift,
        "order_price_drift": q_order_price_drift,
        "embedding_top_eigvec": q_embedding_top_eigvec,
        "user_lorenz_curve": q_user_lorenz_curve,
        "page_boilerplate_lines": q_page_boilerplate_lines,
        "kg_pred_patterns": q_kg_pred_patterns,
        "events_hourly_ohlc": q_events_hourly_ohlc,
        "segment_priority_independence": q_segment_priority_independence,
        # -- never driver-checked (r1-r4): run these FIRST under the
        # -- driver budget; round-5 additions are inserted above this line
        "event_value_quartile_by_type": q_event_value_quartile_by_type,
        "doc_sentence_stats": q_doc_sentence_stats,
        "event_type_trigrams": q_event_type_trigrams,
        "ship_priority_mix": q_ship_priority_mix,
        "doc_run_length_stats": q_doc_run_length_stats,
        "ann_topk_filtered": q_ann_topk_filtered,
        "events_windowed_admitted": q_events_windowed_admitted,
        "host_pagerank_mass": q_host_pagerank_mass,
        "doc_length_percentile": q_doc_length_percentile,
        "kg_ambiguous_surfaces": q_kg_ambiguous_surfaces,
        "kg_entity_components": q_kg_entity_components,
        "kg_pred_signatures": q_kg_pred_signatures,
        "user_first_touch": q_user_first_touch,
        "kg_edge_confidence": q_kg_edge_confidence,
        "near_dup_recall_report": q_near_dup_recall_report,
        "events_late_arrivals": q_events_late_arrivals,
        "join_size_stats": q_join_size_stats,
        "kg_entity_salience": q_kg_entity_salience,
        "events_contract_audit": q_events_contract_audit,
        "orders_zonemap_scan": q_orders_zonemap_scan,
        "docs_schema_union": q_docs_schema_union,
        "events_trailing_1h": q_events_trailing_1h,
        "nation_part_margin": q_nation_part_margin,
        "regional_market_share": q_regional_market_share,
        "host_lang_mix": q_host_lang_mix,
        "charset_audit": q_charset_audit,
        "events_ipc_roundtrip": q_events_ipc_roundtrip,
        "late_order_priority": q_late_order_priority,
        "top_supplier_revenue": q_top_supplier_revenue,
        "disjunctive_brand_revenue": q_disjunctive_brand_revenue,
        "waiting_suppliers": q_waiting_suppliers,
        "kg_negative_edges": q_kg_negative_edges,
        "host_route_costs": q_host_route_costs,
        "kg_edge_timespan": q_kg_edge_timespan,
        "cust_order_distribution": q_cust_order_distribution,
        "small_qty_part_revenue": q_small_qty_part_revenue,
        "kg_incremental_edges": q_kg_incremental_edges,
        "events_burst_hours": q_events_burst_hours,
        "label_centroid_distances": q_label_centroid_distances,
        "kg_entity_cards": q_kg_entity_cards,
        "host_fetch_gaps": q_host_fetch_gaps,
        "user_value_gini": q_user_value_gini,
        "forecast_revenue_q6": q_forecast_revenue_q6,
        "orders_monthly_growth": q_orders_monthly_growth,
        "event_dwell_by_type": q_event_dwell_by_type,
        "embedding_quantize_int8": q_embedding_quantize_int8,
        "corpus_clean_survivors": q_corpus_clean_survivors,
        "rrf_fusion": q_rrf_fusion,
        "minhash_cluster_sizes": q_minhash_cluster_sizes,
        "order_first_ship_latency": q_order_first_ship_latency,
        "user_rfm_segments": q_user_rfm_segments,
        "doc_segment_dedup": q_doc_segment_dedup,
        "nation_trade_volume": q_nation_trade_volume,
        "wealthy_inactive_customers": q_wealthy_inactive_customers,
        "user_interarrival": q_user_interarrival,
        "user_customer_overlap": q_user_customer_overlap,
        "events_hourly_dense": q_events_hourly_dense,
        "label_embedding_centroid": q_label_embedding_centroid,
        "top_terms_per_lang": q_top_terms_per_lang,
        "docs_above_median_chars": q_docs_above_median_chars,
        "event_props_k_stats": q_event_props_k_stats,
        "top_orders_per_status": q_top_orders_per_status,
        "lineitem_europe_semi": q_lineitem_europe_semi,
        "doc_keywords": q_doc_keywords,
        "frequent_part_pairs": q_frequent_part_pairs,
        "session_stats": q_session_stats,
        "user_value_outliers": q_user_value_outliers,
        "events_running_total": q_events_running_total,
        "distinct_users_hll": q_distinct_users_hll,
        "large_order_customers": q_large_order_customers,
        "promo_revenue_ppm": q_promo_revenue_ppm,
        "brand_supplier_counts": q_brand_supplier_counts,
        "events_csv_roundtrip": q_events_csv_roundtrip,
        "docs_partitioned_roundtrip": q_docs_partitioned_roundtrip,
        "personalized_pagerank": q_personalized_pagerank,
        "cocitation_topk": q_cocitation_topk,
        "host_reciprocity": q_host_reciprocity,
        "token_rarity_hist": q_token_rarity_hist,
        "source_mirror_overlap": q_source_mirror_overlap,
        "returned_revenue_topk": q_returned_revenue_topk,
        "fk_orphan_audit": q_fk_orphan_audit,
        "term_postings": q_term_postings,
        "media_frame_index": q_media_frame_index,
        "user_value_decayed": q_user_value_decayed,
        "link_k_core": q_link_k_core,
        "event_seq_numbers": q_event_seq_numbers,
        "lineitem_profile": q_lineitem_profile,
        "custkey_overlap_kmv": q_custkey_overlap_kmv,
        "user_event_history": q_user_event_history,
        "order_price_histogram": q_order_price_histogram,
        "user_snapshot_applied": q_user_snapshot_applied,
        "lineitem_exact_median": q_lineitem_exact_median,
        "event_pairs_banded": q_event_pairs_banded,
        "user_median_value": q_user_median_value,
        "event_session_ids": q_event_session_ids,
        "doc_negative_samples": q_doc_negative_samples,
        "customer_golden_records": q_customer_golden_records,
        "trending_terms": q_trending_terms,
        "local_supplier_volume": q_local_supplier_volume,
        "user_order_join_skew": q_user_order_join_skew,
        "host_crawl_budget": q_host_crawl_budget,
        "user_value_mad": q_user_value_mad,
        "priority_revenue_share": q_priority_revenue_share,
        "degree_distribution": q_degree_distribution,
        "source_dup_rates": q_source_dup_rates,
        "bfs_hops": q_bfs_hops,
        "doc_chunks": q_doc_chunks,
        "event_funnel": q_event_funnel,
        "weekly_retention": q_weekly_retention,
        "dup_substring_stats": q_dup_substring_stats,
        "latest_event_per_user": q_latest_event_per_user,
        "user_value_diff": q_user_value_diff,
        "events_debounced": q_events_debounced,
        "lineitem_pareto": q_lineitem_pareto,
        "customers_inactive": q_customers_inactive,
        "top_building_orders": q_top_building_orders,
        "embedding_kmeans": q_embedding_kmeans,
        "user_event_pivot": q_user_event_pivot,
        "user_top_event_type": q_user_top_event_type,
        "events_value_delta": q_events_value_delta,
        "event_transitions": q_event_transitions,
        "embedding_moments": q_embedding_moments,
        "sliding_distinct_users": q_sliding_distinct_users,
        "events_type_hour_rollup": q_events_type_hour_rollup,
        "order_price_ntile": q_order_price_ntile,
        "events_jsonl_roundtrip": q_events_jsonl_roundtrip,
        "orders_zorder_files": q_orders_zorder_files,
        "bm25_topk": q_bm25_topk,
        "kg_inferred_country": q_kg_inferred_country,
        "host_link_components": q_host_link_components,
        "distinct_users_per_type": q_distinct_users_per_type,
        "customer_name_near_dup": q_customer_name_near_dup,
        "top_collocations": q_top_collocations,
        "hits": q_hits,
        "link_triangles": q_link_triangles,
        "docs_weighted_sample": q_docs_weighted_sample,
        # -- driver-checked green in at least one prior round
        "kg_mention_offset_audit": q_kg_mention_offset_audit,
        "kg_qid_profile": q_kg_qid_profile,
        "supplier_part_markup": q_supplier_part_markup,
        "events_benford_digits": q_events_benford_digits,
        "user_type_diversity": q_user_type_diversity,
        "cms_error_report": q_cms_error_report,
        "kg_pred_pair_counts": q_kg_pred_pair_counts,
        "link_assortativity_stats": q_link_assortativity_stats,
        "orderkey_islands": q_orderkey_islands,
        "kg_orphan_nodes": q_kg_orphan_nodes,
        "kg_entity_alias_recall": q_kg_entity_alias_recall,
        "embedding_norm_topk": q_embedding_norm_topk,
        "orders_octile_revenue": q_orders_octile_revenue,
        "dedup_normalized_docs": q_dedup_normalized_docs,
        "host_mention_density": q_host_mention_density,
        "events_peak_5min": q_events_peak_5min,
        "part_pair_lift": q_part_pair_lift,
        "hub_clustering_coeffs": q_hub_clustering_coeffs,
        "kg_edges_sort_audit": q_kg_edges_sort_audit,
        "ner_span_length_profile": q_ner_span_length_profile,
        "orders_backlog_timeseries": q_orders_backlog_timeseries,
        "new_users_daily": q_new_users_daily,
        "retrieval_rank_agreement": q_retrieval_rank_agreement,
        "kg_functional_violations": q_kg_functional_violations,
        "orders_range_bounds": q_orders_range_bounds,
        "orders_partition_checksums": q_orders_partition_checksums,
        "event_value_var_by_type": q_event_value_var_by_type,
        "lineitem_weighted_median": q_lineitem_weighted_median,
        "docs_with_all_terms": q_docs_with_all_terms,
        "event_type_lag_corr": q_event_type_lag_corr,
        "doc_lang_confusion": q_doc_lang_confusion,
        "kg_node_degree_profile": q_kg_node_degree_profile,
        "kg_triple_pr_report": q_kg_triple_pr_report,
        "min_cost_supplier": q_min_cost_supplier,
        "part_value_share": q_part_value_share,
        "excess_part_suppliers": q_excess_part_suppliers,
        "event_type_trend_slopes": q_event_type_trend_slopes,
        "user_coverage_time": q_user_coverage_time,
        "link_avg_neighbor_degree": q_link_avg_neighbor_degree,
        "ann_recall_report": q_ann_recall_report,
        "order_pareto_by_status": q_order_pareto_by_status,
        "phrase_match_counts": q_phrase_match_counts,
        "session_type_pairs": q_session_type_pairs,
        "orders_weekday_profile": q_orders_weekday_profile,
        "kg_edge_trend": q_kg_edge_trend,
        "link_communities": q_link_communities,
        "events_nearest_order": q_events_nearest_order,
        "lineitem_corr_stats": q_lineitem_corr_stats,
        "user_activity_span": q_user_activity_span,
        "kg_two_hop_paths": q_kg_two_hop_paths,
        "distinct_users_kmv": q_distinct_users_kmv,
        "train_test_split": q_train_test_split,
        "order_lineitem_join": q_order_lineitem_join,
        "events_asof_order": q_events_asof_order,
        "events_in_order_window": q_events_in_order_window,
        "orders_by_nation": q_orders_by_nation,
        "lineitem_pricing": q_lineitem_pricing,
        "kg_extracted_text": q_kg_extracted_text,
        "kg_triples": q_kg_triples,
        "kg_edges": q_kg_edges,
        "kg_mentions_by_label": q_kg_mentions_by_label,
        "kg_nodes": q_kg_nodes,
        "kg_cooccurrence": q_kg_cooccurrence,
        "kg_top_cooccurring": q_kg_top_cooccurring,
        "page_links": q_page_links,
        "pagerank": q_pagerank,
        "anchor_texts": q_anchor_texts,
        "host_links": q_host_links,
        "host_stats": q_host_stats,
        "minhash_clusters": q_minhash_clusters,
        "minhash_dedup_keep": q_minhash_dedup_keep,
        "leakage_safe_split": q_leakage_safe_split,
        "tfidf_topk": q_tfidf_topk,
        "cms_term_counts": q_cms_term_counts,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ngram_contamination": q_ngram_contamination,
        "pii_redact": q_pii_redact,
        "repetition_stats": q_repetition_stats,
        "dataset_mixture": q_dataset_mixture,
        "sequence_packing": q_sequence_packing,
        "global_shuffle": q_global_shuffle,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "embedding_dup_components": q_embedding_dup_components,
        "events_sliding_3h": q_events_sliding_3h,
        "events_rolling_value": q_events_rolling_value,
        "events_by_type_salted": q_events_by_type_salted,
        "docs_sample_by_lang": q_docs_sample_by_lang,
        "order_price_quantiles": q_order_price_quantiles,
        "price_quantiles_by_status": q_price_quantiles_by_status,
        "term_doc_frequency": q_term_doc_frequency,
        "doc_stats_by_lang": q_doc_stats_by_lang,
        "dedup_exact_docs": q_dedup_exact_docs,
        "doc_fingerprints": q_doc_fingerprints,
        "token_counts": q_token_counts,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "media_byte_stats": q_media_byte_stats,
        "events_hourly": q_events_hourly,
        "event_sessions": q_event_sessions,
        "max_order_by_cust": q_max_order_by_cust,
        "distinct_event_types": q_distinct_event_types,
        "top_users_by_value": q_top_users_by_value,
    }


_STOP_SQL = "('the','and','of','a','to','in','is','it','for','on','with')"
# trim pinned to the SAME RE2 expression the Ray stages use
# (stages/text_analysis._TRIM_RE) — DuckDB trim() strips spaces only and
# diverges on tab/newline-edged text
_TRIM_SQL = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"


def _lsh_planes(bits: int) -> np.ndarray:
    return LshBucketer(_LSH_DIM, bits=bits, seed=_LSH_SEED).planes


def _bit_exprs(planes: np.ndarray, emb: str = "embedding") -> list[str]:
    """One 0/1 sign-bit expression per hyperplane, with the plane values
    as SQL literals — float64 repr round-trips, and the sign of a
    64-term inner product is far from the float32/float64 noise floor
    (verified: 100% sign agreement numpy vs DuckDB on the testdata)."""
    out = []
    for k in range(planes.shape[1]):
        lit = "[" + ",".join(repr(float(x)) for x in planes[:, k]) + "]"
        out.append(
            f"CASE WHEN list_inner_product({emb}, {lit}) > 0 THEN 1 ELSE 0 END AS b{k}"
        )
    return out


def _lang_id_sql() -> str:
    """SQL transcription of stages.text_analysis.LangId — both sides use
    RE2 regex semantics and integer arithmetic, so the heuristic is
    exactly oracle-checkable."""
    from gliner_cpp_ray.stages.text_analysis import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    hit_cols = []
    for lang in langs:
        words = ",".join("'" + w + "'" for w in sorted(_LANG_PROFILES[lang]))
        hit_cols.append(
            "len(list_filter(string_split_regex(lower(sample), '\\s+'), "
            f"x -> x IN ({words}))) AS h_{lang}"
        )
    maxh = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    # strict-> over sorted langs == first (lexically smallest) argmax
    pick = " ".join(
        f"WHEN h_{lang} = {maxh} THEN '{lang}'" for lang in langs
    )
    return (
        "WITH s AS (SELECT doc_id, substr(text, 1, 2000) AS sample FROM documents), "
        "h AS (SELECT doc_id, "
        "length(regexp_replace(sample, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk, "
        "greatest(1, length(sample)) AS slen, "
        + ", ".join(hit_cols)
        + " FROM s) "
        "SELECT doc_id, CASE WHEN 5 * cjk > slen THEN 'zh' "
        f"WHEN {maxh} = 0 THEN 'und' {pick} END AS pred_lang FROM h"
    )


# exact brute-force top-10 — shared by the ann_topk oracle and the
# ann_recall_report oracle (which embeds it as a subquery)
_ANN_TOPK_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
    "FROM embeddings WHERE vec_id < 8), "
    "s AS (SELECT q.query_id, e.vec_id, "
    "list_cosine_similarity(e.embedding, q.qe) AS score "
    "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id) "
    "SELECT query_id, rank, vec_id FROM ("
    "SELECT query_id, vec_id, row_number() OVER "
    "(PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank FROM s) "
    "WHERE rank <= 10"
)


def _ann_lsh_sql() -> str:
    planes = _lsh_planes(_ANN_BITS)
    bits = ", ".join(_bit_exprs(planes))
    ham = " + ".join(
        f"CASE WHEN e.b{k} <> q.b{k} THEN 1 ELSE 0 END"
        for k in range(_ANN_BITS)
    )
    return (
        f"WITH bits AS (SELECT vec_id, embedding, {bits} FROM embeddings), "
        "q AS (SELECT * FROM bits WHERE vec_id < 8), "
        "s AS (SELECT q.vec_id AS query_id, e.vec_id, "
        "list_cosine_similarity(e.embedding, q.embedding) AS score, "
        f"({ham}) AS ham "
        "FROM bits e, q WHERE e.vec_id <> q.vec_id) "
        "SELECT query_id, rank, vec_id FROM ("
        "SELECT query_id, vec_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank "
        f"FROM s WHERE ham <= {_ANN_MAX_HAMMING}) WHERE rank <= 10"
    )


def _ann_ivf_sql() -> str:
    """Oracle for the IVF path: the deterministically-trained centroids
    appear as literals; assignment (argmin distance, lowest cell on
    ties), probe selection (3 nearest cells per query) and in-cell
    cosine top-k are all plain SQL over them."""
    cent = _ivf_centroids()
    n = cent.shape[0]
    dists = ", ".join(
        "list_distance(embedding, ["
        + ",".join(repr(float(v)) for v in cent[c])
        + f"]) AS d{c}"
        for c in range(n)
    )
    least = "least(" + ",".join(f"d{c}" for c in range(n)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{c} = m THEN {c}" for c in range(n))
        + " END"
    )
    qd = " UNION ALL ".join(
        f"SELECT vec_id AS query_id, {c} AS cell, d{c} AS dist "
        f"FROM mm WHERE vec_id < 8"
        for c in range(n)
    )
    return (
        f"WITH d AS (SELECT vec_id, embedding, {dists} FROM embeddings), "
        f"mm AS (SELECT *, {least} AS m FROM d), "
        f"cells AS (SELECT vec_id, embedding, {case} AS cell FROM mm), "
        f"qd AS ({qd}), "
        "qcells AS (SELECT query_id, cell FROM ("
        "SELECT query_id, cell, row_number() OVER "
        "(PARTITION BY query_id ORDER BY dist, cell) AS rn FROM qd) "
        f"WHERE rn <= {_IVF_PROBE}), "
        "q AS (SELECT vec_id AS query_id, embedding AS qe "
        "FROM embeddings WHERE vec_id < 8), "
        "s AS (SELECT qc.query_id, e.vec_id, "
        "list_cosine_similarity(e.embedding, q.qe) AS score "
        "FROM cells e JOIN qcells qc ON e.cell = qc.cell "
        "JOIN q ON q.query_id = qc.query_id "
        "WHERE e.vec_id <> qc.query_id) "
        "SELECT query_id, rank, vec_id FROM ("
        "SELECT query_id, vec_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank "
        "FROM s) WHERE rank <= 10"
    )


def _near_dup_lsh_sql() -> str:
    planes = _lsh_planes(_NDUP_BITS)
    bits = ", ".join(_bit_exprs(planes))
    band_bits = _NDUP_BITS // _NDUP_BANDS
    bands = " OR ".join(
        "("
        + " AND ".join(
            f"x.b{b * band_bits + k} = y.b{b * band_bits + k}"
            for k in range(band_bits)
        )
        + ")"
        for b in range(_NDUP_BANDS)
    )
    return (
        f"WITH bits AS (SELECT vec_id, embedding, {bits} FROM embeddings) "
        "SELECT x.vec_id AS a, y.vec_id AS b "
        "FROM bits x JOIN bits y ON x.vec_id < y.vec_id "
        "WHERE list_cosine_similarity(x.embedding, y.embedding) > 0.4 "
        f"AND ({bands})"
    )


def _signer_perm_values() -> str:
    """The default signer's (p, a, b) permutation constants as a SQL
    VALUES literal — the seeded rng makes both sides see the same
    universal-hash family."""
    signer = MinHashSigner()
    return ", ".join(
        f"({p}, {int(a)}, {int(b)})"
        for p, (a, b) in enumerate(zip(signer.a, signer.b))
    )


def _ngram_jaccard_sql(threshold: float = 0.5) -> str:
    """Literal SQL replica of the exact n-gram-Jaccard pipeline
    (stages/dedup.py:ngram_jaccard_pairs), n = 3:

    * tokens: ``string_split_regex(text, '[\\t\\n\\f\\r ]+')`` with
      empties dropped — the pinned RE2 ``\\s`` class, matching the Ray
      stage's tokenizer exactly (NOT Python ``str.split``);
    * word trigrams by positional self-join (< 3 tokens -> one gram of
      all tokens joined; 0 tokens -> sentinel hash 0);
    * gram hash: md5-u60, DISTINCT per doc;
    * candidates: the same Mersenne-31 MinHash signature family over
      the gram hashes, 16 band keys, collided buckets, flood cap 64 —
      the CTE chain mirrors ``_minhash_sql``;
    * verification: EXACT Jaccard from intersection/union counts of
      the hashed gram sets (both sides do correctly-rounded double
      division of the same integers -> bit-identical jaccard).
    """
    vals = _signer_perm_values()
    signer = MinHashSigner()
    rpb = signer.rows_per_band
    return (
        "WITH lst AS (SELECT doc_id, list_filter("
        "string_split_regex(text, '[\\t\\n\\f\\r ]+'), x -> x <> '') AS l "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(l) AS w, "
        "unnest(range(len(l))) AS i FROM lst), "
        "g AS (SELECT doc_id, array_to_string(l, ' ') AS g FROM lst "
        "WHERE len(l) >= 1 AND len(l) < 3 "
        "UNION ALL SELECT t1.doc_id, concat(t1.w, ' ', t2.w, ' ', t3.w) "
        "FROM tok t1 "
        "JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 "
        "JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2), "
        "gh AS (SELECT DISTINCT doc_id, CAST(concat('0x', "
        "substr(md5(g), 1, 15)) AS UBIGINT) AS x FROM g "
        "UNION SELECT doc_id, 0 FROM lst WHERE len(l) = 0), "
        "perm AS (SELECT p, CAST(a AS UBIGINT) AS a, CAST(b AS UBIGINT) AS b "
        f"FROM (VALUES {vals}) AS t(p, a, b)), "
        "mins AS (SELECT doc_id, p, "
        "min((a * (x % 2147483647) + b) % 2147483647) AS mh "
        "FROM gh CROSS JOIN perm GROUP BY doc_id, p), "
        f"bkey AS (SELECT doc_id, p // {rpb} AS band, "
        "CAST(concat('0x', substr(md5(string_agg(CAST(mh AS VARCHAR), ',' "
        "ORDER BY p)), 1, 15)) AS BIGINT) AS key "
        f"FROM mins GROUP BY doc_id, p // {rpb}), "
        "sized AS (SELECT band, key, doc_id, "
        "count(*) OVER (PARTITION BY band, key) AS n, "
        "min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bkey), "
        "cand AS (SELECT DISTINCT a, b FROM ("
        "SELECT x.doc_id AS a, y.doc_id AS b FROM sized x JOIN sized y "
        "ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id "
        "AND x.n <= 64 "
        "UNION ALL SELECT mn, doc_id FROM sized WHERE n > 64 AND doc_id <> mn)), "
        "sz AS (SELECT doc_id, count(*) AS s FROM gh GROUP BY doc_id), "
        "inter AS (SELECT c.a, c.b, count(*) AS i FROM cand c "
        "JOIN gh x ON x.doc_id = c.a "
        "JOIN gh y ON y.doc_id = c.b AND y.x = x.x GROUP BY c.a, c.b) "
        "SELECT i.a, i.b, CAST(i.i AS DOUBLE) / (sa.s + sb.s - i.i) "
        "AS jaccard FROM inter i "
        "JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b "
        f"WHERE CAST(i.i AS DOUBLE) / (sa.s + sb.s - i.i) >= {threshold}"
    )


def _contamination_sql(train_pct: int = 80) -> str:
    """Literal SQL replica of stages/dedup.py:ngram_contamination —
    the SAME gram-hash CTE chain as ``_ngram_jaccard_sql`` (pinned RE2
    tokenizer, word trigrams, md5-u60 DISTINCT per doc, sentinel 0 for
    empty docs) plus the md5 train/test split predicate, a distinct
    train-gram set, and a per-test-doc hit count."""
    from gliner_cpp_ray.stages.skew import split_threshold_hex

    th = split_threshold_hex(train_pct)
    return (
        "WITH lst AS (SELECT doc_id, list_filter("
        "string_split_regex(text, '[\\t\\n\\f\\r ]+'), x -> x <> '') AS l "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(l) AS w, "
        "unnest(range(len(l))) AS i FROM lst), "
        "g AS (SELECT doc_id, array_to_string(l, ' ') AS g FROM lst "
        "WHERE len(l) >= 1 AND len(l) < 3 "
        "UNION ALL SELECT t1.doc_id, concat(t1.w, ' ', t2.w, ' ', t3.w) "
        "FROM tok t1 "
        "JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 "
        "JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2), "
        "gh AS (SELECT DISTINCT doc_id, CAST(concat('0x', "
        "substr(md5(g), 1, 15)) AS UBIGINT) AS x FROM g "
        "UNION SELECT doc_id, 0 FROM lst WHERE len(l) = 0), "
        "sp AS (SELECT doc_id, "
        f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{th}' AS is_train "
        "FROM documents), "
        "tr AS (SELECT DISTINCT x FROM gh JOIN sp USING (doc_id) "
        "WHERE is_train), "
        "te AS (SELECT gh.doc_id, gh.x FROM gh JOIN sp USING (doc_id) "
        "WHERE NOT is_train), "
        "tot AS (SELECT doc_id, count(*) AS n_grams FROM te GROUP BY doc_id), "
        "hit AS (SELECT te.doc_id, count(*) AS n_contaminated "
        "FROM te JOIN tr USING (x) GROUP BY te.doc_id) "
        "SELECT tot.doc_id, CAST(tot.n_grams AS BIGINT) AS n_grams, "
        "CAST(coalesce(hit.n_contaminated, 0) AS BIGINT) AS n_contaminated "
        "FROM tot LEFT JOIN hit USING (doc_id)"
    )


def _pii_sql() -> str:
    """SQL replica of stages/text_analysis.pii_redact over the
    deterministically PII-injected text (``_PII_SUFFIX_SQL``) — both
    engines compile the identical RE2 patterns, so counts and the
    redacted bytes agree exactly."""
    from gliner_cpp_ray.stages.text_analysis import PII_PATTERNS

    count_cols = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return (
        f"WITH inj AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text "
        "FROM documents) "
        f"SELECT doc_id, {count_cols}, {red} AS redacted FROM inj"
    )


def _mixture_sql() -> str:
    """SQL replica of stages/skew.dataset_mixture at ``_MIXTURE_RATES``:
    per-source md5-threshold keep predicate (TRUE/FALSE for the
    >=100 / <=0 rates — see dataset_mixture's docstring on why 100 is
    not a hex threshold), then kept-count per source."""
    from gliner_cpp_ray.stages.skew import split_threshold_hex

    def pred(pct: int) -> str:
        if pct >= 100:
            return "TRUE"
        if pct <= 0:
            return "FALSE"
        th = split_threshold_hex(pct)
        return f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{th}'"

    whens = " ".join(
        f"WHEN '{s}' THEN {pred(p)}"
        for s, p in sorted(_MIXTURE_RATES.items())
    )
    return (
        "SELECT lang, count(*) AS n_kept FROM documents "
        f"WHERE CASE lang {whens} ELSE {pred(0)} END "
        "GROUP BY lang"
    )


def _minhash_sql() -> str:
    """Literal SQL replica of the WHOLE MinHash+LSH clustering pipeline
    (stages/dedup.py:minhash_dedup_clusters), made possible because
    every step of the signer's hash chain is SQL-expressible:

    * byte 5-shingles via ``hex(encode(text))`` windows parsed as
      UBIGINT — identical to the numpy big-endian pack (shingle DEDUP
      is skipped: min over a multiset equals min over its set);
    * the universal family ``(a*(x mod p) + b) mod p`` over the
      Mersenne prime p = 2^31-1, the signer's a/b constants inlined as
      VALUES literals (seeded rng, so both sides see the same family);
    * 16 band keys: md5-u60 (first 15 hex digits — int64-safe, so the
      shuffled key column never degrades to pickled objects in Ray) of
      the comma-joined decimal 4-row chunks (``string_agg(... ORDER BY
      p)``);
    * collided-bucket prefilter (window count >= 2 is implied by the
      pair join), flood cap 64 (min-id star pairing), signature-
      similarity verify at threshold 0.8 (64 perms make exactly-0.8
      unreachable, so >= is tie-free), and the union-find component
      map as a recursive-CTE min-label fixpoint with identity fallback
      for unpaired docs.
    """
    signer = MinHashSigner()
    vals = _signer_perm_values()
    rpb = signer.rows_per_band
    return (
        "WITH RECURSIVE "
        "hx AS (SELECT doc_id, hex(encode(text)) AS h, "
        "octet_length(encode(text)) AS L FROM documents), "
        "pos AS (SELECT doc_id, h, unnest(range(1, L - 3)) AS i "
        "FROM hx WHERE L >= 5), "
        "sh AS (SELECT doc_id, CAST(concat('0x', "
        "substr(h, CAST(2*i - 1 AS INTEGER), 10)) AS UBIGINT) AS x FROM pos "
        "UNION ALL SELECT doc_id, CASE WHEN L = 0 THEN 0 "
        "ELSE CAST(concat('0x', h) AS UBIGINT) END FROM hx WHERE L < 5), "
        "perm AS (SELECT p, CAST(a AS UBIGINT) AS a, CAST(b AS UBIGINT) AS b "
        f"FROM (VALUES {vals}) AS t(p, a, b)), "
        "mins AS (SELECT doc_id, p, "
        "min((a * (x % 2147483647) + b) % 2147483647) AS mh "
        "FROM sh CROSS JOIN perm GROUP BY doc_id, p), "
        f"bkey AS (SELECT doc_id, p // {rpb} AS band, "
        "CAST(concat('0x', substr(md5(string_agg(CAST(mh AS VARCHAR), ',' "
        "ORDER BY p)), 1, 15)) AS BIGINT) AS key "
        f"FROM mins GROUP BY doc_id, p // {rpb}), "
        "sized AS (SELECT band, key, doc_id, "
        "count(*) OVER (PARTITION BY band, key) AS n, "
        "min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bkey), "
        "cand AS (SELECT DISTINCT a, b FROM ("
        "SELECT x.doc_id AS a, y.doc_id AS b FROM sized x JOIN sized y "
        "ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id "
        "AND x.n <= 64 "
        "UNION ALL SELECT mn, doc_id FROM sized WHERE n > 64 AND doc_id <> mn)), "
        "est AS (SELECT c.a, c.b, "
        "avg(CASE WHEN ma.mh = mb.mh THEN 1.0 ELSE 0.0 END) AS j "
        "FROM cand c JOIN mins ma ON ma.doc_id = c.a "
        "JOIN mins mb ON mb.doc_id = c.b AND mb.p = ma.p GROUP BY c.a, c.b), "
        "ver AS (SELECT a, b FROM est WHERE j >= 0.8), "
        "adj AS (SELECT a AS node, b AS nbr FROM ver "
        "UNION ALL SELECT b, a FROM ver), "
        "nodes AS (SELECT DISTINCT node FROM adj), "
        "cc AS (SELECT node, node AS label FROM nodes "
        "UNION SELECT adj.node, cc.label FROM cc JOIN adj ON cc.node = adj.nbr), "
        "lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node) "
        "SELECT d.doc_id, CAST(coalesce(l.cluster, d.doc_id) AS BIGINT) "
        "AS cluster_id FROM documents d LEFT JOIN lab l ON d.doc_id = l.node"
    )


def _simhash_sql() -> str:
    """Literal SQL replica of the SimHash pipeline (stages/dedup.py):
    RE2-``\\s`` tokenization (empties dropped), md5-u64 word hash,
    per-OCCURRENCE ±1 votes per bit, signature bit k set iff the vote
    sum is positive, pairs kept iff Hamming <= 3 AND they share one of
    the four 16-bit bands (the bucketed candidate-generation semantics
    — redundant given pigeonhole at Hamming 3, but verified literally).
    Empty-token docs get signature 0 via the LEFT JOIN + NULL-vote-0."""
    accs = ", ".join(
        f"coalesce(sum(CASE WHEN hv IS NULL THEN 0 "
        f"WHEN (hv >> {k}) & 1 = 1 THEN 1 ELSE -1 END), 0) AS a{k}"
        for k in range(64)
    )
    sim = " + ".join(
        f"CASE WHEN a{k} > 0 THEN CAST({1 << k} AS UBIGINT) "
        "ELSE CAST(0 AS UBIGINT) END"
        for k in range(64)
    )
    bands = " OR ".join(
        f"((x.sim >> {16 * b}) & 65535) = ((y.sim >> {16 * b}) & 65535)"
        for b in range(4)
    )
    return (
        "WITH toks AS (SELECT d.doc_id, x.tok AS w FROM documents d, "
        "unnest(list_filter(string_split_regex(d.text, '\\s+'), "
        "x -> x <> '')) AS x(tok)), "
        "h AS (SELECT doc_id, "
        "CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS hv "
        "FROM toks), "
        f"acc AS (SELECT d.doc_id, {accs} FROM documents d "
        "LEFT JOIN h USING (doc_id) GROUP BY d.doc_id), "
        f"sh AS (SELECT doc_id, {sim} AS sim FROM acc) "
        "SELECT x.doc_id AS a, y.doc_id AS b FROM sh x JOIN sh y "
        "ON x.doc_id < y.doc_id "
        "WHERE bit_count(xor(x.sim, y.sim)) <= 3 "
        f"AND ({bands})"
    )


def _dup_components_sql() -> str:
    """Connected components of the LSH near-dup pair graph via a
    recursive CTE: enumerate every label reachable from each node, keep
    the min — the SQL fixpoint equivalent of min-label propagation."""
    pairs = _near_dup_lsh_sql()
    return (
        "WITH RECURSIVE pairs AS (" + pairs + "), "
        "nodes AS (SELECT a AS node FROM pairs UNION SELECT b FROM pairs), "
        "adj AS (SELECT a AS node, b AS nbr FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "cc AS (SELECT node, node AS label FROM nodes "
        "UNION SELECT adj.node, cc.label FROM cc "
        "JOIN adj ON cc.node = adj.nbr) "
        "SELECT node, CAST(min(label) AS BIGINT) AS label "
        "FROM cc GROUP BY node"
    )


def _pagerank_sql(pages_glob: str, n_iters: int = 3,
                  seed_mod: int | None = None) -> str:
    """Literal transcription of stages/linkgraph.pagerank: exact-integer
    rank updates (micro-units, damping 17/20, floor division), unrolled
    ``n_iters`` times.  Bit-identical to the distributed result because
    both sides use only int64 floor arithmetic.  ``seed_mod`` set =
    personalized variant: seed mass/teleport only where
    ``id % seed_mod = 0`` (matching ``pagerank(seed_mod=...)``)."""
    if seed_mod is None:
        r0 = "CAST(1000000 AS BIGINT)"
        tele = "150000"
    else:
        r0 = (f"CAST(CASE WHEN id % {seed_mod} = 0 THEN 1000000 "
              "ELSE 0 END AS BIGINT)")
        tele = f"(CASE WHEN h.id % {seed_mod} = 0 THEN 150000 ELSE 0 END)"
    parts = [
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), ",
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), ",
        "edges AS (SELECT DISTINCT src, dst FROM links), ",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src), ",
        f"r0 AS (SELECT id, {r0} AS r FROM h), ",
    ]
    for k in range(1, n_iters + 1):
        parts.append(
            f"c{k} AS (SELECT e.dst AS id, "
            f"CAST(sum((r.r * 17) // (20 * d.deg)) AS BIGINT) AS c "
            f"FROM edges e JOIN r{k - 1} r ON r.id = e.src "
            "JOIN deg d ON d.src = e.src GROUP BY e.dst), "
        )
        parts.append(
            f"r{k} AS (SELECT h.id, CAST({tele} + coalesce(c.c, 0) AS BIGINT)"
            f" AS r FROM h LEFT JOIN c{k} c ON c.id = h.id), "
        )
    sql = "".join(parts).rstrip(", ")
    return sql + f" SELECT id AS node_id, r AS rank_micro FROM r{n_iters}"


def _label_prop_sql(pages_glob: str, n_rounds: int = 3) -> str:
    """Literal transcription of stages/graph.label_prop_communities:
    synchronous rounds unrolled as CTE triples (neighbor-label counts →
    deterministic top-1 pick with smallest-label tie-break → LEFT-join
    carry for isolated nodes)."""
    parts = [
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), ",
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), ",
        "edges AS (SELECT DISTINCT src, dst FROM links), ",
        "u0 AS (SELECT src AS tgt, dst AS nb FROM edges "
        "UNION SELECT dst, src FROM edges), ",
        "l0 AS (SELECT id AS node, id AS lab FROM h), ",
    ]
    for k in range(1, n_rounds + 1):
        parts.append(
            f"c{k} AS (SELECT u.tgt AS node, l.lab AS lab, count(*) AS n "
            f"FROM u0 u JOIN l{k - 1} l ON l.node = u.nb GROUP BY u.tgt, l.lab), "
        )
        parts.append(
            f"p{k} AS (SELECT node, lab FROM (SELECT node, lab, "
            "row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn "
            f"FROM c{k}) WHERE rn = 1), "
        )
        parts.append(
            f"l{k} AS (SELECT l.node, coalesce(p.lab, l.lab) AS lab "
            f"FROM l{k - 1} l LEFT JOIN p{k} p ON p.node = l.node), "
        )
    sql = "".join(parts).rstrip(", ")
    return sql + (
        f" SELECT node AS node_id, CAST(lab AS BIGINT) AS community "
        f"FROM l{n_rounds}"
    )


def _cocitation_sql(pages_glob: str, k: int = 3, deg_cap: int = 64) -> str:
    """Literal transcription of stages/linkgraph.cocitation_topk:
    distinct directed edges, hub cut at out-degree ``deg_cap``, pair
    counts over sources linking to both, symmetric emit, per-page
    top-k by (n_common desc, partner_id asc)."""
    return (
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), "
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
        "edges AS (SELECT DISTINCT src, dst FROM links), "
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src), "
        "el AS (SELECT e.src, e.dst FROM edges e "
        f"JOIN deg d ON d.src = e.src AND d.deg <= {deg_cap}), "
        "pairs AS (SELECT x.dst AS a, y.dst AS b, count(*) AS n "
        "FROM el x JOIN el y ON x.src = y.src AND x.dst < y.dst "
        "GROUP BY x.dst, y.dst), "
        "sym AS (SELECT a AS node_id, b AS partner_id, n FROM pairs "
        "UNION ALL SELECT b, a, n FROM pairs), "
        "rk AS (SELECT node_id, partner_id, CAST(n AS BIGINT) AS n_common, "
        "row_number() OVER (PARTITION BY node_id "
        "ORDER BY n DESC, partner_id) AS rn FROM sym) "
        f"SELECT node_id, partner_id, n_common FROM rk WHERE rn <= {k}"
    )


def _host_reciprocity_sql(pages_glob: str, n_hosts: int) -> str:
    """Literal transcription of stages/linkgraph.host_reciprocity over
    the host rollup (host = id % n_hosts, the corpus url scheme):
    distinct non-self host pairs, left join against the flip, exact
    integer micro-ratio."""
    return (
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), "
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
        f"eh AS (SELECT DISTINCT src % {n_hosts} AS sh, "
        f"dst % {n_hosts} AS dh FROM links "
        f"WHERE src % {n_hosts} <> dst % {n_hosts}), "
        "r AS (SELECT a.sh AS host_id, count(*) AS n_out, "
        "CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_rec FROM eh a LEFT JOIN eh b ON b.sh = a.dh AND b.dh = a.sh "
        "GROUP BY a.sh) "
        "SELECT host_id, CAST(n_out AS BIGINT) AS n_out_hosts, "
        "n_rec AS n_reciprocal, "
        "CAST(1000000 * n_rec // n_out AS BIGINT) AS recip_micro FROM r"
    )


def _hits_sql(pages_glob: str, n_iters: int = 2, scale_shift: int = 0) -> str:
    """Literal transcription of stages/linkgraph.hits_scores: exact-int
    HITS half-steps unrolled ``n_iters`` times — bit-identical to the
    distributed result (int64 sums, optional floor-division rescale)."""
    div = f" // {1 << scale_shift}" if scale_shift else ""
    parts = [
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), ",
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), ",
        "edges AS (SELECT DISTINCT src, dst FROM links), ",
        "h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS s FROM h), ",
    ]
    for k in range(1, n_iters + 1):
        parts.append(
            f"a{k}s AS (SELECT e.dst AS id, CAST(sum(x.s){div} AS BIGINT) AS s "
            f"FROM edges e JOIN h{k - 1} x ON x.id = e.src GROUP BY e.dst), "
        )
        parts.append(
            f"a{k} AS (SELECT h.id, CAST(coalesce(a.s, 0) AS BIGINT) AS s "
            f"FROM h LEFT JOIN a{k}s a ON a.id = h.id), "
        )
        parts.append(
            f"h{k}s AS (SELECT e.src AS id, CAST(sum(x.s){div} AS BIGINT) AS s "
            f"FROM edges e JOIN a{k} x ON x.id = e.dst GROUP BY e.src), "
        )
        parts.append(
            f"h{k} AS (SELECT h.id, CAST(coalesce(x.s, 0) AS BIGINT) AS s "
            f"FROM h LEFT JOIN h{k}s x ON x.id = h.id), "
        )
    sql = "".join(parts).rstrip(", ")
    return sql + (
        f" SELECT a.id AS node_id, a.s AS auth_micro, x.s AS hub_micro "
        f"FROM a{n_iters} a JOIN h{n_iters} x ON x.id = a.id"
    )


def _triangles_sql(pages_glob: str) -> str:
    """Literal transcription of stages/linkgraph.triangle_counts:
    undirected distinct edges, (degree, id)-ordered orientation (ties
    to the smaller id, i.e. ``deg_u <= deg_v`` since u < v), wedge
    self-join with ``dst_b < dst_c``, closing join on the same packed
    int64 key, one credit per triangle corner."""
    return (
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        f" AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), "
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
        "e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        "FROM links WHERE src <> dst), "
        "deg AS (SELECT node_id, count(*) AS deg FROM (SELECT u AS node_id "
        "FROM e0 UNION ALL SELECT v FROM e0) GROUP BY node_id), "
        "o AS (SELECT CASE WHEN du.deg <= dv.deg THEN e0.u ELSE e0.v END AS src, "
        "CASE WHEN du.deg <= dv.deg THEN e0.v ELSE e0.u END AS dst "
        "FROM e0 JOIN deg du ON du.node_id = e0.u "
        "JOIN deg dv ON dv.node_id = e0.v), "
        "w AS (SELECT o1.src AS a, o1.dst * 4294967296 + o2.dst AS k "
        "FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst), "
        "ek AS (SELECT u * 4294967296 + v AS k FROM e0), "
        "tri AS (SELECT w.a, w.k FROM w JOIN ek ON ek.k = w.k), "
        "cr AS (SELECT a AS node_id FROM tri UNION ALL "
        "SELECT k // 4294967296 FROM tri UNION ALL "
        "SELECT k % 4294967296 FROM tri) "
        "SELECT node_id, CAST(count(*) AS BIGINT) AS n_triangles "
        "FROM cr GROUP BY node_id"
    )


def _k_core_sql(pages_glob: str, k: int = 6, n_rounds: int = 2) -> str:
    """Literal transcription of stages/linkgraph.k_core_nodes: the same
    undirected-distinct edge CTE as the triangle oracle, then
    ``n_rounds`` unrolled peel levels (degree over the subgraph induced
    by the previous level's survivors, threshold at k)."""
    parts = [
        "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
        f"AS BIGINT) AS id, decode(html) AS s FROM read_parquet('{pages_glob}')), "
        "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
        "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
        "e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v "
        "FROM links WHERE src <> dst)"
    ]
    for r in range(1, n_rounds + 1):
        if r > 1:
            parts.append(
                f", e{r - 1} AS (SELECT u, v FROM e{r - 2} "
                f"WHERE u IN (SELECT node_id FROM s{r - 1}) "
                f"AND v IN (SELECT node_id FROM s{r - 1}))"
            )
        parts.append(
            f", d{r} AS (SELECT node_id, count(*) AS deg FROM "
            f"(SELECT u AS node_id FROM e{r - 1} "
            f"UNION ALL SELECT v FROM e{r - 1}) GROUP BY node_id)"
        )
        if r < n_rounds:
            parts.append(
                f", s{r} AS (SELECT node_id FROM d{r} WHERE deg >= {k})"
            )
    parts.append(
        f" SELECT node_id, CAST(deg AS BIGINT) AS deg FROM d{n_rounds} "
        f"WHERE deg >= {k}"
    )
    return "".join(parts)


def oracle_sql():
    # the KG oracles read the synthetic corpus parquet from /tmp — make
    # sure it exists even if the driver evaluates SQL before the query
    ensure_corpus(n_pages_for_sf(_SQL_SF), KG_SEED)
    return oracle_sql_for_corpus(_ORACLE_CORPUS)


def _sssp_sql(pages_glob: str, n_hosts: int, rounds: int = 4) -> str:
    """Unrolled Bellman-Ford over the host link graph: d_k(v) =
    min(d_{k-1}(v), min over edges (u,v) of d_{k-1}(u) + w) — matches
    weighted_sssp's frontier-pruned plan exactly (the pruning is a
    physical optimization, not a semantic one)."""
    seeds = ", ".join(str(h) for h in range(0, n_hosts, 50))
    parts = [
        "WITH h AS (SELECT url, decode(html) AS s FROM "
        f"read_parquet('{pages_glob}')), "
        "l AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
        " AS src_id, CAST(u AS BIGINT) AS dst_id "
        "FROM h, unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1))"
        " AS t(u)), "
        f"e AS (SELECT src_id % {n_hosts} AS u, dst_id % {n_hosts} AS v, "
        "count(*) AS n FROM l GROUP BY u, v), "
        "w AS (SELECT u, v, 1000000 // (1 + n) AS w FROM e), "
        f"d0 AS (SELECT unnest([{seeds}]) AS host, 0 AS dist)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f", d{k} AS (SELECT host, min(dist) AS dist FROM ("
            f"SELECT host, dist FROM d{k - 1} UNION ALL "
            f"SELECT w.v AS host, d{k - 1}.dist + w.w AS dist "
            f"FROM d{k - 1} JOIN w ON w.u = d{k - 1}.host) GROUP BY host)"
        )
    parts.append(
        f" SELECT CAST(host AS BIGINT) AS host, CAST(dist AS BIGINT) AS dist"
        f" FROM d{rounds}"
    )
    return "".join(parts)


def _alias_recall_sql(mentions_glob: str) -> str:
    """Oracle for kg_entity_alias_recall: the unambiguous alias
    dictionary inlines as VALUES (same derivation as the Ray side and
    the ambiguity report's oracle); the only corpus-sized input is the
    distinct-mentions scan."""
    from gliner_cpp_ray.sources import world
    from gliner_cpp_ray.sources.pages import is_ambiguous_surface

    rows, seen = [], set()
    for lbl, entries in sorted(world.all_surfaces().items()):
        for surface, canon, _qid in entries:
            if (surface, lbl) in seen or is_ambiguous_surface(surface, lbl):
                continue
            seen.add((surface, lbl))
            esc_s = surface.replace("'", "''")
            esc_c = canon.replace("'", "''")
            rows.append(f"('{esc_s}', '{lbl}', '{esc_c}')")
    vals = ", ".join(sorted(rows))
    return (
        f"WITH al(surface, label, canon_id) AS (VALUES {vals}), "
        "kn AS (SELECT label, canon_id, count(DISTINCT surface) "
        "AS n_known FROM al GROUP BY 1, 2), "
        "sp AS (SELECT DISTINCT mm.text, mm.label "
        f"FROM read_parquet('{mentions_glob}') mm), "
        "sn AS (SELECT a.label, a.canon_id, "
        "count(DISTINCT a.surface) AS n_seen FROM sp JOIN al a "
        "ON a.surface = sp.text AND a.label = sp.label GROUP BY 1, 2) "
        "SELECT kn.label, kn.canon_id, "
        "CAST(kn.n_known AS BIGINT) AS n_known, "
        "CAST(coalesce(sn.n_seen, 0) AS BIGINT) AS n_seen, "
        "CAST(coalesce(sn.n_seen, 0) * 1000000 // kn.n_known AS BIGINT) "
        "AS coverage_ppm FROM kn LEFT JOIN sn "
        "ON sn.label = kn.label AND sn.canon_id = kn.canon_id"
    )


def _ambiguous_sql(mentions_glob: str) -> str:
    """Oracle for kg_ambiguous_surfaces: the ambiguous (surface, label)
    set is ontology-bounded and derives deterministically from the SAME
    alias dictionary the pipeline's linker uses, so it inlines as
    VALUES literals — the SQL needs no access to the linker."""
    from gliner_cpp_ray.sources import world
    from gliner_cpp_ray.sources.pages import is_ambiguous_surface

    rows, seen = [], set()
    for lbl, entries in sorted(world.all_surfaces().items()):
        for surface, _canon, _qid in entries:
            if (surface, lbl) in seen or not is_ambiguous_surface(surface, lbl):
                continue
            seen.add((surface, lbl))
            esc = surface.replace("'", "''")
            norm = world.normalize_surface(surface).replace("'", "''")
            rows.append(f"('{esc}', '{lbl}', '{norm}')")
    vals = ", ".join(sorted(rows))
    return (
        f"WITH amb(text, label, surface) AS (VALUES {vals}), "
        "m AS (SELECT mm.doc_id, a.surface, a.label "
        f"FROM read_parquet('{mentions_glob}') mm "
        "JOIN amb a ON mm.text = a.text AND mm.label = a.label) "
        "SELECT surface, label, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_mentions "
        "FROM m GROUP BY surface, label"
    )


def _content_drift_sql(pages_glob: str, n_hosts: int, n_pages: int) -> str:
    """Literal twin of q_host_content_drift: same (host, crawl-half)
    cells, the SimHash vote/majority semantics of _simhash_sql applied
    per CELL instead of per document, Hamming histogram out."""
    accs = ", ".join(
        f"sum(CASE WHEN (hv >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS a{k}"
        for k in range(64)
    )
    sim = " + ".join(
        f"CASE WHEN a{k} > 0 THEN CAST({1 << k} AS UBIGINT) "
        "ELSE CAST(0 AS UBIGINT) END"
        for k in range(64)
    )
    return (
        "WITH p AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
        f"AS BIGINT) AS pid, text FROM read_parquet('{pages_glob}')), "
        f"c AS (SELECT pid % {n_hosts} AS host, "
        f"CASE WHEN pid * 2 >= {n_pages} THEN 1 ELSE 0 END AS half, "
        "text FROM p), "
        "toks AS (SELECT host, half, x.tok AS w FROM c, "
        "unnest(list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '')) AS x(tok)), "
        "h AS (SELECT host, half, "
        "CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS hv "
        "FROM toks), "
        f"acc AS (SELECT host, half, {accs} FROM h GROUP BY 1, 2), "
        f"sh AS (SELECT host, half, {sim} AS sim FROM acc), "
        "d AS (SELECT e.host, bit_count(xor(e.sim, l.sim)) AS dist "
        "FROM sh e JOIN sh l ON e.host = l.host "
        "AND e.half = 0 AND l.half = 1) "
        "SELECT CAST(dist AS BIGINT) AS hamming, "
        "CAST(count(*) AS BIGINT) AS n_hosts FROM d GROUP BY 1"
    )


def _corpus_n_pages(corpus_dir: str) -> int:
    """Page count of a synthetic corpus dir, parsed from its
    ``n{pages}_s{seed}_g{gen}`` basename (sources/pages.py naming) —
    keeps corpus-parameterized oracles correct when tests reuse
    ``oracle_sql_for_corpus`` with a smaller corpus."""
    import re as _re

    m = _re.match(r"n(\d+)_", os.path.basename(corpus_dir))
    if not m:
        raise ValueError(f"unrecognized corpus dir name: {corpus_dir}")
    return int(m.group(1))


def oracle_sql_for_corpus(corpus_dir: str):
    """Oracle SQL keyed to a specific synthetic corpus directory (the
    public ``oracle_sql()`` uses the sf0.01 corpus the driver compares
    at; tests reuse this with a smaller corpus)."""
    pages_glob = os.path.join(corpus_dir, "pages", "*.parquet")
    expected_glob = os.path.join(corpus_dir, "expected_triples", "*.parquet")
    mentions_glob = os.path.join(corpus_dir, "expected_mentions", "*.parquet")
    endpoints_glob = os.path.join(corpus_dir, "expected_endpoints", "*.parquet")
    edges_glob = os.path.join(
        _kg_out(corpus_dir), "edges", "**", "*.parquet"
    )
    return {
        "kg_mention_offset_audit": (
            # the oracle pins 100% offset-exactness: any decoder offset
            # regression shows as a count mismatch on the Ray side
            "SELECT label, CAST(count(*) AS BIGINT) AS n_mentions, "
            "CAST(count(*) AS BIGINT) AS n_offset_exact "
            f"FROM read_parquet('{mentions_glob}') GROUP BY label"
        ),
        "kg_qid_profile": (
            "WITH e AS (SELECT pred, "
            "'Q_' || subj_label || '_' || "
            "replace(lower(subj_canon), ' ', '_') AS sq, "
            "'Q_' || obj_label || '_' || "
            "replace(lower(obj_canon), ' ', '_') AS oq "
            f"FROM read_parquet('{expected_glob}')) "
            "SELECT pred, CAST(count(*) AS BIGINT) AS n_triples, "
            "CAST(count(DISTINCT sq) AS BIGINT) AS n_subj_qids, "
            "CAST(count(DISTINCT oq) AS BIGINT) AS n_obj_qids "
            "FROM e GROUP BY pred"
        ),
        "supplier_part_markup": (
            "WITH li AS (SELECT l_suppkey, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) AS sale, "
            "CAST(floor(p_retailprice * 1000000) AS BIGINT) AS retail "
            "FROM lineitem JOIN part ON p_partkey = l_partkey), "
            "s AS (SELECT l_suppkey, count(*) AS n_lines, "
            "sum(sale) AS sale_micro, sum(retail) AS retail_micro "
            "FROM li GROUP BY 1) "
            "SELECT l_suppkey, CAST(n_lines AS BIGINT) AS n_lines, "
            "CAST(sale_micro AS BIGINT) AS sale_micro, "
            "CAST(retail_micro AS BIGINT) AS retail_micro, "
            "CAST(sale_micro * 1000000 // retail_micro AS BIGINT) "
            "AS markup_ppm FROM s"
        ),
        "events_benford_digits": (
            "SELECT substr(CAST(CAST(floor(value * 1000000) AS BIGINT) "
            "AS VARCHAR), 1, 1) AS digit, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1"
        ),
        "user_type_diversity": (
            "WITH d AS (SELECT user_id, "
            "count(DISTINCT event_type) AS n_types FROM events "
            "GROUP BY 1) "
            "SELECT CAST(n_types AS BIGINT) AS n_types, "
            "CAST(count(*) AS BIGINT) AS n_users FROM d GROUP BY 1"
        ),
        "cms_error_report": (
            f"WITH est AS ({_cms_sql()}), "
            f"tt AS (SELECT lower({_TRIM_SQL}) AS t FROM documents), "
            "lst AS (SELECT list_filter(string_split_regex(t, '\\s+'), "
            "x -> x <> '') AS l FROM tt), "
            "tok AS (SELECT unnest(l) AS w FROM lst), "
            "q AS (SELECT * FROM (VALUES "
            + ", ".join(f"('{t}')" for t in sorted(set(_CMS_TERMS)))
            + ") t(term)), "
            "ex AS (SELECT q.term, count(tok.w) AS exact_n FROM q "
            "LEFT JOIN tok ON tok.w = q.term GROUP BY 1) "
            "SELECT est.term, CAST(ex.exact_n AS BIGINT) AS exact_n, "
            "est.est_n, CAST(est.est_n - ex.exact_n AS BIGINT) AS over_n "
            "FROM est JOIN ex ON ex.term = est.term"
        ),
        "kg_pred_pair_counts": (
            "WITH e AS (SELECT DISTINCT subj_canon, pred "
            f"FROM read_parquet('{expected_glob}')), "
            "p AS (SELECT a.pred AS pred_a, c.pred AS pred_b, "
            "count(*) AS n FROM e a JOIN e c "
            "ON a.subj_canon = c.subj_canon AND a.pred < c.pred "
            "GROUP BY 1, 2) "
            "SELECT pred_a, pred_b, CAST(n AS BIGINT) AS n FROM p"
        ),
        "link_assortativity_stats": (
            "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS id, decode(html) AS s "
            f"FROM read_parquet('{pages_glob}')), "
            "l AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) "
            "AS t(u)), "
            "e AS (SELECT DISTINCT src, dst FROM l), "
            "deg AS (SELECT src AS node, count(*) AS deg FROM e "
            "GROUP BY 1), "
            "xy AS (SELECT coalesce(ds.deg, 0) AS x, "
            "coalesce(dd.deg, 0) AS y FROM e "
            "LEFT JOIN deg ds ON ds.node = e.src "
            "LEFT JOIN deg dd ON dd.node = e.dst) "
            "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(sum(x) AS VARCHAR) AS sum_x, "
            "CAST(sum(y) AS VARCHAR) AS sum_y, "
            "CAST(sum(x * y) AS VARCHAR) AS sum_xy, "
            "CAST(sum(x * x) AS VARCHAR) AS sum_xx, "
            "CAST(sum(y * y) AS VARCHAR) AS sum_yy FROM xy"
        ),
        "orderkey_islands": (
            "WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders "
            "WHERE o_orderstatus = 'F'), "
            "g AS (SELECT k, k - row_number() OVER (ORDER BY k) AS grp "
            "FROM k), "
            "i AS (SELECT count(*) AS len FROM g GROUP BY grp) "
            "SELECT CAST(len AS BIGINT) AS island_len, "
            "CAST(count(*) AS BIGINT) AS n_islands FROM i GROUP BY 1"
        ),
        "kg_orphan_nodes": (
            "WITH m AS (SELECT canon_mention AS canon_id, label "
            f"FROM read_parquet('{mentions_glob}')), "
            "e AS (SELECT canon_id, label "
            f"FROM read_parquet('{endpoints_glob}')), "
            "nodes AS (SELECT DISTINCT canon_id, label FROM ("
            "SELECT * FROM m UNION ALL SELECT * FROM e)), "
            "ep AS (SELECT subj_canon AS canon_id "
            f"FROM read_parquet('{expected_glob}') "
            "UNION SELECT obj_canon "
            f"FROM read_parquet('{expected_glob}')) "
            "SELECT label, CAST(count(*) AS BIGINT) AS n_nodes, "
            "CAST(sum(CASE WHEN canon_id NOT IN "
            "(SELECT canon_id FROM ep) THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_orphans FROM nodes GROUP BY label"
        ),
        "kg_entity_alias_recall": _alias_recall_sql(mentions_glob),
        "embedding_norm_topk": (
            "WITH ev AS (SELECT vec_id, "
            "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS x FROM embeddings), "
            "s AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) "
            "AS norm2_micro2 FROM ev GROUP BY 1) "
            "SELECT vec_id, norm2_micro2 FROM s "
            "ORDER BY norm2_micro2 DESC, vec_id LIMIT 10"
        ),
        "orders_octile_revenue": (
            "WITH t AS (SELECT "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS v "
            "FROM orders), "
            "c AS (SELECT count(*) AS n FROM t), "
            "o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r "
            "FROM t), "
            "ix(i) AS (VALUES (1), (2), (3), (4), (5), (6), (7)), "
            "bd AS (SELECT o.v AS b FROM ix JOIN o "
            "ON o.r = ix.i * (SELECT n FROM c) // 8) "
            "SELECT CAST((SELECT count(*) FROM bd WHERE b < t.v) "
            "AS BIGINT) AS band_idx, CAST(count(*) AS BIGINT) "
            "AS n_orders, CAST(sum(t.v) AS BIGINT) AS revenue_micro "
            "FROM t GROUP BY 1"
        ),
        "dedup_normalized_docs": (
            "WITH u AS (SELECT doc_id, text FROM documents "
            "UNION ALL SELECT doc_id + 1000000000, upper(text) || '  ' "
            "FROM documents WHERE doc_id % 10 = 0), "
            "n AS (SELECT doc_id, md5(regexp_replace("
            "regexp_replace(lower(text), '\\s+', ' ', 'g'), "
            "'^ | $', '', 'g')) AS norm_hash FROM u), "
            "g AS (SELECT norm_hash, min(doc_id) AS keeper_doc_id, "
            "count(*) AS n_docs FROM n GROUP BY 1) "
            "SELECT norm_hash, CAST(keeper_doc_id AS BIGINT) "
            "AS keeper_doc_id, CAST(n_docs AS BIGINT) AS n_docs "
            "FROM g WHERE n_docs >= 2"
        ),
        "host_mention_density": (
            "WITH p AS (SELECT "
            "regexp_extract(url, '^https://([^/]+)/', 1) AS host, "
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS t "
            f"FROM read_parquet('{pages_glob}') WHERE lang = 'en'), "
            "ph AS (SELECT host, count(*) AS n_docs, "
            "sum(CASE WHEN t = '' THEN 0 ELSE "
            "len(string_split_regex(t, '\\s+')) END) AS n_tokens "
            "FROM p GROUP BY 1), "
            "mh AS (SELECT "
            "regexp_extract(url, '^https://([^/]+)/', 1) AS host, "
            f"count(*) AS n_mentions FROM read_parquet('{mentions_glob}') "
            "GROUP BY 1) "
            "SELECT ph.host, CAST(ph.n_docs AS BIGINT) AS n_docs, "
            "CAST(ph.n_tokens AS BIGINT) AS n_tokens, "
            "CAST(coalesce(mh.n_mentions, 0) AS BIGINT) AS n_mentions, "
            "CAST(CASE WHEN ph.n_tokens > 0 THEN "
            "coalesce(mh.n_mentions, 0) * 1000000 // "
            "greatest(1, ph.n_tokens) ELSE 0 END AS BIGINT) "
            "AS density_ppm FROM ph LEFT JOIN mh USING (host)"
        ),
        "events_peak_5min": (
            "WITH e AS (SELECT epoch_us(ts) AS t FROM events), "
            "c AS (SELECT a.t AS anchor, count(*) AS n FROM e a "
            "JOIN e b ON b.t >= a.t AND b.t < a.t + 300000000 "
            "GROUP BY 1) "
            "SELECT CAST(anchor AS BIGINT) AS window_start_us, "
            "CAST(n AS BIGINT) AS n_events FROM c "
            "ORDER BY n DESC, anchor LIMIT 1"
        ),
        "part_pair_lift": (
            "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM b), "
            "pcount AS (SELECT l_partkey, count(*) AS c FROM b "
            "GROUP BY 1), "
            "p AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, "
            "count(*) AS n_ab FROM b a JOIN b c USING (l_orderkey) "
            "WHERE a.l_partkey < c.l_partkey GROUP BY 1, 2) "
            "SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST(n_ab * (SELECT n FROM nb) * 1000000 // (ca.c * cb.c) "
            "AS BIGINT) AS lift_ppm "
            "FROM p JOIN pcount ca ON ca.l_partkey = part_a "
            "JOIN pcount cb ON cb.l_partkey = part_b WHERE n_ab >= 2"
        ),
        "hub_clustering_coeffs": (
            "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS id, decode(html) AS s "
            f"FROM read_parquet('{pages_glob}')), "
            "l AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) "
            "AS t(u)), "
            "und AS (SELECT DISTINCT least(src, dst) AS a, "
            "greatest(src, dst) AS b FROM l WHERE src <> dst), "
            "deg AS (SELECT node, count(*) AS deg FROM ("
            "SELECT a AS node FROM und UNION ALL SELECT b AS node "
            "FROM und) GROUP BY 1), "
            "hubs AS (SELECT node, deg FROM deg "
            "ORDER BY deg DESC, node LIMIT 20), "
            "nbr AS (SELECT hb.node AS hub, CASE WHEN u.a = hb.node "
            "THEN u.b ELSE u.a END AS nb FROM hubs hb JOIN und u "
            "ON u.a = hb.node OR u.b = hb.node), "
            "closed AS (SELECT n1.hub, count(*) AS n_closed FROM nbr n1 "
            "JOIN nbr n2 ON n1.hub = n2.hub AND n1.nb < n2.nb "
            "JOIN und e ON e.a = n1.nb AND e.b = n2.nb GROUP BY 1) "
            "SELECT hb.node AS node_id, CAST(hb.deg AS BIGINT) AS deg, "
            "CAST(hb.deg * (hb.deg - 1) // 2 AS BIGINT) AS n_wedges, "
            "CAST(coalesce(c.n_closed, 0) AS BIGINT) AS n_closed "
            "FROM hubs hb LEFT JOIN closed c ON c.hub = hb.node"
        ),
        "kg_edges_sort_audit": (
            "WITH r AS (SELECT filename, file_row_number AS rn, "
            "subj_canon FROM read_parquet("
            f"'{edges_glob}', filename=true, file_row_number=true)), "
            "w AS (SELECT filename, subj_canon, lag(subj_canon) OVER ("
            "PARTITION BY filename ORDER BY rn) AS prev FROM r), "
            "f AS (SELECT filename, count(*) AS n_rows, "
            "min(subj_canon) AS mn, max(subj_canon) AS mx, "
            "min(CASE WHEN prev IS NULL OR subj_canon >= prev "
            "THEN 1 ELSE 0 END) AS is_sorted FROM w GROUP BY 1), "
            "o AS (SELECT row_number() OVER (ORDER BY filename) - 1 "
            "AS file_idx, n_rows, is_sorted, mn, "
            "coalesce(lag(mx) OVER (ORDER BY filename), '') AS pmx "
            "FROM f) "
            "SELECT CAST(file_idx AS BIGINT) AS file_idx, "
            "CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(is_sorted AS BIGINT) AS is_sorted, "
            "CAST(CASE WHEN mn >= pmx THEN 1 ELSE 0 END AS BIGINT) "
            "AS starts_after_prev FROM o"
        ),
        "ner_span_length_profile": (
            "SELECT label, "
            "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) "
            "AS n_words, CAST(count(*) AS BIGINT) AS n_mentions "
            f"FROM read_parquet('{mentions_glob}') "
            "GROUP BY 1, 2"
        ),
        "orders_backlog_timeseries": (
            "WITH s AS (SELECT l_orderkey, max(l_shipdate) AS last "
            "FROM lineitem GROUP BY 1), "
            "o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d0, "
            "epoch_us(last) // 86400000000 + 1 AS d1 FROM orders "
            "JOIN s ON l_orderkey = o_orderkey), "
            "b AS (SELECT d0 AS day, 1 AS delta FROM o "
            "UNION ALL SELECT d1, -1 FROM o), "
            "g AS (SELECT day, sum(delta) AS dn FROM b GROUP BY 1) "
            "SELECT CAST(day AS BIGINT) AS day, "
            "CAST(sum(dn) OVER (ORDER BY day) AS BIGINT) AS n_open FROM g"
        ),
        "new_users_daily": (
            "WITH f AS (SELECT user_id, "
            "min(epoch_us(ts) // 86400000000) AS day FROM events "
            "GROUP BY 1), "
            "d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1) "
            "SELECT CAST(day AS BIGINT) AS day, "
            "CAST(n_new AS BIGINT) AS n_new, "
            "CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users "
            "FROM d"
        ),
        "retrieval_rank_agreement": (
            f"WITH a AS ({_tfidf_sql()}), b AS ({_bm25_sql()}), "
            "c AS (SELECT a.doc_id, a.rank AS ra, b.rank AS rb "
            "FROM a JOIN b USING (doc_id)) "
            "SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_common, "
            "CAST((SELECT count(*) FROM c x JOIN c y "
            "ON x.doc_id < y.doc_id "
            "AND (x.ra - y.ra) * (x.rb - y.rb) > 0) AS BIGINT) "
            "AS concordant, "
            "CAST((SELECT count(*) FROM c x JOIN c y "
            "ON x.doc_id < y.doc_id "
            "AND (x.ra - y.ra) * (x.rb - y.rb) < 0) AS BIGINT) "
            "AS discordant"
        ),
        "kg_functional_violations": (
            "WITH e AS (SELECT DISTINCT subj_canon, pred, obj_canon "
            f"FROM read_parquet('{expected_glob}')), "
            "s AS (SELECT pred, subj_canon, count(*) AS n FROM e "
            "GROUP BY 1, 2) "
            "SELECT pred, CAST(count(*) AS BIGINT) AS n_subjects, "
            "CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_multi_obj FROM s GROUP BY pred"
        ),
        "orders_range_bounds": (
            "WITH t AS (SELECT "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS v "
            "FROM orders), "
            "c AS (SELECT count(*) AS n FROM t), "
            "o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r "
            "FROM t), "
            "ix(bound_idx) AS (VALUES (1), (2), (3), (4), (5), (6), (7)) "
            "SELECT CAST(ix.bound_idx AS BIGINT) AS bound_idx, "
            "CAST(o.r AS BIGINT) AS target_rank, CAST(o.v AS BIGINT) "
            "AS value FROM ix JOIN o "
            "ON o.r = ix.bound_idx * (SELECT n FROM c) // 8"
        ),
        "orders_partition_checksums": (
            "WITH t AS (SELECT o_orderkey // 4096 AS part_id, "
            "CAST(concat('0x', substr(md5(concat("
            "CAST(o_orderkey AS VARCHAR), '|', "
            "CAST(o_custkey AS VARCHAR), '|', o_orderstatus, '|', "
            "CAST(CAST(floor(o_totalprice * 1000000) AS BIGINT) "
            "AS VARCHAR), '|', CAST(epoch_us(o_orderdate) AS VARCHAR), "
            "'|', o_orderpriority)), 1, 15)) AS BIGINT) AS h "
            "FROM orders) "
            "SELECT CAST(part_id AS BIGINT) AS part_id, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(bit_xor(h) AS BIGINT) AS checksum FROM t GROUP BY 1"
        ),
        "event_value_var_by_type": (
            "WITH t AS (SELECT event_type, "
            "CAST(floor(value * 1000) AS BIGINT) AS v FROM events), "
            "s AS (SELECT event_type, count(*) AS n, sum(v) AS sv, "
            "sum(v * v) AS svv FROM t GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(sv AS BIGINT) AS sum_milli, "
            "CAST(n * svv - sv * sv AS VARCHAR) AS var_num FROM s"
        ),
        "lineitem_weighted_median": (
            "WITH t AS (SELECT "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) AS v, "
            "CAST(floor(l_quantity * 1000000) AS BIGINT) AS w "
            "FROM lineitem), "
            "s AS (SELECT sum(w) AS tw FROM t), "
            "c AS (SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM t) "
            "SELECT CAST(min(v) AS BIGINT) AS value, "
            "CAST((SELECT (tw + 1) // 2 FROM s) AS BIGINT) AS target_w, "
            "CAST((SELECT tw FROM s) AS BIGINT) AS total_w "
            "FROM c WHERE cw >= (SELECT (tw + 1) // 2 FROM s)"
        ),
        "docs_with_all_terms": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "toks AS (SELECT DISTINCT doc_id, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) AS x(tok) "
            "WHERE t <> ''), "
            "q(term) AS (VALUES ('customer'), ('merge'), ('scan')) "
            "SELECT doc_id FROM toks JOIN q USING (term) "
            "GROUP BY doc_id HAVING count(*) = 3"
        ),
        "event_type_lag_corr": (
            "WITH b AS (SELECT epoch_us(ts) // 3600000000 AS bucket, "
            "event_type FROM events "
            "WHERE event_type IN ('click', 'purchase')), "
            "r AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b), "
            "h AS (SELECT unnest(generate_series((SELECT lo FROM r), "
            "(SELECT hi FROM r))) AS bucket), "
            "ca AS (SELECT bucket, count(*) AS n FROM b "
            "WHERE event_type = 'click' GROUP BY 1), "
            "cb AS (SELECT bucket, count(*) AS n FROM b "
            "WHERE event_type = 'purchase' GROUP BY 1), "
            "xa AS (SELECT h.bucket - (SELECT lo FROM r) AS x, "
            "coalesce(ca.n, 0) AS na FROM h LEFT JOIN ca "
            "ON ca.bucket = h.bucket), "
            "xb AS (SELECT h.bucket - (SELECT lo FROM r) AS x, "
            "coalesce(cb.n, 0) AS nb FROM h LEFT JOIN cb "
            "ON cb.bucket = h.bucket), "
            "lags(lag_hours) AS (VALUES (0), (1), (2), (3)), "
            "j AS (SELECT l.lag_hours, xa.na, xb.nb FROM lags l "
            "JOIN xa ON TRUE JOIN xb ON xb.x = xa.x + l.lag_hours), "
            "s AS (SELECT lag_hours, count(*) AS n, sum(na) AS sa, "
            "sum(nb) AS sb, sum(na * nb) AS sab FROM j GROUP BY 1) "
            "SELECT CAST(lag_hours AS BIGINT) AS lag_hours, "
            "CAST(n AS BIGINT) AS n_hours, "
            "CAST(n * sab - sa * sb AS VARCHAR) AS cov_num FROM s"
        ),
        "doc_lang_confusion": (
            "SELECT d.lang, p.pred_lang, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM documents d "
            f"JOIN ({_lang_id_sql()}) p ON p.doc_id = d.doc_id "
            "GROUP BY 1, 2"
        ),
        "kg_node_degree_profile": (
            "WITH e AS (SELECT DISTINCT subj_canon, pred, obj_canon "
            f"FROM read_parquet('{expected_glob}')), "
            "outd AS (SELECT subj_canon AS node, count(*) AS out_deg, "
            "count(DISTINCT pred) AS n_preds_out FROM e GROUP BY 1), "
            "ind AS (SELECT obj_canon AS node, count(*) AS in_deg "
            "FROM e GROUP BY 1) "
            "SELECT coalesce(o.node, i.node) AS node, "
            "CAST(coalesce(o.out_deg, 0) AS BIGINT) AS out_deg, "
            "CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg, "
            "CAST(coalesce(o.n_preds_out, 0) AS BIGINT) AS n_preds_out "
            "FROM outd o FULL OUTER JOIN ind i ON i.node = o.node"
        ),
        "kg_triple_pr_report": (
            "SELECT pred, CAST(count(*) AS BIGINT) AS n_expected, "
            "CAST(count(*) AS BIGINT) AS n_emitted, "
            "CAST(count(*) AS BIGINT) AS n_matched, "
            "CAST(1000000 AS BIGINT) AS precision_ppm, "
            "CAST(1000000 AS BIGINT) AS recall_ppm "
            f"FROM read_parquet('{expected_glob}') GROUP BY pred"
        ),
        "min_cost_supplier": (
            "WITH eur AS (SELECT n_nationkey, n_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'), "
            "li AS (SELECT l_partkey, l_suppkey, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) * 1000000 // "
            "CAST(floor(l_quantity * 1000000) AS BIGINT) AS cost_ppm "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN eur ON n_nationkey = s_nationkey WHERE p_size = 15), "
            "m AS (SELECT l_partkey, min(cost_ppm) AS min_cost_ppm "
            "FROM li GROUP BY l_partkey), "
            "w AS (SELECT li.l_partkey AS p_partkey, m.min_cost_ppm, "
            "min(li.l_suppkey) AS s_suppkey FROM li JOIN m "
            "ON li.l_partkey = m.l_partkey AND li.cost_ppm = m.min_cost_ppm "
            "GROUP BY 1, 2) "
            "SELECT w.p_partkey, w.min_cost_ppm, w.s_suppkey, s.s_name, "
            "n.n_name FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey"
        ),
        "part_value_share": (
            "WITH pp AS (SELECT l_partkey, "
            "sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS v "
            "FROM lineitem GROUP BY l_partkey) "
            "SELECT l_partkey, CAST(v AS BIGINT) AS value_micro FROM pp "
            "WHERE v * (SELECT count(*) FROM pp) * 4 > "
            "5 * (SELECT sum(v) FROM pp)"
        ),
        "excess_part_suppliers": (
            "WITH li AS (SELECT l_partkey, l_suppkey, "
            "CAST(floor(l_quantity * 1000000) AS BIGINT) AS q FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01'), "
            "fine AS (SELECT l_partkey, l_suppkey, "
            "CAST(sum(q) AS BIGINT) AS supp_qty FROM li GROUP BY 1, 2), "
            "tot AS (SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) "
            "AS part_qty FROM fine GROUP BY 1), "
            "ex AS (SELECT f.l_suppkey AS s_suppkey FROM fine f "
            "JOIN tot t ON f.l_partkey = t.l_partkey "
            "WHERE f.supp_qty * 10 > t.part_qty * 3) "
            "SELECT e.s_suppkey, CAST(count(*) AS BIGINT) AS n_parts, "
            "s.s_name FROM ex e JOIN supplier s "
            "ON s.s_suppkey = e.s_suppkey GROUP BY 1, 3"
        ),
        "event_type_trend_slopes": (
            "WITH b AS (SELECT epoch_us(ts) // 3600000000 AS bucket, "
            "event_type FROM events), "
            "r AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b), "
            "grid AS (SELECT t.event_type, h.bucket FROM "
            "(SELECT DISTINCT event_type FROM b) t CROSS JOIN "
            "(SELECT unnest(generate_series((SELECT lo FROM r), "
            "(SELECT hi FROM r))) AS bucket) h), "
            "cnt AS (SELECT event_type, bucket, count(*) AS n FROM b "
            "GROUP BY 1, 2), "
            "y AS (SELECT g.event_type, g.bucket - (SELECT lo FROM r) AS x, "
            "coalesce(c.n, 0) AS n FROM grid g LEFT JOIN cnt c "
            "ON c.event_type = g.event_type AND c.bucket = g.bucket), "
            "s AS (SELECT event_type, count(*) AS nh, sum(x) AS sx, "
            "sum(x * x) AS sxx, sum(n) AS sy, sum(x * n) AS sxy FROM y "
            "GROUP BY 1) "
            "SELECT event_type, CAST(nh AS BIGINT) AS n_hours, "
            "CAST(nh * sxy - sx * sy AS VARCHAR) AS slope_num, "
            "CAST(nh * sxx - sx * sx AS VARCHAR) AS slope_den FROM s"
        ),
        "user_coverage_time": (
            "WITH ev AS (SELECT user_id, epoch_us(ts) AS s_us, "
            "epoch_us(ts) + 300000000 AS e_us FROM events), "
            "wv AS (SELECT user_id, s_us, e_us, max(e_us) OVER ("
            "PARTITION BY user_id ORDER BY s_us "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax "
            "FROM ev) "
            "SELECT user_id, CAST(sum(CASE WHEN pmax IS NULL "
            "OR pmax <= s_us THEN e_us - s_us ELSE e_us - pmax END) "
            "AS BIGINT) AS covered_us FROM wv GROUP BY user_id"
        ),
        "link_avg_neighbor_degree": (
            "WITH h AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS id, decode(html) AS s "
            f"FROM read_parquet('{pages_glob}')), "
            "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) "
            "AS t(u)), "
            "edges AS (SELECT DISTINCT src, dst FROM links), "
            "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src) "
            "SELECT e.src AS node_id, CAST(count(*) AS BIGINT) AS out_deg, "
            "CAST(sum(coalesce(d.deg, 0)) AS BIGINT) AS sum_nbr_out_deg, "
            "CAST(sum(coalesce(d.deg, 0)) * 1000000 // count(*) AS BIGINT) "
            "AS avg_nbr_deg_ppm "
            "FROM edges e LEFT JOIN deg d ON d.src = e.dst GROUP BY e.src"
        ),
        "ann_recall_report": (
            f"SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact, "
            "CAST(count(ap.vec_id) AS BIGINT) AS n_common, "
            "CAST(count(ap.vec_id) * 1000000 // count(*) AS BIGINT) "
            "AS recall_ppm "
            f"FROM ({_ANN_TOPK_SQL}) ex LEFT JOIN ({_ann_lsh_sql()}) ap "
            "ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id "
            "GROUP BY ex.query_id"
        ),
        "order_pareto_by_status": (
            "WITH t AS (SELECT o_orderstatus, o_orderkey, "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS price_micro, "
            "epoch_us(o_orderdate) AS odate_us FROM orders) "
            "SELECT o_orderstatus, o_orderkey, price_micro, "
            "CAST(odate_us AS BIGINT) AS odate_us FROM t p "
            "WHERE NOT EXISTS (SELECT 1 FROM t q "
            "WHERE q.o_orderstatus = p.o_orderstatus "
            "AND q.price_micro >= p.price_micro AND q.odate_us >= p.odate_us "
            "AND (q.price_micro > p.price_micro OR q.odate_us > p.odate_us))"
        ),
        "phrase_match_counts": (
            "WITH p(phrase) AS (VALUES "
            + ", ".join(f"('{p}')" for p in _PHRASES) + "), "
            "c AS (SELECT p.phrase, (length(d.text) - "
            "length(replace(d.text, p.phrase, ''))) // length(p.phrase) "
            "AS occ FROM documents d CROSS JOIN p) "
            "SELECT phrase, "
            "CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occurrences "
            "FROM c GROUP BY phrase"
        ),
        "session_type_pairs": (
            "WITH s AS (SELECT user_id, event_type, ts, event_id, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "l AS (SELECT user_id, event_type, sum(ns) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM s), "
            "d AS (SELECT DISTINCT user_id, sess, event_type FROM l), "
            "pr AS (SELECT a.event_type AS item_a, b.event_type AS item_b "
            "FROM d a JOIN d b ON a.user_id = b.user_id AND a.sess = b.sess "
            "AND a.event_type < b.event_type) "
            "SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM pr GROUP BY item_a, item_b"
        ),
        "orders_weekday_profile": (
            # weekday = (epoch_day + 4) mod 7, 0 = Monday — pure integer
            # arithmetic, no calendar function on either side
            "SELECT (epoch_us(o_orderdate) // 86400000000 + 4) % 7 "
            "AS weekday, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT)) "
            "AS BIGINT) AS revenue_micro FROM orders GROUP BY weekday"
        ),
        "kg_edge_trend": (
            "WITH m AS (SELECT (min(epoch_us(warc_ts)) + "
            "max(epoch_us(warc_ts))) // 2 AS mid "
            f"FROM read_parquet('{pages_glob}')) "
            "SELECT t.subj_canon, t.pred, t.obj_canon, "
            "CAST(count(*) AS BIGINT) AS weight, "
            "CAST(sum(CASE WHEN epoch_us(p.warc_ts) < (SELECT mid FROM m) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_early, "
            "CAST(sum(CASE WHEN epoch_us(p.warc_ts) < (SELECT mid FROM m) "
            "THEN 0 ELSE 1 END) AS BIGINT) AS n_late "
            f"FROM read_parquet('{expected_glob}') t "
            f"JOIN read_parquet('{pages_glob}') p USING (url) "
            "GROUP BY t.subj_canon, t.pred, t.obj_canon"
        ),
        "link_communities": _label_prop_sql(pages_glob),
        "events_nearest_order": (
            "WITH c AS (SELECT e.event_id, o.o_orderkey, o.o_orderpriority, "
            "abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS adt, "
            "row_number() OVER (PARTITION BY e.event_id ORDER BY "
            "abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)), "
            "CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END, "
            "o.o_orderkey DESC) AS rn "
            "FROM events e JOIN orders o ON o.o_custkey = e.user_id) "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey, "
            "CAST(sum(adt) AS BIGINT) AS sum_absdt_us "
            "FROM c WHERE rn = 1 GROUP BY o_orderpriority"
        ),
        "lineitem_corr_stats": (
            # HUGEINT cross terms emitted as VARCHAR: n*syy passes 2^63
            # at sf0.1; the Ray side finishes in Python unbounded ints
            "WITH b AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x, "
            "CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem), "
            "s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
            "sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM b) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(n*sxy - sx*sy AS VARCHAR) AS cov_num, "
            "CAST(n*sxx - sx*sx AS VARCHAR) AS var_x, "
            "CAST(n*syy - sy*sy AS VARCHAR) AS var_y FROM s"
        ),
        "user_activity_span": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_days, "
            "CAST(min(day) AS BIGINT) AS first_day, "
            "CAST(max(day) AS BIGINT) AS last_day FROM d GROUP BY user_id"
        ),
        "kg_two_hop_paths": (
            "WITH e AS (SELECT DISTINCT subj_canon AS s, obj_canon AS o "
            f"FROM read_parquet('{expected_glob}')) "
            "SELECT e1.s AS subj_canon, e2.o AS obj_canon, "
            "CAST(count(*) AS BIGINT) AS n_paths "
            "FROM e e1 JOIN e e2 ON e2.s = e1.o AND e1.s <> e2.o "
            "GROUP BY e1.s, e2.o"
        ),
        "event_value_quartile_by_type": (
            "SELECT event_type, event_id, "
            "CAST(ntile(4) OVER (PARTITION BY event_type "
            "ORDER BY CAST(floor(value * 1000000) AS BIGINT), event_id) "
            "AS BIGINT) AS tile FROM events"
        ),
        "doc_sentence_stats": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t, "
            "len(list_filter(regexp_split_to_array(text, '[.!?]+'), "
            "x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g') <> '')) AS ns, "
            "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(string_split_regex("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS nt "
            "FROM documents) "
            "SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences, "
            "CAST(nt AS BIGINT) AS n_tokens, "
            "CAST(CASE WHEN ns > 0 THEN nt * 1000000 // ns ELSE 0 END "
            "AS BIGINT) AS wps_ppm FROM tt"
        ),
        "event_type_trigrams": (
            "WITH o AS (SELECT event_type AS s0, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS s1, "
            "lead(event_type, 2) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS s2 FROM events), "
            "c AS (SELECT s0, s1, s2, CAST(count(*) AS BIGINT) AS n "
            "FROM o WHERE s2 IS NOT NULL GROUP BY s0, s1, s2) "
            "SELECT s0, s1, s2, n FROM c "
            "QUALIFY row_number() OVER (ORDER BY n DESC, s0, s1, s2) <= 20"
        ),
        "ship_priority_mix": (
            # Q12 shape: priority classification rides the join as 0/1
            # flags; the rollup is |linestatus|-bounded
            "SELECT l_linestatus, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_high, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS n_low "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY l_linestatus"
        ),
        "doc_run_length_stats": (
            # char runs without regex backreferences (RE2 lacks them):
            # run starts are positions whose char differs from the
            # previous; run length = next start - start.  length()/
            # substring() are codepoint-based, matching the Python side.
            "WITH st AS (SELECT d.doc_id, t.i AS s, "
            "lead(t.i) OVER (PARTITION BY d.doc_id ORDER BY t.i) AS nxt, "
            "length(d.text) AS len "
            "FROM documents d, unnest(generate_series(1, length(d.text))) "
            "AS t(i) WHERE t.i = 1 "
            "OR substring(d.text, t.i, 1) <> substring(d.text, t.i - 1, 1)), "
            "r AS (SELECT doc_id, count(*) AS n_runs, "
            "max(coalesce(nxt, len + 1) - s) AS max_run, any_value(len) AS len "
            "FROM st GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars, "
            "CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_runs, "
            "CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_run, "
            "CAST(CASE WHEN length(d.text) > 0 THEN "
            "coalesce(r.n_runs, 0) * 1000000 // length(d.text) "
            "ELSE 0 END AS BIGINT) AS run_ppm "
            "FROM documents d LEFT JOIN r USING (doc_id)"
        ),
        "ann_topk_filtered": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings WHERE vec_id < 8), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS score "
            "FROM embeddings e CROSS JOIN q "
            "WHERE e.label IN (0, 1, 2) AND e.vec_id <> q.query_id) "
            "SELECT query_id, rank, vec_id FROM ("
            "SELECT query_id, vec_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank FROM s) "
            "WHERE rank <= 10"
        ),
        "events_windowed_admitted": (
            # watermark = running event-time max over PRIOR arrivals
            # (ingestion order = event_id); admitted iff the hour's
            # close + 10 min lateness still beats it
            "WITH w AS (SELECT epoch_us(ts) AS ts_us, "
            "max(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events), "
            "c AS (SELECT ts_us // 3600000000 AS bucket, "
            "CASE WHEN wm IS NULL OR (ts_us // 3600000000 + 1) * 3600000000 "
            "+ 600000000 > wm THEN 1 ELSE 0 END AS adm FROM w) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(sum(adm) AS BIGINT) AS n_admitted, "
            "CAST(count(*) - sum(adm) AS BIGINT) AS n_dropped "
            "FROM c GROUP BY bucket"
        ),
        "host_pagerank_mass": (
            f"SELECT CAST(node_id % {_N_HOSTS} AS BIGINT) AS host, "
            "CAST(sum(rank_micro) AS BIGINT) AS rank_mass, "
            "CAST(count(*) AS BIGINT) AS n_pages "
            f"FROM ({_pagerank_sql(pages_glob)}) GROUP BY host"
        ),
        "doc_length_percentile": (
            "WITH r AS (SELECT doc_id, n_chars, "
            "row_number() OVER (ORDER BY n_chars, doc_id) AS rank, "
            "count(*) OVER () AS n FROM documents) "
            "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
            "CAST(rank AS BIGINT) AS rank, "
            "CAST(rank * 1000000 // n AS BIGINT) AS pct_ppm FROM r"
        ),
        "kg_extracted_text": (
            f"SELECT url, text FROM read_parquet('{pages_glob}')"
        ),
        "kg_triples": (
            f"SELECT doc_id, subj, pred, obj FROM read_parquet('{expected_glob}')"
        ),
        "kg_edges": (
            "SELECT subj_canon, pred, obj_canon, count(*) AS weight "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon"
        ),
        # deterministic per-label corrupted objects: positions are
        # row_number() within label ORDER BY canon_id; the probe is the
        # repo-wide md5-u60 idiom; a self-hit shifts +1 mod n_label
        "kg_negative_edges": (
            "WITH m AS (SELECT canon_mention AS canon_id, label "
            f"FROM read_parquet('{mentions_glob}')), "
            f"e0 AS (SELECT canon_id, label FROM read_parquet('{endpoints_glob}')), "
            "nodes AS (SELECT canon_id, label FROM "
            "(SELECT * FROM m UNION ALL SELECT * FROM e0) "
            "GROUP BY canon_id, label), "
            "pos AS (SELECT canon_id, label, "
            "row_number() OVER (PARTITION BY label ORDER BY canon_id) AS pos, "
            "count(*) OVER (PARTITION BY label) AS n_label FROM nodes), "
            "edges AS (SELECT subj_canon, pred, obj_canon "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon), "
            "pr AS (SELECT e.subj_canon, e.pred, e.obj_canon, p.label, "
            "p.pos AS obj_pos, p.n_label, "
            "CAST(concat('0x', substr(md5(concat(e.subj_canon, '|', "
            "e.pred, '|', e.obj_canon)), 1, 15)) AS BIGINT) % p.n_label "
            "AS tgt0 FROM edges e JOIN pos p ON p.canon_id = e.obj_canon), "
            "pr2 AS (SELECT subj_canon, pred, obj_canon, label, "
            "(CASE WHEN tgt0 = obj_pos - 1 THEN (tgt0 + 1) % n_label "
            "ELSE tgt0 END) + 1 AS tgt FROM pr) "
            "SELECT pr2.subj_canon, pr2.pred, pr2.obj_canon, "
            "p2.canon_id AS neg_obj_canon "
            "FROM pr2 JOIN pos p2 ON p2.label = pr2.label "
            "AND p2.pos = pr2.tgt"
        ),
        # temporal edges: the generator records one expected triple per
        # occurrence with its source url; pages carry the crawl time
        "kg_edge_timespan": (
            "SELECT t.subj_canon, t.pred, t.obj_canon, "
            "CAST(count(*) AS BIGINT) AS weight, "
            "CAST(min(epoch_us(p.warc_ts)) AS BIGINT) AS first_seen_us, "
            "CAST(max(epoch_us(p.warc_ts)) AS BIGINT) AS last_seen_us "
            f"FROM read_parquet('{expected_glob}') t "
            f"JOIN read_parquet('{pages_glob}') p USING (url) "
            "GROUP BY t.subj_canon, t.pred, t.obj_canon"
        ),
        # incremental base+delta ingest must equal the full recompute,
        # so its oracle IS the kg_edges closed form
        "kg_incremental_edges": (
            "SELECT subj_canon, pred, obj_canon, count(*) AS weight "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon"
        ),
        # closed-form mention/node oracles: the generator records every
        # injected mention occurrence (expected_mentions) and every
        # ambiguous context-resolved triple endpoint (expected_endpoints)
        # — see sources/pages.py MENTIONS_EXPECTED_SCHEMA.
        "kg_mentions_by_label": (
            "SELECT label, count(*) AS n_mentions "
            f"FROM read_parquet('{mentions_glob}') GROUP BY label"
        ),
        "kg_nodes": (
            # node mention_count = context-free mention attributions
            # (ambiguous surfaces collapse to their NIL surface cluster)
            # PLUS ambiguous-endpoint registrations from linked triples;
            # every canon carries exactly one label in this world, so
            # grouping by (canon_id, label) equals the pipeline's
            # modal-label reduce.
            "WITH m AS (SELECT canon_mention AS canon_id, label "
            f"FROM read_parquet('{mentions_glob}')), "
            f"e AS (SELECT canon_id, label FROM read_parquet('{endpoints_glob}')), "
            "u AS (SELECT * FROM m UNION ALL SELECT * FROM e) "
            "SELECT canon_id, label, count(*) AS mention_count "
            "FROM u GROUP BY canon_id, label"
        ),
        "kg_cooccurrence": (
            # context-free canon co-mentions: the generator's
            # expected_mentions records every injected occurrence with
            # its canon_mention, so distinct-per-doc + self-join is the
            # closed form of the pipeline's dedup + pair expansion
            "WITH m AS (SELECT DISTINCT doc_id, canon_mention AS canon_id "
            f"FROM read_parquet('{mentions_glob}')) "
            "SELECT a.canon_id AS canon_a, b.canon_id AS canon_b, "
            "count(*) AS n_docs "
            "FROM m a JOIN m b ON a.doc_id = b.doc_id "
            "AND a.canon_id < b.canon_id "
            "GROUP BY canon_a, canon_b"
        ),
        "kg_top_cooccurring": (
            # symmetrized C48 pair table + per-entity top-3 by doc
            # count, partner-name tie-break — exactly the Ray side's
            # grouped_top_k ordering (n_docs DESC, partner ASC)
            "WITH m AS (SELECT DISTINCT doc_id, canon_mention AS canon_id "
            f"FROM read_parquet('{mentions_glob}')), "
            "p AS (SELECT a.canon_id AS canon_a, b.canon_id AS canon_b, "
            "count(*) AS n_docs FROM m a JOIN m b ON a.doc_id = b.doc_id "
            "AND a.canon_id < b.canon_id GROUP BY canon_a, canon_b), "
            "s AS (SELECT canon_a AS entity, canon_b AS partner, n_docs FROM p "
            "UNION ALL SELECT canon_b, canon_a, n_docs FROM p) "
            "SELECT entity, partner, n_docs FROM ("
            "SELECT entity, partner, n_docs, row_number() OVER ("
            "PARTITION BY entity ORDER BY n_docs DESC, partner) AS rn FROM s"
            ") WHERE rn <= 3"
        ),
        "page_links": (
            # identical RE2 pattern to stages/linkgraph._PAGE_HREF; nav
            # links ("/", "/about") don't match and fall out on both sides
            "WITH h AS (SELECT url, decode(html) AS s FROM "
            f"read_parquet('{pages_glob}')), "
            "l AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
            " AS src_id, CAST(u AS BIGINT) AS dst_id "
            "FROM h, unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1))"
            " AS t(u)) "
            "SELECT src_id, dst_id, count(*) AS n FROM l GROUP BY src_id, dst_id"
        ),
        "pagerank": _pagerank_sql(pages_glob),
        "personalized_pagerank": _pagerank_sql(pages_glob, seed_mod=17),
        "cocitation_topk": _cocitation_sql(pages_glob),
        "host_reciprocity": _host_reciprocity_sql(pages_glob, _N_HOSTS),
        "host_link_components": (
            # intra-host edge filter is id arithmetic (host = id % N_HOSTS,
            # sources/pages.url_of); components via recursive reachability
            # closure + min-id per node — closure volume is bounded by
            # Σ |component|², tiny for host-local subgraphs
            "WITH RECURSIVE l AS ("
            "SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
            " AS src_id, CAST(u AS BIGINT) AS dst_id "
            f"FROM (SELECT url, decode(html) AS s FROM read_parquet('{pages_glob}')) h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
            "e AS (SELECT DISTINCT src_id, dst_id FROM l "
            f"WHERE src_id % {_N_HOSTS} = dst_id % {_N_HOSTS}), "
            "und AS (SELECT src_id a, dst_id b FROM e "
            "UNION SELECT dst_id, src_id FROM e), "
            "reach(a, b) AS (SELECT a, a FROM und UNION SELECT a, b FROM und "
            "UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a) "
            "SELECT a AS node_id, CAST(min(b) AS BIGINT) AS component "
            "FROM reach GROUP BY a"
        ),
        "kg_inferred_country": (
            # closed form over the generator's expected triples: canon
            # edges regrouped, location side (located_in ∪ capital_of)
            # composed onto city-valued entity edges
            "WITH e AS (SELECT subj_canon, pred, obj_canon, "
            "count(*) AS weight "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon), "
            "loc AS (SELECT subj_canon AS city, obj_canon AS country, "
            "CAST(sum(weight) AS BIGINT) AS w FROM e "
            "WHERE pred IN ('located_in', 'capital_of') "
            "GROUP BY subj_canon, obj_canon), "
            "ent AS (SELECT subj_canon, obj_canon AS city, weight FROM e "
            "WHERE pred IN ('headquartered_in', 'born_in')) "
            "SELECT ent.subj_canon, loc.country AS obj_canon, "
            "count(*) AS n_paths, "
            "CAST(sum(ent.weight * loc.w) AS BIGINT) AS support "
            "FROM ent JOIN loc USING (city) "
            "GROUP BY ent.subj_canon, loc.country"
        ),
        "hits": _hits_sql(pages_glob),
        "link_triangles": _triangles_sql(pages_glob),
        "link_k_core": _k_core_sql(pages_glob),
        "degree_distribution": (
            "WITH l AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS src, CAST(u AS BIGINT) AS dst "
            "FROM (SELECT url, decode(html) AS s "
            f"FROM read_parquet('{pages_glob}')) h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) "
            "AS t(u)), "
            "e AS (SELECT DISTINCT src, dst FROM l), "
            "d AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
            "n AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            f"AS BIGINT) AS node FROM read_parquet('{pages_glob}')), "
            "nd AS (SELECT coalesce(d.deg, 0) AS deg FROM n "
            "LEFT JOIN d ON d.src = n.node) "
            "SELECT CAST(deg AS BIGINT) AS deg, "
            "CAST(count(*) AS BIGINT) AS n_nodes FROM nd GROUP BY deg"
        ),
        "host_crawl_budget": (
            "WITH p AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            f"AS BIGINT) AS pid FROM read_parquet('{pages_glob}')), "
            f"h AS (SELECT pid, pid % {_N_HOSTS} AS host FROM p), "
            "r AS (SELECT host, pid, row_number() OVER ("
            "PARTITION BY host ORDER BY pid) AS seq, "
            "count(*) OVER (PARTITION BY host) AS n FROM h) "
            "SELECT host, pid, CAST(seq AS BIGINT) AS seq, "
            "CAST(n // 4 + 1 AS BIGINT) AS budget "
            "FROM r WHERE seq <= n // 4 + 1"
        ),
        "trending_terms": (
            "WITH tt AS (SELECT CAST(epoch_us(warc_ts) // 60000000 "
            f"AS VARCHAR) AS win, {_TRIM_SQL} AS t "
            f"FROM read_parquet('{pages_glob}')), "
            "toks AS (SELECT win, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) "
            "AS x(tok) WHERE t <> ''), "
            "c AS (SELECT win, term, CAST(count(*) AS BIGINT) AS n "
            "FROM toks GROUP BY win, term), "
            "r AS (SELECT *, row_number() OVER ("
            "PARTITION BY win ORDER BY n DESC, term) AS rn FROM c) "
            "SELECT win, term, n FROM r WHERE rn <= 5"
        ),
        "bfs_hops": (
            # recursive-CTE transcription of stages/graph.bfs_hop_distance
            "WITH RECURSIVE h AS (SELECT CAST(regexp_extract(url, "
            "'/p/(\\d+)$', 1) AS BIGINT) AS id, decode(html) AS s "
            f"FROM read_parquet('{pages_glob}')), "
            "links AS (SELECT id AS src, CAST(u AS BIGINT) AS dst FROM h, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1)) "
            "AS t(u)), "
            "edges AS (SELECT DISTINCT src, dst FROM links), "
            "seeds AS (SELECT id FROM h WHERE id % 101 = 0), "
            "bfs(node, dist) AS ("
            "SELECT id, CAST(0 AS BIGINT) FROM seeds "
            "UNION "
            "SELECT e.dst, b.dist + 1 FROM bfs b "
            "JOIN edges e ON e.src = b.node WHERE b.dist < 4) "
            "SELECT node AS node_id, CAST(min(dist) AS BIGINT) AS hops "
            "FROM bfs GROUP BY node"
        ),
        "doc_chunks": (
            # transcription of stages/packing.chunk_documents (w=64, s=48)
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "lst AS (SELECT doc_id, CASE WHEN t = '' THEN [] ELSE "
            "string_split_regex(t, '\\s+') END AS l FROM tt), "
            "meta AS (SELECT doc_id, l, len(l) AS nt, CASE WHEN len(l) = 0 "
            "THEN 0 ELSE 1 + (greatest(len(l) - 64, 0) + 47) // 48 END "
            "AS n_chunks FROM lst), "
            "ex AS (SELECT doc_id, l, nt, unnest(range(n_chunks)) AS i "
            "FROM meta) "
            "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
            "CAST(i * 48 AS BIGINT) AS start_tok, "
            "CAST(least(i * 48 + 64, nt) - i * 48 AS BIGINT) AS n_tok, "
            "array_to_string(l[i * 48 + 1 : least(i * 48 + 64, nt)], ' ') "
            "AS chunk_text FROM ex"
        ),
        "anchor_texts": (
            # DuckDB zips parallel unnests of the two capture-group lists
            "WITH h AS (SELECT decode(html) AS s FROM "
            f"read_parquet('{pages_glob}')), "
            "m AS (SELECT "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\">([^<]*)</a>', 1)) AS d, "
            "unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\">([^<]*)</a>', 2)) AS a "
            "FROM h), "
            "c AS (SELECT CAST(d AS BIGINT) AS dst_id, a AS anchor, "
            "count(*) AS n FROM m GROUP BY d, a) "
            "SELECT dst_id, anchor, n FROM (SELECT *, row_number() OVER ("
            "PARTITION BY dst_id ORDER BY n DESC, anchor) AS rn FROM c) "
            "WHERE rn = 1"
        ),
        "host_links": (
            "WITH h AS (SELECT url, decode(html) AS s FROM "
            f"read_parquet('{pages_glob}')), "
            "l AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)"
            " AS src_id, CAST(u AS BIGINT) AS dst_id "
            "FROM h, unnest(regexp_extract_all(s, 'href=\"[^\"]*/p/(\\d+)\"', 1))"
            " AS t(u)) "
            f"SELECT src_id % {_N_HOSTS} AS src_host, "
            f"dst_id % {_N_HOSTS} AS dst_host, count(*) AS n "
            "FROM l GROUP BY src_host, dst_host"
        ),
        "host_route_costs": _sssp_sql(pages_glob, _N_HOSTS),
        "host_stats": (
            "SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host, "
            "count(*) AS n_pages, "
            "CAST(sum(length(text)) AS BIGINT) AS total_chars "
            f"FROM read_parquet('{pages_glob}') GROUP BY host"
        ),
        "lang_id": _lang_id_sql(),
        "simhash_pairs": _simhash_sql(),
        "minhash_clusters": _minhash_sql(),
        "minhash_dedup_keep": (
            f"SELECT doc_id FROM ({_minhash_sql()}) t WHERE doc_id = cluster_id"
        ),
        "leakage_safe_split": _leakage_split_sql(),
        "tfidf_topk": _tfidf_sql(),
        "bm25_topk": _bm25_sql(),
        "customer_name_near_dup": (
            # all-pairs closed form; the Ray side's FastSS candidate
            # generation is complete for d=1, and levenshtein_leq is a
            # literal transcription of unit-cost levenshtein()
            "SELECT a.c_name AS name_a, b.c_name AS name_b "
            "FROM customer a JOIN customer b ON a.c_name < b.c_name "
            "AND levenshtein(a.c_name, b.c_name) <= 1"
        ),
        "cms_term_counts": _cms_sql(),
        "top_collocations": _collocations_sql(),
        "event_funnel": _funnel_sql(),
        "weekly_retention": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week "
            "FROM events), "
            "c AS (SELECT user_id, min(week) AS cohort_week FROM uw "
            "GROUP BY user_id) "
            "SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM uw JOIN c ON uw.user_id = c.user_id GROUP BY 1, 2"
        ),
        "dup_substring_stats": _dup_substring_sql(),
        "user_event_history": (
            "WITH r AS (SELECT user_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events_used, "
            "string_agg(event_type, ',' ORDER BY rn) AS history "
            "FROM r WHERE rn <= 8 GROUP BY user_id"
        ),
        "lineitem_profile": " UNION ALL ".join(
            "SELECT "
            f"'{c}' AS \"column\", "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
            f"CAST(floor(min({c}) * 1000000) AS BIGINT) AS min_v, "
            f"CAST(floor(max({c}) * 1000000) AS BIGINT) AS max_v "
            "FROM lineitem"
            for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
        "event_seq_numbers": (
            "SELECT event_id, CAST(row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS seq FROM events"
        ),
        "customer_golden_records": (
            # near-dup pairs (levenshtein, as customer_name_near_dup) →
            # recursive reachability closure → min-root clusters →
            # survivorship aggregates; singletons via LEFT JOIN coalesce
            "WITH RECURSIVE p AS (SELECT a.c_custkey AS ka, b.c_custkey "
            "AS kb FROM customer a JOIN customer b ON a.c_name < b.c_name "
            "AND levenshtein(a.c_name, b.c_name) <= 1 "
            "AND a.c_nationkey = b.c_nationkey), "
            "und AS (SELECT ka AS a, kb AS b FROM p "
            "UNION SELECT kb, ka FROM p), "
            "reach(a, b) AS (SELECT a, a FROM und "
            "UNION SELECT a, b FROM und "
            "UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a), "
            "lab AS (SELECT a AS k, min(b) AS root FROM reach GROUP BY a), "
            "f AS (SELECT coalesce(lab.root, c.c_custkey) AS cluster_id, "
            "c.c_name, CAST(floor(c.c_acctbal * 1000000) AS BIGINT) AS bal "
            "FROM customer c LEFT JOIN lab ON lab.k = c.c_custkey) "
            "SELECT CAST(cluster_id AS BIGINT) AS cluster_id, "
            "CAST(count(*) AS BIGINT) AS n_members, "
            "min(c_name) AS min_c_name, "
            "CAST(max(bal) AS BIGINT) AS max_acctbal_micro "
            "FROM f GROUP BY cluster_id"
        ),
        "doc_negative_samples": (
            "WITH r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) "
            "- 1 AS rnk FROM documents), "
            "n AS (SELECT count(*) AS cnt FROM r), "
            "p AS (SELECT doc_id, rnk, j, "
            "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), "
            "'#', CAST(j AS VARCHAR))), 1, 15)) AS BIGINT) "
            "% (SELECT cnt FROM n) AS tgt "
            "FROM r, (SELECT unnest(generate_series(0, 3)) AS j)), "
            "p2 AS (SELECT doc_id, CAST(j AS BIGINT) AS probe, "
            "CASE WHEN tgt = rnk THEN (tgt + 1) % (SELECT cnt FROM n) "
            "ELSE tgt END AS tgt FROM p) "
            "SELECT p2.doc_id, p2.probe, r2.doc_id AS neg_doc_id "
            "FROM p2 JOIN r r2 ON r2.rnk = p2.tgt"
        ),
        "event_session_ids": (
            "WITH o AS (SELECT event_id, user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) "
            f"> {_SESSION_GAP_US} THEN 1 ELSE 0 END AS ns FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, CAST(sum(ns) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS session_seq FROM o"
        ),
        "events_burst_hours": (
            "WITH b AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) "
            "AS bucket, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY bucket), "
            "med AS (SELECT n AS m FROM (SELECT n, row_number() OVER "
            "(ORDER BY n) AS rn, count(*) OVER () AS c FROM b) "
            "WHERE rn = (c + 1) // 2) "
            "SELECT bucket, n FROM b, med WHERE n > 2 * med.m"
        ),
        "label_centroid_distances": (
            "WITH q AS (SELECT label, generate_subscripts(embedding, 1) "
            "AS idx, unnest(embedding) AS x FROM embeddings), "
            "v AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(idx - 1 AS BIGINT) AS dim, "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq "
            "FROM q), "
            "a AS (SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s, "
            "CAST(count(*) AS BIGINT) AS n FROM v GROUP BY label, dim), "
            "c AS (SELECT label, dim, CAST(s // n AS BIGINT) AS c "
            "FROM a) "
            "SELECT x.label AS label_a, y.label AS label_b, "
            "CAST(sum((x.c - y.c) * (x.c - y.c)) AS BIGINT) "
            "AS sq_dist_micro2 "
            "FROM c x JOIN c y ON x.dim = y.dim AND x.label < y.label "
            "GROUP BY x.label, y.label"
        ),
        "kg_entity_cards": (
            "WITH m AS (SELECT DISTINCT doc_id, canon_mention AS canon_id "
            f"FROM read_parquet('{mentions_glob}')), "
            "base AS (SELECT canon_id AS entity, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM m GROUP BY canon_id), "
            "p AS (SELECT a.canon_id AS ca, b.canon_id AS cb, "
            "count(*) AS nd FROM m a JOIN m b ON a.doc_id = b.doc_id "
            "AND a.canon_id < b.canon_id GROUP BY ca, cb), "
            "s AS (SELECT ca AS entity, cb AS partner, nd FROM p "
            "UNION ALL SELECT cb, ca, nd FROM p), "
            "t AS (SELECT entity, partner, nd, row_number() OVER ("
            "PARTITION BY entity ORDER BY nd DESC, partner) AS rn FROM s) "
            "SELECT base.entity, base.n_docs, "
            "coalesce(t.partner, '') AS top_partner, "
            "CAST(coalesce(t.nd, 0) AS BIGINT) AS top_n_docs "
            "FROM base LEFT JOIN t ON t.entity = base.entity AND t.rn = 1"
        ),
        "host_fetch_gaps": (
            "WITH p AS (SELECT regexp_extract(url, '^https://([^/]+)/', 1) "
            "AS host, epoch_us(warc_ts) AS t, url "
            f"FROM read_parquet('{pages_glob}')), "
            "o AS (SELECT host, t, lag(t) OVER (PARTITION BY host "
            "ORDER BY t, url) AS pt FROM p), "
            "g AS (SELECT host, t - pt AS gap FROM o WHERE pt IS NOT NULL) "
            "SELECT host, CAST(count(*) AS BIGINT) AS n_gaps, "
            "CAST(min(gap) AS BIGINT) AS min_gap_us, "
            "CAST(max(gap) AS BIGINT) AS max_gap_us, "
            "CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us "
            "FROM g GROUP BY host"
        ),
        "user_value_gini": (
            "WITH u AS (SELECT user_id, CAST(sum(CAST(floor(value * "
            "1000000) AS BIGINT)) AS BIGINT) AS v FROM events "
            "GROUP BY user_id), "
            "r AS (SELECT v, CAST(row_number() OVER (ORDER BY v, user_id) "
            "AS BIGINT) AS rk, (SELECT count(*) FROM u) AS n FROM u) "
            "SELECT CAST(max(n) AS BIGINT) AS n_users, "
            "CAST(sum(v) AS BIGINT) AS total_micro, "
            "CAST(sum((2 * rk - n - 1) * v) AS BIGINT) AS gini_num_micro, "
            "CAST((1000000 * sum((2 * rk - n - 1) * v)) // "
            "(max(n) * sum(v)) AS BIGINT) AS gini_ppm FROM r"
        ),
        "forecast_revenue_q6": (
            "SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * 1000000) "
            "AS BIGINT) * CAST(floor(l_discount * 1000) AS BIGINT) // 1000), "
            "0) AS BIGINT) AS revenue_micro, "
            "CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND CAST(floor(l_discount * 1000) AS BIGINT) BETWEEN 10 AND 30 "
            "AND l_quantity < 24"
        ),
        "orders_monthly_growth": (
            "WITH m AS (SELECT CAST(year(o_orderdate) * 100 + "
            "month(o_orderdate) AS BIGINT) AS ym, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) "
            "SELECT ym, n_orders, CAST(coalesce(n_orders - "
            "lag(n_orders) OVER (ORDER BY ym), 0) AS BIGINT) AS delta "
            "FROM m"
        ),
        "event_dwell_by_type": (
            "WITH o AS (SELECT event_type, epoch_us(ts) AS t, "
            "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nt FROM events), "
            "d AS (SELECT event_type, nt - t AS g FROM o "
            "WHERE nt IS NOT NULL) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_dwells, "
            "CAST(sum(g) AS BIGINT) AS total_dwell_us, "
            "CAST(sum(g) // count(*) AS BIGINT) AS mean_dwell_us "
            "FROM d GROUP BY event_type"
        ),
        "embedding_quantize_int8": (
            "WITH v AS (SELECT vec_id, "
            "CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim, "
            "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS xq FROM embeddings), "
            "b AS (SELECT dim, min(xq) AS mn, max(xq) AS mx FROM v "
            "GROUP BY dim) "
            "SELECT v.vec_id, v.dim, CAST(CASE WHEN b.mx = b.mn THEN 0 "
            "ELSE ((v.xq - b.mn) * 254) // (b.mx - b.mn) - 127 END "
            "AS BIGINT) AS code FROM v JOIN b USING (dim)"
        ),
        "corpus_clean_survivors": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "tok AS (SELECT doc_id FROM tt WHERE t <> '' AND "
            "len(string_split_regex(t, '\\s+')) >= 5), "
            "ex AS (SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY md5(text)), "
            f"mh AS (SELECT doc_id FROM ({_minhash_sql()}) c "
            "WHERE doc_id = cluster_id) "
            "SELECT tok.doc_id FROM tok "
            "JOIN ex ON ex.doc_id = tok.doc_id "
            "JOIN mh ON mh.doc_id = tok.doc_id"
        ),
        "rrf_fusion": (
            f"WITH u AS (SELECT doc_id, 1000000 // (60 + rank) AS c "
            f"FROM ({_tfidf_sql()}) tf "
            f"UNION ALL SELECT doc_id, 1000000 // (60 + rank) "
            f"FROM ({_bm25_sql()}) bm) "
            "SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro "
            "FROM u GROUP BY doc_id"
        ),
        "minhash_cluster_sizes": (
            f"SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM "
            f"(SELECT cluster_id, CAST(count(*) AS BIGINT) AS size "
            f"FROM ({_minhash_sql()}) c GROUP BY cluster_id) s "
            "GROUP BY size"
        ),
        "order_first_ship_latency": (
            "WITH fs AS (SELECT l_orderkey, min(epoch_us(l_shipdate)) "
            "AS ship0 FROM lineitem GROUP BY l_orderkey) "
            "SELECT CAST((fs.ship0 - epoch_us(o.o_orderdate)) "
            "// 86400000000 AS BIGINT) AS latency_days, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM fs JOIN orders o ON o.o_orderkey = fs.l_orderkey "
            "GROUP BY 1"
        ),
        "user_rfm_segments": (
            "WITH u AS (SELECT user_id, "
            "CAST(max(epoch_us(ts)) AS BIGINT) AS rec, "
            "CAST(count(*) AS BIGINT) AS freq, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS mon FROM events GROUP BY user_id), "
            "t AS (SELECT user_id, "
            "CAST(ntile(4) OVER (ORDER BY rec, user_id) AS BIGINT) AS r_tile, "
            "CAST(ntile(4) OVER (ORDER BY freq, user_id) AS BIGINT) AS f_tile, "
            "CAST(ntile(4) OVER (ORDER BY mon, user_id) AS BIGINT) AS m_tile "
            "FROM u) "
            "SELECT user_id, r_tile, f_tile, m_tile, "
            "CAST(r_tile * 100 + f_tile * 10 + m_tile AS BIGINT) AS rfm_code "
            "FROM t"
        ),
        "doc_segment_dedup": (
            f"WITH tt AS (SELECT doc_id, lower({_TRIM_SQL}) AS t "
            "FROM documents), "
            "lst AS (SELECT doc_id, list_filter(string_split_regex(t, "
            "'\\s+'), x -> x <> '') AS l FROM tt), "
            "tok AS (SELECT doc_id, unnest(l) AS w, "
            "generate_subscripts(l, 1) AS idx FROM lst), "
            "seg AS (SELECT doc_id, (idx - 1) // 8 AS chunk, "
            "string_agg(w, ' ' ORDER BY idx) AS s "
            "FROM tok GROUP BY doc_id, chunk), "
            "hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) "
            "AS BIGINT) AS h FROM seg), "
            "pair AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_inst "
            "FROM hh GROUP BY doc_id, h), "
            "dq AS (SELECT h, count(*) AS ndocs FROM pair GROUP BY h), "
            "per AS (SELECT p.doc_id, CAST(sum(p.n_inst) AS BIGINT) "
            "AS n_segments, CAST(sum(CASE WHEN dq.ndocs >= 2 THEN p.n_inst "
            "ELSE 0 END) AS BIGINT) AS n_dup_segments "
            "FROM pair p JOIN dq USING (h) GROUP BY p.doc_id) "
            "SELECT doc_id, n_segments, n_dup_segments, "
            "CAST(n_dup_segments * 1000000 // n_segments AS BIGINT) "
            "AS dup_ppm FROM per"
        ),
        "nation_trade_volume": (
            "WITH supp AS (SELECT s_suppkey, n_name AS supp_nation "
            "FROM supplier JOIN nation ON n_nationkey = s_nationkey "
            "WHERE n_name IN ('NATION_12', 'NATION_19')), "
            "cust AS (SELECT c_custkey, n_name AS cust_nation "
            "FROM customer JOIN nation ON n_nationkey = c_nationkey "
            "WHERE n_name IN ('NATION_12', 'NATION_19')), "
            "li AS (SELECT l_orderkey, l_suppkey, "
            "CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' "
            "THEN 1997 ELSE 1996 END AS BIGINT) AS l_year, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) "
            "* (1000 - CAST(floor(l_discount * 1000) AS BIGINT)) // 1000 "
            "AS rev FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01') "
            "SELECT supp.supp_nation, cust.cust_nation, li.l_year, "
            "CAST(sum(li.rev) AS BIGINT) AS revenue_micro "
            "FROM li JOIN supp ON supp.s_suppkey = li.l_suppkey "
            "JOIN orders o ON o.o_orderkey = li.l_orderkey "
            "JOIN cust ON cust.c_custkey = o.o_custkey "
            "WHERE supp.supp_nation <> cust.cust_nation "
            "GROUP BY supp.supp_nation, cust.cust_nation, li.l_year"
        ),
        "wealthy_inactive_customers": (
            "WITH c AS (SELECT c_custkey, c_mktsegment, "
            "CAST(floor(c_acctbal * 1000000) AS BIGINT) AS bal_micro "
            "FROM customer), "
            "thr AS (SELECT CAST(sum(bal_micro) // count(*) AS BIGINT) "
            "AS t FROM c WHERE bal_micro > 0), "
            "rich AS (SELECT c.* FROM c, thr WHERE c.bal_micro > thr.t "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2000-01-01')) "
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs, "
            "CAST(sum(bal_micro) AS BIGINT) AS total_bal_micro "
            "FROM rich GROUP BY c_mktsegment"
        ),
        "user_interarrival": (
            "WITH o AS (SELECT user_id, epoch_us(ts) AS t, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pt FROM events), "
            "g AS (SELECT user_id, t - pt AS gap FROM o "
            "WHERE pt IS NOT NULL) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, "
            "CAST(min(gap) AS BIGINT) AS min_gap_us, "
            "CAST(max(gap) AS BIGINT) AS max_gap_us, "
            "CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us "
            "FROM g GROUP BY user_id"
        ),
        "user_customer_overlap": (
            "WITH u AS (SELECT DISTINCT user_id AS k FROM events), "
            "o AS (SELECT DISTINCT o_custkey AS k FROM orders), "
            "j AS (SELECT CASE WHEN u.k IS NULL THEN 0 ELSE 1 END AS lu, "
            "CASE WHEN o.k IS NULL THEN 0 ELSE 1 END AS lo "
            "FROM u FULL OUTER JOIN o ON u.k = o.k) "
            "SELECT CAST(sum(CASE WHEN lu = 1 AND lo = 0 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_events_only, "
            "CAST(sum(CASE WHEN lu = 0 AND lo = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_orders_only, "
            "CAST(sum(CASE WHEN lu = 1 AND lo = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_both FROM j"
        ),
        "events_hourly_dense": (
            "WITH b AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) "
            "AS bucket FROM events), "
            "r AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b), "
            "dense AS (SELECT unnest(generate_series(lo, hi)) AS bucket "
            "FROM r), "
            "c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket) "
            "SELECT dense.bucket, CAST(coalesce(c.n, 0) AS BIGINT) AS n "
            "FROM dense LEFT JOIN c USING (bucket)"
        ),
        "label_embedding_centroid": (
            "WITH q AS (SELECT label, generate_subscripts(embedding, 1) "
            "AS idx, unnest(embedding) AS x FROM embeddings), "
            "v AS (SELECT CAST(label AS BIGINT) AS label, "
            "CAST(idx - 1 AS BIGINT) AS dim, "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq "
            "FROM q), "
            "a AS (SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s, "
            "CAST(count(*) AS BIGINT) AS n FROM v GROUP BY label, dim) "
            "SELECT label, dim, CAST(s // n AS BIGINT) AS centroid_micro, "
            "n AS n_vecs FROM a"
        ),
        "doc_keywords": (
            f"WITH tt AS (SELECT doc_id, lower({_TRIM_SQL}) AS t "
            "FROM documents), "
            "lst AS (SELECT doc_id, list_filter(string_split_regex(t, "
            "'\\s+'), x -> x <> '') AS l FROM tt), "
            "tok AS (SELECT doc_id, unnest(l) AS w FROM lst), "
            "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok "
            "GROUP BY doc_id, w), "
            "dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok "
            "GROUP BY w), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "sc AS (SELECT tf.doc_id, tf.w AS term, "
            "CAST(tf.tf * ((1000000 * n.n) // dfq.df) AS BIGINT) "
            "AS score_micro FROM tf JOIN dfq USING (w) CROSS JOIN n), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score_micro DESC, term) AS rn FROM sc) "
            "SELECT doc_id, term, score_micro FROM r WHERE rn <= 3"
        ),
        "frequent_part_pairs": (
            "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "p AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, "
            "CAST(count(*) AS BIGINT) AS n FROM b a JOIN b c "
            "USING (l_orderkey) WHERE a.l_partkey < c.l_partkey "
            "GROUP BY part_a, part_b) "
            "SELECT part_a, part_b, n FROM p WHERE n >= 2"
        ),
        "session_stats": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
            "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), "
            "l AS (SELECT user_id, event_id, us, v, CASE WHEN "
            "lag(us) OVER w IS NULL OR us - lag(us) OVER w > "
            f"{_SESSION_STATS_GAP_US} THEN 1 ELSE 0 END AS new FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
            "s AS (SELECT *, sum(new) OVER (PARTITION BY user_id "
            "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) "
            "AS session_seq FROM l) "
            "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(v) AS BIGINT) AS sum_val, "
            "CAST(min(us) AS BIGINT) AS start_us, "
            "CAST(max(us) AS BIGINT) AS end_us "
            "FROM s GROUP BY user_id, session_seq"
        ),
        "user_value_outliers": (
            "WITH v AS (SELECT user_id, CAST(floor(value * 1000000) "
            "AS BIGINT) AS x FROM events), "
            "r1 AS (SELECT user_id, x, row_number() OVER ("
            "PARTITION BY user_id ORDER BY x) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS cnt FROM v), "
            "m1 AS (SELECT user_id, x AS median FROM r1 "
            "WHERE rn = (cnt - 1) // 2 + 1), "
            "d AS (SELECT v.user_id, v.x, abs(v.x - m1.median) AS dev, "
            "m1.median FROM v JOIN m1 USING (user_id)), "
            "r2 AS (SELECT user_id, dev, row_number() OVER ("
            "PARTITION BY user_id ORDER BY dev) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS cnt FROM d), "
            "m2 AS (SELECT user_id, dev AS mad FROM r2 "
            "WHERE rn = (cnt - 1) // 2 + 1) "
            "SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CASE WHEN abs(d.x - d.median) > 3 * m2.mad "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
            "FROM d JOIN m2 USING (user_id) GROUP BY d.user_id"
        ),
        "events_running_total": (
            "SELECT event_id, CAST(sum(CAST(floor(value * 1000000) "
            "AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_total_micro "
            "FROM events"
        ),
        "distinct_users_hll": (
            # HLL transcription: 60-bit md5 hash, top 4 bits index one
            # of 16 registers, rho = 57 - bitlength(56-bit remainder)
            # (57 when zero); raw estimator in HUGEINT floor arithmetic
            "WITH h AS (SELECT DISTINCT CAST(concat('0x', "
            "substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) "
            "AS hv FROM events), "
            "b AS (SELECT hv // 72057594037927936 AS bucket, "
            "hv % 72057594037927936 AS rest FROM h), "
            "r AS (SELECT bucket, max(CASE WHEN rest = 0 THEN 57 "
            "ELSE 57 - length(to_base(rest, 2)) END) AS mx "
            "FROM b GROUP BY bucket), "
            "s AS (SELECT CAST(sum(CAST(1 AS BIGINT) "
            "<< CAST(57 - mx AS INT)) AS HUGEINT) "
            "+ (16 - count(*)) * CAST(144115188075855872 AS HUGEINT) "
            "AS ssum FROM r) "
            "SELECT CAST(16 AS BIGINT) AS m, "
            "CAST(CAST(673 AS HUGEINT) * 256 * 144115188075855872 "
            "// (1000 * ssum) AS BIGINT) AS estimate FROM s"
        ),
        "large_order_customers": (
            "WITH q AS (SELECT l_orderkey, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) "
            "SELECT c.c_custkey, c.c_name, o.o_orderkey, "
            "CAST(floor(o.o_totalprice * 1000000) AS BIGINT) "
            "AS total_micro, q.sum_qty "
            "FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "ORDER BY total_micro DESC, o.o_orderkey LIMIT 20"
        ),
        "promo_revenue_ppm": (
            "WITH j AS (SELECT (CAST(floor(l_extendedprice * 1000000) "
            "AS BIGINT) * (1000 - CAST(floor(l_discount * 1000) "
            "AS BIGINT))) // 1000 AS rev, p_type "
            "FROM lineitem JOIN part ON p_partkey = l_partkey) "
            "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev "
            "ELSE 0 END) AS BIGINT) AS promo_micro, "
            "CAST(sum(rev) AS BIGINT) AS total_micro, "
            "CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 "
            "END) AS HUGEINT) * 1000000 // CAST(sum(rev) AS HUGEINT) "
            "AS BIGINT) AS share_ppm FROM j"
        ),
        "brand_supplier_counts": (
            "WITH p AS (SELECT p_brand, l_suppkey, count(*) AS n "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "GROUP BY p_brand, l_suppkey) "
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers, "
            "CAST(sum(n) AS BIGINT) AS n_items FROM p GROUP BY p_brand"
        ),
        "events_csv_roundtrip": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM events GROUP BY event_type"
        ),
        "docs_partitioned_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang"
        ),
        "media_frame_index": (
            # closed form of the deterministic payload construction:
            # frames 0..nf-1 step 2 (stride), every 8x4 frame filled
            # with byte (doc_id % 251)
            "WITH f AS (SELECT doc_id, 1 + n_chars % 5 AS nf "
            "FROM documents), "
            "k AS (SELECT doc_id, unnest(generate_series(0, nf - 1, 2)) "
            "AS frame_idx FROM f) "
            "SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) "
            "AS frame_idx, CAST(32 AS BIGINT) AS frame_len, "
            "CAST(32 * (doc_id % 251) AS BIGINT) AS frame_sum FROM k"
        ),
        "token_rarity_hist": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "toks AS (SELECT doc_id, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) "
            "AS x(tok) WHERE t <> ''), "
            "occ AS (SELECT doc_id, term, count(*) AS n "
            "FROM toks GROUP BY doc_id, term), "
            "vocab AS (SELECT term, CAST(sum(n) AS BIGINT) AS c "
            "FROM occ GROUP BY term) "
            "SELECT o.doc_id, CAST(floor(log2(v.c)) AS BIGINT) AS bucket, "
            "CAST(sum(o.n) AS BIGINT) AS n_tokens "
            "FROM occ o JOIN vocab v USING (term) "
            "GROUP BY o.doc_id, bucket"
        ),
        "source_mirror_overlap": _source_mirror_sql(),
        "term_postings": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "toks AS (SELECT DISTINCT doc_id, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) "
            "AS x(tok) WHERE t <> ''), "
            "dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
            "FROM toks GROUP BY term), "
            "rk AS (SELECT term, doc_id, row_number() OVER "
            "(PARTITION BY term ORDER BY doc_id) AS rn FROM toks), "
            "ph AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' "
            "ORDER BY doc_id) AS posting_head FROM rk WHERE rn <= 8 "
            "GROUP BY term) "
            "SELECT d.term, d.df, ph.posting_head "
            "FROM dfc d JOIN ph USING (term)"
        ),
        "returned_revenue_topk": (
            # revenue integer-exact in nano units, matching the Ray
            # stage: floor(price*1e6) * (1000 - floor(discount*1e3))
            "WITH rev AS (SELECT l_orderkey, "
            "CAST(sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT) "
            "* (1000 - CAST(floor(l_discount * 1000) AS BIGINT))) AS BIGINT) "
            "AS r FROM lineitem WHERE l_returnflag = 'R' "
            "GROUP BY l_orderkey), "
            "pc AS (SELECT o.o_custkey AS c_custkey, "
            "CAST(sum(rev.r) AS BIGINT) AS revenue_nano "
            "FROM rev JOIN orders o ON o.o_orderkey = rev.l_orderkey "
            "GROUP BY o.o_custkey) "
            "SELECT c.c_custkey, c.c_name, n.n_name, p.revenue_nano "
            "FROM pc p JOIN customer c ON c.c_custkey = p.c_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "ORDER BY p.revenue_nano DESC, c.c_custkey LIMIT 20"
        ),
        "cust_order_distribution": (
            # TPC-H Q13 shape: LEFT JOIN keeps zero-order customers
            "WITH pc AS (SELECT c.c_custkey, "
            "CAST(count(o.o_orderkey) AS BIGINT) AS c_count "
            "FROM customer c LEFT JOIN orders o "
            "ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey) "
            "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist "
            "FROM pc GROUP BY c_count"
        ),
        "small_qty_part_revenue": (
            # TPC-H Q17 shape, integer-exact threshold in micro units:
            # qty < avg/5  ⇔  5*q*cnt < sum_q (matching the Ray stage)
            "WITH li AS (SELECT l_partkey, "
            "CAST(floor(l_quantity * 1000000) AS BIGINT) AS q, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) AS p "
            "FROM lineitem), "
            "agg AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS s, "
            "CAST(count(*) AS BIGINT) AS c FROM li GROUP BY l_partkey) "
            "SELECT pt.p_brand, CAST(count(*) AS BIGINT) AS n_small, "
            "CAST(sum(li.p) AS BIGINT) AS revenue_micro "
            "FROM li JOIN agg USING (l_partkey) "
            "JOIN part pt ON pt.p_partkey = li.l_partkey "
            "WHERE pt.p_brand LIKE 'Brand#1%' AND 5 * li.q * agg.c < agg.s "
            "GROUP BY pt.p_brand"
        ),
        "fk_orphan_audit": (
            " UNION ALL ".join(
                f"SELECT '{child}.{ck}->{parent}' AS relation, "
                f"CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS n_orphans "
                f"FROM {child} c LEFT JOIN {parent} p ON p.{pk} = c.{ck}"
                for child, ck, parent, pk in [
                    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
                    ("lineitem", "l_partkey", "part", "p_partkey"),
                    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
                    ("orders", "o_custkey", "customer", "c_custkey"),
                    ("customer", "c_nationkey", "nation", "n_nationkey"),
                    ("nation", "n_regionkey", "region", "r_regionkey"),
                ]
            )
        ),
        "source_dup_rates": (
            "WITH h AS (SELECT source, md5(text) AS ch FROM documents), "
            "c AS (SELECT ch, count(*) AS n FROM h GROUP BY ch) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_docs "
            "FROM h JOIN c USING (ch) GROUP BY source"
        ),
        "user_value_mad": (
            "WITH v AS (SELECT user_id, CAST(floor(value * 1000000) "
            "AS BIGINT) AS x FROM events), "
            "r1 AS (SELECT user_id, x, row_number() OVER ("
            "PARTITION BY user_id ORDER BY x) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS cnt FROM v), "
            "m1 AS (SELECT user_id, x AS median FROM r1 "
            "WHERE rn = (cnt - 1) // 2 + 1), "
            "d AS (SELECT v.user_id, abs(v.x - m1.median) AS dev "
            "FROM v JOIN m1 USING (user_id)), "
            "r2 AS (SELECT user_id, dev, row_number() OVER ("
            "PARTITION BY user_id ORDER BY dev) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS cnt FROM d), "
            "m2 AS (SELECT user_id, dev AS mad FROM r2 "
            "WHERE rn = (cnt - 1) // 2 + 1) "
            "SELECT user_id, CAST(m1.median AS BIGINT) AS median, "
            "CAST(m2.mad AS BIGINT) AS mad "
            "FROM m1 JOIN m2 USING (user_id)"
        ),
        "user_median_value": (
            "WITH v AS (SELECT user_id, CAST(floor(value * 1000000) "
            "AS BIGINT) AS x FROM events), "
            "r AS (SELECT user_id, x, row_number() OVER ("
            "PARTITION BY user_id ORDER BY x) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS cnt FROM v) "
            "SELECT user_id, CAST(x AS BIGINT) AS median_micro "
            "FROM r WHERE rn = (cnt - 1) // 2 + 1"
        ),
        "event_pairs_banded": (
            "SELECT a.event_id AS event_id_1, b.event_id AS event_id_2 "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id)) "
            f"AND epoch_us(b.ts) - epoch_us(a.ts) <= {_BAND_US}"
        ),
        "user_snapshot_applied": (
            "WITH e AS (SELECT user_id, event_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "CAST(floor(value * 1000000) AS BIGINT) AS value_micro, "
            "event_type FROM events), "
            "b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM e), "
            "base AS (SELECT user_id, value_micro FROM (SELECT user_id, "
            "value_micro, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts_us DESC, event_id DESC) AS rn FROM e, b "
            "WHERE e.ts_us < b.cut) WHERE rn = 1), "
            "dl AS (SELECT user_id, value_micro, event_type FROM ("
            "SELECT user_id, value_micro, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn "
            "FROM e, b WHERE e.ts_us >= b.cut) WHERE rn = 1) "
            "SELECT user_id, value_micro FROM base "
            "WHERE user_id NOT IN (SELECT user_id FROM dl) "
            "UNION ALL SELECT user_id, value_micro FROM dl "
            "WHERE event_type <> 'signup'"
        ),
        "user_value_decayed": (
            # same bit-exact decay arithmetic as the Ray stage: floor
            # micro-quantization, age floor-div halflife capped at 62,
            # integer shift (values are non-negative, so SQL truncating
            # division == numpy's flooring >>)
            "WITH ref AS (SELECT epoch_us(max(ts)) AS r FROM events) "
            "SELECT user_id, CAST(sum("
            "CAST(floor(value * 1000000) AS BIGINT) // (1::BIGINT << "
            "least(CAST(greatest(r - epoch_us(ts), 0) "
            f"// {_DECAY_HALFLIFE_US} AS BIGINT), 62))"
            ") AS BIGINT) AS decayed_micro "
            "FROM events, ref GROUP BY user_id"
        ),
        "latest_event_per_user": (
            "SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "event_type, CAST(floor(value * 1000000) AS BIGINT) AS value_micro "
            "FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
        ),
        "user_value_diff": (
            "WITH e AS (SELECT user_id, event_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "CAST(floor(value * 1000000) AS BIGINT) AS value_micro "
            "FROM events), "
            "b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM e), "
            "o AS (SELECT user_id, value_micro FROM (SELECT user_id, "
            "value_micro, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts_us DESC, event_id DESC) AS rn FROM e, b "
            "WHERE e.ts_us < b.cut) WHERE rn = 1), "
            "n AS (SELECT user_id, value_micro FROM (SELECT user_id, "
            "value_micro, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts_us DESC, event_id DESC) AS rn FROM e, b "
            "WHERE e.ts_us >= b.cut) WHERE rn = 1) "
            "SELECT CAST(coalesce(o.user_id, n.user_id) AS BIGINT) "
            "AS user_id, "
            "CASE WHEN o.user_id IS NULL THEN 'added' "
            "WHEN n.user_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change, "
            "CAST(coalesce(o.value_micro, -1) AS BIGINT) "
            "AS old_value_micro, "
            "CAST(coalesce(n.value_micro, -1) AS BIGINT) "
            "AS new_value_micro "
            "FROM o FULL JOIN n ON o.user_id = n.user_id "
            "WHERE o.user_id IS NULL OR n.user_id IS NULL "
            "OR o.value_micro <> n.value_micro"
        ),
        "embedding_kmeans": _kmeans_sql(),
        "user_event_pivot": (
            "SELECT user_id, "
            "CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) "
            "AS n_click, "
            "CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) "
            "AS n_error, "
            "CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) "
            "AS n_purchase, "
            "CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) "
            "AS n_signup, "
            "CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) "
            "AS n_view FROM events GROUP BY user_id"
        ),
        "user_top_event_type": (
            "WITH c AS (SELECT user_id, event_type, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
            "SELECT user_id, event_type, n FROM (SELECT *, row_number() "
            "OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn "
            "FROM c) WHERE rn = 1"
        ),
        "sliding_distinct_users": (
            "WITH ub AS (SELECT DISTINCT "
            "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, user_id "
            "FROM events), "
            "cand AS (SELECT DISTINCT ub.bucket + r.k AS bucket "
            "FROM ub, range(3) r(k) "
            "WHERE ub.bucket + r.k <= (SELECT max(bucket) FROM ub)) "
            "SELECT c.bucket, CAST(count(DISTINCT u.user_id) AS BIGINT) "
            "AS n_users FROM cand c JOIN ub u "
            "ON u.bucket > c.bucket - 3 AND u.bucket <= c.bucket "
            "GROUP BY c.bucket"
        ),
        "event_transitions": (
            "WITH s AS (SELECT event_type AS state, lead(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS next_state FROM events) "
            "SELECT state, next_state, CAST(count(*) AS BIGINT) AS n "
            "FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2"
        ),
        "embedding_moments": (
            # DOUBLE cast before the micro multiply: see _kmeans_sql
            "WITH ev AS (SELECT vec_id, "
            "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS x, "
            "unnest(range(len(embedding))) AS d FROM embeddings) "
            "SELECT CAST(a.d AS BIGINT) AS d1, CAST(b.d AS BIGINT) AS d2, "
            "CAST(sum(a.x * b.x) AS BIGINT) AS sum_xy "
            "FROM ev a JOIN ev b ON a.vec_id = b.vec_id AND a.d <= b.d "
            "GROUP BY 1, 2"
        ),
        "events_value_delta": (
            "SELECT event_id, value_micro - prev AS delta_micro FROM ("
            "SELECT event_id, "
            "CAST(floor(value * 1000000) AS BIGINT) AS value_micro, "
            "lag(CAST(floor(value * 1000000) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events) WHERE prev IS NOT NULL"
        ),
        "top_building_orders": (
            # revenue integer-exact in nano units: micro-price × (1000
            # − milli-discount); ties broken by ascending orderkey so
            # LIMIT 10 is deterministic
            "WITH bc AS (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING'), "
            "o AS (SELECT o_orderkey, "
            "CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) "
            "AS o_date_us, o_orderpriority FROM orders "
            "JOIN bc ON o_custkey = c_custkey "
            "WHERE o_orderdate < DATE '1998-06-01'), "
            "l AS (SELECT l_orderkey, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) * "
            "(1000 - CAST(floor(l_discount * 1000) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_shipdate > DATE '1998-06-01'), "
            "r AS (SELECT l_orderkey, CAST(sum(rev) AS BIGINT) "
            "AS revenue_nano FROM l GROUP BY l_orderkey) "
            "SELECT o.o_orderkey, r.revenue_nano, o.o_date_us, "
            "o.o_orderpriority FROM r JOIN o ON r.l_orderkey = o.o_orderkey "
            "ORDER BY r.revenue_nano DESC, o.o_orderkey LIMIT 10"
        ),
        "customers_inactive": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= DATE '2000-01-01')"
        ),
        "kg_ambiguous_surfaces": _ambiguous_sql(mentions_glob),
        "kg_entity_components": (
            # undirected reachability closure + min-member label: the
            # closed form of the distributed min-label propagation
            "WITH RECURSIVE ed AS (SELECT DISTINCT subj_canon AS a, "
            f"obj_canon AS b FROM read_parquet('{expected_glob}') "
            "UNION SELECT obj_canon, subj_canon "
            f"FROM read_parquet('{expected_glob}')), "
            "nd AS (SELECT DISTINCT a AS v FROM ed), "
            "reach(v, r) AS (SELECT v, v FROM nd "
            "UNION SELECT ed.b, reach.r FROM reach "
            "JOIN ed ON ed.a = reach.v), "
            "comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v) "
            "SELECT component, CAST(count(*) AS BIGINT) AS n_nodes "
            "FROM comp GROUP BY component"
        ),
        "kg_pred_signatures": (
            # node labels: context-free mention attributions plus
            # ambiguous-endpoint registrations (same universe as
            # kg_nodes); every canon carries one label in this world
            "WITH e AS (SELECT subj_canon, pred, obj_canon, "
            "CAST(count(*) AS BIGINT) AS w "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon), "
            "n AS (SELECT DISTINCT canon_id, label FROM ("
            "SELECT canon_mention AS canon_id, label "
            f"FROM read_parquet('{mentions_glob}') "
            "UNION ALL SELECT canon_id, label "
            f"FROM read_parquet('{endpoints_glob}'))) "
            "SELECT e.pred, ns.label AS subj_label, no.label AS obj_label, "
            "CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(sum(e.w) AS BIGINT) AS total_weight "
            "FROM e JOIN n ns ON ns.canon_id = e.subj_canon "
            "JOIN n no ON no.canon_id = e.obj_canon "
            "GROUP BY e.pred, ns.label, no.label"
        ),
        "user_first_touch": (
            "WITH f AS (SELECT user_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
            "c AS (SELECT user_id, max(CASE WHEN event_type = 'purchase' "
            "THEN 1 ELSE 0 END) AS converted FROM events GROUP BY user_id) "
            "SELECT f.event_type AS first_type, "
            "CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(c.converted) AS BIGINT) AS n_converted, "
            "CAST(sum(c.converted) * 1000000 // count(*) AS BIGINT) "
            "AS conv_ppm "
            "FROM f JOIN c ON c.user_id = f.user_id WHERE f.rn = 1 "
            "GROUP BY f.event_type"
        ),
        "kg_edge_confidence": (
            "WITH e AS (SELECT subj_canon, pred, obj_canon, "
            "CAST(count(*) AS BIGINT) AS weight "
            f"FROM read_parquet('{expected_glob}') "
            "GROUP BY subj_canon, pred, obj_canon), "
            "t AS (SELECT subj_canon, CAST(sum(weight) AS BIGINT) AS st "
            "FROM e GROUP BY subj_canon) "
            "SELECT e.subj_canon, e.pred, e.obj_canon, e.weight, "
            "CAST(e.weight * 1000000 // t.st AS BIGINT) AS conf_ppm "
            "FROM e JOIN t ON e.subj_canon = t.subj_canon"
        ),
        "near_dup_recall_report": (
            "WITH ex AS (SELECT a.vec_id AS a, b.vec_id AS b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4), "
            f"ls AS ({_near_dup_lsh_sql()}), "
            "c AS (SELECT count(*) AS n FROM ex JOIN ls "
            "ON ex.a = ls.a AND ex.b = ls.b) "
            "SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact, "
            "CAST((SELECT count(*) FROM ls) AS BIGINT) AS n_lsh, "
            "CAST(c.n AS BIGINT) AS n_common, "
            "CAST(c.n * 1000000 // "
            "GREATEST((SELECT count(*) FROM ex), 1) AS BIGINT) "
            "AS recall_ppm FROM c"
        ),
        "events_late_arrivals": (
            # event_id = ingestion order; late = event-time below the
            # running per-user event-time max over PRIOR arrivals
            "WITH w AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, "
            "max(CAST(epoch_us(ts) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
            "FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CASE WHEN pm > t THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_out_of_order, "
            "CAST(max(CASE WHEN pm > t THEN pm - t ELSE 0 END) AS BIGINT) "
            "AS max_lateness_us FROM w GROUP BY user_id"
        ),
        "join_size_stats": (
            "WITH a AS (SELECT user_id AS k, count(*) AS n FROM events "
            "GROUP BY user_id), "
            "b AS (SELECT o_custkey AS k, count(*) AS n FROM orders "
            "GROUP BY o_custkey) "
            "SELECT CAST(sum(a.n * b.n) AS BIGINT) AS join_rows, "
            "CAST(count(*) AS BIGINT) AS n_keys "
            "FROM a JOIN b ON a.k = b.k"
        ),
        "kg_entity_salience": (
            "WITH c AS (SELECT doc_id, canon_mention AS canon_id, "
            "CAST(count(*) AS BIGINT) AS n "
            f"FROM read_parquet('{mentions_glob}') GROUP BY doc_id, "
            "canon_mention), "
            "r AS (SELECT doc_id, canon_id, n, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY n DESC, canon_id) AS rn FROM c) "
            "SELECT doc_id, canon_id AS top_entity, n AS n_mentions "
            "FROM r WHERE rn = 1"
        ),
        "events_contract_audit": (
            "WITH v AS (SELECT 'user_id_positive' AS rule, "
            "CASE WHEN user_id IS NULL OR user_id <= 0 THEN 1 ELSE 0 END "
            "AS bad FROM events "
            "UNION ALL SELECT 'value_positive', "
            "CASE WHEN value IS NULL OR value <= 0 THEN 1 ELSE 0 END "
            "FROM events "
            "UNION ALL SELECT 'ts_in_era', "
            "CASE WHEN ts >= TIMESTAMP '1995-01-01' "
            "AND ts < TIMESTAMP '2030-01-01' THEN 0 ELSE 1 END FROM events "
            "UNION ALL SELECT 'event_type_known', "
            "CASE WHEN event_type IN ('click','view','purchase','signup',"
            "'error') THEN 0 ELSE 1 END FROM events "
            "UNION ALL SELECT 'props_json_object', "
            "CASE WHEN props LIKE '{%' AND props LIKE '%}' THEN 0 ELSE 1 END "
            "FROM events) "
            "SELECT rule, CAST(count(*) AS BIGINT) AS n_checked, "
            "CAST(sum(bad) AS BIGINT) AS n_violations FROM v GROUP BY rule"
        ),
        "orders_zonemap_scan": (
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT)) "
            "AS BIGINT) AS total_micro FROM orders "
            "WHERE CAST(floor(o_totalprice * 1000000) AS BIGINT) "
            "> 400000000000"
        ),
        "docs_schema_union": (
            # recompute the v1/v2 split from the source table: checks the
            # write -> union-by-name read path end-to-end
            "WITH u AS ("
            "SELECT doc_id, lang, n_chars, CAST(NULL AS BIGINT) AS quality "
            "FROM documents WHERE doc_id % 2 = 0 "
            "UNION ALL "
            "SELECT doc_id, lang, n_chars, n_chars % 7 AS quality "
            "FROM documents WHERE doc_id % 2 = 1) "
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(sum(coalesce(quality, 0)) AS BIGINT) AS sum_quality, "
            "CAST(count(quality) AS BIGINT) AS n_with_quality "
            "FROM u GROUP BY lang"
        ),
        "events_trailing_1h": (
            # RANGE frame: peers (equal timestamps) are IN the frame —
            # the semantics trailing_range_sum replicates
            "SELECT event_id, CAST(sum(CAST(floor(value * 1000000) AS "
            "BIGINT)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS range_sum_micro FROM events"
        ),
        "nation_part_margin": (
            "SELECT n.n_name AS nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(SUM(CAST(floor(l.l_extendedprice * 1000000) AS BIGINT) * "
            "(1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)) - "
            "CAST(floor(p.p_retailprice * 1000000) AS BIGINT) * "
            "CAST(floor(l.l_quantity) AS BIGINT) * 1000) AS BIGINT) "
            "AS margin_nano "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "WHERE p.p_name LIKE '%widget%' "
            "GROUP BY n.n_name, year(l.l_shipdate)"
        ),
        "regional_market_share": (
            "WITH eu AS (SELECT n_nationkey FROM nation JOIN region "
            "ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE'), "
            "tgt AS (SELECT n_nationkey FROM nation "
            "WHERE n_name = 'NATION_7'), "
            "o AS (SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) "
            "AS o_year FROM orders JOIN customer ON c_custkey = o_custkey "
            "WHERE c_nationkey IN (SELECT n_nationkey FROM eu) "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01'), "
            "li AS (SELECT l_orderkey, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) * "
            "(1000 - CAST(floor(l_discount * 1000) AS BIGINT)) AS rev_nano, "
            "CASE WHEN s.s_nationkey IN (SELECT n_nationkey FROM tgt) "
            "THEN 1 ELSE 0 END AS is_target "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier s ON s.s_suppkey = l_suppkey "
            "WHERE p_type = 'ECONOMY') "
            "SELECT o.o_year, CAST(sum(li.rev_nano) AS BIGINT) AS total_nano, "
            "CAST(sum(li.rev_nano * li.is_target) AS BIGINT) AS target_nano, "
            "CAST(sum(li.rev_nano * li.is_target) * 1000000 // "
            "sum(li.rev_nano) AS BIGINT) AS share_ppm "
            "FROM li JOIN o ON o.o_orderkey = li.l_orderkey "
            "GROUP BY o.o_year"
        ),
        "host_lang_mix": (
            "WITH p AS (SELECT regexp_extract(url, '^https://([^/]+)/', 1)"
            " AS host, lang "
            f"FROM read_parquet('{pages_glob}')), "
            "c AS (SELECT host, lang, CAST(count(*) AS BIGINT) AS n_top "
            "FROM p GROUP BY host, lang), "
            "t AS (SELECT host, CAST(sum(n_top) AS BIGINT) AS n_pages "
            "FROM c GROUP BY host), "
            "r AS (SELECT host, lang, n_top, row_number() OVER ("
            "PARTITION BY host ORDER BY n_top DESC, lang) AS rn FROM c) "
            "SELECT r.host, r.lang AS top_lang, r.n_top, t.n_pages, "
            "CAST(r.n_top * 1000000 // t.n_pages AS BIGINT) AS top_ppm "
            "FROM r JOIN t ON r.host = t.host WHERE r.rn = 1"
        ),
        "charset_audit": (
            "SELECT lang, count(*) AS n_pages, "
            "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
            "CAST(sum(length(regexp_replace(text, '[ -~]', '', 'g'))) "
            "AS BIGINT) AS non_ascii_chars, "
            "CAST(sum(length(regexp_replace(text, '[ -~]', '', 'g'))) "
            "* 1000000 // sum(length(text)) AS BIGINT) AS non_ascii_ppm "
            f"FROM read_parquet('{pages_glob}') GROUP BY lang"
        ),
        "events_ipc_roundtrip": (
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro, "
            "CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us "
            "FROM events GROUP BY event_type"
        ),
        "late_order_priority": (
            # Q4 shape: EXISTS(ship > orderdate + 90d) == max(ship) over
            # the order beats the cutoff — identical fold to the Ray plan
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late "
            "FROM orders o WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) "
            "GROUP BY o_orderpriority"
        ),
        "top_supplier_revenue": (
            "WITH rev AS (SELECT l_suppkey AS s_suppkey, "
            "CAST(SUM(CAST(floor(l_extendedprice * 1000000) AS BIGINT) * "
            "(1000 - CAST(floor(l_discount * 1000) AS BIGINT))) AS BIGINT) "
            "AS total_rev_nano FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-07-01' GROUP BY l_suppkey) "
            "SELECT s.s_suppkey, s.s_name, r.total_rev_nano "
            "FROM supplier s JOIN rev r ON s.s_suppkey = r.s_suppkey "
            "WHERE r.total_rev_nano = (SELECT max(total_rev_nano) FROM rev)"
        ),
        "disjunctive_brand_revenue": (
            "SELECT CAST(coalesce(SUM("
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) * "
            "(1000 - CAST(floor(l_discount * 1000) AS BIGINT))), 0) AS BIGINT)"
            " AS revenue_nano FROM lineitem l JOIN part p "
            "ON p.p_partkey = l.l_partkey WHERE "
            "(p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 "
            " AND l.l_quantity BETWEEN 1 AND 11) OR "
            "(p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 "
            " AND l.l_quantity BETWEEN 10 AND 20) OR "
            "(p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 "
            " AND l.l_quantity BETWEEN 20 AND 30)"
        ),
        "waiting_suppliers": (
            # Q21 shape: >=2 distinct suppliers per 'F' order, exactly one
            # of them late (>60d after orderdate); arithmetic identity
            # sum(suppkey*late) recovers the sole late supplier
            "WITH f AS (SELECT l.l_orderkey, l.l_suppkey, "
            "CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
            "THEN 1 ELSE 0 END AS late FROM lineitem l "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "WHERE o.o_orderstatus = 'F'), "
            "g AS (SELECT l_orderkey, l_suppkey, max(late) AS late "
            "FROM f GROUP BY l_orderkey, l_suppkey), "
            "po AS (SELECT l_orderkey, count(*) AS n_supp, "
            "sum(late) AS n_late, sum(l_suppkey * late) AS late_key "
            "FROM g GROUP BY l_orderkey) "
            "SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM po JOIN supplier s ON s.s_suppkey = po.late_key "
            "WHERE po.n_supp >= 2 AND po.n_late = 1 "
            "GROUP BY s.s_suppkey, s.s_name"
        ),
        "lineitem_pareto": (
            # 2-D skyline via the O(n log n) window formulation: keep p
            # iff p.price is the max at p.qty and beats the best price
            # over all strictly larger qty (strict dominance; duplicate
            # points all kept) — same semantics as skyline2_mask.
            "WITH pts AS (SELECT l_orderkey, l_linenumber, "
            "CAST(floor(l_quantity * 1000000) AS BIGINT) AS qty_micro, "
            "CAST(floor(l_extendedprice * 1000000) AS BIGINT) AS price_micro "
            "FROM lineitem), "
            "agg AS (SELECT qty_micro, max(price_micro) AS my FROM pts "
            "GROUP BY qty_micro), "
            "r AS (SELECT qty_micro, my, max(my) OVER (ORDER BY qty_micro DESC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bh FROM agg) "
            "SELECT p.l_orderkey, CAST(p.l_linenumber AS BIGINT) AS "
            "l_linenumber, p.qty_micro, p.price_micro "
            "FROM pts p JOIN r ON p.qty_micro = r.qty_micro "
            "WHERE p.price_micro = r.my AND (r.bh IS NULL OR r.my > r.bh)"
        ),
        "events_debounced": (
            "SELECT event_id FROM (SELECT event_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS t, "
            "lag(CAST(epoch_us(ts) AS BIGINT)) OVER ("
            "PARTITION BY user_id, event_type ORDER BY ts, event_id"
            ") AS prev FROM events) "
            "WHERE prev IS NULL OR t - prev > 3600000000"
        ),
        "events_type_hour_rollup": (
            "WITH b AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket FROM events) "
            "SELECT coalesce(event_type, '__all__') AS event_type, "
            "CAST(coalesce(bucket, -1) AS BIGINT) AS bucket, "
            "count(*) AS n FROM b GROUP BY ROLLUP(event_type, bucket)"
        ),
        "order_price_ntile": (
            "SELECT o_orderkey, CAST(ntile(4) OVER (ORDER BY "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT), o_orderkey) "
            "AS BIGINT) AS tile FROM orders"
        ),
        "events_jsonl_roundtrip": (
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM events GROUP BY event_type"
        ),
        "orders_zorder_files": _zorder_sql(),
        "ngram_jaccard_pairs": _ngram_jaccard_sql(),
        "ngram_contamination": _contamination_sql(),
        "pii_redact": _pii_sql(),
        "repetition_stats": (
            # tokens pinned to the token_counts definition, lowercased;
            # bigrams via the positional-self-join idiom; ' '-joined
            # bigram keys are unambiguous because tokens contain no
            # whitespace
            "WITH tt AS (SELECT doc_id, "
            f"lower({_TRIM_SQL}) AS t FROM documents), "
            "lst AS (SELECT doc_id, list_filter("
            "string_split_regex(t, '\\s+'), x -> x <> '') AS l FROM tt), "
            "tok AS (SELECT doc_id, unnest(l) AS w, "
            "unnest(range(len(l))) AS i FROM lst), "
            "bg AS (SELECT t1.doc_id, concat(t1.w, ' ', t2.w) AS b "
            "FROM tok t1 JOIN tok t2 "
            "ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1), "
            "bc AS (SELECT doc_id, b, count(*) AS c FROM bg "
            "GROUP BY doc_id, b), "
            "tb AS (SELECT doc_id, max(c) AS top FROM bc GROUP BY doc_id) "
            "SELECT lst.doc_id, CAST(len(l) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct_tokens, "
            "CAST(greatest(len(l) - 1, 0) AS BIGINT) AS n_bigrams, "
            "CAST(coalesce(tb.top, 0) AS BIGINT) AS top_bigram_n "
            "FROM lst LEFT JOIN tb USING (doc_id)"
        ),
        "dataset_mixture": _mixture_sql(),
        "global_shuffle": (
            # the 16-hex-digit prefix compared as a fixed-width string ==
            # the u64 numeric compare the Ray side does; doc_id breaks
            # (negligible-probability) hash ties identically on both sides
            "SELECT doc_id, CAST(row_number() OVER ("
            "ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 16), doc_id"
            ") - 1 AS BIGINT) AS pos FROM documents"
        ),
        "sequence_packing": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "tc AS (SELECT doc_id, CASE WHEN t = '' THEN 0 ELSE "
            "len(string_split_regex(t, '\\s+')) END AS n_tokens FROM tt), "
            "s AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS prior FROM tc) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(prior // 512 AS BIGINT) AS pack_id FROM s"
        ),
        # NOTE: every aggregate sum is wrapped in an OUTER CAST(... AS
        # BIGINT): DuckDB's sum(BIGINT) returns HUGEINT, which pandas
        # materializes as float64 — the driver then hashes 12345.0 vs
        # Ray's int64 12345 and reports a value mismatch even though the
        # numbers are identical (CORRECTNESS_r01: doc_stats_by_lang,
        # top_users_by_value, lineitem_pricing).
        "doc_stats_by_lang": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"
        ),
        "dedup_exact_docs": (
            "SELECT md5(text) AS content_hash, min(doc_id) AS doc_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "doc_fingerprints": "SELECT doc_id, md5(text) AS content_md5 FROM documents",
        "token_counts": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents) "
            "SELECT doc_id, CASE WHEN t = '' THEN 0 ELSE "
            "len(string_split_regex(t, '\\s+')) END AS n_tokens FROM tt"
        ),
        "text_quality": (
            f"WITH tt AS (SELECT doc_id, text, {_TRIM_SQL} AS t FROM documents) "
            "SELECT doc_id, length(text) AS n_chars, "
            "length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha, "
            "length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit, "
            "CASE WHEN t = '' THEN 0 ELSE "
            "len(string_split_regex(t, '\\s+')) END AS n_tokens, "
            "CASE WHEN t = '' THEN 0 ELSE "
            "len(list_filter(string_split_regex(t, '\\s+'), "
            f"x -> lower(x) IN {_STOP_SQL})) END AS n_stopwords "
            "FROM tt"
        ),
        "ann_topk": _ANN_TOPK_SQL,
        "embedding_near_dup": (
            "SELECT a.vec_id AS a, b.vec_id AS b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4"
        ),
        "ann_topk_lsh": _ann_lsh_sql(),
        "ann_topk_ivf": _ann_ivf_sql(),
        "embedding_near_dup_lsh": _near_dup_lsh_sql(),
        "embedding_dup_components": _dup_components_sql(),
        "media_byte_stats": (
            "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
            "CAST(octet_length(encode(text)) - octet_length(encode("
            "regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))) AS BIGINT) "
            "AS n_hi_bytes FROM documents"
        ),
        "top_users_by_value": (
            "SELECT user_id, count(*) AS n_events, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_micro "
            "FROM events GROUP BY user_id "
            "ORDER BY total_micro DESC, user_id LIMIT 20"
        ),
        "events_hourly": (
            "SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, "
            "event_type, count(*) AS n FROM events GROUP BY 1, 2"
        ),
        "events_sliding_3h": (
            "WITH b AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, "
            "count(*) AS n FROM events GROUP BY 1), "
            "r AS (SELECT unnest(generate_series((SELECT min(bucket) FROM b), "
            "(SELECT max(bucket) FROM b))) AS bucket), "
            "d AS (SELECT r.bucket, coalesce(b.n, 0) AS n FROM r LEFT JOIN b USING (bucket)), "
            "w AS (SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_window FROM d) "
            "SELECT bucket, n_window FROM w WHERE n_window > 0"
        ),
        "max_order_by_cust": (
            "SELECT o_custkey, "
            "max(CAST(floor(o_totalprice * 1000000) AS BIGINT)) AS max_total_micro, "
            "count(*) AS n_orders FROM orders GROUP BY o_custkey"
        ),
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "events_by_type_salted": (
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
        "term_doc_frequency": (
            f"WITH tt AS (SELECT doc_id, {_TRIM_SQL} AS t FROM documents), "
            "toks AS (SELECT DISTINCT doc_id, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) "
            "AS x(tok) WHERE t <> '') "
            "SELECT term, count(*) AS df FROM toks GROUP BY term "
            "ORDER BY df DESC, term LIMIT 50"
        ),
        "top_terms_per_lang": (
            f"WITH tt AS (SELECT lang, {_TRIM_SQL} AS t FROM documents), "
            "toks AS (SELECT lang, lower(x.tok) AS term "
            "FROM tt, unnest(string_split_regex(t, '\\s+')) "
            "AS x(tok) WHERE t <> ''), "
            "c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n "
            "FROM toks GROUP BY lang, term), "
            "r AS (SELECT *, row_number() OVER ("
            "PARTITION BY lang ORDER BY n DESC, term) AS rn FROM c) "
            "SELECT lang, term, n FROM r WHERE rn <= 10"
        ),
        "docs_above_median_chars": (
            # replicate the histogram quantile (same integer binning as
            # the Ray stage: width 10 over [0, 640), clamp to [0, 63]),
            # then count rows whose bin strictly exceeds the group's
            # median bin
            "WITH b AS (SELECT lang, "
            "CAST(least(greatest(floor(n_chars / 10.0), 0), 63) AS BIGINT) "
            "AS bin FROM documents), "
            "c AS (SELECT lang, bin, count(*) AS n FROM b GROUP BY lang, bin), "
            "cum AS (SELECT lang, bin, "
            "sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cn, "
            "sum(n) OVER (PARTITION BY lang) AS total FROM c), "
            "thr AS (SELECT lang, CAST(min(bin) AS BIGINT) AS q_bin "
            "FROM cum WHERE cn >= (50 * total + 99) // 100 GROUP BY lang) "
            "SELECT b.lang, CAST(count(*) AS BIGINT) AS n_above, "
            "CAST(min(thr.q_bin) AS BIGINT) AS q_bin "
            "FROM b JOIN thr ON b.lang = thr.lang "
            "WHERE b.bin > thr.q_bin GROUP BY b.lang"
        ),
        "event_props_k_stats": (
            # the same RE2 int-field pattern the Ray stage compiles
            "WITH e AS (SELECT event_type, "
            "TRY_CAST(regexp_extract(props, "
            "'\"k\"\\s*:\\s*(-?[0-9]+)', 1) AS BIGINT) AS k FROM events) "
            "SELECT event_type, count(*) AS n_rows, "
            "CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_k, "
            "CAST(sum(COALESCE(k, 0)) AS BIGINT) AS sum_k "
            "FROM e GROUP BY event_type"
        ),
        "order_price_quantiles": (
            "WITH t AS (SELECT count(*) AS total FROM orders), "
            "b AS (SELECT CAST(least(greatest(floor(o_totalprice / 8000.0), "
            "0), 63) AS BIGINT) AS bin FROM orders), "
            "c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin), "
            "cum AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cn FROM c) "
            "SELECT CAST(q.q_pct AS BIGINT) AS q_pct, "
            "(SELECT min(bin) FROM cum WHERE cn >= "
            "(q.q_pct * (SELECT total FROM t) + 99) // 100) AS bin, "
            "(SELECT total FROM t) AS total "
            "FROM (VALUES (50), (90), (99)) AS q(q_pct)"
        ),
        "price_quantiles_by_status": (
            "WITH b AS (SELECT o_orderstatus AS g, "
            "CAST(least(greatest(floor(o_totalprice / 8000.0), 0), 63) "
            "AS BIGINT) AS bin FROM orders), "
            "c AS (SELECT g, bin, count(*) AS n FROM b GROUP BY g, bin), "
            "cum AS (SELECT g, bin, "
            "sum(n) OVER (PARTITION BY g ORDER BY bin) AS cn, "
            "sum(n) OVER (PARTITION BY g) AS total FROM c) "
            "SELECT g AS o_orderstatus, CAST(q.q_pct AS BIGINT) AS q_pct, "
            "CAST(min(bin) AS BIGINT) AS bin, "
            "CAST(min(total) AS BIGINT) AS total "
            "FROM cum CROSS JOIN (VALUES (50), (90), (99)) AS q(q_pct) "
            "WHERE cn >= (q.q_pct * total + 99) // 100 "
            "GROUP BY g, q.q_pct"
        ),
        "docs_sample_by_lang": (
            "SELECT lang, doc_id FROM ("
            "SELECT lang, doc_id, row_number() OVER ("
            "PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 20"
        ),
        "docs_weighted_sample": (
            "WITH c AS (SELECT doc_id, n_chars AS w, "
            "CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum "
            "FROM documents), "
            "t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot "
            "FROM documents), "
            "p AS (SELECT CAST(r.k AS BIGINT) AS sample_id, "
            "CAST(concat('0x', substr(md5(CAST(r.k AS VARCHAR)), 1, 15)) "
            "AS BIGINT) % t.tot AS pos FROM range(64) r(k) CROSS JOIN t) "
            "SELECT p.sample_id, c.doc_id FROM p JOIN c "
            "ON p.pos >= c.cum - c.w AND p.pos < c.cum"
        ),
        "distinct_users_kmv": (
            "WITH h AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hv "
            "FROM events), "
            "n AS (SELECT count(*) AS cnt FROM h), "
            "kth AS (SELECT CAST(concat('0x', substr(hv, 1, 8)) AS BIGINT) "
            "AS v FROM h ORDER BY hv LIMIT 1 OFFSET 63) "
            "SELECT CAST(64 AS BIGINT) AS k, "
            "CAST(CASE WHEN (SELECT cnt FROM n) < 64 THEN (SELECT cnt FROM n) "
            "ELSE 63 * 4294967296 // (SELECT v FROM kth) END AS BIGINT) "
            "AS estimate"
        ),
        "lineitem_exact_median": (
            "WITH v AS (SELECT CAST(floor(l_extendedprice * 1000000) "
            "AS BIGINT) AS x FROM lineitem), "
            "r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn, "
            "count(*) OVER () AS n FROM v) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST((n - 1) // 2 AS BIGINT) AS rank, "
            "CAST(x AS BIGINT) AS value "
            "FROM r WHERE rn = (n - 1) // 2 + 1"
        ),
        "order_price_histogram": (
            "WITH v AS (SELECT CAST(floor(o_totalprice * 1000000) AS BIGINT) "
            "AS x FROM orders), "
            "b AS (SELECT min(x) AS lo, (max(x) - min(x)) // 16 + 1 AS w "
            "FROM v) "
            "SELECT CAST((x - lo) // w AS BIGINT) AS bin, "
            "CAST(lo + ((x - lo) // w) * w AS BIGINT) AS bin_lo, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM v, b GROUP BY 1, 2"
        ),
        "custkey_overlap_kmv": (
            # literal transcription of sketches.kmv_overlap: bottom-64
            # md5 sketches per side, k smallest of their union, exact
            # when the union sketch is unsaturated
            "WITH ha AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) "
            "AS hv FROM orders), "
            "hb AS (SELECT DISTINCT md5(CAST(c_custkey AS VARCHAR)) "
            "AS hv FROM customer), "
            "ka AS (SELECT hv FROM ha ORDER BY hv LIMIT 64), "
            "kb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64), "
            "ua AS (SELECT DISTINCT hv FROM (SELECT hv FROM ka "
            "UNION ALL SELECT hv FROM kb)), "
            "ku AS (SELECT hv FROM ua ORDER BY hv LIMIT 64), "
            "na AS (SELECT count(*) AS c FROM ha), "
            "nb AS (SELECT count(*) AS c FROM hb), "
            "nu AS (SELECT count(*) AS c FROM ua), "
            "kta AS (SELECT CAST(concat('0x', substr(hv, 1, 8)) AS BIGINT) "
            "AS v FROM ka ORDER BY hv LIMIT 1 OFFSET 63), "
            "ktb AS (SELECT CAST(concat('0x', substr(hv, 1, 8)) AS BIGINT) "
            "AS v FROM kb ORDER BY hv LIMIT 1 OFFSET 63), "
            "ktu AS (SELECT CAST(concat('0x', substr(hv, 1, 8)) AS BIGINT) "
            "AS v FROM ku ORDER BY hv LIMIT 1 OFFSET 63), "
            "eu AS (SELECT CAST(CASE WHEN (SELECT c FROM nu) < 64 "
            "THEN (SELECT c FROM nu) "
            "ELSE 63 * 4294967296 // (SELECT v FROM ktu) END AS BIGINT) AS v), "
            "nboth AS (SELECT count(*) AS c FROM ku "
            "WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)) "
            "SELECT CAST(64 AS BIGINT) AS k, "
            "CAST(CASE WHEN (SELECT c FROM na) < 64 THEN (SELECT c FROM na) "
            "ELSE 63 * 4294967296 // (SELECT v FROM kta) END AS BIGINT) "
            "AS est_a, "
            "CAST(CASE WHEN (SELECT c FROM nb) < 64 THEN (SELECT c FROM nb) "
            "ELSE 63 * 4294967296 // (SELECT v FROM ktb) END AS BIGINT) "
            "AS est_b, "
            "(SELECT v FROM eu) AS est_union, "
            "CAST(CASE WHEN (SELECT c FROM nu) < 64 THEN (SELECT c FROM nboth) "
            "ELSE (SELECT c FROM nboth) * (SELECT v FROM eu) // 64 "
            "END AS BIGINT) AS est_intersection"
        ),
        "distinct_users_per_type": (
            # grouped bottom-k: row_number per group over the same md5
            # ordering; groups with < k distinct users are exact, the
            # rest use the k-th hash's leading 32 bits — all BIGINT
            "WITH h AS (SELECT DISTINCT event_type, "
            "md5(CAST(user_id AS VARCHAR)) AS hv FROM events), "
            "r AS (SELECT event_type, hv, row_number() OVER ("
            "PARTITION BY event_type ORDER BY hv) AS rn FROM h), "
            "n AS (SELECT event_type, count(*) AS cnt FROM h "
            "GROUP BY event_type), "
            "kth AS (SELECT event_type, "
            "CAST(concat('0x', substr(hv, 1, 8)) AS BIGINT) AS v "
            "FROM r WHERE rn = 64) "
            "SELECT n.event_type, CAST(64 AS BIGINT) AS k, "
            "CAST(CASE WHEN n.cnt < 64 THEN n.cnt "
            "ELSE 63 * 4294967296 // kth.v END AS BIGINT) AS estimate "
            "FROM n LEFT JOIN kth USING (event_type)"
        ),
        "train_test_split": (
            "SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
            "< 'cccccccc' THEN 'train' ELSE 'test' END AS split, "
            "count(*) AS n_docs FROM documents GROUP BY 1"
        ),
        "order_lineitem_join": (
            "SELECT o.o_orderpriority, count(*) AS n_items, "
            "CAST(sum(CAST(floor(l.l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS revenue_micro "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderpriority"
        ),
        "events_rolling_value": (
            "SELECT event_id, CAST(sum(CAST(floor(value * 1000000) AS BIGINT))"
            " OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum "
            "FROM events"
        ),
        "events_asof_order": (
            "WITH m AS (SELECT e.event_id, e.value, o.o_orderkey, "
            "o.o_orderpriority, row_number() OVER (PARTITION BY e.event_id "
            "ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn "
            "FROM events e JOIN orders o ON e.user_id = o.o_custkey "
            "AND o.o_orderdate <= e.ts) "
            "SELECT o_orderpriority, count(*) AS n_events, "
            "CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey, "
            "CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM m WHERE rn = 1 GROUP BY o_orderpriority"
        ),
        "events_in_order_window": (
            "SELECT o.o_orderkey, count(*) AS n_events, "
            "CAST(sum(CAST(floor(e.value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM orders o JOIN events e "
            "ON e.user_id = o.o_custkey "
            "AND e.ts >= TIMESTAMP '2024-01-01' + (o.o_orderkey % 28) * INTERVAL 1 DAY "
            "AND e.ts < TIMESTAMP '2024-01-01' + (o.o_orderkey % 28) * INTERVAL 1 DAY "
            "+ INTERVAL 2 DAY GROUP BY o.o_orderkey"
        ),
        "event_sessions": (
            "WITH g AS (SELECT user_id, ts, CASE WHEN "
            "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
            "> INTERVAL 30 MINUTE OR "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "THEN 1 ELSE 0 END AS new_session FROM events) "
            "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions "
            "FROM g GROUP BY user_id"
        ),
        "orders_by_nation": (
            "SELECT n.n_name AS nation, count(*) AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        "top_orders_per_status": (
            "SELECT o_orderstatus, o_orderkey, o_totalprice FROM ("
            "SELECT o_orderstatus, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_orderstatus "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
            "WHERE rn <= 3"
        ),
        "lineitem_europe_semi": (
            "SELECT l_returnflag, count(*) AS n_items, "
            "CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey "
            "FROM lineitem WHERE l_suppkey IN ("
            "SELECT s_suppkey FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE') "
            "GROUP BY l_returnflag"
        ),
        "priority_revenue_share": (
            "WITH v AS (SELECT o_orderpriority, "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS p "
            "FROM orders) "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(p) AS BIGINT) AS sum_micro, "
            "CAST(sum(p) * 1000000 // (SELECT sum(p) FROM v) AS BIGINT) "
            "AS share_ppm "
            "FROM v GROUP BY o_orderpriority"
        ),
        "user_order_join_skew": (
            "WITH l AS (SELECT user_id AS key, count(*) AS n_left "
            "FROM events GROUP BY 1), "
            "r AS (SELECT o_custkey AS key, count(*) AS n_right "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(key AS BIGINT) AS key, "
            "CAST(n_left AS BIGINT) AS n_left, "
            "CAST(n_right AS BIGINT) AS n_right, "
            "CAST(n_left * n_right AS BIGINT) AS n_out "
            "FROM l JOIN r USING (key) "
            "ORDER BY n_out DESC, key LIMIT 10"
        ),
        "local_supplier_volume": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum((CAST(floor(l_extendedprice * 1000000) AS BIGINT) "
            "* (1000 - CAST(floor(l_discount * 1000) AS BIGINT))) // 1000) "
            "AS BIGINT) AS revenue_micro "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'EUROPE' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n_items, "
            "CAST(sum(CAST(floor(l_quantity * 1000000) AS BIGINT)) AS BIGINT) AS sum_qty_micro, "
            "CAST(sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS sum_price_micro "
            "FROM lineitem WHERE l_quantity < 25.0 "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "events_cube": (
            "WITH b AS (SELECT event_type, "
            "(epoch_us(ts) // 86400000000 + 4) % 7 AS wd, "
            "CAST(floor(value * 1000) AS BIGINT) AS vm FROM events) "
            "SELECT CAST(2 * GROUPING(event_type) + GROUPING(wd) "
            "AS BIGINT) AS gid, "
            "coalesce(event_type, '') AS event_type, "
            "CAST(coalesce(wd, -1) AS BIGINT) AS weekday, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(vm) AS BIGINT) AS value_milli "
            "FROM b GROUP BY CUBE(event_type, wd)"
        ),
        "orders_snapshot_diff": (
            "WITH pr AS (SELECT o_orderkey, o_custkey, o_orderstatus, "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS pm, "
            "epoch_us(o_orderdate) AS dt, o_orderpriority FROM orders), "
            "base AS (SELECT o_orderkey AS key, o_orderstatus AS status, "
            "CAST(concat('0x', substr(md5(o_orderkey || '|' || o_custkey "
            "|| '|' || o_orderstatus || '|' || pm || '|' || dt || '|' || "
            "o_orderpriority), 1, 15)) AS BIGINT) AS h FROM pr), "
            "snap AS (SELECT o_orderkey AS key, o_orderstatus AS status, "
            "CAST(concat('0x', substr(md5(o_orderkey || '|' || o_custkey "
            "|| '|' || o_orderstatus || '|' || "
            "(pm + CASE WHEN o_orderkey % 7 = 2 THEN 1000000 ELSE 0 END) "
            "|| '|' || dt || '|' || o_orderpriority), 1, 15)) AS BIGINT) "
            "AS h FROM pr WHERE o_orderkey % 11 != 3 "
            "UNION ALL "
            "SELECT o_orderkey + 1000000000, o_orderstatus, "
            "CAST(concat('0x', substr(md5((o_orderkey + 1000000000) || "
            "'|' || o_custkey || '|' || o_orderstatus || '|' || pm || "
            "'|' || dt || '|' || o_orderpriority), 1, 15)) AS BIGINT) "
            "FROM pr WHERE o_orderkey % 13 = 5), "
            "d AS (SELECT coalesce(b.status, s.status) AS status, "
            "CASE WHEN s.key IS NULL THEN 'removed' "
            "WHEN b.key IS NULL THEN 'added' "
            "WHEN b.h != s.h THEN 'changed' ELSE 'same' END AS kind "
            "FROM base b FULL OUTER JOIN snap s ON b.key = s.key) "
            "SELECT status, kind, CAST(count(*) AS BIGINT) AS n "
            "FROM d GROUP BY 1, 2"
        ),
        "user_seq3_support": (
            "WITH al AS (SELECT DISTINCT event_type FROM events), "
            "r AS (SELECT event_type, chr(96 + CAST(row_number() OVER ("
            "ORDER BY event_type) AS INT)) AS c FROM al), "
            "seq AS (SELECT user_id, "
            "string_agg(c, '' ORDER BY ts, event_id) AS s "
            "FROM events JOIN r USING (event_type) GROUP BY user_id), "
            "tr AS (SELECT a.c AS c1, b.c AS c2, d.c AS c3 "
            "FROM r a, r b, r d) "
            "SELECT c1 || c2 || c3 AS pattern, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM tr JOIN seq ON seq.s LIKE "
            "'%' || c1 || '%' || c2 || '%' || c3 || '%' "
            "GROUP BY 1"
        ),
        "order_priority_merge_revenue": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum((CAST(floor(l_extendedprice * 1000000) AS BIGINT) "
            "* (1000 - CAST(floor(l_discount * 1000) AS BIGINT))) // 1000) "
            "AS BIGINT) AS revenue_micro "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "order_cohort_revenue": (
            "WITH o AS (SELECT o_custkey, "
            "(date_part('year', o_orderdate) * 12 "
            "+ date_part('month', o_orderdate) - 1) - 23640 AS m, "
            "CAST(floor(o_totalprice * 1000000) AS BIGINT) AS pm "
            "FROM orders), "
            "c AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1) "
            "SELECT CAST(cohort AS BIGINT) AS cohort_month, "
            "CAST(m - cohort AS BIGINT) AS months_since, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(pm) AS BIGINT) AS revenue_micro "
            "FROM o JOIN c USING (o_custkey) GROUP BY 1, 2"
        ),
        "kg_symmetry_audit": (
            "WITH e AS (SELECT subj_canon AS s, pred, obj_canon AS o "
            f"FROM read_parquet('{edges_glob}') "
            "WHERE subj_canon != obj_canon), "
            "k AS (SELECT pred, least(s, o) AS lo, greatest(s, o) AS hi, "
            "min(CASE WHEN s < o THEN 1 ELSE 2 END) AS mn, "
            "max(CASE WHEN s < o THEN 1 ELSE 2 END) AS mx, "
            "count(*) AS n_e FROM e GROUP BY 1, 2, 3) "
            "SELECT pred, CAST(sum(n_e) AS BIGINT) AS n_edges, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(CASE WHEN mn = 1 AND mx = 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_symmetric FROM k GROUP BY 1"
        ),
        "kg_provenance_audit": (
            "SELECT pred, CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(sum(weight) AS BIGINT) AS sum_weight, "
            "CAST(sum(len(provenance)) AS BIGINT) AS n_prov_total, "
            "CAST(sum(CASE WHEN len(provenance) = least(weight, 8) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_cap_ok "
            f"FROM read_parquet('{edges_glob}') GROUP BY pred"
        ),
        "kg_pred_cardinality": (
            "WITH e AS (SELECT subj_canon, pred, obj_canon "
            f"FROM read_parquet('{edges_glob}')), "
            "od AS (SELECT pred, max(cnt) AS mo FROM (SELECT pred, "
            "subj_canon, count(*) AS cnt FROM e GROUP BY 1, 2) GROUP BY 1), "
            "id AS (SELECT pred, max(cnt) AS mi FROM (SELECT pred, "
            "obj_canon, count(*) AS cnt FROM e GROUP BY 1, 2) GROUP BY 1) "
            "SELECT pred, CAST(mo AS BIGINT) AS max_out, "
            "CAST(mi AS BIGINT) AS max_in, "
            "CASE WHEN mo = 1 AND mi = 1 THEN '1:1' "
            "WHEN mo = 1 THEN 'N:1' WHEN mi = 1 THEN '1:N' "
            "ELSE 'M:N' END AS card_class "
            "FROM od JOIN id USING (pred)"
        ),
        "link_truss_support": (
            "WITH h AS (SELECT url, decode(html) AS s FROM "
            f"read_parquet('{pages_glob}')), "
            "l AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS src_id, CAST(u AS BIGINT) AS dst_id "
            "FROM h, unnest(regexp_extract_all(s, "
            "'href=\"[^\"]*/p/(\\d+)\"', 1)) AS t(u)), "
            f"e AS (SELECT DISTINCT src_id % {_N_HOSTS} AS s, "
            f"dst_id % {_N_HOSTS} AS d FROM l), "
            "und AS (SELECT DISTINCT least(s, d) AS a, "
            "greatest(s, d) AS b FROM e WHERE s != d), "
            "nb AS (SELECT a AS u, b AS v FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "sup AS (SELECT u1.a, u1.b, (SELECT count(*) FROM nb x "
            "JOIN nb y ON x.v = y.v WHERE x.u = u1.a AND y.u = u1.b) "
            "AS s FROM und u1) "
            "SELECT CAST(s AS BIGINT) AS support, "
            "CAST(count(*) AS BIGINT) AS n_edges FROM sup GROUP BY 1"
        ),
        "purchase_attribution": (
            "WITH s AS (SELECT event_type, "
            "CAST(floor(value * 1000) AS BIGINT) AS vm, epoch_us(ts) AS us, "
            "last_value(CASE WHEN event_type != 'purchase' "
            "THEN event_type END IGNORE NULLS) OVER w AS prev_type, "
            "last_value(CASE WHEN event_type != 'purchase' "
            "THEN epoch_us(ts) END IGNORE NULLS) OVER w AS prev_us "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT CASE WHEN prev_us IS NOT NULL "
            "AND us - prev_us <= 3600000000 THEN prev_type "
            "ELSE 'direct' END AS attributed_type, "
            "CAST(count(*) AS BIGINT) AS n_purchases, "
            "CAST(sum(vm) AS BIGINT) AS value_milli "
            "FROM s WHERE event_type = 'purchase' GROUP BY 1"
        ),
        "event_markov_stationary": _markov_sql(),
        "user_k_anonymity": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "top AS (SELECT user_id, event_type AS top_type FROM "
            "(SELECT user_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY n DESC, event_type) AS rk "
            "FROM c) WHERE rk = 1), "
            "d AS (SELECT user_id, count(DISTINCT "
            "epoch_us(ts) // 86400000000) AS nd FROM events GROUP BY 1), "
            "u AS (SELECT top_type, CASE WHEN nd <= 1 THEN '1' "
            "WHEN nd <= 3 THEN '2-3' WHEN nd <= 7 THEN '4-7' "
            "ELSE '8+' END AS day_band FROM top JOIN d USING (user_id)), "
            "k AS (SELECT top_type, day_band, count(*) AS n_users "
            "FROM u GROUP BY 1, 2) "
            "SELECT top_type, day_band, CAST(n_users AS BIGINT) AS n_users, "
            "CAST(CASE WHEN n_users >= 5 THEN 1 ELSE 0 END AS BIGINT) "
            "AS k_anonymous FROM k"
        ),
        "event_changepoint": (
            "WITH daily AS (SELECT event_type, "
            "epoch_us(ts) // 86400000000 AS day, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "w AS (SELECT event_type, day, "
            "sum(n) OVER (PARTITION BY event_type ORDER BY day) AS s, "
            "row_number() OVER (PARTITION BY event_type ORDER BY day) "
            "AS r, count(*) OVER (PARTITION BY event_type) AS d_cnt, "
            "sum(n) OVER (PARTITION BY event_type) AS t_cnt FROM daily), "
            "dev AS (SELECT event_type, day, "
            "abs(d_cnt * s - t_cnt * r) AS dv, d_cnt, t_cnt, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY abs(d_cnt * s - t_cnt * r) DESC, day) AS rk "
            "FROM w) "
            "SELECT event_type, CAST(day AS BIGINT) AS cp_day, "
            "CAST(dv AS BIGINT) AS max_dev, "
            "CAST(d_cnt AS BIGINT) AS n_days, "
            "CAST(t_cnt AS BIGINT) AS total "
            "FROM dev WHERE rk = 1"
        ),
        "doc_source_simpson": (
            "WITH c AS (SELECT lang, source, count(*) AS n "
            "FROM documents GROUP BY 1, 2) "
            "SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs, "
            "CAST(sum(n * (n - 1)) AS VARCHAR) AS pairs_same_source, "
            "CAST(CASE WHEN sum(n) > 1 THEN "
            "sum(n * (n - 1)) * 1000000 // (sum(n) * (sum(n) - 1)) "
            "ELSE 0 END AS BIGINT) AS simpson_ppm "
            "FROM c GROUP BY 1"
        ),
        "doc_vocab_growth": (
            "WITH p AS (SELECT CAST(regexp_extract(url, '/p/(\\d+)$', 1) "
            "AS BIGINT) AS doc_id, "
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS t "
            f"FROM read_parquet('{pages_glob}')), "
            "tok AS (SELECT doc_id, lower(unnest(string_split_regex("
            "t, '\\s+'))) AS term FROM p WHERE t != ''), "
            "f AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1), "
            f"d AS (SELECT fd * 10 // {_corpus_n_pages(corpus_dir)} AS decile, "
            "count(*) AS n_new FROM f GROUP BY 1) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(n_new AS BIGINT) AS n_new_terms, "
            "CAST(sum(n_new) OVER (ORDER BY decile) AS BIGINT) "
            "AS cum_terms FROM d"
        ),
        "events_ewma_hourly": (
            "WITH RECURSIVE hourly AS (SELECT event_type, "
            "epoch_us(ts) // 3600000000 AS hour, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "ord AS (SELECT event_type, n, row_number() OVER ("
            "PARTITION BY event_type ORDER BY hour) AS i FROM hourly), "
            "rec(event_type, i, ewma, anom) AS ("
            "SELECT event_type, i, n, 0 FROM ord WHERE i = 1 "
            "UNION ALL "
            "SELECT o.event_type, o.i, (7 * r.ewma + o.n) // 8, "
            "r.anom + CASE WHEN o.n > 2 * r.ewma THEN 1 ELSE 0 END "
            "FROM rec r JOIN ord o ON o.event_type = r.event_type "
            "AND o.i = r.i + 1) "
            "SELECT event_type, CAST(i AS BIGINT) AS n_hours, "
            "CAST(ewma AS BIGINT) AS final_ewma, "
            "CAST(anom AS BIGINT) AS n_anomalies FROM rec r "
            "WHERE i = (SELECT max(i) FROM rec r2 "
            "WHERE r2.event_type = r.event_type)"
        ),
        "orders_merkle_root": (
            "WITH t AS (SELECT o_orderkey // 4096 AS part_id, "
            "CAST(concat('0x', substr(md5(concat("
            "CAST(o_orderkey AS VARCHAR), '|', "
            "CAST(o_custkey AS VARCHAR), '|', o_orderstatus, '|', "
            "CAST(CAST(floor(o_totalprice * 1000000) AS BIGINT) "
            "AS VARCHAR), '|', CAST(epoch_us(o_orderdate) AS VARCHAR), "
            "'|', o_orderpriority)), 1, 15)) AS BIGINT) AS h "
            "FROM orders), "
            "p AS (SELECT part_id, count(*) AS n_rows, "
            "bit_xor(h) AS checksum FROM t GROUP BY 1), "
            "leaf AS (SELECT string_agg(part_id || '|' || n_rows || "
            "'|' || checksum, ';' ORDER BY part_id) AS s, "
            "count(*) AS n_parts, sum(n_rows) AS total_rows FROM p) "
            "SELECT CAST(n_parts AS BIGINT) AS n_parts, "
            "CAST(total_rows AS BIGINT) AS total_rows, "
            "CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) "
            "AS root_u60 FROM leaf"
        ),
        "event_value_winsorized": (
            "WITH t AS (SELECT event_type AS g, "
            "CAST(floor(value * 1000) AS BIGINT) AS v, event_id "
            "FROM events), "
            "r AS (SELECT g, v, row_number() OVER (PARTITION BY g "
            "ORDER BY v, event_id) AS rk, "
            "count(*) OVER (PARTITION BY g) AS n FROM t), "
            "th AS (SELECT g, min(n) AS n, "
            "min(CASE WHEN rk = greatest(1, (5 * n + 99) // 100) "
            "THEN v END) AS vlo, "
            "min(CASE WHEN rk = (95 * n + 99) // 100 THEN v END) AS vhi "
            "FROM r GROUP BY g) "
            "SELECT t.g AS event_type, CAST(th.n AS BIGINT) AS n, "
            "CAST(th.vlo AS BIGINT) AS p5_milli, "
            "CAST(th.vhi AS BIGINT) AS p95_milli, "
            "CAST(sum(least(greatest(t.v, th.vlo), th.vhi)) AS BIGINT) "
            "AS winsorized_sum_milli "
            "FROM t JOIN th ON t.g = th.g GROUP BY 1, 2, 3, 4"
        ),
        "host_content_drift": _content_drift_sql(
            pages_glob, _N_HOSTS, _corpus_n_pages(corpus_dir)
        ),
        "order_price_drift": (
            "WITH b AS (SELECT epoch_us(o_orderdate) // 86400000000 "
            "AS day, CAST(least(greatest(floor(o_totalprice / 8000.0), "
            "0), 63) AS BIGINT) AS bin FROM orders), "
            "mm AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM b), "
            "c AS (SELECT CASE WHEN day >= (SELECT mid FROM mm) THEN 1 "
            "ELSE 0 END AS half, bin, count(*) AS n FROM b GROUP BY 1, 2), "
            "w AS (SELECT bin, "
            "sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS c1, "
            "sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS c2 "
            "FROM c GROUP BY 1), "
            "t AS (SELECT CAST(sum(c1) AS HUGEINT) AS n1, "
            "CAST(sum(c2) AS HUGEINT) AS n2 FROM w), "
            "s AS (SELECT sum((CAST(c1 AS HUGEINT) * (SELECT n2 FROM t) "
            "- CAST(c2 AS HUGEINT) * (SELECT n1 FROM t)) "
            "* (CAST(c1 AS HUGEINT) * (SELECT n2 FROM t) "
            "- CAST(c2 AS HUGEINT) * (SELECT n1 FROM t)) "
            "// (c1 + c2)) AS st, count(*) AS nb FROM w "
            "WHERE c1 + c2 > 0) "
            "SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_early, "
            "CAST((SELECT n2 FROM t) AS BIGINT) AS n_late, "
            "CAST(nb AS BIGINT) AS n_bins_used, "
            "CAST(st AS VARCHAR) AS drift_stat FROM s"
        ),
        "embedding_top_eigvec": _eigvec_sql(),
        "user_lorenz_curve": (
            "WITH u AS (SELECT user_id, "
            "sum(CAST(floor(value * 1000) AS BIGINT)) AS tv "
            "FROM events GROUP BY 1), "
            "t AS (SELECT user_id, tv, "
            "ntile(10) OVER (ORDER BY tv, user_id) AS decile FROM u), "
            "d AS (SELECT decile, count(*) AS n_users, sum(tv) AS v "
            "FROM t GROUP BY 1), "
            "tot AS (SELECT CAST(sum(v) AS HUGEINT) AS s FROM d) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(n_users AS BIGINT) AS n_users, "
            "CAST(v AS BIGINT) AS value_milli, "
            "CAST(CAST(sum(v) OVER (ORDER BY decile) AS HUGEINT) "
            "* 1000000 // (SELECT s FROM tot) AS BIGINT) "
            "AS cum_value_ppm FROM d"
        ),
        "page_boilerplate_lines": (
            "WITH p AS (SELECT url, text FROM "
            f"read_parquet('{pages_glob}')), "
            "l AS (SELECT DISTINCT url, line FROM (SELECT url, "
            "unnest(string_split(text, chr(10))) AS line FROM p) "
            "WHERE line != ''), "
            "df AS (SELECT line, count(*) AS df FROM l GROUP BY 1) "
            "SELECT line, CAST(df AS BIGINT) AS df FROM df "
            f"WHERE df >= greatest(2, {_corpus_n_pages(corpus_dir)} // 200) "
            "ORDER BY df DESC, line LIMIT 20"
        ),
        "kg_pred_patterns": (
            "WITH tr AS (SELECT url, subj, pred, obj "
            f"FROM read_parquet('{expected_glob}')), "
            "j AS (SELECT t.pred, t.subj, t.obj, p.text FROM tr t "
            f"JOIN (SELECT url, text FROM read_parquet('{pages_glob}')) p "
            "USING (url)), "
            "pos AS (SELECT pred, subj, obj, text, "
            "strpos(text, subj) AS sp FROM j), "
            "o AS (SELECT pred, sp, subj, obj, text, "
            "CASE WHEN sp > 0 THEN "
            "strpos(substr(text, sp + length(subj)), obj) ELSE 0 END "
            "AS op FROM pos), "
            "pat AS (SELECT pred, trim(regexp_replace("
            "substr(text, sp + length(subj), op - 1), '\\s+', ' ', 'g'), "
            "' ') AS pattern FROM o WHERE sp > 0 AND op > 0), "
            "c AS (SELECT pred, pattern, count(*) AS n FROM pat "
            "GROUP BY 1, 2), "
            "r AS (SELECT pred, pattern, n, row_number() OVER ("
            "PARTITION BY pred ORDER BY n DESC, pattern) AS rk FROM c) "
            "SELECT pred, pattern, CAST(n AS BIGINT) AS n "
            "FROM r WHERE rk <= 3"
        ),
        "events_hourly_ohlc": (
            "WITH t AS (SELECT event_type, "
            "epoch_us(ts) // 3600000000 AS hour, epoch_us(ts) AS us, "
            "event_id, CAST(floor(value * 1000) AS BIGINT) AS vm "
            "FROM events), "
            "w AS (SELECT event_type, hour, vm, "
            "row_number() OVER (PARTITION BY event_type, hour "
            "ORDER BY us, event_id) AS ra, "
            "row_number() OVER (PARTITION BY event_type, hour "
            "ORDER BY us DESC, event_id DESC) AS rd FROM t) "
            "SELECT event_type, CAST(hour AS BIGINT) AS hour, "
            "CAST(min(CASE WHEN ra = 1 THEN vm END) AS BIGINT) "
            "AS open_milli, "
            "CAST(max(vm) AS BIGINT) AS high_milli, "
            "CAST(min(vm) AS BIGINT) AS low_milli, "
            "CAST(min(CASE WHEN rd = 1 THEN vm END) AS BIGINT) "
            "AS close_milli, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM w GROUP BY 1, 2"
        ),
        "segment_priority_independence": (
            "WITH j AS (SELECT c_mktsegment AS seg, "
            "o_orderpriority AS pri FROM customer "
            "JOIN orders ON c_custkey = o_custkey), "
            "ob AS (SELECT seg, pri, count(*) AS n FROM j GROUP BY 1, 2), "
            "r AS (SELECT seg, sum(n) AS rn FROM ob GROUP BY 1), "
            "c AS (SELECT pri, sum(n) AS cn FROM ob GROUP BY 1), "
            "t AS (SELECT CAST(sum(n) AS HUGEINT) AS nn FROM ob), "
            "cells AS (SELECT r.seg, c.pri, "
            "CAST(r.rn AS HUGEINT) * CAST(c.cn AS HUGEINT) AS e, "
            "CAST(coalesce(ob.n, 0) AS HUGEINT) AS o "
            "FROM r CROSS JOIN c LEFT JOIN ob "
            "ON ob.seg = r.seg AND ob.pri = c.pri), "
            "s AS (SELECT count(*) AS nc, "
            "sum(((SELECT nn FROM t) * o - e) * "
            "((SELECT nn FROM t) * o - e) // e) AS st "
            "FROM cells WHERE e > 0) "
            "SELECT CAST((SELECT nn FROM t) AS BIGINT) AS n_orders, "
            "CAST(nc AS BIGINT) AS n_cells, "
            "CAST(st AS VARCHAR) AS indep_stat FROM s"
        ),
    }
