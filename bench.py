#!/usr/bin/env python
"""Benchmark harness: headline KG pipeline + representative operators.

Usage:
  python bench.py              # one run over $GRAFT_SF_DIR (default sf0.1)
                               # with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)
  python bench.py --scaling    # same job in fresh processes at 8 and 32
                               # CPUs -> throughputs + scaling efficiency

Prints ONE JSON line:
  {"metric": "kg_pipeline_e2e", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

The headline run is the full KG construction (HTML→text → NER actor
pool → relations → linking → canonicalize → edges/nodes) over the
synthetic pages corpus sized for the sf dir, writing to a FRESH output
directory (no checkpoint reuse).  Corpus generation and an initial
page-cache warm read are untimed.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.dataset as pads

    from gliner_cpp_ray.pipelines import queries as q
    from gliner_cpp_ray.pipelines.kg import KGPipelineConfig, run_kg_pipeline
    from gliner_cpp_ray.sources.pages import ensure_corpus, n_pages_for_sf

    n_pages = int(os.environ.get("KGRAY_BENCH_PAGES", "0")) or n_pages_for_sf(sf_dir)
    corpus = ensure_corpus(n_pages, q.KG_SEED)
    pages_dir = os.path.join(corpus, "pages")

    # warm OS page cache (untimed)
    pads.dataset(pages_dir).count_rows()

    out_root = f"/tmp/kgray_bench/run_{os.getpid()}"
    shutil.rmtree(out_root, ignore_errors=True)

    # leave ~4 cores for read/write/shuffle tasks on big hosts, ~25% on
    # small ones
    pool = max(2, int(num_cpus * 0.75), num_cpus - 4)
    cfg = KGPipelineConfig(
        ner_concurrency=(pool, pool),  # fixed-size pool: no autoscaling ramp
        link_concurrency=(1, max(1, num_cpus // 8)),
        shards=1,
    )

    # warm the Ray worker pool (untimed): task workers import the library
    # once; measured runs then see steady-state workers, as a long-lived
    # cluster would
    warm_root = out_root + "_warm"
    shutil.rmtree(warm_root, ignore_errors=True)
    warm_corpus = ensure_corpus(200, q.KG_SEED)
    run_kg_pipeline(os.path.join(warm_corpus, "pages"), warm_root, cfg)
    shutil.rmtree(warm_root, ignore_errors=True)
    t0 = time.perf_counter()
    run_kg_pipeline(pages_dir, out_root, cfg)
    kg_sec = time.perf_counter() - t0
    shutil.rmtree(out_root, ignore_errors=True)

    timings: dict[str, float] = {"kg_pipeline": round(kg_sec, 3)}

    # warm the registry's shared KG checkpoint (untimed): the KG-derived
    # queries read /tmp/kgray_out/<corpus>; without this the FIRST such
    # query absorbs a whole pipeline build into its own timing (r4l:
    # kg_entity_cards read 15.9 s when the operator itself costs ~4 s).
    # Skipped with the secondary queries — the scaling children time
    # only the headline pipeline and must not pay an extra build.
    if not os.environ.get("KGRAY_SKIP_SECONDARY"):
        q._run_kg(sf_dir)

    def timed(name, fn):
        t = time.perf_counter()
        res = fn(sf_dir)
        # consume lazily-built datasets so the pipeline actually runs
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = round(time.perf_counter() - t, 3)

    if not os.environ.get("KGRAY_SKIP_SECONDARY"):
        # incremental crawl ingestion: the base batch (~80% of pages) is
        # built untimed; the metric is the DELTA merge alone — NER over
        # the new pages plus the lineage-invalidated downstream stages.
        # (q_kg_incremental_edges itself is not timed: its cost is the
        # base pipeline again, already the headline metric.)
        from gliner_cpp_ray.pipelines.kg import run_kg_delta

        base_dir, delta_dir = q._incr_batches(corpus, n_pages)
        incr_out = f"/tmp/kgray_bench/incr_{os.getpid()}"
        shutil.rmtree(incr_out, ignore_errors=True)
        run_kg_pipeline(base_dir, incr_out, cfg)
        t0 = time.perf_counter()
        run_kg_delta(delta_dir, incr_out, cfg)
        timings["kg_delta_ingest"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(incr_out, ignore_errors=True)

        timed("page_links", q.q_page_links)
        timed("pagerank", q.q_pagerank)
        timed("hits", q.q_hits)
        timed("link_triangles", q.q_link_triangles)
        timed("anchor_texts", q.q_anchor_texts)
        timed("host_links", q.q_host_links)
        timed("host_stats", q.q_host_stats)
        timed("tfidf_topk", q.q_tfidf_topk)
        timed("bm25_topk", q.q_bm25_topk)
        # kg_inferred_country is NOT timed here: its cost is one more
        # KG-pipeline run (already the headline metric) plus a
        # vocabulary-bounded broadcast join — timing it would double-count
        # kg_pipeline in the bench budget
        timed("host_link_components", q.q_host_link_components)
        timed("personalized_pagerank", q.q_personalized_pagerank)
        timed("cocitation_topk", q.q_cocitation_topk)
        timed("host_reciprocity", q.q_host_reciprocity)
        timed("token_rarity_hist", q.q_token_rarity_hist)
        timed("source_mirror_overlap", q.q_source_mirror_overlap)
        timed("returned_revenue_topk", q.q_returned_revenue_topk)
        timed("fk_orphan_audit", q.q_fk_orphan_audit)
        timed("term_postings", q.q_term_postings)
        timed("media_frame_index", q.q_media_frame_index)
        timed("distinct_users_hll", q.q_distinct_users_hll)
        timed("large_order_customers", q.q_large_order_customers)
        timed("promo_revenue_ppm", q.q_promo_revenue_ppm)
        timed("brand_supplier_counts", q.q_brand_supplier_counts)
        timed("events_csv_roundtrip", q.q_events_csv_roundtrip)
        timed("docs_partitioned_roundtrip", q.q_docs_partitioned_roundtrip)
        timed("doc_keywords", q.q_doc_keywords)
        timed("frequent_part_pairs", q.q_frequent_part_pairs)
        timed("session_stats", q.q_session_stats)
        timed("user_value_outliers", q.q_user_value_outliers)
        timed("events_running_total", q.q_events_running_total)
        timed("events_burst_hours", q.q_events_burst_hours)
        timed("label_centroid_distances", q.q_label_centroid_distances)
        timed("kg_entity_cards", q.q_kg_entity_cards)
        timed("host_fetch_gaps", q.q_host_fetch_gaps)
        timed("user_value_gini", q.q_user_value_gini)
        timed("forecast_revenue_q6", q.q_forecast_revenue_q6)
        timed("orders_monthly_growth", q.q_orders_monthly_growth)
        timed("event_dwell_by_type", q.q_event_dwell_by_type)
        timed("embedding_quantize_int8", q.q_embedding_quantize_int8)
        timed("corpus_clean_survivors", q.q_corpus_clean_survivors)
        timed("rrf_fusion", q.q_rrf_fusion)
        timed("minhash_cluster_sizes", q.q_minhash_cluster_sizes)
        timed("order_first_ship_latency", q.q_order_first_ship_latency)
        timed("user_rfm_segments", q.q_user_rfm_segments)
        timed("doc_segment_dedup", q.q_doc_segment_dedup)
        timed("nation_trade_volume", q.q_nation_trade_volume)
        timed("wealthy_inactive_customers", q.q_wealthy_inactive_customers)
        timed("user_interarrival", q.q_user_interarrival)
        timed("user_customer_overlap", q.q_user_customer_overlap)
        timed("events_hourly_dense", q.q_events_hourly_dense)
        timed("label_embedding_centroid", q.q_label_embedding_centroid)
        timed("dedup_exact_docs", q.q_dedup_exact_docs)
        timed("minhash_clusters", q.q_minhash_clusters)
        timed("minhash_dedup_keep", q.q_minhash_dedup_keep)
        timed("leakage_safe_split", q.q_leakage_safe_split)
        timed("cms_term_counts", q.q_cms_term_counts)
        timed("ngram_jaccard_pairs", q.q_ngram_jaccard_pairs)
        timed("simhash_pairs", q.q_simhash_pairs)
        timed("customer_name_near_dup", q.q_customer_name_near_dup)
        timed("ngram_contamination", q.q_ngram_contamination)
        timed("pii_redact", q.q_pii_redact)
        timed("repetition_stats", q.q_repetition_stats)
        timed("dataset_mixture", q.q_dataset_mixture)
        timed("sequence_packing", q.q_sequence_packing)
        timed("token_counts", q.q_token_counts)
        timed("lang_id", q.q_lang_id)
        timed("ann_topk", q.q_ann_topk)
        timed("ann_topk_lsh", q.q_ann_topk_lsh)
        timed("ann_topk_ivf", q.q_ann_topk_ivf)
        timed("embedding_near_dup_lsh", q.q_embedding_near_dup_lsh)
        timed("embedding_dup_components", q.q_embedding_dup_components)
        timed("media_byte_stats", q.q_media_byte_stats)
        timed("distinct_users_kmv", q.q_distinct_users_kmv)
        timed("distinct_users_per_type", q.q_distinct_users_per_type)
        timed("docs_sample_by_lang", q.q_docs_sample_by_lang)
        timed("order_price_quantiles", q.q_order_price_quantiles)
        timed("term_doc_frequency", q.q_term_doc_frequency)
        timed("top_collocations", q.q_top_collocations)
        timed("top_terms_per_lang", q.q_top_terms_per_lang)
        timed("docs_above_median_chars", q.q_docs_above_median_chars)
        timed("event_props_k_stats", q.q_event_props_k_stats)
        timed("events_hourly", q.q_events_hourly)
        timed("latest_event_per_user", q.q_latest_event_per_user)
        timed("events_type_hour_rollup", q.q_events_type_hour_rollup)
        timed("order_price_ntile", q.q_order_price_ntile)
        timed("orders_zorder_files", q.q_orders_zorder_files)
        timed("events_jsonl_roundtrip", q.q_events_jsonl_roundtrip)
        timed("event_funnel", q.q_event_funnel)
        timed("weekly_retention", q.q_weekly_retention)
        timed("dup_substring_stats", q.q_dup_substring_stats)
        timed("events_rolling_value", q.q_events_rolling_value)
        timed("events_asof_order", q.q_events_asof_order)
        timed("events_in_order_window", q.q_events_in_order_window)
        timed("lineitem_europe_semi", q.q_lineitem_europe_semi)
        timed("lineitem_pricing", q.q_lineitem_pricing)
        timed("events_debounced", q.q_events_debounced)
        timed("lineitem_pareto", q.q_lineitem_pareto)
        timed("customers_inactive", q.q_customers_inactive)
        timed("top_building_orders", q.q_top_building_orders)
        timed("embedding_kmeans", q.q_embedding_kmeans)
        timed("user_event_pivot", q.q_user_event_pivot)
        timed("user_top_event_type", q.q_user_top_event_type)
        timed("events_value_delta", q.q_events_value_delta)
        timed("event_transitions", q.q_event_transitions)
        timed("embedding_moments", q.q_embedding_moments)
        timed("sliding_distinct_users", q.q_sliding_distinct_users)
        timed("docs_weighted_sample", q.q_docs_weighted_sample)
        timed("user_value_diff", q.q_user_value_diff)
        timed("bfs_hops", q.q_bfs_hops)
        timed("doc_chunks", q.q_doc_chunks)
        timed("user_value_decayed", q.q_user_value_decayed)
        timed("link_k_core", q.q_link_k_core)
        timed("event_seq_numbers", q.q_event_seq_numbers)
        timed("lineitem_profile", q.q_lineitem_profile)
        timed("custkey_overlap_kmv", q.q_custkey_overlap_kmv)
        timed("user_event_history", q.q_user_event_history)
        timed("order_price_histogram", q.q_order_price_histogram)
        timed("user_snapshot_applied", q.q_user_snapshot_applied)
        timed("lineitem_exact_median", q.q_lineitem_exact_median)
        timed("event_pairs_banded", q.q_event_pairs_banded)
        timed("user_median_value", q.q_user_median_value)
        timed("event_session_ids", q.q_event_session_ids)
        timed("doc_negative_samples", q.q_doc_negative_samples)
        timed("customer_golden_records", q.q_customer_golden_records)
        timed("trending_terms", q.q_trending_terms)
        timed("local_supplier_volume", q.q_local_supplier_volume)
        timed("user_order_join_skew", q.q_user_order_join_skew)
        timed("host_crawl_budget", q.q_host_crawl_budget)
        timed("user_value_mad", q.q_user_value_mad)
        timed("priority_revenue_share", q.q_priority_revenue_share)
        timed("degree_distribution", q.q_degree_distribution)
        timed("source_dup_rates", q.q_source_dup_rates)
        timed("kg_edge_timespan", q.q_kg_edge_timespan)
        timed("kg_negative_edges", q.q_kg_negative_edges)
        timed("host_route_costs", q.q_host_route_costs)
        timed("cust_order_distribution", q.q_cust_order_distribution)
        timed("small_qty_part_revenue", q.q_small_qty_part_revenue)
        timed("late_order_priority", q.q_late_order_priority)
        timed("top_supplier_revenue", q.q_top_supplier_revenue)
        timed("disjunctive_brand_revenue", q.q_disjunctive_brand_revenue)
        timed("waiting_suppliers", q.q_waiting_suppliers)
        timed("host_lang_mix", q.q_host_lang_mix)
        timed("charset_audit", q.q_charset_audit)
        timed("events_ipc_roundtrip", q.q_events_ipc_roundtrip)
        timed("events_trailing_1h", q.q_events_trailing_1h)
        timed("nation_part_margin", q.q_nation_part_margin)
        timed("regional_market_share", q.q_regional_market_share)
        timed("orders_zonemap_scan", q.q_orders_zonemap_scan)
        timed("docs_schema_union", q.q_docs_schema_union)
        timed("kg_entity_salience", q.q_kg_entity_salience)
        timed("events_contract_audit", q.q_events_contract_audit)
        timed("events_late_arrivals", q.q_events_late_arrivals)
        timed("join_size_stats", q.q_join_size_stats)
        timed("kg_edge_confidence", q.q_kg_edge_confidence)
        timed("near_dup_recall_report", q.q_near_dup_recall_report)
        timed("kg_pred_signatures", q.q_kg_pred_signatures)
        timed("user_first_touch", q.q_user_first_touch)
        timed("kg_ambiguous_surfaces", q.q_kg_ambiguous_surfaces)
        timed("kg_entity_components", q.q_kg_entity_components)
        timed("ship_priority_mix", q.q_ship_priority_mix)
        timed("doc_run_length_stats", q.q_doc_run_length_stats)
        timed("ann_topk_filtered", q.q_ann_topk_filtered)
        timed("events_windowed_admitted", q.q_events_windowed_admitted)
        timed("host_pagerank_mass", q.q_host_pagerank_mass)
        timed("doc_length_percentile", q.q_doc_length_percentile)
        timed("kg_two_hop_paths", q.q_kg_two_hop_paths)
        timed("event_value_quartile_by_type", q.q_event_value_quartile_by_type)
        timed("doc_sentence_stats", q.q_doc_sentence_stats)
        timed("event_type_trigrams", q.q_event_type_trigrams)
        timed("link_communities", q.q_link_communities)
        timed("events_nearest_order", q.q_events_nearest_order)
        timed("lineitem_corr_stats", q.q_lineitem_corr_stats)
        timed("user_activity_span", q.q_user_activity_span)
        timed("phrase_match_counts", q.q_phrase_match_counts)
        timed("session_type_pairs", q.q_session_type_pairs)
        timed("orders_weekday_profile", q.q_orders_weekday_profile)
        timed("kg_edge_trend", q.q_kg_edge_trend)
        timed("link_avg_neighbor_degree", q.q_link_avg_neighbor_degree)
        timed("ann_recall_report", q.q_ann_recall_report)
        timed("order_pareto_by_status", q.q_order_pareto_by_status)
        timed("kg_triple_pr_report", q.q_kg_triple_pr_report)
        timed("min_cost_supplier", q.q_min_cost_supplier)
        timed("part_value_share", q.q_part_value_share)
        timed("excess_part_suppliers", q.q_excess_part_suppliers)
        timed("event_type_trend_slopes", q.q_event_type_trend_slopes)
        timed("user_coverage_time", q.q_user_coverage_time)
        timed("lineitem_weighted_median", q.q_lineitem_weighted_median)
        timed("docs_with_all_terms", q.q_docs_with_all_terms)
        timed("event_type_lag_corr", q.q_event_type_lag_corr)
        timed("doc_lang_confusion", q.q_doc_lang_confusion)
        timed("kg_node_degree_profile", q.q_kg_node_degree_profile)
        timed("orders_range_bounds", q.q_orders_range_bounds)
        timed("orders_partition_checksums", q.q_orders_partition_checksums)
        timed("event_value_var_by_type", q.q_event_value_var_by_type)
        timed("new_users_daily", q.q_new_users_daily)
        timed("retrieval_rank_agreement", q.q_retrieval_rank_agreement)
        timed("kg_functional_violations", q.q_kg_functional_violations)
        timed("ner_span_length_profile", q.q_ner_span_length_profile)
        timed("orders_backlog_timeseries", q.q_orders_backlog_timeseries)
        timed("part_pair_lift", q.q_part_pair_lift)
        timed("hub_clustering_coeffs", q.q_hub_clustering_coeffs)
        timed("kg_edges_sort_audit", q.q_kg_edges_sort_audit)
        timed("dedup_normalized_docs", q.q_dedup_normalized_docs)
        timed("host_mention_density", q.q_host_mention_density)
        timed("events_peak_5min", q.q_events_peak_5min)
        timed("kg_entity_alias_recall", q.q_kg_entity_alias_recall)
        timed("embedding_norm_topk", q.q_embedding_norm_topk)
        timed("orders_octile_revenue", q.q_orders_octile_revenue)
        timed("orderkey_islands", q.q_orderkey_islands)
        timed("kg_orphan_nodes", q.q_kg_orphan_nodes)
        timed("link_assortativity_stats", q.q_link_assortativity_stats)
        timed("cms_error_report", q.q_cms_error_report)
        timed("kg_pred_pair_counts", q.q_kg_pred_pair_counts)
        timed("supplier_part_markup", q.q_supplier_part_markup)
        timed("events_benford_digits", q.q_events_benford_digits)
        timed("user_type_diversity", q.q_user_type_diversity)
        timed("kg_qid_profile", q.q_kg_qid_profile)
        timed("kg_mention_offset_audit", q.q_kg_mention_offset_audit)
        timed("events_cube", q.q_events_cube)
        timed("orders_snapshot_diff", q.q_orders_snapshot_diff)
        timed("user_seq3_support", q.q_user_seq3_support)
        timed("order_priority_merge_revenue",
              q.q_order_priority_merge_revenue)
        timed("order_cohort_revenue", q.q_order_cohort_revenue)
        timed("kg_symmetry_audit", q.q_kg_symmetry_audit)
        timed("kg_provenance_audit", q.q_kg_provenance_audit)
        timed("kg_pred_cardinality", q.q_kg_pred_cardinality)
        timed("link_truss_support", q.q_link_truss_support)
        timed("purchase_attribution", q.q_purchase_attribution)
        timed("event_markov_stationary", q.q_event_markov_stationary)
        timed("user_k_anonymity", q.q_user_k_anonymity)
        timed("event_changepoint", q.q_event_changepoint)
        timed("doc_source_simpson", q.q_doc_source_simpson)
        timed("doc_vocab_growth", q.q_doc_vocab_growth)
        timed("events_ewma_hourly", q.q_events_ewma_hourly)
        timed("orders_merkle_root", q.q_orders_merkle_root)
        timed("event_value_winsorized", q.q_event_value_winsorized)
        timed("host_content_drift", q.q_host_content_drift)
        timed("order_price_drift", q.q_order_price_drift)
        timed("embedding_top_eigvec", q.q_embedding_top_eigvec)
        timed("user_lorenz_curve", q.q_user_lorenz_curve)
        timed("page_boilerplate_lines", q.q_page_boilerplate_lines)
        timed("kg_pred_patterns", q.q_kg_pred_patterns)
        timed("events_hourly_ohlc", q.q_events_hourly_ohlc)
        timed("segment_priority_independence",
              q.q_segment_priority_independence)

    result = {
        "metric": "kg_pipeline_e2e",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / kg_sec, 2),
    }
    ray.shutdown()
    return result


def _scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Sandbox proxy for two cluster sizes (N vs 4N nodes): the same job
    on the same input in fresh processes at ``lo`` and ``hi`` CPUs.

    Uses a larger corpus (KGRAY_SCALING_PAGES, default 200k pages) than
    the plain bench so the job is compute-bound, as a 100 TB run would
    be — at sf0.1's 20k pages the whole pipeline finishes in seconds and
    fixed orchestration latency (job submit, actor spawn, shuffle
    barriers) would dominate the ratio."""
    scaling_pages = os.environ.get("KGRAY_SCALING_PAGES", "8000000")
    repeats = int(os.environ.get("KGRAY_SCALING_REPEATS", "1"))

    # generate the corpus ONCE here at full host parallelism, so the
    # 8-CPU child doesn't pay a many-minute generation bill
    import ray

    ray.init(
        address="local",
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from gliner_cpp_ray.pipelines.queries import KG_SEED
    from gliner_cpp_ray.sources.pages import ensure_corpus

    ensure_corpus(int(scaling_pages), KG_SEED)
    ray.shutdown()

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            KGRAY_BENCH_PAGES=scaling_pages,
            KGRAY_SKIP_SECONDARY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-N (BASELINE.md protocol): shields the ratio from
        # transient host noise
        return min((run_once(ncpu) for _ in range(repeats)), key=lambda r: r["value"])

    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "sf": r_lo["sf"],
        "n_pages": r_lo["n_pages"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(_run_bench(sf_dir, ncpu)))
