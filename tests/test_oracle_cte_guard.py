"""Static guard against the DuckDB CTE-inlining pathology (r07).

DuckDB inlines multiply-referenced CTEs by default, re-evaluating them
once PER REFERENCE — for an expensive CTE chain that multiplies: the
k-core peel oracle cost 178 s solo / 829 s under sweep concurrency at
sf0.1 until its CTEs were marked ``AS MATERIALIZED`` (0.5 s after),
and the same pattern silently inflated the whole MinHash/shingle
oracle family 2-8x (r07 audit: 16 oracles adopted materialization,
~200 s of sweep wall removed).

This test pins the discipline without running anything: every
(query, cte) pair where a registered oracle references a
non-materialized CTE ≥ 2 times must appear in the allowlist below.
Everything in the list was MEASURED this round — each owning oracle
runs < 1.5 s at sf0.1, or its materialization A/B was neutral
(fuzzy_pairs_levenshtein's cost is the Levenshtein join itself;
the small-relation embedding CTEs are cheap per evaluation).  Adding
a NEW oracle (or a new CTE to an old one) that multiply-references a
non-materialized CTE fails here: time it at sf0.1 first, then either
mark it ``AS MATERIALIZED`` or — if it is genuinely cheap — add it to
the list.  Removing a query or materializing a listed CTE also fails
(stale entry), keeping the list an honest inventory.
"""

from __future__ import annotations

import re

from encodesrv_spark.plans.registry import all_queries

ALLOWED_INLINE_MULTI_REF: set[tuple[str, str]] = {
    ("ann_recall_eval", "e"),
    ("ann_recall_eval", "q"),
    ("asof_join_purchases", "p"),
    ("asof_join_purchases", "s"),
    ("basket_part_pairs", "li"),
    ("basket_part_pairs", "single"),
    ("bigram_lm_perplexity", "bg"),
    ("bigram_lm_perplexity", "cb"),
    ("bigram_lm_perplexity", "cu"),
    ("bigram_lm_perplexity", "v"),
    ("bm25_search", "df"),
    ("bm25_search", "dl"),
    ("bm25_search", "tf"),
    ("bpe_merge_step", "top1"),
    ("click_attribution_interval", "c"),
    ("click_attribution_interval", "p"),
    ("cohort_retention", "e"),
    ("contrastive_pairs", "e"),
    ("contrastive_pairs", "q"),
    ("copurchase_assortativity", "deg"),
    ("copurchase_assortativity", "e"),
    ("copurchase_assortativity", "li"),
    ("copurchase_degree_dist", "e"),
    ("copurchase_degree_dist", "hist"),
    ("copurchase_degree_dist", "li"),
    ("copurchase_degree_dist", "tot"),
    ("corpus_dataset_card", "s"),
    ("corpus_train_order", "q"),
    ("dedup_embedding_cosine", "e"),
    ("dedup_quality_gain", "m"),
    ("dedup_quality_gain", "s"),
    ("doc_fingerprint", "h"),
    ("doc_oov_rate", "tok"),
    ("doc_oov_rate", "vocab"),
    ("doc_repetition_stats", "bgf"),
    ("doc_repetition_stats", "pos"),
    ("doc_repetition_stats", "toks"),
    ("doc_repetition_stats", "uni"),
    ("doc_token_entropy", "c"),
    ("doc_token_entropy", "d"),
    ("domain_mix_weights", "per"),
    ("embedding_ann_lsh", "e"),
    ("embedding_ann_lsh", "q"),
    ("embedding_dim_stats", "e"),
    ("embedding_distance_histogram", "binned"),
    ("embedding_distance_histogram", "d"),
    ("embedding_distance_histogram", "e"),
    ("embedding_distance_histogram", "tot"),
    ("embedding_intrinsic_dim", "e"),
    ("embedding_intrinsic_dim", "q"),
    ("embedding_ivf_ann", "c"),
    ("embedding_ivf_ann", "e"),
    ("embedding_ivf_ann", "q"),
    ("embedding_ivfpq_ann", "c"),
    ("embedding_ivfpq_ann", "e"),
    ("embedding_ivfpq_ann", "q"),
    ("embedding_ivfpq_ann", "r"),
    ("embedding_ivfpq_ann", "recon"),
    ("embedding_ivfpq_ann", "segs"),
    ("embedding_jl_ann", "coarse"),
    ("embedding_jl_ann", "e"),
    ("embedding_jl_ann", "proj"),
    ("embedding_jl_ann", "q"),
    ("embedding_jl_projection", "e"),
    ("embedding_kmeans", "a2"),
    ("embedding_kmeans", "c2"),
    ("embedding_kmeans", "e"),
    ("embedding_knn", "e"),
    ("embedding_knn", "q"),
    ("embedding_mmr_topk", "cand"),
    ("embedding_mmr_topk", "ce"),
    ("embedding_mmr_topk", "e"),
    ("embedding_mmr_topk", "ps"),
    ("embedding_mmr_topk", "q"),
    ("embedding_mmr_topk", "sel1"),
    ("embedding_mmr_topk", "sel2"),
    ("embedding_mmr_topk", "sel3"),
    ("embedding_mmr_topk", "sel4"),
    ("embedding_norm_outliers", "e"),
    ("embedding_norm_outliers", "mad"),
    ("embedding_norm_outliers", "med"),
    ("embedding_pq_ann", "e"),
    ("embedding_pq_ann", "q"),
    ("embedding_pq_ann", "r"),
    ("embedding_pq_ann", "recon"),
    ("embedding_pq_ann", "segs"),
    ("embedding_pq_codes", "e"),
    ("embedding_pq_codes", "segs"),
    ("embedding_sq8", "e"),
    ("embedding_sq8_ann", "deq"),
    ("embedding_sq8_ann", "e"),
    ("embedding_sq8_ann", "q"),
    ("embedding_top_pc", "c"),
    ("embedding_top_pc", "e"),
    ("embedding_top_pc", "s1"),
    ("embedding_top_pc", "s2"),
    ("events_autocorrelation", "w"),
    ("events_change_points", "lagd"),
    ("events_change_points", "m"),
    ("events_change_points", "s"),
    ("events_cusum", "h"),
    ("events_cusum", "s"),
    ("events_cusum", "w"),
    ("events_ewma", "w"),
    ("events_moving_avg", "w"),
    ("events_sessionize", "w"),
    ("events_weekend_effect", "s"),
    ("funnel_conversion", "c"),
    ("funnel_conversion", "e"),
    ("funnel_conversion", "v"),
    ("funnel_latency", "c"),
    ("funnel_latency", "v"),
    ("fuzzy_pairs_levenshtein", "d"),
    ("heaps_law_fit", "cps"),
    ("heaps_law_fit", "s"),
    ("heaps_law_fit", "tok"),
    ("label_centroid_cohesion", "e"),
    ("length_histogram", "h"),
    ("lineitem_dq_audit", "base"),
    ("minhash_lsh_pairs", "bands"),
    ("minhash_lsh_pairs", "sig"),
    ("mixture_temperature_weights", "per"),
    ("mixture_temperature_weights", "pw"),
    ("multimodal_shared_frames", "idx"),
    ("multimodal_shared_frames", "idx0"),
    ("order_backlog_timeseries", "spans"),
    ("order_seasonality_index", "avg_m"),
    ("order_seasonality_index", "g"),
    ("order_set_ops", "y96"),
    ("order_set_ops", "y97"),
    ("order_value_percentiles", "w"),
    ("part_copurchase_triangles", "deg"),
    ("part_copurchase_triangles", "e"),
    ("part_copurchase_triangles", "li"),
    ("part_copurchase_triangles", "o"),
    ("part_edge_embeddedness", "deg"),
    ("part_edge_embeddedness", "ecnt"),
    ("part_edge_embeddedness", "o"),
    ("part_edge_embeddedness", "tri"),
    ("part_kcore_peel", "v1"),
    ("part_kcore_peel", "v2"),
    ("part_kcore_peel", "v3"),
    ("part_label_communities", "und"),
    ("part_local_clustering", "deg"),
    ("part_local_clustering", "o"),
    ("part_local_clustering", "tn"),
    ("part_local_clustering", "tri"),
    ("part_supplier_concentration", "hhi"),
    ("price_benford_audit", "obs"),
    ("price_benford_audit", "tot"),
    ("printf_pattern", "d"),
    ("progress_pct", "w"),
    ("q11_important_stock", "val"),
    ("q15_top_supplier", "rev"),
    ("q2_min_cost_supplier", "eligible"),
    ("q2_min_cost_supplier", "ps"),
    ("quality_decile_bands", "gterm"),
    ("quality_decile_bands", "tf"),
    ("quality_drift_by_source", "gterm"),
    ("quality_drift_by_source", "tf"),
    ("quality_percentile_by_source", "j"),
    ("quality_percentile_by_source", "q"),
    ("quality_percentile_by_source", "s"),
    ("quality_percentile_by_source", "t"),
    ("quality_percentile_by_source", "w"),
    ("quality_score", "s"),
    ("revenue_trend_mann_kendall", "m"),
    ("semdedup_prune", "e"),
    ("semdedup_prune", "m"),
    ("simhash_hamming_pairs", "blocks"),
    ("source_lang_entropy", "c"),
    ("source_lang_entropy", "s"),
    ("source_overlap_matrix", "d"),
    ("source_template_headers", "c"),
    ("source_template_headers", "tot"),
    ("source_token_kl", "c"),
    ("source_token_kl", "s"),
    ("supplier_pareto_abc", "rev"),
    ("tfidf_cosine_pairs", "df"),
    ("tfidf_cosine_pairs", "n"),
    ("tfidf_cosine_pairs", "nrm"),
    ("tfidf_cosine_pairs", "tf"),
    ("tfidf_cosine_pairs", "w"),
    ("token_bigram_pmi", "c"),
    ("token_cms_topk", "probe"),
    ("token_cms_topk", "sk"),
    ("token_cms_topk", "toks"),
    ("token_cms_topk", "top"),
    ("token_coverage_curve", "c"),
    ("token_coverage_curve", "cuts"),
    ("token_coverage_curve", "ranked"),
    ("token_coverage_curve", "tot"),
    ("token_skipgram_pmi", "c"),
    ("trade_pagerank", "edges"),
    ("trade_pagerank", "nodes"),
    ("trade_pagerank", "outw"),
    ("trade_pagerank", "r0"),
    ("trade_pagerank", "r1"),
    ("trade_pagerank", "r2"),
    ("unigram_lm_score", "gterm"),
    ("unigram_lm_score", "tf"),
    ("user_rfm_segments", "u"),
    ("value_anomaly_mad", "dev"),
    ("value_anomaly_mad", "mad"),
    ("value_anomaly_mad", "med"),
}


def _multi_ref_inline_ctes() -> set[tuple[str, str]]:
    found = set()
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        sql = q.oracle
        for c in set(re.findall(r"(\w+)\s+AS\s*(?:MATERIALIZED\s*)?\(", sql)):
            refs = len(re.findall(rf"\b{c}\b", sql)) - 1
            if refs >= 2 and not re.search(rf"\b{c} AS MATERIALIZED \(", sql):
                found.add((name, c))
    return found


def test_multi_ref_inline_ctes_are_allowlisted():
    found = _multi_ref_inline_ctes()
    new = sorted(found - ALLOWED_INLINE_MULTI_REF)
    stale = sorted(ALLOWED_INLINE_MULTI_REF - found)
    assert not new, (
        "new multiply-referenced NON-materialized oracle CTEs — time each "
        "owning oracle at sf0.1, then materialize or allowlist: " + repr(new)
    )
    assert not stale, "stale allowlist entries (remove them): " + repr(stale)
