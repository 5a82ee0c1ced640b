"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion with the `noop` sink (full physical
execution, no driver collect — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from encodesrv_spark.plans.registry import all_queries
from encodesrv_spark.session import get_spark

# Headline set: the reference-shaped poll/claim pipeline, the TPC-H-shaped
# analytics, and (as they land) the LLM-pipeline extension operators.
HEADLINE = [
    "poll_topk",
    "claim_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_volume",
    "q6_forecast_revenue",
    "order_priority_semi",
    "top_customers_per_nation",
    "progress_pct",
    "dedup_exact",
    "dedup_minhash",
    "neardup_jaccard",
    "embedding_knn",
    "lang_id",
    "quality_score",
    "events_sessionize",
]


def time_query(spark, qs, name: str, sf_dir: str, reps: int = 3) -> float:
    """The frozen measurement discipline, in ONE place (bench headline,
    bench extras, and tools/scaling_curve.py all call this): execute to
    completion via the noop sink, `reps` measured runs, report the
    median.  Callers warm the query once at the same SF first."""
    import statistics as _st

    ts = []
    for _ in range(reps):
        t0 = time.time()
        qs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
    return round(_st.median(ts), 3)


def warm(spark, qs, name: str, sf_dir: str) -> None:
    qs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()


def _scan_control_df(spark, sf_dir: str):
    """The scan-bound drift control (VERDICT r06 #2): a q6-shaped
    filtered scan + ungrouped aggregate, defined HERE (not in the
    registry) so no registry edit can ever touch its form.  The three
    registered controls are all shuffle/window-dominated; the r06
    judge run showed them flat while every scan-dominated headline
    query ran +26-70% — the control family was missing the
    page-cache/scan-throughput axis this query pins."""
    from pyspark.sql import functions as F

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("v"))
    )


# Machine-state drift controls (VERDICT r05 #6 + r06 #2): the three
# registered queries are NEVER-TOUCHED (stable form since r03 or
# earlier) and shuffle/window-bound; "scan_filtered" is the bench-local
# scan-bound control above.  Together they span both resource axes this
# VM drifts on (shuffle/CPU and page-cache/scan throughput).
CONTROLS = ["events_ewma", "copurchase_degree_dist", "doc_token_entropy"]


def measure_controls(spark, qs, sf_dir: str) -> dict[str, float]:
    """One control snapshot under the frozen discipline (one warm-up
    already done by the caller's first snapshot; median-of-3)."""
    import statistics as _st

    out = {}
    for name in CONTROLS:
        if name in qs:
            out[name] = time_query(spark, qs, name, sf_dir)
    ts = []
    for _ in range(3):
        t0 = time.time()
        _scan_control_df(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
    out["scan_filtered"] = round(_st.median(ts), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = all_queries()

    # Warm the JVM outside the measured window: run every headline query
    # once at the measured SF so whole-stage-codegen compilation, Arrow
    # serializer setup, JIT, and the AQE-chosen physical plans are all
    # identical to the measured pass (standard steady-state
    # benchmarking; the measured numbers otherwise mix compile time
    # with execution time).
    for name in HEADLINE:
        if name in qs:
            warm(spark, qs, name, sf_dir)

    # Three measured reps per query, report the MEDIAN: a single rep at
    # ~1 s granularity is dominated by whichever query catches a GC
    # pause / noisy-neighbor stall (3-10x spikes observed on this box);
    # the median of 3 warm reps is robust to one such spike while not
    # under-reporting like min-of-reps can.
    timings = {
        name: time_query(spark, qs, name, sf_dir)
        for name in HEADLINE
        if name in qs
    }

    total = round(sum(timings.values()), 3)

    # Control snapshot 1 of 3, taken right after the headline loop: the
    # controls ride in the headline JSON itself so any future BENCH_r{N}
    # carries its own drift evidence (this VM's throughput drifts ±30%
    # across hours) — if the controls are elevated in lockstep with the
    # headline, the delta is machine state, not code.  Kept OUT of
    # `value`/`queries` so the headline metric stays comparable across
    # rounds.  Two more snapshots bracket the extras loop (VERDICT r06
    # #2: within-run drift moved the extras +50-70% while a single
    # once-measured control set stayed flat — three snapshots make the
    # drift self-adjudicating from the artifact alone).
    for name in CONTROLS:
        if name in qs:
            warm(spark, qs, name, sf_dir)
    _scan_control_df(spark, sf_dir).write.mode("overwrite").format("noop").save()
    controls = measure_controls(spark, qs, sf_dir)

    # Non-headline tracking (round-3+): newest operators, one warm-up +
    # one measured rep each.  Deliberately OUTSIDE `value`/`queries` so
    # the headline metric stays directly comparable across rounds
    # (methodology frozen in round 2: median-of-3 over the same 16).
    # PROTOCOL NOTE (r06): the three CONTROLS keys carry their
    # median-of-3 timings from the controls loop (not a fresh 1-rep) —
    # so their r06+ extras values are spike-suppressed where pre-r06
    # values were single samples; cross-round comparisons of those
    # three keys should prefer the headline JSON's `controls` object
    # (median-vs-median from r06 on).
    EXTRA = [
        "part_label_communities",
        "part_local_clustering",
        "bloom_prune_selective",
        "embedding_mmr_topk",
        "repeated_ngram_audit",
        "mixture_temperature_weights",
        "ann_recall_eval",
        "embedding_ivfpq_ann",
        "embedding_kmeans",
        "token_cms_topk",
        "gopher_quality_flags",
        "bpe_pair_stats",
        "bpe_merge_step",
        "token_zipf_fit",
        "embedding_jl_projection",
        "embedding_jl_ann",
        "semdedup_prune",
        "source_overlap_matrix",
        "neardup_containment",
        "events_ewma",
        "corpus_train_order",
        "minhash_estimate_error",
        "simhash_hamming_pairs",
        "embedding_density_clusters",
        "embedding_dim_stats",
        # round-3 batch 2/3
        "source_token_kl",
        "token_bigram_pmi",
        "doc_token_entropy",
        "embedding_sq8",
        "embedding_sq8_ann",
        "winsorize_values",
        "neardup_threshold_curve",
        "contrastive_pairs",
        "token_coverage_curve",
        "user_rfm_segments",
        "events_change_points",
        "tfidf_cosine_pairs",
        "embedding_norm_outliers",
        "part_edge_embeddedness",
        "quality_percentile_by_source",
        "dedup_cluster_size_hist",
        "embedding_top_pc",
        "token_burstiness",
        "doc_nearest_neighbor",
        "order_seasonality_index",
        "customer_order_gaps",
        "copurchase_degree_dist",
        "bigram_lm_perplexity",
        "doc_hash_features",
        "referential_integrity_audit",
        "revenue_trend_mann_kendall",
        "events_cusum",
        "part_kcore_peel",
        "multimodal_shared_frames",
        "source_dup_crosstab",
        "token_rank_stability",
        "order_backlog_timeseries",
        "token_position_bias",
        "price_benford_audit",
        "copurchase_assortativity",
        "source_template_headers",
        "order_fill_latency_sla",
        "events_dispersion_index",
        "events_autocorrelation",
        "doc_oov_rate",
        "user_concentration_hhi",
        "heaps_law_fit",
        "dedup_quality_gain",
        "embedding_intrinsic_dim",
        "corpus_dataset_card",
        "token_skipgram_pmi",
        "embedding_distance_histogram",
        "part_supplier_concentration",
        "events_weekend_effect",
        "doc_numeric_density",
        "part_price_dispersion",
        # round-6 growth
        "click_attribution_interval",
        # round-7 growth
        "bucketed_colocated_join",
        "part_scd2_price_history",
        "events_zorder_box_scan",
    ]
    # Round 8 (VERDICT r07 #3): extras now cover the ENTIRE registry —
    # the hand-ordered list above keeps its cross-round key order (so
    # per-query comparisons against old BENCH_EXTRAS stay aligned),
    # and every remaining registered query appends after it in registry
    # order.  BENCH_EXTRAS.json is thereby the one-stop cross-round
    # perf record: headline (median-of-3) + every other query (1 rep)
    # + the three control snapshots.
    EXTRA += [n for n in qs if n not in EXTRA and n not in HEADLINE]
    # The three controls stay listed in EXTRA so BENCH_EXTRAS keeps
    # their keys for cross-round comparison, but they are NOT re-run:
    # the controls loop already measured them under the stricter
    # median-of-3 discipline, so reuse those timings (~12 redundant
    # query executions saved per run).
    extra: dict[str, float] = dict(controls)
    todo = [n for n in EXTRA if n in qs and n not in extra]
    segments = {"start": controls}
    loadavg = {"start": round(os.getloadavg()[0], 2)}
    for i, name in enumerate(todo):
        if i == len(todo) // 2:
            # Control snapshot 2 of 3, mid-extras (VERDICT r06 #2).
            segments["middle"] = measure_controls(spark, qs, sf_dir)
            loadavg["middle"] = round(os.getloadavg()[0], 2)
        warm(spark, qs, name, sf_dir)
        extra[name] = time_query(spark, qs, name, sf_dir, reps=1)
    # Control snapshot 3 of 3, after the extras loop.
    segments["end"] = measure_controls(spark, qs, sf_dir)
    loadavg["end"] = round(os.getloadavg()[0], 2)

    # Hiccup re-read pass (ADVICE r10): this VM's throughput collapses
    # 5-20x for seconds at a time, so a 1-rep extras row can record a
    # stall as if it were the query's cost (r10 committed ~10 such rows
    # with the corrections living only in OPTIMIZATION_r10.md).  Every
    # row above a self-scaling threshold (3x the run's median extras
    # value — heavy queries and hiccups alike) gets two more measured
    # reps; the published value is the median of all three and the raw
    # triple is kept in `reread` so the artifact itself carries the
    # evidence.  First reads are preserved (old methodology's number);
    # the headline metric above is untouched (frozen median-of-3).
    import statistics as _st

    thresh = max(0.5, 3 * _st.median(v for k, v in extra.items() if k not in CONTROLS))
    reread: dict[str, list[float]] = {}
    for name in todo:
        if extra[name] >= thresh:
            reads = [extra[name]]
            for _ in range(2):
                reads.append(time_query(spark, qs, name, sf_dir, reps=1))
            reread[name] = reads
            extra[name] = round(_st.median(reads), 3)

    # The driver keeps a bounded TAIL of stdout and parses the LAST line as
    # the round's bench artifact.  Round 3 lost its headline number because
    # the single JSON line grew (16 headline + ~90 extras) past that capture
    # window, truncating the line's front (VERDICT r03 #1).  So: extras go
    # to their own file AND their own earlier stdout line; the FINAL line is
    # the compact headline-only JSON (frozen methodology: median-of-3 over
    # the same 16 queries since round 2).
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    extras_payload = json.dumps(
        {
            "extra": extra,
            "controls_segments": segments,
            "loadavg_1min": loadavg,
            "reread": reread,
            "sf": sf_val,
        }
    )
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTRAS.json"),
            "w",
        ) as fh:
            fh.write(extras_payload + "\n")
    except OSError:
        pass  # extras are best-effort; never block the headline line
    print(extras_payload)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "controls": controls,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
