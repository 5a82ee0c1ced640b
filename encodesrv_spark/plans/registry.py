"""Query registry — the single source of truth for the engine's query
surface.

Every operator in SURVEY.md §2 (plus the LLM-pipeline extensions) is
declared here as a named pair:

* a Spark callable ``fn(spark, sf_dir) -> DataFrame`` (the engine), and
* an optional ANSI-SQL oracle string DuckDB runs on the same parquet
  tables (the correctness gate).  ``oracle=None`` marks genuinely
  non-SQL-expressible ops (the driver records a weaker rows-only check).

Column names must match exactly between the two — the driver sorts
columns by name before value-hashing.  Floating-point outputs are
rounded identically on both sides; timestamps are rendered as strings
so both engines agree byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver's correctness harness samples the FIRST N registry entries
# (r01 sampled exactly the first 50 in dict order), so ordering is a
# deliverable: SURVEY §2 reference-parity queries lead, then the LLM
# dedup/similarity core, then the TPC-H shape suites, then the rest.
# Within a module, definition order is preserved (stable sort).
_MODULE_ORDER = ("parity", "llm", "tpch", "tpch_deep", "corpus", "extended")

# Hoisted individually into the driver's sample window regardless of
# module: the newest operators that do not yet have a driver-green
# CORRECTNESS row get priority slots right after the parity block.
# approx_stats (oracle=None, rows-only by design) is deliberately NOT
# hoisted — an untestable query must not occupy a hard-gate slot.
_HOISTED = (
    # Round-4 rotation (VERDICT r03 #2): the 50-slot driver window is
    # 15 parity (pinned, the literal reference bar) + these 35.  All but
    # one are FIRST-TIMERS — queries with no green row in any of
    # CORRECTNESS_r01-r03 — draining the 70-query evidencing backlog at
    # the maximum possible rate (34 this round, the remaining 36 next).
    # The one non-first-timer is semdedup_prune: its registered form
    # changed this round (k now derived from corpus size, VERDICT #3
    # "What's wrong"), so its r03 row no longer evidences the shipped
    # code and it must re-earn a driver row.
    "semdedup_prune",
    # verdict-named priorities
    "multimodal_shared_frames",
    "referential_integrity_audit",
    # extended (never driver-checked)
    "funnel_latency",
    "hourly_profile",
    "part_edge_embeddedness",
    "part_kcore_peel",
    # mining (never driver-checked)
    "embedding_sq8_ann",
    "token_coverage_curve",
    "user_rfm_segments",
    "events_change_points",
    "tfidf_cosine_pairs",
    "embedding_norm_outliers",
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
    "revenue_trend_mann_kendall",
    "events_cusum",
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
)

# Round-5 rotation queue (the rest of the never-driver-checked backlog,
# 36 names): doc_oov_rate, user_concentration_hhi, heaps_law_fit,
# dedup_quality_gain, embedding_intrinsic_dim, corpus_dataset_card,
# token_skipgram_pmi, embedding_distance_histogram,
# part_supplier_concentration, events_weekend_effect,
# doc_numeric_density, part_price_dispersion, and the 24 tpch/tpch_deep
# suite queries (q1..q22 + order_priority_semi, top_customers_per_nation,
# customers_no_urgent_anti) — all hash-green in the repo's own all-204
# oracle run every round; they queue here only for DRIVER evidencing.
# Registry growth is frozen until this queue clears (VERDICT r03 #2).


def all_queries() -> dict[str, Query]:
    """Import all plan modules (side-effect registration) and return the
    map, ordered so the driver's first-N sample covers the §2 parity set
    and the LLM core."""
    # Imports deferred so `import encodesrv_spark` stays cheap.
    from encodesrv_spark.plans import (  # noqa: F401
        corpus,
        curation,
        extended,
        llm,
        mining,
        parity,
        tpch,
        tpch_deep,
    )

    def rank(item: tuple[str, Query]) -> tuple[int, int]:
        name, q = item
        if name in _HOISTED:  # right after the parity block
            return (0, 1)
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        mod_rank = _MODULE_ORDER.index(mod) if mod in _MODULE_ORDER else len(_MODULE_ORDER)
        return (mod_rank, 0 if mod_rank == 0 else 2)

    return dict(sorted(_REGISTRY.items(), key=rank))
