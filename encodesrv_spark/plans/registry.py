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
    "embedding_ivfpq_ann",
    "embedding_kmeans",
    "doc_chunks",
    "chunk_dup_stats",
    "token_cms_topk",
    "part_copurchase_triangles",
    "part_label_communities",
    "part_local_clustering",
    "bloom_prune_selective",
    "embedding_mmr_topk",
    "repeated_ngram_audit",
    "mixture_temperature_weights",
    "ann_recall_eval",
    # round-3 batch 2 (plans/mining.py) — with these the window is
    # exactly 15 parity + 35 hoisted = 50
    "source_token_kl",
    "token_bigram_pmi",
    "doc_token_entropy",
    "embedding_sq8",
    "winsorize_values",
    "neardup_threshold_curve",
    "contrastive_pairs",
)


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
