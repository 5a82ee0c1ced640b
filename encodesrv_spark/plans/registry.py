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
_HOISTED = (
    # Round-11 rotation (optimization round 2 of 2).  The r10 window
    # cleared the whole 28-entry queue (CORRECTNESS_r10: 50/50 green,
    # zero err), so every r10 entry rotates out and this queue is
    # exactly the r11 debt — forms changed for SPEED or robustness,
    # results identical (each re-verified green against the oracle at
    # both SFs in the same session as its edit; OPTIMIZATION_r11.md
    # carries the before/after evidence).
    #
    # referential_integrity_audit: the per-edge n_child is a FULL-TABLE
    # cardinality, so it now comes from the parquet footer
    # (catalog.table_rows, the r10 count()-removal idiom) instead of
    # four eagerly-checkpointed count aggregates fed through six
    # one-row crossJoins — jobs/execution 39 → 27, Exchanges 48 → 36.
    "referential_integrity_audit",
    # q2_min_cost_supplier: semi-join keys bound to their right-side
    # frames (ADVICE r10 robustness nit; resolved plan unchanged).
    "q2_min_cost_supplier",
    # funnel_latency: the click-stage checkpoint had exactly one
    # consumer (unlike funnel_conversion, where every stage feeds two)
    # — dropping it removes one serialized materialization job per
    # execution with zero added recompute (jobs 11 → 9).
    "funnel_latency",
    # embedding_density_clusters is hand-bumped (helper-only change in
    # operators/similarity.py::density_clusters): core_clusters/border
    # lost their eager checkpoints — after the r10 single-join assembly
    # they have 1-2 consumers that all live inside the final action
    # (jobs 54 → 48, interleaved A/B 3/3 pairs, median −0.74 s).
    "embedding_density_clusters",
    # token_cms_topk: both the top-20 rank and the sketch now derive
    # from ONE materialized token-frequency table (a cell's counter is
    # sum(exact_n) over the tokens hashing into it) — the second
    # corpus tokenize+explode pass is gone (final-frame Generate 8→4,
    # interleaved A/B 4/4 pairs, medians 1.52 → 1.13 s).
    "token_cms_topk",
    # repeated_ngram_audit: the census over the per-document-distinct
    # shingle index is a plain count, not a two-level countDistinct —
    # one (h, doc_id) exchange over the whole shingle stream removed
    # (Exchanges 8 → 6, stages 15 → 11; equivalence pinned by
    # tests/test_optimizations_r11.py).
    "repeated_ngram_audit",
)
# Window composition: 15 parity rows, then the _HOISTED queue in
# order, then the remaining slots (50 total) fill in module order
# (llm → …), refreshing the oldest still-valid driver rows.  Pinned by
# tests/test_plans.py::test_driver_window_composition; the queue must
# stay ≤ 35 entries or hoisted rows would fall outside the window
# (PROVENANCE.json's round debt is exactly this queue).


def form_hash(q: Query) -> str:
    """Content hash of a query's REGISTERED FORM — the function's source
    (decorator included, so the oracle template is covered too) plus the
    expanded oracle text.  This is exactly what a driver CORRECTNESS row
    evidences: if this hash changes, any prior driver row is stale for
    the query and a fresh row is owed (PROVENANCE.json +
    tests/test_provenance.py pin that debt mechanically).

    Scope limit, deliberate: the hash sees ONLY the registered fn's own
    source — an edit to a shared helper/operator the fn calls changes
    the shipped plan invisibly to it (and to the judge's worktree form
    diff, which compares the same thing).  Whoever edits a helper that
    alters a query's physical plan or execution behavior must hand-bump
    the affected queries (``tools/gen_provenance.py --bump``), after
    which the provenance test forces them into the next driver window —
    the r07 semdedup_prune precedent, mechanized."""
    import hashlib
    import inspect

    src = inspect.getsource(q.fn)
    return hashlib.md5(
        (src + "\x00" + (q.oracle or "")).encode()
    ).hexdigest()


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

    def rank(item: tuple[str, Query]) -> tuple[int, int, int]:
        name, q = item
        if name in _HOISTED:  # right after the parity block, in queue order
            return (0, 1, _HOISTED.index(name))
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        mod_rank = _MODULE_ORDER.index(mod) if mod in _MODULE_ORDER else len(_MODULE_ORDER)
        return (mod_rank, 0 if mod_rank == 0 else 2, 0)

    return dict(sorted(_REGISTRY.items(), key=rank))
