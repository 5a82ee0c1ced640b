"""Incremental aggregate maintenance — update a stored rollup with a
delta batch instead of recomputing from scratch.

The 100 TB pattern: a daily/hourly rollup over an append-only fact
stream must not re-scan history every cycle.  Decomposable aggregates
(count/sum/min/max — and avg as sum/count, variance as moment sums,
distinct as HLL sketches) maintain exactly under partial merge:

    agg(base ∪ delta) = merge(agg(base), agg(delta))

so each cycle aggregates ONLY the new partition and merges
group-by-group with the stored result — work proportional to the
delta, not the history.  This is the batch form of what Structured
Streaming's stateful aggregation does per micro-batch (state store =
the stored partials), and the engine form of the reference's
"update status in place, don't recompute the queue"
(/root/reference/encodesrv/job.py:59-66).

Non-decomposable exact aggregates (exact median, exact distinct) don't
merge — at scale they become their sketch twins (percentile_approx /
HLL), which do.  `hll_merge_distinct` covers the distinct case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# additive partial columns produced by `partials` / consumed by `merge`
_PARTIAL_COLS = ("n", "total", "vmin", "vmax")


def partials(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Per-group decomposable partials of ``value``: count, sum, min,
    max (avg is derived at read time as total/n — never stored, stored
    averages don't merge)."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value).alias("total"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
    )


def merge(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial tables group-by-group.

    union + re-aggregate (sum the sums, min the mins) rather than a
    full outer join: one shuffle keyed on the group, no null-handling
    matrix for groups present on only one side, and the same plan
    works for N-way merges (union all N partial tables)."""
    both = base.select(*keys, *_PARTIAL_COLS).unionByName(
        delta.select(*keys, *_PARTIAL_COLS)
    )
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize(partial: DataFrame, avg_name: str = "vavg") -> DataFrame:
    """Derive the non-stored aggregates (avg) from merged partials.

    The division runs in double (cast first): when `total` is an exact
    DECIMAL partial (the order-independent money form — see
    functions/exact.py) this keeps the result deterministic without
    inheriting engine-specific decimal-division scale rules."""
    return partial.withColumn(avg_name, F.col("total").cast("double") / F.col("n"))


def hll_partials(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Per-group HyperLogLog sketches of ``value`` — the mergeable form
    of COUNT(DISTINCT).  Exact distinct does not decompose; sketches
    union losslessly (sketch-wise OR of registers), which is what makes
    incremental distinct-user counts possible at all at scale."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(value).alias("hll"))


def hll_merge_estimate(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Union per-group sketches from two partial tables and estimate
    the merged distinct count."""
    both = base.select(*keys, "hll").unionByName(delta.select(*keys, "hll"))
    return both.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )


def join_view_delta(
    left: DataFrame,
    delta_left: DataFrame,
    right: DataFrame,
    delta_right: DataFrame,
    on,
) -> DataFrame:
    """Delta rows of the inner-join view ``V = L ⋈ R`` under
    insert-only deltas on both inputs:

        ΔV = (ΔL ⋈ R) ∪ ((L ∪ ΔL) ⋈ ΔR)

    The asymmetric decomposition counts the cross term ΔL ⋈ ΔR exactly
    once — the classic IVM double-count trap is joining the POST-image
    on both terms ((L∪ΔL) ⋈ ΔR ∪ ΔL ⋈ (R∪ΔR) contains ΔL ⋈ ΔR twice).
    The maintained view is ``V_old ∪ ΔV``; per-cycle work is two joins,
    each delta-sized on one side, never a recompute of \\|L ⋈ R\\| — the
    join-view analogue of ``merge`` for decomposable aggregates.

    Deliberately NO broadcast hint on the delta sides: they are
    micro-batch-sized in the maintenance loop this models, so AQE
    broadcasts them at runtime, while a backfill-sized delta degrades
    to an honest shuffle join instead of a forced-broadcast OOM (the
    100 TB posture rule).

    Deletion-bearing feeds need the counting algebra — that is
    ``join_view_delta_signed``."""
    return delta_left.join(right, on).unionByName(
        left.unionByName(delta_left).join(delta_right, on)
    )


def join_view_delta_signed(
    left: DataFrame,
    delta_left: DataFrame,
    right: DataFrame,
    delta_right: DataFrame,
    on,
    mult: str = "_mult",
) -> DataFrame:
    """``join_view_delta`` lifted to DELETION-BEARING feeds: every
    input carries a signed multiplicity column ``mult`` (+k insert k
    copies, −k delete k copies — the z-set/DBSP representation, public
    algebra), and because the join is BILINEAR in multiplicities the
    same two-term decomposition maintains the view exactly:

        ΔV = (ΔL ⋈ R) ∪ ((L ⊎ ΔL) ⋈ ΔR),   mult(v) = mult(l)·mult(r)

    The sign products do the bookkeeping no row-level algebra could:
    a row deleted on BOTH sides enters the two single-side terms at −1
    each and the cross term at (−1)·(−1) = +1, netting the correct −1.
    Inputs need not be consolidated (``L ⊎ ΔL`` is just unionByName —
    multiset sum); downstream LINEAR aggregates (count → Σmult, sums →
    Σmult·x) read the signed view directly, so the view-wide
    group-by-all-columns consolidation is never on the maintenance
    path — it is a lazy, amortized compaction for point-lookup
    consumers, exactly the z-order-maintain trade."""
    lm, rm = f"_l{mult}", f"_r{mult}"
    lL = left.withColumnRenamed(mult, lm)
    dL = delta_left.withColumnRenamed(mult, lm)
    rR = right.withColumnRenamed(mult, rm)
    dR = delta_right.withColumnRenamed(mult, rm)

    def _prod(df: DataFrame) -> DataFrame:
        return df.withColumn(mult, F.col(lm) * F.col(rm)).drop(lm, rm)

    return _prod(dL.join(rR, on)).unionByName(
        _prod(lL.unionByName(dL).join(dR, on))
    )


def apply_feed(
    partial: DataFrame, feed: DataFrame, keys: list[str], value: str
) -> DataFrame:
    """Maintain (n, total) partials from a change-data feed
    (`JobStore.changes` shape: rows tagged `_change_type`) instead of a
    delta snapshot: insert/update_postimage add, delete/update_preimage
    subtract.  Groups whose count reaches zero drop out.

    Only INVERTIBLE aggregates survive deletion-bearing feeds — counts
    and sums subtract, min/max do not (a deleted minimum needs a
    rescan or an auxiliary structure).  That asymmetry is why this
    returns the (n, total) subset of `partials`' schema; pair with the
    full partials on append-only streams."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        F.sum(sign * F.col(value)).alias("total"),
    )
    both = partial.select(*keys, "n", "total").unionByName(delta)
    return (
        both.groupBy(*keys)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .filter(F.col("n") > 0)
    )
