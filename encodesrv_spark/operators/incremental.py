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
