"""SCD Type-2 dimension maintenance — versioned history for the
formats dimension.

The reference mutates `encode_formats` in place (it is plain Postgres
DDL, `schema.sql:29-52`), so "what parameters did job X encode with?"
is unanswerable after a format edit.  At pipeline scale the standard
fix is a slowly-changing-dimension type-2 table: every change CLOSES
the current version row (`valid_to`, `is_current=false`) and APPENDS a
new one, so any historical job joins to the version that was current
at its run time.

Spark-first shape: one broadcast-able join of the change batch against
the current slice detects real changes (no-op updates are dropped, so
history doesn't churn), and the result is a union of untouched rows,
closed rows, and new versions — a pure-DataFrame MERGE whose only
shuffle is the key join when the change batch is too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(dim: DataFrame, batch_ts: str) -> DataFrame:
    """Bootstrap a plain dimension into SCD2 shape (all rows current
    from `batch_ts`)."""
    return dim.select(
        "*",
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    hist: DataFrame, changes: DataFrame, key: str, tracked: list[str], batch_ts: str
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    For each change row whose `tracked` values differ from the current
    version (or whose key is new): close the old version at `batch_ts`
    and append the new one.  Unchanged keys and non-current history rows
    pass through untouched.  Deterministic — no generated ids, so the
    result is stable for the differential tests.
    """
    ts = F.lit(batch_ts).cast("timestamp")
    cur = hist.filter(F.col("is_current"))
    old = hist.filter(~F.col("is_current"))

    # A real change = key exists with any tracked column differing, or a
    # brand-new key. Null-safe compare so NULL -> value counts as a change.
    joined = cur.alias("c").join(F.broadcast(changes.alias("n")), key, "full_outer")
    diff = F.lit(False)
    for t in tracked:
        diff = diff | ~F.col(f"c.{t}").eqNullSafe(F.col(f"n.{t}"))
    is_new_key = F.col("c.is_current").isNull()
    changed_keys = joined.filter(
        F.col(f"n.{tracked[0]}").isNotNull() & (is_new_key | diff)
    ).select(key)

    closed = (
        cur.join(F.broadcast(changed_keys), key, "left_semi")
        .withColumn("valid_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    untouched = cur.join(F.broadcast(changed_keys), key, "left_anti")
    new_rows = scd2_init(
        changes.join(F.broadcast(changed_keys), key, "left_semi"), batch_ts
    )
    return old.unionByName(untouched).unionByName(closed).unionByName(new_rows)


def scd2_asof(hist: DataFrame, ts: str) -> DataFrame:
    """The dimension as it was at `ts` — the version whose validity
    interval covers the instant (a partition-pruned filter, no join)."""
    t = F.lit(ts).cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_from", "valid_to", "is_current")
