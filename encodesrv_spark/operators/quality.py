"""Data-quality audit operator — declarative expectation checks in one
scan.

The reference's quality control is per-row defensive try/except that
turns bad rows into 'Error' status (/root/reference/encodesrv/job.py:
110-113, 180-183).  The set-oriented engine form is a RULE TABLE: each
rule is (name, violation predicate), all rules evaluate in a single
pass as conditional-sum aggregates (map-side combinable — the scan
cost is one read regardless of rule count), and the report is one row
per rule with violation counts and rates.  This is the Delta
constraints / expectations pattern: at 100 TB you run the audit on the
ingest increment, gate the batch on the report, and route violating
rows with the same predicates as filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass rule audit: ``rules`` maps rule name → VIOLATION
    predicate.  Returns one row per rule: (rule, violations, n_rows,
    violation_rate), computed from a single aggregate over ``df`` —
    adding rules never adds scans.
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs, F.count("*").alias("__n"))
    long = wide.unpivot(["__n"], list(rules), "rule", "violations")
    return long.select(
        "rule",
        "violations",
        F.col("__n").alias("n_rows"),
        F.round(F.col("violations") * 1.0 / F.col("__n"), 6).alias(
            "violation_rate"
        ),
    )


def violating_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """The row-level companion: rows failing ANY rule, tagged with the
    array of failed rule names (dead-letter routing input)."""
    failed = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("failed_rules", failed).filter(
        F.size("failed_rules") > 0
    )
