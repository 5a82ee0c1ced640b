"""Error-bound tests for the sketch query (`approx_stats`).

Since round 5 the query ships its own accuracy audit: per group it
emits the exact row count plus booleans asserting each sketch estimate
honors its documented bound (HLL++ NDV within 15% of exact; each
percentile_approx value's exact rank within ±0.01 of target).  The
DuckDB oracle computes the same contract from exact values (`true` per
group), so the driver hash-compares the audit.  This test pins the
Spark side independently: every audit boolean must be true, and the
exact columns must match a separately-computed exact aggregate (guards
wiring bugs like counting the wrong column, which the all-true oracle
alone would only catch if the bound actually broke)."""

from __future__ import annotations

import pyspark.sql.functions as F

from encodesrv_spark.catalog import load_table
from encodesrv_spark.plans.extended import approx_stats


def test_approx_stats_audit_all_green(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in approx_stats(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, a in rows.items():
        assert a["n_rows"] == exact[flag]["n"]
        for c in (
            "orders_est_ok",
            "parts_est_ok",
            "q50_rank_ok",
            "q95_rank_ok",
            "q99_rank_ok",
        ):
            assert a[c] is True, f"{flag}.{c} audit failed"
