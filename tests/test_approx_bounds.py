"""Error-bound tests for the sketch query (`approx_stats`) — the one
registry entry with no DuckDB oracle (sketch internals are
engine-specific).  Instead of a hash match, assert the estimates sit
inside their published error envelopes against exact computations on
the same data, so the query is bounded-error-tested rather than merely
row-counted."""

from __future__ import annotations

import pyspark.sql.functions as F

from encodesrv_spark.catalog import load_table
from encodesrv_spark.plans.extended import approx_stats


def test_approx_stats_within_error_bounds(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in approx_stats(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("q50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("q95"),
            F.count("*").alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++ default relative standard deviation is 5%; 4 sigma is a
        # deterministic-in-practice envelope (the sketch itself is
        # deterministic for a fixed dataset — this guards against a
        # wiring bug like counting the wrong column, not randomness)
        for ac, ec in (("approx_orders", "orders"), ("approx_parts", "parts")):
            rel = abs(a[ac] - e[ec]) / max(e[ec], 1)
            assert rel < 0.20, f"{flag}.{ac}: {a[ac]} vs exact {e[ec]}"
        # percentile_approx(accuracy=10000) guarantees rank error
        # <= n/10000; translate to a value envelope via the exact
        # neighbor quantiles (loose but wiring-revealing: a swapped
        # quantile or column lands far outside)
        assert e["lo"] <= a["price_q50"] <= e["hi"]
        assert a["price_q50"] <= a["price_q95"] <= a["price_q99"] <= e["hi"]
        rel50 = abs(a["price_q50"] - e["q50"]) / max(abs(e["q50"]), 1e-9)
        rel95 = abs(a["price_q95"] - e["q95"]) / max(abs(e["q95"]), 1e-9)
        assert rel50 < 0.05, f"{flag}: q50 {a['price_q50']} vs exact {e['q50']}"
        assert rel95 < 0.05, f"{flag}: q95 {a['price_q95']} vs exact {e['q95']}"
