"""applyInPandasWithState: keyed running state across micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from encodesrv_spark.streaming.stateful import running_user_totals


def test_running_user_totals(spark, tmp_path, sf_dir):
    from encodesrv_spark.catalog import load_table

    src = str(tmp_path / "events_src")
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per user must equal the batch aggregate
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY batches DESC) rn
                 FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert got == want
