"""Structured Streaming operators.

The reference is a hand-rolled processing-time micro-batch system with
no watermarks, no event-time windows, no late-data story (SURVEY.md
§2.9).  This module supplies both:

* the faithful analog — a processing-time poll trigger driving
  foreachBatch claim cycles (ST1-ST3), and
* the event-time machinery the reference lacks — watermarked tumbling
  windows and session windows over the events stream, which is what a
  100 TB deployment would actually run for job/status telemetry.

All builders take a streaming DataFrame and return a streaming
DataFrame/query factory, so tests can drive them with file sources +
availableNow and production can swap in Kafka unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from encodesrv_spark.functions.exact import exact_sum, money_round

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source events stream (tests drop parquet/json files into
    `path`; production points at Kafka with the same downstream ops)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """ST-analog of events_hourly: tumbling 1 h window + watermark so
    state for closed windows is dropped (bounded memory at scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            money_round(exact_sum("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming twin of events_sessionize: native session_window with
    the same 30-minute inactivity gap."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def poll_loop_stream(
    spark: SparkSession,
    on_batch: Callable[[DataFrame, int], None],
    interval: str | None = "60 seconds",
) -> DataStreamWriter:
    """The reference's 60 s poll loop as a Structured Streaming query
    (ST1): a rate source ticks; each tick drives one foreachBatch claim
    cycle (`on_batch` is Scheduler.run_cycle wrapped).  interval=None →
    availableNow (drain-and-stop, used by tests)."""
    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    writer = ticks.writeStream.foreachBatch(
        lambda df, epoch: on_batch(df, epoch)
    ).outputMode("append")
    if interval:
        return writer.trigger(processingTime=interval)
    return writer.trigger(availableNow=True)


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once event dedup: drop repeated event_ids
    within the watermark horizon (`dropDuplicatesWithinWatermark`), the
    streaming twin of exact dedup — at-least-once sources (Kafka
    redelivery, retried producers) become effectively-once downstream.
    State holds one entry per event_id seen inside the horizon and is
    dropped as the watermark passes — bounded by event rate × horizon,
    not by stream lifetime."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enriched_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join: tag each event with the customer
    dimension (user_id == c_custkey).  The static side is broadcast —
    every micro-batch probes an executor-local hash map, no shuffle of
    the stream and no state store at all (stream-static joins are
    stateless).  At scale the dimension refreshes by re-broadcasting on
    a cadence, not by widening state."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    return events.join(dim, "user_id", "left")


def sliding_rates(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding-window event rates: 1 h window sliding every 15 min per
    event_type (each event lands in 4 overlapping windows).  The
    watermark bounds state to horizon x slide-count; closed windows
    emit and drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            money_round(exact_sum("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def moving_avg_windows(
    events: DataFrame, watermark: str = "2 hours", slide: str = "15 minutes"
) -> DataFrame:
    """Streaming twin of the batch `events_moving_avg` RANGE-frame
    query (plans/extended.py).

    Per-row trailing RANGE frames are unsupported in Structured
    Streaming (arbitrary window functions need the whole ordered
    partition), so the twin discretizes: a 1-hour window sliding every
    `slide` emits, per closed window, the trailing-1h mean per
    event_type as of the window end.  Documented semantic deltas vs
    the batch query: (1) one estimate per slide boundary, not per
    event row; (2) the frame is the half-open [end-1h, end) versus the
    batch row-anchored closed [t-3600s, t].  On closed windows the
    value equals the exact batch mean over the same half-open interval
    (asserted by the twin test).  Watermark bounds state to
    horizon x overlapping-window count; closed windows emit and drop.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", slide).alias("w"), "event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_1h"),
            F.count("*").alias("n_1h"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "avg_1h",
            "n_1h",
        )
    )


def click_purchase_attribution(
    events: DataFrame, events2: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a click by
    the same user within `horizon` before the purchase.  Both sides are
    watermarked and the join condition carries an explicit time range,
    so the state store only keeps clicks inside the horizon — the
    bounded-state form of an as-of/attribution join (the batch twin is
    `asof_join_purchases`).  Append-mode output: a match emits exactly
    when the watermark proves no earlier click can still arrive."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events2.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
        )
    )
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts", "value")


def error_rate_alerts(
    events: DataFrame, watermark: str = "2 hours", threshold: float = 0.25
) -> DataFrame:
    """Streaming twin of the batch error_rate_hourly query: watermarked
    tumbling-hour error share with an alert flag — the continuous form
    of the reference's SMTP-on-ERROR escalation (its log handler fires
    per record; this fires per closed window, which is what a fleet
    needs).  State is one window per hour per trigger and closes at the
    watermark, so memory is bounded regardless of stream length."""
    err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            err.cast("long").alias("n_errors"),
            F.round(err * 1.0 / F.count("*"), 4).alias("error_rate"),
            (err * 1.0 / F.count("*") > threshold).alias("alert"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "n_events",
            "n_errors",
            "error_rate",
            "alert",
        )
    )


def value_anomalies_stream(events: DataFrame, stats: DataFrame) -> DataFrame:
    """Streaming twin of the batch value_anomaly_zscore query: score
    each incoming event against a PRECOMPUTED per-type stats table
    (stream-static broadcast join — the stats refresh on whatever
    cadence the batch job runs, the standard split for detectors whose
    baseline must not drift within a window).  Stateless: no streaming
    aggregation, bounded by the dimension-sized stats side."""
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 2)
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 3.0)
        .select("event_id", "event_type", F.round("value", 2).alias("value"), "z")
    )


def trending_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch trending_types query: watermarked
    10-minute tumbling-window counts per event type.  Ranking (top-3
    per window) is NOT part of the streaming aggregate — row_number
    over a still-open window would churn every trigger; rank the
    closed windows at read time (`rank_trending`), which is exactly
    what the batch twin does.  State: one (window, type) row until the
    watermark closes the window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("wstart"),
            "event_type",
            "n",
        )
    )


def rank_trending(counts: DataFrame, k: int = 3) -> DataFrame:
    """Read-time top-k over closed trending windows (batch DataFrame —
    e.g. the memory/Delta sink trending_counts writes to)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("wstart").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
