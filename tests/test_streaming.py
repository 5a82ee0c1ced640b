"""Structured Streaming tests: watermarked tumbling windows, session
windows, and the foreachBatch poll-loop trigger (ST1/ST2 analogs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from encodesrv_spark.streaming.events import (
    hourly_counts,
    poll_loop_stream,
    read_events_stream,
    user_sessions,
)


@pytest.fixture()
def events_dir(spark, tmp_path, sf_dir):
    """Materialize the batch events table as a streaming file source."""
    from encodesrv_spark.catalog import load_table

    path = str(tmp_path / "events_stream")
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _run_available_now(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    return q


def test_hourly_counts_match_batch(spark, tmp_path, events_dir, sf_dir):
    """The streaming tumbling-window agg must agree with the batch
    events_hourly query (same grouping frame)."""
    stream = read_events_stream(spark, events_dir)
    _run_available_now(hourly_counts(stream), tmp_path, "hourly")
    got = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM hourly").collect()
    }

    from encodesrv_spark.plans.registry import all_queries

    batch = all_queries()["events_hourly"].fn(spark, sf_dir)
    want = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_session_window_counts(spark, tmp_path, events_dir):
    stream = read_events_stream(spark, events_dir)
    _run_available_now(user_sessions(stream), tmp_path, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "no sessions produced"
    # every session is attributed to one user and has >= 1 event
    assert all(r["n_events"] >= 1 for r in rows)
    # sanity: total session events == total input events
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(events_dir).count()


def test_poll_loop_stream_drives_batches(spark, tmp_path):
    seen = []
    writer = poll_loop_stream(
        spark, on_batch=lambda df, epoch: seen.append(epoch), interval=None
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ckpt_poll")).start()
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    assert len(seen) >= 1  # at least one claim cycle fired


def test_log_relay_listener(spark, tmp_path, events_dir):
    """S15: the listener fans query lifecycle events to the buffer and
    the buffer is queryable as a DataFrame (the bot-facing surface)."""
    from encodesrv_spark.streaming import listener as L

    relay = L.attach(spark)
    try:
        stream = read_events_stream(spark, events_dir)
        _run_available_now(hourly_counts(stream), tmp_path, "relay_probe")
        # listener callbacks are async; progress should land quickly
        import time

        for _ in range(40):
            kinds = {e.event_kind for e in relay.events}
            if "progress" in kinds and "terminated" in kinds:
                break
            time.sleep(0.5)
        kinds = {e.event_kind for e in relay.events}
        assert "started" in kinds and "progress" in kinds and "terminated" in kinds
        df = relay.to_df(spark)
        prog = df.filter(F.col("event_kind") == "progress")
        assert prog.count() >= 1
        assert prog.agg(F.sum("num_input_rows")).first()[0] > 0
    finally:
        spark.streams.removeListener(relay)


def test_streaming_dedup_drops_redelivered(spark, tmp_path, events_dir, sf_dir):
    """Redelivered events (same event_id) collapse to one row."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.streaming.events import deduped_events, read_events_stream

    # redeliver: write the same events twice into the stream dir
    dup_dir = str(tmp_path / "dup_stream")
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)

    stream = read_events_stream(spark, dup_dir)
    q = (
        deduped_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream").first()
    assert got["n"] == got["d"] == base.count()


def test_enriched_events_matches_batch_join(spark, tmp_path, events_dir, sf_dir):
    """Stream-static enrichment must agree with the same batch join."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.streaming.events import enriched_events

    customers = load_table(spark, sf_dir, "customer")
    stream = read_events_stream(spark, events_dir)
    q = (
        enriched_events(stream, customers)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enriched"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    got = {
        (r["event_id"], r["segment"], r["nationkey"])
        for r in spark.sql("SELECT event_id, segment, nationkey FROM enriched").collect()
    }
    batch = enriched_events(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        ),
        customers,
    )
    want = {
        (r["event_id"], r["segment"], r["nationkey"])
        for r in batch.select("event_id", "segment", "nationkey").collect()
    }
    assert got == want and len(got) > 0


def test_sliding_rates_match_batch_windows(spark, tmp_path, events_dir, sf_dir):
    """Streaming sliding windows must agree with the identical batch
    F.window aggregation (each event in 4 overlapping windows)."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.streaming.events import sliding_rates

    stream = read_events_stream(spark, events_dir)
    _run_available_now(sliding_rates(stream), tmp_path, "sliding")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    batch = sliding_rates(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_moving_avg_windows_match_batch_intervals(spark, tmp_path, events_dir, sf_dir):
    """Streaming twin of events_moving_avg: every closed sliding window
    must equal an INDEPENDENT batch mean over the same half-open
    [win_start, win_end) interval — computed here by an explicit
    range-condition join, not by re-running F.window, so the check is
    not circular."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.streaming.events import moving_avg_windows

    stream = read_events_stream(spark, events_dir)
    _run_available_now(moving_avg_windows(stream), tmp_path, "mavg")
    got_rows = spark.sql("SELECT * FROM mavg").collect()
    got = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["avg_1h"], r["n_1h"])
        for r in got_rows
    }
    assert len(got) > 0

    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    wins = spark.createDataFrame(
        [(ws, we, et) for (ws, we, et) in got],
        "win_start timestamp, win_end timestamp, event_type string",
    )
    want_rows = (
        wins.join(
            events,
            (events.ts >= wins.win_start)
            & (events.ts < wins.win_end)
            & (events.event_type == wins.event_type),
        )
        .groupBy("win_start", "win_end", wins.event_type)
        .agg(F.round(F.avg("value"), 6).alias("avg_1h"), F.count("*").alias("n_1h"))
        .collect()
    )
    want = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["avg_1h"], r["n_1h"])
        for r in want_rows
    }
    assert got == want


def test_click_purchase_attribution_matches_batch(spark, tmp_path, events_dir, sf_dir):
    """Stream-stream interval join must emit exactly the batch self-join
    pairs (watermark only bounds state; availableNow drains fully)."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.streaming.events import click_purchase_attribution

    s1 = read_events_stream(spark, events_dir)
    s2 = read_events_stream(spark, events_dir)
    q = (
        click_purchase_attribution(s1, s2)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT purchase_id, click_id FROM attrib").collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in click_purchase_attribution(ev, ev).collect()
    }
    assert got == want and len(got) > 0


def test_attribution_batch_twin_matches_streaming_semantics(spark, sf_dir):
    """The oracle-backed registered query `click_attribution_interval`
    (the banded batch twin the driver gate evidences) must produce
    exactly the pairs the stream-stream interval join emits — this
    closes the chain streaming join == batch twin == DuckDB oracle."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.events import click_purchase_attribution

    batch = all_queries()["click_attribution_interval"].fn(spark, sf_dir)
    got = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in click_purchase_attribution(ev, ev).collect()
    }
    assert got == want and len(got) > 0


def test_incremental_dedup_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming twin of incremental_dedup: stream the non-src0 docs
    (with one full redelivery of the first file) against the static
    src0 fingerprint store; the surviving hash set must equal the batch
    query's keeper hashes, redeliveries dropped by in-stream state."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.corpus import (
        incremental_dedup_stream,
        read_docs_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = docs.filter(F.col("source") == "src0").select(
        F.md5("text").alias("text_hash")
    )
    incoming = docs.filter(F.col("source") != "src0")

    src = tmp_path / "docs_stream"
    incoming.write.mode("overwrite").parquet(str(src / "batch1"))
    # redeliver the same rows — the stream must emit each hash once
    incoming.limit(50).write.mode("overwrite").parquet(str(src / "batch2"))

    stream = read_docs_stream(spark, f"{src}/*")
    q = (
        incremental_dedup_stream(stream, store)
        .writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_inc_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    got = {r["text_hash"] for r in spark.sql("SELECT text_hash FROM inc_dedup").collect()}
    want = {
        r["text_hash"]
        for r in all_queries()["incremental_dedup"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_dedup_stream_watermark_state_bound(spark, tmp_path):
    """Late-data contract of the WATERMARKED dedup path
    (`dropDuplicatesWithinWatermark`, 1 h horizon on ingest_ts) —
    the documented state bound, observed end-to-end:

    * a same-hash redelivery WITHIN the horizon is dropped;
    * a redelivery arriving with an event time BEHIND the watermark is
      dropped as late data (never re-emitted, never re-opens state);
    * a same-hash redelivery with a FRESH timestamp after the horizon
      evicted the first occurrence's state IS re-emitted — dedup is
      effectively-once within the horizon, by design (state is bounded
      by rate x horizon, not stream lifetime).
    """
    import datetime as dt

    from encodesrv_spark.streaming.corpus import incremental_dedup_stream

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m, 0)

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long, "
        "ingest_ts timestamp"
    )
    src = tmp_path / "wm_docs"
    src.mkdir()
    store = spark.createDataFrame(
        [("deadbeef" * 4,)], "text_hash string"
    )  # store holds an unrelated hash; everything below is "new"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            incremental_dedup_stream(stream, store, ingest_ts="ingest_ts")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "wm_out"))
            .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish within 600 s"

    # run 1: docA at 10:00, in-horizon redelivery at 10:10 (dropped),
    # and a 15:00 row that advances the watermark to 14:00 — past
    # 10:00 + 1 h, so docA's dedup state is evicted after this run.
    batch1 = spark.createDataFrame(
        [
            (1, "alpha", "en", "s1", 5, t(10, 0)),
            (2, "alpha", "en", "s1", 5, t(10, 10)),  # dup within horizon
            (3, "omega", "en", "s1", 5, t(15, 0)),   # advances watermark
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run()

    # run 2: one redelivery BEHIND the watermark (late → dropped) and
    # one with a fresh timestamp (state evicted → re-emitted).
    batch2 = spark.createDataFrame(
        [
            (4, "alpha", "en", "s1", 5, t(10, 20)),  # late: watermark 14:00
            (5, "alpha", "en", "s1", 5, t(15, 30)),  # fresh, post-eviction
        ],
        schema,
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run()

    out = spark.read.parquet(str(tmp_path / "wm_out")).collect()
    emitted_ids = sorted(r["doc_id"] for r in out)
    # doc 1 (first alpha), doc 3 (omega), doc 5 (alpha re-emitted after
    # eviction); docs 2 (in-horizon dup) and 4 (late) dropped
    assert emitted_ids == [1, 3, 5], emitted_ids


def test_error_rate_alerts_match_batch(spark, tmp_path, events_dir, sf_dir):
    """The streaming hourly error-rate agg must agree with the batch
    error_rate_hourly query on (n_events, n_errors, error_rate, alert)
    per hour."""
    from encodesrv_spark.streaming.events import error_rate_alerts, read_events_stream

    stream = read_events_stream(spark, events_dir)
    _run_available_now(error_rate_alerts(stream), tmp_path, "err_rate")
    got = {
        r["hour_start"]: (r["n_events"], r["n_errors"], r["error_rate"], r["alert"])
        for r in spark.sql("SELECT * FROM err_rate").collect()
    }

    from encodesrv_spark.plans.registry import all_queries

    batch = all_queries()["error_rate_hourly"].fn(spark, sf_dir)
    # batch keys hours as epoch-hour ints (UTC); render them the same way
    want = {}
    for r in batch.collect():
        from datetime import datetime, timezone

        hs = datetime.fromtimestamp(r["hour_id"] * 3600, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        want[hs] = (r["n_events"], r["n_errors"], r["error_rate"], r["alert"])
    assert got == want


def test_value_anomalies_stream_matches_batch(spark, tmp_path, events_dir, sf_dir):
    """Stream-static anomaly scoring with batch-computed stats must
    flag exactly the batch query's outlier set."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.events import (
        read_events_stream,
        value_anomalies_stream,
    )

    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    stream = read_events_stream(spark, events_dir)
    q = (
        value_anomalies_stream(stream, stats)
        .writeStream.format("memory")
        .queryName("anomalies")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_anom"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    got = {r["event_id"] for r in spark.sql("SELECT event_id FROM anomalies").collect()}
    want = {
        r["event_id"]
        for r in all_queries()["value_anomaly_zscore"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_trending_counts_match_batch(spark, tmp_path, events_dir, sf_dir):
    """Streaming windowed counts + read-time rank == the batch
    trending_types query on the same events."""
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.events import (
        rank_trending,
        read_events_stream,
        trending_counts,
    )

    stream = read_events_stream(spark, events_dir)
    _run_available_now(trending_counts(stream), tmp_path, "trending")
    got = rank_trending(spark.table("trending")).collect()
    want = all_queries()["trending_types"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_chunked_docs_stream_matches_batch(spark, tmp_path, sf_dir):
    """The streaming chunker must emit exactly the batch doc_chunks
    rows (stateless op — stream/batch parity is exact, not
    window-approximate)."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.corpus import chunked_docs_stream, read_docs_stream

    src = str(tmp_path / "docs_stream")
    load_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(src)
    stream = read_docs_stream(spark, src)
    q = (
        chunked_docs_stream(stream)
        .writeStream.format("memory")
        .queryName("chunks_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_hash"])
        for r in spark.sql("SELECT * FROM chunks_stream").collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_hash"])
        for r in all_queries()["doc_chunks"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_watermark_drops_late_event_from_closed_window(spark, tmp_path):
    """Event-time correctness under lateness: with a 2 h watermark, an
    event arriving after the watermark has passed its window must NOT
    change that window's append-mode output.  Run 1 processes two
    10:xx events plus a 13:30 event (watermark → 11:30); run 2 (same
    checkpoint) delivers a 10:40 straggler — beyond the watermark, so
    the [10:00, 11:00) window closes with n=2, not 3."""
    import datetime as dt

    from encodesrv_spark.streaming.events import hourly_counts

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m, 0)

    src = tmp_path / "late_src"
    src.mkdir()
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            hourly_counts(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish within 600 s"

    batch1 = spark.createDataFrame(
        [
            (1, t(10, 5), 1, "click", 1.0),
            (2, t(10, 20), 2, "click", 1.0),
            (3, t(13, 30), 3, "view", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run()

    batch2 = spark.createDataFrame(
        [
            (4, t(10, 40), 4, "click", 1.0),  # late: watermark is 11:30
            (5, t(14, 0), 5, "view", 1.0),    # fresh, advances watermark
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run()

    rows = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows.get(("2024-03-01 10:00:00", "click")) == 2, rows


def test_session_window_ignores_late_event_after_close(spark, tmp_path):
    """Session-window late-data contract: once the watermark closes a
    session (last event + gap < watermark), a late event inside that
    session's time range must NOT reopen or extend it — the closed
    session's append-mode row is final.  Run 1 emits user 1's
    10:00-10:40 session (2 events, 30 min gap) after a 15:00 event
    advances the watermark; run 2 delivers a 10:20 straggler, which
    must change nothing for user 1."""
    import datetime as dt

    from encodesrv_spark.streaming.events import user_sessions

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m, 0)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = tmp_path / "sess_src"
    src.mkdir()
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            user_sessions(stream, gap="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish within 600 s"

    batch1 = spark.createDataFrame(
        [
            (1, t(10, 0), 1, "click", 1.0),
            (2, t(10, 10), 1, "click", 1.0),
            (3, t(15, 0), 9, "view", 1.0),  # advances watermark to 13:00
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run()

    batch2 = spark.createDataFrame(
        [
            (4, t(10, 20), 1, "click", 1.0),  # late: session already closed
            (5, t(16, 0), 9, "view", 1.0),    # fresh, advances watermark
        ],
        schema,
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run()

    rows = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    ]
    u1 = [r for r in rows if r[0] == 1]
    # exactly ONE user-1 session, spanning 10:00 to 10:40 with 2 events
    # — the 10:20 straggler neither extended it nor spawned a new row
    assert u1 == [(1, t(10, 0), t(10, 40), 2)], rows


def test_jsonl_corpus_stream_ingests_and_quarantines(spark, tmp_path, sf_dir):
    """Streaming JSONL ingest: shards arriving in a landing directory
    flow through with the declared schema; corrupt lines surface with
    raw_line set instead of being silently dropped; clean rows match
    the batch reader exactly."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.sources import jsonl

    docs = load_table(spark, sf_dir, "documents")
    landing = str(tmp_path / "landing")
    jsonl.write_jsonl_shards(docs, landing, n_shards=2, compress=False)
    (tmp_path / "landing" / "part-zz-bad.json").write_text(
        "this is not json\n"
    )

    stream = jsonl.read_corpus_stream(spark, landing)
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_jsonl"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    out = spark.sql("SELECT * FROM jsonl_ingest")
    clean = out.filter("raw_line IS NULL")
    bad = out.filter("raw_line IS NOT NULL")
    assert clean.count() == docs.count()
    assert bad.count() == 1
    assert bad.collect()[0]["raw_line"] == "this is not json"
    # schema carried through the stream
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", "raw_line",
    ]
