"""applyInPandasWithState: keyed running state across micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from encodesrv_spark.streaming.stateful import running_user_totals


def _start_terminating(spark, writer):
    """Start an availableNow query over a ProcessingTimeTimeout stateful
    operator so that it actually TERMINATES.

    Every operator in streaming/stateful.py arms a processing-time
    timeout (hours out) on each key it touches.  On this Spark build the
    micro-batch engine keeps scheduling no-data micro-batches while any
    timer is pending — so an availableNow query over such an operator
    consumes its data and then loops empty batches until the farthest
    timer fires, i.e. never inside a test budget (observed: the 10-row
    repro ran 150+ empty batches before the 600 s assert killed it; the
    'Python worker crashed' noise in that failure was only the session
    teardown racing the still-running query).  Disabling no-data
    micro-batches FOR THIS QUERY restores termination; data batches
    still process timed-out state exactly as before, and the asserted
    results never depended on idle-timeout expiry.  Streaming queries
    snapshot SQLConf at start (StreamExecution runs on a cloned
    session), so flipping the conf around .start() pins it per-query
    without affecting the shared test session."""
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        return writer.start()
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")


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
    q = _start_terminating(
        spark,
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

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


def test_funnel_progress_matches_batch(spark, tmp_path, sf_dir):
    """The stateful streaming funnel's final per-user stages must agree
    with the batch funnel_conversion stage counts (same ordered-gate
    semantics), with redelivered batches changing nothing."""
    from pyspark.sql import functions as F

    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.stateful import funnel_progress

    src = str(tmp_path / "funnel_events")
    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("ts_ns DIV 1000").alias("tus"),
        )
    )
    e.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_id long, event_type string, tus long"
    ).parquet(src)
    q = _start_terminating(
        spark,
        funnel_progress(stream)
        .writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    # last update per user is the final state
    got = (
        spark.sql("SELECT * FROM funnel_state")
        .groupBy("user_id")
        .agg(F.max("stage").alias("stage"))
        .collect()
    )
    n_view = sum(1 for r in got if r["stage"] >= 1)
    n_click = sum(1 for r in got if r["stage"] >= 2)
    n_purchase = sum(1 for r in got if r["stage"] >= 3)

    batch = all_queries()["funnel_conversion"].fn(spark, sf_dir).collect()[0]
    assert (n_view, n_click, n_purchase) == (
        batch["n_view"],
        batch["n_click_after_view"],
        batch["n_purchase_after_click"],
    )


def test_transition_increments_match_batch(spark, tmp_path, sf_dir):
    """Summing the stateful operator's per-batch (from, to) increments
    must reproduce the batch event_transitions count matrix exactly."""
    from pyspark.sql import functions as F

    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.stateful import transition_increments

    src = str(tmp_path / "transition_events")
    (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("ts_ns DIV 1000").alias("tus"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(
        "user_id long, event_id long, event_type string, tus long"
    ).parquet(src)
    q = _start_terminating(
        spark,
        transition_increments(stream)
        .writeStream.format("memory")
        .queryName("transition_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    got = {
        (r.from_type, r.to_type): r.total
        for r in spark.sql("SELECT * FROM transition_state")
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    want = {
        (r.from_type, r.to_type): r.n
        for r in all_queries()["event_transitions"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_state_survives_stop_and_restart(spark, tmp_path, sf_dir):
    """Checkpoint recovery: a NEW query instance on the same
    checkpoint must restore the keyed state store and resume from the
    committed source offsets — per-user totals after the restart equal
    the full-corpus aggregate (not a fresh count of the second half),
    which can only happen if batch-1 state was restored and batch-1
    files were not reprocessed."""
    from encodesrv_spark.catalog import load_table

    src = tmp_path / "events_restart_src"
    src.mkdir()
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    first = e.filter(F.col("event_id") % 2 == 0)
    second = e.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(str(src / "batch1"))

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ckpt = str(tmp_path / "ckpt_restart")
    out_dir = str(tmp_path / "totals_out")

    def run():
        # memory sink refuses checkpoint recovery; foreachBatch +
        # append parquet is the restart-capable sink for update-mode
        # stateful output
        stream = spark.readStream.schema(schema).option(
            "pathGlobFilter", "*.parquet"
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = _start_terminating(
            spark,
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True),
        )
        assert q.awaitTermination(600), "stream did not finish within 600 s"

    run()
    second.write.mode("overwrite").parquet(str(src / "batch2"))
    run()

    out = spark.read.parquet(out_dir)
    out.createOrReplaceTempView("totals_restart_out")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY batches DESC) rn
                 FROM totals_restart_out) WHERE rn = 1"""
        ).collect()
    }
    full = {
        r["user_id"]: (r["n"], r["t"])
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    half2 = {
        r["user_id"]: r["n"]
        for r in second.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got, "restarted query emitted nothing"
    for uid, (n, t) in got.items():
        assert (n, t) == full[uid], f"user {uid}: {n, t} != full {full[uid]}"
        # restored state, not a fresh recount of batch 2
        assert n > half2.get(uid, 0)


def test_ewma_stream_matches_batch_within_truncation_tail(spark, tmp_path, sf_dir):
    """The streaming EWMA is the exact recursion (state = one double);
    the batch events_ewma truncates at 8 lags and renormalizes.  Their
    final per-type values must agree within the truncation tail
    (1−α)^8 · max|value| — a wrong α or a broken ordering lands tens
    of units away, far outside the bound."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.stateful import ewma_stream

    src = str(tmp_path / "ewma_events")
    (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            "value",
            F.expr("ts_ns DIV 1000").alias("tus"),
        )
        # write REVERSE time order so the in-batch sort has real work
        .orderBy(F.desc("tus"), F.desc("event_id"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    # force each key's slice to span many Arrow chunks — the operator
    # must globally sort the slice, not each chunk (regression guard)
    prev_arrow = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    stream = spark.readStream.schema(
        "event_id long, event_type string, value double, tus long"
    ).parquet(src)
    q = _start_terminating(
        spark,
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_arrow)

    exact = {
        r["event_type"]: r["ewma"]
        for r in spark.sql(
            """SELECT event_type, ewma FROM (
                 SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n DESC) rn
                 FROM ewma_state) WHERE rn = 1"""
        ).collect()
    }
    batch_df = all_queries()["events_ewma"].fn(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.desc("tus"), F.desc("event_id"))
    batch = {
        r["event_type"]: r["ewma8"]
        for r in batch_df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert set(exact) == set(batch) and exact
    max_val = load_table(spark, sf_dir, "events").agg(
        F.max(F.abs("value"))
    ).collect()[0][0]
    tail = (1 - 0.5) ** 8 * max_val * 2
    for t in exact:
        assert abs(exact[t] - batch[t]) <= tail, (t, exact[t], batch[t], tail)


def test_change_points_stream_flags_planted_shift_and_matches_batch_means(
    spark, tmp_path
):
    """Streaming twin of mining.events_change_points on the planted
    level-shift series: the causal detector must flag the same planted
    jump (and reversion), and every closed hour's mean must equal the
    batch op's hourly mean exactly (same 6 dp rounding)."""
    import datetime as dt

    from encodesrv_spark.streaming.stateful import change_points_stream

    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        v = 1010.0 if h == 24 else 10.0
        for k in range(2):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 1, "click", v, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    src = str(tmp_path / "chg_events")
    df.select(
        "event_id",
        "event_type",
        "value",
        (F.unix_micros("ts")).alias("tus"),
    ).orderBy("tus", "event_id").coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, event_type string, value double, tus long"
    ).parquet(src)
    q = _start_terminating(
        spark,
        change_points_stream(stream)
        .writeStream.format("memory")
        .queryName("chg_points")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chg"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    out = spark.sql("SELECT * FROM chg_points").collect()
    # 48 hours, last one never closes (no later event), first closed
    # hour has no previous -> 46 delta rows
    assert len(out) == 46
    flagged = {r["hour_epoch"] for r in out if r["flagged"]}
    h24 = int(dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc).timestamp())
    h25 = h24 + 3600
    assert h24 in flagged and h25 in flagged
    # flat-history hours (delta 0, sd 0) must NOT be flagged
    assert all(h in (h24, h25) for h in flagged)

    from encodesrv_spark.plans.mining import events_change_points

    batch = events_change_points(spark, str(tmp_path)).collect()
    batch_flags = {r["hour_start"] for r in batch}
    assert batch_flags == {"2026-01-02 00:00:00", "2026-01-02 01:00:00"}
    # closed-hour means agree exactly with the batch aggregation
    stream_means = {r["hour_epoch"]: r["mean_value"] for r in out}
    assert stream_means[h24] == 1010.0
    assert all(
        m == 10.0 for h, m in stream_means.items() if h not in (h24,)
    )


def test_cusum_stream_matches_batch_chart(spark, tmp_path):
    """Streaming CUSUM (exact recursion as state) vs the batch closed
    form (running sum minus running min) on the planted-drift series:
    per (type, hour) the two charts must agree within float-association
    error, and the alarm sets must be identical."""
    import datetime as dt

    from encodesrv_spark.streaming.stateful import cusum_stream

    base = dt.datetime(2026, 3, 1)
    rows, eid = [], 0
    for h in range(64):
        level = 10.0 if h < 48 else 10.6
        v = level + (0.2 if h % 2 == 0 else -0.2)
        for k in range(2):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 1, "click", v, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from encodesrv_spark.plans.mining import events_cusum

    batch = {
        (r["event_type"], r["hour_start"]): r
        for r in events_cusum(spark, str(tmp_path)).collect()
    }

    # baseline frame exactly as the batch computes it
    h = (
        spark.read.parquet(f"{tmp_path}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    baseline = h.groupBy("event_type").agg(
        F.round(F.avg("m"), 6).alias("mu"),
        F.round(F.stddev_samp("m"), 6).alias("sd"),
    )

    src = str(tmp_path / "cusum_events")
    df.select(
        "event_id", "event_type", "value", F.unix_micros("ts").alias("tus")
    ).orderBy("tus", "event_id").coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, event_type string, value double, tus long"
    ).parquet(src)
    q = _start_terminating(
        spark,
        cusum_stream(stream, baseline)
        .writeStream.format("memory")
        .queryName("cusum_chart")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True),
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"

    out = spark.sql("SELECT * FROM cusum_chart").collect()
    assert len(out) == 63  # 64 hours, last never closes
    import datetime as dt2

    for r in out:
        hour_str = dt2.datetime.fromtimestamp(
            r["hour_epoch"], dt2.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        b = batch[(r["event_type"], hour_str)]
        assert abs(r["cusum_up"] - b["cusum_up"]) < 1e-6, (hour_str, r, b)
        assert abs(r["cusum_dn"] - b["cusum_dn"]) < 1e-6
        assert r["drift_alarm"] == b["drift_alarm"]
    assert any(r["drift_alarm"] for r in out)


def _scd2_cdc_fixture(spark, sf_dir):
    """The part_scd2_cdc_replay CDC feed: dim plus the commit batches
    (b1, b2, b3, and b2 again as a whole-commit redelivery)."""
    from pyspark.sql import functions as F

    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.extended import _CDC_T1, _CDC_T2, _CDC_T3

    dim = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    k = F.col("p_partkey")
    ts = lambda t: F.lit(t).cast("timestamp").alias("change_ts")  # noqa: E731
    price = F.col("p_retailprice")
    b1 = dim.filter(k % 7 == 0).select(
        "p_partkey", "p_brand", (price + F.lit(10.0)).alias("p_retailprice"),
        F.lit(2).alias("seq"), ts(_CDC_T1),
    ).unionByName(
        dim.filter(k % 21 == 0).select(
            "p_partkey", "p_brand", (price + F.lit(5.0)).alias("p_retailprice"),
            F.lit(1).alias("seq"), ts(_CDC_T1),
        )
    )
    b2 = dim.filter((k % 11 == 0) & (k % 7 != 0)).select(
        "p_partkey", "p_brand", "p_retailprice",
        F.lit(1).alias("seq"), ts(_CDC_T2),
    ).unionByName(
        dim.filter(k % 97 == 0).select(
            (-(k + F.lit(1))).alias("p_partkey"),
            F.lit("BRAND#NEW").alias("p_brand"), "p_retailprice",
            F.lit(1).alias("seq"), ts(_CDC_T2),
        )
    )
    b3 = dim.filter(k % 49 == 0).select(
        "p_partkey", "p_brand",
        (price + F.lit(10.0) + F.lit(10.0)).alias("p_retailprice"),
        F.lit(1).alias("seq"), ts(_CDC_T3),
    )
    return dim, (b1, b2, b3, b2)


def _write_commit_files(src, batches, start=0):
    """One parquet dir per commit under `src`, mtimes strictly
    increasing so the file source delivers them in commit order."""
    import os
    import time

    for i, b in enumerate(batches, start=start):
        d = str(src / f"commit{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        stamp = time.time() + i  # monotone even on coarse-mtime filesystems
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (stamp, stamp))


_CDC_STREAM_SCHEMA = (
    "p_partkey long, p_brand string, p_retailprice double, "
    "seq int, change_ts timestamp"
)


def test_scd2_stream_matches_batch_replay(spark, tmp_path, sf_dir):
    """Streaming SCD2 (VERDICT r08 #4): the CDC feed of the
    part_scd2_cdc_replay twin — three commits plus a whole-commit
    REDELIVERY of commit 2 — consumed file-by-file through
    foreachBatch(Scd2Stream) must leave a history row-identical to the
    batch twin's sequential applies (redelivery folds to current values
    and drops as a no-op), and must have actually run as MULTIPLE
    micro-batches (maxFilesPerTrigger=1), not one big apply."""
    from pyspark.sql import functions as F

    from encodesrv_spark.plans.extended import _SCD_T0
    from encodesrv_spark.operators.scd import scd2_init
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.scd import Scd2Stream

    dim, batches = _scd2_cdc_fixture(spark, sf_dir)
    k = F.col("p_partkey")
    src = tmp_path / "cdc_feed"
    # the 4th file REDELIVERS commit 2 after commit 3 — it must fold to
    # the then-current values and drop
    _write_commit_files(src, batches)

    sink = Scd2Stream(
        scd2_init(dim, _SCD_T0), "p_partkey",
        ["p_brand", "p_retailprice"], ts_col="change_ts", order_col="seq",
    )
    stream = spark.readStream.schema(_CDC_STREAM_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout WITHOUT error — asserting
    # it makes a slow run fail loudly instead of comparing partial state
    # (r09 full-suite run #3: 180 s expired mid-stream inside a 70-minute
    # suite JVM and the equality check saw commit 3 missing)
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    assert sink.batches_applied >= 2  # genuinely incremental, not one gulp

    fmt = lambda df: {  # noqa: E731
        tuple(r) for r in df.select(
            "p_partkey", "p_brand", "p_retailprice",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("vf"),
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("vt"),
            "is_current",
        ).collect()
    }
    got = fmt(sink.hist)
    want = {
        tuple(r)
        for r in all_queries()["part_scd2_cdc_replay"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    # the redelivery really was a no-op: every key has exactly one
    # current version, and the 49-mod keys carry all three
    cur = sink.hist.filter("is_current").groupBy("p_partkey").count()
    assert cur.filter("count > 1").isEmpty()
    # (non-negative guard: the brand-new key -98 = -(97+1) happens to be
    # divisible by 49 too, but as a new key it rightly has one version)
    three = sink.hist.filter((k % 49 == 0) & (k >= 0)).groupBy("p_partkey").count()
    assert three.filter("count <> 3").isEmpty() and not three.isEmpty()

def test_scd2_stream_restore_resumes_existing_checkpoint(spark, tmp_path, sf_dir):
    """The persisted-state recovery the restart guard's error message
    names (ADVICE r09 follow-through): phase 1 streams commits 1–2 with
    a state_dir sink, the process "dies" (sink object discarded), phase
    2 adds commit 3 plus a whole-commit REDELIVERY of commit 2,
    restores the sink from disk, and resumes against the SAME
    checkpoint.  Spark skips the committed batches (the restored state
    IS that prefix — including the serialized high-water mark, which
    must route the redelivery through the no-op-only guard), and the
    final history must equal the batch twin row-for-row."""
    from pyspark.sql import functions as F

    from encodesrv_spark.plans.extended import _SCD_T0
    from encodesrv_spark.operators.scd import scd2_init
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.scd import Scd2Stream

    dim, (b1, b2, b3, _) = _scd2_cdc_fixture(spark, sf_dir)
    src = tmp_path / "cdc_feed"
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "scd2_state")

    def run(sink):
        stream = spark.readStream.schema(_CDC_STREAM_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/*")
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish within 600 s"

    _write_commit_files(src, (b1, b2))
    first = Scd2Stream(
        scd2_init(dim, _SCD_T0), "p_partkey",
        ["p_brand", "p_retailprice"], ts_col="change_ts", order_col="seq",
        state_dir=state,
    )
    run(first)
    assert first.batches_applied == 2
    del first  # the crash: driver state gone, checkpoint + state_dir remain

    _write_commit_files(src, (b3, b2), start=2)
    sink = Scd2Stream.restore(
        spark, state, "p_partkey", ["p_brand", "p_retailprice"],
        ts_col="change_ts", order_col="seq",
    )
    assert sink.batches_applied == 2  # the committed prefix, restored
    assert sink.max_applied_ts is not None
    run(sink)
    # only the two NEW files were delivered; the redelivered commit 2
    # passed through the restored high-water mark's no-op-only path
    assert sink.batches_applied == 4

    fmt = lambda df: {  # noqa: E731
        tuple(r) for r in df.select(
            "p_partkey", "p_brand", "p_retailprice",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("vf"),
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("vt"),
            "is_current",
        ).collect()
    }
    want = {
        tuple(r)
        for r in all_queries()["part_scd2_cdc_replay"].fn(spark, sf_dir).collect()
    }
    assert fmt(sink.hist) == want and len(want) > 0

def test_join_view_stream_matches_batch_cdc(spark, tmp_path, sf_dir):
    """Streaming join-view IVM (r10): the incremental_join_view_cdc
    feed — base inserts for BOTH sides, then the retraction commit
    (orders %13 deleted, linenumber-1 lineitems deleted), then the
    duplicate re-insert commit — consumed file-per-trigger through
    foreachBatch(JoinViewStream) must leave a consolidated view whose
    group aggregate equals the batch query row-for-row, having run as
    MULTIPLE micro-batches.  Bootstrap and steady state share one code
    path (states start empty; the initial load is just the first
    inserts)."""
    import os
    import time

    from pyspark.sql import functions as F

    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.plans.registry import all_queries
    from encodesrv_spark.streaming.ivm import JoinViewStream, consolidate

    one = F.lit(1).cast("long")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(14,2)").alias("price"),
    )
    ok = F.col("o_orderkey")

    def tag(df, side, m):
        return df.withColumn("_side", F.lit(side)).withColumn(
            "_mult", F.lit(m).cast("long")
        )

    ocols = ["o_orderkey", "o_orderpriority"]
    lcols = ["l_orderkey", "l_returnflag", "qty", "price"]
    types = {
        "_side": "string", "o_orderkey": "long", "o_orderpriority": "string",
        "l_orderkey": "long", "l_returnflag": "string",
        "qty": "decimal(12,2)", "price": "decimal(14,2)", "_mult": "long",
    }
    full = ["_side", *ocols, *lcols, "_mult"]
    align = lambda df: df.select(  # noqa: E731
        *[(F.col(c) if c in df.columns else F.lit(None)).cast(types[c]).alias(c)
          for c in full]
    )
    # commit 0: initial load of both tables; 1: retractions; 2: dup inserts
    commits = (
        align(tag(o, "o", 1)).unionByName(align(tag(li.drop("l_linenumber"), "l", 1))),
        align(tag(o.filter(ok % 13 == 0), "o", -1)).unionByName(
            align(tag(li.filter("l_linenumber = 1").drop("l_linenumber"), "l", -1))
        ),
        align(tag(o.filter((ok % 13 != 0) & (ok % 17 == 0)), "o", 1)),
    )
    src = tmp_path / "ivm_feed"
    for i, b in enumerate(commits):
        d = str(src / f"commit{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        stamp = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (stamp, stamp))

    sink = JoinViewStream(
        spark, left_cols=ocols, right_cols=lcols,
        on=F.col("o_orderkey") == F.col("l_orderkey"),
        left_tag="o", right_tag="l",
    )
    stream = spark.readStream.schema(
        "_side string, o_orderkey long, o_orderpriority string, "
        "l_orderkey long, l_returnflag string, qty decimal(12,2), "
        "price decimal(14,2), _mult long"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_ivm"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish within 600 s"
    assert sink.batches_applied >= 2  # genuinely incremental

    m = F.col("_mult")
    agg = lambda v: {  # noqa: E731
        tuple(r) for r in v.groupBy("o_orderpriority", "l_returnflag").agg(
            F.sum(m).alias("n"),
            F.round(F.sum(m * F.col("qty")), 2).cast("double").alias("qty"),
            F.round(F.sum(m * F.col("price")), 2).cast("double").alias("revenue"),
        ).collect()
    }
    got = agg(sink.view)
    want = {
        tuple(r) for r in
        all_queries()["incremental_join_view_cdc"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    # consolidation is a pure compaction: same aggregate, no net-zero
    # rows, and the duplicate-insert keys really carry multiplicity 2
    sink.consolidate_states()
    assert agg(sink.view) == want
    assert sink.view.filter("_mult = 2").count() > 0
    assert sink.view.filter("_mult <= 0").isEmpty()
