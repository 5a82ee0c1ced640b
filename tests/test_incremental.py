"""Incremental aggregate maintenance (operators/incremental.py):
merge-of-partials must equal recompute-from-scratch, and the HLL
sketch path must make distinct counts mergeable."""

from __future__ import annotations

from pyspark.sql import functions as F

from encodesrv_spark.catalog import load_table
from encodesrv_spark.operators import incremental as I

KEYS = ["event_type"]


def _events_split(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.expr("ts_ns DIV 3600000000000")
    )
    return e, e.filter(F.col("hr") < 473712), e.filter(F.col("hr") >= 473712)


def test_merge_partials_equals_full_recompute(spark, sf_dir):
    e, base, delta = _events_split(spark, sf_dir)
    merged = I.finalize(I.merge(
        I.partials(base, KEYS, "value"), I.partials(delta, KEYS, "value"), KEYS
    ))
    full = I.finalize(I.partials(e, KEYS, "value"))
    m = {r["event_type"]: r for r in merged.collect()}
    f = {r["event_type"]: r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k]["n"] == f[k]["n"]
        assert abs(m[k]["total"] - f[k]["total"]) < 1e-6
        assert m[k]["vmin"] == f[k]["vmin"]
        assert m[k]["vmax"] == f[k]["vmax"]
        assert abs(m[k]["vavg"] - f[k]["vavg"]) < 1e-9


def test_hll_sketch_union_tracks_exact_distinct(spark, sf_dir):
    """Sketches built per split, unioned, estimated — vs exact distinct
    user count.  HLL's standard error at default lgConfigK (12) is
    ~0.8%; assert 5% to stay flake-free."""
    e, base, delta = _events_split(spark, sf_dir)
    est = I.hll_merge_estimate(
        I.hll_partials(base, KEYS, "user_id"),
        I.hll_partials(delta, KEYS, "user_id"),
        KEYS,
    )
    exact = e.groupBy(*KEYS).agg(F.countDistinct("user_id").alias("exact"))
    rows = {r["event_type"]: r["approx_distinct"] for r in est.collect()}
    for r in exact.collect():
        approx = rows[r["event_type"]]
        assert abs(approx - r["exact"]) <= max(2, 0.05 * r["exact"])


def test_apply_feed_tracks_snapshot_partials(spark, tmp_path):
    """Partials maintained through a JobStore change feed (inserts,
    updates, deletes) must equal partials recomputed from the final
    snapshot — the CDF-consumer contract."""
    from encodesrv_spark.jobs.state import JobStore

    store = JobStore(spark, str(tmp_path / "feed"), key="id", retain=10)
    store.init(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
            "id int, grp string, value double",
        )
    )
    store.upsert(
        spark.createDataFrame([(1, 15.0)], "id int, value double"), ["value"]
    )
    store.append(
        spark.createDataFrame([(4, "b", 40.0)], "id int, grp string, value double")
    )
    store.delete_where("id = 2")

    base = I.partials(store.read_version(0), ["grp"], "value")
    feed = store.changes(0, 3)
    maintained = {
        r["grp"]: (r["n"], r["total"])
        for r in I.apply_feed(base, feed, ["grp"], "value").collect()
    }
    recomputed = {
        r["grp"]: (r["n"], r["total"])
        for r in I.partials(store.read(), ["grp"], "value")
        .select("grp", "n", "total")
        .collect()
    }
    assert maintained == recomputed
