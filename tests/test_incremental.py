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


def test_join_view_delta_equals_recompute_no_double_count(spark):
    """join_view_delta's algebra: maintained view (V_old ∪ ΔV) must
    equal the from-scratch join of the post-images — on a fixture where
    EVERY term carries rows, including the ΔL ⋈ ΔR cross term (the
    double-count trap: the symmetric post-image-on-both-sides form
    would duplicate exactly those rows, so multiset equality here pins
    the asymmetric decomposition)."""
    L = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, lv string"
    )
    dL = spark.createDataFrame([(2, "b2"), (3, "c")], "k int, lv string")
    R = spark.createDataFrame(
        [(1, "x"), (3, "y")], "k int, rv string"
    )
    dR = spark.createDataFrame([(2, "z"), (3, "y2")], "k int, rv string")
    # cross term ΔL ⋈ ΔR = {(2,b2,z), (3,c,y2)} — non-empty by design
    view = L.join(R, "k").unionByName(I.join_view_delta(L, dL, R, dR, "k"))
    full = L.unionByName(dL).join(R.unionByName(dR), "k")
    got = sorted(tuple(r) for r in view.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and len(got) > 0
    # and the trap really is a trap: post-image on BOTH terms counts
    # ΔL ⋈ ΔR twice
    bad = (
        dL.join(R.unionByName(dR), "k")
        .unionByName(L.unionByName(dL).join(dR, "k"))
        .unionByName(L.join(R, "k"))
    )
    assert bad.count() == full.count() + dL.join(dR, "k").count()


def test_join_view_delta_signed_handles_deletes_and_dups(spark):
    """The z-set algebra: maintained signed view, consolidated
    (group-by-all, Σmult, drop zeros), must equal the post-image join
    — on a fixture with a both-sides delete (the (−1)·(−1)=+1 cross
    term must net those rows to exactly −1, not −2), a duplicate
    insert (multiplicity 2 in the view), and a full retraction (the
    key's rows net to zero and vanish)."""
    from pyspark.sql import functions as F

    one = F.lit(1).cast("long")

    def signed(df, m):
        return df.withColumn("_mult", F.lit(m).cast("long"))

    L = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, lv string"
    )
    R = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, rv string"
    )
    # feed: delete k=1 on BOTH sides (cross term), duplicate k=2 on the
    # left (bag multiplicity), delete k=3 on the right only (full
    # retraction of that key's view rows)
    dL = signed(L.filter("k = 1"), -1).unionByName(
        signed(L.filter("k = 2"), 1)
    )
    dR = signed(R.filter("k = 1"), -1).unionByName(
        signed(R.filter("k = 3"), -1)
    )
    view = (
        L.join(R, "k").withColumn("_mult", one)  # stored view, all 1s
        .unionByName(I.join_view_delta_signed(
            L.withColumn("_mult", one), dL,
            R.withColumn("_mult", one), dR, "k",
        ))
    )
    got = {
        (r["k"], r["lv"], r["rv"]): r["m"]
        for r in view.groupBy("k", "lv", "rv")
        .agg(F.sum("_mult").alias("m")).filter("m <> 0").collect()
    }
    # post-image: k=1 gone (deleted both sides), k=2 doubled, k=3 gone
    # (right side retracted)
    assert got == {(2, "b", "y"): 2}
