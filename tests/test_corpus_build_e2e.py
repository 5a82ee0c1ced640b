"""End-to-end corpus build: quality gate → near-dup removal → hash
shards, MATERIALIZED to parquet and verified on the written output —
the composition a training-data team actually ships, not just the
per-operator queries."""

from __future__ import annotations

import pyspark.sql.functions as F

from encodesrv_spark.catalog import load_table
from encodesrv_spark.operators import dedup
from encodesrv_spark.plans.registry import all_queries

N_SHARDS = 4


def test_corpus_build_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_out")
    docs = load_table(spark, sf_dir, "documents")
    qs = all_queries()

    # 1. quality gate
    kept_ids = qs["gopher_quality_flags"].fn(spark, sf_dir).filter("keep").select(
        "doc_id"
    )
    # 2. near-dup removal (drop list from the removals query: every
    #    non-canonical member of a jaccard cluster)
    drops = qs["neardup_removals"].fn(spark, sf_dir).select("doc_id")
    final_ids = kept_ids.join(drops, "doc_id", "left_anti")
    built = docs.join(final_ids, "doc_id").withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(N_SHARDS))
    )
    built.write.partitionBy("shard").mode("overwrite").parquet(out)

    stored = spark.read.parquet(out)
    n_stored = stored.count()
    assert 0 < n_stored < docs.count()

    # every stored doc passes the gate
    gate = qs["gopher_quality_flags"].fn(spark, sf_dir).select("doc_id", "keep")
    bad = stored.join(gate, "doc_id").filter(~F.col("keep")).count()
    assert bad == 0

    # no near-dup pair above threshold survives among the stored docs —
    # the whole point of the removal stage (clusters are the connected
    # components of the pair graph, one canonical kept per cluster)
    surviving_pairs = (
        dedup.jaccard_pairs(stored.select("doc_id", "text"), k=3, threshold=0.5)
        .count()
    )
    assert surviving_pairs == 0

    # shards exist and no shard hogs the corpus (hash sharding)
    sizes = {r["shard"]: r["n"] for r in stored.groupBy("shard").agg(
        F.count("*").alias("n")
    ).collect()}
    assert len(sizes) >= 2
    assert max(sizes.values()) <= 0.75 * n_stored

    # content integrity: stored text is byte-identical to the source
    joined = stored.select("doc_id", F.col("text").alias("t2")).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    assert joined.filter(F.col("t2") != F.col("text")).count() == 0


def test_training_release_jsonl_pipeline(spark, sf_dir, tmp_path):
    """Release-artifact pipeline v2: per-source quality calibration →
    near-dup removal → hash-sharded gzip JSONL export → re-ingest and
    verify. The export/ingest pair is the interchange boundary a
    training stack consumes, so the verification re-READS the release
    (not the in-memory frames): corrupt-free, calibrated, deduped,
    byte-identical text."""
    from encodesrv_spark.sources import jsonl

    qs = all_queries()
    docs = load_table(spark, sf_dir, "documents")

    # 1. per-source calibrated keep (equal fraction from every source —
    #    the global-threshold starvation fix)
    cal = qs["quality_percentile_by_source"].fn(spark, sf_dir)
    kept = cal.filter("keep_calibrated").select("doc_id")
    # 2. near-dup removal
    drops = qs["neardup_removals"].fn(spark, sf_dir).select("doc_id")
    final_ids = kept.join(drops, "doc_id", "left_anti")
    release = docs.join(final_ids, "doc_id")

    out = str(tmp_path / "release_jsonl")
    jsonl.write_jsonl_shards(release, out, n_shards=4, compress=True)

    # 3. re-ingest the written artifact
    ing = jsonl.read_corpus(spark, out)
    assert ing.corrupt.count() == 0
    n = ing.docs.count()
    assert 0 < n < docs.count()

    # every released doc is keep_calibrated and not a drop
    joined = ing.docs.select("doc_id").join(
        cal.select("doc_id", "keep_calibrated"), "doc_id"
    )
    assert joined.filter(~F.col("keep_calibrated")).count() == 0
    assert ing.docs.join(drops, "doc_id", "inner").count() == 0

    # every source keeps ~the calibrated fraction (the property the
    # calibrated gate exists for) — no source starved
    per_src = {
        r["source"]: r["frac"]
        for r in ing.docs.groupBy("source")
        .agg(F.count("*").alias("n_kept"))
        .join(
            docs.groupBy("source").agg(F.count("*").alias("n_total")), "source"
        )
        .select(
            "source", (F.col("n_kept") / F.col("n_total")).alias("frac")
        )
        .collect()
    }
    assert per_src and all(f > 0.3 for f in per_src.values())

    # text survives the JSONL round trip byte-identically
    a = release.select("doc_id", "text")
    b = ing.docs.select("doc_id", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
