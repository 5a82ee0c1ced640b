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
