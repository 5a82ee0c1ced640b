"""Operator-level invariants for the embedding similarity family
(complementing the DuckDB-oracle differential tests in
test_queries_oracle.py): PQ encode/decode identities and k-means
partition properties that the value-hash comparison can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from encodesrv_spark.catalog import load_table
from encodesrv_spark.operators import similarity


def test_pq_encode_centroids_are_fixed_points(spark, sf_dir):
    """A codebook vector's segments are distance-0 from themselves, so
    every vec_id < n_sub must encode to its own id in all segments and
    reconstruct EXACTLY (recon == emb) — the PQ identity that proves
    encode/decode wiring (segment order, slicing, codebook join) is
    right."""
    emb = load_table(spark, sf_dir, "embeddings")
    enc = similarity.pq_encode(emb, m=4, n_sub=16, dims=64)
    rows = enc.filter(F.col("vec_id") < 16).collect()
    assert len(rows) == 16
    orig = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).collect()
    }
    for r in rows:
        assert r["codes"] == [r["vec_id"]] * 4, (r["vec_id"], r["codes"])
        assert r["recon"] == orig[r["vec_id"]]


def test_pq_ann_scores_bounded_and_complete(spark, sf_dir):
    """ADC scores are cosines of real (query, reconstruction) pairs —
    every score must lie in [-1, 1] and every query must get exactly k
    ranked neighbors with dense ranks 1..k."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.pq_ann(emb, n_query_vecs=8, k=3).collect()
    assert len(out) == 8 * 3
    by_q: dict[int, list[int]] = {}
    for r in out:
        assert -1.0001 <= r["approx_cos"] <= 1.0001, r
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    """After 2 Lloyd rounds every vector belongs to exactly one of the
    k clusters and the member counts add up to the corpus size — the
    assignment is a partition, not a multi-assignment or a drop."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    assigned, cent = similarity.kmeans(emb, k=8, iters=2)
    per_vec = assigned.groupBy("vec_id").count().filter(F.col("count") != 1).count()
    assert per_vec == 0
    counts = {r["cid"]: r["n"] for r in
              assigned.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= set(range(8))
    cents = cent.collect()
    assert all(len(r["cemb"]) == 64 for r in cents)
