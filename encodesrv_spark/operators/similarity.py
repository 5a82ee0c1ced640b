"""Embedding similarity search.

* brute-force cosine top-k — the correctness baseline: broadcast the
  (small) query set against the candidate corpus; cosine is computed
  with higher-order array functions (zip_with + aggregate), entirely
  JVM-side, so the probe is one narrow pass over the corpus with no
  Python exchange.
* random-hyperplane LSH — the scale path: each vector maps to a
  small bucket id (sign pattern of dot products with fixed random
  planes); ANN search joins query↔candidate only within a bucket.
  Plane constants derive deterministically from the cross-engine hash,
  so the DuckDB oracle reproduces the exact same buckets.

At 100 TB the corpus side stays partitioned (optionally bucketed by the
LSH bucket id at write time so probes are partition-pruned); only
queries and plane constants broadcast.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — same accumulation order DuckDB's
    list_inner_product uses, so doubles agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(sq_norm(a) * sq_norm(b))


def brute_force_knn(
    embeddings: DataFrame, n_query_vecs: int = 8, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_query_vecs (broadcast),
    candidates = full corpus. Similarity is rounded to 4 dp BEFORE
    ranking so the cut is deterministic; vec_id breaks remaining ties."""
    e = embeddings.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
    ).withColumn("nrm", sq_norm(F.col("emb")))
    # Norms are computed ONCE per row here (corpus side) and once per
    # query (broadcast side) — not once per (query, candidate) pair; at
    # N corpus × Q queries that turns 2·N·Q norm folds into N + Q.
    q = e.filter(F.col("vec_id") < n_query_vecs).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    joined = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qemb"), F.col("emb"))
            / F.sqrt(F.col("qnrm") * F.col("nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def hyperplane(i: int, dims: int = 64) -> list[float]:
    """Deterministic pseudo-random plane i: component j is derived from
    md5(f"{i},{j}") exactly like functions.hashing.stable_hash64, mapped
    to [-1, 1]. Reproducible in SQL, no RNG state."""
    out = []
    for j in range(dims):
        h = int(hashlib.md5(f"{i},{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def lsh_bucket(emb: Column, n_planes: int = 8, dims: int = 64) -> Column:
    """Sign-pattern bucket id in [0, 2^n_planes)."""
    acc = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(c) for c in hyperplane(i, dims)])
        acc = acc + F.when(dot(emb, plane) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def lsh_bucket_sql(emb_expr: str, n_planes: int = 8, dims: int = 64) -> str:
    """DuckDB expression computing the identical bucket id."""
    terms = []
    for i in range(n_planes):
        lits = ", ".join(repr(c) for c in hyperplane(i, dims))
        terms.append(
            f"(CASE WHEN list_inner_product({emb_expr}, [{lits}]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


def lsh_ann(
    embeddings: DataFrame, n_query_vecs: int = 8, k: int = 3, n_planes: int = 8
) -> DataFrame:
    """Approximate NN: candidates restricted to the query's LSH bucket,
    then exact cosine top-k inside the bucket."""
    e = (
        embeddings.select(
            "vec_id",
            _as_double("embedding").alias("emb"),
        )
        .withColumn("bucket", lsh_bucket(F.col("emb"), n_planes))
        .withColumn("nrm", sq_norm(F.col("emb")))
    )
    q = e.filter(F.col("vec_id") < n_query_vecs).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
        F.col("nrm").alias("qnrm"),
    )
    joined = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qemb"), F.col("emb"))
            / F.sqrt(F.col("qnrm") * F.col("nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.9, n_planes: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Dedup by semantic similarity: candidate pairs are generated only
    inside an LSH bucket (same random-hyperplane sign pattern), then
    exact cosine filters at `threshold`.  The bucket id is the shuffle
    key — at 100 TB the corpus self-join shuffles each vector once and
    compares O(bucket²) not O(N²); near-identical vectors agree on all
    sign bits, so true near-dups co-bucket with high probability (the
    standard banding trade-off; more planes → smaller buckets, lower
    recall per band).

    Similarity is rounded to 4 dp BEFORE thresholding so the cut is
    reproducible cross-engine."""
    e = (
        embeddings.select("vec_id", _as_double("embedding").alias("emb"))
        .withColumn("bucket", lsh_bucket(F.col("emb"), n_planes))
        .withColumn("nrm", sq_norm(F.col("emb")))
    )
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = F.round(
        dot(F.col("a.emb"), F.col("b.emb")) / F.sqrt(F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid's cell (max cosine, centroid id breaks ties).

    Centroids here are the first `n_centroids` corpus vectors — a
    deterministic stand-in for a k-means codebook (the assignment/
    probe machinery is identical; production would train centroids
    offline and broadcast them the same way).  The cell id is the
    IVF partition key: at 100 TB the corpus is written partitioned
    by cell, so a probe reads only nprobe cells' files."""
    e = embeddings.select("vec_id", _as_double("embedding").alias("emb")).withColumn(
        "nrm", sq_norm(F.col("emb"))
    )
    c = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"),
        F.col("emb").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "emb",
        "nrm",
        "cent_id",
        F.round(
            dot(F.col("emb"), F.col("cemb")) / F.sqrt(F.col("nrm") * F.col("cnrm")), 4
        ).alias("csim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "nrm", F.col("cent_id").alias("cell"))
    )


def ivf_ann(
    embeddings: DataFrame,
    n_query_vecs: int = 8,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate NN: each query probes its `nprobe` nearest
    cells; exact cosine re-ranks inside them.  Recall/latency trades
    on nprobe exactly as in a production IVF index; candidates outside
    the probed cells are never scored (nor, with cell-partitioned
    storage, even read)."""
    e = embeddings.select("vec_id", _as_double("embedding").alias("emb")).withColumn(
        "nrm", sq_norm(F.col("emb"))
    )
    c = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"),
        F.col("emb").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    assigned = ivf_assign(embeddings, n_centroids)
    q = e.filter(F.col("vec_id") < n_query_vecs).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    qscored = q.crossJoin(F.broadcast(c)).select(
        "query_id",
        "qemb",
        "qnrm",
        "cent_id",
        F.round(
            dot(F.col("qemb"), F.col("cemb")) / F.sqrt(F.col("qnrm") * F.col("cnrm")), 4
        ).alias("csim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qemb", "qnrm", F.col("cent_id").alias("cell"))
    )
    cand = assigned.join(
        F.broadcast(probes),
        (assigned.cell == probes.cell) & (assigned.vec_id != probes.query_id),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qemb"), F.col("emb")) / F.sqrt(F.col("qnrm") * F.col("nrm")), 4
        ).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
