"""Focused guards for the round-10 optimization changes.

Each test pins the EQUIVALENCE an optimization relies on, not the
speed: footer row counts vs count(), the threshold-levenshtein filter
rewrite, and the n_vecs fast path of semdedup.  (The fused
connected_components initialization is covered by the existing
randomized union-find equivalence test in test_curation.py, whose
cases include multi-round chains.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from encodesrv_spark.catalog import TABLES, load_table, table_rows


def test_table_rows_matches_count_for_every_table(spark, sf_dir):
    """catalog.table_rows (parquet-footer metadata) must agree with the
    Spark count for every testdata table — the equivalence the
    count()-job removal in the dedup/similarity call sites stands on."""
    for t in TABLES:
        assert table_rows(sf_dir, t) == load_table(spark, sf_dir, t).count(), t


def test_threshold_levenshtein_filter_is_equivalent(spark):
    """fuzzy_pairs_levenshtein's rewrite: levenshtein(a, b, k) >= 0
    must select exactly the rows levenshtein(a, b) <= k selects, with
    identical distances on the kept rows — including the boundary
    (dist == k), just-over (k+1), empty strings, and equal strings."""
    k = 3
    rows = [
        ("kitten", "sitting"),        # dist 3 == k (kept, boundary)
        ("kitten", "kitten"),         # 0
        ("abcd", "wxyz"),             # 4 > k (dropped)
        ("", "abc"),                  # 3 == k
        ("", ""),                     # 0
        ("abcdefgh", "abxdefgh"),     # 1
        ("aaaaaaaa", "bbbbbbbb"),     # 8 > k
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    old = df.select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    ).filter(F.col("d") <= k)
    new = df.select(
        "a", "b", F.levenshtein("a", "b", k).alias("d")
    ).filter(F.col("d") >= 0)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_semdedup_n_vecs_equals_counted_path(spark, sf_dir):
    """semdedup(n_vecs=footer count) must produce exactly the frame the
    count()-based path produces — same derived k, same clusters."""
    from encodesrv_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    counted = semdedup(emb, k=8, iters=1, threshold=0.25, target_cluster_size=64)
    footer = semdedup(
        emb,
        k=8,
        iters=1,
        threshold=0.25,
        target_cluster_size=64,
        n_vecs=table_rows(sf_dir, "embeddings"),
    )
    assert sorted(map(tuple, counted.collect())) == sorted(
        map(tuple, footer.collect())
    )
