"""Bucketed-table layout — the shuffle-free-join storage contract.

At 100 TB the dominant cost of a fact↔fact join is the shuffle of both
sides.  Writing the tables bucketed (and sorted) by the join key fixes
the partitioning AT WRITE TIME: a later join on that key needs no
exchange at all — each task zips bucket i of A with bucket i of B.
One write-time shuffle is amortized over every subsequent join,
which is exactly the trade a jobs/lineitem-scale pipeline wants.

Bucket count guidance: pick so each bucket is 100-500 MB at target
scale (e.g. 100 TB / 256 MB ≈ 400k buckets is too many files per
write; in practice bucket the PRUNED working set or combine with
date partitioning so each partition×bucket cell stays in that range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int, path: str
) -> None:
    """Write `df` as an external parquet table bucketed+sorted by
    `key`.  sortBy lets a later sort-merge join skip its sort too."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (the bucket spec comes from the catalog,
    which is what makes the exchange-free join plan possible)."""
    return spark.table(name)


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Write parquet hive-partitioned by `keys` (e.g. status, date).

    Partition pruning then turns a predicate on a key into directory
    pruning — the scan never lists, let alone reads, non-matching
    partitions.  This is the jobs-table layout at scale: partition by
    coarse status/date so the 60 s poll touches only the
    'Not Encoding' directory, not the full history."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)
