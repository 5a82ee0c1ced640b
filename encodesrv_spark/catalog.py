"""Testdata catalog: loaders for the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file per table under
``{sf_dir}/``.

The only special case is ``events``: its ``ts`` column is parquet
TIMESTAMP(NANOS), which Spark 4 refuses to read natively
([PARQUET_TYPE_ILLEGAL]).  We read it with an explicit schema as INT64
nanoseconds and expose BOTH:

* ``ts``    — TimestampType truncated to microseconds (Spark's native
              precision) for window/date functions, and
* ``ts_ns`` — the exact int64 epoch-nanoseconds, so queries that need
              cross-engine exactness (sessionization gaps, orderings)
              can use integer arithmetic that DuckDB reproduces with
              ``epoch_ns(ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return (
            df.withColumn("ts_ns", F.col("ts"))
            # integer DIV keeps full precision (double division would lose
            # bits: epoch-ns ~1.7e18 exceeds a double's 53-bit mantissa)
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
