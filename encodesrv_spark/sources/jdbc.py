"""JDBC source/sink (S1/S8-S11 against a live PostgreSQL).

The reference's jobs table lives in Postgres
(/root/reference/encodesrv/__init__.py:100-105); on a real deployment
the JobStore swaps its parquet versioning for these readers/writers.
No Postgres exists in the test container, so the *Postgres* path only
builds configurations — but the reader/writer mechanics themselves are
integration-tested against the embedded Apache Derby engine that ships
on Spark's classpath (tests/test_sources.py::test_jdbc_roundtrip_derby
does a real write → parallel partitioned read → predicate-pushdown
round-trip through Spark's JDBC data source).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from encodesrv_spark.sources.config import DbConfig


def reader_options(
    url: str,
    table: str,
    driver: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> dict:
    """Options for a (optionally parallel) JDBC scan.

    `partition_column` + bounds split the scan into `num_partitions`
    range queries issued concurrently — without them the whole table
    arrives through ONE connection (the S1 poll scan is small and
    predicate-pushed, so serial is fine there; history backfills want
    the partitioned form).  Spark requires lower/upper bounds whenever
    partitionColumn is set; callers typically feed min/max of the key.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        # push LIMIT/sort of the top-k poll into the database
        "pushDownLimit": "true",
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


@dataclass(frozen=True)
class JdbcTable:
    db: DbConfig
    table: str

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.db.host}:{self.db.port}/{self.db.database}"

    def reader_options(
        self,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int = 8,
    ) -> dict:
        return reader_options(
            self.url,
            self.table,
            "org.postgresql.Driver",
            user=self.db.user,
            password=self.db.password,
            partition_column=partition_column,
            lower_bound=lower_bound,
            upper_bound=upper_bound,
            num_partitions=num_partitions,
        )

    def read(self, spark: SparkSession, **kw) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options(**kw)).load()

    def append(self, df: DataFrame) -> None:
        (
            df.write.format("jdbc")
            .options(url=self.url, dbtable=self.table, user=self.db.user,
                     password=self.db.password, driver="org.postgresql.Driver")
            .mode("append")
            .save()
        )
