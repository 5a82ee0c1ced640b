"""JDBC source/sink scaffolding (S1/S8-S11 against a live PostgreSQL).

The reference's jobs table lives in Postgres; on a real deployment the
JobStore swaps its parquet versioning for these readers/writers.  No
database exists in the test container, so this module only *builds*
the reader/writer configurations (unit-testable); the semantics they
feed (claim, upsert, crash reset) are covered by the JobStore tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from encodesrv_spark.sources.config import DbConfig


@dataclass(frozen=True)
class JdbcTable:
    db: DbConfig
    table: str

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.db.host}:{self.db.port}/{self.db.database}"

    def reader_options(self, partition_column: str | None = None, num_partitions: int = 8) -> dict:
        """Options for a parallel JDBC scan.  partition_column splits
        the scan into num_partitions range queries — without it the
        whole table arrives through one connection (the S1 poll scan is
        small and predicate-pushed, so serial is fine there; history
        backfills want the partitioned form)."""
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "user": self.db.user,
            "password": self.db.password,
            "driver": "org.postgresql.Driver",
            # push LIMIT/sort of the top-k poll into Postgres (DSv2)
            "pushDownLimit": "true",
        }
        if partition_column:
            opts.update(
                {
                    "partitionColumn": partition_column,
                    "numPartitions": str(num_partitions),
                }
            )
        return opts

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
