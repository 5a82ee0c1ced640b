"""Job-queue state machine and storage.

The reference keeps all coordination state in one mutable Postgres
table, with the varchar `status` column serving as state-machine state,
ownership lease, and progress channel at once (SURVEY.md §1.1).  This
module reproduces those semantics on Spark:

* :class:`JobStore` — a versioned-parquet transactional table with
  single-writer micro-batch discipline (SURVEY.md §7.3.1: the simplest
  model that matches the reference's one-driver reality; swap in Delta
  MERGE for multi-writer).  Every mutation is a keyed upsert producing
  a new immutable version directory + atomic pointer bump, so readers
  never observe partial writes (same staging-commit idea as
  FileOutputCommitter).
* status vocabulary + transition helpers — exact strings preserved as
  the compatibility surface (reference encodesrv/job.py:78,136,199,230,
  283,304,309,330; encodesrv/__init__.py:78,112).
* claim / crash-reset / publish transforms — declarative DataFrame
  rewrites of the reference's UPDATE statements.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- status vocabulary (compatibility surface) ------------------------------

NOT_ENCODING = "Not Encoding"
DONE = "Done"
ENCODED = "Encoded"  # publish succeeded but scratch cleanup failed (job.py:330)


def waiting(server: str) -> str:
    return f"{server} - Waiting"


def error(server: str) -> str:
    return f"{server} - Error"


def copying(server: str, pct: int) -> str:
    return f"{server} - Copying Source {pct}%"


def encoding_pass(server: str, n: int) -> str:
    return f"{server} - Encoding Pass {n}"


def moving_file(server: str) -> str:
    return f"{server} - Moving File"


# --- storage ----------------------------------------------------------------


class JobStore:
    """Versioned-parquet keyed table with atomic pointer commits.

    Layout:  <path>/v_{n:08d}/*.parquet  +  <path>/_CURRENT (pointer).

    Single-writer discipline: one scheduler owns the store (the
    reference is likewise one daemon per status-string namespace).
    Readers resolve _CURRENT and only ever see fully-written versions.
    """

    def __init__(self, spark: SparkSession, path: str, key: str = "id") -> None:
        self.spark = spark
        self.path = path
        self.key = key

    # -- version plumbing --

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v_{v:08d}")

    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"JobStore at {self.path} not initialized")
        return self.spark.read.parquet(self._version_dir(v))

    def _commit(self, df: DataFrame) -> None:
        v = self.current_version() + 1
        target = self._version_dir(v)
        df.write.mode("overwrite").parquet(target)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer())  # atomic pointer bump
        # retain previous version for concurrent readers; GC older ones
        for old in range(v - 2, -1, -1):
            d = self._version_dir(old)
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)

    # -- operations --

    def init(self, df: DataFrame) -> None:
        self._commit(df)

    def upsert(self, updates: DataFrame, cols: list[str]) -> None:
        """MERGE-style keyed update: for rows whose key appears in
        `updates`, overwrite `cols`; all other rows pass through.

        Implemented as a left join + coalesce — one shuffle of the
        (small) updates side when broadcast, zero full-table rewrite
        logic.  At real scale this is a Delta MERGE; semantics match.
        """
        cur = self.read()
        upd = updates.select(
            F.col(self.key).alias("__k"),
            *[F.col(c).alias(f"__u_{c}") for c in cols],
        )
        joined = cur.join(
            F.broadcast(upd), cur[self.key] == F.col("__k"), "left"
        )
        out_cols = []
        for c in cur.columns:
            if c in cols:
                out_cols.append(
                    F.when(F.col("__k").isNotNull(), F.col(f"__u_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        self._commit(joined.select(*out_cols))


# --- declarative transitions -------------------------------------------------


def crash_reset_updates(jobs: DataFrame, server: str) -> DataFrame:
    """ST5 — startup reconciliation: this server's in-flight, non-Error
    rows go back to 'Not Encoding' (reference encodesrv/__init__.py:73-84:
    UPDATE ... WHERE status LIKE '%srv%' AND status NOT LIKE '%Error%')."""
    return jobs.filter(
        F.col("status").contains(server) & ~F.col("status").contains("Error")
    ).select("id", F.lit(NOT_ENCODING).alias("status"))


def poll_candidates(jobs: DataFrame, limit: int) -> DataFrame:
    """T1 — SELECT ... WHERE status='Not Encoding' ORDER BY priority
    DESC LIMIT k, with the id tiebreak (reference encodesrv/__init__.py:103).
    limit <= 0 → empty (the reference's qsize-derived admission gate)."""
    if limit <= 0:
        return jobs.filter(F.lit(False))
    return (
        jobs.filter(F.col("status") == NOT_ENCODING)
        .orderBy(F.desc("priority"), F.asc("id"))
        .limit(limit)
    )


def claim_updates(candidates: DataFrame, server: str) -> DataFrame:
    """ST3 — the claim lease: status := '<server> - Waiting'
    (reference encodesrv/__init__.py:112)."""
    return candidates.select("id", F.lit(waiting(server)).alias("status"))


def rewrite_mounts(jobs: DataFrame, mount_prefix: str) -> DataFrame:
    """F1 — mount-prefix rewrite of source/destination paths at dequeue
    (reference encodesrv/__init__.py:108-110)."""
    from encodesrv_spark.functions.scalars import mount_rewrite

    return jobs.withColumn(
        "source_file", mount_rewrite("source_file", mount_prefix)
    ).withColumn("destination_file", mount_rewrite("destination_file", mount_prefix))


def video_files_updates(finished: DataFrame) -> DataFrame:
    """J2/S11 — publish effect: enable the video row and record output
    size (reference encodesrv/job.py:311-317). `finished` carries
    (video_id, size) for successfully published jobs."""
    return (
        finished.filter(F.col("video_id").isNotNull())
        .select(
            F.col("video_id").alias("id"),
            F.lit(True).alias("is_enabled"),
            F.col("size").cast("long").alias("size"),
        )
    )


@dataclass
class BotStatus:
    """§3.3 — the interactive status query results."""

    currently_encoding: str
    waiting_count: int
    message: str


def bot_status(jobs: DataFrame, server: str) -> BotStatus:
    """The bots' 'status' command (reference logs/bots/common.py:48-80):
    list of this server's running jobs (A3) + waiting count (A1/P5) +
    pluralized message (F5/F14). One two-branch aggregation."""
    running = (
        jobs.filter(
            F.col("status").contains(server)
            & ~F.col("status").contains("Error")
            & (F.col("status") != NOT_ENCODING)
        )
        .select(F.col("source_file"))
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.element_at(F.split("source_file", "/"), -1))
                ),
                ", ",
            ).alias("names")
        )
    )
    waiting_cnt = jobs.filter(
        (F.col("status") == NOT_ENCODING) | (F.col("status") == "Waiting")
    ).count()
    names = running.collect()[0]["names"] or "nothing"
    plural = "" if waiting_cnt == 1 else "s"
    return BotStatus(
        currently_encoding=names,
        waiting_count=waiting_cnt,
        message=(
            f"Currently encoding {names}, with {waiting_cnt} item{plural} waiting."
        ),
    )
