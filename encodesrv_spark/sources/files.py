"""File-addressed sources (S5/S6/S13 + A2).

* binary media source — spark.read.format('binaryFile'): each file is a
  row (path, modificationTime, length, content) feeding the multimodal
  operators.  At 100 TB you point this at an object-store prefix and
  partition-by-directory pruning applies via pathGlobFilter.
* FS listing DataFrame — the set-oriented form of the reference's
  os.listdir + regex matching for thumbnail sequences
  (/root/reference/encodesrv/job.py:298-306) and its size-sum (A2,
  job.py:53-57).
* existence probe — the reference's per-job open() check
  (job.py:132-137) as an anti-join against a listing: one listing scan
  validates a whole batch of jobs instead of N round trips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from encodesrv_spark.functions.scalars import printf_pattern_to_regex


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S6 — binary file source for multimodal payloads."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def listing_df(spark: SparkSession, directory: str) -> DataFrame:
    """Directory listing as a DataFrame (name, path, size).

    Local-FS implementation for the process operator's publish step;
    the binaryFile source above is the distributed-scan variant (it
    lists via the Hadoop FS API and therefore works on object stores).
    """
    entries = [
        (name, os.path.join(directory, name), os.path.getsize(os.path.join(directory, name)))
        for name in sorted(os.listdir(directory))
        if os.path.isfile(os.path.join(directory, name))
    ]
    return spark.createDataFrame(entries, "name string, path string, size long")


def match_sequence(listing: DataFrame, printf_dest: str) -> DataFrame:
    """S13 — filter a listing to files matching a '%05d' printf pattern
    (rlike on the rewritten regex)."""
    base = printf_dest.rsplit("/", 1)[-1]
    regex = (
        listing.sparkSession.range(1)
        .select(printf_pattern_to_regex(F.lit(base)).alias("r"))
        .collect()[0]["r"]
    )
    return listing.filter(F.col("name").rlike(f"^{regex}$"))


def total_size(listing: DataFrame) -> int:
    """A2 — Σ file sizes (reference job.py:53-57)."""
    row = listing.agg(F.sum("size").alias("s")).collect()[0]
    return int(row["s"] or 0)


def missing_sources(jobs: DataFrame, listing: DataFrame) -> DataFrame:
    """S5 — existence probe as a left-anti join: jobs whose source_file
    is absent from the listing (batch form of the reference's per-job
    open() check)."""
    return jobs.join(
        listing.select(F.col("path").alias("source_file")), "source_file", "left_anti"
    )


DOCS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


# The JSONL ingest contract, defined ONCE and consumed by BOTH the
# batch reader below and the streaming reader (sources/jsonl.py
# read_corpus_stream) so the two paths cannot silently diverge:
# explicit schema (no inference pass), PERMISSIVE mode, corrupt lines
# captured into JSONL_CORRUPT_COL.
JSONL_CORRUPT_COL = "_corrupt_record"
JSONL_READ_OPTIONS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": JSONL_CORRUPT_COL,
}


def jsonl_full_schema(schema: str) -> str:
    """The declared schema plus the corrupt-capture column (required:
    Spark only captures corrupt lines into a column present in the
    read schema)."""
    return f"{schema}, {JSONL_CORRUPT_COL} string"


def read_jsonl(
    spark: SparkSession, path: str, schema: str = DOCS_JSONL_SCHEMA
) -> DataFrame:
    """JSON-lines corpus source with an EXPLICIT schema — the common
    raw-ingest format for training-data pipelines (one document object
    per line, splittable, so a 100 TB prefix parallelizes per-block).

    Schema inference is disabled by contract: on a large prefix
    inference costs a full extra pass and silently widens types on
    dirty data.  Corrupt lines land in `_corrupt_record` instead of
    failing the scan (PERMISSIVE), so a bad shard quarantines rather
    than kills a day-long ingest; count them and route to a dead-letter
    path."""
    return (
        spark.read.schema(jsonl_full_schema(schema))
        .options(**JSONL_READ_OPTIONS)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with an EXPLICIT schema and corrupt-row quarantine —
    same ingest contract as `read_jsonl`: no inference pass (a full
    extra scan at 100 TB, type-widening on dirty data), PERMISSIVE
    parse so malformed rows land in `_corrupt_record` for dead-letter
    routing instead of failing the shard.  CSV is splittable only
    without multiline quoting, so keep `multiLine` off for scale."""
    full = schema + ", _corrupt_record string"
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def write_read_orc(df: DataFrame, path: str) -> DataFrame:
    """ORC interchange sink/source — columnar alternative when the
    downstream consumer is Hive/Trino-side.  Same predicate-pushdown
    and column-pruning contract as parquet (ORC carries min/max +
    bloom indexes); the engine's internal format stays parquet."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)
