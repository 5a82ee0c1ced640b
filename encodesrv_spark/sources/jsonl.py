"""JSONL corpus ingest — the interchange format LLM training corpora
actually arrive in (one JSON document per line, gzip-shardable).

Design rules for 100 TB ingest:

* **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a full extra pass over the data just to infer types —
  at corpus scale that doubles the read.  Ingest declares the document
  schema once and Spark prunes/pushes down against it.
* **PERMISSIVE + corrupt-record capture.** Web-scale JSONL always
  contains broken lines (truncated shards, encoding junk).  DROPMALFORMED
  silently changes corpus statistics; FAILFAST kills a 10-hour job on
  line 9 billion.  PERMISSIVE routes broken lines into a
  `_corrupt_record` column so ingest can COUNT and QUARANTINE them —
  the audit is part of the read, not a separate pass.
* **Quarantine, then drop the column.** The corrupt capture column must
  not leak into downstream plans (it blocks column pruning on some
  paths); `read_corpus` splits good/bad frames eagerly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from encodesrv_spark.sources.files import (
    JSONL_CORRUPT_COL as _CORRUPT,
    JSONL_READ_OPTIONS,
    jsonl_full_schema,
)

# The document schema of this engine's corpus tables (matches the
# parquet `documents` table so JSONL shards and parquet shards are
# interchangeable inputs to every documents query).
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@dataclass(frozen=True)
class JsonlIngest:
    """Result of a JSONL corpus read: clean docs + quarantined lines."""

    docs: DataFrame
    corrupt: DataFrame

    def audit(self) -> DataFrame:
        """(n_docs, n_corrupt) — one tiny aggregate each."""
        spark = self.docs.sparkSession
        n_docs = self.docs.count()
        n_corrupt = self.corrupt.count()
        return spark.createDataFrame(
            [(n_docs, n_corrupt)], "n_docs long, n_corrupt long"
        )


def read_corpus(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> JsonlIngest:
    """Read a JSONL corpus with an explicit schema and corrupt-line
    quarantine — the split/audit layer over the raw reading contract
    in :func:`encodesrv_spark.sources.files.read_jsonl` (ONE place
    defines schema-no-inference + PERMISSIVE capture semantics).

    Per Spark semantics, corrupt-record rows can only be materialized
    when the corrupt column is selected from a cached or re-read frame
    — so the split below caches the one-pass read, filters each side,
    and drops the capture column from the clean side (it would
    otherwise defeat column pruning downstream)."""
    from encodesrv_spark.sources.files import read_jsonl

    full = read_jsonl(spark, path, schema=schema)
    # Spark requires referencing raw rows (not just the corrupt col) —
    # a cache scopes the single pass for both filters.
    full = full.cache()
    docs = full.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = full.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return JsonlIngest(docs=docs, corrupt=corrupt)


def write_jsonl_shards(
    docs: DataFrame, path: str, n_shards: int = 8, compress: bool = True
) -> None:
    """Export a documents frame as hash-sharded JSONL (the format
    downstream training stacks consume).  Sharding by doc_id hash keeps
    shard sizes balanced regardless of source skew; gzip per shard is
    the interchange default (splittability is already provided by the
    shard boundary, so in-file splittability doesn't matter)."""
    w = (
        docs.repartition(n_shards, F.col("doc_id"))
        .write.mode("overwrite")
    )
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def read_corpus_stream(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Streaming JSONL corpus ingest: the continuous form of
    :func:`read_corpus` — same explicit schema, same PERMISSIVE
    corrupt-line capture — for the arriving-shards case (a crawler
    dropping gzip shards into a landing directory).

    Returns ONE stream carrying both clean docs and a `raw_line`
    column (non-NULL ⇔ the line was corrupt), because a streaming
    source cannot be filtered into two independently-consumed frames
    without running the source twice; callers split with
    ``.filter("raw_line IS NULL")`` / ``IS NOT NULL`` into separate
    sinks (corpus vs quarantine) inside one foreachBatch, keeping the
    single-read guarantee.  The schema/PERMISSIVE/corrupt-column
    contract is the SAME constants the batch reader uses
    (`files.JSONL_READ_OPTIONS` / `files.jsonl_full_schema`) — a
    future option change lands on both paths at once."""
    return (
        spark.readStream.schema(jsonl_full_schema(schema))
        .options(**JSONL_READ_OPTIONS)
        .json(path)
        .withColumnRenamed(_CORRUPT, "raw_line")
    )
