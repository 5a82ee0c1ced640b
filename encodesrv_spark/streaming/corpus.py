"""Streaming corpus ingest — the continuous form of the batch
corpus-engineering operators (plans/corpus.py).

A production training-data pipeline does not re-dedup the whole corpus
per batch: new documents arrive continuously and are checked against
the fingerprint store of everything already ingested.  This module is
that steady-state shape as Structured Streaming: stream-static anti
join (the static side is the store; Spark re-plans it per micro-batch,
so a store refreshed by compaction is picked up without restart) plus
in-stream dedup state for duplicates WITHIN the unprocessed window.

Generalizes the reference's poll-loop "claim only what is new" contract
(`encodesrv/__init__.py:103-113`) from jobs to documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source documents stream (tests drop parquet files into
    `path`; production points at Kafka/object-store notifications with
    the same downstream ops)."""
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(path)


def incremental_dedup_stream(
    docs: DataFrame, store: DataFrame, ingest_ts: str | None = None
) -> DataFrame:
    """Streaming twin of the batch `incremental_dedup` query: hash the
    incoming text (16-byte key — the join/state never carries document
    bodies), LEFT ANTI stream-static join against the fingerprint
    store, then drop in-stream re-deliveries on the same hash.

    State posture at scale: the anti join is stateless (static side is
    re-broadcast/re-scanned per micro-batch); the dropDuplicates state
    grows with distinct NEW hashes only.  Pass `ingest_ts` (an
    event-time column) to bound it with a watermark via
    `dropDuplicatesWithinWatermark`; without it the state is unbounded,
    which is fine for availableNow backfills but not for a 24/7 stream.
    """
    hashed = docs.select(
        "doc_id", F.md5("text").alias("text_hash"), "source",
        *([ingest_ts] if ingest_ts else []),
    )
    fresh = hashed.join(
        store.select("text_hash").distinct(), "text_hash", "left_anti"
    )
    if ingest_ts:
        return fresh.withWatermark(ingest_ts, "1 hour").dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return fresh.dropDuplicates(["text_hash"])


def chunked_docs_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of the batch `doc_chunks` query: sliding
    context-window chunking is a stateless per-row flatMap (sequence →
    posexplode → slice), so the twin is literally the same expression
    tree applied to the stream — no state, no watermark, append-mode
    output.  Emits the same (doc_id, chunk_idx, n_words, chunk_hash)
    rows; the hashes feed `incremental_dedup_stream` keyed on
    chunk_hash for chunk-level streaming dedup (boilerplate removal at
    ingest time)."""
    from encodesrv_spark.plans.corpus import _CHUNK_S, _CHUNK_W

    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    st = d.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_CHUNK_S))
        ).alias("chunk_idx", "start"),
    )
    chunk = F.slice("toks", F.col("start") + 1, _CHUNK_W)
    return st.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
