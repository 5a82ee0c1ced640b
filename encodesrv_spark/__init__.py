"""encodesrv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ystv/EncodeSrv, generalized to Spark job
orchestration + large-scale (100 TB-posture) data processing.

Layout:
    session    — SparkSession factory tuned for the engine
    catalog    — testdata table loaders / view registration
    functions/ — scalar function library (reference F1-F18 + text/hash utils)
    operators/ — set-oriented operators (top-k, dedup, similarity, multimodal)
    plans/     — the query registry (Spark callable + DuckDB oracle SQL pairs)
    jobs/      — the encode-job pipeline: schemas, state machine, scheduler,
                 external-process operator
    streaming/ — Structured Streaming analogs of the reference's poll loop
"""

__version__ = "0.1.0"
