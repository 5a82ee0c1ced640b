"""Explicit StructTypes for the encode pipeline tables, mirrored from
the reference DDL (/root/reference/schema.sql) — no schema inference
anywhere (SURVEY.md §1.2/§1.3).

* encode_jobs    — the mutable work-queue fact table (schema.sql:235-245)
* encode_formats — the small broadcast dimension (schema.sql:29-52)
* video_files    — keyed upsert target (implied by job.py:314)

Field comments from the DDL become Spark column metadata.  The
reference's `numeric` priority maps to DoubleType (DecimalType(38,18)
would also work; double keeps top-k comparisons codegen-friendly and
the reference never does decimal arithmetic on it).
"""

from __future__ import annotations

from pyspark.sql import types as T

ENCODE_FORMATS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("format_name", T.StringType(), False),
        T.StructField("container", T.StringType(), False),
        T.StructField("video_bitrate", T.IntegerType(), False),
        T.StructField("video_bitrate_tolerance", T.IntegerType(), True),
        T.StructField("video_codec", T.StringType(), False),
        T.StructField("video_resolution", T.StringType(), False),
        T.StructField("audio_bitrate", T.IntegerType(), True),
        T.StructField("audio_samplerate", T.IntegerType(), True),
        T.StructField("audio_codec", T.StringType(), True),
        T.StructField("vpre_string", T.StringType(), True),
        T.StructField("aspect_ratio", T.StringType(), True),
        T.StructField("args_beginning", T.StringType(), True),
        T.StructField("args_video", T.StringType(), True),
        T.StructField("args_audio", T.StringType(), True),
        T.StructField("args_end", T.StringType(), True),
        T.StructField("apply_mp4box", T.BooleanType(), False),
        T.StructField("file_extension", T.StringType(), True),
        T.StructField("preset_string", T.StringType(), True),
        T.StructField("normalise_level", T.StringType(), True),
        T.StructField("ef_priority", T.IntegerType(), True),
        # `pass` is a Python keyword; stored as pass_count, surfaced as
        # "pass" where reference parity matters
        T.StructField("pass_count", T.IntegerType(), False),
    ]
)

ENCODE_JOBS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("destination_file", T.StringType(), False),
        T.StructField("format_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("video_id", T.LongType(), True),
        T.StructField("working_directory", T.StringType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

VIDEO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("is_enabled", T.BooleanType(), False),
        T.StructField("size", T.LongType(), True),
    ]
)

# The columns the poll scan projects (reference encodesrv/__init__.py:92)
POLL_COLUMNS = [
    "id",
    "source_file",
    "destination_file",
    "format_id",
    "status",
    "video_id",
]
