"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas stages.

The pattern: media bytes ride along as a `binary` column (or stay
path-addressed and load inside the stage via spark.read.format
("binaryFile") at the source); decode / feature-extract / resize /
frame-sample run as mapInPandas stages — one Arrow batch in, one out,
never row-at-a-time Python.

The container has no image/audio codecs, so the actual decode is a
deterministic fake (`fake_decode_meta`) with the REAL Spark plumbing —
schema contract, Arrow batching, partition preservation — in place; a
production build swaps `fake_decode_meta` for PIL/ffmpeg calls
(marked below).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int, n_frames int"
)


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in for a media decode.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload))
    — unavailable in this container, so dimensions derive arithmetically
    from the payload so the DuckDB oracle can verify the plumbing
    end-to-end.
    """
    n = len(payload)
    checksum = hashlib.md5(payload).hexdigest()
    width = (n % 64 + 1) * 16
    height = (n % 36 + 1) * 16
    n_frames = n // 100 + 1
    return n, checksum, width, height, n_frames


def extract_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary).

    Arrow ships each partition as pandas batches; output partitioning
    follows input (no shuffle). At 100 TB, payload bytes never leave
    the executor that read them.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [m[0] for m in metas],
                    "checksum": [m[1] for m in metas],
                    "width": [m[2] for m in metas],
                    "height": [m[3] for m in metas],
                    "n_frames": [m[4] for m in metas],
                }
            )

    return with_payload.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, byte_offset long, frame_md5 string"


def sample_frames(with_payload: DataFrame, frame_bytes: int = 100) -> DataFrame:
    """Frame sampling: one output row per fixed-size payload slice —
    the UDTF-shaped multimodal op (a video frame sampler has exactly
    this plumbing: rows multiply, payload stays executor-local).

    Deterministic fake decode (real one would pull I-frames via
    ffmpeg): frame i = bytes [i*frame_bytes, (i+1)*frame_bytes), last
    frame ragged, checksummed so the oracle can verify every slice.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "byte_offset": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // frame_bytes + 1
                for i in range(n_frames):
                    chunk = data[i * frame_bytes : (i + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(i * frame_bytes)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, orig_bytes long, target_w int, target_h int, "
    "resized_bytes long, resized_md5 string"
)


def resize(with_payload: DataFrame, target_w: int = 128, target_h: int = 96) -> DataFrame:
    """Resize/thumbnail stage: payload in, smaller payload out, dims in
    the typed metadata — the 1:1 payload-transform multimodal op.

    The real implementation is PIL `Image.resize((w, h))` /
    `ffmpeg -vf scale` — codecs absent in this container, so the
    deterministic fake keeps the first `target_w * target_h / 64` bytes
    (a fixed, payload-derived byte budget) and checksums the result;
    the Spark-side contract — binary in/out through Arrow, metadata
    columns, no shuffle, payload never crosses to the driver — is real.
    """
    budget = target_w * target_h // 64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "orig_bytes": [],
                "target_w": [],
                "target_h": [],
                "resized_bytes": [],
                "resized_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                resized = data[:budget]  # fake decode+scale; see docstring
                out["doc_id"].append(doc_id)
                out["orig_bytes"].append(len(data))
                out["target_w"].append(target_w)
                out["target_h"].append(target_h)
                out["resized_bytes"].append(len(resized))
                out["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, RESIZE_SCHEMA)


def ascii_only_filter():
    """Spark half of the byte-contract the text-as-payload oracle twins
    rely on: the operators here slice UTF-8 BYTES (media payloads have
    no character semantics), while DuckDB's substr slices CHARACTERS
    and cannot slice or md5 a BLOB — so those twins restrict to ASCII
    docs, where byte length == char length and the two slicings
    provably coincide.  DuckDB half: `strlen(text) = length(text)`.
    A function, not a module-level Column: classic-mode Columns need
    an active SparkContext."""
    return F.octet_length("text") == F.length("text")


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as the opaque media payload
    (the testdata has no real media files)."""
    from encodesrv_spark.operators.dedup import fan_out

    return fan_out(docs).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
