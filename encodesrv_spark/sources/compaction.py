"""Small-file compaction and range-clustered layout — table maintenance
for a 100 TB corpus.

Streaming ingest (the 60 s poll loop writing micro-batches, reference
`encodesrv/__init__.py:97-141`) and fine-grained partitioning both
produce the classic small-file problem: millions of KB-scale parquet
files whose open/footer overhead dominates scan time and whose count
blows up driver-side listing.  Compaction rewrites a directory into
~target-size files; range-clustering additionally sorts the data so
min/max footer statistics prune file-level I/O for range predicates
(the poor man's Z-order — exact for one key, prefix-ordered for more).

Both operators are pure DataFrame rewrites: the only shuffle is the one
`repartition`/`repartitionByRange` exchange that fixes the output
layout, and the write inherits Spark's staging-commit protocol, so a
failed compaction never corrupts the table (same stage-then-publish
contract as the reference's temp-dir encode, `encodesrv/job.py:282-309`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DirStats:
    """File-level stats for a table directory (driver-side, from the
    Hadoop FileSystem so it works the same on HDFS/S3/local)."""

    n_files: int
    total_bytes: int
    small_files: int  # files below the small threshold

    def needs_compaction(self, min_small: int = 8) -> bool:
        return self.small_files >= min_small


def dir_stats(
    spark: SparkSession, path: str, small_bytes: int = 32 * 1024 * 1024
) -> DirStats:
    """List data files under `path` via the Hadoop FS API (driver-side
    metadata only — never reads data).  At real scale this listing is
    the thing compaction keeps bounded."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    n = total = small = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        size = st.getLen()
        total += size
        if size < small_bytes:
            small += 1
    return DirStats(n_files=n, total_bytes=total, small_files=small)


def target_partitions(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), floor 1 — the output file count."""
    return max(1, math.ceil(total_bytes / max(1, target_bytes)))


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> DirStats:
    """Rewrite the parquet directory at `path` into ~target-size files
    at `out_path`.  One exchange (round-robin `repartition(n)` — no key,
    so output files are size-balanced regardless of data skew), one
    write.  Returns the post-compaction stats."""
    stats = dir_stats(spark, path)
    n = target_partitions(stats.total_bytes, target_bytes)
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(out_path)
    return dir_stats(spark, out_path)


def write_range_clustered(
    df: DataFrame, path: str, n_files: int, *keys: str
) -> None:
    """Write `df` range-partitioned AND sorted by `keys`: every output
    file owns a disjoint key range and is internally sorted, so parquet
    row-group min/max stats turn a range predicate into file/row-group
    skipping at scan time.  `repartitionByRange` samples the key
    distribution, so skewed keys still yield balanced files (unlike
    hash bucketing, which needs salting under skew)."""
    cols = [F.col(k) for k in keys]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(df_with_file: DataFrame, key: str) -> DataFrame:
    """Per-file min/max of `key` — the verification view of the
    clustered layout (what the parquet footer will serve to the
    scanner).  Input must carry `input_file_name()` as `_file`."""
    return (
        df_with_file.groupBy("_file")
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        .orderBy("lo")
    )


def _zorder_with_z(
    df: DataFrame, col_a: str, col_b: str, bits: int,
    splits_a: list, splits_b: list,
) -> DataFrame:
    """`df` plus a `__z` Morton-curve column computed against FIXED
    bucket boundaries (the reusable core of the z-order writer — a
    later incremental-maintenance pass must cluster appended rows on
    the SAME curve as the base layout, or the per-file z-ranges stop
    meaning anything)."""
    from pyspark.ml.feature import Bucketizer

    tmp = df.withColumn("__a", F.col(col_a).cast("double")).withColumn(
        "__b", F.col(col_b).cast("double")
    )
    buck = Bucketizer(
        inputCols=["__a", "__b"],
        outputCols=["__ab", "__bb"],
        splitsArray=[splits_a, splits_b],
        handleInvalid="keep",
    )
    bucketed = buck.transform(tmp)
    # handleInvalid='keep' routes null/NaN rows to an EXTRA bucket id
    # (one past the last real bucket, up to 2^bits); the interleave
    # reads only the low `bits` bits, so unclamped those rows would
    # wrap to z-bucket 0 and pollute the lowest z-range files' min/max
    # stats.  Clamp into the top real bucket instead: invalid rows sort
    # to the HIGH end of the curve, where they skew only the last file.
    top = F.lit((1 << bits) - 1).cast("long")
    a_bkt = F.least(F.col("__ab").cast("long"), top)
    b_bkt = F.least(F.col("__bb").cast("long"), top)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        z = F.shiftleft(z, 1).bitwiseOR(F.shiftright(a_bkt, i).bitwiseAND(one))
        z = F.shiftleft(z, 1).bitwiseOR(F.shiftright(b_bkt, i).bitwiseAND(one))
    return bucketed.withColumn("__z", z).drop("__a", "__b", "__ab", "__bb")


def write_zorder_clustered(
    df: DataFrame, path: str, n_files: int, col_a: str, col_b: str, bits: int = 8
) -> None:
    """Write `df` clustered on the Z-ORDER (Morton) curve of two
    columns: each value maps to a `bits`-bit QUANTILE bucket, the
    bucket ids' bits interleave into one z-value, and files are
    range-partitioned + sorted on it.

    Why: linear clustering (`write_range_clustered`) gives ONE column
    file-level locality — predicates on the other column scan every
    file.  The space-filling curve gives BOTH columns bounded per-file
    ranges, so 2-D box predicates (customer AND price band, time AND
    key, ...) prune files on either dimension.

    Scale posture: bucket boundaries come from ONE `approxQuantile`
    pass (driver holds 2^bits+1 doubles, nothing else), bucketization
    is a JVM `Bucketizer`, and the interleave is a fold of shift/or
    Column expressions — no global-order window, no rank shuffle, so
    the layout job is sample + one write, same as repartitionByRange.

    Alongside the data the writer drops a `_zorder_meta.json` sidecar
    recording the curve (columns, bits, bucket boundaries) and the set
    of CURVE-CLUSTERED file names — the layout manifest that later
    appends and `zorder_maintain` work against.  (In a deployment this
    manifest lives in the table format's transaction log — Delta /
    Iceberg; the sidecar is the single-writer stand-in with the same
    information content.)"""
    nb = 1 << bits
    probs = [i / nb for i in range(nb + 1)]
    splits_a = _monotone(df.approxQuantile(col_a, probs, 0.001))
    splits_b = _monotone(df.approxQuantile(col_b, probs, 0.001))
    (
        _zorder_with_z(df, col_a, col_b, bits, splits_a, splits_b)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    _write_zmeta(path, {
        "col_a": col_a, "col_b": col_b, "bits": bits,
        "splits_a": splits_a, "splits_b": splits_b,
        "clustered_files": _data_files(path),
        # sorted-run count: the base write is run 1; each incremental
        # zorder_maintain pass adds one (its output overlaps the other
        # runs' z-ranges) — the LSM read-amplification meter that
        # decides when a full re-cluster pays
        "runs": 1,
    })


def _zmeta_path(path: str) -> str:
    import os

    return os.path.join(path, "_zorder_meta.json")


def _write_zmeta(path: str, meta: dict) -> None:
    import json

    with open(_zmeta_path(path), "w") as fh:
        json.dump(meta, fh)


def read_zmeta(path: str) -> dict:
    import json

    with open(_zmeta_path(path)) as fh:
        return json.load(fh)


def _data_files(path: str) -> list[str]:
    """Data file NAMES under `path` (same underscore/dot convention as
    `dir_stats` — `_zorder_meta.json`, `_SUCCESS` etc. are metadata)."""
    import os

    return sorted(
        f for f in os.listdir(path)
        if not f.startswith("_") and not f.startswith(".")
        and os.path.isfile(os.path.join(path, f))
    )


def _complete_pending(path: str) -> bool:
    """Idempotent redo of a publish intent left in the manifest by a
    crashed `zorder_maintain` pass.  The intent (`pending`) records the
    staging dir, the staged file names, the files to delete, and the
    FINAL manifest — written BEFORE any rename, so at every crash point
    replaying it converges: a staged file already moved in is skipped,
    a delete already applied is skipped.  Returns True if an intent was
    completed."""
    import os
    import shutil

    meta = read_zmeta(path)
    pending = meta.get("pending")
    if not pending:
        return False
    base = os.path.dirname(os.path.abspath(path.rstrip("/"))) or "."
    staging = os.path.join(base, pending["staging"])
    for f in pending["new_files"]:
        dst = os.path.join(path, f)
        if os.path.exists(dst):
            continue  # moved before the crash
        src = os.path.join(staging, f)
        if not os.path.exists(src):
            raise RuntimeError(
                f"zorder publish intent references {f!r} present in "
                f"neither {path} nor {staging} — manual repair needed"
            )
        os.rename(src, dst)
    for f in pending["delete"]:
        p = os.path.join(path, f)
        if os.path.exists(p):
            os.remove(p)
    shutil.rmtree(staging, ignore_errors=True)
    _write_zmeta(path, pending["final"])
    return True


def _sweep_orphan_staging(path: str) -> list[str]:
    """Delete sibling staging dirs (`<table>__maintain_p<pid>` /
    `<table>__merge_p<pid>`) left by a maintain pass that crashed BEFORE
    writing its publish intent (ADVICE r09): such a dir is referenced by
    nothing — `_complete_pending` only replays the intent recorded in
    the manifest — so under the module's single-writer contract every
    matching sibling found when NO intent is pending is an orphan, and
    repeated pre-intent crashes (each under a new pid) would otherwise
    leak unbounded table-sized copies next to the table.  Called by
    `zorder_maintain` after `_complete_pending`, i.e. exactly when no
    pending intent can reference any staging dir.  Returns the deleted
    dir names."""
    import glob
    import os
    import shutil

    base = path.rstrip("/")
    gone = []
    for pat in (f"{base}__maintain_p*", f"{base}__merge_p*"):
        for d in glob.glob(pat):
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
                gone.append(os.path.basename(d))
    return sorted(gone)


def _publish(
    path: str, staging: str, delete_files: list[str], final_meta: dict
) -> list[str]:
    """Crash-safe stage-then-publish for `zorder_maintain` (ADVICE r08):
    record the full intent in the manifest FIRST, then execute it via
    the same idempotent redo a recovery uses.  A crash at any point
    after the intent write is completed by the next maintain pass
    instead of leaving both the deltas and their compacted copies
    classified as un-clustered (which the old rename-then-delete order
    silently double-counted).  A crash BEFORE the intent write loses
    only the staging dir (deltas untouched, manifest unchanged).

    Raises RuntimeError (not a bare assert — this must survive
    `python -O`) on a staged-name collision with ANY live file: Spark's
    per-job-UUID part names make that effectively impossible, but a
    rename-over would silently drop the target file's rows."""
    import os

    new_files = _data_files(staging)
    clash = set(new_files) & set(_data_files(path))
    if clash:
        raise RuntimeError(
            f"part-file name collision publishing {staging} into "
            f"{path}: {sorted(clash)}"
        )
    meta = read_zmeta(path)
    meta["pending"] = {
        "staging": os.path.basename(staging.rstrip("/")),
        "new_files": sorted(new_files),
        "delete": sorted(delete_files),
        "final": final_meta,
    }
    _write_zmeta(path, meta)
    _complete_pending(path)
    return new_files


def zorder_append(df: DataFrame, path: str, n_files: int = 1) -> None:
    """Micro-batch append to a z-ordered table — the 60 s ingest loop's
    write: land the batch FAST (no sample, no clustering, `n_files`
    round-robin files), deliberately leaving the layout debt to the
    asynchronous `zorder_maintain` pass.  Clustering inline would put
    an approxQuantile sample plus a range shuffle on the ingest latency
    path of every tiny batch; the whole point of the manifest is that
    ingest and layout maintenance are separate rates."""
    df.repartition(n_files).write.mode("append").parquet(path)


def zorder_maintain(
    spark: SparkSession, path: str, min_delta_files: int = 4,
    n_files: int | None = None, target_bytes: int = 256 * 1024 * 1024,
    max_runs: int = 8,
) -> dict:
    """Incremental z-order maintenance: compact the files APPENDED
    since the last clustering pass into new curve-clustered files,
    leaving the already-clustered base files UNTOUCHED.

    Mechanics: the manifest (`_zorder_meta.json`) knows exactly which
    files are curve-clustered, so delta files = directory listing minus
    manifest — a size heuristic would be SF-relative and misclassify.
    If fewer than `min_delta_files` deltas accumulated, this is a no-op
    (layout debt below threshold).  Otherwise ONLY the delta rows are
    read, z-valued against the manifest's FIXED bucket boundaries (the
    same curve as the base — no re-sample, so base and delta z-ranges
    are commensurable), range-partitioned into ~`target_bytes` files,
    staged into a temp dir, and moved in; the old delta files are then
    removed and the manifest updated.

    Scale contract: cost is proportional to the DELTA, never the
    table — a nightly maintenance pass over a 100 TB table with 200 GB
    of appends reads and writes 200 GB.  The result is one extra
    sorted run per maintenance pass (base files and each pass's output
    cover overlapping z-ranges), which is exactly the LSM trade: box
    scans still prune file-by-file on min/max stats across every run.
    The manifest counts runs, and when a pass would push the count
    past `max_runs` the operator MERGES instead: a full re-cluster via
    `write_zorder_clustered` (fresh quantile sample too — after many
    appends the base boundaries may no longer equidistribute) resets
    the table to one run.  That is the amortization knob: read
    amplification is bounded by `max_runs`, and the full-rewrite cost
    is paid once per `max_runs − 1` delta-sized passes, not per batch.

    Publish protocol (crash-safe, single-writer): the manifest is a
    WRITE-AHEAD intent — before any rename it records the staged file
    names, the files to delete, and the final manifest, and every
    maintain pass first replays any intent a crashed predecessor left
    (`_complete_pending`), so a crash at any point between staging and
    the final manifest write can never double-count delta rows (ADVICE
    r08 — the old rename-then-delete order had exactly that window).
    SINGLE-WRITER, and reader visibility is directory-listing-based:
    a concurrent reader that lists between the rename-in and the
    delta-delete sees both a delta file and its compacted copy and
    double-counts those rows — on local/HDFS semantics the only
    airtight answer is the table format's atomic commit log (Delta /
    Iceberg snapshot isolation); this sidecar is the single-writer
    stand-in (same stage-then-publish contract as the reference's
    temp-dir encode, `encodesrv/job.py:282-309`, which has the same
    single-consumer assumption)."""
    import os

    _complete_pending(path)
    # any staging sibling still on disk now is a pre-intent crash orphan
    # (the completed intent's dir was just consumed) — reclaim it
    _sweep_orphan_staging(path)
    meta = read_zmeta(path)
    clustered = set(meta["clustered_files"])
    delta = [f for f in _data_files(path) if f not in clustered]
    if len(delta) < min_delta_files:
        return {"compacted_files": 0, "new_files": [], "skipped": True}

    runs = meta.get("runs", 1)
    if runs + 1 > max_runs:
        # run-merge: full re-cluster (reads the whole table — the
        # amortized cost paid once per max_runs−1 incremental passes)
        total_bytes = sum(
            os.path.getsize(os.path.join(path, f)) for f in _data_files(path)
        )
        n_full = n_files or target_partitions(total_bytes, target_bytes)
        staging = f"{path.rstrip('/')}__merge_p{os.getpid()}"
        write_zorder_clustered(
            spark.read.parquet(path), staging, n_full,
            meta["col_a"], meta["col_b"], meta["bits"],
        )
        old_files = _data_files(path)
        merged_meta = read_zmeta(staging)
        merged_meta["clustered_files"] = sorted(_data_files(staging))
        new_files = _publish(path, staging, old_files, merged_meta)
        return {"compacted_files": len(old_files), "new_files": new_files,
                "skipped": False, "merged": True}

    delta_paths = [os.path.join(path, f) for f in delta]
    n = n_files or target_partitions(
        sum(os.path.getsize(p) for p in delta_paths), target_bytes
    )
    zdf = _zorder_with_z(
        spark.read.parquet(*delta_paths),
        meta["col_a"], meta["col_b"], meta["bits"],
        meta["splits_a"], meta["splits_b"],
    )
    staging = f"{path.rstrip('/')}__maintain_p{os.getpid()}"
    (
        zdf.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(staging)
    )
    final_meta = dict(meta)
    final_meta.pop("pending", None)
    final_meta["clustered_files"] = sorted(clustered | set(_data_files(staging)))
    final_meta["runs"] = runs + 1
    new_files = _publish(path, staging, delta, final_meta)
    return {"compacted_files": len(delta), "new_files": new_files,
            "skipped": False, "merged": False}


def _monotone(splits: list) -> list:
    """Strictly-increasing splits for Bucketizer (approxQuantile can
    repeat values on discrete/skewed data), bounded by ±inf."""
    out = [float("-inf")]
    for v in splits:
        if v > out[-1]:
            out.append(v)
    out.append(float("inf"))
    return out
