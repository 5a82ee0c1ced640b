"""Streaming SCD2 dimension maintenance — the CDC-fed continuous form
of the batch operators in ``operators/scd.py``.

The reference's formats dimension is edited in place and the 60 s poll
loop simply reads whatever is current (`encodesrv/__init__.py:97-141`,
`schema.sql:29-52`), so history is lost the moment an operator tweaks a
format.  The batch SCD2 story (``scd2_init`` → ``scd2_apply`` →
``scd2_asof`` fact-time join) fixes that for nightly applies; this
module closes the loop the engine is actually built around: a CDC feed
consumed by Structured Streaming, folded last-write-wins per commit
timestamp, and applied to the versioned history inside ``foreachBatch``
— the streaming half of the ST1–ST3 control-loop family.

Ordering contract: a CDC slice may span several commit timestamps, and
the file source is free to deliver one file per trigger or all of them
at once.  ``scd2_apply_cdc`` applies the slice as one ``scd2_apply``
per DISTINCT commit timestamp, ascending, so the result is invariant
to any ORDER-PRESERVING chunking of the feed (no commit delivered
after a LATER commit has already been applied) — within that contract,
one file per trigger and one availableNow gulp produce identical
history.  At-least-once delivery is additionally safe: a re-delivered
commit folds to the values already current and drops as a no-op.  What
CANNOT be silently accepted is a late commit carrying REAL changes
(batch ts ≤ the max already applied, values differing from current):
applying it would stamp a version into the past of the current one —
anachronistic history with no error — so the sink applies any
late-timestamped group in ``scd2_apply``'s no-op-only mode
(``on_real_change="error"``): benign redeliveries pass, a genuinely
late change fails the micro-batch loudly (the same loud-failure
posture as the apply's NULL-key guard).  Each commit must arrive
whole within one micro-batch (a commit split across triggers can
cross its own fold order and is caught by the same guard when it
conflicts).

State posture: the history is a driver-held DataFrame re-checkpointed
(`localCheckpoint`) after every apply — lineage is truncated per
micro-batch, so the plan does not grow with stream length, and each
apply costs exactly the batch operator's one key shuffle.  A production
deployment holds the history in a table format instead (Delta MERGE /
Iceberg upsert per micro-batch) and recovers by replaying the CDC log
from the stream checkpoint; the driver-held frame is the single-writer
stand-in, same contract as the versioned JobStore
(``jobs/state.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from encodesrv_spark.operators.scd import fold_last_write_wins, scd2_apply


def scd2_apply_cdc(
    hist: DataFrame,
    cdc: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str,
    order_col: str,
    max_applied_ts=None,
):
    """Apply one CDC slice (any number of commit timestamps) to an SCD2
    history: group rows by ``ts_col``, fold each group last-write-wins
    on ``order_col``, and apply the groups in ascending timestamp order.
    Returns ``(new_hist, new_max_applied_ts)``.

    ``max_applied_ts`` (the caller's high-water mark, tracked by
    ``Scd2Stream`` across micro-batches) arms the late-commit guard:
    any group at or below it is applied in no-op-only mode
    (``on_real_change="error"``), so whole-commit redeliveries pass
    silently and a late commit with real changes — which would write a
    version into the past of current history — fails loudly per-row.

    Commit identity IS the timestamp: ``ts_col`` is both the ordering
    key and the version stamp written into history, so two genuinely
    distinct commits sharing one timestamp are indistinguishable from a
    redelivery (the second folds against the first's applied values and,
    if it carries real changes, fails the no-op-only guard) — same-ts
    distinct commits are out of contract.  A NULL ``ts_col`` therefore
    has no place in the feed at all: it names no commit and would
    otherwise be mis-routed (or crash ``sorted`` with an opaque
    None-vs-datetime TypeError), so it is rejected loudly up front
    (ADVICE r09).

    The ``distinct().collect()`` on ``ts_col`` is a deliberate
    driver-side scalar read of the AGGREGATED frame — its cardinality is
    the number of CDC commit timestamps in the slice (one, in a healthy
    60 s micro-batch; never row-scaled), the same adjudicated class as
    the k-means convergence scalar.  The per-timestamp applies run as
    batch ``scd2_apply`` calls, so each costs one key shuffle and drops
    no-ops; a re-delivered commit therefore leaves the history
    byte-identical."""
    stamps = [r[0] for r in cdc.select(ts_col).distinct().collect()]
    if any(s is None for s in stamps):
        raise ValueError(
            f"CDC slice contains NULL {ts_col!r}: the commit timestamp "
            "is the commit's identity and version stamp — a NULL names "
            "no commit and cannot be ordered. Fix the feed upstream."
        )
    stamps.sort()
    for ts in stamps:
        late = max_applied_ts is not None and ts <= max_applied_ts
        folded = fold_last_write_wins(
            cdc.filter(F.col(ts_col) == ts).drop(ts_col), key, order_col
        ).drop(order_col)
        hist = scd2_apply(
            hist, folded, key, tracked, str(ts),
            on_real_change="error" if late else "apply",
        )
    new_max = max_applied_ts
    if stamps and (new_max is None or stamps[-1] > new_max):
        new_max = stamps[-1]
    return hist, new_max


class Scd2Stream:
    """``foreachBatch`` sink maintaining SCD2 history across
    micro-batches.

    Usage::

        sink = Scd2Stream(scd2_init(dim, t0), "p_partkey",
                          ["p_brand", "p_retailprice"],
                          ts_col="change_ts", order_col="seq")
        (cdc_stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True).start())
        ...
        sink.hist  # the maintained history DataFrame

    Each micro-batch runs ``scd2_apply_cdc`` and re-checkpoints the
    result, truncating lineage so the logical plan stays constant-size
    over an unbounded stream.

    Restart contract (ADVICE r09): the sink's state (``hist``,
    ``max_applied_ts``) lives in driver memory only, so a restarted
    stream MUST pair a fresh sink with a FRESH checkpoint — against an
    existing checkpoint Spark silently skips every already-committed
    micro-batch, and a fresh sink starting from ``hist0`` would end with
    history missing all of them, with no guard ever firing (the skipped
    batches never reach ``__call__``).  The sink enforces this: the
    first batch a FRESH sink observes must be batch 0, else it raises
    and points at the two valid recoveries (replay the CDC log into a
    new checkpoint, or persist/restore ``hist`` + ``max_applied_ts``
    alongside the checkpoint).  Re-using one sink OBJECT across a
    restart is fine — its state is exactly the committed prefix.

    ``state_dir`` makes the second recovery real: the sink persists its
    state INSIDE ``__call__`` — i.e. before Spark marks the micro-batch
    committed — so the persisted state is always at or AHEAD of the
    checkpoint's committed offset, never behind it.  After a crash or
    stop, ``Scd2Stream.restore`` rebuilds the sink from the last
    persisted snapshot and the restarted query replays at most the one
    batch whose commit didn't land; that redelivery folds to the
    already-applied values and drops as a no-op through the late-commit
    guard — at-least-once composed with idempotent applies, the same
    story as the versioned JobStore.  (The ordering is the whole
    invariant: persist-then-commit can only over-persist, which
    redelivery absorbs; commit-then-persist could under-persist, which
    is silent history loss.)  Cost: one history-sized parquet write per
    micro-batch — the single-writer stand-in for a table format's MERGE
    per batch, which is the deployment answer."""

    _STATE_FILE = "_scd2_state.json"

    def __init__(
        self,
        hist0: DataFrame,
        key: str,
        tracked: list[str],
        ts_col: str,
        order_col: str,
        state_dir: str | None = None,
    ) -> None:
        self.hist = hist0.localCheckpoint(eager=True)
        self.key = key
        self.tracked = list(tracked)
        self.ts_col = ts_col
        self.order_col = order_col
        self.state_dir = state_dir
        self.batches_applied = 0
        self.max_applied_ts = None  # late-commit guard high-water mark
        self._batches_seen = 0  # incl. empty ones — arms the restart guard

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._batches_seen == 0 and batch_id != 0:
            raise RuntimeError(
                f"Scd2Stream: fresh sink observed first batch_id="
                f"{batch_id}, not 0 — the stream resumed from an "
                "existing checkpoint whose committed micro-batches were "
                "skipped, so this sink's history would silently miss "
                "them. Either replay the CDC log into a NEW checkpoint "
                "location, or restore the sink's hist/max_applied_ts "
                "persisted alongside the old checkpoint."
            )
        self._batches_seen += 1
        if batch_df.isEmpty():
            return
        new_hist, new_max = scd2_apply_cdc(
            self.hist, batch_df, self.key, self.tracked,
            self.ts_col, self.order_col,
            max_applied_ts=self.max_applied_ts,
        )
        self.hist = new_hist.localCheckpoint(eager=True)
        self.max_applied_ts = new_max
        self.batches_applied += 1
        if self.state_dir is not None:
            self._persist(batch_id)

    def _persist(self, batch_id: int) -> None:
        """Snapshot the sink state under ``state_dir``: history parquet
        into a per-batch dir, then the pointer file via atomic replace —
        a crash mid-snapshot leaves the pointer at the previous complete
        snapshot, never at a half-written one.  Older snapshot dirs are
        reclaimed after the pointer moves."""
        import json
        import os
        import shutil

        hist_name = f"hist_b{batch_id}"
        self.hist.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, hist_name)
        )
        state = {
            "batch_id": batch_id,
            "batches_applied": self.batches_applied,
            "max_applied_ts": (
                None if self.max_applied_ts is None
                else self.max_applied_ts.isoformat()
            ),
            "hist_dir": hist_name,
        }
        ptr = os.path.join(self.state_dir, self._STATE_FILE)
        tmp = ptr + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, ptr)
        for d in os.listdir(self.state_dir):
            if d.startswith("hist_b") and d != hist_name:
                shutil.rmtree(os.path.join(self.state_dir, d),
                              ignore_errors=True)

    @classmethod
    def restore(
        cls,
        spark,
        state_dir: str,
        key: str,
        tracked: list[str],
        ts_col: str,
        order_col: str,
    ) -> "Scd2Stream":
        """Rebuild a sink from the last persisted snapshot, ready to
        resume against the EXISTING stream checkpoint: the restored sink
        is bootstrapped (the fresh-sink batch-0 guard does not apply —
        its state IS the committed prefix, or one redelivery ahead of
        it, which the late-commit guard absorbs as a no-op)."""
        import datetime
        import json
        import os

        ptr = os.path.join(state_dir, cls._STATE_FILE)
        try:
            with open(ptr) as fh:
                state = json.load(fh)
        except OSError as e:
            raise RuntimeError(
                f"Scd2Stream.restore: no persisted state at {ptr} — the "
                "sink never completed a persisted batch; replay the CDC "
                "log into a fresh checkpoint instead"
            ) from e
        hist = spark.read.parquet(os.path.join(state_dir, state["hist_dir"]))
        sink = cls(hist, key, tracked, ts_col, order_col,
                   state_dir=state_dir)
        sink.batches_applied = state["batches_applied"]
        if state["max_applied_ts"] is not None:
            sink.max_applied_ts = datetime.datetime.fromisoformat(
                state["max_applied_ts"]
            )
        sink._batches_seen = 1  # bootstrapped: accepts any next batch_id
        return sink
