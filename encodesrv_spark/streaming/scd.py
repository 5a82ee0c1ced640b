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

    The ``distinct().collect()`` on ``ts_col`` is a deliberate
    driver-side scalar read of the AGGREGATED frame — its cardinality is
    the number of CDC commit timestamps in the slice (one, in a healthy
    60 s micro-batch; never row-scaled), the same adjudicated class as
    the k-means convergence scalar.  The per-timestamp applies run as
    batch ``scd2_apply`` calls, so each costs one key shuffle and drops
    no-ops; a re-delivered commit therefore leaves the history
    byte-identical."""
    stamps = sorted(
        r[0] for r in cdc.select(ts_col).distinct().collect()
    )
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
    over an unbounded stream."""

    def __init__(
        self,
        hist0: DataFrame,
        key: str,
        tracked: list[str],
        ts_col: str,
        order_col: str,
    ) -> None:
        self.hist = hist0.localCheckpoint(eager=True)
        self.key = key
        self.tracked = list(tracked)
        self.ts_col = ts_col
        self.order_col = order_col
        self.batches_applied = 0
        self.max_applied_ts = None  # late-commit guard high-water mark

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
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
