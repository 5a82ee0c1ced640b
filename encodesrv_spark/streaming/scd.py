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

Ordering contract (what makes the result micro-batch-partitioning
INVARIANT): a CDC slice may span several commit timestamps, and the
file source is free to deliver one file per trigger or all of them at
once.  ``scd2_apply_cdc`` therefore applies the slice as one
``scd2_apply`` per DISTINCT commit timestamp, ascending — so however
the stream chops the feed, the same sequence of (folded batch,
batch_ts) applies lands on the history.  Re-delivered commits fold to
the values already current and drop as no-ops (``scd2_apply`` never
churns unchanged keys), so at-least-once file delivery is safe.

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
) -> DataFrame:
    """Apply one CDC slice (any number of commit timestamps) to an SCD2
    history: group rows by ``ts_col``, fold each group last-write-wins
    on ``order_col``, and apply the groups in ascending timestamp order.

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
        folded = fold_last_write_wins(
            cdc.filter(F.col(ts_col) == ts).drop(ts_col), key, order_col
        ).drop(order_col)
        hist = scd2_apply(hist, folded, key, tracked, str(ts))
    return hist


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

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_hist = scd2_apply_cdc(
            self.hist, batch_df, self.key, self.tracked,
            self.ts_col, self.order_col,
        )
        self.hist = new_hist.localCheckpoint(eager=True)
        self.batches_applied += 1
