"""Streaming join-view maintenance — the continuous form of the batch
IVM operators in ``operators/incremental.py``.

The reference's poll loop re-reads the whole job/format join every 60 s
(`encodesrv/__init__.py:97-141`); the batch queries
``incremental_join_view`` / ``incremental_join_view_cdc`` show the
delta algebra that avoids the recompute; this sink closes the loop the
engine is built around: one CDC stream carrying signed changes to BOTH
join inputs (rows tagged with their side — the shape a table-format
change feed or a Debezium topic-merge delivers), applied per
micro-batch so the view is always the post-image join without ever
joining the full inputs again.

Per micro-batch, with the sink's accumulated signed states L and R:

    ΔV = (ΔL ⋈ R) ∪ ((L ⊎ ΔL) ⋈ ΔR)        (mult products — z-sets)
    V ⊎= ΔV ;  L ⊎= ΔL ;  R ⊎= ΔR

Because every term is BILINEAR in multiplicities, the fold is
batch-partitioning invariant: however the stream chops the feed, the
consolidated view is the same (unlike SCD2 there is no cross-batch
ordering contract at all — z-set addition is commutative), and
at-least-once redelivery is NOT absorbed (a replayed delta adds its
multiplicities twice) — pair with exactly-once file sources /
idempotent upstream, or the ``state_dir`` persist-then-commit protocol
of ``Scd2Stream`` lifted to this sink in deployment (the table-format
MERGE answer).  State posture: L, R, V are driver-held frames
re-``localCheckpoint``-ed per batch (constant-size plans), growing with
the FEED until ``consolidate()`` compacts them (group-by-all, Σmult,
drop zeros) — the lazy amortized compaction the batch query's docstring
names; linear aggregates never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from encodesrv_spark.operators.incremental import join_view_delta_signed


def consolidate(signed: DataFrame, mult: str = "_mult") -> DataFrame:
    """Compact a signed multiset: one group-by over all non-mult
    columns, summing multiplicities and dropping net-zero rows.  This
    is the amortized maintenance op — the per-batch path never runs
    it."""
    cols = [c for c in signed.columns if c != mult]
    return (
        signed.groupBy(*cols)
        .agg(F.sum(mult).alias(mult))
        .filter(F.col(mult) != 0)
    )


class JoinViewStream:
    """``foreachBatch`` sink maintaining a two-input join view from one
    interleaved signed-CDC stream.

    Usage::

        sink = JoinViewStream(
            spark, left_cols=["o_orderkey", "o_orderpriority"],
            right_cols=["l_orderkey", "l_returnflag", "qty"],
            on=F.col("o_orderkey") == F.col("l_orderkey"),
        )
        (cdc.writeStream.foreachBatch(sink)
            .trigger(availableNow=True).start())
        ...
        consolidate(sink.view)  # the maintained join view

    Rows carry ``side_col`` (``left_tag``/``right_tag``), the UNION of
    both sides' columns (the foreign side's columns null), and a signed
    ``mult``.  States start EMPTY — initial table loads are just the
    first inserts of the feed, so bootstrap and steady state share one
    code path.  The fresh-sink restart guard matches ``Scd2Stream``:
    driver-held state plus a reused checkpoint would silently lose the
    skipped batches."""

    def __init__(
        self,
        spark,
        left_cols: list[str],
        right_cols: list[str],
        on,
        side_col: str = "_side",
        left_tag: str = "l",
        right_tag: str = "r",
        mult: str = "_mult",
    ) -> None:
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.on = on
        self.side_col = side_col
        self.left_tag = left_tag
        self.right_tag = right_tag
        self.mult = mult
        self._batches_seen = 0
        self.batches_applied = 0
        self.left = self.right = self.view = None  # empty until batch 1

    def _split(self, batch_df: DataFrame):
        dl = batch_df.filter(F.col(self.side_col) == self.left_tag).select(
            *self.left_cols, self.mult
        )
        dr = batch_df.filter(F.col(self.side_col) == self.right_tag).select(
            *self.right_cols, self.mult
        )
        return dl, dr

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._batches_seen == 0 and batch_id != 0:
            raise RuntimeError(
                f"JoinViewStream: fresh sink observed first batch_id="
                f"{batch_id}, not 0 — the stream resumed from an "
                "existing checkpoint whose committed micro-batches were "
                "skipped. Replay the CDC log into a NEW checkpoint."
            )
        self._batches_seen += 1
        if batch_df.isEmpty():
            return
        d_left, d_right = self._split(batch_df)
        if self.view is None:  # bootstrap: states are empty multisets
            self.left = d_left.limit(0)
            self.right = d_right.limit(0)
            self.view = (
                d_left.limit(0).drop(self.mult)
                .join(d_right.limit(0).drop(self.mult), self.on)
                .withColumn(self.mult, F.lit(0).cast("long"))
                .select(*self.left_cols, *self.right_cols, self.mult)
            )
        dv = join_view_delta_signed(
            self.left, d_left, self.right, d_right, self.on, self.mult
        ).select(*self.left_cols, *self.right_cols, self.mult)
        ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        self.view = ckpt(self.view.unionByName(dv))
        self.left = ckpt(self.left.unionByName(d_left))
        self.right = ckpt(self.right.unionByName(d_right))
        self.batches_applied += 1

    def consolidate_states(self) -> None:
        """Amortized compaction of all three signed states (the
        ``zorder_maintain`` analogue: run at a maintenance cadence, not
        per batch)."""
        if self.view is None:
            return
        self.view = consolidate(self.view, self.mult).localCheckpoint(
            eager=True
        )
        self.left = consolidate(self.left, self.mult).localCheckpoint(
            eager=True
        )
        self.right = consolidate(self.right, self.mult).localCheckpoint(
            eager=True
        )
