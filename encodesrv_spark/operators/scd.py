"""SCD Type-2 dimension maintenance — versioned history for the
formats dimension.

The reference mutates `encode_formats` in place (it is plain Postgres
DDL, `schema.sql:29-52`), so "what parameters did job X encode with?"
is unanswerable after a format edit.  At pipeline scale the standard
fix is a slowly-changing-dimension type-2 table: every change CLOSES
the current version row (`valid_to`, `is_current=false`) and APPENDS a
new one, so any historical job joins to the version that was current
at its run time.

Spark-first shape: ONE full-outer key join of the current slice
against the change batch, then a per-row explode emitting each row's
output versions — a pure-DataFrame MERGE whose only exchange is that
key join's shuffle (a full-outer join has no broadcastable build side
in Spark, so the shuffle is the honest cost at every batch size;
no-op updates are dropped, so history doesn't churn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(dim: DataFrame, batch_ts: str) -> DataFrame:
    """Bootstrap a plain dimension into SCD2 shape (all rows current
    from `batch_ts`)."""
    return dim.select(
        "*",
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    hist: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
    on_real_change: str = "apply",
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    For each change row whose `tracked` values differ from the current
    version (or whose key is new): close the old version at `batch_ts`
    and append the new one.  Unchanged keys and non-current history rows
    pass through untouched.  Deterministic — no generated ids, so the
    result is stable for the differential tests.

    Shape: ONE full-outer join of the current slice against the change
    batch, then a per-row explode emitting each row's output versions
    ({unchanged} | {closed, new} | {new}).  A semi/anti-join formulation
    would re-derive the change-detect subtree once per output class
    (Catalyst has no cross-branch common-subexpression reuse under a
    Union), i.e. 4 joins and repeated dimension scans; this is 1 join +
    1 narrow generator — the plan that survives a 100 TB dimension.
    The join shuffles both sides on the key at every batch size: a
    full-outer join has no broadcastable build side in Spark (and a
    broadcast hint would be silently ignored), so one key shuffle is
    the honest, stated cost of an apply — the explode itself is narrow.

    Change rows must carry every dimension column; the key is the
    change-side presence marker under the full-outer join (non-null by
    definition in a keyed MERGE), so tracked columns may be set to
    NULL and still version correctly.

    Precondition (ANSI MERGE parity): the change batch must have at
    most ONE row per key — SQL MERGE raises on a source that matches
    the same target row twice, and this operator likewise gives no
    meaningful history for duplicate keys (each duplicate would
    re-close the same current version).  Fold CDC batches with
    ``fold_last_write_wins`` (below) before applying.

    The non-null-key half of the precondition is ENFORCED, not just
    documented: a NULL change key can never match the full-outer
    equality join, so it would silently append a second 'current'
    version beside any existing NULL-key row — corrupted history with
    no error.  The key column therefore carries a per-row
    ``raise_error`` guard (zero cost on valid data: the branch only
    evaluates when the key IS null), so a violating batch fails the
    apply job loudly instead.

    ``on_real_change="error"`` turns the apply into a NO-OP-ONLY
    verification pass: unchanged keys and exact resends flow through
    untouched, but any row that would actually version (a differing
    tracked value, or a brand-new key) raises per-row instead.  This
    is the at-least-once CDC guard: a RE-DELIVERED commit folds to the
    values already current and passes, while a LATE commit carrying
    real changes (one whose batch timestamp precedes an already-applied
    commit) would silently write anachronistic history — a version
    stamped ``valid_from`` in the past of the current version — so it
    must fail loudly.  Same lazy-branch mechanics as the NULL-key
    guard: the poisoned column lives inside the new-version struct that
    only the versioning branches evaluate, zero cost on no-op rows.
    """
    if on_real_change not in ("apply", "error"):
        raise ValueError(f"on_real_change: {on_real_change!r}")
    ts = F.lit(batch_ts).cast("timestamp")
    cur = hist.filter(F.col("is_current"))
    old = hist.filter(~F.col("is_current"))
    dim_cols = [c for c in cur.columns if c not in ("valid_from", "valid_to", "is_current")]

    # Prefix-rename the change side instead of alias-qualifying: alias
    # scoping breaks on RE-apply (the history's lineage already carries
    # same-named attributes from the previous apply's structs, and a
    # USING-join's coalesced key makes qualified access ambiguous);
    # distinct physical names can never collide, whatever the lineage.
    guarded_key = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                f"scd2_apply: NULL {key!r} in change batch — a keyed MERGE "
                "requires non-null keys (a NULL never matches the key join "
                "and would silently duplicate the current version)"
            )
        ).cast(changes.schema[key].dataType),
    ).otherwise(F.col(key))
    npref = changes.select(
        [
            (guarded_key if c == key else F.col(c)).alias(f"__n_{c}")
            for c in changes.columns
        ]
    )
    joined = cur.join(npref, F.col(key) == F.col(f"__n_{key}"), "full_outer")
    # A real change = key exists with any tracked column differing, or a
    # brand-new key. Null-safe compare so NULL -> value counts as a change.
    diff = F.lit(False)
    for t in tracked:
        diff = diff | ~F.col(t).eqNullSafe(F.col(f"__n_{t}"))
    has_cur = F.col("is_current").isNotNull()
    # Presence marker = the change side's KEY (non-null by definition in
    # a keyed MERGE) — NOT a tracked column: a change row legitimately
    # setting tracked[0] to NULL must still count as present, or the
    # NULL-ward half of the null-safe compare silently drops.
    has_chg = F.col(f"__n_{key}").isNotNull()

    def _ver(pref: str, vfrom, vto, is_cur) -> F.Column:
        return F.struct(
            *[F.col(f"{pref}{c}").alias(c) for c in dim_cols],
            vfrom.alias("valid_from"),
            vto.alias("valid_to"),
            is_cur.alias("is_current"),
        )

    unchanged = _ver("", F.col("valid_from"), F.col("valid_to"), F.lit(True))
    closed = _ver("", F.col("valid_from"), ts, F.lit(False))
    ts_new = ts
    if on_real_change == "error":
        # evaluated ONLY inside the versioning branches (lazy CASE), so
        # no-op resends pass for free and real changes fail per-row
        ts_new = F.raise_error(
            F.concat(
                F.lit(
                    "scd2_apply: real change in a no-op-only apply (late or "
                    f"re-delivered CDC commit at {batch_ts}) for {key}="
                ),
                F.col(f"__n_{key}").cast("string"),
            )
        ).cast("timestamp")
    new_ver = _ver("__n_", ts_new, F.lit(None).cast("timestamp"), F.lit(True))

    emitted = (
        F.when(~has_cur, F.array(new_ver))  # brand-new key
        .when(has_chg & diff, F.array(closed, new_ver))  # real change
        .otherwise(F.array(unchanged))  # no change row, or a no-op resend
    )
    applied = joined.select(F.explode(emitted).alias("v")).select("v.*")
    return old.unionByName(applied)


def fold_last_write_wins(changes: DataFrame, key: str, order_col: str) -> DataFrame:
    """Fold a CDC batch to one row per key — the one-call way to satisfy
    ``scd2_apply``'s ≤1-row-per-key precondition: for each key, keep the
    row with the greatest `order_col` (a CDC sequence number / commit
    LSN / event timestamp, which must be UNIQUE per key — ties would be
    nondeterministic, exactly as SQL MERGE leaves them undefined).

    Scale shape: one ``max_by(struct, order)`` aggregate — map-side
    combinable (partial max per partition, one row per key crosses the
    wire), unlike the row_number-window formulation, which shuffles the
    whole batch and sorts each key group."""
    others = [c for c in changes.columns if c != key]
    folded = changes.groupBy(key).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(order_col)).alias("__v")
    )
    return folded.select(key, *[F.col(f"__v.{c}").alias(c) for c in others])


def scd2_asof(hist: DataFrame, ts: str) -> DataFrame:
    """The dimension as it was at `ts` — the version whose validity
    interval covers the instant (a partition-pruned filter, no join)."""
    t = F.lit(ts).cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_from", "valid_to", "is_current")
