"""Custom stateful streaming operator via applyInPandasWithState —
the machinery for operators Spark's built-in windows can't express
(the reference's job state machine ST4 is the motivating case: keyed
state evolving per event).

`running_user_totals` keeps per-user running aggregates across
micro-batches: count, value sum, and the last-seen timestamp, with a
processing-time timeout that expires idle users' state (bounded state
at 100 TB — unexpired state is exactly the working set of active keys).

Spark 4's successor API (`transformWithStateInPandas`, StatefulProcessor
with typed ValueState/TTL) is the migration target for these operators;
it needs the Python protobuf runtime for its state-server protocol,
which this environment lacks, so the operators stay on
applyInPandasWithState (same state semantics, same tests).
Re-checked r07: `GroupedData.transformWithStateInPandas` and
`pyspark.sql.streaming.stateful_processor.StatefulProcessor` both
import on this runtime (PySpark 4.1.2), but `google.protobuf` is still
absent, so the state-server handshake cannot run — the migration
carries over unchanged the moment the dependency appears.
Re-probed r08: `import google.protobuf` still ModuleNotFoundError;
blocked, unchanged.
Re-probed r09: `import google.protobuf` still ModuleNotFoundError;
blocked, unchanged (applyInPandasWithState operators and tests carry
over as-is).

availableNow caveat (observed r10): every operator here arms a
processing-time timeout on each key, and the micro-batch engine keeps
scheduling no-data micro-batches while any timer is pending — so an
`availableNow` (batch-replay) caller consumes its data and then loops
empty batches until the farthest idle timer fires (hours).  Such
callers must disable `spark.sql.streaming.noDataMicroBatches.enabled`
for the query (streaming queries snapshot SQLConf at start, so setting
it around `.start()` is per-query); data batches still process expired
state exactly as before.  Continuous (processing-time-trigger)
deployments are unaffected — there the no-data batches are precisely
what makes idle-key expiry happen, so the conf stays on.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, batches long"
STATE_SCHEMA = "n long, total double, batches long"


def _update_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    batches += 1
    state.update((n, total, batches))
    state.setTimeoutDuration(3_600_000)  # 1 h idle → state dropped
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "batches": [batches],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit keyed state + timeout.

    Arrow-batched: each user's micro-batch slice arrives as pandas;
    state is a 3-tuple per key, nothing unbounded."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Stateful funnel: per-user ordered view -> click -> purchase progress
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, view_tus long, click_tus long, purchase_tus long, stage long"
)
FUNNEL_STATE_SCHEMA = "vt long, ct long, pt long"

_NONE = -1  # sentinel: GroupState tuples round-trip cleanly as ints


def _update_funnel(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    vt, ct, pt = state.get if state.exists else (_NONE, _NONE, _NONE)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # fold in event-time order: the stage gates (click strictly after
    # first view, purchase strictly after first click) are order-
    # dependent, so late re-ordering within the batch is handled here;
    # cross-batch lateness needs event-time delivery (a watermarked
    # upstream sort), same caveat as any ordered stateful operator
    rows = rows.sort_values(["tus", "event_id"])
    for _, r in rows.iterrows():
        t, typ = int(r["tus"]), r["event_type"]
        if typ == "view" and vt == _NONE:
            vt = t
        elif typ == "click" and ct == _NONE and vt != _NONE and t > vt:
            ct = t
        elif typ == "purchase" and pt == _NONE and ct != _NONE and t > ct:
            pt = t
    state.update((vt, ct, pt))
    state.setTimeoutDuration(86_400_000)  # 1 day idle → funnel closes
    stage = (vt != _NONE) + (ct != _NONE) + (pt != _NONE)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "view_tus": [vt],
            "click_tus": [ct],
            "purchase_tus": [pt],
            "stage": [stage],
        }
    )


def funnel_progress(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch funnel_conversion query: per-user
    funnel state (first view / first qualifying click / first
    qualifying purchase, as epoch-us ints) evolving across
    micro-batches — the reference's status state machine (ST4)
    generalized to event funnels.  State is three ints per active user
    and expires after a day idle, so the working set, not the stream
    length, bounds memory.  Input needs columns (user_id, event_id,
    event_type, tus)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Stateful Markov transitions: per-user (last type -> next type) increments
# ---------------------------------------------------------------------------

TRANSITION_OUTPUT_SCHEMA = "user_id long, from_type string, to_type string, n long"
TRANSITION_STATE_SCHEMA = "last string"


def _update_transitions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    last = state.get[0] if state.exists else None
    rows = pd.concat(list(pdfs), ignore_index=True)
    # same ordered-fold contract as the funnel operator: in-batch order
    # restored here, cross-batch order carried by the `last` state
    rows = rows.sort_values(["tus", "event_id"])
    pairs: dict[tuple, int] = {}
    for typ in rows["event_type"]:
        if last is not None:
            pairs[(last, typ)] = pairs.get((last, typ), 0) + 1
        last = typ
    state.update((last,))
    state.setTimeoutDuration(86_400_000)  # 1 day idle → chain closes
    if pairs:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "from_type": [a for a, _ in pairs],
                "to_type": [b for _, b in pairs],
                "n": list(pairs.values()),
            }
        )


def transition_increments(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch event_transitions query: per-user
    Markov chain maintained incrementally — ONE string of state per
    active user (the last event type), per-batch (from, to) count
    INCREMENTS as output.  Summing the increments downstream
    reproduces the batch transition matrix exactly; emitting deltas
    (not snapshots) keeps the output additive, so the normalizing
    aggregation is an ordinary rollup in foreachBatch or at read time.
    Input needs columns (user_id, event_id, event_type, tus)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Stateful EWMA: exact recursion per event type
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = "event_type string, last_tus long, n long, ewma double"
EWMA_STATE_SCHEMA = "last_tus long, n long, ewma double"
_EWMA_ALPHA = 0.5


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Exact recursive EWMA: e_t = α·x_t + (1−α)·e_{t−1}.

    The batch twin (`plans/extended.py:events_ewma`) truncates the
    recursion at 8 lags; here the state IS the recursion (one double
    per key), so the streaming form is exact — the twin test bounds
    their disagreement by the truncation tail (1−α)^8.  Rows are
    sorted by (tus, event_id) inside each micro-batch slice; across
    batches, event-time order must be upheld by the source (the twin
    test feeds ordered batches; production would watermark+sort via a
    foreachBatch stage)."""
    if state.hasTimedOut:
        state.remove()
        return
    last_tus, n, ewma = state.get if state.exists else (0, 0, None)
    # concat BEFORE sorting: the group's micro-batch slice arrives as
    # an iterator of Arrow chunks (split at arrow.maxRecordsPerBatch),
    # and sorting each chunk independently folds rows out of
    # event-time order once a key spans chunks (same rule as
    # _update_funnel/_update_transitions)
    allpdf = pd.concat(list(pdfs), ignore_index=True)
    if len(allpdf):
        for _, row in allpdf.sort_values(["tus", "event_id"]).iterrows():
            x = float(row["value"])
            ewma = x if ewma is None else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * ewma
            last_tus = int(row["tus"])
            n += 1
    state.update((last_tus, n, ewma if ewma is not None else 0.0))
    state.setTimeoutDuration(3_600_000)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "last_tus": [last_tus],
            "n": [n],
            "ewma": [ewma],
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-event-type exact EWMA as keyed streaming state (one double
    per key — state bounded by type cardinality at any corpus size)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# causal change-point detection
# ---------------------------------------------------------------------------

CHG_OUTPUT_SCHEMA = (
    "event_type string, hour_epoch long, mean_value double, delta double,"
    " z double, flagged boolean"
)
CHG_STATE_SCHEMA = (
    "cur_hour long, cur_sum double, cur_n long,"
    " prev_mean double, has_prev boolean,"
    " nd long, mean_d double, m2_d double"
)
_CHG_Z = 2.0
_HOUR_US = 3_600_000_000


def _update_change_points(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Causal hour-over-hour change-point detector — the streaming twin
    of `plans/mining.events_change_points`.  State per event type: the
    OPEN hour's running (sum, n), the last CLOSED hour's mean, and a
    Welford sketch (n, mean, M2) over all closed-hour deltas so far.

    Where the batch op standardizes each delta by the FULL-SAMPLE delta
    stddev (it sees all hours at once), the causal form can only use
    the deltas observed so far — flags can differ near the start by
    construction, which is why the twin test compares the planted-shift
    flags and the closed-hour means, not the full flag sets.  A delta
    arriving while the running stddev is still 0 (flat history) flags
    iff it is nonzero (infinite z, emitted as NULL).

    An hour closes only when a later-hour event arrives for the key —
    event-time order within the key is required (same contract as
    `_update_ewma`; production would watermark+sort via foreachBatch).
    State is O(1) doubles per event type at any corpus size."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        cur_hour, cur_sum, cur_n, prev_mean, has_prev, nd, mean_d, m2_d = state.get
    else:
        cur_hour, cur_sum, cur_n = -1, 0.0, 0
        prev_mean, has_prev = 0.0, False
        nd, mean_d, m2_d = 0, 0.0, 0.0

    out_rows = []

    def close_hour() -> None:
        nonlocal prev_mean, has_prev, nd, mean_d, m2_d
        mean = round(cur_sum / cur_n, 6)
        if has_prev:
            delta = round(mean - prev_mean, 6)
            sd = math.sqrt(m2_d / (nd - 1)) if nd >= 2 else 0.0
            if sd > 0:
                z = round(delta / sd, 4)
                flagged = abs(z) > _CHG_Z
            else:
                z, flagged = None, delta != 0.0
            out_rows.append(
                (key[0], cur_hour, mean, delta, z, flagged)
            )
            # Welford over closed-hour deltas
            nd += 1
            d1 = delta - mean_d
            mean_d += d1 / nd
            m2_d += d1 * (delta - mean_d)
        prev_mean, has_prev = mean, True

    allpdf = pd.concat(list(pdfs), ignore_index=True)
    if len(allpdf):
        for _, row in allpdf.sort_values(["tus", "event_id"]).iterrows():
            hour = (int(row["tus"]) // _HOUR_US) * 3600
            if hour != cur_hour:
                if cur_n > 0:
                    close_hour()
                cur_hour, cur_sum, cur_n = hour, 0.0, 0
            cur_sum += float(row["value"])
            cur_n += 1
    state.update(
        (cur_hour, cur_sum, cur_n, prev_mean, has_prev, nd, mean_d, m2_d)
    )
    state.setTimeoutDuration(3_600_000)
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=[
                "event_type", "hour_epoch", "mean_value", "delta", "z", "flagged",
            ],
        )


def change_points_stream(events: DataFrame) -> DataFrame:
    """Per-event-type causal change-point stream (closed-hour means,
    deltas, running-volatility z-scores) as keyed streaming state."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_change_points,
        outputStructType=CHG_OUTPUT_SCHEMA,
        stateStructType=CHG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# causal CUSUM drift stream
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = (
    "event_type string, hour_epoch long, mean_value double,"
    " cusum_up double, cusum_dn double, drift_alarm boolean"
)
CUSUM_STATE_SCHEMA = (
    "cur_hour long, cur_sum double, cur_n long, s_up double, s_dn double"
)
_CUSUM_K = 0.5
_CUSUM_H = 4.0


def _update_cusum(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Causal CUSUM — the streaming twin of `plans/mining.events_cusum`.

    The batch op computes the reset-at-zero recursion in closed form
    (running sum minus running min); here the recursion itself IS the
    state: S⁺ ← max(0, S⁺ + z − k), S⁻ ← max(0, S⁻ − z − k), one
    double per side per event type.  The baseline (μ, σ) rides IN on
    every row (stream-static join against the batch baseline frame —
    the `value_anomalies_stream` pattern), so the twin consumes the
    SAME standardization as the batch chart and the two agree to
    floating-point association error (the twin test uses a 1e-6
    envelope, not bit equality — closed form and recursion associate
    additions differently).

    Hours close on event-time progress within the key (same contract
    as `_update_change_points`); state is O(1) doubles per type."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        cur_hour, cur_sum, cur_n, s_up, s_dn = state.get
    else:
        cur_hour, cur_sum, cur_n, s_up, s_dn = -1, 0.0, 0, 0.0, 0.0

    out_rows = []
    mu = sd = None

    def close_hour() -> None:
        nonlocal s_up, s_dn
        mean = round(cur_sum / cur_n, 6)
        if sd and sd > 0:
            z = round((mean - mu) / sd, 6)
            s_up = max(0.0, s_up + round(z - _CUSUM_K, 6))
            s_dn = max(0.0, s_dn + round(-z - _CUSUM_K, 6))
            out_rows.append(
                (
                    key[0],
                    cur_hour,
                    mean,
                    round(s_up, 6),
                    round(s_dn, 6),
                    round(s_up, 6) > _CUSUM_H or round(s_dn, 6) > _CUSUM_H,
                )
            )

    allpdf = pd.concat(list(pdfs), ignore_index=True)
    if len(allpdf):
        mu = float(allpdf["mu"].iloc[0])
        sd = float(allpdf["sd"].iloc[0])
        for _, row in allpdf.sort_values(["tus", "event_id"]).iterrows():
            hour = (int(row["tus"]) // _HOUR_US) * 3600
            if hour != cur_hour:
                if cur_n > 0:
                    close_hour()
                cur_hour, cur_sum, cur_n = hour, 0.0, 0
            cur_sum += float(row["value"])
            cur_n += 1
    state.update((cur_hour, cur_sum, cur_n, s_up, s_dn))
    state.setTimeoutDuration(3_600_000)
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=[
                "event_type", "hour_epoch", "mean_value",
                "cusum_up", "cusum_dn", "drift_alarm",
            ],
        )


def cusum_stream(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Per-event-type causal CUSUM chart as keyed streaming state.
    `baseline` is a static (event_type, mu, sd) frame — the batch
    baseline broadcast onto the stream (stream-static join)."""
    enriched = events.join(baseline, "event_type")
    return enriched.groupBy("event_type").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
