"""Custom stateful streaming operator via applyInPandasWithState —
the machinery for operators Spark's built-in windows can't express
(the reference's job state machine ST4 is the motivating case: keyed
state evolving per event).

`running_user_totals` keeps per-user running aggregates across
micro-batches: count, value sum, and the last-seen timestamp, with a
processing-time timeout that expires idle users' state (bounded state
at 100 TB — unexpired state is exactly the working set of active keys).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

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
