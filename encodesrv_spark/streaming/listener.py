"""Log/event fan-out (S15): the reference's logger-to-many-sinks
pattern re-expressed as a StreamingQueryListener.

The reference fans every log record out to file/stderr/SMTP/IRC/Slack
handlers (encodesrv/logs/log.py:25-46, logs/__init__.py:26-29); the
bots additionally answer a `status` command from the jobs table
(§3.3).  On Spark the engine-side analog is:

* a `StreamingQueryListener` receiving start/progress/termination
  events for every streaming query on the session — the single place
  engine telemetry surfaces, replacing the hand-wired handler list;
* each event fanned to (a) python `logging` (file/stream/SMTP handlers
  attach there, exactly the reference's split) and (b) an in-memory
  ring buffer queryable as a DataFrame — the "status table" a
  bot/dashboard adapter reads (the IRC/Slack relays themselves stay
  out of engine scope, as SURVEY §2.1/S15 prescribes).

Nothing here touches executors: listener callbacks run on the driver,
so the buffer is driver-local state like the reference's logger.
"""

from __future__ import annotations

import logging
from collections import deque
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("encodesrv_spark.streaming")

EVENT_SCHEMA = (
    "event_kind string, query_id string, query_name string, "
    "batch_id long, num_input_rows long, detail string"
)


@dataclass
class QueryEvent:
    event_kind: str
    query_id: str
    query_name: str | None
    batch_id: int | None
    num_input_rows: int | None
    detail: str


class LogRelayListener(StreamingQueryListener):
    """Fans streaming-query lifecycle events to logging + a bounded
    in-memory buffer (`maxlen` caps driver memory like a log rotation)."""

    def __init__(self, maxlen: int = 10_000) -> None:
        self.events: deque[QueryEvent] = deque(maxlen=maxlen)

    # -- StreamingQueryListener callbacks (driver thread) -------------
    def onQueryStarted(self, event) -> None:
        self._emit("started", str(event.id), event.name, None, None, "query started")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._emit(
            "progress",
            str(p.id),
            p.name,
            p.batchId,
            int(p.numInputRows),
            f"batch {p.batchId}: {p.numInputRows} rows",
        )

    def onQueryIdle(self, event) -> None:
        self._emit("idle", str(event.id), None, None, None, "query idle")

    def onQueryTerminated(self, event) -> None:
        detail = f"exception: {event.exception}" if event.exception else "clean stop"
        # reference parity: errors escalate (its SMTP handler fires on
        # ERROR only, log.py:32-38); clean lifecycle stays at INFO
        self._emit(
            "terminated",
            str(event.id),
            None,
            None,
            None,
            detail,
            level=logging.ERROR if event.exception else logging.INFO,
        )

    # -- fan-out ------------------------------------------------------
    def _emit(
        self,
        kind: str,
        query_id: str,
        name: str | None,
        batch_id: int | None,
        rows: int | None,
        detail: str,
        level: int = logging.INFO,
    ) -> None:
        ev = QueryEvent(kind, query_id, name, batch_id, rows, detail)
        self.events.append(ev)
        logger.log(level, "[%s] %s %s", kind, name or query_id, detail)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The buffered events as a DataFrame — the status-table surface
        a bot/dashboard adapter queries (A1/A3-style aggregations work
        directly on this)."""
        rows = [
            (e.event_kind, e.query_id, e.query_name, e.batch_id, e.num_input_rows, e.detail)
            for e in self.events
        ]
        return spark.createDataFrame(rows, EVENT_SCHEMA)


def attach(spark: SparkSession, maxlen: int = 10_000) -> LogRelayListener:
    """Register a relay on the session; returns it for inspection."""
    listener = LogRelayListener(maxlen=maxlen)
    spark.streams.addListener(listener)
    return listener
