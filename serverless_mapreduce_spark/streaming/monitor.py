"""Streaming observability: per-micro-batch progress capture (the
streaming half of E16 next to monitoring.py's batch ``observe`` counters).

The reference writes per-stage progress counters to DynamoDB as Lambdas
run (``utils/stage_progress.py:101-133``) so its web UI can poll them.
Structured Streaming's native analog is :class:`StreamingQueryListener`:
the engine PUSHES a progress event after every micro-batch — input rows,
processed-rows/sec, per-operator STATE ROWS and state memory, watermark —
with no polling and no extra jobs. This module packages that as a small
collector the `engine`/tests can attach per session, keeping the same
"metrics ride the run, a store is optional" stance as monitoring.py.

Cluster note: listener callbacks run on the DRIVER on an event thread —
keep them O(1) per event (append to a list / push to a gauge), never
touch DataFrames inside them, and treat the data as advisory (events can
lag the batch that produced them; drain() waits on the queries, then
reads).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    state_rows: int       #: total rows across all stateful-operator stores
    state_bytes: int      #: total state memory used
    watermark: str | None


class ProgressCollector(StreamingQueryListener):
    """Collects one :class:`BatchProgress` per micro-batch across every
    streaming query on the session it is attached to."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[BatchProgress] = []

    # -- StreamingQueryListener callbacks (driver event thread, keep O(1)) --
    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API names
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        state_bytes = sum(op.memoryUsedBytes for op in p.stateOperators)
        rec = BatchProgress(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            state_rows=state_rows,
            state_bytes=state_bytes,
            watermark=p.eventTime.get("watermark") if p.eventTime else None,
        )
        with self._lock:
            self.batches.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- reading side -------------------------------------------------------
    def total_input_rows(self) -> int:
        with self._lock:
            return sum(b.num_input_rows for b in self.batches)

    def max_state_rows(self) -> int:
        with self._lock:
            return max((b.state_rows for b in self.batches), default=0)

    def summary(self) -> dict:
        """One roll-up dict per collector — the shape a metrics store or
        the engine's report would ingest."""
        with self._lock:
            return {
                "n_batches": len(self.batches),
                "input_rows": sum(b.num_input_rows for b in self.batches),
                "max_state_rows": max(
                    (b.state_rows for b in self.batches), default=0
                ),
                "max_state_bytes": max(
                    (b.state_bytes for b in self.batches), default=0
                ),
                "queries": sorted({b.query_id for b in self.batches}),
            }


def attach(spark: SparkSession) -> ProgressCollector:
    """Attach a fresh collector to ``spark``'s streams; detach with
    :func:`detach` when done (listeners are session-global)."""
    c = ProgressCollector()
    spark.streams.addListener(c)
    return c


def detach(spark: SparkSession, collector: ProgressCollector) -> None:
    spark.streams.removeListener(collector)
