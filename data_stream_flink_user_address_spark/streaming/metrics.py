"""Streaming observability: a ``StreamingQueryListener`` that records
per-batch progress to JSON lines.

Engine extension beyond the reference surface (the reference job's only
observability is the Flink web UI; SURVEY.md §3.3).  Operating a
streaming pipeline needs the numbers this captures per micro-batch:
input rate, processing rate, batch duration, and stateful-operator
state size -- rising state rows with flat input is the classic
watermark-misconfiguration signature, and a widening gap between input
and processed rates is the backpressure signal that says "add
executors or shrink the trigger".

Driver-side and O(1) per batch: the listener serializes the progress
object Spark already assembled; it never touches executors or data.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    """Append one JSON line per micro-batch to ``path``.

    Fields: query name/id, batch id, timestamp, numInputRows,
    inputRowsPerSecond, processedRowsPerSecond, batchDuration (ms), and
    per-stateful-operator state rows / memory.  Thread-safe (Spark
    delivers events on a listener bus thread).
    """

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "name": p.name,
            "id": str(p.id),
            "batchId": p.batchId,
            "timestamp": p.timestamp,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "batchDurationMs": p.batchDuration,
            "stateOperators": [
                {
                    "operatorName": so.operatorName,
                    "numRowsTotal": so.numRowsTotal,
                    "numRowsUpdated": so.numRowsUpdated,
                    "memoryUsedBytes": so.memoryUsedBytes,
                }
                for so in (p.stateOperators or [])
            ],
        }
        self._write(rec)

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    # ---------------------------------------------------------------------
    def _write(self, rec: dict) -> None:
        line = json.dumps(rec, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")


def read_metrics(path: str) -> list[dict]:
    """Parse a metrics JSONL file back into records."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
