"""Streaming metrics: a StreamingQueryListener that appends every
micro-batch's progress to a JSONL log (the engine's per-partition lineage
table covers data lineage; this covers engine-level rates/durations —
SURVEY §2.11, the reference's accumulator counters Constants.java:33-87).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append one JSON line per QueryProgressEvent: query id, batchId,
    numInputRows, processedRowsPerSecond, batch duration. File appends are
    atomic per line (O_APPEND), so the log survives concurrent queries."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self._write({"event": "started", "id": str(event.id), "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "timestamp": p.timestamp,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def _write(self, payload: dict) -> None:
        with open(self.out_path, "a") as f:
            f.write(json.dumps(payload) + "\n")
