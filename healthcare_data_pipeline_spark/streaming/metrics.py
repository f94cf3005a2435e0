"""Streaming observability: per-micro-batch progress capture (SURVEY §2.9 [EXT]).

The reference's observability is a tailed pipeline log + CI dashboard
(run_dashboard.py); a streaming engine needs the equivalent for unbounded
queries.  ``ProgressRecorder`` is a ``StreamingQueryListener`` that captures
every micro-batch's ``StreamingQueryProgress`` (input rows, batch duration,
state-store rows, watermark) and appends it to a JSONL artifact — the file a
dashboard tails and an alerting job greps.

Listener callbacks run on the driver off the hot path (Spark queues progress
events), so recording costs the stream nothing; at scale this is how you see
watermark lag and state growth BEFORE an executor OOMs.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch progress; optionally appends JSONL to ``path``."""

    def __init__(self, path: str | None = None) -> None:
        self.path = path
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        self._lock = threading.Lock()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        row = json.loads(event.progress.json)
        with self._lock:
            self.progress.append(row)
            if self.path:
                with open(self.path, "a") as fh:
                    fh.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated.append(str(event.id))

    # -- convenience accessors ------------------------------------------------
    def total_input_rows(self) -> int:
        with self._lock:
            return int(sum(p.get("numInputRows", 0) for p in self.progress))

    def batch_durations_ms(self) -> list[int]:
        with self._lock:
            return [
                int(p["durationMs"]["triggerExecution"])
                for p in self.progress
                if "durationMs" in p and "triggerExecution" in p["durationMs"]
            ]

    def max_state_rows(self) -> int:
        with self._lock:
            return max(
                (
                    int(s.get("numRowsTotal", 0))
                    for p in self.progress
                    for s in p.get("stateOperators", [])
                ),
                default=0,
            )


class record_progress:
    """Context manager: attach a ``ProgressRecorder`` for the duration of a
    streaming run and detach it afterwards (listeners are session-global, so
    leaking one would capture every later query's events too)."""

    def __init__(self, spark: SparkSession, path: str | None = None) -> None:
        self.spark = spark
        self.recorder = ProgressRecorder(path)

    def __enter__(self) -> ProgressRecorder:
        self.spark.streams.addListener(self.recorder)
        return self.recorder

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.recorder)
