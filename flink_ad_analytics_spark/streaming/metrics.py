"""Streaming observability: per-micro-batch health metrics.

The reference's only run-time visibility is the Flink web UI
(`/root/reference/README.md:94-96` -- "check the two jobs are
RUNNING") plus eyeballing output topics. A pipeline operating at
production scale needs machine-readable signals: input/processing
rate (is the job keeping up?), state-store size (is state bounded, or
is a missing watermark growing it without limit?), and watermark lag
(how far behind event time is the output?).

Structured Streaming already computes all of this per micro-batch and
exposes it through `StreamingQueryListener`; this module records it as
plain dicts -- append to a dashboard, a Kafka topic, or a JSON file.
The listener runs on Spark's listener-bus thread, decoupled from the
query: recording cost is O(1) per micro-batch and can never slow or
fail the pipeline (exceptions are swallowed by the bus).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class QueryMetricsRecorder(StreamingQueryListener):
    """Records a compact health row per micro-batch per query.

    Usage::

        rec = QueryMetricsRecorder()
        spark.streams.addListener(rec)
        ...run queries...
        rec.snapshot()   # -> list[dict], oldest first
        rec.summary()    # -> per-query rollup for alerting

    Callbacks arrive asynchronously AFTER the batch that produced them;
    call `spark.streams.resetTerminated()`/`processAllAvailable` then
    poll `snapshot()` (tests use a bounded wait) rather than assuming
    synchronous delivery.
    """

    def __init__(self, max_rows: int = 10_000) -> None:
        self._lock = threading.Lock()
        self._rows: list[dict] = []
        self._max_rows = max_rows

    # -- listener interface -------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            p = json.loads(event.progress.json)
        except Exception:  # malformed progress must never kill the bus
            return
        state = p.get("stateOperators") or []
        row = {
            "query_name": p.get("name"),
            "query_id": p.get("id"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows", 0),
            "input_rows_per_second": p.get("inputRowsPerSecond", 0.0),
            "processed_rows_per_second": p.get("processedRowsPerSecond", 0.0),
            "trigger_duration_ms": (p.get("durationMs") or {}).get(
                "triggerExecution"
            ),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
            "state_rows_total": sum(s.get("numRowsTotal", 0) for s in state),
            "state_rows_updated": sum(s.get("numRowsUpdated", 0) for s in state),
            "state_memory_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
            "num_state_operators": len(state),
        }
        with self._lock:
            self._rows.append(row)
            if len(self._rows) > self._max_rows:  # bounded: ops buffer, not a log
                del self._rows[: -self._max_rows]

    # -- consumption --------------------------------------------------------

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows)

    def summary(self) -> dict[str, dict]:
        """Per-query rollup: totals, peak state, last watermark --
        the numbers an alert rule reads."""
        out: dict[str, dict] = {}
        for r in self.snapshot():
            name = r["query_name"] or r["query_id"]
            s = out.setdefault(
                name,
                {
                    "batches": 0,
                    "total_input_rows": 0,
                    "max_state_rows": 0,
                    "max_state_memory_bytes": 0,
                    "last_watermark": None,
                    "max_processed_rows_per_second": 0.0,
                },
            )
            s["batches"] += 1
            s["total_input_rows"] += r["num_input_rows"]
            s["max_state_rows"] = max(s["max_state_rows"], r["state_rows_total"])
            s["max_state_memory_bytes"] = max(
                s["max_state_memory_bytes"], r["state_memory_bytes"]
            )
            if r["watermark"]:
                s["last_watermark"] = r["watermark"]
            s["max_processed_rows_per_second"] = max(
                s["max_processed_rows_per_second"],
                r["processed_rows_per_second"] or 0.0,
            )
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"progress": self.snapshot(), "summary": self.summary()}, f)
