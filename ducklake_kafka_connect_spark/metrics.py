"""Observability (reference operators F1-F3).

The reference exposes JMX sensors per operation — jdbc-query timings,
per-op timers for upsertWithMergeInto / simpleInsert / createTable /
evolveSchema, records-processed and batch-size counters
(``connect/DucklakeMetrics.java:38-259``), scoped by a
try-with-resources ``MetricTimer`` (:361-412).

Spark shape: a process-local registry of counters/timers (the driver is
the natural aggregation point for write-path ops, which commit on the
driver), a context-manager timer mirroring MetricTimer, and a
``StreamingQueryListener`` bridging Structured Streaming's built-in
progress events (rows/s, batch duration, state size) into the same
registry. Export to Prometheus/Dropwizard is a formatting concern on
top of ``snapshot()``.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class OpStats:
    count: int = 0
    total_ms: float = 0.0
    max_ms: float = 0.0

    @property
    def avg_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0


@dataclass
class MetricsRegistry:
    """Per-operation timers + counters (DucklakeMetrics.java parity)."""

    ops: dict[str, OpStats] = field(default_factory=lambda: defaultdict(OpStats))
    counters: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record_op(self, op: str, elapsed_ms: float) -> None:
        with self._lock:
            s = self.ops[op]
            s.count += 1
            s.total_ms += elapsed_ms
            s.max_ms = max(s.max_ms, elapsed_ms)

    def inc(self, name: str, by: int = 1) -> None:
        with self._lock:
            self.counters[name] += by

    @contextmanager
    def timer(self, op: str):
        """try-with-resources MetricTimer twin
        (DucklakeMetrics.java:361-412)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record_op(op, (time.perf_counter() - t0) * 1000.0)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "operations": {
                    op: {
                        "count": s.count,
                        "avg_ms": round(s.avg_ms, 3),
                        "max_ms": round(s.max_ms, 3),
                    }
                    for op, s in self.ops.items()
                },
                "counters": dict(self.counters),
            }


REGISTRY = MetricsRegistry()


class IngestMetricsListener(StreamingQueryListener):
    """Bridges Structured Streaming progress into the registry:
    records-processed / batch counters and per-batch duration mirror the
    reference's records-processed and batch-size sensors
    (``connect/DucklakeMetrics.java:212-259``)."""

    def __init__(self, registry: MetricsRegistry | None = None):
        self.registry = registry or REGISTRY

    def onQueryStarted(self, event) -> None:
        self.registry.inc("queries_started")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.registry.inc("batches")
        self.registry.inc("records_processed", int(p.numInputRows))
        duration = p.durationMs.get("triggerExecution") if p.durationMs else None
        if duration is not None:
            self.registry.record_op("micro_batch", float(duration))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.registry.inc("queries_terminated")
