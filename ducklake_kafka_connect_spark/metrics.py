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


# Per-op warning thresholds (ms) from the reference's recommended alerts
# (METRICS.md:168-189: MERGE avg > 1000 ms, INSERT avg > 500 ms).
OP_WARN_THRESHOLDS_MS = {
    "upsertWithMergeInto": 1000.0,
    "simpleInsert": 500.0,
}


def to_prometheus(registry: "MetricsRegistry", labels: dict[str, str] | None = None) -> str:
    """Prometheus text exposition of the registry — the same metric
    names the reference's JMX → Prometheus pipeline exports
    (``operation_time_avg{operation=...}`` / ``operation_count``,
    METRICS.md:125-162), so its published alert rules and Grafana board
    queries work unchanged. Ops whose average exceeds the reference's
    recommended thresholds additionally emit ``operation_slow`` = 1."""
    base = dict(labels or {})

    def fmt_labels(extra: dict[str, str]) -> str:
        all_labels = {**base, **extra}
        if not all_labels:
            return ""
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(all_labels.items()))
        return "{" + inner + "}"

    snap = registry.snapshot()
    lines = [
        "# HELP operation_time_avg Average operation latency in milliseconds",
        "# TYPE operation_time_avg gauge",
    ]
    for op, s in sorted(snap["operations"].items()):
        lines.append(f"operation_time_avg{fmt_labels({'operation': op})} {s['avg_ms']}")
    lines += [
        "# HELP operation_time_max Max operation latency in milliseconds",
        "# TYPE operation_time_max gauge",
    ]
    for op, s in sorted(snap["operations"].items()):
        lines.append(f"operation_time_max{fmt_labels({'operation': op})} {s['max_ms']}")
    lines += [
        "# HELP operation_count Number of completed operations",
        "# TYPE operation_count counter",
    ]
    for op, s in sorted(snap["operations"].items()):
        lines.append(f"operation_count{fmt_labels({'operation': op})} {s['count']}")
    lines += [
        "# HELP operation_slow 1 when an operation's average latency exceeds its recommended threshold",
        "# TYPE operation_slow gauge",
    ]
    for op, thresh in sorted(OP_WARN_THRESHOLDS_MS.items()):
        s = snap["operations"].get(op)
        slow = 1 if s and s["avg_ms"] > thresh else 0
        lines.append(
            f"operation_slow{fmt_labels({'operation': op, 'threshold_ms': str(int(thresh))})} {slow}"
        )
    lines += [
        "# HELP records_counter Engine counters (records processed, batches, DLQ rows)",
        "# TYPE records_counter counter",
    ]
    for name, v in sorted(snap["counters"].items()):
        lines.append(f"records_counter{fmt_labels({'counter': name})} {v}")
    return "\n".join(lines) + "\n"


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
