"""G3/K4 — streaming metrics parity (SURVEY.md §2.4/§2.6).

The reference exposes Prometheus counters (consumed / consumed-debug /
write success-failure, by topic and (topic, date)) via a warp HTTP
endpoint (reference ``src/prometheus.rs:7-194``). Spark-natively:

- per-micro-batch aggregates ride the stream itself via
  ``DataFrame.observe`` (no extra pass over the data);
- a ``StreamingQueryListener`` collects each batch's observed values
  into an in-process registry;
- text exposition renders the registry in Prometheus format (the
  cluster deployment would instead flip
  ``spark.ui.prometheus.enabled=true`` and scrape the driver; this
  registry keeps the custom counter names of the reference).
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


class MetricsRegistry:
    """Monotonic counters keyed by (name, labels tuple)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple, float] = defaultdict(float)

    def inc(self, name: str, value: float, **labels) -> None:
        key = (name, tuple(sorted(labels.items())))
        with self._lock:
            self._counters[key] += value

    def get(self, name: str, **labels) -> float:
        key = (name, tuple(sorted(labels.items())))
        with self._lock:
            return self._counters.get(key, 0.0)

    def render_prometheus(self) -> str:
        """Text exposition format (the reference's /metrics payload
        shape, reference ``src/prometheus.rs:157-164``)."""
        lines = []
        with self._lock:
            for (name, labels), value in sorted(self._counters.items()):
                if labels:
                    lbl = ",".join(f'{k}="{v}"' for k, v in labels)
                    lines.append(f"{name}{{{lbl}}} {value}")
                else:
                    lines.append(f"{name} {value}")
        return "\n".join(lines) + "\n"


class ObservedMetricsListener(StreamingQueryListener):
    """Bridges ``observe()`` results into the registry. The reference's
    counter names are kept: pulsar_received_messages /
    pulsar_received_debug_messages (reference ``src/prometheus.rs:7-33``)."""

    def __init__(self, registry: MetricsRegistry, observation_name: str = "etl_metrics"):
        self.registry = registry
        self.observation_name = observation_name

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics or {}
        row = observed.get(self.observation_name)
        if row is None:
            return
        d = row.asDict()
        self.registry.inc("pulsar_received_messages", d.get("consumed") or 0)
        self.registry.inc("pulsar_received_debug_messages", d.get("consumed_debug") or 0)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
