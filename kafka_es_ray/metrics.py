"""Live metrics endpoint — the Prometheus-exporter analog (S6).

The reference exposes ingestion counters over a scrape endpoint while the
connector runs (reference kafka-es-runner Metrics.kt:24-83 registers
gauges/counters; MetricsUpdater.kt:3-15 pushes task stats into them).
This is the Ray-engine analog for the long-running ``follow_directory``
ingestion loop: a stdlib HTTP thread serving the engine's counters in
both Prometheus text format (``/metrics``) and JSON (``/metrics.json``)
so an operator can watch a live ingestion without stopping it.

Design notes for scale: the server holds ONLY scalar counters (a dict of
numbers guarded by a lock) — it never touches Ray state, datasets or the
index, so scrapes cost microseconds regardless of corpus size.  One
server per driver process; stage-level metrics still travel through
manifests (build metrics) and QUERY_METRICS the way batch jobs report.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MetricsServer:
    """Tiny scrapeable counter registry.

    >>> ms = MetricsServer(prefix="kafka_es")
    >>> ms.start()          # binds 127.0.0.1:<free port>
    >>> ms.inc("files_applied"); ms.set("last_gen", 7)
    >>> # curl http://127.0.0.1:{ms.port}/metrics  |  /metrics.json
    >>> ms.stop()
    """

    def __init__(self, prefix: str = "kafka_es", port: int = 0):
        self.prefix = prefix
        self._want_port = port
        self.port: int | None = None
        self._lock = threading.Lock()
        self._values: dict[str, float] = {}
        self._started_at = time.time()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- counter surface ------------------------------------------------
    def inc(self, name: str, by: float = 1.0) -> None:
        with self._lock:
            self._values[name] = self._values.get(name, 0.0) + by

    def set(self, name: str, value: float) -> None:
        with self._lock:
            self._values[name] = float(value)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            vals = dict(self._values)
        vals["uptime_seconds"] = time.time() - self._started_at
        return vals

    # -- render ----------------------------------------------------------
    def render_prometheus(self) -> str:
        snap = self.snapshot()
        lines = []
        for k in sorted(snap):
            lines.append(f"# TYPE {self.prefix}_{k} gauge")
            lines.append(f"{self.prefix}_{k} {snap[k]:g}")
        return "\n".join(lines) + "\n"

    def render_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)

    # -- http ------------------------------------------------------------
    def start(self) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib API
                if self.path.startswith("/metrics.json"):
                    body = server.render_json().encode()
                    ctype = "application/json"
                elif self.path.startswith("/metrics"):
                    body = server.render_prometheus().encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence per-scrape stderr spam
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", self._want_port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
