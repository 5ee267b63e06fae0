"""Live monitor — the reference's Dash dashboard
(/root/reference/real_time_monitoring.py:86-139: a deque(15) buffer of the
latest series served on a self-refreshing page) re-expressed with only the
standard library: a daemon ``ThreadingHTTPServer`` serves

* ``/``          — a minimal HTML page that re-fetches every 2 s,
* ``/data.json`` — the current payload from a caller-supplied callable.

The data plane stays in the engine (the streaming last-N ring /
``last_n_buffer`` query produce the payload); this sink is only the
presentation edge, so it takes a ``payload_fn`` and knows nothing about
Spark.  ``table_payload`` adapts a (memory-sink) table into such a callable.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

_PAGE = b"""<!doctype html>
<html><head><title>engine monitor</title></head>
<body><h3>streaming-downsampling monitor</h3><pre id="out">loading...</pre>
<script>
async function tick() {
  const r = await fetch('/data.json');
  document.getElementById('out').textContent =
      JSON.stringify(await r.json(), null, 2);
}
tick(); setInterval(tick, 2000);
</script></body></html>
"""


class LiveMonitor:
    """Serve ``payload_fn()`` as a live JSON endpoint + auto-refresh page."""

    def __init__(
        self,
        payload_fn: Callable[[], object],
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._payload_fn = payload_fn
        monitor = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path == "/data.json":
                    body = json.dumps(monitor._payload_fn()).encode()
                    ctype = "application/json"
                elif self.path == "/":
                    body, ctype = _PAGE, "text/html"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # silence per-request stderr
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "LiveMonitor":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def table_payload(spark, table: str, limit: int = 100) -> Callable[[], list]:
    """Adapt a (memory-sink) table into a monitor payload callable — the
    bridge from the streaming last-N ring to the dashboard."""

    def payload() -> list:
        rows = spark.table(table).limit(limit).collect()
        return [{k: _plain(v) for k, v in r.asDict().items()} for r in rows]

    return payload


def _plain(v):
    return v.isoformat() if hasattr(v, "isoformat") else v
