"""Out-of-process HTTP status/submission surface over :class:`Engine`.

Parity target: the reference's third entry point is a Flask web UI —
``/jobs`` (web_ui/app.py:324), ``/invoke-job`` (:370), ``/schedule-job``
(:417), ``/stage-progress`` (:516) — serving job state over HTTP so a
dashboard or curl can drive the engine without importing it. This module
is the Spark-side equivalent as a ZERO-DEPENDENCY stdlib ``http.server``
JSON facade (the container has no Flask, and a status plane has no
business pulling in a web framework): every endpoint is a thin view over
``Engine.queries/run/status/report/schedule/explain``, so the HTTP layer
holds no state of its own beyond the schedule handles it hands out.

Endpoints (all JSON):

- ``GET /jobs``                      → registered query names
- ``GET /run?name=<q>``              → execute one query, return its run record
- ``GET /status[?name=<q>]``         → run history
- ``GET /report[?name=<q>]``         → aggregated resource report
- ``GET /progress``                  → LIVE active-job/stage task counts
  (the reference's /stage-progress analog, from sc.statusTracker())
- ``GET /explain?name=<q>``          → optimized physical plan text
- ``GET /schedule?name=<q>&every_s=<f>[&max_runs=<n>]`` → start a
  recurring run loop, returns a schedule id
- ``GET /cancel?id=<n>``             → cancel a schedule

Threading: ``ThreadingHTTPServer`` — Spark supports concurrent job
submission and ``Engine.run`` scopes metrics with thread-local job
groups, so two in-flight ``/run`` requests do not disturb each other.
The server thread is a daemon; ``stop()`` shuts the listener down
cleanly (scheduled jobs it started keep their own daemon threads and
are cancelled individually via ``/cancel``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from serverless_mapreduce_spark.engine import Engine, ScheduledJob


class StatusServer:
    """Serve an :class:`Engine` over HTTP. ``port=0`` picks a free port."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._schedules: dict[int, ScheduledJob] = {}
        self._next_id = 1
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: no stderr per request
                pass

            def do_GET(self) -> None:
                try:
                    code, payload = server._dispatch(self.path)
                except KeyError as exc:
                    code, payload = 404, {"error": f"unknown query {exc}"}
                except (ValueError, TypeError) as exc:
                    code, payload = 400, {"error": str(exc)}
                except Exception as exc:  # a failed run is a 500 with detail
                    code, payload = 500, {
                        "error": f"{type(exc).__name__}: {exc}"
                    }
                finally:
                    # Cache/view lifetime is thread-scoped (caching.py) and
                    # each request runs on a FRESH ThreadingHTTPServer
                    # thread that never runs another query — without this,
                    # every /run's persisted intermediates and temp views
                    # would accumulate until storage memory is exhausted.
                    # The run has materialized by now (noop write), so
                    # releasing here is safe.
                    from serverless_mapreduce_spark.caching import (
                        release_cached,
                    )

                    release_cached()
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    # -- lifecycle -------------------------------------------------------------

    @property
    def address(self) -> tuple[str, int]:
        host, port = self._httpd.server_address[:2]
        return str(host), int(port)

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="smr-webui", daemon=True
        )
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- routing ---------------------------------------------------------------

    def _dispatch(self, path: str) -> tuple[int, object]:
        url = urlparse(path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        route = url.path.rstrip("/") or "/"
        if route == "/jobs":
            return 200, {"queries": self.engine.queries()}
        if route == "/status":
            return 200, self.engine.status(q.get("name"))
        if route == "/report":
            return 200, self.engine.report(q.get("name"))
        if route == "/progress":
            return 200, self.engine.progress()
        if route == "/explain":
            name = _required(q, "name")
            return 200, {"name": name, "plan": self.engine.explain(name)}
        if route == "/run":
            name = _required(q, "name")
            # run_info returns THIS run's record — status(...)[-1] could be
            # a concurrent run's (a second /run, a schedule tick)
            return 200, {"name": name, "run": self.engine.run_info(name)}
        if route == "/schedule":
            name = _required(q, "name")
            every_s = float(_required(q, "every_s"))
            max_runs = int(q["max_runs"]) if "max_runs" in q else None
            job = self.engine.schedule(name, every_s, max_runs=max_runs)
            with self._lock:
                sid = self._next_id
                self._next_id += 1
                self._schedules[sid] = job
            return 200, {"id": sid, "name": name, "every_s": every_s}
        if route == "/cancel":
            sid = int(_required(q, "id"))
            with self._lock:
                job = self._schedules.get(sid)
            if job is None:
                raise KeyError(f"schedule {sid}")
            job.cancel()
            return 200, {"id": sid, "cancelled": True}
        raise KeyError(route)


def _required(q: dict[str, str], key: str) -> str:
    if key not in q:
        raise ValueError(f"missing required parameter {key!r}")
    return q[key]
