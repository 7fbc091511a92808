"""Stdlib HTTP transport for :class:`service.SQLizerService` — the
runnable analog of the reference's FastAPI app (no web framework exists
in this container, so the binding is ``http.server`` from the standard
library; the route table and response shapes mirror the reference
endpoint-for-endpoint).

Routes (reference file:line):

- GET  /healthz                      app/main.py:53-55
- GET|POST /connect/test             app/main.py:162-196
- GET|POST /schema/overview          app/main.py:198-260
- POST /ai/nl2sql                    app/main.py:262-296
- POST /ai/run                       app/main.py:298-331
- POST /ai/ask                       app/routes_ai.py:91-317
- POST /models/schema-id             app/routes_models.py:97-142
- POST /models/train                 app/routes_models.py:145-226
- GET  /models/list                  app/routes_models.py:283-291
- GET  /models/{id}/progress         app/routes_models.py:228-250
- GET  /models/{id}/status           app/routes_models.py:252-281
- GET  /models/{id}                  app/routes_models.py:293-303
- DELETE /models/{id}                app/routes_models.py:305-318
- POST /models/{id}/query            app/routes_models.py:320-369

``ThreadingHTTPServer`` serves each request on its own thread; the
service façade is already thread-safe where it must be (training
lifecycle under a lock, progress map thread-locked). Spark handles the
actual query concurrency — the driver schedules concurrent jobs from
multiple threads fine, which is exactly how the reference's uvicorn
workers share one engine.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

from .service import SQLizerService

_MODEL_ROUTE = re.compile(r"^/models/([0-9a-f]{16})(?:/(progress|status|query))?$")


def _routes(svc: SQLizerService) -> dict[tuple[str, str], Callable[[dict], dict]]:
    """Static (method, path) routes; /models/{id}... is matched by
    regex in the handler because the id is a path segment."""
    return {
        ("GET", "/healthz"): lambda body: svc.healthz(),
        ("GET", "/connect/test"): lambda body: svc.connect_test(),
        ("POST", "/connect/test"): lambda body: svc.connect_test(),
        ("GET", "/schema/overview"): lambda body: svc.schema_overview(),
        ("POST", "/schema/overview"): lambda body: svc.schema_overview(),
        ("POST", "/ai/nl2sql"): lambda body: svc.nl2sql(body.get("question", "")),
        ("POST", "/ai/run"): lambda body: svc.run(
            body.get("sql", ""),
            timeout_ms=int(body.get("timeout_ms", 5000)),
            max_rows=int(body.get("max_rows", 100)),
        ),
        ("POST", "/ai/ask"): lambda body: svc.ask(body.get("question", "")),
        ("POST", "/models/schema-id"): lambda body: svc.schema_id(),
        ("POST", "/models/train"): lambda body: svc.train(
            force_retrain=bool(body.get("force_retrain", False)),
            use_llm_for_training=bool(body.get("use_llm_for_training", True)),
        ),
        ("GET", "/models/list"): lambda body: svc.list_models(),
    }


def make_handler(svc: SQLizerService) -> type[BaseHTTPRequestHandler]:
    routes = _routes(svc)

    class Handler(BaseHTTPRequestHandler):
        # keep pytest output clean; a deployment swaps in real logging
        def log_message(self, fmt: str, *args: Any) -> None:
            pass

        def _reply(self, payload: dict, status: int | None = None) -> None:
            if status is None:
                err = str(payload.get("error", ""))
                status = (
                    200
                    if payload.get("ok", False)
                    else (404 if "not found" in err.lower() else 400)
                )
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if n == 0:
                return {}
            raw = self.rfile.read(n)
            parsed = json.loads(raw.decode() or "{}")
            if not isinstance(parsed, dict):
                raise ValueError("JSON body must be an object")
            return parsed

        def _dispatch(self, method: str) -> None:
            try:
                body = self._body()
            except (ValueError, json.JSONDecodeError) as e:
                self._reply({"ok": False, "error": f"Bad JSON body: {e}"}, 400)
                return
            fn = routes.get((method, self.path))
            if fn is None:
                m = _MODEL_ROUTE.match(self.path)
                if m:
                    sid, sub = m.group(1), m.group(2)
                    fn = {
                        ("GET", "progress"): lambda b: svc.training_progress(sid),
                        ("GET", "status"): lambda b: svc.model_status(sid),
                        ("GET", None): lambda b: svc.get_model(sid),
                        ("DELETE", None): lambda b: svc.delete_model(sid),
                        ("POST", "query"): lambda b: svc.model_query(
                            sid, b.get("question", "")
                        ),
                    }.get((method, sub))
            if fn is None:
                self._reply({"ok": False, "error": "Not Found"}, 404)
                return
            try:
                self._reply(fn(body))
            except (ValueError, TypeError) as e:
                # malformed field values (non-numeric timeout_ms, ...)
                # are the client's fault, same as unparseable JSON
                self._reply({"ok": False, "error": f"Bad request: {e}"}, 400)
            except Exception as e:  # noqa: BLE001 — route errors → 500 JSON
                self._reply({"ok": False, "error": f"Internal error: {e}"}, 500)

        def do_GET(self) -> None:  # noqa: N802 (stdlib contract)
            self._dispatch("GET")

        def do_POST(self) -> None:  # noqa: N802
            self._dispatch("POST")

        def do_DELETE(self) -> None:  # noqa: N802
            self._dispatch("DELETE")

    return Handler


def make_server(svc: SQLizerService, port: int = 0) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral, for tests) without serving; call
    ``serve_forever`` or use :func:`serve_background`."""
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(svc))


def serve_background(
    svc: SQLizerService, port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start serving on a daemon thread; returns (server, thread) —
    ``server.server_address[1]`` is the bound port, ``server.shutdown()``
    stops it."""
    httpd = make_server(svc, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t
