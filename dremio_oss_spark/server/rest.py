"""REST SQL endpoint: POST a statement, get JSON rows back.

Reference: dremio-oss's primary entry point is the REST SQL API
(`dac/backend/.../dac/resource/SQLResource.java:53`, v3 API
`dac/api/SQLResource.java:47`) — a POST with `{"sql": "..."}` submits
the job and results page back as JSON.  Here the job service is
`Engine.sql` directly (no async job store: the engine is in-process),
so the response carries rowCount + rows, and errors return as
`{"errorMessage": ...}` with a 4xx/5xx status, like the DAC's error
envelope.

Endpoints:
- POST /api/v3/sql       {"sql": "..."} → {"schema": [...], "rows": [...],
                          "rowCount": n, "accelerated_by": name|null}
- GET  /api/v3/catalog   table/view listing (INFORMATION_SCHEMA shape)
- GET  /health           liveness probe

Same scale contract as the Flight endpoint: results materialize
driver-side per request — result-set-sized reads only (the reference's
REST API likewise caps returned rows; `limit` defaults to 500 as the
DAC does)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# engine state (shims, policy views, acceleration markers) is not
# thread-safe; ThreadingHTTPServer handlers serialize engine access
_ENGINE_LOCK = threading.Lock()


def _json_cell(v):
    """JSON-safe cell: dates/decimals/bytes stringify."""
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode()
    try:
        from pyspark.sql import Row

        if isinstance(v, Row):  # struct cell: keep field names
            return {k: _json_cell(x) for k, x in v.asDict().items()}
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    return v


class _Handler(BaseHTTPRequestHandler):
    engine = None          # set by serve_rest_background
    default_limit = 500    # DAC-style result cap
    token: str | None = None

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authed(self) -> bool:
        if not self.token:
            return True
        return (self.headers.get("Authorization")
                == f"Bearer {self.token}")

    def do_GET(self):
        if not self._authed():
            return self._send(401, {"errorMessage": "unauthorized"})
        if self.path == "/health":
            return self._send(200, {"status": "ok"})
        if self.path.rstrip("/") == "/api/v3/catalog":
            try:
                with _ENGINE_LOCK:
                    rows = [
                        {"name": r["table_name"],
                         "schema": r["table_schema"],
                         "type": r["table_type"]}
                        for r in
                        self.engine.information_schema_tables().collect()]
            except Exception as e:  # error envelope, like the POST path
                return self._send(500, {"errorMessage":
                                        f"{type(e).__name__}: {e}"})
            return self._send(200, {"data": rows})
        return self._send(404, {"errorMessage": f"no route {self.path}"})

    def do_POST(self):
        if not self._authed():
            return self._send(401, {"errorMessage": "unauthorized"})
        if self.path != "/api/v3/sql":
            return self._send(404, {"errorMessage": f"no route {self.path}"})
        try:
            n = int(self.headers.get("Content-Length") or 0)
            req = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(req, dict):
                raise ValueError("not an object")
            sql = req["sql"]
            # limit=0 is a legitimate schema-only probe — only None
            # falls back to the DAC-style default
            raw_limit = req.get("limit")
            limit = (self.default_limit if raw_limit is None
                     else int(raw_limit))
        except (ValueError, KeyError, TypeError):
            return self._send(400, {"errorMessage": "body must be "
                                                    '{"sql": "..."}'})
        try:
            with _ENGINE_LOCK:
                # the lock also makes accelerated_by read THIS query's
                # marker, not a concurrent request's
                df = self.engine.sql(sql)
                accelerated = getattr(
                    self.engine, "last_plan_accelerated", None)
                rows = df.limit(limit).collect()
            payload = {
                "schema": [{"name": f.name,
                            "type": f.dataType.simpleString()}
                           for f in df.schema.fields],
                "rows": [{k: _json_cell(v) for k, v in r.asDict().items()}
                         for r in rows],
                "rowCount": len(rows),
                "accelerated_by": accelerated,
            }
            return self._send(200, payload)
        except Exception as e:  # planner/execution error envelope
            return self._send(400, {"errorMessage":
                                    f"{type(e).__name__}: {e}"})


def serve_rest_background(engine, port: int = 0,
                          token: str | None = None
                          ) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind (ephemeral port by default) and serve in a daemon thread;
    `server.server_address[1]` is the bound port, `server.shutdown()`
    stops it."""
    handler = type("BoundHandler", (_Handler,),
                   {"engine": engine, "token": token})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, t
