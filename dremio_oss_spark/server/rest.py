"""REST SQL endpoint: POST a statement, get JSON rows back — with the
reference's async job store + result paging.

Reference: dremio-oss's primary entry point is the REST SQL API
(`dac/backend/.../dac/resource/SQLResource.java:53`, v3 API
`dac/api/SQLResource.java:47`) — a POST with `{"sql": "..."}` submits a
JOB; `GET /api/v3/job/{id}` polls its state and
`GET /api/v3/job/{id}/results?offset=&limit=` pages the result set
(the JobsService flow).  Both shapes are served here:

- POST /api/v3/sql       {"sql": "..."} → the DAC-style immediate
                         response {"id", "schema", "rows", "rowCount",
                         "accelerated_by"}; with {"async": true} the
                         POST returns {"id"} at submit time and the
                         statement runs in a worker thread
- GET  /api/v3/job/{id}          {"jobState": RUNNING|COMPLETED|FAILED,
                                  "rowCount", "errorMessage"?}
- GET  /api/v3/job/{id}/results  ?offset=&limit= pages stored rows
- GET  /api/v3/catalog   table/view listing (INFORMATION_SCHEMA shape)
- GET  /health           liveness probe

Same scale contract as the Flight endpoint: results materialize
driver-side per request — result-set-sized reads only (the reference's
REST API likewise caps returned rows; `limit` defaults to 500 as the
DAC does, and a job stores at most `_Handler.max_stored` rows).

Concurrency note: statement PLANNING serializes behind one lock —
engine session state (shims, policy views, acceleration markers) is not
thread-safe — but EXECUTION (the collect) runs outside it: engine.sql
returns a fully-analyzed DataFrame, so overlapping reads interleave at
the Spark scheduler exactly like the reference's concurrent jobs
service (`ForemenWorkManager.java:715` — many foremen, one coordinator
planning queue).  Mutating statements commit inside engine.sql and so
remain fully serialized."""

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


class _Jobs:
    """Bounded in-memory job store (the reference's JobsService role at
    result-set scale): submitted statements record state + up to
    `max_stored` rows for paging; oldest finished jobs evict first."""

    def __init__(self, cap: int = 64):
        self._jobs: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._cap = cap

    def create(self) -> str:
        import uuid

        jid = uuid.uuid4().hex[:16]
        with self._lock:
            self._jobs[jid] = {"state": "RUNNING", "rows": [],
                               "schema": [], "error": None,
                               "accelerated_by": None}
            done = [j for j, st in self._jobs.items()
                    if st["state"] != "RUNNING"]
            while len(self._jobs) > self._cap and done:
                self._jobs.pop(done.pop(0))
        return jid

    def finish(self, jid: str, **fields) -> None:
        with self._lock:
            # state flips LAST: readers poll job["state"] without this
            # lock, so rows/schema must be in place before COMPLETED is
            # observable (dict.update applies kwargs in caller order)
            state = fields.pop("state", None)
            self._jobs[jid].update(fields)
            if state is not None:
                self._jobs[jid]["state"] = state

    def get(self, jid: str) -> dict | None:
        with self._lock:
            return self._jobs.get(jid)


class _Handler(BaseHTTPRequestHandler):
    engine = None          # set by serve_rest_background
    default_limit = 500    # DAC-style result cap
    max_stored = 10_000    # per-job stored-row cap for paging
    token: str | None = None
    jobs: _Jobs = None

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
        if self.path.startswith("/api/v3/job/"):
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            parts = u.path.rstrip("/").split("/")
            jid = parts[4] if len(parts) > 4 else ""
            job = self.jobs.get(jid)
            if job is None:
                return self._send(404, {"errorMessage": f"no job {jid}"})
            if len(parts) == 5:  # GET /api/v3/job/{id}: state poll
                out = {"id": jid, "jobState": job["state"],
                       "rowCount": len(job["rows"]),
                       "accelerated_by": job["accelerated_by"]}
                if job["error"]:
                    out["errorMessage"] = job["error"]
                return self._send(200, out)
            if len(parts) == 6 and parts[5] == "results":
                if job["state"] == "RUNNING":
                    return self._send(400, {"errorMessage":
                                            "job still running"})
                if job["state"] == "FAILED":
                    return self._send(400, {"errorMessage": job["error"]})
                q = parse_qs(u.query)
                try:
                    offset = int(q.get("offset", ["0"])[0])
                    limit = int(q.get("limit",
                                      [str(self.default_limit)])[0])
                except ValueError:
                    return self._send(400, {"errorMessage":
                                            "bad offset/limit"})
                page = job["rows"][offset:offset + limit]
                return self._send(200, {
                    "schema": job["schema"], "rows": page,
                    "rowCount": len(job["rows"]),
                    "offset": offset, "returned": len(page)})
        return self._send(404, {"errorMessage": f"no route {self.path}"})

    def _run_job(self, jid: str, sql: str) -> None:
        """Execute a statement into the job store (worker thread for
        async submits; inline for synchronous POSTs)."""
        try:
            with _ENGINE_LOCK:
                df = self.engine.sql(sql)
                accelerated = getattr(
                    self.engine, "last_plan_accelerated", None)
            # execution runs OUTSIDE the engine lock: engine.sql already
            # analyzed the plan (views expanded, policies applied, state
            # restored), so concurrent jobs interleave at the Spark
            # scheduler — the reference's concurrent jobs service shape
            # (ForemenWorkManager.java:715) with only statement PLANNING
            # serialized.  For a mutating statement engine.sql executes
            # the commit itself, so DML/DDL stays fully serialized.
            rows = df.limit(self.max_stored).collect()
            self.jobs.finish(
                jid, state="COMPLETED",
                schema=[{"name": f.name,
                         "type": f.dataType.simpleString()}
                        for f in df.schema.fields],
                rows=[{k: _json_cell(v) for k, v in r.asDict().items()}
                      for r in rows],
                accelerated_by=accelerated)
        except Exception as e:  # noqa: BLE001 — recorded on the job
            self.jobs.finish(jid, state="FAILED",
                             error=f"{type(e).__name__}: {e}")

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
            if limit < 0:
                raise ValueError("negative limit")
        except (ValueError, KeyError, TypeError):
            return self._send(400, {"errorMessage": "body must be "
                                                    '{"sql": "..."}'})
        if req.get("async"):
            # reference JobsService flow: submit returns the job id,
            # the statement executes in a worker, GET /job/{id} polls
            jid = self.jobs.create()
            threading.Thread(target=self._run_job, args=(jid, sql),
                             daemon=True).start()
            return self._send(200, {"id": jid, "jobState": "RUNNING"})
        try:
            # {"store": true} widens the collect to max_stored rows so
            # the job can be re-paged beyond `limit` afterwards; the
            # default sync hot path collects exactly `limit` rows, as
            # before the job store existed
            n_collect = (max(limit, self.max_stored)
                         if req.get("store") and limit else limit)
            with _ENGINE_LOCK:
                # the lock also makes accelerated_by read THIS query's
                # marker, not a concurrent request's
                df = self.engine.sql(sql)
                accelerated = getattr(
                    self.engine, "last_plan_accelerated", None)
            # collect outside the lock (see _run_job): reads interleave
            rows = df.limit(n_collect).collect()
            jid = self.jobs.create()
            json_rows = [{k: _json_cell(v) for k, v in r.asDict().items()}
                         for r in rows]
            schema = [{"name": f.name, "type": f.dataType.simpleString()}
                      for f in df.schema.fields]
            # synchronous POSTs also land in the job store so clients
            # can re-page what was collected (the store honors its
            # max_stored cap even when the client's limit exceeds it)
            self.jobs.finish(jid, state="COMPLETED", schema=schema,
                             rows=json_rows[:self.max_stored],
                             accelerated_by=accelerated)
            payload = {
                "id": jid,
                "schema": schema,
                "rows": json_rows[:limit],
                "rowCount": len(json_rows[:limit]),
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
                   {"engine": engine, "token": token, "jobs": _Jobs()})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, t
