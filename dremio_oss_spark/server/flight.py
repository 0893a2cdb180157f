"""Arrow Flight SQL endpoint: run engine SQL over the wire, stream the
result as Arrow record batches.

Reference: dremio-oss serves queries over Arrow Flight
(`services/arrow-flight/.../DremioFlightProducer.java:89`,
`getStreamStatement:393`): the client's statement rides in the flight
descriptor/ticket, the server plans it through the normal query path and
streams Arrow batches back.  This is the same shape on pyarrow.flight
over `Engine.sql` — every dialect rewrite, policy, and reflection the
library surface applies holds for network clients too, because the
server IS the library surface.

Scope: the read path (GetFlightInfo + DoGet) plus a health action, with
optional bearer-token auth — the endpoints a SQL client needs.  DoPut /
prepared statements are out of scope (the reference's writer path goes
through SQL DML here).

Scale note: results materialize driver-side as one Arrow table per
request (`DataFrame.toArrow`), so the endpoint is for RESULT-SET-sized
reads — exactly the reference's coordinator-side Screen/result-fetch
role, not a bulk-export path.  Bulk egress belongs to `df.write`.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight


class _BearerMiddleware(flight.ServerMiddleware):
    def __init__(self):
        pass


class _BearerMiddlewareFactory(flight.ServerMiddlewareFactory):
    """Reject calls lacking the configured bearer token (the reference
    gates Flight behind the same auth as JDBC/REST)."""

    def __init__(self, token: str):
        self._token = token

    def start_call(self, info, headers):
        vals = (headers.get("authorization")
                or headers.get("Authorization") or [])
        if isinstance(vals, (str, bytes)):
            vals = [vals]
        want = f"Bearer {self._token}"
        # EXACT match — substring checks would accept any token that
        # merely contains the real one
        ok = any((v.decode() if isinstance(v, bytes) else v) == want
                 for v in vals)
        if not ok:
            raise flight.FlightUnauthenticatedError("missing/bad token")
        return _BearerMiddleware()


class EngineFlightServer(flight.FlightServerBase):
    """`grpc://host:port` front of an Engine.  Tickets carry SQL text."""

    def __init__(self, engine, location: str = "grpc://127.0.0.1:0",
                 token: str | None = None):
        middleware = {}
        if token:
            middleware["auth"] = _BearerMiddlewareFactory(token)
        super().__init__(location, middleware=middleware)
        self.engine = engine
        self._location = location
        # engine state (shim registration, policy views, acceleration
        # markers) is not thread-safe; serialize engine interactions
        self._lock = threading.Lock()
        # GetFlightInfo -> DoGet must execute a statement ONCE: cache
        # the planned frame keyed by the ticket bytes (bounded FIFO)
        self._planned: dict[bytes, object] = {}

    # -- read path ---------------------------------------------------------
    def _run(self, sql: str):
        try:
            return self.engine.sql(sql)
        except Exception as e:  # surface planner errors as Flight errors
            raise flight.FlightServerError(
                f"{type(e).__name__}: {e}") from e

    def get_flight_info(self, context, descriptor):
        sql = descriptor.command.decode()
        with self._lock:
            df = self._run(sql)
            # cache the PLANNED frame so DoGet streams this statement's
            # result instead of running engine.sql again (DML executes
            # eagerly inside sql() — a second call would apply it twice)
            self._planned[descriptor.command] = df
            while len(self._planned) > 32:  # bounded: drop oldest
                self._planned.pop(next(iter(self._planned)))
            schema = df.limit(0).toArrow().schema
        endpoint = flight.FlightEndpoint(
            flight.Ticket(descriptor.command),
            [flight.Location.for_grpc_tcp("127.0.0.1", self.port)])
        return flight.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    def do_get(self, context, ticket):
        with self._lock:
            df = self._planned.pop(ticket.ticket, None)
            if df is None:  # direct DoGet without GetFlightInfo
                df = self._run(ticket.ticket.decode())
            table = df.toArrow()
        return flight.RecordBatchStream(table)

    def list_actions(self, context):
        return [("ping", "health check"),
                ("version", "engine + spark version")]

    def do_action(self, context, action):
        if action.type == "ping":
            return [b"pong"]
        if action.type == "version":
            return [self.engine.spark.version.encode()]
        raise flight.FlightServerError(f"unknown action {action.type!r}")


def serve_background(engine, token: str | None = None
                     ) -> tuple[EngineFlightServer, threading.Thread]:
    """Start the server on an ephemeral port; returns (server, thread).
    `server.port` is the bound port; `server.shutdown()` stops it."""
    server = EngineFlightServer(engine, token=token)
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server, t


def flight_query(port: int, sql: str,
                 token: str | None = None) -> pa.Table:
    """Client helper: run `sql` against a local endpoint, return the
    Arrow table (GetFlightInfo → DoGet, the standard two-step)."""
    opts = None
    if token:
        opts = flight.FlightCallOptions(
            headers=[(b"authorization", f"Bearer {token}".encode())])
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        desc = flight.FlightDescriptor.for_command(sql.encode())
        info = client.get_flight_info(desc, opts)
        reader = client.do_get(info.endpoints[0].ticket, opts)
        return reader.read_all()
    finally:
        client.close()
