"""Arrow FlightSQL protobuf envelope codec (no generated bindings).

Reference: the reference's Flight endpoint speaks the FlightSQL
protocol — commands arrive as protobuf messages wrapped in
`google.protobuf.Any` inside FlightDescriptor.cmd / Ticket.ticket /
Action bodies (`DremioFlightProducer.java:89` routes on the unpacked
command type; message definitions are the public
`arrow/flight/protocol/sql/FlightSql.proto`).

pyarrow ships no FlightSQL bindings, but every message this server
needs is one or two LENGTH-DELIMITED protobuf fields, so the wire
format is hand-codable exactly:

    field  = tag varint | payload            (tag = field_num<<3 | 2)
    Any    = { 1: type_url (string), 2: value (bytes) }
    CommandStatementQuery                 = { 1: query (string) }
    TicketStatementQuery                  = { 1: statement_handle (bytes) }
    CommandPreparedStatementQuery         = { 1: handle (bytes) }
    ActionCreatePreparedStatementRequest  = { 1: query (string) }
    ActionCreatePreparedStatementResult   = { 1: handle (bytes),
                                              2: dataset_schema (bytes),
                                              3: parameter_schema (bytes) }
    ActionClosePreparedStatementRequest   = { 1: handle (bytes) }

Catalog-metadata commands (`DremioFlightProducer.java:567-584,814` —
a stock ADBC/JDBC FlightSQL client issues these on CONNECT, before
any statement runs):

    CommandGetCatalogs                    = { }
    CommandGetDbSchemas                   = { 1: catalog (string),
                                              2: db_schema_filter_pattern }
    CommandGetTables                      = { 1: catalog,
                                              2: db_schema_filter_pattern,
                                              3: table_name_filter_pattern,
                                              4: table_types (repeated str),
                                              5: include_schema (bool) }
    CommandGetTableTypes                  = { }
    CommandGetSqlInfo                     = { 1: info (repeated uint32,
                                                 packed or unpacked) }

Bytes produced here are REAL protocol bytes — a stock FlightSQL client
(ADBC, the JDBC driver) interoperates; golden byte vectors are pinned
in tests/test_flight.py so the codec is checked against the protobuf
spec, not against itself.
"""

from __future__ import annotations

TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def field_bytes(num: int, payload: bytes) -> bytes:
    """One length-delimited field (wire type 2)."""
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def parse_fields(buf: bytes) -> dict[int, list]:
    """All fields of a message: length-delimited -> bytes, varint ->
    int.  Unknown wire types raise (nothing FlightSQL sends here uses
    them)."""
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(buf, i)
            out.setdefault(num, []).append(buf[i:i + ln])
            i += ln
        elif wt == 0:
            v, i = _read_varint(buf, i)
            out.setdefault(num, []).append(v)
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


def any_pack(msg_name: str, payload: bytes) -> bytes:
    url = (TYPE_PREFIX + msg_name).encode()
    return field_bytes(1, url) + field_bytes(2, payload)


def any_unpack(buf: bytes) -> tuple[str, bytes] | None:
    """(message name, payload) when `buf` is an Any carrying a
    FlightSQL message; None for anything else (plain-SQL descriptors,
    generic tickets) — the server keeps its generic-action fallback."""
    try:
        f = parse_fields(buf)
        url = f[1][0].decode()
    except (ValueError, KeyError, IndexError, UnicodeDecodeError):
        return None
    if not url.startswith(TYPE_PREFIX):
        return None
    return url[len(TYPE_PREFIX):], (f.get(2, [b""])[0])


# -- message constructors / parsers (the handful the server speaks) ---------

def command_statement_query(sql: str) -> bytes:
    return any_pack("CommandStatementQuery",
                    field_bytes(1, sql.encode()))


def ticket_statement_query(handle: bytes) -> bytes:
    return any_pack("TicketStatementQuery", field_bytes(1, handle))


def command_prepared_statement_query(handle: bytes) -> bytes:
    return any_pack("CommandPreparedStatementQuery",
                    field_bytes(1, handle))


def action_create_prepared_request(sql: str) -> bytes:
    return any_pack("ActionCreatePreparedStatementRequest",
                    field_bytes(1, sql.encode()))


def action_create_prepared_result(handle: bytes,
                                  dataset_schema: bytes = b"") -> bytes:
    msg = field_bytes(1, handle)
    if dataset_schema:
        msg += field_bytes(2, dataset_schema)
    return any_pack("ActionCreatePreparedStatementResult", msg)


def action_close_prepared_request(handle: bytes) -> bytes:
    return any_pack("ActionClosePreparedStatementRequest",
                    field_bytes(1, handle))


def field_varint(num: int, value: int) -> bytes:
    """One varint field (wire type 0) — bools and uint32s."""
    return _varint(num << 3) + _varint(value)


# -- catalog-metadata commands (DremioFlightProducer.java:567-584,814) ------

def command_get_catalogs() -> bytes:
    return any_pack("CommandGetCatalogs", b"")


def command_get_table_types() -> bytes:
    return any_pack("CommandGetTableTypes", b"")


def command_get_db_schemas(catalog: str | None = None,
                           db_schema_filter_pattern: str | None = None
                           ) -> bytes:
    msg = b""
    if catalog is not None:
        msg += field_bytes(1, catalog.encode())
    if db_schema_filter_pattern is not None:
        msg += field_bytes(2, db_schema_filter_pattern.encode())
    return any_pack("CommandGetDbSchemas", msg)


def command_get_tables(catalog: str | None = None,
                       db_schema_filter_pattern: str | None = None,
                       table_name_filter_pattern: str | None = None,
                       table_types: tuple[str, ...] = (),
                       include_schema: bool = False) -> bytes:
    msg = b""
    if catalog is not None:
        msg += field_bytes(1, catalog.encode())
    if db_schema_filter_pattern is not None:
        msg += field_bytes(2, db_schema_filter_pattern.encode())
    if table_name_filter_pattern is not None:
        msg += field_bytes(3, table_name_filter_pattern.encode())
    for t in table_types:
        msg += field_bytes(4, t.encode())
    if include_schema:
        msg += field_varint(5, 1)
    return any_pack("CommandGetTables", msg)


def command_get_sql_info(*info: int) -> bytes:
    # proto3 repeated uint32 is PACKED by default: one length-delimited
    # field holding concatenated varints; no field at all when empty
    # (= "send everything you have")
    msg = (field_bytes(1, b"".join(_varint(i) for i in info))
           if info else b"")
    return any_pack("CommandGetSqlInfo", msg)


def command_get_xdbc_type_info(data_type: int | None = None) -> bytes:
    msg = field_varint(1, data_type) if data_type is not None else b""
    return any_pack("CommandGetXdbcTypeInfo", msg)


def _keys_cmd(name: str, catalog: str | None, db_schema: str | None,
              table: str) -> bytes:
    msg = b""
    if catalog is not None:
        msg += field_bytes(1, catalog.encode())
    if db_schema is not None:
        msg += field_bytes(2, db_schema.encode())
    msg += field_bytes(3, table.encode())
    return any_pack(name, msg)


def command_get_primary_keys(table: str, catalog: str | None = None,
                             db_schema: str | None = None) -> bytes:
    return _keys_cmd("CommandGetPrimaryKeys", catalog, db_schema, table)


def command_get_exported_keys(table: str, catalog: str | None = None,
                              db_schema: str | None = None) -> bytes:
    return _keys_cmd("CommandGetExportedKeys", catalog, db_schema, table)


def command_get_imported_keys(table: str, catalog: str | None = None,
                              db_schema: str | None = None) -> bytes:
    return _keys_cmd("CommandGetImportedKeys", catalog, db_schema, table)


def parse_get_db_schemas(payload: bytes) -> dict:
    f = parse_fields(payload)
    return {
        "catalog": (f[1][0].decode() if 1 in f else None),
        "db_schema_filter_pattern": (f[2][0].decode() if 2 in f else None),
    }


def parse_get_tables(payload: bytes) -> dict:
    f = parse_fields(payload)
    return {
        "catalog": (f[1][0].decode() if 1 in f else None),
        "db_schema_filter_pattern": (f[2][0].decode() if 2 in f else None),
        "table_name_filter_pattern": (f[3][0].decode() if 3 in f else None),
        "table_types": tuple(b.decode() for b in f.get(4, [])),
        "include_schema": bool(f.get(5, [0])[0]),
    }


def parse_sql_info_ids(payload: bytes) -> tuple[int, ...]:
    """Requested SqlInfo ids: packed (one bytes blob of varints — what
    proto3 encoders emit) or unpacked (repeated varint fields) both
    decode; no field means "all"."""
    f = parse_fields(payload)
    out: list[int] = []
    for v in f.get(1, []):
        if isinstance(v, int):
            out.append(v)
        else:
            i = 0
            while i < len(v):
                n, i = _read_varint(v, i)
                out.append(n)
    return tuple(out)


def str_field(payload: bytes, num: int = 1) -> str:
    # proto3 encoders OMIT default-valued fields: an empty query /
    # handle arrives as a missing field, not an empty one — decode to
    # "" instead of raising KeyError at the handler
    return parse_fields(payload).get(num, [b""])[0].decode()


def bytes_field(payload: bytes, num: int = 1) -> bytes:
    return parse_fields(payload).get(num, [b""])[0]
