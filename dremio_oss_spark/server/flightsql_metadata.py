"""FlightSQL catalog-metadata result builders.

Reference: `services/arrow-flight/.../DremioFlightProducer.java:567-584,
814` serves `CommandGetCatalogs` / `CommandGetDbSchemas` /
`CommandGetTables` / `CommandGetTableTypes` / `CommandGetSqlInfo` — the
commands a stock ADBC/JDBC FlightSQL client issues on CONNECT before any
statement runs.  Result schemas are the protocol's fixed
`FlightSqlProducer.Schemas.*` (public arrow-flight-sql); the reference's
answers (`FlightWorkManager.java:716,869,1228`,
`DremioFlightSqlInfoUtils.java:56`): catalogs stream ZERO rows and
catalog_name is NULL everywhere (Dremio reports catalogs unsupported —
`withSqlCatalogTerm("")`), db_schemas/tables come from the
INFORMATION_SCHEMA namespace with JDBC LIKE-pattern filters, table
types are the catalog-api TableType enum (information_schema.proto:127),
and SqlInfo is a dense-union keyed by the public SqlInfo ids.

Spark-first: everything answers from the engine's existing
INFORMATION_SCHEMA frames (metadata-sized collects), never a data scan.
"""

from __future__ import annotations

import re

import pyarrow as pa

# fixed result schemas (FlightSqlProducer.Schemas — public protocol)
GET_CATALOGS_SCHEMA = pa.schema(
    [pa.field("catalog_name", pa.utf8(), nullable=False)])
GET_DB_SCHEMAS_SCHEMA = pa.schema([
    pa.field("catalog_name", pa.utf8()),
    pa.field("db_schema_name", pa.utf8(), nullable=False),
])
GET_TABLE_TYPES_SCHEMA = pa.schema(
    [pa.field("table_type", pa.utf8(), nullable=False)])
_TABLES_FIELDS = [
    pa.field("catalog_name", pa.utf8()),
    pa.field("db_schema_name", pa.utf8()),
    pa.field("table_name", pa.utf8(), nullable=False),
    pa.field("table_type", pa.utf8(), nullable=False),
]
GET_TABLES_SCHEMA_NO_SCHEMA = pa.schema(_TABLES_FIELDS)
GET_TABLES_SCHEMA = pa.schema(
    _TABLES_FIELDS
    + [pa.field("table_schema", pa.binary(), nullable=False)])

# SqlInfo value: dense union, type ids 0..5 in protocol order
_SQL_INFO_VALUE_TYPE = pa.dense_union(
    [
        pa.field("string_value", pa.utf8()),
        pa.field("bool_value", pa.bool_()),
        pa.field("bigint_value", pa.int64()),
        pa.field("int32_bitmask", pa.int32()),
        pa.field("string_list", pa.list_(pa.utf8())),
        pa.field("int32_to_int32_list_map",
                 pa.map_(pa.int32(), pa.list_(pa.int32()))),
    ],
    type_codes=[0, 1, 2, 3, 4, 5],
)
GET_SQL_INFO_SCHEMA = pa.schema([
    pa.field("info_name", pa.uint32(), nullable=False),
    pa.field("value", _SQL_INFO_VALUE_TYPE, nullable=False),
])

# the catalog-api TableType enum minus UNKNOWN (information_schema
# .proto:127; FlightWorkManager.runGetTablesTypes filters UNKNOWN out)
TABLE_TYPES = ("TABLE", "SYSTEM_TABLE", "VIEW")

# public SqlInfo ids (FlightSql.proto) this server answers — the subset
# the reference's SqlInfoBuilder fills that has engine-side meaning
FLIGHT_SQL_SERVER_NAME = 0
FLIGHT_SQL_SERVER_VERSION = 1
FLIGHT_SQL_SERVER_ARROW_VERSION = 2
FLIGHT_SQL_SERVER_READ_ONLY = 3
FLIGHT_SQL_SERVER_SQL = 4
FLIGHT_SQL_SERVER_SUBSTRAIT = 5
SQL_DDL_CATALOG = 500
SQL_DDL_SCHEMA = 501
SQL_DDL_TABLE = 502
SQL_IDENTIFIER_CASE = 503
SQL_IDENTIFIER_QUOTE_CHAR = 504
SQL_QUOTED_IDENTIFIER_CASE = 505
SQL_ALL_TABLES_ARE_SELECTABLE = 506
SQL_NULL_ORDERING = 507
SQL_KEYWORDS = 508
SQL_NUMERIC_FUNCTIONS = 509
SQL_STRING_FUNCTIONS = 510
SQL_SYSTEM_FUNCTIONS = 511
SQL_DATETIME_FUNCTIONS = 512
SQL_SEARCH_STRING_ESCAPE = 513
SQL_SUPPORTS_CONVERT = 517


def sql_info_values(engine) -> dict[int, object]:
    """id -> python value; type drives the union branch (str -> 0,
    bool -> 1, int -> 2, list[str] -> 4)."""
    return {
        FLIGHT_SQL_SERVER_NAME: "dremio-oss-spark",
        FLIGHT_SQL_SERVER_VERSION: engine.spark.version,
        FLIGHT_SQL_SERVER_ARROW_VERSION: pa.__version__,
        FLIGHT_SQL_SERVER_READ_ONLY: False,
        FLIGHT_SQL_SERVER_SQL: True,
        FLIGHT_SQL_SERVER_SUBSTRAIT: False,
        SQL_DDL_CATALOG: False,   # no catalog DDL (catalogs unsupported,
        SQL_DDL_SCHEMA: False,    # same answers as the reference)
        SQL_DDL_TABLE: True,
        SQL_IDENTIFIER_CASE: 1,   # case-insensitive, stored as declared
        SQL_IDENTIFIER_QUOTE_CHAR: '"',
        SQL_QUOTED_IDENTIFIER_CASE: 1,
        SQL_ALL_TABLES_ARE_SELECTABLE: True,
        SQL_NULL_ORDERING: 2,     # nulls sorted at start (Spark default
        #                           NULLS FIRST for ASC)
        SQL_KEYWORDS: ["SELECT", "FROM", "WHERE", "GROUP", "ORDER",
                       "BY", "HAVING", "JOIN", "UNION", "LIMIT"],
        SQL_NUMERIC_FUNCTIONS: ["ABS", "CEILING", "FLOOR", "MOD",
                                "POWER", "ROUND", "SQRT", "TRUNCATE"],
        SQL_STRING_FUNCTIONS: ["CONCAT", "LENGTH", "LOWER", "LTRIM",
                               "REPLACE", "RTRIM", "SUBSTRING",
                               "TRIM", "UPPER"],
        SQL_SYSTEM_FUNCTIONS: ["USER", "SESSION_USER", "CURRENT_USER"],
        SQL_DATETIME_FUNCTIONS: ["CURRENT_DATE", "CURRENT_TIMESTAMP",
                                 "DATE_ADD", "DATE_TRUNC", "EXTRACT",
                                 "NOW"],
        SQL_SEARCH_STRING_ESCAPE: "\\",
        # java.sql.Types conversion map (the reference fills this from
        # ServerMeta convert support, DremioFlightSqlInfoUtils
        # .getSupportsConvert): numerics interconvert + to VARCHAR(12)
        SQL_SUPPORTS_CONVERT: {
            t: [4, -5, 6, 8, 3, 12]
            for t in (4, -5, 6, 8, 3)  # INTEGER BIGINT FLOAT DOUBLE DECIMAL
        },
    }


def _like_re(pattern: str | None) -> re.Pattern | None:
    """JDBC LIKE filter pattern (% any run, _ one char) -> regex."""
    if pattern is None or pattern == "":
        return None
    return re.compile(
        "^" + re.escape(pattern).replace("%", ".*").replace("_", ".")
        + "$")


def _catalog_rows(engine) -> list[tuple[str, str, str]]:
    """(db_schema_name, table_name, table_type) over the engine's
    INFORMATION_SCHEMA frame — one metadata-sized collect."""
    out = []
    for r in engine.information_schema_tables().collect():
        schema = r["table_schema"] or ""
        out.append((schema, r["table_name"], r["table_type"]))
    return sorted(out)


def get_catalogs_table(engine) -> pa.Table:
    # the reference streams ZERO catalog rows (catalogs unsupported)
    return GET_CATALOGS_SCHEMA.empty_table()


def get_table_types_table(engine) -> pa.Table:
    return pa.table({"table_type": list(TABLE_TYPES)},
                    schema=GET_TABLE_TYPES_SCHEMA)


def get_db_schemas_table(engine, catalog: str | None = None,
                         db_schema_filter_pattern: str | None = None
                         ) -> pa.Table:
    pat = _like_re(db_schema_filter_pattern)
    names = sorted({s for s, _, _ in _catalog_rows(engine)
                    if pat is None or pat.match(s)})
    return pa.table(
        {"catalog_name": pa.array([None] * len(names), pa.utf8()),
         "db_schema_name": pa.array(names, pa.utf8())},
        schema=GET_DB_SCHEMAS_SCHEMA)


def _table_ipc_schema(engine, schema_name: str, table_name: str) -> bytes:
    """Serialized Arrow IPC schema of one table (the include_schema
    payload a JDBC client renders as result-set metadata)."""
    try:
        name = (f"{schema_name}.{table_name}" if schema_name
                else table_name)
        df = engine.sql(f"select * from {name} limit 0")
        return df.toArrow().schema.serialize().to_pybytes()
    except Exception:  # noqa: BLE001 — dropped mid-listing / unresolvable
        return pa.schema([]).serialize().to_pybytes()


def get_tables_table(engine, catalog: str | None = None,
                     db_schema_filter_pattern: str | None = None,
                     table_name_filter_pattern: str | None = None,
                     table_types: tuple[str, ...] = (),
                     include_schema: bool = False) -> pa.Table:
    spat = _like_re(db_schema_filter_pattern)
    tpat = _like_re(table_name_filter_pattern)
    rows = [
        (s, t, ty) for s, t, ty in _catalog_rows(engine)
        if (spat is None or spat.match(s))
        and (tpat is None or tpat.match(t))
        and (not table_types or ty in table_types)
    ]
    cols = {
        "catalog_name": pa.array([None] * len(rows), pa.utf8()),
        "db_schema_name": pa.array([s for s, _, _ in rows], pa.utf8()),
        "table_name": pa.array([t for _, t, _ in rows], pa.utf8()),
        "table_type": pa.array([ty for _, _, ty in rows], pa.utf8()),
    }
    if not include_schema:
        return pa.table(cols, schema=GET_TABLES_SCHEMA_NO_SCHEMA)
    cols["table_schema"] = pa.array(
        [_table_ipc_schema(engine, s, t) for s, t, _ in rows],
        pa.binary())
    return pa.table(cols, schema=GET_TABLES_SCHEMA)


def get_sql_info_table(engine, ids: tuple[int, ...] = ()) -> pa.Table:
    """Dense-union SqlInfo rows; empty `ids` means everything served."""
    vals = sql_info_values(engine)
    keys = [i for i in (ids or sorted(vals)) if i in vals]
    # dense-union children: one array per branch, offsets point into
    # the branch that row's value landed in
    strings: list[str] = []
    bools: list[bool] = []
    ints: list[int] = []
    slists: list[list[str]] = []
    maps: list[list[tuple]] = []
    type_ids: list[int] = []
    offsets: list[int] = []
    for k in keys:
        v = vals[k]
        if isinstance(v, bool):
            type_ids.append(1)
            offsets.append(len(bools))
            bools.append(v)
        elif isinstance(v, int):
            type_ids.append(2)
            offsets.append(len(ints))
            ints.append(v)
        elif isinstance(v, list):
            type_ids.append(4)
            offsets.append(len(slists))
            slists.append(v)
        elif isinstance(v, dict):  # int32 -> list<int32> (branch 5)
            type_ids.append(5)
            offsets.append(len(maps))
            maps.append(sorted(v.items()))
        else:
            type_ids.append(0)
            offsets.append(len(strings))
            strings.append(str(v))
    value = pa.UnionArray.from_dense(
        pa.array(type_ids, pa.int8()),
        pa.array(offsets, pa.int32()),
        [
            pa.array(strings, pa.utf8()),
            pa.array(bools, pa.bool_()),
            pa.array(ints, pa.int64()),
            pa.array([], pa.int32()),
            pa.array(slists, pa.list_(pa.utf8())),
            pa.array(maps, pa.map_(pa.int32(), pa.list_(pa.int32()))),
        ],
        ["string_value", "bool_value", "bigint_value", "int32_bitmask",
         "string_list", "int32_to_int32_list_map"],
        [0, 1, 2, 3, 4, 5],
    )
    return pa.Table.from_arrays(
        [pa.array(keys, pa.uint32()), value], schema=GET_SQL_INFO_SCHEMA)


# foreign-key metadata commands: the reference answers with the fixed
# protocol schema and ZERO endpoints, and its stream handler raises
# UNIMPLEMENTED (DremioFlightProducer.java:621-661 — Dremio tracks no
# PK/FK constraints); same here
GET_KEYS_SCHEMA = pa.schema([
    pa.field("pk_catalog_name", pa.utf8()),
    pa.field("pk_db_schema_name", pa.utf8()),
    pa.field("pk_table_name", pa.utf8(), nullable=False),
    pa.field("pk_column_name", pa.utf8(), nullable=False),
    pa.field("fk_catalog_name", pa.utf8()),
    pa.field("fk_db_schema_name", pa.utf8()),
    pa.field("fk_table_name", pa.utf8(), nullable=False),
    pa.field("fk_column_name", pa.utf8(), nullable=False),
    pa.field("key_sequence", pa.int32(), nullable=False),
    pa.field("fk_key_name", pa.utf8()),
    pa.field("pk_key_name", pa.utf8()),
    pa.field("update_rule", pa.uint8(), nullable=False),
    pa.field("delete_rule", pa.uint8(), nullable=False),
])
GET_PRIMARY_KEYS_SCHEMA = pa.schema([
    pa.field("catalog_name", pa.utf8()),
    pa.field("db_schema_name", pa.utf8()),
    pa.field("table_name", pa.utf8(), nullable=False),
    pa.field("column_name", pa.utf8(), nullable=False),
    pa.field("key_sequence", pa.int32(), nullable=False),
    pa.field("key_name", pa.utf8()),
])

# GetXdbcTypeInfo result schema (FlightSqlProducer.Schemas
# .GET_TYPE_INFO_SCHEMA — the JDBC getTypeInfo row shape)
GET_TYPE_INFO_SCHEMA = pa.schema([
    pa.field("type_name", pa.utf8(), nullable=False),
    pa.field("data_type", pa.int32(), nullable=False),
    pa.field("column_size", pa.int32()),
    pa.field("literal_prefix", pa.utf8()),
    pa.field("literal_suffix", pa.utf8()),
    pa.field("create_params", pa.list_(
        pa.field("item", pa.utf8(), nullable=False))),
    pa.field("nullable", pa.int32(), nullable=False),
    pa.field("case_sensitive", pa.bool_(), nullable=False),
    pa.field("searchable", pa.int32(), nullable=False),
    pa.field("unsigned_attribute", pa.bool_()),
    pa.field("fixed_prec_scale", pa.bool_(), nullable=False),
    pa.field("auto_increment", pa.bool_()),
    pa.field("local_type_name", pa.utf8()),
    pa.field("minimum_scale", pa.int32()),
    pa.field("maximum_scale", pa.int32()),
    pa.field("sql_data_type", pa.int32(), nullable=False),
    pa.field("datetime_subcode", pa.int32()),
    pa.field("num_prec_radix", pa.int32()),
    pa.field("interval_precision", pa.int32()),
])

# (type_name, java.sql.Types code, column_size, prefix/suffix,
#  create_params, case_sensitive, radix) — the engine's SQL type
# surface, codes per java.sql.Types (the reference maps MinorType ->
# Types the same way, DremioFlightSqlInfoUtils.getSqlTypeFromMinorType)
_TYPE_INFO_ROWS = (
    ("BOOLEAN", 16, 1, None, None, [], False, None),
    ("INTEGER", 4, 10, None, None, [], False, 10),
    ("BIGINT", -5, 19, None, None, [], False, 10),
    ("FLOAT", 6, 7, None, None, [], False, 10),
    ("DOUBLE", 8, 15, None, None, [], False, 10),
    ("DECIMAL", 3, 38, None, None, ["precision", "scale"], False, 10),
    ("VARCHAR", 12, 65536, "'", "'", ["length"], True, None),
    ("VARBINARY", -3, 65536, None, None, ["length"], False, None),
    ("DATE", 91, 10, "DATE '", "'", [], False, None),
    ("TIMESTAMP", 93, 26, "TIMESTAMP '", "'", [], False, None),
)


def get_type_info_table(engine,
                        data_type: int | None = None) -> pa.Table:
    """CommandGetXdbcTypeInfo: one row per served SQL type, optionally
    filtered to a single java.sql.Types code (the request's data_type
    field) — FlightWorkManager.runGetTypeInfo's role."""
    rows = [r for r in _TYPE_INFO_ROWS
            if data_type is None or r[1] == data_type]
    cols = {
        "type_name": [r[0] for r in rows],
        "data_type": pa.array([r[1] for r in rows], pa.int32()),
        "column_size": pa.array([r[2] for r in rows], pa.int32()),
        "literal_prefix": [r[3] for r in rows],
        "literal_suffix": [r[4] for r in rows],
        "create_params": pa.array(
            [r[5] for r in rows],
            pa.list_(pa.field("item", pa.utf8(), nullable=False))),
        "nullable": pa.array([1] * len(rows), pa.int32()),
        "case_sensitive": [r[6] for r in rows],
        "searchable": pa.array([3] * len(rows), pa.int32()),
        "unsigned_attribute": pa.array([False] * len(rows), pa.bool_()),
        "fixed_prec_scale": [r[0] == "DECIMAL" for r in rows],
        "auto_increment": pa.array([False] * len(rows), pa.bool_()),
        "local_type_name": [r[0] for r in rows],
        "minimum_scale": pa.array(
            [0 if r[0] == "DECIMAL" else None for r in rows],
            pa.int32()),
        "maximum_scale": pa.array(
            [37 if r[0] == "DECIMAL" else None for r in rows],
            pa.int32()),
        "sql_data_type": pa.array([r[1] for r in rows], pa.int32()),
        "datetime_subcode": pa.array([None] * len(rows), pa.int32()),
        "num_prec_radix": pa.array([r[7] for r in rows], pa.int32()),
        "interval_precision": pa.array([None] * len(rows), pa.int32()),
    }
    return pa.table(cols, schema=GET_TYPE_INFO_SCHEMA)
