"""Dremio-only scalar functions as Spark SQL temporary functions + helpers.

Reference targets (dremio-oss):
- CONCAT null-as-empty: `exec/expr/fn/impl/StringFunctions.java:39`
  (Dremio CONCAT ignores NULL args instead of returning NULL).
- Masking: `exec/expr/fn/impl/MaskingFunctions.java` (HIVE_MASK family).
- Geo: `exec/expr/fn/impl/GeoFunctions.java` (geo_distance/nearby/beyond,
  st_geohash).
- Hash: `Hash32Functions.java`, `Hash64Functions.java`, HASHSHA256.
- CONVERT_FROM/TO codecs: `exec/expr/fn/impl/conv/` (json, utf8, base64,
  big-endian ints).
- KVGEN/MAPPIFY: `exec/expr/fn/impl/Mappify.java:36`.
- CONVERT_FROM(col,'JSON') plan-time schema discovery:
  `sabot/op/fromjson/ConvertFromJsonOperator.java:52` /
  `ConvertFromJsonConverter.java`.

Spark-first design: every shim that can be a pure SQL expression is
registered with `CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>`
(Spark 4 SQL scalar UDFs — inlined by Catalyst, whole-stage-codegen'd, no
Python in the executor path).  Only ST_GEOHASH needs Python (iterative
base-32 encode), implemented as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .datetime_fmt import dremio_to_spark_format

# --- SQL temporary functions (JVM-side, Catalyst-inlined) -----------------

_HAVERSINE = (
    "12742000.0 * asin(least(1.0d, sqrt("
    "pow(sin(radians(lat2 - lat1) / 2), 2) + "
    "cos(radians(lat1)) * cos(radians(lat2)) * "
    "pow(sin(radians(lon2 - lon1) / 2), 2))))"
)

_SQL_FUNCTIONS: dict[str, str] = {
    # Dremio GeoFunctions.java — haversine distance in meters (2R = 12742 km)
    "geo_distance": (
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) "
        f"RETURNS DOUBLE RETURN {_HAVERSINE}"
    ),
    "geo_nearby": (
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE, d DOUBLE) "
        f"RETURNS BOOLEAN RETURN {_HAVERSINE} <= d"
    ),
    "geo_beyond": (
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE, d DOUBLE) "
        f"RETURNS BOOLEAN RETURN {_HAVERSINE} > d"
    ),
    # MaskingFunctions.java — HIVE_MASK defaults: upper->X, lower->x, digit->n
    "hive_mask": "(s STRING) RETURNS STRING RETURN mask(s)",
    "hive_mask_first_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(mask(substring(s, 1, n)), coalesce(substring(s, n + 1), ''))"
    ),
    "hive_mask_last_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(coalesce(substring(s, 1, length(s) - n), ''), "
        "mask(substring(s, greatest(length(s) - n + 1, 1))))"
    ),
    "hive_mask_show_first_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(substring(s, 1, n), coalesce(mask(substring(s, n + 1)), ''))"
    ),
    "hive_mask_show_last_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(coalesce(mask(substring(s, 1, length(s) - n)), ''), "
        "substring(s, greatest(length(s) - n + 1, 1)))"
    ),
    "hive_mask_hash": "(s STRING) RETURNS STRING RETURN sha2(s, 256)",
    # Hash32/Hash64Functions.java — distribution-parity only (documented)
    "hash32": "(s STRING) RETURNS INT RETURN hash(s)",
    "hash64": "(s STRING) RETURNS BIGINT RETURN xxhash64(s)",
    "hashsha256": "(s STRING) RETURNS STRING RETURN sha2(s, 256)",
    # conv/ big-endian int codecs (4/8-byte two's-complement).  conv()
    # yields the UNSIGNED value; reconstruct the sign explicitly — a
    # plain bigint/int cast of a top-bit-set value overflows (throws
    # under Spark 4 ANSI mode).
    # Buffer length is checked like the reference (IntBEConvertFrom /
    # BigIntBEConvertFrom checkBufferLength): exactly 4/8 bytes or error —
    # a longer buffer would otherwise silently truncate, a shorter one
    # zero-pad.
    "convert_from_int_be": (
        "(b BINARY) RETURNS INT RETURN if(length(b) = 4, cast("
        "cast(conv(hex(b), 16, 10) as bigint) "
        "- if(cast(conv(hex(b), 16, 10) as bigint) >= 2147483648, "
        "4294967296, 0) as int), "
        "cast(raise_error(concat('convert_from_int_be: buffer must be "
        "exactly 4 bytes, got ', length(b))) as int))"
    ),
    "convert_to_int_be": (
        "(i INT) RETURNS BINARY RETURN unhex(lpad(hex(i & 4294967295), 8, '0'))"
    ),
    # 64-bit: split the 16-hex-char value into two 32-bit halves so no
    # intermediate exceeds bigint range; result = signed(hi)*2^32 + lo
    "convert_from_bigint_be": (
        "(b BINARY) RETURNS BIGINT RETURN if(length(b) = 8, "
        "(cast(conv(substring(lpad(hex(b), 16, '0'), 1, 8), 16, 10) as bigint)"
        " - if(cast(conv(substring(lpad(hex(b), 16, '0'), 1, 8), 16, 10) as bigint)"
        " >= 2147483648, 4294967296, 0)) * 4294967296"
        " + cast(conv(substring(lpad(hex(b), 16, '0'), 9, 8), 16, 10) as bigint), "
        "cast(raise_error(concat('convert_from_bigint_be: buffer must be "
        "exactly 8 bytes, got ', length(b))) as bigint))"
    ),
    "convert_to_bigint_be": (
        "(i BIGINT) RETURNS BINARY RETURN unhex(lpad(hex(i), 16, '0'))"
    ),
    "convert_from_utf8": "(b BINARY) RETURNS STRING RETURN decode(b, 'UTF-8')",
    "convert_to_utf8": "(s STRING) RETURNS BINARY RETURN encode(s, 'UTF-8')",
    "convert_to_base64": "(b BINARY) RETURNS STRING RETURN base64(b)",
    "convert_from_base64": "(s STRING) RETURNS BINARY RETURN unbase64(s)",
    # DremioSqlOperatorTable COL_LIKE — LIKE with a column-valued pattern
    "col_like": "(s STRING, pat STRING) RETURNS BOOLEAN RETURN s like pat",
    # SQL-standard SIMILAR TO (StringFunctions.java similar): the pattern
    # language is regex plus %/_ wildcards, anchored both ends — exactly
    # rlike after translating the two wildcards
    "similar_to": (
        "(s STRING, pat STRING) RETURNS BOOLEAN RETURN "
        "s rlike concat('^', replace(replace(pat, '%', '.*'), '_', '.'), '$')"
    ),
    # StringFunctions.java CONCAT null-as-empty, fixed arities for SQL use;
    # the variadic form is the Python helper dremio_concat()
    "concat2": (
        "(a STRING, b STRING) RETURNS STRING RETURN "
        "concat(coalesce(a, ''), coalesce(b, ''))"
    ),
    "concat3": (
        "(a STRING, b STRING, c STRING) RETURNS STRING RETURN "
        "concat(coalesce(a, ''), coalesce(b, ''), coalesce(c, ''))"
    ),
    # ContextFunctions.java: user identity + schema context
    "query_user": "() RETURNS STRING RETURN current_user()",
    "session_user_fn": "() RETURNS STRING RETURN current_user()",
    "current_schema_fn": "() RETURNS STRING RETURN current_database()",
    # split_part with Dremio 1-based semantics == Spark split_part (alias)
    "dremio_split_part": (
        "(s STRING, d STRING, n INT) RETURNS STRING RETURN split_part(s, d, n)"
    ),
    # ---- DremioSqlOperatorTable name-level parity shims ------------------
    # SQL UDFs can't overload, so each takes one representative type — the
    # reference generates these per-type from codegen templates too
    # (exec/expr/fn/impl/array/, ArrayFunctions.java:37).
    "array_avg": (
        "(a ARRAY<BIGINT>) RETURNS DOUBLE RETURN "
        "aggregate(a, cast(0 as bigint), (acc, x) -> acc + x)"
        " / cast(size(a) as double)"
    ),
    "array_sum": (
        "(a ARRAY<BIGINT>) RETURNS BIGINT RETURN "
        "aggregate(a, cast(0 as bigint), (acc, x) -> acc + x)"
    ),
    "array_cat": (
        "(a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> "
        "RETURN concat(a, b)"
    ),
    "array_concat": (
        "(a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> "
        "RETURN concat(a, b)"
    ),
    # value -> occurrence count (ArrayFrequency impl)
    "array_frequency": (
        "(a ARRAY<STRING>) RETURNS MAP<STRING, INT> RETURN "
        "map_from_entries(transform(array_distinct(a), "
        "v -> struct(v, cast(size(filter(a, x -> x <=> v)) as int))))"
    ),
    # exclusive stop like the reference; sequence() would count DOWN for
    # start >= stop, hence the guard
    "array_generate_range": (
        "(start BIGINT, stop BIGINT) RETURNS ARRAY<BIGINT> RETURN "
        "if(start >= stop, array(), sequence(start, stop - 1))"
    ),
    "array_intersection": (
        "(a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> "
        "RETURN array_intersect(a, b)"
    ),
    "array_length": "(a ARRAY<BIGINT>) RETURNS INT RETURN size(a)",
    # 0-based index like the reference's ARRAY_REMOVE_AT
    "array_remove_at": (
        "(a ARRAY<BIGINT>, i INT) RETURNS ARRAY<BIGINT> RETURN "
        "concat(slice(a, 1, i), "
        "slice(a, i + 2, greatest(size(a) - i - 1, 0)))"
    ),
    # 0-based from, exclusive to
    "array_slice": (
        "(a ARRAY<BIGINT>, f INT, t INT) RETURNS ARRAY<BIGINT> RETURN "
        "slice(a, f + 1, greatest(t - f, 0))"
    ),
    "array_to_string": (
        "(a ARRAY<BIGINT>, d STRING) RETURNS STRING RETURN "
        "array_join(transform(a, x -> cast(x as string)), d)"
    ),
    "list_to_delimited_string": (
        "(a ARRAY<STRING>, d STRING) RETURNS STRING RETURN array_join(a, d)"
    ),
    # SUBLIST(list, offset, length), 1-based like the reference
    "sublist": (
        "(a ARRAY<BIGINT>, f INT, c INT) RETURNS ARRAY<BIGINT> "
        "RETURN slice(a, f, c)"
    ),
    "set_union": (
        "(a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> "
        "RETURN array_union(a, b)"
    ),
    "empty_array": "() RETURNS ARRAY<BIGINT> RETURN array()",
    "bitwise_and": "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a & b",
    "regexp_col_like": (
        "(s STRING, pat STRING) RETURNS BOOLEAN RETURN s rlike pat"
    ),
    "regexp_split": (
        "(s STRING, pat STRING) RETURNS ARRAY<STRING> RETURN split(s, pat)"
    ),
    # MaskTransformers.java names without the HIVE_ prefix (same bodies)
    "mask_first_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(mask(substring(s, 1, n)), coalesce(substring(s, n + 1), ''))"
    ),
    "mask_last_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(coalesce(substring(s, 1, length(s) - n), ''), "
        "mask(substring(s, greatest(length(s) - n + 1, 1))))"
    ),
    "mask_show_first_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(substring(s, 1, n), coalesce(mask(substring(s, n + 1)), ''))"
    ),
    "mask_show_last_n": (
        "(s STRING, n INT) RETURNS STRING RETURN "
        "concat(coalesce(mask(substring(s, 1, length(s) - n)), ''), "
        "substring(s, greatest(length(s) - n + 1, 1)))"
    ),
    "mask_hash": "(s STRING) RETURNS STRING RETURN sha2(s, 256)",
    # *_UTC context family — the session is pinned to UTC (session.py),
    # so the plain current_* functions ARE the UTC variants; TIME has no
    # Spark type and follows the repo's TIME-as-millis policy (SURVEY
    # §7.2): millis since midnight UTC
    "current_date_utc": "() RETURNS DATE RETURN current_date()",
    "current_timestamp_utc": (
        "() RETURNS TIMESTAMP RETURN current_timestamp()"
    ),
    "current_time_utc": (
        "() RETURNS BIGINT RETURN "
        "unix_micros(current_timestamp()) % 86400000000 div 1000"
    ),
    "statement_timestamp": "() RETURNS TIMESTAMP RETURN current_timestamp()",
    "transaction_timestamp": (
        "() RETURNS TIMESTAMP RETURN current_timestamp()"
    ),
    "timeofday": (
        "() RETURNS STRING RETURN "
        "date_format(current_timestamp(), "
        "'EEE MMM dd HH:mm:ss.SSSSSS yyyy zzz')"
    ),
    "system_user": "() RETURNS STRING RETURN current_user()",
    "identity": "(x BIGINT) RETURNS BIGINT RETURN x",
    # numeric TRUNCATE(x, scale): toward zero (MathFunctions.java trunc)
    "truncate": (
        "(x DOUBLE, n INT) RETURNS DOUBLE RETURN "
        "if(x >= 0, floor(x * pow(10, n)) / pow(10, n), "
        "ceil(x * pow(10, n)) / pow(10, n))"
    ),
    "map_construct": (
        "(k STRING, v STRING) RETURNS MAP<STRING, STRING> RETURN map(k, v)"
    ),
    # KVGEN/MAPPIFY SQL-name forms (Mappify.java:36); the generic Column
    # helper is functions.shims.kvgen
    "kvgen": (
        "(m MAP<STRING, STRING>) RETURNS "
        "ARRAY<STRUCT<key: STRING, value: STRING>> RETURN map_entries(m)"
    ),
    "mappify": (
        "(m MAP<STRING, STRING>) RETURNS "
        "ARRAY<STRUCT<key: STRING, value: STRING>> RETURN map_entries(m)"
    ),
    # decode with replacement of malformed sequences (ConvertReplaceUTF8):
    # Spark's decode already substitutes U+FFFD for invalid bytes
    "convert_replaceutf8": (
        "(b BINARY, r STRING) RETURNS STRING RETURN "
        "replace(decode(b, 'UTF-8'), '\\uFFFD', r)"
    ),
    "convert_from_boolean_byte": (
        "(b BINARY) RETURNS BOOLEAN RETURN if(length(b) = 1, "
        "hex(b) <> '00', cast(raise_error('convert_from_boolean_byte: "
        "buffer must be exactly 1 byte') as boolean))"
    ),
    "convert_to_boolean_byte": (
        "(x BOOLEAN) RETURNS BINARY RETURN unhex(if(x, '01', '00'))"
    ),
    # ---- remaining @FunctionTemplate names (impl/ leaf functions) --------
    # StringFunctions.java translate3 == SQL TRANSLATE's 3-arg form
    "translate3": (
        "(s STRING, f STRING, t STRING) RETURNS STRING "
        "RETURN translate(s, f, t)"
    ),
    # similar(s, pat) — same semantics as the SIMILAR TO shim
    "similar": (
        "(s STRING, pat STRING) RETURNS BOOLEAN RETURN "
        "s rlike concat('^', replace(replace(pat, '%', '.*'), '_', '.'), '$')"
    ),
    "strpos": (
        "(s STRING, sub STRING) RETURNS INT RETURN locate(sub, s)"
    ),
    # toascii(in, charset): reinterpret bytes of `in` under `charset`
    "toascii": (
        "(s STRING, enc STRING) RETURNS STRING "
        "RETURN decode(encode(s, 'UTF-8'), enc)"
    ),
    # MathFunctions.java
    "bitwise_not": "(a BIGINT) RETURNS BIGINT RETURN ~a",
    # DateTypeFunctions.java
    "isdate": (
        "(s STRING) RETURNS BOOLEAN RETURN try_cast(s as timestamp) "
        "is not null"
    ),
    "yearweek": (
        # the ISO WEEK pairs with the ISO week-YEAR: Jan 1 2021 is week
        # 53 OF 2020, so year(d)*100 + week gave 202153 (no such week)
        "(d DATE) RETURNS INT RETURN "
        "extract(YEAROFWEEK FROM d) * 100 + weekofyear(d)"
    ),
    # MapFunctions.java last_matching_map_entry_for_key: the entry for a
    # key, as the (key, value) struct the reference yields, null if absent
    "last_matching_map_entry_for_key": (
        "(m MAP<STRING, STRING>, k STRING) RETURNS "
        "STRUCT<key: STRING, value: STRING> RETURN "
        "if(map_contains_key(m, k), "
        "named_struct('key', k, 'value', element_at(m, k)), "
        "cast(null as struct<key: string, value: string>))"
    ),
}


# ---- typed CONVERT_FROM/TO codec family (exec/expr/fn/impl/conv/) --------
# The reference registers one operator per (direction, type, byte order):
# CONVERT_FROMBIGINT, CONVERT_FROMBIGINT_BE, CONVERT_FROMDOUBLE, ... —
# generated here the same way its codegen templates generate them.
# Plain names are little-endian (Drill heritage); _BE big-endian.

def _hex_of(nbytes: int) -> str:
    return f"lpad(hex(b), {2 * nbytes}, '0')"


def _rev_pairs(nbytes: int, hexpr: str) -> str:
    """Byte-reverse a 2*nbytes hex string (LE <-> BE)."""
    parts = ", ".join(
        f"substring({hexpr}, {2 * i + 1}, 2)" for i in reversed(range(nbytes))
    )
    return f"concat({parts})"


def _signed32(hex_sql: str) -> str:
    u = f"cast(conv({hex_sql}, 16, 10) as bigint)"
    return f"({u} - if({u} >= 2147483648, 4294967296, 0))"


def _signed64(hex_sql: str) -> str:
    hi = f"cast(conv(substring({hex_sql}, 1, 8), 16, 10) as bigint)"
    lo = f"cast(conv(substring({hex_sql}, 9, 8), 16, 10) as bigint)"
    return (f"(({hi} - if({hi} >= 2147483648, 4294967296, 0)) "
            f"* 4294967296 + {lo})")


def _guard(nbytes: int, expr: str, rettype: str, fname: str) -> str:
    return (f"(b BINARY) RETURNS {rettype} RETURN if(length(b) = {nbytes}, "
            f"{expr}, cast(raise_error('{fname}: buffer must be exactly "
            f"{nbytes} bytes') as {rettype}))")


def _int_like_codecs() -> dict[str, str]:
    out: dict[str, str] = {}
    for be in (False, True):
        sfx = "_be" if be else ""
        h4 = _hex_of(4) if be else _rev_pairs(4, _hex_of(4))
        h8 = _hex_of(8) if be else _rev_pairs(8, _hex_of(8))
        s32, s64 = _signed32(h4), _signed64(h8)
        # raw ints (the existing *_be 4/8 byte pair stays authoritative
        # for BE; LE is the unsuffixed reference default)
        if not be:
            out["convert_from_int"] = _guard(
                4, f"cast({s32} as int)", "INT", "convert_from_int")
            out["convert_from_bigint"] = _guard(
                8, s64, "BIGINT", "convert_from_bigint")
            to4 = _rev_pairs(4, "lpad(hex(i & 4294967295), 8, '0')")
            to8 = _rev_pairs(8, "lpad(hex(i), 16, '0')")
            out["convert_to_int"] = (
                f"(i INT) RETURNS BINARY RETURN unhex({to4})")
            out["convert_to_bigint"] = (
                f"(i BIGINT) RETURNS BINARY RETURN unhex({to8})")
        # epoch-encoded temporals: 8-byte millis
        out[f"convert_from_timestamp_epoch{sfx}"] = _guard(
            8, f"timestamp_millis({s64})", "TIMESTAMP",
            f"convert_from_timestamp_epoch{sfx}")
        out[f"convert_from_date_epoch{sfx}"] = _guard(
            8, f"cast(timestamp_millis({s64}) as date)", "DATE",
            f"convert_from_date_epoch{sfx}")
        # TIME has no Spark type: millis-of-day (repo TIME-as-millis policy)
        out[f"convert_from_time_epoch{sfx}"] = _guard(
            8, s64, "BIGINT", f"convert_from_time_epoch{sfx}")
        to8ts = "lpad(hex(unix_millis(t)), 16, '0')"
        to8d = "lpad(hex(cast(unix_date(d) as bigint) * 86400000), 16, '0')"
        to8t = "lpad(hex(t), 16, '0')"
        if be:
            out["convert_to_timestamp_epoch_be"] = (
                f"(t TIMESTAMP) RETURNS BINARY RETURN unhex({to8ts})")
            out["convert_to_date_epoch_be"] = (
                f"(d DATE) RETURNS BINARY RETURN unhex({to8d})")
            out["convert_to_time_epoch_be"] = (
                f"(t BIGINT) RETURNS BINARY RETURN unhex({to8t})")
        else:
            out["convert_to_timestamp_epoch"] = (
                "(t TIMESTAMP) RETURNS BINARY RETURN "
                f"unhex({_rev_pairs(8, to8ts)})")
            out["convert_to_date_epoch"] = (
                "(d DATE) RETURNS BINARY RETURN "
                f"unhex({_rev_pairs(8, to8d)})")
            out["convert_to_time_epoch"] = (
                "(t BIGINT) RETURNS BINARY RETURN "
                f"unhex({_rev_pairs(8, to8t)})")
        # IEEE 754 floats via JVM bit reinterpretation (reflect round-trips
        # exactly: Double.toString/parse is lossless for any double)
        out[f"convert_from_double{sfx}"] = _guard(
            8, "cast(reflect('java.lang.Double', 'longBitsToDouble', "
               f"{s64}) as double)", "DOUBLE", f"convert_from_double{sfx}")
        out[f"convert_from_float{sfx}"] = _guard(
            4, "cast(reflect('java.lang.Float', 'intBitsToFloat', "
               f"cast({s32} as int)) as float)", "FLOAT",
            f"convert_from_float{sfx}")
        dbits = ("lpad(hex(cast(reflect('java.lang.Double', "
                 "'doubleToRawLongBits', x) as bigint)), 16, '0')")
        fbits = ("lpad(hex(cast(reflect('java.lang.Float', "
                 "'floatToRawIntBits', x) as bigint) & 4294967295), "
                 "8, '0')")
        out[f"convert_to_double{sfx}"] = (
            "(x DOUBLE) RETURNS BINARY RETURN unhex("
            + (dbits if be else _rev_pairs(8, dbits)) + ")")
        out[f"convert_to_float{sfx}"] = (
            "(x FLOAT) RETURNS BINARY RETURN unhex("
            + (fbits if be else _rev_pairs(4, fbits)) + ")")
    # Impala/parquet INT96 timestamps: 8-byte LE nanos-of-day + 4-byte LE
    # julian day.  _LOCALTIMEZONE differs only by session-zone rendering —
    # identical under this repo's pinned-UTC sessions (documented).
    nanos = _signed64(_rev_pairs(8, "lpad(hex(substring(b, 1, 8)), 16, '0')"))
    jday = _signed32(_rev_pairs(4, "lpad(hex(substring(b, 9, 4)), 8, '0')"))
    impala = (f"timestamp_micros(({jday} - 2440588) * 86400000000 "
              f"+ {nanos} div 1000)")
    for nm in ("convert_from_timestamp_impala",
               "convert_from_timestamp_impala_localtimezone"):
        out[nm] = _guard(12, impala, "TIMESTAMP", nm)
    return out


_SQL_FUNCTIONS.update(_int_like_codecs())

# reference-exact concatenated operator names (CONVERT_FROMBIGINT_BE etc.)
# alias the canonical convert_from_* shims
_SQL_FUNCTIONS.update({
    name.replace("convert_from_", "convert_from").replace(
        "convert_to_", "convert_to"): body
    for name, body in list(_SQL_FUNCTIONS.items())
    if name.startswith(("convert_from_", "convert_to_"))
})


def _st_geohash(lat: pd.Series, lon: pd.Series, precision: pd.Series) -> pd.Series:
    """Geohash base-32 encode (GeoFunctions.java st_geohash).

    Closed form: the classic bisection over lat/lon equals interleaving
    the bits of the floor-quantized coordinates (lon gets ceil(5p/2)
    bits, lat the rest).  The quantization runs in the SAME double
    expression the DuckDB oracle uses — `(coord+off)/span * 2^bits` —
    so engine and oracle agree bit-for-bit even for coordinates within
    one ulp of a cell boundary, where iterative bisection and the
    quantized form can legitimately disagree on which side wins.
    """
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def enc(la: float, lo: float, p: int) -> str | None:
        if la is None or lo is None or pd.isna(la) or pd.isna(lo):
            return None
        total = 5 * p
        lon_bits = (total + 1) // 2
        lat_bits = total // 2
        lonq = min(int((lo + 180.0) / 360.0 * (1 << lon_bits)),
                   (1 << lon_bits) - 1)
        latq = min(int((la + 90.0) / 180.0 * (1 << lat_bits)),
                   (1 << lat_bits) - 1)
        out = []
        for c in range(p):
            idx = 0
            for j in range(5):
                g = 5 * c + j
                if g % 2 == 0:
                    bit = (lonq >> (lon_bits - 1 - g // 2)) & 1
                else:
                    bit = (latq >> (lat_bits - 1 - (g - 1) // 2)) & 1
                idx = idx * 2 + bit
            out.append(b32[idx])
        return "".join(out)

    return pd.Series(
        [enc(la, lo, int(p)) for la, lo, p in zip(lat, lon, precision)]
    )


def _vlong_encode(v: int) -> bytes:
    """Hadoop WritableUtils.writeVLong wire format (conv/ *_HADOOPV)."""
    if -112 <= v <= 127:
        return bytes([v & 0xFF])
    ln = -112
    u = v
    if v < 0:
        u = ~v
        ln = -120
    tmp = u
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    n = -(ln + 112) if ln >= -120 else -(ln + 120)
    return bytes([ln & 0xFF]) + u.to_bytes(n, "big")


def _vlong_decode(b: bytes) -> int:
    first = b[0] if b[0] < 128 else b[0] - 256
    if first >= -112:
        return first
    neg = first < -120
    n = -(first + 120) if neg else -(first + 112)
    u = int.from_bytes(b[1:1 + n], "big")
    return ~u if neg else u


def _hadoopv_udfs():
    """convert_{from,to}_{int,bigint}_hadoopv as Arrow-batched pandas
    UDFs (the format is iterative — no closed-form SQL expression)."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType

    def dec(vs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else _vlong_decode(bytes(v)) for v in vs]
        )

    def enc(vs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else _vlong_encode(int(v)) for v in vs]
        )

    return {
        "convert_from_int_hadoopv": pandas_udf(dec, IntegerType()),
        "convert_from_bigint_hadoopv": pandas_udf(dec, LongType()),
        "convert_to_int_hadoopv": pandas_udf(enc, BinaryType()),
        "convert_to_bigint_hadoopv": pandas_udf(enc, BinaryType()),
    }


def _normalize_string_udf():
    """StringFunctions.java normalize_string: Unicode NFC normalization
    (no Spark native; unicodedata is the exact library impl)."""
    import unicodedata

    from pyspark.sql.types import StringType

    def f(vs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else unicodedata.normalize("NFC", v)
             for v in vs]
        )

    return pandas_udf(f, StringType())


# pandas-udf-backed shim names (registered on demand like st_geohash)
_PANDAS_SHIMS = frozenset(
    {"st_geohash", "normalize_string"}
    | set(_hadoopv_udfs())
    | {n.replace("_from_", "_from").replace("_to_", "_to")
       for n in _hadoopv_udfs()}
)

_REGISTERED: dict[int, set[str]] = {}


def register_all(spark: SparkSession, names=None) -> None:
    """Register shims in the session's function registry.

    Each CREATE FUNCTION is a sequential py4j DDL round-trip (~60 ms), so
    the full ~65-entry table costs ~4 s per fresh session — `names` lets
    Engine._ensure_shims register only the functions a statement actually
    references. Idempotent per (session, name): repeat calls (every query
    fn calls this defensively) re-issue nothing.
    """
    # keyed ON the session object (id() of a GC'd session can be
    # recycled for a new one, silently skipping registration there)
    try:
        done = spark.__dict__.setdefault("_dremio_shims_done", set())
    except (AttributeError, TypeError):  # pragma: no cover — frozen obj
        done = _REGISTERED.setdefault(id(spark), set())
    want = set(_SQL_FUNCTIONS) if names is None else (
        {n for n in names if n in _SQL_FUNCTIONS}
    )
    for name in want - done:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{_SQL_FUNCTIONS[name]}")
    done.update(want)
    pandas_want = (_PANDAS_SHIMS if names is None
                   else _PANDAS_SHIMS & set(names)) - done
    if pandas_want:
        from pyspark.sql.types import StringType

        udfs = _hadoopv_udfs()
        udfs.update({n.replace("_from_", "_from").replace("_to_", "_to"): u
                     for n, u in _hadoopv_udfs().items()})
        udfs["st_geohash"] = pandas_udf(_st_geohash, StringType())
        udfs["normalize_string"] = _normalize_string_udf()
        for n in pandas_want:
            spark.udf.register(n, udfs[n])
        done.update(pandas_want)


# --- Column helpers (plan-time compositions) ------------------------------


def dremio_concat(*cols: Column | str) -> Column:
    """Variadic CONCAT with Dremio null-as-empty semantics.

    concat_ws('') skips NULL inputs entirely, which is exactly the
    reference behavior (StringFunctions.java concat ignores nulls).
    """
    return F.concat_ws(
        "", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    )


def kvgen(col: Column | str) -> Column:
    """KVGEN/MAPPIFY (Mappify.java:36): map -> array<struct<key,value>>."""
    return F.map_entries(F.col(col) if isinstance(col, str) else col)


def single_value(col: Column | str) -> Column:
    """SINGLE_VALUE aggregate (codegen/templates/
    SingleValueAggregateFunctions.java): returns the group's one value,
    errors if the group holds more than one row — the guard the scalar
    -subquery rewrite relies on.  Expressed as a conditional over two
    built-in aggregates so it stays JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.count(F.lit(1)) <= 1, F.first(c)
    ).otherwise(
        F.expr(
            "raise_error('SINGLE_VALUE: subqueries used in expressions "
            "must return a single value')"
        )
    )


def hll(col: Column | str) -> Column:
    """HLL(col) -> binary sketch (HyperLogLog.java:28 NDV_FUNCTION/HLL;
    Spark's Datasketches-backed hll_sketch_agg)."""
    return F.hll_sketch_agg(F.col(col) if isinstance(col, str) else col)


def hll_merge(col: Column | str) -> Column:
    """HLL_MERGE(sketch_col): merge partial sketches into one
    (HyperLogLog.java HLL_MERGE aggregate over sketch buffers)."""
    return F.hll_union_agg(F.col(col) if isinstance(col, str) else col)


def hll_decode(col: Column | str) -> Column:
    """HLL_DECODE(sketch) -> cardinality estimate
    (HyperLogLog.java HLL_DECODE scalar)."""
    return F.hll_sketch_estimate(F.col(col) if isinstance(col, str) else col)


def to_char(col: Column | str, fmt: str) -> Column:
    """TO_CHAR(datetime, fmt) with Dremio-style format tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, dremio_to_spark_format(fmt))


def to_date_fmt(col: Column | str, fmt: str) -> Column:
    """TO_DATE(str, fmt) with Dremio-style format tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, dremio_to_spark_format(fmt))


def to_timestamp_fmt(col: Column | str, fmt: str) -> Column:
    """TO_TIMESTAMP(str, fmt) with Dremio-style format tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, dremio_to_spark_format(fmt))


def convert_from_json(
    df: DataFrame, col: str, out: str = "parsed", sample: int = 200
) -> DataFrame:
    """CONVERT_FROM(col, 'JSON') with plan-time schema discovery.

    Mirrors ConvertFromJsonConverter.java: sample the column at *plan*
    time (tiny, driver-side — bounded by `sample` rows, never the full
    table), infer a schema with spark.read.json, then evaluate
    `from_json` distributed with the fixed schema.  At 100 TB the scan
    that matters runs with the inferred schema fully JVM-side.
    """
    strings = [
        r[0]
        for r in df.select(col).where(F.col(col).isNotNull()).limit(sample).collect()
    ]
    if not strings:
        return df.withColumn(out, F.lit(None).cast("string"))
    schema = spark_schema_of_json(df.sparkSession, strings)
    return df.withColumn(out, F.from_json(F.col(col), schema))


def spark_schema_of_json(spark: SparkSession, samples: list[str]):
    """Infer a unified schema from JSON sample strings.

    Pure driver-side merge over <= a few hundred strings (no Spark job —
    the RDD-based spark.read.json inference costs a full py4j round trip
    and a job launch, ~3 s of pure overhead per call).  Type lattice
    mirrors Spark's JSON inference: bool < long < double < string;
    conflicting object/array/scalar shapes widen to string.
    """
    import json as _json

    from pyspark.sql import types as T

    def infer(v):
        if v is None:
            return T.NullType()
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, str):
            return T.StringType()
        if isinstance(v, list):
            elem: T.DataType = T.NullType()
            for x in v:
                elem = merge(elem, infer(x))
            return T.ArrayType(elem if not isinstance(elem, T.NullType) else T.StringType())
        if isinstance(v, dict):
            return T.StructType(
                [T.StructField(k, infer(x), True) for k, x in sorted(v.items())]
            )
        return T.StringType()

    def merge(a: "T.DataType", b: "T.DataType") -> "T.DataType":
        if isinstance(a, T.NullType):
            return b
        if isinstance(b, T.NullType) or a == b:
            return a
        num = {T.BooleanType: 0, T.LongType: 1, T.DoubleType: 2}
        if type(a) in num and type(b) in num:
            order = [T.BooleanType, T.LongType, T.DoubleType]
            return order[max(num[type(a)], num[type(b)])]()
        if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
            return T.ArrayType(merge(a.elementType, b.elementType))
        if isinstance(a, T.StructType) and isinstance(b, T.StructType):
            fields = {f.name: f.dataType for f in a.fields}
            for f in b.fields:
                fields[f.name] = (
                    merge(fields[f.name], f.dataType) if f.name in fields else f.dataType
                )
            return T.StructType(
                [T.StructField(k, t, True) for k, t in sorted(fields.items())]
            )
        return T.StringType()

    merged: "T.DataType" = T.NullType()
    for s in samples:
        try:
            merged = merge(merged, infer(_json.loads(s)))
        except (ValueError, TypeError):
            continue
    if isinstance(merged, T.NullType):
        merged = T.StructType([])
    return merged
