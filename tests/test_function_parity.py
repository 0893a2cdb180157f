"""Name-level parity sweep over the reference's SQL operator table.

The pinned list below is every function name registered in
`sabot/kernel/src/main/java/com/dremio/exec/planner/sql/
DremioSqlOperatorTable.java` (the reference's dialect-level function
surface — the ~402 @FunctionTemplate impls sit underneath these plus the
standard-SQL names Calcite provides).  Each entry maps the reference name
to a probe expression that must evaluate through `Engine.sql`, via a
Spark built-in of the same name, a registered shim, or an engine-level
rewrite.  Names that are internal plumbing in the reference (never
user-callable) are in SKIP with the reason asserted.
"""

from __future__ import annotations

import pytest

from dremio_oss_spark.engine import Engine

# reference name -> probe expression (evaluates to a non-error value)
PROBES: dict[str, str] = {
    "ARRAYS_OVERLAP": "arrays_overlap(array(1, 2), array(2, 3))",
    "ARRAY_AGG": "(select array_agg(c) from (values (1), (2)) t(c))",
    "ARRAY_APPEND": "array_append(array(1L), 2L)",
    "ARRAY_AVG": "array_avg(array(1L, 2L, 3L))",
    "ARRAY_CAT": "array_cat(array(1L), array(2L))",
    "ARRAY_COMPACT": "array_compact(array(1, null, 2))",
    "ARRAY_CONCAT": "array_concat(array(1L), array(2L))",
    "ARRAY_CONTAINS": "array_contains(array(1, 2), 2)",
    "ARRAY_DISTINCT": "array_distinct(array(1, 1, 2))",
    "ARRAY_FREQUENCY": "array_frequency(array('a', 'b', 'a'))",
    "ARRAY_GENERATE_RANGE": "array_generate_range(1L, 4L)",
    "ARRAY_INSERT": "array_insert(array(1, 3), 2, 2)",
    "ARRAY_INTERSECTION": "array_intersection(array(1L, 2L), array(2L))",
    "ARRAY_LENGTH": "array_length(array(1L, 2L))",
    "ARRAY_MAX": "array_max(array(1, 9, 2))",
    "ARRAY_MIN": "array_min(array(1, 9, 2))",
    "ARRAY_POSITION": "array_position(array(3, 1), 1)",
    "ARRAY_PREPEND": "array_prepend(array(2L), 1L)",
    "ARRAY_REMOVE": "array_remove(array(1, 2, 1), 1)",
    "ARRAY_REMOVE_AT": "array_remove_at(array(1L, 2L, 3L), 1)",
    "ARRAY_SIZE": "array_size(array(1, 2))",
    "ARRAY_SLICE": "array_slice(array(1L, 2L, 3L, 4L), 1, 3)",
    "ARRAY_SORT": "array_sort(array(3, 1, 2))",
    "ARRAY_SUM": "array_sum(array(1L, 2L))",
    "ARRAY_TO_STRING": "array_to_string(array(1L, 2L), ',')",
    "BITWISE_AND": "bitwise_and(12L, 10L)",
    "BTRIM": "btrim('  x  ')",
    "CARDINALITY": "cardinality(array(1, 2))",
    "COL_LIKE": "col_like('abc', 'a%')",
    "CONCAT": "concat('a', 'b')",
    "CURRENT_DATE_UTC": "current_date_utc()",
    "CURRENT_TIMESTAMP_UTC": "current_timestamp_utc()",
    "CURRENT_TIME_UTC": "current_time_utc()",
    "DATE_TRUNC": "date_trunc('MONTH', timestamp'2024-03-15 10:00:00')",
    "DAY": "day(date'2024-03-15')",
    "DAYOFMONTH": "dayofmonth(date'2024-03-15')",
    "E": "e()",
    "EMPTY_ARRAY": "empty_array()",
    "GEO_BEYOND": "geo_beyond(0d, 0d, 1d, 1d, 1000d)",
    "GEO_DISTANCE": "geo_distance(0d, 0d, 1d, 1d)",
    "GEO_NEARBY": "geo_nearby(0d, 0d, 1d, 1d, 1000d)",
    "HASH": "hash('x')",
    "HASHSHA256": "hashsha256('x')",
    "HOUR": "hour(timestamp'2024-03-15 10:11:12')",
    "IDENTITY": "identity(42L)",
    "IS_MEMBER": "is_member('admin')",
    "KVGEN": "kvgen(map('a', 'b'))",
    "LAST_QUERY_ID": "last_query_id()",
    "LENGTH": "length('abc')",
    "LIST_TO_DELIMITED_STRING": (
        "list_to_delimited_string(array('a', 'b'), ',')"
    ),
    "LOG": "log(2, 8)",
    "LOG2": "log2(8)",
    "LPAD": "lpad('x', 3, '0')",
    "LTRIM": "ltrim('  x')",
    "MAP": "map('k', 'v')",
    "MAPPIFY": "mappify(map('a', 'b'))",
    "MAP_CONSTRUCT": "map_construct('k', 'v')",
    "MAP_KEYS": "map_keys(map('k', 'v'))",
    "MAP_VALUES": "map_values(map('k', 'v'))",
    "MASK": "mask('Ab1')",
    "MASK_FIRST_N": "mask_first_n('Ab1xy', 3)",
    "MASK_HASH": "mask_hash('x')",
    "MASK_LAST_N": "mask_last_n('Ab1xy', 3)",
    "MASK_SHOW_FIRST_N": "mask_show_first_n('Ab1xy', 3)",
    "MASK_SHOW_LAST_N": "mask_show_last_n('Ab1xy', 3)",
    "MEDIAN": "(select median(c) from (values (1), (2), (3)) t(c))",
    "MINUTE": "minute(timestamp'2024-03-15 10:11:12')",
    "MONTH": "month(date'2024-03-15')",
    "NEXT_DAY": "next_day(date'2024-03-15', 'MON')",
    "NOW": "now()",
    "QUERY_USER": "query_user()",
    "RAND": "rand()",
    "REGEXP_COL_LIKE": "regexp_col_like('abc', 'a.c')",
    "REGEXP_LIKE": "regexp_like('abc', 'a.c')",
    "REGEXP_SPLIT": "regexp_split('a1b2c', '[0-9]')",
    "REPEAT": "repeat('ab', 2)",
    "REPLACE": "replace('aaa', 'a', 'b')",
    "ROUND": "round(1.55, 1)",
    "RPAD": "rpad('x', 3, '0')",
    "RTRIM": "rtrim('x  ')",
    "SECOND": "second(timestamp'2024-03-15 10:11:12')",
    "SESSION_USER": "session_user()",
    "SET_UNION": "set_union(array(1L, 2L), array(2L, 3L))",
    "SPACE": "space(3)",
    "STATEMENT_TIMESTAMP": "statement_timestamp()",
    "SUBLIST": "sublist(array(1L, 2L, 3L), 2, 2)",
    "SYSTEM_USER": "system_user()",
    "TIMEOFDAY": "timeofday()",
    "TRANSACTION_TIMESTAMP": "transaction_timestamp()",
    "TRIM": "trim('  x  ')",
    "TRUNC": "trunc(date'2024-03-15', 'MM')",
    "TRUNCATE": "truncate(1.567d, 1)",
    "TYPEOF": "typeof(1.5d)",
    "UNIX_TIMESTAMP": "unix_timestamp(timestamp'2024-03-15 10:00:00')",
    "USER": "user()",
    "YEAR": "year(date'2024-03-15')",
    # -- aggregates / sketches --------------------------------------------
    "APPROX_PERCENTILE": (
        "(select approx_percentile(c, 0.5) from (values (1), (2)) t(c))"
    ),
    "NDV": "(select ndv(c) from (values (1), (2), (2)) t(c))",
    "TDIGEST_QUANTILE": (
        "(select tdigest_quantile(c, 0.5) from (values (1), (2)) t(c))"
    ),
    "HLL": "(select hex(hll(c)) from (values (1), (2)) t(c))",
    "HLL_MERGE": (
        "(select cast(hll_decode(hll_merge(s)) as bigint) from "
        "(select hll(c) as s from (values (1), (2), (3)) t(c) "
        "group by c % 2) u)"
    ),
    "HLL_DECODE": (
        "(select cast(hll_decode(hll(c)) as bigint) "
        "from (values (1), (2)) t(c))"
    ),
    # -- misc scalar operators --------------------------------------------
    "DATE_PART": "date_part('YEAR', date'2024-03-15')",
    "FLATTEN": "select flatten(array(1, 2)) as v",
    "LAST_MATCHING_MAP_ENTRY_FOR_KEY": (
        "last_matching_map_entry_for_key(map('a', 'b'), 'a').value"
    ),
    "HIVE_MASK": "hive_mask('Ab1')",
    "HIVE_MASK_FIRST_N": "hive_mask_first_n('Ab1xy', 3)",
    "HIVE_MASK_HASH": "hive_mask_hash('x')",
    "HIVE_MASK_LAST_N": "hive_mask_last_n('Ab1xy', 3)",
    "HIVE_MASK_SHOW_FIRST_N": "hive_mask_show_first_n('Ab1xy', 3)",
    "HIVE_MASK_SHOW_LAST_N": "hive_mask_show_last_n('Ab1xy', 3)",
    # -- CONVERT_FROM/TO codec family (exec/expr/fn/impl/conv/) -----------
    # round-trips probe decode(encode(v)) == v through the exact
    # reference operator names
    "CONVERT_FROM": "convert_from(convert_to('ab', 'UTF8'), 'UTF8')",
    "CONVERT_TO": "hex(convert_to('ab', 'UTF8'))",
    "CONVERT_FROMUTF8": "convert_fromutf8(convert_toutf8('x'))",
    "CONVERT_TOUTF8": "hex(convert_toutf8('x'))",
    "CONVERT_REPLACEUTF8": (
        "convert_replaceutf8(convert_toutf8('x'), '?')"
    ),
    "CONVERT_TOBASE64": "convert_tobase64(convert_toutf8('x'))",
    "CONVERT_FROMINT": "convert_fromint(convert_toint(-7))",
    "CONVERT_TOINT": "hex(convert_toint(-7))",
    "CONVERT_FROMINT_BE": "convert_fromint_be(convert_toint_be(-7))",
    "CONVERT_TOINT_BE": "hex(convert_toint_be(-7))",
    "CONVERT_FROMINT_HADOOPV": (
        "convert_fromint_hadoopv(convert_toint_hadoopv(-300))"
    ),
    "CONVERT_TOINT_HADOOPV": "hex(convert_toint_hadoopv(-300))",
    "CONVERT_FROMBIGINT": "convert_frombigint(convert_tobigint(-9e9))",
    "CONVERT_TOBIGINT": "hex(convert_tobigint(-9000000000))",
    "CONVERT_FROMBIGINT_BE": (
        "convert_frombigint_be(convert_tobigint_be(-9000000000))"
    ),
    "CONVERT_TOBIGINT_BE": "hex(convert_tobigint_be(-9000000000))",
    "CONVERT_FROMBIGINT_HADOOPV": (
        "convert_frombigint_hadoopv(convert_tobigint_hadoopv(123456789012))"
    ),
    "CONVERT_TOBIGINT_HADOOPV": "hex(convert_tobigint_hadoopv(9))",
    "CONVERT_FROMBOOLEAN_BYTE": (
        "convert_fromboolean_byte(convert_toboolean_byte(true))"
    ),
    "CONVERT_TOBOOLEAN_BYTE": "hex(convert_toboolean_byte(false))",
    "CONVERT_FROMDOUBLE": "convert_fromdouble(convert_todouble(3.5d))",
    "CONVERT_TODOUBLE": "hex(convert_todouble(3.5d))",
    "CONVERT_FROMDOUBLE_BE": (
        "convert_fromdouble_be(convert_todouble_be(-2.5e-300))"
    ),
    "CONVERT_TODOUBLE_BE": "hex(convert_todouble_be(1.0d))",
    "CONVERT_FROMFLOAT": (
        "convert_fromfloat(convert_tofloat(cast(1.5 as float)))"
    ),
    "CONVERT_TOFLOAT": "hex(convert_tofloat(cast(1.5 as float)))",
    "CONVERT_FROMFLOAT_BE": (
        "convert_fromfloat_be(convert_tofloat_be(cast(-2.25 as float)))"
    ),
    "CONVERT_TOFLOAT_BE": "hex(convert_tofloat_be(cast(0.5 as float)))",
    "CONVERT_FROMDATE_EPOCH": (
        "convert_fromdate_epoch(convert_todate_epoch(date'2024-03-15'))"
    ),
    "CONVERT_TODATE_EPOCH": "hex(convert_todate_epoch(date'2024-03-15'))",
    "CONVERT_FROMDATE_EPOCH_BE": (
        "convert_fromdate_epoch_be("
        "convert_todate_epoch_be(date'2024-03-15'))"
    ),
    "CONVERT_TODATE_EPOCH_BE": (
        "hex(convert_todate_epoch_be(date'2024-03-15'))"
    ),
    "CONVERT_FROMTIME_EPOCH": (
        "convert_fromtime_epoch(convert_totime_epoch(34567890))"
    ),
    "CONVERT_TOTIME_EPOCH": "hex(convert_totime_epoch(34567890))",
    "CONVERT_FROMTIME_EPOCH_BE": (
        "convert_fromtime_epoch_be(convert_totime_epoch_be(34567890))"
    ),
    "CONVERT_TOTIME_EPOCH_BE": "hex(convert_totime_epoch_be(34567890))",
    "CONVERT_FROMTIMESTAMP_EPOCH": (
        "convert_fromtimestamp_epoch(convert_totimestamp_epoch("
        "timestamp'2024-03-15 10:11:12'))"
    ),
    "CONVERT_TOTIMESTAMP_EPOCH": (
        "hex(convert_totimestamp_epoch(timestamp'2024-03-15 10:11:12'))"
    ),
    "CONVERT_FROMTIMESTAMP_EPOCH_BE": (
        "convert_fromtimestamp_epoch_be(convert_totimestamp_epoch_be("
        "timestamp'2024-03-15 10:11:12'))"
    ),
    "CONVERT_TOTIMESTAMP_EPOCH_BE": (
        "hex(convert_totimestamp_epoch_be(timestamp'2024-03-15 10:11:12'))"
    ),
    # INT96: 8-byte LE nanos-of-day + 4-byte LE julian day 2460311
    # (2024-01-01)
    "CONVERT_FROMTIMESTAMP_IMPALA": (
        "cast(convert_fromtimestamp_impala("
        "unhex('0000000000000000878a2500')) as string)"
    ),
    "CONVERT_FROMTIMESTAMP_IMPALA_LOCALTIMEZONE": (
        "cast(convert_fromtimestamp_impala_localtimezone("
        "unhex('0000000000000000878a2500')) as string)"
    ),
    "CONVERT_TOJSON": "convert_tojson(named_struct('a', 1))",
    "CONVERT_TOSIMPLEJSON": "convert_tosimplejson(named_struct('a', 1))",
    "CONVERT_TOCOMPACTJSON": "convert_tocompactjson(named_struct('a', 1))",
    "CONVERT_TOEXTENDEDJSON": (
        "convert_toextendedjson(named_struct('a', 1))"
    ),
}

# internal-only operators: registered in the table but not part of the
# user-facing SQL surface in the reference either
SKIP: dict[str, str] = {
    "DREMIO_INTERNAL_BUILDMAP": (
        "internal codegen helper for map literals, not user-callable"
    ),
    "MASK_INTERNAL": "internal transform backing the HIVE_MASK family",
    "HIVE_MASK_INTERNAL": "internal transform backing the HIVE_MASK family",
    "CONTAINS_OPERATOR": (
        "Lucene CONTAINS is elastic-pushdown-only in the reference "
        "(ContainsFunctions.java errors outside elastic); covered by the "
        "elastic connector's DSL tests"
    ),
    "LOCAL_LISTAGG": (
        "planner-internal partial phase of two-phase LISTAGG; Spark's "
        "partial_ collect_list is the same mechanism natively"
    ),
    "LISTAGG_MERGE": (
        "planner-internal merge phase of two-phase LISTAGG; Spark's "
        "merge_ collect_list is the same mechanism natively"
    ),
    "CONVERT_FROMJSON": (
        "plan-time schema-discovery operator, not a scalar: exposed as "
        "convert_from_json (fn_convert_from_json / op_json_to_struct "
        "oracle-checked queries)"
    ),
}


def test_reference_field_inventory_covered():
    """The PROBES+SKIP keys must cover every public operator field of
    DremioSqlOperatorTable.java (156 at the pinned reference revision) —
    guards against silently dropping names from this sweep."""
    assert len(PROBES) + len(SKIP) >= 156


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, register_functions=True)


def test_operator_table_fully_mapped():
    """Every DremioSqlOperatorTable name is either probed or skip-listed."""
    assert not set(PROBES) & set(SKIP)


@pytest.mark.parametrize("name", sorted(PROBES))
def test_reference_function_evaluates(engine, name):
    probe = PROBES[name]
    sql = (probe if probe.lstrip().lower().startswith("select")
           else f"select {probe} as v")
    rows = engine.sql(sql).collect()
    assert rows


def test_is_member_reflects_role_graph(engine):
    engine.session_user = "carol"
    try:
        assert not engine.sql("select is_member('admins') as v").first()["v"]
        engine.grant_role("admins", "carol")
        assert engine.sql("select is_member('admins') as v").first()["v"]
        # transitive: carol -> admins -> superusers
        engine.grant_role("superusers", "admins")
        assert engine.sql("select is_member('superusers') as v").first()["v"]
    finally:
        engine.session_user = "$dremio$"


def test_last_query_id_tracks_statements(engine):
    first = engine.sql("select 1").collect()
    assert first
    qid = engine.sql("select last_query_id() as v").first()["v"]
    assert qid and qid.startswith("q-")
    qid2 = engine.sql("select last_query_id() as v").first()["v"]
    assert qid2 != qid  # the probe itself advanced the statement counter
