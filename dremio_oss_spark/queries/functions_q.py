"""Function-shim coverage queries (SURVEY.md §2.7) with DuckDB oracles.

Each query exercises one Dremio-only function family from
dremio_oss_spark.functions against the driver's testdata, with the oracle
re-deriving the same values from first principles in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, load_events
from ..functions import convert_from_json, dremio_concat, kvgen, to_char
from ..functions.shims import register_all


# --------------------------------------------------------------------------
# CONCAT null-as-empty + HIVE_MASK family
# (reference: StringFunctions.java:39 concat; MaskingFunctions.java)
def concat_masking(spark: SparkSession, sf: str) -> DataFrame:
    register_all(spark, names=["hive_mask", "hive_mask_first_n",
                               "hive_mask_show_first_n", "hive_mask_hash"])
    return (
        load(spark, sf, "customer")
        .where(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            dremio_concat(
                "c_name",
                F.lit("-"),
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            ).alias("tagged"),
            F.expr("hive_mask(c_name)").alias("masked"),
            F.expr("hive_mask_first_n(c_name, 4)").alias("mask4"),
            F.expr("hive_mask_show_first_n(c_name, 4)").alias("show4"),
            F.expr("hive_mask_hash(c_mktsegment)").alias("phash"),
        )
        .orderBy("c_custkey")
    )


CONCAT_MASKING_SQL = r"""
select c_custkey,
       concat(coalesce(c_name,''), '-',
              coalesce(nullif(c_mktsegment,'BUILDING'),'')) as tagged,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]','X','g'), '[a-z]','x','g'), '[0-9]','n','g') as masked,
       concat(regexp_replace(regexp_replace(regexp_replace(substring(c_name,1,4),
           '[A-Z]','X','g'), '[a-z]','x','g'), '[0-9]','n','g'),
           coalesce(substring(c_name,5),'')) as mask4,
       concat(substring(c_name,1,4),
           coalesce(regexp_replace(regexp_replace(regexp_replace(substring(c_name,5),
               '[A-Z]','X','g'), '[a-z]','x','g'), '[0-9]','n','g'),'')) as show4,
       sha256(c_mktsegment) as phash
from customer
where c_custkey <= 500
order by c_custkey
"""


# --------------------------------------------------------------------------
# Geo functions (reference: GeoFunctions.java geo_distance/nearby/beyond)
def geo_functions(spark: SparkSession, sf: str) -> DataFrame:
    register_all(spark, names=["geo_distance", "geo_nearby", "geo_beyond"])
    return (
        load(spark, sf, "supplier")
        .select(
            "s_suppkey",
            (F.col("s_suppkey") % 80 - 40.0).alias("lat"),
            ((F.col("s_nationkey") * 13) % 340 - 170.0).alias("lon"),
        )
        .select(
            "s_suppkey",
            F.round(
                F.expr("geo_distance(lat, lon, 48.85d, 2.35d)") / 1000.0, 3
            ).alias("dist_km"),
            F.expr("geo_nearby(lat, lon, 48.85d, 2.35d, 5000000.0d)").alias(
                "within_5000km"
            ),
            F.expr("geo_beyond(lat, lon, 48.85d, 2.35d, 10000000.0d)").alias(
                "beyond_10000km"
            ),
        )
        .orderBy("s_suppkey")
    )


GEO_FUNCTIONS_SQL = """
with c as (
  select s_suppkey,
         cast(s_suppkey % 80 - 40.0 as double) as lat,
         cast((s_nationkey * 13) % 340 - 170.0 as double) as lon
  from supplier
), d as (
  select s_suppkey,
         12742000.0 * asin(least(1.0, sqrt(
             pow(sin(radians(48.85 - lat) / 2), 2) +
             cos(radians(lat)) * cos(radians(48.85)) *
             pow(sin(radians(2.35 - lon) / 2), 2)))) as dist_m
  from c
)
select s_suppkey,
       round(dist_m / 1000.0, 3) as dist_km,
       dist_m <= 5000000.0 as within_5000km,
       dist_m > 10000000.0 as beyond_10000km
from d
order by s_suppkey
"""


# --------------------------------------------------------------------------
# TO_CHAR with Dremio-style format tokens (DateToCharFunctions.java,
# DateFunctionsUtils.java format mapping)
def to_char_formats(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf)
    return (
        load(spark, sf, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            to_char("o_orderdate", "YYYY-MM-DD").alias("iso"),
            to_char("o_orderdate", "MON").alias("mon"),
            to_char("o_orderdate", "DY").alias("dy"),
            to_char("o_orderdate", 'YYYY"y"MM"m"').alias("lit_fmt"),
        )
        .join(
            ev.select(
                F.col("event_id").alias("o_orderkey"),
                to_char("ts", "HH24:MI:SS").alias("hms"),
            ),
            "o_orderkey",
            "left",
        )
        .orderBy("o_orderkey")
    )


TO_CHAR_SQL = """
select o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') as iso,
       strftime(o.o_orderdate, '%b') as mon,
       strftime(o.o_orderdate, '%a') as dy,
       strftime(o.o_orderdate, '%Yy%mm') as lit_fmt,
       strftime(e.ts, '%H:%M:%S') as hms
from orders o
left join events e on e.event_id = o.o_orderkey
where o.o_orderkey <= 2000
order by o.o_orderkey
"""


# --------------------------------------------------------------------------
# CONVERT_FROM/CONVERT_TO codecs (exec/expr/fn/impl/conv/)
def convert_codecs(spark: SparkSession, sf: str) -> DataFrame:
    register_all(spark, names=[
        "convert_from_int_be", "convert_to_int_be", "convert_from_bigint_be",
        "convert_to_bigint_be", "convert_from_utf8", "convert_to_utf8",
        "convert_to_base64", "convert_from_base64", "hashsha256"])
    return (
        load(spark, sf, "part")
        .where(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.expr(
                "convert_from_int_be(convert_to_int_be(cast(p_partkey as int)))"
            ).alias("int_rt"),
            F.expr("convert_from_bigint_be(convert_to_bigint_be(p_partkey))").alias(
                "bigint_rt"
            ),
            F.expr("convert_to_base64(convert_to_utf8(p_name))").alias("b64"),
            F.expr(
                "convert_from_utf8(convert_from_base64("
                "convert_to_base64(convert_to_utf8(p_name))))"
            ).alias("utf8_rt"),
            F.expr("hashsha256(p_name)").alias("sha"),
        )
        .orderBy("p_partkey")
    )


CONVERT_CODECS_SQL = """
select p_partkey,
       cast(p_partkey as int) as int_rt,
       p_partkey as bigint_rt,
       to_base64(encode(p_name)) as b64,
       p_name as utf8_rt,
       sha256(p_name) as sha
from part
where p_partkey <= 500
order by p_partkey
"""


# --------------------------------------------------------------------------
# CONVERT_FROM(col,'JSON') with plan-time schema discovery
# (ConvertFromJsonOperator.java:52)
def convert_from_json_q(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf)
    parsed = convert_from_json(ev, "props", out="parsed")
    return (
        parsed.select("event_id", F.col("parsed.k").alias("k"))
        .where(F.col("k").isNotNull())
        .orderBy("event_id")
    )


CONVERT_FROM_JSON_SQL = """
select event_id, cast(json_extract(props, '$.k') as bigint) as k
from events
where json_extract(props, '$.k') is not null
order by event_id
"""


# --------------------------------------------------------------------------
# KVGEN / MAPPIFY (Mappify.java:36)
def kvgen_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").where(F.col("doc_id") <= 300)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return (
        docs.select("doc_id", F.explode(kvgen(m)).alias("kv"))
        .select("doc_id", F.col("kv.key").alias("key"), F.col("kv.value").alias("value"))
        .orderBy("doc_id", "key")
    )


KVGEN_SQL = """
select doc_id, key, value from (
  select doc_id, 'lang' as key, lang as value from documents where doc_id <= 300
  union all
  select doc_id, 'source' as key, source as value from documents where doc_id <= 300
)
order by doc_id, key
"""


# --------------------------------------------------------------------------
# ARRAY_* gap functions (ArrayFunctions.java:37, exec/expr/fn/impl/array/):
# array_sum/array_avg/list_to_delimited_string/sublist/set_union/
# array_generate_range/array_compact — via Catalyst lambda expressions,
# no Python in the loop.
def _arr_str(c):
    """array<any> -> 'a,b,c' string (scalar-only final schemas)."""
    return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")


def array_gap_functions(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        load(spark, sf, "lineitem")
        .where(F.col("l_orderkey") < 400)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("lns"))
    )
    return g.select(
        "l_orderkey",
        F.aggregate("lns", F.lit(0), lambda a, x: a + x).alias("arr_sum"),
        F.round(
            F.aggregate(
                "lns", F.lit(0.0), lambda a, x: a + x.cast("double")
            )
            / F.size("lns"),
            6,
        ).alias("arr_avg"),
        F.array_join(F.transform("lns", lambda x: x.cast("string")), ",").alias(
            "delim"
        ),
        # array-valued intermediates are joined to strings for the final
        # schema: the driver's canonicalizer only hashes scalar cells
        _arr_str(F.slice("lns", 2, 2)).alias("sub"),
        _arr_str(
            F.array_sort(F.array_union("lns", F.array(F.lit(1), F.lit(9))))
        ).alias("set_un"),
        _arr_str(F.sequence(F.lit(1), F.size("lns"))).alias("gen_range"),
        _arr_str(
            F.filter(
                F.concat("lns", F.array(F.lit(None).cast("int"))),
                lambda x: x.isNotNull(),
            )
        ).alias("compacted"),
    ).orderBy("l_orderkey")


ARRAY_GAP_SQL = """
with g as (
  select l_orderkey, list_sort(list(l_linenumber)) as lns
  from lineitem where l_orderkey < 400 group by l_orderkey
)
select l_orderkey,
       cast(list_sum(lns) as int) as arr_sum,
       round(cast(list_sum(lns) as double) / len(lns), 6) as arr_avg,
       array_to_string(lns, ',') as delim,
       coalesce(array_to_string(lns[2:3], ','), '') as sub,
       array_to_string(list_sort(list_distinct(list_concat(lns, [1, 9]))), ',') as set_un,
       array_to_string(range(1, cast(len(lns) as int) + 1), ',') as gen_range,
       array_to_string(lns, ',') as compacted
from g
order by l_orderkey
"""


# --------------------------------------------------------------------------
# ST_GEOHASH (GeoFunctions.java st_geohash) — pandas-UDF shim.  DuckDB has
# no geohash builtin, but geohash IS closed-form: bisection over lat/lon
# equals interleaving the bits of floor-quantized coordinates (lon gets 23
# bits, lat 22 for 9 chars), so the oracle below derives the identical
# string arithmetically.  Golden vectors stay in tests/.
def _geohash_sql(lat_expr: str, lon_expr: str, precision: int = 9) -> str:
    """Generate the closed-form geohash expression for DuckDB."""
    total_bits = precision * 5
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lonq = f"cast(floor((({lon_expr}) + 180.0) / 360.0 * {1 << lon_bits}) as bigint)"
    latq = f"cast(floor((({lat_expr}) + 90.0) / 180.0 * {1 << lat_bits}) as bigint)"
    chars = []
    for c in range(precision):
        terms = []
        for j in range(5):
            g = 5 * c + j  # global bit position, 0 = MSB
            if g % 2 == 0:
                src, bit = "lonq", lon_bits - 1 - g // 2
            else:
                src, bit = "latq", lat_bits - 1 - (g - 1) // 2
            terms.append(f"(({src} >> {bit}) & 1) * {1 << (4 - j)}")
        idx = " + ".join(terms)
        chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', cast({idx} as int) + 1, 1)"
        )
    concat = " || ".join(chars)
    return f"(select {concat} from (select {lonq} as lonq, {latq} as latq))"


ST_GEOHASH_SQL = f"""
select s_suppkey,
       {_geohash_sql("s_suppkey % 80 - 40.0", "(s_nationkey * 13) % 340 - 170.0")} as gh
from supplier
order by s_suppkey
"""


def st_geohash_q(spark: SparkSession, sf: str) -> DataFrame:
    register_all(spark, names=["st_geohash"])
    return (
        load(spark, sf, "supplier")
        .select(
            "s_suppkey",
            (F.col("s_suppkey") % 80 - 40.0).alias("lat"),
            ((F.col("s_nationkey") * 13) % 340 - 170.0).alias("lon"),
        )
        .select(
            "s_suppkey",
            F.expr("st_geohash(lat, lon, 9)").alias("gh"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# String extras: initcap, parse_url, split_part, position, btrim, chr
# (StringFunctions.java init_cap/parse_url/split_part/position/btrim/chr;
# soundex is golden-tested in tests/ — DuckDB has no soundex)
def string_extras(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").where(F.col("c_custkey") <= 400)
    with_url = c.withColumn(
        "u",
        F.concat(
            F.lit("https://ex.com/seg/"),
            F.lower("c_mktsegment"),
            F.lit("?id="),
            F.col("c_custkey").cast("string"),
        ),
    )
    return with_url.select(
        "c_custkey",
        F.initcap(F.lower("c_name")).alias("ic"),
        F.expr("parse_url(u, 'HOST')").alias("host"),
        F.expr("parse_url(u, 'PATH')").alias("path"),
        F.expr("parse_url(u, 'QUERY')").alias("query"),
        F.expr("split_part(c_name, '#', 2)").alias("id_part"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.expr("btrim(c_mktsegment, 'GY')").alias("trimmed"),
        F.chr(F.col("c_custkey") % 26 + 65).alias("letter"),
    ).orderBy("c_custkey")


STRING_EXTRAS_SQL = """
select c_custkey,
       concat(upper(substr(lower(c_name), 1, 1)), substr(lower(c_name), 2)) as ic,
       'ex.com' as host,
       '/seg/' || lower(c_mktsegment) as path,
       'id=' || cast(c_custkey as varchar) as query,
       split_part(c_name, '#', 2) as id_part,
       cast(strpos(c_name, '#') as int) as hash_pos,
       trim(c_mktsegment, 'GY') as trimmed,
       chr(cast(c_custkey % 26 + 65 as int)) as letter
from customer
where c_custkey <= 400
order by c_custkey
"""


# --------------------------------------------------------------------------
# Interval arithmetic: +/- intervals, timestampadd/diff, next_day, extracts
# (DateTypeFunctions.java, DateIntervalFunctionTemplates/)
def intervals(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_events(spark, sf).where(F.col("event_id") <= 500)
    return ev.select(
        "event_id",
        F.expr("ts + interval 90 day").alias("plus_90d"),
        F.expr("ts - interval 3 hour").alias("minus_3h"),
        F.expr("timestampadd(MINUTE, 45, ts)").alias("plus_45m"),
        F.expr("timestampdiff(DAY, ts, timestamp'2024-06-01 00:00:00')").alias(
            "days_to_jun"
        ),
        F.next_day(F.col("ts").cast("date"), "Mon").cast("timestamp").alias("next_mon"),
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("woy"),
        F.dayofyear("ts").alias("doy"),
    ).orderBy("event_id")


INTERVALS_SQL = """
select event_id,
       ts + interval 90 day as plus_90d,
       ts - interval 3 hour as minus_3h,
       ts + interval 45 minute as plus_45m,
       cast(floor(epoch(timestamp '2024-06-01 00:00:00' - ts) / 86400)
            as bigint) as days_to_jun,
       cast(cast(ts as date)
         + cast(((1 - dayofweek(ts) + 6) % 7) + 1 as int) as timestamp) as next_mon,
       quarter(ts) as q,
       cast(weekofyear(ts) as int) as woy,
       cast(dayofyear(ts) as int) as doy
from events
where event_id <= 500
order by event_id
"""


# --------------------------------------------------------------------------
# Regexp family (StringFunctions.java regexp_like/col_like/regexp_split,
# similar; regexp_extract via codegen templates)
def regexp_functions(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").where(F.col("c_custkey") <= 400)
    return c.select(
        "c_custkey",
        F.col("c_name").rlike(r"0{3,}").alias("has_triple_zero"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("id_digits"),
        F.array_join(F.split("c_name", "#"), "|").alias("split_parts"),
        F.regexp_count("c_name", F.lit("0")).alias("zero_count"),
        F.regexp_replace("c_name", r"\d", "*").alias("masked_digits"),
    ).orderBy("c_custkey")


REGEXP_SQL = r"""
select c_custkey,
       regexp_matches(c_name, '0{3,}') as has_triple_zero,
       coalesce(regexp_extract(c_name, '#(\d+)', 1), '') as id_digits,
       array_to_string(string_split(c_name, '#'), '|') as split_parts,
       cast(len(regexp_extract_all(c_name, '0')) as int) as zero_count,
       regexp_replace(c_name, '\d', '*', 'g') as masked_digits
from customer
where c_custkey <= 400
order by c_custkey
"""


# --------------------------------------------------------------------------
# Bitwise scalars (MathFunctions bitwise + AggrBitwise aggregates are
# op_bool_bit_aggregates; these are the scalar ops)
def bitwise_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_partkey") <= 500)
    a = F.col("p_partkey")
    b = F.col("p_size").cast("bigint")
    return p.select(
        "p_partkey",
        a.bitwiseAND(b).alias("b_and"),
        a.bitwiseOR(b).alias("b_or"),
        a.bitwiseXOR(b).alias("b_xor"),
        F.shiftleft(a, 2).alias("shl"),
        F.shiftright(a, 1).alias("shr"),
        F.bit_count(a).alias("popcount"),
        F.expr("~p_partkey").alias("b_not"),
    ).orderBy("p_partkey")


BITWISE_SQL = """
select p_partkey,
       p_partkey & cast(p_size as bigint) as b_and,
       p_partkey | cast(p_size as bigint) as b_or,
       xor(p_partkey, cast(p_size as bigint)) as b_xor,
       p_partkey << 2 as shl,
       p_partkey >> 1 as shr,
       cast(bit_count(p_partkey) as int) as popcount,
       ~p_partkey as b_not
from part
where p_partkey <= 500
order by p_partkey
"""


# --------------------------------------------------------------------------
# CONVERT_TO JSON (ConvertToJson / TO_EXTENDEDJSON): struct -> JSON string
def to_json_q(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk"))
        ).alias("js"),
    ).orderBy("n_nationkey")


TO_JSON_SQL = """
select n_nationkey,
       concat('{"name":"', n_name, '","rk":', cast(n_regionkey as varchar), '}') as js
from nation
order by n_nationkey
"""


def single_value_q(spark: SparkSession, sf: str) -> DataFrame:
    """SINGLE_VALUE over one-row groups + a merged-HLL NDV check
    (SingleValueAggregateFunctions.java; HyperLogLog.java HLL/HLL_MERGE/
    HLL_DECODE).  Partial sketches built per nation, merged, decoded;
    the oracle-checked output pins the estimate to a bounded-error
    boolean (sketch bytes are engine-specific)."""
    from ..functions.shims import hll, hll_decode, hll_merge, single_value

    cust = load(spark, sf, "customer")
    partials = cust.groupBy("c_nationkey").agg(hll("c_custkey").alias("sk"))
    merged = partials.groupBy().agg(
        hll_decode(hll_merge("sk")).alias("est"),
        F.count("*").alias("n_nations"),
    )
    # SINGLE_VALUE guards the scalar-subquery shape: the inner aggregate
    # yields one row, the outer single_value asserts exactly that
    inner = cust.groupBy().agg(F.count_distinct("c_custkey").alias("ndv"))
    exact = inner.groupBy().agg(
        single_value(F.col("ndv")).alias("ndv_exact"),
        single_value(F.lit("per-nation")).alias("tag"),
    )
    return merged.crossJoin(exact).select(
        "tag",
        "n_nations",
        "ndv_exact",
        (
            F.abs(F.col("est") - F.col("ndv_exact"))
            <= 0.05 * F.col("ndv_exact")
        ).alias("est_within_5pct"),
    )


SINGLE_VALUE_SQL = """
select 'per-nation' as tag,
       count(distinct c_nationkey) as n_nations,
       count(distinct c_custkey) as ndv_exact,
       true as est_within_5pct
from customer
"""


def array_extras(spark: SparkSession, sf: str) -> DataFrame:
    """Remaining ARRAY_* surface (DremioSqlOperatorTable ARRAY_APPEND/
    PREPEND/CAT/POSITION/REMOVE/REMOVE_AT/INSERT/FREQUENCY,
    ARRAYS_OVERLAP, EMPTY_ARRAY — impl exec/expr/fn/impl/array/).
    Array results serialize to strings for the scalar-only gate."""
    g = (
        load(spark, sf, "lineitem")
        .where(F.col("l_orderkey") < 300)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("lns"))
    )
    freq = F.transform(
        F.array_sort(F.array_distinct("lns")),
        lambda x: F.concat(
            x.cast("string"),
            F.lit(":"),
            F.size(F.filter("lns", lambda y: y == x)).cast("string"),
        ),
    )
    return g.select(
        "l_orderkey",
        _arr_str(F.array_append("lns", F.lit(99))).alias("appended"),
        _arr_str(F.array_prepend("lns", F.lit(0))).alias("prepended"),
        _arr_str(F.concat("lns", F.array(F.lit(7), F.lit(8)))).alias("cat"),
        F.array_position("lns", 2).cast("bigint").alias("pos_of_2"),
        _arr_str(F.array_remove("lns", 1)).alias("removed_1"),
        _arr_str(
            F.concat(
                F.slice("lns", 1, 1),
                F.expr("slice(lns, 3, size(lns))"),
            )
        ).alias("removed_at_2"),
        _arr_str(F.array_insert("lns", 2, F.lit(42))).alias("inserted"),
        F.array_join(freq, ",").alias("freq"),
        F.arrays_overlap("lns", F.array(F.lit(2), F.lit(9))).alias("overlaps"),
        F.size(F.array().cast("array<int>")).alias("empty_size"),
    ).orderBy("l_orderkey")


ARRAY_EXTRAS_SQL = """
with g as (
  select l_orderkey, list_sort(list(l_linenumber)) as lns
  from lineitem where l_orderkey < 300 group by l_orderkey
)
select l_orderkey,
       coalesce(array_to_string(list_append(lns, 99), ','), '') as appended,
       coalesce(array_to_string(list_prepend(0, lns), ','), '') as prepended,
       coalesce(array_to_string(list_concat(lns, [7, 8]), ','), '') as cat,
       cast(coalesce(list_position(lns, 2), 0) as bigint) as pos_of_2,
       coalesce(array_to_string(list_filter(lns, x -> x <> 1), ','), '') as removed_1,
       coalesce(array_to_string(list_concat(lns[1:1], lns[3:]), ','), '') as removed_at_2,
       coalesce(array_to_string(list_concat(list_concat(lns[1:1], [42]), lns[2:]), ','), '')
         as inserted,
       coalesce(array_to_string(
         list_transform(list_sort(list_distinct(lns)),
           x -> x || ':' || len(list_filter(lns, y -> y = x))), ','), '') as freq,
       list_has_any(lns, [2, 9]) as overlaps,
       0 as empty_size
from g
order by l_orderkey
"""


FUNCTION_QUERIES = {
    "fn_concat_masking": concat_masking,
    "fn_geo_functions": geo_functions,
    "fn_to_char": to_char_formats,
    "fn_convert_codecs": convert_codecs,
    "fn_convert_from_json": convert_from_json_q,
    "fn_kvgen": kvgen_q,
    "fn_array_gaps": array_gap_functions,
    "fn_st_geohash": st_geohash_q,
    "fn_string_extras": string_extras,
    "fn_intervals": intervals,
    "fn_regexp": regexp_functions,
    "fn_bitwise": bitwise_functions,
    "fn_to_json": to_json_q,
    "fn_single_value": single_value_q,
    "fn_array_extras": array_extras,
}

FUNCTION_ORACLE = {
    "fn_concat_masking": CONCAT_MASKING_SQL,
    "fn_geo_functions": GEO_FUNCTIONS_SQL,
    "fn_to_char": TO_CHAR_SQL,
    "fn_convert_codecs": CONVERT_CODECS_SQL,
    "fn_convert_from_json": CONVERT_FROM_JSON_SQL,
    "fn_kvgen": KVGEN_SQL,
    "fn_array_gaps": ARRAY_GAP_SQL,
    "fn_st_geohash": ST_GEOHASH_SQL,
    "fn_string_extras": STRING_EXTRAS_SQL,
    "fn_intervals": INTERVALS_SQL,
    "fn_regexp": REGEXP_SQL,
    "fn_bitwise": BITWISE_SQL,
    "fn_to_json": TO_JSON_SQL,
    "fn_single_value": SINGLE_VALUE_SQL,
    "fn_array_extras": ARRAY_EXTRAS_SQL,
}
