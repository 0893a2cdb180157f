"""Operator-coverage queries: one per SURVEY.md §2 inventory row that isn't
already exercised by the TPC-H suite.

Each entry pairs a DataFrame-API implementation with a DuckDB oracle SQL
string. Reference parity targets are cited per query (dremio-oss file:line).

Determinism rules (same as tpch.py): decimal-cast before float SUMs;
ROUND(x, 4..6) on genuinely floating aggregates (stddev/corr/percentile)
where bit-exactness across engines is not achievable by construction;
every ordered query carries a full tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, load_events
from ..localframe import meta_df
from .tpch import _dec, dsum


# --------------------------------------------------------------------------
# Window functions (reference: sabot/op/windowframe/WindowFunction.java:56-65
# — ROW_NUMBER/RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST/LEAD/LAG/FIRST_VALUE/
# LAST_VALUE/NTILE; WindowFrameOperator.java:56)
def window_ranking(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf, "orders")
        .where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_RANKING_SQL = """
select o_custkey, o_orderkey,
       row_number() over w as rn,
       rank() over w as rnk,
       dense_rank() over w as drnk,
       round(percent_rank() over w, 6) as prnk,
       round(cume_dist() over w, 6) as cdist,
       ntile(4) over w as quartile
from orders
where o_custkey < 100
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
order by o_custkey, o_orderkey
"""


def window_offset(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf, "orders")
        .where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
            F.first("o_totalprice").over(wf).alias("first_price"),
            F.last("o_totalprice").over(wf).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_OFFSET_SQL = """
select o_custkey, o_orderkey,
       lag(o_totalprice, 1) over w as prev_price,
       lead(o_totalprice, 1) over w as next_price,
       first_value(o_totalprice) over wf as first_price,
       last_value(o_totalprice) over wf as last_price,
       nth_value(o_totalprice, 2) over wf as second_price
from orders
where o_custkey < 100
window w as (partition by o_custkey order by o_orderdate, o_orderkey),
       wf as (partition by o_custkey order by o_orderdate, o_orderkey
              rows between unbounded preceding and unbounded following)
order by o_custkey, o_orderkey
"""


# ROWS frames (reference WindowPOP.java:39 frameUnitsRows; FrameSupportTemplate)
# NOTE: testdata lineitem has duplicate (l_orderkey, l_linenumber) keys, so
# ROWS frames over raw rows are nondeterministic; pre-aggregate to a unique
# (l_suppkey, l_orderkey) grain first (deterministic total order per part.)
def window_frames_rows(spark: SparkSession, sf: str) -> DataFrame:
    base = (
        load(spark, sf, "lineitem")
        .where(F.col("l_suppkey") < 20)
        .groupBy("l_suppkey", "l_orderkey")
        .agg(
            F.sum(_dec(F.col("l_quantity"), 2)).alias("qty_dec"),
            F.sum(_dec(F.col("l_extendedprice"), 2)).alias("price_dec"),
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey")
    w3 = w.rowsBetween(-2, 0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        base.select(
            "l_suppkey",
            "l_orderkey",
            F.sum("price_dec").over(w3).cast("double").alias("moving_sum"),
            F.min(F.col("qty_dec").cast("double")).over(w3).alias("moving_min"),
            F.max(F.col("qty_dec").cast("double")).over(w3).alias("moving_max"),
            F.count(F.lit(1)).over(w3).alias("moving_cnt"),
            F.sum("qty_dec").over(wcum).cast("double").alias("cum_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey")
    )


WINDOW_FRAMES_ROWS_SQL = """
with base as (
  select l_suppkey, l_orderkey,
         sum(cast(l_quantity as decimal(18,2))) as qty_dec,
         sum(cast(l_extendedprice as decimal(18,2))) as price_dec
  from lineitem
  where l_suppkey < 20
  group by l_suppkey, l_orderkey
)
select l_suppkey, l_orderkey,
       cast(sum(price_dec) over w3 as double) as moving_sum,
       min(cast(qty_dec as double)) over w3 as moving_min,
       max(cast(qty_dec as double)) over w3 as moving_max,
       count(*) over w3 as moving_cnt,
       cast(sum(qty_dec) over wcum as double) as cum_qty
from base
window w3 as (partition by l_suppkey order by l_orderkey
              rows between 2 preceding and current row),
       wcum as (partition by l_suppkey order by l_orderkey
                rows between unbounded preceding and current row)
order by l_suppkey, l_orderkey
"""


# RANGE frames (reference supports RANGE for default frame only; Spark does
# arbitrary numeric RANGE — we cover the value-range case Spark adds)
def window_frames_range(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-2, 2)
    )
    return (
        load(spark, sf, "part")
        .where(F.col("p_partkey") < 200)
        .select(
            "p_brand",
            "p_partkey",
            "p_size",
            F.count(F.lit(1)).over(w).alias("similar_size_cnt"),
            F.sum(_dec(F.col("p_retailprice"), 2)).over(w).cast("double").alias("similar_size_price"),
        )
        .orderBy("p_brand", "p_partkey")
    )


WINDOW_FRAMES_RANGE_SQL = """
select p_brand, p_partkey, p_size,
       count(*) over w as similar_size_cnt,
       cast(sum(cast(p_retailprice as decimal(18,2))) over w as double) as similar_size_price
from part
where p_partkey < 200
window w as (partition by p_brand order by p_size range between 2 preceding and 2 following)
order by p_brand, p_partkey
"""


# --------------------------------------------------------------------------
# GROUPING SETS / ROLLUP / CUBE — native in Spark (the reference *rewrites*
# these to cross-join+CASE: GroupSetToCrossJoinCaseStatement.java:60)
def grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        select l_returnflag, l_linestatus,
               cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
               count(*) as n,
               cast(grouping(l_returnflag) as bigint) as g_rf,
               cast(grouping(l_linestatus) as bigint) as g_ls
        from _gs_lineitem
        group by grouping sets ((l_returnflag, l_linestatus), (l_returnflag), ())
        order by l_returnflag nulls first, l_linestatus nulls first
        """
    )


GROUPING_SETS_SQL = """
select l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
       count(*) as n,
       cast(grouping(l_returnflag) as bigint) as g_rf,
       cast(grouping(l_linestatus) as bigint) as g_ls
from lineitem
group by grouping sets ((l_returnflag, l_linestatus), (l_returnflag), ())
order by l_returnflag nulls first, l_linestatus nulls first
"""


def rollup_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_CUBE_SQL = """
select o_orderstatus, o_orderpriority, count(*) as n,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total
from orders
group by cube (o_orderstatus, o_orderpriority)
order by o_orderstatus nulls first, o_orderpriority nulls first
"""


# --------------------------------------------------------------------------
# Set operations (reference: UnionAllOperator.java:35; INTERSECT_TO_DISTINCT
# and MinusToJoin rewrites, PlannerPhase.java:591-592 — native in Spark)
def set_operations(spark: SparkSession, sf: str) -> DataFrame:
    cust_nations = load(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust_nations.intersect(supp_nations).withColumn("src", F.lit("both"))
    cust_only = cust_nations.distinct().exceptAll(supp_nations.distinct()).withColumn(
        "src", F.lit("cust_only")
    )
    all_rows = cust_nations.unionAll(supp_nations).distinct().withColumn(
        "src", F.lit("any")
    )
    return both.unionByName(cust_only).unionByName(all_rows).orderBy("src", "nationkey")


SET_OPERATIONS_SQL = """
with cn as (select c_nationkey as nationkey from customer),
     sn as (select s_nationkey as nationkey from supplier)
select nationkey, 'both' as src from (select * from cn intersect select * from sn)
union all
select nationkey, 'cust_only' as src
  from (select distinct nationkey from cn except all select distinct nationkey from sn)
union all
select nationkey, 'any' as src
  from (select distinct nationkey from (select * from cn union all select * from sn))
order by src, nationkey
"""


# --------------------------------------------------------------------------
# DISTINCT aggregates (reference: DremioExpandDistinctAggregatesRule,
# PlannerPhase.java:625) — multiple distinct + mixed aggs in one query
def distinct_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum_distinct(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_dist_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGGREGATES_SQL = """
select l_returnflag,
       count(distinct l_suppkey) as n_supp,
       count(distinct l_partkey) as n_part,
       cast(sum(distinct cast(l_quantity as decimal(18,2))) as double) as sum_dist_qty,
       count(*) as n_rows
from lineitem
group by l_returnflag
order by l_returnflag
"""


# --------------------------------------------------------------------------
# Flatten / explode (reference: FlattenOperator.java:57 — LIST unnest)
def flatten_explode(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "embeddings")
        .where(F.col("vec_id") < 10)
        .select("vec_id", F.explode("embedding").alias("val"))
        .withColumn("val", F.round(F.col("val").cast("double"), 6))
        .orderBy("vec_id", "val")
    )


FLATTEN_EXPLODE_SQL = """
select vec_id, round(cast(unnest(embedding) as double), 6) as val
from embeddings
where vec_id < 10
order by vec_id, val
"""


# Array aggregation + array functions
# (reference: ArrayAggAccumulator.java, exec/expr/fn/impl/array/)
def array_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .where(F.col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("lns"))
        .select(
            "l_orderkey",
            # serialize array outputs: the driver's comparator sorts/hashes
            # pandas frames and list cells are unhashable
            F.array_join("lns", ",").alias("lns"),
            F.size("lns").alias("n"),
            F.element_at("lns", 1).alias("first_ln"),
            F.element_at("lns", -1).alias("last_ln"),
            F.array_contains("lns", 3).alias("has_3"),
            F.array_join(F.slice("lns", 1, 2), ",").alias("first_two"),
            F.array_max("lns").alias("mx"),
            F.array_min("lns").alias("mn"),
            F.array_join(F.reverse("lns"), ",").alias("rev"),
        )
        .orderBy("l_orderkey")
    )


ARRAY_FUNCTIONS_SQL = """
with g as (
  select l_orderkey, list_sort(list(l_linenumber)) as lns
  from lineitem where l_orderkey < 200 group by l_orderkey
)
select l_orderkey,
       array_to_string(lns, ',') as lns,
       cast(len(lns) as int) as n,
       lns[1] as first_ln,
       lns[-1] as last_ln,
       list_contains(lns, 3) as has_3,
       array_to_string(lns[1:2], ',') as first_two,
       list_max(lns) as mx,
       list_min(lns) as mn,
       array_to_string(list_reverse(lns), ',') as rev
from g
order by l_orderkey
"""


# LISTAGG (reference: ListAggAccumulator.java) — ordered, delimited
def listagg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


LISTAGG_SQL = """
select n_regionkey,
       string_agg(n_name, ',' order by n_name) as nations,
       count(*) as n
from nation
group by n_regionkey
order by n_regionkey
"""


# --------------------------------------------------------------------------
# JSON extraction (reference: ConvertFromJsonOperator.java:52, convert_from)
def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_events(spark, sf)
        .where(F.col("event_id") < 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .orderBy("event_id")
    )


JSON_EXTRACT_SQL = """
select event_id, cast(props->>'k' as bigint) as k
from events
where event_id < 500
order by event_id
"""


# from_json into a typed struct (schema'd variant of CONVERT_FROM)
def json_to_struct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_events(spark, sf)
        .where(F.col("event_id") < 500)
        .select(
            "event_id",
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
            F.to_json(F.struct(F.col("event_type").alias("t"))).alias("j"),
        )
        .orderBy("event_id")
    )


JSON_TO_STRUCT_SQL = """
select event_id, cast(props->>'k' as bigint) as k,
       concat('{"t":"', event_type, '"}') as j
from events
where event_id < 500
order by event_id
"""


# --------------------------------------------------------------------------
# Statistical aggregates (reference: AggrTypes3.tdd stddev/variance,
# CovarTypeFunctions.java, CorrelationTypeFunctions.java)
def stats_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_samp"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop"),
            F.round(F.var_samp("l_quantity"), 4).alias("v_samp"),
            F.round(F.var_pop("l_quantity"), 4).alias("v_pop"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("c"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_s"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_p"),
        )
        .orderBy("l_returnflag")
    )


STATS_AGGREGATES_SQL = """
select l_returnflag,
       round(stddev_samp(l_quantity), 4) as sd_samp,
       round(stddev_pop(l_quantity), 4) as sd_pop,
       round(var_samp(l_quantity), 4) as v_samp,
       round(var_pop(l_quantity), 4) as v_pop,
       round(corr(l_quantity, l_extendedprice), 4) as c,
       round(covar_samp(l_quantity, l_extendedprice), 2) as cov_s,
       round(covar_pop(l_quantity, l_extendedprice), 2) as cov_p
from lineitem
group by l_returnflag
order by l_returnflag
"""


# MEDIAN / percentiles (reference: TDigest.java:32 APPROX_PERCENTILE — we
# pair the *exact* percentile against the oracle; the approx variant is
# exercised in unit tests where cross-engine hashes can't match)
def percentiles(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("median(o_totalprice)"), 2).alias("med"),
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.90)"), 2).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


PERCENTILES_SQL = """
select o_orderstatus,
       round(median(o_totalprice), 2) as med,
       round(quantile_cont(o_totalprice, 0.25), 2) as p25,
       round(quantile_cont(o_totalprice, 0.90), 2) as p90
from orders
group by o_orderstatus
order by o_orderstatus
"""


# BOOL_AND/BOOL_OR (reference: BooleanAggrFunctions.java) + bitwise aggs
# (AggrBitwiseLogicalTypeFunctions.java)
def bool_bit_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
            F.bit_and("l_linenumber").alias("band"),
            F.bit_or("l_linenumber").alias("bor"),
            F.bit_xor("l_linenumber").alias("bxor"),
        )
        .orderBy("l_returnflag")
    )


BOOL_BIT_AGGREGATES_SQL = """
select l_returnflag,
       bool_and(l_quantity > 0) as all_pos,
       bool_or(l_discount > 0.09) as any_big_disc,
       bit_and(l_linenumber) as band,
       bit_or(l_linenumber) as bor,
       bit_xor(l_linenumber) as bxor
from lineitem
group by l_returnflag
order by l_returnflag
"""


# --------------------------------------------------------------------------
# String functions (reference: StringFunctions.java:39)
def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .where(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.lower("p_type").alias("lo"),
            F.substring("p_name", 1, 5).alias("sub"),
            F.length("p_name").alias("len"),
            F.split(F.col("p_name"), " ").getItem(0).alias("word1"),
            F.lpad("p_brand", 12, "*").alias("lp"),
            F.rpad("p_brand", 12, "*").alias("rp"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("novowel"),
            F.translate("p_name", "abc", "xyz").alias("tr"),
            F.reverse(F.col("p_name")).alias("rev"),
            F.ascii("p_name").alias("asc1"),
            F.repeat(F.lit("ab"), 3).alias("rep"),
            F.levenshtein("p_name", "p_type").alias("lev"),
            F.expr("position('i' in p_name)").alias("pos_i"),
            F.concat_ws("|", "p_brand", "p_type").alias("cw"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("repl"),
            F.trim(F.lpad("p_brand", 10, " ")).alias("trm"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCTIONS_SQL = """
select p_partkey,
       upper(p_name) as up,
       lower(p_type) as lo,
       substring(p_name, 1, 5) as sub,
       cast(length(p_name) as int) as len,
       string_split(p_name, ' ')[1] as word1,
       lpad(p_brand, 12, '*') as lp,
       rpad(p_brand, 12, '*') as rp,
       regexp_replace(p_name, '[aeiou]', '_', 'g') as novowel,
       translate(p_name, 'abc', 'xyz') as tr,
       reverse(p_name) as rev,
       cast(ascii(p_name) as int) as asc1,
       repeat('ab', 3) as rep,
       cast(levenshtein(p_name, p_type) as int) as lev,
       cast(position('i' in p_name) as int) as pos_i,
       concat_ws('|', p_brand, p_type) as cw,
       replace(p_name, ' ', '-') as repl,
       trim(lpad(p_brand, 10, ' ')) as trm
from part
where p_partkey < 100
order by p_partkey
"""


# --------------------------------------------------------------------------
# Date/time functions (reference: DateTypeFunctions.java:41,
# DateTruncFunctions.java, date_add/diff templates)
def date_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .where(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
            F.last_day("o_orderdate").cast("timestamp").alias("eom"),
            F.expr("o_orderdate + INTERVAL 90 DAY").alias("plus90"),
            F.add_months(F.col("o_orderdate"), 3).cast("timestamp").alias("plus3mo"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
            .cast("bigint")
            .alias("days_to_2002"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
        )
        .orderBy("o_orderkey")
    )


DATE_FUNCTIONS_SQL = """
select o_orderkey,
       date_trunc('month', o_orderdate) as month_start,
       date_trunc('quarter', o_orderdate) as quarter_start,
       cast(extract(year from o_orderdate) as bigint) as yr,
       cast(extract(month from o_orderdate) as bigint) as mo,
       cast(extract(day from o_orderdate) as bigint) as dom,
       cast(last_day(o_orderdate) as timestamp) as eom,
       cast(cast(o_orderdate as date) + 90 as timestamp) as plus90,
       cast(cast(o_orderdate + INTERVAL 3 MONTH as date) as timestamp) as plus3mo,
       datediff('day', o_orderdate, TIMESTAMP '2002-01-01') as days_to_2002,
       cast(epoch(o_orderdate) as bigint) as epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') as iso
from orders
where o_orderkey < 300
order by o_orderkey
"""


# --------------------------------------------------------------------------
# Hash / crypto functions (reference: Hash64Functions.java, HASHSHA256,
# exec/expr/fn/impl/Hash32Functions.java — cross-engine-stable subset)
def hash_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "nation")
        .select(
            "n_nationkey",
            F.md5("n_name").alias("h_md5"),
            F.sha2(F.col("n_name").cast("binary"), 256).alias("h_sha256"),
            F.conv(F.substring(F.md5("n_name"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h64"),
        )
        .orderBy("n_nationkey")
    )


HASH_FUNCTIONS_SQL = """
select n_nationkey,
       md5(n_name) as h_md5,
       sha256(n_name) as h_sha256,
       cast(concat('0x', substr(md5(n_name), 1, 15)) as bigint) as h64
from nation
order by n_nationkey
"""


# --------------------------------------------------------------------------
# CASE / COALESCE / NULLIF / IF — conditional expressions
def conditional_expressions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .where(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("rich")
            .alias("bal_class"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(bldg)"))
            .alias("seg"),
            F.expr("if(c_nationkey % 2 = 0, 'even', 'odd')").alias("parity"),
            F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("pos_bal"),
            F.least(F.col("c_acctbal"), F.lit(0.0)).alias("neg_bal"),
        )
        .orderBy("c_custkey")
    )


CONDITIONAL_EXPRESSIONS_SQL = """
select c_custkey,
       case when c_acctbal < 0 then 'debt'
            when c_acctbal < 5000 then 'mid'
            else 'rich' end as bal_class,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') as seg,
       case when c_nationkey % 2 = 0 then 'even' else 'odd' end as parity,
       greatest(c_acctbal, 0.0) as pos_bal,
       least(c_acctbal, 0.0) as neg_bal
from customer
where c_custkey < 200
order by c_custkey
"""


# --------------------------------------------------------------------------
# Math functions (reference: MathFunctions.java:41, MathFunc.tdd)
def math_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
            F.round(F.log("l_extendedprice"), 6).alias("ln_"),
            F.round(F.log10("l_extendedprice"), 6).alias("log10_"),
            F.round(F.log2("l_extendedprice"), 6).alias("log2_"),
            F.round(F.pow(F.col("l_quantity"), 2), 6).alias("sqr"),
            F.round(F.cbrt("l_extendedprice"), 6).alias("cb"),
            F.round(F.exp(F.col("l_discount")), 6).alias("ex"),
            F.signum(F.col("l_discount") - 0.05).alias("sg"),
            F.abs(F.col("l_discount") - 0.05).alias("ab"),
            F.ceil("l_extendedprice").alias("ce"),
            F.floor("l_extendedprice").alias("fl"),
            (F.col("l_quantity") % 7).alias("md"),
            F.round(F.degrees(F.col("l_discount")), 6).alias("dg"),
            F.round(F.sin(F.col("l_discount")), 6).alias("sn"),
            F.round(F.atan2(F.col("l_quantity"), F.col("l_linenumber")), 6).alias("at2"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


MATH_FUNCTIONS_SQL = """
select l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) as sq,
       round(ln(l_extendedprice), 6) as ln_,
       round(log10(l_extendedprice), 6) as log10_,
       round(log2(l_extendedprice), 6) as log2_,
       round(pow(l_quantity, 2), 6) as sqr,
       round(cbrt(l_extendedprice), 6) as cb,
       round(exp(l_discount), 6) as ex,
       cast(sign(l_discount - 0.05) as double) as sg,
       abs(l_discount - 0.05) as ab,
       cast(ceil(l_extendedprice) as bigint) as ce,
       cast(floor(l_extendedprice) as bigint) as fl,
       l_quantity % 7 as md,
       round(degrees(l_discount), 6) as dg,
       round(sin(l_discount), 6) as sn,
       round(atan2(l_quantity, l_linenumber), 6) as at2
from lineitem
where l_orderkey < 100
order by l_orderkey, l_linenumber
"""


# --------------------------------------------------------------------------
# PIVOT (conditional aggregation; the reference expresses pivots via
# CASE aggregation — GroupSetToCrossJoinCaseStatement-style rewrite)
def pivot(spark: SparkSession, sf: str) -> DataFrame:
    flags = ["A", "N", "R"]
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", flags)
        .agg(F.sum(_dec(F.col("l_quantity"), 2)).cast("double"))
        .withColumnsRenamed({f: f"qty_{f.lower()}" for f in flags})
        .orderBy("l_linestatus")
    )


PIVOT_SQL = """
select l_linestatus,
       cast(sum(case when l_returnflag = 'A' then cast(l_quantity as decimal(18,2)) end) as double) as qty_a,
       cast(sum(case when l_returnflag = 'N' then cast(l_quantity as decimal(18,2)) end) as double) as qty_n,
       cast(sum(case when l_returnflag = 'R' then cast(l_quantity as decimal(18,2)) end) as double) as qty_r
from lineitem
group by l_linestatus
order by l_linestatus
"""


# --------------------------------------------------------------------------
# VALUES literal rows (reference: ValuesCreator.java:32)
def values_literal(spark: SparkSession, sf: str) -> DataFrame:
    df = meta_df(spark, 
        [(1, "one", 1.5), (2, "two", 2.5), (3, "three", None)],
        "id INT, name STRING, score DOUBLE",
    )
    return df.orderBy("id")


VALUES_LITERAL_SQL = """
select * from (values
  (cast(1 as int), 'one', 1.5),
  (cast(2 as int), 'two', 2.5),
  (cast(3 as int), 'three', cast(null as double))
) as t(id, name, score)
order by id
"""


# --------------------------------------------------------------------------
# LIMIT/OFFSET (reference: LimitOperator.java:31 limit/offset passthrough)
def limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(5)
        .select("o_orderkey", "o_custkey")
    )


LIMIT_OFFSET_SQL = """
select o_orderkey, o_custkey
from orders
order by o_orderkey
limit 5 offset 10
"""


# --------------------------------------------------------------------------
# CROSS JOIN + theta join (reference: NLJOperator / NLJEOperator —
# BroadcastNestedLoopJoin in Spark)
def cross_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region").select(F.col("r_regionkey").alias("rk"))
    n = load(spark, sf, "nation")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") < F.col("rk"))
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_bigger_regions"))
        .orderBy("n_nationkey")
    )


CROSS_THETA_JOIN_SQL = """
select n_nationkey, count(*) as n_bigger_regions
from nation
join region on n_regionkey < r_regionkey
group by n_nationkey
order by n_nationkey
"""


# Full outer join (reference: vectorized hash join supports full outer)
def full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    big_cust = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") > 15)
    )
    rich = (
        load(spark, sf, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    return (
        rich.join(big_cust, rich.c_custkey == big_cust.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_acctbal",
            "n_orders",
        )
        .orderBy("custkey")
    )


FULL_OUTER_JOIN_SQL = """
with big_cust as (
  select o_custkey, count(*) as n_orders from orders group by o_custkey having count(*) > 15
), rich as (
  select c_custkey, c_acctbal from customer where c_acctbal > 9000
)
select coalesce(c_custkey, o_custkey) as custkey, c_acctbal, n_orders
from rich full outer join big_cust on c_custkey = o_custkey
order by custkey
"""


OPERATOR_QUERIES = {
    "op_window_ranking": window_ranking,
    "op_window_offset": window_offset,
    "op_window_frames_rows": window_frames_rows,
    "op_window_frames_range": window_frames_range,
    "op_grouping_sets": grouping_sets,
    "op_rollup_cube": rollup_cube,
    "op_set_operations": set_operations,
    "op_distinct_aggregates": distinct_aggregates,
    "op_flatten_explode": flatten_explode,
    "op_array_functions": array_functions,
    "op_listagg": listagg,
    "op_json_extract": json_extract,
    "op_json_to_struct": json_to_struct,
    "op_stats_aggregates": stats_aggregates,
    "op_percentiles": percentiles,
    "op_bool_bit_aggregates": bool_bit_aggregates,
    "op_string_functions": string_functions,
    "op_date_functions": date_functions,
    "op_hash_functions": hash_functions,
    "op_conditional_expressions": conditional_expressions,
    "op_math_functions": math_functions,
    "op_pivot": pivot,
    "op_values_literal": values_literal,
    "op_limit_offset": limit_offset,
    "op_cross_theta_join": cross_theta_join,
    "op_full_outer_join": full_outer_join,
}

OPERATOR_ORACLE = {
    "op_window_ranking": WINDOW_RANKING_SQL,
    "op_window_offset": WINDOW_OFFSET_SQL,
    "op_window_frames_rows": WINDOW_FRAMES_ROWS_SQL,
    "op_window_frames_range": WINDOW_FRAMES_RANGE_SQL,
    "op_grouping_sets": GROUPING_SETS_SQL,
    "op_rollup_cube": ROLLUP_CUBE_SQL,
    "op_set_operations": SET_OPERATIONS_SQL,
    "op_distinct_aggregates": DISTINCT_AGGREGATES_SQL,
    "op_flatten_explode": FLATTEN_EXPLODE_SQL,
    "op_array_functions": ARRAY_FUNCTIONS_SQL,
    "op_listagg": LISTAGG_SQL,
    "op_json_extract": JSON_EXTRACT_SQL,
    "op_json_to_struct": JSON_TO_STRUCT_SQL,
    "op_stats_aggregates": STATS_AGGREGATES_SQL,
    "op_percentiles": PERCENTILES_SQL,
    "op_bool_bit_aggregates": BOOL_BIT_AGGREGATES_SQL,
    "op_string_functions": STRING_FUNCTIONS_SQL,
    "op_date_functions": DATE_FUNCTIONS_SQL,
    "op_hash_functions": HASH_FUNCTIONS_SQL,
    "op_conditional_expressions": CONDITIONAL_EXPRESSIONS_SQL,
    "op_math_functions": MATH_FUNCTIONS_SQL,
    "op_pivot": PIVOT_SQL,
    "op_values_literal": VALUES_LITERAL_SQL,
    "op_limit_offset": LIMIT_OFFSET_SQL,
    "op_cross_theta_join": CROSS_THETA_JOIN_SQL,
    "op_full_outer_join": FULL_OUTER_JOIN_SQL,
}
