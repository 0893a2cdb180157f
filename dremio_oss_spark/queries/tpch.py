"""TPC-H-derived query corpus, adapted to the driver's testdata schema.

Mirrors the reference e2e suite (dremio-oss
`sabot/kernel/src/test/resources/queries/tpch/01.sql..22.sql`, run by
`TestTpchDistributed.java:28`) re-expressed with the PySpark DataFrame API.
The driver's testdata lacks `partsupp` and several wide columns
(l_shipmode, l_receiptdate, l_commitdate, o_shippriority, c_phone, ...);
queries needing them use derived variants that exercise the same operator
shapes (join types, correlated subqueries, having, top-n, ...).

Determinism vs the DuckDB oracle
--------------------------------
Floating-point SUM is order-dependent, and Spark's partial aggregation
order differs from DuckDB's. Every money/quantity aggregate therefore
casts the row expression to DECIMAL(18,s) *before* summing (exact,
associative) and casts the final sum to DOUBLE; averages are computed as
exact-decimal-sum / count. Both engines then produce bit-identical
doubles. Row-wise double arithmetic (e.g. ``l_extendedprice *
(1 - l_discount)``) is deterministic and identical across engines.

Scale notes (100 TB): every query below is a declarative DataFrame plan —
Catalyst pushes filters/projections into the parquet scan, AQE picks
broadcast vs shuffle join per runtime stats, and two-phase aggregation is
automatic. `region`/`nation` joins are explicitly broadcast (tiny dims);
fact-fact joins (lineitem⋈orders) shuffle on the join key, which is the
right strategy at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load


def _dec(c: Column, scale: int = 4) -> Column:
    """Cast a row expression to exact decimal for order-independent sums."""
    return c.cast(f"decimal(18,{scale})")


def dsum(c: Column, scale: int = 4) -> Column:
    """Order-independent SUM: decimal-exact accumulate, double result."""
    return F.sum(_dec(c, scale)).cast("double")


def davg(c: Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, double result."""
    return F.sum(_dec(c, scale)).cast("double") / F.count(F.lit(1))


# revenue expression used across queries (classic TPC-H disc_price)
def _rev() -> Column:
    return _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)


# oracle-side equivalents of the helpers above
REV_SQL = "cast(l_extendedprice * (1 - l_discount) as decimal(18,4))"


def _dsum_sql(expr: str, scale: int = 4) -> str:
    return f"cast(sum(cast({expr} as decimal(18,{scale}))) as double)"


# --------------------------------------------------------------------------
# Q1: pricing summary report — full-scan agg, 2-phase hash agg in Spark
# (reference: queries/tpch/01.sql; VectorizedHashAggOperator.java:307)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.where("l_shipdate <= TIMESTAMP '2000-12-01'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = f"""
select l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity', 2)} as sum_qty,
       {_dsum_sql('l_extendedprice', 2)} as sum_base_price,
       cast(sum({REV_SQL}) as double) as sum_disc_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} as sum_charge,
       {_dsum_sql('l_quantity', 2)} / count(*) as avg_qty,
       {_dsum_sql('l_extendedprice', 2)} / count(*) as avg_price,
       {_dsum_sql('l_discount', 4)} / count(*) as avg_disc,
       count(*) as count_order
from lineitem
where l_shipdate <= TIMESTAMP '2000-12-01'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q2 variant (no partsupp): min-acctbal supplier per part type in EUROPE,
# via window-min (reference 02.sql's correlated-min re-expressed).
def q02(spark: SparkSession, sf: str) -> DataFrame:
    base = (
        load(spark, sf, "part")
        .where(F.col("p_size") == 15)
        .join(load(spark, sf, "lineitem"), F.col("p_partkey") == F.col("l_partkey"))
        .join(load(spark, sf, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(load(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .select("p_type", "s_suppkey", "s_acctbal", "s_name", "n_name")
        .distinct()
    )
    w = Window.partitionBy("p_type")
    return (
        base.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_type")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_type")
    )


Q02_SQL = """
with base as (
  select distinct p_type, s_suppkey, s_acctbal, s_name, n_name
  from part
  join lineitem on p_partkey = l_partkey
  join supplier on l_suppkey = s_suppkey
  join nation on s_nationkey = n_nationkey
  join region on n_regionkey = r_regionkey
  where r_name = 'EUROPE' and p_size = 15
), w as (
  select *, min(s_acctbal) over (partition by p_type) as min_bal from base
)
select s_acctbal, s_name, n_name, p_type
from w where s_acctbal = min_bal
order by s_acctbal desc, s_name, p_type
"""


# --------------------------------------------------------------------------
# Q3: shipping priority (minus o_shippriority) — 3-way join + top-n
def q03(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").where("o_orderdate < TIMESTAMP '1998-03-15'")
    li = load(spark, sf, "lineitem").where("l_shipdate > TIMESTAMP '1998-03-15'")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q03_SQL = f"""
select l_orderkey, o_orderdate, cast(sum({REV_SQL}) as double) as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < TIMESTAMP '1998-03-15'
  and l_shipdate > TIMESTAMP '1998-03-15'
group by l_orderkey, o_orderdate
order by revenue desc, o_orderdate, l_orderkey
limit 10
"""


# --------------------------------------------------------------------------
# Q4 variant: order-priority check via EXISTS (semi join with non-equi cond);
# "late" = shipped >30 days after order date (no l_commitdate in testdata)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").where(
        "o_orderdate >= TIMESTAMP '1996-07-01' and o_orderdate < TIMESTAMP '1996-10-01'"
    )
    li = load(spark, sf, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q04_SQL = """
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= TIMESTAMP '1996-07-01' and o_orderdate < TIMESTAMP '1996-10-01'
  and exists (select 1 from lineitem
              where l_orderkey = o_orderkey
                and l_shipdate > o_orderdate + INTERVAL 30 DAY)
group by o_orderpriority
order by o_orderpriority
"""


# --------------------------------------------------------------------------
# Q5: local supplier volume — 6-way join with broadcast dims
def q05(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").where(
        "o_orderdate >= TIMESTAMP '1996-01-01' and o_orderdate < TIMESTAMP '1997-01-01'"
    )
    return (
        load(spark, sf, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(load(spark, sf, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            load(spark, sf, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(load(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q05_SQL = f"""
select n_name, cast(sum({REV_SQL}) as double) as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= TIMESTAMP '1996-01-01' and o_orderdate < TIMESTAMP '1997-01-01'
group by n_name
order by revenue desc, n_name
"""


# --------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan+filter+agg (pushdown showcase)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .where(
            "l_shipdate >= TIMESTAMP '1996-01-01' and l_shipdate < TIMESTAMP '1997-01-01'"
            " and l_discount between 0.05 and 0.07 and l_quantity < 24"
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


Q06_SQL = f"""
select {_dsum_sql('l_extendedprice * l_discount', 4)} as revenue
from lineitem
where l_shipdate >= TIMESTAMP '1996-01-01' and l_shipdate < TIMESTAMP '1997-01-01'
  and l_discount between 0.05 and 0.07 and l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, by year (self-join of nation)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        load(spark, sf, "supplier")
        .join(load(spark, sf, "lineitem"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(load(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(load(spark, sf, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            "((supp_nation = 'NATION_1' and cust_nation = 'NATION_2')"
            " or (supp_nation = 'NATION_2' and cust_nation = 'NATION_1'))"
            " and l_shipdate between TIMESTAMP '1996-01-01' and TIMESTAMP '1997-12-31'"
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q07_SQL = f"""
select n1.n_name as supp_nation, n2.n_name as cust_nation,
       cast(extract(year from l_shipdate) as bigint) as l_year,
       cast(sum({REV_SQL}) as double) as revenue
from supplier
join lineitem on s_suppkey = l_suppkey
join orders on o_orderkey = l_orderkey
join customer on c_custkey = o_custkey
join nation n1 on s_nationkey = n1.n_nationkey
join nation n2 on c_nationkey = n2.n_nationkey
where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
    or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
  and l_shipdate between TIMESTAMP '1996-01-01' and TIMESTAMP '1997-12-31'
group by 1, 2, 3
order by 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8: national market share — conditional agg over an 8-way join
def q08(spark: SparkSession, sf: str) -> DataFrame:
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_region")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    base = (
        load(spark, sf, "part")
        .where(F.col("p_type") == "ECONOMY")
        .join(load(spark, sf, "lineitem"), F.col("p_partkey") == F.col("l_partkey"))
        .join(load(spark, sf, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(load(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(load(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(load(spark, sf, "region")),
            F.col("c_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .where(
            "r_name = 'AMERICA' and o_orderdate between TIMESTAMP '1996-01-01'"
            " and TIMESTAMP '1997-12-31'"
        )
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", _rev())
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q08_SQL = f"""
with base as (
  select cast(extract(year from o_orderdate) as bigint) as o_year,
         {REV_SQL} as volume, n2.n_name as nation
  from part
  join lineitem on p_partkey = l_partkey
  join supplier on l_suppkey = s_suppkey
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  join nation n1 on c_nationkey = n1.n_nationkey
  join region on n1.n_regionkey = r_regionkey
  join nation n2 on s_nationkey = n2.n_nationkey
  where r_name = 'AMERICA' and p_type = 'ECONOMY'
    and o_orderdate between TIMESTAMP '1996-01-01' and TIMESTAMP '1997-12-31'
)
select o_year,
       cast(sum(case when nation = 'NATION_3' then volume else cast(0 as decimal(18,4)) end) as double)
         / cast(sum(volume) as double) as mkt_share
from base group by o_year order by o_year
"""


# --------------------------------------------------------------------------
# Q9 variant (no ps_supplycost): product-type profit by nation and year
def q09(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .where(F.col("p_name").like("%red%"))
        .join(load(spark, sf, "lineitem"), F.col("p_partkey") == F.col("l_partkey"))
        .join(load(spark, sf, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(load(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(load(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q09_SQL = f"""
select n_name as nation, cast(extract(year from o_orderdate) as bigint) as o_year,
       cast(sum({REV_SQL}) as double) as sum_profit
from part
join lineitem on p_partkey = l_partkey
join supplier on l_suppkey = s_suppkey
join orders on l_orderkey = o_orderkey
join nation on s_nationkey = n_nationkey
where p_name like '%red%'
group by 1, 2
order by nation, o_year desc
"""


# --------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
def q10(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").where(
        "o_orderdate >= TIMESTAMP '1996-10-01' and o_orderdate < TIMESTAMP '1997-01-01'"
    )
    li = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        load(spark, sf, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(load(spark, sf, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
select c_custkey, c_name, c_acctbal, n_name, cast(sum({REV_SQL}) as double) as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
join nation on c_nationkey = n_nationkey
where o_orderdate >= TIMESTAMP '1996-10-01' and o_orderdate < TIMESTAMP '1997-01-01'
  and l_returnflag = 'R'
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey
limit 20
"""


# --------------------------------------------------------------------------
# Q11 variant (no partsupp): important parts by lineitem value vs global
# fraction — scalar subquery (cross-join of a 1-row aggregate)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    pv = (
        load(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"), 2)).alias("value_dec"))
    )
    total = pv.agg(
        (F.sum("value_dec").cast("double") * 0.001).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey"), F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = """
with pv as (
  select l_partkey, sum(cast(l_extendedprice as decimal(18,2))) as value_dec
  from lineitem group by l_partkey
)
select l_partkey, cast(value_dec as double) as value
from pv
where cast(value_dec as double) > (select cast(sum(value_dec) as double) * 0.001 from pv)
order by value desc, l_partkey
"""


# --------------------------------------------------------------------------
# Q12 variant (no l_shipmode): priority counts by linestatus for 1997 ships
def q12(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        "l_shipdate >= TIMESTAMP '1997-01-01' and l_shipdate < TIMESTAMP '1998-01-01'"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        load(spark, sf, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            # explicit bigint: DuckDB sum(int) yields HUGEINT, Spark bigint —
            # pin both sides to bigint so the driver's value-hash agrees
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
select l_linestatus,
       cast(sum(case when o_orderpriority in ('1-URGENT','2-HIGH') then 1 else 0 end) as bigint) as high_line_count,
       cast(sum(case when o_orderpriority not in ('1-URGENT','2-HIGH') then 1 else 0 end) as bigint) as low_line_count
from orders
join lineitem on o_orderkey = l_orderkey
where l_shipdate >= TIMESTAMP '1997-01-01' and l_shipdate < TIMESTAMP '1998-01-01'
group by l_linestatus
order by l_linestatus
"""


# --------------------------------------------------------------------------
# Q13: customer order-count distribution — left outer join w/ join-time filter
def q13(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer
  left outer join orders on c_custkey = o_custkey and o_orderpriority <> '5-LOW'
  group by c_custkey
)
group by c_count
order by custdist desc, c_count desc
"""


# --------------------------------------------------------------------------
# Q14: promotion effect — conditional agg ratio
def q14(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        "l_shipdate >= TIMESTAMP '1997-09-01' and l_shipdate < TIMESTAMP '1997-10-01'"
    )
    joined = li.join(
        load(spark, sf, "part"), F.col("l_partkey") == F.col("p_partkey")
    ).withColumn("rev", _rev())
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum("rev").cast("double")
        ).alias("promo_revenue")
    )


Q14_SQL = f"""
select 100.0 * cast(sum(case when p_type = 'PROMO' then {REV_SQL}
                             else cast(0 as decimal(18,4)) end) as double)
       / cast(sum({REV_SQL}) as double) as promo_revenue
from lineitem
join part on l_partkey = p_partkey
where l_shipdate >= TIMESTAMP '1997-09-01' and l_shipdate < TIMESTAMP '1997-10-01'
"""


# --------------------------------------------------------------------------
# Q15: top supplier — agg view + max scalar subquery
def q15(spark: SparkSession, sf: str) -> DataFrame:
    revenue = (
        load(spark, sf, "lineitem")
        .where(
            "l_shipdate >= TIMESTAMP '1996-01-01' and l_shipdate < TIMESTAMP '1996-04-01'"
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_revenue_dec"))
    )
    mx = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    return (
        load(spark, sf, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue_dec") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
with revenue as (
  select l_suppkey as supplier_no, sum({REV_SQL}) as total_revenue_dec
  from lineitem
  where l_shipdate >= TIMESTAMP '1996-01-01' and l_shipdate < TIMESTAMP '1996-04-01'
  group by l_suppkey
)
select s_suppkey, s_name, cast(total_revenue_dec as double) as total_revenue
from supplier
join revenue on s_suppkey = supplier_no
where total_revenue_dec = (select max(total_revenue_dec) from revenue)
order by s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 variant (no partsupp): distinct supplier count per brand/type/size
def q16(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .join(load(spark, sf, "lineitem"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
select p_brand, p_type, p_size, count(distinct l_suppkey) as supplier_cnt
from part
join lineitem on p_partkey = l_partkey
where p_brand <> 'Brand#5' and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated scalar subquery (avg per
# part). l_quantity is integral so double AVG is exact and order-independent.
def q17(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"), 2)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
select cast(sum(cast(l_extendedprice as decimal(18,2))) as double) / 7.0 as avg_yearly
from lineitem
join part on l_partkey = p_partkey
where p_brand = 'Brand#3'
  and l_quantity < (select 0.5 * avg(l_quantity) from lineitem l2
                    where l2.l_partkey = lineitem.l_partkey)
"""


# --------------------------------------------------------------------------
# Q18: large-volume customers — IN over a HAVING subquery + 3-way join
def q18(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .where(F.col("tot_qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        load(spark, sf, "customer")
        .join(load(spark, sf, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = f"""
select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {_dsum_sql('l_quantity', 2)} as sum_qty
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (select l_orderkey from lineitem
                     group by l_orderkey having sum(l_quantity) > 250)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderdate, o_orderkey
limit 100
"""


# --------------------------------------------------------------------------
# Q19: discounted revenue — disjunctive multi-range predicate join
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q19_SQL = f"""
select cast(sum({REV_SQL}) as double) as revenue
from lineitem
join part on p_partkey = l_partkey
where (p_brand = 'Brand#1' and l_quantity between 1 and 11 and p_size between 1 and 5)
   or (p_brand = 'Brand#2' and l_quantity between 10 and 20 and p_size between 1 and 10)
   or (p_brand = 'Brand#3' and l_quantity between 20 and 30 and p_size between 1 and 15)
"""


# --------------------------------------------------------------------------
# Q19_1: the reference corpus ships queries/tpch/19_1.sql alongside 19 —
# same discount-revenue disjunction, but the equi-join predicate factored
# OUT of the OR (19 embeds `p_partkey = l_partkey` in every disjunct; 19_1
# hoists it, the planner-friendly form).  Reference quantity windows
# (base, base+10) and size ranges kept; brands mapped into the synthetic
# data's Brand#1..25 domain.
def q19_1(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#21")
            & (F.col("l_quantity") >= 2) & (F.col("l_quantity") <= 2 + 10)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("l_quantity") >= 14) & (F.col("l_quantity") <= 14 + 10)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & (F.col("l_quantity") >= 23) & (F.col("l_quantity") <= 23 + 10)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q19_1_SQL = f"""
select cast(sum({REV_SQL}) as double) as revenue
from lineitem, part
where p_partkey = l_partkey
  and ((p_brand = 'Brand#21' and l_quantity >= 2 and l_quantity <= 2 + 10
        and p_size between 1 and 5)
    or (p_brand = 'Brand#13' and l_quantity >= 14 and l_quantity <= 14 + 10
        and p_size between 1 and 10)
    or (p_brand = 'Brand#5' and l_quantity >= 23 and l_quantity <= 23 + 10
        and p_size between 1 and 15))
"""


# --------------------------------------------------------------------------
# Q20 variant (no partsupp): suppliers who shipped >50 units of 'small%'
# parts in 1997 — IN over grouped HAVING subquery (semi join)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    parts = load(spark, sf, "part").where(F.col("p_name").like("small%"))
    li = load(spark, sf, "lineitem").where(
        "l_shipdate >= TIMESTAMP '1997-01-01' and l_shipdate < TIMESTAMP '1998-01-01'"
    )
    qualifying = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select(F.col("l_suppkey").alias("q_suppkey"))
    )
    return (
        load(spark, sf, "supplier")
        .join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("q_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = """
select s_suppkey, s_name
from supplier
where s_suppkey in (
  select l_suppkey
  from lineitem
  join part on l_partkey = p_partkey
  where p_name like 'small%'
    and l_shipdate >= TIMESTAMP '1997-01-01' and l_shipdate < TIMESTAMP '1998-01-01'
  group by l_suppkey
  having sum(l_quantity) > 50
)
order by s_name
"""


# --------------------------------------------------------------------------
# Q21 variant: suppliers who alone were late (>60 days ship lag) on
# multi-supplier finished orders
def q21(spark: SparkSession, sf: str) -> DataFrame:
    lo = (
        load(spark, sf, "lineitem")
        .join(
            load(spark, sf, "orders").where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    # per-orderkey supplier/late counts as WINDOW aggregates over lo, not
    # a groupBy + self-join: the join form computes the lo subtree twice
    # and shuffles it twice more (agg + join sides); the window form is
    # one extra sort on the orderkey partitioning.  Same rows provably:
    # count()/sum() over (partition by l_orderkey) are exactly the
    # joined n_supp/n_late.  Measured at sf0.1: 19 Exchanges -> 12, SMJ
    # eliminated, 16 HashAggregates -> 8 (plans/r14/tpch_q21_*.txt).
    w = Window.partitionBy("l_orderkey")
    return (
        lo.select(
            "*",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("late").over(w).alias("n_late"),
        )
        .where((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(load(spark, sf, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
with lo as (
  select l_orderkey, l_suppkey,
         max(case when l_shipdate > o_orderdate + INTERVAL 60 DAY then 1 else 0 end) as late
  from lineitem
  join orders on l_orderkey = o_orderkey
  where o_orderstatus = 'F'
  group by l_orderkey, l_suppkey
), agg as (
  select l_orderkey as a_orderkey, count(*) as n_supp, sum(late) as n_late
  from lo group by l_orderkey
)
select s_name, count(*) as numwait
from lo
join agg on l_orderkey = a_orderkey
join supplier on l_suppkey = s_suppkey
where late = 1 and n_supp >= 2 and n_late = 1
group by s_name
order by numwait desc, s_name
"""


# --------------------------------------------------------------------------
# Q22 variant (no c_phone): rich inactive customers by nation bucket —
# scalar subquery + anti join
def q22(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec(F.col("c_acctbal"), 2)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            load(spark, sf, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("long"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
select cast(c_nationkey % 5 as bigint) as cntrycode, count(*) as numcust,
       {_dsum_sql('c_acctbal', 2)} as totacctbal
from customer
where c_acctbal > (select cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*)
                   from customer where c_acctbal > 0)
  and not exists (select 1 from orders where o_custkey = c_custkey)
group by 1
order by 1
"""


TPCH_QUERIES = {
    f"tpch_q{i:02d}": fn
    for i, fn in enumerate(
        [q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15,
         q16, q17, q18, q19, q20, q21, q22],
        start=1,
    )
}
TPCH_QUERIES["tpch_q19_1"] = q19_1

TPCH_ORACLE = {
    f"tpch_q{i:02d}": sql
    for i, sql in enumerate(
        [Q01_SQL, Q02_SQL, Q03_SQL, Q04_SQL, Q05_SQL, Q06_SQL, Q07_SQL, Q08_SQL,
         Q09_SQL, Q10_SQL, Q11_SQL, Q12_SQL, Q13_SQL, Q14_SQL, Q15_SQL, Q16_SQL,
         Q17_SQL, Q18_SQL, Q19_SQL, Q20_SQL, Q21_SQL, Q22_SQL],
        start=1,
    )
}
TPCH_ORACLE["tpch_q19_1"] = Q19_1_SQL
