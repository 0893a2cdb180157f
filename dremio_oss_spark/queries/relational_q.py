"""Relational operator coverage round 2: joins beyond equi-inner,
subquery decorrelation, sample, maps, lateral generation.

Reference targets (dremio-oss):
- semi/anti join via plan-level decorrelation:
  `exec/planner/sql/handlers/RexSubQueryUtils.java`,
  `DrelTransformer.java:372-374` (DremioRelDecorrelator).
- NLJ/NLJE theta + range conditions: `sabot/op/join/nlje/NLJEOperator.java:64`,
  range rewrite `RangeConditionRewriteVisitor.java:67`.
- TABLESAMPLE -> limit: `exec/planner/physical/SamplePrel.java:33`,
  SampleToLimitPrule.
- Map functions: `exec/expr/fn/impl/MapFunctions.java:45`.
- NDV/HLL: `exec/expr/fn/hll/HyperLogLog.java:28`.

Spark-first notes: EXISTS/IN/scalar subqueries go through spark.sql() so
Catalyst's RewriteCorrelatedScalarSubquery / RewritePredicateSubquery do
the decorrelation (the reference implements the same rewrite manually).
The range join broadcasts its tiny build side -> BroadcastNestedLoopJoin,
which is the scale-correct plan when one side is a handful of buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_testdata
from ..localframe import meta_df


# --------------------------------------------------------------------------
def semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with"))
    )
    without_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without"))
    )
    return (
        with_orders.join(without_orders, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with", F.lit(0)).alias("n_with"),
            F.coalesce("n_without", F.lit(0)).alias("n_without"),
        )
        .orderBy("c_mktsegment")
    )


SEMI_ANTI_JOIN_SQL = """
with w as (
  select c_mktsegment, count(*) as n_with from customer c
  where exists (select 1 from orders o where o.o_custkey = c.c_custkey)
  group by c_mktsegment
), wo as (
  select c_mktsegment, count(*) as n_without from customer c
  where not exists (select 1 from orders o where o.o_custkey = c.c_custkey)
  group by c_mktsegment
)
select coalesce(w.c_mktsegment, wo.c_mktsegment) as c_mktsegment,
       coalesce(n_with, 0) as n_with,
       coalesce(n_without, 0) as n_without
from w full outer join wo on w.c_mktsegment = wo.c_mktsegment
order by c_mktsegment
"""


# --------------------------------------------------------------------------
def exists_in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata(spark, sf)
    return spark.sql(
        """
        select o_orderkey, o_totalprice
        from orders o
        where exists (select 1 from lineitem l
                      where l.l_orderkey = o.o_orderkey and l.l_quantity >= 49)
          and o_custkey in (select c_custkey from customer where c_acctbal > 8000)
        order by o_orderkey
        """
    )


EXISTS_IN_SUBQUERY_SQL = """
select o_orderkey, o_totalprice
from orders o
where exists (select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey and l.l_quantity >= 49)
  and o_custkey in (select c_custkey from customer where c_acctbal > 8000)
order by o_orderkey
"""


# --------------------------------------------------------------------------
def scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata(spark, sf)
    # uncorrelated scalar + correlated scalar (Catalyst decorrelates both;
    # the reference rewrites these to joins in DremioRelDecorrelator)
    return spark.sql(
        """
        select p.p_partkey, p.p_retailprice,
               round((select avg(p2.p_retailprice) from part p2
                      where p2.p_brand = p.p_brand), 4) as brand_avg
        from part p
        where p.p_retailprice > (select avg(p3.p_retailprice) from part p3) * 1.5
        order by p.p_partkey
        """
    )


SCALAR_SUBQUERY_SQL = """
select p.p_partkey, p.p_retailprice,
       round((select avg(p2.p_retailprice) from part p2
              where p2.p_brand = p.p_brand), 4) as brand_avg
from part p
where p.p_retailprice > (select avg(p3.p_retailprice) from part p3) * 1.5
order by p.p_partkey
"""


# --------------------------------------------------------------------------
def range_join(spark: SparkSession, sf: str) -> DataFrame:
    # single-file scan -> one split; fan out so the BroadcastNLJ probe
    # side parallelizes (at lake scale the scan is already wide)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    li = load(spark, sf, "lineitem").repartition(n_part)
    buckets = meta_df(spark, 
        [
            ("1992H1", "1992-01-01", "1992-06-30"),
            ("1992H2", "1992-07-01", "1992-12-31"),
            ("1993H1", "1993-01-01", "1993-06-30"),
            ("1993H2", "1993-07-01", "1993-12-31"),
            ("1994H1", "1994-01-01", "1994-06-30"),
            ("1994H2", "1994-07-01", "1994-12-31"),
            ("1995H1", "1995-01-01", "1995-06-30"),
            ("1995H2", "1995-07-01", "1995-12-31"),
            ("1996H1", "1996-01-01", "1996-06-30"),
            ("1996H2", "1996-07-01", "1996-12-31"),
            ("1997H1", "1997-01-01", "1997-06-30"),
            ("1997H2", "1997-07-01", "1997-12-31"),
            ("1998H1", "1998-01-01", "1998-06-30"),
            ("1998H2", "1998-07-01", "1998-12-31"),
        ],
        "bucket string, d_start string, d_end string",
    ).select(
        "bucket",
        F.to_date("d_start").alias("d_start"),
        F.to_date("d_end").alias("d_end"),
    )
    # tiny build side -> broadcast; the range predicate runs as a
    # BroadcastNestedLoopJoin (reference NLJE range-condition matcher)
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_shipdate >= buckets.d_start) & (li.l_shipdate <= buckets.d_end),
            "inner",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("bucket")
    )


RANGE_JOIN_SQL = """
with buckets(bucket, d_start, d_end) as (
  values
    ('1992H1', date '1992-01-01', date '1992-06-30'),
    ('1992H2', date '1992-07-01', date '1992-12-31'),
    ('1993H1', date '1993-01-01', date '1993-06-30'),
    ('1993H2', date '1993-07-01', date '1993-12-31'),
    ('1994H1', date '1994-01-01', date '1994-06-30'),
    ('1994H2', date '1994-07-01', date '1994-12-31'),
    ('1995H1', date '1995-01-01', date '1995-06-30'),
    ('1995H2', date '1995-07-01', date '1995-12-31'),
    ('1996H1', date '1996-01-01', date '1996-06-30'),
    ('1996H2', date '1996-07-01', date '1996-12-31'),
    ('1997H1', date '1997-01-01', date '1997-06-30'),
    ('1997H2', date '1997-07-01', date '1997-12-31'),
    ('1998H1', date '1998-01-01', date '1998-06-30'),
    ('1998H2', date '1998-07-01', date '1998-12-31')
)
select bucket, count(*) as n_items,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty
from lineitem join buckets
  on l_shipdate >= d_start and l_shipdate <= d_end
group by bucket
order by bucket
"""


# --------------------------------------------------------------------------
def map_functions(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").where(F.col("doc_id") <= 300)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.select(
        "doc_id",
        # scalar output only: the driver's canonicalizer sorts rows with
        # pandas and cannot hash list cells -> join keys into one string
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.element_at(m, "lang").alias("lang_v"),
        F.element_at(m, "source").alias("source_v"),
        F.size(m).alias("n_entries"),
        # last_matching_map_entry_for_key (MapFunctions.java): last entry
        # wins among duplicate keys — filter entries array, take last
        F.element_at(
            F.filter(
                F.array(
                    F.struct(F.lit("k").alias("key"), F.lit("first").alias("value")),
                    F.struct(F.lit("k").alias("key"), F.col("lang").alias("value")),
                ),
                lambda e: e["key"] == "k",
            ),
            -1,
        )["value"].alias("last_match"),
    ).orderBy("doc_id")


MAP_FUNCTIONS_SQL = """
select doc_id,
       'lang,source' as keys,
       lang as lang_v,
       source as source_v,
       2 as n_entries,
       lang as last_match
from documents
where doc_id <= 300
order by doc_id
"""


# --------------------------------------------------------------------------
def sample_to_limit(spark: SparkSession, sf: str) -> DataFrame:
    # TABLESAMPLE lowered to limit (SamplePrel -> SampleToLimitPrule):
    # deterministic row-count contract, content-agnostic
    n = load(spark, sf, "lineitem").limit(1000).count()
    return meta_df(spark, [(n,)], "sampled_rows bigint")


SAMPLE_TO_LIMIT_SQL = """
select count(*) as sampled_rows from (select * from lineitem limit 1000)
"""


# --------------------------------------------------------------------------
def union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    supp = load(spark, sf, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("bal"),
    )
    return (
        cust.unionByName(supp, allowMissingColumns=True)
        .groupBy()
        .agg(
            F.count("*").alias("n_rows"),
            F.count("bal").alias("n_bal"),
            F.sum(F.col("key").cast("decimal(18,0)")).cast("bigint").alias("key_sum"),
        )
    )


UNION_BY_NAME_SQL = """
with u as (
  select c_custkey as key, c_name as name, cast(null as double) as bal
  from customer
  union all
  select s_suppkey as key, s_name as name, s_acctbal as bal from supplier
)
select count(*) as n_rows, count(bal) as n_bal,
       cast(sum(cast(key as decimal(18,0))) as bigint) as key_sum
from u
"""


# --------------------------------------------------------------------------
def lateral_sequence(spark: SparkSession, sf: str) -> DataFrame:
    # correlated lateral generation: explode(sequence(...)) per input row —
    # the reference's TableFunction/unnest path (TableFunctionOperator.java:42)
    return (
        load(spark, sf, "orders")
        .where(F.col("o_orderkey") <= 600)
        .select(
            "o_orderkey",
            F.posexplode(F.sequence(F.lit(1), F.lit(3))).alias("pos", "n"),
        )
        .select("o_orderkey", "pos", "n")
        .orderBy("o_orderkey", "pos")
    )


LATERAL_SEQUENCE_SQL = """
select o_orderkey, cast(n - 1 as int) as pos, cast(n as int) as n
from orders, unnest(range(1, 4)) as t(n)
where o_orderkey <= 600
order by o_orderkey, pos
"""


# --------------------------------------------------------------------------
def ndv_approx(spark: SparkSession, sf: str) -> DataFrame:
    """NDV (HLL) — raw estimates are engine-specific, so the
    oracle-checked output is exact NDV + a bounded-error boolean (the
    same contract as op_hll_sketch); tests/test_relational.py still
    asserts the <5% numeric error vs exact."""
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("_ndv"),
            F.count_distinct("l_partkey").alias("exact_partkey"),
        )
        .select(
            "l_returnflag",
            "exact_partkey",
            (
                F.abs(F.col("_ndv") - F.col("exact_partkey"))
                <= 0.05 * F.col("exact_partkey")
            ).alias("ndv_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


NDV_APPROX_SQL = """
select l_returnflag,
       count(distinct l_partkey) as exact_partkey,
       true as ndv_within_5pct
from lineitem
group by l_returnflag
order by l_returnflag
"""


# --------------------------------------------------------------------------
def window_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Forward-fill with LAST_VALUE ... IGNORE NULLS (WindowFunction.java
    framed aggregates; the canonical time-series gap-fill)."""
    from ..catalog import load_events

    ev = load_events(spark, sf).where(F.col("user_id") <= 30)
    sparse = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("value")).alias("v"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "user_id",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    ).orderBy("user_id", "event_id")


WINDOW_GAP_FILL_SQL = """
select user_id, event_id,
       case when event_type = 'click' then value end as v,
       last_value(case when event_type = 'click' then value end ignore nulls)
         over (partition by user_id order by ts, event_id
               rows between unbounded preceding and current row) as v_filled
from events
where user_id <= 30
order by user_id, event_id
"""


# --------------------------------------------------------------------------
def unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT/melt: wide measure columns -> (metric, value) rows — the
    inverse of the pivot operator (Dremio models both through its
    TableFunction/transpose surface)."""
    wide = (
        load(spark, sf, "lineitem")
        .where(F.col("l_orderkey") <= 500)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("price"),
            F.sum(F.col("l_tax").cast("decimal(18,2)")).cast("double").alias("tax"),
        )
    )
    return (
        wide.unpivot(
            ["l_orderkey"], ["qty", "price", "tax"], "metric", "value"
        )
        .orderBy("l_orderkey", "metric")
    )


UNPIVOT_SQL = """
with wide as (
  select l_orderkey,
         cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty,
         cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as price,
         cast(sum(cast(l_tax as decimal(18,2))) as double) as tax
  from lineitem where l_orderkey <= 500 group by l_orderkey
)
select l_orderkey, metric, value from (
  select l_orderkey, 'qty' as metric, qty as value from wide
  union all
  select l_orderkey, 'price', price from wide
  union all
  select l_orderkey, 'tax', tax from wide
)
order by l_orderkey, metric
"""


# --------------------------------------------------------------------------
def salted_aggregation(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe salted two-phase aggregation — must equal the plain
    groupBy (the salt only reshapes the shuffle).  l_returnflag has 3
    hot values over all of lineitem: exactly the pathological-key shape."""
    from ..operators.skew import salted_agg

    li = load(spark, sf, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    return salted_agg(
        li,
        keys=["l_returnflag"],
        measures={
            "n": ("count", "*"),
            "qty_sum": ("sum", "qty_dec"),
            "min_ship": ("min", "l_shipdate"),
            "max_ship": ("max", "l_shipdate"),
        },
        n_salts=16,
    ).withColumn("qty_sum", F.col("qty_sum").cast("double")).orderBy("l_returnflag")


SALTED_AGG_SQL = """
select l_returnflag,
       count(*) as n,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty_sum,
       min(l_shipdate) as min_ship,
       max(l_shipdate) as max_ship
from lineitem
group by l_returnflag
order by l_returnflag
"""


# --------------------------------------------------------------------------
def regr_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-regression aggregates (reference AggrTypes3/Covar/Correlation
    codegen family extended: regr_slope/intercept/r2/avgx/avgy/count)."""
    li = load(spark, sf, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 4).alias("avgx"),
            F.round(F.regr_avgy(y, x), 4).alias("avgy"),
        )
        .orderBy("l_returnflag")
    )


REGR_SQL = """
select l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) as slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) as intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) as r2,
       regr_count(l_extendedprice, l_quantity) as n,
       round(regr_avgx(l_extendedprice, l_quantity), 4) as avgx,
       round(regr_avgy(l_extendedprice, l_quantity), 4) as avgy
from lineitem
group by l_returnflag
order by l_returnflag
"""


# --------------------------------------------------------------------------
def lateral_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL join (top-2 orders per customer) — the
    reference's decorrelated-apply shape (RexSubQueryUtils)."""
    register_testdata(spark, sf)
    return spark.sql(
        """
        select c.c_custkey, t.o_orderkey, t.o_totalprice
        from customer c
        join lateral (
          select o_orderkey, o_totalprice
          from orders o
          where o.o_custkey = c.c_custkey
          order by o_totalprice desc, o_orderkey
          limit 2
        ) t
        where c.c_custkey <= 100
        order by c.c_custkey, t.o_totalprice desc, t.o_orderkey
        """
    )


LATERAL_SUBQUERY_SQL = """
select c.c_custkey, t.o_orderkey, t.o_totalprice
from customer c
join lateral (
  select o_orderkey, o_totalprice
  from orders o
  where o.o_custkey = c.c_custkey
  order by o_totalprice desc, o_orderkey
  limit 2
) t on true
where c.c_custkey <= 100
order by c.c_custkey, t.o_totalprice desc, t.o_orderkey
"""


# --------------------------------------------------------------------------
def applyinpandas_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped applyInPandas custom operator: per-nation z-score of
    supplier balances (Arrow batch per group, numpy math, no driver
    involvement — the grouped-map escape hatch for ops Catalyst can't
    express)."""
    import pandas as pd

    supp = load(spark, sf, "supplier")

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["s_acctbal"]
        std = s.std()  # sample (ddof=1), matches stddev_samp
        if pd.isna(std) or std == 0:
            zs = pd.Series([None] * len(s), dtype="float64")
        else:
            zs = ((s - s.mean()) / std).round(6)
        return pd.DataFrame(
            {"s_nationkey": pdf["s_nationkey"], "s_suppkey": pdf["s_suppkey"], "z": zs}
        )

    return (
        supp.groupBy("s_nationkey")
        .applyInPandas(z, "s_nationkey bigint, s_suppkey bigint, z double")
        .orderBy("s_nationkey", "s_suppkey")
    )


ZSCORE_SQL = """
select s_nationkey, s_suppkey,
       case when stddev_samp(s_acctbal) over w is null
              or stddev_samp(s_acctbal) over w = 0 then null
            else round((s_acctbal - avg(s_acctbal) over w)
                       / stddev_samp(s_acctbal) over w, 6) end as z
from supplier
window w as (partition by s_nationkey)
order by s_nationkey, s_suppkey
"""


# --------------------------------------------------------------------------
def intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — reference rewrites INTERSECT
    via CoreRules.INTERSECT_TO_DISTINCT; ALL is the multiset variant)."""
    cn = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        cn.intersectAll(sn)
        .groupBy("nationkey")
        .agg(F.count("*").alias("multiplicity"))
        .orderBy("nationkey")
    )


INTERSECT_ALL_SQL = """
with i as (
  select c_nationkey as nationkey from customer
  intersect all
  select s_nationkey from supplier
)
select nationkey, count(*) as multiplicity
from i group by nationkey order by nationkey
"""


# --------------------------------------------------------------------------
def skew_kurtosis(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-moment aggregates (AggrTypes3.tdd family completion)."""
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
            F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
        )
        .orderBy("l_linestatus")
    )


# Spark's skewness/kurtosis are POPULATION moments (g1, g2-3); DuckDB's
# are sample-corrected — the oracle derives the population form explicitly
SKEW_KURTOSIS_SQL = """
with m as (
  select l_linestatus, avg(l_quantity) as mq, avg(l_extendedprice) as mp
  from lineitem group by l_linestatus
)
select l.l_linestatus,
       round(avg(pow(l_quantity - mq, 3))
             / pow(avg(pow(l_quantity - mq, 2)), 1.5), 4) as skew_qty,
       round(avg(pow(l_quantity - mq, 4))
             / pow(avg(pow(l_quantity - mq, 2)), 2) - 3, 4) as kurt_qty,
       round(avg(pow(l_extendedprice - mp, 3))
             / pow(avg(pow(l_extendedprice - mp, 2)), 1.5), 4) as skew_price
from lineitem l join m on l.l_linestatus = m.l_linestatus
group by l.l_linestatus
order by l.l_linestatus
"""


# --------------------------------------------------------------------------
def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time lookup: each click joined to the user's most recent
    error at-or-before it (union+window as-of; see operators/asof.py for
    the scale argument). The reference would plan this as a correlated
    range subquery (`RangeConditionRewriteVisitor.java:67`); DuckDB's
    native ASOF JOIN is the oracle."""
    from ..catalog import load_events
    from ..operators.asof import asof_join

    ev = load_events(spark, sf)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # one row per (user_id, ts) so the matched value is deterministic
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    out = asof_join(clicks, errors, on=["user_id"], ts="ts",
                    right_cols=["err_value"], direction="backward")
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("ts_asof").alias("asof_ts"),
        F.round("err_value_asof", 6).alias("asof_value"),
    ).orderBy("event_id")


ASOF_JOIN_SQL = """
with l as (
  select user_id, ts, event_id from events where event_type = 'click'
), r as (
  select user_id, ts, max(value) as err_value
  from events where event_type = 'error' group by user_id, ts
)
select l.user_id, l.event_id, l.ts,
       r.ts as asof_ts, round(r.err_value, 6) as asof_value
from l asof left join r
  on l.user_id = r.user_id and l.ts >= r.ts
order by l.event_id
"""


def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    a user's inter-event gap exceeds 12 h; per-session rollup.

    The batch twin of the streaming `session_window` query — the classic
    lag + running-sum-of-flags rewrite, all inside two window passes over
    ONE shuffle on user_id (both windows and the final groupBy share the
    user_id partitioning, so Catalyst reuses the exchange)."""
    from pyspark.sql.window import Window

    from ..catalog import load_events

    # microsecond-integer gap arithmetic: DuckDB's epoch() is fractional
    # and Spark's cast-to-long floors, so second-granularity comparisons
    # could disagree within ~1 s of the boundary; unix_micros/epoch_us are
    # exact integers in both engines
    gap_us = 12 * 3600 * 1_000_000
    ev = load_events(spark, sf)
    # under spark.sql.timestampType=TIMESTAMP_NTZ the column arrives NTZ,
    # which unix_micros rejects; the LTZ cast (by name — "timestamp"
    # itself resolves to NTZ under that conf) shifts by a constant session
    # offset, which cancels in the inter-event difference
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(ts_us).over(w)
    is_new = (prev.isNull() | ((ts_us - prev) > gap_us)).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("session_id", F.sum(is_new).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "session_start",
            "session_end",
            F.col("n_events").cast("bigint").alias("n_events"),
            "value_sum",
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = """
with marked as (
  select user_id, ts, event_id, value,
         case when lag(epoch_us(ts)) over w is null
                or epoch_us(ts) - lag(epoch_us(ts)) over w > 43200000000
              then 1 else 0 end as is_new
  from events
  window w as (partition by user_id order by ts, event_id)
), sess as (
  select user_id, ts, value,
         sum(is_new) over (partition by user_id order by ts, event_id
                           rows unbounded preceding) as session_id
  from marked
)
select user_id, cast(session_id as bigint) as session_id,
       min(ts) as session_start, max(ts) as session_end,
       cast(count(*) as bigint) as n_events,
       cast(sum(cast(value as decimal(18,4))) as double) as value_sum
from sess
group by user_id, session_id
order by user_id, session_id
"""


RELATIONAL_QUERIES = {
    "op_sessionize": sessionize,
    "op_semi_anti_join": semi_anti_join,
    "op_exists_in_subquery": exists_in_subquery,
    "op_scalar_subquery": scalar_subquery,
    "op_range_join": range_join,
    "op_map_functions": map_functions,
    "op_sample_to_limit": sample_to_limit,
    "op_union_by_name": union_by_name,
    "op_lateral_sequence": lateral_sequence,
    "op_ndv_approx": ndv_approx,
    "op_window_gap_fill": window_gap_fill,
    "op_unpivot": unpivot,
    "op_salted_agg": salted_aggregation,
    "op_regr_aggregates": regr_aggregates,
    "op_lateral_subquery": lateral_subquery,
    "op_applyinpandas_zscore": applyinpandas_zscore,
    "op_intersect_all": intersect_all,
    "op_skew_kurtosis": skew_kurtosis,
    "op_asof_join": asof_join_events,
}

RELATIONAL_ORACLE = {
    "op_sessionize": SESSIONIZE_SQL,
    "op_semi_anti_join": SEMI_ANTI_JOIN_SQL,
    "op_exists_in_subquery": EXISTS_IN_SUBQUERY_SQL,
    "op_scalar_subquery": SCALAR_SUBQUERY_SQL,
    "op_range_join": RANGE_JOIN_SQL,
    "op_map_functions": MAP_FUNCTIONS_SQL,
    "op_sample_to_limit": SAMPLE_TO_LIMIT_SQL,
    "op_union_by_name": UNION_BY_NAME_SQL,
    "op_lateral_sequence": LATERAL_SEQUENCE_SQL,
    "op_ndv_approx": NDV_APPROX_SQL,
    "op_window_gap_fill": WINDOW_GAP_FILL_SQL,
    "op_unpivot": UNPIVOT_SQL,
    "op_salted_agg": SALTED_AGG_SQL,
    "op_regr_aggregates": REGR_SQL,
    "op_lateral_subquery": LATERAL_SUBQUERY_SQL,
    "op_applyinpandas_zscore": ZSCORE_SQL,
    "op_intersect_all": INTERSECT_ALL_SQL,
    "op_skew_kurtosis": SKEW_KURTOSIS_SQL,
    "op_asof_join": ASOF_JOIN_SQL,
}
