"""Type-system coverage: cast matrix, coercions, TIME policy, TRY_CAST,
UNION-type promotion.

Reference targets (dremio-oss):
- cast matrix: `sabot/kernel/src/main/codegen/data/Casts.tdd` + templates;
  implicit-coercion spec `exec/resolver/TypeCastRules.java`.
- type enum: `protocol/src/main/protobuf/Types.proto:23` — TIME is
  millis-since-midnight with no Spark equivalent (SURVEY.md §1.3): policy
  here is BIGINT millis, derivable and orderable.
- UNION (mixed-type) columns from JSON schema learning: policy is
  promote-to-string + TYPEOF emulation (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, load_events


def cast_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Numeric/string/date/timestamp cast lattice over real columns."""
    ev = load_events(spark, sf).where(F.col("event_id") <= 500)
    return ev.select(
        "event_id",
        F.col("value").cast("int").alias("dbl_to_int"),
        # decimal rendered as string: pandas keeps Decimal objects while
        # DuckDB fetchdf renders DECIMAL as float64 -> pin to string
        F.col("value").cast("decimal(12,3)").cast("string").alias("dbl_to_dec"),
        F.col("value").cast("string").alias("dbl_to_str"),
        F.col("event_id").cast("double").alias("long_to_dbl"),
        F.col("event_id").cast("string").alias("long_to_str"),
        F.col("ts").cast("date").cast("string").alias("ts_to_date"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_to_str"),
        F.unix_timestamp("ts").alias("ts_to_epoch"),
        # TIME policy: millis since midnight as BIGINT (Types.proto TIME)
        (
            F.hour("ts") * 3600000
            + F.minute("ts") * 60000
            + F.second("ts") * 1000
        ).cast("bigint").alias("time_millis"),
    ).orderBy("event_id")


CAST_MATRIX_SQL = """
select event_id,
       cast(trunc(value) as int) as dbl_to_int,
       cast(cast(value as decimal(12,3)) as varchar) as dbl_to_dec,
       cast(value as varchar) as dbl_to_str,
       cast(event_id as double) as long_to_dbl,
       cast(event_id as varchar) as long_to_str,
       cast(cast(ts as date) as varchar) as ts_to_date,
       strftime(ts, '%Y-%m-%d %H:%M:%S') as ts_to_str,
       floor(epoch(ts))::bigint as ts_to_epoch,
       (hour(ts) * 3600000 + minute(ts) * 60000
        + date_part('second', ts)::bigint * 1000)::bigint as time_millis
from events
where event_id <= 500
order by event_id
"""


def try_cast_coercion(spark: SparkSession, sf: str) -> DataFrame:
    """TRY_CAST (error-free cast) + implicit comparison coercions
    (TypeCastRules.java: string/number comparison promotes to number)."""
    docs = load(spark, sf, "documents").where(F.col("doc_id") <= 500)
    return docs.select(
        "doc_id",
        F.expr("try_cast(lang as int)").alias("lang_as_int"),  # null, no error
        F.expr("try_cast(cast(doc_id as string) as bigint)").alias("id_roundtrip"),
        # implicit coercion: string column compared to numeric literal
        (F.col("n_chars").cast("string") == F.lit(100)).alias("str_num_eq"),
        F.expr("try_cast('not-a-number' as int)").alias("bad_int"),  # null
        F.expr("year(try_cast('2024-02-30' as date))").alias("bad_date_year"),
    ).orderBy("doc_id")


TRY_CAST_SQL = """
select doc_id,
       try_cast(lang as int) as lang_as_int,
       try_cast(cast(doc_id as varchar) as bigint) as id_roundtrip,
       n_chars = 100 as str_num_eq,
       try_cast('not-a-number' as int) as bad_int,
       year(try_cast('2024-02-30' as date)) as bad_date_year
from documents
where doc_id <= 500
order by doc_id
"""


def union_type_promotion(spark: SparkSession, sf: str) -> DataFrame:
    """UNION-type policy: a column observed with mixed types promotes to
    string, with TYPEOF preserved beside it (SURVEY.md §7.2; reference
    UNION MinorType from JSON schema learning)."""
    docs = load(spark, sf, "documents").where(F.col("doc_id") <= 300)
    mixed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.col("lang"))
        .otherwise(F.col("n_chars").cast("string"))
        .alias("mixed_val"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("bigint"))
        .when(F.col("doc_id") % 3 == 1, F.lit("varchar"))
        .otherwise(F.lit("bigint"))
        .alias("val_type"),
    )
    return mixed.groupBy("val_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("mixed_val").alias("n_distinct"),
    ).orderBy("val_type")


UNION_TYPE_SQL = """
with mixed as (
  select doc_id,
         case when doc_id % 3 = 0 then cast(doc_id as varchar)
              when doc_id % 3 = 1 then lang
              else cast(n_chars as varchar) end as mixed_val,
         case when doc_id % 3 = 0 then 'bigint'
              when doc_id % 3 = 1 then 'varchar'
              else 'bigint' end as val_type
  from documents where doc_id <= 300
)
select val_type, count(*) as n, count(distinct mixed_val) as n_distinct
from mixed group by val_type order by val_type
"""


def implicit_coercion(spark: SparkSession, sf: str) -> DataFrame:
    """Implicit comparison coercions (TypeCastRules.java): string-vs-int
    equality, double-vs-int-literal ranges, timestamp-vs-string-literal
    ordering, decimal-vs-double equality, bigint IN over a string list —
    each as a per-row boolean pinned against the oracle."""
    o = load(spark, sf, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        (F.col("o_custkey").cast("string") == F.col("o_custkey"))
        .alias("str_eq_int"),
        (F.col("o_totalprice") > 100000).alias("dbl_gt_intlit"),
        (F.col("o_orderdate") < "1996-01-01").alias("ts_lt_strlit"),
        (F.col("o_totalprice").cast("decimal(18,2)")
         == F.col("o_totalprice").cast("decimal(18,2)").cast("double"))
        .alias("dec_eq_dbl"),
        F.col("o_orderkey").isin("1", "2", "300").alias("int_in_strlist"),
    ).orderBy("o_orderkey")


IMPLICIT_COERCION_SQL = """
select o_orderkey,
       cast(o_custkey as varchar) = o_custkey as str_eq_int,
       o_totalprice > 100000 as dbl_gt_intlit,
       o_orderdate < '1996-01-01' as ts_lt_strlit,
       cast(o_totalprice as decimal(18,2))
         = cast(cast(o_totalprice as decimal(18,2)) as double) as dec_eq_dbl,
       o_orderkey in ('1', '2', '300') as int_in_strlist
from orders
where o_orderkey <= 500
order by o_orderkey
"""


TYPES_QUERIES = {
    "type_implicit_coercion": implicit_coercion,
    "type_cast_matrix": cast_matrix,
    "type_try_cast_coercion": try_cast_coercion,
    "type_union_promotion": union_type_promotion,
}

TYPES_ORACLE = {
    "type_implicit_coercion": IMPLICIT_COERCION_SQL,
    "type_cast_matrix": CAST_MATRIX_SQL,
    "type_try_cast_coercion": TRY_CAST_SQL,
    "type_union_promotion": UNION_TYPE_SQL,
}
