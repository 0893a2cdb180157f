"""Connector coverage queries: Mongo-style, Elastic-style, Hive-style
sources (SURVEY.md §2.3 — `plugins/mongo`, `plugins/elasticsearch`,
`plugins/hive2`).

Each source's server side is an in-process emulation (no services exist
in this container), but the engine-facing pushdown dialects — Mongo find
documents and aggregation pipelines, Elastic query DSL and CONTAINS
Lucene strings, Hive metastore partition pruning — are real, recorded,
and asserted.  The oracle re-derives every result straight from the
parquet tables, so the pushdown evaluation itself is value-checked.

All collections/indexes here are bounded (dimension-sized) by the same
contract as `sources/external.py`: pushdown exists precisely so only
reduced results cross the wire.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


# --------------------------------------------------------------------------
# Mongo: find + aggregation-pipeline pushdown (plugins/mongo)
def _order_docs(spark: SparkSession, sf: str) -> list[dict]:
    """Orders ⨝ customer as nested documents (bounded: 1-in-20 sample,
    sampled by key in the parquet scan before anything is collected)."""
    rows = (
        load(spark, sf, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .join(load(spark, sf, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.col("c_custkey").alias("ckey"),
            F.col("c_mktsegment").alias("mkt"),
        )
        .collect()
    )
    return [
        {"okey": r["okey"], "status": r["status"], "priority": r["priority"],
         "cents": r["cents"],
         "cust": {"key": r["ckey"], "mkt": r["mkt"]}}
        for r in rows
    ]


def mongo_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregation-pipeline pushdown ($match/$group/$sort) plus a find()
    with a dotted-path $in filter; both run server-side and only the
    reduced results enter Spark."""
    from ..sources.mongo import MongoSource

    src = MongoSource(spark, "mongo")
    src.insert_many("orders", _order_docs(spark, sf))
    grouped = src.aggregate("orders", [
        {"$match": {"status": "F", "cents": {"$gt": 5_000_000}}},
        {"$group": {"_id": "$priority",
                    "n_orders": {"$sum": 1},
                    "cents_sum": {"$sum": "$cents"},
                    "cents_max": {"$max": "$cents"}}},
        {"$sort": {"_id": 1}},
    ]).withColumnRenamed("_id", "priority")
    found = src.find(
        "orders",
        {"cust.mkt": {"$in": ["BUILDING", "AUTOMOBILE"]}, "status": "O"},
        projection=["okey"],
    )
    n_found = found.groupBy().agg(
        F.count("*").cast("bigint").alias("n_found"))
    return (
        grouped.select(
            "priority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("cents_sum").cast("bigint").alias("cents_sum"),
            F.col("cents_max").cast("bigint").alias("cents_max"),
        )
        .crossJoin(n_found)
        .orderBy("priority")
    )


MONGO_PIPELINE_SQL = """
with docs as (
  select o.o_orderkey as okey, o.o_orderstatus as status,
         o.o_orderpriority as priority,
         cast(round(o.o_totalprice * 100) as bigint) as cents,
         c.c_mktsegment as mkt
  from orders o join customer c on o.o_custkey = c.c_custkey
  where o.o_orderkey % 20 = 0
)
select priority,
       cast(count(*) as bigint) as n_orders,
       cast(sum(cents) as bigint) as cents_sum,
       cast(max(cents) as bigint) as cents_max,
       (select cast(count(*) as bigint) from docs
         where mkt in ('BUILDING', 'AUTOMOBILE') and status = 'O') as n_found
from docs
where status = 'F' and cents > 5000000
group by priority
order by priority
"""


# --------------------------------------------------------------------------
# Elastic: CONTAINS Lucene string -> query DSL pushdown (plugins/elasticsearch)
def elastic_contains(spark: SparkSession, sf: str) -> DataFrame:
    """CONTAINS('text:"hash value" OR (lang:en AND n_chars:[150 TO *]
    AND source:src1*)') parsed to bool/match_phrase/range/wildcard DSL,
    evaluated server-side with analyzer-consistent tokenization."""
    from ..sources.elastic import ElasticSource

    src = ElasticSource(spark, "search")
    src.index_docs("docs", [
        r.asDict() for r in
        load(spark, sf, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ])
    hits = src.contains(
        "docs",
        'text:"hash value" OR (lang:en AND n_chars:[150 TO *] '
        "AND source:src1*)",
        source=["doc_id", "lang", "n_chars"],
    )
    return (
        hits.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_hits"),
             F.sum("n_chars").cast("bigint").alias("chars_sum"))
        .orderBy("lang")
    )


ELASTIC_CONTAINS_SQL = """
select lang,
       cast(count(*) as bigint) as n_hits,
       cast(sum(n_chars) as bigint) as chars_sum
from documents
where regexp_matches(lower(text),
        '(^|[^a-z0-9])hash[^a-z0-9]+value([^a-z0-9]|$)')
   or (lang = 'en' and n_chars >= 150 and lower(source) like 'src1%')
group by lang
order by lang
"""


# --------------------------------------------------------------------------
# Hive: metastore-registered partitions pruned at plan time (plugins/hive2)
def hive_partitions(spark: SparkSession, sf: str) -> DataFrame:
    """Register a partitioned table in the metastore emulation, then read
    with a partition predicate: pruning happens against metastore
    metadata (partition values -> locations) before any file is opened,
    mirroring HivePartitionPruning/PruneScanRule."""
    import shutil

    from ..sources.hive import HiveMetastore, read_hive_table

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".scratch", f"hive_ms-{os.path.basename(os.path.normpath(sf))}")
    shutil.rmtree(root, ignore_errors=True)
    base = os.path.join(root, "orders_by_priority")
    (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(base)
    )
    ms = HiveMetastore()
    ms.create_table("orders_p", partition_cols=["o_orderpriority"])
    for d in sorted(os.listdir(base)):
        if "=" in d:
            ms.add_partition(
                "orders_p",
                {"o_orderpriority": d.split("=", 1)[1].replace("%20", " ")},
                os.path.join(base, d),
            )
    df = read_hive_table(
        spark, ms, "orders_p",
        partition_filter=lambda pv: pv["o_orderpriority"]
        in ("1-URGENT", "2-HIGH"),
    )
    assert ms.last_scanned == 2 and ms.last_pruned == 3, (
        ms.last_scanned, ms.last_pruned)
    return (
        df.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .cast("bigint").alias("cents_sum"))
        .orderBy("o_orderpriority")
    )


HIVE_PARTITIONS_SQL = """
select o_orderpriority,
       cast(count(*) as bigint) as n_orders,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
         as cents_sum
from orders
where o_orderpriority in ('1-URGENT', '2-HIGH')
group by o_orderpriority
order by o_orderpriority
"""


CONNECTOR_QUERIES = {
    "ext_mongo_pipeline": mongo_pipeline,
    "ext_elastic_contains": elastic_contains,
    "ext_hive_partitions": hive_partitions,
}

CONNECTOR_ORACLE = {
    "ext_mongo_pipeline": MONGO_PIPELINE_SQL,
    "ext_elastic_contains": ELASTIC_CONTAINS_SQL,
    "ext_hive_partitions": HIVE_PARTITIONS_SQL,
}
