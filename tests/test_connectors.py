"""Connector emulations: Mongo find/pipeline dialect, Elastic query DSL +
CONTAINS Lucene parsing, Hive metastore partition pruning.

The servers are in-process, so these tests pin the part the engine owns:
the pushed dialect documents (recorded on last_find / last_pipeline /
last_dsl), their evaluation semantics, and that pruning consults catalog
metadata only.
"""

import pytest

from dremio_oss_spark.sources.elastic import ElasticSource, parse_lucene, tokenize
from dremio_oss_spark.sources.hive import HiveMetastore, read_hive_table
from dremio_oss_spark.sources.mongo import MongoSource, match


DOCS = [
    {"id": 1, "status": "O", "total": 100, "cust": {"mkt": "AUTO", "key": 7}},
    {"id": 2, "status": "F", "total": 250, "cust": {"mkt": "BUILD", "key": 8}},
    {"id": 3, "status": "F", "total": 50, "cust": {"mkt": "AUTO", "key": 9}},
    {"id": 4, "status": "P", "total": 300, "tags": ["a", "b"]},
]


def test_mongo_find_dialect():
    """find() query documents: operators, dotted paths, $and/$or,
    $regex/$exists — MongoFilterRule's target dialect."""
    assert match(DOCS[0], {"status": "O"})
    assert match(DOCS[1], {"total": {"$gte": 250, "$lt": 300}})
    assert not match(DOCS[2], {"total": {"$gt": 50}})
    assert match(DOCS[0], {"cust.mkt": "AUTO"})
    assert match(DOCS[1], {"cust.key": {"$in": [8, 99]}})
    assert match(DOCS[3], {"$or": [{"status": "X"}, {"total": {"$gt": 299}}]})
    assert not match(DOCS[3], {"$and": [{"status": "P"}, {"total": {"$lt": 300}}]})
    assert match(DOCS[1], {"status": {"$regex": "^F$"}})
    assert match(DOCS[3], {"tags": {"$exists": True}})
    assert match(DOCS[0], {"tags": {"$exists": False}})
    assert not match(DOCS[0], {"cust.zip": {"$exists": True}})
    with pytest.raises(ValueError):
        match(DOCS[0], {"total": {"$near": 1}})


def test_mongo_source_find_and_pipeline(spark):
    src = MongoSource(spark, "m")
    src.insert_many("t", DOCS)
    df = src.find("t", {"status": "F"}, projection=["id", "cust.mkt"])
    assert src.last_find["query"] == {"status": "F"}
    got = {(r["id"], r["cust_mkt"]) for r in df.collect()}
    assert got == {(2, "BUILD"), (3, "AUTO")}

    out = src.aggregate("t", [
        {"$match": {"total": {"$gte": 100}}},
        {"$group": {"_id": "$status", "n": {"$sum": 1},
                    "tot": {"$sum": "$total"}, "mx": {"$max": "$total"}}},
        {"$sort": {"_id": 1}},
    ])
    assert [s for st in src.last_pipeline for s in st] == [
        "$match", "$group", "$sort"]
    rows = [(r["_id"], r["n"], r["tot"], r["mx"]) for r in out.collect()]
    assert rows == [("F", 1, 250, 250), ("O", 1, 100, 100),
                    ("P", 1, 300, 300)]

    unwound = src.aggregate("t", [
        {"$match": {"tags": {"$exists": True}}},
        {"$unwind": "$tags"},
        {"$group": {"_id": None, "n": {"$sum": 1}}},
    ])
    assert unwound.collect()[0]["n"] == 2


def test_lucene_parser_to_dsl():
    """CONTAINS query-string subset -> query DSL, per elastic's
    query_string semantics (OR looser than AND, NOT prefix, ranges)."""
    assert parse_lucene("lang:en") == {"match": {"lang": "en"}}
    assert parse_lucene('text:"hash value"') == {
        "match_phrase": {"text": "hash value"}}
    assert parse_lucene("n:[150 TO *]") == {"range": {"n": {"gte": 150.0}}}
    assert parse_lucene("n:[* TO 10]") == {"range": {"n": {"lte": 10.0}}}
    assert parse_lucene("source:src1*") == {"wildcard": {"source": "src1*"}}
    got = parse_lucene("a:1 OR b:2 AND c:3")
    assert got == {"bool": {"should": [
        {"match": {"a": "1"}},
        {"bool": {"must": [{"match": {"b": "2"}}, {"match": {"c": "3"}}]}},
    ]}}
    got = parse_lucene("NOT lang:fr AND lang:en")
    assert got["bool"]["must"][0] == {
        "bool": {"must_not": [{"match": {"lang": "fr"}}]}}
    # implicit OR between adjacent clauses (query_string's default
    # operator), parens grouping
    got = parse_lucene("(a:1 OR a:2) b:3")
    assert got == {"bool": {"should": [
        {"bool": {"should": [{"match": {"a": "1"}}, {"match": {"a": "2"}}]}},
        {"match": {"b": "3"}},
    ]}}
    with pytest.raises(ValueError):
        parse_lucene("(a:1")


def test_elastic_search_and_contains(spark):
    src = ElasticSource(spark, "e")
    src.index_docs("idx", [
        {"id": 1, "lang": "en", "n": 200, "text": "fast hash value scan"},
        {"id": 2, "lang": "en", "n": 100, "text": "value of hash"},
        {"id": 3, "lang": "fr", "n": 300, "text": "valeur"},
        {"id": 4, "lang": "en", "n": 160, "text": "merge sort"},
    ])
    # term + range through explicit DSL
    df = src.search("idx", {"bool": {"must": [
        {"term": {"lang": "en"}}, {"range": {"n": {"gte": 150}}}]}},
        source=["id"])
    assert {r["id"] for r in df.collect()} == {1, 4}
    assert src.last_dsl["query"]["bool"]["must"][0] == {"term": {"lang": "en"}}
    # match requires ALL terms; match_phrase requires adjacency
    hits = src.search("idx", {"match": {"text": "hash value"}}, source=["id"])
    assert {r["id"] for r in hits.collect()} == {1, 2}
    hits = src.search("idx", {"match_phrase": {"text": "hash value"}},
                      source=["id"])
    assert {r["id"] for r in hits.collect()} == {1}
    # CONTAINS end-to-end: parse -> record -> evaluate
    hits = src.contains("idx", 'lang:en AND NOT text:"hash value"',
                        source=["id"])
    assert {r["id"] for r in hits.collect()} == {2, 4}
    assert src.last_dsl["query"]["bool"]["must"][1] == {
        "bool": {"must_not": [{"match_phrase": {"text": "hash value"}}]}}
    assert tokenize("A-b c9!") == ["a", "b", "c9"]


def test_hive_metastore_pruning(spark, tmp_path):
    """Pruning consults catalog metadata only: the pruned partition's
    location can be absent from disk and the read still succeeds."""
    import os

    for k in ("a", "b"):
        spark.createDataFrame(
            [(i, k) for i in range(5)], "id long, tag string"
        ).select("id").write.parquet(os.path.join(tmp_path, f"k={k}"))
    ms = HiveMetastore()
    ms.create_table("t", partition_cols=["k"])
    ms.add_partition("t", {"k": "a"}, os.path.join(tmp_path, "k=a"))
    ms.add_partition("t", {"k": "b"}, os.path.join(tmp_path, "k=b"))
    ms.add_partition("t", {"k": "ghost"}, os.path.join(tmp_path, "k=ghost"))

    df = read_hive_table(spark, ms, "t",
                         partition_filter=lambda pv: pv["k"] != "ghost")
    assert (ms.last_scanned, ms.last_pruned) == (2, 1)
    assert df.count() == 10
    assert dict(df.dtypes)["k"] == "string"
    df_a = read_hive_table(spark, ms, "t",
                           partition_filter=lambda pv: pv["k"] == "a")
    assert (ms.last_scanned, ms.last_pruned) == (1, 2)
    assert {r["k"] for r in df_a.collect()} == {"a"}
    # zero surviving partitions is a normal outcome: EMPTY frame with
    # the table's schema (a filter matching nothing must not error)
    df_none = read_hive_table(spark, ms, "t",
                              partition_filter=lambda pv: False)
    assert df_none.count() == 0 and "k" in df_none.columns
