"""Semantic-layer queries: VDS views, dialect shims, information schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import Engine
from ..localframe import meta_df


def vds_query(spark: SparkSession, sf: str) -> DataFrame:
    """CREATE VDS + query through engine.sql with the NDV dialect shim
    rewritten to approx-free exact form in the projection below (the NDV
    column itself is estimator-specific, so the oracle-checked columns
    are the exact ones; NDV presence is asserted in tests)."""
    eng = Engine(spark)
    eng.add_testdata_source(sf)
    eng.create_space("marketing")
    eng.create_vds(
        "marketing",
        "revenue_by_segment",
        """
        select c.c_mktsegment as segment,
               cast(sum(cast(o.o_totalprice as decimal(18,2))) as double) as revenue,
               count(*) as n_orders
        from orders o join customer c on o.o_custkey = c.c_custkey
        group by c.c_mktsegment
        """,
    )
    return eng.sql(
        """
        select segment, revenue, n_orders
        from marketing.revenue_by_segment
        order by segment
        """
    )


VDS_QUERY_SQL = """
select c_mktsegment as segment,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue,
       count(*) as n_orders
from orders o join customer c on o.o_custkey = c.c_custkey
group by c_mktsegment
order by segment
"""


def info_schema(spark: SparkSession, sf: str) -> DataFrame:
    """INFORMATION_SCHEMA.TABLES over the registered testdata source —
    must list exactly the driver's tables (same set the oracle sees)."""
    eng = Engine(spark)
    eng.add_testdata_source(sf)
    return (
        eng.information_schema_tables()
        .select("table_name")
        .where(
            F.col("table_name").isin(
                "region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings",
            )
        )
        # the producer dedups DIR-source rows against session views,
        # but versioned-source rows (and name overlaps across several
        # sources) union with no per-name dedup — the oracle lists each
        # name once, so distinct() is required for the comparison
        .distinct()
        .orderBy("table_name")
    )


INFO_SCHEMA_SQL = """
select table_name from information_schema.tables
where table_schema = 'main'
order by table_name
"""


def policy_enforcement(spark: SparkSession, sf: str) -> DataFrame:
    """Row-access + column-masking policies enforced on read
    (parserImpls.ftl:298,631 / SqlAlterTableAddRowAccessPolicy): a
    policied SELECT returns only the rows the row policy admits, with
    the masked column rewritten through the masking UDF — the user's
    query never names either policy.  The oracle replicates both policy
    bodies inline."""
    eng = Engine(spark)
    eng.add_testdata_source(sf)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pol_mask_name(v STRING) "
        "RETURNS STRING RETURN concat(substr(v, 1, 9), '#********')")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pol_building_only(s STRING) "
        "RETURNS BOOLEAN RETURN s = 'BUILDING'")
    eng.sql("ALTER TABLE customer ADD ROW ACCESS POLICY "
            "pol_building_only (c_mktsegment)")
    eng.sql("ALTER TABLE customer MODIFY COLUMN c_name "
            "SET MASKING POLICY pol_mask_name (c_name)")
    df = eng.sql(
        "select c_mktsegment, c_name, c_acctbal from customer "
        "order by c_custkey limit 20")
    # the returned plan is already bound to the policied read; restore
    # the session's `customer` view so later queries in a SHARED session
    # see the unpolicied table (the driver runs per-query fresh
    # sessions, pytest does not)
    eng.sql("ALTER TABLE customer MODIFY COLUMN c_name "
            "UNSET MASKING POLICY")
    eng.sql("ALTER TABLE customer DROP ROW ACCESS POLICY "
            "pol_building_only")
    return df


POLICY_ENFORCEMENT_SQL = """
select c_mktsegment, substr(c_name, 1, 9) || '#********' as c_name,
       c_acctbal
from customer
where c_mktsegment = 'BUILDING'
order by c_custkey limit 20
"""


def explore_transforms(spark: SparkSession, sf: str) -> DataFrame:
    """The UI curation path (DatasetVersionResource.java /
    Transformer.java / SQLGenerator.java): new-untitled over orders,
    then filter → calculated field → group-by → sort applied as
    TRANSFORM OBJECTS; the engine runs the REGENERATED SQL.  The
    oracle replays the same pipeline as hand-written SQL, so this
    value-checks the whole state→SQL generator."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("orders", "v0")
    svc.transform("tmp.UNTITLED", "v0", {
        "type": "filter", "sourceColumnName": "o_orderstatus",
        "filter": {"type": "Value",
                   "value": {"values": ["F"], "dataType": "TEXT"}}},
        "v1")
    svc.transform("tmp.UNTITLED", "v1", {
        "type": "addCalculatedField", "newColumnName": "custmod",
        "sourceColumnName": "o_custkey",
        "expression": "o_custkey % 5", "dropSourceColumn": False},
        "v2")
    svc.transform("tmp.UNTITLED", "v2", {
        "type": "groupBy",
        "columnsDimensions": [{"column": "o_orderpriority"}],
        "columnsMeasures": [
            {"type": "Count_Star"},
            {"type": "Sum", "column": "custmod"},
            {"type": "Maximum", "column": "o_totalprice"}]}, "v3")
    svc.transform("tmp.UNTITLED", "v3", {
        "type": "sort", "sortedColumnName": "o_orderpriority",
        "order": "ASC"}, "v4")
    return eng.sql(svc.get_version("tmp.UNTITLED", "v4")["sql"])


EXPLORE_TRANSFORMS_SQL = """
select o_orderpriority,
       count(*) as Count_Star,
       cast(sum(o_custkey % 5) as bigint) as Sum_custmod,
       max(o_totalprice) as Maximum_o_totalprice
from orders where o_orderstatus in ('F')
group by o_orderpriority
order by o_orderpriority
"""


def explore_field_transforms(spark: SparkSession, sf: str) -> DataFrame:
    """Column-cleaning transform family (TransformActor.java:289-320 +
    the FieldTransformation SQL visitors): convert-case, positional
    extract, pattern replace and split each compile to one generated
    statement whose values the oracle replays with plain SQL."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("customer", "e0")
    svc.transform("tmp.UNTITLED", "e0", {
        "type": "convertCase", "columnName": "c_mktsegment",
        "convertCase": "LOWER_CASE", "newColumnName": "seg_lower",
        "dropSourceColumn": False}, "e1")
    svc.transform("tmp.UNTITLED", "e1", {
        "type": "extract", "sourceColumnName": "c_name",
        "newColumnName": "cust_id",
        "rule": {"type": "position", "position": {
            "startIndex": {"value": 9, "direction": "FROM_THE_START"},
            "endIndex": {"value": 17,
                         "direction": "FROM_THE_START"}}},
        "dropSourceColumn": False}, "e2")
    svc.transform("tmp.UNTITLED", "e2", {
        "type": "field", "sourceColumnName": "c_name",
        "newColumnName": "first_token", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "Split", "split": {
                "rule": {"pattern": "#", "matchType": "exact",
                         "ignoreCase": False},
                "position": "FIRST"}}}, "e3")
    df = eng.sql(svc.get_version("tmp.UNTITLED", "e3")["sql"])
    return (df.select("c_custkey", "seg_lower", "cust_id",
                      "first_token")
            .orderBy("c_custkey").limit(50))


EXPLORE_FIELD_TRANSFORMS_SQL = """
select c_custkey,
       lower(c_mktsegment) as seg_lower,
       substring(c_name, 10, 9) as cust_id,
       str_split(c_name, '#')[1] as first_token
from customer
order by c_custkey limit 50
"""


def explore_clean_transforms(spark: SparkSession, sf: str) -> DataFrame:
    """The remaining FieldTransformation kinds (SQLGenerator.java
    visitors :1136-1330 + TransformActor.java:693): range replace,
    list extraction (single index + inclusive from-the-end slice),
    number↔date round-trip (EPOCH/EXCEL serials), and
    split-by-data-type — one generated statement per version, the
    final SQL value-checked against the oracle's plain-SQL replay.
    Number↔date composes TIMESTAMP_SECONDS with UNIX_TIMESTAMP, so the
    check is timezone-free (the oracle replays the identity)."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("orders", "x0")
    svc.transform("tmp.UNTITLED", "x0", {
        "type": "field", "sourceColumnName": "o_totalprice",
        "newColumnName": "price_banded", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "ReplaceRange", "replaceRange": {
                "lowerBound": "1000", "upperBound": "50000",
                "lowerBoundInclusive": True,
                "replacementValue": "-1",
                "replacementType": "INTEGER"}}}, "x1")
    svc.transform("tmp.UNTITLED", "x1", {
        "type": "field", "sourceColumnName": "o_orderpriority",
        "newColumnName": "prio_parts", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "Split", "split": {
                "rule": {"pattern": "-", "matchType": "exact"},
                "position": "ALL"}}}, "x2")
    svc.transform("tmp.UNTITLED", "x2", {
        "type": "field", "sourceColumnName": "prio_parts",
        "newColumnName": "prio_word", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "ExtractList", "extractList": {"rule": {
                "type": "single", "single": {"index": 1}}}}}, "x3")
    svc.transform("tmp.UNTITLED", "x3", {
        "type": "field", "sourceColumnName": "prio_parts",
        "newColumnName": "prio_tail_arr", "dropSourceColumn": True,
        "fieldTransformation": {
            "type": "ExtractList", "extractList": {"rule": {
                "type": "multiple", "multiple": {"selection": {
                    "start": {"value": 0,
                              "direction": "FROM_THE_END"},
                    "end": {"value": 0,
                            "direction": "FROM_THE_END"}}}}}}}, "x4a")
    # driver compare hashes scalars only — join the slice to text
    svc.transform("tmp.UNTITLED", "x4a", {
        "type": "field", "sourceColumnName": "prio_tail_arr",
        "newColumnName": "prio_tail", "dropSourceColumn": True,
        "fieldTransformation": {
            "type": "ConvertListToText",
            "listToText": {"delimiter": "|"}}}, "x4")
    svc.transform("tmp.UNTITLED", "x4", {
        "type": "addCalculatedField", "newColumnName": "epoch_s",
        "sourceColumnName": "o_orderkey",
        "expression": "CAST(o_orderkey AS BIGINT) * 86400",
        "dropSourceColumn": False}, "x5")
    svc.transform("tmp.UNTITLED", "x5", {
        "type": "field", "sourceColumnName": "epoch_s",
        "newColumnName": "as_ts", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "ConvertNumberToDate", "numberToDate": {
                "format": "EPOCH", "desiredType": "DATETIME"}}}, "x6")
    svc.transform("tmp.UNTITLED", "x6", {
        "type": "field", "sourceColumnName": "as_ts",
        "newColumnName": "excel_serial", "dropSourceColumn": True,
        "fieldTransformation": {
            "type": "ConvertDateToNumber", "dateToNumber": {
                "format": "EXCEL", "desiredType": "INTEGER",
                "convertType": "DATETIME"}}}, "x7")
    svc.transform("tmp.UNTITLED", "x7", {
        "type": "addCalculatedField", "newColumnName": "mixed",
        "sourceColumnName": "o_orderpriority",
        "expression": "CASE WHEN o_orderkey % 2 = 0 "
                      "THEN CAST(o_orderkey AS STRING) "
                      "ELSE o_orderpriority END",
        "dropSourceColumn": False}, "x8")
    svc.transform("tmp.UNTITLED", "x8", {
        "type": "splitByDataType", "sourceColumnName": "mixed",
        "newColumnNamePrefix": "mixed_", "dropSourceColumn": True,
        "selectedTypesList": ["INTEGER", "TEXT"]}, "x9")
    df = eng.sql(svc.get_version("tmp.UNTITLED", "x9")["sql"])
    return (df.select("o_orderkey", "price_banded", "prio_word",
                      "prio_tail", "excel_serial", "mixed_INTEGER",
                      "mixed_TEXT")
            .orderBy("o_orderkey").limit(200))


EXPLORE_CLEAN_TRANSFORMS_SQL = """
select o_orderkey,
       case when 1000 <= o_totalprice and 50000 > o_totalprice
            then -1 else o_totalprice end as price_banded,
       str_split(o_orderpriority, '-')[2] as prio_word,
       str_split(o_orderpriority, '-')[-1] as prio_tail,
       o_orderkey + 25569 as excel_serial,
       try_cast(case when o_orderkey % 2 = 0
                     then cast(o_orderkey as varchar)
                     else o_orderpriority end as bigint)
           as mixed_INTEGER,
       case when o_orderkey % 2 = 0
            then cast(o_orderkey as varchar)
            else o_orderpriority end as mixed_TEXT
from orders
order by o_orderkey limit 200
"""


def explore_reapply(spark: SparkSession, sf: str) -> DataFrame:
    """editOriginalSql (DatasetVersionResource.java:999 /
    Transformer.editOriginalSql:143): replay the stored transform
    chain from the root state and run the REGENERATED head SQL — the
    'transforms are the source of truth' contract, value-checked
    against the oracle's hand-written replay of the same chain
    (rename → range filter → group-by → sort)."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("customer", "r0")
    svc.transform("tmp.UNTITLED", "r0", {
        "type": "rename", "oldColumnName": "c_mktsegment",
        "newColumnName": "segment"}, "r1")
    svc.transform("tmp.UNTITLED", "r1", {
        "type": "filter", "sourceColumnName": "c_acctbal",
        "filter": {"type": "Range", "range": {
            "lowerBound": "0", "dataType": "FLOAT"}}}, "r2")
    svc.transform("tmp.UNTITLED", "r2", {
        "type": "groupBy",
        "columnsDimensions": [{"column": "segment"}],
        "columnsMeasures": [
            {"type": "Count_Star"},
            {"type": "Average", "column": "c_acctbal"}]}, "r3")
    svc.transform("tmp.UNTITLED", "r3", {
        "type": "sort", "sortedColumnName": "segment",
        "order": "ASC"}, "r4")
    head_sql = svc.get_version("tmp.UNTITLED", "r4")["sql"]
    out = svc.reapply("tmp.UNTITLED", "r4", "r5")
    assert out["sql"] == head_sql  # regeneration is EXACT
    df = eng.sql(out["sql"])
    # decimal-cast the float aggregate (oracle-hash stability; see
    # queries/tpch.py docstring)
    return df.select(
        "segment", "Count_Star",
        F.round(F.col("Average_c_acctbal").cast("decimal(18,3)"),
                2).cast("double").alias("avg_bal"))


EXPLORE_REAPPLY_SQL = """
select c_mktsegment as segment,
       count(*) as Count_Star,
       cast(round(cast(avg(c_acctbal) as decimal(18,3)), 2) as double) as avg_bal
from customer
where c_acctbal > 0
group by c_mktsegment
order by segment
"""


def explore_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Column value-distribution, numeric arm (HistogramGenerator.
    java:110-320): BUCKETS=200 bins keyed ROUND(col/width)*width with
    width = (max-min)/BUCKETS from a MIN/MAX prelim query.  The
    ExploreService path is exercised first (bounded, percent-summing
    payload); the returned frame re-expresses the identical binning
    with INTEGER bin ids so the DuckDB oracle replays the same IEEE
    arithmetic hash-safely (float bin labels would drift on
    formatting, not value)."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("orders", "h0")
    card = svc.value_histogram("tmp.UNTITLED", "h0", "o_totalprice")
    vals = card["availableValues"]
    assert 0 < len(vals) <= 202, len(vals)
    assert sum(v["count"] for v in vals) == \
        card["availableValuesCount"]
    mm = eng.sql("SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo, "
                 "CAST(MAX(o_totalprice) AS DOUBLE) AS hi "
                 "FROM orders").collect()[0]
    width = abs(mm["hi"] - mm["lo"]) / 200
    return eng.sql(
        f"SELECT CAST(ROUND(CAST(o_totalprice AS DOUBLE)/{width!r}) "
        f"AS BIGINT) AS bin_idx, COUNT(*) AS cnt "
        f"FROM orders GROUP BY bin_idx ORDER BY bin_idx")


EXPLORE_VALUE_HISTOGRAM_SQL = """
with mm as (select cast(min(o_totalprice) as double) as lo,
                   cast(max(o_totalprice) as double) as hi
            from orders)
select cast(round(cast(o_totalprice as double) / ((hi - lo) / 200))
            as bigint) as bin_idx,
       count(*) as cnt
from orders, mm
group by bin_idx
order by bin_idx
"""


def explore_values_card(spark: SparkSession, sf: str) -> DataFrame:
    """Replace-values card, text arm (HistogramGenerator group-by-value
    + getSelectionCount; DatasetVersionResource.genReplaceValuesCard):
    the SERVICE OUTPUT itself becomes the result frame — every
    (value, count) pair plus the matched/total summary rows — so the
    oracle value-checks the card end-to-end, not just the SQL it
    runs."""
    from ..explore import ExploreService

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("customer", "vc0")
    card = svc.values_card("tmp.UNTITLED", "vc0", "c_mktsegment",
                           selected=["BUILDING"])
    assert card["matchedValues"] + card["unmatchedValues"] == \
        card["availableValuesCount"]
    rows = [(v["value"], int(v["count"]))
            for v in card["availableValues"]]
    rows.append(("__matched__", int(card["matchedValues"])))
    rows.append(("__total__", int(card["availableValuesCount"])))
    return meta_df(spark, rows, "val string, cnt bigint")


EXPLORE_VALUES_CARD_SQL = """
select c_mktsegment as val, count(*) as cnt
from customer group by c_mktsegment
union all
select '__matched__' as val, count(*) as cnt
from customer where c_mktsegment = 'BUILDING'
union all
select '__total__' as val, count(*) as cnt from customer
"""


def explore_json_extract_path(spark: SparkSession, sf: str
                              ) -> DataFrame:
    """JSON cell selection → element path → extract transform
    (JSONElementLocator.java locate + ExtractMapRecommender /
    ExtractListRecommender getRules): render a nested cell to JSON,
    locate two character-range selections (a nested struct member and
    an array element), feed the recommended rules into the
    extract_map/extract_list TRANSFORMS, and run the regenerated SQL —
    the oracle replays the flattening by hand, value-checking the
    locate→recommend→SQL pipeline end-to-end."""
    import json as _json

    from ..explore import (ExploreService, recommend_extract_list,
                           recommend_extract_map)

    eng = Engine(spark)
    eng.add_testdata_source(sf)
    svc = ExploreService(eng)
    svc.new_untitled_from_table("orders", "jp0")
    svc.transform("tmp.UNTITLED", "jp0", {
        "type": "addCalculatedField", "newColumnName": "payload",
        "sourceColumnName": "o_orderstatus",
        "expression": "named_struct('status', o_orderstatus, 'prio', "
                      "named_struct('label', o_orderpriority), "
                      "'prices', array(o_totalprice, "
                      "o_totalprice * 2))",
        "dropSourceColumn": False}, "j0")
    # render one cell the way the UI does and select inside it
    row = eng.sql(svc.get_version("tmp.UNTITLED", "j0")["sql"]) \
        .limit(1).collect()[0]
    cell = _json.dumps(row["payload"].asDict(recursive=True))
    frag = _json.loads(cell)["prio"]["label"]
    off = cell.find(f'"{frag}"') + 1
    map_rules = recommend_extract_map(
        {"cellText": cell, "offset": off, "length": len(frag)})
    assert map_rules == [{"path": "prio.label"}], map_rules
    arr_cell = _json.dumps(
        _json.loads(cell)["prices"])
    a_off = arr_cell.find(",") + 2
    list_rules = recommend_extract_list(
        {"cellText": arr_cell, "offset": a_off,
         "length": len(arr_cell) - a_off - 1})
    assert list_rules == [{"type": "single",
                           "single": {"index": 1}}], list_rules
    svc.transform("tmp.UNTITLED", "j0", {
        "type": "field", "sourceColumnName": "payload",
        "newColumnName": "prio_label", "dropSourceColumn": False,
        "fieldTransformation": {
            "type": "ExtractMap",
            "extractMap": {"rule": map_rules[0]}}}, "j1")
    svc.transform("tmp.UNTITLED", "j1", {
        "type": "addCalculatedField", "newColumnName": "price2",
        "sourceColumnName": "payload",
        "expression": "payload['prices'][1]",
        "dropSourceColumn": False}, "j2")
    v = "j2"
    for i, col in enumerate(["payload", "o_custkey", "o_orderstatus",
                             "o_totalprice", "o_orderdate",
                             "o_orderpriority"]):
        svc.transform("tmp.UNTITLED", v, {
            "type": "drop", "droppedColumnName": col}, f"j3_{i}")
        v = f"j3_{i}"
    return eng.sql(svc.get_version("tmp.UNTITLED", v)["sql"])


EXPLORE_JSON_EXTRACT_SQL = """
select o_orderkey,
       o_orderpriority as prio_label,
       o_totalprice * 2 as price2
from orders
"""


SEMANTIC_QUERIES = {
    "cat_json_extract_path": explore_json_extract_path,
    "cat_value_histogram": explore_value_histogram,
    "cat_values_card": explore_values_card,
    "cat_vds_query": vds_query,
    "cat_information_schema": info_schema,
    "cat_policy_enforcement": policy_enforcement,
    "cat_explore_transforms": explore_transforms,
    "cat_explore_field_transforms": explore_field_transforms,
    "cat_explore_clean_transforms": explore_clean_transforms,
    "cat_explore_reapply": explore_reapply,
}

SEMANTIC_ORACLE = {
    "cat_json_extract_path": EXPLORE_JSON_EXTRACT_SQL,
    "cat_value_histogram": EXPLORE_VALUE_HISTOGRAM_SQL,
    "cat_values_card": EXPLORE_VALUES_CARD_SQL,
    "cat_vds_query": VDS_QUERY_SQL,
    "cat_information_schema": INFO_SCHEMA_SQL,
    "cat_policy_enforcement": POLICY_ENFORCEMENT_SQL,
    "cat_explore_transforms": EXPLORE_TRANSFORMS_SQL,
    "cat_explore_field_transforms": EXPLORE_FIELD_TRANSFORMS_SQL,
    "cat_explore_clean_transforms": EXPLORE_CLEAN_TRANSFORMS_SQL,
    "cat_explore_reapply": EXPLORE_REAPPLY_SQL,
}
