"""meta_df (localframe) equivalence: the Arrow fast path must produce
bit-identical rows + schema to the classic createDataFrame it replaces,
and fall back (not corrupt) on payloads the fast path cannot express."""
from __future__ import annotations

import datetime
import decimal

import pytest

from dremio_oss_spark.localframe import meta_df

CASES = [
    ([(1, "one", 1.5), (2, "two", 2.5), (3, "three", None)],
     "id INT, name STRING, score DOUBLE"),
    ([], "a string, b int"),
    ([(None, None)], "a string, b bigint"),
    ([(datetime.date(2020, 1, 2),
       datetime.datetime(2020, 1, 2, 3, 4, 5))], "d date, ts timestamp"),
    ([(decimal.Decimal("1.23"),)], "x decimal(10,2)"),
    ([([1, 2, 3], {"k": "v"})], "arr array<int>, m map<string,string>"),
    ([(True, b"ab")], "f boolean, g binary"),
    # NaN must route to the classic path (Arrow would fold NaN -> null)
    ([(float("nan"), 1)], "x double, y int"),
]


@pytest.mark.parametrize("rows,schema", CASES,
                         ids=[c[1][:28] for c in CASES])
def test_meta_df_matches_classic(spark, rows, schema):
    fast = meta_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert str(fast.schema) == str(slow.schema)
    assert str(fast.collect()) == str(slow.collect())


def test_meta_df_local_table_scan(spark):
    """The fast path must plan as a JVM-local scan (no pickled RDD —
    that is the whole point: actions run with zero Python workers)."""
    spark.conf.set("spark.dremio.localframe.arrow", "true")
    df = meta_df(spark, [(1, "x")], "a int, b string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_meta_df_conf_gate_forces_classic(spark):
    spark.conf.set("spark.dremio.localframe.arrow", "false")
    try:
        df = meta_df(spark, [(1,)], "a int")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" not in plan
        assert df.collect()[0][0] == 1
    finally:
        spark.conf.set("spark.dremio.localframe.arrow", "true")
