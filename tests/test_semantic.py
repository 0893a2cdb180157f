"""Semantic layer: VDS, spaces, dialect shims, sys tables."""

from __future__ import annotations

import pytest

from dremio_oss_spark.engine import Engine
from dremio_oss_spark.queries import semantic_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(semantic_q.SEMANTIC_ORACLE))
def test_semantic_parity(spark, oracle, name):
    df = semantic_q.SEMANTIC_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(semantic_q.SEMANTIC_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_ndv_dialect_shim(spark):
    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    rows = eng.sql("select NDV(o_custkey) as ndv from orders").collect()
    assert rows[0]["ndv"] > 0


def test_vds_drop(spark):
    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    eng.create_vds("s1", "v1", "select 1 as x")
    assert eng.table("s1.v1").collect()[0]["x"] == 1
    eng.drop_vds("s1", "v1")
    with pytest.raises(Exception):
        eng.table("s1.v1").collect()


def test_sys_tables(spark):
    eng = Engine(spark)
    assert eng.sys_version().collect()[0]["version"] == spark.version
    opts = {r["name"]: r["value"] for r in eng.sys_options().collect()}
    assert opts["spark.sql.adaptive.enabled"] == "true"


def test_explain_shows_pushdown(spark):
    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    plan = eng.explain(
        "select l_returnflag from lineitem where l_shipdate <= date '1998-09-02'"
    )
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_context_functions(spark):
    eng = Engine(spark)
    row = eng.sql(
        "select query_user() as qu, current_schema_fn() as cs, "
        "typeof(1.5d) as t"
    ).collect()[0]
    assert row["qu"]
    assert row["cs"]
    assert row["t"] == "double"


def test_grant_revoke_enforcement(spark):
    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    # open by default
    assert eng.table("region", user="alice").count() == 5
    eng.grant("SELECT", "region", "bob")
    assert eng.table("region", user="bob").count() == 5
    with pytest.raises(PermissionError):
        eng.table("region", user="alice")
    eng.revoke("SELECT", "region", "bob")
    with pytest.raises(PermissionError):
        eng.table("region", user="bob")
