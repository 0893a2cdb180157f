"""Statement-surface completion: folders, SHOW TBLPROPERTIES, DESCRIBE
FUNCTION, ALTER ENGINE, COMPACT/LOAD MATERIALIZATION (the remaining
productions in the reference grammar, parserImpls.ftl)."""

from __future__ import annotations

import pytest

from dremio_oss_spark.catalog import load
from dremio_oss_spark.engine import Engine
from dremio_oss_spark.plans import Measure

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def engine(spark):
    e = Engine(spark)
    e.add_testdata_source(SF_SMALL)
    return e


def test_folders_nest_and_protect(engine):
    engine.create_space("marketing")
    engine.create_folder("marketing", "emea.reports")
    assert {"emea", "emea.reports"} <= engine.spaces["marketing"].folders

    # a VDS inside a folder resolves through the dotted path
    engine.create_vds(
        "marketing", "emea.reports.top_nations",
        "select n_name from nation order by n_name limit 3",
    )
    rows = engine.table("marketing.emea.reports.top_nations").collect()
    assert len(rows) == 3

    # VDS in an unknown folder is rejected; non-empty folder can't drop
    with pytest.raises(ValueError, match="no such folder"):
        engine.create_vds("marketing", "nope.v", "select 1")
    with pytest.raises(ValueError, match="not empty"):
        engine.drop_folder("marketing", "emea.reports")
    engine.drop_vds("marketing", "emea.reports.top_nations")
    engine.drop_folder("marketing", "emea.reports")
    assert "emea.reports" not in engine.spaces["marketing"].folders


def test_show_table_properties(engine, spark, tmp_path):
    from dremio_oss_spark.sources import dml

    t = str(tmp_path / "props_t")
    dml.create_table(load(spark, SF_SMALL, "region"), t)
    dml.create_tag(t, "v1")
    props = {r["property"]: r["value"]
             for r in engine.show_table_properties(t).collect()}
    assert props["format"] == "parquet"
    assert props["current_snapshot"]
    assert int(props["n_snapshots"]) >= 1
    assert "main" in props["branches"]
    assert "v1" in props["tags"]


def test_describe_function_shim_and_native(engine):
    shim = engine.describe_function("hash64").collect()[0]
    assert shim["kind"] == "sql_shim" and shim["body"]
    nat = engine.describe_function("abs").collect()[0]
    assert nat["kind"] == "native" and "abs" in nat["body"].lower()


def test_alter_engine_bounds(engine):
    engine.alter_engine("preview", min_replicas=1, max_replicas=4)
    engine.alter_engine("preview", max_replicas=8)
    rows = {r["engine"]: r for r in engine.sys_engines().collect()}
    assert rows["preview"]["min_replicas"] == 1
    assert rows["preview"]["max_replicas"] == 8
    with pytest.raises(ValueError, match="min_replicas"):
        engine.alter_engine("preview", min_replicas=9)
    # failed alter must not have clobbered the stored bounds
    rows = {r["engine"]: r for r in engine.sys_engines().collect()}
    assert rows["preview"]["min_replicas"] == 1


def test_compact_and_load_materialization(spark, tmp_path):
    from dremio_oss_spark.plans.reflections import ReflectionStore

    store = ReflectionStore(spark, str(tmp_path / "refl"))
    li = load(spark, SF_SMALL, "lineitem")
    store.create_aggregation_reflection(
        "li_flag", li, "lineitem", ["l_returnflag"],
        [Measure("sum", "l_quantity"), Measure("count", "*")],
    )
    # incremental-style appends leave multiple files; compaction collapses
    before, after = store.compact_materialization("li_flag")
    assert after == 1 and before >= after

    mat = store.load_materialization("li_flag")
    got = {r["l_returnflag"]: r["count_all"] for r in mat.collect()}
    expect = {r["l_returnflag"]: r["cnt"] for r in
              li.groupBy("l_returnflag").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert got == expect
    assert spark.table("mat_li_flag").count() == len(expect)

    with pytest.raises(KeyError):
        store.compact_materialization("nope")
