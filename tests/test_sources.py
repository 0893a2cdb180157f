"""Source/format/writer/DML queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import sources_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(sources_q.SOURCES_ORACLE))
def test_sources_parity(spark, oracle, name):
    df = sources_q.SOURCES_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(sources_q.SOURCES_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_format_registry_lists_formats(spark):
    from dremio_oss_spark.sources.formats import FormatRegistry

    fmts = FormatRegistry(spark).formats()
    for f in ("parquet", "csv", "tsv", "psv", "json", "arrow", "orc"):
        assert f in fmts


def test_pipe_registry_ingest_dedup(spark):
    import os

    from dremio_oss_spark.queries.sources_q import _scratch
    from dremio_oss_spark.streaming.pipes import PipeRegistry

    d = _scratch("pipe", SF_SMALL)
    reg = PipeRegistry(spark)
    p = reg.create_pipe(
        "p1", os.path.join(d, "tgt"), os.path.join(SF_SMALL, "region.parquet")
    )
    assert p.run(spark) == 5
    assert reg.run("p1") == 0  # second pass: everything deduped
    assert reg.pipes() == ["p1"]


def test_excel_format_gated(spark):
    import pytest as _pytest

    from dremio_oss_spark.sources.formats import FormatRegistry

    reg = FormatRegistry(spark)
    assert "xlsx" in reg.formats()
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError):
            reg.read("/nonexistent.xlsx", "xlsx")


def test_copy_into_on_error_continue(spark):
    import os

    from dremio_oss_spark.queries.sources_q import _scratch
    from dremio_oss_spark.sources.writer import copy_into, read_table

    d = _scratch("onerror", SF_SMALL)
    src = os.path.join(d, "in.csv")
    with open(src, "w") as f:
        f.write("a,b\n1,x\n2,y\nnot_an_int_row_with_extra,,,,\n3,z\n")
    n = copy_into(
        spark,
        os.path.join(d, "tgt"),
        src,
        fmt="csv",
        schema="a int, b string",
        on_error="continue",
        header="true",
    )
    assert n == 3
    assert read_table(spark, os.path.join(d, "tgt")).count() == 3
    rejects = spark.read.parquet(os.path.join(d, "tgt", "_rejects"))
    assert rejects.count() == 1
