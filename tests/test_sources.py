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
