"""TPC-H-derived suite vs DuckDB oracle (the driver's t2 gate, locally)."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import tpch

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch.TPCH_QUERIES))
def test_tpch_parity(spark, oracle, name):
    df = tpch.TPCH_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(tpch.TPCH_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert df.count() >= 0
