"""Structured Streaming queries vs batch DuckDB oracle."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import streaming_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(streaming_q.STREAMING_ORACLE))
def test_streaming_parity(spark, oracle, name):
    df = streaming_q.STREAMING_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(streaming_q.STREAMING_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)
