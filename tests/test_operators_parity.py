"""Operator-coverage queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import operators

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(operators.OPERATOR_QUERIES))
def test_operator_parity(spark, oracle, name):
    df = operators.OPERATOR_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(operators.OPERATOR_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)
