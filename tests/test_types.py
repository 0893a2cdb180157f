"""Type-system queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import types_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(types_q.TYPES_ORACLE))
def test_types_parity(spark, oracle, name):
    df = types_q.TYPES_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(types_q.TYPES_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)
