"""Relational round-2 queries vs DuckDB oracle + NDV tolerance."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import relational_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(relational_q.RELATIONAL_ORACLE))
def test_relational_parity(spark, oracle, name):
    df = relational_q.RELATIONAL_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(relational_q.RELATIONAL_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_ndv_within_tolerance(spark):
    rows = relational_q.ndv_approx(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["ndv_within_5pct"], f"{r['l_returnflag']}: NDV outside 5%"
