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


def test_asof_join_directions(spark):
    """Inclusive tie semantics both ways, and left-outer nulls."""
    from pyspark.sql import functions as F

    from dremio_oss_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 30, "c")], "k int, ts int, v string"
    )
    back = {
        (r["k"], r["ts"]): r["v_asof"]
        for r in asof_join(left, right, on=["k"], ts="ts").collect()
    }
    # equal ts matches (inclusive >=); no prior row -> null
    assert back == {(1, 10): "a", (1, 20): "b", (2, 5): None}

    fwd = {
        (r["k"], r["ts"]): (r["v_asof"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["k"], ts="ts", direction="forward"
        ).collect()
    }
    assert fwd == {(1, 10): ("a", 10), (1, 20): ("c", 30), (2, 5): (None, None)}

    # result column count: left cols + value + matched ts
    out = asof_join(left, right, on=["k"], ts="ts")
    assert set(out.columns) == {"k", "ts", "v_asof", "ts_asof"}
