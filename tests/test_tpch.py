"""TPC-H variant suites mirroring the reference's TestTpch* families
(the per-query oracle parity itself runs in the driver gate and
verify_driver_sim)."""

from __future__ import annotations

from .conftest import SF_SMALL


def test_tpch_limit0_schema_only(spark):
    """Mirror of TestTpchLimit0 (+ Limit0Converter, PrelTransformer 7.5):
    every TPC-H query under LIMIT 0 must return zero rows with the SAME
    schema as the full run, quickly (the planner's schema-only path)."""
    import time

    from dremio_oss_spark.queries import tpch

    t0 = time.time()
    for name, fn in sorted(tpch.TPCH_QUERIES.items()):
        df = fn(spark, SF_SMALL)
        limited = df.limit(0)
        assert limited.schema == df.schema, name
        assert limited.count() == 0, name
    assert time.time() - t0 < 120


def test_tpch_explain_all_plans_resolve(spark):
    """Mirror of TestTpchExplain/TestTpchPlanning: every query's
    physical plan must build without execution."""
    from dremio_oss_spark.queries import tpch

    for name, fn in sorted(tpch.TPCH_QUERIES.items()):
        plan = (fn(spark, SF_SMALL)
                ._jdf.queryExecution().executedPlan().toString())
        assert "FileScan" in plan or "Scan" in plan, name
