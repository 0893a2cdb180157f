"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1 pricing summary) on sf0.001.
queries()      — name -> callable(spark, sf_dir) -> DataFrame, one per
                 implemented operator from SURVEY.md §2.
oracle_sql()   — name -> equivalent DuckDB SQL on the same parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dremio_oss_spark.queries import (
    connectors_q,
    extras_q,
    functions_q,
    llmops,
    multimodal_q,
    operators,
    reflections_q,
    relational_q,
    semantic_q,
    sources_q,
    streaming_q,
    tpch,
    types_q,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q01(spark, "/root/testdata/sf0.001")


_FAMILIES = (
    tpch.TPCH_QUERIES,
    operators.OPERATOR_QUERIES,
    llmops.LLMOPS_QUERIES,
    functions_q.FUNCTION_QUERIES,
    relational_q.RELATIONAL_QUERIES,
    sources_q.SOURCES_QUERIES,
    streaming_q.STREAMING_QUERIES,
    reflections_q.REFLECTION_QUERIES,
    multimodal_q.MULTIMODAL_QUERIES,
    semantic_q.SEMANTIC_QUERIES,
    types_q.TYPES_QUERIES,
    extras_q.EXTRAS_QUERIES,
    connectors_q.CONNECTOR_QUERIES,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # interleave families round-robin so a time-bounded correctness sweep
    # samples every capability family, not just the first dicts
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    iters = [iter(fam.items()) for fam in _FAMILIES]
    while iters:
        nxt = []
        for it in iters:
            try:
                k, v = next(it)
            except StopIteration:
                continue
            out[k] = v
            nxt.append(it)
        iters = nxt
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tpch.TPCH_ORACLE)
    out.update(operators.OPERATOR_ORACLE)
    out.update(llmops.LLMOPS_ORACLE)
    out.update(functions_q.FUNCTION_ORACLE)
    out.update(relational_q.RELATIONAL_ORACLE)
    out.update(sources_q.SOURCES_ORACLE)
    out.update(streaming_q.STREAMING_ORACLE)
    out.update(reflections_q.REFLECTION_ORACLE)
    out.update(multimodal_q.MULTIMODAL_ORACLE)
    out.update(semantic_q.SEMANTIC_ORACLE)
    out.update(types_q.TYPES_ORACLE)
    out.update(extras_q.EXTRAS_ORACLE)
    out.update(connectors_q.CONNECTOR_ORACLE)
    return out
