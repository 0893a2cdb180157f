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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tpch.TPCH_QUERIES)
    out.update(operators.OPERATOR_QUERIES)
    out.update(llmops.LLMOPS_QUERIES)
    out.update(functions_q.FUNCTION_QUERIES)
    out.update(relational_q.RELATIONAL_QUERIES)
    out.update(sources_q.SOURCES_QUERIES)
    out.update(streaming_q.STREAMING_QUERIES)
    out.update(reflections_q.REFLECTION_QUERIES)
    out.update(multimodal_q.MULTIMODAL_QUERIES)
    out.update(semantic_q.SEMANTIC_QUERIES)
    out.update(types_q.TYPES_QUERIES)
    out.update(extras_q.EXTRAS_QUERIES)
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
    return out
