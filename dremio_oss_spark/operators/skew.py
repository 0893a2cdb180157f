"""Skew mitigation: salted two-phase aggregation + AQE notes.

Reference: the reference handles skew via hash-table partition recursion
inside VectorizedHashAggOperator (spill/subpartition,
`sabot/op/aggregate/vectorized/VectorizedHashAggOperator.java:307`) and
runtime filter pruning; Spark's equivalents are AQE skew-join splitting
(enabled in session.py) plus the classic *salting* rewrite below for
aggregations whose key distribution is pathological.

Salted aggregation = two-phase groupBy:
  phase 1: group on (key, salt) where salt = hash(row) % n_salts —
           hot keys fan out over n_salts reducers;
  phase 2: group on key, merging the partials.
Only associative measures can be salted (same constraint as reflection
rollups): SUM->SUM, COUNT->SUM, MIN/MAX->MIN/MAX.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """measures: out_name -> (kind, col) with kind in sum/count/min/max.

    Result is identical to df.groupBy(keys).agg(...) — the salt only
    changes the shuffle layout.  Verified against the unsalted plan in
    the oracle-checked query.
    """
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    phase1_aggs = []
    for out, (kind, col) in measures.items():
        if kind == "count":
            # count('*') counts rows; count(col) is NULL-AWARE — the
            # partial must honor the named column or count(nullable)
            # silently becomes count(*)
            phase1_aggs.append(
                (F.count(F.lit(1)) if col in ("*", None)
                 else F.count(F.col(col))).alias(out))
        else:
            phase1_aggs.append(getattr(F, kind)(col).alias(out))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    merge_aggs = [
        _MERGE[kind](F.col(out)).alias(out) for out, (kind, _) in measures.items()
    ]
    return partial.groupBy(*keys).agg(*merge_aggs)
