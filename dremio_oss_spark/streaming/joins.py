"""Stream-stream and stream-static joins (Structured Streaming).

No reference equivalent (Dremio OSS has no stream engine — SURVEY.md
§2.9); this is the added streaming surface's join coverage.

Scale notes:
- A watermarked stream-stream inner join keeps both sides' rows in the
  state store only until the watermark plus the join's time bound passes
  — the time-range predicate is what lets Spark compute a state eviction
  horizon.  An unbounded-condition stream join would grow state forever;
  this module always constrains event-time on both inputs.
- State is partitioned by the equi-join key (user_id here) — the same
  shuffle partitioning as a batch hash join, so key skew is handled the
  same way (salting the hot key into both sides).
- Stream-static joins (a stream probing a dimension table) need no
  state at all: the static side is broadcast per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import _sink, run_to_table, stream_events


def click_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click→error attribution: error events within 10 minutes
    AFTER a click by the same user, as a watermarked stream-stream inner
    join drained append-mode; the pair table is then aggregated batch-side
    from the sink (chaining a streaming agg after a stream-stream join
    would need a second stateful stage — out of scope for the drain)."""
    clicks = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "1 hour")
    )
    pairs = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("interval 10 minutes")),
        "inner",
    )
    name = _sink(sf_dir, "ssjoin")
    run_to_table(pairs, name, "append")
    return (
        spark.table(name)
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("user_id")
    )
