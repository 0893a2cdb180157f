"""Windowed streaming aggregations over the events table.

Pure Structured Streaming (no reference equivalent — Dremio OSS has no
stream engine; see SURVEY.md §2.9).  Design notes for scale:

- Source is the streaming file source (`readStream.parquet`) with
  `availableNow` trigger: processes the current backlog in bounded
  micro-batches, then stops — the pattern for incremental jobs over a
  growing lake directory (the reference's auto-ingest pipe role).
- Watermarks bound state: tumbling/sliding state is dropped once the
  watermark passes the window end; session state once gap + watermark
  pass.  On a 1000-executor cluster, state lives in the state store
  partitioned by grouping key — the same shuffle partitioning as a
  batch groupBy, so skew handling follows from AQE-style key design,
  not collector logic.
- Memory sink is test-only; production would writeStream to parquet/
  Kafka with checkpointing (exactly-once via the offset log).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with normalized timestamp.

    The streaming file source requires a *directory* (it tails new files
    dropped into it — the auto-ingest model); the fixture is a single
    file, so stage a symlink dir under the repo scratch area.
    """
    from ..catalog import _allow_nanos

    _allow_nanos(spark)  # events stores TIMESTAMP(NANOS); runtime conf
    path = os.path.join(sf_dir, "events.parquet")
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    # tag by the FULL absolute path, not the basename: /a/sf1 and /b/sf1
    # must not share a staging dir (the second caller would silently
    # stream the first's data)
    import hashlib

    ap = os.path.abspath(sf_dir)
    tag = (re.sub(r"\W", "_", os.path.basename(ap))
           + "-" + hashlib.md5(ap.encode()).hexdigest()[:8])
    stage = os.path.join(repo_root, ".scratch", f"events_stream-{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    # lexists: a DANGLING symlink fails os.path.exists and then
    # os.symlink raises FileExistsError; also re-point a stale link
    if os.path.lexists(link) and os.path.realpath(link) != \
            os.path.realpath(path):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(stage)
    # events.parquet stores TIMESTAMP(NANOS) -> long nanos under
    # nanosAsLong (see catalog.load_events); normalize to timestamp.
    # Depending on session conf (spark.sql.timestampType) the column may
    # instead surface as timestamp_ntz, which withWatermark rejects
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — cast any non-LTZ variant.
    # NB: cast to "timestamp_ltz" by name — under that same session conf
    # the DDL string "timestamp" itself resolves to NTZ, so a plain
    # cast("timestamp") would be a no-op.
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return df


def run_to_table(stream: DataFrame, name: str, mode: str) -> None:
    """Drain the stream with availableNow into a memory sink table.

    Streaming state-store partition count is fixed at query start from
    spark.sql.shuffle.partitions (AQE does not apply to streaming
    aggregations); 32 partitions means 32 state stores per stateful op,
    mostly overhead at micro-batch sizes.  Pin a modest count for the
    bounded drain, restore the session default after.  On a real cluster
    this is the knob you size to keyspace (state shards), not input TB:
    target enough shards that per-shard state fits executor memory —
    conf `spark.dremio.stream.statePartitions` (local default 4:
    interleaved medians at sf0.1 read 5.29 s → 2.61 s for the
    stream-stream join and 2.17 s → 1.52 s for the dedup pipe going
    8 → 4/2, identical results and job counts — each stateful operator
    commits one state file per partition per microbatch, so idle
    partitions are pure commit overhead at this keyspace).
    """
    spark = stream.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    n_state = spark.conf.get("spark.dremio.stream.statePartitions", "4")
    spark.conf.set("spark.sql.shuffle.partitions", n_state)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _sink(sf_dir: str, base: str) -> str:
    tag = re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    return f"{base}_{tag}"


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("val_sum"),
    )
    name = _sink(sf_dir, "tumble")
    run_to_table(
        agg.select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            F.col("val_sum").cast("double").alias("val_sum"),
        ),
        name,
        "complete",
    )
    return spark.table(name).orderBy("w_start", "event_type")


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("val_sum"),
    )
    name = _sink(sf_dir, "slide")
    run_to_table(
        agg.select(
            F.col("w.start").alias("w_start"),
            "n",
            F.col("val_sum").cast("double").alias("val_sum"),
        ),
        name,
        "complete",
    )
    return spark.table(name).orderBy("w_start")


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(
        F.session_window("ts", "10 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"))
    name = _sink(sf_dir, "session")
    run_to_table(
        agg.select("user_id", F.col("first_ts").alias("session_start"), "n_events"),
        name,
        "complete",
    )
    return spark.table(name).orderBy("user_id", "session_start")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-style dedup ingest: duplicate delivery collapsed on event_id
    (auto-ingest pipe DEDUPE_LOOKBACK semantics, ingestion.ftl:195-222)."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    doubled = ev.union(ev)  # simulate at-least-once redelivery
    deduped = doubled.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    name = _sink(sf_dir, "dedup")
    run_to_table(agg, name, "complete")
    return spark.table(name).orderBy("event_type")
