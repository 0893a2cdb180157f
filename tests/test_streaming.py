"""Structured Streaming queries vs batch DuckDB oracle."""

from __future__ import annotations

import pytest

from dremio_oss_spark.queries import streaming_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(streaming_q.STREAMING_ORACLE))
def test_streaming_parity(spark, oracle, name):
    df = streaming_q.STREAMING_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(streaming_q.STREAMING_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Append-mode windowed aggregation with a 1h watermark, drained
    twice (availableNow) against one checkpoint: a second batch's
    too-late event must be DROPPED (its window already finalized and its
    state evicted), while on-time events keep flowing.  This is the
    late-data contract our streaming surface claims (SURVEY §2.9)."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def write_batch(name, hours):
        spark.createDataFrame(
            [(base + dt.timedelta(hours=h),) for h in hours], "ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import glob
        import shutil
        f = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"{name}.parquet"))

    def drain():
        stream = (
            spark.readStream.schema("ts timestamp").parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1", [0, 1, 2, 3, 4, 5])  # watermark after drain: 04:00
    drain()
    first = {
        (r["w_start"].hour, r["n"])
        for r in spark.read.parquet(sink).collect()
    }
    assert first == {(0, 1), (1, 1), (2, 1), (3, 1)}  # windows closed by wm

    # batch 2: one VERY late event (00:30, far below the 04:00 watermark)
    # and one on-time event at 07:00
    write_batch("b2", [0.5, 7])
    drain()
    final = {}
    for r in spark.read.parquet(sink).collect():
        final[r["w_start"].hour] = final.get(r["w_start"].hour, 0) + r["n"]
    # late 00:30 row dropped: window 0 still counts exactly 1; the 07:00
    # event advanced the watermark to 06:00, closing windows 4 and 5
    assert final == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_stream_events_normalizes_ntz_sessions(spark):
    """Regression (round-3 driver run): under a session with
    spark.sql.timestampType=TIMESTAMP_NTZ the events parquet surfaces
    `ts` as TIMESTAMP_NTZ, which withWatermark rejects
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — and under that same conf the
    DDL name "timestamp" ALSO resolves to NTZ, so the cast must name
    timestamp_ltz explicitly.  stream_events must emit LTZ regardless of
    session conf."""
    from dremio_oss_spark.streaming.windows import stream_events

    sess = spark.newSession()
    sess.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    ev = stream_events(sess, SF_SMALL)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # must be watermarkable (this is what the driver run tripped on)
    ev.withWatermark("ts", "1 hour")
