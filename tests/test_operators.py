

def test_asof_join_preserves_matched_nulls(spark):
    """Review r6: a legitimately-NULL right value on the MATCHED row
    must come through as NULL — per-column fills used to back-fill it
    from an older right row (a torn row DuckDB ASOF never produces)."""
    from pyspark.sql import Row

    from dremio_oss_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [Row(k=1, ts=30)])
    right = spark.createDataFrame(
        [Row(k=1, ts=10, v=5.0), Row(k=1, ts=20, v=None)])
    out = asof_join(left, right, on=["k"], ts="ts",
                    right_cols=["v"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ts_asof"] == 20 and r["v_asof"] is None  # matched row's NULL


def test_frame_sample_no_phantom_frames(spark):
    """Review r6: exact-multiple media lengths must not emit a trailing
    empty frame; zero-length media emits zero frames."""
    from pyspark.sql import Row

    from dremio_oss_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([
        Row(doc_id=1, media=bytearray(b"x" * 128)),
        Row(doc_id=2, media=bytearray(b"x" * 100)),
        Row(doc_id=3, media=bytearray(b"")),
    ])
    got = {(r.doc_id, r.frame_no): len(r.frame_bytes)
           for r in frame_sample(df, every_n_bytes=64).collect()}
    assert got == {(1, 0): 64, (1, 1): 64, (2, 0): 64, (2, 1): 36}


def test_tokens_ignore_padding_and_salted_count_col(spark):
    """Review r6: whitespace padding must not inflate token counts, and
    salted_agg's count(col) must stay null-aware."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from dremio_oss_spark.operators.skew import salted_agg
    from dremio_oss_spark.operators.text import token_count

    df = spark.createDataFrame([Row(t="hello world "), Row(t=" a b ")])
    assert [r.n for r in df.select(
        token_count(F.col("t")).alias("n")).collect()] == [2, 2]

    d2 = spark.createDataFrame(
        [Row(g="a", x=1.0), Row(g="a", x=None), Row(g="b", x=2.0)])
    got = {r.g: (r.nx, r.nall) for r in salted_agg(
        d2, ["g"], {"nx": ("count", "x"), "nall": ("count", "*")},
        n_salts=4).collect()}
    assert got == {"a": (1, 2), "b": (1, 1)}
