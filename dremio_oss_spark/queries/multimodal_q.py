"""Multimodal-column queries: binary media + metadata, mapInPandas
featurize, frame sampling — oracle-checked on the deterministic parts
(byte counts, frame geometry, metadata arithmetic); the numpy feature
values are golden-tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import multimodal as M


def media_meta(spark: SparkSession, sf: str) -> DataFrame:
    media = M.attach_fake_media(load(spark, sf, "documents"))
    return (
        media.select(
            "doc_id",
            F.col("meta.modality").alias("modality"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.length("media").cast("long").alias("media_len"),
        )
        .where(F.col("doc_id") <= 500)
        .orderBy("doc_id")
    )


MEDIA_META_SQL = """
select doc_id,
       'image' as modality,
       cast(octet_length(encode(text)) % 640 + 16 as int) as width,
       cast(octet_length(encode(text)) % 480 + 16 as int) as height,
       cast(octet_length(encode(text)) as bigint) as n_bytes,
       cast(octet_length(encode(text)) as bigint) as media_len
from documents
where doc_id <= 500
order by doc_id
"""


def decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas stub-decode; oracle covers the byte-count column (the
    numpy feature math is golden-tested, not SQL-expressible)."""
    media = M.attach_fake_media(
        load(spark, sf, "documents").where(F.col("doc_id") <= 500)
    )
    feats = M.decode_and_featurize(media)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.size("feature").alias("feature_dim"),
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4
        ).alias("feature_l1"),
    ).orderBy("doc_id")


DECODE_FEATURES_SQL = """
select doc_id,
       cast(octet_length(encode(text)) as bigint) as n_bytes,
       8 as feature_dim,
       1.0 as feature_l1
from documents
where doc_id <= 500
order by doc_id
"""


def frame_sampling(spark: SparkSession, sf: str) -> DataFrame:
    media = M.attach_fake_media(
        load(spark, sf, "documents").where(F.col("doc_id") <= 500)
    )
    frames = M.frame_sample(media, every_n_bytes=64, max_frames=8)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.length("frame_bytes")).cast("bigint").alias("frame_bytes_total"),
        )
        .orderBy("doc_id")
    )


FRAME_SAMPLING_SQL = """
with m as (
  select doc_id, octet_length(encode(text)) as n from documents
  where doc_id <= 500
), fr as (
  select doc_id, n, unnest(range(0, least(8, (n + 63) // 64))) as frame_no
  from m
)
select doc_id,
       count(*) as n_frames,
       cast(sum(greatest(0, least(n - frame_no * 64, 64))) as bigint) as frame_bytes_total
from fr
group by doc_id
order by doc_id
"""


def transcript_align(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-modal alignment: every sampled media frame is as-of joined
    to the latest transcript segment at or before its timestamp — the
    subtitle/frame pairing step of an audio-video training pipeline.
    Frames tick every 40ms (25fps), transcript segments every 100ms;
    both derive deterministically from the fixture so DuckDB's native
    ASOF JOIN is an exact oracle.  Scale shape: the as-of operator is
    union+window partitioned by doc_id — no join node, one shuffle."""
    from ..operators.asof import asof_join

    docs = (load(spark, sf, "documents").where(F.col("doc_id") <= 500)
            .withColumn("n_tok", F.size(F.split(F.col("text"), r"\s+")))
            .where(F.col("n_tok") >= 1))
    media = M.attach_fake_media(docs)
    frames = (
        M.frame_sample(media, every_n_bytes=64, max_frames=8)
        .select("doc_id", "frame_no",
                (F.col("frame_no") * 40).cast("bigint").alias("ts"))
    )
    segs = docs.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0), F.least(F.lit(4), F.col("n_tok") - 1))).alias("seg_no"),
    ).select("doc_id", "seg_no",
             (F.col("seg_no") * 100).cast("bigint").alias("ts"))
    al = asof_join(frames, segs, on=["doc_id"], ts="ts",
                   right_cols=["seg_no"])
    return (
        al.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_frames"),
             F.count("seg_no_asof").cast("bigint").alias("n_aligned"),
             F.max("seg_no_asof").cast("bigint").alias("last_seg"))
        .orderBy("doc_id")
    )


TRANSCRIPT_ALIGN_SQL = """
with m as (
  select doc_id, octet_length(encode(text)) as n,
         len(string_split_regex(text, '\\s+')) as n_tok
  from documents
  where doc_id <= 500 and len(string_split_regex(text, '\\s+')) >= 1
), f2 as (
  select doc_id, frame_no, cast(frame_no * 40 as bigint) as ts
  from (select doc_id,
               unnest(range(0, least(8, (n + 63) // 64))) as frame_no
        from m)
), s2 as (
  select doc_id, seg_no, cast(seg_no * 100 as bigint) as ts
  from (select doc_id, unnest(range(0, least(5, n_tok))) as seg_no
        from m)
)
select f2.doc_id,
       cast(count(*) as bigint) as n_frames,
       cast(count(s2.seg_no) as bigint) as n_aligned,
       cast(max(s2.seg_no) as bigint) as last_seg
from f2 asof left join s2
  on f2.doc_id = s2.doc_id and f2.ts >= s2.ts
group by f2.doc_id
order by f2.doc_id
"""


MULTIMODAL_QUERIES = {
    "mm_media_meta": media_meta,
    "mm_decode_features": decode_features,
    "mm_frame_sampling": frame_sampling,
    "mm_transcript_align": transcript_align,
}

MULTIMODAL_ORACLE = {
    "mm_media_meta": MEDIA_META_SQL,
    "mm_decode_features": DECODE_FEATURES_SQL,
    "mm_frame_sampling": FRAME_SAMPLING_SQL,
    "mm_transcript_align": TRANSCRIPT_ALIGN_SQL,
}
