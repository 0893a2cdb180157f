"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No reference equivalent (dremio-oss treats binary as VARBINARY only —
`Types.proto:23` VARBINARY); this is the engine's training-data-pipeline
extension.  Design mirrors how a 100 TB multimodal lake actually works:

- media lives in a `binary` column (or object-store URIs) beside a typed
  metadata struct (modality, codec, width/height/duration, byte size);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` stages: one Python worker per partition, whole Arrow
  record batches in and out, media bytes never touch the driver;
- the actual codec call (PIL/ffmpeg/soundfile) is STUBBED here — those
  libraries aren't in this container.  `decode_stub=True` produces
  deterministic fake decodes (size-derived) so the distributed plumbing
  (schema, batching, partitioning) is real and oracle-checkable;
  `decode_stub=False` raises NotImplementedError at the exact call site
  a codec binding would occupy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata struct carried beside every media binary column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy_proxy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic media synthesis: the utf-8 text bytes stand in for an
    encoded image; metadata derives from byte length.  (The fixture has
    no real media; everything downstream treats `media` as opaque.)"""
    media = F.encode(F.col(text_col), "UTF-8")
    n = F.length(media).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake/raw").alias("codec"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
            n.alias("n_bytes"),
        ).alias("meta"),
    )


def decode_and_featurize(df: DataFrame, decode_stub: bool = True,
                         feature_dim: int = 8) -> DataFrame:
    """mapInPandas decode + feature-extract over (doc_id, media, meta).

    Stub decode: per-row features computed from the raw bytes (mean,
    coarse entropy proxy, fixed-dim byte-histogram projection) — the
    shapes/dtypes a real embedding stage would emit.  Real decode would
    replace `_decode_one` with the codec call.
    """

    def _decode_one(buf: bytes) -> "pd.Series":
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg/soundfile — not "
                "available in this environment; pass decode_stub=True"
            )
        import numpy as np

        a = np.frombuffer(buf, dtype=np.uint8)
        if a.size == 0:
            a = np.zeros(1, dtype=np.uint8)
        hist = np.bincount(a % feature_dim, minlength=feature_dim).astype(float)
        hist /= hist.sum()
        p = np.bincount(a, minlength=256).astype(float) / a.size
        nz = p[p > 0]
        return a.size, float(a.mean()), float(-(nz * np.log2(nz)).sum()), hist

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                n, mean, ent, hist = _decode_one(bytes(buf))
                rows.append((doc_id, n, round(mean, 6), round(ent, 6), list(hist)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "byte_mean", "byte_entropy_proxy", "feature"],
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata-only transform here (real pixel resample is the
    stubbed codec call); the output contract — same binary column, updated
    meta — is what a real impl must preserve."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.modality").alias("modality"),
            F.col("meta.codec").alias("codec"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """Frame sampling: one row per sampled offset (video → frames model).
    Pure Catalyst (sequence + explode + substring on binary) — the 100 TB
    path keeps frame extraction distributed and prunes via max_frames."""
    # CEIL, not floor+1: an exact multiple of every_n_bytes must not
    # emit a trailing empty phantom frame, and zero-length media emits
    # zero frames
    n_frames = F.least(
        F.lit(max_frames),
        F.ceil(F.length("media") / F.lit(every_n_bytes)).cast("int"),
    )
    seq = F.when(n_frames > 0,
                 F.sequence(F.lit(0), n_frames - 1)
                 ).otherwise(F.array().cast("array<int>"))
    return df.select(
        "doc_id",
        F.posexplode(seq).alias("frame_no", "_i"),
        F.col("media"),
    ).select(
        "doc_id",
        "frame_no",
        F.substring(
            F.col("media"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    )
