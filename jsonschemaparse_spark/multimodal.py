"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition hygiene) is
real and tested; the codec step is STUBBED behind `decode_stub` because no
image/audio libraries exist in this container — swap `_decode_image_bytes`
for a PIL/libav call in production. Deterministic fake features keep the
pipeline testable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("mime", T.StringType(), True),
        ]), True),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table in MEDIA_SCHEMA shape."""
    df = spark.range(0, n, 1, partitions or 8)
    i = F.col("id")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (i % 3 + 1).cast("int"))
    content = F.encode(F.concat(F.lit("BLOB:"), i.cast("string")), "UTF-8")
    meta = F.struct(
        (i % 640 + 1).cast("int").alias("width"),
        (i % 480 + 1).cast("int").alias("height"),
        (i * 33 % 60000).alias("duration_ms"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
    )
    return df.select(
        i.alias("media_id"),
        F.concat(F.lit("https://cdn.example/m/"), i.cast("string")).alias("url"),
        kind.alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def _decode_image_bytes(raw: bytes):  # pragma: no cover - stub
    """REAL DECODER GOES HERE (PIL.Image.open etc.). Not available in this
    container."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_features(raw: bytes | None) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram projection.
    Replaces the model/codec step so batch shape + schema are exercised."""
    if raw is None:
        return [0.0] * FEATURE_DIM
    buckets = [0] * FEATURE_DIM
    for byte in raw:
        buckets[byte % FEATURE_DIM] += 1
    total = max(sum(buckets), 1)
    return [b / total for b in buckets]


def extract_features(df: DataFrame, content_col: str = "content",
                     out_col: str = "features", use_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction. use_codec=True calls the real
    (stubbed) decoder; default uses deterministic fake features so the
    Spark plumbing is fully testable."""
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)])
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            if use_codec:
                out[out_col] = pdf[content_col].map(
                    lambda raw: _decode_image_bytes(bytes(raw)))
            else:
                out[out_col] = pdf[content_col].map(
                    lambda raw: _fake_features(bytes(raw) if raw is not None else None))
            yield out

    return df.mapInPandas(run, schema=schema)


def _resize_image_bytes(raw: bytes, w: int, h: int):  # pragma: no cover - stub
    """REAL RESAMPLER GOES HERE (PIL Image.resize etc.). Not available in
    this container."""
    raise NotImplementedError("image codec not available in this environment")


def resize_plan(df: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving resize TARGETS as pure expressions (codegen-side
    math — no Python): adds (target_width, target_height) with
    scale = min(max_w/w, max_h/h, 1) and floor-to-≥1 dims. The pixel
    resample itself is the stubbed codec step (resize_images)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    tw = F.greatest(F.floor(w * scale), F.lit(1)).cast("int")
    th = F.greatest(F.floor(h * scale), F.lit(1)).cast("int")
    return df.withColumns({"target_width": tw, "target_height": th})


def resize_images(df: DataFrame, max_w: int = 256, max_h: int = 256,
                  use_codec: bool = False) -> DataFrame:
    """Arrow-batched resize: target dims from resize_plan; use_codec=True
    calls the real (stubbed) resampler per image; default keeps the bytes
    and rewrites meta.width/height to the targets so schema/batch plumbing
    is exercised end-to-end."""
    planned = resize_plan(df, max_w, max_h)
    schema = planned.schema
    cols = planned.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            if use_codec:
                out["content"] = [
                    _resize_image_bytes(bytes(raw), tw, th)
                    for raw, tw, th in zip(pdf["content"], pdf["target_width"],
                                           pdf["target_height"])
                ]
            out["meta"] = [
                {**(m if isinstance(m, dict) else m.asDict()),
                 "width": int(tw), "height": int(th)}
                for m, tw, th in zip(pdf["meta"], pdf["target_width"],
                                     pdf["target_height"])
            ]
            yield out

    return planned.mapInPandas(run, schema=schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).
    The decode of each frame is the stubbed codec step; the fan-out and
    partition shape are the real Spark work and are tested."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
