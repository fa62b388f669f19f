"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition hygiene) is
real and tested. Since round 3 the codec step is REAL for uncompressed
formats — 24-bit BMP and PCM16 WAV decode/encode/nearest-neighbor-resize in
pure numpy (codecs.py), exercised end-to-end by resize_images(use_codec=True)
and the media_resize_dims driver query. Compressed formats (JPEG/PNG/...)
still raise NotImplementedError at the documented PIL/libav swap point in
_decode_image_bytes. Deterministic fake features remain available for
pipeline tests that don't care about pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschemaparse_spark import codecs

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


def synthesize_bmp_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic REAL-BMP media table: each row's content is a valid
    24-bit BMP whose dims derive arithmetically from media_id
    (w = id % 61 + 4, h = id % 37 + 4) with a gradient pixel pattern.
    meta.width/height record the true encoded dims, so a DuckDB oracle can
    verify the decoded dims purely from metadata arithmetic while the Spark
    side reads them out of the actual bytes. Generation runs in executors
    (mapInPandas over spark.range) — no driver-side corpus."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                w = int(i % 61 + 4)
                h = int(i % 37 + 4)
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(x * 3 + y * 7 + i) % 256, (x * 5 + y + i * 11) % 256,
                     (x + y * 13 + i * 17) % 256],
                    axis=2,
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": int(i),
                        "url": f"https://cdn.example/m/{int(i)}",
                        "kind": "image",
                        "content": codecs.encode_bmp(arr),
                        "meta": {"width": w, "height": h,
                                 "duration_ms": 0, "mime": "image/bmp"},
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_bytes(raw: bytes) -> np.ndarray:
    """Decode image bytes -> (h, w, 3) uint8 RGB.

    Uncompressed BMP decodes in pure numpy (codecs.decode_bmp). Compressed
    formats need a codec library — PIL is the swap point and is probed at
    call time so a production image with Pillow installed works unchanged.
    """
    if raw[:2] == b"BM":
        return codecs.decode_bmp(raw)
    try:  # pragma: no cover - PIL absent in this container
        import PIL.Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return np.asarray(PIL.Image.open(io.BytesIO(raw)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "compressed image codecs need Pillow (not in this environment); "
            "BMP decodes natively"
        ) from None


def _image_features(arr: np.ndarray) -> list[float]:
    """Deterministic FEATURE_DIM-float summary of decoded pixels: per-channel
    means (3), aspect ratio (1), then a 12-bin normalized luminance
    histogram. Stands in for a real embedding model; the decode is real."""
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    aspect = arr.shape[1] / max(arr.shape[0], 1)
    luma = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    ).ravel()
    hist, _ = np.histogram(luma, bins=FEATURE_DIM - 4, range=(0.0, 255.0))
    hist = hist / max(luma.size, 1)
    return [float(x) for x in (*means, aspect, *hist)]


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
                    lambda raw: _image_features(_decode_image_bytes(bytes(raw))))
            else:
                out[out_col] = pdf[content_col].map(
                    lambda raw: _fake_features(bytes(raw) if raw is not None else None))
            yield out

    return df.mapInPandas(run, schema=schema)


def _resize_image_bytes(raw: bytes, w: int, h: int) -> bytes:
    """Real resize: decode -> nearest-neighbor resample -> re-encode BMP.
    (A production stack with Pillow would decode via the same swap point
    and could re-encode to the original format instead.)"""
    return codecs.encode_bmp(codecs.nn_resize(_decode_image_bytes(raw), w, h))


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


def synthesize_wav_media(spark, n: int, partitions: int | None = None,
                         sample_rate: int = 16000) -> DataFrame:
    """Deterministic REAL-WAV media table: each row's content is a valid
    PCM16 mono WAV whose duration derives from media_id
    (n_samples = (id % 50 + 1) * sample_rate // 100, i.e. 10ms steps) with
    an integer-sine sample pattern. meta.duration_ms records the true
    encoded duration for oracle arithmetic. Generation runs in executors."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                n_samples = int((i % 50 + 1) * sample_rate // 100)
                t = np.arange(n_samples)
                samples = (10000 * np.sin(t * (0.01 + (i % 7) * 0.005))).astype(np.int16)
                rows.append(
                    {
                        "media_id": int(i),
                        "url": f"https://cdn.example/a/{int(i)}",
                        "kind": "audio",
                        "content": codecs.encode_wav(samples, sample_rate),
                        "meta": {"width": 0, "height": 0,
                                 "duration_ms": n_samples * 1000 // sample_rate,
                                 "mime": "audio/wav"},
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def resample_audio(df: DataFrame, target_rate: int = 8000) -> DataFrame:
    """Real audio resample: decode WAV -> nearest-neighbor resample to
    target_rate -> re-encode. Arrow-batched mapInPandas, same partition
    hygiene as resize_images; a production stack would swap the
    nearest-neighbor kernel for libav/soxr at the same point."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()

            def _resample(raw: bytes) -> bytes:
                samples, rate = codecs.decode_wav(bytes(raw))
                n_out = max(int(round(samples.shape[0] * target_rate / rate)), 1)
                return codecs.encode_wav(codecs.nn_resample(samples, n_out),
                                         target_rate)

            out["content"] = pdf["content"].map(_resample)
            yield out

    return df.mapInPandas(run, schema=schema)


def decoded_duration_ms(df: DataFrame, content_col: str = "content") -> DataFrame:
    """(media_id, out_ms) read from the actual WAV bytes. Twin of
    decoded_dims for the audio path."""
    schema = "media_id long, out_ms long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ms = []
            for raw in pdf[content_col]:
                samples, rate = codecs.decode_wav(bytes(raw))
                ms.append(samples.shape[0] * 1000 // rate)
            yield pd.DataFrame({"media_id": pdf["media_id"], "out_ms": ms})

    return df.mapInPandas(run, schema=schema)


def decoded_dims(df: DataFrame, content_col: str = "content") -> DataFrame:
    """(media_id, out_w, out_h) read from the actual image BYTES (BMP header
    walk — no pixel decode), not from metadata. Pairs with the
    media_resize_dims driver query: the oracle recomputes the expected dims
    arithmetically from media_id while this reads them out of the encoded
    output, so a hash-match proves the decode->resample->re-encode path."""
    schema = "media_id long, out_w int, out_h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [codecs.bmp_dims(bytes(raw)) for raw in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": [d[0] for d in dims],
                    "out_h": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(run, schema=schema)


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
