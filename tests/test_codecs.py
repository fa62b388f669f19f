"""Real-codec path: pure-numpy BMP/WAV codecs + the multimodal pipeline
running on actual pixels (VERDICT r2 #4 — one real codec path end-to-end).

The reference has no media handling; these cover the LLM-data-pipeline
extension ops. Compressed formats stay behind the documented PIL swap
point (multimodal._decode_image_bytes) and raise NotImplementedError here.
"""

from __future__ import annotations

import numpy as np
import pytest

from jsonschemaparse_spark import codecs


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 16), (13, 31), (4, 6)])
def test_bmp_round_trip(h, w):
    # widths 5/31 force 4-byte row padding; 1x1 is the degenerate case
    arr = _img(h, w, seed=h * 100 + w)
    raw = codecs.encode_bmp(arr)
    assert raw[:2] == b"BM"
    assert codecs.bmp_dims(raw) == (w, h)
    out = codecs.decode_bmp(raw)
    np.testing.assert_array_equal(out, arr)


def test_bmp_top_down_decode():
    arr = _img(6, 4, seed=3)
    raw = bytearray(codecs.encode_bmp(arr[::-1]))  # encode flipped...
    import struct

    struct.pack_into("<i", raw, 22, -6)  # ...then mark top-down (negative h)
    out = codecs.decode_bmp(bytes(raw))
    np.testing.assert_array_equal(out, arr[::-1][::-1])  # == arr... explicit
    assert codecs.bmp_dims(bytes(raw)) == (4, 6)


def test_bmp_rejects_non_bmp_and_unsupported_depth():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"PNG whatever")
    with pytest.raises(ValueError):
        codecs.bmp_dims(b"\x89PNG")
    with pytest.raises(ValueError):
        codecs.encode_bmp(np.zeros((4, 4), dtype=np.uint8))  # missing channels


def test_nn_resize_identity_and_known_values():
    arr = _img(8, 8, seed=1)
    np.testing.assert_array_equal(codecs.nn_resize(arr, 8, 8), arr)

    tiny = np.array([[[0, 0, 0], [10, 10, 10]],
                     [[20, 20, 20], [30, 30, 30]]], dtype=np.uint8)
    up = codecs.nn_resize(tiny, 4, 4)
    assert up.shape == (4, 4, 3)
    # pixel-center mapping: each source pixel becomes a 2x2 block
    np.testing.assert_array_equal(up[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(up[3, 3], [30, 30, 30])
    down = codecs.nn_resize(up, 2, 2)
    np.testing.assert_array_equal(down, tiny)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_round_trip(ch):
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, size=(480, ch), dtype=np.int16)
    raw = codecs.encode_wav(s if ch > 1 else s[:, 0], sample_rate=8000)
    out, rate = codecs.decode_wav(raw)
    assert rate == 8000
    np.testing.assert_array_equal(out, s.reshape(480, ch))


def test_wav_tolerates_extra_chunks_and_rejects_non_pcm16():
    import struct

    s = np.arange(16, dtype=np.int16)
    raw = codecs.encode_wav(s)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = bytearray(raw[:fmt_end] + extra + raw[fmt_end:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    out, _ = codecs.decode_wav(bytes(patched))
    np.testing.assert_array_equal(out[:, 0], s)

    with pytest.raises(ValueError):
        codecs.decode_wav(b"OggS junk")


def test_nn_resample():
    s = np.array([[0], [100], [200], [300]], dtype=np.int16)
    up = codecs.nn_resample(s, 8)
    assert up.shape == (8, 1)
    np.testing.assert_array_equal(up[:2, 0], [0, 0])
    np.testing.assert_array_equal(codecs.nn_resample(up, 4), s)


# ---------------------------------------------------------------------------
# Spark pipeline on real pixels
# ---------------------------------------------------------------------------
def test_synthesize_bmp_media_roundtrip(spark):
    from jsonschemaparse_spark.multimodal import synthesize_bmp_media

    media = synthesize_bmp_media(spark, 20).collect()
    assert len(media) == 20
    for r in media:
        arr = codecs.decode_bmp(bytes(r["content"]))
        assert arr.shape == (r["meta"]["height"], r["meta"]["width"], 3)


def test_resize_images_real_codec(spark):
    from jsonschemaparse_spark.multimodal import (
        decoded_dims,
        resize_images,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(spark, 30)
    resized = resize_images(media, max_w=16, max_h=16, use_codec=True)
    rows = decoded_dims(resized).join(
        resized.select("media_id", "meta.width", "meta.height"), "media_id"
    ).collect()
    assert len(rows) == 30
    for r in rows:
        # bytes agree with rewritten metadata, and fit the bounding box
        assert (r["out_w"], r["out_h"]) == (r["width"], r["height"])
        assert r["out_w"] <= 16 and r["out_h"] <= 16
        # aspect-preserving target math, recomputed independently
        w, h = r["media_id"] % 61 + 4, r["media_id"] % 37 + 4
        sc = min(16.0 / w, 16.0 / h, 1.0)
        assert r["out_w"] == max(int(np.floor(w * sc)), 1)
        assert r["out_h"] == max(int(np.floor(h * sc)), 1)


def test_extract_features_real_codec(spark):
    from jsonschemaparse_spark.multimodal import (
        FEATURE_DIM,
        extract_features,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(spark, 10)
    rows = extract_features(media, use_codec=True).collect()
    assert len(rows) == 10
    for r in rows:
        f = r["features"]
        assert len(f) == FEATURE_DIM
        assert all(np.isfinite(f))
        # luminance histogram (entries 4..) is a probability mass
        assert abs(sum(f[4:]) - 1.0) < 1e-6


def test_resample_audio_real_codec(spark):
    from jsonschemaparse_spark.multimodal import (
        decoded_duration_ms,
        resample_audio,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(spark, 20, sample_rate=16000)
    out = resample_audio(media, target_rate=8000)
    rows = decoded_duration_ms(out).collect()
    assert len(rows) == 20
    for r in rows:
        # halving the rate preserves duration: (id%50+1)*10 ms
        assert r["out_ms"] == (r["media_id"] % 50 + 1) * 10
    # the re-encoded bytes carry the new rate
    raw = bytes(out.filter(out.media_id == 3).first()["content"])
    samples, rate = codecs.decode_wav(raw)
    assert rate == 8000 and samples.shape[0] == (3 % 50 + 1) * 80


def test_compressed_formats_still_raise(spark):
    from jsonschemaparse_spark.multimodal import _decode_image_bytes

    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"\x89PNG\r\n\x1a\n...fake png...")
