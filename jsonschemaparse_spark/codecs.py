"""Pure-numpy media codecs for the multimodal pipeline.

This container has no PIL/libav, but uncompressed formats need neither:
- BMP (24-bit BI_RGB, BITMAPINFOHEADER) decode/encode + nearest-neighbor
  resize — the real image codec path behind multimodal.resize_images /
  extract_features(use_codec=True).
- WAV (RIFF PCM16 mono/stereo) decode/encode + nearest-neighbor resample.

Everything is vectorized numpy (no per-pixel Python loops), suitable for
Arrow-batched execution inside mapInPandas kernels. The PIL/libav swap
point stays in multimodal._decode_image_bytes: compressed formats raise
NotImplementedError there with these functions as the uncompressed
fallback, so production can layer a real codec library without touching
the Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, reserved x2, pixel-data offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    4-byte-aligned)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    data_offset = 14 + 40
    header = struct.pack(_BMP_FILE_HDR, b"BM", data_offset + img_size, 0, 0, data_offset)
    info = struct.pack(_BMP_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    rows[:, : w * 3] = arr[::-1, :, ::-1].astype(np.uint8).reshape(h, w * 3)
    return header + info + rows.tobytes()


def bmp_dims(raw: bytes) -> tuple[int, int]:
    """(width, height) from the BMP header alone — no pixel read."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    w, h = struct.unpack_from("<ii", raw, 18)
    return w, abs(h)


def decode_bmp(raw: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB array."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    bitcount = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMPs supported (got {bitcount}-bit, "
            f"compression={compression}); swap in PIL for compressed formats"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    px = np.frombuffer(raw, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rgb = px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def nn_resize(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (pixel-center sampling:
    src = floor((i + 0.5) * src/dst), the classic point-sample mapping)."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return np.ascontiguousarray(arr[yi][:, xi])


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF PCM16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM16 WAV bytes -> ((n, channels) int16 samples, sample_rate).
    Walks RIFF chunks so extra chunks (LIST etc.) are tolerated."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (format={audio_format}, bits={bits})"
        )
    s = np.frombuffer(data, dtype=np.int16)
    return s.reshape(-1, ch), sample_rate


def nn_resample(samples: np.ndarray, n_out: int) -> np.ndarray:
    """Nearest-neighbor resample along axis 0 (same mapping as nn_resize)."""
    n = samples.shape[0]
    idx = np.minimum(((np.arange(n_out) + 0.5) * n / n_out).astype(np.int64), n - 1)
    return np.ascontiguousarray(samples[idx])
