"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched kernels over mapInPandas.

REAL decode paths (no external codec libraries needed):
- image: 24-bit uncompressed BMP — header parse + numpy frombuffer
  (BITMAPFILEHEADER/BITMAPINFOHEADER per the public BMP spec; rows are
  bottom-up, BGR, 4-byte padded).
- audio: PCM16 WAV via the stdlib `wave` module + numpy.
- video: a raw-frame container ("RAWV" magic, frame count + dims header,
  concatenated RGB24 frames) — the synthetic stand-in for decoded video;
  frame sampling picks k evenly spaced frames.

Compressed formats the sandbox has no codecs for (JPEG/PNG/MP4/…) raise
NotImplementedError inside the kernel and surface as ok=false rows — the
Spark-side contract (schema, Arrow batch shape, partitioning) is identical,
so a real deployment swaps the decoder body for PIL/ffmpeg and nothing
else changes.

Features are real signal statistics: per-channel mean/std + luminance
histogram (image), RMS/zero-crossings/spectral magnitudes (audio),
per-sampled-frame luminance stats (video).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, "
    "height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, ok boolean"

_RAWV_MAGIC = b"RAWV"


# ------------------------------------------------------------- encoders ---
# (used by synth_media to produce REAL byte formats deterministically)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB24 (h, w, 3) uint8 → BMP bytes (bottom-up, BGR, padded rows)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = []
    bgr = pixels[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → RGB24 (h, w, 3) uint8. 24-bit uncompressed only."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"unsupported BMP variant bpp={bpp}")
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * abs(h), offset=off)
    rows = data.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if h > 0 else rgb  # bottom-up → top-down


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample rate)."""
    if payload[:4] != b"RIFF":
        raise NotImplementedError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("PCM16 only")
        raw = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
        x = raw.reshape(-1, f.getnchannels()).mean(axis=1)
        return x / 32768.0, f.getframerate()


def encode_rawv(frames: np.ndarray) -> bytes:
    """RGB24 (n, h, w, 3) uint8 → RAWV container bytes."""
    n, h, w, _ = frames.shape
    return _RAWV_MAGIC + struct.pack("<III", n, w, h) + frames.tobytes()


def decode_rawv(payload: bytes) -> np.ndarray:
    """RAWV bytes → (n, h, w, 3) uint8 frames."""
    if payload[:4] != _RAWV_MAGIC:
        raise NotImplementedError("not a RAWV payload (mp4/webm need ffmpeg)")
    n, w, h = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload, dtype=np.uint8, offset=16).reshape(n, h, w, 3)


def frame_sample(frames: np.ndarray, k: int) -> np.ndarray:
    """k evenly spaced frames (first and last always included for k ≥ 2)."""
    n = frames.shape[0]
    idx = np.linspace(0, n - 1, num=min(k, n)).round().astype(int)
    return frames[idx]


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * (h / out_h)).astype(int).clip(0, h - 1)
    xi = (np.arange(out_w) * (w / out_w)).astype(int).clip(0, w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------- table ---

def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media table with REAL byte payloads: BMP images, WAV
    audio, RAWV video — decodable by the kernels above. Every 11th row is a
    'compressed' payload (fake JPEG/MP4 bytes) to exercise the ok=false
    path."""

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                r = np.random.default_rng(seed * 7919 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                undecodable = int(i) % 11 == 10
                if undecodable:
                    payload = b"\xff\xd8\xff\xe0" + r.bytes(128)  # JPEG-ish
                    mime, w_, h_, dur = "image/jpeg", 32, 32, None
                    kind = "image"
                elif kind == "image":
                    w_, h_ = int(r.integers(8, 24)), int(r.integers(8, 24))
                    px = r.integers(0, 256, size=(h_, w_, 3), dtype=np.uint8)
                    payload, mime, dur = encode_bmp(px), "image/bmp", None
                elif kind == "audio":
                    n_s = int(r.integers(800, 4000))
                    t = np.arange(n_s)
                    f0 = float(r.uniform(100, 900))
                    x = (0.5 * np.sin(2 * np.pi * f0 * t / 8000)
                         + 0.1 * r.standard_normal(n_s))
                    payload = encode_wav((x * 20000).astype(np.int16))
                    mime, w_, h_ = "audio/wav", None, None
                    dur = int(n_s / 8.0)
                else:
                    nf = int(r.integers(4, 12))
                    w_, h_ = int(r.integers(8, 16)), int(r.integers(8, 16))
                    frames = r.integers(0, 256, size=(nf, h_, w_, 3),
                                        dtype=np.uint8)
                    payload, mime = encode_rawv(frames), "video/x-rawv"
                    dur = nf * 40
                rows.append({"media_id": int(i), "kind": kind,
                             "payload": payload, "mime": mime,
                             "width": w_, "height": h_, "duration_ms": dur})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# -------------------------------------------------------------- kernels ---

def _image_features(px: np.ndarray) -> np.ndarray:
    small = resize_nearest(px, 8, 8).astype(np.float64)
    lum = small.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    return np.concatenate([
        px.reshape(-1, 3).mean(axis=0), px.reshape(-1, 3).std(axis=0),
        hist.astype(np.float64) / lum.size,
    ]).astype(np.float32)


def _audio_features(x: np.ndarray) -> np.ndarray:
    rms = float(np.sqrt((x * x).mean()))
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    mags = np.abs(np.fft.rfft(x, n=256))[:16]
    return np.concatenate([[rms, zc], mags]).astype(np.float32)


def _video_features(frames: np.ndarray, k: int = 3) -> np.ndarray:
    samp = frame_sample(frames, k).astype(np.float64)
    lum = samp.mean(axis=3)
    per_frame = np.stack([lum.mean(axis=(1, 2)), lum.std(axis=(1, 2))], axis=1)
    out = np.zeros((k, 2))
    out[: per_frame.shape[0]] = per_frame
    return out.ravel().astype(np.float32)


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched; undecodable
    payloads (no codec in this environment) yield ok=false rows instead of
    failing the job."""

    def fx(it):
        for pdf in it:
            feats, oks = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    b = bytes(payload)
                    if kind == "image":
                        f = _image_features(decode_bmp(b))
                    elif kind == "audio":
                        f = _audio_features(decode_wav(b)[0])
                    else:
                        f = _video_features(decode_rawv(b))
                    feats.append(f.tolist())
                    oks.append(True)
                except Exception:
                    # undecodable is a DATA condition, not a job failure:
                    # malformed payloads raise struct.error / wave.Error /
                    # ValueError (truncated headers, bad frame counts), not
                    # just the codec-missing NotImplementedError — all of
                    # them surface as ok=false per the module contract
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"],
                 "feature": feats, "ok": oks}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(fx, schema=FEATURE_SCHEMA)
