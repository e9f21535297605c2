"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched UDFs over mapInPandas.

The sandbox has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fake or NotImplementedError) — but the Spark-side contract
(schema, batch shape, partitioning) is real and tested: at scale, swap
`_decode_image_stub` for a PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, "
    "height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, ok boolean"


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes; metadata typed."""

    def gen(it):
        for pdf in it:
            rng = np.random.default_rng(seed)
            rows = []
            for i in pdf["id"]:
                r = np.random.default_rng(seed * 7919 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": r.bytes(256),
                        "mime": {"image": "image/png", "audio": "audio/wav",
                                 "video": "video/mp4"}[kind],
                        "width": int(r.integers(64, 1024)) if kind != "audio" else None,
                        "height": int(r.integers(64, 1024)) if kind != "audio" else None,
                        "duration_ms": int(r.integers(1000, 60000)) if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic 8x8 'pixels' from a digest of the payload.
    Real deployment: PIL.Image.open(io.BytesIO(payload)) — same signature."""
    d = hashlib.sha256(payload).digest()
    return np.frombuffer((d * 2)[:64], dtype=np.uint8).astype(np.float32).reshape(8, 8)


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched. Feature =
    flattened stub-decoded pixels (image), spectral-stub (audio), frame-
    sampled stub (video: first/middle/last 'frames')."""

    def fx(it):
        for pdf in it:
            feats, oks = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    px = _decode_image_stub(bytes(payload))
                    if kind == "image":
                        f = px.ravel()
                    elif kind == "audio":
                        f = np.abs(np.fft.rfft(px.ravel()))[:16].astype(np.float32)
                    else:  # video: 3 sampled frames
                        f = np.concatenate([px.ravel()[:8]] * 3).astype(np.float32)
                    feats.append(f.tolist())
                    oks.append(True)
                except NotImplementedError:
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"],
                 "feature": feats, "ok": oks}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(fx, schema=FEATURE_SCHEMA)
