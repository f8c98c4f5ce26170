"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed through Arrow-batched mapInPandas.

AUDIO IS REAL end-to-end: payloads are genuine 16-bit PCM WAV containers and
`decode_audio` parses them with the stdlib `wave` module (no external
imaging/audio libraries needed). Image/video decode remains STUBBED
(`decode_image` raises NotImplementedError unless `fake=True`) because no
imaging library exists in this container — the deterministic fake (seeded
from the payload digest) keeps the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) real and tested.

At 100 TB: binary payloads never shuffle — all transforms are narrow
(mapInPandas), partition sizing is controlled by
spark.sql.files.maxPartitionBytes on the source, and metadata-only plans
prune the binary column entirely (column pruning keeps the scan light).
Feature math is numpy over each decoded buffer and the output frame is
assembled from numpy arrays (no per-row dict/DataFrame churn).
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_mean double, feat_std double, feat_rms double, "
    "thumb_w int, thumb_h int, n_sampled_frames int"
)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono 16-bit PCM → WAV container bytes (stdlib `wave`)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode: parse a WAV container with the stdlib `wave`
    module. Returns (float64 samples scaled to [-1, 1), sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM WAV is supported")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0, rate


def _sine_payload(i: int, rate: int = 16000, seconds: float = 0.1) -> bytes:
    """Deterministic synthetic audio: a pure tone whose frequency depends on
    the media id — real WAV bytes, so the decoder is exercised for real."""
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64) / rate
    f = 110.0 * (1 + i % 8)
    return encode_wav((0.5 * np.sin(2 * np.pi * f * t) * 32767.0).astype("<i2"), rate)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Audio payloads are REAL WAV bytes;
    image/video payloads are opaque seeded bytes for the fake decoder."""
    rows = []
    for i in range(n):
        h = hashlib.sha1(f"{seed}:{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": _sine_payload(i) if kind == "audio" else h * 8,
                "width": 64 + (i % 4) * 32 if kind != "audio" else None,
                "height": 64 + (i % 3) * 32 if kind != "audio" else None,
                "sample_rate": 16000 if kind == "audio" else None,
                "n_frames": 30 * (1 + i % 5) if kind == "video" else None,
            }
        )
    # Conf-independent construction: pass the list of dicts straight to
    # createDataFrame so nullable int columns never round-trip through a
    # pandas float64 promotion (pd.DataFrame turns None-bearing int columns
    # into float64, which IntegerType rejects unless Arrow coercion happens
    # to be enabled in the session).
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to HxWx3 uint8. REAL decode requires
    an imaging library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/cv2) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_features(df: DataFrame, thumb: int = 32, frame_stride: int = 10) -> DataFrame:
    """decode → resize(thumb) / frame-sample → mean/std/rms features, as an
    Arrow-batched mapInPandas pipeline. Audio decode is REAL (stdlib WAV);
    image/video use the deterministic fake decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mean = np.empty(n)
            std = np.empty(n)
            rms = np.empty(n)
            tw = np.zeros(n, dtype=np.int32)
            th = np.zeros(n, dtype=np.int32)
            frames = np.ones(n, dtype=np.int32)
            kinds = pdf["kind"].to_numpy()
            payloads = pdf["payload"].to_numpy()
            widths = pdf["width"].to_numpy()
            heights = pdf["height"].to_numpy()
            nframes = pdf["n_frames"].to_numpy()
            for i in range(n):
                if kinds[i] == "audio":
                    x, _rate = decode_audio(payloads[i])
                else:
                    w = int(widths[i]) if pd.notna(widths[i]) else thumb
                    h = int(heights[i]) if pd.notna(heights[i]) else thumb
                    if kinds[i] == "video":
                        nf = int(nframes[i]) if pd.notna(nframes[i]) else 1
                        frames[i] = max(1, nf // frame_stride)
                    img = decode_image(payloads[i], w, h, fake=True)
                    # "resize": strided subsample to thumb x thumb
                    sy, sx = max(1, h // thumb), max(1, w // thumb)
                    small = img[::sy, ::sx][:thumb, :thumb]
                    th[i], tw[i] = small.shape[0], small.shape[1]
                    x = small.astype(np.float64).ravel()
                mean[i] = x.mean()
                std[i] = x.std()
                rms[i] = np.sqrt(np.mean(np.square(x)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kinds,
                    "feat_mean": mean,
                    "feat_std": std,
                    "feat_rms": rms,
                    "thumb_w": tw,
                    "thumb_h": th,
                    "n_sampled_frames": frames,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)
