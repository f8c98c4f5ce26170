"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libs are not in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (seeded from the payload digest) produces the
declared shape — so the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested end-to-end.

At 100 TB: binary payloads never shuffle — all transforms are narrow
(mapInPandas), partition sizing is controlled by
spark.sql.files.maxPartitionBytes on the source, and metadata-only plans
prune the binary column entirely (column pruning keeps the scan light).
"""

from __future__ import annotations

import hashlib
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
    "media_id long, kind string, feat_mean double, feat_std double, "
    "thumb_w int, thumb_h int, n_sampled_frames int"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha1(f"{seed}:{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": h * 8,
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
    """decode → resize(thumb) / frame-sample → mean/std features, as an
    Arrow-batched mapInPandas pipeline. Deterministic fake decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                w = int(r.width) if pd.notna(r.width) else thumb
                h = int(r.height) if pd.notna(r.height) else thumb
                if r.kind == "video":
                    n_frames = int(r.n_frames or 1)
                    sampled = max(1, n_frames // frame_stride)
                else:
                    sampled = 1
                img = decode_image(r.payload, w, h, fake=True)
                # "resize": strided subsample to thumb x thumb
                sy, sx = max(1, h // thumb), max(1, w // thumb)
                small = img[::sy, ::sx][:thumb, :thumb]
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "feat_mean": float(small.mean()),
                        "feat_std": float(small.std()),
                        "thumb_w": small.shape[1],
                        "thumb_h": small.shape[0],
                        "n_sampled_frames": sampled,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)
