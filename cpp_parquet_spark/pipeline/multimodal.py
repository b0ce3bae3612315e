"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land as ``binary`` columns with metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched UDFs over
``mapInPandas``.  The actual media decode is STUBBED (no image/audio
libraries in this container — task brief): ``mode="real"`` raises
NotImplementedError at the exact seam where PIL/ffmpeg would plug in,
while ``mode="fake"`` computes a deterministic byte-level feature
(16-bin byte histogram + length) so the Spark plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)


def synthetic_media(df_docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: the
    UTF-8 text bytes stand in for an encoded image/audio payload."""
    t = F.col("doc_id") % 3
    return df_docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(t == 0, "image/png").when(t == 1, "audio/wav").otherwise("video/mp4").alias("media_type"),
        F.when(t == 0, (F.col("doc_id") % 640 + 16).cast("int")).alias("width"),
        F.when(t == 0, (F.col("doc_id") % 480 + 16).cast("int")).alias("height"),
        F.when(t != 0, (F.length("text") * 10).cast("long")).alias("duration_ms"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_features(payloads) -> "list":
    import numpy as np

    feats = []
    for p in payloads:
        if p is None or len(p) == 0:
            feats.append([0.0] * 16)
            continue
        raw = np.frombuffer(p, dtype=np.uint8)
        hist = np.bincount(raw >> 4, minlength=16).astype(np.float64)
        feats.append((hist / hist.sum()).round(6).tolist())
    return feats


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if mode == "real":
                # the seam where PIL / torchaudio / ffmpeg would decode;
                # those libraries are not in this container
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; use mode='fake'"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": _fake_features(pdf["payload"].tolist()),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Frame' sampling stub: slices the payload at even offsets — the
    real implementation would seek keyframes; the partitioning/UDF shape
    is identical."""
    frame_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(payload[i * step : i * step + 16]))
            yield pd.DataFrame(rows)

    videos = media.filter(F.col("media_type") == "video/mp4")
    return videos.mapInPandas(run, frame_schema)
