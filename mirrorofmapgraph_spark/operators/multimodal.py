"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas UDFs via mapInPandas.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs): ``decode_image``/``extract_audio_features`` run a
clearly-marked deterministic fake when ``fake=True`` (default, used by
tests to validate schema/partitioning/batch shape) and raise
NotImplementedError otherwise. The Spark-side plumbing — schemas,
mapInPandas signatures, batch iteration, partition sizing — is real and
is what matters at 100 TB: binary payloads never leave the executor, the
UDF streams record batches (no per-row Python), and metadata columns stay
available for predicate pushdown before the expensive decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "asset_id long, width int, height int, channels int, feature array<float>"
)
AUDIO_SCHEMA = "asset_id long, n_samples long, sample_rate int, rms double"
FRAME_SCHEMA = "asset_id long, frame_idx int, frame bytes".replace("bytes", "binary")


def synthesize_assets(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake multimodal asset table:
    (asset_id, kind, meta_width, meta_height, sample_rate, payload binary)."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        (F.col("id") % 16 * 64 + 64).cast("int").alias("meta_width"),
        (F.col("id") % 9 * 64 + 64).cast("int").alias("meta_height"),
        F.lit(16000).alias("sample_rate"),
    )
    # deterministic payload: repeated sha2 of the id, truncated
    payload = F.substring(
        F.repeat(F.sha2(F.col("asset_id").cast("string"), 256), payload_bytes // 32 + 1),
        1,
        payload_bytes,
    )
    return df.withColumn("payload", F.encode(payload, "utf-8"))


def _fake_image_features(payload: bytes, width: int, height: int, dim: int = 8) -> np.ndarray:
    # deterministic: fold payload bytes into `dim` buckets
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, dim).mean(axis=0) / 255.0


def decode_image(assets: DataFrame, *, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract image assets -> IMAGE_SCHEMA rows.
    Real decode is stubbed (no codecs in this environment)."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/opencv, not available in this container; "
            "run with fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_image_features(p, w, h, feature_dim)
                for p, w, h in zip(pdf["payload"], pdf["meta_width"], pdf["meta_height"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["meta_width"].astype("int32"),
                    "height": pdf["meta_height"].astype("int32"),
                    "channels": np.full(len(pdf), 3, dtype="int32"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "meta_width", "meta_height", "payload")
        .mapInPandas(run, schema=IMAGE_SCHEMA)
    )


def extract_audio_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """Audio feature extraction (RMS over the fake PCM payload)."""
    if not fake:
        raise NotImplementedError("real audio decode not available; use fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms = [
                float(np.sqrt(np.mean(np.frombuffer(p, dtype=np.uint8).astype(np.float64) ** 2)))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_samples": [len(p) for p in pdf["payload"]],
                    "sample_rate": pdf["sample_rate"].astype("int32"),
                    "rms": rms,
                }
            )

    return (
        assets.filter(F.col("kind") == "audio")
        .select("asset_id", "sample_rate", "payload")
        .mapInPandas(run, schema=AUDIO_SCHEMA)
    )


def sample_frames(assets: DataFrame, *, every_n_bytes: int = 64, fake: bool = True) -> DataFrame:
    """Video frame sampling stub: emit one 'frame' (payload slice) per
    every_n_bytes — exercising the 1->N mapInPandas fan-out shape."""
    if not fake:
        raise NotImplementedError("real video decode not available; use fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(p), every_n_bytes)):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(p[off : off + every_n_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )
