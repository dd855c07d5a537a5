"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas UDFs via mapInPandas.

Decode kernels: ``fake=True`` (default, used by the oracle gate) runs a
clearly-marked deterministic fake validating schema/partitioning/batch
shape; ``fake=False`` runs a REAL codec-free decode for the formats whose
containers need no external library — binary P6 PPM images, RIFF/PCM WAV
audio (stdlib ``wave`` + numpy), and YUV4MPEG2 (.y4m) video (text header
plus fixed-size raw YUV planes) — and fails loudly on anything else.
Compressed formats (JPEG/PNG/MP3/H.264) would slot into the same kernels
but need PIL/ffmpeg, which this container doesn't ship. The Spark-side
plumbing — schemas,
mapInPandas signatures, batch iteration, partition sizing — is identical
in both modes and is what matters at 100 TB: binary payloads never leave
the executor, the UDF streams record batches (no per-row Python), and
metadata columns stay available for predicate pushdown before the
expensive decode.
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


def _decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary P6 PPM -> (width, height, HxWx3 uint8). Pure parsing — the
    format is an ASCII header plus a raw RGB raster — with loud failure on
    anything malformed (the reader convention set by sources/mtx.py)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary P6 PPM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (want 8-bit)")
    i += 1  # exactly one whitespace byte separates header from raster
    if len(payload) - i < w * h * 3:
        raise ValueError(
            f"PPM raster truncated: need {w * h * 3} bytes, have {len(payload) - i}"
        )
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, raster.reshape(h, w, 3)


def _real_image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """8 base features in [0, 1]: per-channel mean (3), per-channel std
    (3), mean luminance, horizontal edge energy — truncated/zero-padded
    to ``dim``. Vectorized numpy over the decoded raster."""
    f = img.astype(np.float32) / 255.0
    lum = f @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    edge = float(np.abs(np.diff(lum, axis=1)).mean()) if lum.shape[1] > 1 else 0.0
    base = np.concatenate(
        [f.mean(axis=(0, 1)), f.std(axis=(0, 1)), [lum.mean(), edge]]
    ).astype(np.float32)
    if dim <= base.size:
        return base[:dim]
    return np.concatenate([base, np.zeros(dim - base.size, dtype=np.float32)])


def decode_image(assets: DataFrame, *, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract image assets -> IMAGE_SCHEMA rows.

    ``fake=False`` decodes binary P6 PPM payloads (codec-free; width and
    height come from the REAL header, not the metadata columns, so the
    output is the decoded truth even when metadata lies). Compressed
    formats would use the same kernel shape with PIL, not shipped here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_image_features(p, w, h, feature_dim)
                    for p, w, h in zip(
                        pdf["payload"], pdf["meta_width"], pdf["meta_height"]
                    )
                ]
                widths = pdf["meta_width"].astype("int32")
                heights = pdf["meta_height"].astype("int32")
            else:
                decoded = [_decode_ppm(p) for p in pdf["payload"]]
                feats = [_real_image_features(img, feature_dim) for _, _, img in decoded]
                widths = pd.Series([w for w, _, _ in decoded], dtype="int32")
                heights = pd.Series([h for _, h, _ in decoded], dtype="int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": widths,
                    "height": heights,
                    "channels": np.full(len(pdf), 3, dtype="int32"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "meta_width", "meta_height", "payload")
        .mapInPandas(run, schema=IMAGE_SCHEMA)
    )


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/PCM WAV -> (n_samples, sample_rate, float64 samples in [-1, 1]).
    Stdlib ``wave`` handles the container; numpy converts the PCM frames —
    no codec library involved. 16-bit mono/stereo PCM only (the format's
    own uncompressed core); anything else fails loudly."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getcomptype() != "NONE":
            raise ValueError(f"compressed WAV ({wf.getcomptype()}) needs a codec")
        if wf.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {wf.getsampwidth() * 8}-bit")
        n, rate, ch = wf.getnframes(), wf.getframerate(), wf.getnchannels()
        pcm = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.float64)
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)  # downmix to mono
    return n, rate, pcm / 32768.0


def extract_audio_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """Audio feature extraction -> AUDIO_SCHEMA rows.

    ``fake=False`` decodes RIFF/PCM WAV payloads (stdlib container parse +
    numpy PCM conversion): n_samples and sample_rate come from the REAL
    header, rms over the normalized [-1, 1] samples. ``fake=True`` keeps
    the deterministic byte-fold stub for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                rms = [
                    float(np.sqrt(np.mean(np.frombuffer(p, dtype=np.uint8).astype(np.float64) ** 2)))
                    for p in pdf["payload"]
                ]
                n_samples = [len(p) for p in pdf["payload"]]
                rates = pdf["sample_rate"].astype("int32")
            else:
                decoded = [_decode_wav(p) for p in pdf["payload"]]
                rms = [
                    float(np.sqrt(np.mean(s**2))) if s.size else 0.0
                    for _, _, s in decoded
                ]
                n_samples = [n for n, _, _ in decoded]
                rates = pd.Series([r for _, r, _ in decoded], dtype="int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_samples": n_samples,
                    "sample_rate": rates,
                    "rms": rms,
                }
            )

    return (
        assets.filter(F.col("kind") == "audio")
        .select("asset_id", "sample_rate", "payload")
        .mapInPandas(run, schema=AUDIO_SCHEMA)
    )


def _decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """YUV4MPEG2 (.y4m) -> (width, height, per-frame raw luma planes).

    The codec-free video container (public spec: mjpegtools yuv4mpeg(5)):
    one ASCII header line (``YUV4MPEG2 W<w> H<h> F<fps> ... C<cs>``), then
    each frame as a ``FRAME`` marker line plus a fixed-size block of raw
    YUV planes — pure byte arithmetic, no compression. Loud failure on
    anything malformed (the reader convention set by sources/mtx.py)."""
    eol = payload.find(b"\n")
    if eol < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    cs = "420"
    for tok in payload[9:eol].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            cs = val.decode("ascii")
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    if cs.startswith("420"):
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
    elif cs.startswith("422"):
        frame_size = w * h + 2 * ((w // 2) * h)
    elif cs.startswith("444"):
        frame_size = 3 * w * h
    elif cs.startswith("mono"):
        frame_size = w * h
    else:
        raise ValueError(f"unsupported y4m colorspace C{cs}")
    frames: list[bytes] = []
    i = eol + 1
    while i < len(payload):
        feol = payload.find(b"\n", i)
        if feol < 0 or not payload[i:feol].startswith(b"FRAME"):
            raise ValueError(f"y4m FRAME marker missing at byte {i}")
        start = feol + 1
        if len(payload) - start < frame_size:
            raise ValueError(
                f"y4m frame truncated: need {frame_size} bytes, "
                f"have {len(payload) - start}"
            )
        frames.append(payload[start : start + w * h])  # luma plane only
        i = start + frame_size
    return w, h, frames


def sample_frames(
    assets: DataFrame,
    *,
    every_n_bytes: int = 64,
    every_n_frames: int = 1,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling -> FRAME_SCHEMA rows (1->N mapInPandas fan-out).

    ``fake=False`` decodes YUV4MPEG2 payloads and emits every
    ``every_n_frames``-th frame's raw luma plane, with ``frame_idx`` the
    frame's index in the SOURCE stream (so downstream joins against
    timestamps stay correct under sampling). ``fake=True`` slices the
    payload every ``every_n_bytes`` — the deterministic plumbing stub used
    by the oracle gate. Compressed containers (MP4/H.264) would use the
    same kernel shape with pyav, not shipped here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if fake:
                    for i, off in enumerate(range(0, len(p), every_n_bytes)):
                        ids.append(aid)
                        idxs.append(i)
                        frames.append(p[off : off + every_n_bytes])
                else:
                    _, _, lumas = _decode_y4m(p)
                    for i in range(0, len(lumas), every_n_frames):
                        ids.append(aid)
                        idxs.append(i)
                        frames.append(lumas[i])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )
