"""Multimodal columns: opaque binary payloads + typed metadata.

Model (mirrors the reference's stream-property design, which carries media
*metadata* — etag/content-type/links — separate from bytes,
SapODataConstants.java:220-233): an asset is a `binary` column plus a
metadata struct. Decode / feature-extraction / resize / frame-sampling run
as Arrow-batched functions over ``mapInPandas`` so each batch of binary
blobs crosses to Python exactly once, already columnar.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this image — the
decode step is stubbed behind ``_decode_image_stub``/... which either
raises NotImplementedError (strict mode) or produces a deterministic fake
(test mode). The Spark-side plumbing — schema, batch iteration, partition
sizing, UDF signatures — is real and tested; swapping in a real codec
changes one pure-Python function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("content_type", T.StringType(), True),
        T.StructField("etag", T.StringType(), True),
        T.StructField("source_uri", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_png", T.BinaryType(), True),
    ]
)


class CodecUnavailableError(NotImplementedError):
    """Raised in strict mode: the real image/audio codec is not installed."""


def _decode_image_stub(blob: bytes, deterministic_fake: bool) -> dict:
    """STUB for the image decode step (no PIL/opencv in this container).

    deterministic_fake=True derives plausible, reproducible properties from
    a blake2b digest of the bytes — enough to exercise the full distributed
    plumbing end-to-end. Replace the body with `PIL.Image.open` in a real
    deployment; nothing else changes.
    """
    if not deterministic_fake:
        raise CodecUnavailableError(
            "image codec not available in this environment; "
            "install PIL/opencv and replace _decode_image_stub"
        )
    if blob is None:
        return {"width": None, "height": None, "channels": None,
                "mean_luma": None, "phash": None}
    h = hashlib.blake2b(blob, digest_size=24).digest()
    width = 64 + h[0] * 8
    height = 64 + h[1] * 8
    channels = 3 if h[2] % 4 else 1
    mean_luma = h[3] / 255.0
    phash = int.from_bytes(h[4:12], "big", signed=True)
    return {"width": width, "height": height, "channels": channels,
            "mean_luma": round(mean_luma, 6), "phash": phash}


def extract_image_features(
    df: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Per-image feature extraction via mapInPandas (one Arrow batch of
    blobs per call; binary never round-trips through Python rows).

    Input: (id_col long, blob_col binary, ...). Output: IMAGE_FEATURES_SCHEMA.
    """
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(b, deterministic_fake) for b in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["channels"] = out["channels"].astype("Int32")
            yield out

    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 4,
    id_col: str = "asset_id",
    blob_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling (1 row in → ≤max_frames rows out) via mapInPandas —
    the flatMap shape a real ffmpeg-based sampler needs. Stubbed decode:
    fake 'frames' are deterministic slices of the blob digest."""
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob in zip(pdf["asset_id"], pdf["payload"]):
                if blob is None:
                    continue
                if not deterministic_fake:
                    raise CodecUnavailableError("video codec not available")
                n_fake_frames = 1 + (blob[0] % 120 if len(blob) else 0)
                for j, frame in enumerate(range(0, n_fake_frames, every_n)):
                    if j >= max_frames:
                        break
                    digest = hashlib.blake2b(
                        blob + frame.to_bytes(4, "big"), digest_size=32
                    ).digest()
                    rows.append(
                        {"asset_id": asset_id, "frame_idx": frame, "frame_png": digest}
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_png"]
            )

    return pruned.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("rms_db", T.DoubleType(), True),
        T.StructField("clip_fraction", T.DoubleType(), True),
    ]
)


def _decode_audio_stub(blob: bytes, deterministic_fake: bool) -> dict:
    """STUB for the audio decode step (no soundfile/ffmpeg in this
    container). deterministic_fake derives reproducible properties from
    the byte digest; replace with a real decoder, nothing else changes."""
    if not deterministic_fake:
        raise CodecUnavailableError(
            "audio codec not available; install soundfile/ffmpeg and "
            "replace _decode_audio_stub"
        )
    if blob is None:
        return {"duration_sec": None, "sample_rate": None, "n_channels": None,
                "rms_db": None, "clip_fraction": None}
    h = hashlib.blake2b(blob, digest_size=16).digest()
    return {
        "duration_sec": round(0.5 + h[0] / 8.0, 6),
        "sample_rate": (8000, 16000, 22050, 44100)[h[1] % 4],
        "n_channels": 1 + h[2] % 2,
        "rms_db": round(-60.0 + h[3] / 5.0, 6),
        "clip_fraction": round((h[4] % 32) / 1000.0, 6),
    }


def extract_audio_features(
    df: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Per-clip audio features (duration/rate/loudness/clipping — the usual
    training-data quality filters) via mapInPandas; Arrow batches of blobs,
    never per-row Python round-trips."""
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_audio_stub(b, deterministic_fake) for b in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["n_channels"] = out["n_channels"].astype("Int32")
            yield out

    return pruned.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    target_px: int = 256,
    id_col: str = "asset_id",
    blob_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image resize/transcode plumbing (1 blob in → 1 blob out, the
    pre-training normalization shape). Stubbed: the fake 'resized' payload
    is a deterministic digest of (blob, target_px); the schema, batch
    shape, and column pruning are the real contract."""
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("resized_png", T.BinaryType(), True),
            T.StructField("target_px", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for b in pdf["payload"]:
                if b is None:
                    blobs.append(None)
                    continue
                if not deterministic_fake:
                    raise CodecUnavailableError("image codec not available")
                blobs.append(
                    hashlib.blake2b(
                        b + int(target_px).to_bytes(4, "big"), digest_size=32
                    ).digest()
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "resized_png": pd.Series(blobs, dtype=object),
                    "target_px": target_px,
                }
            )

    return pruned.mapInPandas(run, out_schema)


def gen_assets(spark, n: int = 100) -> DataFrame:
    """Deterministic fake asset table (binary payloads + metadata struct) —
    the multimodal analog of sources/datagen.py."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit("asset"), F.col("id").cast("string")), 512).cast(
        "binary"
    )
    ct = F.element_at(
        F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("video/mp4")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    return df.select(
        F.col("id").alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            ct.alias("content_type"),
            F.md5(payload.cast("string")).alias("etag"),
            F.concat(F.lit("synthetic://asset/"), F.col("id")).alias("source_uri"),
            F.length(payload).cast("long").alias("size_bytes"),
        ).alias("meta"),
    )
