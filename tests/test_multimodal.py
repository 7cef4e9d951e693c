"""Multimodal plumbing: Arrow-batched decode stubs over mapInPandas."""

import pytest
from pyspark.sql import functions as F

from sap_spark.functions.multimodal import (
    CodecUnavailableError,
    extract_image_features,
    gen_assets,
    sample_video_frames,
)


def test_image_features_deterministic(spark):
    assets = gen_assets(spark, 50)
    feats = extract_image_features(assets).orderBy("asset_id")
    rows = feats.collect()
    assert len(rows) == 50
    assert feats.schema["phash"].dataType.simpleString() == "bigint"
    assert all(64 <= r["width"] <= 64 + 255 * 8 for r in rows)
    assert all(0.0 <= r["mean_luma"] <= 1.0 for r in rows)
    # deterministic across runs
    again = extract_image_features(gen_assets(spark, 50)).orderBy("asset_id").collect()
    assert rows == again


def test_strict_mode_raises_codec_unavailable(spark):
    assets = gen_assets(spark, 3)
    with pytest.raises(Exception, match="image codec not available"):
        extract_image_features(assets, deterministic_fake=False).collect()


def test_frame_sampling_flatmap_shape(spark):
    assets = gen_assets(spark, 30)
    frames = sample_video_frames(assets, every_n=30, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"asset_id", "frame_idx", "frame_png"}
    per_asset = pdf.groupby("asset_id").size()
    assert per_asset.max() <= 4
    assert (pdf["frame_idx"] % 30 == 0).all()
    assert pdf["frame_png"].map(len).eq(32).all()


def test_metadata_struct_schema(spark):
    assets = gen_assets(spark, 5)
    meta = assets.select("meta.*")
    assert set(meta.columns) == {"content_type", "etag", "source_uri", "size_bytes"}
    assert meta.where(F.col("size_bytes") <= 0).count() == 0
