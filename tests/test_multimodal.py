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
    assert all(1 <= r["width"] <= 64 + 255 * 8 for r in rows)
    assert all(0.0 <= r["mean_luma"] <= 1.0 for r in rows)
    # the generator mixes tiers: real netpbm rows (id%3==0) carry their
    # true small dimensions, stub rows the digest-derived large ones
    assert all(r["width"] <= 24 for r in rows if r["asset_id"] % 3 == 0)
    assert all(r["width"] >= 64 for r in rows if r["asset_id"] % 3 == 2)
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


def test_audio_features_plumbing(spark):
    from sap_spark.functions.multimodal import extract_audio_features, gen_assets

    assets = gen_assets(spark, 50)
    feats = extract_audio_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["sample_rate"] in (8000, 16000, 22050, 44100)
    assert 1 <= r["n_channels"] <= 2
    assert -60.0 <= r["rms_db"] <= 0.0
    # deterministic: same input → identical features
    again = extract_audio_features(assets).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_resize_images_plumbing(spark):
    from sap_spark.functions.multimodal import gen_assets, resize_images

    assets = gen_assets(spark, 20)
    out = resize_images(assets, target_px=128)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["target_px"] == 128 for r in rows)
    # stub tier (opaque payloads) → 32-byte digests; real netpbm tier →
    # actual resized PPM payloads (header + pixels)
    assert all(
        len(r["resized_png"]) == 32 for r in rows if r["asset_id"] % 3 == 2
    )
    assert all(
        bytes(r["resized_png"])[:2] == b"P6"
        for r in rows
        if r["asset_id"] % 3 == 0
    )
    # different target → different payloads (the stub really keys on size)
    other = {r["asset_id"]: r["resized_png"] for r in resize_images(assets, 64).collect()}
    assert all(other[r["asset_id"]] != r["resized_png"] for r in rows)


def test_codec_strict_mode_raises(spark):
    import pytest
    from sap_spark.functions.multimodal import (
        CodecUnavailableError, extract_audio_features, gen_assets,
    )

    feats = extract_audio_features(gen_assets(spark, 2), deterministic_fake=False)
    with pytest.raises(Exception) as e:
        feats.collect()
    assert "codec not available" in str(e.value)


def _make_ppm(w, h, gray=False):
    import numpy as np

    if gray:
        arr = (np.arange(h * w, dtype=np.uint64) * 7 % 256).astype("uint8").reshape(h, w, 1)
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr
    arr = (np.arange(h * w * 3, dtype=np.uint64) * 13 % 256).astype("uint8").reshape(h, w, 3)
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def test_real_ppm_decode_end_to_end(spark):
    """Uncompressed netpbm images decode for REAL (no external codec):
    exact dimensions, Rec.601 mean luma, and the 8x8 average hash match a
    direct numpy computation; non-netpbm rows in the same batch fall back
    to the stub tier."""
    import numpy as np
    from sap_spark.functions.multimodal import (
        _ahash64,
        extract_image_features,
    )

    ppm, arr = _make_ppm(16, 12)
    pgm, garr = _make_ppm(9, 7, gray=True)
    rows = [(1, bytearray(ppm)), (2, bytearray(pgm)), (3, bytearray(b"\x89PNG fake"))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {
        r["asset_id"]: r.asDict()
        for r in extract_image_features(df).collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (16, 12, 3)
    luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    assert abs(got[1]["mean_luma"] - luma.mean() / 255.0) < 1e-6
    assert got[1]["phash"] == _ahash64(luma)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (9, 7, 1)
    assert abs(got[2]["mean_luma"] - garr[:, :, 0].mean() / 255.0) < 1e-6
    assert got[3]["width"] is not None  # stub tier handled the fake PNG


def test_real_ppm_resize_round_trip(spark):
    """Resize of a netpbm image is a REAL nearest-neighbor resample: the
    output parses as netpbm with the target geometry and exact pixels."""
    import numpy as np
    from sap_spark.functions.multimodal import _parse_ppm, resize_images

    ppm, arr = _make_ppm(64, 32)
    df = spark.createDataFrame([(1, bytearray(ppm))], "asset_id long, payload binary")
    out = resize_images(df, target_px=16).collect()[0]
    resized = _parse_ppm(bytes(out["resized_png"]))
    assert resized.shape == (8, 16, 3)  # aspect preserved, long side 16
    rows = (np.arange(8) * 32) // 8
    cols = (np.arange(16) * 64) // 16
    assert (resized == arr[np.ix_(rows, cols)]).all()


def test_real_wav_decode_end_to_end(spark):
    """PCM WAV decodes for REAL via the stdlib wave module: duration,
    rate, channels, RMS dBFS, and clip fraction match the synthesized
    signal."""
    import io
    import math
    import wave

    import numpy as np

    rate, dur, amp = 8000, 0.5, 0.25
    t = np.arange(int(rate * dur)) / rate
    samples = (amp * 32767 * np.sin(2 * np.pi * 440 * t)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    wav = buf.getvalue()

    # a hard-clipped square wave: every sample at full scale
    clipped = np.where(np.sin(2 * np.pi * 440 * t) >= 0, 32767, -32768).astype("<i2")
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.repeat(clipped, 2).tobytes())
    wav2 = buf2.getvalue()

    from sap_spark.functions.multimodal import extract_audio_features

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(wav2)), (3, bytearray(b"not-audio"))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert got[1]["duration_sec"] == 0.5
    assert got[1]["sample_rate"] == 8000 and got[1]["n_channels"] == 1
    expect_db = 20 * math.log10(amp * 32767 / 32768 / math.sqrt(2))
    assert abs(got[1]["rms_db"] - expect_db) < 0.1
    assert got[1]["clip_fraction"] == 0.0
    assert got[2]["n_channels"] == 2 and got[2]["sample_rate"] == 16000
    assert got[2]["clip_fraction"] > 0.4  # ~half the samples at -32768
    assert got[3]["sample_rate"] is not None  # stub tier for non-RIFF


def test_corrupt_media_nulls_out_never_kills_the_job(spark):
    """Production semantics: a blob that matches a real format's magic but
    is truncated/corrupt/unsupported-depth yields an all-null feature row
    — it must never abort the job, in either mode."""
    from sap_spark.functions.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    bad_rows = [
        (1, bytearray(b"P6\n100 100\n255\n" + b"xy")),   # truncated pixels
        (2, bytearray(b"P6\n-3 4\n255\n" + b"\x00" * 40)),  # negative dim
        (3, bytearray(b"P6\n2 2\n65535\n" + b"\x00" * 24)),  # 16-bit depth
        (4, bytearray(_make_ppm(4, 4)[0])),               # one good one
    ]
    df = spark.createDataFrame(bad_rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in extract_image_features(df).collect()}
    for bad_id in (1, 2, 3):
        assert got[bad_id]["width"] is None and got[bad_id]["phash"] is None
    assert got[4]["width"] == 4
    # strict mode: corrupt REAL-format blobs still null out (only the
    # stub tier raises CodecUnavailable)
    strict = extract_image_features(
        df.where(F.col("asset_id") != 4), deterministic_fake=False
    ).collect()
    assert all(r["width"] is None for r in strict)

    bad_wav = [
        (1, bytearray(b"RIFF\x04\x00\x00\x00WAVEjunk")),  # missing chunks
        (2, bytearray(b"RIFF" + b"\x00" * 4 + b"WAVE")),  # truncated
    ]
    adf = spark.createDataFrame(bad_wav, "asset_id long, payload binary")
    agot = {r["asset_id"]: r for r in extract_audio_features(adf).collect()}
    assert all(agot[i]["sample_rate"] is None for i in (1, 2))


def test_resize_format_discriminator(spark):
    """resize output carries a format column so consumers can tell real
    PPM payloads from stub digests without re-sniffing magic bytes; a
    corrupt netpbm input nulls out."""
    from sap_spark.functions.multimodal import resize_images

    rows = [
        (1, bytearray(_make_ppm(16, 8)[0])),
        (2, bytearray(b"\x89PNG opaque")),
        (3, bytearray(b"P6\n9 9\n255\nxx")),  # corrupt
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in resize_images(df, target_px=8).collect()}
    assert got[1]["format"] == "ppm" and bytes(got[1]["resized_png"])[:2] == b"P6"
    assert got[2]["format"] == "stub-digest" and len(got[2]["resized_png"]) == 32
    assert got[3]["format"] is None and got[3]["resized_png"] is None
