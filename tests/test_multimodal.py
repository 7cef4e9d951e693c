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
    # the generator mixes tiers: real netpbm rows (id%3==0) and real PNG
    # rows (id%6==2) carry their true small dimensions, stub rows
    # (id%6==5) the digest-derived large ones
    assert all(r["width"] <= 24 for r in rows if r["asset_id"] % 3 == 0)
    assert all(r["width"] <= 27 for r in rows if r["asset_id"] % 6 == 2)
    assert all(
        r["channels"] in (1, 3, 4) for r in rows if r["asset_id"] % 6 == 2
    )
    # id%6==5 cycles real baseline JPEG / MJPEG AVI / animated GIF /
    # opaque mp4; JPEG+GIF rows carry small true dims, AVI+mp4 rows get
    # the image-stub's digest-derived large dims (an AVI is not an image)
    assert all(
        r["width"] >= 64
        for r in rows
        if r["asset_id"] % 6 == 5
        and (r["asset_id"] // 6) % 2 == 1
        and (r["asset_id"] // 6) % 8 != 3
    )
    assert all(
        r["width"] <= 40 and r["channels"] == 3
        for r in rows
        if r["asset_id"] % 6 == 5 and (r["asset_id"] // 6) % 8 == 3
    )
    assert all(
        r["width"] <= 26 and r["channels"] in (1, 3)
        for r in rows
        if r["asset_id"] % 6 == 5 and (r["asset_id"] // 6) % 2 == 0
    )
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
    # real MJPEG-AVI rows (id//6%4==1) and animated-GIF rows (id//6%8==3)
    # yield actual PNG frames; everything else is the 32-byte stub digest
    vid = pdf["asset_id"] % 6 == 5
    is_real = vid & (
        (pdf["asset_id"] // 6 % 4 == 1) | (pdf["asset_id"] // 6 % 8 == 3)
    )
    assert pdf.loc[~is_real, "frame_png"].map(len).eq(32).all()
    assert (
        pdf.loc[is_real, "frame_png"]
        .map(lambda b: bytes(b)[:8] == b"\x89PNG\r\n\x1a\n")
        .all()
    )


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
    # actual resized PPM payloads; real PNG tier → actual resized PNGs;
    # real JPEG tier (id%6==5, even id//6) → actual resized JPEGs
    assert all(
        len(r["resized_png"]) == 32
        for r in rows
        if r["asset_id"] % 6 == 5
        and (r["asset_id"] // 6) % 2 == 1
        and (r["asset_id"] // 6) % 8 != 3  # GIF rows resize for real
    )
    assert all(
        bytes(r["resized_png"])[:3] == b"\xff\xd8\xff"
        for r in rows
        if r["asset_id"] % 6 == 5 and (r["asset_id"] // 6) % 2 == 0
    )
    assert all(
        bytes(r["resized_png"])[:2] == b"P6"
        for r in rows
        if r["asset_id"] % 3 == 0
    )
    assert all(
        bytes(r["resized_png"])[:8] == b"\x89PNG\r\n\x1a\n"
        for r in rows
        if r["asset_id"] % 6 == 2
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


# -- real PNG codec (stdlib zlib + numpy; no PIL) ----------------------------


def _png_chunk(ctype, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _build_png(arr, filters, palette=None, depth=8, interlace=0):
    """Test-local PNG builder: FORWARD-filters scanlines per the spec
    (the forward direction, independent of the decoder under test) with a
    chosen filter type per row, then assembles signature/IHDR/IDAT/IEND.
    ``arr`` is the expected reconstruction (H, W, C) uint8 — or (H, W)
    palette indices when ``palette`` is given."""
    import struct
    import zlib

    import numpy as np

    if palette is not None:
        h, w = arr.shape
        c, color_type = 1, 3
        data = arr.reshape(h, w, 1)
    else:
        h, w, c = arr.shape
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        data = arr
    bpp = c * (depth // 8)

    def filter_sub(rows):
        # forward-filter one (sub)image independently (prev row resets)
        out = bytearray()
        prev = np.zeros(len(rows[0].tobytes()), np.uint8)
        for r in range(rows.shape[0]):
            cur = np.frombuffer(rows[r].tobytes(), np.uint8)
            ft = filters[r % len(filters)]
            out.append(ft)
            for x in range(len(cur)):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    )
                out.append((int(cur[x]) - pred) & 0xFF)
            prev = cur
        return out

    raw = bytearray()
    if interlace == 0:
        raw += filter_sub(np.ascontiguousarray(data))
    else:
        # Adam7 gather: 7 reduced images, each forward-filtered on its own
        # (spec §8.2 pass origins/strides, restated here independently of
        # the decoder's table)
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = np.ascontiguousarray(data[y0::dy, x0::dx])
            if sub.shape[0] and sub.shape[1]:
                raw += filter_sub(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _png_chunk(b"PLTE", palette)
    png += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    png += _png_chunk(b"IEND", b"")
    return png


def test_png_encode_decode_round_trip():
    import numpy as np

    from sap_spark.functions.multimodal import _encode_png, _parse_png

    for c in (1, 2, 3, 4):
        arr = (
            (np.arange(11 * 7 * c, dtype=np.uint64) * 31 % 256)
            .astype("uint8")
            .reshape(7, 11, c)
        )
        assert (_parse_png(_encode_png(arr)) == arr).all()


def test_png_all_filter_types_reconstruct_exactly():
    """Each of the five spec filters round-trips: the blob is built by an
    independent forward-filter implementation, so agreement proves the
    decoder's unfiltering, not a shared bug."""
    import numpy as np

    from sap_spark.functions.multimodal import _parse_png

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4):
        assert (_parse_png(_build_png(arr, [ft])) == arr).all(), ft
    # mixed filters per row
    assert (_parse_png(_build_png(arr, [0, 1, 2, 3, 4])) == arr).all()


def test_png_palette_and_16bit_and_gray_alpha():
    import numpy as np

    from sap_spark.functions.multimodal import _parse_png

    # palette: indices map through PLTE to RGB
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    got = _parse_png(_build_png(idx, [0], palette=pal))
    assert got.shape == (2, 2, 3)
    assert (got[0, 0] == [255, 0, 0]).all() and (got[1, 0] == [0, 0, 255]).all()

    # 16-bit truncates to the high byte
    arr16 = np.array([[[0x12, 0x34], [0xAB, 0xCD]]], dtype=np.uint8)  # 1x2 gray16
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    raw = b"\x00" + arr16.tobytes()
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got16 = _parse_png(png16)
    assert got16.shape == (1, 2, 1)
    assert got16[0, 0, 0] == 0x12 and got16[0, 1, 0] == 0xAB

    # gray+alpha keeps 2 channels
    ga = (np.arange(3 * 4 * 2, dtype=np.uint64) % 256).astype("uint8").reshape(3, 4, 2)
    assert (_parse_png(_build_png(ga, [2])) == ga).all()


def test_png_adam7_spec_grid_known_answer():
    """THE independent Adam7 check: a hand-assembled interlaced PNG whose
    pass-k reduced image is all-k must decode to the spec's famous 8x8
    pass-number grid (PNG spec §8.2, restated literally here — shares no
    table or code with the decoder)."""
    import struct
    import zlib

    import numpy as np

    from sap_spark.functions.multimodal import _parse_png

    grid = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ],
        dtype=np.uint8,
    )
    # reduced-image dims for an 8x8 image, straight from the spec
    dims = {1: (1, 1), 2: (1, 1), 3: (2, 1), 4: (2, 2), 5: (4, 2), 6: (4, 4), 7: (8, 4)}
    raw = b""
    for k in range(1, 8):
        pw, ph = dims[k]
        for _ in range(ph):
            raw += b"\x00" + bytes([k]) * pw
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (_parse_png(blob)[..., 0] == grid).all()


def test_png_adam7_round_trip_all_color_types_and_filters():
    """Interlaced blobs built by the test's independent gather+filter
    (including odd dimensions that leave some passes empty, and all five
    filter types inside the reduced images) decode to the original."""
    import numpy as np

    from sap_spark.functions.multimodal import _parse_png

    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        for h, w in ((16, 16), (13, 9), (7, 3), (1, 1), (2, 5)):
            arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            blob = _build_png(arr, [0, 1, 2, 3, 4], interlace=1)
            assert (_parse_png(blob) == arr).all(), (c, h, w)
    # interlaced palette
    idx = rng.integers(0, 3, size=(9, 7), dtype=np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    got = _parse_png(_build_png(idx, [0], palette=pal, interlace=1))
    exp = np.frombuffer(pal, np.uint8).reshape(3, 3)[idx]
    assert (got == exp).all()


def test_png_adam7_real_file_decodes():
    """libpng's own interlaced test image (shipped with libpng-dev)
    decodes to its documented geometry with plausible content; the
    sandbox's only other interlaced PNG is 1-bit palette — out of scope
    and must raise, not crash."""
    import os

    import numpy as np
    import pytest

    from sap_spark.functions.multimodal import _parse_png

    path = "/usr/share/doc/libpng-dev/examples/pngtest.png"
    if not os.path.exists(path):
        pytest.skip("libpng-dev example not present")
    img = _parse_png(open(path, "rb").read())
    assert img.shape == (69, 91, 4) and img.dtype == np.uint8
    assert img.std() > 10  # real content, not a constant field

    onebit = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/httplib2/"
        "ref/img1.png"
    )
    if os.path.exists(onebit):
        with pytest.raises(ValueError, match="bit depth"):
            _parse_png(open(onebit, "rb").read())


def test_png_corrupt_and_out_of_scope_raise_cleanly():
    import struct
    import zlib

    import numpy as np
    import pytest

    from sap_spark.functions.multimodal import _parse_png

    arr = (np.arange(4 * 4 * 3, dtype=np.uint64) % 256).astype("uint8").reshape(4, 4, 3)
    good = _build_png(arr, [0])
    assert _parse_png(b"not png at all") is None  # stub tier, not an error

    # flipped payload byte → CRC mismatch
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))

    # truncated IDAT stream
    with pytest.raises(Exception):
        _parse_png(good[:-20])

    # an IHDR claiming Adam7 over a NON-interlaced stream: the pass
    # geometry's byte count can't match, and that must be a clean error
    noninterlaced_stream = _build_png(arr, [0])[33:]  # chunks after IHDR
    ihdr7 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    mismatch = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr7) + noninterlaced_stream
    )
    with pytest.raises(ValueError, match="size mismatch"):
        _parse_png(mismatch)

    # decompression bomb: huge declared dims, tiny IDAT → size-cap error
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size cap"):
        _parse_png(bomb)


def test_png_features_and_resize_end_to_end(spark):
    """PNG decodes for REAL through the distributed feature/resize path:
    true dimensions and exact Rec.601 luma/ahash; resize emits a valid
    PNG with nearest-neighbor-exact pixels; corrupt PNGs null out."""
    import numpy as np

    from sap_spark.functions.multimodal import (
        _ahash64,
        _encode_png,
        _parse_png,
        extract_image_features,
        resize_images,
    )

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    png = _encode_png(arr)
    corrupt = bytearray(png)
    corrupt[50] ^= 0x55
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, corrupt)],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r.asDict() for r in extract_image_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (40, 24, 3)
    luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    assert abs(got[1]["mean_luma"] - luma.mean() / 255.0) < 1e-6
    assert got[1]["phash"] == _ahash64(luma)
    assert got[2]["width"] is None  # corrupt nulls out, job survives

    out = {r["asset_id"]: r for r in resize_images(df, target_px=10).collect()}
    assert out[1]["format"] == "png"
    resized = _parse_png(bytes(out[1]["resized_png"]))
    assert resized.shape == (6, 10, 3)
    rows_ix = (np.arange(6) * 24) // 6
    cols_ix = (np.arange(10) * 40) // 10
    assert (resized == arr[np.ix_(rows_ix, cols_ix)]).all()
    assert out[2]["format"] is None and out[2]["resized_png"] is None


def test_png_bomb_with_honest_header_is_still_bounded():
    """The real bomb shape: a tiny IHDR (1x1) with an IDAT that inflates
    to many MB. The decoder must cap the zlib ALLOCATION at the header's
    expected scanline size, not merely validate dimensions after a full
    inflate."""
    import struct
    import zlib

    import pytest

    from sap_spark.functions.multimodal import _parse_png

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # claims 1x1 gray
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (32 << 20)))  # 32 MB
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        _parse_png(bomb)


def _wav_blob(tag, ch, rate, bits, data):
    """Hand-rolled RIFF/WAVE container for format-tag tests."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_g711_tables_match_audioop():
    """The A-law/mu-law expansion tables must agree byte-for-byte with
    an independent implementation (stdlib audioop, available on this
    Python) — the round-trip-blind oracle for the G.711 formulas."""
    audioop = pytest.importorskip("audioop")
    from sap_spark.functions.multimodal import _ALAW_TABLE, _ULAW_TABLE

    for i in range(256):
        assert _ALAW_TABLE[i] == audioop.alaw2lin(bytes([i]), 2)[0] | (
            audioop.alaw2lin(bytes([i]), 2)[1] << 8
        ) - (0x10000 if audioop.alaw2lin(bytes([i]), 2)[1] & 0x80 else 0)
        assert _ULAW_TABLE[i] == audioop.ulaw2lin(bytes([i]), 2)[0] | (
            audioop.ulaw2lin(bytes([i]), 2)[1] << 8
        ) - (0x10000 if audioop.ulaw2lin(bytes([i]), 2)[1] & 0x80 else 0)


def test_extended_wav_formats_decode(spark):
    """Float32, 24-bit PCM, and G.711 mu-law WAVs all yield real
    features now (they used to null out); a structurally broken ADPCM
    blob (block_align 0) still nulls."""
    import struct

    import numpy as np

    from sap_spark.functions.multimodal import extract_audio_features

    rate = 8000
    t = np.arange(rate // 4)  # 250 ms
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / rate)

    f32 = _wav_blob(3, 1, rate, 32, sine.astype("<f4").tobytes())
    i24 = (sine * (1 << 23)).astype("<i4")
    b24 = b"".join(struct.pack("<i", int(v))[:3] for v in i24)
    pcm24 = _wav_blob(1, 1, rate, 24, b24)
    audioop = pytest.importorskip("audioop")
    ulaw = _wav_blob(
        7, 1, rate, 8,
        audioop.lin2ulaw((sine * 32768).astype("<i2").tobytes(), 2),
    )
    adpcm = _wav_blob(2, 1, rate, 4, b"\x00" * 128)  # align=0: corrupt

    rows = [
        (1, bytearray(f32)), (2, bytearray(pcm24)),
        (3, bytearray(ulaw)), (4, bytearray(adpcm)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(df).collect()}

    true_rms_db = 20 * np.log10(np.sqrt(np.mean(sine**2)))
    for aid in (1, 2, 3):
        assert got[aid]["duration_sec"] == 0.25
        assert got[aid]["sample_rate"] == rate
        assert got[aid]["n_channels"] == 1
        # mu-law is 8-bit companded: ~0.2 dB of quantization error is
        # expected; float/24-bit are near-exact
        tol = 0.5 if aid == 3 else 0.01
        assert abs(got[aid]["rms_db"] - true_rms_db) < tol
        assert got[aid]["clip_fraction"] == 0.0
    assert got[4]["duration_sec"] is None  # corrupt ADPCM: honest null


def test_wav_extensible_wrapper_and_float_clip(spark):
    """WAVE_FORMAT_EXTENSIBLE wrapping float32 resolves to the inner
    tag; full-scale float samples count as clipped."""
    import struct

    import numpy as np

    from sap_spark.functions.multimodal import extract_audio_features

    rate = 8000
    x = np.ones(800, dtype="<f4")  # constant full-scale -> 100% clipped
    # cbSize=22: wValidBits(2) + dwChannelMask(4) + GUID(16, tag leads)
    fmt = struct.pack(
        "<HHIIHHH", 0xFFFE, 1, rate, rate * 4, 4, 32, 22
    ) + struct.pack("<HIH", 32, 0, 3) + b"\x00" * 14
    data = x.tobytes()
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, payload binary"
    )
    got = extract_audio_features(df).collect()[0]
    assert got["duration_sec"] == 0.1
    assert got["clip_fraction"] == 1.0
    assert abs(got["rms_db"] - 0.0) < 1e-6  # unit amplitude = 0 dBFS


def test_ima_adpcm_core_matches_audioop():
    """The IMA ADPCM state recurrence must agree sample-for-sample with
    stdlib audioop.adpcm2lin (an independent implementation of the same
    public spec) over a long random nibble stream from state (0, 0).
    audioop packs high nibble first; feed the matching order."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    from sap_spark.functions.multimodal import _ima_decode_nibbles

    nibs = np.random.RandomState(7).randint(0, 16, size=(1, 4096)).astype(np.uint8)
    packed = bytes(
        (int(nibs[0, k]) << 4) | int(nibs[0, k + 1]) for k in range(0, 4096, 2)
    )
    want = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], "<i2")
    got = _ima_decode_nibbles(
        nibs, np.zeros(1, np.int32), np.zeros(1, np.int32)
    )[0]
    assert np.array_equal(got, want)


def test_adpcm_wav_round_trips(spark):
    """IMA and MS ADPCM WAVs decode to real features: encode a known
    sine, decode through the full extractor, check duration (fact-chunk
    trimmed to the exact frame count despite block padding), rate, and
    RMS within 4-bit-ADPCM quantization tolerance. Mono and stereo."""
    import numpy as np

    from sap_spark.functions.multimodal import (
        _ima_wav_encode,
        _ms_adpcm_encode,
        _wav_samples,
        extract_audio_features,
    )

    rate = 8000
    t = np.arange(rate)  # 1 s -> not a whole number of ADPCM blocks
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    stereo = np.empty(rate * 2, np.int16)
    stereo[0::2] = sine
    stereo[1::2] = sine // 2

    blobs = {
        1: _ima_wav_encode(sine, rate),
        2: _ms_adpcm_encode(sine, rate),
        3: _ima_wav_encode(stereo, rate, ch=2),
        4: _ms_adpcm_encode(stereo, rate, ch=2),
    }
    # direct decode: fact chunk trims the block pad to exactly 1 s
    for aid, blob in blobs.items():
        x, r, ch, _clip = _wav_samples(blob)
        assert x.size == rate * ch, aid
        ref = (sine if ch == 1 else stereo).astype(np.float64) / 32768.0
        rmse = float(np.sqrt(np.mean((x - ref) ** 2)))
        assert rmse < 0.02, (aid, rmse)

    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    true_rms_db = 20 * np.log10(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    for aid in (1, 2):
        assert got[aid]["duration_sec"] == 1.0
        assert got[aid]["sample_rate"] == rate
        assert got[aid]["n_channels"] == 1
        assert abs(got[aid]["rms_db"] - true_rms_db) < 0.2
        assert got[aid]["clip_fraction"] == 0.0
    for aid in (3, 4):
        assert got[aid]["duration_sec"] == 1.0
        assert got[aid]["n_channels"] == 2


def test_adpcm_corrupt_blocks_null_out(spark):
    """Truncated/garbage ADPCM bodies produce the null feature row (or
    a best-effort decode of whole blocks) — never an exception."""
    import numpy as np

    from sap_spark.functions.multimodal import (
        _ima_wav_encode,
        extract_audio_features,
    )

    rate = 8000
    sine = (
        0.4 * 32767 * np.sin(2 * np.pi * 330 * np.arange(rate) / rate)
    ).astype(np.int16)
    good = _ima_wav_encode(sine, rate)
    # chop the data chunk mid-block: RIFF walk sees a truncated chunk
    rows = [
        (1, bytearray(good[: len(good) // 2])),
        (2, bytearray(good)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert got[1]["duration_sec"] is None  # corrupt: honest null
    assert got[2]["duration_sec"] == 1.0


def test_ms_adpcm_matches_scalar_reference():
    """The vectorized MS ADPCM decoder must agree sample-for-sample with
    an independent scalar implementation of the public spec across ALL
    seven predictor pairs — including the truncate-toward-zero division
    the spec inherits from C (an arithmetic shift floors instead and
    drifts on negative predictor sums)."""
    import struct

    import numpy as np

    from sap_spark.functions.multimodal import (
        _MS_ADAPT,
        _MS_COEFFS,
        _ms_adpcm_decode,
    )

    rng = np.random.RandomState(11)
    n_codes = 48

    def scalar_decode(block: bytes, ch: int) -> list:
        pi = [min(block[c], 6) for c in range(ch)]
        o = ch
        delta = [struct.unpack("<h", block[o + 2 * c : o + 2 * c + 2])[0]
                 for c in range(ch)]
        o += 2 * ch
        s1 = [struct.unpack("<h", block[o + 2 * c : o + 2 * c + 2])[0]
              for c in range(ch)]
        o += 2 * ch
        s2 = [struct.unpack("<h", block[o + 2 * c : o + 2 * c + 2])[0]
              for c in range(ch)]
        o += 2 * ch
        nibs = []
        for b in block[o:]:
            nibs += [b >> 4, b & 0x0F]
        out = list(s2) + list(s1)  # interleaved: older frame first
        for t, code in enumerate(nibs):
            c = t % ch
            signed = code - 16 if code >= 8 else code
            acc = s1[c] * int(_MS_COEFFS[pi[c], 0]) + s2[c] * int(
                _MS_COEFFS[pi[c], 1])
            pred = int(acc / 256) + signed * delta[c]  # C trunc division
            pred = max(-32768, min(32767, pred))
            s2[c], s1[c] = s1[c], pred
            # same anti-overflow clamp as the decoder (beyond-spec guard;
            # unreachable on encoder-produced streams)
            delta[c] = min(max(16, (int(_MS_ADAPT[code]) * delta[c]) >> 8),
                           1 << 20)
            out.append(pred)
        return out

    for ch in (1, 2):
        align = 7 * ch + n_codes * ch // 2
        blocks = []
        for bi in range(6):
            hdr = bytes(rng.randint(0, 7, ch).astype(np.uint8))
            hdr += b"".join(
                struct.pack("<h", int(v))
                for v in rng.randint(16, 4000, ch))  # deltas
            hdr += b"".join(
                struct.pack("<h", int(v))
                for v in rng.randint(-32768, 32768, 2 * ch))  # s1, s2
            body = bytes(rng.randint(0, 256, n_codes * ch // 2).astype(np.uint8))
            blocks.append(hdr + body)
        data = b"".join(blocks)
        got = _ms_adpcm_decode(data, ch, align)
        want = [v for blk in blocks for v in scalar_decode(blk, ch)]
        assert np.array_equal(got, np.array(want, np.int16)), ch


def test_video_meta_survives_riff_bombs(spark):
    """Adversarial nesting: thousands of nested LIST chunks must null
    out (depth-capped ValueError), never escape as RecursionError and
    kill the task."""
    import struct

    from sap_spark.functions.multimodal import (
        _avi_mjpeg_frames,
        extract_video_meta,
    )

    inner = b""
    for _ in range(2000):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"hdrl" + inner
    bomb = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    with pytest.raises(ValueError, match="nesting"):
        _avi_mjpeg_frames(bomb)
    df = spark.createDataFrame(
        [(1, bytearray(bomb))], "asset_id long, payload binary")
    (row,) = extract_video_meta(df).collect()
    assert row["container"] is None  # nulled, job alive


def test_ms_adpcm_encoder_validates_block_size():
    import numpy as np

    from sap_spark.functions.multimodal import _ms_adpcm_encode

    with pytest.raises(ValueError, match="must be even"):
        _ms_adpcm_encode(np.zeros(100, np.int16), 8000, frames_per_block=501)


def test_gen_assets_adpcm_tier(spark):
    """gen_assets routes some audio assets through the real ADPCM
    encoders; those assets must decode with real (non-null) features."""
    from sap_spark.functions.multimodal import extract_audio_features, gen_assets

    # i%3==1 and (i//3)%4 in (1,3): ids 4, 10, 16, 22 within 24
    assets = gen_assets(spark, 24).filter("asset_id in (4, 10, 16, 22)")
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(assets).collect()}
    assert set(got) == {4, 10, 16, 22}
    for aid, r in got.items():
        assert r["duration_sec"] == 0.1, aid
        assert r["sample_rate"] in (8000, 16000)
        assert -40.0 < r["rms_db"] < 0.0


def test_bmp_decode_resize_round_trip(spark):
    """BMP tier: 24-bit bottom-up round trip is exact; 8-bit paletted and
    32-bit BGRA decode; top-down negative height honored; RLE rejects."""
    import struct

    import numpy as np

    from sap_spark.functions.multimodal import (
        _encode_bmp,
        _parse_bmp,
        extract_image_features,
        resize_images,
    )

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(11, 18, 3), dtype=np.uint8)
    blob = _encode_bmp(arr)
    assert np.array_equal(_parse_bmp(blob), arr)

    # top-down variant: flip the height sign in the info header
    td = bytearray(blob)
    td[22:26] = struct.pack("<i", -11)
    assert np.array_equal(
        _parse_bmp(bytes(td)), arr[::-1]
    )  # same bytes now read top-down

    # 8-bit paletted: gray ramp palette, identity indices
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    idx = rng.integers(0, 256, size=(6, 10), dtype=np.uint8)
    stride = (10 + 3) & ~3
    rows8 = np.zeros((6, stride), np.uint8)
    rows8[:, :10] = idx[::-1]
    bmp8 = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54 + len(pal))
        + struct.pack("<IiiHHIIiiII", 40, 10, 6, 1, 8, 0, 0, 0, 0, 256, 0)
        + pal + rows8.tobytes()
    )
    out8 = _parse_bmp(bmp8)
    assert out8.shape == (6, 10, 3)
    assert np.array_equal(out8[..., 0], idx)  # gray palette: R == index

    # RLE-compressed rejects with ValueError
    rle = bytearray(blob)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="compressed BMP"):
        _parse_bmp(bytes(rle))

    # through Spark: features + exact NN resize, re-encoded as BMP
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, payload binary"
    )
    feat = extract_image_features(df).collect()[0]
    assert (feat["width"], feat["height"], feat["channels"]) == (18, 11, 3)
    row = resize_images(df, target_px=9).collect()[0]
    assert row["format"] == "bmp"
    out = _parse_bmp(bytes(row["resized_png"]))
    from sap_spark.functions.multimodal import _nn_resize

    assert np.array_equal(out, _nn_resize(arr, 9))
