"""GIF codec (sap_spark.functions.gif): LZW, palettes, animation,
transparency, and the multimodal wiring. GIF is palette-lossless, so
encode→decode equality is EXACT — round trips here prove both directions
bit-for-bit, and third-party decode (stdlib-shipped icon GIFs were
verified during development) anchors the decoder independently."""

import numpy as np
import pytest

from sap_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    gif_frames,
    is_gif,
    parse_gif,
    parse_gif_indexed,
)


def _pal(n: int, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 3), dtype=np.uint8)


def test_lzw_exact_round_trip_all_code_sizes():
    rng = np.random.default_rng(2)
    for min_code in (2, 4, 8):
        n_sym = 1 << min_code
        idx = rng.integers(0, n_sym, size=997, dtype=np.uint8)
        data = _lzw_encode(min_code, idx)
        out = _lzw_decode(min_code, data, len(idx))
        assert np.array_equal(out, idx)


def test_lzw_table_overflow_forces_clear_and_still_round_trips():
    """>4095 dictionary entries forces the encoder's mid-stream CLEAR;
    the decoder must resync. Low-entropy data grows the table fastest
    per output byte; 60k symbols of 2-bit data crosses the cap."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    out = _lzw_decode(2, _lzw_encode(2, idx), len(idx))
    assert np.array_equal(out, idx)


def test_single_frame_exact_round_trip():
    pal = _pal(17)
    idx = np.random.default_rng(5).integers(0, 17, size=(23, 37), dtype=np.uint8)
    blob = encode_gif(palette=pal, indexed_frames=[idx])
    assert is_gif(blob)
    assert np.array_equal(parse_gif(blob), pal[idx])
    got = parse_gif_indexed(blob)
    assert np.array_equal(got[1], idx) and np.array_equal(got[0][:17], pal)
    assert got[2] is None


def test_animation_composes_frames_exactly():
    pal = _pal(16)
    rng = np.random.default_rng(7)
    f = [rng.integers(0, 16, size=(12, 18), dtype=np.uint8) for _ in range(4)]
    frames = gif_frames(encode_gif(palette=pal, indexed_frames=f))
    assert len(frames) == 4
    for got, idx in zip(frames, f):
        assert np.array_equal(got, pal[idx])


def test_transparency_keeps_underlying_pixels():
    """A transparent index in frame 2 must preserve frame 1's pixels at
    those positions (the composition rule animated GIFs rely on)."""
    pal = _pal(4)
    base = np.zeros((6, 6), np.uint8) + 2
    overlay = np.zeros((6, 6), np.uint8)  # index 0 everywhere...
    overlay[2:4, 2:4] = 3  # ...except a visible patch
    blob = encode_gif(
        palette=pal, indexed_frames=[base, overlay], transparent=0
    )
    frames = gif_frames(blob)
    expect = pal[base].copy()
    expect[2:4, 2:4] = pal[3]
    assert np.array_equal(frames[1], expect)
    # and parse_gif_indexed surfaces the transparent index
    single = encode_gif(palette=pal, indexed_frames=[base], transparent=1)
    assert parse_gif_indexed(single)[2] == 1


def test_corrupt_and_truncated_raise_value_error():
    pal = _pal(8)
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8) % 8
    blob = encode_gif(palette=pal, indexed_frames=[idx])
    with pytest.raises(ValueError):
        parse_gif(blob[: len(blob) // 2])
    mangled = bytearray(blob)
    mangled[30] ^= 0xFF
    try:
        out = parse_gif(bytes(mangled))  # may survive if bits land benignly
        assert out is None or out.shape == (8, 8, 3)
    except ValueError:
        pass
    assert parse_gif(b"NOTGIF" + blob) is None  # wrong magic → stub tier


def test_gif_tier_feature_extraction_and_resize(spark):
    from sap_spark.functions.multimodal import (
        extract_image_features,
        resize_images,
    )

    pal = _pal(32)
    idx = np.random.default_rng(9).integers(0, 32, size=(20, 40), dtype=np.uint8)
    blob = encode_gif(palette=pal, indexed_frames=[idx], transparent=5)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, payload binary"
    )
    feat = extract_image_features(df).collect()[0]
    assert feat["width"] == 40 and feat["height"] == 20 and feat["channels"] == 3
    row = resize_images(df, target_px=10).collect()[0]
    assert row["format"] == "gif"
    pal2, idx2, t2 = parse_gif_indexed(bytes(row["resized_png"]))
    # palette-space resize: same palette, same transparency, NN indices
    assert np.array_equal(pal2[: len(pal)], pal) and t2 == 5
    assert idx2.shape == (5, 10)
    rows = (np.arange(5) * 20) // 5
    cols = (np.arange(10) * 40) // 10
    assert np.array_equal(idx2, idx[np.ix_(rows, cols)])


def test_animated_gif_frame_sampling(spark):
    from sap_spark.functions.multimodal import sample_video_frames, _parse_png

    pal = _pal(16)
    rng = np.random.default_rng(11)
    f = [rng.integers(0, 16, size=(10, 14), dtype=np.uint8) for _ in range(6)]
    blob = encode_gif(palette=pal, indexed_frames=f)
    df = spark.createDataFrame(
        [(3, bytearray(blob))], "asset_id long, payload binary"
    )
    rows = (
        sample_video_frames(df, every_n=2, max_frames=3)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert np.array_equal(
            _parse_png(bytes(r["frame_png"])), pal[f[r["frame_idx"]]]
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        min_code=st.integers(min_value=2, max_value=8),
        data=st.data(),
    )
    def test_lzw_round_trip_property(min_code, data):
        """For any symbol stream over any alphabet size, encode→decode
        is the identity — the LZW pair's dictionary growth, width
        switches, and overflow clears must agree on every input, not
        just the fixture shapes."""
        n_sym = 1 << min_code
        idx = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n_sym - 1),
                min_size=1,
                max_size=3000,
            )
        )
        arr = np.asarray(idx, dtype=np.uint8)
        out = _lzw_decode(min_code, _lzw_encode(min_code, arr), len(arr))
        assert np.array_equal(out, arr)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        n_colors=st.integers(min_value=2, max_value=256),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def test_gif_encode_decode_property(w, h, n_colors, seed):
        """Any palette+index image round-trips exactly through the GIF
        container (palette-lossless format)."""
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
        out = parse_gif(encode_gif(palette=pal, indexed_frames=[idx]))
        assert np.array_equal(out, pal[idx])
