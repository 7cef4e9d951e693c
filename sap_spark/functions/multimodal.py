"""Multimodal columns: opaque binary payloads + typed metadata.

Model (mirrors the reference's stream-property design, which carries media
*metadata* — etag/content-type/links — separate from bytes,
SapODataConstants.java:220-233): an asset is a `binary` column plus a
metadata struct. Decode / feature-extraction / resize / frame-sampling run
as Arrow-batched functions over ``mapInPandas`` so each batch of binary
blobs crosses to Python exactly once, already columnar.

Codecs, honestly tiered:

- **Real codecs, no external libs**: PPM/PGM (``P6``/``P5``) images via
  a numpy parser; **PNG via a stdlib-zlib decoder** (all five scanline
  filters, gray/RGB/palette/alpha color types, 8- and 16-bit,
  non-interlaced AND Adam7-interlaced, CRC checked, decompression-bomb
  capped — and a filter-0 encoder for the resize output); **baseline JPEG via a from-the-spec numpy codec**
  (functions/jpeg.py: SOF0/SOF1, 4:4:4/4:2:2/4:2:0 chroma, restart
  markers, progressive SOF2 with successive approximation, plus an
  Annex-K-table encoder for resize output and synthetic fixtures —
  validated against libjpeg-encoded third-party files, baseline AND
  progressive);
  **GIF incl. animation** (functions/gif.py: variable-width LZW both
  directions, interlace, transparency/disposal composition,
  palette-space lossless resize); **BMP** (uncompressed BI_RGB 8/24/32-
  bit, both row orders); **MJPEG-in-AVI video** (RIFF walk + the JPEG
  codec per frame); **WAV audio** — PCM 8/16/24/32-bit, IEEE float,
  G.711 A-law/mu-law (numpy expansion tables verified against audioop),
  IMA/DVI ADPCM (core step verified against audioop) and MS ADPCM
  (vectorized across independent blocks), EXTENSIBLE wrappers, fact-
  chunk frame trimming. These produce true width/height/channels,
  Rec.601 mean luma, an 8×8 average-hash perceptual hash, real
  nearest-neighbor resizes, real sampled video frames, and true
  duration/rate/RMS dBFS/clip fraction.
- **Remaining formats (MP4/H.264, MP3, arithmetic JPEG, ...) stay
  stubbed** — ffmpeg/soundfile are NOT in this image and those
  codecs are not reasonably reimplementable. The stub either raises
  CodecUnavailableError (strict mode) or produces a deterministic fake
  (test mode). Swapping in a real codec changes one pure-Python
  function; the Spark-side plumbing — schema, Arrow batch iteration,
  column pruning, UDF signatures — is identical for both tiers and is
  what these operators actually test at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.functions import gif as _gif
from sap_spark.functions import jpeg as _jpeg
from sap_spark.functions import mp3 as _mp3
from sap_spark.functions import mp4 as _mp4

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


# -- real codecs for uncompressed formats (pure numpy / stdlib) --------------


def _parse_ppm(blob: bytes) -> "np.ndarray | None":
    """P6 (RGB) / P5 (gray) netpbm parse → uint8 array (H, W, C).
    Returns None when the blob is not netpbm. maxval must fit a byte
    (the overwhelmingly common case); 16-bit netpbm raises."""
    if blob is None or len(blob) < 2 or blob[:2] not in (b"P6", b"P5"):
        return None
    # header: magic, width, height, maxval — whitespace-separated with
    # '#' comments; pixel data starts after ONE whitespace byte past maxval
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(blob):
        c = blob[i : i + 1]
        if c == b"#":
            i = blob.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            tokens.append(blob[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")  # → null features
    i += 1  # the single whitespace after maxval
    channels = 3 if blob[:2] == b"P6" else 1
    need = width * height * channels
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=i)
    return data.reshape(height, width, channels)


def _ahash64(gray: "np.ndarray") -> int:
    """8×8 average hash: nearest-neighbor downsample, threshold at the
    mean, 64 bits row-major. The classic perceptual near-dup key."""
    h, w = gray.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * w) // 8
    tiny = gray[np.ix_(rows, cols)].astype(np.float64)
    bits = (tiny > tiny.mean()).flatten()
    v = int(np.packbits(bits).view(">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v  # two's-complement long


_NULL_IMAGE = {
    "width": None, "height": None, "channels": None,
    "mean_luma": None, "phash": None,
}


# -- real PNG codec (stdlib zlib/struct + numpy; no PIL) ---------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px
# Adam7 interlace pass geometry (spec §8.2): (x0, y0, dx, dy) per pass.
# The IDAT stream is 7 independently-filtered reduced images in this
# order; pass k holds the pixels at (y0+i*dy, x0+j*dx).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
# Decompression-bomb guard: refuse images whose raw scanline buffer would
# exceed this (a few-KB IDAT can inflate without bound otherwise).
_PNG_MAX_RAW = 1 << 28  # 256 MiB


def _unfilter_scanlines(
    raw: bytes, height: int, stride: int, bpp: int
) -> "np.ndarray":
    """Reverse PNG scanline filtering (spec §9) → (height, stride) uint8.

    Filters 0/1/2 are vectorized (Sub is a modular prefix sum over
    ``bpp``-strided lanes); Average/Paeth carry a truly sequential
    left-pixel dependency and fall back to a per-byte loop — fine for
    validation-scale assets, and encoders that matter for bulk data
    (including ours) emit filter 0/2 rows. A real deployment swaps in
    PIL; the Spark-side plumbing is identical."""
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for r in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos)
        pos += stride
        if ftype == 0:
            rec = line.copy()
        elif ftype == 1:  # Sub
            rec = (
                (line.reshape(-1, bpp).astype(np.uint32).cumsum(axis=0) % 256)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ftype == 2:  # Up (uint8 addition wraps mod 256)
            rec = line + prev
        elif ftype == 3:  # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = rec
        prev = rec
    return out


def _parse_png(blob: bytes) -> "np.ndarray | None":
    """Real PNG decode → uint8 array (H, W, C). None when the blob is not
    PNG by signature (caller falls through to the stub tier); ValueError
    for PNG-by-signature blobs that are corrupt or out of scope (caller
    nulls the row). Scope: bit depth 8 (all color types, palette via
    PLTE) and 16 (truncated to the high byte), both non-interlaced and
    Adam7-interlaced (each reduced image unfiltered independently, then
    scattered to its pass grid); sub-byte palette depths raise. tRNS is
    ignored (palette alpha reads opaque)."""
    import struct
    import zlib

    if blob is None or len(blob) < 8 or blob[:8] != _PNG_SIG:
        return None
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 12 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", blob[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    if depth not in (8, 16) or (color == 3 and depth != 8):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if width <= 0 or height <= 0:
        raise ValueError("bad PNG dimensions")
    channels = _PNG_CHANNELS[color]
    bps = depth // 8
    bpp = channels * bps
    # one geometry entry per (sub)image: non-interlaced is the single
    # full-size pass of a degenerate 1x1 grid, Adam7 is seven reduced
    # images each filtered independently
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    geom = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        geom.append((x0, y0, dx, dy, pw, ph))
        if pw > 0 and ph > 0:
            expected += ph * (1 + pw * bpp)
    if expected > _PNG_MAX_RAW:
        raise ValueError("PNG exceeds decode size cap")
    # Bounded inflate: cap what zlib may ALLOCATE, not just what the
    # header claims — a 1x1-claiming IHDR with a multi-GB-inflating IDAT
    # must fail here without ever materializing the stream (zlib packs
    # up to ~1032:1, so an unbounded decompress is the actual bomb).
    raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG scanline buffer size mismatch")
    def decode_sub(buf: bytes, ph: int, pw: int) -> "np.ndarray":
        sub = _unfilter_scanlines(buf, ph, pw * bpp, bpp)
        if depth == 16:
            return sub.reshape(ph, pw, channels, 2)[..., 0]
        return sub.reshape(ph, pw, channels)

    if interlace == 0:
        # single pass: the unfiltered buffer IS the image — no scatter copy
        img = decode_sub(raw, height, width)
    else:
        # every pixel belongs to exactly one pass, so empty is fine
        img = np.empty((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in geom:
            if pw <= 0 or ph <= 0:
                continue  # empty pass: no scanlines, not even filter bytes
            nbytes = ph * (1 + pw * bpp)
            img[y0::dy, x0::dx] = decode_sub(raw[pos : pos + nbytes], ph, pw)
            pos += nbytes
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[..., 0]
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        img = pal[idx]
    return np.ascontiguousarray(img)


def _encode_png(arr: "np.ndarray") -> bytes:
    """Minimal real PNG encoder: 8-bit, filter 0 scanlines, one zlib
    IDAT. Accepts (H, W, C) uint8 with C in {1:gray, 2:gray+alpha,
    3:RGB, 4:RGBA}. Round-trips exactly through _parse_png."""
    import struct
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _is_netpbm(blob: bytes) -> bool:
    return blob is not None and len(blob) >= 2 and blob[:2] in (b"P6", b"P5")


def _is_png(blob: bytes) -> bool:
    return blob is not None and len(blob) >= 8 and blob[:8] == _PNG_SIG


def _decode_image_real(blob: bytes) -> "dict | None":
    """Real decode for netpbm (uncompressed), PNG (zlib-compressed),
    JPEG (baseline and progressive), GIF (first composed frame) and BMP
    images. None → none of the formats by magic (caller falls through
    to the stub tier). A blob that claims a real format but is corrupt/
    truncated/out-of-scope (e.g. arithmetic-coded JPEG) yields the
    all-null feature row: one bad upload must null out, never kill the
    job (production feature-extraction semantics)."""
    if not (
        _is_netpbm(blob)
        or _is_png(blob)
        or _jpeg.is_jpeg(blob)
        or _gif.is_gif(blob)
        or _is_bmp(blob)
    ):
        return None
    try:
        if _is_netpbm(blob):
            arr = _parse_ppm(blob)
        elif _is_png(blob):
            arr = _parse_png(blob)
        elif _jpeg.is_jpeg(blob):
            arr = _jpeg.parse_jpeg(blob)
        elif _gif.is_gif(blob):
            arr = _gif.parse_gif(blob)
        else:
            arr = _parse_bmp(blob)
        if arr is None or arr.shape[0] <= 0 or arr.shape[1] <= 0:
            return dict(_NULL_IMAGE)
        if arr.shape[2] >= 3:  # RGB / RGBA (alpha ignored for luma)
            luma = (
                0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
            )
        else:  # gray / gray+alpha
            luma = arr[:, :, 0].astype(np.float64)
        return {
            "width": int(arr.shape[1]),
            "height": int(arr.shape[0]),
            "channels": int(arr.shape[2]),
            "mean_luma": round(float(luma.mean()) / 255.0, 6),
            "phash": _ahash64(luma),
        }
    except Exception:  # noqa: BLE001 — corrupt media nulls out
        return dict(_NULL_IMAGE)


def _nn_resize(arr: "np.ndarray", target_px: int) -> "np.ndarray":
    """Nearest-neighbor resize to target_px on the long side (aspect
    preserved), any channel count."""
    h, w = arr.shape[:2]
    scale = target_px / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    rows = (np.arange(nh) * h) // nh
    cols = (np.arange(nw) * w) // nw
    return arr[np.ix_(rows, cols)]


def _resize_ppm_real(blob: bytes, target_px: int) -> "bytes | None":
    """Real nearest-neighbor resize of a netpbm image to target_px on the
    long side, re-encoded as P6/P5."""
    arr = _parse_ppm(blob)
    if arr is None:
        return None
    out = _nn_resize(arr, target_px)
    nh, nw, c = out.shape
    magic = b"P6" if c == 3 else b"P5"
    header = b"%s\n%d %d\n255\n" % (magic, nw, nh)
    return header + out.tobytes()


def _resize_png_real(blob: bytes, target_px: int) -> "bytes | None":
    """Real nearest-neighbor resize of a PNG (any supported color type),
    re-encoded as 8-bit PNG with the same channel count."""
    arr = _parse_png(blob)
    if arr is None:
        return None
    return _encode_png(_nn_resize(arr, target_px))


def _resize_jpeg_real(blob: bytes, target_px: int) -> "bytes | None":
    """Real nearest-neighbor resize of a baseline JPEG, re-encoded as
    baseline 4:4:4 JPEG (one quantization generation of loss, like any
    decode→re-encode resize pipeline)."""
    from sap_spark.functions.jpeg import encode_jpeg, parse_jpeg

    arr = parse_jpeg(blob)
    if arr is None:
        return None
    return encode_jpeg(_nn_resize(arr, target_px), quality=85)


def _resize_gif_real(blob: bytes, target_px: int) -> "bytes | None":
    """Real LOSSLESS nearest-neighbor resize of a GIF: indices are
    resampled in palette space and re-encoded against the SAME palette
    (transparency index preserved) — no color drift, unlike RGB
    round-tripping. Multi-image/offset GIFs fall back to composing the
    first frame and encoding it over its own exact palette."""
    indexed = _gif.parse_gif_indexed(blob)
    if indexed is not None:
        pal, idx, transparent = indexed
        small = _nn_resize(idx[..., None], target_px)[..., 0]
        return _gif.encode_gif(
            palette=pal, indexed_frames=[small], transparent=transparent
        )
    arr = _gif.parse_gif(blob)  # composed first frame, ValueError if corrupt
    small = _nn_resize(arr, target_px)
    colors, inverse = np.unique(
        small.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:  # composed frame can exceed one palette
        raise ValueError("composed GIF frame exceeds 256 colors")
    return _gif.encode_gif(
        palette=colors.astype(np.uint8),
        indexed_frames=[inverse.astype(np.uint8).reshape(small.shape[:2])],
    )


# -- real BMP codec (uncompressed BI_RGB; the remaining common web format) ---


def _is_bmp(blob: bytes) -> bool:
    return blob is not None and len(blob) >= 2 and blob[:2] == b"BM"


def _parse_bmp(blob: bytes) -> "np.ndarray | None":
    """Uncompressed BI_RGB BMP decode → uint8 (H, W, C), C in {3, 4}
    (8-bit paletted input expands through its palette to RGB).
    Covers 8-bit paletted, 24-bit BGR and 32-bit BGRA, top-down and
    bottom-up row orders, 4-byte row padding. None when not BMP by
    magic; ValueError for BMP-by-magic blobs that are corrupt or use
    RLE/bitfield compression (caller nulls the row)."""
    import struct as _struct

    if not _is_bmp(blob):
        return None
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = _struct.unpack("<I", blob[10:14])
    hdr_size, w, h, _planes, bpp, comp = _struct.unpack("<IiiHHI", blob[14:34])
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    if comp != 0:  # BI_RLE*/BI_BITFIELDS/embedded PNG-JPEG
        raise ValueError(f"compressed BMP (method {comp}) not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w * h > _PNG_MAX_RAW:
        raise ValueError("BMP dimensions out of range")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    stride = (w * bpp // 8 + 3) & ~3
    if data_off + stride * h > len(blob):
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(blob, np.uint8, stride * h, data_off).reshape(h, stride)
    if bpp == 8:
        (n_colors,) = _struct.unpack("<I", blob[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > data_off:
            raise ValueError("BMP palette overruns pixel data")
        pal = np.frombuffer(blob, np.uint8, 4 * n_colors, pal_off).reshape(-1, 4)
        idx = raw[:, :w]
        if int(idx.max()) >= n_colors:
            raise ValueError("BMP palette index out of range")
        img = pal[idx][:, :, [2, 1, 0]]  # BGRX palette → RGB
    else:
        c = bpp // 8
        px = raw[:, : w * c].reshape(h, w, c)
        img = px[:, :, [2, 1, 0]] if c == 3 else px[:, :, [2, 1, 0, 3]]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def _encode_bmp(arr: "np.ndarray") -> bytes:
    """24-bit bottom-up BI_RGB writer for uint8 (H, W, 1|3|4) arrays
    (gray expands, alpha drops — BI_RGB has no alpha semantics).
    Round-trips exactly through _parse_bmp."""
    import struct as _struct

    h, w, c = arr.shape
    rgb = arr[:, :, :1].repeat(3, axis=2) if c == 1 else arr[:, :, :3]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    data = rows.tobytes()
    return (
        b"BM"
        + _struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


# -- real MJPEG-in-AVI video tier (RIFF walk + functions/jpeg.py frames) -----
#
# AVI is the one video container whose common intra-only codec (MJPEG) this
# repo can genuinely decode: every frame chunk is a standalone baseline
# JPEG. The container walk is ~40 lines of public RIFF spec; inter-coded
# codecs (H.264/MP4 etc.) remain env-gated stubs.


def _is_avi(blob: bytes) -> bool:
    return (
        blob is not None
        and len(blob) >= 12
        and blob[:4] == b"RIFF"
        and blob[8:12] == b"AVI "
    )


def _riff_walk(blob: bytes, on_chunk) -> None:
    """Shared RIFF chunk-tree walk (little-endian sizes, word-aligned,
    LIST recursion with a depth cap so adversarial nesting raises
    ValueError instead of RecursionError). Calls
    ``on_chunk(fourcc, body_start, body_end, enclosing_list_types)``
    for every non-LIST chunk."""
    import struct as _struct

    def walk(pos: int, end: int, lists: tuple, depth: int) -> None:
        if depth > 16:
            raise ValueError("RIFF nesting too deep")
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            (size,) = _struct.unpack("<I", blob[pos + 4 : pos + 8])
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("truncated RIFF chunk")
            if fourcc == b"LIST" and size >= 4:
                ltype = blob[pos + 8 : pos + 12]
                walk(pos + 12, body_end, lists + (ltype,), depth + 1)
            else:
                on_chunk(fourcc, pos + 8, body_end, lists)
            pos = body_end + (size & 1)  # chunks are word-aligned

    (riff_size,) = _struct.unpack("<I", blob[4:8])
    walk(12, min(len(blob), 8 + riff_size), (), 0)


def _avi_mjpeg_frames(blob: bytes) -> "list[bytes]":
    """Return the video frame payloads from every 'movi' list — chunks
    whose fourcc is '##db'/'##dc' — that sniff as JPEG. An AVI carrying
    a non-MJPEG codec yields []; structurally broken RIFF raises."""
    frames: list[bytes] = []

    def on_chunk(fourcc: bytes, start: int, end: int, lists: tuple) -> None:
        if (
            b"movi" in lists
            and len(fourcc) == 4
            and fourcc[2:4] in (b"db", b"dc")
            and fourcc[:2].isdigit()
        ):
            frame = blob[start:end]
            if _jpeg.is_jpeg(frame):
                frames.append(frame)

    _riff_walk(blob, on_chunk)
    return frames


def _avi_meta(blob: bytes) -> dict:
    """Container metadata from the AVI headers: avih gives frame period,
    total frames and dimensions; the first 'vids' strh gives the video
    codec fourcc; stream count from avih. No frame decode."""
    import struct as _struct

    found: dict = {}

    def on_chunk(fourcc: bytes, start: int, end: int, _lists: tuple) -> None:
        if fourcc == b"avih" and end - start >= 40:
            (usec, _mbps, _pad, _flags, total, _init, streams,
             _buf, w, h) = _struct.unpack("<10I", blob[start : start + 40])
            found.update(
                usec_per_frame=usec, n_frames=total,
                n_streams=streams, width=w, height=h)
        elif (fourcc == b"strh" and end - start >= 8
              and "codec" not in found
              and blob[start : start + 4] == b"vids"):
            found["codec"] = blob[start + 4 : start + 8].decode("latin-1").strip()

    _riff_walk(blob, on_chunk)
    if "usec_per_frame" not in found:
        raise ValueError("AVI missing avih header")
    return found


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("video_codec", T.StringType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
    ]
)

_NULL_VIDEO = {
    "container": None, "duration_sec": None, "width": None, "height": None,
    "n_frames": None, "fps": None, "video_codec": None, "n_tracks": None,
}


def _video_meta_one(blob: "bytes | None") -> dict:
    """Typed container metadata for one video blob. MP4 metadata is a
    REAL ISO-BMFF box walk (functions/mp4.py) even though its coded
    samples stay undecodable here; AVI reads avih/strh; GIF uses the
    structural walk (no LZW). Unknown containers and corrupt media
    yield the all-null row — never an exception."""
    if blob is None:
        return dict(_NULL_VIDEO)
    blob = bytes(blob)
    try:
        if _mp4.is_mp4(blob):
            m = _mp4.parse_mp4_meta(blob)
            vid = next(
                (t for t in m["tracks"] if t["kind"] == "video"), None)
            n = vid["n_samples"] if vid else None
            tdur = vid["duration_sec"] if vid else None
            return {
                "container": "mp4",
                "duration_sec": m["duration_sec"],
                "width": vid["width"] if vid else None,
                "height": vid["height"] if vid else None,
                "n_frames": n,
                "fps": round(n / tdur, 6) if n and tdur else None,
                "video_codec": vid["codec"] if vid else None,
                "n_tracks": m["n_tracks"],
            }
        if _is_avi(blob):
            m = _avi_meta(blob)
            usec = m["usec_per_frame"]
            return {
                "container": "avi",
                "duration_sec": round(m["n_frames"] * usec / 1e6, 6)
                if usec else None,
                "width": m["width"],
                "height": m["height"],
                "n_frames": m["n_frames"],
                "fps": round(1e6 / usec, 6) if usec else None,
                "video_codec": m.get("codec"),
                "n_tracks": m["n_streams"],
            }
        if _gif.is_gif(blob):
            m = _gif.gif_meta(blob)
            dur = m["duration_sec"]
            return {
                "container": "gif",
                "duration_sec": dur,
                "width": m["width"],
                "height": m["height"],
                "n_frames": m["n_frames"],
                "fps": round(m["n_frames"] / dur, 6) if dur else None,
                "video_codec": "gif-lzw",
                "n_tracks": 1,
            }
    except Exception:  # noqa: BLE001 — corrupt media nulls out, never kills the job
        pass
    return dict(_NULL_VIDEO)


def extract_video_meta(
    df: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "payload",
) -> DataFrame:
    """Per-video container metadata via mapInPandas (1 row in → 1 row
    out, Arrow-batched; binary never round-trips through Python rows).
    Unlike frame decode, this tier is fully real for MP4/AVI/GIF."""
    pruned = df.select(
        F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"asset_id": aid, **_video_meta_one(blob)}
                for aid, blob in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields])

    return pruned.mapInPandas(run, VIDEO_META_SCHEMA)


def _gen_avi_mjpeg(frames: "list[bytes]", w: int, h: int, fps: int = 10) -> bytes:
    """Minimal spec-shaped MJPEG AVI writer (avih + one 'vids'/'MJPG'
    stream + movi). Exists to give the real video tier same-repo
    fixtures; round-trips through _avi_mjpeg_frames byte-exactly."""
    import struct as _struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + _struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    max_bytes = max((len(f) for f in frames), default=0)
    avih = _struct.pack(
        "<14I", 10**6 // fps, max_bytes * fps, 0, 0x10, len(frames), 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + _struct.pack(
        "<IHH8I4h",
        0, 0, 0,  # flags, priority, language
        0, 1, fps,  # initial frames, scale, rate (fps = rate/scale)
        0, len(frames), max_bytes, 0xFFFFFFFF, 0,  # start, length, buf, quality, sampsize
        0, 0, w, h,  # rcFrame
    )
    strf = _struct.pack(
        "<I2i2H4sI2i2I", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = (
        lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + chunk(b"LIST", movi)
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"AVI " + body


_NULL_AUDIO = {
    "duration_sec": None, "sample_rate": None, "n_channels": None,
    "rms_db": None, "clip_fraction": None,
}


def _g711_tables() -> "tuple[np.ndarray, np.ndarray]":
    """256-entry A-law / mu-law expansion tables from the public G.711
    formulas (A-law: XOR 0x55, sign bit set = positive; mu-law: ones'
    complement, bias 0x84, sign bit set = negative)."""
    alaw = np.empty(256, np.int32)
    ulaw = np.empty(256, np.int32)
    for i in range(256):
        b = i ^ 0x55
        sign, exp, mant = b & 0x80, (b >> 4) & 0x07, b & 0x0F
        x = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
        alaw[i] = x if sign else -x
        u = ~i & 0xFF
        sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
        x = (((mant << 3) + 0x84) << exp) - 0x84
        ulaw[i] = -x if sign else x
    return alaw, ulaw


_ALAW_TABLE, _ULAW_TABLE = _g711_tables()

# IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
# both from the public IMA ADPCM spec (same tables stdlib audioop uses).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)

# MS ADPCM adaptation table and the 7 standard predictor-coefficient
# pairs, from the public WAVE_FORMAT_ADPCM spec.
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], np.int32)
_MS_COEFFS = np.array(
    [(256, 0), (512, -256), (0, 64), (192, 64),
     (240, 0), (460, -208), (392, -232)], np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred0: np.ndarray,
                        idx0: np.ndarray) -> np.ndarray:
    """Core IMA ADPCM step over a (n_streams, n_nibbles) nibble matrix
    with per-stream initial predictor/step-index. Returns int16 samples
    of the same shape. Vectorized across streams; the sequential state
    recurrence loops over nibble positions only. Cross-checked against
    stdlib audioop.adpcm2lin (independent implementation of the same
    spec) in tests."""
    pred = pred0.astype(np.int32).copy()
    idx = idx0.astype(np.int32).copy()
    out = np.empty(nibbles.shape, np.int16)
    for t in range(nibbles.shape[1]):
        nib = nibbles[:, t].astype(np.int32)
        step = _IMA_STEPS[idx]
        diff = (step >> 3)
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        pred = np.where(nib & 8, pred - diff, pred + diff)
        pred = np.clip(pred, -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_ADJ[nib & 7], 0, 88)
        out[:, t] = pred
    return out


def _ima_wav_decode(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM (WAV format tag 0x11) → interleaved int16 samples.

    WAV block layout: per channel a 4-byte header (initial int16 sample,
    uint8 step index, reserved), then 4-byte groups per channel, round-
    robin; each byte carries two nibbles, LOW nibble first (WAV order —
    note audioop's raw stream is high-first). Trailing partial block is
    dropped, as real writers only emit whole blocks."""
    if block_align < 4 * ch or ch < 1:
        raise ValueError("bad IMA ADPCM block_align")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.empty(0, np.int16)
    blocks = np.frombuffer(
        data[: n_blocks * block_align], np.uint8).reshape(n_blocks, block_align)
    hdr = blocks[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred0 = (hdr[:, :, 0].astype(np.int32)
             | (hdr[:, :, 1].astype(np.int8).astype(np.int32) << 8))
    idx0 = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    body = blocks[:, 4 * ch:]
    n_groups = body.shape[1] // (4 * ch)
    # (n_blocks, groups, ch, 4 bytes) -> per-channel byte runs
    grp = body[:, : n_groups * 4 * ch].reshape(n_blocks, n_groups, ch, 4)
    by_chan = grp.transpose(0, 2, 1, 3).reshape(n_blocks * ch, n_groups * 4)
    nibs = np.empty((n_blocks * ch, n_groups * 8), np.uint8)
    nibs[:, 0::2] = by_chan & 0x0F   # low nibble first (WAV order)
    nibs[:, 1::2] = by_chan >> 4
    samples = _ima_decode_nibbles(
        nibs, pred0.reshape(-1), idx0.reshape(-1)
    ).reshape(n_blocks, ch, n_groups * 8)
    # header sample leads each channel's block, then the decoded run
    full = np.concatenate(
        [pred0.astype(np.int16)[:, :, None], samples], axis=2)
    # (block, ch, t) -> interleaved frames
    return full.transpose(0, 2, 1).reshape(-1)


def _wav_container(tag: int, ch: int, rate: int, bits: int, align: int,
                   n_frames: int, data: bytes, ext: bytes = b"") -> bytes:
    """Minimal RIFF/WAVE wrapper with a fact chunk (required for
    compressed tags)."""
    import struct as _struct

    fmt = _struct.pack(
        "<HHIIHH", tag, ch, rate, rate * align, align, bits
    ) + (_struct.pack("<H", len(ext)) + ext if ext else b"")
    chunks = (
        b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"fact" + _struct.pack("<II", 4, n_frames)
        + b"data" + _struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ima_wav_encode(samples: np.ndarray, rate: int, ch: int = 1,
                    frames_per_block: int = 505) -> bytes:
    """Encode interleaved int16 samples as an IMA ADPCM WAV (tag 0x11).
    Fixture/datagen encoder — plain Python per sample, small inputs
    only. frames_per_block must be 8k+1 so channel data fills whole
    4-byte groups."""
    import struct as _struct

    if (frames_per_block - 1) % 8:
        raise ValueError("frames_per_block must be 8k+1")
    x = np.asarray(samples, np.int32).reshape(-1, ch)
    n_frames = x.shape[0]
    pad = (-n_frames) % frames_per_block
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)])
    align = 4 * ch + (frames_per_block - 1) // 2 * ch
    # initial step index sized to the signal; carried across blocks
    # (header transmits it per block, like real encoders)
    mean_diff = [
        float(np.mean(np.abs(np.diff(x[:, c])))) or 1.0 for c in range(ch)
    ]
    idx_c = [int(np.searchsorted(_IMA_STEPS, mean_diff[c])) for c in range(ch)]
    blocks = []
    for b0 in range(0, x.shape[0], frames_per_block):
        blk = x[b0 : b0 + frames_per_block]
        hdr, chan_bytes = b"", []
        for c in range(ch):
            pred, idx = int(blk[0, c]), min(88, idx_c[c])
            hdr += _struct.pack("<hBB", pred, idx, 0)
            nibs = []
            for s in blk[1:, c]:
                step = int(_IMA_STEPS[idx])
                diff = int(s) - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # reconstruct exactly as the decoder will
                d = (step >> 3) + ((step >> 2) if nib & 1 else 0) \
                    + ((step >> 1) if nib & 2 else 0) + (step if nib & 4 else 0)
                pred = max(-32768, min(32767, pred - d if nib & 8 else pred + d))
                idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
                nibs.append(nib)
            by = bytes(
                nibs[k] | (nibs[k + 1] << 4) for k in range(0, len(nibs), 2))
            chan_bytes.append(by)
        body = b"".join(
            cb[g : g + 4] for g in range(0, len(chan_bytes[0]), 4)
            for cb in chan_bytes)
        blocks.append(hdr + body)
    return _wav_container(0x11, ch, rate, 4, align, n_frames,
                          b"".join(blocks),
                          ext=_struct.pack("<H", frames_per_block))


def _ms_adpcm_encode(samples: np.ndarray, rate: int, ch: int = 1,
                     frames_per_block: int = 500) -> bytes:
    """Encode interleaved int16 samples as MS ADPCM (tag 0x02) using
    predictor pair 0 (pred = previous sample). Fixture/datagen encoder."""
    import struct as _struct

    if frames_per_block < 3 or ((frames_per_block - 2) * ch) % 2:
        raise ValueError("(frames_per_block - 2) * channels must be even")
    x = np.asarray(samples, np.int32).reshape(-1, ch)
    n_frames = x.shape[0]
    pad = (-n_frames) % frames_per_block
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)])
    align = 7 * ch + (frames_per_block - 2) * ch // 2
    blocks = []
    for b0 in range(0, x.shape[0], frames_per_block):
        blk = x[b0 : b0 + frames_per_block]
        s2 = [int(blk[0, c]) for c in range(ch)]
        s1 = [int(blk[1, c]) for c in range(ch)]
        delta = [max(16, abs(s1[c] - s2[c]) // 4 or 16) for c in range(ch)]
        hdr = bytes(ch)  # predictor index 0 per channel
        hdr += b"".join(_struct.pack("<h", delta[c]) for c in range(ch))
        hdr += b"".join(_struct.pack("<h", s1[c]) for c in range(ch))
        hdr += b"".join(_struct.pack("<h", s2[c]) for c in range(ch))
        nibs = []
        for t in range(2, frames_per_block):
            for c in range(ch):
                pred = (s1[c] * 256 + s2[c] * 0) >> 8
                code = max(-8, min(7, round((int(blk[t, c]) - pred) / delta[c])))
                rec = max(-32768, min(32767, pred + code * delta[c]))
                s2[c], s1[c] = s1[c], rec
                delta[c] = max(16, (int(_MS_ADAPT[code & 0xF]) * delta[c]) >> 8)
                nibs.append(code & 0xF)
        body = bytes(
            (nibs[k] << 4) | nibs[k + 1] for k in range(0, len(nibs), 2))
        blocks.append(hdr + body)
    ext = _struct.pack("<HH", frames_per_block, 7) + b"".join(
        _struct.pack("<hh", int(a), int(b)) for a, b in _MS_COEFFS)
    return _wav_container(0x02, ch, rate, 4, align, n_frames,
                          b"".join(blocks), ext=ext)


def _ms_adpcm_decode(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """MS ADPCM (WAV format tag 0x02) → interleaved int16 samples.

    Block: per-channel uint8 predictor index, per-channel int16 initial
    delta, per-channel int16 sample1 (newer) and sample2 (older); then
    4-bit codes, high nibble first, alternating channels per nibble.
    pred = ((s1*c1 + s2*c2) >> 8) + signed(code)*delta, int16-clamped;
    delta = max(16, adapt[code]*delta >> 8)."""
    hdr_len = 7 * ch
    if block_align <= hdr_len or ch < 1:
        raise ValueError("bad MS ADPCM block_align")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.empty(0, np.int16)
    blocks = np.frombuffer(
        data[: n_blocks * block_align], np.uint8).reshape(n_blocks, block_align)

    def i16(lo, hi):
        return lo.astype(np.int32) | (hi.astype(np.int8).astype(np.int32) << 8)

    pred_idx = np.clip(blocks[:, :ch].astype(np.int32), 0, len(_MS_COEFFS) - 1)
    o = ch
    delta = i16(blocks[:, o:o + 2 * ch:2], blocks[:, o + 1:o + 2 * ch:2])
    o += 2 * ch
    s1 = i16(blocks[:, o:o + 2 * ch:2], blocks[:, o + 1:o + 2 * ch:2])
    o += 2 * ch
    s2 = i16(blocks[:, o:o + 2 * ch:2], blocks[:, o + 1:o + 2 * ch:2])
    o += 2 * ch
    c1 = _MS_COEFFS[pred_idx, 0]
    c2 = _MS_COEFFS[pred_idx, 1]

    body = blocks[:, o:]
    nibs = np.empty((n_blocks, body.shape[1] * 2), np.uint8)
    nibs[:, 0::2] = body >> 4            # high nibble first (MS order)
    nibs[:, 1::2] = body & 0x0F
    n_codes = nibs.shape[1] // ch        # coded samples per channel
    # nibble stream alternates channels frame-by-frame
    codes = nibs[:, : n_codes * ch].reshape(n_blocks, n_codes, ch)

    out = np.empty((n_blocks, n_codes + 2, ch), np.int16)
    out[:, 0, :] = s2.astype(np.int16)   # sample2 is the OLDER sample
    out[:, 1, :] = s1.astype(np.int16)
    delta = delta.copy()
    s1 = s1.copy()
    s2 = s2.copy()
    for t in range(n_codes):
        code = codes[:, t, :].astype(np.int32)
        signed = np.where(code >= 8, code - 16, code)
        # spec divides by 256 with C semantics (truncate toward zero),
        # not an arithmetic shift: floor then undo for inexact negatives
        acc = s1 * c1 + s2 * c2
        base = acc >> 8
        base += ((acc < 0) & ((acc & 0xFF) != 0)).astype(np.int32)
        pred = base + signed * delta
        pred = np.clip(pred, -32768, 32767)
        s2 = s1
        s1 = pred
        # upper clamp is an anti-overflow guard for adversarial bytes
        # (encoder-produced deltas stay ~int16-scale; int32 would wrap
        # silently at 3x growth per step on random nibbles)
        delta = np.clip((_MS_ADAPT[code] * delta) >> 8, 16, 1 << 20)
        out[:, t + 2, :] = pred
    return out.reshape(-1)


def _wav_samples(blob: bytes) -> "tuple[np.ndarray, int, int, float] | None":
    """Manual RIFF/WAVE parse → (normalized float64 samples (interleaved),
    rate, channels, clip threshold). Handles PCM 8/16/24/32-bit, IEEE
    float 32/64, G.711 A-law/mu-law, IMA ADPCM (0x11), MS ADPCM (0x02),
    and WAVE_FORMAT_EXTENSIBLE wrapping any of those. None for formats
    outside that set (MP3-in-WAV, ...); ValueError for structurally
    broken RIFF."""
    import struct as _struct

    fmt = data = fact_frames = None
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = _struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = _struct.unpack("<I", body[:4])
        pos += 8 + size + (size & 1)
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _bps, align, bits = _struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: real tag leads the GUID
        (tag,) = _struct.unpack("<H", fmt[24:26])
    if ch == 0 or rate == 0:
        raise ValueError("bad WAV fmt fields")
    if tag == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128) / 128.0
        clip = 127 / 128.0
    elif tag == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        clip = 32767 / 32768.0
    elif tag == 1 and bits == 24:
        b = np.frombuffer(data[: len(data) - len(data) % 3], np.uint8)
        b = b.reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        x = v.astype(np.float64) / (1 << 23)
        clip = ((1 << 23) - 1) / (1 << 23)
    elif tag == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / (1 << 31)
        clip = ((1 << 31) - 1) / (1 << 31)
    elif tag == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64)
        clip = 1.0
    elif tag == 3 and bits == 64:
        x = np.frombuffer(data, "<f8").copy()
        clip = 1.0
    elif tag == 6 and bits == 8:  # G.711 A-law
        x = _ALAW_TABLE[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
        clip = 32256 / 32768.0
    elif tag == 7 and bits == 8:  # G.711 mu-law
        x = _ULAW_TABLE[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
        clip = 32124 / 32768.0
    elif tag == 0x11 and bits == 4:  # IMA/DVI ADPCM
        x = _ima_wav_decode(data, ch, align).astype(np.float64) / 32768.0
        clip = 32767 / 32768.0
    elif tag == 0x02 and bits == 4:  # MS ADPCM
        x = _ms_adpcm_decode(data, ch, align).astype(np.float64) / 32768.0
        clip = 32767 / 32768.0
    else:
        return None
    if fact_frames is not None and tag in (0x02, 0x11):
        # ADPCM blocks are whole-block padded; fact gives the true
        # per-channel frame count — trim the trailing pad
        x = x[: fact_frames * ch]
    return x, rate, ch, clip


def _decode_audio_real(blob: bytes) -> "dict | None":
    """Real decode for WAV audio — PCM 8/16/24/32-bit, IEEE float,
    G.711 A-law/mu-law (numpy table expansion), IMA and MS ADPCM
    (block-vectorized), EXTENSIBLE wrappers.
    None → not RIFF/WAVE (stub tier). RIFF/WAVE blobs that are
    truncated or carry a genuinely absent codec (MP3-in-WAV)
    yield the all-null feature row — bad media nulls out, never kills
    the job."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        parsed = _wav_samples(blob)
        if parsed is None:
            return dict(_NULL_AUDIO)
        samples, rate, n_channels, clip_at = parsed
        n_frames = samples.size // n_channels
        rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
        rms_db = 20.0 * np.log10(rms) if rms > 0 else -120.0
        clip = float(np.mean(np.abs(samples) >= clip_at)) if samples.size else 0.0
        return {
            "duration_sec": round(n_frames / rate, 6),
            "sample_rate": rate,
            "n_channels": n_channels,
            "rms_db": round(rms_db, 6),
            "clip_fraction": round(clip, 6),
        }
    except Exception:  # noqa: BLE001 — corrupt media nulls out
        return dict(_NULL_AUDIO)


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
            feats = []
            for b in pdf["payload"]:
                real = _decode_image_real(b)  # netpbm decodes for real
                feats.append(
                    real
                    if real is not None
                    else _decode_image_stub(b, deterministic_fake)
                )
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
    the flatMap shape a real ffmpeg-based sampler needs. MJPEG-in-AVI
    payloads decode for REAL (RIFF walk + the repo's baseline JPEG
    codec): every every_n-th frame comes back as an actual PNG. Other
    containers are stubbed — fake 'frames' are deterministic slices of
    the blob digest — and a corrupt AVI contributes no rows rather than
    killing the job."""
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob in zip(pdf["asset_id"], pdf["payload"]):
                if blob is None:
                    continue
                blob = bytes(blob)
                if _is_avi(blob) or _gif.is_gif(blob):
                    try:
                        if _is_avi(blob):
                            # container walk is cheap; JPEG-decode ONLY the
                            # sampled frames (a 3000-frame MJPEG must not
                            # cost 3000 decodes for 4 emitted rows)
                            raw = _avi_mjpeg_frames(blob)
                            wanted = list(range(0, len(raw), every_n))
                            wanted = wanted[:max_frames]
                            frames = {
                                idx: _jpeg.parse_jpeg(raw[idx])
                                for idx in wanted
                            }
                        else:  # animated GIF: frames compose sequentially,
                            # so decode up to the last sampled index only
                            seq = _gif.gif_frames(
                                blob,
                                max_frames=(max_frames - 1) * every_n + 1,
                            )
                            wanted = [
                                i for i in range(0, len(seq), every_n)
                            ][:max_frames]
                            frames = {i: seq[i] for i in wanted}
                        vid_rows = [
                            {
                                "asset_id": asset_id,
                                "frame_idx": idx,
                                "frame_png": _encode_png(frames[idx]),
                            }
                            for idx in wanted
                        ]
                    except Exception:  # noqa: BLE001 — corrupt video: no rows
                        vid_rows = []
                    rows.extend(vid_rows)
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
            feats = []
            for b in pdf["payload"]:
                real = _decode_audio_real(b)  # PCM WAV decodes for real
                feats.append(
                    real
                    if real is not None
                    else _decode_audio_stub(b, deterministic_fake)
                )
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["n_channels"] = out["n_channels"].astype("Int32")
            yield out

    return pruned.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("vbr", T.BooleanType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

_NULL_AUDIO_META = {
    "container": None, "duration_sec": None, "sample_rate": None,
    "n_channels": None, "bitrate_kbps": None, "codec": None, "vbr": None,
    "n_frames": None,
}

_WAV_CODEC_NAMES = {
    1: "pcm", 3: "ieee-float", 6: "g711-alaw", 7: "g711-ulaw",
    0x11: "ima-adpcm", 0x02: "ms-adpcm", 0x55: "mp3-in-wav",
}


def _wav_meta(blob: bytes) -> dict:
    """WAV metadata from the fmt/data/fact chunks alone — no sample
    decode, so it types even formats whose samples we cannot expand
    (e.g. MP3-in-WAV)."""
    import struct as _struct

    found: dict = {}

    def on_chunk(fourcc: bytes, start: int, end: int, lists: tuple) -> None:
        if fourcc == b"fmt " and end - start >= 16:
            found["fmt"] = blob[start:end]
        elif fourcc == b"data":
            found["data_len"] = end - start
        elif fourcc == b"fact" and end - start >= 4:
            (found["fact"],) = _struct.unpack("<I", blob[start : start + 4])

    _riff_walk(blob, on_chunk)
    fmt = found.get("fmt")
    if fmt is None or "data_len" not in found:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, byte_rate, _align, bits = _struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:
        (tag,) = _struct.unpack("<H", fmt[24:26])
    if ch == 0 or rate == 0:
        raise ValueError("bad WAV fmt fields")
    if found.get("fact") is not None:
        frames = found["fact"]
    elif tag in (1, 3, 6, 7) and bits >= 8:
        frames = found["data_len"] // (ch * (bits // 8))
    else:
        frames = None  # block-coded with no fact chunk: unknowable cheaply
    duration = frames / rate if frames is not None else None
    return {
        "container": "wav",
        "duration_sec": round(duration, 6) if duration is not None else None,
        "sample_rate": rate,
        "n_channels": ch,
        "bitrate_kbps": round(byte_rate * 8 / 1000) if byte_rate else None,
        "codec": _WAV_CODEC_NAMES.get(tag, f"wave-0x{tag:02x}"),
        "vbr": False,
        "n_frames": frames,
    }


def _audio_meta_one(blob: "bytes | None") -> dict:
    """Typed audio metadata for one blob. MP3 is a REAL frame-header
    walk and FLAC a REAL STREAMINFO parse (functions/mp3.py) even
    though their coded samples stay undecodable here; WAV reads
    fmt/data/fact. Unknown containers and corrupt media yield the
    all-null row — never an exception."""
    if blob is None:
        return dict(_NULL_AUDIO_META)
    data = bytes(blob)
    try:
        meta = _mp3.parse_mp3_meta(data)
        if meta is not None:
            out = {"container": "mp3", **meta}
        else:
            meta = _mp3.parse_flac_streaminfo(data)
            if meta is not None:
                out = {"container": "flac", **meta}
            elif len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                out = _wav_meta(data)
            else:
                return dict(_NULL_AUDIO_META)
    except Exception:  # noqa: BLE001 — corrupt media nulls out
        return dict(_NULL_AUDIO_META)
    # these columns are Int32 in AUDIO_META_SCHEMA but come from
    # uint32 wire fields (Xing counts, fmt rates): an adversarial value
    # above 2^31-1 must null out here, not crash the batch astype
    for k in ("sample_rate", "n_channels", "bitrate_kbps", "n_frames"):
        v = out.get(k)
        if v is not None and not 0 <= v <= 0x7FFFFFFF:
            out[k] = None
    return out


def extract_audio_meta(
    df: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "payload",
) -> DataFrame:
    """Per-clip audio container metadata via mapInPandas (1 row in → 1
    row out, Arrow-batched). Unlike sample decode, this tier is fully
    real for MP3/FLAC/WAV — the audio twin of extract_video_meta."""
    pruned = df.select(
        F.col(id_col).alias("asset_id"), F.col(blob_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"asset_id": aid, **_audio_meta_one(blob)}
                for aid, blob in zip(pdf["asset_id"], pdf["payload"])
            ]
            out = pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])
            for c in ("sample_rate", "n_channels", "bitrate_kbps", "n_frames"):
                out[c] = out[c].astype("Int32")
            yield out

    return pruned.mapInPandas(run, AUDIO_META_SCHEMA)


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
            T.StructField("format", T.StringType(), True),
            T.StructField("target_px", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            fmts = []
            for b in pdf["payload"]:
                if b is None:
                    blobs.append(None)
                    fmts.append(None)
                    continue
                b = bytes(b)
                if (
                    _is_netpbm(b)
                    or _is_png(b)
                    or _jpeg.is_jpeg(b)
                    or _gif.is_gif(b)
                    or _is_bmp(b)
                ):
                    try:
                        if _is_netpbm(b):
                            blobs.append(_resize_ppm_real(b, target_px))
                            fmts.append("ppm")
                        elif _is_png(b):
                            blobs.append(_resize_png_real(b, target_px))
                            fmts.append("png")
                        elif _jpeg.is_jpeg(b):
                            blobs.append(_resize_jpeg_real(b, target_px))
                            fmts.append("jpeg")
                        elif _gif.is_gif(b):
                            blobs.append(_resize_gif_real(b, target_px))
                            fmts.append("gif")
                        else:
                            blobs.append(
                                _encode_bmp(_nn_resize(_parse_bmp(b), target_px))
                            )
                            fmts.append("bmp")
                    except Exception:  # noqa: BLE001 — corrupt nulls out
                        blobs.append(None)
                        fmts.append(None)
                    continue
                if not deterministic_fake:
                    raise CodecUnavailableError("image codec not available")
                blobs.append(
                    hashlib.blake2b(
                        b + int(target_px).to_bytes(4, "big"), digest_size=32
                    ).digest()
                )
                fmts.append("stub-digest")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "resized_png": pd.Series(blobs, dtype=object),
                    "format": pd.Series(fmts, dtype=object),
                    "target_px": target_px,
                }
            )

    return pruned.mapInPandas(run, out_schema)


def _gen_asset_payload(i: int) -> tuple[bytes, str]:
    """Deterministic payload for asset ``i``: every 3rd asset is a REAL
    netpbm image, every 3rd+1 a REAL PCM WAV, every 6th+2 a REAL PNG
    (gray/RGB/RGBA rotating), every 6th+5 cycles REAL baseline JPEG
    (4:4:4 / 4:2:0 / grayscale rotating), REAL MJPEG AVI video, REAL
    animated GIF, and REAL MP4 containers carrying opaque coded samples
    (container metadata real, frame decode gated) — so every real
    codec tier decodes wherever this table flows. The audio third also
    rotates metadata-real MPEG1-L3 and FLAC streams (genuine headers,
    gated samples) so extract_audio_meta types every container."""
    if i % 6 == 5 and (i // 6) % 8 == 3:
        w, h = 14 + (i % 4) * 6, 10 + (i % 3) * 4
        rng = np.arange(h * w, dtype=np.uint64)
        pal = (
            (np.arange(16 * 3, dtype=np.uint64) * (23 + i) % 256)
            .astype("uint8")
            .reshape(16, 3)
        )
        frames = [
            ((rng * (5 + i) + f * 7) % 16).astype("uint8").reshape(h, w)
            for f in range(2 + i % 3)
        ]
        return (
            _gif.encode_gif(palette=pal, indexed_frames=frames),
            "image/gif",
        )
    if i % 6 == 5 and (i // 6) % 4 == 1:
        w, h = 16 + (i % 3) * 8, 12 + (i % 2) * 4
        frames = [
            _jpeg.encode_jpeg(
                (
                    (np.arange(h * w * 3, dtype=np.uint64) * (7 + i) + f * 31)
                    % 256
                )
                .astype("uint8")
                .reshape(h, w, 3),
                quality=85,
            )
            for f in range(3 + i % 4)
        ]
        return _gen_avi_mjpeg(frames, w, h), "video/avi"
    if i % 6 == 5 and (i // 6) % 2 == 0:
        w, h = 10 + (i % 5) * 4, 9 + (i % 7) * 3
        kind = (i // 12) % 3
        c = 1 if kind == 2 else 3
        arr = (
            (np.arange(h * w * c, dtype=np.uint64) * (11 + i) % 256)
            .astype("uint8")
            .reshape(h, w, c)
        )
        return (
            _jpeg.encode_jpeg(arr, quality=85, subsample=kind == 1),
            "image/jpeg",
        )
    if i % 6 == 2:
        c = (1, 3, 4)[(i // 6) % 3]
        w, h = 6 + (i % 7) * 3, 5 + (i % 5) * 3
        arr = (
            (np.arange(h * w * c, dtype=np.uint64) * (17 + i) % 256)
            .astype("uint8")
            .reshape(h, w, c)
        )
        return _encode_png(arr), "image/png"
    if i % 3 == 0:
        w, h = 8 + (i % 5) * 4, 6 + (i % 7) * 2
        arr = (
            (np.arange(h * w * 3, dtype=np.uint64) * (13 + i) % 256)
            .astype("uint8")
        )
        return (b"P6\n%d %d\n255\n" % (w, h)) + arr.tobytes(), "image/x-portable-pixmap"
    if i % 3 == 1:
        import io
        import wave

        rate = (8000, 16000)[i % 2]
        t = np.arange(rate // 10)  # 100 ms
        samples = (
            (0.1 + (i % 8) / 10.0)
            * 32767
            * np.sin(2 * np.pi * (220 + i) * t / rate)
        ).astype("<i2")
        if (i // 3) % 4 == 1:  # real IMA ADPCM tier
            return _ima_wav_encode(samples, rate), "audio/wav"
        if (i // 3) % 4 == 3:  # real MS ADPCM tier
            return _ms_adpcm_encode(samples, rate), "audio/wav"
        # the tier slots repeat every 24 ids, so i's low residues are
        # constant within a tier — vary parameters by the PER-TIER
        # index j = i // 24 instead
        j = i // 24
        if (i // 3) % 8 == 2:  # metadata-real MPEG1-L3 tier (zero granules)
            return (
                _mp3.encode_mp3(
                    n_frames=4 + j % 6,
                    bitrate_kbps=(96, 128, 160)[j % 3],
                    sample_rate=44100,
                    channels=1 + j % 2,
                    xing=j % 2 == 0,
                ),
                "audio/mpeg",
            )
        if (i // 3) % 8 == 6:  # metadata-real FLAC STREAMINFO tier
            frate = (22050, 44100, 48000)[j % 3]
            return (
                _mp3.encode_flac(
                    sample_rate=frate,
                    channels=1 + j % 2,
                    bits=(16, 24)[(j // 2) % 2],
                    total_samples=frate * (1 + j % 4) // 10,
                ),
                "audio/flac",
            )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(samples.tobytes())
        return buf.getvalue(), "audio/wav"
    # real ISO-BMFF container with opaque coded samples: the metadata
    # tier (extract_video_meta) is real, frame decode stays gated
    return (
        _mp4.encode_mp4(
            [
                {
                    "kind": "video", "codec": "avc1",
                    "width": 320 + (i % 5) * 64, "height": 240 + (i % 3) * 120,
                    "n_samples": 24 + (i % 7) * 12,
                },
                {
                    "kind": "audio", "codec": "mp4a", "channels": 1 + i % 2,
                    "sample_rate": (22050, 44100)[i % 2],
                    "n_samples": 40 + i % 9,
                },
            ],
            duration_sec=1.0 + (i % 4) * 0.5,
            mdat=hashlib.blake2b(b"asset-%d" % i, digest_size=64).digest(),
        ),
        "video/mp4",
    )


def gen_assets(spark, n: int = 100) -> DataFrame:
    """Deterministic asset table (binary payloads + metadata struct) —
    the multimodal analog of sources/datagen.py. A third of the payloads
    are real netpbm images and a third real PCM WAV clips, so the real
    codec tier is exercised wherever this table flows (incl. the driver
    contract queries); the rest are opaque bytes for the stub tier."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", ASSET_META_SCHEMA, True),
        ]
    )

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                blob, ct = _gen_asset_payload(i)
                rows.append(
                    {
                        "asset_id": i,
                        "payload": blob,
                        "meta": {
                            "content_type": ct,
                            "etag": hashlib.md5(blob).hexdigest(),
                            "source_uri": f"synthetic://asset/{i}",
                            "size_bytes": len(blob),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    return spark.range(n).mapInPandas(make, out_schema)
