"""Pure-stdlib image codecs: PNG and binary PPM, plus resize/features.

No image library exists in this environment — but PNG's container is
just zlib (stdlib) + per-scanline difference filters, and binary PPM is
a header plus raw bytes. Implementing them from the public format specs
(PNG: RFC 2083; PPM: netpbm man pages) makes the multimodal decode
stage REAL for these formats.

Supported PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB),
6 (RGBA), non-interlaced — the subset the encoder emits and the
deterministic fixtures use. All five scanline filters (None/Sub/Up/
Average/Paeth) decode, and the encoder can emit any of them, so the
decoder's filter paths are roundtrip-testable. Baseline JPEG lives in
the sibling ``jpegcodec.py``; only WEBP/video (and progressive JPEG)
remain behind the stub boundary.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_COLOR = {1: 0, 3: 2, 4: 6}


# ------------------------------------------------------------------ encode

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw scanline (uint8 1-D)."""
    r = row.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), r[:-bpp]]) if len(r) >= bpp else np.zeros_like(r)
    up = prev.astype(np.int16)
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        ul = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]]) if len(r) >= bpp else np.zeros_like(r)
        p = left + up - ul
        pa_ = np.abs(p - left); pb = np.abs(p - up); pc = np.abs(p - ul)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, up, ul))
        out = r - pred
    else:  # pragma: no cover
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w), (h, w, 3) or (h, w, 4) uint8 array as PNG.
    ``filter_type`` selects the scanline filter (0..4) — useful for
    exercising every decoder filter path in tests."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = _CHANNELS_COLOR[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, ch).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ decode

def decode_png(data: bytes) -> np.ndarray:
    """Decode the supported PNG subset to (h, w[, ch]) uint8.
    Raises ``ValueError`` on malformed input, ``NotImplementedError`` on
    valid-but-unsupported PNGs (palette, 16-bit, interlaced)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = None
    color = depth = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in _COLOR_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = _COLOR_CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the documented error contract: malformed input ⇒ ValueError
        raise ValueError(f"bad PNG IDAT: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    arr = np.frombuffer(raw, dtype=np.uint8)
    for y in range(h):
        ftype = int(arr[y * (stride + 1)])
        line = arr[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int16)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential in x; recur per pixel
            # over the (small) row — vectorized across channels
            rec = np.empty(stride, dtype=np.int16)
            for x in range(0, stride, ch):
                left = rec[x - ch : x] if x >= ch else np.zeros(ch, np.int16)
                up = prev[x : x + ch]
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev[x - ch : x] if x >= ch else np.zeros(ch, np.int16)
                    p = left + up - ul
                    pa_ = np.abs(p - left); pb = np.abs(p - up); pc = np.abs(p - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                    np.where(pb <= pc, up, ul))
                rec[x : x + ch] = (line[x : x + ch] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def png_info(data: bytes) -> Tuple[int, int, int]:
    """(width, height, channels) from the IHDR without decoding pixels."""
    if data[:8] != PNG_MAGIC or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, depth, color = struct.unpack_from(">IIBB", data, 16)
    return w, h, _COLOR_CHANNELS.get(color, 0)


# ---------------------------------------------------------------- PPM (P6)

def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6) from a (h, w, 3) uint8 array."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("PPM is RGB only")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6, maxval 255) to (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: magic, whitespace/comments, width, height, maxval, single ws
    fields = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    pix = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3).copy()


# ----------------------------------------------------------- raster kernels

def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the thumbnail kernel)."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> dict:
    """Deterministic per-image features (the embedding-model stand-in
    with REAL pixel math): per-channel means, overall std, brightness
    histogram entropy."""
    if img.ndim == 2:
        img = img[:, :, None]
    f = img.astype(np.float64)
    means = f.mean(axis=(0, 1))
    hist, _ = np.histogram(f.mean(axis=2), bins=16, range=(0, 256))
    p = hist / max(1, hist.sum())
    nz = p[p > 0]
    return {
        "mean_r": float(means[0]),
        "mean_g": float(means[1] if len(means) > 1 else means[0]),
        "mean_b": float(means[2] if len(means) > 2 else means[0]),
        "std": float(f.std()),
        "entropy": float(-(nz * np.log2(nz)).sum()),
    }
