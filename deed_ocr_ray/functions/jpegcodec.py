"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

No image library exists in this environment, but baseline JPEG is
fully specified in public documents: segment syntax + entropy coding
in ITU-T T.81, the standard quantization/Huffman tables in its Annex
K, and the JFIF color transform in the JFIF 1.02 spec. Implementing
both directions from the spec (like the PNG/PPM codecs in
``imagecodec.py``) turns the multimodal decode stage REAL for JPEG —
the dominant web image format — leaving only WEBP/video stubbed.

Decoder scope: baseline sequential (SOF0), 8-bit, grayscale or 3-
component YCbCr, any 1/2 sampling factors (4:4:4, 4:2:2, 4:2:0),
restart intervals. Progressive (SOF2) and arithmetic coding raise
``ValueError`` — a real format limit, reported as a typed decode
error, not a crash. The encoder emits 4:4:4 (or single-component
grayscale) with the Annex K tables, which makes every decoder path
except subsampling roundtrip-testable from self-made fixtures; the
subsampled path is exercised by a hand-assembled 4:2:0 stream in
tests.

Reference analogue: deed_ocr/models/vision_llm.py:37-49 (real decode
weights loaded per worker) — here the "weights" are the Huffman/
quantization tables parsed per image.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# Annex K.1/K.2 base quantization tables (zigzag-ordered when emitted)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# raster index of each zigzag position (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public jcparam.c formula)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) via T.81 canonical code assignment."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_codes(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol, inverse of _canonical_codes."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


# ------------------------------------------------------------------ encode

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put(((1 << pad) - 1), pad)  # pad with 1-bits per spec

    def marker(self, m: int) -> None:
        """Emit a raw marker (byte-aligned, NOT stuffed)."""
        self.align()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, appended-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _encode_block(w: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_codes, ac_codes, pred: int) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
    s, bitsv = _magnitude(int(zz[0]) - pred)
    code, length = dc_codes[s]
    w.put(code, length)
    if s:
        w.put(bitsv, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            w.put(zc, zl)
            run -= 16
        s, bitsv = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        w.put(code, length)
        w.put(bitsv, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.put(ec, el)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encode of HxW (grayscale) or HxWx3 (RGB) uint8
    with the standard Annex K Huffman tables. ``subsample=True`` emits
    4:2:0 (2x2-mean chroma, the dominant web layout), else 4:4:4;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — both exist chiefly so the decoder's subsampling/restart
    paths are roundtrip-testable without an external encoder."""
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("encode_jpeg wants HxW or HxWx3 uint8")
    h, w0 = planes[0].shape
    qts = [_scale_qt(QT_LUMA, quality), _scale_qt(QT_CHROMA, quality)]
    ncomp = len(planes)
    sub = bool(subsample) and ncomp == 3
    # per-component (h_samp, v_samp)
    samps = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samps[:ncomp])
    vmax = max(s[1] for s in samps[:ncomp])

    def _pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        hh, ww = p.shape
        pp = np.empty((ph, pw), dtype=np.float64)
        pp[:hh, :ww] = p
        pp[hh:, :ww] = p[-1:, :]  # edge-replicate pad
        pp[:, ww:] = pp[:, ww - 1:ww]
        return pp

    # component planes at their own resolution, padded to full MCUs
    mcux = (w0 + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_planes = []
    for ci in range(ncomp):
        ch, cv = samps[ci]
        p = planes[ci]
        if (ch, cv) != (hmax, vmax):  # downsample chroma by 2x2 mean
            pe = _pad(p, (h + 1) // 2 * 2, (w0 + 1) // 2 * 2)
            p = (pe[0::2, 0::2] + pe[0::2, 1::2]
                 + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
        comp_planes.append(_pad(p, mcuy * cv * 8, mcux * ch * 8))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(min(ncomp, 2)):
        out += _seg(0xFFDB, bytes([tid]) + bytes(
            int(qts[tid].flatten()[ZIGZAG][k]) for k in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w0) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = samps[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if ncomp == 3:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        out += _seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", int(restart_interval)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wtr = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.marker(0xD0 + (mcu_count // restart_interval - 1) % 8)
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                ch, cv = samps[ci]
                qt = qts[0 if ci == 0 else 1]
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            wtr, comp_planes[ci][y0:y0 + 8, x0:x0 + 8],
                            qt, dc, ac, preds[ci])
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decode

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    handling; raises ValueError on truncation."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy data")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1
            else:  # a real marker: no more entropy bits
                self.pos -= 1
                raise ValueError("hit marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("missing JPEG restart marker")


def _huff_decode(r: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def jpeg_info(data: bytes) -> Tuple[int, int, int]:
    """(width, height, n_components) from the first SOFn segment."""
    w, h, nc = _parse(data, header_only=True)[:3]
    return w, h, nc


def _parse(data: bytes, header_only: bool = False):
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (no SOI)")
    qts: Dict[int, np.ndarray] = {}
    dcs: Dict[int, Dict] = {}
    acs: Dict[int, Dict] = {}
    sof = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; real encoders emit them, so skip the padding run
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i:i + n]
                if len(raw) < n:
                    raise ValueError("truncated JPEG DQT")
                i += n
                vals = (np.frombuffer(raw, dtype=">u2" if pq else np.uint8)
                        .astype(np.int32))
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = vals
                qts[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated JPEG DHT")
                (acs if tc else dcs)[th] = _decode_codes(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            h0, w0 = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (w0, h0, nc, comps)
            if header_only:
                return w0, h0, nc, comps
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (non-baseline SOF)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si:3 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            return sof, qts, dcs, acs, scan, restart_interval, pos
        # APPn / COM / others: skip
    raise ValueError("truncated JPEG (no SOS)" if not header_only
                     else "truncated JPEG (no SOF)")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG to HxW (grayscale) or HxWx3 (RGB) uint8.
    Raises ValueError on malformed/unsupported input."""
    sof, qts, dcs, acs, scan, dri, pos = _parse(data)
    w0, h0, nc, comps = sof
    if nc not in (1, 3):
        raise ValueError("unsupported JPEG component count")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("unsupported JPEG sampling factors")
    mcux = (w0 + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h0 + 8 * vmax - 1) // (8 * vmax)
    scan_by_id = {s[0]: s for s in scan}

    planes = []
    meta = []
    for cid, ch, cv, tq in comps:
        pw = mcux * ch * 8
        ph = mcuy * cv * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        _, td, ta = scan_by_id[cid]
        if tq not in qts or td not in dcs or ta not in acs:
            raise ValueError("JPEG references missing table")
        meta.append((ch, cv, qts[tq], dcs[td], acs[ta]))

    r = _BitReader(data, pos)
    preds = [0] * nc
    ct = _C.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.restart()
                preds = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                ch, cv, qt, dct, act = meta[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(r, dct)
                        if s > 11:
                            raise ValueError("bad JPEG DC category")
                        diff = _extend(r.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, act)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("bad JPEG AC run")
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * qt.flatten()[ZIGZAG]
                        px = ct @ blk.reshape(8, 8) @ _C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    full = []
    for ci in range(nc):
        ch, cv = meta[ci][0], meta[ci][1]
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h0, :w0])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    rch = y + 1.402 * (cr - 128.0)
    gch = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rch, gch, bch], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
