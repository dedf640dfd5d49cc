"""Pure-stdlib PCM WAV codec + numpy audio features.

No audio library exists in this environment — but PCM WAV is an
uncompressed container: RIFF chunk framing, an ``fmt `` struct, and raw
little-endian samples (public spec: RIFF/WAVE, multimedia programming
interface spec v1.0; same layout stdlib ``wave`` handles, implemented
here directly so malformed-input behavior is ours). Implementing it
makes the multimodal audio decode stage REAL — the audio sibling of
``imagecodec.py``/``jpegcodec.py``; only compressed audio (MP3/AAC/OGG)
stays behind the stub boundary.

Supported subset: format tag 1 (integer PCM), 8/16-bit, any channel
count / sample rate — the subset ``encode_wav`` emits, so decode is
roundtrip-testable. All errors raise ``ValueError`` (the codec error
contract callers absorb at the stage boundary).

Features are plain numpy (float64): RMS energy, zero-crossing rate,
spectral centroid from an rFFT magnitude spectrum — deterministic, no
external DSP dependency.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (shape [n] or [n, channels]) as
    integer-PCM WAV."""
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D [n, channels]")
    n, ch = s.shape
    s = np.clip(s, -1.0, 1.0)
    if bits == 16:
        data = np.round(s * 32767.0).astype("<i2").tobytes()
    else:
        data = (np.round(s * 127.0) + 128).astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode integer-PCM WAV to (float64 samples [n, channels] in
    [-1, 1], sample_rate). ValueError on anything malformed or
    non-PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < ln:
                raise ValueError("truncated WAV data chunk")
            raw = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, _byterate, _block, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits == 16:
        s = np.frombuffer(raw[:len(raw) // (2 * ch) * 2 * ch], dtype="<i2")
        out = s.astype(np.float64) / 32767.0
    elif bits == 8:
        s = np.frombuffer(raw[:len(raw) // ch * ch], dtype=np.uint8)
        out = (s.astype(np.float64) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if ch < 1:
        raise ValueError("bad WAV channel count")
    return out.reshape(-1, ch), int(rate)


def wav_info(data: bytes) -> Tuple[int, int, int]:
    """(n_samples, channels, sample_rate) from headers only."""
    samples, rate = decode_wav(data)  # PCM parse is already header-cheap
    return samples.shape[0], samples.shape[1], rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic float64 features of a mono-mixed signal: duration,
    RMS energy, zero-crossing rate, spectral centroid (Hz)."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = mono.shape[0]
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr": 0.0, "centroid_hz": 0.0}
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    tot = mag.sum()
    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    return {"duration_s": n / rate, "rms": rms, "zcr": zcr,
            "centroid_hz": centroid}
