"""PCM WAV codec roundtrips + audio feature math + pipeline wiring."""

import numpy as np
import pytest

from deed_ocr_ray.functions.wavcodec import (
    audio_features, decode_wav, encode_wav, wav_info,
)

SF = "/root/testdata/sf0.001"


def test_wav_roundtrip_16bit_mono():
    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav(encode_wav(sig, sample_rate=8000, bits=16))
    assert rate == 8000 and out.shape == (800, 1)
    np.testing.assert_allclose(out[:, 0], sig, atol=1.0 / 32767)


def test_wav_roundtrip_8bit_stereo():
    sig = np.stack([np.linspace(-1, 1, 64), np.linspace(1, -1, 64)], axis=1)
    out, rate = decode_wav(encode_wav(sig, sample_rate=44100, bits=8))
    assert rate == 44100 and out.shape == (64, 2)
    np.testing.assert_allclose(out, sig, atol=1.0 / 127 + 1e-9)


def test_wav_clipping_and_info():
    sig = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    out, _ = decode_wav(encode_wav(sig, bits=16))
    np.testing.assert_allclose(out[:, 0], [-1, -1, 0, 1, 1], atol=1e-4)
    n, ch, rate = wav_info(encode_wav(sig, sample_rate=123))
    assert (n, ch, rate) == (5, 1, 123)


@pytest.mark.parametrize("bad", [
    b"", b"RIFF", b"RIFFxxxxWAVE",                        # truncated
    b"RIFX\x00\x00\x00\x00WAVE",                          # wrong magic
    b"OggS vorbis-ish payload that is not RIFF at all",
])
def test_wav_malformed_raises_valueerror(bad):
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_wav_non_pcm_format_tag_rejected():
    import struct
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # IEEE float tag
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_pure_tone():
    """A pure sine at f has spectral centroid ~f and zcr ~2f/rate."""
    rate, f, n = 8000, 500.0, 4096
    t = np.arange(n) / rate
    sig = np.sin(2 * np.pi * f * t)
    feats = audio_features(sig, rate)
    assert abs(feats["centroid_hz"] - f) < 25
    assert abs(feats["zcr"] - 2 * f / rate) < 0.01
    np.testing.assert_allclose(feats["rms"], np.sqrt(0.5), atol=0.01)
    assert feats["duration_s"] == n / rate
    silent = audio_features(np.zeros(16), rate)
    assert silent["rms"] == 0.0 and silent["centroid_hz"] == 0.0


def test_media_decoder_sniffs_wav():
    import pyarrow as pa

    from deed_ocr_ray.pipelines.multimodal import MediaDecoder, synth_wav

    good = synth_wav(3)  # stereo 16-bit
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([good, b"RIFF\x04\x00\x00\x00WAVE"], type=pa.binary()),
    })
    metas = MediaDecoder()(batch)["media_meta"].to_pylist()
    assert metas[0]["format"] == "wav"
    assert (metas[0]["width"], metas[0]["height"]) == (1024, 2)  # samples, channels
    assert metas[1]["width"] > 0  # malformed wav: lenient fake fallback
    with pytest.raises(ValueError):
        MediaDecoder(require_real_codecs=True)(batch)


def test_audio_features_pipeline(ray_session):
    from deed_ocr_ray.functions.wavcodec import decode_wav as dec
    from deed_ocr_ray.pipelines.multimodal import q_audio_features, synth_wav

    df = q_audio_features(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "n_samples", "channels", "sample_rate",
                               "duration_s", "rms", "zcr", "centroid_hz"}
    assert (df["n_samples"] == 1024).all()
    assert set(df["channels"]) == {1, 2}
    assert df["centroid_hz"].nunique() > 100  # id-keyed tones vary
    # spot-check one row against a local decode of the same payload
    row = df[df["doc_id"] == 7].iloc[0]
    samples, rate = dec(synth_wav(7))
    want = audio_features(samples, rate)
    for k in ("rms", "zcr", "centroid_hz"):
        np.testing.assert_allclose(row[k], want[k], rtol=1e-12)
    # determinism across runs
    again = q_audio_features(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert again.equals(df)
