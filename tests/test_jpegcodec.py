"""Pure-stdlib baseline JPEG codec: roundtrip fidelity across layouts
(grayscale / 4:4:4 / 4:2:0, restart intervals), header parsing, error
contracts, and the multimodal-stage integration (sniff → real decode →
features)."""

from __future__ import annotations

import numpy as np
import pytest

from deed_ocr_ray.functions.jpegcodec import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg,
    jpeg_info,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 5) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256],
                    axis=2).astype(np.uint8)


def test_flat_grayscale_roundtrips_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    data = encode_jpeg(img, quality=90)
    assert data.startswith(JPEG_MAGIC) and data.endswith(b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (16, 24)
    assert np.array_equal(out, img)  # flat DC-only block: lossless


def test_flat_color_roundtrips_exact_even_subsampled():
    img = np.empty((20, 20, 3), dtype=np.uint8)
    img[:, :, 0] = 77
    img[:, :, 1] = 150
    img[:, :, 2] = 30
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert np.abs(out.astype(int) - img.astype(int)).max() == 0


@pytest.mark.parametrize("sub", [False, True])
@pytest.mark.parametrize("ri", [0, 3])
def test_gradient_roundtrip_all_layouts(sub, ri):
    img = _gradient(37, 45)  # non-multiple-of-8/16 dims: padding paths
    data = encode_jpeg(img, quality=90, subsample=sub, restart_interval=ri)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < (2.0 if sub else 1.0), err


def test_noise_roundtrip_quality_ordering():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    errs = []
    for q in (50, 75, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]  # higher quality => lower error
    assert errs[2] < 5.0


def test_jpeg_info_reads_header_only():
    img = _gradient(33, 41)
    assert jpeg_info(encode_jpeg(img)) == (41, 33, 3)
    gray = np.zeros((10, 12), dtype=np.uint8)
    assert jpeg_info(encode_jpeg(gray)) == (12, 10, 1)


def test_decode_is_deterministic():
    data = encode_jpeg(_gradient(17, 19), quality=80, subsample=True)
    a = decode_jpeg(data)
    b = decode_jpeg(data)
    assert np.array_equal(a, b)
    assert encode_jpeg(_gradient(17, 19), quality=80, subsample=True) == data


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker;
    # many real encoders pad. Inject padding before every non-SOI
    # marker segment and require an identical decode.
    data = encode_jpeg(_gradient(17, 19), quality=80, subsample=True)
    padded = bytearray(data[:2])
    pos = 2
    while pos + 4 <= len(data):
        padded += b"\xff\xff\xff"  # fill run
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: rest is entropy-coded, copy verbatim
            padded += data[pos:]
            break
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        padded += data[pos:pos + 2 + ln]
        pos += 2 + ln
    assert np.array_equal(decode_jpeg(bytes(padded)), decode_jpeg(data))


def test_error_contracts():
    good = encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0")  # SOI then truncation
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])  # truncated inside segments
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy data
    # progressive SOF2 is a declared format limit, not a crash
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))


def test_sniff_and_decode_image_integration():
    from deed_ocr_ray.pipelines.multimodal import decode_image, sniff_media

    data = encode_jpeg(_gradient(16, 16))
    assert sniff_media(data) == "jpeg"
    out = decode_image(data)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBPVP8 ")  # still-stubbed format


def test_media_decoder_real_jpeg_metadata():
    from deed_ocr_ray.pipelines.multimodal import MediaDecoder

    dec = MediaDecoder(require_real_codecs=True)
    meta = dec._meta(encode_jpeg(_gradient(20, 30), subsample=True))
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (30, 20)
    # malformed jpeg still falls back to the fake in lenient mode
    lenient = MediaDecoder()
    bad = JPEG_MAGIC + b"\x00garbage"
    assert lenient._meta(bad)["bytes"] == len(bad)
    with pytest.raises(ValueError):
        MediaDecoder(require_real_codecs=True)._meta(bad)


def test_image_features_runs_on_jpeg_payloads(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deed_ocr_ray.pipelines.multimodal import q_image_features

    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(12)), type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    got = q_image_features(str(tmp_path)).to_pandas().set_index("doc_id")
    assert len(got) == 12
    # doc 0,3,6,9 are JPEG payloads; all rows carry real pixel stats
    assert (got["width"] == 24).all() and (got["height"] == 16).all()
    assert got["std"].gt(0).all()
