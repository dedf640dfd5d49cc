"""Pure-stdlib PNG/PPM codec: roundtrips over every filter, raster kernels."""

import numpy as np
import pytest

from deed_ocr_ray.functions.imagecodec import (
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    image_features,
    png_info,
    resize_nearest,
)


def _img(seed, h, w, ch):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (16, 16, 4), (9, 13, 1)])
def test_png_roundtrip_all_filters(filter_type, shape):
    img = _img(filter_type * 31 + shape[0], *shape)
    data = encode_png(img, filter_type=filter_type)
    out = decode_png(data)
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_png_gradient_roundtrip():
    # smooth gradients are where Sub/Up/Average/Paeth differ most
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(y * 8) % 256, (x * 5) % 256, ((x + y) * 3) % 256],
                   axis=2).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


def test_png_info_without_decode():
    img = _img(3, 10, 20, 3)
    w, h, ch = png_info(encode_png(img))
    assert (w, h, ch) == (20, 10, 3)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    # build a 16-bit-depth IHDR: valid container, unsupported variant
    img = _img(1, 4, 4, 3)
    data = bytearray(encode_png(img))
    data[24] = 16  # IHDR bit-depth byte
    import struct
    import zlib

    body = bytes(data[12:16]) + bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))


def test_png_corrupt_idat_raises_valueerror():
    """The documented error contract is ValueError on malformed input —
    a corrupt deflate stream must not leak zlib.error."""
    import struct
    import zlib

    img = _img(2, 4, 4, 3)
    good = encode_png(img)
    # keep signature + IHDR, then append a garbage IDAT and IEND
    head = good[:33]
    payload = b"definitely not deflate"
    idat = struct.pack(">I", len(payload)) + b"IDAT" + payload + \
        struct.pack(">I", zlib.crc32(b"IDAT" + payload) & 0xFFFFFFFF)
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        decode_png(head + idat + iend)


def test_ppm_roundtrip_and_comments():
    img = _img(9, 6, 4, 3)
    data = encode_ppm(img)
    assert np.array_equal(decode_ppm(data), img)
    commented = b"P6\n# a comment\n4 6\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(commented), img)


def test_resize_nearest_deterministic():
    img = _img(4, 8, 8, 3)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, img[::2, ::2])  # 2x downscale = every other px
    up = resize_nearest(small, 8, 8)
    assert up.shape == (8, 8, 3)


def test_image_features_shape_and_determinism():
    img = _img(5, 12, 12, 3)
    f1, f2 = image_features(img), image_features(img)
    assert f1 == f2
    assert set(f1) == {"mean_r", "mean_g", "mean_b", "std", "entropy"}
    flat = np.full((4, 4), 128, dtype=np.uint8)
    assert image_features(flat)["entropy"] == 0.0  # single histogram bin
