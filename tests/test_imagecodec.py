"""Roundtrip tests for the pure-numpy uncompressed codecs."""

import numpy as np
import pytest

from lamapi_ray.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_rawv,
    encode_bmp,
    encode_ppm,
    encode_rawv,
    resize_nearest,
    sniff_format,
)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (8, 8), (7, 13), (16, 31)])
def test_bmp_roundtrip_exact(h, w):
    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (4, 6), (9, 2)])
def test_ppm_roundtrip_exact(h, w):
    rng = np.random.RandomState(h * 10 + w)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize(
    "payload", [b"P6", b"P6\n12 34", b"P6\n# comment", b"P6\n12 34 255"]
)
def test_ppm_truncated_header_raises(payload):
    # Regression: the header scanner used to spin forever at end-of-buffer
    # (b"" is not whitespace) instead of raising.
    with pytest.raises(ValueError, match="truncated PPM header"):
        decode_ppm(payload)


def test_rawv_roundtrip_exact():
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 256, (5, 4, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_rawv(encode_rawv(clip)), clip)


def test_sniff_and_dispatch():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert sniff_format(encode_bmp(img)) == "bmp"
    assert sniff_format(encode_ppm(img)) == "ppm"
    assert sniff_format(encode_rawv(img[None])) == "rawv"
    assert sniff_format(b"\xff\xd8...") == "jpeg"
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    # jpeg/png now dispatch to the real from-spec codecs
    from lamapi_ray.functions.jpegcodec import encode_jpeg
    from lamapi_ray.functions.pngcodec import encode_png

    assert np.array_equal(decode_image(encode_png(img)), img)
    assert decode_image(encode_jpeg(img)).shape == img.shape
    with pytest.raises(ValueError):
        decode_image(b"garbage")


def test_resize_nearest_known_grid():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    # dst (y,x) maps to src (y*4//8, x*4//8)
    for y in range(8):
        for x in range(8):
            assert np.array_equal(up[y, x], img[(y * 4) // 8, (x * 4) // 8])
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[[0, 2]][:, [0, 2]])
