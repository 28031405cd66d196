"""PNG codec tests — lossless roundtrip across every filter type, the
non-RGB color-type paths, and honest gates."""

import struct
import zlib

import numpy as np
import pytest

from lamapi_ray.functions.imagecodec import decode_image, sniff_format
from lamapi_ray.functions.pngcodec import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 5 + xx) % 256, (xx * 7) % 256, ((yy * 3 + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_exact_all_filters():
    rng = np.random.default_rng(11)
    imgs = [
        _gradient(20, 31),
        rng.integers(0, 256, (17, 13, 3), dtype=np.uint8),
        np.zeros((8, 8, 3), dtype=np.uint8),
    ]
    for img in imgs:
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft))
            assert np.array_equal(out, img), f"filter {ft}"


def _raw_png(w, h, ctype, ch, pixels, extra=b""):
    lines = bytearray()
    for y in range(h):
        lines.append(0)  # filter None
        lines += pixels[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def test_grayscale_and_alpha_paths():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    out = decode_png(_raw_png(4, 3, 0, 1, g.reshape(3, 4)))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))

    ga = np.dstack([g[..., 0], np.full((3, 4), 7, np.uint8)])
    out = decode_png(_raw_png(4, 3, 4, 2, ga.reshape(3, 8)))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))  # alpha dropped

    rgba = np.dstack([_gradient(3, 4), np.full((3, 4), 9, np.uint8)])
    out = decode_png(_raw_png(4, 3, 6, 4, rgba.reshape(3, 16)))
    assert np.array_equal(out, rgba[:, :, :3])


def test_palette_path():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    data = _raw_png(3, 2, 3, 1, idx, extra=_chunk(b"PLTE", plte.tobytes()))
    assert np.array_equal(decode_png(data), plte[idx])


def test_multiple_idat_chunks():
    img = _gradient(9, 9)
    data = encode_png(img, filter_type=2)
    # split the IDAT payload into two chunks; decoder must concatenate
    at = data.index(b"IDAT") - 4
    (clen,) = struct.unpack_from(">I", data, at)
    body = data[at + 8 : at + 8 + clen]
    rest = data[at + 12 + clen :]
    split = len(body) // 2
    rebuilt = (
        data[:at] + _chunk(b"IDAT", body[:split]) + _chunk(b"IDAT", body[split:]) + rest
    )
    # zlib stream split across chunks is the PNG norm
    assert np.array_equal(decode_png(rebuilt), img)


def test_sniff_and_dispatch():
    img = _gradient(6, 6)
    data = encode_png(img, filter_type=1)
    assert sniff_format(data) == "png"
    assert np.array_equal(decode_image(data), img)


def test_interlace_and_16bit_gated():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_png(PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b""))
    ihdr_adam = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    with pytest.raises(NotImplementedError):
        decode_png(PNG_SIG + _chunk(b"IHDR", ihdr_adam) + _chunk(b"IEND", b""))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
