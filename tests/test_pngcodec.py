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
    encode_png_gray,
    encode_png_palette,
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


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_packed_gray_roundtrip_all_filters(depth, ftype):
    rng = np.random.default_rng(100 * depth + ftype)
    # width 11 forces per-row padding bits at every packed depth
    img = rng.integers(0, 1 << depth, (7, 11), dtype=np.uint8)
    data = encode_png_gray(img, depth=depth, filter_type=ftype)
    scale = 255 // ((1 << depth) - 1)  # exact spec sample scaling
    want = np.repeat((img * scale).astype(np.uint8)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(data), want)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_packed_gray_adam7(depth):
    rng = np.random.default_rng(depth)
    # 13x5: several Adam7 passes have sub-byte widths with padding bits
    img = rng.integers(0, 1 << depth, (5, 13), dtype=np.uint8)
    data = encode_png_gray(img, depth=depth, filter_type=2, interlace=True)
    scale = 255 // ((1 << depth) - 1)
    want = np.repeat((img * scale).astype(np.uint8)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(data), want)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_packed_palette_roundtrip(depth):
    rng = np.random.default_rng(depth + 40)
    ncolors = min(1 << depth, 256)
    plte = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (6, 9), dtype=np.uint8)
    data = encode_png_palette(idx, plte, depth=depth, filter_type=1)
    # palette indices resolve through PLTE unscaled, at every depth
    assert np.array_equal(decode_png(data), plte[idx])


def test_packed_padding_bits_are_dropped():
    # single-pixel-wide 1-bit image: 7 padding bits per row must not leak
    img = np.array([[1], [0], [1]], dtype=np.uint8)
    data = encode_png_gray(img, depth=1, filter_type=0)
    want = np.repeat((img * 255)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(data), want)


def test_packed_depth_rejects_rgb():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        encode_png_gray(np.array([[9]], dtype=np.uint8), depth=2)  # > max


def test_adam7_roundtrip_all_filters_and_odd_sizes():
    rng = np.random.default_rng(7)
    # sizes chosen so several Adam7 passes are empty (1x1: six empty
    # passes; 3x5 / 5x3: partial passes; 16x16: all seven non-empty)
    for h, w in [(1, 1), (3, 5), (5, 3), (8, 8), (16, 16), (9, 13)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            data = encode_png(img, filter_type=ft, interlace=True)
            assert np.array_equal(decode_png(data), img), (h, w, ft)


def test_16bit_roundtrip_high_byte():
    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, (6, 7, 3), dtype=np.uint16)
    for ft in (0, 2, 4):
        data = encode_png(img16, filter_type=ft, depth=16)
        assert np.array_equal(decode_png(data), (img16 >> 8).astype(np.uint8))


def test_16bit_adam7_combined():
    rng = np.random.default_rng(13)
    img16 = rng.integers(0, 65536, (10, 9, 3), dtype=np.uint16)
    data = encode_png(img16, filter_type=3, depth=16, interlace=True)
    assert np.array_equal(decode_png(data), (img16 >> 8).astype(np.uint8))


def test_16bit_filters_use_byte_bpp():
    # a constant 16-bit image whose hi and lo bytes differ: Sub filter at
    # bpp=6 bytes must reconstruct exactly (would corrupt if bpp were
    # taken as 3 samples)
    img16 = np.full((4, 4, 3), 0x12AB, dtype=np.uint16)
    data = encode_png(img16, filter_type=1, depth=16)
    assert np.array_equal(decode_png(data), np.full((4, 4, 3), 0x12, np.uint8))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
