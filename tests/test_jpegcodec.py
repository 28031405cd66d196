"""Baseline-JPEG codec tests — entropy-layer exactness, restart markers,
subsampling, and the multimodal decode path end to end.

The strongest check: the Huffman/bitstream layer is LOSSLESS, so
encode→decode must equal an independently computed
quantize→dequantize→IDCT→color-convert reference chain bit-for-bit.
PSNR bounds vs the source image then sanity-check the lossy DCT layer.
"""

import numpy as np
import pytest

from lamapi_ray.functions.imagecodec import decode_image, sniff_format
from lamapi_ray.functions.jpegcodec import (
    _blockify,
    _pad_edge,
    _unblockify,
    decode_jpeg,
    dequant_idct,
    encode_jpeg,
    fdct_quant,
    quality_tables,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else float("inf")


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4 + xx) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def _reference_chain(img, quality):
    """The decoder's expected output for a 4:4:4 encode, computed WITHOUT
    the entropy coder: forward DCT + quantize + dequantize + IDCT + color
    convert. Exact equality proves the Huffman/bitstream layer lossless."""
    qt_l, qt_c = quality_tables(quality)
    ycc = rgb_to_ycbcr(img)
    h, w = img.shape[:2]
    planes = []
    for c, qt in ((0, qt_l), (1, qt_c), (2, qt_c)):
        p = _pad_edge(np.round(ycc[..., c]), 8, 8)
        q = fdct_quant(_blockify(p), qt)
        r = dequant_idct(q, qt)
        planes.append(_unblockify(r, p.shape[0], p.shape[1])[:h, :w])
    return ycbcr_to_rgb(np.stack(planes, axis=-1))


def test_roundtrip_exact_vs_reference_chain():
    img = _gradient(40, 56)
    for q in (35, 75, 92):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsampling="444"))
        assert np.array_equal(out, _reference_chain(img, q)), f"q={q}"


def test_noise_image_entropy_coder_exact():
    # random noise exercises every AC category + ZRL paths
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="444"))
    assert np.array_equal(out, _reference_chain(img, 90))


def test_psnr_bounds_and_sizes():
    img = _gradient(64, 64)
    prev_psnr, prev_size = 0.0, 0
    for q in (50, 75, 90, 95):
        data = encode_jpeg(img, quality=q)
        out = decode_jpeg(data)
        p = _psnr(img, out)
        assert p > prev_psnr  # higher quality → higher fidelity
        assert len(data) > prev_size  # ... and more bytes
        prev_psnr, prev_size = p, len(data)
    assert prev_psnr > 45.0


def test_420_subsampling_shapes_and_quality():
    for h, w in ((16, 16), (17, 23), (40, 56), (8, 8), (9, 9)):
        img = _gradient(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        assert out.shape == img.shape
        assert _psnr(img, out) > 30.0


def test_restart_markers_roundtrip():
    img = _gradient(48, 64)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        data = encode_jpeg(img, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(decode_jpeg(data), base)  # decode unchanged


def test_odd_dimensions_444():
    for h, w in ((1, 1), (7, 3), (8, 9), (15, 31)):
        img = _gradient(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape


def test_sniff_and_decode_image_dispatch():
    img = _gradient(24, 24)
    data = encode_jpeg(img, quality=90)
    assert sniff_format(data) == "jpeg"
    assert np.array_equal(decode_image(data), decode_jpeg(data))


def test_flat_gray_quality75_is_pixel_exact():
    # the property the multimodal_decode_jpeg oracle relies on: at quality
    # 75 the luma DC quant step is 8, so a flat-gray image roundtrips to
    # EXACTLY the source array (golden RGB array == input)
    from lamapi_ray.functions.jpegcodec import quality_tables
    from lamapi_ray.stages.multimodal import synth_flat_gray

    assert quality_tables(75)[0][0, 0] == 8
    for doc_id in (0, 1, 2, 17, 117, 255, 1000):
        img = synth_flat_gray(doc_id)
        for sub in ("444", "420"):
            out = decode_jpeg(
                encode_jpeg(img, quality=75, subsampling=sub,
                            restart_interval=doc_id % 3)
            )
            assert np.array_equal(out, img), (doc_id, sub)


def test_progressive_rejected():
    # minimal SOI + SOF2 header — must be an honest NotImplementedError
    sof2 = bytes.fromhex("ffd8ffc2000b08001000100301110111")
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof2 + b"\xff\xd9")


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
