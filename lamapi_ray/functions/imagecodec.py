"""Pure-numpy codecs for UNCOMPRESSED multimodal payloads — no external
codec libraries.

The container has no PIL/cv2/ffmpeg, but uncompressed formats need none:

* **BMP** (24-bit ``BI_RGB``): standard BITMAPFILEHEADER +
  BITMAPINFOHEADER, BGR pixel rows padded to 4-byte boundaries, bottom-up
  row order. Encode/decode roundtrip is byte-exact.
* **PPM** (binary ``P6``): ASCII header + raw RGB bytes.
* **RAWV**: a minimal raw-video container this engine defines —
  ``b"RAWV" + u16 width + u16 height + u16 nframes`` (little-endian)
  followed by ``nframes`` concatenated raw RGB frames.

Baseline JPEG is also real — a from-spec pure-numpy codec in
:mod:`lamapi_ray.functions.jpegcodec` (entropy layer validated bit-exact
against an independent quantize/dequantize reference chain). PNG/MP4
still raise ``NotImplementedError`` in the decode stages — honestly
gated, not faked.

All functions take/return ``np.ndarray`` images shaped (H, W, 3) uint8.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# --------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    offset = 14 + 40
    size = offset + pixel_bytes
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = img[:, :, ::-1]  # RGB → BGR
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    body = rows[::-1].tobytes()  # bottom-up
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP is supported")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


# --------------------------------------------------------------------------
# PPM (binary P6)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace-separated w, h, maxval, single whitespace
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i >= len(data):
            raise ValueError("truncated PPM header")
        if data[i : i + 1] == b"#":  # comment line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j >= len(data):
            raise ValueError("truncated PPM header")
        parts.append(int(data[i:j]))
        i = j
    i += 1  # exactly one whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# RAWV (raw-video container: header + concatenated RGB frames)
# --------------------------------------------------------------------------

RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: np.ndarray) -> bytes:
    """frames: (nframes, H, W, 3) uint8."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return RAWV_MAGIC + struct.pack("<HHH", w, h, n) + frames.tobytes()


def decode_rawv(data: bytes) -> np.ndarray:
    if data[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack_from("<HHH", data, 4)
    px = np.frombuffer(data, dtype=np.uint8, count=n * h * w * 3, offset=10)
    return px.reshape(n, h, w, 3).copy()


# --------------------------------------------------------------------------
# Transforms
# --------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — pure integer index mapping (the same rule
    OpenCV INTER_NEAREST uses: src = floor(dst * src_dim / dst_dim))."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys[:, None], xs[None, :]]


def sniff_format(data: bytes) -> str:
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == RAWV_MAGIC:
        return "rawv"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "jpeg":
        from lamapi_ray.functions.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    if fmt == "png":
        from lamapi_ray.functions.pngcodec import decode_png

        return decode_png(data)
    raise ValueError(f"unrecognized image payload ({fmt})")
