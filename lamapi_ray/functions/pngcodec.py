"""Pure-Python/numpy PNG codec (ISO/IEC 15948) — zlib is stdlib, so PNG
needs no external codec library.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/Average/
Paeth); multiple IDAT chunks. Unsupported, honestly gated with
``NotImplementedError``: 1/2/4/16-bit depths and Adam7 interlacing.

Decode returns (H, W, 3) uint8 RGB — gray is replicated, palette is
resolved through PLTE, and alpha is dropped (payload-stat stages care
about pixels, not compositing; documented contract).

Filter inversion: Up is fully vectorized; Sub is a per-lane uint8 prefix
sum (vectorized via cumsum mod 256); Average and Paeth carry a true
intra-row sequential dependency (each pixel needs the reconstructed left
neighbor) so those rows run a per-pixel loop — in the Ray pipeline decode
parallelism comes from rows × actors, not from within one image.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


# --------------------------------------------------------------------------
# Filters
# --------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed row (encoder side)."""
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int64)
    ul = np.zeros_like(r)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        pred = np.array(
            [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, ul)],
            dtype=np.int64,
        )
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Invert filter ``ftype`` in place-order (decoder side)."""
    if ftype == 0:
        return row.copy()
    if ftype == 2:  # Up — fully vectorized
        return (row.astype(np.int64) + prev).astype(np.uint8)
    if ftype == 1:  # Sub — per-lane prefix sum mod 256
        n = len(row)
        lanes = row.reshape(-1, bpp) if n % bpp == 0 else None
        if lanes is not None:
            return (
                np.cumsum(lanes.astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(n)
    out = np.zeros(len(row), dtype=np.int64)
    p = prev.astype(np.int64)
    r = row.astype(np.int64)
    for x in range(len(row)):
        a = out[x - bpp] if x >= bpp else 0
        b = int(p[x])
        c = int(p[x - bpp]) if x >= bpp else 0
        if ftype == 1:
            out[x] = (r[x] + a) % 256
        elif ftype == 3:
            out[x] = (r[x] + (a + b) // 2) % 256
        elif ftype == 4:
            out[x] = (r[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (color type 2, one uniform filter)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    bpp = 3
    raw = img.reshape(h, w * 3)
    prev = np.zeros(w * 3, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        filt = _filter_row(filter_type, raw[y], prev, bpp)
        lines += filt.tobytes()
        prev = raw[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG is supported")
    if ctype_i not in _CHANNELS:
        raise ValueError(f"bad color type {ctype_i}")
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing is not supported")
    ch = _CHANNELS[ctype_i]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(raw[y, 0]), raw[y, 1:], prev, ch)
        out[y] = prev
    px = out.reshape(h, w, ch)
    if ctype_i == 2:
        return px.copy()
    if ctype_i == 6:
        return px[:, :, :3].copy()  # drop alpha (documented)
    if ctype_i == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_i == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if plte is None:
        raise ValueError("palette image without PLTE")
    return plte[px[:, :, 0]]
