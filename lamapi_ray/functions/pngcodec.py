"""Pure-Python/numpy PNG codec (ISO/IEC 15948) — zlib is stdlib, so PNG
needs no external codec library.

Supported: every legal bit depth — 1/2/4-bit packed (gray and palette,
MSB-first within each byte, scanlines padded to a byte boundary, the
filter unit being one byte per spec §7.2), 8- and 16-bit — across color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all
five scanline filters (None/Sub/Up/Average/Paeth); multiple IDAT
chunks; Adam7 interlacing (each of the 7 passes is an
independently-filtered sub-image — empty passes contribute zero bytes,
per spec). Packed gray samples scale to 8-bit by the exact spec factor
255/(2^d−1) (an integer for d ∈ {1,2,4}); packed palette samples are
indices and resolve through PLTE unscaled.

Decode returns (H, W, 3) uint8 RGB — gray is replicated, palette is
resolved through PLTE, alpha is dropped, and 16-bit samples reduce to
their high byte (the standard 16→8 downsample; payload-stat stages care
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

# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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


def _filter_image(raw: np.ndarray, filter_type: int, bpp: int) -> bytearray:
    """Filter a (rows, stride) byte matrix into filter-tagged scanlines.
    ``prev`` starts at zero — a pass/image boundary per spec."""
    lines = bytearray()
    prev = np.zeros(raw.shape[1], dtype=np.uint8)
    for y in range(raw.shape[0]):
        lines.append(filter_type)
        lines += _filter_row(filter_type, raw[y], prev, bpp).tobytes()
        prev = raw[y]
    return lines


def _pack_bits(mat: np.ndarray, depth: int) -> np.ndarray:
    """(rows, cols) samples in [0, 2^depth) → (rows, ceil(cols*depth/8))
    packed bytes, MSB-first, each row padded to a byte boundary (spec
    §7.2 scanline serialization)."""
    rows, cols = mat.shape
    bits = (
        (mat[:, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8).reshape(rows, cols * depth)
    return np.packbits(bits, axis=1)


def _unpack_bits(mat: np.ndarray, cols: int, depth: int) -> np.ndarray:
    """(rows, row_bytes) packed bytes → (rows, cols) sample values,
    dropping the per-row padding bits."""
    rows = mat.shape[0]
    bits = np.unpackbits(mat, axis=1)[:, : cols * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits.reshape(rows, cols, depth) * weights).sum(
        axis=2, dtype=np.int64
    ).astype(np.uint8)


def _to_bytes(img: np.ndarray, depth: int) -> np.ndarray:
    """(H, W, C) samples → (H, W*C*sample_bytes) big-endian byte matrix."""
    h, w = img.shape[:2]
    ch = img.shape[2]
    if depth == 8:
        return np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * ch)
    be = np.ascontiguousarray(img.astype(np.uint16).astype(">u2"))
    return be.view(np.uint8).reshape(h, w * ch * 2)


def encode_png(
    img: np.ndarray,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """(H, W, 3) RGB → PNG bytes (color type 2, one uniform filter).

    ``depth=8`` expects uint8 samples, ``depth=16`` uint16 (stored
    big-endian per spec). ``interlace=True`` emits Adam7: seven
    independently-filtered sub-images, empty passes omitted."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    if depth not in (8, 16):
        raise ValueError("depth must be 8 or 16")
    want = np.uint8 if depth == 8 else np.uint16
    if img.dtype != want:
        raise ValueError(f"expected {np.dtype(want)} samples for depth {depth}")
    h, w = img.shape[:2]
    bpp = 3 * (depth // 8)
    lines = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += _filter_image(_to_bytes(sub, depth), filter_type, bpp)
    else:
        lines = _filter_image(_to_bytes(img, depth), filter_type, bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 1 if interlace else 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _chunk(b"IEND", b"")
    )


def _encode_single_channel(
    img: np.ndarray,
    depth: int,
    ctype: int,
    plte: bytes,
    filter_type: int,
    level: int,
    interlace: bool,
) -> bytes:
    """Shared gray/palette encoder body over one-sample-per-pixel rows."""
    h, w = img.shape

    def raw_of(sub: np.ndarray) -> np.ndarray:
        if depth == 8:
            return np.ascontiguousarray(sub, dtype=np.uint8)
        if depth == 16:
            be = np.ascontiguousarray(sub.astype(np.uint16).astype(">u2"))
            return be.view(np.uint8).reshape(sub.shape[0], sub.shape[1] * 2)
        return _pack_bits(sub, depth)

    bpp = 2 if depth == 16 else 1  # filter unit: one byte for packed depths
    lines = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += _filter_image(raw_of(sub), filter_type, bpp)
    else:
        lines = _filter_image(raw_of(img), filter_type, bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(lines), level)) + _chunk(b"IEND", b"")


def encode_png_gray(
    img: np.ndarray,
    depth: int = 8,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """(H, W) grayscale samples in [0, 2^depth) → PNG color type 0 at any
    legal depth (1/2/4 packed, 8, 16)."""
    if img.ndim != 2:
        raise ValueError("expected (H, W) gray samples")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad bit depth {depth}")
    if img.size and (int(img.min()) < 0 or int(img.max()) > (1 << depth) - 1):
        raise ValueError(f"samples out of range for depth {depth}")
    return _encode_single_channel(
        img, depth, 0, b"", filter_type, level, interlace
    )


def encode_png_palette(
    idx: np.ndarray,
    palette: np.ndarray,
    depth: int = 8,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """(H, W) palette indices + (N, 3) uint8 palette → PNG color type 3 at
    depth 1/2/4 (packed) or 8."""
    if idx.ndim != 2:
        raise ValueError("expected (H, W) palette indices")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette bit depth {depth}")
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (N, 3) with 1 <= N <= 256")
    hi = min(1 << depth, len(palette)) - 1
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) > hi):
        raise ValueError("palette index out of range")
    return _encode_single_channel(
        idx, depth, 3, palette.tobytes(), filter_type, level, interlace
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
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad bit depth {depth}")
    if ctype_i not in _CHANNELS:
        raise ValueError(f"bad color type {ctype_i}")
    if depth < 8 and ctype_i not in (0, 3):
        raise ValueError("packed depths are only legal for gray/palette")
    if depth == 16 and ctype_i == 3:
        raise ValueError("palette images cannot be 16-bit")
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    ch = _CHANNELS[ctype_i]
    sb = depth // 8  # bytes per sample (0 for packed depths)
    bpp = max(1, ch * sb)  # filter unit is one byte for packed depths

    def row_bytes(cols: int) -> int:
        return (cols * ch * depth + 7) // 8

    def unfilter(raw: np.ndarray, rows: int, stride: int) -> np.ndarray:
        raw = raw.reshape(rows, stride + 1)
        out = np.zeros((rows, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(rows):
            prev = _unfilter_row(int(raw[y, 0]), raw[y, 1:], prev, bpp)
            out[y] = prev
        return out

    def to_samples(bytes_mat: np.ndarray, rows: int, cols: int) -> np.ndarray:
        """byte matrix → (rows, cols, ch) uint8 samples (16-bit keeps the
        high byte — the standard 16→8 downsample; packed depths unpack
        MSB-first and drop the per-row padding bits)."""
        if depth < 8:
            return _unpack_bits(bytes_mat, cols, depth).reshape(rows, cols, 1)
        if sb == 1:
            return bytes_mat.reshape(rows, cols, ch)
        return bytes_mat.reshape(rows, cols, ch, 2)[..., 0]

    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = row_bytes(w)
        if len(data) != h * (stride + 1):
            raise ValueError("decompressed size mismatch")
        px = to_samples(unfilter(data, h, stride), h, w)
    else:
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = row_bytes(pw)
            nbytes = ph * (stride + 1)
            if off + nbytes > len(data):
                raise ValueError("decompressed size mismatch")
            sub = to_samples(unfilter(data[off : off + nbytes], ph, stride), ph, pw)
            px[y0::dy, x0::dx] = sub
            off += nbytes
        if off != len(data):
            raise ValueError("decompressed size mismatch")
    if ctype_i == 2:
        return px.copy()
    if ctype_i == 6:
        return px[:, :, :3].copy()  # drop alpha (documented)
    if ctype_i == 0:
        if depth < 8:  # exact spec scaling: v * 255/(2^d - 1), integer
            px = (px.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
                np.uint8
            )
        return np.repeat(px, 3, axis=2)
    if ctype_i == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if plte is None:
        raise ValueError("palette image without PLTE")
    return plte[px[:, :, 0]]
