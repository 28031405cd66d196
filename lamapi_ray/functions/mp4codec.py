"""Minimal MJPEG-in-MP4 codec (ISO/IEC 14496-12 ISO Base Media File
Format, public spec) — pure Python over the in-repo baseline JPEG codec.

MP4 is the container the real video web ships in. The container layer —
box walk, ``moov``→``trak``→``mdia``→``minf``→``stbl`` sample tables,
``stsd`` codec entry, ``stsz`` sample sizes, ``stco`` chunk offsets,
``stsc`` sample-to-chunk mapping — is implemented for real here, and the
sample payloads use the ``jpeg`` VisualSampleEntry (Motion-JPEG in MP4,
a registered ISO BMFF coding), so with
:mod:`lamapi_ray.functions.jpegcodec` in-tree the whole decode path is
honest. Inter-frame codings (``avc1``/``hvc1``/``vp09`` sample entries)
remain ``NotImplementedError``-gated AT THE CODEC DISPATCH — the
container parse still succeeds, which is exactly how a real pipeline
indexes frame byte-ranges it cannot yet decode.

Writer layout: ``ftyp`` + ``mdat`` (one chunk per sample, so ``stco``
carries per-sample absolute offsets and ``stsc`` is the constant
1-sample-per-chunk run) + ``moov``. Reader validates ``stsz``/``stco``
consistency and slices samples straight from the buffer.
"""

from __future__ import annotations

import struct

import numpy as np

from lamapi_ray.functions.jpegcodec import decode_jpeg, encode_jpeg


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def _visual_sample_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi h/v
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    return _box(fourcc, body)


def encode_mp4_mjpeg(
    frames: np.ndarray, fps: int = 10, quality: int = 75
) -> bytes:
    """frames: (n, H, W, 3) uint8 → MJPEG-in-MP4 bytes."""
    n, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (n, H, W, 3) uint8 frames")
    payloads = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(payloads))
    # absolute offset of sample k: after ftyp + mdat header (8 bytes)
    offsets = []
    at = len(ftyp) + 8
    for p in payloads:
        offsets.append(at)
        at += len(p)

    dur_media = n  # mdhd timescale = fps, one tick per frame
    dur_movie = (n * 1000) // max(fps, 1)  # mvhd timescale = 1000
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, dur_movie)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, dur_movie)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, max(fps, 1), dur_media)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _visual_sample_entry(b"jpeg", w, h),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, *path: bytes) -> tuple[int, int]:
    """Descend a container-box path; → (body_start, body_end)."""
    for want in path:
        found = None
        for btype, b0, b1 in _walk(data, pos, end):
            if btype == want:
                found = (b0, b1)
                break
        if found is None:
            raise ValueError(f"missing {want.decode()} box")
        pos, end = found
    return pos, end


def parse_mp4(data: bytes) -> dict:
    """→ {codec, width, height, sizes, offsets}: the sample index from
    the stbl tables. Works for any single-video-track MP4 regardless of
    codec (the frame byte-ranges are codec-independent)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    stbl0, stbl1 = _find(
        data, 0, len(data), b"moov", b"trak", b"mdia", b"minf", b"stbl"
    )
    tables: dict[bytes, tuple[int, int]] = {}
    for btype, b0, b1 in _walk(data, stbl0, stbl1):
        tables[btype] = (b0, b1)
    for need in (b"stsd", b"stsz", b"stco", b"stsc"):
        if need not in tables:
            raise ValueError(f"missing {need.decode()} box")
    sd0, _ = tables[b"stsd"]
    codec = data[sd0 + 8 + 4 : sd0 + 8 + 8]  # fullbox hdr + entry size
    w, hgt = struct.unpack_from(">HH", data, sd0 + 8 + 8 + 24)
    sz0, _ = tables[b"stsz"]
    uniform, count = struct.unpack_from(">II", data, sz0 + 4)
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", data, sz0 + 12))
    co0, _ = tables[b"stco"]
    (n_chunks,) = struct.unpack_from(">I", data, co0 + 4)
    offsets = list(struct.unpack_from(f">{n_chunks}I", data, co0 + 8))
    sc0, _ = tables[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", data, sc0 + 4)
    runs = [
        struct.unpack_from(">III", data, sc0 + 8 + 12 * k) for k in range(n_runs)
    ]
    if runs != [(1, 1, 1)] or n_chunks != count:
        raise NotImplementedError(
            "only 1-sample-per-chunk layouts are indexed here"
        )
    return {
        "codec": codec.decode("ascii", "replace"),
        "width": w,
        "height": hgt,
        "sizes": sizes,
        "offsets": offsets,
    }


def decode_mp4_mjpeg(data: bytes) -> np.ndarray:
    """MJPEG-in-MP4 bytes → (n, H, W, 3) uint8 frames. Inter-frame
    codecs parse (byte-ranges come back from ``parse_mp4``) but are
    honestly gated at the codec dispatch."""
    idx = parse_mp4(data)
    if idx["codec"] != "jpeg":
        raise NotImplementedError(
            f"{idx['codec']} is inter-frame coded; only MJPEG (the 'jpeg' "
            "sample entry) is decodable here"
        )
    frames = [
        decode_jpeg(data[o : o + s])
        for o, s in zip(idx["offsets"], idx["sizes"])
    ]
    if not frames:
        raise ValueError("no video frames found")
    return np.stack(frames)
