"""Minimal MJPEG-in-AVI codec (RIFF container, public format) — pure
Python over the in-repo baseline JPEG codec.

Motion-JPEG AVI is the simplest REAL compressed-video format: a RIFF
container whose ``movi`` list carries one baseline-JPEG payload per frame
(``00dc`` chunks). With :mod:`lamapi_ray.functions.jpegcodec` in-tree the
whole path is honest — no codec library, no fake. Inter-frame codecs
(H.264/MP4, VP9...) remain ``NotImplementedError``-gated.

Encoder writes the standard header chain (``avih`` + one video ``strl``)
with just the fields decoders need; the decoder walks RIFF lists and
decodes every ``00dc``/``00db`` chunk, so it also reads files produced by
common MJPEG writers as long as frames are baseline JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

from lamapi_ray.functions.jpegcodec import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: np.ndarray,
    fps: int = 10,
    quality: int = 75,
    subsampling: str = "444",
) -> bytes:
    """frames: (n, H, W, 3) uint8 → MJPEG AVI bytes."""
    n, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (n, H, W, 3) uint8 frames")
    payloads = [
        encode_jpeg(frames[i], quality=quality, subsampling=subsampling)
        for i in range(n)
    ]
    max_bytes = max(len(p) for p in payloads)
    usec_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # flags: AVIF_HASINDEX off
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    # strh: fccType fccHandler flags priority language initialFrames
    #       scale rate start length bufSize quality sampleSize rcFrame(4×h)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, max_bytes, -1, 0, 0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(data: bytes) -> np.ndarray:
    """MJPEG AVI bytes → (n, H, W, 3) uint8 frames."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body_at = pos + 8
            if fourcc == b"LIST":
                walk(body_at + 4, body_at + clen)
            elif fourcc in (b"00dc", b"00db"):
                payload = data[body_at : body_at + clen]
                if payload[:2] != b"\xff\xd8":
                    raise NotImplementedError(
                        "non-JPEG video stream (only MJPEG is supported)"
                    )
                frames.append(decode_jpeg(payload))
            pos = body_at + clen + (clen & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("no video frames found")
    return np.stack(frames)


def sniff_video(data: bytes) -> str:
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"RAWV":
        return "rawv"
    if len(data) > 11 and data[4:8] == b"ftyp":
        return "mp4"
    return "unknown"
