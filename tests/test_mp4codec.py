"""MJPEG-in-MP4 codec (functions/mp4codec.py): container walk, sample
index, codec gating, frame roundtrip."""

import struct

import numpy as np
import pytest

from lamapi_ray.functions.jpegcodec import decode_jpeg
from lamapi_ray.functions.mp4codec import (
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
    parse_mp4,
)


def _clip(n=3, h=16, w=16, base=37):
    return np.stack(
        [np.full((h, w, 3), (base + 11 * f) % 256, np.uint8) for f in range(n)]
    )


def test_flat_gray_roundtrip_pixel_exact():
    clip = _clip()
    out = decode_mp4_mjpeg(encode_mp4_mjpeg(clip, quality=75))
    assert np.array_equal(out, clip)


def test_sample_index_matches_payloads():
    clip = _clip(n=4)
    data = encode_mp4_mjpeg(clip)
    idx = parse_mp4(data)
    assert idx["codec"] == "jpeg"
    assert (idx["width"], idx["height"]) == (16, 16)
    assert len(idx["sizes"]) == len(idx["offsets"]) == 4
    for k, (o, s) in enumerate(zip(idx["offsets"], idx["sizes"])):
        payload = data[o : o + s]
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert np.array_equal(decode_jpeg(payload), clip[k])


def test_interframe_codec_parses_but_gates_decode():
    data = bytearray(encode_mp4_mjpeg(_clip()))
    at = data.find(b"jpeg", 20)  # the stsd sample-entry fourcc
    data[at : at + 4] = b"avc1"
    idx = parse_mp4(bytes(data))  # container index still works
    assert idx["codec"] == "avc1"
    with pytest.raises(NotImplementedError):
        decode_mp4_mjpeg(bytes(data))


def test_malformed_rejected():
    with pytest.raises(ValueError):
        parse_mp4(b"not an mp4 at all")
    good = encode_mp4_mjpeg(_clip())
    # corrupt a box size so the walk overruns
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, len(good) + 100)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))
