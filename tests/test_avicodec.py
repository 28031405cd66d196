"""MJPEG-AVI codec tests — container roundtrip, frame-sampler dispatch,
honest gates."""

import numpy as np
import pyarrow as pa
import pytest

from lamapi_ray.functions.avicodec import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    sniff_video,
)
from lamapi_ray.stages.multimodal import FrameSampler, synth_flat_video


def test_flat_gray_q75_exact_roundtrip():
    frames = np.stack([np.full((16, 24, 3), v, np.uint8) for v in (0, 128, 255)])
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=75))
    assert np.array_equal(out, frames)


def test_gradient_lossy_close():
    yy, xx = np.mgrid[0:16, 0:24]
    g = np.stack(
        [
            np.stack([(yy * 3 + xx + i) % 256] * 3, -1).astype(np.uint8)
            for i in range(3)
        ]
    )
    out = decode_avi_mjpeg(encode_avi_mjpeg(g, quality=92))
    assert out.shape == g.shape
    mse = ((out.astype(float) - g.astype(float)) ** 2).mean()
    assert mse < 5.0


def test_sniff_and_gates():
    frames = synth_flat_video(3)
    data = encode_avi_mjpeg(frames, quality=75)
    assert sniff_video(data) == "avi"
    assert sniff_video(b"\x00\x00\x00\x18ftypisom....") == "mp4"
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFFxxxxWAVE")


def test_frame_sampler_dispatches_avi_and_gates_mp4():
    frames = synth_flat_video(5)  # 3 frames, values (5*37+11f+3)%256
    batch = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "payload": pa.array([encode_avi_mjpeg(frames, quality=75)], pa.binary()),
        }
    )
    out = FrameSampler(stride=1)(batch)
    assert out["frame"].to_pylist() == [0, 1, 2]
    assert out["mean_pixel"].to_pylist() == [
        float((5 * 37 + 11 * f + 3) % 256) for f in range(3)
    ]

    # MP4 now dispatches for real (MJPEG sample entries decode); the
    # honest gate moved inside the codec dispatch: avc1 entries parse
    # but refuse to decode
    from lamapi_ray.functions.mp4codec import encode_mp4_mjpeg

    mp4_ok = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "payload": pa.array([encode_mp4_mjpeg(frames, quality=75)], pa.binary()),
        }
    )
    mout = FrameSampler(stride=1)(mp4_ok)
    assert mout["mean_pixel"].to_pylist() == out["mean_pixel"].to_pylist()

    avc = bytearray(encode_mp4_mjpeg(frames, quality=75))
    at = avc.find(b"jpeg", 20)
    avc[at : at + 4] = b"avc1"
    mp4_gated = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([bytes(avc)], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        FrameSampler(stride=1)(mp4_gated)
