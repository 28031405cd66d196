"""Pure-numpy WAV (RIFF PCM) codec + vectorized audio features.

The audio leg of the multimodal family: payloads are opaque ``binary``
columns; WAV is an uncompressed container (RIFF header + PCM samples), so
— like BMP/PPM/RAWV — it needs no codec library and the roundtrip is
byte-exact. Compressed audio (MP3/AAC/OGG...) stays honestly
``NotImplementedError``-gated, same policy as PNG-before-round-5/MP4.

Supported: PCM 16-bit signed little-endian (format tag 1), mono or
multi-channel, any sample rate. Feature extraction is vectorized numpy
over the decoded sample array (RMS, peak, zero crossings, duration).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_FORMAT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: (n,) or (n, channels) int16 → RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", WAV_FORMAT_PCM, ch, sample_rate, byte_rate, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → ((n, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body_at
            )
            if tag != WAV_FORMAT_PCM:
                raise NotImplementedError(
                    "compressed WAV format tags are not supported (PCM only)"
                )
            if bits != 16:
                raise NotImplementedError("only 16-bit PCM is supported")
            fmt = (ch, rate)
        elif cid == b"data":
            pcm = np.frombuffer(data, dtype="<i2", count=clen // 2, offset=body_at)
        pos = body_at + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, rate = fmt
    return pcm.reshape(-1, ch).astype(np.int16), rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Vectorized clip-level features over (n, ch) int16 samples.

    * ``n_samples`` / ``channels`` / ``sample_rate`` / ``duration_sec``
    * ``rms`` — root mean square over all samples (float)
    * ``peak`` — max |sample| (int)
    * ``zero_crossings`` — sign changes along time in channel 0 (zero
      samples carry the previous sign, the standard convention)
    """
    x = samples.astype(np.float64)
    n = samples.shape[0]
    ch0 = samples[:, 0].astype(np.int64)
    s = np.sign(ch0)
    # propagate last nonzero sign through zeros (vectorized forward fill)
    nz = s != 0
    idx = np.where(nz, np.arange(n), 0)
    np.maximum.accumulate(idx, out=idx)
    filled = s[idx]
    zc = int(np.count_nonzero(filled[1:] * filled[:-1] < 0))
    return {
        "n_samples": int(n),
        "channels": int(samples.shape[1]),
        "sample_rate": int(sample_rate),
        "duration_sec": n / sample_rate,
        "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
        "peak": int(np.abs(ch0).max(initial=0)),
        "zero_crossings": zc,
    }


def sniff_audio(data: bytes) -> str:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    return "unknown"
