"""WAV codec + audio feature tests — roundtrip exactness, feature math,
and the actor-pool extraction path."""

import numpy as np
import pyarrow as pa
import pytest

from lamapi_ray.functions.audiocodec import (
    audio_features,
    decode_wav,
    encode_wav,
    sniff_audio,
)
from lamapi_ray.stages.multimodal import AudioFeatureExtractor, synth_audio


def test_wav_roundtrip_exact_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 500, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000
    assert out.shape == (500, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32768, (300, 2), dtype=np.int16)
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100
    assert np.array_equal(out2, stereo)


def test_wav_odd_data_chunk_padding():
    # wrap a 1-sample clip: data chunk is 2 bytes (even), but exercise the
    # word-alignment walk with an extra odd-length LIST chunk in front
    body = encode_wav(np.array([123], dtype=np.int16), 8000)
    # splice an odd-length junk chunk after "WAVE"
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    spliced = body[:12] + junk + body[12:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 8000 and out[0, 0] == 123


def test_features_exact_math():
    s = np.array([3, -3, 3, -3], dtype=np.int16)
    f = audio_features(s[:, None], 8000)
    assert f["n_samples"] == 4
    assert f["rms"] == pytest.approx(3.0)
    assert f["peak"] == 3
    assert f["zero_crossings"] == 3
    assert f["duration_sec"] == pytest.approx(4 / 8000)


def test_zero_sample_sign_fill():
    # zeros carry the previous sign: +1, 0, -1 is ONE crossing, not two
    s = np.array([5, 0, -5, 0, 0, 5], dtype=np.int16)
    f = audio_features(s[:, None], 8000)
    assert f["zero_crossings"] == 2


def test_synth_audio_never_zero_and_odd():
    for doc_id in (0, 1, 7, 100, 1234):
        s, rate = synth_audio(doc_id)
        assert rate in (8000, 16000, 24000)
        assert (s % 2 != 0).all()  # odd → never zero
        assert len(s) == 256 + (doc_id * 5) % 512


def test_extractor_batch_and_compressed_gate():
    ids = [0, 5, 11]
    payloads = [encode_wav(*synth_audio(i)) for i in ids]
    batch = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = AudioFeatureExtractor()(batch)
    for row, i in enumerate(ids):
        s, rate = synth_audio(i)
        assert out["n_samples"][row].as_py() == len(s)
        assert out["sample_rate"][row].as_py() == rate
        # exact-arithmetic RMS: integer sum of squares → bit-stable sqrt
        ss = int((s.astype(np.int64) ** 2).sum())
        expect = float(np.sqrt(ss / len(s)))
        assert out["rms"][row].as_py() == pytest.approx(expect, abs=1e-6)

    mp3 = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"ID3\x04rest"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor()(mp3)
    assert sniff_audio(b"OggS....") == "ogg"


def test_downsampler_decimation():
    from lamapi_ray.stages.multimodal import AudioDownsampler

    s = np.array([11, -3, 7, 9, -5], dtype=np.int16)
    batch = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_wav(s, 16000)], pa.binary()),
        }
    )
    out = AudioDownsampler(factor=2)(batch)
    assert out["n_samples"][0].as_py() == 3  # indices 0, 2, 4
    assert out["sample_rate"][0].as_py() == 8000
    dec, rate = decode_wav(out["payload"][0].as_py())
    assert rate == 8000
    assert np.array_equal(dec[:, 0], s[::2])
    expect = float(np.sqrt((11**2 + 7**2 + 5**2) / 3))
    assert out["rms"][0].as_py() == pytest.approx(expect, abs=1e-6)


def test_non_pcm_rejected():
    body = encode_wav(np.array([1, 2], dtype=np.int16), 8000)
    # flip the format tag to 3 (IEEE float) — must be honestly gated
    mutated = bytearray(body)
    mutated[20] = 3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(mutated))
