"""Multimodal column stages — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata alongside. The decode / resize / frame-sample stages are
actor-pool ``map_batches`` (decoder state initialised once per actor).

Decode is REAL for 24-bit BMP, binary PPM, the RAWV raw-video container
(pure-numpy codecs in :mod:`lamapi_ray.functions.imagecodec` —
roundtrip-exact, unit-tested, and oracle-checked end to end by the
``multimodal_decode_real`` / ``multimodal_resize`` queries) and for
baseline-sequential JPEG (from-spec pure-numpy codec in
:mod:`lamapi_ray.functions.jpegcodec`). PNG/MP4 raise
``NotImplementedError`` — those codec libraries are absent from this
container, and that path is honestly gated rather than faked. The legacy
``fake`` mode (pseudo-metadata from payload bytes) is kept for the
original ``multimodal_decode`` query.

Batch-size note: for real image payloads (~MBs/row) these stages must run
with a small ``batch_size`` (e.g. 16-64) so batch × concurrency fits the
worker heap — the knob is exposed on every entry point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.functions.imagecodec import (
    decode_image,
    decode_rawv,
    encode_bmp,
    resize_nearest,
    sniff_format,
)
from lamapi_ray.stages.pool import pool_width


class PayloadDecoder:
    """Actor: decoder initialised once, applied per batch.

    ``mode="real"`` decodes BMP/PPM payloads (numpy codecs) and emits true
    dimensions + mean pixel value; ``mode="fake"`` derives deterministic
    pseudo-metadata from the payload bytes (legacy query surface).
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.text import round_ref

        ids, widths, heights, means = [], [], [], []
        for i, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(i)
            if self.mode == "real":
                img = decode_image(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                means.append(float(img.mean()))
            else:
                n = len(payload)
                widths.append(1 + n % 640)
                heights.append(1 + (n * 7) % 480)
                # mean byte value — stands in for a decoded-pixel statistic
                means.append(sum(payload) / n if n else 0.0)
        col = "mean_pixel" if self.mode == "real" else "mean_byte"
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                col: pa.array([round_ref(m, 4) for m in means], pa.float64()),
            }
        )


def attach_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload:binary) — the opaque multimodal column
    (legacy fake-mode payloads: the raw text bytes)."""

    def to_payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pc.cast(batch["text"], pa.binary()),
            }
        )

    return docs.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


def synth_image(doc_id: int) -> np.ndarray:
    """Deterministic test image per doc: w = 8 + id%32, h = 8 + (id*3)%16,
    flat RGB pixel i = (id*7 + i) % 256 — the same spec the DuckDB oracle
    reproduces arithmetically."""
    w = 8 + doc_id % 32
    h = 8 + (doc_id * 3) % 16
    px = (np.int64(doc_id) * 7 + np.arange(h * w * 3, dtype=np.int64)) % 256
    return px.astype(np.uint8).reshape(h, w, 3)


def synth_video(doc_id: int) -> np.ndarray:
    """(nframes, 8, 8, 3): nframes = 2 + id%6, frame f pixel i =
    (id + 13*f + i) % 256."""
    n = 2 + doc_id % 6
    frames = np.stack(
        [
            ((doc_id + 13 * f + np.arange(8 * 8 * 3, dtype=np.int64)) % 256)
            .astype(np.uint8)
            .reshape(8, 8, 3)
            for f in range(n)
        ]
    )
    return frames


def attach_image_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL BMP-encoded images."""

    def to_bmp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [encode_bmp(synth_image(int(i))) for i in ids], pa.binary()
                ),
            }
        )

    return docs.map_batches(to_bmp, batch_format="pyarrow", zero_copy_batch=True)


def attach_png_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL PNG images (same pixel spec
    as the BMP fixtures — PNG is lossless so the decode oracle is the same
    closed form). Filter type rotates per doc (None/Sub/Up/Average/Paeth),
    every third doc is Adam7-interlaced, every fifth is 16-bit (samples
    promoted to the high byte so the decoded pixels — and the oracle — are
    unchanged), and every seventh is PALETTE-encoded (the fixture's pixel
    triples are a function of one byte v = (id*7+3p)%256, so the 256-entry
    palette plte[v] = (v, v+1, v+2) mod 256 reproduces them exactly), so
    the driver gate exercises every decode path."""
    from lamapi_ray.functions.pngcodec import encode_png, encode_png_palette

    _plte = (
        (np.arange(256, dtype=np.int64)[:, None] + np.arange(3)) % 256
    ).astype(np.uint8)

    def to_png(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            i = int(i)
            img = synth_image(i)
            if i % 7 == 0:
                h, w = img.shape[:2]
                idx = (
                    (np.int64(i) * 7 + 3 * np.arange(h * w, dtype=np.int64))
                    % 256
                ).astype(np.uint8).reshape(h, w)
                payloads.append(
                    encode_png_palette(
                        idx, _plte, filter_type=i % 5, interlace=(i % 3 == 0)
                    )
                )
                continue
            depth = 16 if i % 5 == 0 else 8
            if depth == 16:
                img = (img.astype(np.uint16) << 8) | img  # hi byte == pixel
            payloads.append(
                encode_png(
                    img,
                    filter_type=i % 5,
                    interlace=(i % 3 == 0),
                    depth=depth,
                )
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(to_png, batch_format="pyarrow", zero_copy_batch=True)


def synth_flat_gray(doc_id: int) -> np.ndarray:
    """Deterministic flat-gray test image: w = 8 + id%32, h = 8 + (id*3)%16,
    every pixel v = (id*37 + 11) % 256.

    Chosen because at JPEG quality 75 the luma DC quant step is exactly 8
    (Annex-K 16 × scale 50 → 8), so the DC coefficient 8·(v−128) quantizes
    losslessly and a flat-gray image ROUNDTRIPS PIXEL-EXACT through the
    codec — which makes the decoded mean SQL-expressible for the oracle
    gate (the lossy-path fidelity is covered by unit tests instead)."""
    w = 8 + doc_id % 32
    h = 8 + (doc_id * 3) % 16
    v = (doc_id * 37 + 11) % 256
    return np.full((h, w, 3), v, dtype=np.uint8)


def attach_jpeg_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL baseline-JPEG images.

    Alternates 4:4:4 / 4:2:0 subsampling and varies the restart interval by
    doc so the driver-gate fixture exercises both MCU layouts and the RSTn
    resync path of the decoder."""
    from lamapi_ray.functions.jpegcodec import encode_jpeg

    def to_jpeg(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        encode_jpeg(
                            synth_flat_gray(int(i)),
                            quality=75,
                            subsampling="420" if i % 2 else "444",
                            restart_interval=int(i) % 3,
                        )
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return docs.map_batches(to_jpeg, batch_format="pyarrow", zero_copy_batch=True)


def attach_video_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL RAWV-encoded clips."""
    from lamapi_ray.functions.imagecodec import encode_rawv

    def to_rawv(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [encode_rawv(synth_video(int(i))) for i in ids], pa.binary()
                ),
            }
        )

    return docs.map_batches(to_rawv, batch_format="pyarrow", zero_copy_batch=True)


def decode_payloads(
    payloads: ray.data.Dataset,
    concurrency: int = 2,
    batch_size: int = 64,
    mode: str = "fake",
) -> ray.data.Dataset:
    # Cluster-aware pool bounds (see stages/pool.py): a fixed-width pool
    # reserves all its CPUs up front and can starve the upstream read
    # operator into a deadlock when the cluster has <= N CPUs (observed at
    # num_cpus=2); pool_width caps the floor at cpus-1 so the producer
    # always has a slot while big nodes still start at full width.
    return payloads.map_batches(
        PayloadDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"mode": mode},
        concurrency=pool_width(concurrency),
        batch_size=batch_size,
    )


def synth_audio(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic mono PCM16 clip: n = 256 + (id*5)%512 samples at
    rate = 8000*(1 + id%3); sample i = 2*((id*13 + i*7919) % 32768) − 32767
    (always odd → never zero, so the zero-crossing count needs no
    sign-fill convention and the DuckDB oracle states it directly)."""
    n = 256 + (doc_id * 5) % 512
    rate = 8000 * (1 + doc_id % 3)
    i = np.arange(n, dtype=np.int64)
    s = (2 * ((doc_id * 13 + i * 7919) % 32768) - 32767).astype(np.int16)
    return s, rate


def attach_wav_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL RIFF/WAVE PCM16 clips."""
    from lamapi_ray.functions.audiocodec import encode_wav

    def to_wav(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            s, rate = synth_audio(int(i))
            payloads.append(encode_wav(s, rate))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(to_wav, batch_format="pyarrow", zero_copy_batch=True)


def synth_flat_video(doc_id: int) -> np.ndarray:
    """(nframes, 16, 16, 3) flat-gray frames: nframes = 2 + id%4, frame f
    value = (id*37 + 11*f + 3) % 256 — flat gray at JPEG quality 75
    roundtrips pixel-exact (see synth_flat_gray), so the MJPEG decode
    oracle states each frame's mean in closed form."""
    n = 2 + doc_id % 4
    return np.stack(
        [
            np.full((16, 16, 3), (doc_id * 37 + 11 * f + 3) % 256, np.uint8)
            for f in range(n)
        ]
    )


def attach_mp4_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL MJPEG-in-MP4 clips (same
    flat-gray frames as the AVI fixtures — functions/mp4codec.py)."""
    from lamapi_ray.functions.mp4codec import encode_mp4_mjpeg

    def to_mp4(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        encode_mp4_mjpeg(synth_flat_video(int(i)), quality=75)
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return docs.map_batches(to_mp4, batch_format="pyarrow", zero_copy_batch=True)


def attach_avi_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload) with REAL MJPEG-AVI clips (baseline
    JPEG frames in a RIFF container — functions/avicodec.py)."""
    from lamapi_ray.functions.avicodec import encode_avi_mjpeg

    def to_avi(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        encode_avi_mjpeg(synth_flat_video(int(i)), quality=75)
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return docs.map_batches(to_avi, batch_format="pyarrow", zero_copy_batch=True)


class AudioFeatureExtractor:
    """Actor: REAL WAV decode + vectorized clip features per batch.

    Sum-of-squares is an exact int64 (16-bit samples, clip-bounded), so
    ``rms = sqrt(ss/n)`` is bit-identical however partial sums are ordered
    — which is what lets the DuckDB oracle reproduce the float exactly.
    Compressed audio (MP3/OGG) raises ``NotImplementedError`` — honestly
    gated like PNG/MP4."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.audiocodec import (
            audio_features,
            decode_wav,
            sniff_audio,
        )
        from lamapi_ray.functions.text import round_ref

        cols: dict[str, list] = {
            k: []
            for k in (
                "doc_id", "n_samples", "channels", "sample_rate",
                "duration_sec", "rms", "peak", "zero_crossings",
            )
        }
        for i, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            kind = sniff_audio(p)
            if kind != "wav":
                raise NotImplementedError(
                    f"{kind} audio is compressed; codec libraries are not "
                    "present in this environment — plug a decoder in here"
                )
            samples, rate = decode_wav(p)
            f = audio_features(samples, rate)
            cols["doc_id"].append(i)
            cols["n_samples"].append(f["n_samples"])
            cols["channels"].append(f["channels"])
            cols["sample_rate"].append(f["sample_rate"])
            cols["duration_sec"].append(round_ref(f["duration_sec"], 6))
            cols["rms"].append(round_ref(f["rms"], 6))
            cols["peak"].append(f["peak"])
            cols["zero_crossings"].append(f["zero_crossings"])
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "n_samples": pa.array(cols["n_samples"], pa.int64()),
                "channels": pa.array(cols["channels"], pa.int64()),
                "sample_rate": pa.array(cols["sample_rate"], pa.int64()),
                "duration_sec": pa.array(cols["duration_sec"], pa.float64()),
                "rms": pa.array(cols["rms"], pa.float64()),
                "peak": pa.array(cols["peak"], pa.int64()),
                "zero_crossings": pa.array(cols["zero_crossings"], pa.int64()),
            }
        )


def extract_audio_features(
    payloads: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64
) -> ray.data.Dataset:
    return payloads.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_width(concurrency),
        batch_size=batch_size,
    )


class AudioDownsampler:
    """Actor: REAL audio downsample — decode WAV, keep every ``factor``-th
    sample (decimation; new rate = rate // factor so duration is
    preserved), re-encode, report the resampled clip's exact-arithmetic
    stats. The audio analogue of PayloadResizer."""

    def __init__(self, factor: int = 2):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.audiocodec import decode_wav, encode_wav
        from lamapi_ray.functions.text import round_ref

        ids, outs, ns, rates, rmss = [], [], [], [], []
        for i, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            samples, rate = decode_wav(p)
            dec = samples[:: self.factor]
            new_rate = max(rate // self.factor, 1)
            ids.append(i)
            outs.append(encode_wav(dec, new_rate))
            ns.append(dec.shape[0])
            rates.append(new_rate)
            x = dec.astype(np.float64)
            # exact int64 sum of squares → order-independent sqrt input
            rmss.append(
                round_ref(float(np.sqrt(np.mean(x * x))) if len(dec) else 0.0, 6)
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(outs, pa.binary()),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "rms": pa.array(rmss, pa.float64()),
            }
        )


def downsample_audio(
    payloads: ray.data.Dataset,
    factor: int = 2,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    return payloads.map_batches(
        AudioDownsampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"factor": factor},
        concurrency=pool_width(concurrency),
        batch_size=batch_size,
    )


class PayloadResizer:
    """Actor: REAL resize — decode (BMP/PPM), nearest-neighbor resample,
    re-encode BMP; target dims held as actor state."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.text import round_ref

        ids, outs, means = [], [], []
        for i, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            img = decode_image(p)
            resized = resize_nearest(img, self.width, self.height)
            ids.append(i)
            outs.append(encode_bmp(resized))
            means.append(round_ref(float(resized.mean()), 4))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(outs, pa.binary()),
                "width": pa.array([self.width] * len(ids), pa.int64()),
                "height": pa.array([self.height] * len(ids), pa.int64()),
                "mean_pixel": pa.array(means, pa.float64()),
            }
        )


class FrameSampler:
    """Actor: REAL video frame sampling — parse the container (RAWV raw
    frames, MJPEG AVI, or MJPEG-in-MP4 via the in-repo baseline-JPEG
    codec), keep every ``stride``-th frame, one row per kept frame (rows
    out ≥ rows in) with the frame's mean pixel value. Inter-frame
    CODECS (avc1/hvc1 sample entries) stay honestly
    ``NotImplementedError``-gated inside the MP4 codec dispatch — the
    container itself parses."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.avicodec import decode_avi_mjpeg, sniff_video
        from lamapi_ray.functions.mp4codec import decode_mp4_mjpeg
        from lamapi_ray.functions.text import round_ref

        ids, frames, means = [], [], []
        for i, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            kind = sniff_video(p)
            if kind == "rawv":
                clip = decode_rawv(p)
            elif kind == "avi":
                clip = decode_avi_mjpeg(p)
            elif kind == "mp4":
                clip = decode_mp4_mjpeg(p)
            else:
                raise NotImplementedError(
                    f"{kind} video is not a container this sampler reads "
                    "(RAWV, MJPEG AVI, MP4)"
                )
            for f in range(0, clip.shape[0], self.stride):
                ids.append(i)
                frames.append(f)
                means.append(round_ref(float(clip[f].mean()), 4))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int64()),
                "mean_pixel": pa.array(means, pa.float64()),
            }
        )


def resize_payloads(payloads: ray.data.Dataset, width=224, height=224,
                    concurrency: int = 2, batch_size: int = 64):
    return payloads.map_batches(
        PayloadResizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"width": width, "height": height},
        concurrency=pool_width(concurrency),
        batch_size=batch_size,
    )


def sample_frames(payloads: ray.data.Dataset, stride=2,
                  concurrency: int = 2, batch_size: int = 64):
    return payloads.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"stride": stride},
        concurrency=pool_width(concurrency),
        batch_size=batch_size,
    )
