"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata alongside. The decode / feature-extract stages are
actor-pool ``map_batches`` (decoder state loaded once per actor). The
actual codec libraries are NOT in this container, so the real decode is
stubbed behind ``NotImplementedError``; the deterministic fake decoder
keeps every piece of Ray-side plumbing (schema, batch sizing, actor
signature, output layout) real and testable.

Batch-size note: for real image payloads (~MBs/row) this stage must run
with a small ``batch_size`` (e.g. 16-64) so batch × concurrency fits the
worker heap — the knob is exposed on :func:`decode_payloads`.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


class PayloadDecoder:
    """Actor: decoder "model" initialised once, applied per batch.

    ``fake=True`` (default here) derives deterministic pseudo-metadata from
    the payload bytes; ``fake=False`` is the real-codec path, stubbed.
    """

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image/audio decode needs codec libs not present in "
                "this environment; plug them in here (loaded once per actor)"
            )
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means = [], [], [], []
        for i, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n = len(payload)
            ids.append(i)
            widths.append(1 + n % 640)
            heights.append(1 + (n * 7) % 480)
            # mean byte value — stands in for a decoded-pixel statistic
            means.append(sum(payload) / n if n else 0.0)
        from lamapi_ray.functions.text import round_ref

        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "mean_byte": pa.array([round_ref(m, 4) for m in means], pa.float64()),
            }
        )


def attach_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload:binary) — the opaque multimodal column."""

    def to_payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pc.cast(batch["text"], pa.binary()),
            }
        )

    return docs.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


def decode_payloads(
    payloads: ray.data.Dataset,
    concurrency: int = 2,
    batch_size: int = 64,
    fake: bool = True,
) -> ray.data.Dataset:
    return payloads.map_batches(
        PayloadDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"fake": fake},
        concurrency=concurrency,
        batch_size=batch_size,
    )


class PayloadResizer:
    """Actor: resize stage — real codec stubbed, deterministic fake keeps the
    plumbing (target dims in ``__init__``, batched ``__call__``) testable."""

    def __init__(self, width: int = 224, height: int = 224, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image resize needs PIL/cv2 not present here"
            )
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fake resize: crop/pad payload bytes to width*height//64 bytes
        target = max(self.width * self.height // 64, 1)
        out = [
            (p[:target] + b"\x00" * (target - len(p)))[:target]
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(batch), pa.int64()),
                "height": pa.array([self.height] * len(batch), pa.int64()),
            }
        )


class FrameSampler:
    """Actor: video frame-sampling stage — emits every ``stride``-th chunk of
    the payload as a "frame" row (flat_map shape: rows out ≥ rows in)."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("real video decode not available here")
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, chunks = [], [], []
        for i, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = max(len(p) // self.frame_bytes, 1)
            for f in range(0, n_frames, self.stride):
                ids.append(i)
                frames.append(f)
                chunks.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int64()),
                "payload": pa.array(chunks, pa.binary()),
            }
        )


def resize_payloads(payloads: ray.data.Dataset, width=224, height=224,
                    concurrency: int = 2, batch_size: int = 64):
    return payloads.map_batches(
        PayloadResizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"width": width, "height": height},
        concurrency=concurrency,
        batch_size=batch_size,
    )


def sample_frames(payloads: ray.data.Dataset, frame_bytes=64, stride=4,
                  concurrency: int = 2, batch_size: int = 64):
    return payloads.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        concurrency=concurrency,
        batch_size=batch_size,
    )
