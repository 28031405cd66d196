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
