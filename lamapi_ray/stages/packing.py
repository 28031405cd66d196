"""Sequence packing — fill fixed-capacity training sequences with docs.

The operator every pretraining-data pipeline runs last: documents are
packed greedily into context-window-sized sequences so the trainer sees
dense batches. Packing is inherently a sequential recurrence (each doc's
bin depends on the fill state left by the previous doc), so the scale
design is RANGE-BUCKETED determinism:

* docs are bucketed by ``doc_id // bucket_size`` — a range partition on
  the existing primary key, no shuffle skew, deterministic membership;
* within a bucket docs are packed in doc_id order, greedy-sequential
  (doc goes into the current bin if it fits, else opens the next bin);
* buckets are independent → the packing loop parallelizes across buckets
  (``groupby(bucket).map_groups``), and the per-bucket loop is bounded by
  ``bucket_size`` rows. At 100 TB the bucket count scales with the corpus
  while each bucket stays constant-size — no stage ever sees more than
  ``bucket_size`` docs in one sequential walk.

Docs longer than the capacity are TRUNCATED to it (the other standard
choice — splitting one doc across sequences — changes the output schema;
truncation is the documented contract here and ``truncated`` marks it).

Token counts are whitespace tokens (``count(' ') + 1`` — the same
definition as the ``token_stats`` query's ``n_ws_tokens``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def pack_sequences(
    docs: ray.data.Dataset,
    capacity: int = 256,
    bucket_size: int = 64,
) -> ray.data.Dataset:
    """documents (doc_id, text) → (doc_id, bucket, seq_id, offset,
    n_tokens, truncated) with greedy per-bucket packing."""

    def with_tokens(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.add(pc.count_substring(text.cast(pa.string()), " "), 1)
        ids = batch["doc_id"]
        bucket = pc.divide(ids, bucket_size)  # doc_id ≥ 0: floor division
        return pa.table(
            {
                "doc_id": ids,
                "bucket": bucket.cast(pa.int64()),
                "n_raw": n.cast(pa.int64()),
            }
        )

    def pack_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        raw = group["n_raw"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, raw = ids[order], raw[order]
        toks = np.minimum(raw, capacity)
        nseq = np.empty(len(ids), dtype=np.int64)
        offs = np.empty(len(ids), dtype=np.int64)
        seq, fill = 0, 0
        # the packing recurrence — bounded by bucket_size rows per group
        for i, t in enumerate(toks):
            if fill + t > capacity:
                seq += 1
                fill = 0
            nseq[i] = seq
            offs[i] = fill
            fill += t
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(
                    np.full(len(ids), group["bucket"][0].as_py()), pa.int64()
                ),
                "seq_id": pa.array(nseq, pa.int64()),
                "offset": pa.array(offs, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "truncated": pa.array(raw > capacity, pa.bool_()),
            }
        )

    tok = docs.map_batches(with_tokens, batch_format="pyarrow", zero_copy_batch=True)
    return tok.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")


def pack_split_sequences(
    docs: ray.data.Dataset,
    capacity: int = 256,
    bucket_size: int = 64,
) -> ray.data.Dataset:
    """GPT-style pack-and-SPLIT: per bucket, docs are concatenated in
    doc_id order into one token stream and sliced into capacity-sized
    sequences; a doc crossing a boundary is split across sequences (no
    padding waste, unlike the truncate mode). One row per (doc, sequence)
    segment: (doc_id, bucket, seq_id, offset, tok_start, n_tokens).

    Unlike the greedy-fill recurrence this is FULLY vectorized: global
    positions are a cumsum, the segments a doc crosses are
    ``floor(g0/C) .. floor((g1-1)/C)``, expanded by ``np.repeat`` — and the
    oracle mirrors it with a window SUM, no recursion."""

    def with_tokens(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.add(pc.count_substring(text.cast(pa.string()), " "), 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pc.divide(batch["doc_id"], bucket_size).cast(pa.int64()),
                "n_raw": n.cast(pa.int64()),
            }
        )

    def split_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        raw = group["n_raw"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, raw = ids[order], raw[order]
        g1 = np.cumsum(raw)
        g0 = g1 - raw
        first_seq = g0 // capacity
        last_seq = (g1 - 1) // capacity
        k = last_seq - first_seq + 1
        doc_idx = np.repeat(np.arange(len(ids)), k)
        koff = np.concatenate([[0], np.cumsum(k)])[:-1]
        seq = np.arange(int(k.sum())) - np.repeat(koff, k) + first_seq[doc_idx]
        seg_lo = np.maximum(g0[doc_idx], seq * capacity)
        seg_hi = np.minimum(g1[doc_idx], (seq + 1) * capacity)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "bucket": pa.array(
                    np.full(len(doc_idx), group["bucket"][0].as_py()), pa.int64()
                ),
                "seq_id": pa.array(seq, pa.int64()),
                "offset": pa.array(seg_lo - seq * capacity, pa.int64()),
                "tok_start": pa.array(seg_lo - g0[doc_idx], pa.int64()),
                "n_tokens": pa.array(seg_hi - seg_lo, pa.int64()),
            }
        )

    tok = docs.map_batches(with_tokens, batch_format="pyarrow", zero_copy_batch=True)
    return tok.groupby("bucket").map_groups(split_group, batch_format="pyarrow")
