"""Document chunking — overlapping fixed-token windows (RAG / context prep).

Splits every document into windows of ``window`` whitespace tokens with
stride ``stride`` (overlap = window − stride); the last window is short,
and every doc emits at least one chunk. A purely row-local ``flat_map``
expansion — no shuffle, output rows ≈ input rows × (n/stride).

The gather is fully vectorized: chunk membership (with overlap, so tokens
repeat across chunks) is materialized as ONE flat int index array built by
numpy range arithmetic, one ``pc.take`` over the flat token array, and one
list rebuild + ``binary_join`` — no Python executes per token or per chunk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def chunk_documents(
    docs: ray.data.Dataset, window: int = 32, stride: int = 24
) -> ray.data.Dataset:
    """documents (doc_id, text) → (doc_id, chunk_id, start_tok, n_tokens,
    chunk_text)."""
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")

    def to_chunks(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text.cast(pa.string()), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
        # chunks per doc: 1 if n <= window else 1 + ceil((n-window)/stride)
        k = np.where(n <= window, 1, 1 + -(-(n - window) // stride))
        doc_idx = np.repeat(np.arange(len(n)), k)
        koff = np.concatenate([[0], np.cumsum(k)])[:-1]
        chunk_id = np.arange(int(k.sum())) - np.repeat(koff, k)
        start = chunk_id * stride
        end = np.minimum(start + window, n[doc_idx])
        ln = end - start
        # flat gather indices: for chunk c, doc_off[doc] + start .. end-1
        loff = np.concatenate([[0], np.cumsum(ln)])[:-1]
        idx = (
            np.arange(int(ln.sum()))
            - np.repeat(loff, ln)
            + np.repeat(doc_off[doc_idx] + start, ln)
        )
        gathered = pc.take(flat, pa.array(idx, pa.int64()))
        if isinstance(gathered, pa.ChunkedArray):
            gathered = gathered.combine_chunks()
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(ln)]).astype(np.int32)
        )
        chunk_lists = pa.ListArray.from_arrays(offsets, gathered)
        chunk_text = pc.binary_join(chunk_lists, " ")
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": pc.take(ids, pa.array(doc_idx, pa.int64())),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "n_tokens": pa.array(ln, pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return docs.map_batches(to_chunks, batch_format="pyarrow", zero_copy_batch=True)
