"""Feature-hash document embedding — the batched-inference stage shape.

A deterministic stand-in for neural embedding inference with the SAME
dataflow a real model would use: a ``map_batches`` stage that turns each
document into a d-dim vector, vectorized within the batch, broadcastable
downstream (ANN / kmeans / near-dup already consume embedding columns).
The "model" is classic feature hashing (Weinberger et al., public): token
t contributes ±1 to dimension ``h(t) % d`` with sign from bit 4 of the
same md5-derived 64-bit hash the dedup family uses — so the whole vector
is integer-exact and the DuckDB oracle reproduces it bit-for-bit.

Output is LONG format (doc_id, dim, value), zero dims omitted — the
relational shape; a wide ``list<float>`` view is one row-local pivot away.

Per-batch cost: one tokenize, one value-counts for the DISTINCT tokens
(the only Python-per-string work, md5 per distinct token with a per-worker
memo), one vectorized ``index_in`` map-back, one ``bincount`` over
(row, dim) keys. To swap in a real model: replace the hash with a forward
pass in ``__call__``; the plumbing (schema, batching, actor pool) stays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.stages.dedup import _hash64_cached
from lamapi_ray.stages.textstats import _tokens


def hash_embed(docs: ray.data.Dataset, dims: int = 16) -> ray.data.Dataset:
    """documents (doc_id, text) → (doc_id, dim, value) long-format integer
    feature-hash embeddings."""

    def embed(batch: pa.Table) -> pa.Table:
        nrows = len(batch)
        _, flat, parents, _ = _tokens(batch)
        # hash only DISTINCT tokens (vocab-bounded Python), map back vectorized
        distinct = pc.unique(flat)
        h = np.fromiter(
            (_hash64_cached(t) for t in distinct.to_pylist()),
            dtype=np.uint64,
            count=len(distinct),
        )
        dim_d = (h % np.uint64(dims)).astype(np.int64)
        sign_d = np.where((h >> np.uint64(4)) & np.uint64(1) == 0, 1, -1).astype(
            np.int64
        )
        pos = pc.index_in(flat, value_set=distinct).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        key = parents.astype(np.int64) * dims + dim_d[pos]
        val = np.bincount(key, weights=sign_d[pos], minlength=nrows * dims).astype(
            np.int64
        )
        rows = np.arange(nrows * dims) // dims
        dcol = np.arange(nrows * dims) % dims
        nz = val != 0
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": pc.take(ids, pa.array(rows[nz], pa.int64())),
                "dim": pa.array(dcol[nz], pa.int64()),
                "value": pa.array(val[nz], pa.int64()),
            }
        )

    return docs.map_batches(embed, batch_format="pyarrow", zero_copy_batch=True)
