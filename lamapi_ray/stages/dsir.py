"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023),
the hashed-ngram importance-weight stage of a modern pretraining
pipeline: score every source document by how target-like it is under
two bag-of-hashed-ngram multinomials,

    log w(x) = log p_target(x) − log p_source(x)
             = Σ_features [ s_source(b) − s_target(b) ]

with per-bucket integer micro-nat surprisals
``s(b) = floor(−ln((c_b+1)/(N+B))·1e6)`` (add-one smoothing over B=1024
buckets — the repo's order-exact log-space convention: per-doc sums of
int64 are order-free, floats appear only once per bucket in the same
IEEE operand order on both engines).

Features are unigram + bigram word hashes from the dedup family's
machinery (md5-per-distinct-token → Horner fold mod 2^61−1 —
``_doc_shingle_hashes``), folded to ``hash % 1024``. Three bounded
passes:

1. target bucket counts — the target corpus (here: the part-name
   domain) streams once, per-batch ``bincount(1024)`` partials, tiny
   driver sum;
2. source bucket counts — same over the documents corpus;
3. scoring — the 1024-entry delta table broadcasts and each batch
   reduces its own feature stream by one weighted ``bincount``.

Nothing corpus-sized ever leaves the workers; the exchanges are the two
1024-int histograms.

Reference anchor: lamAPI has no data-selection plane; DSIR belongs to
the LLM-curation surface this engine adds (alongside the CCNet split
and unigram-perplexity filtering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lamapi_ray.stages.dedup import _doc_shingle_hashes

B = 1024
SCALE = 1_000_000


def _feature_stream(batch: pa.Table, id_col: str, text_col: str):
    """Per-occurrence unigram + bigram hash buckets of one batch
    → (doc_idx, bucket) int64 arrays."""
    parts = []
    for k in (1, 2):
        _, doc_idx, sh = _doc_shingle_hashes(
            batch, id_col, text_col, k=k, distinct=False
        )
        parts.append((doc_idx, (sh % np.uint64(B)).astype(np.int64)))
    doc_idx = np.concatenate([p[0] for p in parts])
    buckets = np.concatenate([p[1] for p in parts])
    return doc_idx, buckets


def bucket_counts(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[np.ndarray, int]:
    """ONE pass → (counts[B] int64, N total features)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, b = _feature_stream(batch, id_col, text_col)
        cnt = np.bincount(b, minlength=B).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "c": pa.array(cnt[nz], pa.int64()),
            }
        )

    total = np.zeros(B, dtype=np.int64)
    for t in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        np.add.at(
            total,
            t["b"].to_numpy(zero_copy_only=False),
            t["c"].to_numpy(zero_copy_only=False),
        )
    return total, int(total.sum())


def _surprisal(counts: np.ndarray, n: int) -> np.ndarray:
    return np.floor(
        -np.log((counts + 1.0) / float(n + B)) * SCALE
    ).astype(np.int64)


def dsir_weights(
    source: ray.data.Dataset,
    target: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """source docs → (doc_id, n_features, logw_micro): integer micro-nat
    log importance weights (positive = more target-like)."""
    tc, tn = bucket_counts(target, id_col, text_col)
    sc, sn = bucket_counts(source, id_col, text_col)
    delta = _surprisal(sc, sn) - _surprisal(tc, tn)
    delta_ref = ray.put(delta)

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(delta_ref)
        nrows = len(batch)
        doc_idx, b = _feature_stream(batch, id_col, text_col)
        # int64 weights far below 2^53: float64 bincount accumulation is exact
        logw = np.bincount(
            doc_idx, weights=d[b].astype(np.float64), minlength=nrows
        ).astype(np.int64)
        nf = np.bincount(doc_idx, minlength=nrows).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_features": pa.array(nf, pa.int64()),
                "logw_micro": pa.array(logw, pa.int64()),
            }
        )

    return source.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
