"""Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, MOSS).

The classic local fingerprinting algorithm for plagiarism / overlap
detection: hash every k-gram, slide a window of ``w`` consecutive hashes,
select each window's minimum — guaranteeing any shared run of
``w + k − 1`` tokens between two docs shares a selected fingerprint.

Engine side is fully vectorized across the batch:

* k-grams by the flat-index gather trick (three shifted ``pc.take``s +
  one ``binary_join``) — no per-gram Python for construction;
* hashes via the dedup family's md5-u64 (Python md5 only per DISTINCT
  gram, per-worker memoized — the same cost class as the shingle dedup);
* the sliding min as ``np.minimum`` over ``w`` shifted views with
  out-of-doc positions masked to u64-max (no per-window loop);
* the selected set deduped by one ``np.unique`` over (row, hash) pairs.

Docs with fewer than k tokens contribute one whole-text gram (the
``_token_shingles`` convention); docs with fewer than ``w`` windows yield
the single min over all their hashes — both mirrored exactly in the
DuckDB oracle (frame-truncated window min).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.stages.dedup import _hash64_cached
from lamapi_ray.stages.textstats import _tokens

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = 3, w: int = 4
) -> ray.data.Dataset:
    """documents (doc_id, text) → (doc_id, fp) distinct selected
    fingerprints (fp = md5-u64 of the k-gram, exposed as int64 two's
    complement for Arrow/SQL parity)."""

    def select(batch: pa.Table) -> pa.Table:
        nrows = len(batch)
        _, flat, parents, n = _tokens(batch)
        doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
        m = np.maximum(n - (k - 1), 1)  # grams per doc (≥1: short-doc gram)
        goff = np.concatenate([[0], np.cumsum(m)])[:-1]
        total = int(m.sum())
        gram_doc = np.repeat(np.arange(nrows), m)
        gi = np.arange(total) - goff[gram_doc]  # gram index within doc
        base = doc_off[gram_doc] + gi
        # k shifted token takes; for short docs (n < k) clamp to doc end so
        # the join degenerates to the whole text
        parts = []
        for s in range(k):
            idx = np.minimum(base + s, doc_off[gram_doc] + n[gram_doc] - 1)
            t = pc.take(flat, pa.array(idx, pa.int64()))
            parts.append(t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t)
        # short docs: avoid repeating the clamped last token — build those
        # few grams as the plain whole-text join instead
        grams = pc.binary_join_element_wise(*parts, " ")
        short = n[gram_doc] < k
        if short.any():
            toks_list = pc.split_pattern(
                batch["text"].combine_chunks().cast(pa.string())
                if isinstance(batch["text"], pa.ChunkedArray)
                else batch["text"].cast(pa.string()),
                " ",
            )
            whole = pc.binary_join(toks_list, " ")
            gw = pc.take(whole, pa.array(gram_doc[short], pa.int64()))
            grams = pa.array(
                np.where(
                    short,
                    gw.to_numpy(zero_copy_only=False),
                    grams.to_numpy(zero_copy_only=False),
                ),
                pa.string(),
            )
        distinct = pc.unique(grams)
        hmap = np.fromiter(
            (_hash64_cached(g) for g in distinct.to_pylist()),
            dtype=np.uint64,
            count=len(distinct),
        )
        pos = pc.index_in(grams, value_set=distinct).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        h = hmap[pos]
        # sliding min over w consecutive hashes, windows fully inside the
        # doc: window starts gi in 0..max(m-w, 0); frame truncates for
        # docs with m < w (single window over all hashes)
        mins = h.copy()
        for s in range(1, w):
            shifted = np.full(total, _U64MAX, dtype=np.uint64)
            valid = gi + s < m[gram_doc]
            src = np.nonzero(valid)[0]
            shifted[src] = h[src + s]
            np.minimum(mins, shifted, out=mins)
        is_start = gi <= np.maximum(m[gram_doc] - w, 0)
        sel_doc = gram_doc[is_start]
        sel_min = mins[is_start]
        pair = np.unique(np.stack([sel_doc.astype(np.uint64), sel_min]), axis=1)
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": pc.take(ids, pa.array(pair[0].astype(np.int64))),
                "fp": pa.array(pair[1].astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(select, batch_format="pyarrow", zero_copy_batch=True)
