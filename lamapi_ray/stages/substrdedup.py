"""Exact duplicate-substring detection (the ExactSubstr family of
Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022): every maximal token span covered by length-``L`` windows that
occur >= 2 times anywhere in the corpus (across docs OR repeated within
one doc).

Fixed window length means no suffix array is needed — two streaming
passes over the corpus suffice:

1. **window-hash counts** — each batch emits DISTINCT-within-batch
   ``(hash, partial_count)`` pairs (a map-side combiner: duplicate-heavy
   batches collapse before the exchange), one ``groupby("hv").sum``
   keyed on the 61-bit window hash, filter ``count >= 2``. The
   duplicated-hash set is bounded by duplicated CONTENT, not corpus
   size.
2. the dup-hash set is broadcast as ONE sorted uint64 numpy array
   (``ray.put`` once, ``np.searchsorted`` membership per batch — the
   same compressed-broadcast shape as the mention-scan vocabulary);
   each batch re-derives its window hashes, marks member window starts,
   and merges overlapping-or-adjacent windows into maximal half-open
   token spans ``[span_start, span_end)`` with one vectorized island
   pass (break where the gap between consecutive marked starts in a doc
   exceeds ``L``).

Hashing is the dedup family's convention: one memoized md5 per DISTINCT
token (the only per-string Python), then a fully vectorized sliding
Horner fold mod 2^61-1 over the flat token stream
(``stages/dedup.py::_doc_shingle_hashes`` lineage). A cross-gram
collision would only ever ADD a false span, never drop one; pair
collision odds are ~L/2^61, and the documented corpus-scale upgrade is
the full 128-bit md5 in two u64 lanes. At 10^12-doc scale the pass-1
dup set can exceed a broadcast; the upgrade path is to keep it AS a
Dataset and hash-partition pass 2 on the window hash (semi-join), or a
Bloom broadcast with exact confirm — the per-batch kernels are
unchanged.

Docs with fewer than ``L`` tokens have no windows and never appear in
the output (Lee et al. semantics; deliberately NOT the shingle family's
whole-doc-fold convention for short docs).

Reference anchor: lamAPI has no substring-level dedup (its dedup is
alias/candidate-level — e.g. utils.py clean_str call sites); this
operator belongs to the LLM-training-data family the engine adds on
top of the reference's surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from lamapi_ray.stages.dedup import _SH_C, _vocab_token_hashes, scaled_partitions


def _window_hashes(
    batch: pa.Table, L: int, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One row per length-``L`` token window in the batch.

    → ``(win_doc_id, win_pos, hv)``: the owning doc id, the 0-based
    token index of the window start, and the window's Horner hash
    (< 2^61). Windows are in (row, pos) ascending order by
    construction. Fully vectorized: one sliding Horner over the WHOLE
    flat token array, windows crossing a doc boundary masked out.
    """
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.uint64),
        )
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    parents = (
        pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    if total < L:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.uint64),
        )
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    th = _vocab_token_hashes(enc.dictionary.to_pylist())[codes]  # < 2^61
    C = np.uint64(_SH_C)
    acc = th[: total - L + 1].copy()
    for j in range(1, L):
        acc = fold_mod61(mulmod61(acc, np.full(len(acc), C)) + th[j : total - L + 1 + j])
    valid = parents[: total - L + 1] == parents[L - 1 :]
    row = parents[: total - L + 1][valid]
    doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
    pos = np.flatnonzero(valid) - doc_off[row]
    return ids[row], pos.astype(np.int64), acc[valid]


def _dup_hash_broadcast(
    docs: ray.data.Dataset, L: int, id_col: str, text_col: str
):
    """Pass 1: corpus-wide duplicated-window hash set as a broadcast
    sorted uint64 array (ObjectRef)."""

    def count_partials(batch: pa.Table) -> pa.Table:
        _, _, hv = _window_hashes(batch, L, id_col, text_col)
        u, c = np.unique(hv, return_counts=True)
        return pa.table(
            {"hv": pa.array(u, pa.uint64()), "c": pa.array(c, pa.int64())}
        )

    counts = docs.map_batches(
        count_partials, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("hv", num_partitions=scaled_partitions(1.0, 32)).aggregate(Sum("c"))

    def dup_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["sum(c)"], 2)
        return pa.table({"hv": pc.filter(batch["hv"], keep)})

    batches = list(
        counts.map_batches(dup_only, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    dup_tbl = (
        pa.concat_tables(batches)
        if batches
        else pa.table({"hv": pa.array([], pa.uint64())})
    )
    dup_sorted = np.sort(dup_tbl["hv"].to_numpy(zero_copy_only=False).astype(np.uint64))
    return ray.put(dup_sorted)


def _member_mask(dup: np.ndarray, hv: np.ndarray) -> np.ndarray:
    if len(dup) == 0 or len(hv) == 0:
        return np.zeros(len(hv), dtype=bool)
    idx = np.searchsorted(dup, hv)
    return (idx < len(dup)) & (dup[np.minimum(idx, len(dup) - 1)] == hv)


def duplicate_spans(
    docs: ray.data.Dataset,
    L: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """documents → (doc_id, span_start, span_end): maximal half-open
    token spans covered by length-``L`` windows occurring >= 2 times
    corpus-wide."""
    dup_ref = _dup_hash_broadcast(docs, L, id_col, text_col)

    def mark_and_merge(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        d, p, hv = _window_hashes(batch, L, id_col, text_col)
        member = _member_mask(dup, hv)
        d, p = d[member], p[member]
        if len(d) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                }
            )
        # (d, p) is (row, pos)-ascending from construction; island break
        # where the doc changes or the start gap exceeds L (spans
        # [p, p+L) overlap-or-touch iff p_next <= p_prev + L)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > L)
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(d)]])
        return pa.table(
            {
                id_col: pa.array(d[starts], pa.int64()),
                "span_start": pa.array(p[starts], pa.int64()),
                "span_end": pa.array(p[ends - 1] + L, pa.int64()),
            }
        )

    return docs.map_batches(mark_and_merge, batch_format="pyarrow", zero_copy_batch=True)


def strip_duplicate_spans(
    docs: ray.data.Dataset,
    L: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """documents → (doc_id, text) with every token covered by a
    duplicated length-``L`` window REMOVED (the drop-all curation
    variant of ExactSubstr; Lee et al.'s keep-one-occurrence needs a
    global occurrence order and is deliberately not modeled). Docs with
    no duplicated windows pass through unchanged; fully-covered docs
    come back as the empty string. Fully vectorized: coverage via a
    +1/-1 delta cumsum over the flat token stream, the survivor text by
    one filtered ListArray rebuild + ``binary_join``."""
    dup_ref = _dup_hash_broadcast(docs, L, id_col, text_col)

    def strip(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        nrows = len(batch)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text.cast(pa.string()), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        doc_off = np.concatenate([[0], np.cumsum(n)])

        if nrows == 0 or total == 0:
            return pa.table(
                {id_col: ids, "text": pa.array([""] * nrows, pa.string())}
            )
        dup = ray.get(dup_ref)
        d_ids, p, hv = _window_hashes(batch, L, id_col, text_col)
        member = _member_mask(dup, hv)
        # flat-stream coverage: +1 at each marked window start, -1 past
        # its end (window spans stay inside one doc by construction).
        # _window_hashes returns doc IDs; recover batch row indices by a
        # sorted lookup over this batch's id column
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        delta = np.zeros(total + 1, dtype=np.int64)
        if member.any():
            order = np.argsort(ids_np, kind="stable")
            rows = order[np.searchsorted(ids_np[order], d_ids[member])]
            starts = doc_off[rows] + p[member]
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + L, -1)
        keep = np.cumsum(delta[:-1]) == 0
        kept_flat = pc.filter(flat, pa.array(keep))
        # every doc has >= 1 token (split of "" yields [""]), so the
        # reduceat segments are all non-empty
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), doc_off[:-1])
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        kept_flat = (
            kept_flat.combine_chunks()
            if isinstance(kept_flat, pa.ChunkedArray)
            else kept_flat
        )
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_flat)
        joined = pc.binary_join(lists, " ")
        return pa.table({id_col: ids, "text": joined})

    return docs.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
