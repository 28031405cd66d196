"""Distributed inverted-index (postings-list) construction.

The reference serves lookups from a prebuilt ElasticSearch index
(`scripts/elastic_indexing.py`); here index construction itself is the
dataflow: the corpus streams through one ``map_batches`` emitting its
distinct (term, doc) pairs, ONE cluster-scaled grouped exchange co-locates
each term's postings, and the per-term finisher emits (term, df, sorted
postings). The exchange ships exactly the index's own content — the
irreducible volume for index construction — and nothing else.

Terms are the house md5→mod-(2^61-1) token hashes
(:func:`lamapi_ray.stages.dedup._doc_shingle_hashes` with ``k=1``), so the
DuckDB oracle reproduces every term id relationally (same CTE as the
MinHash/top_ngrams oracles).

Scale notes (100 TB): the pair stream is corpus-sized but map-side
distinct-per-doc (no within-doc repetition crosses the wire); head-term
postings are O(corpus) per row — at real scale the finisher would write
postings sharded by (term, doc-range) into partitioned Parquet instead of
one row per term, same dataflow. ``min_df`` prunes the hapax tail (most of
the vocabulary) at the reducer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from lamapi_ray.stages.dedup import _doc_shingle_hashes, scaled_partitions


def term_doc_pairs(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """Distinct (term-hash, doc) pairs of one batch — vectorized, one md5
    per distinct token (memoized per worker)."""
    ids, par, sh = _doc_shingle_hashes(batch, id_col, text_col, k=1)
    return pa.table(
        {
            "g": pa.array(sh.astype(np.int64), pa.int64()),
            "doc_id": pa.array(ids[par], pa.int64()),
        }
    )


def inverted_index(
    ds: ray.data.Dataset,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """→ (g, df, postings): term hash, document frequency, comma-joined
    ascending doc-id postings string, for terms with df ≥ ``min_df``."""

    def pairs(batch: pa.Table) -> pa.Table:
        return term_doc_pairs(batch, id_col, text_col)

    def finish(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        # a group block can carry SEVERAL terms (hash-partitioned groupby
        # feeds map_groups per key, but guard segment-wise anyway)
        g = group["g"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, g))
        g, ids = g[order], ids[order]
        starts = np.r_[0, np.flatnonzero(np.diff(g)) + 1]
        ends = np.r_[starts[1:], len(g)]
        keep = (ends - starts) >= min_df
        gs, dfs, posts = [], [], []
        for s, e in zip(starts[keep], ends[keep]):
            gs.append(int(g[s]))
            dfs.append(int(e - s))
            posts.append(",".join(str(i) for i in ids[s:e]))
        return pa.table(
            {
                "g": pa.array(gs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "postings": pa.array(posts, pa.string()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g", num_partitions=scaled_partitions(1.0, 32))
        .map_groups(finish, batch_format="pyarrow")
    )


def merge_postings(
    segments: ray.data.Dataset,
    deleted: np.ndarray,
    min_df: int = 3,
) -> ray.data.Dataset:
    """LSM-style index compaction: merge per-segment postings rows
    (g, df, postings) into one index — per term, the sorted deduped
    union of segment postings MINUS the tombstoned doc ids, with
    ``min_df`` applied at the merge (segments must be built with
    ``min_df=1``: a term under-threshold in every segment can still
    clear it after the union, which is why real LSM engines keep full
    per-segment postings and prune only at compaction).

    One grouped exchange keyed on the term hash ships exactly the
    touched postings; tombstones broadcast as a sorted int64 array
    (delete sets are small relative to the corpus — at 10^12-doc scale
    partition them by doc-range and semi-join instead, same kernel).
    Postings parse/rebuild is vectorized per group block
    (``split_pattern`` → flat int64 → lexsort), not per-id Python."""
    del_sorted = np.sort(np.asarray(deleted, dtype=np.int64))
    del_ref = ray.put(del_sorted)

    empty = pa.table(
        {
            "g": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.string()),
        }
    )

    def merge_group(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty
        posts_col = group["postings"]
        if isinstance(posts_col, pa.ChunkedArray):
            posts_col = posts_col.combine_chunks()
        split = pc.split_pattern(posts_col.cast(pa.string()), ",")
        flat = pc.cast(pc.list_flatten(split), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        g_np = group["g"].to_numpy(zero_copy_only=False)
        terms = g_np[np.repeat(np.arange(len(group)), lens)]
        dels = ray.get(del_ref)
        if len(dels):
            idx = np.searchsorted(dels, flat)
            alive = ~(
                (idx < len(dels))
                & (dels[np.minimum(idx, len(dels) - 1)] == flat)
            )
            terms, flat = terms[alive], flat[alive]
        if len(flat) == 0:
            return empty
        order = np.lexsort((flat, terms))
        terms, flat = terms[order], flat[order]
        # dedup (term, id) pairs from overlapping segments
        keep = np.r_[True, (terms[1:] != terms[:-1]) | (flat[1:] != flat[:-1])]
        terms, flat = terms[keep], flat[keep]
        starts = np.r_[0, np.flatnonzero(np.diff(terms)) + 1]
        ends = np.r_[starts[1:], len(terms)]
        ok = (ends - starts) >= min_df
        gs, dfs, posts = [], [], []
        for s, e in zip(starts[ok], ends[ok]):
            gs.append(int(terms[s]))
            dfs.append(int(e - s))
            posts.append(",".join(str(i) for i in flat[s:e]))
        return pa.table(
            {
                "g": pa.array(gs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "postings": pa.array(posts, pa.string()),
            }
        )

    return segments.groupby(
        "g", num_partitions=scaled_partitions(1.0, 32)
    ).map_groups(merge_group, batch_format="pyarrow")
