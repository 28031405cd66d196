"""Term co-occurrence / association mining (PMI) over a bounded vocabulary.

Two-pass dataflow:

1. document frequencies (vocabulary-bounded combiner + groupby-sum, the
   same exchange as tf-idf); the top-V terms (df desc, hash asc — fully
   deterministic) become the association vocabulary, broadcast as a sorted
   hash array.
2. ONE streamed pass: each batch builds its docs×V presence matrix (a
   searchsorted membership over the token-hash stream) and folds it to a
   V×V pair-count block with one integer ``Mᵀ·M`` — per-batch output is
   V²-bounded regardless of batch size — then a single groupby-sum merges
   the blocks.

The association score is the ALL-INTEGER PMI surrogate
``c_xy · N · 10⁶ // (c_x · c_y)`` — monotone in the real PMI
(log is monotone), so ranking is preserved while engine and SQL agree
exactly (no float log at a rank boundary). Same design rationale as
tf-idf's 1/df idf (stages/curation.py::tfidf_top_terms).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lamapi_ray.stages.dedup import _doc_shingle_hashes, scaled_partitions


def term_pmi(
    corpus: ray.data.Dataset,
    top_v: int = 30,
    min_both: int = 2,
    scale: int = 10**6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """→ (g1, g2, n_both, score_fp) for top-V term pairs co-occurring in
    ≥ ``min_both`` docs; g1 < g2; score_fp = n_both·N·scale // (df1·df2)."""
    from ray.data.aggregate import Sum

    # one pass gives BOTH the dfs and the total doc count: a marker row
    # per batch carries the batch's doc count through the same exchange
    def df_partial2(batch: pa.Table) -> pa.Table:
        ids, _par, g = _doc_shingle_hashes(batch, id_col, text_col, k=1)
        ug, c = np.unique(g.astype(np.int64), return_counts=True)
        # marker row g = -1 carries the batch's doc count (token hashes are
        # folds into [0, 2^61), so -1 cannot collide)
        return pa.table(
            {"g": pa.array(np.r_[ug, [-1]], pa.int64()),
             "c": pa.array(np.r_[c.astype(np.int64), [len(ids)]], pa.int64())}
        )

    agg = (
        corpus.map_batches(df_partial2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g", num_partitions=scaled_partitions(0.5, 16))
        .aggregate(Sum("c"))
    )
    df_tbl = pa.concat_tables(
        agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    gs = df_tbl["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    cs = df_tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = int(cs[gs == -1][0])
    mask = gs != -1
    gs, cs = gs[mask], cs[mask]
    order = np.lexsort((gs, -cs))[:top_v]  # df desc, hash asc
    vocab = np.sort(gs[order])             # sorted for searchsorted
    vdf = cs[order][np.argsort(gs[order], kind="stable")]
    vocab_ref = ray.put(vocab)

    def pair_block(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        V = len(voc)
        ids, par, g = _doc_shingle_hashes(batch, id_col, text_col, k=1)
        out_empty = pa.table(
            {"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
             "c": pa.array(np.empty(0, np.int64), pa.int64())}
        )
        if len(g) == 0 or V == 0:
            return out_empty
        gi = g.astype(np.int64)
        pos = np.searchsorted(voc, gi)
        pos_c = np.minimum(pos, V - 1)
        hit = voc[pos_c] == gi
        if not hit.any():
            return out_empty
        M = np.zeros((len(ids), V), np.int64)
        M[par[hit], pos_c[hit]] = 1
        C = M.T @ M  # V×V co-occurrence block of this batch
        iu, ju = np.triu_indices(V, k=1)
        cc = C[iu, ju]
        nz = cc > 0
        return pa.table(
            {"i": pa.array(iu[nz].astype(np.int64), pa.int64()),
             "j": pa.array(ju[nz].astype(np.int64), pa.int64()),
             "c": pa.array(cc[nz], pa.int64())}
        )

    pair_agg = (
        corpus.map_batches(pair_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"], num_partitions=scaled_partitions(0.25, 8))
        .aggregate(Sum("c"))
    )
    pairs = pa.concat_tables(
        pair_agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    if pairs.num_rows == 0:
        return pa.table(
            {"g1": pa.array([], pa.int64()), "g2": pa.array([], pa.int64()),
             "n_both": pa.array([], pa.int64()),
             "score_fp": pa.array([], pa.int64())}
        )
    i = pairs["i"].to_numpy(zero_copy_only=False).astype(np.int64)
    j = pairs["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = pairs["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = c >= min_both
    i, j, c = i[keep], j[keep], c[keep]
    score = c * n_docs * scale // (vdf[i] * vdf[j])
    out = pa.table(
        {
            "g1": pa.array(vocab[i], pa.int64()),
            "g2": pa.array(vocab[j], pa.int64()),
            "n_both": pa.array(c, pa.int64()),
            "score_fp": pa.array(score, pa.int64()),
        }
    )
    return out.sort_by([("g1", "ascending"), ("g2", "ascending")])
