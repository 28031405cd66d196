"""Unigram language-model scoring — KenLM-style perplexity filtering.

The curation step big pretraining pipelines run after heuristic quality
scores: train a cheap LM on the corpus (here: add-one-smoothed unigram
counts), score every document's perplexity against it, and filter the
tail. Two corpus passes, both vocabulary-bounded:

1. **counts**: map-side partial token counts → one ``groupby(token)``
   exchange (ships the vocabulary, not the corpus) → the count table plus
   (N, V) totals;
2. **score**: counts broadcast via ``ray.put`` (token array + count array,
   vectorized ``pc.index_in`` lookup per batch), per-doc reduction by
   ``np.bincount`` over list-parent indices.

Hash-exactness design (the repo convention for log-space math): each
token's surprisal is quantized to an INTEGER micro-nat count
``floor(-ln((c+1)/(N+V)) · 1e6)`` — per-doc sums of integers are exact in
any order, so the engine/oracle comparison never depends on float
summation order; only the final division/exp are floats, computed in the
same IEEE operand order on both sides and printf-rounded.

Unseen tokens (scoring a held-out set) get the smoothed floor count c=0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from lamapi_ray.stages.textstats import _tokens, round_ref_array

SCALE = 1_000_000


def unigram_counts(docs: ray.data.Dataset) -> tuple[pa.Table, int, int]:
    """→ (counts table (token, c), N total tokens, V vocab size)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _tokens(batch)
        vc = flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("c")
    )
    blocks = [t for t in ray.get(agg.to_arrow_refs()) if t.num_columns]
    counts = pa.concat_tables(blocks).rename_columns(["token", "c"])
    n_total = int(pc.sum(counts["c"]).as_py())
    return counts, n_total, counts.num_rows


def score_perplexity(
    docs: ray.data.Dataset,
    counts: pa.Table,
    n_total: int,
    vocab: int,
) -> ray.data.Dataset:
    """docs → (doc_id, n_tokens, surprisal_micro, avg_surprisal, ppl)."""
    toks = counts["token"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    c = counts["c"].to_numpy(zero_copy_only=False).astype(np.float64)
    # per-DISTINCT-token integer micro-nat surprisal (computed once here,
    # broadcast; the per-token float never reappears downstream)
    denom = float(n_total + vocab)
    surp = np.floor(-np.log((c + 1.0) / denom) * SCALE).astype(np.int64)
    # unseen-token fallback: c = 0
    surp_unseen = int(np.floor(-np.log(1.0 / denom) * SCALE))
    ref = ray.put((toks, surp))

    def score(batch: pa.Table) -> pa.Table:
        tok_arr, surp_arr = ray.get(ref)
        nrows = len(batch)
        _, flat, parents, n = _tokens(batch)
        pos = pc.index_in(flat, value_set=tok_arr)
        posn = pos.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(posn)
        per_tok = np.full(len(posn), surp_unseen, dtype=np.int64)
        per_tok[valid] = surp_arr[posn[valid].astype(np.int64)]
        # integer weights < 2^53: bincount's float64 accumulation is exact
        sm = np.bincount(parents, weights=per_tok, minlength=nrows).astype(
            np.int64
        )
        nf = n.astype(np.float64)
        avg = sm.astype(np.float64) / nf / SCALE
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
                "surprisal_micro": pa.array(sm, pa.int64()),
                "avg_surprisal": pa.array(round_ref_array(avg, 6), pa.float64()),
                "ppl": pa.array(round_ref_array(np.exp(avg), 4), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def perplexity_pipeline(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Train-on-corpus, score-the-corpus — the standard self-filtering run."""
    counts, n_total, vocab = unigram_counts(docs)
    return score_perplexity(docs, counts, n_total, vocab)


def perplexity_buckets(docs: ray.data.Dataset) -> ray.data.Dataset:
    """CCNet-style head/middle/tail corpus split by LM perplexity.

    CCNet (Wenzek et al. 2020) buckets a crawl by held-out-LM perplexity
    terciles and trains preferentially on the 'head'. Here the split key
    is the integer micro-nat average ``avg_micro = surprisal_micro //
    n_tokens`` (exact, order-free), and the two thresholds are the exact
    ceil(n/3)- and ceil(2n/3)-th order statistics of that key — computed
    WITHOUT a global sort: a per-batch value-count combiner feeds one
    ``groupby(avg_micro)`` exchange bounded by the number of DISTINCT
    key values (micro-nat averages cluster heavily), and the rank-k
    values fall out of a cumulative sum over the tiny histogram. Bucket
    assignment is then one streamed comparison pass. Ties at a threshold
    all land in the lower bucket (value-based split, the CCNet
    convention — terciles are approximate in SIZE, exact in VALUE).

    → (doc_id, avg_micro, bucket ∈ {'head','middle','tail'}).
    """
    scored = perplexity_pipeline(docs)

    def key(batch: pa.Table) -> pa.Table:
        s = batch["surprisal_micro"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "avg_micro": pa.array(s // n, pa.int64()),
            }
        )

    keyed = scored.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)

    def hist_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(
            batch["avg_micro"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"avg_micro": pa.array(v, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    agg = (
        keyed.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("avg_micro")
        .sum("c")
    )
    blocks = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    hist = pa.concat_tables(blocks)
    v = hist["avg_micro"].to_numpy(zero_copy_only=False)
    c = hist["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    t1 = int(v[np.searchsorted(cum, -(-n // 3))])       # ceil(n/3)-th
    t2 = int(v[np.searchsorted(cum, -(-(2 * n) // 3))])  # ceil(2n/3)-th

    def assign(batch: pa.Table) -> pa.Table:
        a = batch["avg_micro"].to_numpy(zero_copy_only=False)
        bucket = np.where(a <= t1, "head", np.where(a <= t2, "middle", "tail"))
        return batch.append_column(
            "bucket", pa.array(bucket.tolist(), pa.string())
        )

    return keyed.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
