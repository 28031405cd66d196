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


def bigram_counts(docs: ray.data.Dataset) -> pa.Table:
    """→ (w1, w2, c2) corpus bigram counts — map-side per-batch pair
    counts, ONE bigram-vocabulary-bounded grouped exchange (ships the
    bigram vocab, never the corpus)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, parents, _ = _tokens(batch)
        toks = flat.to_numpy(zero_copy_only=False)
        same = parents[1:] == parents[:-1]
        w1, w2 = toks[:-1][same], toks[1:][same]
        if len(w1) == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c2": pa.array([], pa.int64())}
            )
        pair = np.char.add(np.char.add(w1.astype(str), "\x1f"), w2.astype(str))
        up, cc = np.unique(pair, return_counts=True)
        parts = np.char.partition(up, "\x1f")
        return pa.table(
            {
                "w1": pa.array(parts[:, 0].tolist(), pa.string()),
                "w2": pa.array(parts[:, 2].tolist(), pa.string()),
                "c2": pa.array(cc.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .sum("c2")
    )
    blocks = [t for t in ray.get(agg.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(blocks).rename_columns(["w1", "w2", "c2"])


def bigram_perplexity_pipeline(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Add-one-smoothed BIGRAM LM, trained on the corpus and scoring it:
    P(w2|w1) = (c2(w1,w2)+1) / (c1(w1)+V) with c1 the plain unigram
    count and V the unigram vocabulary size — the next step up from the
    unigram filter (KenLM pipelines use n=5; the dataflow shape is
    identical from n=2 on: an n-gram-vocab-bounded count exchange plus a
    broadcast score pass).

    Same hash-exactness design as the unigram scorer: per-DISTINCT-bigram
    surprisal is quantized ONCE to integer micro-nats; per-doc sums are
    order-exact; only the final division/exp are floats, identical IEEE
    operand order both sides. Docs with <2 tokens have no bigrams and are
    dropped (mirrors the oracle's join semantics). Scoring the training
    corpus itself ⇒ every scored bigram exists in the count table (the
    lookup raises on a miss rather than silently smoothing)."""
    counts, n_total, vocab = unigram_counts(docs)
    bc = bigram_counts(docs)

    toks = counts["token"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    c1 = counts["c"].to_numpy(zero_copy_only=False).astype(np.float64)
    # per-distinct-bigram integer micro-nat surprisal, keyed by the
    # \x1f-joined pair (tokens are whitespace-split, so \x1f cannot occur
    # inside one)
    w1 = bc["w1"]
    w2 = bc["w2"]
    if isinstance(w1, pa.ChunkedArray):
        w1 = w1.combine_chunks()
    if isinstance(w2, pa.ChunkedArray):
        w2 = w2.combine_chunks()
    c1_pos = pc.index_in(w1, value_set=toks).to_numpy(zero_copy_only=False)
    if np.isnan(c1_pos.astype(np.float64)).any():
        raise ValueError("bigram history token missing from unigram vocab")
    denom = c1[c1_pos.astype(np.int64)] + float(vocab)
    c2 = bc["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
    surp = np.floor(-np.log((c2 + 1.0) / denom) * SCALE).astype(np.int64)
    keys = pc.binary_join_element_wise(
        w1.cast(pa.string()), w2.cast(pa.string()), "\x1f"
    )
    ref = ray.put((keys, surp))

    def score(batch: pa.Table) -> pa.Table:
        key_arr, surp_arr = ray.get(ref)
        nrows = len(batch)
        _, flat, parents, _ = _tokens(batch)
        toks_np = flat.to_numpy(zero_copy_only=False)
        same = parents[1:] == parents[:-1]
        bw1, bw2 = toks_np[:-1][same], toks_np[1:][same]
        bparents = parents[1:][same]
        bkeys = pa.array(
            np.char.add(
                np.char.add(bw1.astype(str), "\x1f"), bw2.astype(str)
            ).tolist(),
            pa.string(),
        )
        pos = pc.index_in(bkeys, value_set=key_arr)
        posn = pos.to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(posn).any():
            raise ValueError("scored bigram missing from the count table")
        per_big = surp_arr[posn.astype(np.int64)]
        sm = np.bincount(bparents, weights=per_big, minlength=nrows).astype(
            np.int64
        )
        nb = np.bincount(bparents, minlength=nrows).astype(np.int64)
        keep = nb > 0
        avg = sm[keep].astype(np.float64) / nb[keep].astype(np.float64) / SCALE
        did = batch["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        return pa.table(
            {
                "doc_id": did.filter(pa.array(keep)),
                "n_bigrams": pa.array(nb[keep], pa.int64()),
                "surprisal_micro": pa.array(sm[keep], pa.int64()),
                "avg_surprisal": pa.array(round_ref_array(avg, 6), pa.float64()),
                "ppl": pa.array(round_ref_array(np.exp(avg), 4), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
