"""Distributed full-text BM25 search over a document corpus.

The reference serves BM25 through Elasticsearch over surface-form *names*
(api/model/elastic.py:31-64 — mirrored exactly by
``index/surface.py::bm25_hits``); this stage is the same ranking function
turned into a corpus-scale Ray Data operator over the *document text*
itself — the "retrieve supporting passages" step of RAG / retrieval
pipelines, which the reference has no corpus-text equivalent of.

Determinism contract (what lets DuckDB check the ranking exactly): every
per-(term, doc) BM25 contribution is computed with the SAME IEEE operand
order as the SQL mirror and quantized to INTEGER micro-units
(``floor(contrib · 1e6)``) BEFORE summing — integer per-doc sums are
order-exact, so no float-accumulation-order hazard survives into the
ranking (the ``unigram_perplexity`` micro-nat recipe). Ties break by
doc_id ascending.

Dataflow (two bounded passes, nothing corpus-sized on the driver):

1. **Stats pass** — one ``map_batches`` over (doc_id, text) emits per-batch
   partials: (Σ dl, #docs) and df per query term (terms are the search
   input — a tiny broadcast set). Partials are terms-bounded per batch and
   fold on the driver into N, avgdl and idf per term.
2. **Score pass** — idf/avgdl broadcast via ``ray.put``; each batch
   tokenizes vectorized (one ``split_pattern`` + ``index_in`` against the
   term vocabulary + one bincount for the docs×terms tf matrix), forms
   integer micro-unit scores per (query, doc), and keeps only its LOCAL
   top-k per query (map-side combine) — the grouped exchange ships
   ≤ queries · k · blocks rows at any corpus size; a final per-query merge
   emits the global top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BM25_K1 = 1.2
BM25_B = 0.75
SCALE = 1_000_000


def _tokenize(col: pa.ChunkedArray | pa.Array):
    """text column → (flat token array, parent doc-row indices)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col.cast(pa.large_string()), " ")
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    dl = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, parents, dl


def bm25_search(
    docs: ray.data.Dataset,
    queries: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """→ (query, doc_id, rank, bm25_micro) — top-``k`` docs per query by
    BM25 (k1=1.2, b=0.75, Robertson idf ``ln(1+(N−df+0.5)/(df+0.5))``),
    scores in exact integer micro-units. Output is queries·k-bounded."""
    # dedup terms across queries; per-query term index sets
    terms = sorted({t for q in queries for t in q.split(" ")})
    t_arr = pa.array(terms, pa.large_string())
    q_terms = [
        np.array(sorted({terms.index(t) for t in q.split(" ")}), np.int64)
        for q in queries
    ]
    T = len(terms)

    def stats(batch: pa.Table) -> pa.Table:
        flat, parents, dl = _tokenize(batch[text_col])
        ti = pc.fill_null(pc.index_in(flat, t_arr), -1).to_numpy(
            zero_copy_only=False
        )
        hit = ti >= 0
        # df partial: distinct (doc, term) presence per batch
        key = parents[hit] * np.int64(T) + ti[hit]
        df_part = np.bincount(np.unique(key) % T, minlength=T).astype(np.int64)
        return pa.table(
            {
                "term_idx": pa.array(np.arange(T + 1, dtype=np.int64)),
                "df": pa.array(np.concatenate([df_part, [0]]), pa.int64()),
                # row T carries the (Σ dl, n_docs) scalar partial
                "sum_dl": pa.array(
                    np.concatenate([np.zeros(T, np.int64), [dl.sum()]]), pa.int64()
                ),
                "n_docs": pa.array(
                    np.concatenate([np.zeros(T, np.int64), [len(dl)]]), pa.int64()
                ),
            }
        )

    df = np.zeros(T, np.int64)
    sum_dl = 0
    n_docs = 0
    for b in (
        docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ):
        ti = b["term_idx"].to_numpy(zero_copy_only=False)
        dfp = b["df"].to_numpy(zero_copy_only=False)
        scalar = ti == T
        df += np.bincount(ti[~scalar], weights=dfp[~scalar], minlength=T).astype(
            np.int64
        )
        sum_dl += int(b["sum_dl"].to_numpy(zero_copy_only=False)[scalar].sum())
        n_docs += int(b["n_docs"].to_numpy(zero_copy_only=False)[scalar].sum())

    if n_docs == 0:
        return pa.table(
            {
                "query": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "bm25_micro": pa.array([], pa.int64()),
            }
        )
    # SAME IEEE operand order as the SQL mirror:
    #   avgdl = CAST(sum_dl AS DOUBLE) / n        (one double division)
    #   idf   = ln(1 + (n - df + 0.5) / (df + 0.5))
    avgdl = np.float64(sum_dl) / n_docs
    idf = np.log(1.0 + (n_docs - df.astype(np.float64) + 0.5) / (df + 0.5))
    state_ref = ray.put((idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        idf_v, avg = ray.get(state_ref)
        flat, parents, dl = _tokenize(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = pc.fill_null(pc.index_in(flat, t_arr), -1).to_numpy(
            zero_copy_only=False
        )
        hit = ti >= 0
        nd = len(ids)
        tf = np.bincount(
            parents[hit] * np.int64(T) + ti[hit], minlength=nd * T
        ).reshape(nd, T).astype(np.float64)
        dlf = dl.astype(np.float64)[:, None]
        # contrib = floor(idf * tf * 2.2 / (tf + 1.2*(0.25 + 0.75*dl/avgdl)) * 1e6)
        # — identical left-assoc order AND identical double literals to the
        # oracle expression (2.2 as one literal, NOT 1.2+1.0: the sum rounds
        # differently in the last ulp)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.floor(
                idf_v[None, :] * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dlf / avg))
                * SCALE
            )
        c = np.where(tf > 0, c, 0.0).astype(np.int64)
        out_q, out_d, out_s = [], [], []
        for qi, tidx in enumerate(q_terms):
            sc = c[:, tidx].sum(axis=1)
            pos = np.nonzero(sc != 0)[0]
            if len(pos) == 0:
                continue
            # map-side local top-k: (score desc, doc_id asc)
            order = np.lexsort((ids[pos], -sc[pos]))[:k]
            sel = pos[order]
            out_q.append(np.full(len(sel), qi, np.int64))
            out_d.append(ids[sel])
            out_s.append(sc[sel])
        if not out_q:
            return pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "s": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        qi = group["qi"].combine_chunks().to_numpy(zero_copy_only=False)
        d = group["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        s = group["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))[:k]
        return pa.table(
            {
                "qi": pa.array(qi[order], pa.int64()),
                "doc_id": pa.array(d[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "bm25_micro": pa.array(s[order], pa.int64()),
            }
        )

    ranked = pa.concat_tables(
        docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qi", num_partitions=min(8, max(len(queries), 1)))
        .map_groups(final_topk, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    if ranked.num_rows == 0:
        return pa.table(
            {
                "query": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "bm25_micro": pa.array([], pa.int64()),
            }
        )
    qi = ranked["qi"].to_numpy(zero_copy_only=False)
    tbl = pa.table(
        {
            "query": pa.array([queries[i] for i in qi], pa.string()),
            "doc_id": ranked["doc_id"],
            "rank": ranked["rank"],
            "bm25_micro": ranked["bm25_micro"],
        }
    )
    return tbl.sort_by([("query", "ascending"), ("rank", "ascending")])
