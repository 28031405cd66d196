"""Corpus-curation operators a large-scale training-data pipeline needs:
benchmark decontamination, repetition-based quality filtering, and
deterministic source-mix rebalancing.

These have no analogue in the reference (lamAPI is a KG lookup service);
they are first-class engine operators in the style the training-data
literature standardized:

* **decontaminate** — flag training documents sharing any k-token n-gram
  with a held-out benchmark set (the GPT-3 appendix-C / PaLM
  decontamination rule). The benchmark's n-gram set is tiny relative to
  the corpus (benchmarks are MBs; the corpus is TBs), so it is hashed once
  and broadcast via ``ray.put``; the corpus streams through one
  ``map_batches`` doing a vectorized sorted-set membership per batch.
  Nothing corpus-sized shuffles or lands on the driver.
* **repetition_stats** — Gopher-style (Rae et al. 2021, table A1)
  repetition signals: the fraction of all word-2-grams taken by the most
  frequent 2-gram, and the fraction of duplicated word-3-grams. Pure
  per-doc map — one ``map_batches``, no shuffle; the n-gram counting is
  one lexsort + run-length encode over the whole batch (no per-doc loop).
* **rebalance_sources** — deterministic hash-threshold downsampling to
  target per-source mix proportions (the "domain mixing" step of corpus
  assembly). Two-pass: a per-source count groupby (output is
  source-cardinality-bounded, i.e. tiny), then a streamed filter whose
  keep test is a PURE INTEGER comparison — ``(h % 10000) · cnt_s · W <
  w_s · total · 10000`` — so engine and SQL oracle agree exactly with no
  float thresholds.

Shared machinery: token/shingle hashing reuses
:func:`lamapi_ray.stages.dedup._doc_shingle_hashes` (one md5 per distinct
token, numpy Horner fold mod 2^61-1 for windows) so the DuckDB oracle can
reproduce every hash relationally (same CTE pattern as the MinHash
oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lamapi_ray.stages.dedup import _doc_shingle_hashes, _npcol


def benchmark_shingles(bench: pa.Table, k: int, id_col: str = "doc_id",
                       text_col: str = "text") -> np.ndarray:
    """Sorted distinct k-gram hash set of the benchmark table (driver-side;
    the benchmark side is small by definition)."""
    _, _, sh = _doc_shingle_hashes(bench, id_col, text_col, k=k)
    return np.unique(sh)


def decontaminate(
    corpus: ray.data.Dataset,
    bench: pa.Table,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """→ Dataset of (doc_id, n_hits, contaminated), one row per corpus doc.

    ``n_hits`` counts the doc's DISTINCT k-gram hashes that appear in the
    benchmark's k-gram set; ``contaminated`` = n_hits > 0. Hashes are the
    house 2^61-1 Horner fold (collision odds ~|corpus n-grams|·|bench
    n-grams|/2^61 — negligible, and the oracle reproduces the identical
    hash so both sides agree by construction)."""
    bset = benchmark_shingles(bench, k, id_col, text_col)
    bref = ray.put(bset)
    del bset

    def flag(batch: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        ids, par, sh = _doc_shingle_hashes(batch, id_col, text_col, k=k)
        if len(ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_hits": pa.array([], pa.int64()),
                 "contaminated": pa.array([], pa.bool_())}
            )
        # sorted-set membership: searchsorted beats isin on a broadcast set
        if len(bs) == 0 or len(sh) == 0:
            nh = np.zeros(len(ids), np.int64)
        else:
            pos = np.minimum(np.searchsorted(bs, sh), len(bs) - 1)
            hit = bs[pos] == sh
            nh = np.bincount(par[hit], minlength=len(ids)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(nh, pa.int64()),
                "contaminated": pa.array(nh > 0, pa.bool_()),
            }
        )

    # streamed: one row per corpus doc — corpus-sized, so the operator
    # returns the Dataset (write_parquet / aggregate downstream at scale);
    # test-scale callers collect
    return corpus.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def _gram_stats(batch: pa.Table, k: int, id_col: str, text_col: str):
    """Per-doc (total, distinct, top_count) of word k-grams — one lexsort +
    run-length encode across the whole batch, no per-doc Python."""
    ids, par, g = _doc_shingle_hashes(batch, id_col, text_col, k=k, distinct=False)
    n = len(ids)
    total = np.bincount(par, minlength=n).astype(np.int64)
    if len(par) == 0:
        z = np.zeros(n, np.int64)
        return ids, total, z, z
    newseg = np.concatenate([[True], (par[1:] != par[:-1]) | (g[1:] != g[:-1])])
    seg = np.cumsum(newseg) - 1
    seg_counts = np.bincount(seg)
    seg_doc = par[newseg]
    distinct = np.bincount(seg_doc, minlength=n).astype(np.int64)
    top = np.zeros(n, np.int64)
    np.maximum.at(top, seg_doc, seg_counts)
    return ids, total, distinct, top


def repetition_stats(
    corpus: ray.data.Dataset,
    top2_threshold: float = 0.08,
    dup3_threshold: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """→ Dataset of (doc_id, top2gram_frac, dup3gram_frac, flagged) per doc.

    top2gram_frac = occurrences of the most frequent word-2-gram / total
    2-grams; dup3gram_frac = (total − distinct) word-3-grams / total.
    Both 0.0 for docs with no grams. ``flagged`` compares the ROUNDED
    (6 dp, printf semantics) fractions to the thresholds so the engine and
    the SQL oracle apply the cut to bit-identical values. Docs shorter
    than k tokens contribute their single all-token fold as one "gram"
    (``_doc_shingle_hashes`` short-doc parity, mirrored in the oracle)."""

    def stats(batch: pa.Table) -> pa.Table:
        ids, tot2, _, top = _gram_stats(batch, 2, id_col, text_col)
        _, tot3, dst3, _ = _gram_stats(batch, 3, id_col, text_col)
        top2 = np.where(tot2 > 0, top / np.maximum(tot2, 1), 0.0)
        dup3 = np.where(tot3 > 0, (tot3 - dst3) / np.maximum(tot3, 1), 0.0)
        from lamapi_ray.index.surface import _round_arr

        top2r = _round_arr(top2, 6)
        dup3r = _round_arr(dup3, 6)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "top2gram_frac": pa.array(top2r, pa.float64()),
                "dup3gram_frac": pa.array(dup3r, pa.float64()),
                "flagged": pa.array(
                    (top2r > top2_threshold) | (dup3r > dup3_threshold), pa.bool_()
                ),
            }
        )

    return corpus.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


# multiplicative mix constant (xxhash64 prime 2 mod 2^61-1) — distinct from
# dataset_split's golden-ratio constant so the two samplers are independent
REBALANCE_MULT = 0xC2B2AE3D27D4EB4F % ((1 << 61) - 1)


def rebalance_sources(
    corpus: ray.data.Dataset,
    weights: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "source",
) -> ray.data.Dataset:
    """Deterministic mix rebalancing: downsample each source group toward
    target share ``w_s / ΣW`` of the corpus.

    Pass 1: per-source counts (``groupby(source).count()`` — output is
    source-cardinality-bounded, so collecting it to the driver and
    broadcasting is the right shape at any corpus size). Pass 2: streamed
    filter keeping doc iff ``(h % 10000) · cnt_s · W < w_s · total ·
    10000`` with h = ((doc_id · REBALANCE_MULT) mod 2^61-1 + 1) mod
    2^61-1 — an all-integer comparison (keep-rate = min(1,
    w_s·total/(cnt_s·W)) with no float round-off), reproducible in
    HUGEINT SQL. → kept (doc_id, source) rows."""
    import pyarrow.compute as pc

    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    counts = {
        r[group_col]: int(r["count()"])
        for r in corpus.groupby(group_col).count().take_all()
    }
    total = sum(counts.values())
    W = sum(weights.get(s, 1) for s in counts)
    srcs = sorted(counts)
    src_arr = pa.array(srcs, pa.string())
    cnt_np = np.asarray([counts[s] for s in srcs], dtype=np.int64)
    w_np = np.asarray([weights.get(s, 1) for s in srcs], dtype=np.int64)
    MULT = np.uint64(REBALANCE_MULT)

    def keep(batch: pa.Table) -> pa.Table:
        ids = _npcol(batch, id_col, np.int64)
        if len(ids) == 0:
            return batch.select([id_col, group_col])
        h = fold_mod61(mulmod61(ids.view(np.uint64), np.full(len(ids), MULT)) + np.uint64(1))
        u = (h % np.uint64(10000)).astype(np.int64)
        code = pc.index_in(batch[group_col], value_set=src_arr).to_numpy(
            zero_copy_only=False
        )
        mask = u * cnt_np[code] * W < w_np[code] * total * 10000
        return batch.select([id_col, group_col]).filter(pa.array(mask))

    return corpus.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(
    corpus: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 3,
    scale: int = 10**6,
) -> ray.data.Dataset:
    """Per-document top-k salient terms by an integer tf·idf surrogate.

    score_fp = ``tf · scale // df`` — idf replaced by the monotone 1/df so
    the WHOLE ranking is integer arithmetic (a float ln() would let numpy
    and the SQL engine diverge by an ulp exactly at a rank boundary).
    Two-pass dataflow: (1) document frequencies are vocabulary-bounded —
    per-batch distinct-doc partial counts, one groupby.sum, broadcast via
    ``ray.put``; (2) one streamed pass computes per-doc tf (run-length over
    the (doc, token)-sorted hash stream), scores against the broadcast df,
    and keeps the top-k per doc with (score desc, token-hash asc) ties.
    → (doc_id, g, tf, df, score_fp), ≤ topk rows per document."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import _doc_shingle_hashes, scaled_partitions

    def df_partial(batch: pa.Table) -> pa.Table:
        _ids, _par, g = _doc_shingle_hashes(
            batch, id_col, text_col, k=1, distinct=True
        )
        ug, c = np.unique(g.astype(np.int64), return_counts=True)
        return pa.table({"g": pa.array(ug), "c": pa.array(c.astype(np.int64))})

    df_ds = (
        corpus.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g", num_partitions=scaled_partitions(1.0, 16))
        .aggregate(Sum("c"))
    )
    df_tbl = pa.concat_tables(
        df_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    dg = df_tbl["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    dc = df_tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(dg, kind="stable")
    df_ref = ray.put((dg[order], dc[order]))

    def score(batch: pa.Table) -> pa.Table:
        ids, par, g = _doc_shingle_hashes(
            batch, id_col, text_col, k=1, distinct=False
        )
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "score_fp": pa.array([], pa.int64()),
                }
            )
        gs = g.astype(np.int64)
        # rows arrive sorted by (doc, g): run-length encode for tf
        new = np.concatenate([[True], (par[1:] != par[:-1]) | (gs[1:] != gs[:-1])])
        starts = np.nonzero(new)[0]
        tf = np.diff(np.concatenate([starts, [len(gs)]])).astype(np.int64)
        seg_doc = par[new]
        seg_g = gs[new]
        keys, vals = ray.get(df_ref)
        pos = np.searchsorted(keys, seg_g)
        df = vals[pos]  # every token has a df by construction
        score_fp = tf * scale // df
        o = np.lexsort((seg_g, -score_fp, seg_doc))
        sd, sg, stf, sdf, ssc = (
            seg_doc[o], seg_g[o], tf[o], df[o], score_fp[o],
        )
        run_new = np.concatenate([[True], sd[1:] != sd[:-1]])
        run_start = np.maximum.accumulate(np.where(run_new, np.arange(len(sd)), 0))
        rank = np.arange(len(sd)) - run_start
        keep = rank < topk
        return pa.table(
            {
                "doc_id": pa.array(ids[sd[keep]]),
                "g": pa.array(sg[keep]),
                "tf": pa.array(stf[keep]),
                "df": pa.array(sdf[keep]),
                "score_fp": pa.array(ssc[keep]),
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
WS_RE = r"[ \t\r\n\f\v]+"


def clean_text(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Webtext normalization: NFC unicode normalize, strip control chars,
    collapse whitespace runs to single spaces, trim. The regex steps are
    RE2 kernels DuckDB reproduces literally; NFC takes a vectorized
    ASCII fast path (``pc.string_is_ascii`` — NFC is the identity on
    ASCII, which is almost all of a web corpus) and falls back to
    ``unicodedata.normalize`` only for the non-ASCII minority
    (pyarrow 16's ``utf8_normalize(form="NFC")`` does NOT compose —
    ``e`` + U+0301 stays decomposed — so it cannot match DuckDB's
    ``nfc_normalize``; verified empirically). Pure streamed map.

    → (doc_id, text_clean, n_chars_clean)."""
    import unicodedata

    import pyarrow.compute as pc

    def _nfc(t: pa.Array) -> pa.Array:
        ascii_mask = pc.fill_null(pc.string_is_ascii(t), True)
        if pc.all(ascii_mask).as_py():
            return t
        idx = np.flatnonzero(~ascii_mask.to_numpy(zero_copy_only=False))
        vals = t.take(pa.array(idx)).to_pylist()
        fixed = pa.array(
            [unicodedata.normalize("NFC", v) if v is not None else None
             for v in vals],
            pa.string(),
        )
        out = t.to_pylist()
        for i, v in zip(idx, fixed.to_pylist()):
            out[i] = v
        return pa.array(out, pa.string())

    def clean(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = _nfc(t.cast(pa.string()))
        t = pc.replace_substring_regex(t, CTRL_RE, "")
        t = pc.replace_substring_regex(t, WS_RE, " ")
        t = pc.replace_substring_regex(t, r"^ +", "")
        t = pc.replace_substring_regex(t, r" +$", "")
        return pa.table(
            {
                id_col: batch[id_col],
                "text_clean": t,
                "n_chars_clean": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


DEFAULT_BLOCKLIST = ("slow", "hash", "scan", "merge", "row")


def blocklist_scan(
    ds: ray.data.Dataset,
    patterns: tuple[str, ...] = DEFAULT_BLOCKLIST,
    threshold: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Blocklist / word-filter scan — the substring-count filter every
    curation pipeline runs (profanity lists, spam markers, boilerplate
    signatures): per doc, total occurrences of every listed pattern and
    a ``blocked`` flag at ``threshold``.

    Fully vectorized: one ``pc.count_substring`` kernel pass per pattern
    (P passes over the batch — right for list sizes up to a few
    thousand; for the 10^5-pattern regime build an Aho-Corasick
    automaton once per actor in ``__init__`` instead, same output
    contract). Patterns here are chosen without self-overlap so the
    count is well-defined identically under overlapping and
    non-overlapping semantics — which is what lets the DuckDB oracle
    state it as a replace-length identity.
    """

    import pyarrow.compute as pc

    def scan(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.cast(pa.large_string())
        total = np.zeros(len(batch), dtype=np.int64)
        for p in patterns:
            c = pc.count_substring(text, p).to_numpy(zero_copy_only=False)
            total += c.astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hits": pa.array(total, pa.int64()),
                "blocked": pa.array(total >= threshold, pa.bool_()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_fuzzy(
    corpus: ray.data.Dataset,
    bench: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 16,
    threshold_rows: int = 48,
) -> ray.data.Dataset:
    """NEAR-DUP benchmark decontamination — the MinHash sibling of the
    exact k-gram rule above, for paraphrased/lightly-edited benchmark
    leakage the n-gram test misses: a corpus doc is contaminated iff
    some LSH band of its 64-slot signature agrees with a benchmark
    doc's band AND ≥ ``threshold_rows`` of the 64 slots agree (the
    dedup family's 0.75-Jaccard near-dup rule, applied CROSS-set).

    Scale shape: the benchmark side is always tiny relative to the
    corpus (that is the premise of decontamination), so its signature
    matrix + per-band sorted digest tables broadcast once via
    ``ray.put``; the corpus streams through one map_batches — per batch
    a vectorized band-digest searchsorted probe, candidate expansion by
    range, and an exact ≥threshold slot verify against the true bench
    signatures (band-digest equality stands in for exact band equality
    modulo a 2^-61 fold collision — the dedup_minhash convention).
    Output: one row per corpus doc (doc_id, n_bench_matches,
    contaminated)."""
    from lamapi_ray.stages.dedup import MinHasher, _horner_cols, _sig_matrix

    rows_per_band = MinHasher.NUM_PERM // bands
    bids, bsigs = _sig_matrix(bench, id_col, text_col)
    band_tables = []
    for b in range(bands):
        d = _horner_cols(
            bsigs[:, b * rows_per_band : (b + 1) * rows_per_band], init=b + 1
        )
        order = np.argsort(d, kind="stable")
        band_tables.append((d[order], order))
    bref = ray.put((bids, bsigs, band_tables))

    def flag(batch: pa.Table) -> pa.Table:
        b_ids, b_sigs, b_tables = ray.get(bref)
        ids, sigs = _sig_matrix(batch, id_col, text_col)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bench_matches": pa.array([], pa.int64()),
                "contaminated": pa.array([], pa.bool_()),
            }
        )
        if len(ids) == 0:
            return empty
        ci_all, bi_all = [], []
        for b, (bd_sorted, bd_order) in enumerate(b_tables):
            if len(bd_sorted) == 0:
                continue
            cd = _horner_cols(
                sigs[:, b * rows_per_band : (b + 1) * rows_per_band],
                init=b + 1,
            )
            lo = np.searchsorted(bd_sorted, cd, side="left")
            hi = np.searchsorted(bd_sorted, cd, side="right")
            cnt = hi - lo
            hit = cnt > 0
            if not hit.any():
                continue
            ci = np.repeat(np.flatnonzero(hit), cnt[hit])
            # offsets into the sorted digest array, expanded per range
            offs = np.concatenate(
                [np.arange(l, h) for l, h in zip(lo[hit], hi[hit])]
            )
            ci_all.append(ci)
            bi_all.append(bd_order[offs])
        n_match = np.zeros(len(ids), np.int64)
        if ci_all:
            ci = np.concatenate(ci_all)
            bi = np.concatenate(bi_all)
            # dedupe (corpus, bench) candidate pairs across bands
            key = ci.astype(np.int64) * len(b_ids) + bi
            ukey = np.unique(key)
            ci, bi = ukey // len(b_ids), ukey % len(b_ids)
            agree = (sigs[ci] == b_sigs[bi]).sum(axis=1) >= threshold_rows
            np.add.at(n_match, ci[agree], 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bench_matches": pa.array(n_match, pa.int64()),
                "contaminated": pa.array(n_match > 0, pa.bool_()),
            }
        )

    return corpus.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
