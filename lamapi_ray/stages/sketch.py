"""Distributed cardinality sketch (HyperLogLog registers).

The approximate-distinct operator a 100 TB pipeline uses where an exact
``count(distinct)`` would shuffle the full key stream: every batch folds
its keys into a TINY register array (m = 2^p buckets × max leading-zero
rank), the partials merge with an elementwise max — associative and
commutative, so ONE m-row grouped exchange finishes the job no matter the
corpus size or skew. Nothing key-stream-sized ever crosses the wire.

Determinism: the key hash is the house multiplicative mod-(2^61-1) hash
(functions/inthash — HUGEINT-reproducible), bucket/remainder are integer
field extractions, and the rank is an integer bit-length — so the REGISTER
TABLE itself is exactly oracle-checkable in SQL (bit length via
``length(bin(x))``). The float estimate is a deterministic function of the
registers (all 2^-rho terms are exact powers of two ≥ 2^-(W+1), so the sum
is exact in double regardless of order) — exposed separately.

p=6 (64 registers), W=25 remainder bits: standard HLL error ~1.04/√64 ≈
13%; raise p for tighter estimates (register count is the only cost).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.functions.inthash import MOD61, fold_mod61, mulmod61

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 25                     # remainder bits used for the rank
HLL_MULT = np.uint64(0x9E3779B97F4A7C15 % MOD61)  # dataset_split's mixer


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    h = ids.astype(np.int64).view(np.uint64)
    return fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))


def batch_registers(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (bucket, max_rho) partial registers of one batch (≤ m rows)."""
    h = _hash_ids(ids)
    bucket = (h % np.uint64(HLL_M)).astype(np.int64)
    rem = ((h >> np.uint64(HLL_P)) % np.uint64(1 << HLL_W)).astype(np.int64)
    # integer bit length; rem < 2^25 so the float64 conversion is exact and
    # floor(log2) cannot cross a power-of-two boundary
    rho = np.full(len(rem), HLL_W + 1, np.int64)
    nz = rem > 0
    rho[nz] = HLL_W - np.floor(np.log2(rem[nz])).astype(np.int64)
    regs = np.zeros(HLL_M, np.int64)
    np.maximum.at(regs, bucket, rho)
    nonzero = np.flatnonzero(regs)
    return nonzero, regs[nonzero]


def hll_registers(
    ds: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """→ (bucket, max_rho): the merged HLL register table of ``id_col``."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bucket, rho = batch_registers(ids)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("rho"))
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch["bucket"],
                "max_rho": batch["max(rho)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def hll_registers_grouped(
    ds: ray.data.Dataset, group_col: str, id_col: str
) -> ray.data.Dataset:
    """→ (group, bucket, max_rho): one HLL register table PER GROUP — the
    grouped form of the distinct sketch ("distinct users per event type"
    at any cardinality). Each batch folds to ≤ groups×m partial rows, so
    the single grouped max-merge exchange is groups×m-bounded no matter
    the key-stream size — where the exact grouped count-distinct
    (``distinct_users_daily``) must ship every distinct key."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = _hash_ids(ids)
        bucket = (h % np.uint64(HLL_M)).astype(np.int64)
        rem = ((h >> np.uint64(HLL_P)) % np.uint64(1 << HLL_W)).astype(np.int64)
        rho = np.full(len(rem), HLL_W + 1, np.int64)
        nz = rem > 0
        rho[nz] = HLL_W - np.floor(np.log2(rem[nz])).astype(np.int64)
        groups, ginv = np.unique(
            batch[group_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        key = ginv * HLL_M + bucket
        regs = np.zeros(len(groups) * HLL_M, np.int64)
        np.maximum.at(regs, key, rho)
        nzk = np.flatnonzero(regs)
        return pa.table(
            {
                group_col: pa.array(groups[nzk // HLL_M]),
                "bucket": pa.array(nzk % HLL_M, pa.int64()),
                "rho": pa.array(regs[nzk], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "bucket"])
        .aggregate(Max("rho"))
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch[group_col],
                "bucket": batch["bucket"].cast(pa.int64()),
                "max_rho": batch["max(rho)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def hll_estimate(registers: pa.Table) -> float:
    """Standard HLL estimate from the register table (empty buckets count
    as rho=0). Small-range correction (linear counting) applied when the
    raw estimate ≤ 2.5m and empty buckets exist."""
    m = HLL_M
    regs = np.zeros(m, np.int64)
    regs[registers["bucket"].to_numpy(zero_copy_only=False)] = (
        registers["max_rho"].to_numpy(zero_copy_only=False)
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(raw)


BLOOM_M = 4096               # bits (64 words)
BLOOM_K = 2                  # hash functions (double hashing)
_BLOOM_MULT2 = np.uint64(0xC2B2AE3D27D4EB4F % MOD61)  # second mixer


def bloom_bits(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (word_idx, or_bits) partial Bloom words of one batch.

    Double hashing: bit_i = (h1 + i·h2) mod m for i in 0..k-1, with h1/h2
    the two house multiplicative mod-(2^61-1) mixes — integer-exact, so
    the packed 64-bit words are reproducible in SQL (``bit_or(1 << bit)``;
    both sides view the word as a two's-complement int64)."""
    h = ids.astype(np.int64).view(np.uint64)
    h1 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))
    h2 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), _BLOOM_MULT2)) + np.uint64(3))
    words = np.zeros(BLOOM_M // 64, np.uint64)
    for i in range(BLOOM_K):
        bit = ((h1 + np.uint64(i) * h2) % np.uint64(BLOOM_M)).astype(np.int64)
        w, b = bit // 64, bit % 64
        np.bitwise_or.at(words, w, np.uint64(1) << b.astype(np.uint64))
    nz = np.flatnonzero(words)
    return nz.astype(np.int64), words[nz].view(np.int64)


def bloom_filter(ds: ray.data.Dataset, id_col: str) -> ray.data.Dataset:
    """→ (word_idx, bits): the merged Bloom filter of ``id_col`` — per-batch
    word-OR partials, ONE ≤64-row grouped OR-merge exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w, bits = bloom_bits(ids)
        return pa.table(
            {"word_idx": pa.array(w, pa.int64()),
             "bits": pa.array(bits, pa.int64())}
        )

    def or_merge(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"word_idx": pa.array([], pa.int64()),
                 "bits": pa.array([], pa.int64())}
            )
        w = int(group["word_idx"][0].as_py())
        bits = group["bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {"word_idx": pa.array([w], pa.int64()),
             "bits": pa.array([int(np.bitwise_or.reduce(bits).view(np.int64))],
                              pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word_idx")
        .map_groups(or_merge, batch_format="pyarrow")
    )


def bloom_contains(filter_tbl: pa.Table, ids: np.ndarray) -> np.ndarray:
    """Membership probe (no false negatives by construction)."""
    words = np.zeros(BLOOM_M // 64, np.uint64)
    words[filter_tbl["word_idx"].to_numpy(zero_copy_only=False)] = (
        filter_tbl["bits"].to_numpy(zero_copy_only=False).view(np.uint64)
    )
    h = ids.astype(np.int64).view(np.uint64)
    h1 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))
    h2 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), _BLOOM_MULT2)) + np.uint64(3))
    out = np.ones(len(ids), bool)
    for i in range(BLOOM_K):
        bit = ((h1 + np.uint64(i) * h2) % np.uint64(BLOOM_M)).astype(np.int64)
        w, b = bit // 64, bit % 64
        out &= (words[w] >> b.astype(np.uint64)) & np.uint64(1) == 1
    return out


HIST_BINS = 128              # equi-width histogram resolution


def histogram_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    bins: int = HIST_BINS,
    qs: tuple[float, ...] = (0.50, 0.95, 0.99),
) -> ray.data.Dataset:
    """Mergeable equi-width-histogram quantile sketch — the third sketch in
    the family (HLL = distinct, Bloom = membership, this = quantiles).

    Where an exact per-group percentile (``event_percentiles``) sorts full
    value streams, the sketch folds each batch into per-(group, bin) counts
    — histogram partials merge by SUM (associative/commutative), so ONE
    grouped exchange of ≤ groups×bins tiny rows finishes the job at any
    corpus size. The estimate for quantile q is the LOWER EDGE of the first
    bin whose cumulative count reaches ceil(q·n): deterministic integer +
    IEEE-double arithmetic, so the estimates are exactly oracle-checkable
    (error bound: one bin width = (hi−lo)/bins).

    Two passes: a global min/max aggregate pins [lo, hi] (at 100 TB the
    bounds usually come from schema/config metadata instead — then it is
    one pass). Binning: clip(floor((v−lo)·bins/(hi−lo)), 0, bins−1), the
    literal same expression the SQL mirror uses, so bin assignment is
    bit-identical. All-equal groups (hi == lo) land in bin 0.
    """
    import math

    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(value_col), Max(value_col))
    lo = float(stats[f"min({value_col})"])
    hi = float(stats[f"max({value_col})"])
    fbins = float(bins)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        if hi > lo:
            b = np.floor((vals - lo) * fbins / (hi - lo))
            b = np.clip(b, 0.0, fbins - 1.0).astype(np.int64)
        else:
            b = np.zeros(len(vals), np.int64)
        groups, ginv = np.unique(
            batch[group_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        key, cnt = np.unique(ginv * bins + b, return_counts=True)
        return pa.table(
            {
                group_col: pa.array(groups[key // bins]),
                "bin": pa.array(key % bins, pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    width = (hi - lo) / fbins

    def finish(group: pa.Table) -> pa.Table:
        hist = np.zeros(bins, np.int64)
        np.add.at(
            hist,
            group["bin"].to_numpy(zero_copy_only=False),
            group["c"].to_numpy(zero_copy_only=False),
        )
        n = int(hist.sum())
        cum = np.cumsum(hist)
        row = {group_col: [group[group_col][0].as_py()],
               "n_events": pa.array([n], pa.int64())}
        for q in qs:
            bq = int(np.searchsorted(cum, math.ceil(q * n)))
            row[f"p{int(q * 100)}_est"] = pa.array(
                [lo + float(bq) * width], pa.float64()
            )
        return pa.table(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(finish, batch_format="pyarrow")
    )


CMS_D = 4                    # hash rows
CMS_W = 1024                 # counters per row


def cms_cells(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (cell_key, count) partial Count-Min cells of one batch, with
    cell_key = row·w + col. Double hashing shares Bloom's two house
    mod-(2^61-1) mixes: col_i = (h1 + i·h2) mod w for row i — h1 + 3·h2
    < 4·2^61 < 2^64 so the uint64 sum is exact, and the SQL mirror
    computes the identical value in HUGEINT."""
    h = ids.astype(np.int64).view(np.uint64)
    h1 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))
    h2 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), _BLOOM_MULT2)) + np.uint64(3))
    counts = np.zeros(CMS_D * CMS_W, np.int64)
    for i in range(CMS_D):
        col = ((h1 + np.uint64(i) * h2) % np.uint64(CMS_W)).astype(np.int64)
        np.add.at(counts, i * CMS_W + col, 1)
    nz = np.flatnonzero(counts)
    return nz, counts[nz]


def count_min_sketch(ds: ray.data.Dataset, id_col: str) -> ray.data.Dataset:
    """→ (row, col, n): the merged Count-Min sketch of ``id_col`` — the
    frequency-ESTIMATE sketch completing the family (HLL = distinct,
    Bloom = membership, histogram = quantiles, Misra-Gries = exact heavy
    hitters; CMS answers point-frequency queries over keys too numerous
    to recount). Counter partials merge by SUM — associative and
    commutative — so ONE grouped exchange of ≤ d·w tiny rows finishes the
    job at any corpus size; the register table is integer-exact and
    directly oracle-checkable."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key, cnt = cms_cells(ids)
        return pa.table(
            {"cell": pa.array(key, pa.int64()), "c": pa.array(cnt, pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("c"))
    )

    def project(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "row": pa.array(cell // CMS_W, pa.int64()),
                "col": pa.array(cell % CMS_W, pa.int64()),
                "n": batch["sum(c)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def cms_estimate(sketch_tbl: pa.Table, ids: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the d rows' counters — never
    an underestimate, overestimate ≤ e·N/w with probability 1−e^−d."""
    counts = np.zeros(CMS_D * CMS_W, np.int64)
    key = (
        sketch_tbl["row"].to_numpy(zero_copy_only=False) * CMS_W
        + sketch_tbl["col"].to_numpy(zero_copy_only=False)
    )
    counts[key] = sketch_tbl["n"].to_numpy(zero_copy_only=False)
    h = ids.astype(np.int64).view(np.uint64)
    h1 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))
    h2 = fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), _BLOOM_MULT2)) + np.uint64(3))
    est = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
    for i in range(CMS_D):
        col = ((h1 + np.uint64(i) * h2) % np.uint64(CMS_W)).astype(np.int64)
        est = np.minimum(est, counts[i * CMS_W + col])
    return est


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------


def mg_summary(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of exact (token, count) pairs to <= k
    counters: subtract the (k+1)-th largest count from every counter and
    drop the non-positives. MG guarantee: the total subtracted per batch
    is <= N_batch/(k+1), so any token with batch count above that
    survives with a positive (under-estimated) counter."""
    if len(tokens) <= k:
        return tokens, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    kept = counts - kth
    m = kept > 0
    return tokens[m], kept[m]


def heavy_hitters(
    ds: ray.data.Dataset,
    k: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide heavy tokens: every token with total count > N/k
    (N = total token occurrences), EXACTLY — via the classic two-pass
    scheme that completes the sketch family (HLL cardinality, Bloom
    membership, histogram quantiles, and now frequency):

    1. per-batch exact counts reduced to a <= k-counter Misra-Gries
       summary (`mg_summary`); summed-merge via one bounded groupby
       (<= k x blocks rows cross the wire — the mergeable-summaries
       union, error still <= N/(k+1), so NO FALSE NEGATIVES against the
       N/k threshold; a k-capped tree merge is the extreme-scale
       variant);
    2. the candidate set broadcasts (sorted array) and a second pass
       recounts candidates exactly; the N/k filter then removes MG's
       false positives.

    Output (token, n_occ) is exact, so the DuckDB oracle is a plain
    GROUP BY ... HAVING count(*) * k > N."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import scaled_partitions
    from lamapi_ray.stages.textstats import _tokens

    def mg_partial(batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _tokens(batch, text_col)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        toks = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        toks, counts = mg_summary(toks, counts, k)
        return pa.table(
            {
                "token": pa.array(toks.tolist(), pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def n_partial(batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _tokens(batch, text_col)
        return pa.table({"n": pa.array([len(flat)], pa.int64())})

    total_n = sum(
        b["n"].to_numpy(zero_copy_only=False).sum()
        for b in ds.map_batches(
            n_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )

    merged = (
        ds.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token", num_partitions=scaled_partitions(1.0, 32))
        .aggregate(Sum("c"))
    )
    cand_batches = list(
        merged.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    if cand_batches:
        cands = pa.concat_tables(cand_batches)["token"].to_numpy(
            zero_copy_only=False
        ).astype(object)
    else:
        cands = np.zeros(0, dtype=object)
    cands = np.sort(cands.astype(str))
    cand_ref = ray.put(cands)

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        _, flat, _, _ = _tokens(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False).astype(str)
        idx = np.searchsorted(cand, toks)
        hit = (idx < len(cand)) & (cand[np.minimum(idx, len(cand) - 1)] == toks)
        counts = np.bincount(idx[hit], minlength=len(cand)).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "token": pa.array(cand[nz].tolist(), pa.string()),
                "c": pa.array(counts[nz], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token", num_partitions=scaled_partitions(1.0, 32))
        .aggregate(Sum("c"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch["sum(c)"].cast(pa.int64())
        keep = pc.greater(pc.multiply(c, k), total_n)
        return pa.table(
            {
                "token": pc.filter(batch["token"], keep),
                "n_occ": pc.filter(c, keep),
            }
        )

    return exact.map_batches(finish, batch_format="pyarrow")


KMV_K = 32                   # sample size (k minimum hash values)


def kmv_partial(ids: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """k smallest DISTINCT key hashes of one batch, sorted ascending.

    The per-batch combiner of the KMV (bottom-k) distinct sketch: the
    house mod-(2^61-1) multiplicative hash is a bijection on [0, p), so
    distinct hashes == distinct keys and the k-th smallest hash is an
    order statistic of a uniform sample — estimate (k-1)·p / h_k."""
    h = np.unique(_hash_ids(ids))
    return h[:k]


def kmv_sketch(ds: ray.data.Dataset, id_col: str, k: int = KMV_K) -> pa.Table:
    """K-minimum-values distinct sketch of ``id_col`` → (sample_rank, hv,
    est_distinct).

    The third leg of the cardinality family (HLL registers, Bloom
    membership): every batch contributes ONLY its k smallest distinct
    hashes (≤ k rows/batch regardless of batch size), the partials merge
    with a set-union + bottom-k — associative and commutative, so the
    fold is one tiny exchange and nothing key-stream-sized crosses the
    wire. Unlike HLL the sketch doubles as a uniform SAMPLE of the
    distinct keys (useful for downstream distinct-key profiling).

    Determinism: hashes are HUGEINT-reproducible in SQL (same chain as
    ``hll_registers``); the estimate (k-1)·p / h_k is one double divide
    of exactly-representable operands, printf-rounded on both sides. If
    the stream holds fewer than k distinct keys the sketch IS the
    distinct set and the estimate is exact by construction."""
    from lamapi_ray.functions.text import round_ref

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"hv": pa.array(kmv_partial(ids, k).view(np.int64), pa.int64())}
        )

    parts = [
        b["hv"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    merged = np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
    top = merged[:k].astype(np.int64)
    if len(top) == 0:
        est = 0.0
    elif len(top) < k:
        est = float(len(top))
    else:
        est = (k - 1.0) * float(MOD61) / float(np.uint64(top[-1]))
    return pa.table(
        {
            "sample_rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
            "hv": pa.array(top, pa.int64()),
            "est_distinct": pa.array(
                np.full(len(top), round_ref(est, 4)), pa.float64()
            ),
        }
    )


def kmv_set_ops(
    ds_a: ray.data.Dataset, ds_b: ray.data.Dataset, id_col: str, k: int = KMV_K
) -> pa.Table:
    """KMV sketch SET ALGEBRA over two key streams — the theta-sketch
    trick: build the bottom-k union sketch, count its members present in
    each side, and estimates for |A∪B|, Jaccard and |A∩B| follow without
    ever shuffling either key stream.

    θ = h_k of the UNION sketch; members below θ are a uniform sample of
    A∪B, so jaccard_est = |{s ≤ θ} ∩ A ∩ B| / |sketch| and
    inter_est = jaccard_est · union_est. Side membership of each sketch
    member is exact (searchsorted into each side's OWN bottom-k sketch:
    every union-sketch member h ≤ θ ≤ that side's h_k, so membership of
    h in the side's sketch ⟺ membership of the key in the side — no
    second corpus pass). Output is ONE row of estimates plus the exact
    integer sufficient statistics, printf-parity doubles."""
    from lamapi_ray.functions.text import round_ref

    def side(ds) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {"hv": pa.array(kmv_partial(ids, k).view(np.int64), pa.int64())}
            )

        parts = [
            b["hv"].to_numpy(zero_copy_only=False)
            for b in ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=65536, batch_format="pyarrow")
        ]
        merged = (
            np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
        )
        return merged[:k].view(np.uint64)

    sa, sb = side(ds_a), side(ds_b)
    union = np.unique(np.concatenate([sa, sb]))[:k]

    def est_distinct(sk: np.ndarray) -> float:
        if len(sk) == 0:
            return 0.0
        if len(sk) < k:
            return float(len(sk))
        return (k - 1.0) * float(MOD61) / float(sk[-1])

    def member(sk: np.ndarray, h: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sk, h)
        return (pos < len(sk)) & (sk[np.minimum(pos, max(len(sk) - 1, 0))] == h)

    in_a = member(sa, union)
    in_b = member(sb, union)
    n_union_sketch = len(union)
    n_both = int(np.sum(in_a & in_b))
    union_est = est_distinct(union)
    jac = n_both / n_union_sketch if n_union_sketch else 0.0
    return pa.table(
        {
            "sketch_size": pa.array([n_union_sketch], pa.int64()),
            "n_both": pa.array([n_both], pa.int64()),
            "union_est": pa.array([round_ref(union_est, 4)], pa.float64()),
            "jaccard_est": pa.array([round_ref(jac, 4)], pa.float64()),
            "inter_est": pa.array([round_ref(jac * union_est, 4)], pa.float64()),
        }
    )
