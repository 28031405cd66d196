"""Engine-side pipelines for the training-data + lookup-parity operators.

Each function takes ``sf_dir`` (plus precomputed KG context where needed)
and returns a pyarrow Table. These are thin compositions over the stage
modules; the oracle SQL lives in ``__ray_entry__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from lamapi_ray.functions.literals import XML_DATATYPES, classify_array
from lamapi_ray.functions.text import round_ref
from lamapi_ray.stages.annsearch import cosine_topk, ivf_topk, lsh_topk
from lamapi_ray.stages.dedup import (
    exact_dedup,
    minhash_clusters,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from lamapi_ray.stages.join import bucketed_hash_join
from lamapi_ray.stages.multimodal import attach_payload, decode_payloads
from lamapi_ray.stages.textstats import (
    fingerprint_batch,
    lang_id_batch,
    quality_batch,
    token_stats_batch,
)


def _scaled(per_cpu: float, floor_: int) -> int:
    from lamapi_ray.stages.dedup import scaled_partitions

    return scaled_partitions(per_cpu, floor_)


def _collect(ds) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    if not batches:
        return pa.Table.from_pydict({}, schema=pa.schema([]))
    return pa.concat_tables(batches)


def _docs(sf_dir: str, cols=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(cols))


def _dup_corpus(sf_dir: str, modify: bool) -> ray.data.Dataset:
    """documents ∪ shifted copies of every 5th doc (optionally near-modified).

    Deterministic duplicate injection (the raw corpus has no duplicates):
    copy doc_id → doc_id + 1_000_000; ``modify`` appends ' xx' to the copy
    (near-dup for MinHash / Jaccard; exact dup otherwise).
    """

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = ids % 5 == 0
        extra_ids = ids[mask] + 1_000_000
        texts = np.asarray(batch["text"].to_pylist(), dtype=object)
        extra_texts = texts[mask]
        if modify:
            extra_texts = np.array([t + " xx" for t in extra_texts], dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids, extra_ids]).astype(np.int64), pa.int64()
                ),
                "text": pa.array(list(texts) + list(extra_texts), pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)


# --- dedup family ---------------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    out = _collect(exact_dedup(_dup_corpus(sf_dir, modify=False), "doc_id", "text"))
    return out.sort_by("doc_id")


def dedup_minhash(sf_dir: str) -> pa.Table:
    return minhash_clusters(_dup_corpus(sf_dir, modify=True), "doc_id", "text")


def dedup_minhash_exact(sf_dir: str) -> pa.Table:
    """MinHash-LSH at threshold 64/64 ≡ exact signature equality — the
    SQL-checkable sub-case: clusters coincide with grouping by the distinct
    token-3-shingle SET (order-independent), so DuckDB can reproduce it
    relationally and the full distributed LSH dataflow gets a hash-checked
    oracle."""
    return minhash_clusters(
        _dup_corpus(sf_dir, modify=False), "doc_id", "text", threshold_rows=64
    )


def dedup_simhash(sf_dir: str) -> pa.Table:
    return _collect(simhash_fingerprints(_docs(sf_dir), "doc_id", "text"))


def ngram_jaccard_dup(sf_dir: str) -> pa.Table:
    return ngram_jaccard_pairs(_dup_corpus(sf_dir, modify=True), "doc_id", "text", threshold=0.5)


# --- text stats -----------------------------------------------------------


def lang_id(sf_dir: str) -> pa.Table:
    return _collect(
        _docs(sf_dir, ("doc_id", "lang", "text")).map_batches(
            lang_id_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def quality_score(sf_dir: str) -> pa.Table:
    return _collect(
        _docs(sf_dir).map_batches(
            quality_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def token_stats(sf_dir: str) -> pa.Table:
    return _collect(
        _docs(sf_dir).map_batches(
            token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def fingerprint(sf_dir: str) -> pa.Table:
    return _collect(
        _docs(sf_dir).map_batches(
            fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    )


# --- similarity search ----------------------------------------------------


def _queries_matrix(sf_dir: str, n: int = 8):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    flt = tbl.filter(pc.less(tbl["vec_id"], n)).sort_by("vec_id")
    from lamapi_ray.stages.annsearch import _emb_matrix, _ids_array

    q = _emb_matrix(flt, "embedding")
    qids = _ids_array(flt, "vec_id")
    return q, qids


def _corpus_ds(sf_dir: str, n: int = 8) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ann_cosine(sf_dir: str) -> pa.Table:
    q, qids = _queries_matrix(sf_dir)
    return cosine_topk(_corpus_ds(sf_dir), q, qids, k=10)


def ann_lsh(sf_dir: str) -> pa.Table:
    q, qids = _queries_matrix(sf_dir)
    return lsh_topk(_corpus_ds(sf_dir), q, qids, k=10)


def ann_ivf(sf_dir: str, n_centroids: int = 16, n_probe: int = 4) -> pa.Table:
    """IVF ANN over the embeddings corpus; centroids = the first
    ``n_centroids`` corpus vectors (deterministic, so the DuckDB oracle
    reproduces assignment + probing exactly)."""
    import pyarrow.parquet as pq

    q, qids = _queries_matrix(sf_dir)
    n_q = 8
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent_tbl = tbl.filter(
        pc.and_(
            pc.greater_equal(tbl["vec_id"], n_q),
            pc.less(tbl["vec_id"], n_q + n_centroids),
        )
    ).sort_by("vec_id")
    from lamapi_ray.stages.annsearch import _emb_matrix

    centroids = _emb_matrix(cent_tbl, "embedding")
    return ivf_topk(
        _corpus_ds(sf_dir), q, qids, centroids, k=10, n_probe=n_probe
    )


# --- windowed aggregate ---------------------------------------------------


def event_percentiles(sf_dir: str) -> pa.Table:
    """Per-event-type order statistics (nearest-rank p50/p95/p99 of
    ``value``) — exact selection, NO float interpolation, so engine and
    SQL pick the identical element (percentile = the ceil(q·n)-th order
    statistic). Distributed shape: ``groupby(event_type).map_groups`` with
    a vectorized numpy sort per group; event-type cardinality is tiny so
    groups co-locate cheaply. (At 100 TB with huge groups the same
    nearest-rank contract is served by a distributed selection — sort +
    global index probe — without changing results; documented trade.)"""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    QS = (0.50, 0.95, 0.99)

    def group_stats(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_events": pa.array([], pa.int64()),
                 "p50": pa.array([], pa.float64()),
                 "p95": pa.array([], pa.float64()),
                 "p99": pa.array([], pa.float64())}
            )
        vals = np.sort(
            group["value"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        import math

        picks = [float(vals[min(n - 1, math.ceil(q * n) - 1)]) for q in QS]
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()], pa.string()),
                "n_events": pa.array([n], pa.int64()),
                "p50": pa.array([picks[0]], pa.float64()),
                "p95": pa.array([picks[1]], pa.float64()),
                "p99": pa.array([picks[2]], pa.float64()),
            }
        )

    return _collect(
        ev.groupby("event_type").map_groups(group_stats, batch_format="pyarrow")
    ).sort_by("event_type")


def sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization of the event stream: per user, events
    sorted by (ts, event_id); a gap > 30 min starts a new session; one
    output row per session with count and bounds. The canonical
    "streaming window" re-expressed batch-native: COARSE user-hash
    partitions co-locate each user's history (many users per map_groups
    call — never one Python call per user), and the kernel is one
    lexsort + segment-aware diff/cumsum over the whole partition (user
    boundaries force a session break). Session bounds/counts are
    independent of tie order at equal ts (gap 0), so results are
    deterministic."""
    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    GAP_US = 30 * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "session_id": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "start_ts": pa.array([], pa.timestamp("us")),
             "end_ts": pa.array([], pa.timestamp("us"))}
        )
        if n == 0:
            return empty
        ts = group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        brk = new_user | np.concatenate([[True], (ts[1:] - ts[:-1]) > GAP_US])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([starts, [n]]))
        ends = starts + counts - 1
        # per-user 1-based session ids: global cumsum minus the user's base
        sid_global = np.cumsum(brk)
        user_starts = np.flatnonzero(new_user)
        # base for each session = sid_global just before its user's first row
        sess_user_first = np.searchsorted(user_starts, starts, side="right") - 1
        base = (sid_global[user_starts] - 1)[sess_user_first]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(
                    (sid_global[starts] - base).astype(np.int64), pa.int64()
                ),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "start_ts": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
                "end_ts": pa.array(ts[ends], pa.int64()).cast(pa.timestamp("us")),
            }
        )

    return _collect(
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(sessions, batch_format="pyarrow")
    ).sort_by([("user_id", "ascending"), ("session_id", "ascending")])


def window_events(sf_dir: str) -> pa.Table:
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    HOUR_US = 3600 * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts_us // HOUR_US) * HOUR_US
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_us": pa.array(win, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    # finish streams through Arrow batches (the house `_collect` path) —
    # group count = event_types × hours grows with the corpus time span, so
    # no driver-side pandas materialization; at 100 TB swap `_collect` for a
    # `write_parquet` of the same Dataset.
    agg = _collect(
        ev.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_us"], num_partitions=_scaled(0.5, 16))
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="sum_value_cents"))
    )
    return pa.table(
        {
            "event_type": agg["event_type"].cast(pa.string()),
            "window_start": agg["window_us"].cast(pa.int64()).cast(pa.timestamp("us")),
            "n_events": agg["n_events"].cast(pa.int64()),
            "sum_value_cents": agg["sum_value_cents"].cast(pa.int64()),
        }
    )


# --- deterministic dataset split (training-data op) -----------------------


def dataset_split(sf_dir: str) -> pa.Table:
    """Deterministic train/val/test assignment by a stable content-free
    hash of the document id — reproducible across runs and engines (the
    mod-(2^61-1) multiplicative hash from functions/inthash, reproduced in
    HUGEINT SQL by the oracle): bucket = h % 100 → <80 train, <90 val,
    else test. A pure vectorized map stage; no shuffle."""
    from lamapi_ray.functions.inthash import MOD61, fold_mod61, mulmod61

    MULT = np.uint64(0x9E3779B97F4A7C15 % MOD61)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        h = fold_mod61(mulmod61(fold_mod61(ids), np.full(len(ids), MULT)) + np.uint64(1))
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < 80, "train", np.where(bucket < 90, "val", "test"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return _collect(
        _docs(sf_dir, ("doc_id",)).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def token_budget(sf_dir: str) -> pa.Table:
    """Training-mix token accounting — the budget report a data team
    publishes before a run: per (source, split) the document count,
    whitespace-token count and char count, with split assigned by the
    SAME content-free mod-(2^61-1) hash rule as :func:`dataset_split`
    (bucket <80 train, <90 val, else test) so the report matches what
    the split op will actually ship. Output: (source, split, n_docs,
    n_tokens, n_chars).

    Dataflow: one streamed map pass emits (source, split) partial sums
    per batch (≤ sources×3 rows each — never per-doc), one tiny
    groupby-sum folds them. Token rule = whitespace-separated non-empty
    runs, stated identically by the oracle."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.inthash import MOD61, fold_mod61, mulmod61

    MULT = np.uint64(0x9E3779B97F4A7C15 % MOD61)

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        h = fold_mod61(
            mulmod61(fold_mod61(ids), np.full(len(ids), MULT)) + np.uint64(1)
        )
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < 80, 0, np.where(bucket < 90, 1, 2))
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # whitespace tokens: count of non-empty split parts, vectorized
        ntok = pc.list_value_length(
            pc.split_pattern_regex(text, r"\s+")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # split_pattern_regex keeps empty edge parts when text starts/ends
        # with whitespace — subtract them exactly
        lead = pc.match_substring_regex(text, r"^\s").to_numpy(
            zero_copy_only=False
        )
        trail = pc.match_substring_regex(text, r"\s$").to_numpy(
            zero_copy_only=False
        )
        empty = pc.equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
        ntok = ntok - lead.astype(np.int64) - trail.astype(np.int64)
        ntok[empty] = 0
        nch = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        scodes, sinv = np.unique(
            np.asarray(src.to_numpy(zero_copy_only=False), dtype=object),
            return_inverse=True,
        )
        key = sinv * 3 + split
        nk = len(scodes) * 3
        return pa.table(
            {
                "source": pa.array(
                    np.repeat(scodes, 3).tolist(), pa.string()
                ),
                "split": pa.array(
                    np.array(["train", "val", "test"] * len(scodes)),
                    pa.string(),
                ),
                "n_docs": pa.array(
                    np.bincount(key, minlength=nk).astype(np.int64), pa.int64()
                ),
                "n_tokens": pa.array(
                    np.bincount(key, weights=ntok, minlength=nk).astype(np.int64),
                    pa.int64(),
                ),
                "n_chars": pa.array(
                    np.bincount(key, weights=nch, minlength=nk).astype(np.int64),
                    pa.int64(),
                ),
            }
        ).filter(
            pa.array(np.bincount(key, minlength=nk) > 0)
        )

    return _collect(
        _docs(sf_dir, ("doc_id", "text", "source"))
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "split"], num_partitions=1)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
    ).sort_by([("source", "ascending"), ("split", "ascending")])


# --- composed curation pipeline (training-data flow end to end) -----------


def decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark n-gram decontamination (the GPT-3 appendix-C / PaLM rule):
    every 50th document plays the held-out benchmark; corpus docs sharing
    any word-4-gram with it are flagged. Benchmark 4-gram hash set is
    broadcast (``ray.put``); the corpus streams through one map_batches.
    See :func:`lamapi_ray.stages.curation.decontaminate`."""
    import pyarrow.parquet as pq

    from lamapi_ray.stages import curation

    full = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    did = full["doc_id"].to_numpy()
    bench = full.filter(pa.array(did % 50 == 0))

    def corp_only(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(d % 50 != 0))

    corpus = _docs(sf_dir, ("doc_id", "text")).map_batches(
        corp_only, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(curation.decontaminate(corpus, bench, k=4)).sort_by("doc_id")


def repetition_stats(sf_dir: str) -> pa.Table:
    """Gopher-style repetition quality signals per document (top-2-gram
    fraction, duplicate-3-gram fraction, threshold flag). One streamed
    map_batches; see :func:`lamapi_ray.stages.curation.repetition_stats`."""
    from lamapi_ray.stages import curation

    return _collect(
        curation.repetition_stats(
            _docs(sf_dir), top2_threshold=0.08, dup3_threshold=0.02
        )
    ).sort_by("doc_id")


def rebalance_sources(sf_dir: str) -> pa.Table:
    """Deterministic source-mix rebalancing: odd-numbered sources get
    twice the target share of even ones (weights 2 vs 1); keep test is an
    all-integer hash threshold. Two-pass: tiny per-source count groupby,
    then a streamed filter. See
    :func:`lamapi_ray.stages.curation.rebalance_sources`."""
    from lamapi_ray.stages import curation

    # weight rule: source "src<i>" → 2 if i is odd else 1 (covers any
    # source cardinality; unknown names default to weight 1 in the stage)
    weights = {f"src{i}": (2 if i % 2 else 1) for i in range(1000)}
    return _collect(
        curation.rebalance_sources(_docs(sf_dir, ("doc_id", "source")), weights)
    ).sort_by("doc_id")


def stratified_sample(sf_dir: str, k: int = 20) -> pa.Table:
    """Deterministic fixed-size stratified sample: per event_type, the k
    events with the SMALLEST house hash of event_id (bottom-k sampling —
    the mergeable uniform-sample primitive: local bottom-k per batch is a
    combiner, so the ONE grouped exchange ships ≤ k·strata·blocks rows
    regardless of corpus size, and re-running on any superset keeps the
    sample stable for the surviving rows). sample_rank = position by
    (hash, event_id) within the stratum. The mod-(2^61-1) hash is
    HUGEINT-reproducible, so the sample is exactly oracle-checkable."""
    from lamapi_ray.stages.sketch import _hash_ids

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id", "value"],
    )

    def local_bottomk(batch: pa.Table, final: bool = False) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash_ids(eid).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, h, et))
        et_s = et[o]
        new = np.concatenate([[True], et_s[1:] != et_s[:-1]])
        run_start = np.maximum.accumulate(np.where(new, np.arange(len(et_s)), 0))
        pos = np.arange(len(et_s)) - run_start
        keep = pos < k
        sel = o[keep]
        cols = {
            "event_type": pa.array(et[sel]),
            "event_id": pa.array(eid[sel]),
            "user_id": batch["user_id"].take(pa.array(sel)),
            "value": batch["value"].take(pa.array(sel)),
        }
        if final:
            cols["sample_rank"] = pa.array(pos[keep] + 1, pa.int64())
        return pa.table(cols)

    return _collect(
        ev.map_batches(local_bottomk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(lambda g: local_bottomk(g, final=True), batch_format="pyarrow")
    ).sort_by([("event_type", "ascending"), ("sample_rank", "ascending")])


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """Distributed multi-join aggregate over the three largest tables —
    the canonical relational dataflow at scale: lineitem is pre-aggregated
    map-side per order (revenue in integer cents: ``floor(ext·(1−disc)·100)``
    — identical double arithmetic both sides, then exact int64 sums),
    orders picks up the customer nation via a BROADCAST join (dimension
    side `ray.put` once), the two order-keyed sides meet in ONE bucketed
    hash-join exchange, and per-nation partial sums combine map-side before
    a 25-row final groupby. Nothing row-level crosses more than one
    all-to-all."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.join import bucketed_hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor((ext * (1.0 - disc)) * 100.0).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        csum = np.zeros(len(uniq), np.int64)
        np.add.at(csum, inv, cents)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(uniq, pa.int64()),
                "cents": pa.array(csum, pa.int64()),
                "items": pa.array(cnt, pa.int64()),
            }
        )

    li_agg = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    # dimension chain: customer (custkey → nationkey) broadcast into orders
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    o = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[o], cn[o]))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def add_nation(batch: pa.Table) -> pa.Table:
        keys, nk = ray.get(cust_ref)
        custk = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(keys, custk), max(len(keys) - 1, 0))
        if len(keys) == 0 or not (keys[pos] == custk).all():
            missing = custk[keys[pos] != custk][:3] if len(keys) else custk[:3]
            raise ValueError(
                f"o_custkey not in customer dimension (e.g. {missing.tolist()})"
            )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "nationkey": pa.array(nk[pos], pa.int64()),
            }
        )

    ords = orders.map_batches(add_nation, batch_format="pyarrow", zero_copy_batch=True)

    joined = bucketed_hash_join(
        li_agg, ords, on="o_orderkey", num_buckets=_scaled(1.0, 32)
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        nk = batch["nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        items = batch["items"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(nk, return_inverse=True)
        cs = np.zeros(len(uniq), np.int64)
        its = np.zeros(len(uniq), np.int64)
        np.add.at(cs, inv, cents)
        np.add.at(its, inv, items)
        return pa.table(
            {
                "nationkey": pa.array(uniq, pa.int64()),
                "cents": pa.array(cs, pa.int64()),
                "items": pa.array(its, pa.int64()),
            }
        )

    per_nation = (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("cents"), Sum("items"))
    )

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    nn = nat["n_name"].to_pylist()
    names = {int(k): v for k, v in zip(nk, nn)}

    out = _collect(per_nation)
    keys = out["nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "n_name": pa.array([names[int(k)] for k in keys], pa.string()),
            "n_items": out["sum(items)"].cast(pa.int64()),
            "revenue_cents": out["sum(cents)"].cast(pa.int64()),
        }
    ).sort_by("n_name")


def _semi_anti(sf_dir: str, how: str) -> pa.Table:
    """customer rows with(out) an URGENT order — one bucketed semi/anti
    exchange; the orders side is row-filtered at the read and ships only
    distinct custkeys (map-side prune).
    See :func:`lamapi_ray.stages.join.bucketed_semi_anti_join`."""
    from lamapi_ray.stages.join import bucketed_semi_anti_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def urgent_keys(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["o_orderpriority"], "1-URGENT")
        return pa.table({"c_custkey": b.filter(mask)["o_custkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(urgent_keys, batch_format="pyarrow", zero_copy_batch=True)
    out = _collect(
        bucketed_semi_anti_join(
            cust, orders, on="c_custkey", how=how, num_buckets=_scaled(0.5, 16)
        )
    )
    if out.num_rows == 0 and not out.column_names:
        out = pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string())}
        )
    return out.sort_by("c_custkey")


def customers_without_orders(sf_dir: str) -> pa.Table:
    """Distributed ANTI join (the TPC-H "customers who never ordered")."""
    return _semi_anti(sf_dir, "anti")


def customers_with_orders(sf_dir: str) -> pa.Table:
    """Distributed SEMI join (left rows having ≥1 key match)."""
    return _semi_anti(sf_dir, "semi")


def typo_pairs(sf_dir: str) -> pa.Table:
    """String similarity self-join: all distinct page-token pairs within
    edit distance 1, via SymSpell deletion-variant blocking (every
    qualifying pair shares a ≤1-delete variant, so one variant-keyed
    exchange co-locates it) + exact DP verify + one grouped pair-distinct.
    Vocabulary = tokens of the synthetic WEB PAGES (part names + numeric
    tokens give a dense near-pair set; the raw documents vocabulary has
    none). See :mod:`lamapi_ray.stages.stringjoin`."""
    from lamapi_ray import synth
    from lamapi_ray.stages.extract import extracted_pages
    from lamapi_ray.stages.stringjoin import similarity_self_join

    def toks(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(t.cast(pa.string()), " "))
        vals = np.unique(np.asarray(flat.to_pylist(), dtype=object))
        return pa.table({"t": pa.array(list(vals), pa.string())})

    vocab = (
        extracted_pages(synth.pages_dataset(sf_dir))
        .map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("t", num_partitions=_scaled(0.25, 8))
        .count()
        .map_batches(
            lambda b: pa.table({"t": b["t"]}), batch_format="pyarrow"
        )
    )
    return _collect(
        similarity_self_join(vocab, "t", max_dist=1, min_len=3)
    ).sort_by([("a", "ascending"), ("b", "ascending")])


def events_rollup(sf_dir: str) -> pa.Table:
    """OLAP ROLLUP (grouping sets): event counts + value cents at
    (day, type), (day), and grand-total levels in ONE pass — each batch
    emits its partials for all three levels map-side (3× a days×types-
    bounded output), one groupby-sum merges. NULL key = aggregated-out
    level, SQL ROLLUP semantics."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    DAY_US = 86_400_000_000

    TYPES = np.array(sorted(EVENT_TYPES))

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        val = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.rint(val * 100).astype(np.int64)  # printf('%.0f') parity
        day_idx = ts // DAY_US
        tid = np.minimum(np.searchsorted(TYPES, et), len(TYPES) - 1)
        if not (TYPES[tid] == et).all():
            bad = et[TYPES[tid] != et][:3]
            raise ValueError(f"unknown event_type(s) {bad.tolist()}")
        key2 = day_idx * 8 + tid
        u2, inv2 = np.unique(key2, return_inverse=True)
        n2 = np.bincount(inv2).astype(np.int64)
        c2 = np.zeros(len(u2), np.int64)
        np.add.at(c2, inv2, cents)
        d2 = (u2 // 8) * DAY_US
        t2 = TYPES[u2 % 8]
        # level 1 (per day) and level 0 (grand total) fold from the level-2
        # partials (exact ints); sentinels (-1 day, "" type) stand in for
        # the rolled-up keys through the exchange — converted to NULL after
        ud, dinv = np.unique(d2, return_inverse=True)
        n1 = np.zeros(len(ud), np.int64)
        c1 = np.zeros(len(ud), np.int64)
        np.add.at(n1, dinv, n2)
        np.add.at(c1, dinv, c2)
        day_col = np.concatenate([d2, ud, [-1]])
        type_col = list(t2) + [""] * len(ud) + [""]
        n_col = np.concatenate([n2, n1, [n1.sum()]])
        c_col = np.concatenate([c2, c1, [c1.sum()]])
        return pa.table(
            {
                "day": pa.array(day_col.astype(np.int64), pa.int64()),
                "event_type": pa.array(type_col, pa.string()),
                "n": pa.array(n_col.astype(np.int64), pa.int64()),
                "cents": pa.array(c_col.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"], num_partitions=_scaled(0.25, 8))
        .aggregate(Sum("n"), Sum("cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        day = batch["day"].cast(pa.int64())
        day = pc.if_else(pc.equal(day, -1), pa.scalar(None, pa.int64()), day)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et = pc.if_else(pc.equal(et, ""), pa.scalar(None, pa.string()), et)
        return pa.table(
            {
                "day": day.cast(pa.timestamp("us")),
                "event_type": et,
                "n_events": batch["sum(n)"].cast(pa.int64()),
                "sum_cents": batch["sum(cents)"].cast(pa.int64()),
            }
        )

    return _collect(agg.map_batches(finish, batch_format="pyarrow")).sort_by(
        [("day", "ascending"), ("event_type", "ascending")]
    )


def event_transitions(sf_dir: str) -> pa.Table:
    """Sequence analytics: the next-event transition matrix — counts of
    (event_type → next event_type) per user in (ts, event_id) order.
    ``groupby(user_id)`` co-locates each user's history; the per-group
    kernel is one lexsort + shifted compare (no per-event Python); the
    |types|²-bounded pair counts merge in one tiny groupby-sum."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def transitions(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table(
                {"from_type": pa.array([], pa.string()),
                 "to_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        ts = group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts))
        seq = et[order]
        pairs = np.char.add(
            np.char.add(seq[:-1].astype("U16"), "|"), seq[1:].astype("U16")
        )
        up, cnt = np.unique(pairs, return_counts=True)
        fr, to = zip(*(p.split("|") for p in up))
        return pa.table(
            {
                "from_type": pa.array(list(fr), pa.string()),
                "to_type": pa.array(list(to), pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ev.groupby("user_id", num_partitions=_scaled(0.5, 16))
        .map_groups(transitions, batch_format="pyarrow")
        .groupby(["from_type", "to_type"], num_partitions=4)
        .aggregate(Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_type": batch["from_type"],
                "to_type": batch["to_type"],
                "n": batch["sum(n)"].cast(pa.int64()),
            }
        )

    return _collect(agg.map_batches(finish, batch_format="pyarrow")).sort_by(
        [("from_type", "ascending"), ("to_type", "ascending")]
    )


def term_pmi(sf_dir: str) -> pa.Table:
    """Term association mining: co-occurrence counts + integer PMI
    surrogate over the top-30 df vocabulary — per-batch docs×V presence
    matrix folded to a V×V block by one integer MᵀM, blocks merged by one
    groupby-sum. See :mod:`lamapi_ray.stages.cooccur`."""
    from lamapi_ray.stages.cooccur import term_pmi as run

    return run(_docs(sf_dir), top_v=30, min_both=2)


def knn_neighbors(sf_dir: str) -> pa.Table:
    """Exact kNN self-join (top-3 cosine neighbors per vector): chunk-pair
    blocked all-pairs with per-bucket local top-k (+boundary ties) and a
    grouped per-id final merge.
    See :func:`lamapi_ray.stages.annsearch.knn_join`."""
    from lamapi_ray.stages.annsearch import knn_join

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return knn_join(emb, k=3)


def label_centroids(sf_dir: str) -> pa.Table:
    """Grouped VECTOR aggregate: per-label mean embedding in fixed point
    (quantize ×10⁶ with printf parity, element-wise truncating integer
    division — matches SQL ``//`` exactly, so the centroid table is
    hash-checkable). Per-batch partial (label, dim, Σ, n) rows — the
    exchange is |labels|·d-bounded, never corpus-sized — then ONE
    groupby-sum. The distributed embedding-statistics primitive under
    class prototypes / domain centroids. Reuses the kmeans quantizer
    (:mod:`lamapi_ray.stages.kmeans`)."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.kmeans import Q_SCALE, _int_matrix

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        V = _int_matrix(batch, "embedding")
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        n, d = V.shape
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), d), np.int64)
        np.add.at(sums, inv, V)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(ulab)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "c": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"], num_partitions=_scaled(0.25, 8))
        .aggregate(Sum("s"), Sum("c"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        # truncating integer division (SQL `//` semantics)
        cq = np.where(s >= 0, s // c, -((-s) // c))
        return pa.table(
            {
                "label": batch["label"].cast(pa.int64()),
                "dim": batch["dim"].cast(pa.int64()),
                "centroid_q": pa.array(cq, pa.int64()),
                "n_vecs": pa.array(c, pa.int64()),
            }
        )

    return _collect(agg.map_batches(finish, batch_format="pyarrow")).sort_by(
        [("label", "ascending"), ("dim", "ascending")]
    )


PROFILE_COLS = ("l_orderkey", "l_partkey", "l_suppkey")


def table_profile(sf_dir: str) -> pa.Table:
    """Data-quality profile (the Deequ-style audit step) of lineitem's key
    columns: per column n_rows, n_nulls, min, max, exact n_distinct.
    Two small dataflows: (1) per-batch scalar partials (one row per
    column per block) merged by a tiny groupby; (2) per-batch distinct
    (col, value) keys → ONE bucket exchange + per-bucket numpy distinct.
    Shuffle volume is distinct-value-bounded."""
    from ray.data.aggregate import Max, Min, Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=list(PROFILE_COLS)
    )

    def scalar_partial(batch: pa.Table) -> pa.Table:
        cols, rows, nulls, mins, maxs = [], [], [], [], []
        for c in PROFILE_COLS:
            col = batch[c]
            nn = col.null_count
            # drop nulls arrow-side BEFORE the int64 cast — a nullable
            # column's nulls surface as NaN in a float ndarray and would
            # cast to garbage ints, corrupting min/max
            raw = (col.drop_null() if nn else col).to_numpy(
                zero_copy_only=False
            )
            if raw.dtype.kind == "f":
                raw = raw[~np.isnan(raw)]
            ok = raw.astype(np.int64)
            cols.append(c)
            rows.append(len(col))
            nulls.append(nn)
            mins.append(int(ok.min()) if len(ok) else np.iinfo(np.int64).max)
            maxs.append(int(ok.max()) if len(ok) else np.iinfo(np.int64).min)
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "rows": pa.array(rows, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "mn": pa.array(mins, pa.int64()),
                "mx": pa.array(maxs, pa.int64()),
            }
        )

    scal = _collect(
        li.map_batches(scalar_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(Sum("rows"), Sum("nulls"), Min("mn"), Max("mx"))
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        # pack (column, value) into ONE int64 key (value·4 + col_id): a
        # single-int groupby shuffles and sorts ~5× cheaper than a
        # (string, int64) composite key — measured 8.3 s → ~1.5 s at sf0.1
        outs = []
        for cid, c in enumerate(PROFILE_COLS):
            col = batch[c]
            raw = (col.drop_null() if col.null_count else col).to_numpy(
                zero_copy_only=False
            )
            if raw.dtype.kind == "f":
                raw = raw[~np.isnan(raw)]
            v = np.unique(raw.astype(np.int64))
            outs.append(v * 4 + cid)
        k = np.concatenate(outs)
        return pa.table({"k": pa.array(k, pa.int64())})

    # distinct counting via ONE bucket exchange + per-bucket numpy unique:
    # a key lands in exactly one bucket, so per-bucket distinct counts sum
    # exactly — and the per-group kernel is a single np.unique instead of
    # Ray's generic sort-aggregate (measured 6.8 s → ~1 s for 1.1M keys)
    P = _scaled(1.0, 32)

    def bucket_tag(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        mix = (k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.append_column(
            "__b", pa.array((mix % np.uint64(P)).astype(np.int64), pa.int64())
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"cid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        k = np.unique(group["k"].to_numpy(zero_copy_only=False).astype(np.int64))
        cid, n = np.unique(k % 4, return_counts=True)
        return pa.table(
            {"cid": pa.array(cid, pa.int64()),
             "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    ndist = _collect(
        li.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("__b", num_partitions=P)
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )
    dmap: dict[str, int] = {}
    for c, n in zip(
        ndist["cid"].to_numpy(zero_copy_only=False),
        ndist["n"].to_numpy(zero_copy_only=False),
    ):
        name = PROFILE_COLS[int(c)]
        dmap[name] = dmap.get(name, 0) + int(n)
    cols = scal["column"].to_pylist()
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n_rows": scal["sum(rows)"].cast(pa.int64()),
            "n_nulls": scal["sum(nulls)"].cast(pa.int64()),
            "min_v": scal["min(mn)"].cast(pa.int64()),
            "max_v": scal["max(mx)"].cast(pa.int64()),
            "n_distinct": pa.array([int(dmap[c]) for c in cols], pa.int64()),
        }
    ).sort_by("column")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pa.Table:
    """Pivot (wide aggregate): per-day event counts spread into one column
    per event type (type domain is bounded and known). Map-side: each batch
    emits ≤ |days| partial rows with the per-type counts already folded to
    columns; ONE groupby-sum over day finishes. The shuffle carries
    days × types ints — never the event stream."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        day = ts - ts % DAY_US
        udays, dinv = np.unique(day, return_inverse=True)
        cols = {"day": pa.array(udays, pa.int64())}
        for t in EVENT_TYPES:
            cnt = np.bincount(dinv[et == t], minlength=len(udays))
            cols[f"n_{t}"] = pa.array(cnt.astype(np.int64), pa.int64())
        return pa.table(cols)

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day", num_partitions=_scaled(0.25, 8))
        .aggregate(*[Sum(f"n_{t}") for t in EVENT_TYPES])
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"day": batch["day"].cast(pa.int64()).cast(pa.timestamp("us"))}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = batch[f"sum(n_{t})"].cast(pa.int64())
        return pa.table(cols)

    return _collect(agg.map_batches(finish, batch_format="pyarrow")).sort_by("day")


def distinct_users_daily(sf_dir: str) -> pa.Table:
    """Exact distinct users per day: packed (day, user) keys through ONE
    hash-bucket exchange, per-bucket numpy distinct, driver merge of the
    tiny per-day partials (the approximate one-exchange alternative is
    ``hll_user_sketch``)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    DAY_US = 86_400_000_000

    # (day, user) packed into ONE int64 key; distinct via a hash-bucket
    # exchange + per-bucket np.unique (a key lands in exactly one bucket,
    # so per-bucket per-day distinct counts sum exactly) — same dataflow
    # as table_profile's distinct counter, ~2.5× the generic aggregate
    PACK = 1 << 24  # user_id < 2^24 here; lineage-checked below

    P = _scaled(1.0, 32)

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uid) and int(uid.max()) >= PACK:
            raise ValueError("user_id exceeds pack width — widen PACK")
        day_idx = ts // DAY_US
        k = np.unique(day_idx * PACK + uid)
        mix = (k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "__b": pa.array((mix % np.uint64(P)).astype(np.int64), pa.int64()),
            }
        )

    def bucket_daily(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        k = np.unique(group["k"].to_numpy(zero_copy_only=False).astype(np.int64))
        day, n = np.unique(k // PACK, return_counts=True)
        return pa.table(
            {"day": pa.array(day * DAY_US, pa.int64()),
             "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    partials = _collect(
        ev.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b", num_partitions=P)
        .map_groups(bucket_daily, batch_format="pyarrow")
    )
    day = partials["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = partials["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    uday, inv = np.unique(day, return_inverse=True)
    tot = np.zeros(len(uday), np.int64)
    np.add.at(tot, inv, n)
    return pa.table(
        {
            "day": pa.array(uday, pa.int64()).cast(pa.timestamp("us")),
            "n_users": pa.array(tot, pa.int64()),
        }
    )


def value_quartiles(sf_dir: str) -> pa.Table:
    """Quantile bucketing: per event type, exact nearest-rank quartile
    thresholds (the ceil(q·n)-th order statistic — pure selection, no
    interpolation float) computed once and BROADCAST, then one streamed
    pass assigns every row its bucket. → (event_id, event_type, bucket 1..4)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    import math

    def thresholds(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "q1": pa.array([], pa.float64()),
                 "q2": pa.array([], pa.float64()),
                 "q3": pa.array([], pa.float64())}
            )
        vals = np.sort(group["value"].combine_chunks().to_numpy(zero_copy_only=False))
        picks = [float(vals[min(n - 1, math.ceil(q * n) - 1)]) for q in (0.25, 0.5, 0.75)]
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()], pa.string()),
                "q1": pa.array([picks[0]], pa.float64()),
                "q2": pa.array([picks[1]], pa.float64()),
                "q3": pa.array([picks[2]], pa.float64()),
            }
        )

    th = _collect(
        ev.groupby("event_type").map_groups(thresholds, batch_format="pyarrow")
    )
    tmap = {
        r["event_type"]: (r["q1"], r["q2"], r["q3"]) for r in th.to_pylist()
    }
    th_ref = ray.put(tmap)

    def assign(batch: pa.Table) -> pa.Table:
        tm = ray.get(th_ref)
        et = batch["event_type"].to_pylist()
        val = batch["value"].to_numpy(zero_copy_only=False)
        qs = np.array([tm[t] for t in et], np.float64)
        bucket = (
            1
            + (val > qs[:, 0]).astype(np.int64)
            + (val > qs[:, 1]).astype(np.int64)
            + (val > qs[:, 2]).astype(np.int64)
        )
        return pa.table(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "event_type": batch["event_type"],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return _collect(
        ev.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("event_id")


def hll_user_sketch(sf_dir: str) -> pa.Table:
    """HyperLogLog register table over events.user_id (p=6, 64 registers):
    per-batch register fold, ONE m-row max-merge exchange — the
    approximate-distinct sketch whose registers are exactly
    oracle-checkable. See :mod:`lamapi_ray.stages.sketch`."""
    from lamapi_ray.stages.sketch import hll_registers

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return _collect(hll_registers(ev, "user_id")).sort_by("bucket")


def bloom_users(sf_dir: str) -> pa.Table:
    """Bloom-filter sketch of events.user_id (m=4096 bits, k=2 double
    hashing): per-batch word-OR partials, ONE ≤64-row grouped OR-merge —
    the membership sketch a distributed semi-join prefilter broadcasts.
    Packed words are integer-exact (SQL builds them in HUGEINT and folds
    to two's-complement BIGINT). See :mod:`lamapi_ray.stages.sketch`."""
    from lamapi_ray.stages.sketch import bloom_filter

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return _collect(bloom_filter(ev, "user_id")).sort_by("word_idx")


def jaccard_ppjoin(sf_dir: str) -> pa.Table:
    """Exact token-set Jaccard ≥ 3/5 self-join via PPJoin prefix filtering
    (stages/stringjoin.py::ppjoin) over the doc_id % 10 == 0 subset — the
    subset keeps the oracle's brute-force pair join tractable; the ENGINE
    path is the real prefix-filtered algorithm either way. Output is
    all-integer: (doc_a, doc_b, shared, size_a, size_b)."""
    from lamapi_ray.stages.stringjoin import ppjoin

    def subset(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 10 == 0))

    docs = _docs(sf_dir, cols=("doc_id", "text")).map_batches(
        subset, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(ppjoin(docs, tau_num=3, tau_den=5)).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")]
    )


def hll_users_by_type(sf_dir: str) -> pa.Table:
    """Grouped HyperLogLog: one register table per event_type (the
    "approximate distinct users per group" sketch) — per-batch
    (group, bucket, rho) partials, ONE groups×64-bounded grouped
    max-merge. See :func:`lamapi_ray.stages.sketch.hll_registers_grouped`."""
    from lamapi_ray.stages.sketch import hll_registers_grouped

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return _collect(hll_registers_grouped(ev, "event_type", "user_id")).sort_by(
        [("event_type", "ascending"), ("bucket", "ascending")]
    )


def cms_user_sketch(sf_dir: str) -> pa.Table:
    """Count-Min sketch of events.user_id (d=4 rows × w=1024 counters,
    double hashing shared with the Bloom leg): per-batch counter partials,
    ONE ≤4096-row grouped sum-merge — the point-frequency sketch of the
    family. Register table is integer-exact and oracle-checked cell by
    cell. See :mod:`lamapi_ray.stages.sketch`."""
    from lamapi_ray.stages.sketch import count_min_sketch

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return _collect(count_min_sketch(ev, "user_id")).sort_by(
        [("row", "ascending"), ("col", "ascending")]
    )


def kmv_users(sf_dir: str) -> pa.Table:
    """K-minimum-values (bottom-k) distinct sketch of events.user_id —
    the fourth leg of the sketch family (HLL cardinality, Bloom
    membership, CMS frequency): each batch ships only its k smallest
    distinct hashes, the fold is a tiny set-union + bottom-k, and the
    k-th order statistic gives the distinct estimate (k-1)·p/h_k. The
    sketch doubles as a uniform distinct-key sample.
    See :func:`lamapi_ray.stages.sketch.kmv_sketch`."""
    from lamapi_ray.stages.sketch import kmv_sketch

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return kmv_sketch(ev, "user_id")


def bloom_semi_join(sf_dir: str) -> pa.Table:
    """Bloom-prefiltered distributed SEMI join — the shuffle-saving join
    pattern a 100 TB pipeline uses when the probe side dwarfs the build
    side: lineitem rows of high-value orders (o_totalprice > 480000).

    Dataflow: (1) build side folds to a 4096-bit Bloom filter (≤64-row
    word table, one tiny OR-merge exchange); (2) the filter broadcasts
    to every probe task, which drops non-member rows BEFORE the bucketed
    exchange — no false negatives by construction, so exactness is
    preserved; (3) the surviving ~selectivity+FP stream goes through the
    exact bucketed semi join, which removes Bloom false positives. Wire
    cost of step 3 scales with the SELECTED rows, not the corpus.
    See :mod:`lamapi_ray.stages.sketch` (filter) and
    :func:`lamapi_ray.stages.join.bucketed_semi_anti_join` (confirm)."""
    from lamapi_ray.stages.join import bucketed_semi_anti_join
    from lamapi_ray.stages.sketch import bloom_contains, bloom_filter

    def hv_keys(b: pa.Table) -> pa.Table:
        mask = pc.greater(b["o_totalprice"], 480000.0)
        return pa.table({"l_orderkey": b.filter(mask)["o_orderkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(hv_keys, batch_format="pyarrow", zero_copy_batch=True)
    # ≤64-row merged filter — small enough to close over (each probe task
    # gets it once via the serialized callable, the batches stream)
    filt = _collect(bloom_filter(orders, "l_orderkey"))

    def probe(b: pa.Table) -> pa.Table:
        keys = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bloom_contains(filt, keys)))

    probe_side = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    ).map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    out = _collect(
        bucketed_semi_anti_join(
            probe_side, orders, on="l_orderkey", how="semi",
            num_buckets=_scaled(0.5, 16),
        )
    )
    if out.num_rows == 0 and not out.column_names:
        out = pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "l_linenumber": pa.array([], pa.int64()),
             "l_quantity": pa.array([], pa.float64())}
        )
    return out.sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )


def quantile_sketch(sf_dir: str) -> pa.Table:
    """Mergeable equi-width-histogram quantile sketch per event_type
    (p50/p95/p99 lower-bin-edge estimates, 128 bins): per-batch (group,
    bin) count partials, ONE tiny grouped exchange — the approximate
    sibling of the exact ``event_percentiles`` selection, sized for value
    streams too large to sort. See
    :func:`lamapi_ray.stages.sketch.histogram_quantiles`."""
    from lamapi_ray.stages.sketch import histogram_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return _collect(histogram_quantiles(ev, "event_type", "value")).sort_by(
        "event_type"
    )


def inverted_index(sf_dir: str) -> pa.Table:
    """Postings-list construction: distinct (term, doc) pairs map-side, ONE
    grouped exchange, per-term (df, sorted comma-joined postings); df ≥ 3.
    See :mod:`lamapi_ray.index.postings`."""
    from lamapi_ray.index.postings import inverted_index as build

    return _collect(build(_docs(sf_dir), min_df=3)).sort_by("g")


def text_clean(sf_dir: str) -> pa.Table:
    """Webtext normalization (NFC + control-char strip + whitespace
    collapse + trim); byte-identical to the oracle's literal regex chain.
    See :func:`lamapi_ray.stages.curation.clean_text`."""
    from lamapi_ray.stages import curation

    return _collect(curation.clean_text(_docs(sf_dir))).sort_by("doc_id")


def _url_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, url_raw): the deterministic Common-Crawl-style
    raw-URL derivation (``weburl.synth_raw_urls``; oracle mirrors it)."""
    from lamapi_ray.stages import weburl

    def add(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "url_raw": weburl.synth_raw_urls(batch)}
        )

    return _docs(sf_dir, ("doc_id",)).map_batches(
        add, batch_format="pyarrow", zero_copy_batch=True
    )


def url_normalize(sf_dir: str) -> pa.Table:
    """Vectorized RE2 URL canonicalization per page (lowercase scheme/host,
    strip www./default port/fragment/utm_* params). Pure streamed map; the
    DuckDB oracle runs the literal same regex pipeline.
    See :func:`lamapi_ray.stages.weburl.normalize_urls`."""
    from lamapi_ray.stages import weburl

    return _collect(weburl.url_normalize(_url_corpus(sf_dir))).sort_by("doc_id")


def url_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup on the canonical URL (keeper = min doc_id, dup count):
    map-side combine + ONE cluster-scaled grouped exchange.
    See :func:`lamapi_ray.stages.weburl.url_dedup`."""
    from lamapi_ray.stages import weburl

    return _collect(
        weburl.url_dedup(weburl.url_normalize(_url_corpus(sf_dir)))
    ).sort_by("url_norm")


def host_caps(sf_dir: str) -> pa.Table:
    """Per-host frequency capping (≤3 pages per registrable host, smallest
    doc_id wins): map-side per-host top-K prune → one grouped exchange →
    per-group final top-K. See :func:`lamapi_ray.stages.weburl.host_caps`."""
    from lamapi_ray.stages import weburl

    return _collect(
        weburl.host_caps(weburl.url_normalize(_url_corpus(sf_dir)), k=3)
    ).sort_by([("host", "ascending"), ("rk", "ascending")])


def registrable_domains(sf_dir: str) -> pa.Table:
    """eTLD+1 extraction by the publicsuffix.org algorithm over a synth
    host corpus exercising every PSL rule class — plain rules of 1 and 2
    labels, longest-match precedence, the ``github.io`` private-suffix
    case, the ``*.ck`` wildcard, the ``!www.ck`` exception, the implicit
    ``*`` fallback for unknown TLDs, and bare-suffix hosts (null
    registrable). Host classes keyed on doc_id % 8 (closed-form oracle).
    See :func:`lamapi_ray.stages.weburl.registrable_domains`."""
    from lamapi_ray.stages.weburl import registrable_domain_stage

    def to_hosts(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (did // 8).astype("U20")
        host = np.select(
            [did % 8 == c for c in range(7)],
            [
                np.char.add(np.char.add("site", g), ".com"),
                np.char.add(np.char.add("www.site", g), ".co.uk"),
                np.char.add(np.char.add("x.y", g), ".github.io"),
                np.char.add(np.char.add("foo", g), ".bar.ck"),
                np.full(len(did), "www.ck"),
                np.char.add(np.char.add("ed", g), ".ac.jp"),
                np.char.add(np.char.add("site", g), ".xyz"),
            ],
            "co.uk",  # c7: a bare public suffix → null registrable
        )
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "host": pa.array(host.tolist(), pa.string()),
            }
        )

    hosts = _docs(sf_dir, cols=("doc_id",)).map_batches(
        to_hosts, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(registrable_domain_stage(hosts)).sort_by("doc_id")


def top_ngrams(sf_dir: str) -> pa.Table:
    """Corpus-level most-frequent word-3-grams (vocabulary statistics) —
    the canonical pre-aggregate/combiner dataflow: every batch emits
    (gram-hash, partial count) pairs (one ``np.unique`` per batch), ONE
    vocabulary-bounded ``groupby.sum`` merges the partials, and a
    distributed sort + ``limit`` yields the global top 20 with a
    deterministic (count desc, gram asc) tie-break. The shuffle carries
    one row per DISTINCT gram per batch — occurrence counts never cross
    the wire individually, which is what keeps this viable at 100 TB."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import _doc_shingle_hashes

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, _, g = _doc_shingle_hashes(batch, "doc_id", "text", k=3, distinct=False)
        vals, cnts = np.unique(g, return_counts=True)
        return pa.table(
            {
                "g": pa.array(vals.astype(np.int64), pa.int64()),
                "c": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        # per-block top-20 after the groupby (each gram lives in exactly one
        # partition post-shuffle) — avoids a second global all-to-all sort;
        # the driver merges blocks × 20 rows
        if len(batch) <= 20:
            return batch
        cnt = batch["count"].combine_chunks().to_numpy(zero_copy_only=False)
        g = batch["g"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((g, -cnt))[:20]
        return batch.take(pa.array(np.sort(order)))

    from lamapi_ray.stages.dedup import scaled_partitions

    partial = (
        _docs(sf_dir)
        .map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g", num_partitions=scaled_partitions(0.25, 4))
        .aggregate(Sum("c", alias_name="count"))
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = _collect(partial)
    cnt = out["count"].combine_chunks().to_numpy(zero_copy_only=False)
    g = out["g"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((g, -cnt))[:20]
    return pa.table(
        {
            "g": pa.array(g[order].astype(np.int64), pa.int64()),
            "count": pa.array(cnt[order].astype(np.int64), pa.int64()),
        }
    )


def curation_pipeline(sf_dir: str) -> pa.Table:
    """The LLM-data curation flow as ONE streaming composition:
    documents → language-ID → quality scoring → filter (predicted English
    AND quality ≥ 0.55) → exact dedup over the survivors (min-id per
    distinct text, copy count) → deterministic split assignment. Every
    stage is one of the engine's individually oracle-checked operators;
    this query checks their composition end to end.

    Dataflow: the per-doc stages fuse into a single ``map_batches`` pass
    (one corpus read); the only exchange is the dedup ``groupby(hash)``."""
    from ray.data.aggregate import Count, Min

    from lamapi_ray.functions.inthash import MOD61, fold_mod61, mulmod61
    from lamapi_ray.stages.textstats import lang_id_batch, quality_batch

    MULT = np.uint64(0x9E3779B97F4A7C15 % MOD61)

    def stage(batch: pa.Table) -> pa.Table:
        li = lang_id_batch(
            batch.append_column("lang", pa.array([""] * len(batch), pa.string()))
        )
        q = quality_batch(batch)
        keep = pc.and_(
            pc.equal(li["lang_pred"], "en"),
            pc.greater_equal(q["quality"], 0.55),
        )
        flt = batch.filter(keep)
        import hashlib as _h

        hashes = [
            _h.sha1(t.encode("utf-8")).hexdigest() for t in flt["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": flt["doc_id"],
                "__h": pa.array(hashes, pa.string()),
            }
        )

    ds = _dup_corpus(sf_dir, modify=False)
    agg = (
        ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__h", num_partitions=_scaled(1.0, 32))
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
        h = fold_mod61(mulmod61(fold_mod61(ids), np.full(len(ids), MULT)) + np.uint64(1))
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < 80, "train", np.where(bucket < 90, "val", "test"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_copies": batch["n_copies"].cast(pa.int64())
                if not isinstance(batch["n_copies"], pa.ChunkedArray)
                else batch["n_copies"].combine_chunks().cast(pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return _collect(agg.map_batches(finish, batch_format="pyarrow")).sort_by("doc_id")


# --- multimodal -----------------------------------------------------------


def multimodal_decode(sf_dir: str) -> pa.Table:
    return _collect(decode_payloads(attach_payload(_docs(sf_dir))))


def multimodal_decode_real(sf_dir: str) -> pa.Table:
    """REAL image decode: deterministic BMP payloads (pure-numpy encoder)
    through the actor-pool decoder — true dimensions + mean pixel value."""
    from lamapi_ray.stages.multimodal import attach_image_payload

    return _collect(
        decode_payloads(attach_image_payload(_docs(sf_dir)), mode="real")
    )


def multimodal_decode_jpeg(sf_dir: str) -> pa.Table:
    """REAL compressed-image decode: baseline JPEG payloads (pure-numpy
    from-spec codec, mixed 4:4:4/4:2:0 + restart markers) through the
    actor-pool decoder. Flat-gray-at-quality-75 fixtures roundtrip
    pixel-exact (see stages.multimodal.synth_flat_gray), so the oracle
    checks the decoded mean exactly."""
    from lamapi_ray.stages.multimodal import attach_jpeg_payload

    return _collect(
        decode_payloads(attach_jpeg_payload(_docs(sf_dir)), mode="real")
    )


def dup_spans(sf_dir: str) -> pa.Table:
    """Exact duplicate-substring spans (Lee et al. ExactSubstr family):
    maximal half-open token spans covered by 8-token windows occurring
    >= 2 times corpus-wide — see stages/substrdedup.py."""
    from lamapi_ray.stages.substrdedup import duplicate_spans

    out = duplicate_spans(_docs(sf_dir), L=8)
    batches = list(out.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(batches).sort_by(
        [("doc_id", "ascending"), ("span_start", "ascending")]
    )


def dup_strip(sf_dir: str) -> pa.Table:
    """Corpus rewrite removing every token covered by a duplicated
    8-token window (the drop-all ExactSubstr curation variant) — see
    stages/substrdedup.py::strip_duplicate_spans."""
    from lamapi_ray.stages.substrdedup import strip_duplicate_spans

    return _collect(strip_duplicate_spans(_docs(sf_dir), L=8)).sort_by("doc_id")


def blocklist_scan(sf_dir: str) -> pa.Table:
    """Word-filter curation: per-doc blocklist substring counts + flag
    (stages/curation.py::blocklist_scan)."""
    from lamapi_ray.stages.curation import blocklist_scan as _bs

    return _collect(_bs(_docs(sf_dir))).sort_by("doc_id")


def dsir_weights(sf_dir: str) -> pa.Table:
    """DSIR importance weights: documents scored against the part-name
    target domain under hashed unigram+bigram multinomials
    (stages/dsir.py). Positive logw_micro = more target-like."""
    import ray.data as rd

    from lamapi_ray.stages.dsir import dsir_weights as _dw

    target = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b["p_partkey"].cast(pa.int64()), "text": b["p_name"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _collect(_dw(_docs(sf_dir), target)).sort_by("doc_id")


def ccnet_buckets(sf_dir: str) -> pa.Table:
    """CCNet-style head/middle/tail perplexity split: exact tercile
    VALUE thresholds from a distinct-value histogram (no global sort) —
    stages/lmscore.py::perplexity_buckets."""
    from lamapi_ray.stages.lmscore import perplexity_buckets

    return _collect(perplexity_buckets(_docs(sf_dir))).sort_by("doc_id")


def bpe_merges(sf_dir: str) -> pa.Table:
    """Distributed BPE tokenizer training (8 merges) over the corpus
    word-frequency table — stages/bpe.py. The argmax recursion has no
    SQL mirror (the suite's single rows-only entry); the merge table is
    pinned exactly by tests/test_bpe.py against a scalar reference."""
    from lamapi_ray.stages.bpe import train_bpe

    return train_bpe(_docs(sf_dir), num_merges=8)


def training_shards(sf_dir: str) -> pa.Table:
    """Deterministic shuffle-then-shard export: scrambled-hash key,
    shard = key % 16, reproducible in-shard positions
    (stages/shuffle.py::shard_shuffle)."""
    from lamapi_ray.stages.shuffle import shard_shuffle

    return _collect(shard_shuffle(_docs(sf_dir, cols=("doc_id",)))).sort_by(
        "doc_id"
    )


def heavy_tokens(sf_dir: str) -> pa.Table:
    """Frequency sketch leg of the sketch family: every token with
    corpus count > N/512, exact, via Misra-Gries candidates + exact
    recount (stages/sketch.py::heavy_hitters)."""
    from lamapi_ray.stages.sketch import heavy_hitters

    return _collect(heavy_hitters(_docs(sf_dir), k=512)).sort_by("token")


def postings_delta_merge(sf_dir: str) -> pa.Table:
    """Index maintenance e2e: a base segment (docs with doc_id%10 != 7),
    a delta segment reindexing the %10 == 7 docs with UPDATED text
    (' updated' appended), and tombstones for doc_id%13 == 2, compacted
    by index/postings.py::merge_postings. Segments are built min_df=1;
    the threshold (3) applies at the merge — the LSM contract."""
    import numpy as np

    from lamapi_ray.index.postings import inverted_index, merge_postings

    docs = _docs(sf_dir)

    def base_part(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did % 10 != 7))

    def delta_part(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % 10 == 7))
        upd = pc.binary_join_element_wise(
            sub["text"].cast(pa.string()), "updated", " "
        )
        return pa.table({"doc_id": sub["doc_id"], "text": upd})

    base_idx = inverted_index(
        docs.map_batches(base_part, batch_format="pyarrow", zero_copy_batch=True),
        min_df=1,
    )
    delta_idx = inverted_index(
        docs.map_batches(delta_part, batch_format="pyarrow", zero_copy_batch=True),
        min_df=1,
    )
    ids = _collect(_docs(sf_dir, cols=("doc_id",)))["doc_id"].to_numpy(
        zero_copy_only=False
    )
    deleted = ids[ids % 13 == 2]
    return _collect(
        merge_postings(base_idx.union(delta_idx), deleted, min_df=3)
    ).sort_by("g")


def wet_roundtrip(sf_dir: str) -> pa.Table:
    """WET sidecar e2e: pages → extract (nulls filled from html) →
    text-only conversion records in per-record-gzip shards → reader;
    url/epoch/extracted text survive byte-identically."""
    from lamapi_ray import synth
    from lamapi_ray.sources.warc import read_wet_shards, write_wet_shards
    from lamapi_ray.stages.extract import extract_text_batch

    pages = synth.pages_dataset(sf_dir).map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: b.select(["url", "warc_ts", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = _collect(read_wet_shards(write_wet_shards(pages, shard_size=50)))
    return pa.table(
        {
            "url": out["url"],
            "warc_epoch": out["warc_epoch"],
            "text": out["text"].cast(pa.string()),
        }
    ).sort_by("url")


def web_ingest_e2e(sf_dir: str) -> pa.Table:
    """Flagship ingestion chain: pages → per-record-gzip WARC shards →
    member-splitting reader → html→text extraction. Proves the
    north-star per-url BYTE-IDENTICAL text invariant THROUGH the archive
    layer: the tag-stripped text of every WARC-roundtripped page equals
    the synth full_text exactly (oracle: SQL_PAGES)."""
    from lamapi_ray import synth
    from lamapi_ray.sources.warc import read_warc_shards, write_warc_shards
    from lamapi_ray.stages.extract import extract_text_batch

    pages = synth.pages_dataset(sf_dir).map_batches(
        lambda b: b.select(["url", "warc_ts", "html"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = read_warc_shards(write_warc_shards(pages, shard_size=50))

    def fill(batch: pa.Table) -> pa.Table:
        withnull = batch.append_column(
            "text", pa.nulls(len(batch), pa.large_string())
        )
        out = extract_text_batch(withnull)
        return pa.table(
            {"url": out["url"], "text": out["text"].cast(pa.string())}
        )

    return _collect(
        rows.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("url")


def sitemap_roundtrip(sf_dir: str) -> pa.Table:
    """URL-discovery e2e: per-host sitemap.xml blobs written and parsed
    back via the vectorized split chain (sources/sitemap.py). Derivation:
    host doc_id%17, url doc://doc_id, lastmod 2024-01-01 + doc_id sec."""
    import numpy as np

    from lamapi_ray.sources.sitemap import read_sitemaps, write_sitemaps

    def to_urls(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        host = np.char.add(
            np.char.add("h", (did % 17).astype("U2")), ".example.com"
        )
        url = np.char.add("doc://", did.astype("U20"))
        return pa.table(
            {
                "host": pa.array(host.tolist(), pa.string()),
                "url": pa.array(url.tolist(), pa.string()),
                "epoch": pa.array(1704067200 + did, pa.int64()),
            }
        )

    urls = _docs(sf_dir, cols=("doc_id",)).map_batches(
        to_urls, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(read_sitemaps(write_sitemaps(urls))).sort_by("url")


def anchor_texts(sf_dir: str) -> pa.Table:
    """Web-derived surface-form prior: inbound anchor-text counts per
    link target, parsed from real page html anchors
    (stages/linkgraph.py::extract_anchor_texts)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import anchor_surface_forms, extract_anchor_texts

    return _collect(
        anchor_surface_forms(extract_anchor_texts(synth.pages_dataset(sf_dir)))
    ).sort_by([("dst", "ascending"), ("anchor", "ascending")])


def crawl_schedule(sf_dir: str) -> pa.Table:
    """Politeness scheduling: per-host fetch times under a 2-second
    minimum delay via the exact max-plus closed form
    (stages/crawl.py). Derivation: host doc_id%17, arrival
    1704067200 + (doc_id*7)%1000."""
    import numpy as np

    from lamapi_ray.stages.crawl import schedule_fetches

    def to_requests(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "host": pa.array(did % 17, pa.int64()),
                "arr": pa.array(1704067200 + (did * 7) % 1000, pa.int64()),
            }
        )

    reqs = _docs(sf_dir, cols=("doc_id",)).map_batches(
        to_requests, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(schedule_fetches(reqs, delay=2)).sort_by("doc_id")


def charset_detect(sf_dir: str) -> pa.Table:
    """Encoding-sniff normalization e2e: docs encoded per doc_id%4 ∈
    {utf-8, utf-8+BOM, latin-1, utf-16-le+BOM} with a non-ASCII suffix,
    then BOM → strict-UTF-8 → Latin-1 cascade back to uniform UTF-8
    (stages/charset.py)."""
    from lamapi_ray.stages.charset import attach_encoded_payload, decode_payloads

    return _collect(
        decode_payloads(attach_encoded_payload(_docs(sf_dir)))
    ).sort_by("doc_id")


def robots_check(sf_dir: str) -> pa.Table:
    """Crawl-frontier admission: deterministic per-host robots.txt blobs
    parsed by the RFC 9309 parser, every synthetic url decided through
    the longest-match stage (stages/robots.py). Derivation: host
    h<doc_id%17>.example.com, path class doc_id%4 over
    /p/ /p/open/ /private/ / prefixes."""
    import numpy as np

    from lamapi_ray.stages import robots as R

    robots_by_host = {
        f"h{h}.example.com": R.parse_robots(R.synth_robots_text(h))
        for h in range(17)
    }

    def to_urls(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = did % 17
        c = did % 4
        host = np.char.add(
            np.char.add("h", h.astype("U2")), ".example.com"
        )
        pre = np.select(
            [c == 0, c == 1, c == 2], ["/p/", "/p/open/", "/private/"], "/"
        )
        path = np.char.add(pre.astype("U9"), did.astype("U20"))
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "host": pa.array(host.tolist(), pa.string()),
                "path": pa.array(path.tolist(), pa.string()),
            }
        )

    urls = _docs(sf_dir, cols=("doc_id",)).map_batches(
        to_urls, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(R.robots_filter(urls, robots_by_host, "lamapi-bot")).sort_by(
        "doc_id"
    )


def warc_roundtrip(sf_dir: str) -> pa.Table:
    """Common-Crawl-style archive ingestion e2e: pages → per-record-gzip
    .warc.gz shard blobs → member-splitting reader → rows; url, epoch
    second, and html BYTES survive byte-identically (sources/warc.py)."""
    from lamapi_ray import synth
    from lamapi_ray.sources.warc import read_warc_shards, write_warc_shards

    pages = synth.pages_dataset(sf_dir).map_batches(
        lambda b: b.select(["url", "warc_ts", "html"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = _collect(read_warc_shards(write_warc_shards(pages, shard_size=50)))
    return pa.table(
        {
            "url": out["url"],
            "warc_epoch": out["warc_epoch"],
            "html": pc.cast(out["html"], pa.string()),
        }
    ).sort_by("url")


def winnow_fps(sf_dir: str) -> pa.Table:
    """MOSS winnowing fingerprints (k=3 token-grams, window w=4) — any
    shared run of w+k−1 tokens between two docs shares a fingerprint."""
    from lamapi_ray.stages.winnow import winnow_fingerprints

    return _collect(winnow_fingerprints(_docs(sf_dir), k=3, w=4)).sort_by(
        [("doc_id", "ascending"), ("fp", "ascending")]
    )


def page_links(sf_dir: str) -> pa.Table:
    """Hyperlink edge list parsed from raw page html (vectorized href
    split chain — stages/linkgraph.py)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    return _collect(extract_links(synth.pages_dataset(sf_dir))).sort_by(
        [("src", "ascending"), ("rank", "ascending")]
    )


def link_triangles(sf_dir: str) -> pa.Table:
    """Global triangle count of the hyperlink graph parsed from raw page
    html — the clustering statistic of link-spam/community analysis.
    Chain: pages → anchor extraction (stages/linkgraph.py) → numeric node
    ids (vectorized utf8 slice off the ``doc://`` prefix) → degree-ordered
    node-iterator triangle count (stages/graph.py::triangle_count,
    O(m^1.5) wedge bound regardless of in-degree skew).

    The organic anchor graph (doc → doc%P, doc → (7·doc+13)%P) is
    triangle-free at the test scales, so the edge stream is unioned with
    deterministic "related-pages" triads — (d, d+1), (d+1, d+2),
    (d, d+2) for every d ≡ 0 (mod 7) with d+2 < |docs| — giving the
    count a corpus-scaling nonzero value the oracle restates over the
    same arithmetic."""
    from lamapi_ray import synth
    from lamapi_ray.stages.graph import triangle_count
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(
                    pc.utf8_slice_codeunits(
                        batch["src"].combine_chunks()
                        if isinstance(batch["src"], pa.ChunkedArray)
                        else batch["src"],
                        6,
                    ),
                    pa.int64(),
                ),
                "b": pc.cast(
                    pc.utf8_slice_codeunits(
                        batch["dst"].combine_chunks()
                        if isinstance(batch["dst"], pa.ChunkedArray)
                        else batch["dst"],
                        6,
                    ),
                    pa.int64(),
                ),
            }
        )

    import pyarrow.parquet as pq

    ndocs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def triads(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = did[(did % 7 == 0) & (did + 2 < ndocs)]
        return pa.table(
            {
                "a": pa.array(np.concatenate([d, d + 1, d]), pa.int64()),
                "b": pa.array(np.concatenate([d + 1, d + 2, d + 2]), pa.int64()),
            }
        )

    edges = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _docs(sf_dir, cols=("doc_id",)).map_batches(
                triads, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )
    n = triangle_count(edges)
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def link_indegree(sf_dir: str) -> pa.Table:
    """In-degree per link target over the page hyperlink graph."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links, link_indegree as _ind

    return _collect(_ind(extract_links(synth.pages_dataset(sf_dir)))).sort_by("dst")


def link_hits(sf_dir: str) -> pa.Table:
    """HITS hubs/authorities over the hyperlink graph parsed from raw page
    html — Kleinberg's web-graph ranking pair, the spam/portal-detection
    complement of ``entity_pagerank``. Chain: pages → anchor extraction
    (stages/linkgraph.py) → numeric node ids (vectorized utf8 slice off
    the ``doc://`` prefix) → integer-exact un-normalized HITS, 2
    iterations (stages/graph.py::hits — node-sized broadcast score
    vector, one node-bounded grouped exchange per half-iteration).
    Edges keep extractor multiplicity and self-loops; the oracle restates
    the same two unrolled join+group-sum rounds over the synthetic anchor
    arithmetic (doc → doc%P, doc → (7·doc+13)%P)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.graph import hits
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table({"a": ids(batch["src"]), "b": ids(batch["dst"])})

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    return hits(edges, iters=2)


def _link_pair_counts(sf_dir: str, group_end: str, pair_end: str,
                      max_fan: int = 100_000) -> pa.Table:
    """Shared kernel for co-citation / bibliographic coupling: distinct
    (src, dst) link edges, pair expansion of the ``pair_end`` values
    inside coarse ``group_end``-keyed partitions, one grouped pair count.

    Work is bounded by fan², never corpus²: fan = out-degree for
    co-citation (small in real web graphs), in-degree for coupling —
    where celebrity pages make fan² explode, so any group over
    ``max_fan`` raises instead of silently running Θ(fan²) (the
    documented mitigation at scale: cap each group to its ``max_fan``
    hash-smallest members, the standard co-citation truncation)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        g = ids(batch[group_end]).to_numpy(zero_copy_only=False)
        p = ids(batch[pair_end]).to_numpy(zero_copy_only=False)
        # deterministic coarse key — every row of one group value MUST
        # land in the same partition or its pairs would silently split
        return pa.table(
            {
                "g": pa.array(g, pa.int64()),
                "p": pa.array(p, pa.int64()),
                "__pk": pa.array(g % np.int64(16), pa.int64()),
            }
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        g = group["g"].combine_chunks().to_numpy(zero_copy_only=False)
        p = group["p"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((p, g))
        g, p = g[order], p[order]
        keep = np.concatenate([[True], (g[1:] != g[:-1]) | (p[1:] != p[:-1])])
        g, p = g[keep], p[keep]  # distinct edges (dup anchors count once)
        starts, lens = _run_bounds([g])
        if len(lens) and int(lens.max()) > max_fan:
            raise ValueError(
                f"link pair fan {int(lens.max())} exceeds max_fan={max_fan} "
                "— apply the hash-smallest-members group cap before pairing"
            )
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            xs.append(p[ia])  # run is value-sorted and deduped → a < b
            ys.append(p[ib])
        if not xs:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(xs), pa.int64()),
                "b": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    counted = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk", num_partitions=_scaled(0.5, 16))
        .map_groups(partition_pairs, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=_scaled(0.5, 16))
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch["a"].cast(pa.int64()),
                "b": batch["b"].cast(pa.int64()),
                "n_common": batch["count()"].cast(pa.int64()),
            }
        )

    return _collect(
        counted.map_batches(finish, batch_format="pyarrow")
    ).sort_by([("a", "ascending"), ("b", "ascending")])


def co_citation(sf_dir: str) -> pa.Table:
    """Co-citation analysis (Small 1972) over the hyperlink graph: for
    every unordered target pair a < b, the number of distinct pages
    linking to BOTH — the classic document-relatedness signal (two pages
    repeatedly cited together are about the same thing), the undirected
    similarity graph HITS/SALSA communities are mined from.

    Dataflow: distinct (src, dst) edges, pair expansion inside coarse
    src-keyed partitions (work bounded by out-degree² — small and capped
    in real web graphs — never corpus²), ONE (a, b) grouped count."""
    return _link_pair_counts(sf_dir, group_end="src", pair_end="dst")


def biblio_coupling(sf_dir: str) -> pa.Table:
    """Bibliographic coupling (Kessler 1963) — co-citation's transpose:
    for every unordered SOURCE pair a < b, the number of distinct targets
    both pages link to. Same kernel grouped by target; in-degree skew is
    the scale hazard here (a celebrity target makes fan² explode), so the
    shared ``max_fan`` guard raises rather than silently running Θ(fan²),
    with the hash-smallest-members truncation documented as the cap."""
    return _link_pair_counts(sf_dir, group_end="dst", pair_end="src")


SEARCH_QUERIES = (
    "customer query",
    "fast scan slow",
    "hash join",
    "window agg sort",
)


def doc_search_bm25(sf_dir: str) -> pa.Table:
    """Corpus-scale full-text BM25 retrieval over document text — the
    "retrieve supporting passages" step of RAG pipelines, the same
    ranking function the reference serves through Elasticsearch over
    surface-form names (api/model/elastic.py:31-64) but as a distributed
    two-pass Ray Data operator with integer micro-unit scores (see
    stages/search.py for the determinism contract)."""
    from lamapi_ray.stages.search import bm25_search

    return bm25_search(_docs(sf_dir), list(SEARCH_QUERIES), k=10)


def mad_outliers(sf_dir: str) -> pa.Table:
    """Robust outlier detection per event type by MEDIAN ABSOLUTE
    DEVIATION (the data-quality staple that, unlike z-scores, a few
    extreme rows cannot poison): med = nearest-rank median of integer
    cents, MAD = nearest-rank median of |cents − med|, outlier ⟺
    |cents − med| > 3·MAD. All-integer selection arithmetic (printf-
    parity cents, ceil(n/2)-th order statistics, integer 3·MAD compare)
    ⇒ the oracle states the identical expressions. Output per type:
    (event_type, med_cents, mad_cents, n_outliers).

    Distributed shape: ``groupby(event_type).map_groups`` with one
    vectorized sort + one partition per group — same contract note as
    :func:`event_percentiles` (at huge group sizes the identical
    nearest-rank results come from a distributed selection)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def group_mad(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "med_cents": pa.array([], pa.int64()),
                    "mad_cents": pa.array([], pa.int64()),
                    "n_outliers": pa.array([], pa.int64()),
                }
            )
        import math

        cents = np.rint(
            group["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        k = math.ceil(n / 2.0) - 1
        med = int(np.partition(cents, k)[k])
        dev = np.abs(cents - med)
        mad = int(np.partition(dev, k)[k])
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "med_cents": pa.array([med], pa.int64()),
                "mad_cents": pa.array([mad], pa.int64()),
                "n_outliers": pa.array([int((dev > 3 * mad).sum())], pa.int64()),
            }
        )

    return _collect(
        ev.groupby("event_type").map_groups(group_mad, batch_format="pyarrow")
    ).sort_by("event_type")


WEEK_US = 604_800_000_000  # 7 * 86400 * 1e6 — integer epoch-weeks


def retention_cohorts(sf_dir: str) -> pa.Table:
    """Cohort retention matrix — the product-analytics staple the funnel
    family doesn't cover: users are grouped into weekly cohorts by their
    FIRST event (cohort_week = min epoch-week), and each cell counts how
    many users from a cohort were active again ``week_offset`` weeks
    later. Weeks are integer epoch-us // WEEK_US (no calendar/locale
    dependence), so the oracle states the identical ``//`` expression.
    Output: (cohort_week, week_offset, n_users); offset 0 is the cohort
    size by construction.

    Distributed shape: a user's whole history must be co-located to know
    its cohort, so events shuffle ONCE on coarse user-hash partitions
    (many users per ``map_groups`` call — never one Python call per
    user). The per-partition kernel is a single ``np.unique`` over a
    packed (user, week) key: segment starts give each user's cohort
    week, a second ``np.unique`` over packed (cohort, offset) folds the
    partition to ≤ weeks² partial rows, and the final exchange is a tiny
    ``groupby(cohort_week, week_offset).sum`` — per-user rows never
    cross the wire after the first shuffle."""
    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partition_cells(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "week_offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        wk = (
            group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // WEEK_US
        )
        # distinct (user, week) pairs, sorted → per-user segments are
        # week-ascending, so each segment's first week IS the cohort
        if len(uid) and (uid.max() >= (1 << 43) or uid.min() < 0 or wk.min() < 0):
            raise ValueError("user_id/week outside the 43/20-bit pack domain")
        pairs = np.unique((uid << 20) | wk)
        puid, pwk = pairs >> 20, pairs & ((1 << 20) - 1)
        new_user = np.concatenate([[True], puid[1:] != puid[:-1]])
        cohort = pwk[np.flatnonzero(new_user)][np.cumsum(new_user) - 1]
        cells, counts = np.unique(
            (cohort << 20) | (pwk - cohort), return_counts=True
        )
        return pa.table(
            {
                "cohort_week": pa.array(cells >> 20, pa.int64()),
                "week_offset": pa.array(cells & ((1 << 20) - 1), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return _collect(
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(partition_cells, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"], num_partitions=1)
        .aggregate(Sum("n", alias_name="n_users"))
    ).sort_by([("cohort_week", "ascending"), ("week_offset", "ascending")])


def weighted_sample(sf_dir: str, k: int = 20) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    the A-ES one-pass scheme — the weighted leg completing the sampling
    family: uniform hash bottom-k, stratified, shuffle-shard): each row
    draws ``u`` from a deterministic scrambled hash of its id and keeps
    key ``-ln(u) / w`` (w = integer cents); the k SMALLEST keys form an
    exact w-proportional sample. The key is floor-quantized to integer
    picounits with the SAME IEEE operand order as the SQL mirror, ties
    broken by event_id — fully deterministic, so the oracle states the
    identical expression.

    Dataflow: one streamed pass with a map-side local bottom-k combiner —
    the merge sees ≤ k·blocks rows at any corpus size (the cosine_topk
    merge shape)."""
    MOD = 1_000_000_007
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def local_bottomk(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)  # printf('%.0f') parity
        keep = cents > 0
        eid, uid, cents = eid[keep], uid[keep], cents[keep]
        h = (eid * 2654435761) % MOD
        u = (h + 1.0) / 1_000_000_008.0
        # floor(-ln(u) / cents * 1e12) — identical left-assoc order and
        # literals to the oracle expression
        key = np.floor(-np.log(u) / cents * 1_000_000_000_000).astype(np.int64)
        order = np.lexsort((eid, key))[:k]
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(uid[order], pa.int64()),
                "cents": pa.array(cents[order], pa.int64()),
                "key_fp": pa.array(key[order], pa.int64()),
            }
        )

    parts = _collect(
        ev.map_batches(local_bottomk, batch_format="pyarrow", zero_copy_batch=True)
    )
    eid = parts["event_id"].to_numpy(zero_copy_only=False)
    key = parts["key_fp"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, key))[:k]
    return parts.take(pa.array(order))


def watermark_window(sf_dir: str) -> pa.Table:
    """Event-time streaming window with a LATE-DATA watermark (the
    Dataflow-model semantics batch suites usually skip): rows arrive in
    a deterministic arrival sequence; the watermark is the running max
    event time over arrivals so far; a row is LATE iff its event time has
    fallen more than 2 h behind the watermark at its arrival — exactly a
    streaming engine's allowed-lateness drop rule, made deterministic by
    the explicit arrival order. The synthetic stream is time-ordered, so
    stragglers are PLANTED by the arrival permutation ``arr = event_id +
    500·[event_id % 50 == 0]`` (ties broken by event_id — every 50th
    event arrives 500 positions late; the oracle states the same
    permutation). Output: per 1 h tumbling event-time window, on-time and
    late row counts.

    The running max over a global arrival order is a DISTRIBUTED PREFIX
    SCAN: pass 1 folds per-arrival-bucket maxima map-side (one tiny
    bucket-bounded table to the driver, a tree scan at larger scale —
    buckets are ``event_id // 4096`` so the driver state is
    corpus/4096-bounded); the exclusive prefix maxima broadcast back, and
    pass 2 co-locates each bucket with ONE grouped exchange, closes the
    scan inside the bucket (vectorized ``np.maximum.accumulate``), flags
    lateness, and folds straight to (window, on_time, late) count
    partials — the second exchange is windows-bounded."""
    LATE_US = 2 * 3600 * 1_000_000
    HOUR_US = 3600 * 1_000_000
    BUCKET = 4096
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def arrival(eid: np.ndarray) -> np.ndarray:
        return eid + np.where(eid % 50 == 0, 500, 0)

    def bucket_max(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = arrival(eid) // BUCKET
        u, inv = np.unique(b, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table(
            {"bucket": pa.array(u, pa.int64()), "mx": pa.array(mx, pa.int64())}
        )

    parts = pa.concat_tables(
        ev.map_batches(bucket_max, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    pb = parts["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    pm = parts["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb = int(pb.max()) + 1 if len(pb) else 0
    bmax = np.full(nb, np.iinfo(np.int64).min, np.int64)
    np.maximum.at(bmax, pb, pm)
    # exclusive prefix max per bucket (driver state = corpus/4096 ints)
    prefix = np.full(nb, np.iinfo(np.int64).min, np.int64)
    if nb > 1:
        prefix[1:] = np.maximum.accumulate(bmax)[:-1]
    pref_ref = ray.put(prefix)

    def tag_bucket(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bucket", pa.array(arrival(eid) // BUCKET, pa.int64())
        )

    def close_scan(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_us": pa.array([], pa.int64()),
                "ot": pa.array([], pa.int64()),
                "lt": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        pref = ray.get(pref_ref)
        eid = group["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        arr = arrival(eid.astype(np.int64))
        order = np.lexsort((eid, arr))  # arrival order, event_id tie-break
        ts = ts[order]
        b = int(arr[order[0]]) // BUCKET
        run = np.maximum.accumulate(np.maximum(ts, pref[b]))
        late = ts < run - LATE_US
        win = (ts // HOUR_US) * HOUR_US
        u, inv = np.unique(win, return_inverse=True)
        ot = np.bincount(inv, weights=~late, minlength=len(u)).astype(np.int64)
        lt = np.bincount(inv, weights=late, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "window_us": pa.array(u, pa.int64()),
                "ot": pa.array(ot, pa.int64()),
                "lt": pa.array(lt, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect(
        ev.map_batches(tag_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=_scaled(0.5, 16))
        .map_groups(close_scan, batch_format="pyarrow")
        .groupby("window_us", num_partitions=_scaled(0.25, 8))
        .aggregate(Sum("ot", alias_name="n_on_time"), Sum("lt", alias_name="n_late"))
    ).sort_by("window_us")
    return pa.table(
        {
            "window_us": agg["window_us"].cast(pa.int64()),
            "n_on_time": agg["n_on_time"].cast(pa.int64()),
            "n_late": agg["n_late"].cast(pa.int64()),
        }
    )


def hybrid_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack 2009) — the
    standard lexical+semantic fusion of modern RAG stacks: the BM25
    full-text ranking (:func:`doc_search_bm25`) and the exact-cosine ANN
    ranking over the corpus embeddings (query vectors = embeddings
    vec_id < 4, aligned index-wise with the 4 text queries; corpus =
    vec_id ≥ 8, the house ANN convention) fused per query by
    ``rrf = Σ_systems 10⁶ // (60 + rank)`` — integer-exact, k=60 the
    canonical constant. Both input rankings are distributed operators;
    the fusion itself runs on the driver over their queries×2k-bounded
    outputs by design (≤ 80 rows here, never corpus-sized). Top-10 per
    query by (rrf_micro desc, doc_id asc)."""
    from lamapi_ray.stages.annsearch import cosine_topk

    lex = doc_search_bm25(sf_dir)
    q, qids = _queries_matrix(sf_dir, n=len(SEARCH_QUERIES))
    sem = cosine_topk(_corpus_ds(sf_dir), q, qids, k=10)

    acc: dict[tuple[int, int], int] = {}
    for qs, d, r in zip(
        lex["query"].to_pylist(), lex["doc_id"].to_pylist(), lex["rank"].to_pylist()
    ):
        key = (SEARCH_QUERIES.index(qs), int(d))
        acc[key] = acc.get(key, 0) + 1_000_000 // (60 + int(r))
    for qi, d, r in zip(
        sem["query_id"].to_pylist(),
        sem["neighbor_id"].to_pylist(),
        sem["rank"].to_pylist(),
    ):
        key = (int(qi), int(d))
        acc[key] = acc.get(key, 0) + 1_000_000 // (60 + int(r))

    out_q, out_d, out_r, out_s = [], [], [], []
    for qi in range(len(SEARCH_QUERIES)):
        sub = sorted(
            ((d, s) for (qj, d), s in acc.items() if qj == qi),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        for rank, (d, s) in enumerate(sub, 1):
            out_q.append(SEARCH_QUERIES[qi])
            out_d.append(d)
            out_r.append(rank)
            out_s.append(s)
    return pa.table(
        {
            "query": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "rrf_micro": pa.array(out_s, pa.int64()),
        }
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_state(group: pa.Table):
    """Shared multi-user funnel kernel over one COARSE user partition
    (many users per call — the 39× cross-join lesson applied: never one
    Python map_groups call per user). Vectorized per step: one mask +
    one ``np.minimum.at`` scatter over user codes; a user that misses a
    step is parked at t=+inf so later steps cannot revive it.

    → (user_codes_values, reached per user, t_first, t_last) where
    t_first/t_last are the step-1 / final-step completion times (int64
    us; only meaningful where reached covers them)."""
    et = group["event_type"].combine_chunks().cast(pa.string())
    ts = (
        group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
    )
    uid = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
    users, inv = np.unique(uid, return_inverse=True)
    nu = len(users)
    IMAX = np.iinfo(np.int64).max
    t_prev = np.full(nu, np.iinfo(np.int64).min, np.int64)
    reached = np.zeros(nu, np.int64)
    t_first = np.zeros(nu, np.int64)
    for si, step in enumerate(FUNNEL_STEPS):
        m = pc.equal(et, step).to_numpy(zero_copy_only=False) & (
            ts > t_prev[inv]
        )
        tmin = np.full(nu, IMAX, np.int64)
        np.minimum.at(tmin, inv[m], ts[m])
        alive = tmin != IMAX  # users parked at IMAX pass no rows, stay dead
        reached += alive
        t_prev = np.where(alive, tmin, IMAX)
        if si == 0:
            t_first = np.where(alive, tmin, 0)
    return users, reached, t_first, t_prev


def _user_pk(batch: pa.Table, P: int) -> pa.Table:
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column(
        "__upk", pa.array((uid * 2654435761) % 1_000_000_007 % P, pa.int64())
    )


def event_funnel(sf_dir: str) -> pa.Table:
    """Ordered conversion-funnel analysis: how many users performed
    'view', then 'click' STRICTLY after their first view, then 'purchase'
    strictly after that earliest qualifying click — the product-analytics
    staple (Amplitude/Mixpanel funnels) re-expressed batch-native.

    Earliest-completion semantics: step k's timestamp is the MIN event
    time of its type strictly after the step-(k−1) timestamp; a user
    counts for step k only having counted for step k−1. Strict ``>``
    makes equal-timestamp ties non-progressing, so the result is
    deterministic under any tie order.

    Dataflow: COARSE user-hash partitions co-locate each user's history
    (events pruned to (user_id, event_type, ts) at the read) with MANY
    users per ``map_groups`` call; the kernel is one masked
    ``np.minimum.at`` scatter per step over user codes — no per-user
    Python call, no per-event Python. Each partition folds straight to
    steps-bounded (step, n) partials, so the funnel counts cross the
    wire as ≤ steps·partitions ints, never per-user rows."""
    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    n_steps = len(FUNNEL_STEPS)

    def partition_counts(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"step": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        _, reached, _, _ = _funnel_state(group)
        per = np.bincount(reached, minlength=n_steps + 1).astype(np.int64)
        cum = np.cumsum(per[::-1])[::-1]  # cum[k] = users with reached >= k
        return pa.table(
            {
                "step": pa.array(np.arange(1, n_steps + 1), pa.int64()),
                "n": pa.array(cum[1:], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect(
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(partition_counts, batch_format="pyarrow")
        .groupby("step", num_partitions=1)
        .aggregate(Sum("n", alias_name="n_users"))
    ).sort_by("step")
    return pa.table(
        {
            "step": agg["step"].cast(pa.int64()),
            "event_type": pa.array(list(FUNNEL_STEPS), pa.string()),
            "n_users": agg["n_users"].cast(pa.int64()),
        }
    )


def link_lpa_communities(sf_dir: str, rounds: int = 2) -> pa.Table:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    2007) over the undirected hyperlink graph, made fully deterministic:
    l₀(v) = v; each round every node adopts the SMALLEST label among
    those with maximum frequency over its neighbors' previous labels
    (count desc, label asc — no random tie-break, no async order
    dependence), which is what lets the DuckDB oracle unroll the same
    rounds relationally. Fixed ``rounds`` (the standard fixed-sweep
    variant; convergence detection is the counter-actor pattern
    link_components uses).

    Dataflow per round: the node-bounded label vector broadcasts via
    ``ray.put`` (the pagerank/HITS state shape); one map over the
    symmetric distinct edge stream emits (node, neighbor-label) pairs
    map-side pre-counted, ONE node-bounded grouped exchange merges counts
    and takes the (count desc, label asc) argmax per node."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    def to_sym(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64()).to_numpy(
                zero_copy_only=False
            )

        s = ids(batch["src"])
        d = ids(batch["dst"])
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[first], b[first]  # map-side distinct
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    sym = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_sym, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"], num_partitions=_scaled(0.5, 16))
        .count()
        .select_columns(["a", "b"])
        .materialize()  # consumed once per round
    )

    nodes = np.unique(
        np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False)
                for b in sym.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    labels = nodes.copy()
    P = _scaled(0.5, 16)

    def merge_pick(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()), "l": pa.array([], pa.int64())}
            )
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        l = group["l"].combine_chunks().to_numpy(zero_copy_only=False)
        c = group["c"].combine_chunks().to_numpy(zero_copy_only=False)
        # merge partial counts, then argmax per v by (count desc, label asc)
        order = np.lexsort((l, v))
        v, l, c = v[order], l[order], c[order]
        first = np.concatenate([[True], (v[1:] != v[:-1]) | (l[1:] != l[:-1])])
        grp = np.cumsum(first) - 1
        cs = np.zeros(int(grp[-1]) + 1 if len(grp) else 0, np.int64)
        np.add.at(cs, grp, c)
        vv, ll = v[first], l[first]
        order2 = np.lexsort((ll, -cs, vv))
        vv, ll, cs = vv[order2], ll[order2], cs[order2]
        keep = np.concatenate([[True], vv[1:] != vv[:-1]])
        return pa.table(
            {"v": pa.array(vv[keep], pa.int64()), "l": pa.array(ll[keep], pa.int64())}
        )

    for _ in range(rounds):
        lab_ref = ray.put(labels)

        def scatter(batch: pa.Table, _l=lab_ref) -> pa.Table:
            lab = ray.get(_l)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            nl = lab[np.searchsorted(nodes, b)]  # every endpoint IS a node
            key_order = np.lexsort((nl, a))
            a2, nl2 = a[key_order], nl[key_order]
            first = np.concatenate(
                [[True], (a2[1:] != a2[:-1]) | (nl2[1:] != nl2[:-1])]
            ) if len(a2) else np.array([], bool)
            grp = np.cumsum(first) - 1 if len(a2) else np.array([], np.int64)
            cnt = np.bincount(grp).astype(np.int64) if len(a2) else np.array([], np.int64)
            va, la = a2[first] if len(a2) else a2, nl2[first] if len(a2) else nl2
            return pa.table(
                {
                    "v": pa.array(va, pa.int64()),
                    "l": pa.array(la, pa.int64()),
                    "c": pa.array(cnt, pa.int64()),
                    "__bucket": pa.array(va % np.int64(P), pa.int64()),
                }
            )

        new = pa.concat_tables(
            sym.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket", num_partitions=P)
            .map_groups(merge_pick, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        nl = labels.copy()
        if len(new):
            nv = new["v"].to_numpy(zero_copy_only=False)
            nlab = new["l"].to_numpy(zero_copy_only=False)
            nl[np.searchsorted(nodes, nv)] = nlab
        labels = nl

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "community": pa.array(labels, pa.int64()),
        }
    )


def link_kcore(
    sf_dir: str, max_rounds: int = 12, broadcast_max: int = 50_000_000
) -> pa.Table:
    """k-core decomposition of the undirected hyperlink graph by
    ITERATED H-INDEX (Lü et al. 2016, "The H-index of a network node"):
    core₀(v) = deg(v); each round coreₜ₊₁(v) = h-index of its
    neighbors' coreₜ values; the fixed point IS the core number. The
    iteration is monotone non-increasing, so extra rounds after
    convergence are no-ops — which is exactly what lets the DuckDB
    oracle unroll a FIXED ``max_rounds`` while the engine stops at
    convergence (raises if the graph hasn't converged by ``max_rounds``
    so the parity bound is never silently broken; the test graphs
    converge in ≤ 5).

    The organic anchor graph alone is core-degenerate (everything ≤ 2),
    so — like link_triangles' triads — the edge stream is unioned with
    deterministic "related-pages" 6-cliques over {d..d+5} for every
    d ≡ 0 (mod 50), d+5 < |docs|, giving a layered 1..6 core structure
    the oracle restates over the same arithmetic.

    Dataflow per round: the node-bounded core vector broadcasts via
    ``ray.put`` (the pagerank/LPA state shape); one map over the
    symmetric distinct edge stream emits map-side pre-counted
    (v, neighbor-core, count) partials, and each node's h-index comes
    from the (value desc, cumulative count) prefix of its merged
    counts: h = max(min(value, cumcount)). The partial merge follows
    entity_pagerank's two paths: node-bounded partials fold on the
    driver while nodes fit ``broadcast_max`` (≤ distinct (v, core)
    pairs per block cross the wire — never per-edge rows), else ONE
    coarse-hash grouped exchange (__bucket = v % P — many nodes per
    map_groups call, never one Python call per node)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    import pyarrow.parquet as pq

    ndocs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def to_sym(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64()).to_numpy(
                zero_copy_only=False
            )

        s = ids(batch["src"])
        d = ids(batch["dst"])
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[first], b[first]  # map-side distinct
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    def cliques(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d0 = did[(did % 50 == 0) & (did + 5 < ndocs)]
        ii, jj = np.triu_indices(6, k=1)
        s = (d0[:, None] + ii[None, :]).ravel()
        d = (d0[:, None] + jj[None, :]).ravel()
        return pa.table(
            {
                "a": pa.array(np.concatenate([s, d]), pa.int64()),
                "b": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    sym = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_sym, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _docs(sf_dir, cols=("doc_id",)).map_batches(
                cliques, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby(["a", "b"], num_partitions=_scaled(0.5, 16))
        .count()
        .select_columns(["a", "b"])
        .materialize()  # consumed once per round
    )

    nodes = np.unique(
        np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False)
                for b in sym.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    P = _scaled(0.5, 16)
    # core_0 = degree: one map-side bincount pass over the distinct edges
    core = np.zeros(len(nodes), np.int64)
    for bt in sym.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        av = bt["a"].to_numpy(zero_copy_only=False)
        np.add.at(core, np.searchsorted(nodes, av), 1)

    def merge_hindex(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
            )
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        nv = group["nv"].combine_chunks().to_numpy(zero_copy_only=False)
        c = group["c"].combine_chunks().to_numpy(zero_copy_only=False)
        # merge partial counts per (v, nv), then h = max(min(nv, cum))
        # over the value-descending cumulative-count prefix per v
        order = np.lexsort((-nv, v))
        v, nv, c = v[order], nv[order], c[order]
        first = np.concatenate([[True], (v[1:] != v[:-1]) | (nv[1:] != nv[:-1])])
        grp = np.cumsum(first) - 1
        cm = np.zeros(int(grp[-1]) + 1, np.int64)
        np.add.at(cm, grp, c)
        vv, nn = v[first], nv[first]
        starts = np.flatnonzero(np.concatenate([[True], vv[1:] != vv[:-1]]))
        seg = np.repeat(starts, np.diff(np.concatenate([starts, [len(vv)]])))
        cum = np.cumsum(cm) - np.concatenate([[0], np.cumsum(cm)])[seg]
        h = np.maximum.reduceat(np.minimum(nn, cum), starts)
        return pa.table(
            {
                "v": pa.array(vv[starts], pa.int64()),
                "h": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    for rnd in range(max_rounds):
        core_ref = ray.put(core)

        def scatter(batch: pa.Table, _c=core_ref) -> pa.Table:
            cr = ray.get(_c)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            nv = cr[np.searchsorted(nodes, b)]  # every endpoint IS a node
            order = np.lexsort((nv, a))
            a2, nv2 = a[order], nv[order]
            first = np.concatenate(
                [[True], (a2[1:] != a2[:-1]) | (nv2[1:] != nv2[:-1])]
            ) if len(a2) else np.array([], bool)
            grp = np.cumsum(first) - 1 if len(a2) else np.array([], np.int64)
            cnt = (
                np.bincount(grp).astype(np.int64)
                if len(a2)
                else np.array([], np.int64)
            )
            va = a2[first] if len(a2) else a2
            na = nv2[first] if len(a2) else nv2
            return pa.table(
                {
                    "v": pa.array(va, pa.int64()),
                    "nv": pa.array(na, pa.int64()),
                    "c": pa.array(cnt, pa.int64()),
                    "__bucket": pa.array(va % np.int64(P), pa.int64()),
                }
            )

        scattered = sym.map_batches(
            scatter, batch_format="pyarrow", zero_copy_batch=True
        )
        if len(nodes) <= broadcast_max:
            # node-bounded partials fold on the driver (pagerank's
            # broadcast fast path) — one distributed pass, no exchange
            parts = [
                b.drop_columns(["__bucket"])
                for b in scattered.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            if not parts:
                break
            new = merge_hindex(pa.concat_tables(parts))
        else:
            new = pa.concat_tables(
                scattered.groupby("__bucket", num_partitions=P)
                .map_groups(merge_hindex, batch_format="pyarrow")
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            )
        nc = core.copy()
        if len(new):
            nvv = new["v"].to_numpy(zero_copy_only=False)
            nh = new["h"].to_numpy(zero_copy_only=False)
            nc[np.searchsorted(nodes, nvv)] = nh
        if np.array_equal(nc, core):
            break
        core = nc
    else:
        raise RuntimeError(
            f"k-core h-index iteration did not converge in {max_rounds} "
            "rounds — raise max_rounds AND the oracle unroll together"
        )

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "core": pa.array(core, pa.int64()),
        }
    )


def link_random_walks(
    sf_dir: str, steps: int = 3, seed_mod: int = 17
) -> pa.Table:
    """DeepWalk-corpus generation over the DIRECTED hyperlink graph —
    the graph-embedding training-data primitive: one walk per seed node
    (``node % seed_mod == 0``), each step moving to the out-neighbor of
    rank ``H % outdeg(v)`` among the DISTINCT out-neighbors sorted
    ascending (0-based), with the fully deterministic step hash

        H = ((walk % M)·1315423911 % M + step·2654435761 % M
             + (v % M)·97 % M) % M,   M = 1e9+7

    so the DuckDB oracle unrolls the identical integer expression. A
    dead end (no out-neighbors) ends the walk. Output: one row per
    visited position — (walk, step, node), step 0 at the seed.

    Dataflow: the edge stream is ranked ONCE (coarse src-hash grouped
    exchange → per-src 0-based dst-ascending rank + out-degree, packed
    into a sorted uint64 (src, rank) key column) and materialized; per
    step the walk-bounded frontier's wanted (v, H % deg) keys broadcast
    via ``ray.put`` (the BFS frontier shape) and ONE map over the
    ranked edges emits only matched (key, dst) rows — walk-bounded, so
    the per-step exchange never carries per-edge rows. Out-degrees are
    looked up from the node-bounded (node, deg) vector broadcast once.
    Node/degree bounds are guarded (43-bit node, 20-bit rank)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    M = 1_000_000_007
    P = _scaled(0.5, 16)

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64()).to_numpy(
                zero_copy_only=False
            )

        s = ids(batch["src"])
        d = ids(batch["dst"])
        keep = s != d
        s, d = s[keep], d[keep]
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        if len(s):
            first = np.concatenate([[True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
            s, d = s[first], d[first]  # map-side distinct
        return pa.table({"s": pa.array(s, pa.int64()), "d": pa.array(d, pa.int64())})

    def rank_src(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "d": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        s = group["s"].combine_chunks().to_numpy(zero_copy_only=False)
        d = group["d"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(s)]]))
        rn = np.arange(len(s)) - np.repeat(starts, lens)
        deg = np.repeat(lens, lens).astype(np.int64)
        if s.max() >= (1 << 43) or s.min() < 0 or deg.max() >= (1 << 20):
            raise ValueError("node/out-degree outside the 43/20-bit pack domain")
        return pa.table(
            {
                "key": pa.array((s << 20) | rn, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    ranked = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s", "d"], num_partitions=P)
        .count()
        .select_columns(["s", "d"])
        .map_batches(
            lambda b: b.append_column(
                "__spk",
                pa.array(
                    (b["s"].to_numpy(zero_copy_only=False) * 2654435761)
                    % M
                    % P,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__spk", num_partitions=P)
        .map_groups(rank_src, batch_format="pyarrow")
        .materialize()  # consumed once per step
    )

    # node-bounded (node, out-degree) vector — one pass, driver fold
    srcs, degs = [], []
    for bt in ranked.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        sv = bt["s"].to_numpy(zero_copy_only=False)
        dv = bt["deg"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], sv[1:] != sv[:-1]]) if len(sv) else []
        srcs.append(sv[first])
        degs.append(dv[first])
    sall = np.concatenate(srcs or [np.array([], np.int64)])
    dall = np.concatenate(degs or [np.array([], np.int64)])
    order = np.argsort(sall, kind="stable")
    # per-src (rank 0) rows are unique per block; blocks partition srcs
    src_nodes, src_deg = sall[order], dall[order]
    keep = np.concatenate([[True], src_nodes[1:] != src_nodes[:-1]]) if len(
        src_nodes
    ) else np.array([], bool)
    src_nodes, src_deg = src_nodes[keep], src_deg[keep]

    # all graph nodes (sources ∪ targets) for the seed rule
    dst_parts = [
        np.unique(bt["d"].to_numpy(zero_copy_only=False))
        for bt in ranked.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    nodes = np.unique(np.concatenate([src_nodes] + dst_parts))
    seeds = nodes[nodes % seed_mod == 0]

    walks = [seeds]  # step 0
    steps_out = [np.zeros(len(seeds), np.int64)]
    nodes_out = [seeds]
    cur_walk, cur_v = seeds, seeds
    for st in range(1, steps + 1):
        # wanted rank per live walk: H % outdeg(v); dead ends drop out
        if len(src_nodes) == 0:
            break
        pos = np.minimum(np.searchsorted(src_nodes, cur_v), len(src_nodes) - 1)
        alive = src_nodes[pos] == cur_v
        cur_walk, cur_v = cur_walk[alive], cur_v[alive]
        if len(cur_walk) == 0:
            break
        dg = src_deg[np.searchsorted(src_nodes, cur_v)]
        h = (
            (cur_walk % M) * 1315423911 % M
            + st * 2654435761 % M
            + (cur_v % M) * 97 % M
        ) % M
        want_key = (cur_v << 20) | (h % dg)
        uniq_keys = np.unique(want_key)
        keys_ref = ray.put(uniq_keys)

        def match(batch: pa.Table, _k=keys_ref) -> pa.Table:
            wanted = ray.get(_k)
            kv = batch["key"].to_numpy(zero_copy_only=False)
            p = np.searchsorted(wanted, kv)
            p = np.minimum(p, max(len(wanted) - 1, 0))
            hit = (len(wanted) > 0) & (wanted[p] == kv)
            return pa.table(
                {
                    "key": pa.array(kv[hit], pa.int64()),
                    "d": pa.array(
                        batch["d"].to_numpy(zero_copy_only=False)[hit], pa.int64()
                    ),
                }
            )

        got = pa.concat_tables(
            list(
                ranked.map_batches(
                    match, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            )
            or [pa.table({"key": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64())})]
        )
        gk = got["key"].to_numpy(zero_copy_only=False)
        gd = got["d"].to_numpy(zero_copy_only=False)
        gorder = np.argsort(gk, kind="stable")
        gk, gd = gk[gorder], gd[gorder]
        cur_v = gd[np.searchsorted(gk, want_key)]
        walks.append(cur_walk)
        steps_out.append(np.full(len(cur_walk), st, np.int64))
        nodes_out.append(cur_v)

    return pa.table(
        {
            "walk": pa.array(np.concatenate(walks), pa.int64()),
            "step": pa.array(np.concatenate(steps_out), pa.int64()),
            "node": pa.array(np.concatenate(nodes_out), pa.int64()),
        }
    ).sort_by([("walk", "ascending"), ("step", "ascending")])


def zorder_layout(sf_dir: str) -> pa.Table:
    """Z-order (Morton-curve) physical layout of the distinct
    (l_orderkey, l_partkey) key pairs — the multi-dimensional
    data-layout primitive a lakehouse uses so range predicates on
    EITHER key prune contiguous file ranges: z interleaves the low 21
    bits of both keys (orderkey on odd bit positions), and rows sort by
    z. The interleave is pure integer bit arithmetic, so the oracle
    states the identical 42 shift/mask terms (generated SQL). Output:
    (l_orderkey, l_partkey, z) sorted by z.

    Dataflow: keys pruned at the read; ONE distinct exchange on the
    pair; z computed vectorized map-side (21 masked shifts per key, no
    per-row Python); the final order is Ray Data's range-partitioned
    distributed sort on z — exactly the write path that would feed
    partitioned Parquet at 100 TB. Keys guarded to the 21-bit domain."""
    P = _scaled(0.5, 16)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def add_z(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(o) and (
            o.max() >= (1 << 21) or p.max() >= (1 << 21)
            or o.min() < 0 or p.min() < 0
        ):
            raise ValueError("key outside the 21-bit Morton domain")
        z = np.zeros(len(o), np.int64)
        for b in range(21):
            z |= ((o >> b) & 1) << (2 * b + 1)
            z |= ((p >> b) & 1) << (2 * b)
        return pa.table(
            {
                "l_orderkey": pa.array(o, pa.int64()),
                "l_partkey": pa.array(p, pa.int64()),
                "z": pa.array(z, pa.int64()),
            }
        )

    def local_distinct(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(o) and (o.max() >= (1 << 21) or o.min() < 0):
            raise ValueError("key outside the 21-bit Morton domain")
        key = np.unique((o << 21) | p)  # map-side distinct before the wire
        return pa.table(
            {
                "l_orderkey": pa.array(key >> 21, pa.int64()),
                "l_partkey": pa.array(key & ((1 << 21) - 1), pa.int64()),
            }
        )

    return _collect(
        li.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_orderkey", "l_partkey"], num_partitions=P)
        .count()
        .select_columns(["l_orderkey", "l_partkey"])
        .map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
        .sort("z")
    )


def user_rfm_features(sf_dir: str) -> pa.Table:
    """Per-user RFM feature engineering (recency / frequency / monetary
    — the churn-model feature staple) in one pass, all-integer: last_ts
    (max event time), n_events, sum_cents (printf-parity integer cents),
    n_active_days (distinct epoch-days), n_purchase (event_type =
    'purchase' count). Output one row per user.

    Dataflow: per-batch partial rows fold per user inside ONE coarse
    user-hash grouped exchange (many users per ``map_groups`` call);
    the only non-trivially-mergeable feature, distinct active days,
    ships as per-batch distinct (user, day) pairs — day-bounded per
    user, so the exchange stays ~user-bounded, never per-event."""
    P = _scaled(0.5, 16)
    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_type"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if isinstance(batch["ts"], pa.ChunkedArray)
            else batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        users, inv = np.unique(uid, return_inverse=True)
        nu = len(users)
        last = np.full(nu, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(last, inv, ts)
        cnt = np.bincount(inv, minlength=nu).astype(np.int64)
        cts = np.bincount(inv, weights=cents, minlength=nu).astype(np.int64)
        npur = np.bincount(inv[is_p], minlength=nu).astype(np.int64)
        # distinct (user, day) pairs for the day fold
        day = ts // DAY_US
        if len(uid) and (users.max() >= (1 << 43) or day.min() < 0):
            raise ValueError("user_id/day outside the 43/20-bit pack domain")
        ud = np.unique((uid << 20) | day)
        days_rows = pa.table(
            {
                "user_id": pa.array(ud >> 20, pa.int64()),
                "last_ts": pa.array(np.full(len(ud), np.iinfo(np.int64).min),
                                    pa.int64()),
                "n_events": pa.array(np.zeros(len(ud), np.int64), pa.int64()),
                "sum_cents": pa.array(np.zeros(len(ud), np.int64), pa.int64()),
                "n_purchase": pa.array(np.zeros(len(ud), np.int64), pa.int64()),
                "day": pa.array(ud & ((1 << 20) - 1), pa.int64()),
            }
        )
        stat_rows = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "last_ts": pa.array(last, pa.int64()),
                "n_events": pa.array(cnt, pa.int64()),
                "sum_cents": pa.array(cts, pa.int64()),
                "n_purchase": pa.array(npur, pa.int64()),
                "day": pa.array(np.full(nu, -1), pa.int64()),
            }
        )
        out = pa.concat_tables([stat_rows, days_rows])
        return out.append_column(
            "__upk",
            pa.array(
                (out["user_id"].to_numpy(zero_copy_only=False) * 2654435761)
                % 1_000_000_007
                % P,
                pa.int64(),
            ),
        )

    def merge(group: pa.Table) -> pa.Table:
        cols = ["user_id", "last_ts", "n_events", "sum_cents",
                "n_purchase", "n_active_days"]
        if len(group) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uid = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = group["day"].combine_chunks().to_numpy(zero_copy_only=False)
        users, inv = np.unique(uid, return_inverse=True)
        nu = len(users)
        is_stat = day < 0
        last = np.full(nu, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(
            last, inv[is_stat],
            group["last_ts"].combine_chunks().to_numpy(
                zero_copy_only=False
            )[is_stat],
        )
        cnt = np.bincount(
            inv[is_stat],
            weights=group["n_events"].combine_chunks().to_numpy(
                zero_copy_only=False
            )[is_stat],
            minlength=nu,
        ).astype(np.int64)
        cts = np.bincount(
            inv[is_stat],
            weights=group["sum_cents"].combine_chunks().to_numpy(
                zero_copy_only=False
            )[is_stat],
            minlength=nu,
        ).astype(np.int64)
        npur = np.bincount(
            inv[is_stat],
            weights=group["n_purchase"].combine_chunks().to_numpy(
                zero_copy_only=False
            )[is_stat],
            minlength=nu,
        ).astype(np.int64)
        # distinct days across batch partials
        ud = np.unique((uid[~is_stat] << 20) | day[~is_stat])
        ndays = np.bincount(
            np.searchsorted(users, ud >> 20), minlength=nu
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "last_ts": pa.array(last, pa.int64()),
                "n_events": pa.array(cnt, pa.int64()),
                "sum_cents": pa.array(cts, pa.int64()),
                "n_purchase": pa.array(npur, pa.int64()),
                "n_active_days": pa.array(ndays, pa.int64()),
            }
        )

    out = _collect(
        ev.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__upk", num_partitions=P)
        .map_groups(lambda g: merge(g.drop_columns(["__upk"])),
                    batch_format="pyarrow")
    ).sort_by("user_id")
    # last_ts back to timestamp for the schema-stable surface
    return out.set_column(
        out.schema.get_field_index("last_ts"),
        "last_ts",
        out["last_ts"].cast(pa.timestamp("us")),
    )


def walk_skipgrams(sf_dir: str, window: int = 2) -> pa.Table:
    """Skip-gram (center, context) pair extraction from the DeepWalk
    corpus — the word2vec-style training-pair step that follows
    :func:`link_random_walks` in an embedding pipeline: within each
    walk, every ordered pair of positions at distance 1..``window``
    yields one pair (both directions), counted across all walks.
    Output: (center, context, n_pairs).

    Dataflow: walks are generated by the walk op (walk-bounded), pairs
    come from ONE vectorized positional self-alignment per walk batch
    (walks arrive walk-ordered, offsets by +k alignment — no join), and
    the count fold is a pair-bounded groupby. At corpus scale the walk
    table streams from the walk op's partitioned output instead of a
    driver table; the kernel is unchanged."""
    w = link_random_walks(sf_dir)
    wa = w["walk"].to_numpy(zero_copy_only=False)
    st = w["step"].to_numpy(zero_copy_only=False)
    nd = w["node"].to_numpy(zero_copy_only=False)
    # rows are (walk, step)-sorted: +k alignment pairs positions k apart
    cen, ctx = [], []
    for k in range(1, window + 1):
        if len(wa) <= k:
            break
        same = (wa[k:] == wa[:-k]) & (st[k:] == st[:-k] + k)
        a, b = nd[:-k][same], nd[k:][same]
        cen.append(np.concatenate([a, b]))
        ctx.append(np.concatenate([b, a]))
    if not cen:
        return pa.table(
            {
                "center": pa.array([], pa.int64()),
                "context": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
            }
        )
    c = np.concatenate(cen)
    x = np.concatenate(ctx)
    if c.max() >= (1 << 31) or x.max() >= (1 << 31):
        raise ValueError("node id outside the 31-bit pack domain")
    key = (c << 31) | x
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table(
        {
            "center": pa.array(uk >> 31, pa.int64()),
            "context": pa.array(uk & ((1 << 31) - 1), pa.int64()),
            "n_pairs": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    ).sort_by([("center", "ascending"), ("context", "ascending")])


def link_graph_stats(sf_dir: str) -> pa.Table:
    """Global structure statistics of the directed hyperlink graph as
    INTEGER sufficient statistics (no float drift — the oracle states
    the same sums; assortativity/reciprocity are one division away for
    the consumer): n_nodes, n_edges (distinct directed, no self-loops),
    n_reciprocal (edges whose reverse also exists), and the
    degree-assortativity sums over edges (x = outdeg(src),
    y = indeg(dst)): sum_x, sum_y, sum_xy, sum_x2, sum_y2.

    Dataflow: distinct edges once (coarse exchange); out/in degree
    vectors are node-bounded driver folds (the kcore/BFS state shape);
    reciprocity via one vectorized membership of (d,s) keys in the
    sorted (s,d) key set; the sums are one map over the edge stream.
    All sums guarded against int64 overflow (degrees < 2^20, edges
    counted ≤ 2^40)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    P = _scaled(0.5, 16)

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64()).to_numpy(
                zero_copy_only=False
            )

        s = ids(batch["src"])
        d = ids(batch["dst"])
        keep = s != d
        return pa.table(
            {"s": pa.array(s[keep], pa.int64()), "d": pa.array(d[keep], pa.int64())}
        )

    edges = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s", "d"], num_partitions=P)
        .count()
        .select_columns(["s", "d"])
        .materialize()  # consumed thrice (degrees, keys, sums)
    )

    # node-bounded degree folds + the sorted edge-key set
    out_n, out_c, in_n, in_c, keys = [], [], [], [], []
    for bt in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        s = bt["s"].to_numpy(zero_copy_only=False)
        d = bt["d"].to_numpy(zero_copy_only=False)
        u, c = np.unique(s, return_counts=True)
        out_n.append(u)
        out_c.append(c)
        u, c = np.unique(d, return_counts=True)
        in_n.append(u)
        in_c.append(c)
        if len(s) and (s.max() >= (1 << 31) or d.max() >= (1 << 31)):
            raise ValueError("node id outside the 31-bit pack domain")
        keys.append((s << 31) | d)

    def fold(ns, cs):
        n = np.concatenate(ns or [np.array([], np.int64)])
        c = np.concatenate(cs or [np.array([], np.int64)])
        order = np.argsort(n, kind="stable")
        n, c = n[order], c[order]
        starts = np.flatnonzero(
            np.concatenate([[True], n[1:] != n[:-1]])
        ) if len(n) else np.array([], np.int64)
        return (
            n[starts],
            np.add.reduceat(c, starts).astype(np.int64)
            if len(n)
            else np.array([], np.int64),
        )

    onodes, odeg = fold(out_n, out_c)
    inodes, ideg = fold(in_n, in_c)
    ekeys = np.sort(np.concatenate(keys or [np.array([], np.int64)]))
    n_nodes = len(np.union1d(onodes, inodes))
    n_edges = len(ekeys)

    # reciprocity + assortativity sums in one more pass over the edges
    n_recip = 0
    sx = sy = sxy = sx2 = sy2 = 0
    for bt in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        s = bt["s"].to_numpy(zero_copy_only=False)
        d = bt["d"].to_numpy(zero_copy_only=False)
        rev = (d << 31) | s
        p = np.minimum(np.searchsorted(ekeys, rev), max(n_edges - 1, 0))
        n_recip += int((ekeys[p] == rev).sum()) if n_edges else 0
        x = odeg[np.searchsorted(onodes, s)]
        y = ideg[np.searchsorted(inodes, d)]
        sx += int(x.sum())
        sy += int(y.sum())
        sxy += int((x * y).sum())
        sx2 += int((x * x).sum())
        sy2 += int((y * y).sum())

    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_reciprocal": pa.array([n_recip], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
            "sum_x2": pa.array([sx2], pa.int64()),
            "sum_y2": pa.array([sy2], pa.int64()),
        }
    )


def link_bfs_hops(sf_dir: str, max_hops: int = 3, seed_mod: int = 31) -> pa.Table:
    """k-hop BFS reachability over the DIRECTED hyperlink graph from a
    seed set (here the deterministic rule ``node % seed_mod == 0``) — the
    crawl-frontier expansion / neighborhood-extraction primitive: dist(v)
    = min #hops from any seed following link direction, nodes beyond
    ``max_hops`` omitted. Output (node, dist), dist ∈ [0, max_hops].

    Dataflow: distinct edges once; per BFS round ONE map over the edge
    stream (frontier broadcast as a sorted int64 array — node-bounded,
    exactly the pagerank/HITS broadcast-state shape) + a node-bounded
    distinct collect of the new frontier; ``max_hops`` rounds total.
    Beyond broadcastable node counts the same rounds run as Pregel
    exchanges (frontier semi-join on src, grouped distinct on dst)."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table({"s": ids(batch["src"]), "d": ids(batch["dst"])})

    edges = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()  # consumed once per BFS round
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate([s, d])), pa.int64())}
        )

    nodes = np.unique(
        np.concatenate(
            [
                b["node"].to_numpy(zero_copy_only=False)
                for b in edges.map_batches(
                    endpoints, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    dist = np.full(len(nodes), -1, np.int64)
    frontier = nodes[nodes % seed_mod == 0]
    dist[np.searchsorted(nodes, frontier)] = 0

    for hop in range(1, max_hops + 1):
        if len(frontier) == 0:
            break
        f_ref = ray.put(np.sort(frontier))

        def expand(batch: pa.Table, _f=f_ref) -> pa.Table:
            f = ray.get(_f)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(f, s)
            hit = (pos < len(f)) & (f[np.minimum(pos, len(f) - 1)] == s)
            return pa.table(
                {"node": pa.array(np.unique(d[hit]), pa.int64())}
            )

        reached = np.unique(
            np.concatenate(
                [
                    b["node"].to_numpy(zero_copy_only=False)
                    for b in edges.map_batches(
                        expand, batch_format="pyarrow", zero_copy_batch=True
                    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
                ]
                or [np.array([], np.int64)]
            )
        )
        idx = np.searchsorted(nodes, reached)
        new = dist[idx] == -1
        dist[idx[new]] = hop
        frontier = reached[new]

    keep = dist >= 0
    return pa.table(
        {
            "node": pa.array(nodes[keep], pa.int64()),
            "dist": pa.array(dist[keep], pa.int64()),
        }
    )


def funnel_times(sf_dir: str) -> pa.Table:
    """Per-user conversion latency for funnel completers: for every user
    who finished view → click → purchase under the strict
    earliest-completion semantics of :func:`event_funnel`, the exact
    microseconds from the first view to the completing purchase — the
    time-to-convert distribution product analytics reads next. Integer
    timestamp arithmetic end to end (no float durations), one row per
    converting user (user-bounded output), same coarse user-hash
    partitions + multi-user masked-scatter kernel as the funnel itself
    (:func:`_funnel_state` — no per-user map_groups call)."""
    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    n_steps = len(FUNNEL_STEPS)

    def partition_times(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "us_to_convert": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        users, reached, t_first, t_last = _funnel_state(group)
        done = reached == n_steps
        if not done.any():
            return empty
        return pa.table(
            {
                "user_id": pa.array(users[done].astype(np.int64), pa.int64()),
                "us_to_convert": pa.array(
                    (t_last[done] - t_first[done]).astype(np.int64), pa.int64()
                ),
            }
        )

    return _collect(
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(partition_times, batch_format="pyarrow")
    ).sort_by("user_id")


def link_components(sf_dir: str) -> pa.Table:
    """Weakly connected components of the hyperlink graph — the web-graph
    partitioning step (crawl frontier sharding, per-community processing)
    and the same primitive the dedup family's cluster assignment runs on.
    Chain: pages → anchor extraction → int node ids → the house
    distributed min-label components (stages/dedup.py::_cc_min_labels:
    ONE grouped exchange per round, per-partition local fixpoints +
    shortcut edges, counter-actor convergence — rounds track
    partition-crossing hops, not raw diameter). Output: (node,
    component = min node id of its component), every endpoint present."""
    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import _cc_min_labels
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table(
            {"id_a": ids(batch["src"]), "id_b": ids(batch["dst"])}
        )

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    out = _cc_min_labels(edges)
    return pa.table(
        {
            "node": out["node"].combine_chunks().cast(pa.int64()),
            "component": out["label"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by("node")


def component_sizes(sf_dir: str) -> pa.Table:
    """Connected-component SIZE distribution of the hyperlink graph —
    the web-graph health report (giant-component share, fragment tail)
    read before sharding a crawl by component: histogram rows
    (size, n_components), plus the giant component as its own row by
    construction (it is the largest size present). Built on the house
    distributed min-label components (:func:`link_components` chain);
    the size fold is a component-bounded groupby-count and the
    histogram a size-bounded second count — per-node rows leave the
    wire after the first fold."""
    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import _cc_min_labels
    from lamapi_ray.stages.linkgraph import extract_links

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table(
            {"id_a": ids(batch["src"]), "id_b": ids(batch["dst"])}
        )

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    labels = _cc_min_labels(edges)
    sizes = labels.group_by("label").aggregate([("node", "count")])
    hist = (
        pa.table({"size": sizes["node_count"].cast(pa.int64())})
        .group_by("size")
        .aggregate([("size", "count")])
    )
    return pa.table(
        {
            "size": hist["size"].combine_chunks(),
            "n_components": hist["size_count"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by("size")


def gzip_shard_roundtrip(sf_dir: str) -> pa.Table:
    """Compressed-shard ingestion e2e: docs → range-bucketed .tsv.gz shard
    blobs → shard reader → rows; byte-exact vs the source table."""
    from lamapi_ray.sources.gzipshards import read_gzip_shards, write_gzip_shards

    shards = write_gzip_shards(_docs(sf_dir), shard_size=50)
    return _collect(read_gzip_shards(shards)).sort_by("doc_id")


def doc_embed_hash(sf_dir: str) -> pa.Table:
    """Batched-inference stage: deterministic feature-hash embeddings
    (long format, integer-exact — see stages/embed.py)."""
    from lamapi_ray.stages.embed import hash_embed

    return _collect(hash_embed(_docs(sf_dir), dims=16)).sort_by(
        [("doc_id", "ascending"), ("dim", "ascending")]
    )


def chunk_windows(sf_dir: str) -> pa.Table:
    """RAG-style chunking: overlapping 32-token windows at stride 24, one
    fully vectorized row-local flat expansion (stages/chunking.py)."""
    from lamapi_ray.stages.chunking import chunk_documents

    return _collect(chunk_documents(_docs(sf_dir), window=32, stride=24)).sort_by(
        [("doc_id", "ascending"), ("chunk_id", "ascending")]
    )


def sequence_pack_split(sf_dir: str) -> pa.Table:
    """GPT-style pack-and-split (docs split across capacity-256 sequences,
    no padding waste) — the vectorized sibling of sequence_packing."""
    from lamapi_ray.stages.packing import pack_split_sequences

    return _collect(
        pack_split_sequences(_docs(sf_dir), capacity=256, bucket_size=64)
    ).sort_by([("doc_id", "ascending"), ("seq_id", "ascending")])


def unigram_perplexity(sf_dir: str) -> pa.Table:
    """KenLM-style curation scoring: add-one-smoothed unigram LM trained on
    the corpus, every doc scored for perplexity against it. Per-token
    surprisals are integer micro-nats so per-doc sums are order-exact; see
    stages/lmscore.py."""
    from lamapi_ray.stages.lmscore import perplexity_pipeline

    return _collect(perplexity_pipeline(_docs(sf_dir))).sort_by("doc_id")


def sequence_packing(sf_dir: str) -> pa.Table:
    """Greedy per-bucket sequence packing (capacity 256 whitespace tokens,
    bucket = doc_id // 64) — the context-window fill step of a pretraining
    pipeline. Buckets are independent so the sequential recurrence
    parallelizes across buckets; see stages/packing.py."""
    from lamapi_ray.stages.packing import pack_sequences

    return _collect(
        pack_sequences(_docs(sf_dir), capacity=256, bucket_size=64)
    ).sort_by("doc_id")


def multimodal_decode_png(sf_dir: str) -> pa.Table:
    """REAL PNG decode (pure-Python/numpy codec over stdlib zlib, filter
    type rotating per doc) through the actor-pool decoder. PNG is lossless,
    so the oracle is the same closed-form pixel arithmetic as the BMP
    fixture query."""
    from lamapi_ray.stages.multimodal import attach_png_payload

    return _collect(
        decode_payloads(attach_png_payload(_docs(sf_dir)), mode="real")
    )


def audio_features(sf_dir: str) -> pa.Table:
    """REAL audio decode + feature extraction: deterministic RIFF/WAVE
    PCM16 clips (pure-numpy codec) through the actor-pool extractor —
    duration, exact-arithmetic RMS, peak, zero crossings. The audio leg of
    the multimodal family (reference carries only text/graph payloads;
    this is part of the LLM-training-data operator surface)."""
    from lamapi_ray.stages.multimodal import attach_wav_payload, extract_audio_features

    return _collect(extract_audio_features(attach_wav_payload(_docs(sf_dir))))


def audio_downsample(sf_dir: str) -> pa.Table:
    """REAL audio decimation: WAV decode → every 2nd sample → re-encode at
    half the rate; the oracle restates the kept-sample arithmetic."""
    from lamapi_ray.stages.multimodal import attach_wav_payload, downsample_audio

    out = _collect(downsample_audio(attach_wav_payload(_docs(sf_dir)), factor=2))
    return out.drop_columns(["payload"])


def multimodal_resize(sf_dir: str) -> pa.Table:
    """REAL decode → nearest-neighbor resize to 16×16 → re-encode; the
    oracle reproduces the resampling index arithmetic exactly."""
    from lamapi_ray.stages.multimodal import attach_image_payload, resize_payloads

    out = _collect(resize_payloads(attach_image_payload(_docs(sf_dir)), 16, 16))
    return out.drop_columns(["payload"])


def video_mjpeg_frames(sf_dir: str) -> pa.Table:
    """REAL compressed-video decode: MJPEG-AVI clips (baseline-JPEG frames
    in a RIFF container) frame-sampled at stride 1 through the actor pool.
    Flat-gray-at-q75 frames roundtrip pixel-exact → closed-form oracle."""
    from lamapi_ray.stages.multimodal import attach_avi_payload, sample_frames

    return _collect(sample_frames(attach_avi_payload(_docs(sf_dir)), stride=1))


def video_mp4_frames(sf_dir: str) -> pa.Table:
    """REAL MP4 decode: MJPEG-in-MP4 clips (ISO BMFF container walk +
    stbl sample index + in-repo baseline-JPEG frames) frame-sampled at
    stride 1. Same flat-gray fixtures as the AVI leg → same closed-form
    oracle; inter-frame sample entries gate at codec dispatch."""
    from lamapi_ray.stages.multimodal import attach_mp4_payload, sample_frames

    return _collect(sample_frames(attach_mp4_payload(_docs(sf_dir)), stride=1))


def multimodal_frames(sf_dir: str) -> pa.Table:
    """REAL RAWV frame sampling (every 2nd frame, one row per kept frame)."""
    from lamapi_ray.stages.multimodal import attach_video_payload, sample_frames

    return _collect(sample_frames(attach_video_payload(_docs(sf_dir)), stride=2))


# --- literal classification corpus ---------------------------------------


def literal_classify(sf_dir: str) -> pa.Table:
    docs = _docs(sf_dir, ("text",))

    def doc_tokens(batch: pa.Table) -> pa.Table:
        # per-batch distinct combiner, all arrow kernels: split → flatten →
        # unique (space-split matches the reference's value tokenization)
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.unique(pc.list_flatten(pc.split_pattern(col, " ")))
        return pa.table({"value": toks.cast(pa.string())})

    tok_ds = docs.map_batches(doc_tokens, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {"value": pc.unique(t["o_orderpriority"].combine_chunks()).cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_shipdate"]
    )

    def li_vals(batch: pa.Table) -> pa.Table:
        # per-batch distinct combiner — the quantity/date domains are tiny,
        # so the downstream distinct shuffle sees ~hundreds of rows per block
        qty = [str(v) for v in pc.unique(batch["l_quantity"].combine_chunks()).to_pylist()]
        dates = pc.unique(
            pc.strftime(batch["l_shipdate"], format="%Y-%m-%d").combine_chunks()
        ).to_pylist()
        return pa.table({"value": pa.array(sorted(set(qty + dates)), pa.string())})

    # 64k-row batches: the combiner's output is (distinct domain) × (#batches),
    # so bigger batches shrink the distinct shuffle ~40× (160k → 4k rows at
    # sf0.1) for the same streaming memory envelope (2 narrow columns).
    li_ds = li.map_batches(
        li_vals, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )

    from lamapi_ray.stages.dedup import scaled_partitions

    distinct = (
        tok_ds.union(orders)
        .union(li_ds)
        # combiner output is domain-bounded (~4k rows at sf0.1), so the
        # distinct shuffle width scales with the cluster, not a constant
        .groupby("value", num_partitions=scaled_partitions(0.25, 4))
        .count()
        .select_columns(["value"])
    )
    tbl = _collect(distinct)
    labels = classify_array(tbl["value"])
    recs = [XML_DATATYPES[lab] for lab in labels]
    return pa.table(
        {
            "value": tbl["value"].combine_chunks().cast(pa.string()),
            "datatype": pa.array([r["datatype"] for r in recs], pa.string()),
            "classification": pa.array([r["classification"] for r in recs], pa.string()),
            "tag": pa.array([r["tag"] for r in recs], pa.string()),
            "xml_datatype": pa.array([r["xml_datatype"] for r in recs], pa.string()),
        }
    )


# --- lookup parity (J1/J3) ------------------------------------------------


def _part_keys(sf_dir: str, n: int = 100) -> pa.Table:
    keys = [f"Q{100000 + k}" for k in range(n)] + ["Q99999999"]
    return pa.table({"entity": pa.array(keys, pa.string())})


def _semi_join(table: pa.Table, keys: pa.Table, on: str) -> pa.Table:
    """Batch point-lookup (Mongo ``$in``) — broadcast semi-join; missing
    keys silently absent (reference types_retriever.py:11-12 semantics).
    Membership is one ``pc.is_in`` kernel per batch against the broadcast
    key array — no per-row Python."""
    key_arr = pc.unique(keys["entity"].combine_chunks().cast(pa.string()))
    key_ref = ray.put(key_arr)
    ds = ray.data.from_arrow(table)

    def flt(batch: pa.Table) -> pa.Table:
        col = batch[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = pc.is_in(col.cast(pa.string()), value_set=ray.get(key_ref))
        return batch.filter(mask)

    return _collect(ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True))


def lookup_types(sf_dir: str, items: pa.Table) -> pa.Table:
    sub = _semi_join(items.select(["entity", "types"]), _part_keys(sf_dir), "entity")
    ents, tys = [], []
    for e, ts in zip(sub["entity"].to_pylist(), sub["types"].to_pylist()):
        for t in ts or []:
            ents.append(e)
            tys.append(t)
    return pa.table(
        {"entity": pa.array(ents, pa.string()), "type": pa.array(tys, pa.string())}
    )


def lookup_labels(sf_dir: str, items: pa.Table) -> pa.Table:
    return _semi_join(items.select(["entity", "label"]), _part_keys(sf_dir), "entity")


def lookup_labels_lang(sf_dir: str, lang: str = "de") -> pa.Table:
    """Language-filtered label lookup (labels_retriever.py:37-41 ``lang``
    parameter parity): per requested QID return the label in ONE language
    from the per-language labels map; entities without that language are
    silently absent — the reference filters the labels dict the same way."""
    tbl = _collect(_dump_tables(sf_dir)["items"])
    ents, labs = [], []
    for e, ls in zip(tbl["entity"].to_pylist(), tbl["labels"].to_pylist()):
        for rec in ls or []:
            if rec["lang"] == lang:
                ents.append(e)
                labs.append(rec["value"])
    per_lang = pa.table(
        {"entity": pa.array(ents, pa.string()), "label": pa.array(labs, pa.string())}
    )
    return _semi_join(per_lang, _part_keys(sf_dir), "entity")


def lookup_objects(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    sub = _semi_join(adjacency, _part_keys(sf_dir), "subj")
    return sub.rename_columns(["entity", "pred", "obj"])


def lookup_literals(sf_dir: str, literals: pa.Table) -> pa.Table:
    return _semi_join(literals, _part_keys(sf_dir), "entity")


def lookup_sameas(sf_dir: str) -> pa.Table:
    """Sameas crosswalk lookup — served from the ``mappings`` table the dump
    ingest builds out of enwiki sitelink titles (reference
    parse_wikidata_dump.py:17 crosswalk collection; sameas_retriever.py
    ``$in`` semantics: requested ids without a crosswalk row are silently
    absent)."""
    maps = _collect(_dump_tables(sf_dir)["mappings"])
    sub = _semi_join(maps, _part_keys(sf_dir), "entity").sort_by("entity")
    titles = sub["value"].to_pylist()
    return pa.table(
        {
            "entity": sub["entity"].combine_chunks().cast(pa.string()),
            "wikipedia_id": pa.array([f"wiki/{t}" for t in titles], pa.string()),
            "dbpedia_id": pa.array([f"dbpedia:{t}" for t in titles], pa.string()),
        }
    )


def entity_cooccurrence(sf_dir: str, linked: pa.Table) -> pa.Table:
    """Entity co-occurrence graph over linked mentions: undirected edges
    (e1 < e2) weighted by the number of pages on which both entities were
    linked — the entity-graph construction step KG-embedding/relatedness
    pipelines consume downstream of entity linking.

    Scale shape: pairs are expanded INSIDE one coarse url-hash partition
    (vectorized run detection + per-run-length expansion — work bounded by
    entities-per-page², never corpus²), then ONE (e1, e2) grouped count.
    Nothing corpus-sized touches the driver; the linked stream stays
    distributed end to end."""
    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds

    if isinstance(linked, ray.data.Dataset):  # streaming input (bench path)
        ds = linked.select_columns(["url", "id"])
    else:
        ds = ray.data.from_arrow(linked.select(["url", "id"]))

    def coarse_key(batch: pa.Table) -> pa.Table:
        from lamapi_ray.functions.inthash import hash_string_array

        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        # deterministic cross-process hash — every row of one url MUST land
        # in the same partition or its pairs would be silently split
        h = hash_string_array(url).view(np.int64)
        return batch.append_column(
            "__pk", pa.array(np.abs(h) % 16, pa.int64())
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"e1": pa.array([], pa.string()), "e2": pa.array([], pa.string())}
        )
        if len(group) == 0:
            return empty
        url = group["url"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = group["id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, url))
        url, eid = url[order], eid[order]
        keep = np.concatenate(
            [[True], (url[1:] != url[:-1]) | (eid[1:] != eid[:-1])]
        )
        url, eid = url[keep], eid[keep]
        starts, lens = _run_bounds([url])
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            xs.append(eid[ia])  # run is id-sorted and deduped → e1 < e2
            ys.append(eid[ib])
        if not xs:
            return empty
        return pa.table(
            {
                "e1": pa.array(np.concatenate(xs).tolist(), pa.string()),
                "e2": pa.array(np.concatenate(ys).tolist(), pa.string()),
            }
        )

    counted = (
        ds.map_batches(coarse_key, batch_format="pyarrow")
        .groupby("__pk", num_partitions=_scaled(0.5, 16))
        .map_groups(partition_pairs, batch_format="pyarrow")
        .groupby(["e1", "e2"], num_partitions=_scaled(0.5, 16))
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "e1": batch["e1"],
                "e2": batch["e2"],
                "n_pages": batch["count()"].cast(pa.int64()),
            }
        )

    return _collect(
        counted.map_batches(finish, batch_format="pyarrow")
    ).sort_by([("e1", "ascending"), ("e2", "ascending")])


def predicates_pairs(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """J3 semantics: for (subj, obj) pairs, the predicates connecting them
    (predicates_retriever.py:52-73) — pairs from early orders' co-lineitems.

    Join direction matters at scale: the PAIR set is vocabulary²-bounded
    (distinct co-occurring part pairs), so it is collected once and
    broadcast via ``ray.put``; the ADJACENCY — the full KG, billions of
    edges at 100 TB — streams through a per-batch arrow hash semi-join and
    is never collected (same shape as ``kg.py::entity_triples``)."""
    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["l_orderkey"], 100)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partition_pairs(group: pa.Table) -> pa.Table:
        """Pairs for every order in one coarse partition — vectorized run
        detection + per-run-length pair expansion, no per-order Python."""
        if len(group) == 0:
            return pa.table(
                {"px": pa.array([], pa.int64()), "py": pa.array([], pa.int64())}
            )
        ok = group["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pk = group["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate([[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])])
        ok, pk = ok[keep], pk[keep]
        starts, lens = _run_bounds([ok])
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            xs.extend((pk[ia], pk[ib]))  # both directions: x≠y ordered pairs
            ys.extend((pk[ib], pk[ia]))
        if not xs:
            return pa.table(
                {"px": pa.array([], pa.int64()), "py": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "px": pa.array(np.concatenate(xs), pa.int64()),
                "py": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    def coarse_key(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"]
        if isinstance(okey, pa.ChunkedArray):
            okey = okey.combine_chunks()
        k = (
            okey.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        ) % np.uint64(16)
        return batch.append_column("__pk", pa.array(k.astype(np.int64), pa.int64()))

    distinct = (
        li.map_batches(coarse_key, batch_format="pyarrow")
        .groupby("__pk", num_partitions=_scaled(0.5, 16))
        .map_groups(partition_pairs, batch_format="pyarrow")
        .groupby(["px", "py"], num_partitions=_scaled(0.5, 16))
        .count()
    )
    pairs_tbl = _collect(distinct.select_columns(["px", "py"]))
    qx = pc.binary_join_element_wise(
        pa.array(["Q"] * len(pairs_tbl)),
        pc.cast(pc.add(pairs_tbl["px"].combine_chunks(), 100000), pa.string()),
        "",
    )
    qy = pc.binary_join_element_wise(
        pa.array(["Q"] * len(pairs_tbl)),
        pc.cast(pc.add(pairs_tbl["py"].combine_chunks(), 100000), pa.string()),
        "",
    )
    pairs_q = pa.table({"subj": qx, "obj": qy})
    pairs_ref = ray.put(pairs_q)

    adj_ds = ray.data.from_arrow(adjacency)

    def semi(batch: pa.Table) -> pa.Table:
        p = ray.get(pairs_ref)
        return batch.join(p, keys=["subj", "obj"], join_type="inner").select(
            ["subj", "obj", "pred"]
        )

    out = _collect(adj_ds.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True))
    return out.select(["subj", "obj", "pred"])


# --- dictionary NER + BoW similarity --------------------------------------


def ner_dictionary(page_links: pa.Table, items: pa.Table) -> pa.Table:
    """M12 parity: spaCy is stubbed; NER = dictionary tagging via the linked
    entity's NERtype (ner_recognizer.py:7-29 analogue, surface-index-driven)."""
    ner_map = dict(zip(items["entity"].to_pylist(), items["NERtype"].to_pylist()))
    tags = [ner_map.get(i) for i in page_links["id"].to_pylist()]
    return pa.table(
        {
            "url": page_links["url"].combine_chunks().cast(pa.string()),
            "mention": page_links["mention"].combine_chunks().cast(pa.string()),
            "NERtype": pa.array(tags, pa.string()),
        }
    )


def bow_similarity(
    pages: ray.data.Dataset, page_links: pa.Table, surface_forms: pa.Table
) -> pa.Table:
    """F7/J7 parity with BoW fidelity: per-entity bag of words built from
    the entity's surface names AND description (the reference's
    ``items_vectors2`` gzip-pickle blob becomes a plain token set —
    bow_retriever.py:66-74,129-137), page tokens normalized like
    ``tokenize_text`` (:58-64: lowercase, alphanumeric-only, stopword
    filter — NLTK ``word_tokenize``/corpus stopwords are env-absent, so
    whitespace split + a fixed stoplist + ``^[a-z0-9]+$`` stand in,
    documented), similarity = |page ∩ bow| / |page tokens| rounded 2 and
    ``matched_words`` = sorted intersection (:147-161), emitted
    space-joined.

    Dataflow: pages ⋈ links is the bucketed hash join (both sides
    page-scale at 100 TB); scoring is vectorized — page tokens explode via
    arrow kernels, (entity, token) membership is ONE ``is_in`` against the
    vocabulary-bounded bow pair-key set, per-row counts are bincounts;
    Python touches only the matched words (a few per link)."""
    import pyarrow.compute as _pc

    from lamapi_ray.stages.textstats import STOPLISTS, round_ref_array

    stop = STOPLISTS["en"]
    import re as _re

    alnum = _re.compile(r"^[a-z0-9]+$")

    def _toks(text: str) -> set:
        return {
            t
            for t in text.lower().split(" ")
            if t and t not in stop and alnum.match(t)
        }

    bow_pairs: set[str] = set()
    for i, name, desc in zip(
        surface_forms["id"].to_pylist(),
        surface_forms["name"].to_pylist(),
        surface_forms["description"].to_pylist(),
    ):
        for t in _toks(name or "") | _toks(desc or ""):
            bow_pairs.add(i + "\x1f" + t)
    pair_arr = pa.array(sorted(bow_pairs), pa.string())
    pair_ref = ray.put(pair_arr)

    links = ray.data.from_arrow(
        pa.table(
            {
                "url": page_links["url"].combine_chunks().cast(pa.string()),
                "id": page_links["id"].combine_chunks().cast(pa.string()),
            }
        ).group_by(["url", "id"]).aggregate([])
    )
    joined = bucketed_hash_join(
        pages.select_columns(["url", "text"]), links, on="url", num_buckets=16
    )

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"url": pa.array([], pa.string()), "id": pa.array([], pa.string()),
                 "bow_sim": pa.array([], pa.float64()),
                 "matched_words": pa.array([], pa.string())}
            )
        pairs = ray.get(pair_ref)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = batch["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks = _pc.split_pattern(_pc.utf8_lower(text.cast(pa.string())), " ")
        flat = _pc.list_flatten(toks)
        parents = _pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = _pc.and_(
            _pc.match_substring_regex(flat, "^[a-z0-9]+$"),
            _pc.invert(_pc.is_in(flat, value_set=pa.array(sorted(stop), pa.string()))),
        ).to_numpy(zero_copy_only=False)
        kidx = np.nonzero(keep)[0]
        kflat = _pc.take(flat, pa.array(kidx))
        kparents = parents[kidx]
        # distinct (row, token): dictionary-encode + unique pair keys
        enc = _pc.dictionary_encode(kflat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        ncodes = max(len(enc.dictionary), 1)
        ukey = np.unique(kparents.astype(np.int64) * ncodes + codes)
        urow = (ukey // ncodes).astype(np.int64)
        ucode = (ukey % ncodes).astype(np.int64)
        utok = _pc.take(enc.dictionary, pa.array(ucode))
        # membership of (id_of_row, token) in the bow pair set — one is_in
        row_ids = _pc.take(ids, pa.array(urow))
        keys = _pc.binary_join_element_wise(row_ids, utok, "\x1f")
        hit = _pc.is_in(keys, value_set=pairs).to_numpy(zero_copy_only=False)
        ntok = np.bincount(urow, minlength=n).astype(np.float64)
        inter = np.bincount(urow[hit], minlength=n).astype(np.float64)
        sims = round_ref_array(
            np.divide(inter, ntok, out=np.zeros(n), where=ntok > 0), 2
        )
        # matched words per row (Python only over the hits)
        matched: list[list[str]] = [[] for _ in range(n)]
        hit_rows = urow[hit]
        for r, t in zip(hit_rows, _pc.take(utok, pa.array(np.nonzero(hit)[0])).to_pylist()):
            matched[r].append(t)
        mw = [" ".join(sorted(m)) for m in matched]
        out = pa.table(
            {
                "url": batch["url"],
                "id": ids,
                "bow_sim": pa.array(sims, pa.float64()),
                "matched_words": pa.array(mw, pa.string()),
            }
        )
        # A page with zero kept tokens has no BoW at all — the reference's
        # inner token join drops the link entirely (and the SQL oracle's
        # `pe JOIN pn` agrees), so emit no row rather than bow_sim=0.0.
        return out.filter(pa.array(ntok > 0))

    return _collect(joined.map_batches(score, batch_format="pyarrow"))


# --- column analysis (M13) -------------------------------------------------


def column_analysis(sf_dir: str) -> pa.Table:
    """M13 parity: per-column majority literal-datatype + NE/LIT tag via the
    actor-pool ColumnClassifierModel (ST2 — model state once per actor,
    stages/column_classifier.py); partial counts combine per batch before
    the one small shuffle."""
    from lamapi_ray.stages.column_classifier import classify_columns

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def explode(batch: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for c in cols:
            vals = [str(v) for v in batch[c].to_pylist()]
            out_c.extend([c] * len(vals))
            out_v.extend(vals)
        return pa.table(
            {
                "column": pa.array(out_c, pa.string()),
                "value": pa.array(out_v, pa.string()),
            }
        )

    return classify_columns(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    )


# --- Wikidata dump ingest e2e (S1 + M1-M4, oracle-checked) ----------------


def _synth_dump_path(sf_dir: str) -> str:
    """Deterministic wikidata-style JSON dump derived from the part table.

    One entity per part: Q(100000+k); en label = p_name ('de '/'fr '
    prefixed labels on even / %3==0 keys for the language-filtered lookup);
    description =
    p_type; sitelinks count = k % 5 (→ popularity max(k%5, 1)); every 7th
    part carries a P279 claim (→ category "type"); claims: P31 → Q9001
    (wikibase-item), P6 quantity = p_retailprice, P9 string = p_brand, plus
    one wikibase-lexeme claim that the parser must skip. A malformed line is
    injected to exercise the skip path. The oracle SQL reproduces the same
    derivation from `part` directly.
    """
    import hashlib
    import json
    import os

    import pyarrow.parquet as pq

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/lamapi_dump_v3_{tag}.json"
    if os.path.exists(path):
        return path
    parts = (
        pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_name", "p_type", "p_brand", "p_retailprice"],
        )
        .sort_by("p_partkey")
        .to_pylist()
    )
    lines = ["["]
    for p in parts:
        k = int(p["p_partkey"])
        claims = {
            "P31": [{"mainsnak": {"datatype": "wikibase-item",
                                  "datavalue": {"value": {"id": "Q9001"}}}}],
            "P6": [{"mainsnak": {"datatype": "quantity",
                                 "datavalue": {"value": {"amount": str(p["p_retailprice"])}}}}],
            "P9": [{"mainsnak": {"datatype": "string",
                                 "datavalue": {"value": p["p_brand"]}}}],
            "P99": [{"mainsnak": {"datatype": "wikibase-lexeme",
                                  "datavalue": {"value": {"id": "L1"}}}}],
        }
        if k % 7 == 0:
            claims["P279"] = [{"mainsnak": {"datatype": "wikibase-item",
                                            "datavalue": {"value": {"id": "Q9001"}}}}]
        labels = {"en": {"value": p["p_name"]}}
        if k % 2 == 0:  # deterministic per-language coverage for the
            labels["de"] = {"value": "de " + p["p_name"]}  # lang-filtered lookup
        if k % 3 == 0:
            labels["fr"] = {"value": "fr " + p["p_name"]}
        entity = {
            "id": f"Q{100000 + k}",
            "labels": labels,
            "aliases": {},
            "descriptions": {"en": {"value": p["p_type"]}},
            "sitelinks": (
                {
                    "enwiki": {"title": p["p_name"].replace(" ", "_")},
                    **{f"wiki{i}": {} for i in range(1, k % 5)},
                }
                if k % 5 >= 1
                else {}
            ),
            "claims": claims,
        }
        lines.append(json.dumps(entity, sort_keys=True) + ",")
    lines.append("{not json},")  # malformed-line skip (ref :252-253)
    lines.append("]")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines))
    os.replace(tmp, path)
    return path


def _dump_tables(sf_dir: str):
    from lamapi_ray.sources.wikidata import read_dump, split_tables

    return split_tables(read_dump(_synth_dump_path(sf_dir)))


def wikidata_mappings(sf_dir: str) -> pa.Table:
    """The ``mappings`` cross-KG id crosswalk (curid / wikipedia_id /
    wikidata_id / dbpedia_id). The reference declares this collection's
    schema (scripts/parse_wikidata_dump.py:17) and indexes it
    (build_mongo_indexes.py) but never populates it; here it is DERIVED
    from the parsed dump items as a vectorized map stage: wikipedia_id =
    underscored en label, dbpedia_id = 'dbr:' + wikipedia_id, curid = a
    deterministic page id from the QID number."""
    import numpy as np

    def to_map(batch: pa.Table) -> pa.Table:
        ent = batch["entity"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        ent = ent.cast(pa.string())
        # vectorized en-label: flatten list<struct{lang,value}>, keep the
        # FIRST en record per item (dump quirk parity with wikidata_items)
        labels = batch["labels"]
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        flat = pc.list_flatten(labels)
        parents = pc.list_parent_indices(labels).to_numpy(zero_copy_only=False)
        en_mask = pc.equal(pc.struct_field(flat, "lang"), "en").to_numpy(
            zero_copy_only=False
        )
        vals = pc.struct_field(flat, "value")
        sel = np.nonzero(en_mask)[0]
        first_parent, first_at = np.unique(parents[sel], return_index=True)
        lab = np.full(len(batch), None, dtype=object)
        picked = pc.take(vals, pa.array(sel[first_at])).to_pylist()
        lab[first_parent] = picked
        lab_arr = pa.array(lab, pa.string())
        qid_num = pc.cast(pc.utf8_slice_codeunits(ent, 1, 1 << 30), pa.int64())
        curid = pc.add(pc.multiply(pc.subtract(qid_num, 100000), 3), 1000000)
        wp = pc.replace_substring(lab_arr, " ", "_")
        return pa.table(
            {
                "curid": curid.cast(pa.int64()),
                "wikipedia_id": wp,
                "wikidata_id": ent,
                "dbpedia_id": pc.binary_join_element_wise("dbr:", wp, ""),
            }
        )

    return _collect(
        _dump_tables(sf_dir)["items"].map_batches(
            to_map, batch_format="pyarrow", zero_copy_batch=True
        )
    ).sort_by("curid")


def wikidata_items(sf_dir: str) -> pa.Table:
    tbl = _collect(_dump_tables(sf_dir)["items"])

    def en_label(labels):
        for rec in labels or []:
            if rec["lang"] == "en":
                return rec["value"]
        return None

    return pa.table(
        {
            "entity": tbl["entity"].combine_chunks().cast(pa.string()),
            "label": pa.array([en_label(x) for x in tbl["labels"].to_pylist()], pa.string()),
            "description": tbl["description"].combine_chunks().cast(pa.string()),
            "popularity": tbl["popularity"].combine_chunks().cast(pa.int64()),
            "category": tbl["category"].combine_chunks().cast(pa.string()),
        }
    )


def wikidata_triples(sf_dir: str) -> pa.Table:
    return _collect(_dump_tables(sf_dir)["triples"])


def wikidata_literals(sf_dir: str) -> pa.Table:
    return _collect(_dump_tables(sf_dir)["literals"])


def candidates_bm25(mentions_tbl: pa.Table, ctx, limit: int) -> pa.Table:
    """ES BM25 relevance-ordered retrieval for every distinct pipeline
    mention (the reference's actual hit order — elastic.py:31-64; see
    SurfaceIndex.bm25_hits for the formula and documented tie-break)."""
    from lamapi_ray.stages.candidates import generate_candidates_bm25

    dm = sorted(set(mentions_tbl["mention"].to_pylist()))
    ds = ray.data.from_arrow(pa.table({"mention": pa.array(dm, pa.string())}))
    return _collect(
        generate_candidates_bm25(ds, ctx.surface_refs, ctx.type_names, limit)
    )


# --- fuzzy + filtered retrieval (F8 parity) and forced candidates (J6) ----


def candidates_filtered(mentions_tbl: pa.Table, ctx, limit: int) -> pa.Table:
    """F8 fuzzy+filtered retrieval parity (lookup_retriever.py:261-290):
    every distinct pipeline mention gets a 1-edit typo ('x' prepended to
    its first token) and is retrieved with ``fuzziness: auto`` plus
    ``kind = entity`` / ``NERtype = OTHERS`` term filters — the full scored
    candidate chain (A5/A6/F1-F3/O4) runs on the fuzzy hit set."""
    from lamapi_ray.stages.candidates import generate_candidates

    dm = sorted(set(mentions_tbl["mention"].to_pylist()))
    fm = ray.data.from_arrow(
        pa.table({"mention": pa.array(["x" + m for m in dm], pa.string())})
    )
    cands = generate_candidates(
        fm,
        ctx.surface_refs,
        ctx.type_names,
        limit=limit,
        retrieve_kwargs={"fuzzy": True, "kind": "entity", "nertype": "OTHERS"},
    )
    return _collect(cands)


def forced_candidates(
    sf_dir: str, mentions_tbl: pa.Table, candidates_tbl: pa.Table, ctx, limit: int
) -> pa.Table:
    """J6 ``_check_ids`` forced-candidate union (lookup_retriever.py:213-234,
    247-259): per distinct mention, two deterministically derived requested
    QIDs; ids already present among the mention's candidates are removed
    (anti-join); the remainder are id-looked-up as their English non-alias
    label row (create_ids_query ``must``: match id, language en, is_alias
    False), scored with F1-F3 against the mention, given rank scores over
    the id-hit list, and appended to the candidate set (``forced = true``).

    Documented deviations from the reference: (a) the reference passes
    ``limit=1`` to the ids query so at most ONE forced candidate returns,
    ranked by ES BM25 relevance — an ES-scoring artifact; we return every
    requested id's label row with a deterministic (popularity DESC, id ASC)
    ordering. (b) ``es_score`` for id-matches is a BM25 ratio; an id match
    is exact, so we emit the uniform 1.0."""
    import pyarrow.parquet as pq

    from lamapi_ray.functions.text import round_ref, scored_pair

    npart = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    dm = sorted(set(mentions_tbl["mention"].to_pylist()))
    forced_pairs = []
    for m in dm:
        forced_pairs.append((m, f"Q{500000 + len(m) % 5}"))
        forced_pairs.append((m, f"Q{100000 + (len(m) * 7) % npart}"))

    found = set(
        zip(candidates_tbl["mention"].to_pylist(), candidates_tbl["id"].to_pylist())
    )
    missing = [(m, fid) for m, fid in forced_pairs if (m, fid) not in found]

    sf = ctx.surface_forms
    label_rows: dict[str, dict] = {}
    mask = pc.invert(sf["is_alias"].combine_chunks())
    lab = sf.filter(mask)
    for i in range(len(lab)):
        label_rows[lab["id"][i].as_py()] = {
            c: lab[c][i].as_py() for c in lab.column_names
        }

    feats: dict[str, tuple[float, float]] = {}
    for m, a, c in zip(
        candidates_tbl["mention"].to_pylist(),
        candidates_tbl["ambiguity_mention"].to_pylist(),
        candidates_tbl["corrects_tokens"].to_pylist(),
    ):
        feats.setdefault(m, (a, c))

    # group missing by mention; order by popularity desc, id asc
    from collections import defaultdict

    by_mention: dict[str, list[dict]] = defaultdict(list)
    for m, fid in missing:
        row = label_rows.get(fid)
        if row is not None:
            by_mention[m].append(row)

    out_rows = []
    for m in sorted(by_mention):
        hits = sorted(by_mention[m], key=lambda r: (-r["popularity"], r["id"]))
        n = len(hits)
        amb, corr = feats.get(m, (0.0, 0.0))
        for rank, r in enumerate(hits, 1):
            ed, jac, jac3 = scored_pair(r["surface_norm"], m)
            out_rows.append(
                {
                    "mention": m,
                    "id": r["id"],
                    "name": r["name"],
                    "description": r["description"],
                    "types": r["types"],
                    "type_names": " ".join(
                        ctx.type_names.get(t, t) for t in r["types"].split(" ") if t
                    ),
                    "kind": r["kind"],
                    "NERtype": r["NERtype"],
                    "ambiguity_mention": amb,
                    "corrects_tokens": corr,
                    "ntoken_mention": len(m.split(" ")),
                    "ntoken_entity": r["ntoken"],
                    "length_mention": len(m),
                    "length_entity": r["length"],
                    "popularity": r["popularity"],
                    "pos_score": round_ref(rank / n, 3),
                    "es_score": 1.0,
                    "ed_score": ed,
                    "jaccard_score": jac,
                    "jaccardNgram_score": jac3,
                    "forced": True,
                }
            )

    base = candidates_tbl.drop_columns(["is_best"]).append_column(
        "forced", pa.array([False] * len(candidates_tbl), pa.bool_())
    )
    if out_rows:
        appended = pa.Table.from_pylist(out_rows, schema=base.schema)
        return pa.concat_tables([base, appended])
    return base


def simhash_near_dup(sf_dir: str) -> pa.Table:
    from lamapi_ray.stages.dedup import simhash_near_pairs

    return simhash_near_pairs(_dup_corpus(sf_dir, modify=True), "doc_id", "text")


def _dup_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Embeddings table with injected exact-duplicate vectors (every 5th
    vec copied to id+1e6) — shared corpus for the near-dup queries."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = ids % 5 == 0
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        import numpy as _np

        sel = pa.array(_np.nonzero(mask)[0])
        return pa.table(
            {
                "vec_id": pa.array(
                    np.concatenate([ids, ids[mask] + 1_000_000]).astype(np.int64),
                    pa.int64(),
                ),
                "embedding": pa.concat_arrays([emb, emb.take(sel)]),
            }
        )

    return ds.map_batches(dup, batch_format="pyarrow", zero_copy_batch=True)


def _round_pairs(out: pa.Table) -> pa.Table:
    from lamapi_ray.index.surface import _round_arr

    cos = out["cosine"].combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "id_a": out["id_a"],
            "id_b": out["id_b"],
            "cosine": pa.array(_round_arr(cos, 6), pa.float64()),
        }
    )


def embedding_near_dup(sf_dir: str) -> pa.Table:
    """EXACT embedding-cosine near-duplicate pairs (chunk-pair-blocked
    distributed all-pairs — matches the exact SQL oracle by construction;
    Θ(n²) dot products is the exact contract's price)."""
    from lamapi_ray.stages.annsearch import exact_cosine_near_pairs

    return _round_pairs(
        exact_cosine_near_pairs(_dup_embeddings(sf_dir), threshold=0.999)
    )


def semdedup(sf_dir: str) -> pa.Table:
    """SemDeDup (Abbas 2023) over the house duplicate-injected embedding
    corpus: fixed-point k-means (k=8, 3 iters — the same fit the
    ``kmeans_clusters`` oracle unrolls) partitions the embedding space,
    then each vector is dropped iff a lower-id member of its OWN cluster
    sits at cosine ≥ 0.95 (the planted exact copies; organic max cosine
    in this corpus is ≈0.51, so the threshold is knife-edge-safe). See
    stages/kmeans.py::semdedup for the scale contract (k grows with the
    corpus so the within-cluster pairwise block stays bounded)."""
    from lamapi_ray.stages.kmeans import semdedup as _sd

    return _collect(
        _sd(_dup_embeddings(sf_dir), k=8, iters=3, tau=0.95)
    ).sort_by("vec_id")


def embedding_dup_clusters(sf_dir: str) -> pa.Table:
    """Near-duplicate CLUSTERS over embeddings — completes the embedding
    dedup family: the exact above-threshold pair set (chunk-pair-blocked
    all-pairs) feeds the SAME distributed min-label connected-components
    engine the text dedup family uses (one grouped exchange per round,
    local fixpoints, counter-actor convergence); singleton vectors appear
    via a self-edge union and keep their own id. → (vec_id, cluster =
    min vec_id of the component)."""
    from lamapi_ray.stages.annsearch import exact_cosine_near_pairs
    from lamapi_ray.stages.dedup import _cc_min_labels

    ds = _dup_embeddings(sf_dir)
    pairs = exact_cosine_near_pairs(ds, threshold=0.999).select(["id_a", "id_b"])

    def self_edges(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.cast(pa.int64())
        return pa.table({"id_a": ids, "id_b": ids})

    edges = ray.data.from_arrow(pairs).union(
        ds.map_batches(self_edges, batch_format="pyarrow", zero_copy_batch=True)
    )
    labels = _cc_min_labels(edges)
    return pa.table(
        {
            "vec_id": labels["node"].combine_chunks().cast(pa.int64()),
            "cluster": labels["label"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by("vec_id")


def embedding_near_dup_lsh(sf_dir: str) -> pa.Table:
    """Sub-quadratic sign-LSH near-duplicate pairs over the same corpus —
    the scale path (approximate: ≥2-bit code-distance borderline pairs can
    be missed; exact duplicates never are). ``planes`` is pinned to 16 here
    so the seeded hyperplanes inline into the relational oracle (the
    banding rule is mirrored exactly in SQL); production callers use
    ``planes=None`` → :func:`auto_planes` corpus-size scaling (unit-tested
    + asserted equal to the exact path on fixtures)."""
    from lamapi_ray.stages.annsearch import cosine_near_pairs

    return _round_pairs(
        cosine_near_pairs(_dup_embeddings(sf_dir), threshold=0.999, planes=16)
    )


# --- KG graph analytics (stages/graph.py) ----------------------------------


def kg_degrees(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """Per-entity out/in degree over the KG edge list — combiner partial
    counts per batch, ONE vocabulary-bounded groupby.sum.
    See :func:`lamapi_ray.stages.graph.degrees`."""
    from lamapi_ray.stages import graph
    from lamapi_ray.stages.dedup import scaled_partitions

    edges = ray.data.from_arrow(adjacency).repartition(scaled_partitions(1.0, 8))
    return _collect(graph.degrees(edges)).sort_by("entity")


def kg_negative_samples(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """TransE-style negative sampling over the KG edge list: for each
    (subj, pred, obj) edge, two object-corrupted candidates drawn
    WITHIN obj's entity class (part/supplier/customer/nation/region/
    type — realistic same-type negatives) by deterministic arithmetic
    ``o' = base + ((o − base + 31·s + 7·p + 13·k + 1) mod class_size)``,
    then accidental positives removed by an anti-join against the real
    edge set (packed-int64 keys, sorted membership — the edge set is
    KG-vocabulary-bounded, not corpus-sized, so the key array broadcast
    is the right shape; at 10⁹-edge scale this becomes the hash
    semi-join the dedup family already uses). Dataflow runs as ONE
    map_batches over the edge Dataset."""
    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.stages.dedup import scaled_partitions

    sizes = {
        c: pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows
        for c, t in [
            (1, "part"), (2, "supplier"), (3, "customer"),
            (4, "nation"), (5, "region"),
        ]
    }

    def ints(col, strip):
        arr = adjacency[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pc.cast(
            pc.utf8_slice_codeunits(arr, strip), pa.int64()
        ).to_numpy(zero_copy_only=False)

    s_all = ints("subj", 1)
    p_all = ints("pred", 1)
    o_all = ints("obj", 1)
    real_keys = np.sort((s_all * 10_000_000 + o_all) * 128 + p_all)
    real_ref = ray.put(real_keys)

    cls_sizes = np.array(
        [5, sizes[1], sizes[2], sizes[3], sizes[4], sizes[5]], dtype=np.int64
    )

    def corrupt(batch: pa.Table) -> pa.Table:
        real = ray.get(real_ref)
        s = pc.cast(
            pc.utf8_slice_codeunits(batch["subj"].combine_chunks() if isinstance(
                batch["subj"], pa.ChunkedArray) else batch["subj"], 1),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        p = pc.cast(
            pc.utf8_slice_codeunits(batch["pred"].combine_chunks() if isinstance(
                batch["pred"], pa.ChunkedArray) else batch["pred"], 1),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        o = pc.cast(
            pc.utf8_slice_codeunits(batch["obj"].combine_chunks() if isinstance(
                batch["obj"], pa.ChunkedArray) else batch["obj"], 1),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        cls = o // 100000  # 0 = type class (Q9001..Q9005)
        base = np.where(cls == 0, 9001, cls * 100000)
        sz = cls_sizes[cls]
        outs = []
        for k in (0, 1):
            no = base + ((o - base + 31 * s + 7 * p + 13 * k + 1) % sz)
            key = (s * 10_000_000 + no) * 128 + p
            idx = np.searchsorted(real, key)
            hit = (idx < len(real)) & (real[np.minimum(idx, len(real) - 1)] == key)
            m = ~hit

            def qstr(prefix, vals):
                return pc.binary_join_element_wise(
                    pa.array([prefix] * len(vals)),
                    pc.cast(pa.array(vals, pa.int64()), pa.string()),
                    "",
                )

            outs.append(
                pa.table(
                    {
                        "subj": qstr("Q", s[m]),
                        "pred": qstr("P", p[m]),
                        "neg_obj": qstr("Q", no[m]),
                        "k": pa.array(np.full(int(m.sum()), k), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    edges = ray.data.from_arrow(adjacency).repartition(scaled_partitions(1.0, 8))
    return _collect(
        edges.map_batches(corrupt, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by(
        [
            ("subj", "ascending"),
            ("pred", "ascending"),
            ("neg_obj", "ascending"),
            ("k", "ascending"),
        ]
    )


def kg_neighbor_sample(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """GraphSAGE-style deterministic 2-hop neighborhood sampling: per
    node, up to 3 distinct neighbors ranked by the scrambled hash
    ``(obj_key · 2654435761) mod 1e9+7`` (ties by obj), then the second
    hop reuses the SAME per-node sample (the sampled-frontier property
    GraphSAGE relies on). All arithmetic is int64-exact so the DuckDB
    mirror is hash-identical. Vocabulary-bounded: the sample is ≤ 3·|V|
    rows, the hop join ≤ 9·|V| — broadcast-joined here, hash-join at
    10⁹-node scale."""
    import numpy as np

    def ints(col):
        arr = adjacency[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pc.cast(
            pc.utf8_slice_codeunits(arr, 1), pa.int64()
        ).to_numpy(zero_copy_only=False)

    s = ints("subj")
    o = ints("obj")
    # distinct (s, o) edges regardless of predicate
    key = s * 10_000_000 + o
    _, first = np.unique(key, return_index=True)
    s, o = s[first], o[first]
    r = (o * 2654435761) % 1_000_000_007
    order = np.lexsort((o, r, s))
    s, o = s[order], o[order]
    starts = np.r_[0, np.flatnonzero(np.diff(s)) + 1]
    offs = np.repeat(starts, np.diff(np.r_[starts, len(s)]))
    rn = np.arange(len(s)) - offs
    keep = rn < 3
    seed, hop1 = s[keep], o[keep]
    # hop 2: join the sample against itself on hop1 = seed
    sort_seed = np.argsort(seed, kind="stable")
    seed_sorted, hop1_sorted = seed[sort_seed], hop1[sort_seed]
    lo = np.searchsorted(seed_sorted, hop1)
    hi = np.searchsorted(seed_sorted, hop1, side="right")
    reps = hi - lo
    src_idx = np.repeat(np.arange(len(seed)), reps)
    within = np.arange(int(reps.sum())) - np.repeat(
        np.cumsum(np.r_[0, reps[:-1]]), reps
    )
    tgt_idx = np.repeat(lo, reps) + within
    def qstr(vals):
        return pc.binary_join_element_wise(
            pa.array(["Q"] * len(vals)),
            pc.cast(pa.array(vals, pa.int64()), pa.string()),
            "",
        )

    out = pa.table(
        {
            "seed": qstr(seed[src_idx]),
            "hop1": qstr(hop1[src_idx]),
            "hop2": qstr(hop1_sorted[tgt_idx]),
        }
    )
    return out.sort_by(
        [("seed", "ascending"), ("hop1", "ascending"), ("hop2", "ascending")]
    )


def entity_pagerank(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """Fixed-point PageRank (3 iterations, d = 85/100, scale 10^9) over the
    KG edge list. Integer arithmetic end to end → bit-reproducible, so the
    DuckDB oracle unrolls the same three iterations relationally and the
    hashes match exactly. See :func:`lamapi_ray.stages.graph.pagerank`."""
    from lamapi_ray.stages import graph

    return _collect(
        graph.pagerank(ray.data.from_arrow(adjacency), iters=3)
    ).sort_by("entity")


def entity_ppr(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """Personalized PageRank over the KG edge list (seeds: qid % 17 == 0,
    the deterministic stand-in for a caller's seed set) — the
    KG-relatedness ranking behind recommendation / disambiguation, vs the
    global importance of :func:`entity_pagerank`. Same integer fixed
    point, same unrolled-iteration oracle. See
    :func:`lamapi_ray.stages.graph.personalized_pagerank`."""
    from lamapi_ray.stages import graph

    return _collect(
        graph.personalized_pagerank(ray.data.from_arrow(adjacency), iters=3)
    ).sort_by("entity")


def cross_source_linkage(sf_dir: str, items: pa.Table) -> pa.Table:
    """Cross-source record linkage — the entity-matching step of multi-KG
    integration (reference: the Crunchbase ingest and the Wikidata dump
    coexist as separate sources with no crosswalk; this builds one): match
    every Crunchbase organisation name against every Wikidata item label
    at edit distance ≤ 1 via the SymSpell deletion-variant blocked cross
    join (stages/stringjoin.py::similarity_cross_join — both sides route
    into ONE variant-keyed exchange, exact DP verify, grouped distinct).
    → (cb_id, wd_id, cb_name, wd_label, dist), the candidate crosswalk a
    human or model resolves downstream."""
    from lamapi_ray.sources.crunchbase import cb_tables
    from lamapi_ray.stages.stringjoin import similarity_cross_join

    cb = cb_tables(sf_dir)["items"].select(["entity", "label"])
    wd = items.select(["entity", "label"])
    out = _collect(
        similarity_cross_join(
            ray.data.from_arrow(cb),
            ray.data.from_arrow(wd),
            left_id="entity",
            left_col="label",
            right_id="entity",
            right_col="label",
            max_dist=1,
        )
    )
    return pa.table(
        {
            "cb_id": out["lid"],
            "wd_id": out["rid"],
            "cb_name": out["lval"],
            "wd_label": out["rval"],
            "dist": out["dist"],
        }
    ).sort_by([("cb_id", "ascending"), ("wd_id", "ascending")])


def kg_fusion(sf_dir: str, items: pa.Table) -> pa.Table:
    """KG FUSION — the merge step downstream of cross-source linkage:
    full-outer fusion of the Wikidata item table with the Crunchbase
    ingest on exact label match, with deterministic field-level conflict
    rules (the reference keeps both sources side by side; this produces
    the single merged entity table a consumer actually wants):

    * matched (label in both): keep the Wikidata entity id, take the CB
      description (the richer business field), popularity = max of the
      two, source='both'; when several CB rows share a label the
      min-entity row wins (deterministic representative).
    * Wikidata-only: row passes through, source='wd'.
    * CB-only: row passes through under its CB id, source='cb'.

    Dataflow: CB is the SMALL side by construction (reference: one CSV vs
    the full dump), so it broadcasts as a label-keyed lookup (ray.put)
    and the item stream merges in one map pass; matched-label discovery
    for the CB-only remainder is a CB-bounded distinct collect — nothing
    corpus-sized leaves the stream."""
    from lamapi_ray.sources.crunchbase import cb_tables

    cb = cb_tables(sf_dir)["items"].select(
        ["entity", "label", "description", "popularity"]
    )
    # min-entity representative per CB label (CB-bounded, vectorized)
    cbe = np.asarray(cb["entity"].to_pylist(), object)
    cbl = np.asarray(cb["label"].to_pylist(), object)
    cbd = np.asarray(cb["description"].to_pylist(), object)
    cbp = cb["popularity"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((cbe, cbl))
    first = np.concatenate([[True], cbl[order][1:] != cbl[order][:-1]]) \
        if len(order) else np.array([], bool)
    rep = order[first]
    rep_labels = pa.array([str(cbl[i]) for i in rep], pa.large_string())
    rep_desc = np.asarray([str(cbd[i]) for i in rep], object)
    rep_pop = cbp[rep].astype(np.int64) if len(rep) else np.array([], np.int64)
    cb_ref = ray.put((rep_labels, rep_desc, rep_pop))

    ds = ray.data.from_arrow(
        items.select(["entity", "label", "description", "popularity"])
    )

    def merge(batch: pa.Table) -> pa.Table:
        labs_pa, descs, pops = ray.get(cb_ref)
        lab_col = batch["label"]
        if isinstance(lab_col, pa.ChunkedArray):
            lab_col = lab_col.combine_chunks()
        lab_col = lab_col.cast(pa.large_string())
        idx = pc.fill_null(pc.index_in(lab_col, labs_pa), -1).to_numpy(
            zero_copy_only=False
        )
        hit = idx >= 0
        safe = np.maximum(idx, 0)
        wd_desc = np.asarray(batch["description"].to_pylist(), object)
        pop = batch["popularity"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_desc = np.where(hit, descs[safe] if len(descs) else wd_desc, wd_desc)
        out_pop = np.where(
            hit, np.maximum(pop, pops[safe] if len(pops) else pop), pop
        )
        hit_pa = pa.array(hit)
        return pa.table(
            {
                "entity": batch["entity"],
                "label": batch["label"],
                "description": pa.array(out_desc.tolist(), pa.string()),
                "popularity": pa.array(out_pop, pa.int64()),
                "source": pc.if_else(hit_pa, "both", "wd"),
                "__hit": pc.if_else(
                    hit_pa, lab_col.cast(pa.string()), pa.scalar(None, pa.string())
                ),
            }
        )

    merged = ds.map_batches(merge, batch_format="pyarrow").materialize()
    # CB-bounded distinct collect of matched labels
    matched: set[str] = set()
    for b in merged.select_columns(["__hit"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        matched.update(x for x in b["__hit"].to_pylist() if x is not None)
    fused = pa.concat_tables(
        merged.select_columns(
            ["entity", "label", "description", "popularity", "source"]
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    # CB-only remainder
    keep = [i for i, l in enumerate(cbl) if str(l) not in matched]
    rest = pa.table(
        {
            "entity": pa.array([str(cbe[i]) for i in keep], pa.string()),
            "label": pa.array([str(cbl[i]) for i in keep], pa.string()),
            "description": pa.array([str(cbd[i]) for i in keep], pa.string()),
            "popularity": pa.array([int(cbp[i]) for i in keep], pa.int64()),
            "source": pa.array(["cb"] * len(keep), pa.string()),
        }
    )
    return pa.concat_tables(
        [fused.cast(rest.schema), rest]
    ).sort_by([("entity", "ascending"), ("label", "ascending")])


def type_closure(sf_dir: str) -> pa.Table:
    """Ancestor transitive closure over the deterministic part-item
    hierarchy (child Q(100000+k) → parent Q(100000+(k-1)//2), k ≥ 1 — a
    binary-heap forest rooted at Q100000) by pointer doubling: ⌈log2 depth⌉
    bucketed self-joins instead of depth semi-naive rounds.
    See :func:`lamapi_ray.stages.graph.ancestor_closure`."""
    from lamapi_ray.stages import graph

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])

    def to_edges(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k >= 1]
        ent = pc.binary_join_element_wise(
            "Q", pc.cast(pa.array(k + 100000), pa.string()), ""
        )
        par = pc.binary_join_element_wise(
            "Q", pc.cast(pa.array((k - 1) // 2 + 100000), pa.string()), ""
        )
        return pa.table({"entity": ent, "anc": par})

    edges = part.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(graph.ancestor_closure(edges)).sort_by("entity")


# --- PII scrub (stages/pii.py) ----------------------------------------------


def pii_scrub(sf_dir: str) -> pa.Table:
    """Detect + redact emails / IPv4s / phone numbers. The synthetic corpus
    is a clean word stream, so deterministic PII is INJECTED first (the
    same fixture-injection pattern as ``_dup_corpus``): every 7th doc gains
    an email, every 11th an IP, every 13th a phone — reproduced verbatim by
    the oracle's SQL concatenation, after which both engines run identical
    RE2 patterns. See :mod:`lamapi_ray.stages.pii`."""
    from lamapi_ray.stages.pii import pii_scrub as scrub

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].combine_chunks().cast(pa.string()).to_pylist()
        out = []
        for k, t in zip(ids, texts):
            k = int(k)
            if k % 7 == 0:
                t += f" contact user{k}@example.com now"
            if k % 11 == 0:
                t += f" ip 10.{k % 256}.0.{k % 100}"
            if k % 13 == 0:
                t += f" call 555-{k % 10000:04d}"
            out.append(t)
        return pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(out, pa.string())}
        )

    injected = _docs(sf_dir).map_batches(
        inject, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(scrub(injected)).sort_by("doc_id")


def passage_dedup(sf_dir: str) -> pa.Table:
    """Sub-document exact dedup: non-overlapping 16-token passages hashed
    corpus-wide, keeper = min (doc_id, passage_idx); run over the
    exact-duplicate-injected corpus so real cross-doc repeats exist.
    See :func:`lamapi_ray.stages.dedup.passage_dedup`."""
    from lamapi_ray.stages.dedup import passage_dedup as pd_

    return _collect(
        pd_(_dup_corpus(sf_dir, modify=False), "doc_id", "text", k=16)
    ).sort_by("g")


def events_asof(sf_dir: str) -> pa.Table:
    """AS-OF join: each purchase event attached to the same user's most
    recent prior-or-equal click (ties → larger event_id). One bucketed
    exchange + vectorized merged forward-fill per bucket.
    See :mod:`lamapi_ray.stages.asof`."""
    from lamapi_ray.stages.asof import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def of_type(t):
        def fn(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["event_type"], t)
            return batch.filter(m).drop_columns(["event_type"])

        return fn

    left = ev.map_batches(
        of_type("purchase"), batch_format="pyarrow", zero_copy_batch=True
    )
    right = ev.map_batches(
        of_type("click"), batch_format="pyarrow", zero_copy_batch=True
    )
    out = asof_join(
        left,
        right,
        by="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload={
            "event_id": "click_event_id",
            "ts": "click_ts",
            "value": "click_value",
        },
    )
    return _collect(out).sort_by("event_id")


def purchase_attribution(sf_dir: str) -> pa.Table:
    """Range join (count form): for each purchase, how many of the same
    user's OTHER events fall in the prior 30 minutes (half-open
    ``(ts−30m, ts]``). See :func:`lamapi_ray.stages.asof.range_count_join`."""
    from lamapi_ray.stages.asof import range_count_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def purchases(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["event_type"], "purchase")).drop_columns(
            ["event_type"]
        )

    def others(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.equal(batch["event_type"], "purchase"))
        ).select(["user_id", "ts"])

    out = range_count_join(
        ev.map_batches(purchases, batch_format="pyarrow", zero_copy_batch=True),
        ev.map_batches(others, batch_format="pyarrow", zero_copy_batch=True),
        by="user_id",
        ts="ts",
        window_us=30 * 60 * 1_000_000,
        out_col="n_prior_events",
    )
    return _collect(out).sort_by("event_id")


def tfidf_top_terms(sf_dir: str) -> pa.Table:
    """Per-doc top-3 salient terms by the integer tf·scale//df score.
    See :func:`lamapi_ray.stages.curation.tfidf_top_terms`."""
    from lamapi_ray.stages import curation

    return _collect(curation.tfidf_top_terms(_docs(sf_dir), topk=3)).sort_by(
        [("doc_id", "ascending"), ("score_fp", "descending"), ("g", "ascending")]
    )


def sliding_window_events(sf_dir: str) -> pa.Table:
    """Hopping-window aggregate: 1-hour windows every 15 minutes (each
    event lands in exactly 4 windows). The flat window fan-out happens
    map-side (4 rows per event, keys only + integer cents), then ONE
    groupby-sum — the hopping analogue of :func:`window_events`."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    HOP_US = 15 * 60 * 1_000_000
    HOPS = 4  # window = 4 hops = 1 hour

    def fan_out(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        et = batch["event_type"].combine_chunks().cast(pa.string())
        n = len(ts_us)
        hop = ts_us // HOP_US
        # windows containing t start at (hop-3..hop)*HOP (clipped at 0)
        starts = (hop[None, :] - np.arange(HOPS)[:, None]) * HOP_US
        idx = np.tile(np.arange(n), HOPS)
        flat = starts.reshape(-1)
        keep = flat >= 0
        return pa.table(
            {
                "event_type": et.take(pa.array(idx[keep])),
                "window_us": pa.array(flat[keep], pa.int64()),
                "cents": pa.array(cents[idx[keep]], pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    agg = _collect(
        ev.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_us"], num_partitions=_scaled(0.5, 16))
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="sum_value_cents"))
    )
    return pa.table(
        {
            "event_type": agg["event_type"].cast(pa.string()),
            "window_start": agg["window_us"].cast(pa.int64()).cast(pa.timestamp("us")),
            "n_events": agg["n_events"].cast(pa.int64()),
            "sum_value_cents": agg["sum_value_cents"].cast(pa.int64()),
        }
    )


def user_top_events(sf_dir: str) -> pa.Table:
    """Grouped top-k: each user's top-3 events by (value desc, event_id
    asc). Map-side combine keeps ≤k rows per user per batch, so the ONE
    exchange ships at most k·users·blocks rows — never the corpus."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    K = 3

    def local_topk(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        o = np.lexsort((eid, -cents, uid))
        u_s = uid[o]
        new = np.concatenate([[True], u_s[1:] != u_s[:-1]])
        run_start = np.maximum.accumulate(np.where(new, np.arange(len(u_s)), 0))
        keep = (np.arange(len(u_s)) - run_start) < K
        sel = o[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel]),
                "event_id": pa.array(eid[sel]),
                "cents": pa.array(cents[sel]),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        return local_topk(
            pa.table(
                {
                    "user_id": group["user_id"],
                    "event_id": group["event_id"],
                    "value": pc.divide(
                        group["cents"].cast(pa.float64()), pa.scalar(100.0)
                    ),
                }
            )
        )

    out = (
        ev.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id", num_partitions=_scaled(0.25, 8))
        .map_groups(merge_topk, batch_format="pyarrow")
    )
    agg = _collect(out)
    return pa.table(
        {
            "user_id": agg["user_id"].cast(pa.int64()),
            "event_id": agg["event_id"].cast(pa.int64()),
            "value_cents": agg["cents"].cast(pa.int64()),
        }
    ).sort_by([("user_id", "ascending"), ("value_cents", "descending"), ("event_id", "ascending")])


def running_user_totals(sf_dir: str) -> pa.Table:
    """Running (cumulative) aggregate — the ORDER BY window-function shape:
    per user, events in (ts, event_id) order carry a running sum of integer
    cents and a running event count. groupby(user) co-locates each user's
    history; the per-group kernel is one lexsort + np.cumsum (no per-row
    Python). Mirrors SUM/COUNT OVER (PARTITION BY user ORDER BY ts, id).

    The kernel is segment-aware (per-user resets inside one array pass),
    so co-location runs on COARSE user-hash partitions — many users per
    map_groups call, never one Python call per user (the 39× cross-join
    lesson)."""
    P = _scaled(0.25, 8)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def running(group: pa.Table) -> pa.Table:
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts"].combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            group["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        o = np.lexsort((eid, tsv, uid))
        u_s, c_s = uid[o], cents[o]
        csum = np.cumsum(c_s)
        cnt = np.arange(1, len(u_s) + 1, dtype=np.int64)
        # reset the running totals at each user boundary (segment offsets)
        new = np.concatenate([[True], u_s[1:] != u_s[:-1]])
        starts = np.nonzero(new)[0]
        base_sum = np.repeat(
            np.concatenate([[0], csum[starts[1:] - 1]]), np.diff(
                np.concatenate([starts, [len(u_s)]])
            ),
        )
        base_cnt = np.repeat(starts, np.diff(np.concatenate([starts, [len(u_s)]])))
        return pa.table(
            {
                "event_id": pa.array(eid[o]),
                "user_id": pa.array(u_s),
                "running_cents": pa.array(csum - base_sum),
                "running_n": pa.array(cnt - base_cnt),
            }
        )

    out = (
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(lambda g: running(g.select(
            ["event_id", "ts", "user_id", "value"]
        )), batch_format="pyarrow")
    )
    return _collect(out).sort_by("event_id")


def kmeans_clusters(sf_dir: str) -> pa.Table:
    """Fixed-point Lloyd's k-means (k=8, 3 iterations) over the embeddings
    table — integer arithmetic end to end, so the assignment is
    bit-reproducible and the oracle unrolls the same three iterations
    relationally. See :mod:`lamapi_ray.stages.kmeans`."""
    from lamapi_ray.stages.kmeans import kmeans_fixed

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return _collect(kmeans_fixed(ds, k=8, iters=3)).sort_by("vec_id")


def entity_salience(sf_dir: str, linked: pa.Table) -> pa.Table:
    """Per-page entity salience over the linked-mention chain — the
    feature KG-construction emits for downstream ranking/weighting of
    triples: for every (url, entity) the mention count, its share of the
    page's linked mentions (salience), and the within-page rank (count
    desc, entity id asc). The reference ranks candidates per lookup;
    this is the page-level aggregate view of the same signal.

    Scale shape: rows of one url are co-located by ONE coarse url-hash
    exchange (many urls per group call), then everything is a vectorized
    factorize/lexsort/segment kernel — per-partition work is bounded by
    its rows, nothing corpus-sized on the driver."""
    from lamapi_ray.functions.inthash import hash_string_array
    from lamapi_ray.stages.textstats import round_ref_array

    if isinstance(linked, ray.data.Dataset):
        ds = linked.select_columns(["url", "id"])
    else:
        ds = ray.data.from_arrow(linked.select(["url", "id"]))

    def coarse_key(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        h = hash_string_array(url).view(np.int64)
        return batch.append_column(
            "__pk", pa.array(np.abs(h) % 16, pa.int64())
        )

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "id": pa.array([], pa.string()),
                "n_mentions": pa.array([], pa.int64()),
                "salience": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        url = group["url"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = group["id"].combine_chunks().to_numpy(zero_copy_only=False)
        urls, ucode = np.unique(url, return_inverse=True)
        eids, ecode = np.unique(eid, return_inverse=True)
        pair = ucode.astype(np.int64) * len(eids) + ecode
        upair, counts = np.unique(pair, return_counts=True)
        pu, pe = upair // len(eids), upair % len(eids)
        page_tot = np.bincount(pu, weights=counts, minlength=len(urls))
        # order: url asc, count desc, entity id asc (ecode order IS
        # lexicographic — np.unique sorts)
        order = np.lexsort((pe, -counts, pu))
        pu, pe, counts = pu[order], pe[order], counts[order]
        seg_start = np.concatenate([[True], pu[1:] != pu[:-1]])
        first = np.maximum.accumulate(
            np.where(seg_start, np.arange(len(pu)), 0)
        )
        rank = np.arange(len(pu)) - first + 1
        sal = round_ref_array(counts / page_tot[pu], 6)
        return pa.table(
            {
                "url": pa.array(urls[pu].tolist(), pa.string()),
                "id": pa.array(eids[pe].tolist(), pa.string()),
                "n_mentions": pa.array(counts.astype(np.int64), pa.int64()),
                "salience": pa.array(sal, pa.float64()),
                "rank": pa.array(rank.astype(np.int64), pa.int64()),
            }
        )

    out = _collect(
        ds.map_batches(coarse_key, batch_format="pyarrow")
        .groupby("__pk", num_partitions=_scaled(0.5, 16))
        .map_groups(per_partition, batch_format="pyarrow")
    )
    if out.num_rows == 0 and not out.column_names:
        return per_partition(pa.table({}))  # typed empty
    return out.sort_by([("url", "ascending"), ("rank", "ascending")])


def gnn_neighbor_agg(sf_dir: str) -> pa.Table:
    """GraphSAGE-style neighbor feature aggregation over the hyperlink
    graph — the message-passing step that materializes GNN training
    features without a learned model: node feature = in-degree; layer 1
    aggregates each node's IN-neighbors' features (sum + mean); layer 2
    aggregates the layer-1 sums one hop further. Output per node with
    ≥1 in-edge: (node, n_in, h1_sum, h1_mean, h2_sum).

    Scale shape: features are node-bounded tables, edges stream; each
    message-passing layer is ONE bucketed hash join (edges × features on
    src — no broadcast of the node table, which is corpus-scale in a
    10^9-node web graph) + ONE grouped sum on dst. Missing-feature
    sources contribute 0 (inner join drops them; the final assembly
    re-inserts zero rows from the in-degree node list, guarded
    searchsorted). Multiplicities and self-loops are kept — the
    aggregation is over EDGES, as in sampled-neighborhood GNN training."""
    from lamapi_ray import synth
    from lamapi_ray.stages.join import bucketed_hash_join
    from lamapi_ray.stages.linkgraph import extract_links
    from lamapi_ray.stages.textstats import round_ref_array
    from ray.data.aggregate import Sum

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table({"src": ids(batch["src"]), "dst": ids(batch["dst"])})

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    nb = _scaled(0.5, 16)

    def layer(feat: ray.data.Dataset, fcol: str, out: str) -> pa.Table:
        """edges × (node, fcol) on src → Σ per dst — one join + one sum."""
        msg = bucketed_hash_join(
            edges.map_batches(
                lambda b: pa.table({"node": b["src"], "dst": b["dst"]}),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            feat, on="node", num_buckets=nb,
        )
        summed = (
            msg.map_batches(
                lambda b: pa.table({"node": b["dst"], "v": b[fcol]}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("node", num_partitions=nb)
            .aggregate(Sum("v"))
        )
        return _collect(summed).rename_columns(["node", out])

    indeg_ds = edges.groupby("dst", num_partitions=nb).count()

    def as_feat(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["dst"], "n_in": b["count()"].cast(pa.int64())}
        )

    indeg_feat = indeg_ds.map_batches(
        as_feat, batch_format="pyarrow", zero_copy_batch=True
    )
    h1 = layer(indeg_feat, "n_in", "h1_sum")
    h1_feat = ray.data.from_arrow(h1)
    h2 = layer(h1_feat, "h1_sum", "h2_sum")

    ind = _collect(indeg_feat).sort_by("node")
    nodes = ind["node"].to_numpy(zero_copy_only=False)
    n_in = ind["n_in"].to_numpy(zero_copy_only=False)

    def aligned(tbl: pa.Table, col: str) -> np.ndarray:
        out = np.zeros(len(nodes), np.int64)
        tn = tbl["node"].to_numpy(zero_copy_only=False)
        tv = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nodes, tn)
        ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == tn)
        if not np.all(ok):  # a summed node must exist in the in-degree list
            raise ValueError("aggregated node missing from in-degree table")
        out[pos] = tv
        return out

    h1_sum = aligned(h1, "h1_sum")
    h2_sum = aligned(h2, "h2_sum")
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "n_in": pa.array(n_in.astype(np.int64), pa.int64()),
            "h1_sum": pa.array(h1_sum, pa.int64()),
            "h1_mean": pa.array(
                round_ref_array(h1_sum / n_in.astype(np.float64), 6),
                pa.float64(),
            ),
            "h2_sum": pa.array(h2_sum, pa.int64()),
        }
    )


def bigram_perplexity(sf_dir: str) -> pa.Table:
    """Add-one-smoothed bigram-LM perplexity per doc (the n=2 step of the
    KenLM curation ladder; unigram sibling above). Integer micro-nat
    surprisals — see :func:`lamapi_ray.stages.lmscore.bigram_perplexity_pipeline`."""
    from lamapi_ray.stages.lmscore import bigram_perplexity_pipeline

    return _collect(bigram_perplexity_pipeline(_docs(sf_dir))).sort_by("doc_id")


def scd2_user_state(sf_dir: str) -> pa.Table:
    """Slowly-changing-dimension type-2 build over the event stream — the
    lakehouse dimension-maintenance op: per user, consecutive runs of the
    same event_type collapse into one validity interval
    (user_id, event_type, valid_from, valid_to, n_events, is_current);
    valid_to = next run's first ts, NULL on the open (current) run.

    Scale shape: the sessionize pattern — ONE coarse user-hash exchange
    co-locates each user's history (many users per map_groups call), the
    kernel is one lexsort + run-boundary diff over the whole partition.
    Run order at equal ts is pinned by the event_id tie-break, so the
    interval table is deterministic."""
    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def intervals(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "run_id": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "valid_from": pa.array([], pa.timestamp("us")),
             "valid_to": pa.array([], pa.timestamp("us")),
             "n_events": pa.array([], pa.int64()),
             "is_current": pa.array([], pa.bool_())}
        )
        if n == 0:
            return empty
        ts = group["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        et = group["event_type"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        brk = new_user | np.concatenate([[True], et[1:] != et[:-1]])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([starts, [n]]))
        # valid_to = next run's start ts within the same user, else null
        nxt = np.concatenate([starts[1:], [0]])
        has_next = np.concatenate(
            [~new_user[starts[1:]], [False]]
        )  # next run belongs to the same user?
        vto = np.where(has_next, ts[np.minimum(nxt, n - 1)], 0)
        # per-user 1-based run ids (sessionize's base-subtraction idiom)
        rid_global = np.cumsum(brk)
        user_starts = np.flatnonzero(new_user)
        run_user_first = np.searchsorted(user_starts, starts, side="right") - 1
        base = (rid_global[user_starts] - 1)[run_user_first]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "run_id": pa.array(
                    (rid_global[starts] - base).astype(np.int64), pa.int64()
                ),
                "event_type": pa.array(et[starts].tolist(), pa.string()),
                "valid_from": pa.array(ts[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "valid_to": pa.array(
                    vto, pa.int64(), mask=~has_next
                ).cast(pa.timestamp("us")),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "is_current": pa.array(~has_next, pa.bool_()),
            }
        )

    return _collect(
        ev.map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(intervals, batch_format="pyarrow")
    ).sort_by([("user_id", "ascending"), ("run_id", "ascending")])


def peak_concurrency(sf_dir: str) -> pa.Table:
    """Per-day PEAK concurrent sessions — the capacity-planning sweep:
    every event opens a half-open 15 min activity interval
    [ts, ts+900 s); boundaries (+1 at open, −1 at close, closes before
    opens at equal time per half-open semantics) are swept in global
    time order and the running sum's max per epoch-day is the peak.

    The running sum over a global order is the watermark_window
    DISTRIBUTED PREFIX SCAN, reused with sum instead of max: pass 1
    folds per-hour-bucket delta sums map-side (bucket table is
    hours-in-range-bounded on the driver; a tree scan at larger scale),
    the exclusive prefix sums broadcast back, pass 2 co-locates each
    bucket with ONE grouped exchange, closes the cumsum inside
    (vectorized), and folds straight to per-(bucket, day) maxima — the
    final fold is days-bounded. Intra-tie order at equal (t, d) cannot
    move the per-day max (+1 runs peak at their end, −1 runs at their
    start), so the result is deterministic and oracle-mirrorable."""
    DUR_US = 900 * 1_000_000
    HOUR_US = 3600 * 1_000_000
    DAY_US = 86_400 * 1_000_000
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def boundaries(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = np.concatenate([ts, ts + DUR_US])
        d = np.concatenate(
            [np.ones(len(ts), np.int64), -np.ones(len(ts), np.int64)]
        )
        return pa.table(
            {"t": pa.array(t, pa.int64()), "d": pa.array(d, pa.int64())}
        )

    bnd = ev.map_batches(boundaries, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_sum(batch: pa.Table) -> pa.Table:
        t = batch["t"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        b = t // HOUR_US
        u, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, d)
        return pa.table(
            {"bucket": pa.array(u, pa.int64()), "s": pa.array(s, pa.int64())}
        )

    parts = pa.concat_tables(
        bnd.map_batches(bucket_sum, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    pb = parts["bucket"].to_numpy(zero_copy_only=False)
    ps = parts["s"].to_numpy(zero_copy_only=False)
    ub, inv = np.unique(pb, return_inverse=True)
    sums = np.zeros(len(ub), np.int64)
    np.add.at(sums, inv, ps)
    # exclusive prefix: concurrency entering each bucket
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch["t"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bk", pa.array(t // HOUR_US, pa.int64())
        )

    def close_scan(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"day": pa.array([], pa.int64()), "peak": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        t = group["t"].combine_chunks().to_numpy(zero_copy_only=False)
        d = group["d"].combine_chunks().to_numpy(zero_copy_only=False)
        bk = int(group["__bk"][0].as_py())
        pos = int(np.searchsorted(ub, bk))
        if pos >= len(ub) or ub[pos] != bk:
            raise ValueError("bucket missing from prefix-scan pass 1")
        order = np.lexsort((d, t))
        t, d = t[order], d[order]
        c = np.cumsum(d) + offs[pos]
        day = t // DAY_US
        u, inv2 = np.unique(day, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv2, c)
        return pa.table(
            {"day": pa.array(u, pa.int64()), "peak": pa.array(mx, pa.int64())}
        )

    partials = _collect(
        bnd.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bk", num_partitions=_scaled(0.5, 16))
        .map_groups(close_scan, batch_format="pyarrow")
    )
    fin = partials.group_by("day").aggregate([("peak", "max")])
    return pa.table(
        {
            "day": fin["day"].combine_chunks(),
            "peak": fin["peak_max"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by("day")


def kmv_set_ops(sf_dir: str) -> pa.Table:
    """Sketch set algebra (theta-sketch style) between two user
    populations — even-epoch-day vs odd-epoch-day activity: bottom-k
    union sketch, exact side membership of every sketch member, and
    union / Jaccard / intersection estimates, without shuffling either
    key stream. See :func:`lamapi_ray.stages.sketch.kmv_set_ops`."""
    from lamapi_ray.stages.sketch import kmv_set_ops as _kmv_set_ops

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def half(parity: int):
        def pick(b: pa.Table) -> pa.Table:
            ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = (ts // DAY_US) % 2 == parity
            return pa.table(
                {"user_id": b["user_id"].combine_chunks().filter(pa.array(keep))
                 if isinstance(b["user_id"], pa.ChunkedArray)
                 else b["user_id"].filter(pa.array(keep))}
            )

        return ev.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    return _kmv_set_ops(half(0), half(1), "user_id")


def spatial_near_pairs(sf_dir: str) -> pa.Table:
    """Spatial near-pair self-join over a synthetic point cloud — the
    geo blocking pattern (geohash/grid cells) that replaces the all-pairs
    distance join: points are the two house 61-bit mixes of the event id
    reduced mod 600 (same decorrelated cloud as ``grid_dbscan``), PLUS a
    planted companion at (x+1, y+2) for every 5th event (id offset 10^9)
    so every scale has guaranteed cross-cell pairs — the rank-1 lattice
    structure of the bare cloud has min pairwise distance > 3 at small n
    (the link_triangles planting idiom). Pairs within Chebyshev
    distance 3 via the 3×3 grid-cell exchange.
    See :mod:`lamapi_ray.stages.spatial`."""
    from lamapi_ray.stages.spatial import near_pairs

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def pts(b: pa.Table) -> pa.Table:
        from lamapi_ray.functions.inthash import fold_mod61, mulmod61

        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = fold_mod61(eid.view(np.uint64))
        M1 = np.uint64(2177342782468422681)
        M2 = np.uint64(194409311614856021)
        x = (mulmod61(h, np.full(len(h), M1)) % np.uint64(600)).astype(np.int64)
        y = (mulmod61(h, np.full(len(h), M2)) % np.uint64(600)).astype(np.int64)
        plant = eid % 5 == 0
        return pa.table(
            {
                "id": pa.array(
                    np.concatenate([eid, eid[plant] + 1_000_000_000]),
                    pa.int64(),
                ),
                "x": pa.array(
                    np.concatenate([x, x[plant] + 1]), pa.int64()
                ),
                "y": pa.array(
                    np.concatenate([y, y[plant] + 2]), pa.int64()
                ),
            }
        )

    out = _collect(
        near_pairs(
            ev.map_batches(pts, batch_format="pyarrow", zero_copy_batch=True),
            radius=3, cell=4, num_partitions=_scaled(0.5, 16),
        )
    )
    if out.num_rows == 0 and not out.column_names:
        out = pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "dx": pa.array([], pa.int64()),
             "dy": pa.array([], pa.int64())}
        )
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def grid_dbscan(sf_dir: str) -> pa.Table:
    """Deterministic DBSCAN over a dense synthetic point cloud — the
    density-clustering step spatial/embedding curation pipelines run
    after blocking: eps = Chebyshev 3, minPts = 3 neighbors (self
    excluded); core points cluster by connected components of the
    core-core neighbor graph (label = min core id — the house min-label
    rule replaces DBSCAN's arbitrary first-visitor assignment); border
    points attach to the MIN label among their core neighbors; noise is
    dropped. Points: x/y = the two house mod-(2^61-1) multiplicative
    mixes of the id, reduced mod 600 (a plain ``id·k mod 600`` would
    alias both coordinates to period 600 → 600 coincident-point stacks;
    the 61-bit mix decorrelates them into a uniform cloud) —
    subcritical density at oracle scales (mean degree ≈ 1.4 at sf0.01,
    below the ≈4.5 continuum-percolation threshold) so the recursive
    oracle closure stays component-bounded; at bench scale the giant
    component exercises the distributed min-label path.

    Dataflow: ONE 3×3 cell exchange (stages/spatial.py) → pair stream;
    degrees by a flat-endpoint groupby-count; core set broadcasts as a
    sorted id array; core-core edges feed the distributed min-label
    components; border assignment is one vectorized min-fold over the
    single-core pairs. Pairs never materialize beyond their own stream
    except the core/label tables (core-bounded)."""
    from lamapi_ray.stages.dedup import _cc_min_labels
    from lamapi_ray.stages.spatial import near_pairs

    MINPTS = 3
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def pts(b: pa.Table) -> pa.Table:
        from lamapi_ray.functions.inthash import fold_mod61, mulmod61

        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = fold_mod61(eid.view(np.uint64))
        M1 = np.uint64(2177342782468422681)
        M2 = np.uint64(194409311614856021)
        x = (mulmod61(h, np.full(len(h), M1)) % np.uint64(600)).astype(np.int64)
        y = (mulmod61(h, np.full(len(h), M2)) % np.uint64(600)).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(eid, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    P = _scaled(0.5, 16)
    # pair stream is consumed three times (degrees, core-core edges,
    # border fold) — materialize ONCE into the object store (pair-bounded,
    # ~mean-degree × points rows, never corpus²)
    pairs = near_pairs(
        ev.map_batches(pts, batch_format="pyarrow", zero_copy_batch=True),
        radius=3, cell=4, num_partitions=P,
    ).select_columns(["id_a", "id_b"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                b["id_a"].to_numpy(zero_copy_only=False),
                b["id_b"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {"id": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    from ray.data.aggregate import Sum

    deg = _collect(
        pairs.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("id", num_partitions=P)
        .aggregate(Sum("c"))
    )
    if "id" not in deg.column_names:  # zero near pairs at this scale
        deg = pa.table(
            {"id": pa.array([], pa.int64()), "sum(c)": pa.array([], pa.int64())}
        )
    dd = deg["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    cores = np.sort(
        deg["id"].to_numpy(zero_copy_only=False)[dd >= MINPTS]
    ).astype(np.int64)

    def is_core(a: np.ndarray) -> np.ndarray:
        if len(cores) == 0:
            return np.zeros(len(a), bool)
        pos = np.searchsorted(cores, a)
        return (pos < len(cores)) & (
            cores[np.minimum(pos, len(cores) - 1)] == a
        )

    if len(cores) == 0:  # subcritical cloud with no dense spot at this sf
        return pa.table(
            {"id": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "is_core": pa.array([], pa.bool_())}
        )

    def core_core(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        keep = is_core(a) & is_core(bb)
        return pa.table(
            {"id_a": pa.array(a[keep], pa.int64()),
             "id_b": pa.array(bb[keep], pa.int64())}
        )

    # isolated cores (no core neighbor) still form singleton clusters:
    # seed them as self-loops so _cc_min_labels emits them
    ce = pairs.map_batches(core_core, batch_format="pyarrow", zero_copy_batch=True)
    seeds = ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array(cores, pa.int64()),
             "id_b": pa.array(cores, pa.int64())}
        )
    )
    labels = _cc_min_labels(ce.union(seeds), num_partitions=P)
    lab_node = labels["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab_val = labels["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(lab_node)
    lab_node, lab_val = lab_node[order], lab_val[order]

    def core_label(a: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(lab_node, a)
        if len(a) and not np.all(
            (pos < len(lab_node)) & (lab_node[np.minimum(pos, len(lab_node) - 1)] == a)
        ):
            raise ValueError("core id missing from component labels")
        return lab_val[pos]

    def border_pairs(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        ca, cb = is_core(a), is_core(bb)
        one_a = ca & ~cb  # a core, b border
        one_b = cb & ~ca
        bid = np.concatenate([bb[one_a], a[one_b]])
        cl = np.concatenate([core_label(a[one_a]), core_label(bb[one_b])])
        if len(bid) == 0:
            return pa.table(
                {"id": pa.array([], pa.int64()),
                 "cl": pa.array([], pa.int64())}
            )
        # map-side min combine
        u, inv = np.unique(bid, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, cl)
        return pa.table(
            {"id": pa.array(u, pa.int64()), "cl": pa.array(mn, pa.int64())}
        )

    from ray.data.aggregate import Min

    bl = _collect(
        pairs.map_batches(border_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("id", num_partitions=P)
        .aggregate(Min("cl"))
    )
    if "id" not in bl.column_names:  # no border points anywhere
        bl = pa.table(
            {"id": pa.array([], pa.int64()), "min(cl)": pa.array([], pa.int64())}
        )
    out_id = np.concatenate(
        [lab_node, bl["id"].to_numpy(zero_copy_only=False).astype(np.int64)]
    )
    out_cl = np.concatenate(
        [lab_val, bl["min(cl)"].to_numpy(zero_copy_only=False).astype(np.int64)]
    )
    out_core = np.concatenate(
        [np.ones(len(lab_node), bool), np.zeros(bl.num_rows, bool)]
    )
    order = np.argsort(out_id)
    return pa.table(
        {
            "id": pa.array(out_id[order], pa.int64()),
            "cluster": pa.array(out_cl[order], pa.int64()),
            "is_core": pa.array(out_core[order], pa.bool_()),
        }
    )


def cdc_upsert_merge(sf_dir: str) -> pa.Table:
    """MERGE INTO (CDC upsert) over a keyed relational table — the
    row-level sibling of the postings LSM merge: base = orders at
    version 1; a deterministic CDC delta carries version-2 UPDATEs for
    o_orderkey % 10 == 0 (+1000 cents on the total, status 'U'),
    INSERTs for 500 new keys above max(o_orderkey), and DELETE
    tombstones for o_orderkey % 100 == 7. Latest version wins per key;
    tombstoned keys vanish.

    Scale shape: base and delta stream through ONE coarse key-hash
    exchange; the per-partition kernel is a vectorized lexsort by
    (key, version desc) + segment-first pick + tombstone mask — never a
    per-key Python loop, nothing table-sized on the driver (the output
    itself is the merged table, as any MERGE materializes)."""
    import pyarrow.parquet as pq

    base = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
    )
    mx = int(
        pc.max(
            pq.read_table(
                f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
            )["o_orderkey"]
        ).as_py()
    )

    def tag_base(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_totalprice": b["o_totalprice"],
                "o_orderstatus": b["o_orderstatus"],
                "version": pa.array(np.ones(n, np.int64), pa.int64()),
                "op": pa.array(["B"] * n, pa.string()),
            }
        )

    def delta_rows(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        upd = k % 10 == 0
        dele = k % 100 == 7
        ins = k < 500  # one INSERT per first-500 base row, key above max
        keys = np.concatenate([k[upd], k[dele], k[ins] + mx + 1])
        price = np.concatenate(
            [tp[upd] + 10.0, np.zeros(int(dele.sum())), tp[ins] / 2.0]
        )
        status = np.concatenate(
            [
                np.full(int(upd.sum()), "U", dtype=object),
                np.full(int(dele.sum()), "D", dtype=object),
                np.full(int(ins.sum()), "I", dtype=object),
            ]
        )
        op = status.copy()
        return pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_totalprice": pa.array(price, pa.float64()),
                "o_orderstatus": pa.array(status.tolist(), pa.string()),
                "version": pa.array(
                    np.full(len(keys), 2, np.int64), pa.int64()
                ),
                "op": pa.array(op.tolist(), pa.string()),
            }
        )

    delta = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(delta_rows, batch_format="pyarrow", zero_copy_batch=True)
    both = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(delta)

    P = _scaled(0.5, 16)

    def key_pk(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__kpk", pa.array((k * 2654435761 % 4294967296) % P, pa.int64())
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderstatus": pa.array([], pa.string()),
            }
        )
        if len(group) == 0:
            return empty
        k = group["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        v = group["version"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((-v, k))
        k, v = k[order], v[order]
        first = np.concatenate([[True], k[1:] != k[:-1]])
        pick = np.flatnonzero(first)
        ops = group["op"].combine_chunks().take(
            pa.array(order[pick])
        )
        keep = pc.invert(pc.equal(ops, "D")).to_numpy(zero_copy_only=False)
        sel = order[pick][keep]
        return pa.table(
            {
                "o_orderkey": group["o_orderkey"].combine_chunks().take(
                    pa.array(sel)
                ),
                "o_totalprice": group["o_totalprice"].combine_chunks().take(
                    pa.array(sel)
                ),
                "o_orderstatus": group["o_orderstatus"].combine_chunks().take(
                    pa.array(sel)
                ),
            }
        )

    return _collect(
        both.map_batches(key_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__kpk", num_partitions=P)
        .map_groups(merge, batch_format="pyarrow")
    ).sort_by("o_orderkey")


def decontaminate_fuzzy(sf_dir: str) -> pa.Table:
    """MinHash-LSH benchmark decontamination: every 50th doc plays the
    held-out benchmark; the corpus is the remaining docs PLUS a
    lightly-edited copy of each benchmark doc (' xx' appended,
    id + 2,000,000) — the paraphrased-leakage case the exact 4-gram rule
    is complemented by. See
    :func:`lamapi_ray.stages.curation.decontaminate_fuzzy`."""
    import pyarrow.parquet as pq

    from lamapi_ray.stages.curation import decontaminate_fuzzy as _fuzzy

    full = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    did = full["doc_id"].to_numpy()
    bench = full.filter(pa.array(did % 50 == 0))

    def to_corpus(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        txt = t["text"].combine_chunks()
        keep = d % 50 != 0
        plant = ~keep
        planted_txt = pc.binary_join_element_wise(
            txt.filter(pa.array(plant)).cast(pa.string()), "xx", " "
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([d[keep], d[plant] + 2_000_000]), pa.int64()
                ),
                "text": pa.concat_arrays(
                    [
                        txt.filter(pa.array(keep)).cast(pa.string()),
                        planted_txt,
                    ]
                ),
            }
        )

    corpus = _docs(sf_dir, ("doc_id", "text")).map_batches(
        to_corpus, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(_fuzzy(corpus, bench)).sort_by("doc_id")


def retrieval_metrics(sf_dir: str) -> pa.Table:
    """Retrieval EVALUATION at corpus scale — the eval leg a RAG/search
    pipeline runs next to `doc_search_bm25`: graded relevance rel(q, d)
    = # distinct query tokens in the doc, binary hit = rel ≥ 2; per
    query nDCG@10 (log2 discounts as shared literal constants,
    per-rank terms floor-quantized to integer micro-units so the sums
    are order-exact), the ideal DCG from the corpus-wide top-10 rel
    values, first-hit rank and MRR@10.

    Scale shape: the ranked top-10 comes from the two-pass distributed
    BM25 (queries·k-bounded); relevance needs ONE more corpus pass that
    emits per-batch (a) top-10 ideal-rel partials and (b) rel rows for
    the broadcast top-10 doc set — partials are queries×10-bounded per
    batch, the metric fold is queries-bounded."""
    from lamapi_ray.stages.search import bm25_search
    from lamapi_ray.functions.text import round_ref

    queries = list(SEARCH_QUERIES)
    top = bm25_search(_docs(sf_dir), queries, k=10)
    DISC = np.array(
        [1.0, 1.584962500721156, 2.0, 2.321928094887362, 2.584962500721156,
         2.807354922057604, 3.0, 3.169925001442312, 3.321928094887362,
         3.4594316186372973]
    )
    terms = sorted({t for q in queries for t in q.split(" ")})
    t_arr = pa.array(terms, pa.large_string())
    q_idx = [
        np.array(sorted({terms.index(t) for t in q.split(" ")}), np.int64)
        for q in queries
    ]
    top_q = np.array(
        [queries.index(s) for s in top["query"].to_pylist()], np.int64
    )
    top_doc = top["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    top_rank = top["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    # broadcast probe set: packed (query_idx, doc_id) keys of the top-10s
    probe = np.sort(top_q * np.int64(1 << 48) + top_doc)

    def rel_partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt.cast(pa.large_string()), " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ti = pc.fill_null(pc.index_in(flat, t_arr), -1).to_numpy(
            zero_copy_only=False
        )
        hit = ti >= 0
        n = len(batch)
        pres = np.zeros((n, len(terms)), bool)
        pres[parents[hit], ti[hit]] = True
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_k, out_d, out_r = [], [], [], []
        for qi, idx in enumerate(q_idx):
            rel = pres[:, idx].sum(axis=1).astype(np.int64)
            nz = rel > 0
            vals = np.sort(rel[nz])[-10:]  # ideal top-10 partial
            out_q.append(np.full(len(vals), qi, np.int64))
            out_k.append(np.zeros(len(vals), np.int64))  # kind 0 = ideal
            out_d.append(np.full(len(vals), -1, np.int64))
            out_r.append(vals)
            key = np.int64(qi) * np.int64(1 << 48) + did
            pos = np.searchsorted(probe, key)
            inprobe = (pos < len(probe)) & (
                probe[np.minimum(pos, len(probe) - 1)] == key
            )
            out_q.append(np.full(int(inprobe.sum()), qi, np.int64))
            out_k.append(np.ones(int(inprobe.sum()), np.int64))  # 1 = hit row
            out_d.append(did[inprobe])
            out_r.append(rel[inprobe])
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                "kind": pa.array(np.concatenate(out_k), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "rel": pa.array(np.concatenate(out_r), pa.int64()),
            }
        )

    parts = _collect(
        _docs(sf_dir).map_batches(
            rel_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    pq_ = parts["qi"].to_numpy(zero_copy_only=False)
    pk = parts["kind"].to_numpy(zero_copy_only=False)
    pd_ = parts["doc_id"].to_numpy(zero_copy_only=False)
    pr = parts["rel"].to_numpy(zero_copy_only=False)

    rows = []
    for qi, q in enumerate(queries):
        ideal = np.sort(pr[(pq_ == qi) & (pk == 0)])[::-1][:10]
        idcg = int(
            np.sum(np.floor(ideal.astype(np.float64) * 1_000_000
                            / DISC[: len(ideal)]))
        )
        # rel per ranked doc (rank-aligned)
        sel = (pq_ == qi) & (pk == 1)
        relmap = dict(zip(pd_[sel].tolist(), pr[sel].tolist()))
        mask = top_q == qi
        ranks, docs = top_rank[mask], top_doc[mask]
        order = np.argsort(ranks)
        ranks, docs = ranks[order], docs[order]
        rels = np.array([relmap.get(int(d), 0) for d in docs], np.int64)
        dcg = int(
            np.sum(np.floor(rels.astype(np.float64) * 1_000_000
                            / DISC[ranks - 1]))
        )
        hits = ranks[rels >= 2]
        fh = int(hits[0]) if len(hits) else 0
        rows.append(
            (
                q, fh, dcg, idcg,
                round_ref(dcg / idcg if idcg > 0 else 0.0, 6),
                round_ref(1.0 / fh if fh > 0 else 0.0, 6),
            )
        )
    rows.sort()
    return pa.table(
        {
            "query": pa.array([r[0] for r in rows], pa.string()),
            "first_hit_rank": pa.array([r[1] for r in rows], pa.int64()),
            "dcg10_micro": pa.array([r[2] for r in rows], pa.int64()),
            "idcg10_micro": pa.array([r[3] for r in rows], pa.int64()),
            "ndcg10": pa.array([r[4] for r in rows], pa.float64()),
            "mrr10": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def classifier_pr_curve(sf_dir: str) -> pa.Table:
    """Classifier evaluation sweep — the precision/recall/F1-vs-threshold
    curve a curation pipeline reads before picking its quality cutoff:
    score = the heuristic quality score (4-dp printf-rounded, so the
    threshold comparisons are decided on identical doubles both sides),
    ground truth = the table's own ``lang == 'en'`` label (the usual
    "keep English" target the quality heuristic proxies for),
    thresholds 0.05 … 0.95 step 0.05.

    Scale shape: ONE corpus pass; each batch folds to a 19×4 confusion
    partial (thresholds × tp/fp/fn/tn), the driver fold is
    thresholds-bounded. Ratios computed from raw doubles and printf-
    rounded at the end only (identical IEEE chains in the oracle)."""
    from lamapi_ray.functions.text import round_ref
    from lamapi_ray.stages.textstats import quality_batch

    THR = np.round(np.arange(1, 20) * 0.05, 2)  # exact 2-dp literals

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)["quality"].to_numpy(zero_copy_only=False)
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        y = pc.equal(lang, "en").to_numpy(zero_copy_only=False)
        pred = q[None, :] >= THR[:, None]        # (19, n)
        tp = (pred & y[None, :]).sum(axis=1)
        fp = (pred & ~y[None, :]).sum(axis=1)
        fn = (~pred & y[None, :]).sum(axis=1)
        tn = (~pred & ~y[None, :]).sum(axis=1)
        return pa.table(
            {
                "thr": pa.array(THR, pa.float64()),
                "tp": pa.array(tp.astype(np.int64), pa.int64()),
                "fp": pa.array(fp.astype(np.int64), pa.int64()),
                "fn": pa.array(fn.astype(np.int64), pa.int64()),
                "tn": pa.array(tn.astype(np.int64), pa.int64()),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    parts = _collect(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    agg = parts.group_by("thr").aggregate(
        [("tp", "sum"), ("fp", "sum"), ("fn", "sum"), ("tn", "sum")]
    )
    thr = agg["thr"].to_numpy(zero_copy_only=False)
    order = np.argsort(thr)
    cols = {
        c: agg[f"{c}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        for c in ("tp", "fp", "fn", "tn")
    }
    thr = thr[order]
    prec, rec, f1 = [], [], []
    for tp, fp, fn in zip(cols["tp"], cols["fp"], cols["fn"]):
        p = tp / (tp + fp) if tp + fp > 0 else 0.0
        r = tp / (tp + fn) if tp + fn > 0 else 0.0
        f = 2 * p * r / (p + r) if p + r > 0 else 0.0
        prec.append(round_ref(p, 6))
        rec.append(round_ref(r, 6))
        f1.append(round_ref(f, 6))
    return pa.table(
        {
            "thr": pa.array(thr, pa.float64()),
            "tp": pa.array(cols["tp"], pa.int64()),
            "fp": pa.array(cols["fp"], pa.int64()),
            "fn": pa.array(cols["fn"], pa.int64()),
            "tn": pa.array(cols["tn"], pa.int64()),
            "precision": pa.array(prec, pa.float64()),
            "recall": pa.array(rec, pa.float64()),
            "f1": pa.array(f1, pa.float64()),
        }
    )


def join_size_estimate(sf_dir: str) -> pa.Table:
    """Join-cardinality estimation from sketches — the query-optimizer
    statistic that prices a shuffle join without running it: the inner
    product of two Count-Min sketch rows upper-bounds the equi-join size
    (Σ_k a(k)·b(k) ≤ Σ_col A[d][col]·B[d][col] for every row d; the MIN
    over the d rows is the estimate, never an underestimate). Sides: ALL
    events vs purchase events, joined on user_id — genuinely
    many-to-many, so the exact size Σ_u n_u·p_u is non-trivial.

    Scale shape: each side folds to its ≤4·1024-cell register table
    (one tiny grouped exchange each — the CMS contract); the inner
    products are a 4×1024 numpy dot on the driver. The EXACT size (the
    verification column) folds per-user partial counts through one
    user-bounded exchange and sums n_u·p_u — never materializing the
    join. Output: one row per CMS row d with its inner product, plus the
    estimate (min) and exact size as constant columns."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.sketch import CMS_D, CMS_W, count_min_sketch

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def purchases(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["event_type"], "purchase")
        return pa.table({"user_id": b.filter(mask)["user_id"]})

    side_a = ev.select_columns(["user_id"])
    side_b = ev.map_batches(purchases, batch_format="pyarrow", zero_copy_batch=True)

    def registers(ds) -> np.ndarray:
        tbl = _collect(count_min_sketch(ds, "user_id"))
        m = np.zeros(CMS_D * CMS_W, np.int64)
        key = (
            tbl["row"].to_numpy(zero_copy_only=False) * CMS_W
            + tbl["col"].to_numpy(zero_copy_only=False)
        )
        m[key] = tbl["n"].to_numpy(zero_copy_only=False)
        return m.reshape(CMS_D, CMS_W)

    A, B = registers(side_a), registers(side_b)
    inner = (A * B).sum(axis=1)
    est = int(inner.min())

    # exact Σ_u n_u · p_u, user-bounded fold
    def per_user(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isp = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        uu, inv = np.unique(u, return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        p = np.zeros(len(uu), np.int64)
        np.add.at(p, inv, isp.astype(np.int64))
        return pa.table(
            {"u": pa.array(uu, pa.int64()),
             "n": pa.array(n, pa.int64()),
             "p": pa.array(p, pa.int64())}
        )

    peru = _collect(
        ev.map_batches(per_user, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .aggregate(Sum("n"), Sum("p"))
    )
    exact = int(
        np.sum(
            peru["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
            * peru["sum(p)"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
    )
    return pa.table(
        {
            "row": pa.array(np.arange(CMS_D), pa.int64()),
            "inner_product": pa.array(inner, pa.int64()),
            "est_pairs": pa.array(np.full(CMS_D, est), pa.int64()),
            "exact_pairs": pa.array(np.full(CMS_D, exact), pa.int64()),
        }
    )


def embedding_standardize(sf_dir: str) -> pa.Table:
    """Per-dimension feature statistics for embedding standardization —
    the scaling pass run before kNN/clustering on raw features: each
    float is quantized ONCE to integer micro-units (floor(v·10⁶) after
    the exact float32→float64 widening), so the per-dim sums and
    sums-of-squares are order-exact integers; mean/std are then closed-
    form doubles printf-rounded at the end (population variance,
    Σq²/n − (Σq/n)² in micro² units).

    Scale shape: per-batch (dim, n, Σq, Σq²) partials — dims-bounded —
    into one tiny grouped exchange. Output: one row per dimension."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.text import round_ref

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "sum_q": pa.array([], pa.int64()),
                 "sumsq_q": pa.array([], pa.int64())}
            )
        d = int(lens[0])
        if not np.all(lens == d):
            raise ValueError("ragged embedding lengths")
        q = np.floor(flat * 1_000_000).astype(np.int64).reshape(-1, d)
        return pa.table(
            {
                "dim": pa.array(np.arange(d), pa.int64()),
                "n": pa.array(np.full(d, q.shape[0], np.int64), pa.int64()),
                "sum_q": pa.array(q.sum(axis=0), pa.int64()),
                "sumsq_q": pa.array((q * q).sum(axis=0), pa.int64()),
            }
        )

    agg = _collect(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Sum("n"), Sum("sum_q"), Sum("sumsq_q"))
    )
    dim = agg["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(dim)
    n = agg["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    s1 = agg["sum(sum_q)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    s2 = agg["sum(sumsq_q)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    mean = [round_ref(a / b / 1_000_000, 6) for a, b in zip(s1, n)]
    import math

    std = [
        round_ref(
            math.sqrt(b / c - (a / c) * (a / c)) / 1_000_000
            if b / c - (a / c) * (a / c) > 0 else 0.0,
            6,
        )
        for a, b, c in zip(s1, s2, n)
    ]
    return pa.table(
        {
            "dim": pa.array(dim[order], pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_q": pa.array(s1, pa.int64()),
            "sumsq_q": pa.array(s2, pa.int64()),
            "mean": pa.array(mean, pa.float64()),
            "std": pa.array(std, pa.float64()),
        }
    )


def embedding_covariance(sf_dir: str) -> pa.Table:
    """Full d×d covariance matrix of the embedding corpus — the
    whitening/PCA-prep pass: values quantized once to integer
    milli-units (floor(v·10³) after exact f32→f64 widening; second
    moments then stay < 2^63 up to ~10¹² rows of unit-scale features),
    per-batch QᵀQ + column-sum partials — d²-bounded — into one tiny
    grouped exchange; covariance ΣᵢΣⱼ/n − μᵢμⱼ in closed form,
    printf-rounded at the end only.

    Output: one row per (dim_i ≤ dim_j) upper-triangle pair."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.text import round_ref

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return pa.table(
                {"i": pa.array([], pa.int64()),
                 "j": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "sum_i": pa.array([], pa.int64()),
                 "sum_j": pa.array([], pa.int64()),
                 "sum_ij": pa.array([], pa.int64())}
            )
        d = int(lens[0])
        q = np.floor(flat * 1_000).astype(np.int64).reshape(-1, d)
        g = q.T @ q  # (d, d) exact int64
        s = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "n": pa.array(
                    np.full(len(iu), q.shape[0], np.int64), pa.int64()
                ),
                "sum_i": pa.array(s[iu], pa.int64()),
                "sum_j": pa.array(s[ju], pa.int64()),
                "sum_ij": pa.array(g[iu, ju], pa.int64()),
            }
        )

    agg = _collect(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("n"), Sum("sum_i"), Sum("sum_j"), Sum("sum_ij"))
    )
    i = agg["i"].to_numpy(zero_copy_only=False).astype(np.int64)
    j = agg["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((j, i))
    i, j = i[order], j[order]
    n = agg["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    si = agg["sum(sum_i)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    sj = agg["sum(sum_j)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    sij = agg["sum(sum_ij)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    cov = [
        round_ref((c / m - (a / m) * (b / m)) / 1_000_000, 6)
        for a, b, c, m in zip(si, sj, sij, n)
    ]
    return pa.table(
        {
            "dim_i": pa.array(i, pa.int64()),
            "dim_j": pa.array(j, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_ij": pa.array(sij, pa.int64()),
            "cov": pa.array(cov, pa.float64()),
        }
    )


def mi_feature_ranking(sf_dir: str) -> pa.Table:
    """Mutual-information feature ranking — the feature-selection pass a
    training pipeline runs over (embedding dim, class label): each value
    is binned by the fixed rule clip(floor(v), -2, 1) (4 bins on a
    unit-scale feature), MI(dim) = Σ_{b,l} (n_bl/n)·ln(n_bl·n/(n_b·n_l))
    with every term floor-quantized to integer NANO-nats so the per-dim
    sum is order-exact.

    Scale shape: ONE corpus pass emitting (dim, bin, label, count)
    partials — ≤ dims×bins×labels rows per batch — into one tiny grouped
    exchange; the MI fold is contingency-table-bounded on the driver.
    Output: (dim, mi_nano, mi_rank) with rank by MI desc, dim asc."""
    import math

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "bin": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        d = int(lens[0])
        b = np.clip(np.floor(flat), -2, 1).astype(np.int64).reshape(-1, d)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        dims = np.tile(np.arange(d, dtype=np.int64), b.shape[0])
        labs = np.repeat(lab, d)
        # packed (dim, bin+2, label) key — labels < 2^16 by contract
        key = (dims * 4 + (b.ravel() + 2)) * np.int64(1 << 16) + labs
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "dim": pa.array((u >> np.int64(16)) // 4, pa.int64()),
                "bin": pa.array((u >> np.int64(16)) % 4 - 2, pa.int64()),
                "label": pa.array(u & np.int64(0xFFFF), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = _collect(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dim", "bin", "label"])
        .aggregate(Sum("c"))
    )
    dim = agg["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    bn = agg["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    lb = agg["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = agg["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    dims = np.unique(dim)
    mi = {}
    for dd in dims:
        m = dim == dd
        nbl = {}
        for bb, ll, cc in zip(bn[m], lb[m], c[m]):
            nbl[(int(bb), int(ll))] = int(cc)
        n = sum(nbl.values())
        nb = {}
        nl = {}
        for (bb, ll), cc in nbl.items():
            nb[bb] = nb.get(bb, 0) + cc
            nl[ll] = nl.get(ll, 0) + cc
        tot = 0
        for (bb, ll), cc in nbl.items():
            term = (cc / n) * math.log((cc * n) / (nb[bb] * nl[ll]))
            tot += int(math.floor(term * 1_000_000_000))
        mi[int(dd)] = tot
    out_dim = sorted(mi)
    vals = np.array([mi[x] for x in out_dim], np.int64)
    order = np.lexsort((out_dim, -vals))
    rank = np.empty(len(vals), np.int64)
    rank[order] = np.arange(1, len(vals) + 1)
    return pa.table(
        {
            "dim": pa.array(out_dim, pa.int64()),
            "mi_nano": pa.array(vals, pa.int64()),
            "mi_rank": pa.array(rank, pa.int64()),
        }
    )


def calibration_bins(sf_dir: str) -> pa.Table:
    """Reliability diagram (calibration) of the quality score against the
    lang=='en' ground truth — the third eval-family leg next to the PR
    sweep and retrieval metrics: scores bucketed into 10 equal-width
    bins (floor(q·10) clipped to 9), per bin the count, positive count,
    mean predicted score (order-exact micro-unit sum of the 4-dp scores)
    and observed positive rate; ECE summands derivable downstream.

    ONE corpus pass, ≤10-row per-batch partials, tiny grouped fold."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.text import round_ref
    from lamapi_ray.stages.textstats import quality_batch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)["quality"].to_numpy(zero_copy_only=False)
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        y = pc.equal(lang, "en").to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(np.floor(q * 10).astype(np.int64), 9)
        # q is 4-dp printf-rounded → q·1e6 is an exact integer in double
        qmicro = np.rint(q * 1_000_000).astype(np.int64)
        u, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        pos = np.zeros(len(u), np.int64)
        np.add.at(pos, inv, y)
        sq = np.zeros(len(u), np.int64)
        np.add.at(sq, inv, qmicro)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "n_pos": pa.array(pos, pa.int64()),
                "sum_q_micro": pa.array(sq, pa.int64()),
            }
        )

    agg = _collect(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n"), Sum("n_pos"), Sum("sum_q_micro"))
    )
    b = agg["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b)
    n = agg["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    pos = agg["sum(n_pos)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    sq = agg["sum(sum_q_micro)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    return pa.table(
        {
            "bin": pa.array(b[order], pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_pos": pa.array(pos, pa.int64()),
            "mean_score": pa.array(
                [round_ref(a / c / 1_000_000, 6) for a, c in zip(sq, n)],
                pa.float64(),
            ),
            "pos_rate": pa.array(
                [round_ref(p / c, 6) for p, c in zip(pos, n)], pa.float64()
            ),
        }
    )


def local_clustering(sf_dir: str) -> pa.Table:
    """Per-node local clustering coefficient over the hyperlink graph
    (same planted-triad edge set as ``link_triangles`` — the organic
    anchor graph is triangle-free): cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    on the undirected distinct graph, the node-level spam/community
    signal next to the global triangle count.

    Scale shape: the degree-ordered orientation (every edge directed
    from its lower (deg, id) endpoint) caps out-degrees at O(√m), so
    wedge volume is O(m^1.5) regardless of skew; wedges are generated
    inside ONE apex-hash exchange (vectorized run pairs) and closed with
    ONE bucketed hash join against the oriented edge set; each closed
    triangle emits its three node increments into a node-bounded count
    fold. Degrees broadcast sorted (node-bounded — the pagerank
    fast path; the bucketed attach documented in triangle_count is the
    >50M-node path). Output: (node, degree, n_triangles, cc) for nodes
    with degree ≥ 2."""
    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds
    from lamapi_ray.stages.join import bucketed_hash_join
    from lamapi_ray.stages.linkgraph import extract_links
    from lamapi_ray.stages.textstats import round_ref_array
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    P = _scaled(0.5, 16)

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table({"a": ids(batch["src"]), "b": ids(batch["dst"])})

    ndocs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def triads(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = did[(did % 7 == 0) & (did + 2 < ndocs)]
        return pa.table(
            {
                "a": pa.array(np.concatenate([d, d + 1, d]), pa.int64()),
                "b": pa.array(np.concatenate([d + 1, d + 2, d + 2]), pa.int64()),
            }
        )

    raw = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _docs(sf_dir, cols=("doc_id",)).map_batches(
                triads, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        key = lo * np.int64(1 << 32) + hi  # ids < 2^31 by construction
        u = np.unique(key)
        return pa.table(
            {
                "a": pa.array(u >> np.int64(32), pa.int64()),
                "b": pa.array(u & np.int64((1 << 32) - 1), pa.int64()),
            }
        )

    # distinct undirected edges: map-side distinct + one grouped distinct
    edges = (
        raw.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"], num_partitions=P)
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )

    # node-bounded degrees, broadcast sorted
    def ends(b: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    degt = _collect(
        edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node", num_partitions=P)
        .aggregate(Sum("c"))
    )
    nodes = degt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    degs = degt["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]

    def rank(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(nodes, v)
        if len(v) and not np.all(nodes[np.minimum(pos, len(nodes) - 1)] == v):
            raise ValueError("edge endpoint missing from degree table")
        return degs[pos], v

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        da, _ = rank(a)
        db, _ = rank(b)
        # direct from the lower (deg, id) endpoint
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    oriented = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def apex_key(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__ak", pa.array((s * 2654435761 % 4294967296) % P, pa.int64())
        )

    def wedges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"wsrc": pa.array([], pa.int64()),
             "wdst": pa.array([], pa.int64()),
             "apex": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        s = group["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = group["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        starts, lens = _run_bounds([s])
        xs, ys, ap = [], [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            # wedge legs d[ia] < d[ib] by run sort; the closing edge is
            # oriented from its lower (deg, id) endpoint — recompute
            xs.append(d[ia])
            ys.append(d[ib])
            ap.append(s[ia])
        if not xs:
            return empty
        v = np.concatenate(xs)
        w = np.concatenate(ys)
        a_ = np.concatenate(ap)
        dv, _ = rank(v)
        dw, _ = rank(w)
        vf = (dv < dw) | ((dv == dw) & (v < w))
        return pa.table(
            {
                "wsrc": pa.array(np.where(vf, v, w), pa.int64()),
                "wdst": pa.array(np.where(vf, w, v), pa.int64()),
                "apex": pa.array(a_, pa.int64()),
            }
        )

    wedge_ds = (
        oriented.map_batches(apex_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__ak", num_partitions=P)
        .map_groups(wedges, batch_format="pyarrow")
    )

    def edge_key(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"ekey": pa.array(s * np.int64(1 << 32) + d, pa.int64())}
        )

    def wedge_key(b: pa.Table) -> pa.Table:
        s = b["wsrc"].to_numpy(zero_copy_only=False)
        d = b["wdst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ekey": pa.array(s * np.int64(1 << 32) + d, pa.int64()),
                "wsrc": b["wsrc"],
                "wdst": b["wdst"],
                "apex": b["apex"],
            }
        )

    closed = bucketed_hash_join(
        wedge_ds.map_batches(wedge_key, batch_format="pyarrow", zero_copy_batch=True),
        oriented.map_batches(edge_key, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: pa.table(
                {"ekey": b["ekey"], "hit": pa.array(
                    np.ones(len(b), np.int8), pa.int8())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        on="ekey", num_buckets=P,
    )

    def tri_nodes(b: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                b["wsrc"].to_numpy(zero_copy_only=False),
                b["wdst"].to_numpy(zero_copy_only=False),
                b["apex"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "t": pa.array(c, pa.int64())}
        )

    trit = _collect(
        closed.map_batches(tri_nodes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node", num_partitions=P)
        .aggregate(Sum("t"))
    )
    tri = np.zeros(len(nodes), np.int64)
    if trit.num_rows and "node" in trit.column_names:
        tn = trit["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        tv = trit["sum(t)"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nodes, tn)
        if not np.all(nodes[np.minimum(pos, len(nodes) - 1)] == tn):
            raise ValueError("triangle node missing from degree table")
        tri[pos] = tv
    keep = degs >= 2
    n2, d2, t2 = nodes[keep], degs[keep], tri[keep]
    cc = round_ref_array(2.0 * t2 / (d2 * (d2 - 1.0)), 6)
    return pa.table(
        {
            "node": pa.array(n2, pa.int64()),
            "degree": pa.array(d2, pa.int64()),
            "n_triangles": pa.array(t2, pa.int64()),
            "cc": pa.array(cc, pa.float64()),
        }
    )


def lang_confusion(sf_dir: str) -> pa.Table:
    """Language-ID confusion matrix — the eval view of the heuristic
    stopword classifier against the table's true ``lang``: one corpus
    pass folding per-batch (lang_true, lang_pred) count partials —
    ≤ |langs|²-bounded — through one tiny exchange, plus per-true-lang
    recall (printf-rounded). The matrix is what a curation team reads
    before trusting lang_id for filtering."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.text import round_ref
    from lamapi_ray.stages.textstats import lang_id_batch

    docs = _docs(sf_dir, ("doc_id", "lang", "text"))

    def partial(batch: pa.Table) -> pa.Table:
        scored = lang_id_batch(batch)
        t = scored["lang"].to_numpy(zero_copy_only=False)
        p = scored["lang_pred"].to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(t.astype(str), "|"), p.astype(str))
        u, c = np.unique(key, return_counts=True)
        parts = np.char.partition(u, "|")
        return pa.table(
            {
                "lang_true": pa.array(parts[:, 0].tolist(), pa.string()),
                "lang_pred": pa.array(parts[:, 2].tolist(), pa.string()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = _collect(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang_true", "lang_pred"])
        .aggregate(Sum("c"))
    ).sort_by([("lang_true", "ascending"), ("lang_pred", "ascending")])
    t = agg["lang_true"].to_pylist()
    p = agg["lang_pred"].to_pylist()
    c = agg["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    tot = {}
    for tt, cc in zip(t, c):
        tot[tt] = tot.get(tt, 0) + int(cc)
    rec = [
        round_ref((int(cc) / tot[tt]) if tt == pp else 0.0, 6)
        for tt, pp, cc in zip(t, p, c)
    ]
    return pa.table(
        {
            "lang_true": pa.array(t, pa.string()),
            "lang_pred": pa.array(p, pa.string()),
            "n": pa.array(c, pa.int64()),
            "recall": pa.array(rec, pa.float64()),
        }
    )


def degree_histogram(sf_dir: str) -> pa.Table:
    """Log-binned in-degree distribution of the hyperlink graph — the
    power-law diagnostic every web-graph paper opens with: bin =
    floor(log2(indegree)) (bin 0 = degree 1), one node-bounded degree
    fold then a bins-bounded histogram fold; nothing edge-sized leaves
    the first exchange. A deterministic 16-hub overlay (doc_id % 16,
    the planted-triads idiom) gives the gate-scale graph the heavy tail
    real web graphs have, so the histogram spans bins instead of
    collapsing to degree 1-2."""
    from ray.data.aggregate import Sum

    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    def dst_ids(batch: pa.Table) -> pa.Table:
        col = batch["dst"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    def hub_ids(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(ids % 16, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    hub = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(hub_ids, batch_format="pyarrow", zero_copy_batch=True)

    deg = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(dst_ids, batch_format="pyarrow", zero_copy_batch=True)
        .union(hub)
        .groupby("node", num_partitions=_scaled(0.5, 16))
        .aggregate(Sum("c"))
    )

    def to_bins(b: pa.Table) -> pa.Table:
        d = b["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact integer log2 bin (degrees < 2^31: powers of two are exact
        # in double and log2(2^k - 1) < k, so floor never crosses a bin)
        bins = np.floor(np.log2(d.astype(np.float64))).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    hist = _collect(
        deg.map_batches(to_bins, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("c"))
    )
    b = hist["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b)
    return pa.table(
        {
            "bin": pa.array(b[order], pa.int64()),
            "lo_degree": pa.array((np.int64(1) << b[order]), pa.int64()),
            "n_nodes": pa.array(
                hist["sum(c)"].to_numpy(zero_copy_only=False)
                .astype(np.int64)[order],
                pa.int64(),
            ),
        }
    )


def predicate_functionality(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """PARIS-style predicate functionality profile over the KG edge list
    (Suchanek et al., "PARIS: Probabilistic Alignment of Relations,
    Instances, and Schema", VLDB 2012) — the schema-quality signal KG
    construction uses to pick functional predicates for conflict
    resolution and alignment: per predicate, n_triples, distinct
    subject/object counts, functionality = n_subjects / n_triples
    (1.0 = strictly functional) and inverse_functionality =
    n_objects / n_triples.

    Dataflow: ONE distinct exchange over tagged ``pred\\x01{s,o}\\x01id``
    keys (per-batch pre-unique halves what ships), a predicate-bounded
    count fold on top, plus a separate predicate-bounded triple-count
    fold; nothing edge-sized reaches the driver. Ratios are IEEE
    divisions of exact int64 counts, printf-rounded (round_ref) on both
    engine and oracle sides."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import scaled_partitions

    edges = ray.data.from_arrow(adjacency).repartition(scaled_partitions(1.0, 8))

    def _col(batch: pa.Table, n: str) -> pa.Array:
        c = batch[n]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def tag_pairs(batch: pa.Table) -> pa.Table:
        p = _col(batch, "pred")
        n = len(batch)
        ks = pc.binary_join_element_wise(
            p, pa.array(["s"] * n), _col(batch, "subj"), "\x01"
        )
        ko = pc.binary_join_element_wise(
            p, pa.array(["o"] * n), _col(batch, "obj"), "\x01"
        )
        u = pc.unique(
            pa.chunked_array([ks.cast(pa.string()), ko.cast(pa.string())])
        )
        return pa.table({"key": u})

    def pair_fold(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(_col(batch, "key"), "\x01")
        pk = pc.binary_join_element_wise(
            pc.list_element(parts, 0), pc.list_element(parts, 1), "\x01"
        )
        vc = pc.value_counts(pk)
        return pa.table(
            {
                "pk": vc.field("values").cast(pa.string()),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    pair_counts = _collect(
        edges.map_batches(tag_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key", num_partitions=scaled_partitions(1.0, 8))
        .count()
        .map_batches(pair_fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .aggregate(Sum("c"))
    )

    def pred_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(_col(batch, "pred"))
        return pa.table(
            {
                "pred": vc.field("values").cast(pa.string()),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    totals = _collect(
        edges.map_batches(pred_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pred")
        .aggregate(Sum("c"))
    )

    n_tri = {
        p: c
        for p, c in zip(totals["pred"].to_pylist(), totals["sum(c)"].to_pylist())
    }
    n_subj = dict.fromkeys(n_tri, 0)
    n_obj = dict.fromkeys(n_tri, 0)
    for pk, c in zip(
        pair_counts["pk"].to_pylist(), pair_counts["sum(c)"].to_pylist()
    ):
        p, tag = pk.split("\x01")
        (n_subj if tag == "s" else n_obj)[p] = c

    preds = sorted(n_tri)
    return pa.table(
        {
            "pred": pa.array(preds, pa.string()),
            "n_triples": pa.array([n_tri[p] for p in preds], pa.int64()),
            "n_subjects": pa.array([n_subj[p] for p in preds], pa.int64()),
            "n_objects": pa.array([n_obj[p] for p in preds], pa.int64()),
            "functionality": pa.array(
                [round_ref(n_subj[p] / n_tri[p], 6) for p in preds], pa.float64()
            ),
            "inverse_functionality": pa.array(
                [round_ref(n_obj[p] / n_tri[p], 6) for p in preds], pa.float64()
            ),
        }
    )


def zipf_slope(sf_dir: str, top_n: int = 100) -> pa.Table:
    """Zipf rank-frequency power-law fit over the corpus unigram
    distribution — the classic webtext sanity diagnostic (Zipf's law:
    log f ≈ intercept + slope·log r with slope near −1; a corpus whose
    head deviates hard is boilerplate- or spam-skewed). OLS over
    (ln rank, ln count) of the top ``top_n`` tokens by (count desc,
    token asc).

    Dataflow: per-batch exact token partials (one dictionary-encode +
    bincount per batch, same tokenization as ``heavy_tokens``) → ONE
    vocabulary-bounded groupby.sum → per-block local top-N (each token
    lives in exactly one post-shuffle partition, and block-local top-N
    under a total order is a superset filter for the global top-N) →
    driver merges blocks×N rows. Logs are micro-nat floor-quantized
    int64 (math.log ≡ DuckDB ln — same libm), so the OLS sums are exact
    integers on both sides and the final slope/intercept are identical
    IEEE expressions, printf-rounded."""
    import math

    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import scaled_partitions
    from lamapi_ray.stages.textstats import _tokens

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _tokens(batch)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table(
            {
                "token": enc.dictionary.cast(pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def local_topn(batch: pa.Table) -> pa.Table:
        if len(batch) <= top_n:
            return batch
        cnt = batch["sum(c)"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = np.array(batch["token"].to_pylist())
        order = np.lexsort((tok, -cnt))[:top_n]
        return batch.take(pa.array(np.sort(order)))

    cand = _collect(
        _docs(sf_dir)
        .map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token", num_partitions=scaled_partitions(1.0, 16))
        .aggregate(Sum("c"))
        .map_batches(local_topn, batch_format="pyarrow", zero_copy_batch=True)
    )
    cnt = cand["sum(c)"].combine_chunks().to_numpy(zero_copy_only=False)
    tok = np.array(cand["token"].to_pylist())
    order = np.lexsort((tok, -cnt))[:top_n]
    c_top = cnt[order]

    n = len(c_top)
    x = [math.floor(math.log(r) * 1e6) for r in range(1, n + 1)]
    y = [math.floor(math.log(int(c)) * 1e6) for c in c_top]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    intercept = (float(sy) - slope * float(sx)) / (n * 1e6)
    return pa.table(
        {
            "n_top": pa.array([n], pa.int64()),
            "slope": pa.array([round_ref(slope, 6)], pa.float64()),
            "intercept": pa.array([round_ref(intercept, 6)], pa.float64()),
        }
    )


def anchor_prior(sf_dir: str) -> pa.Table:
    """Anchor-text → entity link prior P(dst | anchor) — the dictionary
    Wikipedia-style entity linkers build from inbound anchors (the
    commonness prior of Milne & Witten, CIKM 2008); lamAPI derives the
    same surface→entity prior from labels/aliases
    (scripts/parse_wikidata_dump.py:151). Per (anchor, dst): inbound
    count n, per-anchor total, prior = n / total.

    Dataflow: the pair counts come from ONE vocabulary-bounded
    groupby-sum (stages/linkgraph.py::anchor_surface_forms, map-side
    combined — the only corpus-sized pass); the anchor totals and ratio
    composition are driver folds over that surface-vocabulary-sized
    output by contract (the same shape as the summary sinks). Priors
    are IEEE divisions of exact int64 counts, printf-rounded."""
    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import (
        anchor_surface_forms,
        extract_anchor_texts,
    )

    pairs = _collect(
        anchor_surface_forms(extract_anchor_texts(synth.pages_dataset(sf_dir)))
    ).combine_chunks()
    tot: dict[str, int] = {}
    for a, c in zip(pairs["anchor"].to_pylist(), pairs["n"].to_pylist()):
        tot[a] = tot.get(a, 0) + c

    anchor = pairs["anchor"].to_pylist()
    dst = pairs["dst"].to_pylist()
    n = pairs["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = sorted(range(len(anchor)), key=lambda i: (anchor[i], dst[i]))
    return pa.table(
        {
            "anchor": pa.array([anchor[i] for i in order], pa.string()),
            "dst": pa.array([dst[i] for i in order], pa.string()),
            "n": pa.array([int(n[i]) for i in order], pa.int64()),
            "anchor_total": pa.array(
                [tot[anchor[i]] for i in order], pa.int64()
            ),
            "prior": pa.array(
                [
                    round_ref(int(n[i]) / tot[anchor[i]], 6)
                    for i in order
                ],
                pa.float64(),
            ),
        }
    )


def adamic_adar(sf_dir: str, max_apex_degree: int | None = None) -> pa.Table:
    """Adamic-Adar link prediction over the hyperlink graph (Adamic &
    Adar, "Friends and neighbors on the Web", Social Networks 2003) —
    the common-neighbor score KG-completion and related-page systems
    rank candidate edges with: for every non-adjacent pair (a, b),
    score = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg(z)). Same undirected distinct
    edge set as ``local_clustering`` (organic anchor links + planted
    triads; the 16-hub overlay is deliberately excluded — a hub apex
    contributes Θ(deg²) wedges of near-zero 1/ln weight, which is
    exactly what ``max_apex_degree`` prunes at real scale).

    Scale shape: adjacency rows (apex, neighbor) go through ONE
    apex-hash exchange so each apex's full neighborhood is co-located;
    wedge pairs are emitted vectorized per run with the apex weight
    quantized ONCE to integer micro-nats (q = floor(1e6/ln(deg)),
    math.log ≡ DuckDB ln on integer-valued doubles) so the per-pair
    sums are order-exact int64; a pair-bounded groupby-sum folds them;
    existing edges are removed by a broadcast sorted-edge-key filter
    (edge set is node-bounded here; the >10⁸-edge path is the bucketed
    anti-join of ``bloom_semi_join``). ``max_apex_degree`` caps the
    per-apex wedge volume (standard AA approximation: high-degree
    apexes carry the least weight) — None (exact) at gate scale.

    Output: (a, b, n_common, score_micro, score) for non-adjacent
    pairs with ≥1 common neighbor, sorted by (a, b)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds
    from lamapi_ray.stages.linkgraph import extract_links

    P = _scaled(0.5, 16)
    ndocs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def to_ids(batch: pa.Table) -> pa.Table:
        def ids(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.cast(pc.utf8_slice_codeunits(col, 6), pa.int64())

        return pa.table({"a": ids(batch["src"]), "b": ids(batch["dst"])})

    def triads(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = did[(did % 7 == 0) & (did + 2 < ndocs)]
        return pa.table(
            {
                "a": pa.array(np.concatenate([d, d + 1, d]), pa.int64()),
                "b": pa.array(np.concatenate([d + 1, d + 2, d + 2]), pa.int64()),
            }
        )

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        key = lo * np.int64(1 << 32) + hi  # ids < 2^31 by construction
        u = np.unique(key)
        return pa.table(
            {
                "a": pa.array(u >> np.int64(32), pa.int64()),
                "b": pa.array(u & np.int64((1 << 32) - 1), pa.int64()),
            }
        )

    edges = (
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _docs(sf_dir, cols=("doc_id",)).map_batches(
                triads, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"], num_partitions=P)
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )

    # both directions, apex-hash key: each apex's neighborhood co-locates
    def adj(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.concatenate([a, bb])
        y = np.concatenate([bb, a])
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "__ak": pa.array((x * 2654435761 % 4294967296) % P, pa.int64()),
            }
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pa_": pa.array([], pa.int64()),
                "pb": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
                "one": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        x = group["x"].combine_chunks().to_numpy(zero_copy_only=False)
        y = group["y"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        starts, lens = _run_bounds([x])
        # apex degree = run length (edges are distinct); quantized weight
        if max_apex_degree is not None:
            keep = lens <= max_apex_degree
            starts, lens = starts[keep], lens[keep]
            if len(starts) == 0:
                return empty
        run_q = np.zeros(len(lens), np.int64)
        m2 = lens >= 2  # deg-1 apexes emit no pairs; avoid ln(1)=0 division
        run_q[m2] = np.floor(
            1e6 / np.log(lens[m2].astype(np.float64))
        ).astype(np.int64)
        # absolute index → its run's weight, via run id lookup
        run_of = np.zeros(len(x), np.int64)
        run_of[starts[1:]] = 1
        run_of = np.cumsum(run_of)
        us, vs, qs = [], [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            us.append(y[ia])  # y sorted within run → y[ia] < y[ib]
            vs.append(y[ib])
            qs.append(run_q[run_of[ia]])
        if not us:
            return empty
        u = np.concatenate(us)
        v = np.concatenate(vs)
        q = np.concatenate(qs)
        return pa.table(
            {
                "pa_": pa.array(u, pa.int64()),
                "pb": pa.array(v, pa.int64()),
                "q": pa.array(q, pa.int64()),
                "one": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        )

    scored = (
        edges.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__ak", num_partitions=P)
        .map_groups(wedge_pairs, batch_format="pyarrow")
        .groupby(["pa_", "pb"], num_partitions=P)
        .aggregate(Sum("q"), Sum("one"))
    )

    # broadcast sorted edge keys; drop pairs that are already edges
    et = _collect(edges)
    ekeys = np.sort(
        et["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        * np.int64(1 << 32)
        + et["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    ekeys_ref = ray.put(ekeys)

    def non_edges(b: pa.Table) -> pa.Table:
        ek = ray.get(ekeys_ref)
        a = b["pa_"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["pb"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = a * np.int64(1 << 32) + bb
        pos = np.searchsorted(ek, key)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == key)
        return b.filter(pa.array(~hit))

    out = _collect(
        scored.map_batches(non_edges, batch_format="pyarrow", zero_copy_batch=True)
    )
    a = out["pa_"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = out["pb"].to_numpy(zero_copy_only=False).astype(np.int64)
    sm = out["sum(q)"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = out["sum(one)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((b, a))
    from lamapi_ray.stages.textstats import round_ref_array

    return pa.table(
        {
            "a": pa.array(a[order], pa.int64()),
            "b": pa.array(b[order], pa.int64()),
            "n_common": pa.array(nc[order], pa.int64()),
            "score_micro": pa.array(sm[order], pa.int64()),
            "score": pa.array(
                round_ref_array(sm[order] / 1e6, 6), pa.float64()
            ),
        }
    )


def itemset_pairs(sf_dir: str, min_support: int = 2) -> pa.Table:
    """A-Priori frequent 2-itemsets over per-user event-type baskets
    (Agrawal & Srikant, VLDB 1994 — the market-basket leg of the mining
    family next to term_pmi's token association): basket = the DISTINCT
    set of event types a user ever emitted, support(a,b) = #users whose
    basket holds both, lift = support·n_users / (sup_a·sup_b). Pairs
    with support < ``min_support`` are pruned (the A-Priori downward
    closure step — at 2 items the candidate set is the type-vocabulary
    square, so pruning happens after the single count fold).

    Scale shape: map-side per-batch distinct (user, type) halves the
    wire, then ONE coarse user-hash exchange co-locates each user's
    basket; the per-partition kernel is np.unique over packed
    (user, type-code) keys + vectorized within-run pair expansion —
    partials are ≤ |types|² + |types| + 1 rows per partition (singleton
    supports and the user count ride the same fold tagged by a sentinel
    item_b), so the final exchange is vocabulary-bounded. Lift is an
    IEEE division of exact int64 products (well under 2^53),
    printf-rounded identically on both sides."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds

    P = _scaled(0.5, 16)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pre_distinct(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        if len(et) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                }
            )
        types, code = np.unique(et, return_inverse=True)
        key = np.unique(uid * np.int64(len(types)) + code)
        return pa.table(
            {
                "user_id": pa.array(key // len(types), pa.int64()),
                "event_type": pa.array(
                    types[key % len(types)].tolist(), pa.string()
                ),
            }
        )

    def basket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "item_a": pa.array([], pa.string()),
                "item_b": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        et = group["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        types, code = np.unique(et, return_inverse=True)
        K = np.int64(len(types))
        if len(uid) and (uid.max() >= (1 << 56) // K or uid.min() < 0):
            raise ValueError("user_id outside the pack domain")
        key = np.unique(uid * K + code)
        ku, kc = key // K, (key % K).astype(np.int64)
        starts, lens = _run_bounds([ku])
        ia_all, ib_all = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            ia_all.append(kc[ia])
            ib_all.append(kc[ib])
        out_a, out_b, out_c = [], [], []
        if ia_all:
            pk = np.concatenate(ia_all) * K + np.concatenate(ib_all)
            u, c = np.unique(pk, return_counts=True)
            out_a += types[(u // K).astype(np.int64)].tolist()
            out_b += types[(u % K).astype(np.int64)].tolist()
            out_c += c.astype(np.int64).tolist()
        # singleton supports (item_b = "" sentinel) + user count ("","")
        su, sc = np.unique(kc, return_counts=True)
        out_a += types[su].tolist()
        out_b += [""] * len(su)
        out_c += sc.astype(np.int64).tolist()
        out_a.append("")
        out_b.append("")
        out_c.append(int(len(starts)))
        return pa.table(
            {
                "item_a": pa.array(out_a, pa.string()),
                "item_b": pa.array(out_b, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    folded = _collect(
        ev.map_batches(pre_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _user_pk(b, P), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__upk", num_partitions=P)
        .map_groups(basket_pairs, batch_format="pyarrow")
        .groupby(["item_a", "item_b"], num_partitions=1)
        .aggregate(Sum("c"))
    )
    a = folded["item_a"].to_pylist()
    b = folded["item_b"].to_pylist()
    c = folded["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_users = 0
    sup1: dict[str, int] = {}
    pairs: list[tuple[str, str, int]] = []
    for aa, bb, cc in zip(a, b, c):
        if aa == "" and bb == "":
            n_users = int(cc)
        elif bb == "":
            sup1[aa] = int(cc)
        else:
            pairs.append((aa, bb, int(cc)))
    pairs = sorted(p for p in pairs if p[2] >= min_support)
    return pa.table(
        {
            "item_a": pa.array([p[0] for p in pairs], pa.string()),
            "item_b": pa.array([p[1] for p in pairs], pa.string()),
            "support": pa.array([p[2] for p in pairs], pa.int64()),
            "lift": pa.array(
                [
                    round_ref(
                        (p[2] * n_users) / (sup1[p[0]] * sup1[p[1]]), 6
                    )
                    for p in pairs
                ],
                pa.float64(),
            ),
        }
    )


def predicate_inverse_align(sf_dir: str, adjacency: pa.Table) -> pa.Table:
    """PARIS inverse-relation alignment over the KG edge list (Suchanek
    et al., VLDB 2012, §relation alignment — the companion statistic to
    ``predicate_functionality``): for each ordered predicate pair
    (p, q), n_overlap = |{(s,o) : p(s,o) ∧ q(o,s)}| over DISTINCT
    triples and align = n_overlap / n_p — the evidence that q is p's
    inverse (p = q gives the predicate's symmetry score). lamAPI's
    summary layer counts predicate usage (reference
    datasets_statistics.py) but has no alignment analytics; this is the
    schema-discovery step KG fusion runs before merging sources.

    Scale shape: TWO exchanges total on the edge list. (1) The forward
    side (key s␁o, pred_p) joins the reversed side (key o␁s, pred_q)
    through ONE bucketed hash join with ``dedup_sides=True`` — the
    DISTINCT-triples semantics ride the join's own bucket exchange
    (a (key, pred) row is the triple; per-bucket row-dedup is exact
    global dedup), so no separate distinct pass exists. A direct Ray
    3-string-column groupby distinct measured 280 s on 3M triples at
    sf0.1; the fused form runs the whole operator in ~12 s. (2)
    Per-predicate distinct-triple totals fold through a hash-compressed
    exchange: (bucket, h, pred) with h the poly-mod-2⁶¹ triple hash —
    8-byte rows instead of full strings; distinct-by-hash equals
    distinct exactly barring a 2⁻⁶¹-space collision (≈2·10⁻⁸ at 3·10⁵
    gate-scale triples; the mentions vocab broadcast documents the same
    bound). The final ratio is one IEEE division of exact int64 counts,
    printf-rounded on both sides."""
    from ray.data.aggregate import Sum

    from lamapi_ray.functions.inthash import hash_string_array
    from lamapi_ray.stages.dedup import scaled_partitions
    from lamapi_ray.stages.join import bucketed_hash_join

    P = scaled_partitions(1.0, 8)
    NB = scaled_partitions(2.0, 32)

    triples = ray.data.from_arrow(adjacency)

    def _col(batch: pa.Table, n: str) -> pa.Array:
        c = batch[n]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def fwd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.binary_join_element_wise(
                    _col(batch, "subj"), _col(batch, "obj"), "\x01"
                ),
                "pred_p": _col(batch, "pred"),
            }
        )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.binary_join_element_wise(
                    _col(batch, "obj"), _col(batch, "subj"), "\x01"
                ),
                "pred_q": _col(batch, "pred"),
            }
        )

    joined = bucketed_hash_join(
        triples.map_batches(fwd, batch_format="pyarrow", zero_copy_batch=True),
        triples.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        on="key", num_buckets=P, dedup_sides=True,
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        # dictionary codes + packed-int unique — no per-row string work
        pe = pc.dictionary_encode(_col(batch, "pred_p"))
        qe = pc.dictionary_encode(_col(batch, "pred_q"))
        if isinstance(pe, pa.ChunkedArray):
            pe = pe.combine_chunks()
        if isinstance(qe, pa.ChunkedArray):
            qe = qe.combine_chunks()
        pcodes = np.asarray(pe.indices, dtype=np.int64)
        qcodes = np.asarray(qe.indices, dtype=np.int64)
        nq = max(len(qe.dictionary), 1)
        u, c = np.unique(pcodes * nq + qcodes, return_counts=True)
        return pa.table(
            {
                "pred_p": pe.dictionary.cast(pa.string()).take(
                    pa.array(u // nq, pa.int64())
                ),
                "pred_q": qe.dictionary.cast(pa.string()).take(
                    pa.array(u % nq, pa.int64())
                ),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    overlap = _collect(
        joined.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["pred_p", "pred_q"], num_partitions=1)
        .aggregate(Sum("c", alias_name="n_overlap"))
    )

    def hash_rows(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            _col(batch, "subj"), _col(batch, "pred"), _col(batch, "obj"), "\x01"
        )
        h = hash_string_array(key)
        pkey = (h * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(NB)
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "pred": _col(batch, "pred"),
            }
        )

    def pred_partial(group: pa.Table) -> pa.Table:
        # per-bucket distinct-by-hash, then predicate counts (a triple
        # hash lands in exactly one bucket → counts are exact globals)
        d = group.group_by(["h", "pred"]).aggregate([])
        vc = pc.value_counts(d["pred"].combine_chunks())
        return pa.table(
            {
                "pred": vc.field("values").cast(pa.string()),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    totals = _collect(
        triples.map_batches(
            hash_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pkey", num_partitions=NB)
        .map_groups(pred_partial, batch_format="pyarrow")
        .groupby("pred", num_partitions=1)
        .aggregate(Sum("c"))
    )
    n_p = {
        p: int(c)
        for p, c in zip(totals["pred"].to_pylist(), totals["sum(c)"].to_pylist())
    }
    rows = sorted(
        zip(
            overlap["pred_p"].to_pylist(),
            overlap["pred_q"].to_pylist(),
            overlap["n_overlap"].to_pylist(),
        )
    )
    return pa.table(
        {
            "pred_p": pa.array([r[0] for r in rows], pa.string()),
            "pred_q": pa.array([r[1] for r in rows], pa.string()),
            "n_overlap": pa.array([int(r[2]) for r in rows], pa.int64()),
            "n_p": pa.array([n_p[r[0]] for r in rows], pa.int64()),
            "align": pa.array(
                [round_ref(int(r[2]) / n_p[r[0]], 6) for r in rows],
                pa.float64(),
            ),
        }
    )


def key_skew_profile(sf_dir: str, top_k: int = 10) -> pa.Table:
    """Partition-key skew profile over the event stream's user key — the
    diagnostic a shuffle planner reads before choosing salting/bucketing
    (this engine's own mention-canonicalization salting decision is the
    north-rule case): per-key counts, the Gini coefficient of the key
    frequency distribution (0 = uniform, →1 = one hot key), and the
    ``top_k`` heaviest keys with their row share.

    Gini uses the exact rank formula over counts sorted ascending,
    G = 2·Σ i·cᵢ / (m·Σc) − (m+1)/m — all sums are exact int64 (tie
    blocks contribute the same Σ i·cᵢ under any within-tie order, so
    row_number nondeterminism on the oracle side cannot move it), with
    ONE IEEE expression printf-rounded identically on both sides.

    Scale shape: per-batch np.unique partials fold through ONE
    user-bounded groupby-sum; the Gini rank-sum and top-k run on the
    driver over that key-bounded table (the pagerank broadcast-fast-path
    contract; past ~10⁸ keys the rank sum becomes a distributed sort +
    the peak_concurrency prefix-scan, and top-k a per-block bottom-k
    merge). Output: one row per top-k key with the global stats
    repeated (rank, user_id, n, share, n_keys, n_rows, gini)."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(uid, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    kc = _collect(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id", num_partitions=_scaled(0.5, 16))
        .aggregate(Sum("c", alias_name="n"))
    )
    uid = kc["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = kc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(n)
    t = int(n.sum())
    asc = np.sort(n)
    s_in = int((np.arange(1, m + 1, dtype=np.int64) * asc).sum())
    gini = round_ref(2.0 * s_in / (m * t) - (m + 1.0) / m, 6)
    # top-k by count desc, user_id asc
    order = np.lexsort((uid, -n))[:top_k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "user_id": pa.array(uid[order], pa.int64()),
            "n": pa.array(n[order], pa.int64()),
            "share": pa.array(
                [round_ref(int(v) / t, 6) for v in n[order]], pa.float64()
            ),
            "n_keys": pa.array([m] * len(order), pa.int64()),
            "n_rows": pa.array([t] * len(order), pa.int64()),
            "gini": pa.array([gini] * len(order), pa.float64()),
        }
    )


def equidepth_histogram(sf_dir: str, n_buckets: int = 16) -> pa.Table:
    """Equi-depth (equal-height) histogram over the event value stream —
    the optimizer statistic a cost-based planner builds per column
    (reference keeps only count summaries, ``database.py:41``; this is the
    analytics-grade upgrade). Values are exact integer cents
    (``rint(value·100)``, the events_rollup idiom), bucketed by NTILE
    semantics over ``ORDER BY cents``: with N rows and B buckets the
    first ``N mod B`` buckets hold ``ceil(N/B)`` rows, the rest
    ``floor(N/B)``. Tie blocks may straddle a boundary, but the per-bucket
    value MULTISET is position-determined, so (n, lo, hi) per bucket is
    deterministic — the oracle's ``ntile(16)`` cannot drift.

    Scale shape: per-batch (cents → count) partials via ``np.unique``
    fold through ONE value-bounded groupby-sum; the boundary scan runs on
    the driver over the distinct-value table (cents domain ≪ row count;
    same contract as key_skew_profile — past ~10⁸ distinct values this
    becomes a distributed sort + the peak_concurrency prefix-scan, with
    bucket cut-points found by rank searchsorted per block). No row-level
    expansion anywhere: lo/hi come from cumulative-count searchsorted.
    """
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "cents": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    vc = _collect(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cents", num_partitions=_scaled(0.5, 16))
        .aggregate(Sum("c", alias_name="n"))
    )
    vals = vc["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = vc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, cnt = vals[order], cnt[order]
    total = int(cnt.sum())
    if total == 0:  # empty input → empty histogram (as the oracle)
        return pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "lo_cents": pa.array([], pa.int64()),
                "hi_cents": pa.array([], pa.int64()),
            }
        )
    b = min(n_buckets, total)
    # NTILE sizes: first (total % b) buckets get ceil, the rest floor.
    size = np.full(b, total // b, dtype=np.int64)
    size[: total % b] += 1
    ends = np.cumsum(size)          # exclusive end position per bucket
    starts = ends - size            # inclusive start position per bucket
    cum = np.cumsum(cnt)            # inclusive cumulative counts
    # position p (0-based, sorted order) holds vals[searchsorted(cum, p, 'right')]
    lo = vals[np.searchsorted(cum, starts, side="right")]
    hi = vals[np.searchsorted(cum, ends - 1, side="right")]
    return pa.table(
        {
            "bucket": pa.array(np.arange(1, b + 1), pa.int64()),
            "n": pa.array(size, pa.int64()),
            "lo_cents": pa.array(lo, pa.int64()),
            "hi_cents": pa.array(hi, pa.int64()),
        }
    )


def value_trend_ols(sf_dir: str) -> pa.Table:
    """Per-event-type OLS trend of value (integer cents) against day index
    — grouped linear regression via MERGEABLE SUFFICIENT STATISTICS, the
    textbook way to regress at any scale without materializing points:
    each batch contributes exact int64 partials (n, Σx, Σy, Σxy, Σx²)
    per group; ONE group-bounded groupby-sum folds them; slope/intercept
    are composed on the driver from exact integers with a single IEEE
    division each (printf-rounded, DuckDB-mirrorable).

    x = calendar days since 2024-01-01 (day-floor of ts, exact int);
    y = rint(value·100) cents (the events_rollup idiom). Day-centering
    keeps per-row products ≤ ~10⁷ so Σxy stays well inside int64 even at
    10¹² rows per group; intercept composes from the ROUNDED slope so
    both sides evaluate the same expression. Degenerate groups (all rows
    on one day → zero variance) yield NULL slope/intercept.

    Scale shape: partials are |types|-bounded per batch; the exchange
    ships ≤ groups×5 ints; nothing row-sized leaves the map side.
    """
    from ray.data.aggregate import Sum

    EPOCH_DAY_2024 = 19723  # days from unix epoch to 2024-01-01

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        g = len(enc.dictionary)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = us // 86_400_000_000 - EPOCH_DAY_2024
        v = batch["value"].to_numpy(zero_copy_only=False)
        y = np.rint(v * 100.0).astype(np.int64)
        # exact int64 group sums: stable sort by code + add.reduceat
        # (np.bincount weights accumulate in float64 — not exact at scale)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = (
            np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            if len(sc)
            else np.zeros(0, dtype=np.int64)
        )
        gid = sc[starts]

        def gsum(arr: np.ndarray) -> np.ndarray:
            out = np.zeros(g, dtype=np.int64)
            if len(arr):
                out[gid] = np.add.reduceat(arr[order], starts)
            return out

        n = np.zeros(g, dtype=np.int64)
        if len(sc):
            n[gid] = np.diff(np.r_[starts, len(sc)])
        return pa.table(
            {
                "event_type": enc.dictionary.cast(pa.string()),
                "n": pa.array(n),
                "sx": pa.array(gsum(x)),
                "sy": pa.array(gsum(y)),
                "sxy": pa.array(gsum(x * y)),
                "sxx": pa.array(gsum(x * x)),
            }
        )

    agg = _collect(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type", num_partitions=_scaled(0.25, 4))
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )
    rows = sorted(agg.to_pylist(), key=lambda r: r["event_type"])
    et, ns, slopes, intercepts = [], [], [], []
    for r in rows:
        n, sx, sy, sxy, sxx = (int(r[k]) for k in ("n", "sx", "sy", "sxy", "sxx"))
        den = n * sxx - sx * sx
        if den == 0:
            sl = ic = None
        else:
            sl = round_ref(float(n * sxy - sx * sy) / float(den), 6)
            ic = round_ref((float(sy) - sl * float(sx)) / float(n), 6)
        et.append(r["event_type"]); ns.append(n)
        slopes.append(sl); intercepts.append(ic)
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(intercepts, pa.float64()),
        }
    )


def neighborhood_function(sf_dir: str) -> pa.Table:
    """Neighborhood function N(t) = Σ_v |N≤t(v)| of the hyperlink graph
    for t = 0, 1, 2 — the ANF / effective-diameter curve (Palmer et al.
    KDD'02; HyperBall, Boldi & Vigna WWW'13 compute it with per-node HLL
    merges at web scale). Exact at gate scale; the HLL-register variant
    is the documented >10⁹-edge path (same mergeable-sketch contract as
    hll_user_sketch, swapping exact pair-distinct for register max).

    Dataflow: links parse to int edges; levels ride ONE union — (v,v,0)
    self pairs, (s,d,1) edges, and (a,b,2) two-hop pairs from ONE
    bucketed hash join of the edge set with itself on the middle node —
    then ONE pair-bounded ``groupby(a,b).min(l)`` assigns each reachable
    pair its hop distance and a 3-bounded count fold finishes. Nothing
    pair-sized reaches the driver. Two-hop volume is Σ_m in(m)·out(m);
    the join buckets by the middle node so skewed hubs are the
    documented cap point (adamic_adar's ``max_apex_degree`` pattern
    applies verbatim when a real crawl needs it).

    Output: one row per t with reach_pairs (Σ|N≤t|, exact int64),
    n_nodes, and avg_reach = reach/n printf-rounded.
    """
    from ray.data.aggregate import Min, Sum

    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import scaled_partitions
    from lamapi_ray.stages.join import bucketed_hash_join
    from lamapi_ray.stages.linkgraph import extract_links

    def to_int_edges(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, out in (("src", "s"), ("dst", "d")):
            c = batch[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[out] = pc.cast(pc.utf8_slice_codeunits(c, 6), pa.int64())
        return pa.table(cols)

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_int_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    def lvl0(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        v = np.unique(np.concatenate([s, d]))
        return pa.table(
            {"a": pa.array(v, pa.int64()), "b": pa.array(v, pa.int64()),
             "l": pa.array(np.zeros(len(v), np.int64), pa.int64())}
        )

    def lvl1(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["s"], "b": batch["d"],
             "l": pa.array(np.ones(len(batch), np.int64), pa.int64())}
        )

    left = edges.map_batches(
        lambda b: pa.table({"m": b["d"], "a2": b["s"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    right = edges.map_batches(
        lambda b: pa.table({"m": b["s"], "b2": b["d"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hop2 = bucketed_hash_join(
        left, right, on="m", num_buckets=scaled_partitions(1.0, 16)
    ).map_batches(
        lambda b: pa.table(
            {"a": b["a2"], "b": b["b2"],
             "l": pa.array(np.full(len(b), 2, np.int64), pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    lv = (
        edges.map_batches(lvl0, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            edges.map_batches(lvl1, batch_format="pyarrow", zero_copy_batch=True),
            hop2,
        )
        .groupby(["a", "b"], num_partitions=scaled_partitions(2.0, 32))
        .aggregate(Min("l", alias_name="l"))
    )

    def count_lvls(batch: pa.Table) -> pa.Table:
        lvls = batch["l"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lvls, return_counts=True)
        return pa.table(
            {"l": pa.array(u, pa.int64()),
             "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    cl = _collect(
        lv.map_batches(count_lvls, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l", num_partitions=1)
        .aggregate(Sum("c", alias_name="c"))
    )
    by_l = {int(l): int(c) for l, c in zip(cl["l"].to_pylist(), cl["c"].to_pylist())}
    n0 = by_l.get(0, 0)
    ts, reach, avg = [], [], []
    run = 0
    for t in (0, 1, 2):
        run += by_l.get(t, 0)
        ts.append(t)
        reach.append(run)
        avg.append(round_ref(float(run) / float(n0), 6) if n0 else None)
    return pa.table(
        {
            "t": pa.array(ts, pa.int64()),
            "reach_pairs": pa.array(reach, pa.int64()),
            "n_nodes": pa.array([n0] * 3, pa.int64()),
            "avg_reach": pa.array(avg, pa.float64()),
        }
    )


def _skyline2d(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (minimize price, maximize
    size, STRICT domination: all-≤/≥ with one strict; duplicate points
    dominate neither way and all survive). Vectorized: sort by (price
    asc, size desc); a row is dominated iff the max size over strictly
    cheaper rows is ≥ its size, or a same-price row has strictly larger
    size (that group's size-desc head)."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-size, price))
    p, s = price[order], size[order]
    grp_start = np.r_[True, p[1:] != p[:-1]]
    # max size over all strictly-cheaper rows = running max of group heads
    # carried from the PREVIOUS price group (heads hold each group's max)
    head_sizes = s[grp_start]
    prev_group_max = np.r_[np.iinfo(np.int64).min,
                           np.maximum.accumulate(head_sizes)[:-1]]
    gidx = np.cumsum(grp_start) - 1
    dom_cheaper = prev_group_max[gidx] >= s
    dom_sameprice = head_sizes[gidx] > s
    keep_sorted = ~(dom_cheaper | dom_sameprice)
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_parts(sf_dir: str) -> pa.Table:
    """2-D skyline (Pareto frontier) over the part catalog — minimize
    retail price (exact cents), maximize size: the multi-criteria
    shortlist query (Börzsönyi et al. ICDE'01 "The Skyline Operator").

    Distributed via the local-skyline superset property: the global
    skyline is a subset of the union of per-block skylines (any global
    dominator of a point lands either in the point's own block — where
    it already removed it — or in its own block's skyline), so each
    batch emits only its local frontier (frontier-sized, typically
    O(log n) points for independent dimensions) and ONE driver pass over
    the tiny union finishes. No exchange at all: the map side prunes
    ~everything. Strict-domination ties keep duplicate points, matching
    the oracle's NOT EXISTS formulation row for row.
    """
    pt = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def local_skyline(batch: pa.Table) -> pa.Table:
        price = np.rint(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        size = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _skyline2d(price, size)
        return pa.table(
            {
                "p_partkey": pa.array(key[keep], pa.int64()),
                "price_cents": pa.array(price[keep], pa.int64()),
                "size": pa.array(size[keep], pa.int64()),
            }
        )

    cand = _collect(
        pt.map_batches(local_skyline, batch_format="pyarrow", zero_copy_batch=True)
    )
    price = cand["price_cents"].to_numpy(zero_copy_only=False)
    size = cand["size"].to_numpy(zero_copy_only=False)
    key = cand["p_partkey"].to_numpy(zero_copy_only=False)
    keep = _skyline2d(price, size)
    order = np.argsort(key[keep], kind="mergesort")
    return pa.table(
        {
            "p_partkey": pa.array(key[keep][order], pa.int64()),
            "price_cents": pa.array(price[keep][order], pa.int64()),
            "size": pa.array(size[keep][order], pa.int64()),
        }
    )


def link_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity of the hyperlink graph (Newman PRL'02):
    Pearson r over edges between the TOTAL degree (in + out) of the
    source and of the target — the classic "do hubs link to hubs?"
    web-graph diagnostic (real webs are disassortative, r < 0). Total
    degree, not out-in: the synthetic crawl model gives every page the
    same out-degree, which would make the Foster out-in variant
    identically degenerate (zero x-variance → NULL).

    Exact integer sufficient statistics end to end: two node-bounded
    degree folds, then one streaming edge pass with the degree arrays
    broadcast once via ``ray.put`` (sorted-key searchsorted lookup with
    an exact-hit guard — the distinct_users_daily PACK-guard pattern);
    per-batch partials (n, Σx, Σy, Σxy, Σx², Σy²) are int64, summed as
    Python ints on the driver, and r composes as ONE IEEE expression
    (each factor cast to double before multiplying, mirrored verbatim in
    the oracle's sqrt) printf-rounded. Multigraph semantics: duplicate
    edges count with multiplicity on both sides.

    Scale shape: the broadcast is node-bounded (the pagerank
    broadcast-fast-path contract; past ~10⁸ nodes the lookup becomes the
    two bucketed joins of gnn_neighbor_agg). Nothing edge-sized leaves
    the map side."""
    import math

    from ray.data.aggregate import Sum

    from lamapi_ray import synth
    from lamapi_ray.stages.linkgraph import extract_links

    def to_int_edges(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, out in (("src", "s"), ("dst", "d")):
            c = batch[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[out] = pc.cast(pc.utf8_slice_codeunits(c, 6), pa.int64())
        return pa.table(cols)

    edges = extract_links(synth.pages_dataset(sf_dir)).map_batches(
        to_int_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        # both endpoints contribute to TOTAL degree
        v = np.concatenate(
            [
                batch["s"].to_numpy(zero_copy_only=False),
                batch["d"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()),
             "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    t = _collect(
        edges.map_batches(
            deg_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("node", num_partitions=_scaled(0.5, 16))
        .aggregate(Sum("c", alias_name="deg"))
    )
    keys = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="mergesort")
    deg_ref = ray.put((keys[order], vals[order]))

    def edge_partial(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(deg_ref)

        def look(arr):
            pos = np.searchsorted(keys, arr)
            if len(keys) == 0 or not np.array_equal(
                keys[np.clip(pos, 0, len(keys) - 1)], arr
            ):
                raise ValueError("edge endpoint missing from degree table")
            return vals[pos]

        s = batch["s"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        x = look(s)
        y = look(d)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    parts = _collect(
        edges.map_batches(edge_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    n, sx, sy, sxy, sxx, syy = (
        sum(int(v) for v in parts[c].to_pylist())
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    num = n * sxy - sx * sy
    b1, b2 = n * sxx - sx * sx, n * syy - sy * sy
    r = (
        round_ref(float(num) / math.sqrt(float(b1) * float(b2)), 6)
        if b1 > 0 and b2 > 0
        else None
    )
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def link_reciprocity(sf_dir: str) -> pa.Table:
    """Reciprocity of the hyperlink graph — the fraction of DISTINCT
    directed edges whose reverse edge also exists (Garlaschelli & Loffredo
    PRL'04; the web-graph mutual-linking diagnostic, self-loops count as
    their own reverse, matching the oracle's self-join).

    ONE exchange: each edge is bucketed by its UNORDERED pair key
    (min␀max), so an edge and its reverse always land in the same bucket
    — per-bucket packed-int64 unique gives exact global distinct, and
    reverse membership is a sorted ``np.isin`` inside the bucket. The
    fold ships two ints per bucket. Packing uses 2³¹-bounded node ids
    (the adamic_adar bound; past that the pack widens to the string-key
    form of predicate_inverse_align).
    """
    from ray.data.aggregate import Sum

    from lamapi_ray import synth
    from lamapi_ray.stages.dedup import scaled_partitions
    from lamapi_ray.stages.linkgraph import extract_links

    NB = scaled_partitions(1.0, 16)
    K = np.int64(1) << np.int64(31)

    def to_pairs(batch: pa.Table) -> pa.Table:
        s = pc.cast(
            pc.utf8_slice_codeunits(batch["src"].combine_chunks(), 6), pa.int64()
        ).to_numpy(zero_copy_only=False)
        d = pc.cast(
            pc.utf8_slice_codeunits(batch["dst"].combine_chunks(), 6), pa.int64()
        ).to_numpy(zero_copy_only=False)
        if len(s) and (s.max() >= K or d.max() >= K):
            raise ValueError("node id exceeds the 2^31 pack bound")
        pk = np.unique(s * K + d)  # per-batch pre-dedup before the exchange
        lo, hi = np.minimum(pk // K, pk % K), np.maximum(pk // K, pk % K)
        u = (lo * K + hi).view(np.uint64)
        pkey = (u * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(NB)
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "pk": pa.array(pk, pa.int64()),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        pk = np.unique(group["pk"].to_numpy(zero_copy_only=False))
        rev = (pk % K) * K + pk // K
        recip = int(np.isin(rev, pk).sum())
        return pa.table(
            {
                "m": pa.array([len(pk)], pa.int64()),
                "r": pa.array([recip], pa.int64()),
            }
        )

    t = _collect(
        extract_links(synth.pages_dataset(sf_dir))
        .map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey", num_partitions=NB)
        .map_groups(bucket_counts, batch_format="pyarrow")
    )
    m = sum(int(v) for v in t["m"].to_pylist())
    r = sum(int(v) for v in t["r"].to_pylist())
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "n_reciprocal": pa.array([r], pa.int64()),
            "reciprocity": pa.array(
                [round_ref(r / m, 6) if m else None], pa.float64()
            ),
        }
    )


def user_entropy_histogram(sf_dir: str) -> pa.Table:
    """Histogram of per-user behavioral entropy — Shannon entropy of each
    user's event-type distribution, binned at 0.1-nat granularity: the
    personalization / bot-detection diagnostic (a user who only ever
    fires one event type has H = 0; a uniform 5-type user has H = ln 5).

    Exactness contract: per-user H is composed from INTEGER micro-nat
    logs, H_micro = Σ_t c_t·(L(n) − L(c_t)) with L(x) = floor(ln(x)·10⁶)
    (math.log ≡ DuckDB ln — same libm; L built as a lookup table over
    the count domain, never vectorized np.log, whose SIMD path can
    differ in ULPs), so the per-user sum is order-exact int64 and the
    single IEEE expression floor(H_micro/(n·10⁶)·10) is evaluated
    identically on both sides.

    Scale shape: (user, type) counts fold through ONE packed-int64
    exchange (user·8 + tid, the distinct_users_daily PACK guard on
    unknown types), per-user composition rides a SECOND user-bucketed
    exchange with sort + add.reduceat (vectorized, no per-user Python),
    and the output fold is bins-bounded (≤ ~17 rows). Nothing user-sized
    reaches the driver."""
    import math

    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import scaled_partitions

    TYPES = np.array(sorted(EVENT_TYPES))
    NB = scaled_partitions(0.5, 16)

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        tid = np.minimum(np.searchsorted(TYPES, et), len(TYPES) - 1)
        if not (TYPES[tid] == et).all():
            bad = et[TYPES[tid] != et][:3]
            raise ValueError(f"unknown event types: {bad!r}")
        pk = uid * 8 + tid
        u, c = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "pk": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    pairs = (
        ev.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk", num_partitions=NB)
        .aggregate(Sum("c", alias_name="c"))
    )

    def to_user_bucket(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ub": pa.array((pk // 8) % NB, pa.int64()),
                "pk": batch["pk"],
                "c": batch["c"],
            }
        )

    def bucket_entropy_bins(group: pa.Table) -> pa.Table:
        pk = group["pk"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pk, kind="mergesort")  # pk sorts by (user, tid)
        pk, c = pk[order], c[order]
        user = pk // 8
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        n = np.add.reduceat(c, starts)
        # integer micro-nat logs over the DISTINCT count values only
        # (math.log, never np.log — see docstring; a dense 1..max table
        # would cost O(heaviest user) time AND memory per bucket)
        uv = np.unique(np.r_[c, n])
        lv = np.array(
            [math.floor(math.log(int(v)) * 1e6) for v in uv], dtype=np.int64
        )
        cl = c * lv[np.searchsorted(uv, c)]
        h_micro = n * lv[np.searchsorted(uv, n)] - np.add.reduceat(cl, starts)
        h = np.floor(h_micro / (n * 1e6) * 10).astype(np.int64)
        u, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "nu": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = _collect(
        pairs.map_batches(to_user_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ub", num_partitions=NB)
        .map_groups(bucket_entropy_bins, batch_format="pyarrow")
        .groupby("bin", num_partitions=1)
        .aggregate(Sum("nu", alias_name="n_users"))
    )
    b = out["bin"].to_numpy(zero_copy_only=False)
    nu = out["n_users"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="mergesort")
    return pa.table(
        {
            "bin": pa.array(b[order], pa.int64()),
            "entropy_lo": pa.array(
                [round_ref(int(v) / 10.0, 6) for v in b[order]], pa.float64()
            ),
            "n_users": pa.array(nu[order].astype(np.int64), pa.int64()),
        }
    )


def _daily_count_series(sf_dir: str) -> tuple[dict[str, np.ndarray], int]:
    """Per-type daily event-count series, zero-filled over the global
    [min_day, max_day] span — the shared fold behind daily_autocorr and
    ewma_daily. ONE (type × day)-bounded exchange; day = calendar days
    since 2024-01-01 (the value_trend_ols epoch), pack-guarded to 2²².
    Returns ({event_type: int64 span array}, lo_day)."""
    from ray.data.aggregate import Sum

    EPOCH_DAY_2024 = 19723

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].combine_chunks()
        enc = pc.dictionary_encode(et)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86_400_000_000 - EPOCH_DAY_2024
        if len(d) and (d.min() < 0 or d.max() >= (1 << 22)):
            raise ValueError("day offset outside the 2^22 pack domain")
        pk = codes * (1 << 22) + d
        u, c = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "event_type": enc.dictionary.cast(pa.string()).take(
                    pa.array(u >> 22, pa.int64())
                ),
                "d": pa.array(u & ((1 << 22) - 1), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    t = _collect(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "d"], num_partitions=_scaled(0.25, 4))
        .aggregate(Sum("c", alias_name="c"))
    )
    types = t["event_type"].to_pylist()
    days = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(days.min()), int(days.max())
    span = hi - lo + 1
    series: dict[str, np.ndarray] = {}
    for et, d, c in zip(types, days.tolist(), cnts.tolist()):
        series.setdefault(et, np.zeros(span, dtype=np.int64))[d - lo] = c
    return series, lo


def daily_autocorr(sf_dir: str) -> pa.Table:
    """Lag-1 autocorrelation of each event type's DAILY count series —
    the burst/seasonality diagnostic a stream monitor fits first (r₁ → 1:
    trending/bursty; r₁ ≈ 0: memoryless; r₁ < 0: alternating). The
    series is zero-filled over the GLOBAL [min_day, max_day] span (a
    type with no events on a day contributes x=0, exactly like the
    oracle's calendar cross join), and r₁ is Pearson over the
    (x_d, x_{d+1}) pairs.

    Exact end to end: ONE (type × day)-bounded count fold; the driver
    composes per-type sufficient statistics as Python ints over the
    day-span arrays (types × span values — the key_skew_profile
    driver-side contract; a multi-year 10⁶-day span would move the pair
    sums into a second bounded fold) and evaluates the same
    cast-each-factor-to-double Pearson expression as link_assortativity,
    printf-rounded. Zero-variance series → NULL; a single-day global
    span yields ZERO rows (no (d, d+1) pairs — the oracle's lag join is
    empty)."""
    import math

    series, _lo = _daily_count_series(sf_dir)
    if series and len(next(iter(series.values()))) < 2:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "autocorr1": pa.array([], pa.float64()),
            }
        )
    et_out, n_out, r_out = [], [], []
    for et in sorted(series):
        arr = series[et]
        x, y = arr[:-1], arr[1:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        b1, b2 = n * sxx - sx * sx, n * syy - sy * sy
        r = (
            round_ref(
                float(n * sxy - sx * sy) / math.sqrt(float(b1) * float(b2)), 6
            )
            if b1 > 0 and b2 > 0
            else None
        )
        et_out.append(et)
        n_out.append(n)
        r_out.append(r)
    return pa.table(
        {
            "event_type": pa.array(et_out, pa.string()),
            "n_pairs": pa.array(n_out, pa.int64()),
            "autocorr1": pa.array(r_out, pa.float64()),
        }
    )


def source_vocab_overlap(sf_dir: str) -> pa.Table:
    """Pairwise vocabulary overlap between corpus sources — for every
    unordered source pair, the Jaccard of their DISTINCT-token sets
    (token = the engine's standard md5-mod-2⁶¹ hash, the same value the
    oracle's list_transform CTE computes): the corpus-mixture diversity
    diagnostic a pre-training data curator reads before weighting
    sources (near-1 overlap ⇒ redundant source; near-0 ⇒ new domain).

    Dataflow: per-batch distinct (token, source-id) pairs (k=1 shingle
    path of ``_doc_shingle_hashes`` — one md5 per distinct token, numpy
    elsewhere; source ids via a broadcast sorted source list with
    exact-hit guard) → ONE token-bucketed exchange → per-bucket
    ``bitwise_or.reduceat`` collapses each token to a ≤64-bit source
    mask → mask-bounded count fold (≤ 2^|sources| rows) → the driver
    composes every pair's |A∩B| / |A∪B| from the mask counts as exact
    ints, one printf-rounded IEEE division each. Zero-overlap pairs are
    emitted with jaccard 0, mirroring the oracle's LEFT JOIN."""
    from ray.data.aggregate import Sum

    from lamapi_ray.stages.dedup import _doc_shingle_hashes, scaled_partitions

    NB = scaled_partitions(1.0, 16)

    def src_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"source": pc.unique(batch["source"].combine_chunks())})

    st = _collect(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .map_batches(src_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    srcs = sorted(set(st["source"].to_pylist()))
    if len(srcs) > 64:
        raise ValueError("source mask path supports at most 64 sources")
    src_arr = np.array(srcs)
    src_ref = ray.put(src_arr)

    def pair_partial(batch: pa.Table) -> pa.Table:
        sl = ray.get(src_ref)
        ids, doc_idx, sh = _doc_shingle_hashes(batch, "doc_id", "text", k=1)
        et = np.asarray(batch["source"].to_pylist(), dtype=object)
        sid_doc = np.searchsorted(sl, et)
        if not (sl[np.clip(sid_doc, 0, len(sl) - 1)] == et).all():
            raise ValueError("unknown source value")
        sid = sid_doc[doc_idx]
        # th is 61-bit — a th*64+sid pack would overflow int64 and alias
        # hashes mod 2^58; ship the two columns and dedup by lexsort
        th = sh.view(np.int64)
        order = np.lexsort((sid, th))
        th, sid = th[order], sid[order]
        keep = np.r_[True, (th[1:] != th[:-1]) | (sid[1:] != sid[:-1])]
        th, sid = th[keep], sid[keep]
        pkey = (th.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            NB
        )
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "th": pa.array(th, pa.int64()),
                "sid": pa.array(sid.astype(np.int64), pa.int64()),
            }
        )

    def bucket_masks(group: pa.Table) -> pa.Table:
        th = group["th"].to_numpy(zero_copy_only=False)
        sid = group["sid"].to_numpy(zero_copy_only=False)
        if len(th) == 0:
            return pa.table(
                {"mask": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        order = np.lexsort((sid, th))
        th, sid = th[order], sid[order]
        keep = np.r_[True, (th[1:] != th[:-1]) | (sid[1:] != sid[:-1])]
        th, sid = th[keep], sid[keep]
        starts = np.flatnonzero(np.r_[True, th[1:] != th[:-1]])
        masks = np.bitwise_or.reduceat(
            np.int64(1) << sid.astype(np.int64), starts
        )
        u, c = np.unique(masks, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    mc = _collect(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey", num_partitions=NB)
        .map_groups(bucket_masks, batch_format="pyarrow")
        .groupby("mask", num_partitions=1)
        .aggregate(Sum("c", alias_name="c"))
    )
    masks = mc["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = mc["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = []
    for a in range(len(srcs)):
        for b in range(a + 1, len(srcs)):
            ba, bb = np.int64(1) << a, np.int64(1) << b
            na = int(cnts[(masks & ba) != 0].sum())
            nb_ = int(cnts[(masks & bb) != 0].sum())
            common = int(cnts[((masks & ba) != 0) & ((masks & bb) != 0)].sum())
            union = na + nb_ - common
            rows.append(
                {
                    "source_a": srcs[a], "source_b": srcs[b],
                    "n_a": na, "n_b": nb_, "n_common": common,
                    "jaccard": round_ref(common / union, 6) if union else None,
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("source_a", pa.string()), ("source_b", pa.string()),
             ("n_a", pa.int64()), ("n_b", pa.int64()),
             ("n_common", pa.int64()), ("jaccard", pa.float64())]
        ),
    )


def ewma_daily(sf_dir: str) -> pa.Table:
    """EWMA smoothing of each event type's daily count series with
    α = 1/2 — the streaming monitor's trend line (dyadic α: every update
    e_d = (x_d + e_{d-1})/2 is an exact double operation, so the whole
    recursion is bit-reproducible and the oracle's recursive CTE walks
    the identical IEEE chain; e_lo seeds at x_lo). Series are
    zero-filled over the global day span via the shared
    :func:`_daily_count_series` fold; the driver recursion is
    types × span (the key_skew_profile driver-side contract). Output:
    one row per (event_type, day)."""
    series, lo = _daily_count_series(sf_dir)
    et_out, d_out, e_out = [], [], []
    for et in sorted(series):
        arr = series[et]
        e = float(arr[0])
        for i, x in enumerate(arr.tolist()):
            if i:
                e = (float(x) + e) / 2.0
            et_out.append(et)
            d_out.append(lo + i)
            e_out.append(round_ref(e, 6))
    return pa.table(
        {
            "event_type": pa.array(et_out, pa.string()),
            "day": pa.array(d_out, pa.int64()),
            "ewma": pa.array(e_out, pa.float64()),
        }
    )
