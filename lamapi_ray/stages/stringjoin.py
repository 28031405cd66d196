"""String similarity self-join (edit-distance ≤ k pairs) via SymSpell
deletion-variant blocking.

The classic fuzzy-matching join: if ``lev(a, b) ≤ k`` then a and b share a
common ≤k-delete variant (the symmetric-delete property — the same routing
invariant the sharded FUZZY retrieval uses,
stages/candidates_sharded.py:80-103), so emitting every string under each
of its delete variants and co-locating by variant guarantees every
qualifying pair meets in ≥1 group. Per-group candidates are verified with
the exact DP edit distance, and ONE grouped distinct removes pairs that
met under several shared variants.

Scale shape: replication factor is |variants| ≈ O(len^k) per string —
bounded for token-length strings; the exchange carries (variant, string)
pairs, never the corpus rows; candidate verification cost is bounded by
the true near-pair density plus variant collisions (short strings
collide more — a min-length filter is the standard mitigation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.functions.text import levenshtein
from lamapi_ray.stages.candidates_sharded import delete_variants
from lamapi_ray.stages.dedup import scaled_partitions


def similarity_self_join(
    ds: ray.data.Dataset,
    col: str,
    max_dist: int = 1,
    min_len: int = 2,
) -> ray.data.Dataset:
    """→ distinct (a, b) string pairs with ``lev(a, b) ≤ max_dist``, a < b.

    ``ds[col]`` must already be distinct values (dedupe upstream);
    strings shorter than ``min_len`` are dropped (they pair with
    everything)."""

    def emit_variants(batch: pa.Table) -> pa.Table:
        vals = [
            v for v in batch[col].to_pylist()
            if v is not None and len(v) >= min_len
        ]
        outs_v, outs_s = [], []
        for s in vals:
            for d in delete_variants(s, max_dist):
                outs_v.append(d)
                outs_s.append(s)
        return pa.table(
            {"variant": pa.array(outs_v, pa.string()),
             "s": pa.array(outs_s, pa.string())}
        )

    def group_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        n = len(group)
        if n < 2:
            return empty
        ss = sorted(set(group["s"].to_pylist()))
        out_a, out_b = [], []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                if abs(len(ss[i]) - len(ss[j])) <= max_dist and levenshtein(
                    ss[i], ss[j]
                ) <= max_dist:
                    out_a.append(ss[i])
                    out_b.append(ss[j])
        if not out_a:
            return empty
        return pa.table(
            {"a": pa.array(out_a, pa.string()),
             "b": pa.array(out_b, pa.string())}
        )

    def dedup_pairs(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
            )
        seen = sorted(set(zip(group["a"].to_pylist(), group["b"].to_pylist())))
        return pa.table(
            {"a": pa.array([p[0] for p in seen], pa.string()),
             "b": pa.array([p[1] for p in seen], pa.string())}
        )

    cand = (
        ds.map_batches(emit_variants, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("variant", num_partitions=scaled_partitions(0.5, 16))
        .map_groups(group_pairs, batch_format="pyarrow")
    )
    # a pair that shares multiple variants is emitted several times — one
    # grouped distinct on the pair key finishes
    return cand.groupby(["a", "b"], num_partitions=scaled_partitions(0.25, 8)).map_groups(
        dedup_pairs, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# PPJoin: prefix-filtered set-similarity self-join (token-set Jaccard >= tau)
# ---------------------------------------------------------------------------


def ppjoin(
    ds: ray.data.Dataset,
    tau_num: int = 3,
    tau_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """All (doc_a < doc_b) pairs with token-set Jaccard ≥ tau_num/tau_den,
    EXACT — via PPJoin prefix filtering (Xiao et al., WWW 2008 /
    Vernica-Carey-Li's MapReduce adaptation, SIGMOD 2010):

    1. global document frequencies (ONE vocabulary-bounded exchange,
       broadcast as sorted hash arrays — the same vocabulary-broadcast
       contract as tfidf/lmscore);
    2. each doc orders its distinct token hashes rarest-first and emits
       ONLY its prefix (p = |set| − ⌈τ·|set|⌉ + 1 tokens): any pair with
       Jaccard ≥ τ must share a prefix token, so the candidate exchange
       carries prefixes, not full sets — the whole point vs the naive
       shared-token join whose stop-word buckets are Σ|bucket|²;
    3. per prefix-token group: pairs passing the length filter
       (tau_den·|smaller| ≥ tau_num·|larger|), then ONE grouped distinct;
    4. exact verify by shared-token COUNT: all (token, doc) rows regroup
       by token, pairs present in the (hash-broadcast) candidate set emit
       hits, a grouped count gives |x∩y| exactly — sets never ship, and
       a hash false positive merely admits one extra pair into the EXACT
       final filter shared·(num+den) ≥ num·(size_a+size_b). All checks
       are integer arithmetic — no float thresholds.

    Candidate/size broadcasts are candidate-set/subset-bounded; at corpus
    scale swap them for a bucketed hash join (stages/join.py) keyed on the
    pair — the exchanges are otherwise unchanged.
    """
    import ray

    from lamapi_ray.functions.inthash import MOD61, mulmod61
    from lamapi_ray.stages.dedup import _doc_shingle_hashes, _pairs_in_runs, _run_bounds

    P = scaled_partitions(0.5, 16)

    def tok_rows(batch: pa.Table) -> pa.Table:
        ids, par, sh = _doc_shingle_hashes(batch, id_col, text_col, k=1)
        return pa.table(
            {
                "g": pa.array(sh.astype(np.int64), pa.int64()),
                "doc": pa.array(ids[par], pa.int64()),
            }
        )

    toks = ds.map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    df_tbl = pa.concat_tables(
        toks.groupby("g", num_partitions=P)
        .count()
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    gs = df_tbl["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    dfs = df_tbl["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(gs)
    df_ref = ray.put((gs[order], dfs[order]))

    def prefixes(batch: pa.Table) -> pa.Table:
        gs_s, df_s = ray.get(df_ref)
        g = batch["g"].to_numpy(zero_copy_only=False)
        doc = batch["doc"].to_numpy(zero_copy_only=False)
        d = df_s[np.searchsorted(gs_s, g)]
        # per-doc rarest-first order: sort rows by (doc, df, g)
        order = np.lexsort((g, d, doc))
        doc, g = doc[order], g[order]
        starts, lens = _run_bounds([doc])
        sz = np.repeat(lens, lens)
        pos = np.arange(len(doc)) - np.repeat(starts, lens)
        plen = sz - ((tau_num * sz + tau_den - 1) // tau_den) + 1
        keep = pos < plen
        return pa.table(
            {
                "g": pa.array(g[keep], pa.int64()),
                "doc": pa.array(doc[keep], pa.int64()),
                "sz": pa.array(sz[keep], pa.int64()),
            }
        )

    # NB: prefixes need the doc's FULL token multiset co-located — route by
    # doc hash first so one group sees all of a doc's rows
    def by_doc(batch: pa.Table) -> pa.Table:
        doc = batch["doc"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__pk", pa.array(doc % np.int64(P), pa.int64())
        )

    pref = (
        toks.map_batches(by_doc, batch_format="pyarrow")
        .groupby("__pk", num_partitions=P)
        .map_groups(
            lambda grp: prefixes(grp.select(["g", "doc"])),
            batch_format="pyarrow",
        )
    )

    def cand_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        g = group["g"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = group["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        sz = group["sz"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, g))
        g, doc, sz = g[order], doc[order], sz[order]
        starts, lens = _run_bounds([g])
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            sa, sb = sz[ia], sz[ib]
            ok = tau_den * np.minimum(sa, sb) >= tau_num * np.maximum(sa, sb)
            xs.append(doc[ia][ok])
            ys.append(doc[ib][ok])
        if not xs:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(xs), pa.int64()),
                "b": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    cands = (
        pref.groupby("g", num_partitions=P)
        .map_groups(cand_pairs, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=P)
        .count()
        .select_columns(["a", "b"])
    )
    cand_tbl = pa.concat_tables(
        cands.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    ca = cand_tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = cand_tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    _MIX = np.uint64(0x9E3779B97F4A7C15 % MOD61)
    _MIX2 = np.uint64(0xC2B2AE3D27D4EB4F % MOD61)

    def pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        ha = mulmod61(a.view(np.uint64), np.full(len(a), _MIX))
        hb = mulmod61(b.view(np.uint64), np.full(len(b), _MIX2))
        return mulmod61(ha + hb + np.uint64(1), np.full(len(a), _MIX))

    cand_ref = ray.put(np.sort(pair_hash(ca, cb)))
    # docs appearing in ANY candidate pair — the verify stage masks token
    # rows to these BEFORE pair expansion, so a stop token's group costs
    # (candidate docs in group)², not (all docs in group)²
    cand_docs_ref = ray.put(np.unique(np.concatenate([ca, cb])))

    # per-doc set sizes (subset-bounded broadcast; bucketed join at scale)
    sz_tbl = pa.concat_tables(
        toks.map_batches(
            lambda t: pa.table({"doc": t["doc"]}), batch_format="pyarrow"
        )
        .groupby("doc", num_partitions=P)
        .count()
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    sdoc = sz_tbl["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    scnt = sz_tbl["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sdoc)
    sz_ref = ray.put((sdoc[so], scnt[so]))

    def hits(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        cset = ray.get(cand_ref)
        cdocs = ray.get(cand_docs_ref)
        g = group["g"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = group["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cdocs, doc)
        in_cand = (idx < len(cdocs)) & (
            cdocs[np.minimum(idx, len(cdocs) - 1)] == doc
        )
        g, doc = g[in_cand], doc[in_cand]
        if len(g) == 0:
            return empty
        order = np.lexsort((doc, g))
        g, doc = g[order], doc[order]
        starts, lens = _run_bounds([g])
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            h = pair_hash(doc[ia], doc[ib])
            idx = np.searchsorted(cset, h)
            ok = (idx < len(cset)) & (cset[np.minimum(idx, len(cset) - 1)] == h)
            xs.append(doc[ia][ok])
            ys.append(doc[ib][ok])
        if not xs:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(xs), pa.int64()),
                "b": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    shared = (
        toks.groupby("g", num_partitions=P)
        .map_groups(hits, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=P)
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        sdoc_s, scnt_s = ray.get(sz_ref)
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = batch["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = scnt_s[np.searchsorted(sdoc_s, a)]
        sb = scnt_s[np.searchsorted(sdoc_s, b)]
        keep = sh * (tau_num + tau_den) >= tau_num * (sa + sb)
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "shared": pa.array(sh[keep], pa.int64()),
                "size_a": pa.array(sa[keep], pa.int64()),
                "size_b": pa.array(sb[keep], pa.int64()),
            }
        )

    return shared.map_batches(finish, batch_format="pyarrow")


def similarity_cross_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 1,
    min_len: int = 2,
) -> ray.data.Dataset:
    """Record linkage across TWO sources (the cross-source entity-matching
    step of multi-KG integration): distinct
    ``(lid, rid, lval, rval, dist)`` rows with ``lev(lval, rval) ≤
    max_dist`` — the same SymSpell deletion-variant blocking as
    :func:`similarity_self_join`, with both sides routed into one
    variant-keyed exchange and pairs generated only ACROSS sides.

    Scale shape matches the self-join: replication |variants| ≈ O(lenᵏ)
    per string, the exchange carries (variant, side, id, value) rows,
    verification is exact DP bounded by true-match density plus variant
    collisions, and ONE grouped distinct on (lid, rid) removes pairs that
    met under several shared variants."""

    def emit(side: int, id_col: str, col: str):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            vals = batch[col].to_pylist()
            out_v, out_i, out_s = [], [], []
            for i, s in zip(ids, vals):
                if s is None or len(s) < min_len:
                    continue
                for d in delete_variants(s, max_dist):
                    out_v.append(d)
                    out_i.append(i)
                    out_s.append(s)
            return pa.table(
                {
                    "variant": pa.array(out_v, pa.string()),
                    "side": pa.array([side] * len(out_v), pa.int8()),
                    "id": pa.array(out_i, pa.string()),
                    "s": pa.array(out_s, pa.string()),
                }
            )

        return fn

    def group_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lid": pa.array([], pa.string()),
                "rid": pa.array([], pa.string()),
                "lval": pa.array([], pa.string()),
                "rval": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
            }
        )
        side = group["side"].to_numpy(zero_copy_only=False)
        if not ((side == 0).any() and (side == 1).any()):
            return empty
        ids = group["id"].to_pylist()
        ss = group["s"].to_pylist()
        lrows = sorted({(ids[i], ss[i]) for i in range(len(ids)) if side[i] == 0})
        rrows = sorted({(ids[i], ss[i]) for i in range(len(ids)) if side[i] == 1})
        o_lid, o_rid, o_lv, o_rv, o_d = [], [], [], [], []
        for lid, lv in lrows:
            for rid, rv in rrows:
                if abs(len(lv) - len(rv)) > max_dist:
                    continue
                d = levenshtein(lv, rv)
                if d <= max_dist:
                    o_lid.append(lid)
                    o_rid.append(rid)
                    o_lv.append(lv)
                    o_rv.append(rv)
                    o_d.append(d)
        if not o_lid:
            return empty
        return pa.table(
            {
                "lid": pa.array(o_lid, pa.string()),
                "rid": pa.array(o_rid, pa.string()),
                "lval": pa.array(o_lv, pa.string()),
                "rval": pa.array(o_rv, pa.string()),
                "dist": pa.array(o_d, pa.int64()),
            }
        )

    def dedup(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group
        return group.slice(0, 1)

    tagged = left.map_batches(
        emit(0, left_id, left_col), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            emit(1, right_id, right_col), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cand = tagged.groupby("variant", num_partitions=scaled_partitions(0.5, 16)).map_groups(
        group_pairs, batch_format="pyarrow"
    )
    return cand.groupby(["lid", "rid"], num_partitions=scaled_partitions(0.25, 8)).map_groups(
        dedup, batch_format="pyarrow"
    )
