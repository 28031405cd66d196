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
import pyarrow.compute as pc
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


def _byte_matrix(strs, W: int) -> np.ndarray:
    """utf-8 byte matrix zero-padded to width W (one O(L) pass per
    DISTINCT string — never per candidate pair)."""
    out = np.zeros((len(strs), W), np.uint8)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


def _ed1_dists(
    lmat: np.ndarray,
    llen: np.ndarray,
    rmat: np.ndarray,
    rlen: np.ndarray,
    li: np.ndarray,
    ri: np.ndarray,
) -> np.ndarray:
    """Vectorized edit distance CAPPED AT 1 for candidate index pairs
    (li, ri): returns 0 / 1 / 2 (2 = "more than 1"). Replaces the O(L²)
    per-pair DP in the max_dist=1 hot path — byte-matrix compares only:

    * equal length: ed ≤ 1 ⟺ ≤ 1 differing position (substitution);
    * length diff 1: ed ≤ 1 ⟺ the longer equals the shorter with one
      char inserted ⟺ aligned prefix up to the first mismatch p, then
      shifted suffix equality (long[i+1] == short[i] for i ≥ p) —
      checked with one aligned compare, one shifted compare, and a
      right-to-left cumulative AND, all row-vectorized.
    """
    n = len(li)
    dist = np.full(n, 2, np.int8)
    if n == 0:
        return dist
    ll, rl = llen[li], rlen[ri]
    same = ll == rl
    if same.any():
        sl, sr = li[same], ri[same]
        mism = (lmat[sl] != rmat[sr]).sum(axis=1)
        d = np.where(mism == 0, 0, np.where(mism == 1, 1, 2)).astype(np.int8)
        dist[same] = d
    diff = np.abs(ll - rl) == 1
    if diff.any():
        dl, dr = li[diff], ri[diff]
        l_short = llen[dl] < rlen[dr]
        S = np.where(l_short[:, None], lmat[dl], rmat[dr])
        T = np.where(l_short[:, None], rmat[dr], lmat[dl])
        W = S.shape[1]
        eq = S == T  # aligned; zero padding keeps trailing cols equal iff suffixes align
        p = np.argmin(eq, axis=1)  # first mismatch (0 if all True — handled below)
        all_eq = eq.all(axis=1)  # short is a prefix of long (+pad) → insert at end
        B = S[:, : W - 1] == T[:, 1:W]
        # suffix-all-true from column p (right-to-left cumulative AND)
        C = np.flip(np.cumprod(np.flip(B, axis=1), axis=1), axis=1).astype(bool)
        pc = np.minimum(p, W - 2)
        ok = np.take_along_axis(C, pc[:, None], axis=1)[:, 0]
        ok = ok | (p >= W - 1) | all_eq
        dist[diff] = np.where(ok, 1, 2).astype(np.int8)
    return dist


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
    ``(lid, rid, lval, rval, dist)`` rows with ``lev(lval, rval) <=
    max_dist`` — SymSpell deletion-variant blocking with both sides routed
    into one exchange and pairs generated only ACROSS sides.

    Scale shape (the three lessons of making this fast at corpus scale):

    * **Coarse partitions, not per-variant groups.** Variants are keyed by
      ``hash(variant) % P`` and each ``map_groups`` call processes its
      whole partition with vectorized run detection + offset-arithmetic
      pair expansion — one numpy pass over millions of candidates instead
      of millions of tiny per-variant Python calls.
    * **Identity-group suppression.** An EQUAL pair shares all |s|+1
      delete variants; it is emitted only from its identity group
      (variant == value), cutting duplicate emission from O(len) to 1 and
      the final distinct's input with it. Near pairs share 1-2 variants.
    * **Vectorized ed<=1 verify** (:func:`_ed1_dists`): byte-matrix
      compares over the partition's DISTINCT strings replace the O(L^2)
      per-pair DP (exact DP remains the fallback for max_dist > 1 or
      non-ASCII partitions).

    ONE grouped distinct on (lid, rid) removes pairs that met under
    several shared variants."""
    from lamapi_ray.functions.inthash import hash_string_array

    P = scaled_partitions(0.5, 16)

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
            va = pa.array(out_v, pa.string())
            pk = (hash_string_array(va) % np.uint64(P)).astype(np.int64)
            return pa.table(
                {
                    "variant": va,
                    "side": pa.array([side] * len(out_v), pa.int8()),
                    "id": pa.array(out_i, pa.string()),
                    "s": pa.array(out_s, pa.string()),
                    "__pk": pa.array(pk, pa.int64()),
                }
            )

        return fn

    _EMPTY = pa.table(
        {
            "lid": pa.array([], pa.string()),
            "rid": pa.array([], pa.string()),
            "lval": pa.array([], pa.string()),
            "rval": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }
    )
    CHUNK = 1 << 18

    def partition_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return _EMPTY
        v = np.asarray(group["variant"].to_pylist(), object)
        sd = group["side"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group["id"].to_pylist(), object)
        ss = np.asarray(group["s"].to_pylist(), object)
        order = np.lexsort((ids, sd, v))
        v, sd, ids, ss = v[order], sd[order], ids[order], ss[order]
        # runs of equal variant; side-sorted within each run
        first = np.concatenate([[True], v[1:] != v[:-1]])
        run_start = np.flatnonzero(first)
        run_end = np.concatenate([run_start[1:], [n]])
        cum0 = np.concatenate([[0], np.cumsum(sd == 0)])
        nl = cum0[run_end] - cum0[run_start]
        nr = (run_end - run_start) - nl
        live = (nl > 0) & (nr > 0)
        if not live.any():
            return _EMPTY
        rs, nl, nr = run_start[live], nl[live], nr[live]
        pairs = nl * nr
        total = int(pairs.sum())
        rep = np.repeat(np.arange(len(rs)), pairs)
        offs = np.concatenate([[0], np.cumsum(pairs)])[:-1]
        k = np.arange(total) - offs[rep]
        li_row = rs[rep] + k // nr[rep]
        ri_row = rs[rep] + nl[rep] + k % nr[rep]

        # distinct strings of the partition -> one byte matrix
        su, sinv = np.unique(ss, return_inverse=True)
        lenu = np.array([len(x) for x in su], np.int64)
        ascii_ok = all(x.isascii() for x in su)
        ls_idx = sinv[li_row]
        rs_idx = sinv[ri_row]
        keep = np.abs(lenu[ls_idx] - lenu[rs_idx]) <= max_dist
        li_row, ri_row = li_row[keep], ri_row[keep]
        ls_idx, rs_idx = ls_idx[keep], rs_idx[keep]

        if max_dist == 1 and ascii_ok:
            W = int(lenu.max()) + 1 if len(lenu) else 1
            mat = _byte_matrix(list(su), W)
            dists = np.empty(len(ls_idx), np.int8)
            for lo in range(0, len(ls_idx), CHUNK):
                hi = min(lo + CHUNK, len(ls_idx))
                dists[lo:hi] = _ed1_dists(
                    mat, lenu, mat, lenu, ls_idx[lo:hi], rs_idx[lo:hi]
                )
            hit = dists <= 1
        else:
            dists = np.full(len(ls_idx), max_dist + 1, np.int8)
            for i in range(len(ls_idx)):
                a, b = su[ls_idx[i]], su[rs_idx[i]]
                d = levenshtein(a, b)
                if d <= max_dist:
                    dists[i] = d
            hit = dists <= max_dist
        li_row, ri_row, dists = li_row[hit], ri_row[hit], dists[hit]
        if len(li_row) == 0:
            return _EMPTY
        # identity-group suppression: equal pairs only from variant == value
        eq = dists == 0
        if eq.any():
            keep0 = ~eq | (v[li_row] == ss[li_row])
            li_row, ri_row, dists = li_row[keep0], ri_row[keep0], dists[keep0]
        if len(li_row) == 0:
            return _EMPTY
        return pa.table(
            {
                "lid": pa.array(ids[li_row].tolist(), pa.string()),
                "rid": pa.array(ids[ri_row].tolist(), pa.string()),
                "lval": pa.array(ss[li_row].tolist(), pa.string()),
                "rval": pa.array(ss[ri_row].tolist(), pa.string()),
                "dist": pa.array(dists.astype(np.int64), pa.int64()),
            }
        )

    DP = scaled_partitions(0.25, 8)

    def pair_pk(batch: pa.Table) -> pa.Table:
        # coarse distinct key — hashing the pair, NOT grouping per pair
        # (per-pair map_groups would mean one Python call per output row)
        key = pc.binary_join_element_wise(
            batch["lid"].cast(pa.string()), batch["rid"].cast(pa.string()), "\x1f"
        )
        dk = (hash_string_array(key) % np.uint64(DP)).astype(np.int64)
        return batch.append_column("__dk", pa.array(dk, pa.int64()))

    def dedup_partition(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _EMPTY
        lid = np.asarray(group["lid"].to_pylist(), object)
        rid = np.asarray(group["rid"].to_pylist(), object)
        order = np.lexsort((rid, lid))
        lid_s, rid_s = lid[order], rid[order]
        first = np.concatenate(
            [[True], (lid_s[1:] != lid_s[:-1]) | (rid_s[1:] != rid_s[:-1])]
        )
        take = pa.array(order[first])
        return group.select(
            ["lid", "rid", "lval", "rval", "dist"]
        ).take(take)

    tagged = left.map_batches(
        emit(0, left_id, left_col), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            emit(1, right_id, right_col), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cand = tagged.groupby("__pk", num_partitions=P).map_groups(
        partition_pairs, batch_format="pyarrow"
    )
    return (
        cand.map_batches(pair_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__dk", num_partitions=DP)
        .map_groups(dedup_partition, batch_format="pyarrow")
    )
