"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has only implicit dedup (SURVEY §2.7); these are the
first-class large-scale training-data operators this engine adds. All of
them are DISTRIBUTED end to end — nothing corpus-sized is ever collected
to the driver or broadcast:

* :func:`exact_dedup` — content-hash per batch (vectorized sha1), one
  ``groupby(hash)`` shuffle with native Min/Count aggregates. At 100 TB the
  hash column (20 B/row) is what shuffles, never the text.
* :func:`minhash_clusters` — shingle → 64-perm MinHash → banded LSH →
  connected components. Signatures stream; band rows (id + band hash +
  signature digest, ~28 B/row) shuffle through ``groupby(band, bh)``;
  buckets emit star edges for identical-signature groups (so a million-way
  exact-dup bucket costs O(n), not O(n²)) plus representative pairs between
  signature groups, which are verified by joining the signature table
  (bucketed hash join — pair-bounded, not corpus-bounded). Cluster labels
  come from distributed min-label propagation to a fixed point.
* :func:`simhash_fingerprints` — 64-bit SimHash per doc (pure vectorized
  map, no shuffle).
* :func:`simhash_near_pairs` — rotated-prefix LSH buckets via
  ``groupby(rotation, prefix)``; per-bucket vectorized XOR-popcount.
* :func:`ngram_jaccard_pairs` — exact token-shingle Jaccard via a
  shingle-hash shuffle join: explode (shingle_hash, id), count collisions
  per pair with a native groupby Count, filter by threshold. Only pairs
  sharing ≥1 shingle cost anything (Σ|bucket|², not n²).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MERSENNE = (1 << 61) - 1


def _npcol(tbl: pa.Table, col: str, dtype) -> "np.ndarray":
    """Numeric column -> numpy, no per-element Python objects."""
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def _token_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _hash64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


# per-worker memo: shingle/token string → 64-bit hash (duplicate-heavy
# corpora re-hash the same shingles constantly)
_H64_CACHE: dict[str, int] = {}


def _hash64_cached(s: str) -> int:
    h = _H64_CACHE.get(s)
    if h is None:
        h = _hash64(s)
        if len(_H64_CACHE) < 2_000_000:
            _H64_CACHE[s] = h
    return h


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    )


def scaled_partitions(per_cpu: float, floor_: int, cap: int = 65536) -> int:
    """Grouped-exchange width sized to the CLUSTER, not a constant: the
    partition counts that are optimal on one 32-core box (16-64) would
    throttle a 256-node cluster, so corpus-scale shuffles derive their
    width from total cluster CPUs at call time."""
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 32))
    except Exception:
        cpus = 32
    return int(min(cap, max(floor_, round(cpus * per_cpu))))


def exact_dedup(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """→ one row per distinct text: (id_col = min id, n_copies)."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha1(t.encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: batch[id_col], "__h": pa.array(hashes, pa.string())}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("__h", num_partitions=scaled_partitions(1.0, 32)).aggregate(Min(id_col), Count())

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[f"min({id_col})"],
                "n_copies": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


_SH_C = 1_000_003  # Horner constant for shingle / digest folds (mod 2^61-1)


def _vocab_token_hashes(vocab) -> np.ndarray:
    """uint64 md5-hash per DISTINCT token, folded below 2^61 — the only
    per-string Python in the shingle path (memoized per worker; a batch's
    vocabulary is tiny relative to its token stream)."""
    out = np.empty(len(vocab), dtype=np.uint64)
    for i, t in enumerate(vocab):
        out[i] = _hash64_cached(t)
    from lamapi_ray.functions.inthash import fold_mod61

    return fold_mod61(out)


def shingle_fold(token_hashes: np.ndarray) -> int:
    """Scalar spec of the shingle hash: Horner fold of the (folded) token
    hashes with base ``_SH_C`` mod 2^61-1. The batch path and the DuckDB
    oracle reproduce exactly this."""
    acc = 0
    for h in token_hashes:
        acc = (acc * _SH_C + int(h)) % _MERSENNE
    return acc


def _doc_shingle_hashes(
    batch: pa.Table, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized distinct-shingle hashing for a batch of documents.

    ``distinct=False`` keeps every window occurrence (sorted by (doc, sh))
    instead of deduping — for per-gram frequency stats.

    → (ids, doc_idx, sh): per distinct (doc, shingle) one row — ``doc_idx``
    indexes ``ids``, rows grouped by doc in ascending (doc, sh) order.
    Shingles are k consecutive tokens (split on " "); a doc with <k tokens
    yields ONE shingle folding all its tokens (``_token_shingles`` parity).
    The only per-string Python is one md5 per distinct TOKEN (memoized) —
    windows, dedup and folds are numpy over the whole batch."""
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    ids = _npcol(batch, id_col, np.int64)
    n = len(ids)
    if n == 0:
        return ids, np.zeros(0, np.int64), np.zeros(0, np.uint64)
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    th = _vocab_token_hashes(enc.dictionary.to_pylist())[codes]  # < 2^61
    mlen = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    total = len(th)
    C = np.uint64(_SH_C)
    sh_parts: list[np.ndarray] = []
    par_parts: list[np.ndarray] = []
    if total >= k:
        # one sliding Horner over the WHOLE flat token array; windows that
        # cross a document boundary are masked out afterwards
        acc = th[: total - k + 1].copy()
        for j in range(1, k):
            acc = fold_mod61(
                mulmod61(acc, np.full(len(acc), C)) + th[j : total - k + 1 + j]
            )
        valid = parents[: total - k + 1] == parents[k - 1 :]
        sh_parts.append(acc[valid])
        par_parts.append(parents[: total - k + 1][valid])
    # docs with fewer than k tokens: one shingle folding all tokens;
    # vectorized per distinct short length (at most k-1 of them)
    doc_off = np.concatenate([[0], np.cumsum(mlen)])
    for l in range(1, k):
        sel = np.nonzero(mlen == l)[0]
        if len(sel) == 0:
            continue
        pos = doc_off[sel][:, None] + np.arange(l)[None, :]
        win = th[pos]  # (nsel, l)
        acc = win[:, 0].copy()
        for j in range(1, l):
            acc = fold_mod61(mulmod61(acc, np.full(len(acc), C)) + win[:, j])
        sh_parts.append(acc)
        par_parts.append(sel.astype(np.int64))
    sh_all = np.concatenate(sh_parts) if sh_parts else np.zeros(0, np.uint64)
    par_all = np.concatenate(par_parts) if par_parts else np.zeros(0, np.int64)
    order = np.lexsort((sh_all, par_all))
    par_s, sh_s = par_all[order], sh_all[order]
    if distinct and len(par_s):
        keep = np.concatenate(
            [[True], (par_s[1:] != par_s[:-1]) | (sh_s[1:] != sh_s[:-1])]
        )
        par_s, sh_s = par_s[keep], sh_s[keep]
    return ids, par_s, sh_s


class MinHasher:
    """64-permutation MinHash over token 3-shingles (state built once).

    True universal family (a·h + b) mod p with p = 2^61-1: shingle hashes
    are folded to 32 bits and a, b drawn below 2^31, so a·h + b < 2^63
    never wraps before the reduction (the round-1 uint64-wrapping variant
    was off-spec)."""

    NUM_PERM = 64

    def __init__(self, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 31, size=self.NUM_PERM).astype(np.uint64)
        self.b = rng.randint(0, 1 << 31, size=self.NUM_PERM).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        from lamapi_ray.functions.inthash import fold_mod61

        hs = {
            shingle_fold(
                fold_mod61(
                    np.array([_hash64(t) for t in sv.split(" ")], dtype=np.uint64)
                )
            )
            for sv in set(_token_shingles(text))
        }
        h32 = np.array(sorted(hs), dtype=np.uint64) & np.uint64(0xFFFFFFFF)
        vals = (h32[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


_MINHASHER: list = []


def _minhasher() -> MinHasher:
    if not _MINHASHER:
        _MINHASHER.append(MinHasher())
    return _MINHASHER[0]


def _horner_cols(mat: np.ndarray, init: np.ndarray | int = 0) -> np.ndarray:
    """Per-row Horner fold of a (n, m) uint64 matrix (values < 2^61) with
    base ``_SH_C`` mod 2^61-1 — vectorized digest of signature slots."""
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    n = mat.shape[0]
    acc = np.full(n, init, dtype=np.uint64) if np.isscalar(init) else init.copy()
    C = np.full(n, np.uint64(_SH_C), dtype=np.uint64)
    for j in range(mat.shape[1]):
        acc = fold_mod61(mulmod61(acc, C) + mat[:, j])
    return acc


def _sig_matrix(batch: pa.Table, id_col: str, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n×64) signature matrix) for a batch — fully vectorized."""
    mh = _minhasher()
    ids, doc_idx, sh = _doc_shingle_hashes(batch, id_col, text_col)
    if len(ids) == 0:
        return ids, np.empty((0, MinHasher.NUM_PERM), dtype=np.uint64)
    h32 = sh & np.uint64(0xFFFFFFFF)
    vals = (h32[:, None] * mh.a[None, :] + mh.b[None, :]) % _MERSENNE
    starts = np.nonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))[0]
    sigs = np.minimum.reduceat(vals, starts, axis=0)
    return ids, sigs


def _signatures_batch(batch: pa.Table, id_col: str, text_col: str, bands: int) -> pa.Table:
    """→ (id, sig binary, sd signature-digest, bh0..bh{bands-1}) — the
    cogroup-mode signature table (sig kept for the verify join)."""
    ids, sigs = _sig_matrix(batch, id_col, text_col)
    rows_per_band = MinHasher.NUM_PERM // bands
    cols: dict = {"id": pa.array(ids, pa.int64())}
    cols["sig"] = pa.array([s.tobytes() for s in sigs], pa.binary())
    cols["sd"] = pa.array(_horner_cols(sigs).view(np.int64), pa.int64())
    for b in range(bands):
        cols[f"bh{b}"] = pa.array(
            _horner_cols(
                sigs[:, b * rows_per_band : (b + 1) * rows_per_band], init=b + 1
            ).view(np.int64),
            pa.int64(),
        )
    return pa.table(cols)



def _run_bounds(sorted_keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Run starts/lengths over rows already sorted by the given key arrays."""
    n = len(sorted_keys[0])
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in sorted_keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.nonzero(change)[0]
    lens = np.diff(np.concatenate([starts, [n]]))
    return starts, lens


def _pairs_in_runs(starts: np.ndarray, lens: np.ndarray):
    """All within-run index pairs (i<j), vectorized by run length.

    Yields (idx_a, idx_b) absolute-index arrays; loops only over DISTINCT
    run lengths (a handful), never over runs or rows."""
    for l in np.unique(lens):
        if l < 2:
            continue
        sel = starts[lens == l]
        grid = sel[:, None] + np.arange(l)[None, :]
        iu = np.triu_indices(int(l), k=1)
        yield grid[:, iu[0]].reshape(-1), grid[:, iu[1]].reshape(-1)


_CC_P_FLOOR = 16  # floor for the CC exchange width (scaled_partitions)
_CC_MULT = np.uint64(0x9E3779B97F4A7C15)
# row kinds in the connected-components exchange
_K_EDGE, _K_CARRY, _K_LABEL = 0, 1, 2


def _cc_pkey(arr: np.ndarray, num_partitions: int) -> np.ndarray:
    return ((arr.view(np.uint64) * _CC_MULT) % np.uint64(num_partitions)).astype(np.int64)


def _cc_rows_from_edges(batch: pa.Table, num_partitions: int = _CC_P_FLOOR) -> pa.Table:
    """(id_a, id_b) edges → bidirectional CC rows keyed by hash(v)."""
    a = batch["id_a"]
    b = batch["id_b"]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    an = a.cast(pa.int64()).to_numpy(zero_copy_only=False)
    bn = b.cast(pa.int64()).to_numpy(zero_copy_only=False)
    v = np.concatenate([an, bn])
    w = np.concatenate([bn, an])
    return pa.table(
        {
            "pkey": pa.array(_cc_pkey(v, num_partitions), pa.int64()),
            "kind": pa.array(np.zeros(len(v), np.int8), pa.int8()),
            "v": pa.array(v, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )


@ray.remote(num_cpus=0)
class _CCChangeCounter:
    """Per-round changed-label counter — read once per round by the driver
    instead of running a whole sum() execution over the state. Task retries
    can only OVERcount (extra increments), which only delays the stop — the
    zero-changes stop itself stays sound."""

    def __init__(self):
        self.rounds: dict[int, int] = {}

    def add(self, round_id: int, n: int) -> None:
        self.rounds[round_id] = self.rounds.get(round_id, 0) + n

    def get(self, round_id: int) -> int:
        return self.rounds.get(round_id, 0)


# session-cached counter handle + per-run key sequence: actor spawn costs
# ~130 ms, so one zero-cpu actor is reused across CC invocations; rounds
# are keyed (run_token, round_id) so runs never collide
_CC_COUNTER_SLOT: list = [None]
_CC_RUN_SEQ = __import__("itertools").count()


def _cc_counter():
    a = _CC_COUNTER_SLOT[0]
    if a is not None:
        try:
            ray.get(a.get.remote((-1, -1)))
            return a
        except Exception:
            _CC_COUNTER_SLOT[0] = None
    a = _CCChangeCounter.remote()
    _CC_COUNTER_SLOT[0] = a
    return a


def _cc_round(group: pa.Table, round_id: int = -1, counter=None, num_partitions: int = _CC_P_FLOOR) -> pa.Table:
    """One CC round for one hash(v) partition.

    Rows: kind 0 = edge (v,u), re-emitted (deduped) every round; kind 1 =
    carrier (neighbor's label for v from last round); kind 2 = v's label.
    The round runs a LOCAL min-label fixpoint over the partition's edge
    subgraph (vectorized ``np.minimum.at`` passes), so all intra-partition
    structure collapses in ONE round — cross-partition hops cost one round
    each. Each round also adds SHORTCUT edges (v ↔ current label of v);
    a label value is always an id inside v's component, so components are
    unchanged while label information then travels directly (pointer-
    doubling-style path compression). Labels are monotone non-increasing
    and the global update is a deterministic fixpoint map: a round with
    zero label changes reproduces its own input (labels fix carriers fix
    shortcuts), hence is a proven fixpoint."""
    if len(group) == 0:
        return pa.table(
            {"pkey": pa.array([], pa.int64()), "kind": pa.array([], pa.int8()),
             "v": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}
        )
    kind = _npcol(group, "kind", np.int8)
    v = _npcol(group, "v", np.int64)
    w = _npcol(group, "w", np.int64)
    is_e = kind == _K_EDGE
    is_l = kind == _K_LABEL
    ev, ew = v[is_e], w[is_e]
    # local node table over every id seen in this partition
    nodes = np.unique(np.concatenate([v, ew]))
    val = nodes.copy()  # init: own id
    # fold in last round's labels and carriers (both keyed by v)
    iv = np.searchsorted(nodes, v)
    np.minimum.at(val, iv[~is_e], w[~is_e])
    # local fixpoint over the partition's edges (usually 1-2 passes)
    ia = iv[is_e]
    ib = np.searchsorted(nodes, ew)
    while True:
        prev = val.copy()
        np.minimum.at(val, ia, val[ib])
        np.minimum.at(val, ib, val[ia])
        if np.array_equal(prev, val):
            break
    gv = np.unique(v)
    lab = val[np.searchsorted(nodes, gv)]
    if counter is not None:
        # changed = grouped nodes whose label moved vs last round (first
        # appearance counts as changed unless label == own id)
        old = gv.copy()
        np.minimum.at(old, np.searchsorted(gv, v[is_l]), w[is_l])
        ray.get(counter.add.remote(round_id, int((lab != old).sum())))
    # static edges ∪ shortcuts to current labels, deduped per partition
    sc = lab != gv
    e_v = np.concatenate([ev, gv[sc], lab[sc]])
    e_w = np.concatenate([ew, lab[sc], gv[sc]])
    epair = np.unique(np.stack([e_v, e_w], axis=1), axis=0)
    e_v, e_w = epair[:, 0], epair[:, 1]
    # carriers: each edge (v,u) with LOCAL v sends v's label to u (a
    # shortcut twin's v side may be a remote label node — its own partition
    # emits that carrier next round)
    pos = np.clip(np.searchsorted(nodes, e_v), 0, len(nodes) - 1)
    local = nodes[pos] == e_v
    out_v = np.concatenate([e_v, gv, e_w[local]])
    out_w = np.concatenate([e_w, lab, val[pos[local]]])
    out_kind = np.concatenate(
        [
            np.zeros(len(e_v), np.int8),
            np.full(len(gv), _K_LABEL, np.int8),
            np.full(int(local.sum()), _K_CARRY, np.int8),
        ]
    )
    return pa.table(
        {
            "pkey": pa.array(_cc_pkey(out_v, num_partitions), pa.int64()),
            "kind": pa.array(out_kind, pa.int8()),
            "v": pa.array(out_v, pa.int64()),
            "w": pa.array(out_w, pa.int64()),
        }
    )


def _cc_min_labels(
    edge_rows: ray.data.Dataset,
    max_iters: int = 64,
    pre_round: bool = False,
    num_partitions: int | None = None,
) -> pa.Table:
    """Distributed connected components over an (id_a, id_b) edge list
    (duplicates and self-loops welcome) → (node, label=min id of component).

    ONE grouped exchange per round (vs two for classic send/reduce
    propagation), with per-partition local fixpoints and shortcut edges so
    rounds track partition-crossing hops with path compression, not the
    raw diameter. ``pre_round`` means the input is already CC rows, letting
    the first round chain onto the caller's pipeline with no extra barrier.
    Convergence is detected by a zero changed-label count, reported by the
    round tasks to a zero-cpu counter actor (no extra pass over the state).
    """
    import functools

    P = num_partitions or scaled_partitions(0.5, _CC_P_FLOOR)
    counter = _cc_counter()
    tok = next(_CC_RUN_SEQ)
    state = edge_rows
    if not pre_round:
        state = state.map_batches(
            _cc_rows_from_edges, batch_format="pyarrow",
            fn_kwargs={"num_partitions": P},
        )
    try:
        for rid in range(max_iters):
            state = (
                state.groupby("pkey", num_partitions=P)
                .map_groups(
                    functools.partial(
                        _cc_round, round_id=(tok, rid), counter=counter,
                        num_partitions=P,
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            if ray.get(counter.get.remote((tok, rid))) == 0:
                break

        def labels_only(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch["kind"], _K_LABEL)
            sel = batch.filter(mask)
            return pa.table({"node": sel["v"], "label": sel["w"]})

        batches = [
            b
            for b in state.map_batches(
                labels_only, batch_format="pyarrow"
            ).iter_batches(batch_size=65536, batch_format="pyarrow")
        ]
        if not batches:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        return pa.concat_tables(batches)
    finally:
        pass  # counter is session-cached (zero-cpu) — reused, not killed


# floor for the band-shuffle width (scaled_partitions): binds only below
# 16 cluster CPUs (2.0/cpu dominates above); 32 measured ~8% faster than 64
# end-to-end at bench scale with identical output (fewer reduce-task fixed
# costs), and still spreads band buckets amply in small sessions
_LSH_P_FLOOR = 32


def _band_rows_batch(
    batch: pa.Table, id_col: str, text_col: str, bands: int, carry_sig: bool,
    num_partitions: int = _LSH_P_FLOOR,
) -> pa.Table:
    """corpus batch → band rows (pkey, band, bh, id, sd [, sig]) in ONE map
    (signatures never materialize separately in inline mode). ``pkey`` is a
    coarse partition key — (band, bh) buckets are recovered in-process by
    sorting, so the shuffle has ~``num_partitions`` groups, not millions."""
    ids, sigs = _sig_matrix(batch, id_col, text_col)
    n = len(ids)
    rows_per_band = MinHasher.NUM_PERM // bands
    sd = _horner_cols(sigs).view(np.int64)
    band_all = np.repeat(np.arange(bands, dtype=np.int32), n)
    bh_parts = [
        _horner_cols(sigs[:, b * rows_per_band : (b + 1) * rows_per_band], init=b + 1)
        for b in range(bands)
    ]
    bh_all = np.concatenate(bh_parts).view(np.int64) if n else np.zeros(0, np.int64)
    pkey = (
        bh_all.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + band_all.astype(np.uint64)
    ) % np.uint64(num_partitions)
    cols = {
        "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
        "band": pa.array(band_all, pa.int32()),
        "bh": pa.array(bh_all, pa.int64()),
        "id": pa.array(np.tile(ids, bands), pa.int64()),
        "sd": pa.array(np.tile(sd, bands), pa.int64()),
    }
    if carry_sig:
        sig_bytes = sigs.tobytes()
        w = MinHasher.NUM_PERM * 8
        one = pa.array([sig_bytes[i * w : (i + 1) * w] for i in range(n)], pa.binary())
        cols["sig"] = pa.concat_arrays([one] * bands) if bands > 1 else one
    return pa.table(cols)


def _bucket_edges(
    group: pa.Table, threshold_rows: int, inline_verify: bool
) -> pa.Table:
    """One coarse partition of band rows → edges.

    Per recovered (band, bh, sd) run: star edges member→run-min (so a
    million-way exact-dup bucket costs O(n)); per band-0 sd-run a rep
    SELF-edge so every doc reaches the component stage. Rep pairs between
    different-sd runs of a bucket are near-dup CANDIDATES: with
    ``inline_verify`` the carried signatures settle them right here
    (slot-agreement ≥ threshold); otherwise they're emitted unverified
    (sure=false) for the cogroup verifier. Pairs are deduped locally; the
    same pair surfacing from another partition is deduped downstream
    (inline: duplicate edges are harmless to components)."""
    schema_cols = {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    if not inline_verify:
        schema_cols["sure"] = pa.array([], pa.bool_())
    empty = pa.table(schema_cols)
    if len(group) == 0:
        return empty
    band = _npcol(group, "band", np.int64)
    bh = _npcol(group, "bh", np.int64)
    ids = _npcol(group, "id", np.int64)
    sds = _npcol(group, "sd", np.int64)
    order = np.lexsort((ids, sds, bh, band))
    band, bh, ids, sds = band[order], bh[order], ids[order], sds[order]
    sd_starts, _ = _run_bounds([band, bh, sds])
    is_start = np.zeros(len(ids), dtype=bool)
    is_start[sd_starts] = True
    run_id = np.cumsum(is_start) - 1
    # band 0 only: identical-sig runs are band-independent, so stars from
    # one band cover them all without 16x duplicate edges
    b0 = band == 0
    star_b = ids[~is_start & b0]
    star_a = ids[sd_starts][run_id[~is_start & b0]]
    self_m = ids[sd_starts][b0[sd_starts]]  # rep self-edges: every doc lands in CC
    # rep pairs between different sd-runs of one (band, bh) bucket
    rep_ids = ids[sd_starts]
    bk_starts, bk_lens = _run_bounds([band[sd_starts], bh[sd_starts]])
    pa_l, pb_l = [], []
    for ia, ib in _pairs_in_runs(bk_starts, bk_lens):
        a, b = rep_ids[ia], rep_ids[ib]
        pa_l.append(np.minimum(a, b))
        pb_l.append(np.maximum(a, b))
    cand_a = np.concatenate(pa_l) if pa_l else np.zeros(0, np.int64)
    cand_b = np.concatenate(pb_l) if pb_l else np.zeros(0, np.int64)
    if len(cand_a):
        # local pair dedup (same pair from several bands of this partition)
        pk = np.unique(np.stack([cand_a, cand_b], axis=1), axis=0)
        cand_a, cand_b = pk[:, 0], pk[:, 1]
    if threshold_rows >= MinHasher.NUM_PERM:
        # full agreement ≡ signature equality ≡ same sd: no rep pair can
        # ever verify — drop candidates entirely
        cand_a = cand_b = np.zeros(0, np.int64)
    elif inline_verify and len(cand_a):
        sig_col = group["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = np.frombuffer(
            b"".join(sig_col.to_pylist()), dtype=np.uint64
        ).reshape(len(group), MinHasher.NUM_PERM)[order]
        # signature per id: ids repeat across bands — first position per
        # distinct id, fully vectorized
        sid_order = np.argsort(ids, kind="stable")
        sid = ids[sid_order]
        fstarts, _ = _run_bounds([sid])
        uniq_ids = sid[fstarts]
        first_pos = sid_order[fstarts]
        ia = first_pos[np.searchsorted(uniq_ids, cand_a)]
        ib = first_pos[np.searchsorted(uniq_ids, cand_b)]
        agree = (sigs[ia] == sigs[ib]).sum(axis=1) >= threshold_rows
        cand_a, cand_b = cand_a[agree], cand_b[agree]
    out = {
        "id_a": pa.array(np.concatenate([star_a, self_m, cand_a]), pa.int64()),
        "id_b": pa.array(np.concatenate([star_b, self_m, cand_b]), pa.int64()),
    }
    if not inline_verify:
        out["sure"] = pa.array(
            np.concatenate(
                [
                    np.ones(len(star_a) + len(self_m), dtype=bool),
                    np.zeros(len(cand_a), dtype=bool),
                ]
            ),
            pa.bool_(),
        )
    return pa.table(out)


def minhash_clusters(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    bands: int = 16,
    threshold_rows: int = 48,
    verify: str = "inline",
) -> pa.Table:
    """→ (id, cluster) for every doc; cluster = min id of its component.

    ``threshold_rows``: minimum number of agreeing signature slots (of 64)
    for a candidate pair to be verified as a near-duplicate (48/64 = 0.75
    estimated Jaccard; 64 ≡ exact signature equality).

    Two verify modes with IDENTICAL output (asserted in tests):

    * ``"inline"`` (default): band rows carry the 512-B signature, so
      candidate discovery AND slot-agreement verification happen inside the
      one band shuffle, and the whole job is signatures → one grouped
      exchange → components. Shuffle volume ≈ bands × 520 B/doc (~8 KB at
      16 bands) — comparable to re-shuffling the corpus once; the fewest
      barriers, best wall-clock when latency/stage overhead dominates.
    * ``"cogroup"``: band rows carry only an 8-B digest (~0.5 KB/doc
      shuffled) and candidate pairs are verified by a two-shuffle cogroup
      against the signature table (pair-bounded, not corpus-bounded).
      Minimal shuffle volume — choose this when the corpus is large enough
      that bytes moved dominate stage overhead (the classic
      broadcast-vs-shuffle style size cutover).

    Fully distributed either way: nothing corpus-sized is collected or
    broadcast; the final (id, cluster) collect is the test-scale stand-in
    for ``write_parquet``."""
    if verify not in ("inline", "cogroup"):
        raise ValueError(f"verify must be 'inline' or 'cogroup', got {verify!r}")
    inline = verify == "inline"
    exact = threshold_rows >= MinHasher.NUM_PERM
    # 1.0/cpu and 0.25/cpu measured ~8% faster end-to-end than 2.0/0.5 at
    # bench scale (fewer reduce-task fixed costs; identical output) — the
    # per-cpu terms still dominate the floors on any real cluster
    L = scaled_partitions(1.0, _LSH_P_FLOOR)
    P = scaled_partitions(0.25, 8)

    if inline:
        band_rows = ds.map_batches(
            _band_rows_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={
                "id_col": id_col,
                "text_col": text_col,
                "bands": bands,
                # exact mode never verifies, so never pay the sig shuffle
                "carry_sig": not exact,
                "num_partitions": L,
            },
        )
        import functools

        edges = band_rows.groupby("pkey", num_partitions=L).map_groups(
            functools.partial(
                _bucket_edges, threshold_rows=threshold_rows, inline_verify=True
            ),
            batch_format="pyarrow",
        )
        # chain straight into CC round 1 — one execution end to end
        cc_rows = edges.map_batches(
            _cc_rows_from_edges, batch_format="pyarrow",
            fn_kwargs={"num_partitions": P},
        )
        labels = _cc_min_labels(cc_rows, pre_round=True, num_partitions=P)
    else:
        import functools

        sig_ds = ds.map_batches(
            _signatures_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"id_col": id_col, "text_col": text_col, "bands": bands},
        ).materialize()

        def explode_bands(batch: pa.Table) -> pa.Table:
            n = len(batch)
            ids = batch["id"]
            sds = batch["sd"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if isinstance(sds, pa.ChunkedArray):
                sds = sds.combine_chunks()
            icols, scols, hcols = [], [], []
            for b in range(bands):
                bh = batch[f"bh{b}"]
                if isinstance(bh, pa.ChunkedArray):
                    bh = bh.combine_chunks()
                icols.append(ids)
                scols.append(sds)
                hcols.append(bh)
            bh_all = pa.concat_arrays(hcols)
            band_all = np.repeat(np.arange(bands, dtype=np.int32), n)
            pkey = (
                bh_all.to_numpy(zero_copy_only=False).view(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + band_all.astype(np.uint64)
            ) % np.uint64(L)
            return pa.table(
                {
                    "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                    "band": pa.array(band_all, pa.int32()),
                    "bh": bh_all,
                    "id": pa.concat_arrays(icols),
                    "sd": pa.concat_arrays(scols),
                }
            )

        all_edges = (
            sig_ds.drop_columns(["sig"])
            .map_batches(explode_bands, batch_format="pyarrow")
            .groupby("pkey", num_partitions=L)
            .map_groups(
                functools.partial(
                    _bucket_edges, threshold_rows=threshold_rows, inline_verify=False
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

        def sure_only(batch: pa.Table) -> pa.Table:
            col = batch["sure"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return batch.filter(col).select(["id_a", "id_b"])

        sure_edges = all_edges.map_batches(sure_only, batch_format="pyarrow")
        if exact:
            edges = sure_edges
        else:
            unsure = all_edges.map_batches(
                lambda t: t.filter(
                    pc.invert(
                        t["sure"].combine_chunks()
                        if isinstance(t["sure"], pa.ChunkedArray)
                        else t["sure"]
                    )
                ).select(["id_a", "id_b"]),
                batch_format="pyarrow",
            )
            verified = _cogroup_verify(unsure, sig_ds, threshold_rows)
            edges = sure_edges.union(verified)
        labels = _cc_min_labels(edges, num_partitions=P)

    return (
        pa.table({"id": labels["node"], "cluster": labels["label"]})
        .sort_by("id")
    )


def _cogroup_verify(
    unsure: ray.data.Dataset, sig_ds: ray.data.Dataset, threshold_rows: int
) -> ray.data.Dataset:
    """Slot-agreement verification of candidate pairs against the signature
    table — two shuffles, no generic join, pair-bounded: pair halves and
    signature rows meet in hash(id) partitions (searchsorted lookup), then
    halves meet in hash(pair) partitions for the agreement test. Duplicate
    candidate pairs from different band partitions are deduped in the first
    exchange (all copies of a half land in its endpoint's partition)."""
    P = 16
    MULT = np.uint64(0x9E3779B97F4A7C15)

    def _pk(arr: np.ndarray) -> np.ndarray:
        return ((arr.view(np.uint64) * MULT) % np.uint64(P)).astype(np.int64)

    def pair_halves(batch: pa.Table) -> pa.Table:
        a = _npcol(batch, "id_a", np.int64)
        b = _npcol(batch, "id_b", np.int64)
        key = np.concatenate([a, b])
        return pa.table(
            {
                "pkey": pa.array(_pk(key), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "id_a": pa.array(np.concatenate([a, a]), pa.int64()),
                "id_b": pa.array(np.concatenate([b, b]), pa.int64()),
                "sig": pa.nulls(2 * len(a), pa.binary()),
            }
        )

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = _npcol(batch, "id", np.int64)
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        return pa.table(
            {
                "pkey": pa.array(_pk(ids), pa.int64()),
                "key": pa.array(ids, pa.int64()),
                "id_a": pa.nulls(len(ids), pa.int64()),
                "id_b": pa.nulls(len(ids), pa.int64()),
                "sig": sig,
            }
        )

    both = unsure.map_batches(pair_halves, batch_format="pyarrow").union(
        sig_ds.select_columns(["id", "sig"]).map_batches(
            sig_rows, batch_format="pyarrow"
        )
    )

    def attach_sig(group: pa.Table) -> pa.Table:
        is_sig = pc.is_valid(group["sig"]).to_numpy(zero_copy_only=False)
        keys = _npcol(group, "key", np.int64)
        s_keys = keys[is_sig]
        s_sigs = np.asarray(
            group.filter(pa.array(is_sig))["sig"].to_pylist(), dtype=object
        )
        order = np.argsort(s_keys, kind="stable")
        s_keys, s_sigs = s_keys[order], s_sigs[order]
        halves = group.filter(pa.array(~is_sig))
        if len(halves) == 0:
            return pa.table(
                {"ppkey": pa.array([], pa.int64()),
                 "id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "sig": pa.array([], pa.binary())}
            )
        h_key = keys[~is_sig]
        ha = _npcol(halves, "id_a", np.int64)
        hb = _npcol(halves, "id_b", np.int64)
        # dedup duplicate halves (same pair discovered in several band
        # partitions): all copies carry identical (key, id_a, id_b)
        trip = np.stack([h_key, ha, hb], axis=1)
        trip = np.unique(trip, axis=0)
        h_key, ha, hb = trip[:, 0], trip[:, 1], trip[:, 2]
        pos = np.searchsorted(s_keys, h_key)
        ppkey = (
            (ha.view(np.uint64) * MULT + hb.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
            % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {
                "ppkey": pa.array(ppkey, pa.int64()),
                "id_a": pa.array(ha, pa.int64()),
                "id_b": pa.array(hb, pa.int64()),
                "sig": pa.array(list(s_sigs[pos]), pa.binary()),
            }
        )

    def verify_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        a = _npcol(group, "id_a", np.int64)
        b = _npcol(group, "id_b", np.int64)
        sigs = np.frombuffer(
            b"".join(group["sig"].to_pylist()), dtype=np.uint64
        ).reshape(len(group), MinHasher.NUM_PERM)
        order = np.lexsort((b, a))
        a, b, sigs = a[order], b[order], sigs[order]
        # each pair contributed exactly two half-rows (one per endpoint)
        agree = (sigs[0::2] == sigs[1::2]).sum(axis=1) >= threshold_rows
        return pa.table(
            {
                "id_a": pa.array(a[0::2][agree], pa.int64()),
                "id_b": pa.array(b[0::2][agree], pa.int64()),
            }
        )

    return (
        both.groupby("pkey", num_partitions=P)
        .map_groups(attach_sig, batch_format="pyarrow")
        .groupby("ppkey", num_partitions=P)
        .map_groups(verify_pairs, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset (scalar spec; the batch path
    is :func:`_simhash_batch` and produces identical values)."""
    acc = np.zeros(64, dtype=np.int64)
    toks = text.split(" ")
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    for tok, cnt in zip(uniq, counts):
        h = _hash64_cached(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), cnt, -cnt)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def _simhash_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Vectorized SimHash: tokens dictionary-encoded per batch, one md5 per
    DISTINCT token (memoized per worker), bit votes via a segmented
    reduceat — no per-token Python in the hot path."""
    nrows = len(batch)
    if nrows == 0:
        return pa.table({"id": pa.array([], pa.int64()), "simhash": pa.array([], pa.string())})
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    vocab = enc.dictionary.to_pylist()
    hvals = np.array([_hash64_cached(t) for t in vocab], dtype=np.uint64)
    sign = (
        ((hvals[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        .astype(np.int64)
        * 2
        - 1
    )  # (ncodes, 64) in {-1, +1}
    ncodes = max(len(vocab), 1)
    key = parents * ncodes + codes
    uniq_key, cnt = np.unique(key, return_counts=True)
    pair_parent = uniq_key // ncodes
    pair_code = uniq_key % ncodes
    contrib = cnt[:, None] * sign[pair_code]  # (npairs, 64)
    starts = np.nonzero(
        np.concatenate([[True], pair_parent[1:] != pair_parent[:-1]])
    )[0]
    acc = np.add.reduceat(contrib, starts, axis=0)  # (nrows, 64); every row has ≥1 token
    bits = (acc > 0).astype(np.uint64)
    vals = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    hexes = [f"{int(v):016x}" for v in vals]
    return pa.table(
        {"id": batch[id_col], "simhash": pa.array(hexes, pa.string())}
    )


def simhash_fingerprints(
    ds: ray.data.Dataset, id_col: str, text_col: str
) -> ray.data.Dataset:
    """→ (id, simhash hex string) — pure vectorized map stage, no shuffle."""
    return ds.map_batches(
        _simhash_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
    )


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def simhash_near_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    num_rotations: int = 4,
) -> pa.Table:
    """Hamming-close SimHash pairs via rotated prefix buckets — distributed
    and, at the defaults, EXACT.

    Classic Charikar trick: for each of ``num_rotations`` bit-rotations of
    the 64-bit fingerprint, bucket by the top-16-bit prefix. With the
    default 4 rotations the four prefixes are the four DISJOINT 16-bit
    blocks of the fingerprint, and ``max_hamming=3`` flips can't touch all
    four (pigeonhole) — every qualifying pair collides in ≥1 rotation, so
    the output is the exact Hamming-≤3 pair set (oracle-checked by the
    all-pairs SQL in ``simhash_near_dup``). For ``max_hamming ≥
    num_rotations`` the guarantee degrades to high-probability recall.
    Fingerprints stream; (rotation, prefix) rows shuffle through ONE
    ``groupby``; each bucket verifies with a vectorized XOR-popcount. Pair
    dedup is a native Min aggregate."""
    from ray.data.aggregate import Min

    fp_ds = simhash_fingerprints(ds, id_col, text_col)

    num_partitions = scaled_partitions(2.0, 64)

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = _npcol(batch, "id", np.int64)
        fps = np.array([int(h, 16) for h in batch["simhash"].to_pylist()], dtype=np.uint64)
        rots, prefixes, out_ids, out_fps = [], [], [], []
        for r in range(num_rotations):
            rot = (
                (fps << np.uint64(16 * r)) | (fps >> np.uint64(64 - 16 * r))
            ) if r else fps
            rots.append(np.full(n, r, dtype=np.int32))
            prefixes.append((rot >> np.uint64(48)).astype(np.int64))
            out_ids.append(ids)
            out_fps.append(fps.view(np.int64))
        rot_all = np.concatenate(rots)
        pre_all = np.concatenate(prefixes)
        # coarse partition key — (rotation, prefix) buckets are recovered
        # in-process by sorting (run detection), not one Ray group each
        pkey = (
            (
                pre_all.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + rot_all.astype(np.uint64)
            )
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(pkey, pa.int64()),
                "rot": pa.array(rot_all, pa.int32()),
                "prefix": pa.array(pre_all, pa.int64()),
                "id": pa.array(np.concatenate(out_ids), pa.int64()),
                "fp": pa.array(np.concatenate(out_fps), pa.int64()),
            }
        )

    rows = fp_ds.map_batches(explode, batch_format="pyarrow")

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        if len(group) < 2:
            return empty
        rot = _npcol(group, "rot", np.int64)
        pre = _npcol(group, "prefix", np.int64)
        ids = _npcol(group, "id", np.int64)
        fps = _npcol(group, "fp", np.int64).view(np.uint64)
        order = np.lexsort((ids, pre, rot))
        rot, pre, ids, fps = rot[order], pre[order], ids[order], fps[order]
        starts, lens = _run_bounds([rot, pre])
        a_l, b_l, d_l = [], [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            xor = fps[ia] ^ fps[ib]
            dist = _POPCOUNT[xor.view(np.uint8).reshape(-1, 8)].sum(axis=1)
            ok = dist <= max_hamming
            a_l.append(ids[ia][ok])
            b_l.append(ids[ib][ok])
            d_l.append(dist[ok])
        if not a_l:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_l), pa.int64()),
                "id_b": pa.array(np.concatenate(b_l), pa.int64()),
                "hamming": pa.array(np.concatenate(d_l), pa.int64()),
            }
        )

    pairs = rows.groupby("pkey", num_partitions=num_partitions).map_groups(
        partition_pairs, batch_format="pyarrow"
    )
    agg = pairs.groupby(["id_a", "id_b"], num_partitions=scaled_partitions(0.5, 16)).aggregate(Min("hamming", alias_name="hamming"))
    out = _collect(agg)
    return out.select(["id_a", "id_b", "hamming"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset | pa.Table,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 3,
    max_df: int | None = None,
) -> pa.Table:
    """All pairs with token-k-shingle Jaccard ≥ threshold — exact, via a
    shingle-hash shuffle join.

    Real Jaccard (union denominator) — unlike the reference's scoring
    functions, this is a training-data op, not a lamAPI-parity op.
    Dataflow: each doc explodes to (shingle_hash, id, n_shingles) rows;
    ONE ``groupby(shingle_hash)`` co-locates colliding docs; each bucket
    emits its id pairs; a native groupby-Count sums collisions per pair;
    Jaccard = n/(na+nb−n) filtered by threshold. Nothing is broadcast or
    collected; cost is Σ|bucket|² over shingle buckets (only pairs sharing
    ≥1 shingle are touched) — with ``max_df=None``, identical output to
    the brute-force all-pairs join.

    ``max_df`` is the stop-shingle guard: Σ|bucket|² explodes when one
    near-universal shingle ("in the of"-style) puts most of the corpus in
    one bucket. When set, shingles appearing in more than ``max_df`` docs
    are REMOVED FROM EVERY DOC'S SHINGLE SET before pairing (classic
    document-frequency pruning): pair enumeration, intersection counts AND
    the na/nb denominators all use the reduced sets, so the reported
    Jaccard is exact over those sets — not a biased undercount. Costs one
    extra df-counting exchange + a second tokenize pass; the pruned
    shingle count is logged."""
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)

    num_partitions = scaled_partitions(2.0, 64)

    def explode(batch: pa.Table, heavy_ref=None) -> pa.Table:
        # vectorized distinct-shingle hashing (one md5 per distinct TOKEN,
        # numeric Horner folds for the windows — no per-shingle Python)
        ids, doc_idx, sh = _doc_shingle_hashes(batch, id_col, text_col, k)
        sh_np = sh.view(np.int64)  # < 2^61, stays positive
        if heavy_ref is not None and len(doc_idx):
            heavy = ray.get(heavy_ref)  # sorted int64, tiny
            pos = np.minimum(
                np.searchsorted(heavy, sh_np), max(len(heavy) - 1, 0)
            )
            keep = heavy[pos] != sh_np if len(heavy) else np.ones(
                len(sh_np), dtype=bool
            )
            doc_idx, sh_np = doc_idx[keep], sh_np[keep]
        if len(doc_idx) == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int64()), "sh": pa.array([], pa.int64()),
                 "id": pa.array([], pa.int64()), "nsh": pa.array([], pa.int64())}
            )
        nsh_per_doc = np.bincount(doc_idx, minlength=len(ids)).astype(np.int64)
        # coarse partition key — shingle buckets are recovered in-process by
        # sorting; a Ray group per shingle would be millions of tiny calls
        pkey = (sh_np.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            num_partitions
        )
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "sh": pa.array(sh_np, pa.int64()),
                "id": pa.array(ids[doc_idx], pa.int64()),
                "nsh": pa.array(nsh_per_doc[doc_idx], pa.int64()),
            }
        )

    sh_rows = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    if max_df is not None:
        # pass 1: global df per shingle inside the SAME pkey partitioning
        # (a shingle lands in exactly one partition, so per-partition
        # np.unique counts are exact global dfs); only the heavy tail —
        # at most total_rows/max_df shingles — leaves the exchange
        def heavy_in_part(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return pa.table({"sh": pa.array([], pa.int64())})
            u, c = np.unique(_npcol(group, "sh", np.int64), return_counts=True)
            return pa.table({"sh": pa.array(u[c > max_df], pa.int64())})

        heavy_tbl = _collect(
            sh_rows.groupby("pkey", num_partitions=num_partitions).map_groups(
                heavy_in_part, batch_format="pyarrow"
            )
        )
        heavy = np.sort(heavy_tbl["sh"].to_numpy(zero_copy_only=False))
        if len(heavy):
            import logging

            logging.getLogger("lamapi_ray.dedup").warning(
                "ngram_jaccard_pairs: pruned %d stop-shingles with df > %d",
                len(heavy),
                max_df,
            )
        heavy_ref = ray.put(heavy.astype(np.int64))
        sh_rows = ds.map_batches(
            lambda b: explode(b, heavy_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64())}
        )
        if len(group) < 2:
            return empty
        sh = _npcol(group, "sh", np.int64)
        ids = _npcol(group, "id", np.int64)
        ns = _npcol(group, "nsh", np.int64)
        order = np.lexsort((ids, sh))
        sh, ids, ns = sh[order], ids[order], ns[order]
        starts, lens = _run_bounds([sh])
        a_l, b_l, na_l, nb_l = [], [], [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            a_l.append(ids[ia])
            b_l.append(ids[ib])
            na_l.append(ns[ia])
            nb_l.append(ns[ib])
        if not a_l:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_l), pa.int64()),
                "id_b": pa.array(np.concatenate(b_l), pa.int64()),
                "na": pa.array(np.concatenate(na_l), pa.int64()),
                "nb": pa.array(np.concatenate(nb_l), pa.int64()),
            }
        )

    pairs = sh_rows.groupby("pkey", num_partitions=num_partitions).map_groups(partition_pairs, batch_format="pyarrow")

    # second coarse exchange keyed by pair hash; collision counting is a
    # vectorized run count per partition (a native 2-column groupby
    # aggregate over the pair rows measured ~7x slower at sf0.1)
    def add_ppkey(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        pp = (
            a * np.uint64(0x9E3779B97F4A7C15) + b * np.uint64(0xC2B2AE3D27D4EB4F)
        ) % np.uint64(num_partitions)
        return batch.append_column("ppkey", pa.array(pp.astype(np.int64), pa.int64()))

    from lamapi_ray.stages.textstats import round_ref_array

    def count_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
        if len(group) == 0:
            return empty
        a = _npcol(group, "id_a", np.int64)
        b = _npcol(group, "id_b", np.int64)
        na = _npcol(group, "na", np.float64)
        nb = _npcol(group, "nb", np.float64)
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        starts, lens = _run_bounds([a, b])
        n = lens.astype(np.float64)
        jac = n / (na[starts] + nb[starts] - n)
        keep = jac >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(a[starts][keep], pa.int64()),
                "id_b": pa.array(b[starts][keep], pa.int64()),
                "jaccard": pa.array(round_ref_array(jac[keep], 3), pa.float64()),
            }
        )

    out = _collect(
        pairs.map_batches(add_ppkey, batch_format="pyarrow")
        .groupby("ppkey", num_partitions=num_partitions)
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


# --- passage-level exact dedup ---------------------------------------------


def _doc_passage_hashes(
    batch: pa.Table, id_col: str, text_col: str, k: int = 16
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Non-overlapping k-token passage hashes per document.

    → (ids, seg_doc_idx, seg_pidx, seg_hash): one row per passage; the
    tail passage keeps the remainder tokens (<k-token docs yield ONE
    passage). Token hashing and the Horner fold are identical to
    :func:`_doc_shingle_hashes`, so the DuckDB oracle reproduces every
    hash with ``list_reduce`` over list slices."""
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    ids = _npcol(batch, id_col, np.int64)
    n = len(ids)
    if n == 0:
        z = np.zeros(0, np.int64)
        return ids, z, z, np.zeros(0, np.uint64)
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    th = _vocab_token_hashes(enc.dictionary.to_pylist())[codes]
    mlen = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    doc_off = np.concatenate([[0], np.cumsum(mlen)[:-1]])
    nseg = (mlen + k - 1) // k  # ceil; mlen >= 1 always ('' splits to [''])
    total_segs = int(nseg.sum())
    seg_doc = np.repeat(np.arange(n), nseg)
    seg_off = np.concatenate([[0], np.cumsum(nseg)[:-1]])
    pidx = np.arange(total_segs) - np.repeat(seg_off, nseg)
    seg_start = doc_off[seg_doc] + pidx * k
    seg_len = np.minimum(k, mlen[seg_doc] - pidx * k)
    C = np.full(total_segs, _SH_C, np.uint64)
    acc = th[seg_start].copy()
    top = len(th) - 1
    for j in range(1, k):
        live = j < seg_len
        if not live.any():
            break
        idx = np.minimum(seg_start + j, top)
        upd = fold_mod61(mulmod61(acc, C) + th[idx])
        acc = np.where(live, upd, acc)
    return ids, seg_doc, pidx, acc


def passage_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    pack: int = 1_000_000,
) -> ray.data.Dataset:
    """Corpus-wide exact dedup of non-overlapping k-token passages.

    → one row per DISTINCT passage: (g, n_copies, keep_doc, keep_idx) where
    the keeper is the lexicographically smallest (doc_id, passage_idx) —
    the sub-document analogue of :func:`exact_dedup` (near-dup boilerplate
    and quoted blocks dedup at passage granularity even when whole docs
    differ). Shuffle carries one PARTIAL row per distinct passage hash per
    batch (count + min packed key combined map-side); occurrences never
    cross the wire individually."""
    from ray.data.aggregate import Min, Sum

    def emit(batch: pa.Table) -> pa.Table:
        ids, sdoc, pidx, h = _doc_passage_hashes(batch, id_col, text_col, k)
        if len(h) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "minpk": pa.array([], pa.int64()),
                }
            )
        hs = h.astype(np.int64)  # < 2^61, no wrap
        pk = ids[sdoc] * pack + pidx
        order = np.lexsort((pk, hs))
        hs_s, pk_s = hs[order], pk[order]
        new = np.concatenate([[True], hs_s[1:] != hs_s[:-1]])
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.concatenate([starts, [len(hs_s)]]))
        return pa.table(
            {
                "g": pa.array(hs_s[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
                "minpk": pa.array(pk_s[starts]),  # (h, pk)-sorted: run head = min
            }
        )

    agg = (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g", num_partitions=scaled_partitions(1.0, 32))
        .aggregate(Sum("cnt"), Min("minpk"))
    )

    def project(batch: pa.Table) -> pa.Table:
        mp = batch["min(minpk)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "g": batch["g"].cast(pa.int64()),
                "n_copies": batch["sum(cnt)"].cast(pa.int64()),
                "keep_doc": pa.array(mp // pack),
                "keep_idx": pa.array(mp % pack),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
