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
    agg = hashed.groupby("__h").aggregate(Min(id_col), Count())

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[f"min({id_col})"],
                "n_copies": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


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
        hs = np.array(
            [_hash64_cached(s) & 0xFFFFFFFF for s in set(_token_shingles(text))],
            dtype=np.uint64,
        )
        vals = (hs[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


_MINHASHER: list = []


def _minhasher() -> MinHasher:
    if not _MINHASHER:
        _MINHASHER.append(MinHasher())
    return _MINHASHER[0]


def _signatures_batch(batch: pa.Table, id_col: str, text_col: str, bands: int) -> pa.Table:
    """→ (id, sig binary, sd signature-digest, bh0..bh{bands-1}).

    Vectorized across the batch: one (total_shingles × 64) permutation
    matrix + a per-doc segmented ``np.minimum.reduceat`` — identical values
    to the scalar :meth:`MinHasher.signature` (min over the same set)."""
    mh = _minhasher()
    rows_per_band = MinHasher.NUM_PERM // bands
    ids = batch[id_col].to_pylist()
    if ids:
        sh_flat: list[int] = []
        doc_starts: list[int] = []
        for t in batch[text_col].to_pylist():
            doc_starts.append(len(sh_flat))
            sh_flat.extend(
                _hash64_cached(sv) & 0xFFFFFFFF for sv in set(_token_shingles(t))
            )
        hs = np.asarray(sh_flat, dtype=np.uint64)
        vals = (hs[:, None] * mh.a[None, :] + mh.b[None, :]) % _MERSENNE
        sigs = np.minimum.reduceat(vals, np.asarray(doc_starts, dtype=np.int64), axis=0)
    else:
        sigs = np.empty((0, MinHasher.NUM_PERM), dtype=np.uint64)
    cols: dict = {"id": pa.array(ids, pa.int64())}
    cols["sig"] = pa.array([s.tobytes() for s in sigs], pa.binary())
    cols["sd"] = pa.array(
        [
            struct.unpack("<q", hashlib.md5(s.tobytes()).digest()[:8])[0]
            for s in sigs
        ],
        pa.int64(),
    )
    for b in range(bands):
        cols[f"bh{b}"] = pa.array(
            [
                struct.unpack(
                    "<q",
                    hashlib.md5(
                        sigs[i, b * rows_per_band : (b + 1) * rows_per_band].tobytes()
                    ).digest()[:8],
                )[0]
                for i in range(len(ids))
            ],
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


def _min_label_components(
    nodes: ray.data.Dataset, edges: ray.data.Dataset, max_iters: int = 64
) -> ray.data.Dataset:
    """Distributed connected components: min-label propagation to fixpoint.

    ``nodes``: one column ``node`` (int64). ``edges``: ``id_a``/``id_b``.
    Both the label table and the (bidirectional) edge list are partitioned
    by ``hash(node) % P`` once; each iteration is then exactly TWO grouped
    exchanges — (1) co-group labels with edges per partition and send each
    node's label to its neighbors (vectorized ``searchsorted`` lookup, no
    generic join), (2) take the min candidate per node (vectorized
    ``minimum.reduceat``). Convergence: the label sum is strictly
    decreasing until fixpoint, so one cheap ``sum`` aggregate per iteration
    detects it. Iterations are bounded by the largest component diameter
    (near-dup clusters are shallow). Block counts stay pinned at P — no
    per-iteration lineage or block growth."""
    P = 16
    MULT = np.uint64(0x9E3779B97F4A7C15)

    def _pkey(arr: np.ndarray) -> np.ndarray:
        return ((arr.view(np.uint64) * MULT) % np.uint64(P)).astype(np.int64)

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch["id_a"]
        b = batch["id_b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        node = np.concatenate(
            [a.cast(pa.int64()).to_numpy(zero_copy_only=False),
             b.cast(pa.int64()).to_numpy(zero_copy_only=False)]
        )
        nbr = np.concatenate(
            [b.cast(pa.int64()).to_numpy(zero_copy_only=False),
             a.cast(pa.int64()).to_numpy(zero_copy_only=False)]
        )
        return pa.table(
            {
                "pkey": pa.array(_pkey(node), pa.int64()),
                "node": pa.array(node, pa.int64()),
                "nbr": pa.array(nbr, pa.int64()),
                "label": pa.nulls(len(node), pa.int64()),
            }
        )

    edges_dir = (
        edges.map_batches(to_directed, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )

    def init_labels(batch: pa.Table) -> pa.Table:
        node = batch["node"]
        if isinstance(node, pa.ChunkedArray):
            node = node.combine_chunks()
        nn = node.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pkey": pa.array(_pkey(nn), pa.int64()),
                "node": pa.array(nn, pa.int64()),
                "nbr": pa.nulls(len(nn), pa.int64()),
                "label": pa.array(nn, pa.int64()),
            }
        )

    labels = nodes.map_batches(init_labels, batch_format="pyarrow").repartition(
        P
    ).materialize()
    prev_sum = labels.sum("label")

    def send(group: pa.Table) -> pa.Table:
        """One partition: label rows + edge rows for the same node set.
        Emit (dst, cand) — each node keeps its label, neighbors get it."""
        node = np.asarray(group["node"].to_pylist(), dtype=np.int64)
        nbr_col = group["nbr"]
        if isinstance(nbr_col, pa.ChunkedArray):
            nbr_col = nbr_col.combine_chunks()
        is_label = pc.is_valid(group["label"]).to_numpy(zero_copy_only=False)
        lab_nodes = node[is_label]
        lab_vals = np.asarray(
            group.filter(pa.array(is_label))["label"].to_pylist(), dtype=np.int64
        )
        order = np.argsort(lab_nodes, kind="stable")
        lab_nodes, lab_vals = lab_nodes[order], lab_vals[order]
        e_nodes = node[~is_label]
        e_nbrs = np.asarray(
            group.filter(pa.array(~is_label))["nbr"].to_pylist(), dtype=np.int64
        )
        pos = np.searchsorted(lab_nodes, e_nodes)
        e_lab = lab_vals[pos]
        dst = np.concatenate([lab_nodes, e_nbrs])
        cand = np.concatenate([lab_vals, e_lab])
        return pa.table(
            {
                "pkey": pa.array(_pkey(dst), pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "cand": pa.array(cand, pa.int64()),
            }
        )

    def reduce_min(group: pa.Table) -> pa.Table:
        dst = np.asarray(group["dst"].to_pylist(), dtype=np.int64)
        cand = np.asarray(group["cand"].to_pylist(), dtype=np.int64)
        order = np.lexsort((cand, dst))
        dst, cand = dst[order], cand[order]
        starts, _ = _run_bounds([dst])
        nodes_u = dst[starts]
        labels_u = np.minimum.reduceat(cand, starts)
        return pa.table(
            {
                "pkey": pa.array(_pkey(nodes_u), pa.int64()),
                "node": pa.array(nodes_u, pa.int64()),
                "nbr": pa.nulls(len(nodes_u), pa.int64()),
                "label": pa.array(labels_u, pa.int64()),
            }
        )

    for _ in range(max_iters):
        msgs = labels.union(edges_dir).groupby("pkey").map_groups(
            send, batch_format="pyarrow"
        )
        labels = msgs.groupby("pkey").map_groups(
            reduce_min, batch_format="pyarrow"
        ).materialize()
        new_sum = labels.sum("label")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select_columns(["node", "label"])


def minhash_clusters(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    bands: int = 16,
    threshold_rows: int = 48,
) -> pa.Table:
    """→ (id, cluster) for every doc; cluster = min id of its component.

    ``threshold_rows``: minimum number of agreeing signature slots (of 64)
    for a candidate pair to be verified as a near-duplicate (48/64 = 0.75
    estimated Jaccard; 64 ≡ exact signature equality).

    Fully distributed: see module docstring for the dataflow. The only
    driver-side work is the final (id, cluster) collect, which callers at
    scale replace with ``write_parquet``."""
    from ray.data.aggregate import Count

    sig_ds = ds.map_batches(
        _signatures_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "bands": bands},
    ).materialize()

    num_partitions = 64

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch["id"].combine_chunks() if isinstance(batch["id"], pa.ChunkedArray) else batch["id"]
        sds = batch["sd"].combine_chunks() if isinstance(batch["sd"], pa.ChunkedArray) else batch["sd"]
        bcols, icols, scols, hcols = [], [], [], []
        for b in range(bands):
            bh = batch[f"bh{b}"]
            if isinstance(bh, pa.ChunkedArray):
                bh = bh.combine_chunks()
            bcols.append(pa.array(np.full(n, b, dtype=np.int32), pa.int32()))
            icols.append(ids)
            scols.append(sds)
            hcols.append(bh)
        bh_all = pa.concat_arrays(hcols)
        band_all = pa.concat_arrays(bcols)
        # coarse partition key: a Ray group per (band, bh) bucket would mean
        # millions of tiny map_groups calls; instead ~64 partitions shuffle
        # and buckets are recovered IN-PROCESS by sorting (run detection)
        pkey = (
            bh_all.to_numpy(zero_copy_only=False).view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + band_all.to_numpy(zero_copy_only=False).astype(np.uint64)
        ) % np.uint64(num_partitions)
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "band": band_all,
                "bh": bh_all,
                "id": pa.concat_arrays(icols),
                "sd": pa.concat_arrays(scols),
            }
        )

    band_rows = sig_ds.drop_columns(["sig"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )

    def partition_edges(group: pa.Table) -> pa.Table:
        """One coarse partition: recover (band, bh) buckets by sorting,
        emit star edges per identical-signature run (vectorized) and
        rep pairs between signature groups of a bucket (vectorized by
        run length)."""
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "sure": pa.array([], pa.bool_())}
        )
        if len(group) < 2:
            return empty
        band = np.asarray(group["band"].to_pylist(), dtype=np.int64)
        bh = np.asarray(group["bh"].to_pylist(), dtype=np.int64)
        ids = np.asarray(group["id"].to_pylist(), dtype=np.int64)
        sds = np.asarray(group["sd"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, sds, bh, band))
        band, bh, ids, sds = band[order], bh[order], ids[order], sds[order]
        sd_starts, sd_lens = _run_bounds([band, bh, sds])
        # star edges: every non-first member of an sd-run → the run's min id
        is_start = np.zeros(len(ids), dtype=bool)
        is_start[sd_starts] = True
        run_id = np.cumsum(is_start) - 1
        star_b = ids[~is_start]
        star_a = ids[sd_starts][run_id[~is_start]]
        # rep pairs: sd-run representatives pairwise within each (band, bh)
        rep_ids = ids[sd_starts]
        rep_band, rep_bh = band[sd_starts], bh[sd_starts]
        bk_starts, bk_lens = _run_bounds([rep_band, rep_bh])
        ra_list, rb_list = [star_a], [star_b]
        sure_list = [np.ones(len(star_a), dtype=bool)]
        for ia, ib in _pairs_in_runs(bk_starts, bk_lens):
            a, b = rep_ids[ia], rep_ids[ib]
            ra_list.append(np.minimum(a, b))
            rb_list.append(np.maximum(a, b))
            sure_list.append(np.zeros(len(a), dtype=bool))
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(ra_list), pa.int64()),
                "id_b": pa.array(np.concatenate(rb_list), pa.int64()),
                "sure": pa.array(np.concatenate(sure_list), pa.bool_()),
            }
        )

    all_edges = band_rows.groupby("pkey").map_groups(
        partition_edges, batch_format="pyarrow"
    ).materialize()

    # ONE dedup pass over all emitted edges: a pair that is "sure" in any
    # band (identical signatures there ⇒ identical everywhere) stays sure
    from ray.data.aggregate import Max

    edge_agg = (
        all_edges.map_batches(
            lambda t: pa.table(
                {
                    "id_a": t["id_a"],
                    "id_b": t["id_b"],
                    "sure": t["sure"].cast(pa.int64())
                    if not isinstance(t["sure"], pa.ChunkedArray)
                    else t["sure"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["id_a", "id_b"])
        .aggregate(Max("sure", alias_name="sure"))
        .materialize()
    )

    def _split(sure_flag: bool):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch["sure"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mask = pc.equal(col, 1 if sure_flag else 0)
            return batch.filter(mask).select(["id_a", "id_b"])

        return fn

    sure_edges = edge_agg.map_batches(_split(True), batch_format="pyarrow").materialize()

    if threshold_rows >= MinHasher.NUM_PERM:
        # full agreement ≡ signature equality ≡ same sd → rep pairs with
        # different sd can never verify; skip verification entirely
        edges = sure_edges
    else:
        unsure = edge_agg.map_batches(_split(False), batch_format="pyarrow")
        P = 16
        MULT = np.uint64(0x9E3779B97F4A7C15)

        def _pk(arr: np.ndarray) -> np.ndarray:
            return ((arr.view(np.uint64) * MULT) % np.uint64(P)).astype(np.int64)

        # cogroup verify, two shuffles, no generic join: pair halves and
        # signature rows meet in hash(id) partitions (searchsorted lookup),
        # then halves meet in hash(pair) partitions for the agreement test
        def pair_halves(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["id_a"].to_pylist(), dtype=np.int64)
            b = np.asarray(batch["id_b"].to_pylist(), dtype=np.int64)
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
            ids = np.asarray(batch["id"].to_pylist(), dtype=np.int64)
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
            keys = np.asarray(group["key"].to_pylist(), dtype=np.int64)
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
            pos = np.searchsorted(s_keys, h_key)
            ha = np.asarray(halves["id_a"].to_pylist(), dtype=np.int64)
            hb = np.asarray(halves["id_b"].to_pylist(), dtype=np.int64)
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
            a = np.asarray(group["id_a"].to_pylist(), dtype=np.int64)
            b = np.asarray(group["id_b"].to_pylist(), dtype=np.int64)
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

        verified = (
            both.groupby("pkey")
            .map_groups(attach_sig, batch_format="pyarrow")
            .groupby("ppkey")
            .map_groups(verify_pairs, batch_format="pyarrow")
            .materialize()
        )
        edges = sure_edges.union(verified)

    nodes = sig_ds.select_columns(["id"]).map_batches(
        lambda t: pa.table({"node": t["id"]}), batch_format="pyarrow"
    )
    labels = _min_label_components(nodes, edges)
    out = _collect(
        labels.map_batches(
            lambda t: pa.table({"id": t["node"], "cluster": t["label"]}),
            batch_format="pyarrow",
        )
    )
    return out.sort_by("id")


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
    """Hamming-close SimHash pairs via rotated prefix buckets — distributed.

    Classic Charikar trick: for each of ``num_rotations`` bit-rotations of
    the 64-bit fingerprint, bucket by the top-16-bit prefix — any pair
    within ``max_hamming`` bits collides in at least one rotation with high
    probability. Fingerprints stream; (rotation, prefix) rows shuffle
    through ONE ``groupby``; each bucket verifies with a vectorized
    XOR-popcount. Pair dedup is a native Min aggregate."""
    from ray.data.aggregate import Min

    fp_ds = simhash_fingerprints(ds, id_col, text_col)

    num_partitions = 64

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = np.asarray(batch["id"].to_pylist(), dtype=np.int64)
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
        rot = np.asarray(group["rot"].to_pylist(), dtype=np.int64)
        pre = np.asarray(group["prefix"].to_pylist(), dtype=np.int64)
        ids = np.asarray(group["id"].to_pylist(), dtype=np.int64)
        fps = np.asarray(group["fp"].to_pylist(), dtype=np.int64).view(np.uint64)
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

    pairs = rows.groupby("pkey").map_groups(
        partition_pairs, batch_format="pyarrow"
    )
    agg = pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))
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
    ≥1 shingle are touched) — identical output to the brute-force
    all-pairs join."""
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)

    num_partitions = 64

    def explode(batch: pa.Table) -> pa.Table:
        sh_out, id_out, n_out = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            hs = {_hash64_cached(s) for s in _token_shingles(t, k)}
            sh_out.extend(np.int64(h & 0x7FFFFFFFFFFFFFFF) for h in hs)
            id_out.extend([i] * len(hs))
            n_out.extend([len(hs)] * len(hs))
        sh_np = np.asarray(sh_out, dtype=np.int64)
        # coarse partition key — shingle buckets are recovered in-process by
        # sorting; a Ray group per shingle would be millions of tiny calls
        pkey = (sh_np.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            num_partitions
        )
        return pa.table(
            {
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
                "sh": pa.array(sh_np, pa.int64()),
                "id": pa.array(id_out, pa.int64()),
                "nsh": pa.array(n_out, pa.int64()),
            }
        )

    sh_rows = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64())}
        )
        if len(group) < 2:
            return empty
        sh = np.asarray(group["sh"].to_pylist(), dtype=np.int64)
        ids = np.asarray(group["id"].to_pylist(), dtype=np.int64)
        ns = np.asarray(group["nsh"].to_pylist(), dtype=np.int64)
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

    pairs = sh_rows.groupby("pkey").map_groups(partition_pairs, batch_format="pyarrow")

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
        a = np.asarray(group["id_a"].to_pylist(), dtype=np.int64)
        b = np.asarray(group["id_b"].to_pylist(), dtype=np.int64)
        na = np.asarray(group["na"].to_pylist(), dtype=np.float64)
        nb = np.asarray(group["nb"].to_pylist(), dtype=np.float64)
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
        .groupby("ppkey")
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
