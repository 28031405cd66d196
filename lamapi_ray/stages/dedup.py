"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has only implicit dedup (SURVEY §2.7); these are the
first-class large-scale training-data operators this engine adds:

* :func:`exact_dedup` — content-hash per batch (vectorized sha1), one
  ``groupby(hash)`` shuffle with native Min/Count aggregates. At 100 TB the
  hash column (20 B/row) is what shuffles, never the text.
* :func:`minhash_clusters` — shingle → 64-perm MinHash → banded LSH.
  Signatures are computed distributed (the scan-heavy part, with a
  per-worker shingle-hash cache); band bucketing, candidate-pair
  verification and union-find run vectorized on the collected
  (id, band-hash) table — 16 small ints per doc, ≈100 B/doc, so the
  driver-side step is bounded by doc COUNT, not corpus bytes (1 GB per
  10^7 docs). Beyond that, swap the pandas bucket groupby for a Ray
  ``groupby(band, bh)`` over the same rows and min-label propagation —
  the signature stage (the dominant cost) is unchanged.
* :func:`simhash_fingerprints` — 64-bit SimHash per doc (pure map, no
  shuffle).
* :func:`ngram_jaccard_pairs` — exact token-shingle Jaccard via a broadcast
  inverted shingle index: each task scans a slice of ids and counts shingle
  collisions against the index (only ids sharing ≥1 shingle are even
  touched), so cost is Σ|bucket|² not n². Use :func:`minhash_clusters` when
  the index outgrows broadcast.
"""

from __future__ import annotations

import hashlib
import struct
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
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
    """64-permutation MinHash over token 3-shingles (state built once)."""

    NUM_PERM = 64

    def __init__(self, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=self.NUM_PERM, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, _MERSENNE, size=self.NUM_PERM, dtype=np.int64).astype(
            np.uint64
        )

    def signature(self, text: str) -> np.ndarray:
        hs = np.array(
            [_hash64_cached(s) for s in set(_token_shingles(text))], dtype=np.uint64
        )
        # (a*h + b) mod p, per permutation — vectorized over shingles
        vals = (hs[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


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
    estimated Jaccard).
    """
    rows_per_band = MinHasher.NUM_PERM // bands

    def to_sigs(batch: pa.Table) -> pa.Table:
        mh = _minhasher()
        ids = batch[id_col].to_pylist()
        sigs = np.stack(
            [mh.signature(t) for t in batch[text_col].to_pylist()]
        ) if ids else np.empty((0, MinHasher.NUM_PERM), dtype=np.uint64)
        # one 64-bit hash per band (md5 of the band's slots), vectorized rows
        bh = {
            f"bh{b}": pa.array(
                [
                    struct.unpack(
                        "<Q",
                        hashlib.md5(
                            sigs[i, b * rows_per_band : (b + 1) * rows_per_band].tobytes()
                        ).digest()[:8],
                    )[0]
                    for i in range(len(ids))
                ],
                pa.uint64(),
            )
            for b in range(bands)
        }
        cols = {"id": pa.array(ids, pa.int64())}
        cols.update(bh)
        cols["sig"] = pa.array([s.tobytes() for s in sigs], pa.binary())
        return pa.table(cols)

    sig_tbl = pa.concat_tables(
        b
        for b in ds.map_batches(
            to_sigs, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    )

    ids = sig_tbl["id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sigs = np.frombuffer(
        b"".join(sig_tbl["sig"].take(pa.array(order)).to_pylist()), dtype=np.uint64
    ).reshape(len(ids), MinHasher.NUM_PERM)

    # banded LSH buckets → candidate pairs (vectorized per band)
    cand: set[tuple[int, int]] = set()
    for b in range(bands):
        bh = sig_tbl[f"bh{b}"].to_numpy(zero_copy_only=False)[order]
        buckets = pd.Series(np.arange(len(ids))).groupby(bh)
        for _, grp in buckets:
            if len(grp) > 1:
                g = grp.to_numpy()
                for x in range(len(g)):
                    for y in range(x + 1, len(g)):
                        cand.add((g[x], g[y]))

    # verify candidates by signature agreement (vectorized compare)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in cand:
        if int((sigs[x] == sigs[y]).sum()) >= threshold_rows:
            a, b2 = int(ids[x]), int(ids[y])
            ra, rb = find(a), find(b2)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    clusters = [find(int(i)) for i in ids]
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "cluster": pa.array(clusters, pa.int64()),
        }
    )


_MINHASHER: list = []


def _minhasher() -> MinHasher:
    if not _MINHASHER:
        _MINHASHER.append(MinHasher())
    return _MINHASHER[0]


def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset."""
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


def simhash_fingerprints(
    ds: ray.data.Dataset, id_col: str, text_col: str
) -> ray.data.Dataset:
    """→ (id, simhash hex string) — pure map stage, no shuffle."""

    def fp(batch: pa.Table) -> pa.Table:
        hashes = [f"{simhash64(t):016x}" for t in batch[text_col].to_pylist()]
        return pa.table({"id": batch[id_col], "simhash": pa.array(hashes, pa.string())})

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(
    table: pa.Table,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 3,
) -> pa.Table:
    """All candidate-pairs token-k-shingle Jaccard ≥ threshold.

    Real Jaccard (union denominator) — unlike the reference's scoring
    functions, this is a training-data op, not a lamAPI-parity op.
    Distributed shape: a shingle→ids inverted index is broadcast once;
    each task scans a slice of left ids and counts shingle collisions via
    the index, so only pairs sharing ≥1 shingle cost anything
    (Σ|bucket|², not n²). Exact — identical output to the brute-force
    all-pairs join.
    """
    import ray

    from lamapi_ray.functions.text import round_ref

    ids = table[id_col].to_pylist()
    shingle_sets = {
        int(i): set(_token_shingles(t, k))
        for i, t in zip(ids, table[text_col].to_pylist())
    }
    index: dict[str, list[int]] = {}
    for i in sorted(shingle_sets):
        for s in shingle_sets[i]:
            index.setdefault(s, []).append(i)
    sizes = {i: len(s) for i, s in shingle_sets.items()}
    state_ref = ray.put((shingle_sets, index, sizes))

    def pairs_for(batch: pa.Table) -> pa.Table:
        sh, idx, sz = ray.get(state_ref)
        a_out, b_out, j_out = [], [], []
        for a in batch["id"].to_pylist():
            inter: Counter = Counter()
            for s in sh[a]:
                for b in idx[s]:
                    if b > a:
                        inter[b] += 1
            na = sz[a]
            for b, n in inter.items():
                jac = n / (na + sz[b] - n)
                if jac >= threshold:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(round_ref(jac, 3))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    ds = ray.data.from_arrow(pa.table({"id": pa.array(sorted(shingle_sets), pa.int64())}))
    out = ds.map_batches(pairs_for, batch_format="pyarrow", batch_size=256)
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_size=65536, batch_format="pyarrow")]
    )


def simhash_near_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    num_rotations: int = 4,
) -> pa.Table:
    """Hamming-close SimHash pairs via rotated prefix buckets.

    Classic Charikar trick: for each of ``num_rotations`` bit-rotations of
    the 64-bit fingerprint, bucket by the top-16-bit prefix — any pair
    within ``max_hamming`` bits collides in at least one rotation with high
    probability (exact for pairs whose differing bits avoid one prefix).
    Candidate pairs are verified by exact Hamming distance. Fingerprints are
    computed distributed (the text-heavy part); bucketing + verification is
    driver-side numpy over the 8-byte/doc fingerprint table — bounded by doc
    count, not corpus bytes; swap for a Ray groupby over (rotation, prefix)
    beyond ~10^8 docs.
    """
    fp_tbl = pa.concat_tables(
        b
        for b in simhash_fingerprints(ds, id_col, text_col).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    ids = np.asarray(fp_tbl["id"].to_pylist(), dtype=np.int64)
    fps = np.array([int(h, 16) for h in fp_tbl["simhash"].to_pylist()], dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, fps = ids[order], fps[order]

    cand: set[tuple[int, int]] = set()
    for r in range(num_rotations):
        rot = ((fps << np.uint64(16 * r)) | (fps >> np.uint64(64 - 16 * r))) if r else fps
        prefix = rot >> np.uint64(48)
        buckets: dict[int, list[int]] = {}
        for i, p in enumerate(prefix):
            buckets.setdefault(int(p), []).append(i)
        for members in buckets.values():
            if len(members) > 1:
                for x in range(len(members)):
                    for y in range(x + 1, len(members)):
                        cand.add((members[x], members[y]))

    a_out, b_out, d_out = [], [], []
    for x, y in sorted(cand):
        d = int(bin(int(fps[x]) ^ int(fps[y])).count("1"))
        if d <= max_hamming:
            a_out.append(int(ids[x]))
            b_out.append(int(ids[y]))
            d_out.append(d)
    return pa.table(
        {
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "hamming": pa.array(d_out, pa.int64()),
        }
    )
