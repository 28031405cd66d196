"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has only implicit dedup (SURVEY §2.7); these are the
first-class large-scale training-data operators this engine adds:

* :func:`exact_dedup` — content-hash per batch (vectorized sha1), one
  ``groupby(hash)`` shuffle, keep min id per group. At 100 TB the hash
  column (20 B/row) is what shuffles, never the text.
* :func:`minhash_clusters` — shingle → 64-perm MinHash → banded LSH:
  signatures per batch (numpy), explode to (band, band_hash, id) rows, ONE
  ``groupby(band, band_hash)`` co-locates collision candidates; candidate
  pairs are verified by signature agreement and connected components are
  resolved by union-find over the (tiny) verified-pair set on the driver —
  documented assumption: #near-dup pairs ≪ #docs (holds for dedup
  workloads; if it breaks, swap the driver union-find for a few rounds of
  min-label propagation via groupby).
* :func:`simhash_fingerprints` — 64-bit SimHash per doc (pure map, no
  shuffle); Hamming-close pairs join on rotated prefix buckets.
* :func:`ngram_jaccard_pairs` — exact token-shingle Jaccard for candidate
  pairs; brute-force all-pairs is exposed for small corpora / verification
  (the LSH path above is the scale path).
"""

from __future__ import annotations

import hashlib
import struct

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


def exact_dedup(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """→ one row per distinct text: (id_col = min id, n_copies)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha1(t.encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: batch[id_col], "__h": pa.array(hashes, pa.string())}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: [group[id_col].min()], "n_copies": [np.int64(len(group))]}
        )

    return hashed.groupby("__h").map_groups(keep_first, batch_format="pandas")


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
            [_hash64(s) for s in set(_token_shingles(text))], dtype=np.uint64
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

    def to_bands(batch: pa.Table) -> pa.Table:
        mh = _minhasher()
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = mh.signature(text)
            sig_hex = sig.tobytes().hex()
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                ids.append(i)
                band_ids.append(b)
                band_hashes.append(hashlib.md5(chunk.tobytes()).hexdigest())
                sigs.append(sig_hex)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "band": pa.array(band_ids, pa.int64()),
                "bh": pa.array(band_hashes, pa.string()),
                "sig": pa.array(sigs, pa.string()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        ids = g["id"].to_numpy()
        sigs = [np.frombuffer(bytes.fromhex(s), dtype=np.uint64) for s in g["sig"]]
        a_out, b_out = [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if int((sigs[x] == sigs[y]).sum()) >= threshold_rows:
                    a_out.append(ids[x])
                    b_out.append(ids[y])
        return pd.DataFrame({"a": a_out, "b": b_out}).astype({"a": "int64", "b": "int64"})

    pairs = (
        banded.groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .count()
        .to_pandas()
    )

    # driver-side union-find over the verified pair set (bounded — see doc)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = [int(x) for x in ds.select_columns([id_col]).to_pandas()[id_col]]
    clusters = [find(i) for i in all_ids]
    return pa.table(
        {
            "id": pa.array(sorted(all_ids), pa.int64()),
            "cluster": pa.array(
                [c for _, c in sorted(zip(all_ids, clusters))], pa.int64()
            ),
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
        h = _hash64(tok)
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
    """All-pairs token-k-shingle Jaccard ≥ threshold (small-corpus/verify path).

    Real Jaccard (union denominator) — unlike the reference's scoring
    functions, this is a training-data op, not a lamAPI-parity op. Runs
    distributed: shingle sets are broadcast, each task handles a slice of
    left ids. O(n²) by design; use :func:`minhash_clusters` at scale.
    """
    import ray

    from lamapi_ray.functions.text import round_ref

    ids = table[id_col].to_pylist()
    shingles = {
        int(i): frozenset(_token_shingles(t, k))
        for i, t in zip(ids, table[text_col].to_pylist())
    }
    sh_ref = ray.put(shingles)

    def pairs_for(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        all_ids = sorted(sh)
        a_out, b_out, j_out = [], [], []
        for a in batch["id"].to_pylist():
            sa = sh[a]
            for b in all_ids:
                if b <= a:
                    continue
                sb = sh[b]
                inter = len(sa & sb)
                if inter == 0:
                    continue
                jac = inter / len(sa | sb)
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

    ds = ray.data.from_arrow(pa.table({"id": pa.array(sorted(shingles), pa.int64())}))
    out = ds.map_batches(pairs_for, batch_format="pyarrow", batch_size=64)
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_size=65536, batch_format="pyarrow")]
    )
