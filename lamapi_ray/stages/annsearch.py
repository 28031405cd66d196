"""Similarity search over an embedding column (``list<float>``).

* :func:`cosine_topk` — exact brute-force baseline: the (small) query
  matrix is broadcast via ``ray.put``; each batch computes a float64
  matmul against it and emits its LOCAL top-k per query; the driver merges
  the per-batch top-k lists (k × #queries × #blocks rows — tiny). The
  corpus streams; nothing corpus-sized is materialized.
* :func:`lsh_topk` — the scale path: 16 seeded random hyperplanes bucket
  both corpus and queries by sign pattern; candidates probe only matching
  buckets (multi-probe over Hamming-1 neighbors), then exact cosine on the
  candidate set. Approximate by construction → rows-only check.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lamapi_ray.functions.text import round_ref


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def cosine_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """→ (query_id, neighbor_id, rank, cosine) exact top-k per query."""
    qn = _normalize_rows(queries.astype(np.float64))
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        sims = m @ q.T  # (n_batch, n_queries)
        out_q, out_n, out_s = [], [], []
        top = min(k, len(ids))
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            sel = np.argpartition(-col, top - 1)[:top] if top < len(ids) else np.arange(len(ids))
            for j in sel:
                out_q.append(qi)
                out_n.append(ids[j])
                out_s.append(col[j])
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_s, pa.float64()),
            }
        )

    partial = corpus.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    merged: dict[int, list] = {}
    for b in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, nid, cos in zip(
            b["qi"].to_pylist(), b["neighbor_id"].to_pylist(), b["cos"].to_pylist()
        ):
            # heap keyed by (cos, -neighbor_id): ties broken to smaller id
            heapq.heappush(merged.setdefault(qi, []), (cos, -nid))
            if len(merged[qi]) > k:
                heapq.heappop(merged[qi])
    rows_q, rows_n, rows_r, rows_c = [], [], [], []
    for qi, heap in merged.items():
        ordered = sorted(heap, key=lambda t: (-t[0], -t[1]))
        for rank, (cos, neg_nid) in enumerate(ordered, 1):
            rows_q.append(int(query_ids[qi]))
            rows_n.append(-neg_nid)
            rows_r.append(rank)
            rows_c.append(round_ref(cos, 6))
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "cosine": pa.array(rows_c, pa.float64()),
        }
    )


def lsh_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k via sign-LSH bucketing + exact rerank of candidates."""
    dim = queries.shape[1]
    rng = np.random.RandomState(seed)
    hp = rng.standard_normal((dim, planes))
    qn = _normalize_rows(queries.astype(np.float64))
    q_sig = (qn @ hp > 0).astype(np.uint32)
    q_codes = (q_sig << np.arange(planes, dtype=np.uint32)).sum(axis=1)
    # multi-probe: exact bucket + all Hamming-1 neighbors per query
    probe_sets = []
    for code in q_codes:
        probes = {int(code)}
        for b in range(planes):
            probes.add(int(code) ^ (1 << b))
        probe_sets.append(probes)
    wanted: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_sets):
        for p in probes:
            wanted.setdefault(p, []).append(qi)
    refs = (ray.put(hp), ray.put(qn), ray.put(wanted))

    def candidates(batch: pa.Table) -> pa.Table:
        hp_l, qn_l, wanted_l = (ray.get(r) for r in refs)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        sig = (m @ hp_l > 0).astype(np.uint32)
        codes = (sig << np.arange(hp_l.shape[1], dtype=np.uint32)).sum(axis=1)
        out_q, out_n, out_s = [], [], []
        for j, code in enumerate(codes):
            for qi in wanted_l.get(int(code), ()):
                out_q.append(qi)
                out_n.append(ids[j])
                out_s.append(float(m[j] @ qn_l[qi]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_s, pa.float64()),
            }
        )

    partial = corpus.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)
    merged: dict[int, list] = {}
    for b in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, nid, cos in zip(
            b["qi"].to_pylist(), b["neighbor_id"].to_pylist(), b["cos"].to_pylist()
        ):
            heapq.heappush(merged.setdefault(qi, []), (cos, -nid))
            if len(merged[qi]) > k:
                heapq.heappop(merged[qi])
    rows_q, rows_n, rows_r = [], [], []
    for qi in sorted(merged):
        ordered = sorted(merged[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (_, neg_nid) in enumerate(ordered, 1):
            rows_q.append(int(query_ids[qi]))
            rows_n.append(-neg_nid)
            rows_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
        }
    )


_PLANE_CACHE: dict = {}


def _hyperplanes(dim: int, planes: int, seed: int) -> np.ndarray:
    key = (dim, planes, seed)
    hp = _PLANE_CACHE.get(key)
    if hp is None:
        hp = np.random.RandomState(seed).standard_normal((dim, planes))
        _PLANE_CACHE[key] = hp
    return hp


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1).astype(np.float64)


def cosine_near_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    planes: int = 16,
    seed: int = 42,
) -> pa.Table:
    """All (i<j) pairs with cosine similarity ≥ threshold — sign-LSH
    bucketed, nothing corpus-sized broadcast or collected.

    Each vector gets a 16-bit sign code from seeded random hyperplanes
    (constant-size state, regenerated per worker from the seed). The code
    splits into two 8-bit bands; a vector is emitted once per band and ONE
    ``groupby(band, band_code)`` co-locates candidates; each bucket runs an
    exact-cosine matmul and keeps above-threshold pairs; a native ``Min``
    aggregate dedups pairs found in both bands.

    Recall guarantee: any pair whose sign codes differ in ≤1 bit (which
    includes every exact-duplicate vector, code distance 0) agrees on at
    least one full band and is always found. Pairs at the threshold whose
    codes differ in ≥2 bits can be missed — at 0.999 (≈1.45° apart) the
    per-plane disagreement probability is ~0.008, so ≥2-bit misses are
    ~1%% of borderline non-identical pairs; duplicates are never missed.
    """
    import ray.data  # noqa: F401
    from ray.data.aggregate import Min

    def code_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "bcode": pa.array([], pa.int32()),
                 "id": pa.array([], pa.int64()), "emb": pa.array([], pa.list_(pa.float64()))}
            )
        m = _emb_matrix(batch, emb_col)
        hp = _hyperplanes(m.shape[1], planes, seed)
        mn = _normalize_rows(m)
        sig = (mn @ hp > 0).astype(np.uint32)
        codes = (sig << np.arange(planes, dtype=np.uint32)).sum(axis=1)
        half = planes // 2
        b0 = (codes & ((1 << half) - 1)).astype(np.int32)
        b1 = (codes >> half).astype(np.int32)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        flat = np.concatenate([mn.reshape(-1), mn.reshape(-1)])
        offsets = np.arange(0, 2 * n + 1, dtype=np.int32) * m.shape[1]
        emb_col_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.float64())
        )
        return pa.table(
            {
                "band": pa.array(
                    np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)]),
                    pa.int32(),
                ),
                "bcode": pa.array(np.concatenate([b0, b1]), pa.int32()),
                "id": pa.array(np.concatenate([ids, ids]), pa.int64()),
                "emb": emb_col_arr,
            }
        )

    rows = ds.map_batches(code_batch, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = np.asarray(group["id"].to_pylist(), dtype=np.int64)
        m = _emb_matrix(group, "emb")  # already normalized
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        sims = m @ m.T
        iu = np.triu_indices(g, k=1)
        ok = sims[iu] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[0][ok]], pa.int64()),
                "id_b": pa.array(ids[iu[1][ok]], pa.int64()),
                "cosine": pa.array(sims[iu][ok], pa.float64()),
            }
        )

    pairs = rows.groupby(["band", "bcode"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    agg = pairs.groupby(["id_a", "id_b"]).aggregate(Min("cosine", alias_name="cosine"))
    out = pa.concat_tables(
        b for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    return out.select(["id_a", "id_b", "cosine"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )
