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


def cosine_near_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """All (i<j) pairs with cosine similarity ≥ threshold.

    Embedding-cosine near-duplicate detection: the normalized corpus matrix
    is broadcast once (``ray.put``); each task computes its batch's rows ×
    full-matrix similarities with one BLAS matmul and keeps only
    above-threshold pairs with j > i (so every pair is emitted exactly
    once). At corpus sizes beyond broadcast, the scale path is the same
    matmul against IVF/LSH bucket neighbours (see :func:`lsh_topk`).
    """
    import ray

    full = pa.concat_tables(
        b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    ids = np.asarray(full[id_col].to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = _normalize_rows(
        np.asarray(full[emb_col].to_pylist(), dtype=np.float64)[order]
    )
    state = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(state)
        rows = np.asarray(batch["row"].to_pylist(), dtype=np.int64)
        sims = m[rows] @ m.T
        a_out, b_out, c_out = [], [], []
        for local, r in enumerate(rows):
            hit = np.nonzero(sims[local] >= threshold)[0]
            for j in hit:
                if j > r:
                    a_out.append(int(all_ids[r]))
                    b_out.append(int(all_ids[j]))
                    c_out.append(float(sims[local, j]))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "cosine": pa.array(c_out, pa.float64()),
            }
        )

    import ray.data as rd

    rows_ds = rd.from_arrow(
        pa.table({"row": pa.array(np.arange(len(ids)), pa.int64())})
    )
    out = rows_ds.map_batches(pairs, batch_format="pyarrow", batch_size=512)
    return pa.concat_tables(
        b for b in out.iter_batches(batch_size=65536, batch_format="pyarrow")
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
