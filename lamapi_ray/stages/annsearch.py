"""Similarity search over an embedding column (``list<float>``).

* :func:`cosine_topk` — exact brute-force baseline: the (small) query
  matrix is broadcast via ``ray.put``; each batch computes a float64
  matmul against it and emits its LOCAL top-k per query; the driver merges
  the per-batch top-k lists (k × #queries × #blocks rows — tiny). The
  corpus streams; nothing corpus-sized is materialized.
* :func:`lsh_topk` — a scale path: 16 seeded random hyperplanes bucket
  both corpus and queries by sign pattern; candidates probe only matching
  buckets (multi-probe over Hamming-1 neighbors), then exact cosine on the
  candidate set.
* :func:`ivf_topk` — the other scale path: inverted-file coarse
  quantization (assign each corpus vector to its nearest centroid, probe
  the queries' ``n_probe`` nearest lists, exact rerank inside probed
  lists). Deterministic centroids make it fully oracle-checkable.
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


def _ids_array(batch: pa.Table, col: str) -> np.ndarray:
    """Int id column → numpy without per-element Python objects."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


_EMPTY_TOPK = pa.table(
    {
        "qi": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "cos": pa.array([], pa.float64()),
    }
)


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
        n = len(batch)
        if n == 0:
            return _EMPTY_TOPK
        ids = _ids_array(batch, id_col)
        m = _normalize_rows(_emb_matrix(batch, vec_col))
        sims = m @ q.T  # (n_batch, n_queries)
        out_q, out_n, out_s = [], [], []
        top = min(k, n)
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            # keep boundary TIES too (col >= kth largest) so local pruning
            # never drops a candidate the (cos DESC, id ASC) merge/oracle
            # would have preferred over an equal-cosine survivor
            sel = (
                np.flatnonzero(col >= np.partition(col, n - top)[n - top])
                if top < n
                else np.arange(n)
            )
            out_q.append(np.full(len(sel), qi, np.int64))
            out_n.append(ids[sel])
            out_s.append(col[sel])
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
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
        if len(batch) == 0:
            return _EMPTY_TOPK
        ids = _ids_array(batch, id_col)
        m = _normalize_rows(_emb_matrix(batch, vec_col))
        sig = (m @ hp_l > 0).astype(np.uint32)
        codes = (sig << np.arange(hp_l.shape[1], dtype=np.uint32)).sum(axis=1)
        out_q, out_n, out_s = [], [], []
        # loop over the (small, Q×(planes+1)-bounded) probe-code set, not
        # over corpus rows: each probe code selects its rows vectorized and
        # scores them in one matmul against the probing queries
        for code, qis in wanted_l.items():
            rows = np.flatnonzero(codes == np.uint32(code))
            if len(rows) == 0:
                continue
            sub = m[rows] @ qn_l[qis].T  # (n_rows, n_probing_queries)
            for t, qi in enumerate(qis):
                out_q.append(np.full(len(rows), qi, np.int64))
                out_n.append(ids[rows])
                out_s.append(sub[:, t])
        if not out_q:
            return _EMPTY_TOPK
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
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


def ivf_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-bucketed approximate top-k: coarse quantize, probe, exact rerank.

    The classic inverted-file ANN layout (Jégou et al., "Product
    quantization for nearest neighbor search", the IVF part): every corpus
    vector is ASSIGNED to its nearest centroid by cosine (tie → smaller
    centroid index); each query PROBES its ``n_probe`` nearest centroids and
    reranks only vectors assigned to a probed list with exact cosine.

    Scale shape: centroids (a few KB–MB) broadcast once via ``ray.put``;
    the corpus streams through one ``map_batches`` that does two dense
    matmuls per batch (assign + query scores) and emits per-batch local
    top-k; the driver merges k × #queries × #blocks rows. At 10⁹ vectors,
    grow ``n_centroids ∝ √n`` so each inverted list stays ~√n — the probed
    fraction (and thus rerank work) drops as n grows, unlike brute force.
    Centroid choice here is deterministic (caller passes them; the bench/
    query wrappers use the first-C corpus vectors) so the DuckDB oracle can
    reproduce assignment and probing relationally.
    """
    qn = _normalize_rows(queries.astype(np.float64))
    cn = _normalize_rows(centroids.astype(np.float64))
    # top-n_probe centroids per query, ties to the smaller centroid index:
    # lexsort on (-sim, idx) gives the engine/SQL-identical probe order.
    q_cent = qn @ cn.T  # (Q, C)
    n_c = cn.shape[0]
    probe = np.zeros((n_c, qn.shape[0]), dtype=bool)  # centroid -> queries
    for qi in range(qn.shape[0]):
        order = np.lexsort((np.arange(n_c), -q_cent[qi]))
        probe[order[: min(n_probe, n_c)], qi] = True
    refs = (ray.put(cn), ray.put(qn), ray.put(probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        cn_l, qn_l, probe_l = (ray.get(r) for r in refs)
        if len(batch) == 0:
            return _EMPTY_TOPK
        ids = _ids_array(batch, id_col)
        m = _normalize_rows(_emb_matrix(batch, vec_col))
        # NB: assignment assumes non-degenerate data — argmax over float64
        # cosines; if a corpus vector is exactly equidistant (to the ulp)
        # from two centroids, engine and oracle could disagree on its
        # inverted list. First-max = smaller centroid index on exact ties.
        assign = np.argmax(m @ cn_l.T, axis=1)
        hit_any = probe_l[assign].any(axis=1)
        if not hit_any.any():
            return _EMPTY_TOPK
        ids = ids[hit_any]
        m = m[hit_any]
        assign = assign[hit_any]
        sims = m @ qn_l.T  # (n_kept, Q)
        out_q, out_n, out_s = [], [], []
        for qi in range(qn_l.shape[0]):
            cand = np.flatnonzero(probe_l[assign, qi])
            nc = len(cand)
            if nc == 0:
                continue
            col = sims[cand, qi]
            top = min(k, nc)
            # keep boundary ties (col >= kth largest) — see cosine_topk
            sel = (
                cand[np.flatnonzero(col >= np.partition(col, nc - top)[nc - top])]
                if top < nc
                else cand
            )
            out_q.append(np.full(len(sel), qi, np.int64))
            out_n.append(ids[sel])
            out_s.append(sims[sel, qi])
        if not out_q:
            return _EMPTY_TOPK
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = corpus.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    merged: dict[int, list] = {}
    for b in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, nid, cos in zip(
            b["qi"].to_pylist(), b["neighbor_id"].to_pylist(), b["cos"].to_pylist()
        ):
            heapq.heappush(merged.setdefault(qi, []), (cos, -nid))
            if len(merged[qi]) > k:
                heapq.heappop(merged[qi])
    rows_q, rows_n, rows_r, rows_c = [], [], [], []
    for qi in sorted(merged):
        ordered = sorted(merged[qi], key=lambda t: (-t[0], -t[1]))
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


_PAIR_TILE = 2048  # rows per matmul tile inside a bucket (bounds peak memory)


def _emit_pairs(
    ids_a: np.ndarray,
    m_a: np.ndarray,
    ids_b: np.ndarray,
    m_b: np.ndarray,
    threshold: float,
    triangle: bool,
    out: list,
    tile: int = _PAIR_TILE,
) -> None:
    """Above-threshold cosine pairs between two (normalized) row blocks,
    tiled so no sim matrix exceeds tile² floats. ``triangle`` means
    a==b and only i<j pairs are wanted."""
    for i0 in range(0, len(ids_a), tile):
        ia = slice(i0, i0 + tile)
        j_start = i0 if triangle else 0
        for j0 in range(j_start, len(ids_b), tile):
            jb = slice(j0, j0 + tile)
            sims = m_a[ia] @ m_b[jb].T
            if triangle and j0 == i0:
                sims[np.tril_indices_from(sims)] = -2.0  # keep strict i<j
            ri, ci = np.nonzero(sims >= threshold)
            if len(ri):
                out.append(
                    (ids_a[ia][ri], ids_b[jb][ci], sims[ri, ci])
                )


def _pack_emb(mn: np.ndarray) -> pa.ListArray:
    n, d = mn.shape
    offsets = np.arange(0, n + 1, dtype=np.int32) * d
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(mn.reshape(-1), pa.float64())
    )


_EMPTY_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def _pairs_table(out: list) -> pa.Table:
    if not out:
        return _EMPTY_PAIRS
    a = np.concatenate([t[0] for t in out])
    b = np.concatenate([t[1] for t in out])
    c = np.concatenate([t[2] for t in out])
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pa.table(
        {
            "id_a": pa.array(lo, pa.int64()),
            "id_b": pa.array(hi, pa.int64()),
            "cosine": pa.array(c, pa.float64()),
        }
    )


def exact_cosine_near_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_chunks: int = 8,
) -> pa.Table:
    """EXACT all-(i<j) pairs with cosine ≥ threshold, distributed via
    chunk-pair blocking: each vector lands in chunk ``c = id mod B`` and is
    replicated to every bucket ``(min(c,j), max(c,j))``; one groupby
    co-locates each chunk pair; bucket (i,i) computes its triangle, bucket
    (i,j) only cross-chunk pairs, so every pair is computed in EXACTLY one
    bucket (no dedup pass). Work is inherently Θ(n²/2) dot products —
    that is the exact contract's price; replication factor is B and
    per-bucket memory is tiled (``_PAIR_TILE``). Scale B ≈
    √(n·d·8 / bucket_bytes) so one bucket's two chunks fit a worker."""
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61

    B = int(num_chunks)

    def replicate(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int32()), "side": pa.array([], pa.int8()),
                 "id": pa.array([], pa.int64()), "emb": pa.array([], pa.list_(pa.float64()))}
            )
        ids = _ids_array(batch, id_col)
        mn = _normalize_rows(_emb_matrix(batch, emb_col))
        # chunk from a mixed hash of the id (plain mod would correlate with
        # any id-assignment pattern)
        h = mulmod61(
            fold_mod61(ids.view(np.uint64)),
            np.full(n, np.uint64(0x9E3779B97F4A7C15 % ((1 << 61) - 1))),
        )
        chunk = (h % np.uint64(B)).astype(np.int64)
        reps_bucket = np.empty(n * B, dtype=np.int32)
        reps_side = np.empty(n * B, dtype=np.int8)
        for j in range(B):
            lo = np.minimum(chunk, j)
            hi = np.maximum(chunk, j)
            reps_bucket[j::B] = (lo * B + hi).astype(np.int32)
            reps_side[j::B] = (chunk > j).astype(np.int8)
        rep_idx = np.repeat(np.arange(n), B)
        return pa.table(
            {
                "bucket": pa.array(reps_bucket, pa.int32()),
                "side": pa.array(reps_side, pa.int8()),
                "id": pa.array(ids[rep_idx], pa.int64()),
                "emb": _pack_emb(mn[rep_idx]),
            }
        )

    rows = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return _EMPTY_PAIRS
        bucket = int(group["bucket"][0].as_py())
        i, j = divmod(bucket, B)
        ids = _ids_array(group, "id")
        m = _emb_matrix(group, "emb")  # already normalized
        side = group["side"].combine_chunks().to_numpy(zero_copy_only=False)
        out: list = []
        if i == j:
            order = np.argsort(ids, kind="stable")
            _emit_pairs(ids[order], m[order], ids[order], m[order],
                        threshold, True, out)
        else:
            a = side == 0  # chunk i rows
            b = ~a
            if a.any() and b.any():
                _emit_pairs(ids[a], m[a], ids[b], m[b], threshold, False, out)
        return _pairs_table(out)

    from lamapi_ray.stages.dedup import scaled_partitions

    pairs = rows.groupby(
        "bucket", num_partitions=scaled_partitions(0.5, 16)
    ).map_groups(bucket_pairs, batch_format="pyarrow")
    tabs = [b for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow")]
    out = pa.concat_tables(tabs) if tabs else _EMPTY_PAIRS
    return out.select(["id_a", "id_b", "cosine"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def auto_planes(n: int) -> int:
    """Sign-LSH code width as a function of corpus size: ≈log₂(n)+8 bits,
    rounded to even (two bands), clamped to [16, 64]. Keeps the expected
    band-bucket size ≈ n / 2^(planes/2) bounded as n grows — at n=10⁹ this
    gives 38 planes → 19-bit bands → ~2k rows per bucket in expectation,
    so within-bucket pair work stays linear-ish instead of Θ(n²/2^planes)."""
    import math

    bits = math.ceil(math.log2(max(n, 2))) + 8
    return int(min(64, max(16, bits + (bits & 1))))


def cosine_near_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    planes: int | None = 16,
    seed: int = 42,
) -> pa.Table:
    """Approximate (high-recall) (i<j) pairs with cosine ≥ threshold —
    sign-LSH bucketed, nothing corpus-sized broadcast or collected. For
    the exact contract use :func:`exact_cosine_near_pairs` (Θ(n²) by
    necessity); this is the sub-quadratic scale path.

    Each vector gets a ``planes``-bit sign code from seeded random
    hyperplanes (constant-size state, regenerated per worker from the
    seed). ``planes=None`` sizes the code from the corpus count
    (:func:`auto_planes`) so buckets stay bounded as n grows. The code
    splits into two bands; a vector is emitted once per band and ONE
    ``groupby(band, band_code)`` co-locates candidates; each bucket runs a
    tiled exact-cosine matmul and keeps above-threshold pairs; a native
    ``Min`` aggregate dedups pairs found in both bands.

    Recall: any pair whose sign codes differ in ≤1 bit (including every
    exact-duplicate vector, code distance 0) agrees on at least one full
    band and is ALWAYS found. Pairs at the threshold whose codes differ in
    ≥2 bits (≥1 per band) can be missed — at threshold 0.999 (≈1.45°
    apart) the per-plane disagreement probability is ~0.008, so misses are
    ~1%% of borderline non-identical pairs at 16 planes (growing with
    plane count — the standard LSH recall/cost trade). Duplicates are
    never missed.
    """
    import ray.data  # noqa: F401
    from ray.data.aggregate import Min

    if planes is None:
        planes = auto_planes(ds.count())
    half = planes // 2

    def code_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "bcode": pa.array([], pa.int64()),
                 "id": pa.array([], pa.int64()), "emb": pa.array([], pa.list_(pa.float64()))}
            )
        m = _emb_matrix(batch, emb_col)
        hp = _hyperplanes(m.shape[1], planes, seed)
        mn = _normalize_rows(m)
        sig = (mn @ hp > 0).astype(np.uint64)
        codes = (sig << np.arange(planes, dtype=np.uint64)).sum(axis=1)
        b0 = (codes & np.uint64((1 << half) - 1)).astype(np.int64)
        b1 = (codes >> np.uint64(half)).astype(np.int64)
        ids = _ids_array(batch, id_col)
        return pa.table(
            {
                "band": pa.array(
                    np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)]),
                    pa.int32(),
                ),
                "bcode": pa.array(np.concatenate([b0, b1]), pa.int64()),
                "id": pa.array(np.concatenate([ids, ids]), pa.int64()),
                "emb": _pack_emb(np.concatenate([mn, mn])),
            }
        )

    rows = ds.map_batches(code_batch, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return _EMPTY_PAIRS
        ids = _ids_array(group, "id")
        m = _emb_matrix(group, "emb")  # already normalized
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        out: list = []
        _emit_pairs(ids, m, ids, m, threshold, True, out)
        return _pairs_table(out)

    from lamapi_ray.stages.dedup import scaled_partitions

    pairs = rows.groupby(
        ["band", "bcode"], num_partitions=scaled_partitions(1.0, 32)
    ).map_groups(bucket_pairs, batch_format="pyarrow")
    agg = pairs.groupby(["id_a", "id_b"], num_partitions=scaled_partitions(0.5, 16)).aggregate(Min("cosine", alias_name="cosine"))
    tabs = [b for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow")]
    out = pa.concat_tables(tabs) if tabs else _EMPTY_PAIRS
    return out.select(["id_a", "id_b", "cosine"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def knn_join(
    ds: "ray.data.Dataset",
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_chunks: int = 4,
) -> pa.Table:
    """Exact kNN SELF-join: every vector's top-k nearest neighbors by
    cosine (ties → smaller neighbor id). → (query_id, neighbor_id, rank,
    cosine·1e-6-rounded).

    Same chunk-pair blocking as :func:`exact_cosine_near_pairs` (each
    chunk pair meets in exactly one bucket), but each bucket emits
    PER-ROW local top-k candidates (boundary ties kept so pruning can
    never drop an id-preferred equal-cosine neighbor) and one grouped
    exchange per query id finishes the global top-k. Work is the exact
    contract's Θ(n²/2); the sub-quadratic scale path is the IVF/LSH
    family above."""
    from lamapi_ray.functions.inthash import fold_mod61, mulmod61
    from lamapi_ray.functions.text import round_ref
    from lamapi_ray.stages.dedup import scaled_partitions

    B = int(num_chunks)

    def replicate(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int32()),
                 "side": pa.array([], pa.int8()),
                 "id": pa.array([], pa.int64()),
                 "emb": pa.array([], pa.list_(pa.float64()))}
            )
        ids = _ids_array(batch, id_col)
        mn = _normalize_rows(_emb_matrix(batch, emb_col))
        h = mulmod61(
            fold_mod61(ids.view(np.uint64)),
            np.full(n, np.uint64(0x9E3779B97F4A7C15 % ((1 << 61) - 1))),
        )
        chunk = (h % np.uint64(B)).astype(np.int64)
        reps_bucket = np.empty(n * B, dtype=np.int32)
        reps_side = np.empty(n * B, dtype=np.int8)
        for j in range(B):
            lo = np.minimum(chunk, j)
            hi = np.maximum(chunk, j)
            reps_bucket[j::B] = (lo * B + hi).astype(np.int32)
            reps_side[j::B] = (chunk > j).astype(np.int8)
        rep_idx = np.repeat(np.arange(n), B)
        return pa.table(
            {
                "bucket": pa.array(reps_bucket, pa.int32()),
                "side": pa.array(reps_side, pa.int8()),
                "id": pa.array(ids[rep_idx], pa.int64()),
                "emb": _pack_emb(mn[rep_idx]),
            }
        )

    rows = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    _EMPTY_CAND = pa.table(
        {"id": pa.array([], pa.int64()),
         "neighbor_id": pa.array([], pa.int64()),
         "cos": pa.array([], pa.float64())}
    )

    def _local_topk(qids, qm, cids, cm, out):
        """top-k (+boundary ties) of every q row against the c rows."""
        if len(cids) == 0 or len(qids) == 0:
            return
        sims = qm @ cm.T  # (nq, nc)
        same = qids[:, None] == cids[None, :]
        sims[same] = -np.inf  # exclude self
        nc = sims.shape[1]
        top = min(k, nc)
        kth = np.partition(sims, nc - top, axis=1)[:, nc - top]
        keep = sims >= kth[:, None]
        qi, ci = np.nonzero(keep)
        out.append((qids[qi], cids[ci], sims[qi, ci]))

    def bucket_topk(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _EMPTY_CAND
        bucket = int(group["bucket"][0].as_py())
        i, j = divmod(bucket, B)
        ids = _ids_array(group, "id")
        m = _emb_matrix(group, "emb")  # normalized
        side = group["side"].combine_chunks().to_numpy(zero_copy_only=False)
        out: list = []
        if i == j:
            _local_topk(ids, m, ids, m, out)
        else:
            a = side == 0
            b = ~a
            _local_topk(ids[a], m[a], ids[b], m[b], out)
            _local_topk(ids[b], m[b], ids[a], m[a], out)
        if not out:
            return _EMPTY_CAND
        q = np.concatenate([o[0] for o in out])
        c = np.concatenate([o[1] for o in out])
        s = np.concatenate([o[2] for o in out])
        ok = np.isfinite(s)
        return pa.table(
            {"id": pa.array(q[ok], pa.int64()),
             "neighbor_id": pa.array(c[ok], pa.int64()),
             "cos": pa.array(s[ok], pa.float64())}
        )

    cand = rows.groupby(
        "bucket", num_partitions=scaled_partitions(0.5, 16)
    ).map_groups(bucket_topk, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        qid = int(group["id"][0].as_py())
        nid = group["neighbor_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cos = group["cos"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -cos))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid), pa.int64()),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
                "cosine": pa.array([round_ref(float(c), 6) for c in cos[order]], pa.float64()),
            }
        )

    out_ds = cand.groupby("id", num_partitions=scaled_partitions(0.5, 16)).map_groups(
        final_topk, batch_format="pyarrow"
    )
    tabs = [b for b in out_ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    out = pa.concat_tables(tabs) if tabs else final_topk(_EMPTY_CAND.rename_columns(["id", "neighbor_id", "cos"]))
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])
