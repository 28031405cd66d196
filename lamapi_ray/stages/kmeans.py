"""Fixed-point Lloyd's k-means over an embedding column.

The iterative-ML sibling of the IVF coarse quantizer
(stages/annsearch.py::ivf_topk — which uses ONE deterministic assignment;
this runs the full Lloyd loop). Everything is INTEGER arithmetic so the
result is bit-reproducible and exactly oracle-checkable:

* vectors are quantized once to int64 at scale 10^6 with the house
  printf-parity rounding (``np.rint`` ≡ SQL ``printf('%.0f', x·10^6)``);
* assignment = argmin of the exact integer squared distance, ties → the
  smaller centroid id (∥v∥² is constant per vector, so the engine argmins
  ``−2·v·Cᵀ + ∥c∥²`` — same argmin set, one int64 matmul per batch);
* the centroid update is element-wise ``floor(Σ members / count)``; an
  empty cluster keeps its previous centroid.

Float k-means would NOT be checkable this way: distributed partial sums
re-order float additions run to run, so hashes would flicker at rounding
boundaries. Fixed-point buys determinism at a quantization error (1e-6 of
the value scale) far below the cluster geometry.

Dataflow per iteration: centroids broadcast via ``ray.put`` (k×d ints),
ONE streamed pass emits per-batch partial (count, Σvec) per cluster —
k·d·blocks ints cross to the driver, never the corpus. Classic
scatter/partial-combine; identical shape to the training loops of the
distributed-ML literature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

Q_SCALE = 10**6


def _int_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    return np.rint(flat * Q_SCALE).astype(np.int64).reshape(len(arr), -1)


def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ‖v−c‖² with ties → smaller centroid id (int64-exact)."""
    # ‖v‖² is per-row constant: argmin(−2·v·Cᵀ + ‖c‖²) has the same argmin
    # set AND the same tie set as the full distance
    core = -2 * (V @ C.T) + np.sum(C * C, axis=1)[None, :]
    return np.argmin(core, axis=1)  # first minimum = smallest cid on ties


def fit_centroids(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Run ``iters`` Lloyd iterations and return the fitted integer
    fixed-point centroid matrix (k × d) — the shared fit step behind
    :func:`kmeans_fixed` and the SemDeDup cluster stage.

    Init: the ``k`` vectors with the smallest ids (deterministic — the
    seeding the IVF operator uses too)."""

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        V = _int_matrix(batch, vec_col)[order]
        return pa.table(
            {
                "id": pa.array(ids[order]),
                "e": pa.array(list(V), pa.list_(pa.int64())),
            }
        )

    seeds = pa.concat_tables(
        ds.map_batches(seed_partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    sid = seeds["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sid, kind="stable")[:k]
    C = np.stack(
        [np.asarray(seeds["e"][int(i)].as_py(), dtype=np.int64) for i in order]
    )

    d = C.shape[1]
    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table, _c=cref) -> pa.Table:
            Cw = ray.get(_c)
            V = _int_matrix(batch, vec_col)
            a = _assign(V, Cw)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, V)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        parts = pa.concat_tables(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        cid = parts["cid"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = parts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_flat = (
            pc.list_flatten(parts["s"].combine_chunks())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(len(parts), d)
        )
        tot = np.zeros((k, d), np.int64)
        cnt = np.zeros(k, np.int64)
        np.add.at(tot, cid, s_flat)
        np.add.at(cnt, cid, n)
        live = cnt > 0
        C = np.where(
            live[:, None], tot // np.maximum(cnt, 1)[:, None], C
        )  # empty cluster keeps its previous centroid

    return C


def kmeans_fixed(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """→ Dataset (vec_id, cluster) after ``iters`` Lloyd iterations (see
    :func:`fit_centroids` for the fit contract)."""
    C = fit_centroids(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cref = ray.put(C)

    def final_assign(batch: pa.Table, _c=cref) -> pa.Table:
        Cw = ray.get(_c)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a = _assign(_int_matrix(batch, vec_col), Cw)
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(a.astype(np.int64))}
        )

    return ds.map_batches(final_assign, batch_format="pyarrow", zero_copy_batch=True)


def semdedup(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering the embedding space (the fixed-point
    Lloyd's fit above — deterministic, oracle-unrollable) and dropping
    WITHIN-cluster semantic duplicates: a vector is dropped iff some
    lower-id member of its own cluster has cosine ≥ ``tau`` to it (the
    paper's keep-one-per-ε-ball with min-id as the deterministic
    representative choice).

    → Dataset (vec_id, cluster, kept) over every input row.

    Scale shape: the within-cluster pairwise pass is the algorithm's
    contract — SemDeDup works BECAUSE clustering bounds each pairwise
    block to a cluster, so k must scale with the corpus (n/k of a few
    thousand; the paper uses k = 11k for 134M docs). The kernel tiles the
    similarity matmul (rows × cluster) so per-task memory stays
    tile-bounded; assignment + grouping is one broadcast-centroid map and
    ONE cluster-keyed grouped exchange — nothing corpus-sized anywhere.
    """
    from lamapi_ray.stages.annsearch import _emb_matrix, _normalize_rows
    from lamapi_ray.stages.dedup import scaled_partitions

    P = num_partitions or scaled_partitions(0.5, 8)
    C = fit_centroids(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cref = ray.put(C)

    def tag(batch: pa.Table, _c=cref) -> pa.Table:
        Cw = ray.get(_c)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a = _assign(_int_matrix(batch, vec_col), Cw)
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "emb": emb,
            }
        )

    TILE = 1024

    def cluster_kernel(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.bool_()),
                }
            )
        ids = group["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        M = _normalize_rows(_emb_matrix(group, "emb"))[order]
        ids = ids[order]
        kept = np.ones(n, bool)
        # kept[i] ⟺ no LOWER-id row within tau; tiled rows × full cluster
        for lo in range(0, n, TILE):
            hi = min(lo + TILE, n)
            S = M[lo:hi] @ M[:hi].T  # only columns j < hi ever matter
            col = np.arange(hi)
            row = np.arange(lo, hi)[:, None]
            near = (S >= tau) & (col[None, :] < row)
            kept[lo:hi] = ~near.any(axis=1)
        cid = int(group["cluster"][0].as_py())
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(n, cid, np.int64), pa.int64()),
                "kept": pa.array(kept, pa.bool_()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster", num_partitions=min(P, k))
        .map_groups(cluster_kernel, batch_format="pyarrow")
    )
