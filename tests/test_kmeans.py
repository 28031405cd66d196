"""Fixed-point k-means (stages/kmeans.py) vs a naive in-memory Lloyd."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.kmeans import Q_SCALE, _assign, kmeans_fixed


def _naive(V, k, iters):
    C = V[:k].copy()
    for _ in range(iters):
        a = _assign(V, C)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = V[m].sum(axis=0) // m.sum()
    return _assign(V, C)


def _ds(ids, vecs):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    )


def test_kmeans_matches_naive_lloyd():
    rng = np.random.default_rng(3)
    raw = rng.normal(size=(200, 8)).astype(np.float32)
    ids = np.arange(200)
    out = (
        pa.concat_tables(
            kmeans_fixed(_ds(ids, raw), k=4, iters=3).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by("vec_id")
        .to_pydict()
    )
    V = np.rint(raw.astype(np.float64) * Q_SCALE).astype(np.int64)
    exp = _naive(V, 4, 3)
    assert out["cluster"] == exp.tolist()


def test_kmeans_separated_clusters_recovered():
    # two tight blobs far apart -> a perfect 2-partition regardless of init
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.01, size=(30, 4)) + 10.0
    b = rng.normal(0, 0.01, size=(30, 4)) - 10.0
    vecs = np.concatenate([a, b]).astype(np.float32)
    out = (
        pa.concat_tables(
            kmeans_fixed(_ds(np.arange(60), vecs), k=2, iters=3).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by("vec_id")
        .to_pydict()
    )
    c = out["cluster"]
    assert len(set(c[:30])) == 1 and len(set(c[30:])) == 1 and c[0] != c[30]


def test_assign_tie_breaks_to_smaller_cid():
    V = np.array([[0, 0]], np.int64)
    C = np.array([[1, 0], [-1, 0]], np.int64)  # equidistant
    assert _assign(V, C).tolist() == [0]
