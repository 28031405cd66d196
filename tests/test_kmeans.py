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


def test_semdedup_drops_within_cluster_only(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.kmeans import semdedup

    # two far-apart cluster centers on axes 0 and 1; ids 0/1 are the seeds
    # (k=2, smallest ids). Rows 2 and 3 duplicate row 0 (same cluster →
    # row 0 kept, 2 and 3 dropped). Row 4 sits NEAR cluster B's center but
    # is cosine-close to row 5 only; row 5 has higher id → dropped.
    a = [1.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0]
    vecs = [
        a,                      # 0: seed A, kept
        b,                      # 1: seed B, kept
        a,                      # 2: dup of 0 → dropped
        [0.999, 0.001, 0.0],    # 3: near-dup of 0 → dropped
        [0.0, 0.9, 0.6],        # 4: cluster B (cos 0.83 to seed), kept
        [0.0, 0.905, 0.59],     # 5: cosine≈1 to 4, same cluster → dropped
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    out = (
        pa.concat_tables(
            semdedup(
                ray.data.from_arrow(tbl).repartition(2), k=2, iters=2, tau=0.95
            ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        )
        .sort_by("vec_id")
    )
    kept = dict(zip(out["vec_id"].to_pylist(), out["kept"].to_pylist()))
    assert kept == {0: True, 1: True, 2: False, 3: False, 4: True, 5: False}
    cl = dict(zip(out["vec_id"].to_pylist(), out["cluster"].to_pylist()))
    assert cl[0] == cl[2] == cl[3]
    assert cl[1] == cl[4] == cl[5]
    assert cl[0] != cl[1]
