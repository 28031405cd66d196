"""kNN self-join and string similarity join vs brute-force references."""

import numpy as np
import pyarrow as pa

from lamapi_ray.functions.text import levenshtein


def test_knn_join_matches_bruteforce(ray_session):
    import ray

    from lamapi_ray.stages.annsearch import knn_join

    rng = np.random.RandomState(7)
    n, d, k = 60, 8, 3
    V = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in V],
                               pa.list_(pa.float32()))}
    )
    out = knn_join(ray.data.from_arrow(tbl), k=k, num_chunks=3)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in out.to_pylist()
    }
    # brute force with the same normalize-then-dot arithmetic
    Vn = V.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    np.fill_diagonal(sims, -np.inf)
    for q in range(n):
        order = np.lexsort((np.arange(n), -sims[q]))[:k]
        for rank, nid in enumerate(order, 1):
            assert got[(q, rank)] == nid, (q, rank)


def test_similarity_self_join_matches_bruteforce(ray_session):
    import ray

    from lamapi_ray.stages.stringjoin import similarity_self_join

    words = [
        "spark", "spork", "sparks", "stork", "joint", "join", "jain",
        "table", "cable", "fable", "12345", "12845", "1234", "xyz",
    ]
    ds = ray.data.from_arrow(
        pa.table({"t": pa.array(words, pa.string())})
    )
    out = similarity_self_join(ds, "t", max_dist=1, min_len=2)
    got = set()
    for r in out.to_arrow_refs():
        t = ray.get(r)
        if t.num_rows:
            got.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    want = {
        (a, b)
        for i, a in enumerate(sorted(words))
        for b in sorted(words)[i + 1:]
        if levenshtein(a, b) <= 1
    }
    assert got == want
