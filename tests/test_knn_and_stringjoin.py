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


def test_ppjoin_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.stringjoin import ppjoin

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for d in range(80):
        base = rng.choice(60, size=rng.integers(6, 14), replace=False)
        docs.append(" ".join(vocab[i] for i in base))
        if d % 4 == 0:  # planted near-dup: drop one token, add one
            toks = docs[-1].split()
            toks[rng.integers(0, len(toks))] = vocab[rng.integers(0, 60)]
            docs.append(" ".join(toks))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = pa.concat_tables(
        ppjoin(
            ray.data.from_arrow(tbl).repartition(4), tau_num=3, tau_den=5
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared"], r["size_a"], r["size_b"])
        for r in out.to_pylist()
    }
    sets = [set(t.split()) for t in docs]
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sh = len(sets[a] & sets[b])
            if sh * 8 >= 3 * (len(sets[a]) + len(sets[b])):
                want[(a, b)] = (sh, len(sets[a]), len(sets[b]))
    assert got == want and len(want) > 0


def test_similarity_cross_join_matches_naive(ray_session):
    import pyarrow as pa
    import ray.data

    from lamapi_ray.functions.text import levenshtein
    from lamapi_ray.stages.stringjoin import similarity_cross_join

    left = [("l0", "alpha"), ("l1", "alphb"), ("l2", "gamma"), ("l3", "x")]
    right = [("r0", "alpha"), ("r1", "gamm"), ("r2", "delta"), ("r3", "alpha")]
    lt = pa.table(
        {"entity": pa.array([i for i, _ in left], pa.string()),
         "label": pa.array([v for _, v in left], pa.string())}
    )
    rt = pa.table(
        {"entity": pa.array([i for i, _ in right], pa.string()),
         "label": pa.array([v for _, v in right], pa.string())}
    )
    out = pa.concat_tables(
        similarity_cross_join(
            ray.data.from_arrow(lt).repartition(2),
            ray.data.from_arrow(rt).repartition(2),
            "entity", "label", "entity", "label", max_dist=1,
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )
    got = sorted(
        zip(out["lid"].to_pylist(), out["rid"].to_pylist(), out["dist"].to_pylist())
    )
    want = sorted(
        (li, ri, levenshtein(lv, rv))
        for li, lv in left
        for ri, rv in right
        if len(lv) >= 2 and len(rv) >= 2 and levenshtein(lv, rv) <= 1
    )
    assert got == want
    # "l3" ("x") is below min_len and pairs with nothing
    assert not [g for g in got if g[0] == "l3"]


def test_ed1_kernel_matches_dp_on_random_pairs():
    import numpy as np

    from lamapi_ray.functions.text import levenshtein
    from lamapi_ray.stages.stringjoin import _byte_matrix, _ed1_dists

    rng = np.random.default_rng(3)
    alph = "abcd"

    def rnd(n):
        return "".join(rng.choice(list(alph)) for _ in range(n))

    L, R = [], []
    for _ in range(400):
        s = rnd(int(rng.integers(1, 12)))
        L.append(s)
        op = rng.integers(0, 5)
        t = list(s)
        if op == 1 and len(t):
            t[rng.integers(0, len(t))] = rng.choice(list(alph))
        elif op == 2:
            t.insert(int(rng.integers(0, len(t) + 1)), str(rng.choice(list(alph))))
        elif op == 3 and len(t) > 1:
            del t[rng.integers(0, len(t))]
        elif op == 4:
            t = list(rnd(int(rng.integers(1, 12))))
        R.append("".join(t))
    llen = np.array([len(s) for s in L])
    rlen = np.array([len(s) for s in R])
    W = max(llen.max(), rlen.max()) + 1
    lm = _byte_matrix(L, W)
    rm = _byte_matrix(R, W)
    idx = np.arange(len(L))
    keep = np.abs(llen - rlen) <= 1
    d = _ed1_dists(lm, llen, rm, rlen, idx[keep], idx[keep])
    for k, i in enumerate(idx[keep]):
        true = levenshtein(L[i], R[i])
        assert int(d[k]) == (true if true <= 1 else 2), (L[i], R[i])
