"""Feature-hash embedding tests — hash/dim/sign math, long-format shape."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.dedup import _hash64
from lamapi_ray.stages.embed import hash_embed


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _collect(ds):
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
             "value": pa.array([], pa.int64())}
        )
    return pa.concat_tables(batches).sort_by(
        [("doc_id", "ascending"), ("dim", "ascending")]
    )


def _expect(text, dims=16):
    v = np.zeros(dims, dtype=np.int64)
    for t in text.split(" "):
        h = _hash64(t)
        v[h % dims] += 1 if (h >> 4) & 1 == 0 else -1
    return v


def test_matches_closed_form():
    rows = [(0, "alpha beta gamma alpha"), (1, "delta"), (2, "x y z w v")]
    out = _collect(hash_embed(_docs(rows), dims=16))
    for doc_id, text in rows:
        v = _expect(text)
        got = out.filter(pa.compute.equal(out["doc_id"], doc_id))
        gmap = dict(zip(got["dim"].to_pylist(), got["value"].to_pylist()))
        for d in range(16):
            assert gmap.get(d, 0) == v[d], (doc_id, d)


def test_repeated_tokens_accumulate():
    out = _collect(hash_embed(_docs([(0, "tok tok tok")]), dims=16))
    assert len(out) == 1
    assert abs(out["value"][0].as_py()) == 3


def test_zero_dims_omitted():
    # two tokens hashing to the same dim with opposite signs cancel → find
    # such a pair by search, then assert the dim is absent
    import itertools
    import string

    pair = None
    seen = {}
    for name in itertools.product(string.ascii_lowercase, repeat=3):
        t = "".join(name)
        h = _hash64(t)
        key = h % 16
        sgn = 1 if (h >> 4) & 1 == 0 else -1
        if (key, -sgn) in seen:
            pair = (seen[(key, -sgn)], t)
            break
        seen.setdefault((key, sgn), t)
    a, b = pair
    out = _collect(hash_embed(_docs([(0, f"{a} {b}")]), dims=16))
    assert len(out) == 0  # the single touched dim cancelled to zero


def test_embedding_standardize_matches_numpy(ray_session):
    """Per-dim quantized stats vs a direct numpy computation."""
    import math

    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import embedding_standardize

    out = embedding_standardize("/root/testdata/sf0.001")
    tbl = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    )
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(emb * 1_000_000).astype(np.int64)
    assert out["n"].to_pylist() == [emb.shape[0]] * emb.shape[1]
    assert out["sum_q"].to_pylist() == q.sum(axis=0).tolist()
    assert out["sumsq_q"].to_pylist() == (q * q).sum(axis=0).tolist()
    for d in range(emb.shape[1]):
        m = q[:, d].sum() / emb.shape[0] / 1e6
        assert abs(out["mean"][d].as_py() - m) < 1e-6
        var = (q[:, d] * q[:, d]).sum() / emb.shape[0] - (
            q[:, d].sum() / emb.shape[0]
        ) ** 2
        s = math.sqrt(var) / 1e6 if var > 0 else 0.0
        assert abs(out["std"][d].as_py() - s) < 1e-6


def test_embedding_covariance_matches_numpy(ray_session):
    """Upper-triangle covariance vs a direct numpy computation on the
    quantized matrix (population covariance, milli-unit scale)."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import embedding_covariance

    out = embedding_covariance("/root/testdata/sf0.001")
    tbl = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    )
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(emb * 1000).astype(np.int64)
    d = q.shape[1]
    assert out.num_rows == d * (d + 1) // 2
    g = q.T @ q
    m = q.shape[0]
    for r in range(0, out.num_rows, 97):  # sample rows
        i = out["dim_i"][r].as_py()
        j = out["dim_j"][r].as_py()
        assert out["sum_ij"][r].as_py() == int(g[i, j])
        want = (g[i, j] / m - (q[:, i].sum() / m) * (q[:, j].sum() / m)) / 1e6
        assert abs(out["cov"][r].as_py() - want) < 1e-6


def test_mi_feature_ranking_crafted(ray_session, tmp_path):
    """A dim perfectly predictive of the label must out-rank a constant
    dim (MI 0) — crafted 2-dim embeddings."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import mi_feature_ranking

    n = 200
    lab = np.arange(n, dtype=np.int64) % 2
    # dim 0 encodes the label exactly (bins -1 vs 0); dim 1 constant
    emb = np.stack(
        [np.where(lab == 0, -0.5, 0.5), np.full(n, 0.25)], axis=1
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(lab.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = mi_feature_ranking(str(tmp_path))
    got = dict(zip(out["dim"].to_pylist(), out["mi_nano"].to_pylist()))
    ranks = dict(zip(out["dim"].to_pylist(), out["mi_rank"].to_pylist()))
    import math
    # perfect binary MI = ln 2 nats
    assert abs(got[0] / 1e9 - math.log(2)) < 1e-6
    assert got[1] <= 0  # constant dim: single bin, terms are 0 (or -1 nano from floor)
    assert ranks[0] == 1 and ranks[1] == 2
