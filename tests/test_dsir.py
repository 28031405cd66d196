"""DSIR importance weights (stages/dsir.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.dsir import B, bucket_counts, dsir_weights


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_bucket_counts_total_features(ray_session):
    # n tokens -> n unigrams + (n-1) bigrams (n >= 2)
    ds = _ds([(1, "a b c"), (2, "d e")])
    counts, n = bucket_counts(ds)
    assert n == (3 + 2) + (2 + 1)
    assert counts.sum() == n and len(counts) == B


def test_target_like_docs_score_higher(ray_session):
    target = _ds([(i, "alpha beta") for i in range(20)])
    source = _ds(
        [(1, "alpha beta alpha beta"), (2, "zz yy xx ww vv uu")]
    )
    out = pa.concat_tables(
        dsir_weights(source, target).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    w = dict(zip(out["doc_id"].to_pylist(), out["logw_micro"].to_pylist()))
    # the doc made of target vocabulary must outscore the disjoint one
    assert w[1] > w[2]
    assert out["n_features"].to_pylist() == [4 + 3, 6 + 5]


def test_weights_deterministic(ray_session):
    target = _ds([(i, f"t{i % 3} common") for i in range(10)])
    source = _ds([(i, f"s{i} common t0") for i in range(15)])

    def run():
        t = pa.concat_tables(
            dsir_weights(source, target).iter_batches(
                batch_size=64, batch_format="pyarrow"
            )
        ).sort_by("doc_id")
        return t["logw_micro"].to_pylist()

    assert run() == run()
