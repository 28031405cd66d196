"""Unigram-LM perplexity tests — count math, integer surprisal exactness,
unseen-token fallback."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.lmscore import (
    SCALE,
    perplexity_pipeline,
    score_perplexity,
    unigram_counts,
)


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
    return pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")


def test_counts_and_totals():
    counts, n, v = unigram_counts(_docs([(0, "a b a"), (1, "b c")]))
    cmap = dict(zip(counts["token"].to_pylist(), counts["c"].to_pylist()))
    assert cmap == {"a": 2, "b": 2, "c": 1}
    assert n == 5 and v == 3


def test_surprisal_matches_closed_form():
    docs = _docs([(0, "a b a"), (1, "b c")])
    out = _collect(perplexity_pipeline(docs))
    n, v = 5, 3

    def s(c):
        return int(np.floor(-np.log((c + 1.0) / (n + v)) * SCALE))

    expect0 = s(2) + s(2) + s(2)  # a b a
    expect1 = s(2) + s(1)  # b c
    assert out["surprisal_micro"].to_pylist() == [expect0, expect1]
    avg0 = expect0 / 3 / SCALE
    assert out["avg_surprisal"][0].as_py() == float(f"{avg0:.6f}")
    assert out["ppl"][0].as_py() == float(f"{np.exp(avg0):.4f}")


def test_uniform_corpus_ppl_near_vocab():
    # every token distinct & once: p = 2/(n+v) uniform; ppl = (n+v)/2
    docs = _docs([(0, "a b c d"), (1, "e f g h")])
    out = _collect(perplexity_pipeline(docs))
    assert out["ppl"][0].as_py() == out["ppl"][1].as_py()
    assert abs(out["ppl"][0].as_py() - 8.0) < 0.01


def test_unseen_token_fallback():
    train = _docs([(0, "a a b")])
    counts, n, v = unigram_counts(train)
    heldout = _docs([(7, "a z")])
    out = _collect(score_perplexity(heldout, counts, n, v))
    sa = int(np.floor(-np.log((2 + 1.0) / (n + v)) * SCALE))
    sz = int(np.floor(-np.log(1.0 / (n + v)) * SCALE))  # c=0 smoothing floor
    assert out["surprisal_micro"][0].as_py() == sa + sz


def test_bigram_perplexity_scalar_reference(ray_session):
    """Bigram scorer vs a scalar add-one bigram LM on a crafted corpus,
    including a 1-token doc that must drop (no bigrams)."""
    import math
    from collections import Counter

    import ray.data

    from lamapi_ray.stages.lmscore import SCALE, bigram_perplexity_pipeline

    texts = ["a b a b c", "b a b", "c c c a", "a"]
    docs = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(4), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    ).repartition(2)
    out = pa.concat_tables(
        bigram_perplexity_pipeline(docs).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"
        )
    ).sort_by("doc_id")

    c1 = Counter(t for s in texts for t in s.split())
    V = len(c1)
    c2 = Counter()
    for s in texts:
        ts = s.split()
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] += 1
    assert out["doc_id"].to_pylist() == [0, 1, 2]  # doc 3 has no bigrams
    for row, s in zip(range(3), texts):
        ts = s.split()
        bigs = list(zip(ts, ts[1:]))
        sm = sum(
            math.floor(-math.log((c2[b] + 1.0) / (c1[b[0]] + V)) * SCALE)
            for b in bigs
        )
        assert out["n_bigrams"][row].as_py() == len(bigs)
        assert out["surprisal_micro"][row].as_py() == sm
        avg = sm / len(bigs) / SCALE
        assert abs(out["avg_surprisal"][row].as_py() - avg) < 1e-6
        assert abs(out["ppl"][row].as_py() - math.exp(avg)) < 1e-3
