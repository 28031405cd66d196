"""Two-pass heavy hitters (stages/sketch.py::heavy_hitters)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.sketch import heavy_hitters, mg_summary


def _run(texts, k):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    batches = list(
        heavy_hitters(ds, k=k).iter_batches(batch_size=4096, batch_format="pyarrow")
    )
    if not batches:
        return {}
    t = pa.concat_tables(batches)
    return dict(zip(t["token"].to_pylist(), t["n_occ"].to_pylist()))


def _exact(texts, k):
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(t.split(" "))
    n = sum(c.values())
    return {tok: v for tok, v in c.items() if v * k > n}


def test_mg_summary_reduction_properties():
    toks = np.array([f"t{i}" for i in range(10)], dtype=object)
    counts = np.array([100, 90, 80, 5, 4, 3, 3, 2, 2, 1], dtype=np.int64)
    kt, kc = mg_summary(toks, counts, k=3)
    assert len(kt) <= 3
    # survivors are the largest, under-estimated by the (k+1)-th count
    assert set(kt) == {"t0", "t1", "t2"}
    assert list(kc) == [95, 85, 75]
    # no reduction needed when under k
    kt2, kc2 = mg_summary(toks[:3], counts[:3], k=8)
    assert list(kt2) == list(toks[:3]) and list(kc2) == list(counts[:3])


def test_heavy_hitters_exact_on_skewed_corpus(ray_session):
    rng = np.random.default_rng(31)
    # zipf-ish: token 'hot0'/'hot1' dominate, long tail of rares
    texts = []
    for i in range(200):
        toks = ["hot0"] * 8 + ["hot1"] * 5 + [f"rare{rng.integers(0, 5000)}" for _ in range(20)]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    for k in (8, 64):
        got = _run(texts, k)
        assert got == _exact(texts, k)
    assert "hot0" in _run(texts, 64)


def test_heavy_hitters_no_false_negatives_small_k(ray_session):
    # adversarial: many distinct tokens per batch force MG reduction
    texts = [" ".join([f"u{i}_{j}" for j in range(30)] + ["big"] * 10) for i in range(50)]
    got = _run(texts, 16)
    assert got == _exact(texts, 16)
    assert "big" in got and got["big"] == 500
