"""Passage-level dedup (stages/dedup.py::passage_dedup)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.dedup import _doc_passage_hashes, passage_dedup


def _t(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_passage_hashes_strided_and_tail():
    words = [f"w{i}" for i in range(40)]
    batch = _t([(1, " ".join(words)), (2, " ".join(words[:16])), (3, "a b")])
    ids, sdoc, pidx, h = _doc_passage_hashes(batch, "doc_id", "text", k=16)
    # doc 1: 40 tokens -> 16,16,8; doc 2: one full window; doc 3: short tail
    assert list(zip(sdoc.tolist(), pidx.tolist())) == [
        (0, 0), (0, 1), (0, 2), (1, 0), (2, 0),
    ]
    # identical first window in doc1 and doc2 -> identical hash
    assert h[0] == h[3]
    assert len(set(h.tolist())) == 4


def test_passage_hash_equals_manual_horner():
    from lamapi_ray.stages.dedup import _SH_C, _hash64_cached

    P = (1 << 61) - 1
    batch = _t([(7, "x y z")])
    _, _, _, h = _doc_passage_hashes(batch, "doc_id", "text", k=16)
    acc = _hash64_cached("x") % P
    for t in ("y", "z"):
        acc = (acc * _SH_C + _hash64_cached(t) % P) % P
    assert int(h[0]) == acc


def test_passage_dedup_keeper_is_min_doc_then_idx():
    words = " ".join(f"w{i}" for i in range(16))
    rows = [(5, words), (2, "unique lead " + words), (9, words)]
    out = (
        pa.concat_tables(
            passage_dedup(ray.data.from_arrow(_t(rows)), k=16).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by("g")
        .to_pylist()
    )
    # the 16-token block appears as doc5[0], doc9[0] and INSIDE doc2 at a
    # shifted offset (different window alignment -> different hash), so the
    # aligned duplicate pair is (5,0)/(9,0) with keeper doc 2? No: doc2's
    # windows are offset by the 2-token lead, so its hashes differ.
    dup_rows = [r for r in out if r["n_copies"] == 2]
    assert len(dup_rows) == 1
    assert dup_rows[0]["keep_doc"] == 5 and dup_rows[0]["keep_idx"] == 0
    assert all(r["n_copies"] == 1 for r in out if r is not dup_rows[0])
    total = sum(r["n_copies"] for r in out)
    # doc5: 1 passage, doc9: 1, doc2: 18 tokens -> 2 passages
    assert total == 4


def test_passage_dedup_counts_match_naive():
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 40)).tolist()))
        for i in range(30)
    ]
    out = pa.concat_tables(
        passage_dedup(ray.data.from_arrow(_t(rows)), k=16).iter_batches(
            batch_format="pyarrow", batch_size=4096
        )
    )
    naive = {}
    for did, text in rows:
        toks = text.split(" ")
        segs = [toks[i : i + 16] for i in range(0, len(toks), 16)]
        for pi, s in enumerate(segs):
            naive.setdefault(tuple(s), []).append((did, pi))
    assert len(out) == len(naive)
    assert sorted(out["n_copies"].to_pylist()) == sorted(
        len(v) for v in naive.values()
    )
    keepers = {
        (r["keep_doc"], r["keep_idx"]) for r in out.to_pylist()
    }
    assert keepers == {min(v) for v in naive.values()}
