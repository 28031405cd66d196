"""Winnowing tests — guarantee property, closed-form check, short docs."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.dedup import _hash64
from lamapi_ray.stages.winnow import winnow_fingerprints


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
    ).sort_by([("doc_id", "ascending"), ("fp", "ascending")])


def _reference(text, k=3, w=4):
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    h = [np.uint64(_hash64(g)) for g in grams]
    m = len(h)
    sel = set()
    for i in range(max(m - w, 0) + 1):
        sel.add(min(h[i : i + w]))
    return sorted(int(np.int64(v)) for v in sel)


def test_matches_reference_implementation():
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "a b"),  # short doc: one whole-text gram
        (2, "x y z"),  # exactly k tokens: one gram, one window
        (3, "one two three four five six"),
    ]
    out = _collect(winnow_fingerprints(_docs(rows), k=3, w=4))
    for doc_id, text in rows:
        got = out.filter(pa.compute.equal(out["doc_id"], doc_id))["fp"].to_pylist()
        assert got == _reference(text), doc_id


def test_shared_run_guarantee():
    # two docs sharing a run of w+k-1 = 6 tokens must share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [(0, f"xx yy {shared} qq"), (1, f"{shared} rr ss tt")]
    out = _collect(winnow_fingerprints(_docs(rows), k=3, w=4))
    fp0 = set(out.filter(pa.compute.equal(out["doc_id"], 0))["fp"].to_pylist())
    fp1 = set(out.filter(pa.compute.equal(out["doc_id"], 1))["fp"].to_pylist())
    assert fp0 & fp1


def test_disjoint_docs_rarely_collide():
    rows = [(0, "aa bb cc dd ee ff gg"), (1, "hh ii jj kk ll mm nn")]
    out = _collect(winnow_fingerprints(_docs(rows), k=3, w=4))
    fp0 = set(out.filter(pa.compute.equal(out["doc_id"], 0))["fp"].to_pylist())
    fp1 = set(out.filter(pa.compute.equal(out["doc_id"], 1))["fp"].to_pylist())
    assert not (fp0 & fp1)
