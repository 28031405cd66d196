"""Exact duplicate-substring spans (stages/substrdedup.py) vs a
brute-force reference implementation."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.substrdedup import duplicate_spans, strip_duplicate_spans


def _ref_spans(texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    """Brute force: count every L-token window by its literal gram
    string, mark starts of grams seen >= 2 times corpus-wide, merge
    overlapping-or-adjacent [p, p+L) intervals per doc."""
    from collections import Counter

    grams: Counter = Counter()
    windows: dict[int, list[tuple[int, str]]] = {}
    for did, text in texts.items():
        toks = text.split(" ")
        wins = [
            (i, " ".join(toks[i : i + L])) for i in range(len(toks) - L + 1)
        ]
        windows[did] = wins
        grams.update(g for _, g in wins)
    out = set()
    for did, wins in windows.items():
        marked = [p for p, g in wins if grams[g] >= 2]
        i = 0
        while i < len(marked):
            j = i
            while j + 1 < len(marked) and marked[j + 1] - marked[j] <= L:
                j += 1
            out.add((did, marked[i], marked[j] + L))
            i = j + 1
    return out


def _run(texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    ).repartition(3)
    batches = list(
        duplicate_spans(ds, L=L).iter_batches(batch_size=4096, batch_format="pyarrow")
    )
    if not batches:
        return set()
    t = pa.concat_tables(batches)
    return set(
        zip(
            t["doc_id"].to_pylist(),
            t["span_start"].to_pylist(),
            t["span_end"].to_pylist(),
        )
    )


def test_cross_doc_duplicate_merges_overlapping_windows(ray_session):
    # docs 1 and 2 share a 9-token run -> two overlapping 8-windows
    # each -> ONE maximal span per doc
    shared = "a b c d e f g h i"
    texts = {
        1: f"x1 y1 {shared} z1",
        2: f"p2 {shared} q2 r2 s2",
        3: "nothing shared here at all in this one doc",
    }
    got = _run(texts, L=8)
    assert got == _ref_spans(texts, 8)
    # doc 1: shared run starts at token 2, covers 9 tokens -> [2, 11)
    assert (1, 2, 11) in got
    assert not any(d == 3 for d, _, _ in got)


def test_within_doc_repetition_counts(ray_session):
    run = "r1 r2 r3 r4 r5"
    texts = {7: f"{run} mid1 mid2 {run} tail"}
    got = _run(texts, L=5)
    assert got == _ref_spans(texts, 5)
    assert (7, 0, 5) in got and (7, 7, 12) in got


def test_short_docs_and_adjacency_rule(ray_session):
    # doc shorter than L contributes nothing even if its whole text
    # equals a window elsewhere; gap == L merges, gap > L splits
    texts = {
        1: "a b c",  # 3 tokens < L=4: no windows
        2: "a b c d x1 x2 y1 a b c d",  # 'a b c d' twice within doc
        3: "a b c d e f g h a b c d",  # marked starts 0 and 8: gap 8 > 4
    }
    got = _run(texts, L=4)
    assert got == _ref_spans(texts, 4)
    assert not any(d == 1 for d, _, _ in got)
    assert (3, 0, 4) in got and (3, 8, 12) in got


def _ref_strip(texts: dict[int, str], L: int) -> dict[int, str]:
    spans = _ref_spans(texts, L)
    out = {}
    for did, text in texts.items():
        toks = text.split(" ")
        cov = set()
        for d, s, e in spans:
            if d == did:
                cov.update(range(s, e))
        out[did] = " ".join(t for i, t in enumerate(toks) if i not in cov)
    return out


def _run_strip(texts: dict[int, str], L: int) -> dict[int, str]:
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    ).repartition(3)
    t = pa.concat_tables(
        strip_duplicate_spans(ds, L=L).iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
    )
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_strip_removes_covered_tokens_only(ray_session):
    shared = "a b c d e f g h"
    texts = {
        1: f"x1 y1 {shared} z1",
        2: f"p2 {shared} q2",
        3: "untouched doc stays word for word the same here",
    }
    got = _run_strip(texts, L=8)
    assert got == _ref_strip(texts, 8)
    assert got[1] == "x1 y1 z1"
    assert got[3] == texts[3]


def test_strip_fully_covered_doc_empties(ray_session):
    texts = {1: "a b c d", 2: "a b c d"}
    got = _run_strip(texts, L=4)
    assert got == {1: "", 2: ""}


def test_strip_random_corpus_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    texts = {}
    for did in range(50):
        n = int(rng.integers(2, 30))
        texts[did] = " ".join(vocab[int(i)] for i in rng.integers(0, 12, n))
    for L in (3, 5):
        assert _run_strip(texts, L) == _ref_strip(texts, L)


def test_random_corpus_matches_bruteforce(ray_session):
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for did in range(60):
        n = int(rng.integers(3, 40))
        texts[did] = " ".join(vocab[int(i)] for i in rng.integers(0, 30, n))
    for L in (3, 6):
        assert _run(texts, L) == _ref_spans(texts, L)
