"""Vectorized mention scanner equivalence + text-stats + ANN stage tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lamapi_ray.functions.text import clean_str
from lamapi_ray.stages.mentions import MentionScanner, _classify
from lamapi_ray.stages.textstats import (
    lang_id_batch,
    quality_batch,
    rolling_fingerprint,
    token_stats_batch,
)
from lamapi_ray.stages.annsearch import cosine_topk


def reference_scan(text, vocab, max_n):
    """The straightforward per-token loop the vectorized scanner replaced."""
    tokens = clean_str(text).split(" ") if text else []
    first = frozenset(s.split(" ", 1)[0] for s in vocab)
    seen = set()
    for i, tok in enumerate(tokens):
        if tok in first:
            for n in range(1, max_n + 1):
                if i + n > len(tokens):
                    break
                w = " ".join(tokens[i : i + n])
                if w in vocab:
                    seen.add(w)
    lits = sorted({t for t in set(tokens) if t and _classify(t) != "STRING"})
    return sorted(seen), lits


VOCAB = frozenset(
    ["red plate", "plate", "usa", "new york city", "york", "a b c d"]
)


@pytest.mark.parametrize(
    "text",
    [
        "I saw a Red   Plate in the USA yesterday",
        "new york city and york and New\tYork City",
        "a b c d e and a b c",
        "plate plate plate 42 3.14 2024-01-01 12:30 x@y.com",
        "",
        "   leading and trailing   ",
        "nothing matches here at all",
    ],
)
def test_vectorized_scanner_matches_reference(text):
    sc = MentionScanner(VOCAB, max_n=4)
    batch = pa.table({"url": pa.array(["u1"]), "text": pa.array([text])})
    out = sc(batch)
    exp_mentions, exp_lits = reference_scan(text, VOCAB, 4)
    assert out["mentions"][0].as_py() == exp_mentions
    assert out["lit_values"][0].as_py() == exp_lits
    assert out["lit_datatypes"][0].as_py() == [_classify(v) for v in exp_lits]


def test_vocab_hashes_compact_and_equivalent():
    # the broadcast scanner state is per-width sorted uint64 arrays — the
    # arrow-column and string-iterable constructors must agree, the widths
    # must partition the vocab, and the state must be numpy-only (the 20×
    # memory win over frozenset[str] at Wikidata scale)
    from lamapi_ray.stages.mentions import VocabHashes

    vh_str = VocabHashes.from_strings(VOCAB)
    vh_arr = VocabHashes.from_surface_norms(pa.array(sorted(VOCAB)))
    assert vh_str.max_n == vh_arr.max_n == 4
    assert set(vh_str.by_width) == {1, 2, 3, 4}
    for w in vh_str.by_width:
        assert (vh_str.by_width[w] == vh_arr.by_width[w]).all()
        assert vh_str.by_width[w].dtype == np.uint64
        # sorted unique
        assert (np.diff(vh_str.by_width[w].astype(np.int64)) > 0).all() or len(
            vh_str.by_width[w]
        ) <= 1
    # first-token prefilter covers exactly the multi-token surface starts
    assert len(vh_str.first_tokens) == len({"red", "new", "a"})
    assert (vh_str.first_tokens == vh_arr.first_tokens).all()
    # state size: 8 bytes per surface hash + first tokens, nothing string
    nbytes = sum(a.nbytes for a in vh_str.by_width.values())
    assert nbytes == 8 * len(VOCAB)
    # empty vocab degrades cleanly
    empty = VocabHashes.from_strings([])
    assert empty.by_width == {} and empty.first_tokens is None
    sc = MentionScanner(empty, max_n=1)
    out = sc(pa.table({"url": pa.array(["u"]), "text": pa.array(["plate usa"])}))
    assert out["mentions"][0].as_py() == []


def test_scanner_page_boundary_no_cross_window():
    # "red" ends page 1, "plate" starts page 2 — must NOT form "red plate"
    sc = MentionScanner(VOCAB, max_n=2)
    batch = pa.table(
        {"url": pa.array(["u1", "u2"]), "text": pa.array(["big red", "plate small"])}
    )
    out = sc(batch)
    assert out["mentions"][0].as_py() == []
    assert out["mentions"][1].as_py() == ["plate"]


def test_quality_and_token_stats():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["the quick brown fox of to"], pa.string()),
        }
    )
    q = quality_batch(batch)
    assert q["n_tokens"][0].as_py() == 6
    assert q["stopword_ratio"][0].as_py() == pytest.approx(3 / 6, abs=1e-4)
    t = token_stats_batch(batch)
    assert t["n_ws_tokens"][0].as_py() == 6
    assert t["n_distinct_tokens"][0].as_py() == 6


def test_lang_id_heuristic():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en", "de", "zh"], pa.string()),
            "text": pa.array(
                ["the cat and the dog of a to", "der hund und die katze nicht", "xyz abc"],
                pa.string(),
            ),
        }
    )
    out = lang_id_batch(batch)
    assert out["lang_pred"].to_pylist() == ["en", "de", "unknown"]


def test_rolling_fingerprint_deterministic():
    assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
    assert rolling_fingerprint("abc") != rolling_fingerprint("abd")


def test_cosine_topk_bruteforce():
    rng = np.random.RandomState(0)
    corpus = rng.rand(50, 8)
    queries = rng.rand(3, 8)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50) + 100, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in corpus]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = cosine_topk(ds, queries, np.array([0, 1, 2]), k=5)
    # oracle: numpy full ranking
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    sims = qn @ cn.T
    for qi in range(3):
        order = np.lexsort((np.arange(50) + 100, -sims[qi]))[:5]
        expect = [int(100 + i) for i in order]
        got = [
            n
            for q, n in zip(out["query_id"].to_pylist(), out["neighbor_id"].to_pylist())
            if q == qi
        ]
        assert got == expect
