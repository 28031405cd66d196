"""Golden tests for the scalar scoring core (reference formulas F1-F4, M7).

Expected values derived from the reference's documented semantics
(api/model/utils.py, scripts/elastic_indexing.py:38-54) — computed by hand /
an independent oracle, not by running the reference.
"""

import math

from hypothesis import given, strategies as st

from lamapi_ray.functions.text import (
    clean_str,
    dot_abbreviations,
    editdistance,
    levenshtein,
    ngram_jaccard,
    similarity,
    token_jaccard,
)


def test_clean_str():
    assert clean_str("  Batman   Begins ") == "batman begins"
    assert clean_str("A\tB\nC") == "a b c"
    assert clean_str("") == ""


def test_levenshtein_basics():
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_editdistance_normalized():
    # 1 - lev/max(len): reference utils.py:6-7
    assert editdistance("abc", "abc") == 1.0
    assert math.isclose(editdistance("kitten", "sitting"), 1 - 3 / 7)


def test_token_jaccard_max_denominator():
    # denominator is max(|A|,|B|,1), NOT union — reference utils.py:50
    assert token_jaccard("red plate", "red plate") == 1.0
    assert token_jaccard("red plate", "red") == 1 / 2
    assert token_jaccard("a b c", "a x") == 1 / 3
    assert token_jaccard("", "x") == 0 / 1  # max(len({""}),len({"x"}),1) → sets {''},{x}


def test_ngram_jaccard_char3():
    # "red plate" → 3grams of 'red' = {'red'}, of 'plate' = {pla,lat,ate}
    assert ngram_jaccard("red plate", "red plate") == 1.0
    g = similarity("plate", "plates", 3)
    # plate: pla lat ate (3); plates: pla lat ate tes (4); ∩=3, max=4
    assert math.isclose(g, 3 / 4)


def test_short_tokens_have_no_3grams():
    # tokens shorter than 3 chars contribute no grams (word2ngrams semantics)
    assert similarity("ab", "ab", 3) == 0.0


def test_dot_abbreviations_tolkien():
    # reference elastic_indexing.py:38-54
    assert dot_abbreviations("John Ronald Tolkien") == [
        "John Ronald Tolkien",
        "J. Ronald Tolkien",
        "J. R. Tolkien",
    ]
    assert dot_abbreviations("Cher") == ["Cher"]


@given(st.text(min_size=1, max_size=30), st.text(min_size=1, max_size=30))
def test_editdistance_bounds(a, b):
    assert 0 <= levenshtein(a, b) <= max(len(a), len(b))
    assert editdistance(a, b) <= 1.0


@given(st.text(alphabet="ab ", min_size=0, max_size=30))
def test_clean_str_idempotent(s):
    assert clean_str(clean_str(s)) == clean_str(s)


@given(
    st.text(alphabet="abc ", min_size=1, max_size=20),
    st.text(alphabet="abc ", min_size=1, max_size=20),
)
def test_similarity_bounds(a, b):
    for n in (None, 3):
        v = similarity(a, b, n)
        assert 0.0 <= v <= 1.0
    assert similarity(a, a, None) == 1.0


def test_route_entity_ids():
    from lamapi_ray.functions.text import route_entity_ids

    out = route_entity_ids(["Q42", "P31", "dbr:Batman", "Q1", "42Q"])
    assert out["wikidata"] == ["Q42", "P31", "Q1"]
    assert out["dbpedia"] == ["dbr:Batman", "42Q"]


def test_round_arr_matches_round_ref_elementwise():
    # _round_arr (np.char.mod) must be bit-identical to the scalar
    # printf-based round_ref, including knife-edge decimal ties
    import numpy as np

    from lamapi_ray.functions.text import round_ref
    from lamapi_ray.index.surface import _round_arr

    rng = np.random.RandomState(20260817)
    vals = np.concatenate([
        rng.uniform(-10, 10, 5000),
        np.array([0.48624999999999996, 0.48625, 0.5, 1.0055, 2.675, 0.125,
                  0.0, -0.0, 1e-9, -1e-9]),
    ])
    for nd in (2, 3, 4, 6):
        got = _round_arr(vals, nd)
        want = np.array([round_ref(v, nd) for v in vals])
        assert (got == want).all()
    assert _round_arr(np.array([]), 3).shape == (0,)
