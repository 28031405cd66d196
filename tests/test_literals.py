"""Literal-classifier conformance (FIXTURES.md §5).

Golden corpus from the reference's in-code docs and API examples
(api/model/literal_recognizer.py:6-21 comments, api/server.py:495-525),
including the deliberate "dicember" misspelling behavior
(literal_recognizer.py:28-33) — reproduced, not fixed.
"""

import pytest

from lamapi_ray.functions.literals import (
    check_literal,
    classify_array,
    classify_value,
)

GOLDEN = [
    ("145 bc", "DATE"),
    ("1997-08-26", "DATE"),
    ("26/08/1997", "DATE"),
    ("26.08.97", "DATE"),
    ("august 26 1997", "DATE"),
    ("26 august 1997", "DATE"),
    ("1997 august 26", "DATE"),
    ("august 1997", "DATE"),
    ("1997-present", "DATE"),
    ("1997–2001", "DATE"),
    # INTEGER is checked before DATE (dict order, literal_recognizer.py:76-84)
    # so bare year-like numbers classify INTEGER — the DATE ^\d{4}$ / ^\d+$
    # alternatives are unreachable for plain integers.
    ("1997", "INTEGER"),
    ("1345", "INTEGER"),
    ("2,797,800,564", "DATE"),  # grouped digits hit the DATE number alts first? no —
    ("2.8", "FLOAT"),  # FLOAT is checked before DATE (dict order)
    ("+/- 5e+10", "STRING"),  # leading '+/-' matches nothing
    ("2 km2", "FLOAT"),
    ("25 thousand", "INTEGER"),
    ("-42", "INTEGER"),
    ("https://elearning.unimib.it/", "URL"),
    # URL runs before EMAIL and its charset includes '@' → plain addresses
    # classify URL; EMAIL only wins when the address needs chars outside the
    # URL charset (e.g. '%' or '+').
    ("mario.rossi@gmail.com", "URL"),
    ("mario%2Erossi@gmail.com", "EMAIL"),
    ("12:30", "TIME"),
    ("24:00", "TIME"),
    ("2022-01-01T12:30", "DATETIME"),
    ("hello world", "STRING"),
    # misspelling quirk: 'december' is NOT in the month alternation
    ("26 december 1997", "STRING"),
    ("26 dicember 1997", "DATE"),
]


@pytest.mark.parametrize("value,expected", GOLDEN)
def test_check_literal(value, expected):
    # FLOAT/INTEGER run before DATE, so grouped numbers like 2,797,800,564
    # classify FLOAT (matches ^\d+[\,\.]\d+ via search? no — anchored) —
    # resolve the two ambiguous rows empirically below instead.
    if value in ("2,797,800,564", "2.8"):
        pytest.skip("covered by test_number_order")
    assert check_literal(value) == expected


def test_number_order():
    # FLOAT pattern ^\d+[\,\.]\d+$ requires exactly one separator → the
    # billion-grouped value falls through FLOAT and INTEGER to DATE's
    # ^\d+[\.\,]\d+[\.\,]\d+[\.\,]\d+$ alternative.
    assert check_literal("2,797,800,564") == "DATE"
    assert check_literal("2.8") == "FLOAT"


def test_classify_value_xsd():
    assert classify_value("2022-01-01T12:30") == {
        "datatype": "DATETIME",
        "classification": "DATETIME",
        "tag": "LIT",
        "xml_datatype": "xsd:dateTime",
    }
    assert classify_value("free text")["tag"] == "NE"
    assert classify_value("12:30")["xml_datatype"] == "xsd:time"
    assert classify_value("https://unimib.it/")["xml_datatype"] == "xs:anyURI"


def test_classify_array_vectorized():
    vals = ["12:30", "hello", "1997", "12:30"]
    out = classify_array(vals)
    assert list(out) == ["TIME", "STRING", "INTEGER", "TIME"]


def test_totality():
    # the classifier always returns a label (property 5 in SURVEY §5)
    for v in ["", " ", "∆∆∆", "\n", "a" * 100]:
        assert check_literal(v) in {
            "DATETIME", "TIME", "URL", "EMAIL", "FLOAT", "INTEGER", "DATE", "STRING",
        }


def test_classify_array_prefilter_parity():
    # the digit/dot RE2 prefilter must agree with the scalar regex chain on
    # adversarial inputs (property-based: random strings over the charset
    # the patterns care about)
    import random
    import string

    import numpy as np
    import pyarrow as pa

    rng = random.Random(20260817)
    # include Unicode decimal digits: Python \d matches them, so the RE2
    # prefilter must route them to the scalar chain (\p{Nd}), not to STRING
    charset = string.ascii_letters + string.digits + ".@:/-–, \t\n" + "٤٢４２߃"
    vals = ["", ".", "@", "a@b", "example.com", "2000–present", "9.9.9.9",
            "٤٢", "４２", "١٢:٣٠", "a٤b"]
    for _ in range(400):
        vals.append("".join(rng.choices(charset, k=rng.randint(0, 16))))
    got = classify_array(pa.array(vals, pa.string()))
    want = np.array([check_literal(v) for v in vals], dtype=object)
    assert (got == want).all()
