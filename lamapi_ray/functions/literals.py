"""Literal classification — regex taxonomy + XSD mapping.

Re-derives the reference's literal recognizer
(``api/model/literal_recognizer.py:23-94``) and XSD mapping
(``api/model/data_retrievers/literal_classifier.py:8-30``).

Reference quirks reproduced on purpose (do NOT "fix"):

* month alternation spells December as "dicember"
  (literal_recognizer.py:28-33) — "26 december 1997" therefore does NOT
  match the DATE month patterns while "26 dicember 1997" does;
* check order is the *dict insertion order* datetime → time → url → email →
  float → integer → date, first match wins (literal_recognizer.py:76-94);
* matching is *search* semantics (``finditer``), and some FLOAT/INTEGER
  alternatives are unanchored on the right.

The classifier is exposed two ways: scalar :func:`check_literal` and the
vectorized :func:`classify_array` used inside ``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MONTHS = (
    "january|february|march|april|may|june|july|august|september|october"
    "|november|dicember"  # reference misspelling, literal_recognizer.py:28
)
_SEP = r"[\.\,\s\t\n\/]"

DATE_PATTERN = (
    r"^\d{1,4}[\,\.\s\t\n]+bc$|"
    r"^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}$|"
    r"^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{4}$|"
    r"^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{2}$|"
    rf"^({_MONTHS}){_SEP}+\d{{1,2}}{_SEP}+\d{{4}}$|"
    rf"^\d{{1,2}}{_SEP}+({_MONTHS}){_SEP}+\d{{4}}$|"
    rf"^\d{{4}}{_SEP}+({_MONTHS}){_SEP}+\d{{1,2}}$|"
    rf"^\d{{4}}{_SEP}+\d{{1,2}}{_SEP}+({_MONTHS})$|"
    rf"^({_MONTHS})[\.\,\s\n\t\/]+\d{{4}}$|"
    rf"^\d{{4}}[\.\,\s\n\t\/]+({_MONTHS})$|"
    r"^\d+[\.\,]\d+[\.\,]\d+[\.\,]\d+$|"
    r"^\d+[\.\,]\d+[\.\,]\d+$|"
    r"^\d+[\.\,]\d+$|"
    r"^\d{4}[–-]\d{4}$|"
    r"^\d{4}[–-](present|now)$|"
    r"^\d{4}$|"
    r"^\d+$"
)

URL_PATTERN = (
    r"^((http|https)\:\/\/)?[a-zA-Z0-9\.\/\?\:@\-_=#]+"
    r"\.([a-zA-Z]){2,6}([a-zA-Z0-9\.\&\/\?\:@\-_=#])$"
)

EMAIL_PATTERN = r"^\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b$"

DATETIME_PATTERN = (
    r"^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}"
    r"T(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"
)

TIME_PATTERN = r"^(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"

FLOAT_PATTERN = (
    r"^[-+]?\d+[\,\.]\d+$|"
    r"^[-+]?\d+[\,\.]\d+[eE][-+]\d+$|"
    r"^[-+]?\d+[\,\.]\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)|"
    r"^\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)"
)

INTEGER_PATTERN = (
    r"^[-+]?\d+$|"
    r"^\d+[ –-](thousand|million|billion|trillion)$|"
    r"^\d+[\,\.]\d+[ –-](thousand|million|billion|trillion)$"
)

# Check order matters: first match wins (literal_recognizer.py:76-94).
LITERAL_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("DATETIME", re.compile(DATETIME_PATTERN, re.IGNORECASE)),
    ("TIME", re.compile(TIME_PATTERN, re.IGNORECASE)),
    ("URL", re.compile(URL_PATTERN, re.IGNORECASE)),
    ("EMAIL", re.compile(EMAIL_PATTERN, re.IGNORECASE)),
    ("FLOAT", re.compile(FLOAT_PATTERN, re.IGNORECASE)),
    ("INTEGER", re.compile(INTEGER_PATTERN, re.IGNORECASE)),
    ("DATE", re.compile(DATE_PATTERN, re.IGNORECASE)),
]

# literal datatype → XSD record (literal_classifier.py:8-22).
XML_DATATYPES: dict[str, dict[str, str]] = {
    "DATE": {"datatype": "DATE", "classification": "DATETIME", "tag": "LIT", "xml_datatype": "xsd:date"},
    "DATETIME": {"datatype": "DATETIME", "classification": "DATETIME", "tag": "LIT", "xml_datatype": "xsd:dateTime"},
    "TIME": {"datatype": "TIME", "classification": "DATETIME", "tag": "LIT", "xml_datatype": "xsd:time"},
    "URL": {"datatype": "URL", "classification": "STRING", "tag": "LIT", "xml_datatype": "xs:anyURI"},
    "EMAIL": {"datatype": "EMAIL", "classification": "STRING", "tag": "LIT", "xml_datatype": "xsd:string"},
    "INTEGER": {"datatype": "INTEGER", "classification": "NUMBER", "tag": "LIT", "xml_datatype": "xsd:integer"},
    "FLOAT": {"datatype": "FLOAT", "classification": "NUMBER", "tag": "LIT", "xml_datatype": "xsd:decimal"},
    "STRING": {"datatype": "STRING", "classification": "STRING", "tag": "NE", "xml_datatype": "xsd:string"},
}

# Wikidata claim datatype → literal family (parse_wikidata_dump.py:77-91).
WIKIDATA_DATATYPE_MAP: dict[str, str] = {
    "external-id": "STRING",
    "quantity": "NUMBER",
    "globe-coordinate": "STRING",
    "string": "STRING",
    "monolingualtext": "STRING",
    "commonsMedia": "STRING",
    "time": "DATETIME",
    "url": "STRING",
    "geo-shape": "GEOSHAPE",
    "math": "MATH",
    "musical-notation": "MUSICAL_NOTATION",
    "tabular-data": "TABULAR_DATA",
}


def check_literal(token: str) -> str:
    """DATETIME/TIME/URL/EMAIL/FLOAT/INTEGER/DATE, else STRING."""
    for name, pattern in LITERAL_PATTERNS:
        if pattern.search(token):
            return name
    return "STRING"


def classify_value(value: str) -> dict[str, str]:
    """Full XSD record for one value (literal_classifier.py:24-30)."""
    return XML_DATATYPES[check_literal(value)]


def classify_value_cb(value) -> str:
    """The Crunchbase-CSV classifier variant (M11 — reference
    scripts/parsing_cb.py:26-37): ISO-8601 parse → DATETIME, float parse →
    NUMBER, else STRING. Uses ``dateutil.parser.isoparse`` like the
    reference when available, else ``datetime.fromisoformat``."""
    try:
        from dateutil.parser import isoparse as _iso
    except ImportError:  # pragma: no cover - dateutil ships with pandas here
        from datetime import datetime

        _iso = datetime.fromisoformat
    try:
        _iso(value)
        return "DATETIME"
    except (ValueError, TypeError):
        pass
    try:
        float(value)
        return "NUMBER"
    except (ValueError, TypeError):
        pass
    return "STRING"


# Every non-STRING pattern above needs at least one digit (DATETIME / TIME /
# FLOAT / INTEGER / DATE alternatives all contain ``\d``) or a literal dot
# (URL's ``\.tld``, EMAIL's ``\.[A-Za-z]{2,}``), and all alternatives are
# left-anchored — so a token with neither character is STRING without running
# the Python regex chain. Checked vectorized via arrow's RE2 kernel.
# NB: the Python patterns use ``\d`` == Unicode decimal digits (re.UNICODE
# default), so the RE2 prefilter must include ``\p{Nd}`` too — plain
# ``[0-9.]`` would misroute e.g. '٤٢' or fullwidth '４２' to STRING while
# check_literal calls them INTEGER.
_PREFILTER_RE = r"[0-9.\p{Nd}]"


def classify_array(values) -> np.ndarray:
    """Vectorized classifier over a pyarrow array / numpy array / list.

    Dedups within the batch, prefilters digit/dot-free tokens straight to
    STRING with one arrow ``match_substring_regex`` kernel, and runs the
    Python regex chain only on the surviving distinct values — the cost is
    per-distinct-candidate, not per-row (hot-path for map_batches stages).
    """
    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks().cast(pa.string())
    elif isinstance(values, pa.Array):
        arr = values.cast(pa.string())
    else:
        arr = pa.array(list(values), pa.string())
    uniq = pc.unique(arr)
    cand = pc.match_substring_regex(uniq, _PREFILTER_RE).to_numpy(
        zero_copy_only=False
    )
    uniq_np = np.asarray(uniq.to_pylist(), dtype=object)
    labels = np.full(len(uniq_np), "STRING", dtype=object)
    labels[cand] = [check_literal(v) for v in uniq_np[cand]]
    inv = pc.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False)
    return labels[inv]
