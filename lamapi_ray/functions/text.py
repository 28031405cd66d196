"""Pure string / similarity scalar functions — the scoring core.

Re-derives (from public behavior, not code copy) the scalar functions of the
reference's ``api/model/utils.py`` and ``scripts/elastic_indexing.py``:

* ``clean_str``                      — reference api/model/utils.py:42-44
* ``editdistance``                   — reference api/model/utils.py:6-7
  (normalized Levenshtein; the reference delegates the raw distance to NLTK,
  we implement the classic two-row DP)
* ``token_jaccard`` (ngram=None)     — reference api/model/utils.py:47-67
  with the quirk that the denominator is ``max(|A|, |B|, 1)`` — NOT the union
* ``ngram_jaccard`` (char 3-grams)   — reference api/model/utils.py:54-67
* ``dot_abbreviations``              — reference scripts/elastic_indexing.py:38-54
  ("J. R. R. Tolkien"-style PERS alias generation)

All are deterministic, allocation-light, and safe to call from inside
``map_batches`` workers (no global state).
"""

from __future__ import annotations

from functools import lru_cache


def round_ref(x: float, nd: int) -> float:
    """Engine-wide decimal rounding via correctly-rounded formatting.

    ``float(f"%.{nd}f" % x)`` — CPython's float formatting is correctly
    rounded on the exact binary value (ties-to-even), and DuckDB's
    ``printf('%.NDf', x)`` (fmt/Dragon4) produces the identical string, so
    the oracle SQL uses ``CAST(printf(...) AS DOUBLE)`` and both sides agree
    bit-for-bit (validated on 60k random samples at 2/3/4/6 digits,
    including knife-edge tie values where DuckDB's ``round_even`` on DOUBLE
    is non-monotonic). The reference uses CPython ``round``
    (lookup_retriever.py:148-150 etc.), which differs only at apparent
    decimal ties; we trade that quirk for cross-engine verifiability and
    document it here.
    """
    return float(f"%.{nd}f" % float(x))


def clean_str(s: str) -> str:
    """Lowercase + whitespace collapse — THE canonical surface-form key.

    Reference: api/model/utils.py:42-44 (applied at
    lookup_retriever.py:28-31,124,147).
    """
    return " ".join(s.lower().split())


def levenshtein(s1: str, s2: str) -> int:
    """Classic edit distance (insert/delete/substitute, all cost 1)."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) > len(s2):  # iterate over the shorter string's rows
        s1, s2 = s2, s1
    prev = list(range(len(s1) + 1))
    cur = [0] * (len(s1) + 1)
    for j, c2 in enumerate(s2, 1):
        cur[0] = j
        for i, c1 in enumerate(s1, 1):
            cost = 0 if c1 == c2 else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev, cur = cur, prev
    return prev[len(s1)]


def editdistance(s1: str, s2: str) -> float:
    """``1 - levenshtein / max(len)`` — reference api/model/utils.py:6-7.

    Note: raises ZeroDivisionError on two empty strings exactly like the
    reference would; callers never pass empty mentions.
    """
    return 1 - levenshtein(s1, s2) / max(len(s1), len(s2))


def word_char_ngrams(text: str, n: int | None = None) -> list[str]:
    """Character n-grams of one word; ``n=None`` → the whole word as one gram.

    Reference: api/model/utils.py:54-58 (``word2ngrams``).
    """
    if n is None:
        n = len(text)
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def string_ngram_set(text: str, n: int | None = 3) -> set[str]:
    """Union of per-token char n-grams — reference api/model/utils.py:61-67."""
    out: set[str] = set()
    for token in text.split(" "):
        out.update(word_char_ngrams(token, n))
    return out


def similarity(str1: str, str2: str, ngram: int | None = None) -> float:
    """|grams1 ∩ grams2| / max(|grams1|, |grams2|, 1).

    Reference: api/model/utils.py:47-51. With ``ngram=None`` each token is a
    single gram → token-overlap score; with ``ngram=3`` → char-3-gram score.
    The max-denominator (not union) is a reference quirk kept on purpose.
    """
    g1 = string_ngram_set(str1, ngram)
    g2 = string_ngram_set(str2, ngram)
    return len(g1 & g2) / max(len(g1), len(g2), 1)


def token_jaccard(str1: str, str2: str) -> float:
    return similarity(str1, str2, None)


def ngram_jaccard(str1: str, str2: str) -> float:
    return similarity(str1, str2, 3)


@lru_cache(maxsize=1 << 16)
def scored_pair(label_clean: str, mention: str) -> tuple[float, float, float]:
    """(ed, token-jaccard, char3gram-jaccard), rounded to 2 dp each.

    Rounding points match reference lookup_retriever.py:148-150. Cached
    because the same (label, mention) pair recurs across pages — the batch
    analogue of the reference's Mongo ``cache`` collection.
    """
    return (
        round_ref(editdistance(label_clean, mention), 2),
        round_ref(token_jaccard(label_clean, mention), 2),
        round_ref(ngram_jaccard(label_clean, mention), 2),
    )


def dot_abbreviations(name: str) -> list[str]:
    """PERS dot-notation alias expansion.

    Reference: scripts/elastic_indexing.py:38-54. For "John Ronald Tolkien"
    emits ["J. R. Tolkien", "J. Ronald Tolkien", "John Ronald Tolkien"]:
    option i abbreviates the first ``min(i, n-1)`` leading words to
    "<initial>." and keeps the rest, always keeping the last word whole.
    """
    words = name.split()
    n = len(words)
    options = []
    for i in range(n):
        parts = []
        for j in range(n - 1):
            if j < i:
                parts.append(words[j][0] + ".")
            else:
                parts.append(words[j])
        options.append(" ".join(parts + [words[-1]]))
    return options


_WIKIDATA_ID = __import__("re").compile(r"^[QP]\d+$")


def route_entity_ids(ids: list[str]) -> dict[str, list[str]]:
    """M14 — split an id list per knowledge graph.

    Reference api/model/utils.py:11-26: ids matching ``^Q\\d+$`` / ``^P\\d+$``
    route to "wikidata", everything else to "dbpedia"; per-KG input order is
    preserved.
    """
    out: dict[str, list[str]] = {"wikidata": [], "dbpedia": []}
    for i in ids:
        out["wikidata" if _WIKIDATA_ID.match(i) else "dbpedia"].append(i)
    return out
