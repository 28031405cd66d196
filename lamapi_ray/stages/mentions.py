"""Mention detection — token-window surface matching + literal tokens.

Stateless ``map_batches`` stage. For each page:

* normalize text with ``clean_str`` (lowercase + whitespace collapse — the
  canonical key, reference api/model/utils.py:42-44);
* slide token windows of width 1..max_surface_tokens over the token stream
  and emit every window whose joined form is in the surface vocabulary
  (the batch analogue of issuing one /lookup request per cell — each match
  becomes a "query" for the candidate-generation stage);
* separately classify every token with the literal regex taxonomy
  (reference api/model/literal_recognizer.py) — tokens that classify as a
  non-STRING literal are emitted as typed literal values, NOT as entity
  mentions (literals are not entity surfaces).

Output is ONE ROW PER PAGE with list columns::

    url:string, mentions:list<string>, lit_values:list<string>,
    lit_datatypes:list<string>

Keeping page-local facts in the row (instead of exploding to
(url, mention) rows) means every later per-page computation — entity
co-occurrence pairs, the page-subject choice for literal triples — is a
row-local vectorized map with NO url-keyed shuffle or join. Only
vocabulary-bounded distincts (mentions, triples) ever shuffle.

The vocabulary is broadcast once via ``ray.put`` (a frozenset of
surface_norm strings + the window width); tasks read it zero-copy from the
object store instead of re-shipping it per batch.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from lamapi_ray.functions.literals import check_literal
from lamapi_ray.functions.text import clean_str


_SCANNER_CACHE: dict = {}
# literal classification is pure per-token; memoize per worker process
_LIT_CACHE: dict[str, str] = {}


def _classify(tok: str) -> str:
    dt = _LIT_CACHE.get(tok)
    if dt is None:
        dt = check_literal(tok)
        if len(_LIT_CACHE) < 1_000_000:
            _LIT_CACHE[tok] = dt
    return dt


class MentionScanner:
    """Scanner state derived once per (worker, vocab) — cached module-level
    so the stage can run as stateless tasks (elastic scheduling) while still
    paying the derivation cost once per worker process, not per batch."""

    def __init__(self, vocab: frozenset[str], max_n: int):
        self.vocab = vocab
        self.max_n = max_n
        # first-token gate: windows can only start at a token that starts
        # some surface — prunes the inner loop sharply on head vocabularies
        self.first_tokens = frozenset(s.split(" ", 1)[0] for s in vocab)

    @classmethod
    def for_ref(cls, vocab_ref, max_n: int) -> "MentionScanner":
        key = vocab_ref.hex() if hasattr(vocab_ref, "hex") else id(vocab_ref)
        inst = _SCANNER_CACHE.get(key)
        if inst is None:
            inst = cls(ray.get(vocab_ref), max_n)
            _SCANNER_CACHE[key] = inst
        return inst

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions_col: list[list[str]] = []
        lit_vals_col: list[list[str]] = []
        lit_dts_col: list[list[str]] = []
        texts = batch["text"].to_pylist()
        vocab = self.vocab
        first_tokens = self.first_tokens
        max_n = self.max_n
        for text in texts:
            tokens = clean_str(text).split(" ") if text else []
            seen: set[str] = set()
            ntok = len(tokens)
            for i, tok in enumerate(tokens):
                if tok in first_tokens:
                    for n in range(1, max_n + 1):
                        if i + n > ntok:
                            break
                        window = " ".join(tokens[i : i + n])
                        if window in vocab:
                            seen.add(window)
            lvals, ldts = [], []
            for tok in sorted(set(tokens)):
                dt = _classify(tok)
                if dt != "STRING":
                    lvals.append(tok)
                    ldts.append(dt)
            mentions_col.append(sorted(seen))
            lit_vals_col.append(lvals)
            lit_dts_col.append(ldts)
        return pa.table(
            {
                "url": batch["url"],
                "mentions": pa.array(mentions_col, pa.list_(pa.string())),
                "lit_values": pa.array(lit_vals_col, pa.list_(pa.string())),
                "lit_datatypes": pa.array(lit_dts_col, pa.list_(pa.string())),
            }
        )


def scan_mentions(pages, vocab: frozenset[str], max_tokens: int, concurrency=None):
    """pages(url,text,…) → one row per page (url, mentions[], literals[]).

    ``vocab`` is put in the object store once; the scanner class re-reads it
    per actor (not per batch).
    """
    vocab_ref = ray.put(vocab)

    def scan(batch: pa.Table) -> pa.Table:
        return MentionScanner.for_ref(vocab_ref, max_tokens)(batch)

    return pages.select_columns(["url", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )
