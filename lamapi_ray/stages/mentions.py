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
        urls_out: list[str] = []
        mentions_out: list[str] = []
        lit_urls: list[str] = []
        lit_values: list[str] = []
        lit_types: list[str] = []
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        for url, text in zip(urls, texts):
            tokens = clean_str(text).split(" ") if text else []
            seen: set[str] = set()
            lits: set[str] = set()
            ntok = len(tokens)
            for i, tok in enumerate(tokens):
                if tok in self.first_tokens:
                    for n in range(1, self.max_n + 1):
                        if i + n > ntok:
                            break
                        window = " ".join(tokens[i : i + n])
                        if window in self.vocab:
                            seen.add(window)
                lits.add(tok)
            for m in sorted(seen):
                urls_out.append(url)
                mentions_out.append(m)
            for tok in sorted(lits):
                dt = check_literal(tok)
                if dt != "STRING":
                    lit_urls.append(url)
                    lit_values.append(tok)
                    lit_types.append(dt)
        mention_rows = pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "mention": pa.array(mentions_out, pa.string()),
                "row_kind": pa.array(["mention"] * len(urls_out), pa.string()),
                "value": pa.array([None] * len(urls_out), pa.string()),
                "datatype": pa.array([None] * len(urls_out), pa.string()),
            }
        )
        literal_rows = pa.table(
            {
                "url": pa.array(lit_urls, pa.string()),
                "mention": pa.array([None] * len(lit_urls), pa.string()),
                "row_kind": pa.array(["literal"] * len(lit_urls), pa.string()),
                "value": pa.array(lit_values, pa.string()),
                "datatype": pa.array(lit_types, pa.string()),
            }
        )
        return pa.concat_tables([mention_rows, literal_rows])


def scan_mentions(pages, vocab: frozenset[str], max_tokens: int, concurrency=None):
    """pages(url,text,…) → rows (url, mention | literal value+datatype).

    ``vocab`` is put in the object store once; the scanner class re-reads it
    per actor (not per batch).
    """
    vocab_ref = ray.put(vocab)

    def scan(batch: pa.Table) -> pa.Table:
        return MentionScanner.for_ref(vocab_ref, max_tokens)(batch)

    return pages.select_columns(["url", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )
