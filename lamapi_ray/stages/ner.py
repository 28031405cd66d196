"""NER stage — stateful actor pool with a model loaded once per actor.

The reference wraps spaCy ``en_core_web_sm`` loaded once per process
(api/model/data_retrievers/ner_recognizer.py:7) and emits
``{mention, classification, start_index, end_index}`` per entity span
(:14-29). This container ships no spaCy, so the stage is the REAL actor-pool
plumbing (callable class, ``__init__``-time model load, batched
``__call__``) around a gated model:

* if ``spacy`` + the model import cleanly → real NER;
* else → a deterministic gazetteer fallback: spans whose lowercase form is
  in a broadcast surface→NERtype dictionary (the same dictionary the
  linking stage produces), classification mapped exactly like the
  reference maps spaCy labels (PERSON→PERS, ORG→ORG, GPE/LOC→LOC,
  else OTHERS — ner_recognizer.py label convention).

The output schema matches the reference either way, so swapping the real
model in changes no downstream code.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data
from lamapi_ray.stages.pool import pool_width

SPACY_LABEL_MAP = {
    "PERSON": "PERS",
    "ORG": "ORG",
    "GPE": "LOC",
    "LOC": "LOC",
}

NER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mention", pa.string()),
        ("classification", pa.string()),
        ("start_index", pa.int64()),
        ("end_index", pa.int64()),
    ]
)


def _load_spacy():  # pragma: no cover - spaCy absent from this container
    import spacy

    return spacy.load("en_core_web_sm")


class _Span:
    """spaCy ``Span`` surface: text / label_ / start_char / end_char."""

    __slots__ = ("text", "label_", "start_char", "end_char")

    def __init__(self, text, label, start, end):
        self.text = text
        self.label_ = label
        self.start_char = start
        self.end_char = end


class _Doc:
    __slots__ = ("ents",)

    def __init__(self, ents):
        self.ents = ents


class DeterministicLanguage:
    """A tiny spaCy-``Language``-compatible pipeline object — the real-model
    code path (``nlp(text).ents`` with ``text``/``label_``/``start_char``/
    ``end_char``) without the library. Rule-based and deterministic:
    maximal runs of Capitalized tokens become entity spans, labeled
    PERSON / ORG / GPE by suffix- and lexicon rules that mirror the label
    set the reference maps (ner_recognizer.py:14-29). Serializable, so it
    loads inside real Ray actors via ``fn_constructor_args``."""

    ORG_SUFFIXES = ("inc", "corp", "ltd", "llc", "gmbh", "co")
    GPE_LEXICON = frozenset(
        ["usa", "france", "italy", "germany", "japan", "london", "paris"]
    )

    def __call__(self, text: str) -> "_Doc":
        ents = []
        i = 0
        n = len(text)
        while i < n:
            # find the next Capitalized token
            if text[i].isupper():
                j = i
                # extend over consecutive "Xxx Xxx" tokens
                end = i
                while j < n:
                    # consume one token
                    k = j
                    while k < n and text[k] != " ":
                        k += 1
                    end = k
                    # peek at next token: continue only if Capitalized
                    if k < n and k + 1 < n and text[k + 1].isupper():
                        j = k + 1
                    else:
                        break
                span = text[i:end]
                toks = span.lower().split(" ")
                if toks[-1].rstrip(".") in self.ORG_SUFFIXES:
                    label = "ORG"
                elif any(t in self.GPE_LEXICON for t in toks):
                    label = "GPE"
                else:
                    label = "PERSON"
                ents.append(_Span(span, label, i, end))
                i = end + 1
            else:
                # skip to next token start
                while i < n and text[i] != " ":
                    i += 1
                i += 1
        return _Doc(ents)


def load_deterministic_language() -> DeterministicLanguage:
    """Module-level loader (picklable) for the deterministic pipeline."""
    return DeterministicLanguage()


class NERActor:
    """Model state loaded once per actor (reference loads spaCy once per
    process); batches scored in ``__call__``.

    ``model_loader`` returns a spaCy-like callable (``nlp(text).ents`` with
    ``text``/``label_``/``start_char``/``end_char``) — the default tries the
    real spaCy; tests inject a deterministic fake to exercise the
    real-model code path without the library."""

    def __init__(self, gazetteer_ref=None, model_loader=_load_spacy):
        try:
            self.nlp = model_loader()
        except (ImportError, OSError):
            # only the "library/model not installed" case falls back to the
            # gazetteer; a broken EXPLICIT loader must surface, not silently
            # degrade
            if model_loader is not _load_spacy:
                raise
            self.nlp = None
        self.gazetteer: dict[str, str] = (
            ray.get(gazetteer_ref) if gazetteer_ref is not None else {}
        )

    def _spans(self, text: str) -> list[tuple[str, str, int, int]]:
        if self.nlp is not None:
            doc = self.nlp(text)
            return [
                (
                    ent.text,
                    SPACY_LABEL_MAP.get(ent.label_, "OTHERS"),
                    ent.start_char,
                    ent.end_char,
                )
                for ent in doc.ents
            ]
        # deterministic gazetteer fallback: longest-match-first scan
        out = []
        low = text.lower()
        if not self.gazetteer:
            return out
        max_n = max(s.count(" ") + 1 for s in self.gazetteer)
        tokens = low.split(" ")
        # char offsets per token of the ORIGINAL text (single-space split)
        offsets = []
        pos = 0
        for t in text.split(" "):
            offsets.append(pos)
            pos += len(t) + 1
        i = 0
        while i < len(tokens):
            matched = False
            for n in range(min(max_n, len(tokens) - i), 0, -1):
                window = " ".join(tokens[i : i + n])
                if window in self.gazetteer:
                    start = offsets[i]
                    end = offsets[i + n - 1] + len(tokens[i + n - 1])
                    out.append((text[start:end], self.gazetteer[window], start, end))
                    i += n
                    matched = True
                    break
            if not matched:
                i += 1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            for mention, cls, s, e in self._spans(text or ""):
                rows.append(
                    {
                        "url": url,
                        "mention": mention,
                        "classification": cls,
                        "start_index": s,
                        "end_index": e,
                    }
                )
        return pa.Table.from_pylist(rows, schema=NER_SCHEMA)


def ner_pages(
    pages: ray.data.Dataset,
    gazetteer: dict[str, str] | None = None,
    concurrency: int = 2,
    model_loader=_load_spacy,
) -> ray.data.Dataset:
    """Actor-pool NER over (url, text) pages.

    ``model_loader`` must be picklable (module-level function) — it ships
    to each actor and runs ONCE in ``NERActor.__init__``; pass
    :func:`load_deterministic_language` to exercise the real-model path
    without spaCy installed."""
    gz_ref = ray.put(gazetteer or {})
    return pages.select_columns(["url", "text"]).map_batches(
        NERActor,
        batch_format="pyarrow",
        fn_constructor_args=(gz_ref, model_loader),
        concurrency=pool_width(concurrency),
        batch_size=512,
    )
