"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All are stateless vectorized ``map_batches`` stages over the documents
table. The arithmetic is written in the exact operand order the DuckDB
oracle uses, so float results are bit-identical before rounding.
"""

from __future__ import annotations

import re

import pyarrow as pa

from lamapi_ray.functions.text import round_ref

# fixed stoplists — tiny, deterministic; 'zh' has no latin stop tokens so it
# is never predicted on this corpus (the heuristic falls back to 'unknown'
# when no list matches at all)
STOPLISTS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "a", "and", "of", "to"}),
    "de": frozenset({"der", "die", "das", "und", "nicht"}),
    "es": frozenset({"el", "la", "los", "y", "que"}),
    "fr": frozenset({"le", "la", "les", "et", "des"}),
    "zh": frozenset(),
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]

BPE_ISH = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]+")


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """(id, lang, lang_pred, en_ratio): stopword-ratio argmax heuristic."""
    ids, langs, preds, ratios = [], [], [], []
    for i, lang, text in zip(
        batch["doc_id"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        toks = text.split(" ")
        n = len(toks)
        scores = {}
        for lg in LANG_ORDER:
            sl = STOPLISTS[lg]
            scores[lg] = sum(1 for t in toks if t in sl) / n
        best = max(LANG_ORDER, key=lambda lg: (scores[lg], -LANG_ORDER.index(lg)))
        pred = best if scores[best] > 0 else "unknown"
        ids.append(i)
        langs.append(lang)
        preds.append(pred)
        ratios.append(round_ref(scores["en"], 4))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "lang_pred": pa.array(preds, pa.string()),
            "en_ratio": pa.array(ratios, pa.float64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """(id, n_tokens, stopword_ratio, mean_token_len, quality) — heuristic
    doc-quality score: length + stopword + token-shape mix, each clamped."""
    ids, ntoks, ratios, mlens, scores = [], [], [], [], []
    en = STOPLISTS["en"]
    for i, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = text.split(" ")
        n = len(toks)
        stop_ratio = sum(1 for t in toks if t in en) / n
        mean_len = sum(len(t) for t in toks) / n
        q = 0.4 * min(n / 100, 1) + 0.3 * (1 - stop_ratio) + 0.3 * min(mean_len / 8, 1)
        ids.append(i)
        ntoks.append(n)
        ratios.append(round_ref(stop_ratio, 4))
        mlens.append(round_ref(mean_len, 4))
        scores.append(round_ref(q, 4))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
            "stopword_ratio": pa.array(ratios, pa.float64()),
            "mean_token_len": pa.array(mlens, pa.float64()),
            "quality": pa.array(scores, pa.float64()),
        }
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(id, n_ws_tokens, n_re_tokens, n_distinct_tokens)."""
    ids, ws, rx, dt = [], [], [], []
    for i, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = text.split(" ")
        ids.append(i)
        ws.append(len(toks))
        rx.append(len(BPE_ISH.findall(text)))
        dt.append(len(set(toks)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_ws_tokens": pa.array(ws, pa.int64()),
            "n_re_tokens": pa.array(rx, pa.int64()),
            "n_distinct_tokens": pa.array(dt, pa.int64()),
        }
    )


_FP_BASE = 257
_FP_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash over utf-8 bytes (mod 2^61-1, base 257)."""
    h = 0
    for byte in text.encode("utf-8"):
        h = (h * _FP_BASE + byte) % _FP_MOD
    return h


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    fps = [rolling_fingerprint(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "fingerprint": pa.array(fps, pa.int64()),
        }
    )
