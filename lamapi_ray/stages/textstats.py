"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All are stateless vectorized ``map_batches`` stages over the documents
table. No Python executes per row or per token in any of them: tokenization
is ``pc.split_pattern``, stopword counting is ``pc.is_in`` + ``np.bincount``
over list-parent indices, distinct-token counting is a dictionary-encode +
``np.unique`` over (row, code) pairs, and the rolling fingerprint is a
block-Horner polynomial fold in uint64 numpy with an exact
mod-(2^61-1) multiply (32-bit limb decomposition).

The arithmetic is written in the exact operand order the DuckDB oracle
uses, so float results are bit-identical before rounding; decimal rounding
goes through printf-style formatting (``round_ref`` convention) on both
sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

_STOP_ARRAYS = {
    lg: pa.array(sorted(sl), pa.string()) for lg, sl in STOPLISTS.items() if sl
}

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def round_ref_array(arr: np.ndarray, nd: int) -> np.ndarray:
    """Vectorized ``round_ref``: printf-style correctly-rounded decimal
    rounding (ties-to-even on the exact binary value) — identical to the
    scalar ``float(f"%.{nd}f" % x)`` and to DuckDB ``printf``."""
    return np.char.mod(f"%.{nd}f", np.asarray(arr, dtype=np.float64)).astype(
        np.float64
    )


def _tokens(batch: pa.Table, col: str = "text"):
    """→ (toks list array, flat tokens, parent row index per flat token, n)."""
    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    return toks, flat, parents, n


def _stop_counts(flat: pa.Array, parents: np.ndarray, nrows: int, value_set) -> np.ndarray:
    mask = pc.is_in(flat, value_set=value_set).to_numpy(zero_copy_only=False)
    return np.bincount(parents[mask], minlength=nrows).astype(np.float64)


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """(id, lang, lang_pred, en_ratio): stopword-ratio argmax heuristic."""
    nrows = len(batch)
    _, flat, parents, n = _tokens(batch)
    nf = n.astype(np.float64)
    scores = np.zeros((len(LANG_ORDER), nrows), dtype=np.float64)
    for k, lg in enumerate(LANG_ORDER):
        arr = _STOP_ARRAYS.get(lg)
        if arr is not None:
            scores[k] = _stop_counts(flat, parents, nrows, arr) / nf
    best = scores.argmax(axis=0)  # first max wins == LANG_ORDER preference
    best_score = scores.max(axis=0)
    lang_names = np.asarray(LANG_ORDER, dtype=object)
    preds = np.where(best_score > 0, lang_names[best], "unknown")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "lang_pred": pa.array(preds.tolist(), pa.string()),
            "en_ratio": pa.array(round_ref_array(scores[0], 4), pa.float64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """(id, n_tokens, stopword_ratio, mean_token_len, quality) — heuristic
    doc-quality score: length + stopword + token-shape mix, each clamped."""
    nrows = len(batch)
    _, flat, parents, n = _tokens(batch)
    nf = n.astype(np.float64)
    sr = _stop_counts(flat, parents, nrows, _STOP_ARRAYS["en"]) / nf
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    ml = np.bincount(parents, weights=tok_lens, minlength=nrows) / nf
    q = 0.4 * np.minimum(nf / 100, 1) + 0.3 * (1 - sr) + 0.3 * np.minimum(ml / 8, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n, pa.int64()),
            "stopword_ratio": pa.array(round_ref_array(sr, 4), pa.float64()),
            "mean_token_len": pa.array(round_ref_array(ml, 4), pa.float64()),
            "quality": pa.array(round_ref_array(q, 4), pa.float64()),
        }
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(id, n_ws_tokens, n_re_tokens, n_distinct_tokens)."""
    nrows = len(batch)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    _, flat, parents, n = _tokens(batch)
    rx = pc.count_substring_regex(text.cast(pa.string()), BPE_ISH_PATTERN)
    # distinct tokens per row: dictionary-encode the flat tokens, then count
    # unique (row, code) pairs — one np.unique over an int64 key
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    ncodes = len(enc.dictionary)
    pair_key = parents.astype(np.int64) * max(ncodes, 1) + codes
    uniq_rows = np.unique(pair_key) // max(ncodes, 1)
    dt = np.bincount(uniq_rows, minlength=nrows)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(n, pa.int64()),
            "n_re_tokens": rx.cast(pa.int64()),
            "n_distinct_tokens": pa.array(dt.astype(np.int64), pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# Rolling fingerprint: polynomial hash over utf-8 bytes, base 257 mod 2^61-1
# --------------------------------------------------------------------------

from lamapi_ray.functions.inthash import (  # noqa: E402
    MOD61,
    mulmod61 as _mulmod61,
    segsum_mod61 as _segsum_mod,
    string_bytes,
)

_FP_BASE = 257
_FP_MOD = MOD61
_FP_BLOCK = 64  # bytes per vectorized Horner block

_POW_IN_BLOCK = np.array(
    [pow(_FP_BASE, _FP_BLOCK - 1 - i, _FP_MOD) for i in range(_FP_BLOCK)],
    dtype=np.uint64,
)
_BM = pow(_FP_BASE, _FP_BLOCK, _FP_MOD)
_BM_POWERS = [1]  # B^(block*j) mod p, extended on demand


def _bm_powers(k: int) -> np.ndarray:
    while len(_BM_POWERS) < k:
        _BM_POWERS.append((_BM_POWERS[-1] * _BM) % _FP_MOD)
    return np.asarray(_BM_POWERS[:k], dtype=np.uint64)


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash over utf-8 bytes (mod 2^61-1, base 257).

    Scalar reference implementation — kept for tests; the batch path is
    :func:`fingerprint_batch`."""
    h = 0
    for byte in text.encode("utf-8"):
        h = (h * _FP_BASE + byte) % _FP_MOD
    return h


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Vectorized block-Horner: every doc's bytes are front-padded with
    zeros to a block multiple (leading zero bytes do not change the
    polynomial value), all blocks of all docs form ONE (num_blocks, 64)
    matrix, block values are a mulmod + segmented sum, and the per-doc
    combine is mulmod against precomputed B^(64·j) powers + one more
    segmented sum — no per-byte (or per-row) Python anywhere."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = text.cast(pa.string())
    nrows = len(text)
    if nrows == 0:
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array([], pa.int64())}
        )
    data, offsets = string_bytes(text)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    kblocks = np.maximum((lens + _FP_BLOCK - 1) // _FP_BLOCK, 1)
    padded_lens = kblocks * _FP_BLOCK
    total = int(padded_lens.sum())
    # scatter each doc's bytes into its right-aligned padded slot
    padded = np.zeros(total, dtype=np.uint64)
    doc_ends = np.cumsum(padded_lens)
    byte_parent = np.repeat(np.arange(nrows), lens)
    within = np.arange(len(byte_parent)) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    dest = np.repeat(doc_ends - lens, lens) + within
    src = np.repeat(offsets[:-1], lens) + within
    padded[dest] = data[src]
    # block values: one mulmod over the whole matrix + row sums
    blocks = padded.reshape(-1, _FP_BLOCK)
    prods = _mulmod61(blocks, _POW_IN_BLOCK[None, :]).reshape(-1)
    block_starts = np.arange(blocks.shape[0]) * _FP_BLOCK
    v = _segsum_mod(prods, block_starts)  # one value per block, < 2^61
    # per-doc combine: v_j * B^(64*(K-1-j)), summed mod p per doc
    k_rep = np.repeat(kblocks, kblocks)
    block_within = np.arange(len(v)) - np.repeat(
        np.concatenate([[0], np.cumsum(kblocks)[:-1]]), kblocks
    )
    mult_idx = (k_rep - 1 - block_within).astype(np.int64)
    powers = _bm_powers(int(kblocks.max()))[mult_idx]
    doc_starts = np.concatenate([[0], np.cumsum(kblocks)[:-1]]).astype(np.int64)
    fps = _segsum_mod(_mulmod61(v, powers), doc_starts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps.astype(np.int64), pa.int64()),
        }
    )
