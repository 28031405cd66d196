"""Distributed byte-pair-encoding (BPE) tokenizer training — the
tokenizer-construction step of an LLM data pipeline (Sennrich et al.
2016, the word-frequency formulation every production trainer uses).

Training never touches the corpus after ONE pass: it operates on the
``(word, count)`` table (vocabulary-bounded — the classic trick), so
each merge round is:

1. ``map_batches`` over the word table: adjacent symbol pairs weighted
   by word count, pre-aggregated within the batch (a combiner);
2. one symbol-pair groupby-sum (bounded by the live pair vocabulary);
3. argmax on the driver (count desc, then lexicographic (left, right)
   asc — fully deterministic) — a tiny reduce; tree-reduce it at
   10⁸-type vocabularies;
4. the winning pair broadcasts and every word's symbol sequence applies
   the merge (left-to-right, non-overlapping — the reference
   semantics).

Per-word symbol work is vocabulary-bounded (each WORD TYPE is touched
once per round, regardless of its corpus frequency), the same cost
class as the dedup family's per-distinct-token md5.

No SQL oracle exists for the argmax recursion (merges depend on data
through R rounds), so ``bpe_merges`` is the suite's single rows-only
entry; correctness is pinned by ``tests/test_bpe.py`` against an
independent scalar reference implementation (equality of the full merge
table and of encodings).

Reference anchor: lamAPI tokenizes with whitespace splits
(utils.py clean_str call sites); BPE belongs to the LLM-pipeline
surface this engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from lamapi_ray.stages.dedup import scaled_partitions
from lamapi_ray.stages.textstats import _tokens

SEP = "\x00"


def word_freq_table(docs: ray.data.Dataset, text_col: str = "text") -> pa.Table:
    """ONE corpus pass → (word, n) counts (vocabulary-bounded)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _tokens(batch, text_col)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table(
            {"word": enc.dictionary, "n": pa.array(counts, pa.int64())}
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word", num_partitions=scaled_partitions(1.0, 16))
        .aggregate(Sum("n"))
    )
    batches = list(agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(batches)
    return pa.table({"word": t["word"], "n": t["sum(n)"].cast(pa.int64())})


def _apply_merge(sym: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge of (left, right) → left+right."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train_bpe(
    docs: ray.data.Dataset, num_merges: int = 6, text_col: str = "text"
) -> pa.Table:
    """→ (rank, left, right, pair_count): the learned merge table."""
    wf = word_freq_table(docs, text_col)
    words = wf["word"].to_pylist()
    counts = wf["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    symbols = [list(w) for w in words]  # once per word TYPE

    merges: list[tuple[int, str, str, int]] = []
    for r in range(num_merges):
        # distributed round: pair partials per block of the word table
        tbl = pa.table(
            {
                "sym": pa.array(symbols, pa.list_(pa.string())),
                "n": pa.array(counts, pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(scaled_partitions(0.5, 4))

        def pair_partials(batch: pa.Table) -> pa.Table:
            sy = batch["sym"]
            if isinstance(sy, pa.ChunkedArray):
                sy = sy.combine_chunks()
            flat = pc.list_flatten(sy)
            lens = pc.list_value_length(sy).to_numpy(zero_copy_only=False)
            nb = batch["n"].to_numpy(zero_copy_only=False)
            offs = np.concatenate([[0], np.cumsum(lens)])
            total = int(lens.sum())
            if total == 0:
                return pa.table(
                    {"pair": pa.array([], pa.string()),
                     "c": pa.array([], pa.int64())}
                )
            # adjacent positions not crossing a word boundary
            word_of = np.repeat(np.arange(len(batch)), lens)
            valid = np.ones(total, dtype=bool)
            valid[offs[1:] - 1] = False  # last symbol of each word
            li = np.flatnonzero(valid)
            lefts = pc.take(flat, pa.array(li, pa.int64()))
            rights = pc.take(flat, pa.array(li + 1, pa.int64()))
            pair = pc.binary_join_element_wise(lefts, rights, SEP)
            w = nb[word_of[li]]
            enc = pc.dictionary_encode(
                pair.combine_chunks() if isinstance(pair, pa.ChunkedArray) else pair
            )
            codes = np.asarray(enc.indices, dtype=np.int64)
            sums = np.bincount(
                codes, weights=w.astype(np.float64), minlength=len(enc.dictionary)
            ).astype(np.int64)
            return pa.table(
                {"pair": enc.dictionary, "c": pa.array(sums, pa.int64())}
            )

        agg = (
            ds.map_batches(pair_partials, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pair", num_partitions=scaled_partitions(0.5, 8))
            .aggregate(Sum("c"))
        )
        pb = list(agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        if not pb:
            break
        pt = pa.concat_tables(pb)
        pairs = pt["pair"].to_pylist()
        cs = pt["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cs) == 0:
            break
        # argmax: count desc, then (left, right) lexicographic asc
        best = min(
            range(len(cs)), key=lambda i: (-int(cs[i]), pairs[i])
        )
        left, right = pairs[best].split(SEP)
        merges.append((r, left, right, int(cs[best])))
        symbols = [_apply_merge(s, left, right) for s in symbols]

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge table in rank order to one word."""
    sym = list(word)
    for left, right in merges:
        sym = _apply_merge(sym, left, right)
    return sym
