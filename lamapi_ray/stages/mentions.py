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

The vocabulary is broadcast once via ``ray.put`` as :class:`VocabHashes`
— per-window-width SORTED uint64 hash arrays (8 bytes per surface) instead
of a Python ``frozenset[str]`` (~100+ bytes per surface with set overhead).
At Wikidata scale (~10⁸ multi-word surfaces) that is the difference between
a ~1 GiB numpy broadcast and a multi-GiB per-worker Python set (~20×).
Membership is ``np.searchsorted`` on the sorted hashes; the hash space is
2^61 (polynomial hash, ``functions/inthash.py``), so a false-positive
mention is a ~n²/2^61 event — and the candidate stage's EXACT index lookup
discards any such mention downstream (no candidates → never linked).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from lamapi_ray.functions.inthash import hash_string_array
from lamapi_ray.functions.literals import check_literal


class VocabHashes:
    """Compressed broadcastable surface vocabulary for the mention scanner.

    ``by_width[w]`` is the sorted-unique uint64 hash array of all surfaces
    with exactly ``w`` tokens; ``first_tokens`` is the sorted-unique hash
    array of the FIRST token of every multi-token surface (the width>=2
    scan prefilter); ``max_n`` is the widest surface. Built vectorized from
    the surface_norm arrow column — no Python per surface."""

    __slots__ = ("by_width", "first_tokens", "max_n")

    def __init__(self, by_width, first_tokens, max_n):
        self.by_width = by_width
        self.first_tokens = first_tokens
        self.max_n = max_n

    @classmethod
    def from_surface_norms(cls, arr) -> "VocabHashes":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.cast(pa.string())
        if len(arr) == 0:
            return cls({}, None, 1)
        widths = pc.add(pc.count_substring(arr, " "), 1).to_numpy(
            zero_copy_only=False
        )
        h = hash_string_array(arr)
        by_width = {
            int(w): np.unique(h[widths == w]) for w in np.unique(widths)
        }
        first_tokens = None
        multi = widths >= 2
        if multi.any():
            firsts = pc.list_element(
                pc.utf8_split_whitespace(arr.filter(pa.array(multi))), 0
            )
            first_tokens = np.unique(hash_string_array(firsts))
        return cls(by_width, first_tokens, int(widths.max()))

    @classmethod
    def from_strings(cls, vocab) -> "VocabHashes":
        """From any iterable of surface strings (tests / small inputs)."""
        return cls.from_surface_norms(pa.array(sorted(vocab), pa.string()))


def _in_sorted(h: np.ndarray, sorted_arr: np.ndarray | None) -> np.ndarray:
    """Vectorized membership of uint64 ``h`` in a sorted-unique array."""
    if sorted_arr is None or len(sorted_arr) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=bool)
    pos = np.searchsorted(sorted_arr, h)
    pos[pos == len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[pos] == h


# single-slot per-worker cache (key, MentionScanner) — replaced on a new
# vocab ref instead of accumulating one scanner per past run
_SCANNER_CACHE: list = [None, None]
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
    paying the derivation cost once per worker process, not per batch.

    The scan itself is fully vectorized: tokens come from
    ``utf8_lower`` + whitespace split (arrow kernels, equivalent to the
    reference's ``clean_str`` normalization then split — utils.py:42-44);
    n-gram windows of width 1..max_n are built by joining SHIFTED slices of
    the flat token array (one ``binary_join_element_wise`` per width, page
    boundaries masked via ``list_parent_indices``); membership is one
    vectorized hash + ``searchsorted`` per width against the per-width
    sorted vocabulary hashes (:class:`VocabHashes`). No Python executes per
    token — only per HIT (mentions + literal tokens, a few per page)."""

    def __init__(self, vocab: "VocabHashes | frozenset[str]", max_n: int):
        if not isinstance(vocab, VocabHashes):
            vocab = VocabHashes.from_strings(vocab)
        self.vocab = vocab
        self.max_n = max_n
        self.vocab_hashes = vocab.by_width
        # first-token hashes of all multi-token surfaces — the width>=2
        # prefilter: an n-gram can only match if its first token starts
        # SOME multi-token surface, so the expensive join+hash probe runs
        # only at those (rare) start positions instead of every position
        self.first_tokens = vocab.first_tokens

    @classmethod
    def for_ref(cls, vocab_ref, max_n: int) -> "MentionScanner":
        key = (vocab_ref.hex() if hasattr(vocab_ref, "hex") else id(vocab_ref), max_n)
        if _SCANNER_CACHE[0] != key:
            _SCANNER_CACHE[0] = key
            _SCANNER_CACHE[1] = cls(ray.get(vocab_ref), max_n)
        return _SCANNER_CACHE[1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        npages = len(batch)
        text = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        toks_list = pc.utf8_split_whitespace(
            pc.utf8_lower(pc.fill_null(text.cast(pa.string()), ""))
        )
        flat = pc.list_flatten(toks_list)
        parents = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
        nflat = len(flat)

        # ONE hash pass over the token stream: dictionary-encode, then run
        # every membership test (width-1 vocab, width>=2 first-token
        # prefilter, literal classification) on the DISTINCT dictionary and
        # broadcast the verdicts back with integer gathers — the old scan
        # paid a full string-hash pass per test
        if nflat:
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            dictv = enc.dictionary

        # hits: (page_idx, surface) accumulated over all window widths
        hit_pages: list[np.ndarray] = []
        hit_vals: list[pa.Array] = []
        # hash ONCE per distinct token; every width-1 / prefilter probe is
        # then a searchsorted on the (tiny) dictionary hash array
        if nflat:
            dhash = hash_string_array(dictv)
        # width 1: dictionary-level membership + integer gather
        vocab1 = self.vocab_hashes.get(1)
        if vocab1 is not None and nflat:
            dmask = _in_sorted(dhash, vocab1)
            idx = np.nonzero(dmask[codes])[0]
            if len(idx):
                hit_pages.append(parents[idx])
                hit_vals.append(pc.take(flat, pa.array(idx)))
        # widths >= 2: prefilter to positions whose token STARTS some
        # multi-token surface — only those few positions pay the n-gram
        # join + membership probe (vs materializing full-length gram
        # arrays per width, the dominant memory traffic of the old scan)
        if self.first_tokens is not None and nflat >= 2:
            fdict = _in_sorted(dhash, self.first_tokens)
            starts = np.nonzero(fdict[codes])[0]
            for width in range(2, self.max_n + 1):
                vocab_arr = self.vocab_hashes.get(width)
                if vocab_arr is None or len(starts) == 0:
                    continue
                cand = starts[starts + width - 1 < nflat]
                # window must not cross a page boundary
                cand = cand[parents[cand] == parents[cand + width - 1]]
                if len(cand) == 0:
                    continue
                parts = [
                    pc.take(flat, pa.array(cand + k)) for k in range(width)
                ]
                grams = pc.binary_join_element_wise(*parts, " ")
                mask = _in_sorted(hash_string_array(grams), vocab_arr)
                idx = np.nonzero(mask)[0]
                if len(idx):
                    hit_pages.append(parents[cand[idx]])
                    hit_vals.append(pc.take(grams, pa.array(idx)))

        page_mentions: list[set] = [set() for _ in range(npages)]
        for pages_arr, vals in zip(hit_pages, hit_vals):
            for p, v in zip(pages_arr, vals.to_pylist()):
                page_mentions[p].add(v)

        # literal tokens: classify the (memoized) dictionary values, then
        # locate the (rare) non-STRING tokens via an integer gather on codes
        page_lits: list[set] = [set() for _ in range(npages)]
        if nflat:
            dvals = dictv.to_pylist()
            ldict = np.fromiter(
                (bool(t) and _classify(t) != "STRING" for t in dvals),
                dtype=bool,
                count=len(dvals),
            )
            if ldict.any():
                lidx = np.nonzero(ldict[codes])[0]
                lvals = pc.take(flat, pa.array(lidx)).to_pylist()
                for p, v in zip(parents[lidx], lvals):
                    page_lits[p].add(v)

        mentions_col = [sorted(s) for s in page_mentions]
        lit_sorted = [sorted(s) for s in page_lits]
        lit_vals_col = lit_sorted
        lit_dts_col = [[_classify(v) for v in vs] for vs in lit_sorted]
        return pa.table(
            {
                "url": batch["url"],
                "mentions": pa.array(mentions_col, pa.list_(pa.string())),
                "lit_values": pa.array(lit_vals_col, pa.list_(pa.string())),
                "lit_datatypes": pa.array(lit_dts_col, pa.list_(pa.string())),
            }
        )


def scan_mentions(
    pages,
    vocab: "VocabHashes | frozenset[str]",
    max_tokens: int,
    concurrency=None,
    meter_args=None,
):
    """pages(url,text,…) → one row per page (url, mentions[], literals[]).

    ``vocab`` (a prebuilt :class:`VocabHashes`, or any iterable of surface
    strings which is hashed driver-side once) is put in the object store
    once; the scanner class re-reads it per worker (not per batch).
    ``meter_args=(actor, key)`` reports (pages_in, mentions_out, busy_sec)
    per batch to the run-metrics actor.
    """
    if not isinstance(vocab, VocabHashes):
        vocab = VocabHashes.from_strings(vocab)
    vocab_ref = ray.put(vocab)

    def scan(batch: pa.Table) -> pa.Table:
        return MentionScanner.for_ref(vocab_ref, max_tokens)(batch)

    if meter_args is not None:
        from lamapi_ray.state.metrics import meter

        def n_mentions(out: pa.Table) -> int:
            return int(
                pc.sum(pc.list_value_length(out["mentions"])).as_py() or 0
            )

        scan = meter(scan, "mention_scan", *meter_args, out_rows=n_mentions)

    return pages.select_columns(["url", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )
