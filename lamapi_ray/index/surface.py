"""Surface-form index build + in-memory candidate retrieval index.

Replaces the reference's Elasticsearch ``wikidata`` index
(scripts/elastic_indexing.py + scripts/index_confs/kg_schema.json) with:

1. :func:`build_surface_forms` — a Ray Data pipeline that fans each KG item
   out to one row per unique surface form (label/alias, lowercase-deduped,
   label-beats-alias — elastic_indexing.py:123-138), adds PERS
   dot-abbreviation aliases (:38-54,147-152), and normalizes popularity by
   the global max in a two-pass pattern (:88-93,172).
2. :class:`SurfaceIndex` — the in-memory token inverted index held by the
   candidate-generation actor pool (the batch replacement for ES BM25
   retrieval). Deterministic retrieval spec is documented on
   :meth:`SurfaceIndex.candidates`.

At test scale the surface_forms table is broadcast once via ``ray.put`` and
read by every actor; at Wikidata scale (~10^8 surface rows) the documented
scale path is sharding the index by ``hash(first_token(surface_norm))`` and
routing mention batches to the matching shard (same key the canonicalization
shuffle already uses) — the retrieval code below only ever touches postings
for the mention's own tokens, so it is shard-local by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lamapi_ray.functions.text import clean_str, dot_abbreviations, round_ref, scored_pair


def lucene_byte4_roundtrip(n: np.ndarray) -> np.ndarray:
    """Lucene ``SmallFloat.intToByte4`` → ``byte4ToInt`` round-trip, i.e.
    the doc length a BM25 scorer actually sees after the 1-byte norm
    encoding (Lucene core ``util/SmallFloat.java``): values below
    NUM_FREE_VALUES=24 are stored raw (exact); larger values encode
    ``m = n - 24`` with ``longToInt4`` (top 4 significant bits of m,
    leading bit implicit, so m < 16 is exact) and decode back to
    ``24 + int4ToLong(...)`` — e.g. 25→25, 39→39 (exact up to 39),
    40→40, 43→42, 100→96, 1000→984. Vectorized, exact integer math
    (no float log2 — bit-length by binary descent)."""
    n = np.asarray(n, dtype=np.int64)
    out = n.copy()
    big = n >= 24
    if big.any():
        m = n[big] - 24
        bits = np.zeros_like(m)
        x = m.copy()
        for s in (32, 16, 8, 4, 2, 1):
            mask = x >= (np.int64(1) << s)
            bits[mask] += s
            x[mask] >>= s
        # bit_length(m) = bits+1 for m>=1; shift = max(bit_length-4, 0)
        shift = np.maximum(bits - 3, 0)
        out[big] = 24 + ((m >> shift) << shift)
    return out


def _fan_out_items(batch: pa.Table, max_popularity: int) -> pa.Table:
    """items batch → surface-form rows (M6 + M7 + M8)."""
    out = {
        "id": [], "name": [], "surface_norm": [], "is_alias": [],
        "description": [], "kind": [], "NERtype": [], "types": [],
        "length": [], "ntoken": [], "popularity": [],
    }
    cols = batch.to_pydict()
    for i in range(len(batch)):
        label = cols["label"][i]
        aliases = cols["aliases"][i] or []
        nertype = cols["NERtype"][i]
        # lowercase-keyed merge; labels win over aliases (ref :123-138)
        unique: dict[str, tuple[str, bool]] = {}
        if label is not None:
            unique[label.lower()] = (label, False)
        for alias in aliases:
            key = alias.lower()
            if key in unique and not unique[key][1]:
                continue  # already present as a label → skip (ref :134-135)
            if key not in unique:
                unique[key] = (alias, True)
        if nertype == "PERS" and label is not None:  # ref :147-152
            for abbrev in dot_abbreviations(label):
                key = abbrev.lower()
                if key not in unique:
                    unique[key] = (abbrev, True)
        types_joined = " ".join(cols["types"][i] or [])
        pop_norm = round_ref(int(cols["popularity"][i]) / max_popularity, 2)
        for key, (name, is_alias) in unique.items():
            out["id"].append(cols["entity"][i])
            out["name"].append(name)
            out["surface_norm"].append(clean_str(name))
            out["is_alias"].append(is_alias)
            out["description"].append(cols["description"][i])
            out["kind"].append(cols["kind"][i])
            out["NERtype"].append(nertype)
            out["types"].append(types_joined)
            out["length"].append(len(name))       # ref :170
            out["ntoken"].append(len(name.split(" ")))  # ref :171
            out["popularity"].append(pop_norm)    # ref :172
    return pa.table(
        {
            "id": pa.array(out["id"], pa.string()),
            "name": pa.array(out["name"], pa.string()),
            "surface_norm": pa.array(out["surface_norm"], pa.string()),
            "is_alias": pa.array(out["is_alias"], pa.bool_()),
            "description": pa.array(out["description"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "NERtype": pa.array(out["NERtype"], pa.string()),
            "types": pa.array(out["types"], pa.string()),
            "length": pa.array(out["length"], pa.int64()),
            "ntoken": pa.array(out["ntoken"], pa.int64()),
            "popularity": pa.array(out["popularity"], pa.float64()),
        }
    )


def build_surface_forms(items: ray.data.Dataset) -> ray.data.Dataset:
    """Two-pass index build: global max popularity, then the fan-out map.

    Pass 1 is a global aggregate (``ds.max``), pass 2 broadcasts the scalar
    into a stateless ``map_batches`` — the same shape as the reference's
    max-popularity query + per-doc normalize (elastic_indexing.py:88-93,172).
    """
    max_pop = int(items.max("popularity"))
    return items.map_batches(
        _fan_out_items,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"max_popularity": max_pop},
    )


class SurfaceIndex:
    """In-memory surface-form index: exact map + token postings.

    Deterministic retrieval spec (the engine-wide contract; the DuckDB
    oracle in ``__ray_entry__`` reproduces it):

    for a normalized mention ``m`` with distinct token set ``M``:

    * hits = surface entries e with ``tokens(e) ∩ M ≠ ∅``  (whitespace +
      lowercase analyzer ≈ kg_schema.json:7-17 match query)
    * match_score(e) = |tokens(e) ∩ M| / max(ntoken_e, ntoken_m, 1),
      doubled when ``surface_norm == m`` (the reference's ``boost: 2`` on
      exact name, lookup_retriever.py:283)
    * hit order: popularity DESC, match_score DESC, id ASC,
      surface_norm ASC   (the reference sorts by popularity desc —
      lookup_retriever.py:264; the rest is a deterministic tie-break)
    * truncate to ``limit`` (default 1000 — params_validator.py:31-33)
    * pos_score = round((i+1)/len(hits), 3); es_score =
      round(match_score/max_match_score, 3)   (elastic.py:55-56 — note
      pos_score *increases* with worse rank, kept on purpose)
    """

    def __init__(self, surface_forms: pa.Table, type_names: dict[str, str]):
        self.ids = np.asarray(surface_forms["id"].to_pylist(), dtype=object)
        self.names = np.asarray(surface_forms["name"].to_pylist(), dtype=object)
        self.norms = np.asarray(surface_forms["surface_norm"].to_pylist(), dtype=object)
        self.is_alias = np.asarray(surface_forms["is_alias"].to_pylist(), dtype=bool)
        self.descriptions = np.asarray(surface_forms["description"].to_pylist(), dtype=object)
        self.kinds = np.asarray(surface_forms["kind"].to_pylist(), dtype=object)
        self.nertypes = np.asarray(surface_forms["NERtype"].to_pylist(), dtype=object)
        self.types_str = np.asarray(surface_forms["types"].to_pylist(), dtype=object)
        self.ntoken = np.asarray(surface_forms["ntoken"].to_pylist(), dtype=np.int64)
        # BM25 dl after Lucene's lossy 1-byte norm encoding (identity for
        # names under 24 tokens — i.e. for virtually every label/alias)
        self.ntoken_lucene = lucene_byte4_roundtrip(self.ntoken)
        self.length = np.asarray(surface_forms["length"].to_pylist(), dtype=np.int64)
        self.popularity = np.asarray(surface_forms["popularity"].to_pylist(), dtype=np.float64)
        # global physical row id: lets sharded retrieval merge partials per
        # surface ROW rather than per (id, surface_norm) — two distinct
        # surfaces of one entity (e.g. "A  B" vs "A B" aliases) can share a
        # norm after clean_str, and must stay separate rows
        if "_grow" in surface_forms.column_names:
            self.grow = np.asarray(surface_forms["_grow"].to_pylist(), dtype=np.int64)
        else:
            self.grow = np.arange(len(self.ids), dtype=np.int64)
        self.type_names = type_names

        from collections import Counter

        postings: dict[str, list[int]] = {}
        tfs: dict[str, list[int]] = {}
        for i, norm in enumerate(self.norms):
            for tok, cnt in Counter(norm.split(" ")).items():
                postings.setdefault(tok, []).append(i)
                tfs.setdefault(tok, []).append(cnt)
        self.postings = {t: np.asarray(ix, dtype=np.int64) for t, ix in postings.items()}
        # term frequency per (token, row) aligned with postings — BM25 input
        self.postings_tf = {t: np.asarray(v, dtype=np.int64) for t, v in tfs.items()}
        # per-row type-name strings resolved once (J2) — constant per surface
        self.type_names_joined = np.asarray(
            [
                " ".join(type_names.get(t, t) for t in ts.split(" ") if t)
                for ts in self.types_str
            ],
            dtype=object,
        )
        # vocabulary of full surface forms for the mention scanner
        self.surface_vocab = set(self.norms.tolist())
        self.max_surface_tokens = int(self.ntoken.max()) if len(self.ntoken) else 1
        self._bigram_index: dict[str, list[str]] | None = None

    @staticmethod
    def auto_fuzz(token: str) -> int:
        """ES ``fuzziness: "auto"`` edit-distance budget by term length:
        0 for <3 chars, 1 for 3-5, 2 for >5 (lookup_retriever.py:268)."""
        n = len(token)
        return 0 if n < 3 else (1 if n <= 5 else 2)

    def _fuzzy_vocab_matches(self, token: str) -> list[str]:
        """Vocabulary tokens within the AUTO edit-distance budget of
        ``token`` — candidate generation via a char-bigram index over the
        (bounded) token vocabulary, then exact Levenshtein verification."""
        from lamapi_ray.functions.text import levenshtein

        fz = self.auto_fuzz(token)
        if fz == 0:
            return [token] if token in self.postings else []
        if self._bigram_index is None:
            bindex: dict[str, list[str]] = {}
            for tok in self.postings:
                grams = (
                    {tok[i : i + 2] for i in range(len(tok) - 1)} if len(tok) > 1 else {tok}
                )
                for g in grams:
                    bindex.setdefault(g, []).append(tok)
            self._bigram_index = bindex
        grams = (
            {token[i : i + 2] for i in range(len(token) - 1)}
            if len(token) > 1
            else {token}
        )
        cand: set[str] = set()
        for g in grams:
            cand.update(self._bigram_index.get(g, ()))
        # len-3 tokens (fz=1): a single middle-char edit destroys BOTH
        # bigrams ("abc"→"aXc"), so the bigram prefilter alone would miss
        # legal matches — brute-check the (small) length-2..4 vocab slice
        if len(token) == 3:
            if not hasattr(self, "_short_vocab"):
                self._short_vocab = [t for t in self.postings if 2 <= len(t) <= 4]
            cand.update(self._short_vocab)
        out = []
        for c in cand:
            if abs(len(c) - len(token)) <= fz and levenshtein(token, c) <= fz:
                out.append(c)
        return sorted(out)

    def retrieve(
        self,
        mention: str,
        limit: int = 1000,
        fuzzy: bool = False,
        kind: str | None = None,
        nertype: str | None = None,
        types: str | None = None,
    ):
        """→ (hit_idx ordered, match_score per hit) or empty arrays.

        Non-fuzzy: hits share ≥1 exact token with the mention and an exact
        full-surface match doubles the score (the reference's ``boost: 2``,
        lookup_retriever.py:283). Fuzzy (``fuzziness: "auto"``,
        :266-268): a mention token also matches entry tokens within its
        AUTO edit-distance budget, shared = number of DISTINCT mention
        tokens matched, and no exact boost is applied (the reference only
        boosts in the non-fuzzy branch). ``kind``/``nertype`` are exact
        term filters; ``types`` is a whitespace-analyzed match — the entry
        passes if it carries ANY of the requested type ids (:271-280)."""
        idx, shared = self._hit_set(
            mention, fuzzy=fuzzy, kind=kind, nertype=nertype, types=types
        )
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        mtokens = mention.split(" ")
        denom = np.maximum(self.ntoken[idx], max(len(mtokens), 1)).astype(np.float64)
        score = shared / denom
        if not fuzzy:
            exact = self.norms[idx] == mention
            score = np.where(exact, score * 2.0, score)
        # strict total order: (-popularity, -match_score, id, surface_norm)
        order = np.lexsort(
            (self.norms[idx], self.ids[idx], -score, -self.popularity[idx])
        )
        order = order[:limit]
        return idx[order], score[order]

    def _hit_set(
        self,
        mention: str,
        fuzzy: bool = False,
        kind: str | None = None,
        nertype: str | None = None,
        types: str | None = None,
        own_tokens: set | None = None,
    ):
        """→ (idx, shared) — the UNORDERED hit set with shared-token counts.

        ``own_tokens``: restrict matching to this token subset (the sharded
        index path — each shard owns a disjoint token set and partial
        shared counts sum to the broadcast path's totals)."""
        mset = sorted(set(mention.split(" ")))
        if own_tokens is not None:
            mset = [t for t in mset if t in own_tokens]
        if not fuzzy:
            lists = [self.postings[t] for t in mset if t in self.postings]
            if not lists:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            cat = np.concatenate(lists)
            idx, shared = np.unique(cat, return_counts=True)
        else:
            nrows = len(self.ids)
            counts = np.zeros(nrows, dtype=np.int64)
            for t in mset:
                matched = self._fuzzy_vocab_matches(t)
                if not matched:
                    continue
                hit = np.unique(
                    np.concatenate([self.postings[v] for v in matched])
                )
                counts[hit] += 1
            idx = np.nonzero(counts)[0].astype(np.int64)
            if len(idx) == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            shared = counts[idx]
        if kind is not None or nertype is not None or types is not None:
            mask = np.ones(len(idx), dtype=bool)
            if kind is not None:
                mask &= self.kinds[idx] == kind
            if nertype is not None:
                mask &= self.nertypes[idx] == nertype
            if types is not None:
                wanted = set(types.split(" "))
                mask &= np.asarray(
                    [bool(wanted & set(ts.split(" "))) for ts in self.types_str[idx]],
                    dtype=bool,
                )
            idx, shared = idx[mask], shared[mask]
        return idx, shared

    BM25_K1 = 1.2
    BM25_B = 0.75

    def bm25_hits(self, mention: str, limit: int = 1000):
        """ES/Lucene BM25 relevance ordering over the whitespace+lowercase-
        analyzed name field — the reference's actual hit order
        (api/model/elastic.py:31-64 returns ES-scored hits; ES default
        similarity is BM25 with k1=1.2, b=0.75).

        score(row) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        with idf = ln(1 + (N−df+0.5)/(df+0.5)), tf = term count in the name,
        dl = name token length, df = #rows containing t, N = #rows. The
        match query's ``boost: 2`` (lookup_retriever.py:283) scales every
        score uniformly and cancels in ``es_score = score/max_score``, so it
        is omitted. ES breaks score ties by internal doc order; we use the
        deterministic (popularity desc, id, surface) order instead —
        documented deviation, stable across runs. dl goes through Lucene's
        lossy 1-byte norm encoding (:func:`lucene_byte4_roundtrip` — raw
        below 24 tokens, top-4-significant-bits above); avgdl stays exact
        (Lucene computes it as sumTotalTermFreq/docCount, not from norms).

        → (hit_idx ordered, bm25 score per hit)."""
        mset = sorted(set(mention.split(" ")))
        nrows = len(self.ids)
        if nrows == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        avgdl = float(self.ntoken.mean()) if nrows else 1.0
        score = np.zeros(nrows, dtype=np.float64)
        hit = np.zeros(nrows, dtype=bool)
        k1, b = self.BM25_K1, self.BM25_B
        for t in mset:
            rows = self.postings.get(t)
            if rows is None:
                continue
            tf = self.postings_tf[t].astype(np.float64)
            dl = self.ntoken_lucene[rows].astype(np.float64)
            df = len(rows)
            idf = np.log(1.0 + (nrows - df + 0.5) / (df + 0.5))
            score[rows] += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            hit[rows] = True
        idx = np.nonzero(hit)[0].astype(np.int64)
        if len(idx) == 0:
            return idx, np.empty(0, np.float64)
        sc = score[idx]
        order = np.lexsort(
            (self.norms[idx], self.ids[idx], -self.popularity[idx], -sc)
        )[:limit]
        return idx[order], sc[order]

    def _hit_masks(
        self,
        mention: str,
        fuzzy: bool = False,
        kind: str | None = None,
        nertype: str | None = None,
        types: str | None = None,
    ):
        """→ (idx, mask) — like :meth:`_hit_set` but per hit row an int64
        BITMASK of which of the mention's sorted-distinct tokens matched
        (bit i ↔ ``sorted(set(tokens))[i]``). popcount(mask) equals the
        broadcast ``shared`` count, and masks OR across index shards
        without double counting a (row, token) match found in two shards —
        the property the sharded FUZZY path needs (one mention token can
        match two different vocabulary tokens owned by different shards)."""
        mset = sorted(set(mention.split(" ")))
        if len(mset) > 63:
            raise ValueError("mention has more than 63 distinct tokens")
        nrows = len(self.ids)
        masks = np.zeros(nrows, dtype=np.int64)
        for i, t in enumerate(mset):
            if fuzzy:
                matched = self._fuzzy_vocab_matches(t)
                lists = [self.postings[v] for v in matched if v in self.postings]
            else:
                lists = [self.postings[t]] if t in self.postings else []
            if not lists:
                continue
            hit = np.unique(np.concatenate(lists))
            masks[hit] |= np.int64(1 << i)
        idx = np.nonzero(masks)[0].astype(np.int64)
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        mask = masks[idx]
        if kind is not None or nertype is not None or types is not None:
            keep = np.ones(len(idx), dtype=bool)
            if kind is not None:
                keep &= self.kinds[idx] == kind
            if nertype is not None:
                keep &= self.nertypes[idx] == nertype
            if types is not None:
                wanted = set(types.split(" "))
                keep &= np.asarray(
                    [bool(wanted & set(ts.split(" "))) for ts in self.types_str[idx]],
                    dtype=bool,
                )
            idx, mask = idx[keep], mask[keep]
        return idx, mask

    def hit_rows(self, idx: np.ndarray, shared: np.ndarray) -> dict:
        """Materialize hit rows (column → numpy array) for scoring."""
        return {
            "id": self.ids[idx],
            "name": self.names[idx],
            "norm": self.norms[idx],
            "description": self.descriptions[idx],
            "kind": self.kinds[idx],
            "nertype": self.nertypes[idx],
            "types_str": self.types_str[idx],
            "type_names": self.type_names_joined[idx],
            "ntoken": self.ntoken[idx],
            "length": self.length[idx],
            "popularity": self.popularity[idx],
            "shared": np.asarray(shared, dtype=np.int64),
            "grow": self.grow[idx],
        }

    def candidates(
        self,
        mention: str,
        limit: int = 1000,
        fuzzy: bool = False,
        kind: str | None = None,
        nertype: str | None = None,
        types: str | None = None,
    ) -> list[dict]:
        """Fully scored, per-entity-deduped candidate list for one mention.

        Output schema/formulas per reference lookup_retriever.py:137-182 +
        elastic.py:49-63; ambiguity features per lookup_retriever.py:118-135
        (A5) computed over the same hit list; per-entity best-candidate dedup
        (A6) keeps max (ed+jaccard), first-seen on ties. ``fuzzy``/``kind``/
        ``nertype``/``types`` mirror the query-builder params
        (lookup_retriever.py:261-290) — see :meth:`retrieve`.

        Documented deviations: (a) the reference's ambiguity count is
        iteration-order dependent (an id first seen with a non-matching
        surface is never counted); we count a distinct id when *any* of its
        hit surfaces exact-matches — an order-independent, well-defined
        variant. (b) With filters, the reference computes ambiguity via a
        separate UNfiltered token query (:118-135, 242-244); we compute it
        over the filtered hit list so the feature describes the returned
        candidates.
        """
        idx, shared = self._hit_set(
            mention, fuzzy=fuzzy, kind=kind, nertype=nertype, types=types
        )
        if len(idx) == 0:
            return []
        return score_hit_rows(
            mention, self.hit_rows(idx, shared), limit, fuzzy=fuzzy
        )

    def candidate_arrays(
        self,
        mention: str,
        limit: int = 1000,
        fuzzy: bool = False,
        kind: str | None = None,
        nertype: str | None = None,
        types: str | None = None,
    ) -> dict | None:
        """Column-array variant of :meth:`candidates` (same kernel) — one
        numpy array per candidate field, for batch assemblers that
        concatenate instead of appending per-candidate dicts."""
        idx, shared = self._hit_set(
            mention, fuzzy=fuzzy, kind=kind, nertype=nertype, types=types
        )
        if len(idx) == 0:
            return None
        return score_hit_rows_arrays(
            mention, self.hit_rows(idx, shared), limit, fuzzy=fuzzy
        )


def _round_arr(a: np.ndarray, nd: int) -> np.ndarray:
    """Vectorized :func:`round_ref` — same ``%.NDf`` correctly-rounded
    formatting applied element-wise (np.char.mod uses CPython's ``%``), so
    values are bit-identical to the scalar path / DuckDB printf oracle."""
    if len(a) == 0:
        return a.astype(np.float64)
    return np.char.mod(f"%.{nd}f", a.astype(np.float64)).astype(np.float64)


def score_hit_rows_arrays(
    mention: str, rows: dict, limit: int = 1000, fuzzy: bool = False
) -> dict | None:
    """Order + score an UNORDERED hit-row set for one mention — the shared
    scoring kernel of the broadcast path (:meth:`SurfaceIndex.candidates`)
    and the sharded path (stages/candidates_sharded.py), guaranteeing the
    two produce identical candidates.

    ``rows``: column → numpy array (see :meth:`SurfaceIndex.hit_rows`),
    including per-row ``shared`` token counts. Applies the match-score
    formula (+ exact ×2 boost unless fuzzy), the strict
    (popularity, match, id, surface) order, the ``limit`` truncation, A5
    ambiguity features, F1-F3 scores, O4 rank scores, and A6 per-entity
    dedup — formulas per reference lookup_retriever.py:118-182 +
    elastic.py:49-63.

    Returns column → numpy array (one element per surviving candidate, in
    the reference's first-occurrence-of-id order), or ``None`` when the
    hit set is empty — so batch assemblers can concatenate arrays instead
    of appending per-candidate Python dicts."""
    mtokens = mention.split(" ")
    shared = rows["shared"].astype(np.float64)
    denom = np.maximum(rows["ntoken"], max(len(mtokens), 1)).astype(np.float64)
    score = shared / denom
    if not fuzzy:
        exact = rows["norm"] == mention
        score = np.where(exact, score * 2.0, score)
    order = np.lexsort((rows["norm"], rows["id"], -score, -rows["popularity"]))
    order = order[:limit]
    r = {k: v[order] for k, v in rows.items()}
    match = score[order]
    n = len(order)
    if n == 0:
        return None

    mset = set(mtokens)

    # A5 ambiguity features over the (ordered, truncated) hit list
    exact = r["norm"] == mention
    distinct_ids = set(r["id"].tolist())
    exact_ids = set(r["id"][exact].tolist())
    ambiguity = round_ref(len(exact_ids) / len(distinct_ids), 3) if distinct_ids else 0
    hit_tokens: set[str] = set()
    for norm in r["norm"]:
        hit_tokens.update(norm.split(" "))
    corrects = round_ref(len(mset & hit_tokens) / len(mset), 3)

    max_match = float(match.max())

    # F1-F3 per rank (scored_pair is lru-cached on the (surface, mention)
    # pair, so repeated surfaces cost one DP each)
    eds = np.empty(n, np.float64)
    jacs = np.empty(n, np.float64)
    jac3s = np.empty(n, np.float64)
    norms = r["norm"]
    for rank in range(n):
        eds[rank], jacs[rank], jac3s[rank] = scored_pair(norms[rank], mention)

    # A6 per-entity dedup: keep max (ed+jac) per id, FIRST rank on ties;
    # output order = first-occurrence order of ids (the reference's
    # history-dict insertion-order semantics, lookup_retriever.py:177-180)
    key = eds + jacs
    ids = r["id"]
    sel: dict = {}
    for rank in range(n):
        prev = sel.get(ids[rank])
        if prev is None or key[rank] > key[prev]:
            sel[ids[rank]] = rank
    w = np.fromiter(sel.values(), dtype=np.int64, count=len(sel))
    nw = len(w)
    return {
        "id": ids[w],
        "name": r["name"][w],
        "description": r["description"][w],
        "types": r["types_str"][w],
        "type_names": r["type_names"][w],
        "kind": r["kind"][w],
        "NERtype": r["nertype"][w],
        "ambiguity_mention": np.full(nw, float(ambiguity), np.float64),
        "corrects_tokens": np.full(nw, float(corrects), np.float64),
        "ntoken_mention": np.full(nw, len(mtokens), np.int64),
        "ntoken_entity": r["ntoken"][w].astype(np.int64, copy=False),
        "length_mention": np.full(nw, len(mention), np.int64),
        "length_entity": r["length"][w].astype(np.int64, copy=False),
        "popularity": r["popularity"][w].astype(np.float64, copy=False),
        "pos_score": _round_arr((w + 1).astype(np.float64) / n, 3),
        "es_score": _round_arr(match[w] / max_match, 3),
        "ed_score": eds[w],
        "jaccard_score": jacs[w],
        "jaccardNgram_score": jac3s[w],
    }


def score_hit_rows(
    mention: str, rows: dict, limit: int = 1000, fuzzy: bool = False
) -> list[dict]:
    """List-of-dicts view of :func:`score_hit_rows_arrays` (same kernel)."""
    cols = score_hit_rows_arrays(mention, rows, limit, fuzzy=fuzzy)
    if cols is None:
        return []
    keys = list(cols.keys())
    out = []
    for i in range(len(cols["id"])):
        d = {k: cols[k][i] for k in keys}
        d["ntoken_entity"] = int(d["ntoken_entity"])
        d["length_entity"] = int(d["length_entity"])
        d["popularity"] = float(d["popularity"])
        d["pos_score"] = float(d["pos_score"])
        d["es_score"] = float(d["es_score"])
        d["ed_score"] = float(d["ed_score"])
        d["jaccard_score"] = float(d["jaccard_score"])
        d["jaccardNgram_score"] = float(d["jaccardNgram_score"])
        d["ambiguity_mention"] = float(d["ambiguity_mention"])
        d["corrects_tokens"] = float(d["corrects_tokens"])
        d["ntoken_mention"] = int(d["ntoken_mention"])
        d["length_mention"] = int(d["length_mention"])
        out.append(d)
    return out
