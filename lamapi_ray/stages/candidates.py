"""Candidate-generation actor pool + linking — the lamAPI core, batch-native.

The reference answers one HTTP lookup per mention with Mongo-cached ES
queries (api/model/data_retrievers/lookup_retriever.py). Batch-native
re-expression:

1. **canonicalize**: ``groupby(surface_norm)`` dedups mentions so each
   distinct surface is scored exactly once — the shuffle that replaces the
   Mongo ``cache`` collection (memoization → batch dedup). Head surfaces
   ("red plate" appears in most pages) are *already* one row after this
   dedup, so the skew lives in the join back to pages, which is a broadcast
   (mention-level results are vocabulary-bounded, not page-bounded).
2. **CandidateGenerator** actor pool: each actor materializes the
   :class:`~lamapi_ray.index.surface.SurfaceIndex` ONCE in ``__init__``
   from a ``ray.put`` broadcast of the surface_forms table (zero-copy Arrow
   from the object store), then scores mention batches in ``__call__``.
3. **link_best**: per-mention argmax — deterministic linking rule
   ``max by (ed+jaccard+jaccardNgram, popularity, -id)``; candidates for a
   mention are emitted contiguously by the actor so the argmax is a local
   per-batch group-reduce, no extra shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from lamapi_ray.index.surface import SurfaceIndex

CANDIDATE_FIELDS: list[tuple[str, pa.DataType]] = [
    ("mention", pa.string()),
    ("id", pa.string()),
    ("name", pa.string()),
    ("description", pa.string()),
    ("types", pa.string()),
    ("type_names", pa.string()),
    ("kind", pa.string()),
    ("NERtype", pa.string()),
    ("ambiguity_mention", pa.float64()),
    ("corrects_tokens", pa.float64()),
    ("ntoken_mention", pa.int64()),
    ("ntoken_entity", pa.int64()),
    ("length_mention", pa.int64()),
    ("length_entity", pa.int64()),
    ("popularity", pa.float64()),
    ("pos_score", pa.float64()),
    ("es_score", pa.float64()),
    ("ed_score", pa.float64()),
    ("jaccard_score", pa.float64()),
    ("jaccardNgram_score", pa.float64()),
    ("is_best", pa.bool_()),
]
CANDIDATE_SCHEMA = pa.schema(CANDIDATE_FIELDS)


# single-slot per-worker cache (key, SurfaceIndex): repeated runs in one Ray
# session replace the slot instead of pinning every past index copy forever
_INDEX_CACHE: list = [None, None]


def surface_refs(surface) -> tuple:
    """Normalize a surface_forms input to a tuple of object refs.

    A ``pa.Table`` is ``ray.put`` once (one broadcast copy); a sequence of
    block refs (e.g. ``KGContext.surface_refs`` from ``to_arrow_refs``)
    passes through untouched — no driver-side copy at all, workers
    zero-copy concat the shared-memory blocks."""
    if isinstance(surface, pa.Table):
        return (ray.put(surface),)
    return tuple(surface)


def _refs_key(refs: tuple) -> tuple:
    return tuple(r.hex() if hasattr(r, "hex") else id(r) for r in refs)


class CandidateGenerator:
    """SurfaceIndex built once per worker process, scored per batch.

    Runs as STATELESS tasks (not an actor pool): the index is derived from a
    ``ray.put`` broadcast and memoized per worker keyed by the object ref,
    so warm workers from earlier stages are reused instead of paying an
    actor-process spawn + import per run. State cost is identical (one index
    per worker); scheduling is elastic.
    """

    def __init__(self, surface_ref, type_names_ref, limit: int = 1000, retrieve_kwargs=None):
        refs = surface_ref if isinstance(surface_ref, tuple) else (surface_ref,)
        key = _refs_key(refs)
        if _INDEX_CACHE[0] != key:
            # zero-copy concat of the shared-memory blocks (SurfaceIndex
            # reads via to_pylist, which handles chunked columns)
            table: pa.Table = pa.concat_tables(ray.get(list(refs)))
            type_names: dict = ray.get(type_names_ref)
            _INDEX_CACHE[0] = key
            _INDEX_CACHE[1] = SurfaceIndex(table, type_names)
        self.index = _INDEX_CACHE[1]
        self.limit = limit
        self.retrieve_kwargs = retrieve_kwargs or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        parts: dict[str, list] = {name: [] for name, _ in CANDIDATE_FIELDS}
        for mention in batch["mention"].to_pylist():
            cols = self.index.candidate_arrays(
                mention, self.limit, **self.retrieve_kwargs
            )
            if cols is None:
                continue
            n = len(cols["id"])
            # linking rule: argmax (ed+jaccard+jaccardNgram, popularity, id asc)
            # — computed here because a mention's candidates are guaranteed
            # local to the actor (no downstream batch-boundary hazard).
            total = cols["ed_score"] + cols["jaccard_score"] + cols["jaccardNgram_score"]
            best = np.lexsort((cols["id"], -cols["popularity"], -total))[0]
            is_best = np.zeros(n, dtype=bool)
            is_best[best] = True
            parts["mention"].append(np.full(n, mention, dtype=object))
            parts["is_best"].append(is_best)
            for name, _ in CANDIDATE_FIELDS:
                if name not in ("mention", "is_best"):
                    parts[name].append(cols[name])
        return pa.table(
            {
                name: pa.array(
                    np.concatenate(parts[name]) if parts[name] else [], type=typ
                )
                for name, typ in CANDIDATE_FIELDS
            }
        )


def generate_candidates(
    distinct_mentions: ray.data.Dataset,
    surface_forms,
    type_names: dict[str, str],
    limit: int = 1000,
    concurrency: int = 4,
    retrieve_kwargs: dict | None = None,
    meter_args=None,
) -> ray.data.Dataset:
    """distinct mentions (col ``mention``) → scored candidate rows.

    ``retrieve_kwargs`` forwards the query-builder params (``fuzzy``,
    ``kind``, ``nertype``, ``types`` — reference
    lookup_retriever.py:261-290) to :meth:`SurfaceIndex.candidates`.
    ``meter_args=(actor, key)`` reports (mentions_in, candidates_out,
    busy_sec) per batch — fan-out and link-score latency derive from it.

    ``surface_forms`` may be a ``pa.Table`` or a sequence of block refs
    (``KGContext.surface_refs``) — the ref path avoids any driver copy."""
    surface_ref = surface_refs(surface_forms)
    type_names_ref = ray.put(type_names)

    def score(batch: pa.Table) -> pa.Table:
        return CandidateGenerator(surface_ref, type_names_ref, limit, retrieve_kwargs)(batch)

    if meter_args is not None:
        from lamapi_ray.state.metrics import meter

        score = meter(score, "candidate_score", *meter_args)

    return distinct_mentions.map_batches(
        score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )


def generate_candidates_bm25(
    distinct_mentions: ray.data.Dataset,
    surface_forms,
    type_names: dict[str, str],
    limit: int = 1000,
) -> ray.data.Dataset:
    """BM25-ranked retrieval (ES relevance-order parity — see
    :meth:`SurfaceIndex.bm25_hits`) → (mention, id, name, rank, bm25,
    pos_score, es_score). Same broadcast-index/memoized-worker dataflow as
    :func:`generate_candidates` (table or block-ref input)."""
    import numpy as np

    from lamapi_ray.index.surface import _round_arr

    surface_ref = surface_refs(surface_forms)
    type_names_ref = ray.put(type_names)

    def score(batch: pa.Table) -> pa.Table:
        gen = CandidateGenerator(surface_ref, type_names_ref, limit)
        index = gen.index
        parts: dict[str, list] = {
            "mention": [], "id": [], "name": [], "rank": [], "bm25": [],
            "pos_score": [], "es_score": [],
        }
        for mention in batch["mention"].to_pylist():
            idx, sc = index.bm25_hits(mention, limit)
            n = len(idx)
            if n == 0:
                continue
            sc = np.asarray(sc, dtype=np.float64)
            mx = float(sc[0]) if sc[0] else 1.0
            ranks = np.arange(1, n + 1, dtype=np.int64)
            parts["mention"].append(np.full(n, mention, dtype=object))
            parts["id"].append(index.ids[idx])
            parts["name"].append(index.names[idx])
            parts["rank"].append(ranks)
            parts["bm25"].append(_round_arr(sc, 6))
            # O4 rank scores over the BM25-ordered list
            parts["pos_score"].append(_round_arr(ranks.astype(np.float64) / n, 3))
            parts["es_score"].append(_round_arr(sc / mx, 3))
        types = {
            "mention": pa.string(), "id": pa.string(), "name": pa.string(),
            "rank": pa.int64(), "bm25": pa.float64(),
            "pos_score": pa.float64(), "es_score": pa.float64(),
        }
        return pa.table(
            {
                name: pa.array(
                    np.concatenate(parts[name]) if parts[name] else [], type=typ
                )
                for name, typ in types.items()
            }
        )

    return distinct_mentions.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


def link_best(candidates: ray.data.Dataset) -> ray.data.Dataset:
    """mention → linked entity id (the per-mention argmax rows).

    The argmax itself is computed inside :class:`CandidateGenerator` (where a
    mention's candidates are guaranteed co-located); this is just the
    projection of those rows.
    """

    def pick(batch: pa.Table) -> pa.Table:
        flt = batch.filter(batch["is_best"])
        return flt.select(["mention", "id"])

    return candidates.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
