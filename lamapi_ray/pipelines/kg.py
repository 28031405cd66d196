"""The flagship KG-construction pipeline, end to end.

pages → extract_text → mention scan (one row per page, list columns) →
canonicalize (per-batch combine + groupby surface) → candidate gen
(per-worker index, broadcast) → link (broadcast map) → row-local pair +
literal-triple emission (one tagged global distinct) → pairs ⋈ adjacency
(pairs broadcast, adjacency streamed) → (subj, pred, obj) triples.

Each arrow is a Dataset transform. The only all-to-all exchanges are the
mention canonicalization and the vocabulary-bounded final distincts; every
page-scale step is a stateless ``map_batches`` over zero-copy Arrow, so the
pipeline's shuffle volume is independent of page count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.index.surface import build_surface_forms
from lamapi_ray.stages.candidates import generate_candidates, link_best
from lamapi_ray.stages.dedup import scaled_partitions
from lamapi_ray.stages.extract import extracted_pages
from lamapi_ray.stages.join import bucketed_hash_join
from lamapi_ray.stages.mentions import VocabHashes, scan_mentions
from lamapi_ray.synth import TYPE_LABELS

LITERAL_PRED = "P90"


class KGContext:
    """Small-side state shared by a job: surface-form block refs + maps.

    surface_forms is built by the Ray index pipeline and kept as BLOCK REFS
    in the object store (``to_arrow_refs``) — the driver heap never holds a
    copy, and the candidate stages consume the refs directly (each worker
    zero-copy concats the shared-memory blocks once). It is
    vocabulary-bounded (≪ pages); at Wikidata scale this is the one table
    that would instead be sharded by first token (see index/surface.py
    docstring), and because the pipeline only touches it via refs, swapping
    the strategy is local to this class.
    """

    def __init__(
        self,
        items: pa.Table,
        adjacency: ray.data.Dataset | pa.Table,
        index_strategy: str = "broadcast",
        num_shards: int = 8,
    ):
        if index_strategy not in ("broadcast", "sharded"):
            raise ValueError(f"unknown index_strategy: {index_strategy}")
        self.index_strategy = index_strategy
        self.num_shards = num_shards
        items_ds = ray.data.from_arrow(items)
        # block refs, not a driver-heap table: holding the refs pins the
        # blocks in the (spillable) object store
        self.surface_refs: tuple = tuple(
            build_surface_forms(items_ds).to_arrow_refs()
        )
        self._surface_forms: pa.Table | None = None
        self.type_names = dict(TYPE_LABELS)
        # en labels of kind="type" items (J2 — lookup_retriever.py:236-240),
        # vectorized: arrow filter on kind, zip only the (small) type subset
        tmask = pc.equal(items["kind"], "type")
        self.type_names.update(
            zip(
                items["entity"].filter(tmask).to_pylist(),
                items["label"].filter(tmask).to_pylist(),
            )
        )
        self.adjacency = adjacency
        # scanner vocabulary as sorted uint64 hash arrays (8 B/surface) —
        # NOT a frozenset[str] (~100+ B/surface): at Wikidata scale the
        # per-worker scanner state stays ~20× smaller, and the candidate
        # stage's exact index lookup discards hash false positives
        self.vocab = VocabHashes.from_surface_norms(
            self.surface_forms["surface_norm"]
        )
        self.max_surface_tokens = self.vocab.max_n

    @property
    def surface_forms(self) -> pa.Table:
        """Zero-copy view over the object-store blocks (Arrow data buffers
        stay in shared memory; only the table/schema wrappers live on the
        driver heap). Used by the sharded index builder and the small
        query-surface helpers; the hot broadcast path ships ``surface_refs``
        instead."""
        if self._surface_forms is None:
            self._surface_forms = pa.concat_tables(
                ray.get(list(self.surface_refs))
            )
        return self._surface_forms


def mention_rows(pages: ray.data.Dataset, ctx: KGContext, concurrency=4, meter_args=None):
    """pages → one row per page (url, mentions[], lit_values[], lit_datatypes[])."""
    ext = extracted_pages(pages)
    return scan_mentions(
        ext, ctx.vocab, ctx.max_surface_tokens, concurrency, meter_args=meter_args
    )


def split_rows(page_rows: ray.data.Dataset):
    """Exploded (url, mention) and (url, value, datatype) views — cheap
    row-local flattens, produced for the query/oracle surface."""

    def flat_mentions(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["mentions"])
        return pa.table(
            {
                "url": _repeat(batch["url"], n),
                "mention": pc.list_flatten(batch["mentions"]),
            }
        )

    def flat_literals(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["lit_values"])
        return pa.table(
            {
                "url": _repeat(batch["url"], n),
                "value": pc.list_flatten(batch["lit_values"]),
                "datatype": pc.list_flatten(batch["lit_datatypes"]),
            }
        )

    mentions = page_rows.map_batches(flat_mentions, batch_format="pyarrow")
    literals = page_rows.map_batches(flat_literals, batch_format="pyarrow")
    return mentions, literals


def _repeat(col: pa.ChunkedArray | pa.Array, counts) -> pa.Array:
    """Repeat col[i] counts[i] times (np.repeat on indices, then take)."""
    import numpy as np

    n = counts.to_numpy(zero_copy_only=False)
    return pc.take(col, pa.array(np.repeat(np.arange(len(n)), n)))


def distinct_mentions(page_rows: ray.data.Dataset) -> ray.data.Dataset:
    """Canonicalization shuffle — each distinct surface scored once.

    This groupby replaces the reference's Mongo candidate cache
    (lookup_retriever.py:78-102): batch dedup *is* the memoization. A
    per-batch distinct (set-union of the page mention lists) combines
    BEFORE the shuffle, so head surfaces ("USA"-style skew) collapse to at
    most one row per block and the exchange is vocabulary-bounded.
    """

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"mention": pc.unique(pc.list_flatten(batch["mentions"]))}
        )

    return (
        page_rows.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby("mention", num_partitions=scaled_partitions(0.5, 16))
        .count()
        .select_columns(["mention"])
    )


def linked_pages(
    page_rows: ray.data.Dataset,
    ctx: KGContext,
    limit: int = 1000,
    concurrency: int = 4,
    meter_args=None,
):
    """Attach linked entity ids per page via candidate gen + broadcast map.

    Returns (linked_rows, page_links, candidates): ``linked_rows`` keeps the
    page-row shape plus an aligned ``ids`` list column; ``page_links`` is the
    exploded (url, mention, id) view for the query surface.
    """
    dm = distinct_mentions(page_rows)
    if ctx.index_strategy == "sharded":
        from lamapi_ray.stages.candidates_sharded import generate_candidates_sharded

        cands = generate_candidates_sharded(
            dm,
            ctx.surface_forms,
            ctx.type_names,
            limit=limit,
            num_shards=ctx.num_shards,
        )
    else:
        cands = generate_candidates(
            dm, ctx.surface_refs, ctx.type_names, limit=limit,
            concurrency=concurrency, meter_args=meter_args,
        )
    lm = link_best(cands).to_pandas()  # vocabulary-bounded, small
    link_mentions = pa.array(list(lm["mention"]), pa.string())
    link_ids = pa.array(list(lm["id"]), pa.string())
    link_ref = ray.put((link_mentions, link_ids))

    def attach(batch: pa.Table) -> pa.Table:
        """Vectorized link attach: flatten mention lists, index into the
        broadcast (mention → id) arrays, rebuild aligned list columns from
        per-page counts — no Python per mention."""
        import numpy as np

        lms, lids = ray.get(link_ref)
        ml = batch["mentions"]
        if isinstance(ml, pa.ChunkedArray):
            ml = ml.combine_chunks()
        flat = pc.list_flatten(ml)
        parents = pc.list_parent_indices(ml).to_numpy(zero_copy_only=False)
        pos = pc.index_in(flat, value_set=lms)
        mask = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        idx = np.nonzero(mask)[0]
        linked_flat = pc.take(flat, pa.array(idx))
        ids_flat = pc.take(lids, pc.take(pos, pa.array(idx)))
        counts = np.bincount(parents[idx], minlength=len(batch))
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        )
        def _arr(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        lm_col = pa.ListArray.from_arrays(offsets, _arr(linked_flat))
        id_col = pa.ListArray.from_arrays(offsets, _arr(ids_flat))
        return batch.append_column("linked_mentions", lm_col).append_column(
            "ids", id_col
        )

    linked_rows = page_rows.map_batches(attach, batch_format="pyarrow")

    def flat_links(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["ids"])
        return pa.table(
            {
                "url": _repeat(batch["url"], n),
                "mention": pc.list_flatten(batch["linked_mentions"]),
                "id": pc.list_flatten(batch["ids"]),
            }
        )

    page_links = linked_rows.map_batches(flat_links, batch_format="pyarrow")
    return linked_rows, page_links, cands


def page_entity_pairs(linked_rows: ray.data.Dataset) -> ray.data.Dataset:
    """Ordered pairs of distinct entities co-linked on a page.

    Page-local work stays in the row: the pair fan-out and a per-batch
    distinct (combiner) run inside ``map_batches``; the only exchange is the
    final global distinct, which is vocabulary²-bounded — independent of
    page count.
    """

    def emit_pairs(batch: pa.Table) -> pa.Table:
        subj, obj = _batch_pairs_arrays(batch)
        return pa.table({"subj": subj, "obj": obj})

    pairs_ds = linked_rows.map_batches(emit_pairs, batch_format="pyarrow")
    # global distinct — vocabulary² upper bound, tiny vs page count
    return pairs_ds.groupby(["subj", "obj"], num_partitions=scaled_partitions(0.5, 16)).count().select_columns(["subj", "obj"])


def _col(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _string_ranks(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode a flat string array → (per-element rank, vocab
    sorted by rank). Ranks follow Python string order, so integer-rank
    comparisons reproduce tuple/string ``sorted()`` semantics while all the
    per-element work stays numeric (the only per-string cost is sorting the
    DISTINCT vocab)."""
    enc = _col(flat).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    order = np.argsort(vocab)
    rank_of = np.empty(len(vocab), dtype=np.int64)
    rank_of[order] = np.arange(len(vocab))
    return rank_of[codes], vocab[order]


def _batch_pairs_arrays(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    """Distinct ordered co-link pairs within one batch (both directions),
    fully vectorized: per-row sorted-unique ids via one np.unique over
    (row, rank) keys, per-row upper-triangle fan-out via repeat/cumsum
    index arithmetic — no Python loop over rows or pairs."""
    ids = _col(batch["ids"])
    flat = pc.list_flatten(ids)
    empty = pa.array([], pa.string())
    if len(flat) == 0:
        return empty, empty
    parents = pc.list_parent_indices(ids).to_numpy(zero_copy_only=False)
    ranks, vocab = _string_ranks(flat)
    nv = len(vocab)
    # per-row sorted unique ranks (np.unique sorts → rows contiguous,
    # ranks ascending within each row)
    uk = np.unique(parents.astype(np.int64) * nv + ranks)
    row = uk // nv
    rnk = uk % nv
    # upper-triangle fan-out: element p of a row segment pairs with every
    # later element of the same segment
    seg_change = np.nonzero(np.diff(row))[0] + 1
    starts = np.concatenate(([0], seg_change))
    ends = np.concatenate((seg_change, [len(row)]))
    end_per = np.repeat(ends, ends - starts)
    pos = np.arange(len(row), dtype=np.int64)
    reps = end_per - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty, empty
    left = np.repeat(pos, reps)
    grp_starts = np.concatenate(([0], np.cumsum(reps)))[:-1]
    right = np.arange(total, dtype=np.int64) - np.repeat(grp_starts, reps) + left + 1
    # batch-level distinct over (lo, hi); np.unique order == sorted(pairs)
    upk = np.unique(rnk[left] * nv + rnk[right])
    a = upk // nv
    b = upk % nv
    rev = np.lexsort((a, b))  # reversed pairs in sorted((b, a)) order
    subj = pa.array(np.concatenate((vocab[a], vocab[b[rev]])), pa.string())
    obj = pa.array(np.concatenate((vocab[b], vocab[a[rev]])), pa.string())
    return subj, obj


def _batch_litrows_arrays(
    batch: pa.Table,
) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Distinct (subj, value, datatype) literal rows within one batch,
    vectorized: the per-row subject is the id of the lexicographically
    smallest (mention, id) pair, found by an integer lexsort over joint
    (mention-rank, id-rank) keys; the literal fan-out is a parent-index
    gather; the batch distinct is one np.unique over packed rank keys."""
    ids = _col(batch["ids"])
    lv = _col(batch["lit_values"])
    flat_ids = pc.list_flatten(ids)
    flat_vals = pc.list_flatten(lv)
    empty = pa.array([], pa.string())
    if len(flat_ids) == 0 or len(flat_vals) == 0:
        return empty, empty, empty
    id_par = pc.list_parent_indices(ids).to_numpy(zero_copy_only=False)
    m_ranks, _ = _string_ranks(pc.list_flatten(_col(batch["linked_mentions"])))
    i_ranks, i_vocab = _string_ranks(flat_ids)
    # subj per row = id at the per-parent argmin of (mention, id)
    joint = m_ranks * len(i_vocab) + i_ranks
    order = np.lexsort((joint, id_par))
    spar = id_par[order]
    first = np.concatenate(([True], spar[1:] != spar[:-1]))
    subj_rank = np.full(len(batch), -1, dtype=np.int64)
    subj_rank[spar[first]] = i_ranks[order[first]]
    # literal fan-out: gather the row subject onto each flat literal
    lit_par = pc.list_parent_indices(lv).to_numpy(zero_copy_only=False)
    v_ranks, v_vocab = _string_ranks(flat_vals)
    d_ranks, d_vocab = _string_ranks(pc.list_flatten(_col(batch["lit_datatypes"])))
    s_lit = subj_rank[lit_par]
    keep = s_lit >= 0  # rows with no linked ids contribute nothing
    if not keep.any():
        return empty, empty, empty
    nv, nd = len(v_vocab), len(d_vocab)
    key = (s_lit[keep] * nv + v_ranks[keep]) * nd + d_ranks[keep]
    uk = np.unique(key)  # order == sorted (subj, value, datatype) tuples
    return (
        pa.array(i_vocab[uk // (nv * nd)], pa.string()),
        pa.array(v_vocab[(uk // nd) % nv], pa.string()),
        pa.array(d_vocab[uk % nd], pa.string()),
    )


def cooccurrence_tables(linked_rows: ray.data.Dataset) -> tuple[pa.Table, pa.Table]:
    """One pass over the linked page rows → (pairs table, literal triples).

    Fuses the pair fan-out and the literal-triple emission into a single
    tagged map + ONE global distinct (both outputs are vocabulary-bounded,
    so the collected result is small). Halves the number of streaming
    executions vs running the two branches separately — fixed per-execution
    cost is the scaling-efficiency killer at bench scale.
    """

    def emit_both(batch: pa.Table) -> pa.Table:
        p_subj, p_obj = _batch_pairs_arrays(batch)
        l_subj, l_val, l_dt = _batch_litrows_arrays(batch)
        np_, nl = len(p_subj), len(l_subj)
        blank_p = pa.nulls(np_, pa.string()).fill_null("")
        blank_l = pa.nulls(nl, pa.string()).fill_null("")
        return pa.table(
            {
                "tag": pa.concat_arrays(
                    [
                        pa.nulls(np_, pa.string()).fill_null("P"),
                        pa.nulls(nl, pa.string()).fill_null("L"),
                    ]
                ),
                "subj": pa.concat_arrays([_col(p_subj), _col(l_subj)]),
                "obj": pa.concat_arrays([_col(p_obj), blank_l]),
                "value": pa.concat_arrays([blank_p, _col(l_val)]),
                "datatype": pa.concat_arrays([blank_p, _col(l_dt)]),
            }
        )

    both = (
        linked_rows.map_batches(emit_both, batch_format="pyarrow")
        .groupby(["tag", "subj", "obj", "value", "datatype"], num_partitions=scaled_partitions(0.5, 16))
        .count()
    )
    tbl = pa.concat_tables(
        b for b in both.iter_batches(batch_size=65536, batch_format="pyarrow")
    ).combine_chunks()
    is_pair = pc.equal(tbl["tag"], "P")
    pairs_tbl = tbl.filter(is_pair).select(["subj", "obj"])
    lit_part = tbl.filter(pc.invert(is_pair))
    lit_tbl = pa.table(
        {
            "subj": lit_part["subj"],
            "pred": pa.array([LITERAL_PRED] * len(lit_part), pa.string()),
            "value": lit_part["value"],
            "datatype": lit_part["datatype"],
        }
    )
    return pairs_tbl, lit_tbl


def entity_triples(
    pairs: ray.data.Dataset,
    ctx: KGContext,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """pairs ⋈ adjacency on (subj, obj) → (subj, pred, obj).

    The co-occurrence pair set is vocabulary²-bounded (it comes out of a
    global distinct), so it is the BROADCAST side: collected once,
    ``ray.put`` once, semi-joined (arrow hash join) into every streaming
    batch of the adjacency — the adjacency (the full KG, billions of edges
    at scale) is never collected or shuffled. Falls back to the bucketed
    hash join only if the pair set outgrows the broadcast threshold.

    ``pairs``: the distinct (subj, obj) pairs, as a Dataset or a collected
    arrow table.
    """
    pairs_tbl = (
        pairs
        if isinstance(pairs, pa.Table)
        else pa.concat_tables(
            b for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow")
        ).combine_chunks()
    )
    adj = ctx.adjacency
    if len(pairs_tbl) <= broadcast_threshold:
        adj_ds = ray.data.from_arrow(adj) if isinstance(adj, pa.Table) else adj
        pairs_ref = ray.put(pairs_tbl)

        def semi(batch: pa.Table) -> pa.Table:
            p = ray.get(pairs_ref)
            return batch.join(p, keys=["subj", "obj"], join_type="inner").select(
                ["subj", "pred", "obj"]
            )

        return adj_ds.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
    if isinstance(adj, pa.Table):
        adj = ray.data.from_arrow(adj)
    return bucketed_hash_join(
        ray.data.from_arrow(pairs_tbl), adj, on=["subj", "obj"]
    ).select_columns(["subj", "pred", "obj"])


def run_pipeline(pages: ray.data.Dataset, ctx: KGContext, limit: int = 1000,
                 concurrency: int = 4):
    """Full run → dict of result Datasets.

    The shared intermediate (the page-row scan+link output) is materialized
    once — Ray Data re-executes lineage per consumer, and both triple
    branches consume it; materializing trades object-store space (compact
    list-column rows, spillable) for not re-running the scan and candidate
    stages per branch.
    """
    from lamapi_ray.state.metrics import derived, metrics_actor, new_run_key

    mactor = metrics_actor()
    mkey = new_run_key()
    meter_args = (mactor, mkey)
    rows = mention_rows(pages, ctx, concurrency, meter_args=meter_args).materialize()
    mentions, literals = split_rows(rows)
    linked_rows, page_links, cands = linked_pages(
        rows, ctx, limit, concurrency, meter_args=meter_args
    )
    pairs_tbl, lit_tbl = cooccurrence_tables(linked_rows)
    etriples = entity_triples(pairs_tbl, ctx)

    def stage_metrics() -> dict:
        """North-rule per-stage metrics: mentions/sec, candidate fan-out,
        link-score latency — derived from the run's accumulated
        (rows_in, rows_out, busy_sec) counters."""
        return derived(ray.get(mactor.snapshot.remote(mkey)))

    return {
        "mentions": mentions,
        "literals": literals,
        "candidates": cands,
        "page_links": page_links,
        "triples": etriples,
        "literal_triples": ray.data.from_arrow(lit_tbl),
        "stage_metrics": stage_metrics,
    }
