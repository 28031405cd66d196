"""The flagship KG-construction pipeline, end to end.

pages → extract_text → mention scan → canonicalize (groupby surface) →
candidate-gen actor pool → link → per-page entity pairs → adjacency join →
(subj, pred, obj) triples + typed-literal triples.

Each arrow is a Dataset transform; the only all-to-all exchanges are the
mention canonicalization (``groupby(mention)``), the per-page grouping
(``groupby(url)``) and — when the adjacency side is too big to broadcast —
one bucketed hash join. Everything else is map_batches / broadcast.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from lamapi_ray.index.surface import build_surface_forms
from lamapi_ray.stages.candidates import generate_candidates, link_best
from lamapi_ray.stages.extract import extracted_pages
from lamapi_ray.stages.join import broadcast_join, bucketed_hash_join
from lamapi_ray.stages.mentions import scan_mentions
from lamapi_ray.synth import TYPE_LABELS

LITERAL_PRED = "P90"


class KGContext:
    """Materialized small-side state shared by a job: surface forms + maps.

    surface_forms is built by the Ray index pipeline then materialized on the
    driver — it is vocabulary-bounded (≪ pages). At Wikidata scale this is
    the one table that would instead be sharded by first token (see
    index/surface.py docstring); the pipeline code below only touches it via
    ``ray.put`` broadcasts, so swapping the strategy is local to this class.
    """

    def __init__(self, items: pa.Table, adjacency: ray.data.Dataset | pa.Table):
        items_ds = ray.data.from_arrow(items)
        self.surface_forms: pa.Table = pa.concat_tables(
            [
                b
                for b in build_surface_forms(items_ds).iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
            ]
        )
        self.type_names = dict(TYPE_LABELS)
        # en labels of kind="type" items (J2 — lookup_retriever.py:236-240)
        kindcol = items["kind"].to_pylist()
        for ent, label, kind in zip(
            items["entity"].to_pylist(), items["label"].to_pylist(), kindcol
        ):
            if kind == "type":
                self.type_names[ent] = label
        self.adjacency = adjacency
        vocab = frozenset(self.surface_forms["surface_norm"].to_pylist())
        self.vocab = vocab
        self.max_surface_tokens = max((len(s.split(" ")) for s in vocab), default=1)


def mention_rows(pages: ray.data.Dataset, ctx: KGContext, concurrency=4):
    """pages → (url, mention | literal) rows."""
    ext = extracted_pages(pages)
    return scan_mentions(ext, ctx.vocab, ctx.max_surface_tokens, concurrency)


def split_rows(rows: ray.data.Dataset):
    mentions = rows.filter(
        expr="row_kind == 'mention'"
    ).select_columns(["url", "mention"])
    literals = rows.filter(
        expr="row_kind == 'literal'"
    ).select_columns(["url", "value", "datatype"])
    return mentions, literals


def distinct_mentions(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Canonicalization shuffle — each distinct surface scored once.

    This groupby replaces the reference's Mongo candidate cache
    (lookup_retriever.py:78-102): batch dedup *is* the memoization. The
    group key is the already-normalized surface form, so head surfaces
    collapse to one row before the expensive candidate stage.
    """
    return mentions.groupby("mention").count().select_columns(["mention"])


def linked_pages(
    mentions: ray.data.Dataset,
    ctx: KGContext,
    limit: int = 1000,
    concurrency: int = 4,
):
    """(url, mention) → (url, mention, id) via candidate gen + broadcast map.

    Returns (page_links, candidates) — candidates exposed for inspection /
    the candidates query.
    """
    dm = distinct_mentions(mentions)
    cands = generate_candidates(
        dm, ctx.surface_forms, ctx.type_names, limit=limit, concurrency=concurrency
    )
    link_map = link_best(cands).to_pandas()  # vocabulary-bounded, small
    page_links = broadcast_join(mentions, link_map, on="mention")
    return page_links, cands


def page_entity_pairs(page_links: ray.data.Dataset) -> ray.data.Dataset:
    """groupby(url) → ordered pairs of distinct linked entities per page."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["id"]))
        a, b = [], []
        for x in ids:
            for y in ids:
                if x != y:
                    a.append(x)
                    b.append(y)
        return pd.DataFrame({"subj": a, "obj": b})

    pairs_ds = page_links.groupby("url").map_groups(pairs, batch_format="pandas")
    # global distinct — vocabulary² upper bound, tiny vs page count
    return pairs_ds.groupby(["subj", "obj"]).count().select_columns(["subj", "obj"])


def entity_triples(
    pairs: ray.data.Dataset,
    ctx: KGContext,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """pairs ⋈ adjacency on (subj, obj) → (subj, pred, obj).

    Broadcasts the adjacency when it fits comfortably in the object store;
    otherwise falls back to the bucketed hash join (one shuffle).
    """
    adj = ctx.adjacency
    if isinstance(adj, pa.Table):
        if len(adj) <= broadcast_threshold:
            return broadcast_join(pairs, adj, on=["subj", "obj"]).select_columns(
                ["subj", "pred", "obj"]
            )
        adj = ray.data.from_arrow(adj)
    return bucketed_hash_join(pairs, adj, on=["subj", "obj"]).select_columns(
        ["subj", "pred", "obj"]
    )


def literal_triples(
    page_links: ray.data.Dataset, literals: ray.data.Dataset
) -> ray.data.Dataset:
    """Typed literal triples: (page subject, P90, value, datatype).

    Page subject := linked entity of the alphabetically-first mention of the
    page (tie → smaller id) — a deterministic stand-in for "the page's main
    entity". One groupby(url) over the union of link rows and literal rows.
    """

    def tag_links(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["value"] = None
        batch["datatype"] = None
        return batch[["url", "mention", "id", "value", "datatype"]]

    def tag_lits(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["mention"] = None
        batch["id"] = None
        return batch[["url", "mention", "id", "value", "datatype"]]

    both = page_links.map_batches(tag_links, batch_format="pandas").union(
        literals.map_batches(tag_lits, batch_format="pandas")
    )

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        links = group[group["id"].notna()]
        lits = group[group["value"].notna()]
        if len(links) == 0 or len(lits) == 0:
            return pd.DataFrame({"subj": [], "pred": [], "value": [], "datatype": []})
        links = links.sort_values(["mention", "id"], kind="mergesort")
        subj = links.iloc[0]["id"]
        out = lits[["value", "datatype"]].drop_duplicates()
        return pd.DataFrame(
            {
                "subj": subj,
                "pred": LITERAL_PRED,
                "value": out["value"].to_numpy(),
                "datatype": out["datatype"].to_numpy(),
            }
        )

    trip = both.groupby("url").map_groups(emit, batch_format="pandas")
    return trip.groupby(["subj", "pred", "value", "datatype"]).count().select_columns(
        ["subj", "pred", "value", "datatype"]
    )


def run_pipeline(pages: ray.data.Dataset, ctx: KGContext, limit: int = 1000,
                 concurrency: int = 4):
    """Full run → dict of result Datasets.

    Shared intermediates (``rows``, ``page_links``) are materialized once —
    Ray Data re-executes lineage per consumer, and both triple branches and
    the link map consume the mention scan; materializing trades object-store
    space (skinny string rows, spillable) for not re-running the scan and
    candidate stages per branch.
    """
    rows = mention_rows(pages, ctx, concurrency).materialize()
    mentions, literals = split_rows(rows)
    page_links, cands = linked_pages(mentions, ctx, limit, concurrency)
    page_links = page_links.materialize()
    pairs = page_entity_pairs(page_links)
    etriples = entity_triples(pairs, ctx)
    ltriples = literal_triples(page_links, literals)
    return {
        "mentions": mentions,
        "literals": literals,
        "candidates": cands,
        "page_links": page_links,
        "triples": etriples,
        "literal_triples": ltriples,
    }
