"""Hyperlink graph extraction from raw page html — the web-graph leg.

``extract_links`` parses every ``href="..."`` out of the html column with
a fully vectorized split chain (no regex loop, no per-page Python):

1. ``split_pattern(html, 'href="')`` — a list per page; element 0 is the
   preamble, elements 1.. each START with a link target;
2. drop element 0 per page by list-position arithmetic;
3. ``split_pattern(fragment, '"')`` + ``list_element(0)`` — the target is
   everything before the closing quote.

Output is the edge list (src, dst, rank) — rank is the in-page link
position, kept because a page may link the same target twice. The
in-degree aggregate is a plain vocabulary-bounded groupby on top.

This is a row-local flat expansion: edges ≈ pages × links/page, no
shuffle until the degree aggregate (which ships one row per distinct
target per block after map-side combining).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def extract_links(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages (url, html, ...) → (src, dst, rank) hyperlink edges."""

    def links(batch: pa.Table) -> pa.Table:
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        parts = pc.split_pattern(html.cast(pa.large_string()), 'href="')
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(len(parents)) - offs[parents]  # within-list index
        keep = pos > 0  # element 0 is the pre-href preamble
        frag = pc.take(flat, pa.array(np.nonzero(keep)[0]))
        if isinstance(frag, pa.ChunkedArray):
            frag = frag.combine_chunks()
        dst = pc.list_element(pc.split_pattern(frag, '"'), 0)
        src_all = batch["url"]
        if isinstance(src_all, pa.ChunkedArray):
            src_all = src_all.combine_chunks()
        return pa.table(
            {
                "src": pc.take(src_all, pa.array(parents[keep], pa.int64())),
                "dst": dst.cast(pa.string()),
                "rank": pa.array(pos[keep] - 1, pa.int64()),
            }
        )

    return pages.map_batches(links, batch_format="pyarrow", zero_copy_batch=True)


def extract_anchor_texts(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages (url, html, ...) → (dst, anchor): link target + its anchor
    text — the classic web-derived surface-form signal (an inbound
    anchor is a human-written name for the target entity; lamAPI builds
    the same surface→entity prior from Wikidata labels/aliases,
    parse_wikidata_dump.py:151). Same vectorized split chain as
    ``extract_links`` extended two splits deeper: the post-href fragment
    is ``TARGET">ANCHOR</a>...``, so anchor = element 0 of the
    ``'</a>'`` split of element 1 of the ``'">'`` split."""

    def anchors(batch: pa.Table) -> pa.Table:
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        parts = pc.split_pattern(html.cast(pa.large_string()), 'href="')
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(len(parents)) - offs[parents]
        keep = pos > 0
        frag = pc.take(flat, pa.array(np.nonzero(keep)[0]))
        if isinstance(frag, pa.ChunkedArray):
            frag = frag.combine_chunks()
        dst = pc.list_element(pc.split_pattern(frag, '"'), 0)
        after = pc.list_element(pc.split_pattern(frag, '">'), 1)
        anchor = pc.list_element(pc.split_pattern(after, "</a>"), 0)
        return pa.table(
            {
                "dst": dst.cast(pa.string()),
                "anchor": anchor.cast(pa.string()),
            }
        )

    return pages.map_batches(anchors, batch_format="pyarrow", zero_copy_batch=True)


def anchor_surface_forms(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(dst, anchor) → (dst, anchor, n): inbound anchor-text counts per
    target — a surface-form prior table. Map-side combine on the packed
    (dst, anchor) key, ONE vocabulary-bounded groupby-sum; the key is
    unpacked after the exchange (no struct keys through the shuffle)."""
    SEP = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["dst"].cast(pa.string()), batch["anchor"].cast(pa.string()), SEP
        )
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        vc = key.value_counts()
        return pa.table(
            {
                "k": vc.field("values").cast(pa.string()),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .sum("c")
    )

    def finish(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern(batch["k"].combine_chunks() if isinstance(
            batch["k"], pa.ChunkedArray
        ) else batch["k"], SEP)
        return pa.table(
            {
                "dst": pc.list_element(split, 0).cast(pa.string()),
                "anchor": pc.list_element(split, 1).cast(pa.string()),
                "n": batch["sum(c)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def link_indegree(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst, rank) → (dst, indegree) — map-side combined groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch["dst"].combine_chunks().value_counts() if isinstance(
            batch["dst"], pa.ChunkedArray
        ) else batch["dst"].value_counts()
        return pa.table(
            {
                "dst": vc.field("values").cast(pa.string()),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dst")
        .sum("c")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": batch["dst"],
                "indegree": batch["sum(c)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
