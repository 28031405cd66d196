"""Sitemap source (sitemaps.org XML protocol) — the URL-discovery
companion to robots.txt in a crawl pipeline.

* **writer**: pages grouped per host (deterministic key — no skew), each
  host's urlset serialized as the standard
  ``<urlset><url><loc>…</loc><lastmod>…</lastmod></url>…</urlset>``
  document with RFC 3339 lastmod stamps (one blob per host, urls sorted
  for byte-determinism);
* **reader**: a row-expanding ``map_batches`` over sitemap blobs using
  the linkgraph split-chain idiom — ``split_pattern`` on ``<loc>`` for
  the flat url expansion, element-0/element-1 takes for the
  ``</loc>``/``<lastmod>`` fields. Fully vectorized across all blobs in
  the batch; no XML library and no per-url Python.

The roundtrip (oracle-checked as ``sitemap_roundtrip``) recovers host,
url, and the lastmod string byte-identically; the oracle restates
lastmod via DuckDB ``strftime`` over the synth timestamp derivation.

Reference anchor: lamAPI has no crawl plane; sitemaps belong to the
web-ingestion surface this engine adds alongside robots.txt and WARC.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
)


def _rfc3339(epoch: int) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(epoch))


def write_sitemaps(
    urls: ray.data.Dataset,
    host_col: str = "host",
    url_col: str = "url",
    epoch_col: str = "epoch",
) -> ray.data.Dataset:
    """(host, url, epoch) → (host, sitemap xml-string) one blob per host."""

    def pack(group: pa.Table) -> pa.Table:
        us = group[url_col].to_pylist()
        order = np.argsort(np.asarray(us, dtype=object), kind="stable")
        eps = group[epoch_col].to_numpy(zero_copy_only=False)
        entries = [
            f"<url><loc>{us[k]}</loc>"
            f"<lastmod>{_rfc3339(int(eps[k]))}</lastmod></url>"
            for k in order
        ]
        xml = _HEADER + "".join(entries) + "</urlset>"
        return pa.table(
            {
                "host": pa.array([group[host_col][0].as_py()], pa.string()),
                "sitemap": pa.array([xml], pa.string()),
            }
        )

    return urls.groupby(host_col).map_groups(pack, batch_format="pyarrow")


def read_sitemaps(sitemaps: ray.data.Dataset) -> ray.data.Dataset:
    """(host, sitemap) → (host, url, lastmod) one row per <url> entry —
    vectorized split-chain parse across all blobs in the batch."""

    def unpack(batch: pa.Table) -> pa.Table:
        xml = batch["sitemap"]
        if isinstance(xml, pa.ChunkedArray):
            xml = xml.combine_chunks()
        parts = pc.split_pattern(xml.cast(pa.large_string()), "<loc>")
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(len(parents)) - offs[parents]
        keep = pos > 0  # element 0 is the pre-<loc> preamble
        frag = pc.take(flat, pa.array(np.nonzero(keep)[0]))
        if isinstance(frag, pa.ChunkedArray):
            frag = frag.combine_chunks()
        url = pc.list_element(pc.split_pattern(frag, "</loc>"), 0)
        after = pc.list_element(pc.split_pattern(frag, "<lastmod>"), 1)
        lastmod = pc.list_element(pc.split_pattern(after, "</lastmod>"), 0)
        hosts = batch["host"]
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        return pa.table(
            {
                "host": pc.take(hosts, pa.array(parents[keep], pa.int64())),
                "url": url.cast(pa.string()),
                "lastmod": lastmod.cast(pa.string()),
            }
        )

    return sitemaps.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)
