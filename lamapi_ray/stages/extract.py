"""Text extraction stage — html→text with a byte-identity invariant.

The input_hint contract: per url, extracted text must be *byte-identical*
across runs (and equal to the page's ``text`` column when present). The
extractor is a vectorized ``map_batches`` body over zero-copy Arrow batches:

* rows with non-null ``text`` pass through untouched (no pandas/str
  round-trip — the column stays Arrow ``large_string`` end-to-end);
* rows with null ``text`` decode ``html`` (utf-8) and strip tags with a
  single compiled regex. No entity unescaping, no whitespace mangling —
  the spec is "concatenation of text outside <...> tags", which makes the
  transform deterministic and byte-stable by construction.

Reference analogue: the reference consumes pre-extracted JSON (its dump
reader just json-parses lines, scripts/parse_wikidata_dump.py:238-261); the
byte-stability requirement comes from BASELINE.json input_hint.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TAG = re.compile(rb"<[^>]*>")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch → same batch with ``text`` filled from html where null."""
    text = batch["text"]
    if text.null_count == 0:
        return batch
    html = batch["html"].combine_chunks()
    is_null = pc.is_null(text).to_numpy(zero_copy_only=False)
    filled = text.to_pylist()
    for i, missing in enumerate(is_null):
        if missing:
            raw = html[i].as_py()
            filled[i] = _TAG.sub(b"", raw).decode("utf-8")
    out = batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(filled, type=pa.large_string()),
    )
    return out


def extracted_pages(pages, drop_html: bool = True):
    """pages Dataset → Dataset with text materialized (and html pruned).

    Dropping ``html`` immediately after extraction keeps the wide binary
    column out of every downstream shuffle (project-early rule).
    """
    ds = pages.map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    if drop_html:
        ds = ds.select_columns(["url", "warc_ts", "text", "lang"])
    return ds
