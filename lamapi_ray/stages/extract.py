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

import pyarrow as pa
import pyarrow.compute as pc


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch → same batch with ``text`` filled from html where null.

    Fully vectorized: rows with text pass through untouched (zero-copy);
    only the null-text rows are filtered out, tag-stripped with one RE2
    kernel over the utf-8-decoded html, and concatenated back. Row order
    within the batch changes (filled rows move to the end) — downstream
    stages are row-independent and keyed by url, so order carries no
    meaning (SURVEY §4 ordering row).
    """
    text = batch["text"]
    if text.null_count == 0:
        return batch
    is_null = pc.is_null(text)
    keep = batch.filter(pc.invert(is_null))
    missing = batch.filter(is_null)
    stripped = pc.replace_substring_regex(
        missing["html"].cast(pa.large_string()), pattern="<[^>]*>", replacement=""
    ).cast(pa.large_string())
    missing = missing.set_column(
        missing.schema.get_field_index("text"), "text", stripped
    )
    return pa.concat_tables([keep, missing])


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
