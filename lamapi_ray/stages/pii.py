"""PII detection / redaction over a text column.

A standard pre-training curation pass (no reference analogue — lamAPI
serves KG lookups): find and mask personally-identifying strings before a
corpus leaves the pipeline. Three pattern families (email, IPv4,
NANP-style phone) as compiled RE2 patterns applied with
``pyarrow.compute`` kernels — one ``count_substring_regex`` +
``replace_substring_regex`` pair per family per batch, zero per-row
Python. DuckDB's regexp functions are RE2 too, so the oracle runs the
IDENTICAL pattern strings and the scrubbed text matches byte-for-byte.

Pure per-doc map: one ``map_batches``, no shuffle, streams at any scale.
Replacement order (email → ipv4 → phone) is part of the contract; the
families are mutually non-overlapping so order only matters defensively.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# RE2 syntax, shared verbatim with the DuckDB oracle (__ray_entry__.py)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"

PATTERNS = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
)


def scrub_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = text.cast(pa.string())
    cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
    scrubbed = text
    for count_name, pattern, token in PATTERNS:
        cols[count_name] = pc.count_substring_regex(scrubbed, pattern).cast(pa.int64())
        scrubbed = pc.replace_substring_regex(scrubbed, pattern, token)
    cols["scrubbed"] = scrubbed
    return pa.table(cols)


def pii_scrub(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """→ Dataset (doc_id, n_emails, n_ipv4, n_phones, scrubbed)."""
    return ds.map_batches(
        lambda b: scrub_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
