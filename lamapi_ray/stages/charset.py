"""Charset detection + normalization — the encoding-sniff step between
raw fetched bytes and text extraction in a web-corpus pipeline.

Real crawl payloads arrive as bytes with unreliable (or absent)
``Content-Type`` charsets; pipelines normalize everything to UTF-8
before any text stage. The detector here is the standard cascade:

1. **BOM sniff** — UTF-8 / UTF-16 LE / UTF-16 BE byte-order marks win
   outright;
2. **strict UTF-8 validation** — a clean decode means UTF-8 (the check
   is exact, not heuristic: any invalid sequence falls through);
3. **Latin-1 fallback** — the web's historical default; every byte
   string decodes, so this terminates the cascade.

The per-record decode is payload-shaped work (same cost class as the
image/audio codec stages): inherently per-record within a batch,
parallel across batches/actors. Decoded text is returned along with the
detected charset label; downstream stages see uniform UTF-8 strings.

Synthetic payloads (`attach_encoded_payload`) carry a deterministic
non-ASCII suffix so the cascade is genuinely exercised: Latin-1 bodies
contain bytes that are INVALID UTF-8 (0xE9 at end-of-buffer), UTF-16
bodies carry BOMs, and the oracle can state both the detected label and
the normalized text in closed form.

Reference anchor: lamAPI assumes pre-decoded UTF-8 input (its Flask
layer takes JSON strings); the charset layer belongs to the raw-web
ingestion surface this engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-bom", "utf-8"),
    (b"\xff\xfe", "utf-16-le", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be", "utf-16-be"),
)

# deterministic non-ASCII suffix: é is 0xE9 in Latin-1 (invalid UTF-8 as
# a trailing byte) and 0xC3 0xA9 in UTF-8
_SUFFIX = " café"


def detect_charset(payload: bytes) -> tuple[str, str]:
    """bytes → (charset_label, decoded_text). BOM → strict UTF-8 →
    Latin-1, per the module cascade."""
    for bom, label, codec in _BOMS:
        if payload.startswith(bom):
            return label, payload[len(bom) :].decode(codec)
    try:
        return "utf-8", payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return "latin-1", payload.decode("latin-1")


def attach_encoded_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, payload bytes): text + a non-ASCII suffix,
    encoded per ``doc_id % 4`` ∈ {utf-8, utf-8+BOM, latin-1,
    utf-16-le+BOM}."""

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        payloads = []
        for i, t in zip(ids, texts):
            s = t + _SUFFIX
            c = int(i) % 4
            if c == 0:
                payloads.append(s.encode("utf-8"))
            elif c == 1:
                payloads.append(b"\xef\xbb\xbf" + s.encode("utf-8"))
            elif c == 2:
                payloads.append(s.encode("latin-1"))
            else:
                payloads.append(b"\xff\xfe" + s.encode("utf-16-le"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def decode_payloads(payloads: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, payload) → (doc_id, charset, text): detected label +
    UTF-8-normalized text."""

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        labels: list[str] = []
        texts: list[str] = []
        for payload in batch["payload"].to_pylist():
            label, text = detect_charset(payload)
            labels.append(label)
            texts.append(text)
        return pa.table(
            {
                "doc_id": ids,
                "charset": pa.array(labels, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return payloads.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )
