"""Gzip text-shard source — the ``.tsv.gz`` ingestion shape.

Web corpora ship as compressed line-oriented shards (one blob → many
records). This models that end to end with stdlib ``gzip``:

* **writer**: docs grouped into shards by ``doc_id // shard_size`` (range
  buckets — deterministic membership, no skew), each shard serialized as
  ``"<doc_id>\\t<text>\\n"`` lines and gzip-compressed — one binary blob
  per shard;
* **reader**: a row-expanding ``map_batches`` over the shard blobs —
  decompress, split lines, emit one row per record. Decompression is
  per-shard (inherently sequential within a blob, parallel across blobs),
  exactly how a multi-node reader fans out over ``.gz`` shard files.

The roundtrip is byte-exact as long as text carries no tab/newline (true
of the corpus; the writer asserts it rather than silently corrupting).
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def write_gzip_shards(
    docs: ray.data.Dataset, shard_size: int = 50, level: int = 6
) -> ray.data.Dataset:
    """documents (doc_id, text) → (shard_id, payload gzip-bytes, n_docs)."""

    def with_shard(batch: pa.Table) -> pa.Table:
        sid = pc.divide(batch["doc_id"], shard_size).cast(pa.int64())
        return pa.table(
            {"shard_id": sid, "doc_id": batch["doc_id"], "text": batch["text"]}
        )

    def pack(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        texts = group["text"].to_pylist()
        lines = []
        for k in order:
            t = texts[k]
            if "\t" in t or "\n" in t:
                raise ValueError("record separator present in text")
            lines.append(f"{ids[k]}\t{t}\n")
        payload = gzip.compress("".join(lines).encode("utf-8"), level, mtime=0)
        return pa.table(
            {
                "shard_id": pa.array([group["shard_id"][0].as_py()], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
                "n_docs": pa.array([len(ids)], pa.int64()),
            }
        )

    return (
        docs.map_batches(with_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard_id")
        .map_groups(pack, batch_format="pyarrow")
    )


def read_gzip_shards(shards: ray.data.Dataset) -> ray.data.Dataset:
    """(shard_id, payload) → documents (doc_id, text), one row per line."""

    def unpack(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        texts: list[str] = []
        for payload in batch["payload"].to_pylist():
            for line in gzip.decompress(payload).decode("utf-8").splitlines():
                i, t = line.split("\t", 1)
                ids.append(int(i))
                texts.append(t)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return shards.map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True, batch_size=16
    )
