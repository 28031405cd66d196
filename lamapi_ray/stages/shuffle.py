"""Skew-aware aggregation — explicit salting for head keys.

The canonicalization shuffle groups by normalized surface form, and web text
has brutal head-key skew ("usa", "apple" appear on a large fraction of
pages). A naive ``groupby(key).count()`` ships every occurrence of the head
key to one reducer. Two explicit counters:

* :func:`salted_count` — two-stage aggregation: stage 1 groups by
  ``(key, salt)`` where ``salt = hash(row) % S`` spreads each key over S
  reducers; stage 2 merges the S partials per key. The heaviest reducer
  sees at most ``total_key_rows / S`` rows.
* :func:`combined_count` — per-batch partial counts (map-side combine)
  merged by ONE small groupby. Strictly better than salting when the key
  domain is vocabulary-bounded (the partial output per block is ≤ |vocab|
  rows regardless of skew) — this is what the KG pipeline's
  ``distinct_mentions`` uses. Salting is the fallback when even the partial
  maps are too wide to combine (unbounded key domains).

Both return the same (key, count) result as a plain groupby — verified
against the DuckDB oracle by the ``mention_counts`` query.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import ray.data


def _scaled(per_cpu: float, floor_: int) -> int:
    from lamapi_ray.stages.dedup import scaled_partitions

    return scaled_partitions(per_cpu, floor_)


def salted_count(
    ds: ray.data.Dataset, key: str, num_salts: int = 16
) -> ray.data.Dataset:
    """Two-stage skew-spread count: groupby((key, salt)) then groupby(key)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt (row content + position independent of
        # PYTHONHASHSEED); crc of the key plus a rotating offset spreads
        # rows of the SAME key across salts
        keys = batch[key].to_pylist()
        salts = [
            (zlib.crc32(f"{i}".encode()) ^ zlib.crc32(k.encode())) % num_salts
            for i, k in enumerate(keys)
        ]
        return batch.append_column("__salt", pa.array(salts, pa.int64()))

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "__salt"], num_partitions=_scaled(0.5, 16))
        .count()
    )

    def drop_salt(batch: pa.Table) -> pa.Table:
        return pa.table({key: batch[key], "n": batch["count()"]})

    merged = (
        partial.map_batches(drop_salt, batch_format="pyarrow")
        .groupby(key, num_partitions=_scaled(0.5, 16))
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key: batch[key], "n": batch["sum(n)"].cast(pa.int64())}
        )

    return merged.map_batches(rename, batch_format="pyarrow")


def combined_count(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """Map-side combine then one vocabulary-bounded groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.value_counts()
        return pa.table(
            {key: vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").groupby(key, num_partitions=_scaled(0.5, 16)).sum("n")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key: batch[key], "n": batch["sum(n)"].cast(pa.int64())}
        )

    return merged.map_batches(rename, batch_format="pyarrow")


def shard_shuffle(
    ds: ray.data.Dataset,
    num_shards: int = 16,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic pre-training shuffle export: every row gets a
    scrambled-hash shuffle key, a shard ``key % num_shards``, and its
    position within the shard in (key, id) order — the
    shuffle-then-shard step that turns a curated corpus into training
    shards with a reproducible global order (re-running on the same
    corpus yields byte-identical shards, the resume property a
    multi-epoch training job needs).

    ONE groupby(shard) exchange; position assignment is a vectorized
    lexsort per shard group. Shards are uniform by construction
    (hash-spread), so the exchange has no skew; at 10^12 docs raise
    ``num_shards`` to the target file count and the same dataflow
    holds."""
    import numpy as np

    def keyed(batch: pa.Table) -> pa.Table:
        did = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = (did * 2654435761) % 1_000_000_007
        return pa.table(
            {
                id_col: pa.array(did, pa.int64()),
                "skey": pa.array(k, pa.int64()),
                "shard": pa.array(k % num_shards, pa.int64()),
            }
        )

    def rank(group: pa.Table) -> pa.Table:
        import numpy as np

        did = group[id_col].to_numpy(zero_copy_only=False)
        k = group["skey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, k))
        pos = np.empty(len(did), dtype=np.int64)
        pos[order] = np.arange(len(did))
        return pa.table(
            {
                id_col: group[id_col],
                "shard": group["shard"],
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(rank, batch_format="pyarrow")
    )
