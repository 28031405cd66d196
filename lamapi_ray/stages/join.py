"""Distributed join operators for Ray Data (broadcast + bucketed hash join).

Ray Data has no general join primitive in every release, and the reference's
lookups are Mongo ``$in`` point queries (e.g.
api/model/data_retrievers/types_retriever.py:11-12) — inner semi/equi joins
in batch terms. Two explicit strategies, chosen by the caller:

* :func:`broadcast_join` — the small side is ``ray.put`` ONCE and merged
  into every batch of the large side (pandas merge per batch). No shuffle.
  Right choice whenever the small side is dimension/vocabulary-bounded.
* :func:`bucketed_hash_join` — both sides large: add ``bucket =
  hash(key) % B`` to both, tag the side, union, ``groupby(bucket)`` (ONE
  all-to-all), and merge the two sides inside ``map_groups``. Skewed keys
  are spread by bucketing on the *full key tuple* hash; B is the knob to
  keep per-bucket working sets in worker heap (B ≈ total_bytes /
  128 MiB at scale).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _stable_bucket(frame: pd.DataFrame, keys: list[str], num_buckets: int) -> pd.Series:
    """Deterministic per-row bucket from the key columns (no PYTHONHASHSEED)."""
    import zlib

    joined = frame[keys[0]].astype(str)
    for k in keys[1:]:
        joined = joined + "\x1f" + frame[k].astype(str)
    return joined.map(lambda s: zlib.crc32(s.encode("utf-8")) % num_buckets)


def broadcast_join(
    large: ray.data.Dataset,
    small: pa.Table | pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Merge a driver-resident small table into every batch of ``large``."""
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    on = [on] if isinstance(on, str) else list(on)
    small_ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        # ray.get of a local object is a zero-copy lookup after the first
        # touch on a worker — the table is shipped once per node, not per
        # batch; stateless tasks keep the stage elastic (no CPU reservation).
        return batch.merge(ray.get(small_ref), on=on, how=how)

    return large.map_batches(merge, batch_format="pandas")


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str] | str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Inner equi-join of two large Datasets via one bucket shuffle.

    The two sides are column-aligned (missing columns null-filled) so they
    can share one ``union`` + ``groupby(bucket)`` exchange; ``map_groups``
    then merges the sides per bucket. Output columns: key columns, then
    left payload, then right payload.
    """
    on = [on] if isinstance(on, str) else list(on)
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    lpayload = [c for c in lcols if c not in on]
    rpayload = [c for c in rcols if c not in on]
    overlap = set(lpayload) & set(rpayload)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    all_cols = on + lpayload + rpayload

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = None
            batch["__side"] = side
            batch["__bucket"] = _stable_bucket(batch, on, num_buckets)
            return batch[all_cols + ["__side", "__bucket"]]

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lpart = group.loc[group["__side"] == "l", on + lpayload]
        rpart = group.loc[group["__side"] == "r", on + rpayload]
        if len(lpart) == 0 or len(rpart) == 0:
            return pd.DataFrame(columns=all_cols)
        return lpart.merge(rpart, on=on, how="inner")[all_cols]

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
