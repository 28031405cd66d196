"""Distributed join operators for Ray Data (broadcast + bucketed hash join).

Ray Data has no general join primitive in every release, and the reference's
lookups are Mongo ``$in`` point queries (e.g.
api/model/data_retrievers/types_retriever.py:11-12) — inner semi/equi joins
in batch terms. Two explicit strategies, chosen by the caller:

* :func:`broadcast_join` — the small side is ``ray.put`` ONCE and joined
  into every batch of the large side (pyarrow hash join per batch). No
  shuffle. Right choice whenever the small side is dimension/vocabulary-
  bounded.
* :func:`bucketed_hash_join` — both sides large: add ``bucket =
  hash(key) % B`` to both (vectorized polynomial hash over the key bytes —
  :mod:`lamapi_ray.functions.inthash`, no per-row Python), tag the side,
  union, ``groupby(bucket)`` (ONE all-to-all), and merge the two sides with
  a pyarrow C++ hash join per bucket. Arrow batches end to end. Skewed keys
  are spread by bucketing on the *full key tuple* hash; B is the knob to
  keep per-bucket working sets in worker heap (B ≈ total_bytes /
  128 MiB at scale).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from lamapi_ray.functions.inthash import hash_key_columns


def broadcast_join(
    large: ray.data.Dataset,
    small: pa.Table,
    on: list[str] | str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join a driver-resident small table into every batch of ``large``."""
    import pandas as pd

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    on = [on] if isinstance(on, str) else list(on)
    small_ref = ray.put(small.combine_chunks())
    join_type = {"inner": "inner", "left": "left outer"}.get(how, how)

    def merge(batch: pa.Table) -> pa.Table:
        # ray.get of a local object is a zero-copy lookup after the first
        # touch on a worker — the table is shipped once per node, not per
        # batch; stateless tasks keep the stage elastic (no CPU reservation).
        return batch.join(ray.get(small_ref), keys=on, join_type=join_type)

    return large.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def _null_column(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str] | str,
    num_buckets: int = 32,
    dedup_sides: bool = False,
) -> ray.data.Dataset:
    """Inner equi-join of two large Datasets via one bucket shuffle.

    The two sides are column-aligned (missing columns null-filled with the
    other side's types) so they can share one ``union`` + ``groupby(bucket)``
    exchange; each bucket is then merged with ``pa.Table.join`` (pyarrow's
    C++ hash join). Output columns: key columns, then left payload, then
    right payload.

    ``dedup_sides=True`` makes each side row-DISTINCT (over key + payload)
    before the merge, inside the join bucket: a key lands in exactly one
    bucket, so per-bucket dedup is exact global dedup — a caller that
    would otherwise need its own distinct exchange before the join rides
    this one for free (used by predicate_inverse_align on 3M triples:
    one exchange instead of two).
    """
    on = [on] if isinstance(on, str) else list(on)
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    lpayload = [c for c in lcols if c not in on]
    rpayload = [c for c in rcols if c not in on]
    overlap = set(lpayload) & set(rpayload)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    all_cols = on + lpayload + rpayload
    types = {}
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        types.setdefault(name, typ)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    col = batch[c]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    cols[c] = col.cast(types[c])
                else:
                    cols[c] = _null_column(n, types[c])
            cols["__side"] = pa.array([side] * n, pa.string())
            cols["__bucket"] = pa.array(
                hash_key_columns(batch, on, num_buckets), pa.int64()
            )
            return pa.table(cols)

        return fn

    both = left.map_batches(
        tag("l"), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag("r"), batch_format="pyarrow", zero_copy_batch=True))

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lmask = pc.equal(side, "l")
        lpart = group.filter(lmask).select(on + lpayload)
        rpart = group.filter(pc.invert(lmask)).select(on + rpayload)
        if dedup_sides:
            lpart = lpart.group_by(lpart.column_names).aggregate([])
            rpart = rpart.group_by(rpart.column_names).aggregate([])
        if len(lpart) == 0 or len(rpart) == 0:
            return pa.table(
                {c: pa.array([], types[c]) for c in all_cols}
            )
        return lpart.join(rpart, keys=on, join_type="inner").select(all_cols)

    return both.groupby("__bucket", num_partitions=num_buckets).map_groups(join_bucket, batch_format="pyarrow")


def bucketed_semi_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str] | str,
    how: str = "anti",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Semi/anti equi-join of two large Datasets via one bucket shuffle.

    Returns the LEFT rows that have (semi) / don't have (anti) a key match
    in ``right``. The right side ships only its DISTINCT key tuples —
    per-batch distinct prune before the exchange, so an arbitrarily wide or
    duplicated right side costs one key column per distinct key per block.
    Per-bucket finish is pyarrow's C++ "left semi"/"left anti" hash join.
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    lschema = left.schema()
    lcols = list(lschema.names)
    types = dict(zip(lschema.names, lschema.types))
    for name, typ in zip(right.schema().names, right.schema().types):
        types.setdefault(name, typ)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col
        cols["__side"] = pa.array(["l"] * len(batch), pa.string())
        cols["__bucket"] = pa.array(
            hash_key_columns(batch, on, num_buckets), pa.int64()
        )
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch.select(on).group_by(on).aggregate([])  # map-side distinct
        n = len(keys)
        cols = {c: keys[c].combine_chunks().cast(types[c]) if isinstance(keys[c], pa.ChunkedArray) else keys[c].cast(types[c]) for c in on}
        for c in lcols:
            if c not in on:
                cols[c] = _null_column(n, types[c])
        cols["__side"] = pa.array(["r"] * n, pa.string())
        cols["__bucket"] = pa.array(
            hash_key_columns(keys, on, num_buckets), pa.int64()
        )
        return pa.table({c: cols[c] for c in lcols + ["__side", "__bucket"]})

    both = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    join_type = "left semi" if how == "semi" else "left anti"

    def finish(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lmask = pc.equal(side, "l")
        lpart = group.filter(lmask).select(lcols)
        rkeys = group.filter(pc.invert(lmask)).select(on)
        if len(lpart) == 0:
            return pa.table({c: pa.array([], types[c]) for c in lcols})
        if len(rkeys) == 0:
            # no right keys in this bucket: anti keeps all, semi keeps none
            if how == "anti":
                return lpart
            return pa.table({c: pa.array([], types[c]) for c in lcols})
        return lpart.join(rkeys, keys=on, join_type=join_type).select(lcols)

    return both.groupby("__bucket", num_partitions=num_buckets).map_groups(
        finish, batch_format="pyarrow"
    )
