"""Distributed AS-OF join — an operator Ray Data has no primitive for.

For every left row, attach the single right row with the same key and the
largest timestamp ≤ the left row's timestamp (ties broken by the largest
``tiebreak`` value — deterministic by construction). The classic use is
event attribution: each purchase joined to the user's most recent prior
click.

Dataflow: both sides are tagged and co-located by ONE grouped exchange on
``hash(key) % width`` (the partitioning assumption: all rows of a key meet
in one group — same contract as every bucketed join here). Inside a group
the match is fully vectorized with a merged forward-fill instead of a
per-row probe:

1. lexsort the union of both sides by (key, ts, side, tiebreak) with right
   rows ordered BEFORE left rows at equal ts (≤ semantics);
2. ``np.maximum.accumulate`` over right-row positions yields, at every
   merged position, the last right row seen in sort order — which is
   exactly the as-of match (latest ts, then largest tiebreak);
3. a per-key segment floor invalidates matches that leaked across key
   boundaries (previous keys' rights sit at smaller positions than the
   current key's segment start).

O(n log n) per group, no per-row Python, no quadratic key blowup on skew
(a hot key costs one sort of its own rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.stages.dedup import scaled_partitions
from lamapi_ray.stages.graph import _bucket_col


def _np(col, dtype=None):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype(dtype) if dtype is not None else arr


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    ts: str,
    tiebreak: str,
    right_payload: dict[str, str],
    width: int | None = None,
) -> ray.data.Dataset:
    """→ left rows + ``right_payload`` columns (source → output name) from
    the as-of matched right row (null when the key has no prior right row).
    ``by`` may be any column type hashable by the bucket hash (stringified);
    ``ts`` must be a totally ordered column shared by both sides."""
    width = width or scaled_partitions(1.0, 8)
    lschema = left.schema()
    lcols = list(lschema.names)
    rp_src = list(right_payload)

    def tag(side: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[by]
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            out = {c: batch[c] for c in cols}
            out["__side"] = pa.array([side] * len(batch), pa.string())
            out["__bucket"] = _bucket_col(key.cast(pa.string()), width)
            return pa.table(out)

        return fn

    # column-align the two sides so one union + one exchange carries both
    rtypes = dict(zip(right.schema().names, right.schema().types))
    ltypes = dict(zip(lschema.names, lschema.types))
    all_cols = sorted(set(lcols) | set([by, ts, tiebreak] + rp_src))
    types = {c: ltypes.get(c, rtypes.get(c)) for c in all_cols}

    def align(fn):
        def wrapped(batch: pa.Table) -> pa.Table:
            t = fn(batch)
            cols = {}
            for c in all_cols:
                if c in t.column_names:
                    col = t[c]
                    cols[c] = (
                        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    ).cast(types[c])
                else:
                    cols[c] = pa.nulls(len(t), types[c])
            cols["__side"] = t["__side"]
            cols["__bucket"] = t["__bucket"]
            return pa.table(cols)

        return wrapped

    both = left.map_batches(
        align(tag("l", lcols)), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            align(tag("r", list(dict.fromkeys([by, ts, tiebreak] + rp_src)))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    out_names = lcols + [right_payload[c] for c in rp_src]

    def match(group: pa.Table) -> pa.Table:
        side = group["__side"].combine_chunks()
        is_left = pc.equal(side, "l").to_numpy(zero_copy_only=False)
        key = group[by]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kcodes = np.asarray(
            key.cast(pa.string()).dictionary_encode().indices, dtype=np.int64
        )
        tv = _np(group[ts])
        tb = _np(group[tiebreak], np.int64)
        n = len(group)
        # right rows BEFORE left rows at equal ts → side rank l=1, r=0
        srank = is_left.astype(np.int64)
        order = np.lexsort((tb, srank, tv, kcodes))
        k_s = kcodes[order]
        left_s = is_left[order]
        ridx = np.where(~left_s, np.arange(n), -1)
        last_right = np.maximum.accumulate(ridx)
        newkey = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        seg_start = np.maximum.accumulate(np.where(newkey, np.arange(n), 0))
        lpos = np.nonzero(left_s)[0]
        cand = last_right[lpos]
        valid = cand >= seg_start[lpos]
        lrows = order[lpos]  # original row ids of left rows
        rrows = order[np.maximum(cand, 0)]  # original row ids of matches
        cols = {}
        for c in lcols:
            col = group[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(pa.array(lrows))
        vmask = pa.array(valid)
        for c in rp_src:
            col = group[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            taken = col.take(pa.array(rrows))
            cols[right_payload[c]] = pc.if_else(
                vmask, taken, pa.nulls(len(lrows), types[c])
            )
        return pa.table(cols).select(out_names)

    return (
        both.groupby("__bucket", num_partitions=width)
        .map_groups(match, batch_format="pyarrow")
    )


def range_count_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    ts: str,
    window_us: int,
    out_col: str = "n_in_window",
    width: int | None = None,
) -> ray.data.Dataset:
    """Range join reduced to a count: for every left row, the number of
    right rows with the same key and ``ts`` in the half-open window
    ``(left.ts − window, left.ts]``.

    Same one-exchange co-location as :func:`asof_join`; per group the
    count is two ``np.searchsorted`` probes against the key-offset right
    timeline (no pair materialization — a genuine range join would emit
    |matches| rows, this aggregate form ships one int per left row, which
    is the scalable contract for attribution counts)."""
    width = width or scaled_partitions(1.0, 8)
    lcols = list(left.schema().names)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[by]
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            cols = {c: batch[c] for c in batch.column_names}
            cols["__side"] = pa.array([side] * len(batch), pa.string())
            cols["__bucket"] = _bucket_col(key.cast(pa.string()), width)
            return pa.table(cols)

        return fn

    rkeep = [by, ts]
    rtypes = dict(zip(right.schema().names, right.schema().types))
    ltypes = dict(zip(left.schema().names, left.schema().types))
    all_cols = sorted(set(lcols) | set(rkeep))
    types = {c: ltypes.get(c, rtypes.get(c)) for c in all_cols}

    def align(fn):
        def wrapped(batch: pa.Table) -> pa.Table:
            t = fn(batch)
            cols = {}
            for c in all_cols:
                if c in t.column_names:
                    col = t[c]
                    cols[c] = (
                        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    ).cast(types[c])
                else:
                    cols[c] = pa.nulls(len(t), types[c])
            cols["__side"] = t["__side"]
            cols["__bucket"] = t["__bucket"]
            return pa.table(cols)

        return wrapped

    both = left.map_batches(
        align(tag("l")), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            lambda b, _f=align(tag("r")): _f(b.select(rkeep)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def count(group: pa.Table) -> pa.Table:
        side = group["__side"].combine_chunks()
        is_left = pc.equal(side, "l").to_numpy(zero_copy_only=False)
        key = group[by]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kcodes = np.asarray(
            key.cast(pa.string()).dictionary_encode().indices, dtype=np.int64
        )
        tv = _np(group[ts]).astype("datetime64[us]").astype(np.int64)
        # offset each key onto a disjoint stretch of the int64 line so one
        # sorted array serves every key: key_code * SPAN + (ts - min_ts),
        # SPAN > max ts spread + window
        tmin = tv.min() if len(tv) else 0
        rel = tv - tmin
        span = int(rel.max()) + window_us + 2 if len(rel) else 1
        if len(kcodes) and int(kcodes.max()) >= (1 << 62) // span:
            # keys-per-bucket × time-span must fit the int64 line; the
            # remedy is a wider exchange (more buckets → fewer keys each)
            raise ValueError(
                "range_count_join: key×span overflows the int64 timeline; "
                "increase `width`"
            )
        lined = kcodes * span + rel
        r_line = np.sort(lined[~is_left])
        l_line = lined[is_left]
        hi = np.searchsorted(r_line, l_line, side="right")
        lo = np.searchsorted(r_line, l_line - window_us, side="right")
        cnt = (hi - lo).astype(np.int64)
        lrows = np.nonzero(is_left)[0]
        cols = {}
        for c in lcols:
            col = group[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(pa.array(lrows))
        cols[out_col] = pa.array(cnt)
        return pa.table(cols)

    return (
        both.groupby("__bucket", num_partitions=width)
        .map_groups(count, batch_format="pyarrow")
    )
