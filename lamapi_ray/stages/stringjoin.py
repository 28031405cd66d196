"""String similarity self-join (edit-distance ≤ k pairs) via SymSpell
deletion-variant blocking.

The classic fuzzy-matching join: if ``lev(a, b) ≤ k`` then a and b share a
common ≤k-delete variant (the symmetric-delete property — the same routing
invariant the sharded FUZZY retrieval uses,
stages/candidates_sharded.py:80-103), so emitting every string under each
of its delete variants and co-locating by variant guarantees every
qualifying pair meets in ≥1 group. Per-group candidates are verified with
the exact DP edit distance, and ONE grouped distinct removes pairs that
met under several shared variants.

Scale shape: replication factor is |variants| ≈ O(len^k) per string —
bounded for token-length strings; the exchange carries (variant, string)
pairs, never the corpus rows; candidate verification cost is bounded by
the true near-pair density plus variant collisions (short strings
collide more — a min-length filter is the standard mitigation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.functions.text import levenshtein
from lamapi_ray.stages.candidates_sharded import delete_variants
from lamapi_ray.stages.dedup import scaled_partitions


def similarity_self_join(
    ds: ray.data.Dataset,
    col: str,
    max_dist: int = 1,
    min_len: int = 2,
) -> ray.data.Dataset:
    """→ distinct (a, b) string pairs with ``lev(a, b) ≤ max_dist``, a < b.

    ``ds[col]`` must already be distinct values (dedupe upstream);
    strings shorter than ``min_len`` are dropped (they pair with
    everything)."""

    def emit_variants(batch: pa.Table) -> pa.Table:
        vals = [
            v for v in batch[col].to_pylist()
            if v is not None and len(v) >= min_len
        ]
        outs_v, outs_s = [], []
        for s in vals:
            for d in delete_variants(s, max_dist):
                outs_v.append(d)
                outs_s.append(s)
        return pa.table(
            {"variant": pa.array(outs_v, pa.string()),
             "s": pa.array(outs_s, pa.string())}
        )

    def group_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        n = len(group)
        if n < 2:
            return empty
        ss = sorted(set(group["s"].to_pylist()))
        out_a, out_b = [], []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                if abs(len(ss[i]) - len(ss[j])) <= max_dist and levenshtein(
                    ss[i], ss[j]
                ) <= max_dist:
                    out_a.append(ss[i])
                    out_b.append(ss[j])
        if not out_a:
            return empty
        return pa.table(
            {"a": pa.array(out_a, pa.string()),
             "b": pa.array(out_b, pa.string())}
        )

    def dedup_pairs(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
            )
        seen = sorted(set(zip(group["a"].to_pylist(), group["b"].to_pylist())))
        return pa.table(
            {"a": pa.array([p[0] for p in seen], pa.string()),
             "b": pa.array([p[1] for p in seen], pa.string())}
        )

    cand = (
        ds.map_batches(emit_variants, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("variant", num_partitions=scaled_partitions(0.5, 16))
        .map_groups(group_pairs, batch_format="pyarrow")
    )
    # a pair that shares multiple variants is emitted several times — one
    # grouped distinct on the pair key finishes
    return cand.groupby(["a", "b"], num_partitions=scaled_partitions(0.25, 8)).map_groups(
        dedup_pairs, batch_format="pyarrow"
    )
