"""Grid-cell-bucketed spatial self-join — near-pair search without the
all-pairs blowup.

The spatial analogue of the LSH/shingle blocking used by the dedup
family: points land in integer grid cells of side ≥ the search radius,
every qualifying pair is then guaranteed to sit in ADJACENT cells, so one
grouped exchange on the cell key (each point shipped to its home cell and
its 8 neighbors — constant ×9 replication) co-locates every candidate
pair and the per-cell kernel is a small vectorized brute force bounded by
cell occupancy, never corpus².

Pair dedup rule: the pair (a, b) with a < b is REPORTED ONLY in
``home(a)`` — a is a resident there, and b's replica visits every
neighbor of ``home(b)`` ⊇ ``home(a)`` (adjacency follows from
dist ≤ radius < cell side), so each pair is seen exactly once.

Distances are CHEBYSHEV over integer coordinates — everything is exact
int64 arithmetic, so the operator is oracle-mirrorable in SQL with a
range join (no float geometry to drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def near_pairs(
    pts: ray.data.Dataset,
    radius: int = 3,
    cell: int = 4,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(id, x, y) points → (id_a, id_b, dx, dy) pairs with
    max(|dx|, |dy|) ≤ radius and id_a < id_b.

    Requires ``cell > radius`` (adjacency guarantee)."""
    if cell <= radius:
        raise ValueError("cell side must exceed the search radius")

    def replicate(batch: pa.Table) -> pa.Table:
        pid = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = x // cell, y // cell
        outs = []
        for ddx in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                # cell key packed into one int64 (coords are non-negative
                # and cell ids < 2^31 by contract)
                key = (cx + ddx) * np.int64(1 << 31) + (cy + ddy)
                outs.append(
                    pa.table(
                        {
                            "cellkey": pa.array(key, pa.int64()),
                            "id": pa.array(pid, pa.int64()),
                            "x": pa.array(x, pa.int64()),
                            "y": pa.array(y, pa.int64()),
                            "resident": pa.array(
                                np.full(len(pid), ddx == 0 and ddy == 0),
                                pa.bool_(),
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def cell_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dx": pa.array([], pa.int64()),
                "dy": pa.array([], pa.int64()),
            }
        )
        n = len(group)
        if n == 0:
            return empty
        pid = group["id"].combine_chunks().to_numpy(zero_copy_only=False)
        x = group["x"].combine_chunks().to_numpy(zero_copy_only=False)
        y = group["y"].combine_chunks().to_numpy(zero_copy_only=False)
        res = group["resident"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ra = np.flatnonzero(res)
        if len(ra) == 0:
            return empty
        # residents × everyone-in-cell, vectorized: occupancy-bounded
        ia = np.repeat(ra, n)
        ib = np.tile(np.arange(n), len(ra))
        keep = (
            (pid[ia] < pid[ib])
            & (np.abs(x[ia] - x[ib]) <= radius)
            & (np.abs(y[ia] - y[ib]) <= radius)
        )
        ia, ib = ia[keep], ib[keep]
        return pa.table(
            {
                "id_a": pa.array(pid[ia], pa.int64()),
                "id_b": pa.array(pid[ib], pa.int64()),
                "dx": pa.array(x[ib] - x[ia], pa.int64()),
                "dy": pa.array(y[ib] - y[ia], pa.int64()),
            }
        )

    return (
        pts.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cellkey", num_partitions=num_partitions)
        .map_groups(cell_pairs, batch_format="pyarrow")
    )
