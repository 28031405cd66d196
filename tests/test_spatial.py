"""Grid-cell spatial self-join (stages/spatial.py::near_pairs)."""

import numpy as np
import pyarrow as pa


def _brute(pid, x, y, radius):
    out = []
    for i in range(len(pid)):
        for j in range(len(pid)):
            if (
                pid[i] < pid[j]
                and abs(x[i] - x[j]) <= radius
                and abs(y[i] - y[j]) <= radius
            ):
                out.append((pid[i], pid[j], x[j] - x[i], y[j] - y[i]))
    return sorted(out)


def test_near_pairs_matches_brute_force(ray_session):
    """Random cloud dense enough for cross-cell pairs: cell exchange ==
    brute force (incl. pairs straddling cell borders, the dedup rule)."""
    import ray.data

    from lamapi_ray.stages.spatial import near_pairs

    rng = np.random.default_rng(9)
    n = 400
    pid = np.arange(n, dtype=np.int64)
    x = rng.integers(0, 80, n).astype(np.int64)
    y = rng.integers(0, 80, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {"id": pa.array(pid), "x": pa.array(x), "y": pa.array(y)}
        )
    ).repartition(4)
    got = pa.concat_tables(
        near_pairs(ds, radius=3, cell=4, num_partitions=8).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"
        )
    )
    rows = sorted(
        zip(
            got["id_a"].to_pylist(),
            got["id_b"].to_pylist(),
            got["dx"].to_pylist(),
            got["dy"].to_pylist(),
        )
    )
    assert rows == _brute(pid, x, y, 3)


def test_near_pairs_rejects_bad_cell(ray_session):
    import pytest
    import ray.data

    from lamapi_ray.stages.spatial import near_pairs

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([1]), "x": pa.array([0]), "y": pa.array([0])})
    )
    with pytest.raises(ValueError):
        near_pairs(ds, radius=4, cell=4)


def test_grid_dbscan_matches_scalar_dbscan(ray_session, tmp_path):
    """grid_dbscan vs a scalar DBSCAN (min-id labels, min-label border
    rule) on a crafted events table with known dense blobs."""
    import pyarrow.parquet as pq

    from lamapi_ray.functions.inthash import fold_mod61, mulmod61
    from lamapi_ray.pipelines.extras import grid_dbscan

    n = 10000  # dense enough on the 600x600 torus for cores + borders
    eid = np.arange(n, dtype=np.int64)
    ev = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(np.zeros(n, np.int64), pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(np.zeros(n), pa.float64()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    got = grid_dbscan(str(tmp_path))

    # scalar reference
    h = fold_mod61(eid.view(np.uint64))
    x = (mulmod61(h, np.full(n, np.uint64(2177342782468422681)))
         % np.uint64(600)).astype(np.int64)
    y = (mulmod61(h, np.full(n, np.uint64(194409311614856021)))
         % np.uint64(600)).astype(np.int64)
    neigh = {i: [] for i in range(n)}
    for lo in range(0, n, 1000):  # vectorized chunked all-pairs
        xs, ys = x[lo:lo + 1000], y[lo:lo + 1000]
        m = (np.abs(xs[:, None] - x[None, :]) <= 3) & (
            np.abs(ys[:, None] - y[None, :]) <= 3
        )
        ii, jj = np.nonzero(m)
        for i, j in zip(ii + lo, jj):
            if i < j:
                neigh[int(i)].append(int(j))
                neigh[int(j)].append(int(i))
    core = {i for i in range(n) if len(neigh[i]) >= 3}
    # min-label components over core-core edges
    lab = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in neigh[i]:
                if j in core and lab[j] < lab[i]:
                    lab[i] = lab[j]
                    changed = True
    rows = {}
    for i in core:
        rows[i] = (lab[i], True)
    for i in range(n):
        if i not in core:
            cl = [lab[j] for j in neigh[i] if j in core]
            if cl:
                rows[i] = (min(cl), False)
    want = sorted((i, c, k) for i, (c, k) in rows.items())
    got_rows = list(
        zip(got["id"].to_pylist(), got["cluster"].to_pylist(),
            got["is_core"].to_pylist())
    )
    assert len(want) > 0 and any(k for _, _, k in want)  # non-trivial case
    assert got_rows == want
