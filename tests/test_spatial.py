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
