"""Bucketed semi/anti join (stages/join.py::bucketed_semi_anti_join)."""

import pyarrow as pa

from lamapi_ray.stages.join import bucketed_semi_anti_join


def _run(ray, how, left, right, on="k", buckets=4):
    ds = bucketed_semi_anti_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on=on, how=how, num_buckets=buckets,
    )
    tbls = [ray.get(r) for r in ds.to_arrow_refs()]
    tbls = [t for t in tbls if t.num_rows and t.column_names]
    if not tbls:
        return []
    return sorted(pa.concat_tables(tbls)["k"].to_pylist())


def test_semi_and_anti_partition_left(ray_session):
    import ray

    left = pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                     "v": pa.array(list("abcde"), pa.string())})
    right = pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())})
    semi = _run(ray, "semi", left, right)
    anti = _run(ray, "anti", left, right)
    assert semi == [2, 4]
    assert anti == [1, 3, 5]
    # semi ∪ anti = left, disjoint
    assert sorted(semi + anti) == [1, 2, 3, 4, 5]


def test_anti_with_empty_right(ray_session):
    import ray

    left = pa.table({"k": pa.array([7, 8], pa.int64()),
                     "v": pa.array(["x", "y"], pa.string())})
    right = pa.table({"k": pa.array([], pa.int64())})
    assert _run(ray, "anti", left, right) == [7, 8]
    assert _run(ray, "semi", left, right) == []
