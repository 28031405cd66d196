"""Bucketed semi/anti join (stages/join.py::bucketed_semi_anti_join)."""

import numpy as np
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


def test_bloom_semi_join_matches_plain_semi_join(ray_session, tmp_path):
    """The Bloom prefilter must not change the result (no false
    negatives; false positives die in the exact confirm): bloom_semi_join
    over a tiny synthetic sf dir == the brute-force semi join."""
    import duckdb
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import bloom_semi_join

    rng = np.random.default_rng(7)
    n_ord = 200
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_totalprice": pa.array(
                rng.uniform(1000.0, 500000.0, n_ord), pa.float64()
            ),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array(
                rng.integers(0, n_ord, 2000, dtype=np.int64)
            ),
            "l_linenumber": pa.array(np.arange(2000, dtype=np.int64)),
            "l_quantity": pa.array(
                rng.uniform(1.0, 50.0, 2000), pa.float64()
            ),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = bloom_semi_join(str(tmp_path))
    want = duckdb.sql(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM li "
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > 480000) ORDER BY l_orderkey, l_linenumber"
    ).arrow()
    assert got.num_rows == want.num_rows
    for c in ("l_orderkey", "l_linenumber", "l_quantity"):
        assert got[c].to_pylist() == want[c].to_pylist()
