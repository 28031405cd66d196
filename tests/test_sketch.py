"""HyperLogLog sketch (stages/sketch.py): register determinism, merge
semantics, estimate accuracy."""

import numpy as np
import pyarrow as pa

from lamapi_ray.stages.sketch import (
    HLL_M,
    HLL_W,
    batch_registers,
    hll_estimate,
)


def test_batch_registers_deterministic_and_bounded():
    ids = np.arange(10_000, dtype=np.int64)
    b1, r1 = batch_registers(ids)
    b2, r2 = batch_registers(ids)
    assert np.array_equal(b1, b2) and np.array_equal(r1, r2)
    assert b1.min() >= 0 and b1.max() < HLL_M
    assert r1.min() >= 1 and r1.max() <= HLL_W + 1


def test_register_merge_is_elementwise_max():
    a_ids = np.arange(0, 5_000, dtype=np.int64)
    b_ids = np.arange(2_500, 7_500, dtype=np.int64)
    both = np.arange(0, 7_500, dtype=np.int64)

    def to_full(bucket, rho):
        regs = np.zeros(HLL_M, np.int64)
        regs[bucket] = rho
        return regs

    merged = np.maximum(to_full(*batch_registers(a_ids)),
                        to_full(*batch_registers(b_ids)))
    assert np.array_equal(merged, to_full(*batch_registers(both)))


def test_estimate_within_hll_error_bounds():
    rng_ids = (np.arange(50_000, dtype=np.int64) * 7919 + 13)
    bucket, rho = batch_registers(rng_ids)
    tbl = pa.table(
        {"bucket": pa.array(bucket, pa.int64()),
         "max_rho": pa.array(rho, pa.int64())}
    )
    est = hll_estimate(tbl)
    # standard error 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert abs(est - 50_000) / 50_000 < 0.4


def test_estimate_small_range_linear_counting():
    ids = np.arange(10, dtype=np.int64)
    bucket, rho = batch_registers(ids)
    tbl = pa.table(
        {"bucket": pa.array(bucket, pa.int64()),
         "max_rho": pa.array(rho, pa.int64())}
    )
    est = hll_estimate(tbl)
    assert 4 <= est <= 25


def test_bloom_no_false_negatives_and_low_fp():
    import pyarrow as pa

    from lamapi_ray.stages.sketch import bloom_bits, bloom_contains

    present = np.arange(100, dtype=np.int64) * 13 + 7
    w, bits = bloom_bits(present)
    tbl = pa.table(
        {"word_idx": pa.array(w, pa.int64()),
         "bits": pa.array(bits, pa.int64())}
    )
    assert bloom_contains(tbl, present).all()  # no false negatives
    absent = np.arange(5_000, dtype=np.int64) + 1_000_000
    fp = bloom_contains(tbl, absent).mean()
    # m=4096, k=2, n=100 -> theoretical fp ~ (1-e^(-2*100/4096))^2 ~ 0.2%
    assert fp < 0.02


def test_bloom_word_merge_is_or():
    from lamapi_ray.stages.sketch import BLOOM_M, bloom_bits

    a = np.arange(0, 300, dtype=np.int64)
    b = np.arange(150, 450, dtype=np.int64)

    def full(ids):
        w, bits = bloom_bits(ids)
        regs = np.zeros(BLOOM_M // 64, np.int64)
        regs[w] = bits
        return regs.view(np.uint64)

    merged = full(a) | full(b)
    assert np.array_equal(merged, full(np.arange(0, 450, dtype=np.int64)))


def test_histogram_quantiles_sandwich_and_merge(ray_session):
    # the q-estimate is the lower edge of the bin holding the ceil(q·n)-th
    # order statistic: exact_pq ∈ [est, est + width] (one-bin error bound);
    # batch-split invariance = histogram partials merge by sum
    import math

    import ray.data

    from lamapi_ray.stages.sketch import histogram_quantiles

    rng = np.random.default_rng(7)
    vals = np.round(rng.gamma(2.0, 50.0, 4000), 2)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, 4000)]
    tbl = pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = histogram_quantiles(ds, "event_type", "value").take_all()
        assert len(out) == 3
        lo, hi = float(vals.min()), float(vals.max())
        width = (hi - lo) / 128.0
        for row in out:
            sub = np.sort(vals[types == row["event_type"]])
            assert row["n_events"] == len(sub)
            for q, est in ((0.50, row["p50_est"]), (0.95, row["p95_est"]),
                           (0.99, row["p99_est"])):
                exact = sub[math.ceil(q * len(sub)) - 1]
                assert est - 1e-9 <= exact <= est + width + 1e-9, (
                    row["event_type"], q, est, exact)


def test_histogram_quantiles_all_equal_values(ray_session):
    # hi == lo: every value lands in bin 0 and all estimates equal the value
    import ray.data

    from lamapi_ray.stages.sketch import histogram_quantiles

    tbl = pa.table(
        {"event_type": pa.array(["x"] * 10), "value": pa.array([3.5] * 10)}
    )
    out = histogram_quantiles(
        ray.data.from_arrow(tbl), "event_type", "value"
    ).take_all()
    assert out == [
        {"event_type": "x", "n_events": 10,
         "p50_est": 3.5, "p95_est": 3.5, "p99_est": 3.5}
    ]


def test_cms_cells_deterministic_and_bounded():
    from lamapi_ray.stages.sketch import CMS_D, CMS_W, cms_cells

    ids = np.arange(500, dtype=np.int64)
    k1, c1 = cms_cells(ids)
    k2, c2 = cms_cells(ids)
    assert np.array_equal(k1, k2) and np.array_equal(c1, c2)
    assert len(k1) <= CMS_D * CMS_W
    # every row's counters sum to the batch size
    for i in range(CMS_D):
        m = (k1 >= i * CMS_W) & (k1 < (i + 1) * CMS_W)
        assert c1[m].sum() == len(ids)


def test_cms_never_underestimates_and_merge_is_sum(ray_session):
    import ray.data

    from lamapi_ray.stages.sketch import cms_estimate, count_min_sketch

    rng = np.random.default_rng(7)
    # zipf-ish key stream: heavy keys repeat
    ids = rng.integers(0, 200, 5000, dtype=np.int64) ** 2 % 97
    tbl = pa.table({"user_id": pa.array(ids, pa.int64())})
    out = pa.concat_tables(
        count_min_sketch(
            ray.data.from_arrow(tbl).repartition(4), "user_id"
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )
    uniq, true = np.unique(ids, return_counts=True)
    est = cms_estimate(out, uniq)
    assert np.all(est >= true)  # CMS never underestimates
    # d=4, w=1024 over 97 distinct keys: collisions are rare — most exact
    assert np.mean(est == true) > 0.9
    # register mass: each row holds exactly N counts
    n_per_row = np.zeros(4, np.int64)
    np.add.at(
        n_per_row,
        out["row"].to_numpy(zero_copy_only=False),
        out["n"].to_numpy(zero_copy_only=False),
    )
    assert np.all(n_per_row == len(ids))


def test_grouped_hll_matches_per_group_global(ray_session):
    """Each group's register table must equal the GLOBAL sketch of that
    group's keys run alone — the grouped partial fold is just m-striped."""
    import ray.data

    from lamapi_ray.stages.sketch import hll_estimate, hll_registers, hll_registers_grouped

    rng = np.random.default_rng(3)
    gs = np.array(["a", "b", "c"])[rng.integers(0, 3, 4000)]
    ids = rng.integers(0, 700, 4000, dtype=np.int64)
    tbl = pa.table(
        {"g": pa.array(gs.tolist(), pa.string()),
         "user_id": pa.array(ids, pa.int64())}
    )
    grouped = pa.concat_tables(
        hll_registers_grouped(
            ray.data.from_arrow(tbl).repartition(4), "g", "user_id"
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )
    for g in ("a", "b", "c"):
        sub = tbl.filter(pa.compute.equal(tbl["g"], g))
        solo = pa.concat_tables(
            hll_registers(
                ray.data.from_arrow(sub), "user_id"
            ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        ).sort_by("bucket")
        part = grouped.filter(pa.compute.equal(grouped["g"], g)).sort_by(
            "bucket"
        )
        assert part["bucket"].to_pylist() == solo["bucket"].to_pylist()
        assert part["max_rho"].to_pylist() == solo["max_rho"].to_pylist()
        # and the estimate derived from the grouped registers is sane
        est = hll_estimate(part.select(["bucket", "max_rho"]))
        true = len(set(sub["user_id"].to_pylist()))
        assert abs(est - true) / true < 0.45  # 1.04/sqrt(64) ~ 13%, 3+ sigma


def test_kmv_sketch_exact_bottom_k_and_estimate(ray_session):
    """KMV rows must be EXACTLY the k smallest distinct key hashes (the
    hash is a bijection, so brute-force hashing the distinct keys gives
    the reference), and the estimate must be (k-1)p/h_k within KMV's
    ~1/sqrt(k) relative error of the true distinct count."""
    import ray.data

    from lamapi_ray.functions.inthash import MOD61
    from lamapi_ray.stages.sketch import _hash_ids, kmv_sketch

    rng = np.random.default_rng(11)
    ids = rng.integers(0, 900, 6000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array(ids, pa.int64())})
    ).repartition(5)
    out = kmv_sketch(ds, "user_id", k=32)
    ref = np.sort(_hash_ids(np.unique(ids)))[:32]
    assert out["hv"].to_numpy(zero_copy_only=False).view(np.uint64).tolist() == ref.tolist()
    est = out["est_distinct"][0].as_py()
    expect = 31.0 * float(MOD61) / float(ref[-1])
    assert abs(est - expect) < 1e-3
    true = len(np.unique(ids))
    assert abs(est - true) / true < 0.6  # 3+ sigma at 1/sqrt(32) ~ 18%


def test_kmv_sketch_small_stream_is_exact(ray_session):
    """Fewer than k distinct keys → the sketch IS the distinct set and
    the estimate is the exact count."""
    import ray.data

    from lamapi_ray.stages.sketch import kmv_sketch

    ids = np.array([5, 7, 5, 9, 7, 5], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"user_id": pa.array(ids, pa.int64())}))
    out = kmv_sketch(ds, "user_id", k=32)
    assert out.num_rows == 3
    assert out["est_distinct"][0].as_py() == 3.0


def test_kmv_set_ops_estimates_and_membership(ray_session):
    """Set-algebra sketch on controlled overlap: exact sufficient
    statistics vs brute force, and estimates within KMV error of truth."""
    import ray.data

    from lamapi_ray.functions.inthash import MOD61
    from lamapi_ray.stages.sketch import _hash_ids, kmv_set_ops

    rng = np.random.default_rng(5)
    a = np.arange(0, 600, dtype=np.int64)          # A = 0..599
    b = np.arange(300, 900, dtype=np.int64)        # B = 300..899, |A∩B|=300
    ds_a = ray.data.from_arrow(
        pa.table({"user_id": pa.array(rng.permutation(np.repeat(a, 3)))})
    ).repartition(4)
    ds_b = ray.data.from_arrow(
        pa.table({"user_id": pa.array(rng.permutation(np.repeat(b, 2)))})
    ).repartition(3)
    out = kmv_set_ops(ds_a, ds_b, "user_id", k=32)
    # brute-force the sufficient statistics
    ha = np.sort(_hash_ids(a))[:32]
    hb = np.sort(_hash_ids(b))[:32]
    un = np.unique(np.concatenate([ha, hb]))[:32]
    n_both = int(np.sum(np.isin(un, ha) & np.isin(un, hb)))
    assert out["sketch_size"][0].as_py() == len(un)
    assert out["n_both"][0].as_py() == n_both
    ue = 31.0 * float(MOD61) / float(un[-1])
    assert abs(out["union_est"][0].as_py() - ue) < 1e-3
    # truth checks: union 900, jaccard 1/3, intersection 300 — KMV k=32
    # has ~18% relative error; allow 3 sigma
    assert abs(out["union_est"][0].as_py() - 900) / 900 < 0.6
    assert abs(out["inter_est"][0].as_py() - 300) / 300 < 0.9


def test_join_size_estimate_bound(ray_session):
    """CMS inner-product estimate must never underestimate the exact
    many-to-many join size, and should be within the e*Na*Nb/w slack."""
    from lamapi_ray.pipelines.extras import join_size_estimate

    out = join_size_estimate("/root/testdata/sf0.001")
    est = out["est_pairs"][0].as_py()
    exact = out["exact_pairs"][0].as_py()
    inner = out["inner_product"].to_pylist()
    assert est == min(inner)
    assert est >= exact > 0
    # slack bound: Na*Nb/w with w=1024 (expected collision mass)
    import duckdb
    na = duckdb.sql("SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet'").fetchone()[0]
    nb = duckdb.sql("SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet' WHERE event_type='purchase'").fetchone()[0]
    assert est - exact <= 8 * na * nb / 1024  # generous multiple of E[slack]
