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
