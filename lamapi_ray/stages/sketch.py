"""Distributed cardinality sketch (HyperLogLog registers).

The approximate-distinct operator a 100 TB pipeline uses where an exact
``count(distinct)`` would shuffle the full key stream: every batch folds
its keys into a TINY register array (m = 2^p buckets × max leading-zero
rank), the partials merge with an elementwise max — associative and
commutative, so ONE m-row grouped exchange finishes the job no matter the
corpus size or skew. Nothing key-stream-sized ever crosses the wire.

Determinism: the key hash is the house multiplicative mod-(2^61-1) hash
(functions/inthash — HUGEINT-reproducible), bucket/remainder are integer
field extractions, and the rank is an integer bit-length — so the REGISTER
TABLE itself is exactly oracle-checkable in SQL (bit length via
``length(bin(x))``). The float estimate is a deterministic function of the
registers (all 2^-rho terms are exact powers of two ≥ 2^-(W+1), so the sum
is exact in double regardless of order) — exposed separately.

p=6 (64 registers), W=25 remainder bits: standard HLL error ~1.04/√64 ≈
13%; raise p for tighter estimates (register count is the only cost).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.functions.inthash import MOD61, fold_mod61, mulmod61

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 25                     # remainder bits used for the rank
HLL_MULT = np.uint64(0x9E3779B97F4A7C15 % MOD61)  # dataset_split's mixer


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    h = ids.astype(np.int64).view(np.uint64)
    return fold_mod61(mulmod61(fold_mod61(h), np.full(len(h), HLL_MULT)) + np.uint64(1))


def batch_registers(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (bucket, max_rho) partial registers of one batch (≤ m rows)."""
    h = _hash_ids(ids)
    bucket = (h % np.uint64(HLL_M)).astype(np.int64)
    rem = ((h >> np.uint64(HLL_P)) % np.uint64(1 << HLL_W)).astype(np.int64)
    # integer bit length; rem < 2^25 so the float64 conversion is exact and
    # floor(log2) cannot cross a power-of-two boundary
    rho = np.full(len(rem), HLL_W + 1, np.int64)
    nz = rem > 0
    rho[nz] = HLL_W - np.floor(np.log2(rem[nz])).astype(np.int64)
    regs = np.zeros(HLL_M, np.int64)
    np.maximum.at(regs, bucket, rho)
    nonzero = np.flatnonzero(regs)
    return nonzero, regs[nonzero]


def hll_registers(
    ds: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """→ (bucket, max_rho): the merged HLL register table of ``id_col``."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bucket, rho = batch_registers(ids)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("rho"))
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch["bucket"],
                "max_rho": batch["max(rho)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def hll_estimate(registers: pa.Table) -> float:
    """Standard HLL estimate from the register table (empty buckets count
    as rho=0). Small-range correction (linear counting) applied when the
    raw estimate ≤ 2.5m and empty buckets exist."""
    m = HLL_M
    regs = np.zeros(m, np.int64)
    regs[registers["bucket"].to_numpy(zero_copy_only=False)] = (
        registers["max_rho"].to_numpy(zero_copy_only=False)
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(raw)
