"""Exact modular arithmetic + vectorized string hashing in uint64 numpy.

Shared by the fingerprint stage (block-Horner polynomial hash), the
bucketed hash join (deterministic key bucketing with no per-row Python),
and the LSH dedup family. Everything is mod p = 2^61-1 (Mersenne), which
reduces with shifts: 2^61 ≡ 1 and 2^64 ≡ 8 (mod p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MOD61 = (1 << 61) - 1
_P = np.uint64(MOD61)
_U32 = np.uint64(0xFFFFFFFF)


def mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact (a*b) mod 2^61-1 for uint64 arrays with values < 2^61.

    32-bit limb decomposition: a*b = a1*b1*2^64 + (a1*b0 + a0*b1)*2^32
    + a0*b0 with 2^64 ≡ 8 and 2^61 ≡ 1 (mod p); every intermediate fits
    uint64 (largest is a0*b0 < 2^64)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a0 = a & _U32
    a1 = a >> np.uint64(32)
    b0 = b & _U32
    b1 = b >> np.uint64(32)
    m = a1 * b1  # < 2^58
    t = a1 * b0 + a0 * b1  # < 2^62
    lo = a0 * b0  # < 2^64
    t_lo = t & np.uint64((1 << 29) - 1)
    t_hi = t >> np.uint64(29)
    acc = (
        m * np.uint64(8)
        + t_hi
        + (t_lo << np.uint64(32))
        + (lo >> np.uint64(61))
        + (lo & _P)
    )  # < 2^63
    acc = (acc >> np.uint64(61)) + (acc & _P)
    acc = (acc >> np.uint64(61)) + (acc & _P)
    return np.where(acc >= _P, acc - _P, acc)


def fold_mod61(x: np.ndarray) -> np.ndarray:
    """x mod 2^61-1 for arbitrary uint64 x."""
    x = (x >> np.uint64(61)) + (x & _P)
    x = (x >> np.uint64(61)) + (x & _P)
    return np.where(x >= _P, x - _P, x)


def segsum_mod61(prods: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment sum mod p of uint64 values < 2^61.

    Overflow-safe via a 32-bit limb split; segment sums come from
    cumulative-sum differences (NOT ``np.add.reduceat``, whose semantics
    for an empty segment — ``starts[i] == starts[i+1]`` — return the
    element at the boundary instead of 0, and which raises on a trailing
    empty segment). Each limb's running total stays below 2^64 for up to
    2^32 elements."""
    starts = np.asarray(starts, dtype=np.int64)
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    n = len(prods)
    ends = np.concatenate([starts[1:], [n]])
    if n == 0:
        return np.zeros(len(starts), dtype=np.uint64)
    hi = prods >> np.uint64(32)
    lo = prods & _U32
    chi = np.zeros(n + 1, dtype=np.uint64)
    clo = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(hi, out=chi[1:])
    np.cumsum(lo, out=clo[1:])
    hi_s = chi[ends] - chi[starts]
    lo_s = clo[ends] - clo[starts]
    shift = np.full(len(hi_s), np.uint64(1) << np.uint64(32), dtype=np.uint64)
    return fold_mod61(mulmod61(hi_s, shift) + fold_mod61(lo_s))


def string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(utf-8 data bytes, int64 offsets) of a pyarrow string array,
    zero-copy from the arrow buffers (slice-offset aware)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr.cast(pa.string()), "")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    return data, offsets


_HASH_BASE = 1_000_003
_POW_CACHE = [np.uint64(1)]


def _powers(n: int) -> np.ndarray:
    while len(_POW_CACHE) < n:
        _POW_CACHE.append(
            np.uint64((int(_POW_CACHE[-1]) * _HASH_BASE) % MOD61)
        )
    return np.asarray(_POW_CACHE[:n], dtype=np.uint64)


def hash_string_array(arr: pa.Array, salt: int = 0) -> np.ndarray:
    """Deterministic uint64 hash per row of a string column — polynomial
    over the utf-8 bytes mod 2^61-1, fully vectorized (no per-row Python).

    Stable across processes (no PYTHONHASHSEED involvement); ``salt`` mixes
    the column position so multi-column keys don't cancel."""
    data, offsets = string_bytes(arr)
    nrows = len(offsets) - 1
    if nrows == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = offsets[1:] - offsets[:-1]
    total = int(lens.sum())
    # NB: no all-empty shortcut — empty rows must hash identically whether
    # they arrive in an all-empty batch or mixed with non-empty rows
    # (segsum_mod61 returns 0 for empty segments, so the general path is
    # already correct and batch-composition-independent).
    parent_start = np.repeat(offsets[:-1], lens)
    within = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    byts = data[parent_start + within].astype(np.uint64) + np.uint64(1)  # avoid 0-byte nils
    # position weight: B^(len-1-within) per byte
    maxlen = int(lens.max())
    pw = _powers(maxlen)
    exp = np.repeat(lens - 1, lens) - within
    prods = mulmod61(byts, pw[exp])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    h = segsum_mod61(prods, starts)
    # length + salt mix so "a" vs "a\0"-style families stay distinct
    mix = fold_mod61(
        h + np.uint64((salt * 0x9E3779B9 + 17) % MOD61) + lens.astype(np.uint64)
    )
    return mulmod61(mix + np.uint64(0x2545F491), np.full(nrows, np.uint64(0x5DEECE66D)))


def hash_key_columns(batch: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic per-row bucket id from one or more key columns."""
    acc = np.zeros(len(batch), dtype=np.uint64)
    for pos, k in enumerate(keys):
        col = batch[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
            h = mulmod61(fold_mod61(v), np.full(len(v), np.uint64(0x9E3779B97F4A7C15 % MOD61)))
            h = fold_mod61(h + np.uint64(pos + 1))
        else:
            h = hash_string_array(col, salt=pos + 1)
        acc = mulmod61(acc + np.uint64(1), np.full(len(acc), np.uint64(0xC2B2AE3D % MOD61)))
        acc = fold_mod61(acc + h)
    return (acc % np.uint64(num_buckets)).astype(np.int64)
