"""Sketch operators: HyperLogLog distinct counting as a combiner-style
aggregation.

The HLL shape is the canonical pre-aggregation pattern at 100 TB: each
batch folds its values into a FIXED-SIZE register array (2^p bytes) inside
``map_batches``; merging registers is an elementwise max, so the driver (or
a tiny reduce) combines one small array per block instead of shuffling
values. Estimation error ≈ 1.04 / sqrt(2^p).

Deterministic by construction: splitmix64 value hashing, no RNG.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — a well-mixed 64-bit hash for integer keys."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold integer values into 2^p HLL registers (uint8)."""
    if not 11 <= p <= 18:
        # the frexp rank trick below is exact only while ranks fit the
        # 53-bit float view (needs p >= 11); p > 18 wastes memory
        raise ValueError(f"p must be in [11, 18], got {p}")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, vectorized via float64 exponent
    # trick is unsafe at 64 bits; use a log2-free loop over BITS (64 fixed
    # iterations of O(n) vector ops would be slow) → use np.frexp on the
    # top 53 bits which is exact for rank <= 53 (p >= 11 caps rank at 53)
    top = (rest >> np.uint64(11)).astype(np.float64)  # 53-bit mantissa safe
    exp = np.frexp(top)[1]  # top bit position within 53 bits
    rank = (54 - exp).astype(np.uint8)  # leading zeros in 53-bit view + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, column: str, p: int = 12
) -> float:
    """Distributed approximate distinct count: per-batch registers (fixed
    2^p bytes each) merged by elementwise max — values never shuffle."""
    m = 1 << p

    def fold(t: pa.Table) -> pa.Table:
        vals = t.column(column).to_numpy()
        regs = hll_registers(vals, p)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    merged = np.zeros(m, dtype=np.uint8)
    for b in ds.map_batches(fold, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in b.column("regs").to_pylist():
            merged = hll_merge(merged, np.asarray(row, dtype=np.uint8))
    return hll_estimate(merged)
