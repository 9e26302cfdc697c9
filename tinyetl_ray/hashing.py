"""Deterministic, vectorized hashing for partitioning and dedup.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) so it can
NEVER be used for cross-task partitioning. We use a vectorized FNV-1a-style
64-bit hash implemented with numpy over Arrow string offsets — deterministic
across processes, machines and Python versions, and fast (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 constant


def hash_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hash per element of an Arrow string array (nulls hash to 0).

    Vectorized: processes byte position k of every string simultaneously,
    iterating only ``max_len`` times — for short keys like ``conv_id`` this is
    a handful of numpy passes, not a Python loop over rows.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.LargeStringArray):
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buffers = arr.buffers()
    # buffers: [validity, offsets(int32), data]
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1 + arr.offset)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)

    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for k in range(max_len):
            active = lengths > k
            if not active.any():
                break
            idx = starts[active] + k
            b = data[idx].astype(np.uint64)
            ha = h[active]
            ha = (ha ^ b) * _FNV_PRIME
            h[active] = ha
        # finalize: mix in length, avalanche
        h ^= lengths.astype(np.uint64)
        h *= _MIX
        h ^= h >> np.uint64(33)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        h[~valid] = np.uint64(0)
    return h


def hash_combine(h: np.ndarray, ints: np.ndarray) -> np.ndarray:
    """Mix an int64/uint64 array into an existing uint64 hash (boost-style)."""
    with np.errstate(over="ignore"):
        x = ints.astype(np.uint64)
        x *= _MIX
        x ^= x >> np.uint64(29)
        return h ^ (x + np.uint64(0x9E3779B97F4A7C15) + (h << np.uint64(6)) + (h >> np.uint64(2)))


def shuffle_blocks(floor: int = 8, divisor: int = 2) -> int:
    """Cluster-sized block/partition count for slim shuffle intermediates
    (coalesce to ~cores/divisor with a floor — task count, not bytes, is
    the cost driver for small blocks)."""
    try:
        import ray

        cores = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cores = 16
    return max(floor, cores // divisor)


def mod_partition(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """int32 routing column: key % P over an int-like key array (the shared
    'route by key, process partitions vectorized' pattern)."""
    return (
        np.asarray(keys, dtype=np.int64).astype(np.uint64) % np.uint64(num_partitions)
    ).astype(np.int32)
