"""Mergeable sketches as per-batch partial aggregates (ray_guide.md
'Aggregation at scale': emit one serialized sketch per batch, merge in a
tiny second stage — the scalable shape for approximate aggregates the
reference never needed at its single-node scale).

HyperLogLog (Flajolet et al. 2007) with 2^p registers, the standard bias
correction and small-range linear counting. Deterministic (stable hashes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_str, splitmix64


def hll_create(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> None:
    """Vectorized register update for a batch of 64-bit hashes."""
    p = int(np.log2(len(reg)))
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of rest + 1 (capped at 64 - p + 1)
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    v = rest.copy()
    found = v == 0
    cnt = np.zeros(len(h), dtype=np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (~found) & (v >> np.uint64(64 - shift) == 0)
        cnt[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    lz = np.where(found, 64 - p, np.minimum(cnt, 64 - p))
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = float(len(reg))
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(int(m), 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Distributed HLL: one sketch per batch (map_batches partial), merged
    driver-side (sketch size is 2^p bytes — constant, tiny)."""

    def partial(batch: pa.Table) -> pa.Table:
        reg = hll_create(p)
        vals = batch.column(col)
        if pa.types.is_integer(vals.type):
            h = splitmix64(vals.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hash64_str([str(v) for v in vals.to_pylist()])
        hll_add_hashes(reg, h)
        return pa.table({"sketch": pa.array([reg.tobytes()], pa.binary())})

    merged = hll_create(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_size=None, batch_format="pyarrow"):
        for s in b.column("sketch").to_pylist():
            merged = hll_merge(merged, np.frombuffer(s, dtype=np.uint8))
    return hll_estimate(merged)
