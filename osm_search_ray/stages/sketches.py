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


import functools
import math


@functools.cache
def _hll_float_consts(m: int) -> tuple[float, tuple]:
    """(alpha·m², m·ln(m/z) table) as float64 CONSTANTS shared bit-for-bit
    with the SQL oracle (pipelines/events.sql_approx_distinct_users embeds
    them as e-notation literals, which round-trip exactly)."""
    alpha_m2 = (0.7213 / (1.0 + 1.079 / float(m))) * float(m) * float(m)
    ln_tab = tuple(float(m) * float(np.log(float(m) / z)) for z in range(1, m + 1))
    return alpha_m2, ln_tab


def hll_estimate_int(reg: np.ndarray) -> int:
    """The standard HLL estimate evaluated EXACTLY reproducibly: the
    register sum Σ2^-reg is carried as the integer Σ2^(53-reg) (every term
    exact; fits int128 — DuckDB sums it as HUGEINT), the float constants
    come from `_hll_float_consts`, and both branches end in the same
    floor(x+0.5). Every remaining float op (one cast, one multiply, one
    divide, one compare) is a single IEEE-754 operation evaluated
    identically by numpy and DuckDB, so the driver query hash-matches its
    SQL twin bit-for-bit. `hll_estimate` (float, np.sum-ordered) remains
    for the generic approx_distinct helper."""
    m = len(reg)
    alpha_m2, ln_tab = _hll_float_consts(m)
    counts = np.bincount(reg, minlength=54)
    s_scaled = sum(int(c) << (53 - r) for r, c in enumerate(counts) if c)
    est0 = alpha_m2 * 9007199254740992.0 / float(s_scaled)
    zeros = int(counts[0])
    if est0 <= 2.5 * m and zeros:
        return int(math.floor(ln_tab[zeros - 1] + 0.5))
    return int(math.floor(est0 + 0.5))


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


# --------------------------------------------------------------------------
# t-digest (Dunning & Ertl, "Computing extremely accurate quantiles using
# t-digests") — the merging variant with the k1 scale function, fully
# vectorized: items are clustered by bucketing their mid-quantiles through
# k(q) = (delta / 2π) · asin(2q − 1), so tail buckets are narrow (rank error
# shrinks toward q→0/1) and the digest size is bounded by ~delta centroids.
# Mergeable: a digest of digests re-buckets the centroid means by the same
# rule. Unlike the exact bounded-domain histograms (pipelines/events.py),
# this stays CONSTANT-size on unbounded/continuous domains.
# --------------------------------------------------------------------------


def tdigest_from_values(values: np.ndarray, weights: np.ndarray | None = None, delta: int = 200):
    """Compress (values, weights) into t-digest centroids (means, weights).

    Vectorized k1 clustering: sort, take each item's mid-quantile
    q_mid = (cum − w/2) / total, bucket by floor(k1(q_mid)), weighted-mean
    per bucket. Deterministic for a given input multiset."""
    v = np.asarray(values, np.float64)
    w = np.ones(len(v)) if weights is None else np.asarray(weights, np.float64)
    keep = w > 0
    v, w = v[keep], w[keep]
    if len(v) == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    total = w.sum()
    qmid = (np.cumsum(w) - 0.5 * w) / total
    k = np.floor(delta / (2 * np.pi) * np.arcsin(np.clip(2.0 * qmid - 1.0, -1.0, 1.0)) + delta / 4.0)
    # group consecutive equal bucket ids (k is non-decreasing)
    new = np.concatenate([[True], k[1:] != k[:-1]])
    gid = np.cumsum(new) - 1
    n = int(gid[-1]) + 1
    wsum = np.bincount(gid, weights=w, minlength=n)
    means = np.bincount(gid, weights=v * w, minlength=n) / wsum
    return means, wsum


def tdigest_merge(parts: list[tuple[np.ndarray, np.ndarray]], delta: int = 200):
    """Merge digests by re-clustering the union of centroids (means carry
    their weights). Result size stays ≤ ~delta regardless of fan-in."""
    if not parts:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    m = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    return tdigest_from_values(m, w, delta)


def tdigest_quantiles(means: np.ndarray, weights: np.ndarray, qs) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    mid-ranks (the standard t-digest read-out)."""
    qs = np.atleast_1d(np.asarray(qs, np.float64))
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    if len(means) == 1:
        return np.full(len(qs), means[0])
    total = weights.sum()
    mid = np.cumsum(weights) - 0.5 * weights
    return np.interp(qs * total, mid, means, left=means[0], right=means[-1])


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters — the MERGEABLE-summaries form (Agarwal et al.,
# "Mergeable summaries", PODS'12): a partial summary is an exact (or
# already-reduced) count vector; summaries merge by summing counts and
# reducing back to width w (subtract the (w+1)-th largest count, drop ≤0).
# Guarantee after any merge tree: every item keeps
#   true_count ≥ est ≥ true_count − N/(w+1),
# so every item with true_count > N/(w+1) SURVIVES — the candidate set for
# an exact second pass.
# --------------------------------------------------------------------------


def mg_reduce(items: np.ndarray, counts: np.ndarray, width: int):
    """Reduce a count summary to ≤ width entries (Misra-Gries decrement)."""
    counts = np.asarray(counts, np.int64)
    if len(items) <= width:
        return items, counts
    kth = np.partition(counts, len(counts) - width - 1)[len(counts) - width - 1]
    c = counts - kth
    keep = c > 0
    return items[keep], c[keep]


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]], width: int):
    """Merge partial summaries: concat → sum per item → reduce to width."""
    if not parts:
        return np.empty(0, object), np.empty(0, np.int64)
    it = np.concatenate([p[0] for p in parts])
    ct = np.concatenate([p[1] for p in parts])
    s = pd.Series(ct).groupby(pd.Series(it), sort=False).sum()
    return mg_reduce(s.index.to_numpy(dtype=object), s.to_numpy(np.int64), width)


# ----------------------------------------------------------- Bloom filter
# The at-scale membership sketch: where contamination_check broadcasts the
# SORTED eval-shingle array (exact, ~40 bytes/key for shingle strings), a
# Bloom filter carries BLOOM_BITS_PER_KEY bits/key at a provable FPR —
# ~20× less broadcast traffic per worker for eval sets that reach 10⁸ keys.
# Double hashing (Kirsch-Mitzenmacher): position_i = h1 + i*h2 mod m, h2
# forced odd; uint64 wraparound is deterministic on both build and probe.

BLOOM_BITS_PER_KEY = 24
BLOOM_K = 17  # round(ln 2 * bits_per_key) → FPR ≈ 1.3e-5


def bloom_build(hashes: np.ndarray, m_bits: int, k: int = BLOOM_K) -> np.ndarray:
    """Bit array (packed uint64 words) with all ``hashes`` (uint64) set."""
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    if len(hashes) == 0:
        return words
    h1 = hashes.astype(np.uint64)
    h2 = splitmix64(h1 ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_contains(words: np.ndarray, hashes: np.ndarray, m_bits: int, k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe — one gather per hash function."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    h1 = hashes.astype(np.uint64)
    h2 = splitmix64(h1 ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    m = np.uint64(m_bits)
    out = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out


# ------------------------------------------------------- Count-Min sketch
# Mergeable frequency sketch (Cormode & Muthukrishnan 2005): CMS_D rows of
# CMS_W counters; item positions via the same Kirsch-Mitzenmacher double
# hashing as the Bloom filter above (h1 = md5-hash64, h2 = splitmix64
# forced odd — both SQL-twinned), so register contents — and therefore the
# over-estimates themselves, collisions included — are exactly
# reproducible in DuckDB.  est(x) = min_i r[i][pos_i(x)] >= true count.

CMS_D = 4
CMS_W = 512
CMS_SEED = 0xA076_1D64_78BD_642F  # shared with the Bloom K-M chain


def cms_positions(hashes: np.ndarray, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, n) register columns for each uint64 item hash — the wraparound
    (h1 + i*h2) mod 2^64 happens BEFORE mod w, mirrored in SQL."""
    h1 = hashes.astype(np.uint64)
    h2 = splitmix64(h1 ^ np.uint64(CMS_SEED)) | np.uint64(1)
    out = np.empty((d, len(h1)), np.int64)
    with np.errstate(over="ignore"):
        for i in range(d):
            out[i] = ((h1 + np.uint64(i) * h2) % np.uint64(w)).astype(np.int64)
    return out


def cms_partial(hashes: np.ndarray, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, w) int64 partial registers for a batch of item hashes
    (multiplicity counted) — mergeable by elementwise sum."""
    regs = np.zeros((d, w), np.int64)
    if len(hashes) == 0:
        return regs
    pos = cms_positions(hashes, d, w)
    for i in range(d):
        np.add.at(regs[i], pos[i], 1)
    return regs


def cms_estimate(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """min over rows of the item's register — the CMS point query."""
    if len(hashes) == 0:
        return np.zeros(0, np.int64)
    d, w = regs.shape
    pos = cms_positions(hashes, d, w)
    est = regs[0][pos[0]]
    for i in range(1, d):
        est = np.minimum(est, regs[i][pos[i]])
    return est.astype(np.int64)
