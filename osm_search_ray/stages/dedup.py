"""Near-duplicate detection family (training-data operators; ray_guide.md
'Aggregation at scale' shapes). All stages are shuffle-disciplined:

  minhash_lsh_pairs   shingle → minhash signature per doc (map_batches) →
                      explode to (band_id, band_hash, doc_id) rows →
                      groupby(band) → candidate pairs → exact-Jaccard verify.
                      The only all-to-all is on band buckets (tiny rows).
  simhash_near_dups   64-bit simhash per doc → groupby on rotated prefix
                      buckets → Hamming-verify pairs.
  ngram_jaccard_pairs exact n-gram Jaccard over candidate pairs (verifier,
                      also usable standalone on small groups).
  embedding_near_dups cosine near-dup over an embedding column: LSH by
                      random-hyperplane sign bytes → per-bucket exact cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import (
    hash64_str,
    hamming64,
    minhash_signature,
    minhash_signature_batch,
    perm_coeffs,
    simhash64,
)
from ..functions.tokenize import tokenize


def char_shingles(text: str, k: int = 5) -> list[str]:
    s = " ".join(tokenize(text))
    if len(s) < k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> "ray.data.Dataset":
    """Candidate pairs with estimated Jaccard >= threshold, verified by the
    MinHash signature estimate. Output (doc_a, doc_b, jaccard_est) with
    doc_a < doc_b, deduplicated."""
    rows_per_band = num_perm // bands

    def sig_and_bands(batch: pa.Table) -> pa.Table:
        # batch-vectorized signatures (functions/hashing.py reduceat kernel)
        # over the NORMALIZED text (tokenize-join, as char_shingles does)
        ids = batch.column(id_col).to_numpy()
        norm = [" ".join(tokenize(t or "")) for t in batch.column(text_col).to_pylist()]
        sigs = minhash_signature_batch(norm, num_perm, shingle_k)  # (N, P)
        n = len(ids)
        with np.errstate(over="ignore"):
            banded = sigs.reshape(n, bands, rows_per_band) * np.uint64(2654435761)
        buckets = np.bitwise_xor.reduce(banded, axis=2) & np.uint64(0x7FFFFFFFFFFFFFFF)  # (N, B)
        out_id = np.repeat(ids.astype(np.int64), bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        out_hash = buckets.reshape(-1).astype(np.int64)
        sig_rows = np.repeat(sigs.astype(np.int64), bands, axis=0)
        return pa.table(
            {
                "band": pa.array(out_band),
                "bucket": pa.array(out_hash),
                id_col: pa.array(out_id),
                "sig": pa.array(sig_rows.tolist(), pa.list_(pa.int64())),
            }
        )

    banded = docs.map_batches(sig_and_bands, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_est": []})
        g = g.sort_values(g.columns[2], kind="mergesort")  # id col
        ids = g.iloc[:, 2].to_numpy(dtype=np.int64)
        sigs = np.asarray([np.asarray(s, dtype=np.int64) for s in g["sig"]], dtype=np.int64)
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(est)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard_est": out_j})

    pairs = banded.groupby(["band", "bucket"]).map_groups(pairs_in_bucket, batch_format="pandas")

    # a pair can match in several bands → dedup on (doc_a, doc_b)
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(dedup, batch_format="pandas")


def simhash_near_dups(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> "ray.data.Dataset":
    """SimHash near-dups: bucket by each of 4 rotated 16-bit prefixes (any
    pair within Hamming distance 3 shares at least one of 4 disjoint 16-bit
    blocks), verify Hamming inside buckets. Output (doc_a, doc_b, hamming)."""

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_id, out_sig, out_block, out_key = [], [], [], []
        for i, text in enumerate(batch.column(text_col).to_pylist()):
            toks = tokenize(text or "")
            s = simhash64(hash64_str(toks)) if toks else np.uint64(0)
            for blk in range(4):
                key = int((int(s) >> (blk * 16)) & 0xFFFF)
                out_id.append(int(ids[i]))
                out_sig.append(np.int64(np.uint64(s).astype(np.int64)))
                out_block.append(blk)
                out_key.append(key)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "sig": pa.array(out_sig, pa.int64()),
                "block": pa.array(out_block, pa.int32()),
                "key": pa.array(out_key, pa.int32()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = g.sort_values(g.columns[0], kind="mergesort").drop_duplicates(g.columns[0])
        ids = g.iloc[:, 0].to_numpy(dtype=np.int64)
        sigs = g["sig"].to_numpy(dtype=np.int64).astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            d = hamming64(np.full(len(ids) - i - 1, sigs[i]), sigs[i + 1 :])
            for j, h in zip(range(i + 1, len(ids)), d):
                if h <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(int(h))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    cand = docs.map_batches(sig, batch_format="pyarrow").groupby(["block", "key"]).map_groups(
        pairs, batch_format="pandas"
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    candidate_pairs: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> pd.DataFrame:
    """Exact token-n-gram Jaccard verifier for a (small) candidate pair set:
    the texts of referenced docs are semi-joined out of the dataset
    (broadcast id set), then pairs verified driver-side."""
    wanted = set(candidate_pairs["doc_a"]) | set(candidate_pairs["doc_b"])
    wanted_ref = ray.put(wanted)

    def grab(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        mask = np.asarray([int(d) in w for d in batch.column(id_col).to_numpy()])
        return batch.filter(pa.array(mask)).select([id_col, text_col])

    texts = {r[id_col]: r[text_col] for r in docs.map_batches(grab, batch_format="pyarrow").take_all()}

    def grams(t: str) -> set:
        toks = tokenize(t or "")
        return {tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}

    out = candidate_pairs.copy()
    out["jaccard"] = [
        jaccard(grams(texts.get(a, "")), grams(texts.get(b, ""))) for a, b in zip(out["doc_a"], out["doc_b"])
    ]
    return out


def embedding_near_dups(
    emb: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 11,
) -> "ray.data.Dataset":
    """Cosine near-dup via random-hyperplane LSH: ``planes`` sign bits form
    the bucket key; exact cosine verified per bucket. Deterministic planes
    from a seeded generator. Output (doc_a, doc_b, cosine)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()), "vec": pa.array([], pa.list_(pa.float64()))})
        rng = np.random.default_rng(seed)
        pl = rng.standard_normal((planes, mat.shape[1]))
        signs = (mat @ pl.T) > 0
        bucket = (signs.astype(np.int64) * (1 << np.arange(planes, dtype=np.int64))).sum(axis=1)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(bucket),
                "vec": pa.array(mn.tolist(), pa.list_(pa.float64())),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        g = g.sort_values(g.columns[0], kind="mergesort")
        ids = g.iloc[:, 0].to_numpy(dtype=np.int64)
        m = np.asarray([np.asarray(v) for v in g["vec"]])
        sims = m @ m.T
        out_a, out_b, out_c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_c.append(float(sims[i, j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "cosine": out_c})

    return emb.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    )
