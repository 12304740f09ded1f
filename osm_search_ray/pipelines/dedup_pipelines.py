"""Deduplication pipelines over ``documents`` (training-data operators +
the reference's D1 near-dup suppression analogue).

Exact dedup here; MinHash-LSH / SimHash / n-gram-Jaccard / embedding-cosine
near-dup live in stages/dedup.py (driver check is rows-only for those — the
LSH bucketing is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_str


def dedup_exact(sf_dir: str):
    """Exact content dedup: keep the lowest doc_id per distinct text, report
    group size. Hash-partitioned: a stable 64-bit content hash is the
    groupby key (the full text never needs to be compared cross-node unless
    hashes collide; group members verify text equality inside the group).

    Output: (doc_id, n_dups) for each kept representative."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64_str(batch.column("text").to_pylist())
        return batch.append_column("content_hash", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # hash-partition on content_hash into BOUNDED Ray groups (~one group per
    # distinct doc would pay map_groups' per-group ms overhead corpus-wide —
    # VERDICT r01 item 7); the real per-text grouping is one vectorized
    # pandas groupby per partition (collision-safe: keyed by exact text)
    def keep_first_partition(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("text", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index(drop=True)
        )

    from ..stages.joins import hash_partitioned_apply

    return hash_partitioned_apply(hashed, "content_hash", keep_first_partition, num_parts=64)


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text
"""


def dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs over documents (rows-only driver
    check; the MinHash estimator itself is unit-tested against exact Jaccard
    in tests/test_functions.py)."""
    import ray.data

    from ..stages.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5)


def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (rows-only driver check)."""
    import ray.data

    from ..stages.dedup import simhash_near_dups

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3)


def dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs via hyperplane LSH (rows-only check)."""
    import ray.data

    from ..stages.dedup import embedding_near_dups

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.35)


def dedup_fingerprint(sf_dir: str):
    """Rolling-hash fingerprint per doc + exact dedup on the fingerprint:
    output (fingerprint, n_docs, min_doc_id) (rows-only check — the hash is
    engine-specific)."""
    import pandas as pd
    import ray.data

    from ..stages.textstats import fingerprint_stage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fp = fingerprint_stage(ds)

    # bounded partitions + one vectorized groupby per partition (same
    # rationale as dedup_exact: ~one Ray group per distinct fingerprint
    # would pay per-group overhead corpus-wide)
    def agg_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("fingerprint", sort=False)
            .agg(n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min"))
            .reset_index()
        )
        return g[["fingerprint", "n_docs", "min_doc_id"]]

    from ..stages.joins import hash_partitioned_apply

    return hash_partitioned_apply(fp, "fingerprint", agg_partition, num_parts=64)
