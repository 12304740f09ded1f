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

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by exact text (collision-safe)
        out = (
            g.groupby("text", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index(drop=True)
        )
        return out

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


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

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"fingerprint": [g["fingerprint"].iloc[0]], "n_docs": [len(g)], "min_doc_id": [g["doc_id"].min()]}
        )

    return fp.groupby("fingerprint").map_groups(agg, batch_format="pandas")
