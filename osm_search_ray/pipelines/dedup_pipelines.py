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
