"""Training-data preparation operators (beyond-reference charter ops):

  train_val_split   deterministic hash-bucketed train/val/test assignment —
                    the split a data pipeline must reproduce bit-for-bit on
                    every rerun and at any parallelism. Pure per-batch map
                    (no shuffle); the bucketing arithmetic is shared
                    exactly with the SQL oracle.

  pack_sequences    greedy sequence packing for LM training: documents in
                    doc_id order are laid head-to-tail into fixed-size
                    token windows; each doc gets (window_id, start offset).
                    Needs a GLOBAL prefix sum of token counts — computed
                    the Ray-native way: per-block partial sums → O(blocks)
                    driver offsets → one map pass adding block offset +
                    in-block cumsum. No all-to-all; the only ordered pass
                    is the doc_id sort (range shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import SQL_TOKENIZE, tokenize_array

SPLIT_MOD = 2_147_483_648  # 2^31 — keeps doc_id * MIX inside int64/BIGINT
SPLIT_MIX = 2_654_435_761
TRAIN_PERMILLE = 800
VAL_PERMILLE = 900


def train_val_split(sf_dir: str):
    """(doc_id, bucket, split) — 80/10/10 by a deterministic integer mix of
    doc_id. Stable under reruns, re-partitioning, and cluster size (the
    property a training pipeline needs so val docs never leak into train
    between runs)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        # reduce mod 2^31 BEFORE the mix so the product stays inside int64
        # for ANY doc_id (numpy would wrap silently, DuckDB would error —
        # either way the two engines diverge without this)
        bucket = (ids % SPLIT_MOD) * SPLIT_MIX % SPLIT_MOD % 1000
        split = np.where(bucket < TRAIN_PERMILLE, "train", np.where(bucket < VAL_PERMILLE, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "bucket": pa.array(bucket.astype(np.int64)),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_SQL_BUCKET = f"(doc_id % {SPLIT_MOD}) * {SPLIT_MIX} % {SPLIT_MOD} % 1000"

SQL_TRAIN_VAL_SPLIT = f"""
SELECT doc_id,
       {_SQL_BUCKET} AS bucket,
       CASE WHEN {_SQL_BUCKET} < {TRAIN_PERMILLE} THEN 'train'
            WHEN {_SQL_BUCKET} < {VAL_PERMILLE} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def pack_sequences(sf_dir: str, ctx: int = 256):
    """(doc_id, n_tokens, start_off, window_id, start_in_window) — docs in
    doc_id order packed head-to-tail into ``ctx``-token windows.

    start_off is the GLOBAL token prefix sum before this doc: per-block
    token totals are read once (O(blocks) driver work, zero data movement
    — the zip_with_index pattern, stages/joins.py), then one distributed
    pass adds block offset + in-block exclusive cumsum. All integer
    arithmetic, bit-identical to the SQL window-function oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        _, counts = tokenize_array(batch.column("text").to_pylist())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pa.array(counts.astype(np.int64))}
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow").sort("doc_id").materialize()
    refs = counted.to_arrow_refs()

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        return int(t.column("n_tokens").to_numpy().sum()) if t.num_rows else 0

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def add_offsets(t: pa.Table, off: int) -> pa.Table:
        n = t.column("n_tokens").to_numpy().astype(np.int64)
        start = off + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n),
                "start_off": pa.array(start),
                "window_id": pa.array(start // ctx),
                "start_in_window": pa.array(start % ctx),
            }
        )

    out_refs = [add_offsets.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


_SQL_NTOK = f"CAST(len({SQL_TOKENIZE.format(col='text')}) AS BIGINT)"

SQL_PACK_SEQUENCES = f"""
WITH counted AS (
    SELECT doc_id, {_SQL_NTOK} AS n_tokens FROM documents
), packed AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
    FROM counted
)
SELECT doc_id, n_tokens, start_off,
       start_off // 256 AS window_id,
       start_off % 256 AS start_in_window
FROM packed
"""
