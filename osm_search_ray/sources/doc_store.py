"""Range-partitioned document store (S4/S5 — the engine replacement for the
reference's bbolt key-value store, /root/reference/pkg/kvdb/kv_db.go).

Documents are written as Parquet partitioned by ``doc_id // range_size``
through the checkpointed sink (atomic, resumable, manifested); point and
batch lookups read ONLY the partitions covering the requested ids — an O(1)
file-prune instead of a scan, the batch analogue of bbolt's B-tree seek.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .checkpoint import checkpointed_write, completed_keys

DEFAULT_RANGE = 100_000


def write_doc_store(docs, out_dir: str, range_size: int = DEFAULT_RANGE) -> None:
    """docs dataset (must contain int64 ``doc_id``) → range-partitioned store."""

    def add_range(batch: pa.Table) -> pa.Table:
        r = (batch.column("doc_id").to_numpy() // range_size).astype(np.int64)
        return batch.append_column("__range", pa.array(r))

    checkpointed_write(
        docs.map_batches(add_range, batch_format="pyarrow"), out_dir, "__range", stage="doc_store"
    )
    with open(os.path.join(out_dir, "_range_size"), "w") as f:
        f.write(str(range_size))


def get_docs(out_dir: str, doc_ids, columns: list[str] | None = None) -> pd.DataFrame:
    """Batch point lookup: reads only the partitions covering ``doc_ids``
    with a row filter pushed into the Parquet read."""
    with open(os.path.join(out_dir, "_range_size")) as f:
        range_size = int(f.read())
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    ranges = np.unique(ids // range_size)
    done = completed_keys(out_dir)
    frames = []
    wanted = pa.array(ids)
    for r in ranges:
        if int(r) not in done:
            continue
        path = os.path.join(out_dir, f"part={int(r)}", "data.parquet")
        t = pq.read_table(path, columns=columns, filters=[("doc_id", "in", ids.tolist())])
        if len(t):
            frames.append(t.to_pandas())
    if not frames:
        return pd.DataFrame()
    out = pd.concat(frames, ignore_index=True)
    return out.drop(columns=[c for c in ("__range",) if c in out.columns])
