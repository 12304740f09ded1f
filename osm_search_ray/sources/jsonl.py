"""JSONL corpus source/sink — the interchange format web-text corpora ship
in (one JSON object per line, many files per shard).

The reference engine only reads its own binary stores and OSM files; a
Ray-Data engine serving training-data pipelines must ALSO ingest/emit JSONL,
so this module wraps ``Dataset.write_json`` / ``ray.data.read_json`` with
the repo's conventions (partitioned output directory = resumable shards,
deterministic scratch layout) and the driver query ``jsonl_roundtrip``
proves byte fidelity end-to-end: every text travels engine → JSON encoder →
file → JSON parser → engine, and the per-lang XOR of SQL-twinned md5-64
text hashes must equal what DuckDB computes from the ORIGINAL parquet.
Any escaping/encoding corruption flips the XOR.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from .readers import read_pq

from ..functions.hashing import hash64_md5


def export_jsonl(ds: "ray.data.Dataset", out_dir: str) -> str:
    """Write ``ds`` as a DIRECTORY of JSONL part files (one per block —
    the resumable-shards convention; never one giant file)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str) -> "ray.data.Dataset":
    """Streaming JSONL reader (Arrow JSON parser per file, not a driver
    loop)."""
    return ray.data.read_json(path)


def lang_xor_summary(back: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-lang (n_docs, chars_sum, text_xor) over a documents-shaped
    dataset, where text_xor is the XOR of hash64_md5(text) over the lang
    group (order-independent, no overflow, SQL twin = bit_xor over the same
    md5 prefix) — the byte-fidelity check both interchange-format
    roundtrips (JSONL, CSV) reduce to."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pandas(),
                "n_chars": batch.column("n_chars").to_numpy(),
                "h": hash64_md5(batch.column("text").to_pylist()).view(np.int64),
            }
        )
        g = df.groupby("lang", sort=False).agg(
            n_docs=("h", "size"),
            chars_sum=("n_chars", "sum"),
            text_xor=("h", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        ).reset_index()
        return pa.Table.from_pandas(
            g.astype({"n_docs": np.int64, "chars_sum": np.int64, "text_xor": np.int64}),
            preserve_index=False,
        )

    from ..stages.joins import hash_partitioned_apply

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False).agg(
            n_docs=("n_docs", "sum"),
            chars_sum=("chars_sum", "sum"),
            text_xor=("text_xor", lambda s: np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        ).reset_index()
        return g.astype({"n_docs": np.int64, "chars_sum": np.int64, "text_xor": np.int64})

    return hash_partitioned_apply(
        back.map_batches(partial, batch_format="pyarrow"), "lang", fuse, num_parts=8
    )


def jsonl_roundtrip(sf_dir: str):
    """Driver query: documents → JSONL shard directory under /tmp → read
    back → lang_xor_summary. Any escaping/encoding corruption in the
    writer/parser pair flips the XOR vs the original-parquet SQL twin.
    Output (lang, n_docs, chars_sum, text_xor)."""
    scratch = os.path.join(
        "/tmp", "osm_search_ray_jsonl", os.path.basename(os.path.normpath(sf_dir))
    )
    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    export_jsonl(docs, scratch)
    return lang_xor_summary(read_jsonl(scratch))


SQL_JSONL_ROUNDTRIP = """
WITH h AS (
    SELECT lang, n_chars,
           CAST('0x' || substr(md5(text), 1, 16) AS UBIGINT) AS uh
    FROM documents),
x AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
             CAST(bit_xor(uh) AS HUGEINT) AS ux
      FROM h GROUP BY 1)
SELECT lang, n_docs, chars_sum,
       CAST(CASE WHEN ux >= 9223372036854775808::HUGEINT
                 THEN ux - 18446744073709551616::HUGEINT ELSE ux END AS BIGINT)
           AS text_xor
FROM x
"""
