"""CSV corpus source/sink — the other interchange format tabular corpora
ship in. Wraps ``Dataset.write_csv`` / ``ray.data.read_csv`` (Arrow CSV
writer/parser per file — quoting handles embedded commas/quotes/newlines)
with the repo's conventions: partitioned output directory = resumable
shards. The driver query ``csv_roundtrip`` proves byte fidelity end-to-end
exactly like ``jsonl_roundtrip`` (sources/jsonl.py): every text travels
engine → CSV writer → file → CSV parser → engine, and the per-lang XOR of
SQL-twinned md5-64 text hashes must equal what DuckDB computes from the
ORIGINAL parquet; any quoting/escaping corruption flips the XOR.
"""

from __future__ import annotations

import os
import shutil

import ray.data
from .readers import read_pq

from .jsonl import SQL_JSONL_ROUNDTRIP, lang_xor_summary


def export_csv(ds: "ray.data.Dataset", out_dir: str) -> str:
    """Write ``ds`` as a DIRECTORY of CSV part files (one per block — the
    resumable-shards convention; never one giant file)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    return out_dir


def read_csv(path: str) -> "ray.data.Dataset":
    """Streaming CSV reader (Arrow CSV parser per file, not a driver loop).
    Empty strings stay empty strings (strings_can_be_null=False, the Arrow
    default) so a round-tripped '' does not silently become NULL."""
    return ray.data.read_csv(path)


def csv_roundtrip(sf_dir: str):
    """Driver query: documents → CSV shard directory under /tmp → read back
    → per-lang (n_docs, chars_sum, text_xor). Same oracle as
    jsonl_roundtrip — the check is format-independent by design: fidelity
    means the summary is indistinguishable from the original parquet's."""
    scratch = os.path.join(
        "/tmp", "osm_search_ray_csv", os.path.basename(os.path.normpath(sf_dir))
    )
    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    export_csv(docs, scratch)
    return lang_xor_summary(read_csv(scratch))


SQL_CSV_ROUNDTRIP = SQL_JSONL_ROUNDTRIP
