"""Text-analysis pipelines over ``documents`` (tokenizer M8; stats A3/A4/A8;
plus the training-data text operators: token counting, quality scoring,
language-ID, fingerprinting).

Tokenization here IS the engine tokenizer (functions/tokenize.py) — the same
function used by the inverted-index and query paths, with a fixed SQL
equivalent for the oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.tokenize import SQL_TOKENIZE, tokenize_array


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) via the canonical tokenizer — A3-style field-length
    stats, vectorized per batch, no shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        _, counts = tokenize_array(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": pa.array(counts)})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_TOKEN_COUNTS = f"""
SELECT doc_id, CAST(len({SQL_TOKENIZE.format(col='text')}) AS BIGINT) AS n_tokens
FROM documents
"""


def term_doc_freq(sf_dir: str):
    """(term, df) document frequency — the A8 ``count_distinct(doc)`` per
    term, built the scalable way: per-batch DISTINCT (term, doc) partials →
    per-batch per-term counts → groupby(term).sum(). A document's terms are
    always within one batch row, so batch-level dedup is exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks, counts = tokenize_array(batch.column("text").to_pylist())
        doc_rep = np.repeat(batch.column("doc_id").to_numpy(), counts)
        df = pd.DataFrame({"term": toks, "doc_id": doc_rep})
        per = df.drop_duplicates().groupby("term", sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(per, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(Sum("df", alias_name="df"))


SQL_TERM_DOC_FREQ = f"""
SELECT term, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({SQL_TOKENIZE.format(col='text')}) AS term FROM documents)
GROUP BY 1
"""


def text_quality(sf_dir: str):
    """Quality-scoring features per document (training-data op): char count,
    token count, mean token length, distinct-token ratio (all exactly
    SQL-expressible; stopword/punct ratios live in stages/textstats.py with
    pytest oracles)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks, counts = tokenize_array(texts)
        off = np.concatenate([[0], np.cumsum(counts)])
        n = len(texts)
        mean_len = np.zeros(n, dtype=np.float64)
        uniq_ratio = np.zeros(n, dtype=np.float64)
        for i in range(n):
            t = toks[off[i] : off[i + 1]]
            if len(t):
                mean_len[i] = float(np.mean([len(x) for x in t]))
                uniq_ratio[i] = len(set(t)) / len(t)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(np.asarray([len(s) for s in texts], dtype=np.int64)),
                "n_tokens": pa.array(counts),
                "mean_token_len": pa.array(np.rint(mean_len * 1e9).astype(np.int64)),
                "uniq_ratio": pa.array(np.rint(uniq_ratio * 1e9).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_TOKS = SQL_TOKENIZE.format(col="text")
SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(ROUND((CASE WHEN len({_TOKS}) > 0
            THEN list_avg(list_transform({_TOKS}, x -> CAST(length(x) AS DOUBLE)))
            ELSE 0.0 END) * 1000000000) AS BIGINT) AS mean_token_len,
       CAST(ROUND((CASE WHEN len({_TOKS}) > 0
            THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})
            ELSE 0.0 END) * 1000000000) AS BIGINT) AS uniq_ratio
FROM documents
"""
