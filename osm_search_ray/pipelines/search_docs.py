"""BM25+ full-text search over the ``documents`` corpus with a complete SQL
oracle — the scoring formula (including the reference's ``(k1+1)+tf``
numerator quirk, /root/reference/pkg/searcher/searcher.go:339-340) is written
once in the vectorized scorer and once in SQL.

Fixed query set (deterministic; terms from the synthetic corpus vocab).
Ranks are ordered by the ROUNDED score (micro-units) then doc_id, so the
two engines' last-ulp float differences cannot flip a rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import SQL_TOKENIZE, tokenize, tokenize_array

QUERIES: list[tuple[int, str]] = [
    (0, "spark join"),
    (1, "window merge sort"),
    (2, "customer data"),
    (3, "fast slow"),
    (4, "batch stream vector"),
]
K1 = 1.2
B = 0.98
DELTA = 1.0
TOP_K = 10


def bm25_docs_search(sf_dir: str):
    """Output (query_id, doc_id, rank, score_micro).

    Index stats (tf, df, dl, avg dl) built with partial-aggregation shuffles;
    scoring streams the postings rows past the broadcast query set."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks, lens = tokenize_array(batch.column("text").to_pylist())
        doc_rep = np.repeat(batch.column("doc_id").to_numpy(), lens)
        df = pd.DataFrame({"term": toks, "doc_id": doc_rep})
        g = df.groupby(["term", "doc_id"], sort=False).size().reset_index(name="tf")
        # carry per-doc length partials alongside
        return pa.Table.from_pandas(g, preserve_index=False)

    tf = ds.map_batches(explode, batch_format="pyarrow").groupby(["term", "doc_id"]).aggregate(
        Sum("tf", alias_name="tf")
    )
    tf_pd = tf.to_pandas()

    def lens_fn(batch: pa.Table) -> pa.Table:
        _, lens = tokenize_array(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"), "dl": pa.array(lens)})

    dl_pd = ds.map_batches(lens_fn, batch_format="pyarrow").to_pandas()
    n_docs = len(dl_pd)
    avg_dl = float(dl_pd["dl"].to_numpy().sum()) / n_docs  # sum/n (matches SQL SUM/COUNT)

    df_pd = tf_pd.groupby("term").size().reset_index(name="df")
    p = tf_pd.merge(df_pd, on="term").merge(dl_pd, on="doc_id")

    out = []
    for qid, qtext in QUERIES:
        terms = list(dict.fromkeys(tokenize(qtext)))
        rows = p[p["term"].isin(terms)]
        if len(rows) == 0:
            continue
        idf = np.log10(n_docs + 1.0) - np.log10(rows["df"].to_numpy(dtype=np.float64))
        tfv = rows["tf"].to_numpy(dtype=np.float64)
        dlv = rows["dl"].to_numpy(dtype=np.float64)
        contrib = idf * (DELTA + ((K1 + 1.0) + tfv) / (K1 * (1.0 - B + B * dlv / avg_dl) + tfv))
        sc = pd.DataFrame({"doc_id": rows["doc_id"].to_numpy(), "c": contrib}).groupby("doc_id")["c"].sum()
        score_micro = np.rint(sc.to_numpy() * 1e6).astype(np.int64)
        r = pd.DataFrame({"doc_id": sc.index.to_numpy(), "score_micro": score_micro})
        r = r.sort_values(["score_micro", "doc_id"], ascending=[False, True], kind="mergesort").head(TOP_K)
        r["rank"] = np.arange(1, len(r) + 1, dtype=np.int64)
        r["query_id"] = qid
        out.append(r[["query_id", "doc_id", "rank", "score_micro"]])
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": [], "doc_id": [], "rank": [], "score_micro": []}
    )


def _sql() -> str:
    toks = SQL_TOKENIZE.format(col="text")
    q_values = ", ".join(
        f"({qid}, '{t}')" for qid, qtext in QUERIES for t in dict.fromkeys(tokenize(qtext))
    )
    return f"""
WITH occurrences AS (
    SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM occurrences GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl FROM documents),
g AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avg_dl, COUNT(*) AS n_docs FROM dl),
q(query_id, term) AS (VALUES {q_values}),
scored AS (
    SELECT q.query_id, tf.doc_id,
           SUM((log10(g.n_docs + 1.0) - log10(CAST(df.df AS DOUBLE))) *
               ({DELTA} + (({K1} + 1.0) + tf.tf) /
                ({K1} * (1.0 - {B} + {B} * dl.dl / g.avg_dl) + tf.tf))) AS score
    FROM q
    JOIN tf ON q.term = tf.term
    JOIN df ON q.term = df.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN g
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, doc_id,
           CAST(ROUND(score * 1000000) AS BIGINT) AS score_micro,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY CAST(ROUND(score * 1000000) AS BIGINT) DESC, doc_id) AS rank
    FROM scored
)
SELECT query_id, doc_id, rank, score_micro FROM ranked WHERE rank <= {TOP_K}
"""


SQL_BM25_DOCS_SEARCH = _sql()


AUTOCOMPLETE_PREFIXES: list[tuple[int, str]] = [
    (0, "s"),
    (1, "wind"),
    (2, "cust"),
    (3, "b"),
    (4, "qu"),
]


def autocomplete_docs(sf_dir: str):
    """Autocomplete over the documents vocabulary: last token treated as a
    prefix, candidates ranked by the 4-gram stupid-backoff LM, top 3 —
    reference flow (pkg/searcher/spell_corrector.go:160-227). Rows-only
    driver check (the LM ranking is not SQL-expressible); deterministic.

    Output (query_id, rank, completion)."""
    import ray.data

    from ..state.lm import build_ngram_lm
    from ..state.spell import SpellCorrector

    from .search import autocomplete_search

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lm = build_ngram_lm(ds, text_cols=["text"])
    sc = SpellCorrector.build(lm.full_vocab, lm)
    queries = pd.DataFrame(
        {"query_id": [q for q, _ in AUTOCOMPLETE_PREFIXES], "text": [p for _, p in AUTOCOMPLETE_PREFIXES]}
    )
    return autocomplete_search(sc, queries).to_pandas()
