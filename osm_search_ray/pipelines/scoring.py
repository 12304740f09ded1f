"""Similarity scoring — exact reproductions of the reference formulas,
including their quirks (SURVEY.md A7; /root/reference/pkg/searcher/searcher.go).

All scorers are vectorized over a postings-rows frame
(field, term_id, doc_id, tf, name_len, address_len, total_len) restricted to
the query's terms, and return per-(doc) scores.

Reference quirks reproduced verbatim:
  * BM25F (searcher.go:249-315): K1=10, name W=20 B=0.95; the ADDRESS field
    uses NAME_B (0.95) instead of ADDRESS_B (0.3) — searcher.go:299;
    idf = log10((N - df + 0.5) / (df + 0.5)) with df = distinct docs
    containing the term across BOTH fields; iterates query terms WITH
    duplicates (a repeated query term contributes twice).
  * BM25+ (searcher.go:317-354): Δ=1, k1=1.2, b=0.98,
    idf = log10((N+1)/df); numerator is ``(k1+1) + tf`` — as written, NOT
    the standard (k1+1)*tf; fields merged by concatenation (D3); iterates
    DISTINCT query terms (map iteration).
  * TF-IDF cosine (searcher.go:356-400): doc/query norms computed but NEVER
    applied to the final score (raw dot product ranks).

Ranking ties: the reference's sort is stable over Go map iteration order —
nondeterministic. We define ties broken by ascending doc_id (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .text_index import FIELD_ADDRESS, FIELD_NAME, TextIndex

# BM25+ parameters (searcher.go:27-37)
DELTA = 1.0
K1 = 1.2
B = 0.98
# BM25F parameters
K1_BM25F = 10.0
NAME_WEIGHT = 20.0
ADDRESS_WEIGHT = 1.0
NAME_B = 0.95
ADDRESS_B = 0.3  # defined in the reference but unused due to the :299 quirk


def score_bm25_field(p: pd.DataFrame, query_term_ids: list[int], g: dict) -> pd.Series:
    """p: postings rows for the query's terms. query_term_ids WITH duplicates."""
    n = float(g["docs_count"])
    scores: dict[int, float] = {}
    df_by_term = p.groupby("term_id")["doc_id"].nunique()
    for tid in query_term_ids:  # duplicates intentionally re-scored
        rows = p[p["term_id"] == tid]
        if len(rows) == 0:
            continue
        df = float(df_by_term[tid])
        idf = np.log10(n - df + 0.5) - np.log10(df + 0.5)
        for field, weight, avg_len, len_col in (
            (FIELD_NAME, NAME_WEIGHT, g["avg_name_len"], "name_len"),
            (FIELD_ADDRESS, ADDRESS_WEIGHT, g["avg_address_len"], "address_len"),
        ):
            fr = rows[rows["field"] == field]
            if len(fr) == 0:
                continue
            tf = fr["tf"].to_numpy(dtype=np.float64)
            flen = fr[len_col].to_numpy(dtype=np.float64)
            # NAME_B used for BOTH fields (reference searcher.go:299 quirk)
            wtd = weight * (tf / (1.0 + NAME_B * ((flen / avg_len) - 1.0)))
            contrib = (wtd / (K1_BM25F + wtd)) * idf
            for d, c in zip(fr["doc_id"].to_numpy(), contrib):
                scores[d] = scores.get(d, 0.0) + c
    return pd.Series(scores, dtype=np.float64)


def score_bm25_plus(p: pd.DataFrame, query_term_ids: list[int], g: dict) -> pd.Series:
    """Fields merged (D3); distinct query terms only (map-iteration semantics)."""
    n = float(g["docs_count"])
    avg = g["avg_total_len"]
    merged = (
        p.groupby(["term_id", "doc_id"])
        .agg(tf=("tf", "sum"), total_len=("total_len", "first"))
        .reset_index()
    )
    scores: dict[int, float] = {}
    for tid in dict.fromkeys(query_term_ids):  # dedup, keep order
        rows = merged[merged["term_id"] == tid]
        if len(rows) == 0:
            continue
        df = float(len(rows))
        idf = np.log10(n + 1.0) - np.log10(df)
        tf = rows["tf"].to_numpy(dtype=np.float64)
        dl = rows["total_len"].to_numpy(dtype=np.float64)
        # numerator (K1+1)+tf — reproduced as written (searcher.go:339-340)
        contrib = idf * (DELTA + ((K1 + 1.0) + tf) / (K1 * (1.0 - B + B * dl / avg) + tf))
        for d, c in zip(rows["doc_id"].to_numpy(), contrib):
            scores[d] = scores.get(d, 0.0) + c
    return pd.Series(scores, dtype=np.float64)


def score_tfidf_cosine(p: pd.DataFrame, query_term_ids: list[int], g: dict) -> pd.Series:
    """Norms computed but unused (searcher.go:382-399) — raw dot product."""
    n = float(g["docs_count"])
    qcount = pd.Series(query_term_ids).value_counts()
    merged = p.groupby(["term_id", "doc_id"]).agg(tf=("tf", "sum")).reset_index()
    scores: dict[int, float] = {}
    for tid in dict.fromkeys(query_term_ids):
        rows = merged[merged["term_id"] == tid]
        if len(rows) == 0:
            continue
        df = float(len(rows))
        tf_q = 1.0 + np.log10(float(qcount[tid]))
        idf = np.log10(n) - np.log10(df)
        tfidf_q = tf_q * idf
        tf_d = 1.0 + np.log10(rows["tf"].to_numpy(dtype=np.float64))
        contrib = (tf_d * idf) * tfidf_q
        for d, c in zip(rows["doc_id"].to_numpy(), contrib):
            scores[d] = scores.get(d, 0.0) + c
    return pd.Series(scores, dtype=np.float64)


SCORERS = {
    "BM25_FIELD": score_bm25_field,
    "BM25_PLUS": score_bm25_plus,
    "TF_IDF_COSINE": score_tfidf_cosine,
}


def rank_scores(scores: pd.Series, k: int, offset: int = 0) -> pd.DataFrame:
    """Descending score, ties by ascending doc_id; slice [offset, offset+k)."""
    df = scores.rename("score").rename_axis("doc_id").reset_index()
    df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    df = df.iloc[offset : offset + k].reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df
