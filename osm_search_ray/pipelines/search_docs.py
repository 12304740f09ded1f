"""Full-text search driver queries over the ``documents`` corpus, scored
DISTRIBUTED (VERDICT r01 item 1: no full-postings ``to_pandas`` anywhere on
the query path).

Shape (the segment-reader discipline of the reference,
/root/reference/pkg/index/inverted_index.go:131-193 — read only the
requested terms' postings — re-expressed as a stream):

  1. ONE streaming scan over ``documents`` emits only the postings rows
     whose term is in the broadcast query-term set, with per-doc field
     lengths attached in-batch (a doc's full text lives in one row, so tf
     and lengths are FINAL per batch — no shuffle), plus the per-batch
     partials FOLDED INTO THE SAME OUTPUT (VERDICT r02 item 4): one
     corpus-stats row (doc count, length sums: the BM25 globals) and the
     per-term distinct-doc df partials.
  2. one tiny filtered collect pulls those partial rows (≤ |query vocab|
     + 1 per batch) — the df table and globals, no second tokenize pass.
  3. scoring: map_batches over the match stream with the broadcast
     (df, avg_len, query→terms) dicts → per-(query,doc) partial scores →
     groupby(query_id, doc_id) sum → per-query top-k via map_groups.

Only the stats partials (1 row/batch), the per-term df table and the final
top-k ever reach the driver.

Three scorers, each an exact reproduction of a reference formula including
its quirks (/root/reference/pkg/searcher/searcher.go; see pipelines/scoring.py
for the index-side implementations and the quirk inventory):

  bm25_search   BM25+  (searcher.go:317-354)  single field (text); the
                ``(k1+1)+tf`` numerator quirk; distinct query terms
  bm25f_search  BM25_FIELD (searcher.go:249-315)  two fields — ``text`` as
                the name field (W=20), ``source`` as the address field
                (W=1); NAME_B=0.95 used for BOTH fields (the :299 quirk);
                query terms iterated WITH duplicates; df across both fields
  tfidf_search  TF_IDF_COSINE (searcher.go:356-400)  fields merged; norms
                computed but never applied (raw dot product); duplicate
                query terms fold into tf_q = 1+log10(count)

Ranks are ordered by the ROUNDED score (micro-units) then doc_id, so the
two engines' last-ulp float differences cannot flip a rank.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ..stages.joins import default_actor_pool
from ..sources.readers import read_pq
import ray.data

from ..functions.tokenize import SQL_TOKENIZE, tokenize, tokenize_array

QUERIES: list[tuple[int, str]] = [
    (0, "spark join"),
    (1, "window merge sort"),
    (2, "customer data"),
    (3, "fast slow"),
    (4, "batch stream vector"),
]
# BM25F / TF-IDF query sets include deliberate duplicate terms ("data data")
# to exercise the with-duplicates iteration quirk (BM25F) and the
# tf_q = 1+log10(count) fold (TF-IDF), plus src* terms that only hit the
# address field.
FIELD_QUERIES: list[tuple[int, str]] = [
    (0, "spark join src3"),
    (1, "data data table"),
    (2, "customer src7 src7"),
    (3, "window merge sort"),
    (4, "stream src15"),
]
K1 = 1.2
B = 0.98
DELTA = 1.0
K1F = 10.0
NAME_W = 20.0
ADDR_W = 1.0
NAME_B = 0.95
TOP_K = 10

_MATCH_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("field", pa.int32()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("len0", pa.int64()),
        ("len1", pa.int64()),
    ]
)


def _scan_matches(sf_dir: str, fields: dict[str, int], qterms: list[str]):
    """ONE tokenize pass over ``documents`` (VERDICT r02 item 4): each scan
    batch emits its match rows (term in qterms) PLUS the per-batch partials
    that used to need their own passes, folded into the same output —

      field = -1   one stats row per batch (doc count, per-field token sums)
      field = -2   df partials (term, tf=distinct docs in this batch) —
                   exact per batch because a doc's text lives in one row

    The scan output (match + partial rows only, never the corpus text
    columns) is materialized ONCE into the object store — spillable,
    bounded by query-term selectivity — because two consumers need it: one
    tiny filtered collect (stats + df → the scoring globals) and the
    streaming scorer. The alternative (no materialize, re-run the scan per
    consumer) tokenizes the corpus twice — strictly worse; idf/avg_dl are
    corpus aggregates, so NO single streaming pass can score on the fly.
    The true at-scale serving form precomputes df/globals in the on-disk
    index and reads pruned postings with zero corpus scans
    (text_index.point_query_store / search.StoreSearcher).

    Returns (matches Dataset, n_docs, {field_id: token_sum}, df_map)."""
    cols = ["doc_id"] + list(fields)
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=cols)
    qindex = pd.Index(sorted(set(qterms)))  # tiny — broadcast by closure

    def scan(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        nd = len(doc_ids)
        lens: dict[int, np.ndarray] = {}
        parts = []
        for col, fid in fields.items():
            toks, counts = tokenize_array(batch.column(col).to_pylist())
            lens[fid] = counts
            if len(toks):
                mask = pd.Series(toks).isin(qindex).to_numpy()
                if mask.any():
                    pos = np.repeat(np.arange(nd), counts)[mask]
                    sub = pd.DataFrame({"pos": pos, "term": toks[mask]})
                    g = sub.groupby(["pos", "term"], sort=False).size().reset_index(name="tf")
                    g["field"] = fid
                    parts.append(g)
        len0 = lens.get(0, np.zeros(nd, np.int64))
        len1 = lens.get(1, np.zeros(nd, np.int64))
        if parts:
            m = pd.concat(parts, ignore_index=True)
            posv = m["pos"].to_numpy(dtype=np.int64)
            terms = m["term"].to_numpy(dtype=object)
            fieldv = m["field"].to_numpy(dtype=np.int32)
            tfv = m["tf"].to_numpy(dtype=np.int64)
            # df partial: distinct docs per term in THIS batch (across fields)
            dfp = m[["pos", "term"]].drop_duplicates().groupby("term", sort=False).size()
            df_terms = dfp.index.to_numpy(dtype=object)
            df_counts = dfp.to_numpy(dtype=np.int64)
        else:
            posv = np.empty(0, np.int64)
            terms = np.empty(0, object)
            fieldv = np.empty(0, np.int32)
            tfv = np.empty(0, np.int64)
            df_terms = np.empty(0, object)
            df_counts = np.empty(0, np.int64)
        npart = len(df_terms)
        return pa.table(
            {
                "term": pa.array(np.concatenate([terms, df_terms, [""]]).tolist(), pa.string()),
                "field": pa.array(
                    np.concatenate([fieldv, np.full(npart, -2, np.int32), [np.int32(-1)]])
                ),
                "doc_id": pa.array(
                    np.concatenate([doc_ids[posv], np.full(npart, -1, np.int64), [np.int64(-1)]])
                ),
                "tf": pa.array(np.concatenate([tfv, df_counts, [np.int64(nd)]])),
                "len0": pa.array(
                    np.concatenate([len0[posv], np.zeros(npart, np.int64), [len0.sum().astype(np.int64)]])
                ),
                "len1": pa.array(
                    np.concatenate([len1[posv], np.zeros(npart, np.int64), [len1.sum().astype(np.int64)]])
                ),
            },
            schema=_MATCH_SCHEMA,
        )

    scanned = ds.map_batches(scan, batch_format="pyarrow").materialize()
    # ONE tiny filtered collect: stats rows + df partials together
    small = scanned.map_batches(
        lambda t: t.filter(pc.less(t.column("field"), 0)), batch_format="pyarrow"
    ).to_pandas()
    stats = small[small["field"] == -1]
    n_docs = int(stats["tf"].sum())
    len_sums = {0: int(stats["len0"].sum()), 1: int(stats["len1"].sum())}
    dfp = small[small["field"] == -2]
    df_map: dict[str, int] = dfp.groupby("term", sort=False)["tf"].sum().astype(int).to_dict()
    # batch_size=None (block-preserving) maintains the invariant the
    # scoring stages rely on: ALL of a doc's match rows live in one block
    # (each doc was scanned in exactly one batch), so per-(query, doc)
    # in-batch sums are FINAL — no aggregation shuffle needed downstream
    matches = scanned.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("field"), 0)), batch_format="pyarrow", batch_size=None
    )
    return matches, n_docs, len_sums, df_map


_LM_STATE_CACHE: dict = {}


def _lm_state(sf_dir: str):
    """(lm, corrector) for a corpus, built once per process — the serving
    discipline (reference: the server loads the LM/FST once at boot, not
    per request). spell_search and autocomplete share the SAME corpus
    state, and repeated driver/bench invocations in one process skip the
    rebuild. Cache key includes the documents file mtime so a changed
    corpus invalidates."""
    import os

    import ray.data

    from ..state.lm import build_ngram_lm
    from ..state.spell import SpellCorrector

    path = f"{sf_dir}/documents.parquet"
    key = (sf_dir, os.path.getmtime(path))
    if key not in _LM_STATE_CACHE:
        ds = read_pq(path, columns=["doc_id", "text"])
        lm = build_ngram_lm(ds, text_cols=["text"])
        _LM_STATE_CACHE.clear()  # hold ONE corpus at a time
        _LM_STATE_CACHE[key] = (lm, SpellCorrector.build(lm.full_vocab, lm))
    return _LM_STATE_CACHE[key]


_EMPTY_RESULT = pd.DataFrame(
    {
        "query_id": pd.Series(dtype=np.int64),
        "doc_id": pd.Series(dtype=np.int64),
        "rank": pd.Series(dtype=np.int64),
        "score_micro": pd.Series(dtype=np.int64),
    }
)


def _finalize_topk(scored: "ray.data.Dataset", top_k: int) -> pd.DataFrame:
    """ZERO-shuffle top-k: ``scored`` rows are already FINAL per
    (query, doc) — each doc's matches are confined to one block (see
    _scan_matches), so the per-batch (query, doc) sums ARE the totals.
    micro-int → per-batch PARTIAL top-k (combiner) → final driver merge
    over ≤ blocks×queries×k rows."""

    def micro_partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score_micro"] = np.rint(df["score"].to_numpy(dtype=np.float64) * 1e6).astype(np.int64)
        df = df.sort_values(["score_micro", "doc_id"], ascending=[False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(top_k)[["query_id", "doc_id", "score_micro"]]

    parts = [
        b
        for b in scored.map_batches(micro_partial_topk, batch_format="pandas", batch_size=None).iter_batches(
            batch_size=None, batch_format="pandas"
        )
    ]
    if not parts:
        return _EMPTY_RESULT.copy()
    out = pd.concat(parts, ignore_index=True)
    if len(out) == 0:
        return _EMPTY_RESULT.copy()
    out = out.sort_values(["score_micro", "doc_id"], ascending=[False, True], kind="mergesort")
    out = out.groupby("query_id", sort=False).head(top_k).copy()
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    out = out[["query_id", "doc_id", "rank", "score_micro"]].astype(np.int64)
    return out.sort_values(["query_id", "rank"], kind="mergesort").reset_index(drop=True)


def bm25_docs_search(sf_dir: str):
    """BM25+ over the single ``text`` field. Output
    (query_id, doc_id, rank, score_micro)."""
    t2q: dict[str, list[int]] = {}
    for qid, qtext in QUERIES:
        for t in dict.fromkeys(tokenize(qtext)):  # distinct terms (map-iteration semantics)
            t2q.setdefault(t, []).append(qid)
    matches, n_docs, len_sums, df_map = _scan_matches(sf_dir, {"text": 0}, list(t2q))
    if n_docs == 0:
        return _EMPTY_RESULT.copy()
    avg_dl = len_sums[0] / n_docs  # int/int → double, matches SQL SUM/COUNT
    n = float(n_docs)

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64), "doc_id": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)})
        dfv = df["term"].map(df_map).to_numpy(dtype=np.float64)
        idf = np.log10(n + 1.0) - np.log10(dfv)
        tfv = df["tf"].to_numpy(dtype=np.float64)
        dlv = df["len0"].to_numpy(dtype=np.float64)
        # numerator (K1+1)+tf — reproduced as written (searcher.go:339-340)
        df = df.assign(contrib=idf * (DELTA + ((K1 + 1.0) + tfv) / (K1 * (1.0 - B + B * dlv / avg_dl) + tfv)))
        ex = df[["term", "doc_id", "contrib"]].merge(
            pd.DataFrame([(t, q) for t, qs in t2q.items() for q in qs], columns=["term", "query_id"]),
            on="term",
        )
        g = ex.groupby(["query_id", "doc_id"], sort=False)["contrib"].sum().reset_index(name="score")
        return g

    scored = matches.map_batches(score_batch, batch_format="pandas", batch_size=None)
    return _finalize_topk(scored, TOP_K)


def bm25f_docs_search(sf_dir: str, queries: list[tuple[int, str]] | None = None):
    """BM25_FIELD over (text→name W=20, source→address W=1); NAME_B for both
    fields (searcher.go:299 quirk); query terms WITH duplicates. Output
    (query_id, doc_id, rank, score_micro). ``queries`` overrides
    FIELD_QUERIES (used by the spell-store twin test)."""
    t2q: list[tuple[str, int]] = []  # duplicates kept
    for qid, qtext in queries if queries is not None else FIELD_QUERIES:
        for t in tokenize(qtext):
            t2q.append((t, qid))
    matches, n_docs, len_sums, df_map = _scan_matches(sf_dir, {"text": 0, "source": 1}, [t for t, _ in t2q])
    if n_docs == 0:
        return _EMPTY_RESULT.copy()
    avg0 = len_sums[0] / n_docs
    avg1 = len_sums[1] / n_docs
    n = float(n_docs)
    t2q_df = pd.DataFrame(t2q, columns=["term", "query_id"])

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64), "doc_id": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)})
        dfv = df["term"].map(df_map).to_numpy(dtype=np.float64)
        idf = np.log10(n - dfv + 0.5) - np.log10(dfv + 0.5)
        is_name = df["field"].to_numpy() == 0
        w = np.where(is_name, NAME_W, ADDR_W)
        avg = np.where(is_name, avg0, avg1)
        flen = np.where(is_name, df["len0"].to_numpy(dtype=np.float64), df["len1"].to_numpy(dtype=np.float64))
        tfv = df["tf"].to_numpy(dtype=np.float64)
        wtd = w * (tfv / (1.0 + NAME_B * ((flen / avg) - 1.0)))
        df = df.assign(contrib=(wtd / (K1F + wtd)) * idf)
        ex = df[["term", "doc_id", "contrib"]].merge(t2q_df, on="term")  # dup query terms re-score
        g = ex.groupby(["query_id", "doc_id"], sort=False)["contrib"].sum().reset_index(name="score")
        return g

    scored = matches.map_batches(score_batch, batch_format="pandas", batch_size=None)
    return _finalize_topk(scored, TOP_K)


def tfidf_docs_search(sf_dir: str):
    """TF_IDF_COSINE, fields merged by tf summation; norms never applied
    (searcher.go:382-399). Output (query_id, doc_id, rank, score_micro)."""
    tq: dict[tuple[str, int], int] = {}
    for qid, qtext in FIELD_QUERIES:
        for t in tokenize(qtext):
            tq[(t, qid)] = tq.get((t, qid), 0) + 1
    tq_df = pd.DataFrame([(t, q, c) for (t, q), c in tq.items()], columns=["term", "query_id", "qcnt"])
    matches, n_docs, _, df_map = _scan_matches(sf_dir, {"text": 0, "source": 1}, list(tq_df["term"]))
    if n_docs == 0:
        return _EMPTY_RESULT.copy()
    n = float(n_docs)

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64), "doc_id": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)})
        # merge fields: sum tf per (term, doc) — doc is whole within the batch
        m = df.groupby(["term", "doc_id"], sort=False)["tf"].sum().reset_index()
        dfv = m["term"].map(df_map).to_numpy(dtype=np.float64)
        idf = np.log10(n) - np.log10(dfv)
        tf_d = 1.0 + np.log10(m["tf"].to_numpy(dtype=np.float64))
        ex = m.assign(tf_d_idf=tf_d * idf, idf=idf).merge(tq_df, on="term")
        tf_q = 1.0 + np.log10(ex["qcnt"].to_numpy(dtype=np.float64))
        ex = ex.assign(contrib=ex["tf_d_idf"].to_numpy() * (tf_q * ex["idf"].to_numpy()))
        g = ex.groupby(["query_id", "doc_id"], sort=False)["contrib"].sum().reset_index(name="score")
        return g

    scored = matches.map_batches(score_batch, batch_format="pandas", batch_size=None)
    return _finalize_topk(scored, TOP_K)


# Boolean OR/NOT retrieval. The reference's query parser ACCEPTS the full
# AND/OR/NOT algebra but the engine path returns "not implemented" for
# OR and NOT (/root/reference/pkg/searcher/searcher.go:664-670 — only the
# implicit-AND intersection at :572-630 exists). This operator implements
# the whole algebra: a doc qualifies for a query iff it contains EVERY
# ``must`` term, AT LEAST ONE ``should`` term (when any are given), and
# NONE of the ``must_not`` terms. Every query must carry at least one
# positive (must or should) term — pure-NOT queries are rejected, the
# same contract a posting-driven engine would need (NOT alone means a
# full-corpus complement).
BOOL_QUERIES: list[tuple[int, str, str, str]] = [
    (0, "spark join", "", ""),  # plain AND — the reference-parity case
    (1, "customer", "data table", ""),  # AND (a OR b)
    (2, "window", "", "sort"),  # AND NOT
    (3, "", "stream batch vector", "merge"),  # (a OR b OR c) NOT d
    (4, "data", "fast slow", "customer"),  # all three clauses at once
]


def _bool_terms(q: tuple[int, str, str, str]) -> tuple[list[str], list[str], list[str]]:
    """Distinct tokenized clause terms (dedup keeps first-seen order)."""
    _, must, should, must_not = q
    return (
        list(dict.fromkeys(tokenize(must))),
        list(dict.fromkeys(tokenize(should))),
        list(dict.fromkeys(tokenize(must_not))),
    )


def boolean_docs_search(sf_dir: str):
    """Boolean must/should/must_not retrieval as ONE streaming corpus scan:
    per batch, a (docs × query-vocab) presence matrix is built vectorized
    from the shared tokenizer, and each query's clause masks reduce over
    its columns — no shuffle, no per-row loop, output bounded by match
    selectivity. The serving twin would intersect/union pruned postings
    from the on-disk index (point_query_store); this is the batch form.

    Output: (query_id, doc_id) — every qualifying pair."""
    specs = []
    vocab: dict[str, int] = {}
    for q in BOOL_QUERIES:
        must, should, must_not = _bool_terms(q)
        if not must and not should:
            raise ValueError(f"query {q[0]}: pure-NOT queries are not retrievable")
        for t in must + should + must_not:
            vocab.setdefault(t, len(vocab))
        specs.append(
            (
                q[0],
                np.array([vocab[t] for t in must], np.int64),
                np.array([vocab[t] for t in should], np.int64),
                np.array([vocab[t] for t in must_not], np.int64),
            )
        )
    qindex = pd.Index(list(vocab))
    nv = len(vocab)

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        nd = len(doc_ids)
        toks, counts = tokenize_array(batch.column("text").to_pylist())
        present = np.zeros((nd, nv), dtype=bool)
        if len(toks):
            col = qindex.get_indexer(toks)  # -1 for non-query terms
            hit = col >= 0
            if hit.any():
                present[np.repeat(np.arange(nd), counts)[hit], col[hit]] = True
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for qid, must, should, must_not in specs:
            sel = present[:, must].all(axis=1)
            if len(should):
                sel &= present[:, should].any(axis=1)
            sel &= ~present[:, must_not].any(axis=1)
            ids = doc_ids[sel]
            out_q.append(np.full(len(ids), qid, np.int64))
            out_d.append(ids.astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else [], pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------- SQL oracles


def _sql_bm25(
    q_cte: str | None = None,
    prefix: str = "",
    recursive: bool = False,
    final_cols: str = "query_id, doc_id, rank, score_micro",
) -> str:
    """BM25+ oracle. ``q_cte`` overrides the literal query-term relation
    (used by the spell oracle, which computes corrected terms in SQL);
    ``prefix`` is an extra CTE block inserted first (LM counts + correction),
    ``recursive`` switches to WITH RECURSIVE (the correction cross-product
    walk), ``final_cols`` trims the output to the engine twin's columns."""
    toks = SQL_TOKENIZE.format(col="text")
    if q_cte is None:
        q_values = ", ".join(
            f"({qid}, '{t}')" for qid, qtext in QUERIES for t in dict.fromkeys(tokenize(qtext))
        )
        q_cte = f"q(query_id, term) AS (VALUES {q_values})"
    return f"""
WITH {"RECURSIVE " if recursive else ""}{prefix}occurrences AS (
    SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM occurrences GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl FROM documents),
g AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avg_dl, COUNT(*) AS n_docs FROM dl),
{q_cte},
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
SELECT {final_cols} FROM ranked WHERE rank <= {TOP_K}
"""


def _sql_two_field_base() -> str:
    tok0 = SQL_TOKENIZE.format(col="text")
    tok1 = SQL_TOKENIZE.format(col="source")
    return f"""
occ AS (
    SELECT 0 AS field, doc_id, unnest({tok0}) AS term FROM documents
    UNION ALL
    SELECT 1 AS field, doc_id, unnest({tok1}) AS term FROM documents
),
tf AS (SELECT field, term, doc_id, COUNT(*) AS tf FROM occ GROUP BY 1, 2, 3),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
lens AS (
    SELECT doc_id, CAST(len({tok0}) AS BIGINT) AS len0,
                   CAST(len({tok1}) AS BIGINT) AS len1
    FROM documents
),
g AS (SELECT COUNT(*) AS n_docs,
             CAST(SUM(len0) AS DOUBLE) / COUNT(*) AS avg0,
             CAST(SUM(len1) AS DOUBLE) / COUNT(*) AS avg1
      FROM lens)"""


def _sql_bm25f(q_cte: str | None = None, prefix: str = "", recursive: bool = False) -> str:
    """BM25F oracle; the q relation keeps duplicate terms (the with-
    duplicates iteration quirk). Parametrization as in _sql_bm25."""
    if q_cte is None:
        q_values = ", ".join(
            f"({qid}, '{t}')" for qid, qtext in FIELD_QUERIES for t in tokenize(qtext)  # duplicates kept
        )
        q_cte = f"q(query_id, term) AS (VALUES {q_values})"
    wtd = (
        f"(CASE WHEN tf.field = 0 THEN {NAME_W} ELSE {ADDR_W} END) * "
        f"(tf.tf / (1.0 + {NAME_B} * (((CASE WHEN tf.field = 0 THEN lens.len0 ELSE lens.len1 END) / "
        f"(CASE WHEN tf.field = 0 THEN g.avg0 ELSE g.avg1 END)) - 1.0)))"
    )
    return f"""
WITH {"RECURSIVE " if recursive else ""}{prefix}{_sql_two_field_base().lstrip()},
{q_cte},
scored AS (
    SELECT q.query_id, tf.doc_id,
           SUM(({wtd} / ({K1F} + {wtd})) *
               (log10(g.n_docs - df.df + 0.5) - log10(df.df + 0.5))) AS score
    FROM q
    JOIN tf ON q.term = tf.term
    JOIN df ON q.term = df.term
    JOIN lens ON tf.doc_id = lens.doc_id
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


def _sql_tfidf() -> str:
    tq: dict[tuple[int, str], int] = {}
    for qid, qtext in FIELD_QUERIES:
        for t in tokenize(qtext):
            tq[(qid, t)] = tq.get((qid, t), 0) + 1
    q_values = ", ".join(f"({qid}, '{t}', {c})" for (qid, t), c in tq.items())
    return f"""
WITH {_sql_two_field_base()},
tfm AS (SELECT term, doc_id, SUM(tf) AS tf FROM tf GROUP BY 1, 2),
q(query_id, term, qcnt) AS (VALUES {q_values}),
scored AS (
    SELECT q.query_id, tfm.doc_id,
           SUM(((1.0 + log10(tfm.tf)) * (log10(CAST(g.n_docs AS DOUBLE)) - log10(CAST(df.df AS DOUBLE)))) *
               ((1.0 + log10(CAST(q.qcnt AS DOUBLE))) * (log10(CAST(g.n_docs AS DOUBLE)) - log10(CAST(df.df AS DOUBLE))))) AS score
    FROM q
    JOIN tfm ON q.term = tfm.term
    JOIN df ON q.term = df.term
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


def _sql_boolean() -> str:
    """Relational twin of boolean_docs_search: distinct (doc, term) pairs
    joined to the clause-term literals; a doc qualifies when its distinct
    must-hit count equals the query's must arity, it has a should hit (or
    the clause is empty), and it has zero must_not hits. The literals are
    generated from BOOL_QUERIES through the same tokenizer+dedup, so both
    sides see identical clause term sets."""
    rows = []
    meta = []
    for q in BOOL_QUERIES:
        must, should, must_not = _bool_terms(q)
        meta.append(f"({q[0]}, {len(must)}, {len(should)})")
        rows += [f"({q[0]}, 'must', '{t}')" for t in must]
        rows += [f"({q[0]}, 'should', '{t}')" for t in should]
        rows += [f"({q[0]}, 'not', '{t}')" for t in must_not]
    toks = SQL_TOKENIZE.format(col="text")
    return f"""
WITH toksd AS (
    SELECT DISTINCT doc_id, term
    FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
),
q(query_id, kind, term) AS (VALUES {', '.join(rows)}),
meta(query_id, n_must, n_should) AS (VALUES {', '.join(meta)}),
hits AS (
    SELECT q.query_id, t.doc_id, q.kind, q.term
    FROM q JOIN toksd t ON t.term = q.term
),
agg AS (
    SELECT query_id, doc_id,
           COUNT(CASE WHEN kind = 'must' THEN 1 END) AS n_must_hit,
           COUNT(CASE WHEN kind = 'should' THEN 1 END) AS n_should_hit,
           COUNT(CASE WHEN kind = 'not' THEN 1 END) AS n_not_hit
    FROM hits GROUP BY 1, 2
)
SELECT a.query_id, a.doc_id
FROM agg a JOIN meta m ON a.query_id = m.query_id
WHERE a.n_must_hit = m.n_must
  AND (m.n_should = 0 OR a.n_should_hit > 0)
  AND a.n_not_hit = 0
"""


SQL_BM25_DOCS_SEARCH = _sql_bm25()
SQL_BM25F_DOCS_SEARCH = _sql_bm25f()
SQL_TFIDF_DOCS_SEARCH = _sql_tfidf()
SQL_BOOLEAN_DOCS_SEARCH = _sql_boolean()


def _sql_spell_ctes() -> str:
    """CTE block (requires WITH RECURSIVE) ending in ``sp_best(query_id, t)``
    — the spell-corrected token sequence per SPELL_QUERIES entry, replaying
    SpellCorrector.correct_query (state/spell.py:184-213) relationally:

      sp_q     tokenized typo queries (same tokenize(), fixed literals)
      sp_lev   OOV tokens × full-vocab (lm_fvocab) candidates within
               Levenshtein <= 2 — DuckDB levenshtein() == the engine's
               banded DP _lev_leq (plain Levenshtein; fuzz-equality-tested
               in tests/test_search.py)
      sp_cls   the reference's d<=1 ++ d<=2 CONCATENATION with duplicates
               kept (searcher.go:167-186), lexicographic within each class
      sp_per   per-position candidate list with a 0-based enumeration index;
               in-vocab tokens and candidate-less OOV fall back to [tok]
      sp_walk  recursive cross-product in itertools.product order via the
               Horner rank idx = (..(i0*n1 + i1)*n2 ..) + ik, pruned at
               MAX_CANDIDATES each step (idx is monotone along the walk,
               so pruning is exact — the islice(product(...)) twin)
      sp_best  FIRST LM argmax: ORDER BY lp DESC, idx ASC — the strict->
               first-max semantics (spell_corrector.go:147-151)

    ln() differs numpy-vs-DuckDB by <=1 ulp (state/lm.py note); an argmax
    flip needs two candidate sequences within ~1e-15 of each other — the
    same accepted risk class as the autocomplete / lm_doc_scores oracles."""
    from ..state.lm import sql_lm_score_ctes
    from ..state.spell import MAX_CANDIDATES

    q_rows = ", ".join(
        f"({qid}, {pos}, '{tok}')"
        for qid, qtext in SPELL_QUERIES
        for pos, tok in enumerate(tokenize(qtext))
    )
    return f"""sp_q(query_id, pos, tok) AS (VALUES {q_rows}),
sp_lev AS (
    SELECT q.query_id, q.pos, v.tok AS cand, levenshtein(q.tok, v.tok) AS ld
    FROM sp_q q JOIN lm_fvocab v ON levenshtein(q.tok, v.tok) <= 2
    WHERE NOT EXISTS (SELECT 1 FROM lm_fvocab vv WHERE vv.tok = q.tok)),
sp_cls AS (
    SELECT query_id, pos, cand, 1 AS cls FROM sp_lev WHERE ld <= 1
    UNION ALL
    SELECT query_id, pos, cand, 2 AS cls FROM sp_lev),
sp_per AS (
    SELECT query_id, pos, cand,
           ROW_NUMBER() OVER (PARTITION BY query_id, pos ORDER BY cls, cand) - 1 AS ci
    FROM sp_cls
    UNION ALL
    SELECT q.query_id, q.pos, q.tok, 0
    FROM sp_q q
    WHERE NOT EXISTS (SELECT 1 FROM sp_cls c
                      WHERE c.query_id = q.query_id AND c.pos = q.pos)),
sp_sz AS (SELECT query_id, pos, COUNT(*) AS n FROM sp_per GROUP BY 1, 2),
sp_npos AS (SELECT query_id, MAX(pos) AS maxpos FROM sp_q GROUP BY 1),
sp_walk AS (
    SELECT query_id, pos, CAST(ci AS BIGINT) AS idx, [cand] AS t
    FROM sp_per WHERE pos = 0 AND ci < {MAX_CANDIDATES}
    UNION ALL
    SELECT w.query_id, p.pos, w.idx * s.n + p.ci, w.t || [p.cand]
    FROM sp_walk w
    JOIN sp_per p ON p.query_id = w.query_id AND p.pos = w.pos + 1
    JOIN sp_sz s ON s.query_id = p.query_id AND s.pos = p.pos
    WHERE w.idx * s.n + p.ci < {MAX_CANDIDATES}),
sp_seqs AS (
    SELECT w.query_id, w.idx, w.t
    FROM sp_walk w JOIN sp_npos m ON m.query_id = w.query_id AND w.pos = m.maxpos),
{sql_lm_score_ctes("sp_seqs", "query_id, idx")},
sp_best AS (
    SELECT query_id, t FROM (
        SELECT s.query_id, s.t,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                                  ORDER BY l.lp DESC, s.idx) AS rn
        FROM sp_seqs s JOIN lm_lp l USING (query_id, idx))
    WHERE rn = 1)"""


def _sql_spell_search() -> str:
    """Exact oracle for spell_search (r04): SQL-computed corrections
    (sp_best) feed the BM25+ scorer with DISTINCT corrected terms (the
    scorer's map-iteration semantics; never-corrected OOV typos drop via
    the postings join, mirroring SearchCore._terms_of's vocab filter)."""
    from ..state.lm import sql_lm_count_ctes

    prefix = sql_lm_count_ctes() + ",\n" + _sql_spell_ctes() + ",\n"
    q_cte = (
        "q AS (SELECT DISTINCT query_id, term FROM "
        "(SELECT query_id, unnest(t) AS term FROM sp_best))"
    )
    return _sql_bm25(q_cte=q_cte, prefix=prefix, recursive=True, final_cols="query_id, doc_id, rank")


sql_spell_search = functools.cache(_sql_spell_search)


def _sql_spell_store_search() -> str:
    """Exact oracle for spell_store_search (r04): SQL-computed corrections
    feed the two-field BM25F scorer WITH duplicate terms kept (the
    with-duplicates iteration quirk — _store_search passes the corrected
    sequence uncollapsed)."""
    from ..state.lm import sql_lm_count_ctes

    prefix = sql_lm_count_ctes() + ",\n" + _sql_spell_ctes() + ",\n"
    q_cte = "q AS (SELECT query_id, unnest(t) AS term FROM sp_best)"
    return _sql_bm25f(q_cte=q_cte, prefix=prefix, recursive=True)


sql_spell_store_search = functools.cache(_sql_spell_store_search)


_STORE_CACHE: dict = {}


_STORE_DISTRIBUTED_BYTES = 64 * 1024 * 1024


def _cached_store_dir(cache: dict, root: str, sf_dir: str, text_cols: dict[str, int], done_marker: str, build) -> str:
    """Shared per-process store cache: key by (corpus, mtime, field-set),
    tag the /tmp dir by the same triple, build once (skipped when
    ``done_marker`` already exists on disk), and hold ONE corpus at a time —
    evicted stores' directories are reclaimed so stale index trees
    (comparable in size to their corpus) don't pile up under /tmp as test
    data is regenerated (r3 code review)."""
    import hashlib
    import shutil

    path = f"{sf_dir}/documents.parquet"
    mtime = os.path.getmtime(path)
    fields_sig = ",".join(f"{c}:{f}" for c, f in sorted(text_cols.items()))
    key = (sf_dir, mtime, fields_sig)
    if key not in cache:
        tag = hashlib.sha1(f"{sf_dir}:{mtime}:{fields_sig}".encode()).hexdigest()[:12]
        out_dir = f"{root}/{tag}"
        if not os.path.exists(f"{out_dir}/{done_marker}"):
            build(path, out_dir)
        for k in [k for k in cache if k[:2] != key[:2]]:
            if cache[k] != out_dir:
                shutil.rmtree(cache[k], ignore_errors=True)
            del cache[k]
        cache[key] = out_dir
    return cache[key]


def _text_store_dir(sf_dir: str, text_cols: dict[str, int] | None = None) -> str:
    """Build (once per corpus × field-set per process) the on-disk text
    index for ``documents`` and return its directory.

    Regime-switched like the dedup verifies: corpora under
    ``_STORE_DISTRIBUTED_BYTES`` use the serving-size builder (ONE
    distributed scan pass + driver finish — the fixed cost of the
    multi-execution distributed build dwarfs the work at this size); larger
    corpora take ``build_text_index_ds`` + ``save_text_index_ds`` (nothing
    index-sized on the driver). Both emit the SAME bucketed layout
    (writer-parity unit-tested), so the read path below is regime-blind."""
    from .text_index import build_text_index, build_text_index_ds, save_text_index, save_text_index_ds

    text_cols = text_cols or {"text": 0}

    def build(path: str, out_dir: str) -> None:
        ds = read_pq(path, columns=["doc_id"] + list(text_cols))
        if os.path.getsize(path) < _STORE_DISTRIBUTED_BYTES:
            save_text_index(build_text_index(ds, text_cols=text_cols), out_dir)
        else:
            save_text_index_ds(build_text_index_ds(ds, text_cols=text_cols), out_dir)

    return _cached_store_dir(
        _STORE_CACHE, "/tmp/osm_search_ray_text_store", sf_dir, text_cols, "globals.json", build
    )


def _store_search(sf_dir: str, text_cols: dict[str, int], term_lists: list[tuple[int, list[str]]], scorer):
    """Shared store-backed search: ONE batched footer-pruned read resolves
    every query's terms (dictionary buckets + postings row groups —
    NOTHING index-sized is loaded, text_index.point_query_store), then the
    shared scoring kernel runs per query and ranks by the micro-rounded
    score then doc_id. Output (query_id, doc_id, rank, score_micro)."""
    from .text_index import _load_globals, point_query_store

    store = _text_store_dir(sf_dir, text_cols)
    g = _load_globals(store)
    all_toks = sorted({t for _, ts in term_lists for t in ts})
    ids, posts = point_query_store(store, all_toks)
    return _rank_queries(ids, posts, g, term_lists, scorer)


def _rank_queries(ids: dict, posts, g: dict, term_lists, scorer):
    """Shared ranking loop over a resolved (term→id, postings, globals)
    triple — the monolithic store, the segmented store, and the serving
    actors all feed it."""
    out = []
    for qid, terms in term_lists:
        tids = [ids[t] for t in terms if t in ids]
        if not tids:
            continue
        scores = scorer(posts, tids, g)
        df = scores.rename("score").rename_axis("doc_id").reset_index()
        df["score_micro"] = np.rint(df["score"].to_numpy(dtype=np.float64) * 1e6).astype(np.int64)
        df = df.sort_values(["score_micro", "doc_id"], ascending=[False, True], kind="mergesort").head(TOP_K)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["query_id"] = np.int64(qid)
        out.append(df[["query_id", "doc_id", "rank", "score_micro"]])
    if not out:
        return _EMPTY_RESULT.copy()
    res = pd.concat(out, ignore_index=True).astype(np.int64)
    return res.sort_values(["query_id", "rank"], kind="mergesort").reset_index(drop=True)


def bm25_store_search(sf_dir: str):
    """BM25+ served from the ON-DISK index store — the full resident-engine
    path under the hash oracle: index build to the term_id-range-bucketed
    store → pruned point reads → the same BM25+ kernel as the scan path
    (scoring.score_bm25_plus). Result-identical to bm25_docs_search /
    SQL_BM25_DOCS_SEARCH."""
    from .scoring import score_bm25_plus

    term_lists = [(qid, list(dict.fromkeys(tokenize(qtext)))) for qid, qtext in QUERIES]
    return _store_search(sf_dir, {"text": 0}, term_lists, score_bm25_plus)


_SEG_STORE_CACHE: dict = {}


def _segmented_store_dir(sf_dir: str, text_cols: dict[str, int]) -> str:
    """Two-segment incremental index over documents (doc_id parity split —
    the 'first half indexed, second half arrived later' scenario), built via
    index_segments.add_segment and cached per corpus like _text_store_dir."""
    from .index_segments import add_segment

    def build(path: str, out_dir: str) -> None:
        import pyarrow.compute as pc

        ds = read_pq(path, columns=["doc_id"] + list(text_cols))
        in_ram = os.path.getsize(path) < _STORE_DISTRIBUTED_BYTES
        for i, par in enumerate((0, 1)):
            # idempotent per parity: a crash between the two adds must not
            # re-add parity 0 as a THIRD segment on retry — skip the
            # parities whose segment already committed (add_segment itself
            # resumes an uncommitted dir)
            if os.path.exists(f"{out_dir}/seg-{i:03d}/globals.json"):
                continue
            half = ds.map_batches(
                lambda t, p=par: t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), p)),
                batch_format="pyarrow",
            )
            add_segment(out_dir, half, text_cols, in_ram=in_ram)

    return _cached_store_dir(
        _SEG_STORE_CACHE, "/tmp/osm_search_ray_seg_store", sf_dir, text_cols, "seg-001/globals.json", build
    )


def segmented_search(sf_dir: str):
    """BM25+ across a two-segment INCREMENTAL index (half the corpus indexed
    first, the other half added as a second segment without touching the
    first): per-segment footer-pruned point reads, term-string id remap,
    exactly-merged globals (index_segments.segmented_point_query) feeding
    the unchanged BM25+ kernel. Result-identical to bm25_store_search /
    bm25_docs_search / SQL_BM25_DOCS_SEARCH — the incremental path under
    the same hash oracle."""
    from .index_segments import segmented_point_query
    from .scoring import score_bm25_plus

    store = _segmented_store_dir(sf_dir, {"text": 0})
    term_lists = [(qid, list(dict.fromkeys(tokenize(qtext)))) for qid, qtext in QUERIES]
    all_toks = sorted({t for _, ts in term_lists for t in ts})
    ids, posts, g = segmented_point_query(store, all_toks)
    return _rank_queries(ids, posts, g, term_lists, score_bm25_plus)


def bm25f_store_search(sf_dir: str):
    """Two-field BM25F from the on-disk store (text→name W=20, source→
    address W=1; NAME_B-for-both and with-duplicates quirks live in
    scoring.score_bm25_field). Result-identical to bm25f_docs_search /
    SQL_BM25F_DOCS_SEARCH — the disk path re-proved on the two-field
    index layout."""
    from .scoring import score_bm25_field

    term_lists = [(qid, tokenize(qtext)) for qid, qtext in FIELD_QUERIES]  # duplicates kept
    return _store_search(sf_dir, {"text": 0, "source": 1}, term_lists, score_bm25_field)


def tfidf_store_search(sf_dir: str):
    """TF-IDF cosine (norms-unused quirk) from the on-disk two-field store;
    fields merge by tf summation inside scoring.score_tfidf_cosine.
    Result-identical to tfidf_docs_search / SQL_TFIDF_DOCS_SEARCH."""
    from .scoring import score_tfidf_cosine

    term_lists = [(qid, tokenize(qtext)) for qid, qtext in FIELD_QUERIES]  # dup terms fold into tf_q
    return _store_search(sf_dir, {"text": 0, "source": 1}, term_lists, score_tfidf_cosine)


# deliberate 1-2-edit typos of QUERIES terms — the FreeFormQuery
# OOV→Levenshtein→LM-rank flow (searcher.go:150-246) end-to-end
SPELL_QUERIES: list[tuple[int, str]] = [
    (0, "spxrk joinn"),
    (1, "windom mergge sort"),
    (2, "custoner data"),
    (3, "fsst sloow"),
    (4, "batcj stream vectr"),
]


def spell_store_search(sf_dir: str):
    """Spell-corrected TWO-FIELD search served from the ON-DISK store — the
    reference's full resident flow in one pipeline (FreeFormQuery,
    searcher.go:150-246): typo'd query → OOV Levenshtein candidates ranked
    by the 4-gram stupid-backoff LM (T4/T5; state built once per process
    via _lm_state) → BM25F field scoring (text→name W=20, source→address
    W=1) over pruned point reads from the term-bucketed index store.

    The corrector's vocabulary/LM come from the ``text`` field (the corpus
    prose); corrected terms then score against BOTH stored fields. Exact SQL
    oracle since r04 (_sql_spell_store_search: relational SymSpell+LM
    correction feeding the BM25F CTEs); also pinned by unit test to the
    corpus-scan twin ``bm25f_docs_search`` run on the same corrected
    queries. Output (query_id, doc_id, rank, score_micro)."""
    from .scoring import score_bm25_field

    _, sc = _lm_state(sf_dir)
    term_lists = [(qid, sc.correct_query(tokenize(qtext))) for qid, qtext in SPELL_QUERIES]
    return _store_search(sf_dir, {"text": 0, "source": 1}, term_lists, score_bm25_field)


def spell_search_docs(sf_dir: str):
    """Spell-corrected BM25+ search: queries with seeded typos are corrected
    by the Levenshtein-candidates × 4-gram-LM ranking (T4/T5), then scored
    against the documents index through the SearchActor pool. Exact SQL
    oracle since r04 (_sql_spell_search: the correction walk + LM argmax in
    recursive CTEs feeding the BM25+ CTEs); correction parity with the
    reference fixtures is also unit-tested (tests/test_search.py TestSpell).

    Output (query_id, doc_id, rank)."""
    from .search import free_form_search
    from .text_index import build_text_index

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    index = build_text_index(ds, text_cols={"text": 0})
    _, sc = _lm_state(sf_dir)
    queries = pd.DataFrame(
        {
            "query_id": [q for q, _ in SPELL_QUERIES],
            "text": [t for _, t in SPELL_QUERIES],
            "scoring": ["BM25_PLUS"] * len(SPELL_QUERIES),
            "top_k": [TOP_K] * len(SPELL_QUERIES),
            "offset": [0] * len(SPELL_QUERIES),
        }
    )
    res = free_form_search(index, queries, corrector=sc).to_pandas()
    out = res[["query_id", "doc_id", "rank"]].astype(np.int64)
    return out.sort_values(["query_id", "rank"], kind="mergesort").reset_index(drop=True)


_LM_SCORES_CACHE: dict = {}


def lm_doc_scores(sf_dir: str):
    """Per-document 4-gram LM log-probability — the quality-filter-by-
    perplexity pass of a training-data pipeline, using the corpus's own
    stupid-backoff LM (T5 kernel). The LM is built once (shared _lm_state
    cache with spell/autocomplete), broadcast via ray.put, and scoring runs
    in an actor pool (state loaded once per actor, per ray_guide.md).

    Exact DuckDB oracle since r04 (sql_lm_doc_scores — the full stupid-
    backoff LM relationally); the distributed path is additionally pinned
    to driver-side scoring by a unit test.
    Output (doc_id, n_tokens, logprob_milli, is_finite) — docs containing
    a below-threshold (<UNK>-trained) word score -inf exactly like the
    reference (ngram_lm.go:300-318), reported as is_finite=0 with a
    sentinel logprob. The SCORED Dataset is memoized per sf_dir (object-store
    blocks) so ccnet_buckets shares this scan instead of re-running it."""
    if sf_dir in _LM_SCORES_CACHE:
        return _LM_SCORES_CACHE[sf_dir]
    lm, _ = _lm_state(sf_dir)
    lm_ref = ray.put(lm)
    NEG_SENTINEL = -(2**62)

    class Scorer:
        def __init__(self):
            self.lm = ray.get(lm_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks, counts = tokenize_array(batch.column("text").to_pylist())
            off = np.concatenate([[0], np.cumsum(counts)])
            lps = np.array(
                [self.lm.query_log_prob(toks[off[i] : off[i + 1]].tolist()) for i in range(len(counts))],
                dtype=np.float64,
            )
            finite = np.isfinite(lps)
            milli = np.where(finite, np.rint(np.where(finite, lps, 0.0) * 1000), NEG_SENTINEL).astype(np.int64)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_tokens": pa.array(counts.astype(np.int64)),
                    "logprob_milli": pa.array(milli),
                    "is_finite": pa.array(finite.astype(np.int64)),
                }
            )

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    _LM_SCORES_CACHE.clear()  # hold ONE corpus at a time
    _LM_SCORES_CACHE[sf_dir] = ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=default_actor_pool()
    ).materialize()
    return _LM_SCORES_CACHE[sf_dir]


def _sql_lm_doc_scores() -> str:
    """Exact oracle for lm_doc_scores (r04): the full 4-gram stupid-backoff
    LM relationally — count tables + per-position backoff CASE + ordered
    ln-sum (state/lm.sql_lm_count_ctes / sql_lm_score_ctes). milli rounding
    half-to-even (numpy rint) vs half-away (SQL ROUND) differ only at exact
    .5 boundaries, unreachable from ln-sums."""
    from ..state.lm import LM_SENTINEL_NEG, sql_lm_count_ctes, sql_lm_score_ctes

    return f"""
WITH {sql_lm_count_ctes()},
{sql_lm_score_ctes("lm_toks", "doc_id")}
SELECT lt.doc_id,
       CAST(len(lt.t) AS BIGINT) AS n_tokens,
       CASE WHEN isfinite(lp.lp) THEN CAST(ROUND(lp.lp * 1000) AS BIGINT)
            ELSE {LM_SENTINEL_NEG} END AS logprob_milli,
       CAST(CASE WHEN isfinite(lp.lp) THEN 1 ELSE 0 END AS BIGINT) AS is_finite
FROM lm_toks lt JOIN lm_lp lp USING (doc_id)
"""


sql_lm_doc_scores = functools.cache(_sql_lm_doc_scores)


def _sql_autocomplete() -> str:
    """Exact oracle for autocomplete (r04): prefix matches over the FULL
    corpus vocabulary (the FST domain — lm_fvocab, threshold-free), each
    completed sequence scored by the relational stupid-backoff LM, top 3
    by lp DESC with the engine's stable-sort tie-break (prefix_matches
    iterates vocab_sorted, so equal-lp ties resolve lexicographically —
    tokens are ASCII [a-z0-9]+, binary collation == codepoint order)."""
    from ..state.lm import sql_lm_count_ctes, sql_lm_score_ctes

    q_rows = []
    for qid, text in AUTOCOMPLETE_PREFIXES:
        toks = tokenize(text)
        head = "CAST([" + ", ".join(f"'{t}'" for t in toks[:-1]) + "] AS VARCHAR[])"
        q_rows.append(f"({qid}, '{toks[-1]}', {head})")
    return f"""
WITH {sql_lm_count_ctes()},
ac_q(query_id, pre, head) AS (VALUES {", ".join(q_rows)}),
ac_seqs AS (
    SELECT q.query_id, v.tok, q.head || [v.tok] AS t
    FROM ac_q q JOIN lm_fvocab v ON starts_with(v.tok, q.pre)),
{sql_lm_score_ctes("ac_seqs", "query_id, tok")},
ac_ranked AS (
    SELECT query_id, tok AS completion,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY lp DESC, tok ASC) AS rank
    FROM lm_lp)
SELECT query_id, CAST(rank AS BIGINT) AS rank, completion
FROM ac_ranked WHERE rank <= 3
"""


sql_autocomplete = functools.cache(_sql_autocomplete)


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
    from .search import autocomplete_search

    _, sc = _lm_state(sf_dir)
    queries = pd.DataFrame(
        {"query_id": [q for q, _ in AUTOCOMPLETE_PREFIXES], "text": [p for _, p in AUTOCOMPLETE_PREFIXES]}
    )
    return autocomplete_search(sc, queries).to_pandas()


# ------------------------------------------------------------ phrase search

# Exact positional phrases (the retrieval class the term-presence scorers
# and boolean masks cannot express). Fixed query set, shared across scales
# like QUERIES/BOOL_QUERIES.
PHRASE_QUERIES: list[tuple[int, str]] = [
    (1, "spark group fast"),
    (2, "sort column"),
    (3, "value filter group"),
    (4, "stream merge"),
]


def phrase_start_mask(toks: np.ndarray, di: np.ndarray, words: list[str]):
    """Boolean mask over start positions: the L-1 shift matches plus the
    same-doc guard (a match must begin and end in one document). Returns
    None when the flat array is shorter than the phrase. Pure numpy — the
    kernel phrase_docs_search scans with and the property tests replay."""
    L = len(words)
    n = len(toks)
    if n < L:
        return None
    m = toks[: n - L + 1] == words[0]
    for k in range(1, L):
        m &= toks[k : n - L + 1 + k] == words[k]
    m &= di[: n - L + 1] == di[L - 1 :]
    return m


def phrase_docs_search(sf_dir: str):
    """Exact phrase retrieval as ONE streaming corpus scan — per batch the
    flat token array is compared against each phrase with L-1 vectorized
    shifts (no per-row loop); a match is a start position i where all L
    tokens equal the phrase AND position i and i+L-1 fall in the SAME
    document (the doc-index guard — phrases never match across doc
    boundaries). Overlapping occurrences each count (every start index),
    the same rule the SQL oracle's UNNEST(range) applies.

    The serving twin would intersect POSITIONAL postings from the index
    (position-adjacency join per term pair); this is the batch form, the
    shape a one-shot corpus filter takes on Ray Data.

    Output: (query_id, doc_id, n_hits) for every doc with ≥1 occurrence."""
    phrases = [(qid, tokenize(p)) for qid, p in PHRASE_QUERIES]
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        nd = len(doc_ids)
        toks, counts = tokenize_array(batch.column("text").to_pylist())
        di = np.repeat(np.arange(nd), counts)
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for qid, words in phrases:
            m = phrase_start_mask(toks, di, words)
            if m is None or not m.any():
                continue
            hits = np.bincount(di[: len(m)][m], minlength=nd)
            sel = np.flatnonzero(hits)
            out_q.append(np.full(len(sel), qid, np.int64))
            out_d.append(doc_ids[sel])
            out_n.append(hits[sel].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else [], pa.int64()),
                "n_hits": pa.array(np.concatenate(out_n) if out_n else [], pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def _sql_phrase() -> str:
    toks = SQL_TOKENIZE.format(col="text")
    arms = []
    for qid, p in PHRASE_QUERIES:
        words = tokenize(p)
        L = len(words)
        conds = " AND ".join(
            f"list_extract(toks, i + {k}) = '{w}'" for k, w in enumerate(words)
        )
        arms.append(
            f"""SELECT CAST({qid} AS BIGINT) AS query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM docs_tok, UNNEST(range(1, len(toks) - {L} + 2)) AS u(i)
    WHERE {conds} GROUP BY doc_id"""
        )
    union = "\n    UNION ALL ".join(arms)
    return f"""
WITH docs_tok AS (SELECT doc_id, {toks} AS toks FROM documents)
{union}
"""


SQL_PHRASE_DOCS_SEARCH = _sql_phrase()


# ------------------------------------------- positional store / phrase serving

_POS_STORE_CACHE: dict = {}
POS_BUCKETS = 32


def build_positional_store(path: str, out_dir: str) -> None:
    """POSITIONAL postings store: (term, doc_id, pos) rows bucketed by
    hash64_str(term) % POS_BUCKETS through the checkpointed resumable sink —
    the same build-once / partition-pruned-read discipline as the IVF and
    MinHash stores. The classic IR structure the presence-only text index
    (text_index.py) omits; phrase queries read ONLY their terms' buckets."""
    from ..functions.hashing import hash64_str
    from ..sources import checkpoint as cp

    docs = read_pq(path, columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        toks, counts = tokenize_array(batch.column("text").to_pylist())
        if len(toks) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        doc_rep = np.repeat(doc_ids, counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.arange(len(toks), dtype=np.int64) - offs
        bucket = (hash64_str(toks) % POS_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(toks.astype(object), pa.string()),
                "doc_id": pa.array(doc_rep),
                "pos": pa.array(pos),
                "bucket": pa.array(bucket),
            }
        )

    cp.checkpointed_write(docs.map_batches(explode, batch_format="pyarrow"), out_dir, "bucket", stage="pos_postings")
    cp.mark_stage_complete(out_dir, "pos_postings")


def _pos_store_dir(sf_dir: str) -> str:
    return _cached_store_dir(
        _POS_STORE_CACHE,
        "/tmp/osm_search_ray_pos_store",
        sf_dir,
        {"text": 0},
        "_STAGE_COMPLETE.json",
        build_positional_store,
    )


def phrase_store_search(sf_dir: str):
    """Phrase retrieval from the ON-DISK positional store — the serving
    twin of the scan form: the store is built once (resumable, bucketed),
    the query opens ONLY the partitions of its phrase terms, and matching
    is a positional ADJACENCY JOIN (doc_id, pos+k) per term — one bounded
    doc-keyed exchange over phrase-term occurrences only, never a corpus
    scan. Result-identical to phrase_docs_search (unit) and checked by the
    same SQL oracle."""
    return phrase_store_query(_pos_store_dir(sf_dir), PHRASE_QUERIES)


def phrase_store_query(store: str, phrase_queries):
    """The store-side kernel against an EXPLICIT store dir (the form
    jobs/build_pos_index.py serves); phrase_store_search binds it to the
    per-corpus cached store."""
    from ..functions.hashing import hash64_str
    from ..stages.joins import hash_partitioned_apply

    phrases = [(qid, tokenize(p)) for qid, p in phrase_queries]
    terms = sorted({w for _, ws in phrases for w in ws})
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64()),
        }
    )
    buckets = sorted(set((hash64_str(np.array(terms, dtype=object)) % POS_BUCKETS).astype(np.int64).tolist()))
    files = [f"{store}/part={b}/data.parquet" for b in buckets if os.path.exists(f"{store}/part={b}/data.parquet")]
    if not files:
        return empty
    postings = read_pq(files, columns=["term", "doc_id", "pos"])
    term_arr = pa.array(terms)

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("term"), value_set=term_arr))

    pruned = postings.map_batches(prune, batch_format="pyarrow")

    def match(df: pd.DataFrame) -> pd.DataFrame:
        by_term = {t: g[["doc_id", "pos"]] for t, g in df.groupby("term", sort=False)}
        out = []
        for qid, words in phrases:
            m = by_term.get(words[0])
            if m is None:
                continue
            for k, w in enumerate(words[1:], start=1):
                g = by_term.get(w)
                if g is None:
                    m = None
                    break
                g = g.assign(pos=g["pos"] - k)
                m = m.merge(g, on=["doc_id", "pos"], how="inner")
            if m is None or not len(m):
                continue
            hits = m.groupby("doc_id", sort=False).size()
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(hits), qid, np.int64),
                        "doc_id": hits.index.to_numpy(np.int64),
                        "n_hits": hits.to_numpy(np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype=np.int64),
                    "doc_id": pd.Series(dtype=np.int64),
                    "n_hits": pd.Series(dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    # doc-keyed partitions are disjoint, so per-partition matches ARE the
    # final rows — no second aggregation pass
    return hash_partitioned_apply(pruned, "doc_id", match, num_parts=16)


# ------------------------------------------------------- proximity (NEAR) search

# (query_id, term_a, term_b, window) — unordered proximity: how many
# position pairs (pa, pb) with |pa - pb| <= window land in the same doc.
# The NEAR operator the reference's AND-only boolean searcher
# (/root/reference/pkg/searcher/searcher.go:664-670) never grew.
NEAR_QUERIES: list[tuple[int, str, str, int]] = [
    (1, "spark", "window", 3),
    (2, "sort", "merge", 2),
    (3, "customer", "data", 4),
    (4, "query", "slow", 5),
]


def near_docs_search(sf_dir: str):
    """Proximity retrieval from the ON-DISK positional store: for each
    (term_a, term_b, w) query, every doc where the terms co-occur within w
    token positions, with the exact pair count. Opens ONLY the two terms'
    store buckets (partition-pruned read), ONE doc-keyed exchange over the
    terms' occurrences — never a corpus scan; the per-partition kernel is
    two searchsorted calls on (doc<<32 | pos) keys (windows cannot cross
    docs: w << 2^32). Output (query_id, doc_id, n_pairs)."""
    return near_store_query(_pos_store_dir(sf_dir), NEAR_QUERIES)


def near_store_query(store: str, near_queries):
    from ..functions.hashing import hash64_str
    from ..stages.joins import hash_partitioned_apply

    terms = sorted({t for _, a, b, _ in near_queries for t in (a, b)})
    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype=np.int64),
            "doc_id": pd.Series(dtype=np.int64),
            "n_pairs": pd.Series(dtype=np.int64),
        }
    )
    buckets = sorted(
        set((hash64_str(np.array(terms, dtype=object)) % POS_BUCKETS).astype(np.int64).tolist())
    )
    files = [f"{store}/part={b}/data.parquet" for b in buckets if os.path.exists(f"{store}/part={b}/data.parquet")]
    if not files:
        return ray.data.from_pandas(empty)
    postings = read_pq(files, columns=["term", "doc_id", "pos"])
    term_arr = pa.array(terms)

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("term"), value_set=term_arr))

    pruned = postings.map_batches(prune, batch_format="pyarrow")
    K = np.int64(1) << 32

    def match(df: pd.DataFrame) -> pd.DataFrame:
        by_term = {t: g for t, g in df.groupby("term", sort=False)}
        out = []
        for qid, ta, tb, w in near_queries:
            ga, gb = by_term.get(ta), by_term.get(tb)
            if ga is None or gb is None:
                continue
            ka = ga["doc_id"].to_numpy(np.int64) * K + ga["pos"].to_numpy(np.int64)
            kb = np.sort(gb["doc_id"].to_numpy(np.int64) * K + gb["pos"].to_numpy(np.int64))
            cnt = np.searchsorted(kb, ka + w, side="right") - np.searchsorted(
                kb, ka - w, side="left"
            )
            m = cnt > 0
            if not m.any():
                continue
            hits = (
                pd.DataFrame({"doc_id": ga["doc_id"].to_numpy(np.int64)[m], "c": cnt[m]})
                .groupby("doc_id", sort=False)["c"]
                .sum()
            )
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(hits), qid, np.int64),
                        "doc_id": hits.index.to_numpy(np.int64),
                        "n_pairs": hits.to_numpy(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    # doc-keyed partitions are disjoint — per-partition counts are final
    return hash_partitioned_apply(pruned, "doc_id", match)


def _sql_near() -> str:
    toks = SQL_TOKENIZE.format(col="text")
    arms = []
    for qid, ta, tb, w in NEAR_QUERIES:
        arms.append(
            f"""SELECT CAST({qid} AS BIGINT) AS query_id, a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pos a JOIN pos b
      ON a.doc_id = b.doc_id AND b.i BETWEEN a.i - {w} AND a.i + {w}
    WHERE a.w = '{ta}' AND b.w = '{tb}'
    GROUP BY a.doc_id"""
        )
    union = "\n    UNION ALL ".join(arms)
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
pos AS (SELECT doc_id, unnest(t) AS w,
               generate_subscripts(t, 1) AS i FROM toks)
{union}
"""


SQL_NEAR_DOCS_SEARCH = _sql_near()
