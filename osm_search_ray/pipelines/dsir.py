"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

Hashed-n-gram importance weights: unigram+bigram features hashed into
``DSIR_B`` buckets; two bag-of-hashed-ngrams models are fit in ONE
streaming pass — the target distribution p from the target slice
(``lang == DSIR_TARGET_LANG``) and the source distribution q from the
whole corpus — then a second stateless pass scores every document with
``log w(d) = sum_b c_d[b] * (ln p[b] - ln q[b])`` (add-one smoothing,
exactly the paper's estimator).  The top-``DSIR_TOPK`` docs by weight are
the selected training subset.

Scale (100 TB): pass 1 ships only per-batch bucket-count partials
(<= B rows per block) into one bounded groupby-sum; the B-float
log-ratio vector is a closure constant in pass 2 (8 KB — nothing
corpus-sized leaves the cluster); top-k is a per-batch combiner, so
O(blocks x k) rows reach the driver.  No full-corpus shuffle anywhere.

Float discipline (CLAUDE.md oracle-float-strategy): every float op is
op-for-op identical between numpy and DuckDB — smoothing ratios are one
IEEE division, ln is the same libm call on both sides, and the per-doc
fold accumulates LEFT-ASSOCIATIVELY over ALL B buckets in ascending
bucket order (zero-count terms contribute exact IEEE zeros), mirrored in
SQL by ``list_reduce(LIST(term ORDER BY b), (x, y) -> x + y)`` — the
dedup_embedding ordered-float discipline.  Ranks then tie-break on
doc_id over bit-identical doubles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ..sources.readers import read_pq
from ray.data.aggregate import Sum

from ..functions.hashing import hash64_md5, splitmix64

DSIR_B = 1024  # hashed feature buckets
DSIR_TOPK = 100  # selected subset size
DSIR_TARGET_LANG = "en"  # deterministic target slice
_P64 = 1 << 64


def _gram_buckets(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(gram_doc_index, bucket) for every unigram+bigram occurrence in the
    batch — md5 hashed once per UNIQUE gram (factorize), splitmix64-mixed,
    mod B.  Bigrams never cross a document boundary."""
    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    n_per = np.diff(offsets)
    vals = words.values
    ntok = len(vals)
    doc_tok = np.repeat(np.arange(len(n_per)), n_per)
    j_within = np.arange(ntok, dtype=np.int64) - np.repeat(offsets[:-1], n_per)
    uni = vals.to_pandas()
    if ntok > 1:
        bi_all = pc.binary_join_element_wise(
            vals.slice(0, ntok - 1), vals.slice(1, ntok - 1), " "
        )
        # token j starts a bigram iff j is not its doc's last token
        bi_mask = (j_within < np.repeat(n_per, n_per) - 1)[: ntok - 1]
        bi = bi_all.to_pandas()[bi_mask]
        grams = pd.concat([uni, bi], ignore_index=True)
        gram_doc = np.concatenate([doc_tok, doc_tok[: ntok - 1][bi_mask]])
    else:
        grams, gram_doc = uni, doc_tok
    codes, uniq = pd.factorize(grams)
    bucket = (splitmix64(hash64_md5(list(uniq))) % np.uint64(DSIR_B)).astype(np.int64)[
        codes
    ]
    return gram_doc, bucket


def _fit_log_ratios(sf_dir: str) -> np.ndarray:
    """ONE streaming pass -> lam[b] = ln(p[b]) - ln(q[b]) with add-one
    smoothing; per-batch bincount partials, one bounded B-row exchange."""
    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        gram_doc, bucket = _gram_buckets(batch)
        is_target = (
            pc.equal(batch.column("lang"), DSIR_TARGET_LANG)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        n_s = np.bincount(bucket, minlength=DSIR_B)
        n_t = np.bincount(bucket[is_target[gram_doc]], minlength=DSIR_B)
        return pa.table(
            {
                "b": pa.array(np.arange(DSIR_B, dtype=np.int64)),
                "n_t": pa.array(n_t.astype(np.int64)),
                "n_s": pa.array(n_s.astype(np.int64)),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n_t", alias_name="n_t"), Sum("n_s", alias_name="n_s"))
        .to_pandas()  # bounded: exactly B rows
    )
    n_t = np.zeros(DSIR_B, np.int64)
    n_s = np.zeros(DSIR_B, np.int64)
    n_t[counts["b"].to_numpy()] = counts["n_t"].to_numpy()
    n_s[counts["b"].to_numpy()] = counts["n_s"].to_numpy()
    tot_t, tot_s = int(n_t.sum()), int(n_s.sum())
    # scalar libm log per bucket (B is tiny) — the same call DuckDB's ln
    # makes, so lam is bit-identical to the SQL side
    lam = np.array(
        [
            math.log((int(n_t[b]) + 1) / (tot_t + DSIR_B))
            - math.log((int(n_s[b]) + 1) / (tot_s + DSIR_B))
            for b in range(DSIR_B)
        ],
        dtype=np.float64,
    )
    return lam


def dsir_weights_ds(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, logw) for every document — the stateless scoring pass."""
    lam = _fit_log_ratios(sf_dir)
    docs = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def score(batch: pa.Table) -> pa.Table:
        gram_doc, bucket = _gram_buckets(batch)
        ndocs = batch.num_rows
        c = np.zeros((ndocs, DSIR_B), np.float64)
        np.add.at(c, (gram_doc, bucket), 1.0)
        # left-associative fold over ALL buckets in ascending order — the
        # order list_reduce(LIST(term ORDER BY b)) evaluates
        acc = c[:, 0] * lam[0]
        for b in range(1, DSIR_B):
            acc = acc + c[:, b] * lam[b]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "logw": pa.array(acc)}
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_select(sf_dir: str, k: int = DSIR_TOPK) -> pd.DataFrame:
    """Driver query: top-k selected docs by importance weight,
    (doc_id, logw, rank); ties on bit-identical doubles break by doc_id.
    Per-batch top-k combiner -> O(blocks x k) rows at the driver."""
    weights = dsir_weights_ds(sf_dir)

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["logw", "doc_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    parts = weights.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["logw", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)[["doc_id", "logw", "rank"]]


# --------------------------------------------------------------- SQL oracle


def sql_dsir_select(k: int = DSIR_TOPK) -> str:
    from ..sources.derived import sql_splitmix64_chain

    sm = sql_splitmix64_chain("gh", ["doc_id", "lang"], "v", "smb")
    return f"""
WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
toks AS (SELECT doc_id, lang, unnest(words) AS tok,
                unnest(range(1, len(words) + 1)) AS i FROM ws),
uni AS (SELECT doc_id, lang, tok AS gram FROM toks),
bi AS (SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS gram
       FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
gh AS (SELECT doc_id, lang,
              CAST(CAST('0x' || substr(md5(gram), 1, 16) AS UBIGINT) AS HUGEINT) AS v
       FROM grams),
{sm},
gb AS MATERIALIZED (SELECT doc_id, lang, CAST(x % {DSIR_B} AS BIGINT) AS b FROM smb),
cnt AS (SELECT b, COUNT(*) AS ns,
               COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS nt
        FROM gb GROUP BY 1),
tot AS (SELECT COUNT(*) AS tot_s,
               COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS tot_t
        FROM gb),
lam AS (SELECT r.range AS b,
               ln((COALESCE(c.nt, 0) + 1)::DOUBLE / (t.tot_t + {DSIR_B})::DOUBLE)
             - ln((COALESCE(c.ns, 0) + 1)::DOUBLE / (t.tot_s + {DSIR_B})::DOUBLE) AS lam
        FROM range(0, {DSIR_B}) r LEFT JOIN cnt c ON c.b = r.range CROSS JOIN tot t),
dc AS (SELECT doc_id, b, COUNT(*) AS c FROM gb GROUP BY 1, 2),
dense AS (SELECT d.doc_id, l.b, COALESCE(c.c, 0)::DOUBLE * l.lam AS term
          FROM (SELECT DISTINCT doc_id FROM documents) d
          CROSS JOIN lam l
          LEFT JOIN dc c ON c.doc_id = d.doc_id AND c.b = l.b),
score AS (SELECT doc_id,
                 list_reduce(LIST(term ORDER BY b), (x, y) -> x + y) AS logw
          FROM dense GROUP BY 1),
ranked AS (SELECT doc_id, logw,
                  ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id) AS rank
           FROM score)
SELECT doc_id, logw, rank FROM ranked WHERE rank <= {k}
"""
