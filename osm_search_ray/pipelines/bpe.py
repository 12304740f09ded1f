"""BPE tokenizer TRAINING over the corpus — the learned-merges counterpart
of the fixed-regex ``token_counts_bpe`` (textops.py).

The classic trainer (Sennrich et al. 2016; the shape HF/SentencePiece use)
never iterates the raw corpus: it trains on the word-FREQUENCY table, which
is vocabulary-bounded regardless of corpus bytes. The engine mirrors that:

  1. ``word_freqs`` — ONE distributed pass over ``documents`` (per-batch
     ``np.unique`` combiner partials → ``groupby(word).sum``), the same
     bounded-artifact contract as the term dictionary (text_index.py M9).
  2. merge loop over the word table — driver regime when the vocab fits
     ``DRIVER_VOCAB_LIMIT`` (real web corpora hold ~10^7 distinct words;
     the table is KBs/word-row, not corpus-sized), else the distributed
     regime ``train_merges_ds``: the segmentation table stays a Dataset and
     each merge round is one streaming pair-count pass (per-block integer
     partials, order-free driver reduce) plus one merge-apply pass.
  3. ``bpe_tokenize`` — apply the learned merges per DISTINCT word (the
     word→n_symbols map), then one stateless pass over ``documents`` sums
     symbol counts per doc (broadcast dict in the driver regime; a
     hash_bucket_join against the segmentation Dataset past the limit).

Every quantity is an integer or a token string, so BOTH queries carry
exact DuckDB oracles: an UNROLLED ``N_MERGES``-stage CTE chain where each
stage computes pair counts (UNNEST over adjacent positions), elects the
best pair with the same (count DESC, left ASC, right ASC) tie-break
(tokens are [a-z0-9]+, so Python tuple order == DuckDB binary collation),
and applies the merge with a ``list_reduce`` left fold — the fold is
exhaustive in one pass because the merged symbol ``l+r`` can never equal
``l`` (``r`` is non-empty), so a merge cannot create a new (l, r)
adjacency to its left.

Determinism/stop contract: ranks start at 1; training stops when no pair
reaches ``MIN_PAIR_COUNT``. The SQL chain no-ops every stage after the
first dry one (empty best{i} ⇒ seg{i} = seg{i-1} ⇒ best{i+1} empty), so a
fixed-depth chain equals the early-stopping loop exactly.

Reference parity note: the reference engine has no tokenizer training
(its tokenizer is sastrawi's fixed splitter, pkg/index/indexer.go:804);
this is a beyond-reference training-data operator (charter text-analysis
family).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ..sources.readers import read_pq
import ray.data
from ray.data.aggregate import Sum

from ..functions.tokenize import SQL_TOKENIZE, tokenize_array

N_MERGES = 24
MIN_PAIR_COUNT = 2
DRIVER_VOCAB_LIMIT = 200_000
SEP = "\x01"  # never occurs in [a-z0-9]+ tokens


def word_freqs(sf_dir: str) -> "ray.data.Dataset":
    """(word, cnt) corpus token frequencies — combiner partials, one shuffle."""
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks, _ = tokenize_array(batch.column("text").to_pylist())
        if len(toks) == 0:
            return pa.table({"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        w, c = np.unique(toks, return_counts=True)
        return pa.table({"word": pa.array(w.astype(object), pa.string()), "cnt": pa.array(c.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow").groupby("word").aggregate(Sum("cnt", alias_name="cnt"))


def merge_syms(syms: list[str], l: str, r: str) -> list[str]:
    """One exhaustive left-to-right merge pass (the fold the SQL oracle
    replays via list_reduce). Overlaps resolve greedily left-first:
    ['a','a','a'] with (a,a) → ['aa','a']."""
    out = [syms[0]]
    for e in syms[1:]:
        if out[-1] == l and e == r:
            out[-1] = out[-1] + e
        else:
            out.append(e)
    return out


def _empty_merges() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "merge_rank": pd.Series(dtype=np.int64),
            "left_sym": pd.Series(dtype=object),
            "right_sym": pd.Series(dtype=object),
            "pair_count": pd.Series(dtype=np.int64),
        }
    )


def train_merges(
    words: list[str], cnts, n_merges: int = N_MERGES, min_count: int = MIN_PAIR_COUNT
) -> tuple[pd.DataFrame, dict[str, int]]:
    """Driver-regime merge loop over the (word, cnt) table.

    Returns (merge table, {word: n_symbols after all merges}). Result is
    independent of input row order: pair counts are integer sums and the
    argmax tie-break is total ((count DESC, left ASC, right ASC))."""
    segs = [list(w) for w in words]
    cnts = [int(c) for c in cnts]
    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    pcs: list[int] = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in zip(segs, cnts):
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + c
        cands = [(-v, k[0], k[1]) for k, v in pc.items() if v >= min_count]
        if not cands:
            break
        nv, l, r = min(cands)
        ranks.append(rank)
        lefts.append(l)
        rights.append(r)
        pcs.append(-nv)
        segs = [merge_syms(s, l, r) if len(s) > 1 else s for s in segs]
    merges = pd.DataFrame(
        {
            "merge_rank": np.asarray(ranks, dtype=np.int64),
            "left_sym": np.asarray(lefts, dtype=object),
            "right_sym": np.asarray(rights, dtype=object),
            "pair_count": np.asarray(pcs, dtype=np.int64),
        }
    )
    if not len(merges):
        merges = _empty_merges()
    return merges, {w: len(s) for w, s in zip(words, segs)}


def train_merges_ds(
    wf: "ray.data.Dataset", n_merges: int = N_MERGES, min_count: int = MIN_PAIR_COUNT
) -> tuple[pd.DataFrame, "ray.data.Dataset"]:
    """Distributed regime: the segmentation table never leaves the cluster.

    Per round: one streaming pass emits per-block pair-count partials
    (bounded by the block's distinct adjacent pairs — vocab-scale, not
    corpus-scale), the driver reduces integers and elects the pair, and one
    map pass applies the merge. The table is materialized between rounds —
    a VOCAB-bounded artifact (the same bound word_freqs already carries),
    not the corpus. Returns (merge table, Dataset(word, cnt, n_syms))."""

    def to_seg(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        return pa.table(
            {
                "word": batch.column("word"),
                "cnt": batch.column("cnt"),
                "seg": pa.array([SEP.join(w) for w in words], pa.string()),
            }
        )

    seg_ds = wf.map_batches(to_seg, batch_format="pyarrow").materialize()
    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    pcs: list[int] = []
    for rank in range(1, n_merges + 1):

        def pair_partial(batch: pa.Table) -> pa.Table:
            pc: dict[tuple[str, str], int] = {}
            for s, c in zip(batch.column("seg").to_pylist(), batch.column("cnt").to_pylist()):
                syms = s.split(SEP)
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    pc[k] = pc.get(k, 0) + c
            ls, rs, vs = [], [], []
            for (pl, pr), v in pc.items():
                ls.append(pl)
                rs.append(pr)
                vs.append(v)
            return pa.table(
                {"l": pa.array(ls, pa.string()), "r": pa.array(rs, pa.string()), "pc": pa.array(vs, pa.int64())}
            )

        parts = seg_ds.map_batches(pair_partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        tot = parts.groupby(["l", "r"], sort=False)["pc"].sum().reset_index()
        tot = tot[tot["pc"] >= min_count]
        if not len(tot):
            break
        best = tot.sort_values(["pc", "l", "r"], ascending=[False, True, True], kind="mergesort").iloc[0]
        l, r, v = str(best["l"]), str(best["r"]), int(best["pc"])
        ranks.append(rank)
        lefts.append(l)
        rights.append(r)
        pcs.append(v)

        def apply(batch: pa.Table, l=l, r=r) -> pa.Table:
            segs = [SEP.join(merge_syms(s.split(SEP), l, r)) for s in batch.column("seg").to_pylist()]
            return batch.set_column(batch.column_names.index("seg"), "seg", pa.array(segs, pa.string()))

        seg_ds = seg_ds.map_batches(apply, batch_format="pyarrow").materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        ns = np.asarray([s.count(SEP) + 1 for s in batch.column("seg").to_pylist()], dtype=np.int64)
        return pa.table({"word": batch.column("word"), "cnt": batch.column("cnt"), "n_syms": pa.array(ns)})

    merges = pd.DataFrame(
        {
            "merge_rank": np.asarray(ranks, dtype=np.int64),
            "left_sym": np.asarray(lefts, dtype=object),
            "right_sym": np.asarray(rights, dtype=object),
            "pair_count": np.asarray(pcs, dtype=np.int64),
        }
    )
    if not len(merges):
        merges = _empty_merges()
    return merges, seg_ds.map_batches(finalize, batch_format="pyarrow")


def _learn(sf_dir: str, n_merges: int = N_MERGES):
    """Regime switch on vocab size. Returns (merges, word→n_syms dict) in
    the driver regime or (merges, Dataset(word, cnt, n_syms)) past it."""
    # materialize the VOCAB-bounded table once: count() is then metadata and
    # the regime branch reuses the same blocks instead of re-running the pass
    wf = word_freqs(sf_dir).materialize()
    if wf.count() <= DRIVER_VOCAB_LIMIT:
        df = wf.to_pandas().sort_values("word", kind="mergesort")
        return train_merges(df["word"].tolist(), df["cnt"].to_numpy(), n_merges)
    return train_merges_ds(wf, n_merges)


def bpe_train(sf_dir: str) -> pd.DataFrame:
    """(merge_rank, left_sym, right_sym, pair_count) — the learned merge
    table, rank-ordered. Output is merges-sized (≤ N_MERGES rows)."""
    merges, _ = _learn(sf_dir)
    return merges


def bpe_tokenize(sf_dir: str):
    """(doc_id, n_tokens_bpe) — token count per document under the LEARNED
    merges (symbols remaining after applying all merges in rank order to
    each word). Zero-token docs report 0."""
    learned = _learn(sf_dir)
    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    if isinstance(learned[1], dict):
        wlen_ref = ray.put(learned[1])

        def fn(batch: pa.Table) -> pa.Table:
            wlen = ray.get(wlen_ref)
            toks, counts = tokenize_array(batch.column("text").to_pylist())
            vals = np.fromiter((wlen[t] for t in toks), dtype=np.int64, count=len(toks))
            idx = np.repeat(np.arange(len(counts)), counts)
            sums = np.bincount(idx, weights=vals, minlength=len(counts)).astype(np.int64)
            return pa.table({"doc_id": batch.column("doc_id"), "n_tokens_bpe": pa.array(sums)})

        return docs.map_batches(fn, batch_format="pyarrow")

    # Distributed regime: explode doc tokens, hash-join against the
    # segmentation Dataset on word, sum per doc — no driver-resident vocab.
    from ..stages.joins import hash_bucket_join

    def explode(batch: pa.Table) -> pa.Table:
        toks, counts = tokenize_array(batch.column("text").to_pylist())
        doc_rep = np.repeat(batch.column("doc_id").to_numpy(), counts)
        return pa.table({"doc_id": pa.array(doc_rep), "word": pa.array(toks.astype(object), pa.string())})

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    wlen_ds = learned[1].drop_columns(["cnt"])
    joined = hash_bucket_join(pairs, wlen_ds, "word")
    per_doc = joined.groupby("doc_id").aggregate(Sum("n_syms", alias_name="n_tokens_bpe"))

    # Docs with zero tokens vanish in the explode; restore them with 0 via a
    # second hash_bucket_join (left) against the doc-id spine — no
    # driver-resident per-doc state at any corpus size.
    def fill_zero(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens_bpe": pc.fill_null(
                    batch.column("n_tokens_bpe").cast(pa.int64()), 0
                ),
            }
        )

    filled = hash_bucket_join(docs.drop_columns(["text"]), per_doc, "doc_id", how="left")
    return filled.map_batches(fill_zero, batch_format="pyarrow")


def _sql_bpe_chain(n_merges: int = N_MERGES) -> str:
    """The shared CTE prefix: words → seg0 → (pairs{i}, best{i}, seg{i})*."""
    tok = SQL_TOKENIZE.format(col="text")
    parts = [
        f"""docs_tok AS MATERIALIZED (SELECT doc_id, {tok} AS toks FROM documents),
words AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT UNNEST(toks) AS tok FROM docs_tok) GROUP BY tok),
seg0 AS MATERIALIZED (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM words)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(
            f"""pairs{i} AS MATERIALIZED (SELECT list_extract(syms, j) AS l, list_extract(syms, j + 1) AS r,
                 CAST(SUM(cnt) AS BIGINT) AS pc
          FROM seg{p}, UNNEST(range(1, len(syms))) AS u{i}(j) GROUP BY 1, 2),
best{i} AS MATERIALIZED (SELECT l, r, pc FROM pairs{i} WHERE pc >= {MIN_PAIR_COUNT}
          ORDER BY pc DESC, l, r LIMIT 1),
seg{i} AS MATERIALIZED (SELECT word, cnt,
            CASE WHEN b.l IS NULL THEN syms
                 ELSE string_split(list_reduce(syms, (acc, e) -> CASE
                        WHEN list_extract(string_split(acc, chr(1)), -1) = b.l AND e = b.r
                        THEN acc || e ELSE acc || chr(1) || e END), chr(1))
            END AS syms
          FROM seg{p} LEFT JOIN best{i} b ON TRUE)"""
        )
    return "WITH " + ",\n".join(parts)


def _sql_bpe_train() -> str:
    n = N_MERGES
    unions = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, l AS left_sym, r AS right_sym, pc AS pair_count FROM best{i}"
        for i in range(1, n + 1)
    )
    return f"{_sql_bpe_chain(n)}\nSELECT * FROM ({unions}) ORDER BY merge_rank"


def _sql_bpe_tokenize() -> str:
    n = N_MERGES
    return f"""{_sql_bpe_chain(n)},
wlen AS (SELECT word, CAST(len(syms) AS BIGINT) AS ns FROM seg{n}),
exploded AS (SELECT doc_id, UNNEST(toks) AS tok FROM docs_tok),
per_doc AS (SELECT doc_id, SUM(w.ns) AS s FROM exploded e JOIN wlen w ON e.tok = w.word GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(p.s, 0) AS BIGINT) AS n_tokens_bpe
FROM docs_tok d LEFT JOIN per_doc p USING (doc_id)"""


sql_bpe_train = functools.cache(_sql_bpe_train)
sql_bpe_tokenize = functools.cache(_sql_bpe_tokenize)
