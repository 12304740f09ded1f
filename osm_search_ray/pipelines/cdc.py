"""Content-defined chunking (CDC) over the documents corpus.

LBFS/FastCDC-style chunking at token granularity: a chunk boundary is
declared wherever a rolling window hash of the last ``CDC_W`` tokens
satisfies ``splitmix64(poly) % CDC_D == 0``, subject to ``CDC_MIN`` /
``CDC_MAX`` chunk-length clamps (a cut is forced at ``CDC_MAX`` when no
candidate lands in the legal range).  Because boundaries depend only on
local content, an insertion or deletion early in a re-crawled page shifts
at most one chunk — the remainder of the chunking realigns at the next
content-defined cut (tests/test_cdc.py pins this locality property), which
is what makes CDC the right unit for dedup of shifted/boilerplate-injected
web text where fixed-width chunking (webcorpus.explode_chunks) loses every
downstream chunk.

Beyond-reference operator (the reference engine has no CDC counterpart);
the boundary predicate reuses the repo's SQL-twinned primitives —
hash64_md5 per token and the splitmix64 finalizer (sources/derived.py) —
so the full chunking, including the stateful min/max walk, has an exact
DuckDB oracle: a window-frame ``MIN(candidate) OVER (RANGE BETWEEN min
FOLLOWING AND max FOLLOWING)`` next-boundary table plus a recursive-CTE
walk over it (MATERIALIZED, else DuckDB re-evaluates the hash chain per
recursion level — 16.5 s -> 0.6 s at sf0.01).

Scale (100 TB): ``cdc_chunks`` is map-only — no shuffle at all; per-batch
work is vectorized Arrow/numpy (split_pattern, factorized md5 over unique
tokens, shifted-add polynomial, one ListArray slice + binary_join for the
chunk texts); the only Python loop is the boundary walk, O(output chunks)
with numpy searchsorted per step.  ``cdc_dedup`` adds ONE exchange keyed
by the int64 content hash (VERDICT r03 exchange-bytes discipline: the
chunk string travels once, pre-deduped per (hash, doc) per batch, as the
output payload).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ..sources.readers import read_pq

from ..functions.hashing import hash64_md5, splitmix64
from ..sources.derived import sql_splitmix64_chain
from ..stages.joins import hash_partitioned_apply

CDC_W = 3  # boundary window (tokens)
CDC_D = 8  # boundary probability 1/D -> expected chunk ~ CDC_MIN + CDC_D
CDC_MIN = 5  # min chunk length (tokens); final chunk of a doc may be shorter
CDC_MAX = 40  # max chunk length — forced cut when no candidate in range
CDC_P = 257  # polynomial base for the window hash
_P64 = 1 << 64


def chunk_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, chunk_id, start_tok, end_tok, n_toks,
    chunk_text): content-defined chunks, tokens split on single spaces
    (same contract as webcorpus._SQL_CHUNKS)."""
    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    n_per = np.diff(offsets)
    ndocs = len(n_per)
    vals = words.values
    # token hashes: md5 once per UNIQUE token (vocab << token count)
    codes, uniq = pd.factorize(vals.to_pandas())
    h = hash64_md5(list(uniq))[codes]
    # window polynomial v[j] = sum_{o<W} h[j-o] * P^o (mod 2^64) — shifted
    # adds, no per-token loop; cross-doc contamination at the first W-1
    # positions of each doc is masked below (those can't be candidates).
    v = np.zeros(len(h), np.uint64)
    with np.errstate(over="ignore"):
        for o in range(CDC_W):
            term = h * np.uint64(pow(CDC_P, o, _P64))
            if o:
                v[o:] += term[:-o]
            else:
                v += term
    x = splitmix64(v)
    j_within = np.arange(len(h), dtype=np.int64) - np.repeat(offsets[:-1], n_per)
    cand_mask = (j_within >= CDC_W - 1) & (x % np.uint64(CDC_D) == 0)
    cand_pos = j_within[cand_mask] + 1  # 1-indexed boundary-after-token pos
    cand_doc = np.repeat(np.arange(ndocs), n_per)[cand_mask]
    cand_splits = np.searchsorted(cand_doc, np.arange(ndocs + 1))
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)

    out_doc: list[int] = []
    out_k: list[int] = []
    out_s: list[int] = []
    out_e: list[int] = []
    chunk_offsets = [0]
    for d in range(ndocs):
        n = int(n_per[d])
        cs = cand_pos[cand_splits[d] : cand_splits[d + 1]]
        pos, k = 0, 0
        while pos < n:
            j = np.searchsorted(cs, pos + CDC_MIN)
            if j < len(cs) and cs[j] <= pos + CDC_MAX:
                nxt = int(cs[j])
            else:
                nxt = pos + CDC_MAX
            nxt = min(nxt, n)
            out_doc.append(int(doc_ids[d]))
            out_k.append(k)
            out_s.append(pos)
            out_e.append(nxt)
            chunk_offsets.append(int(offsets[d]) + nxt)
            pos, k = nxt, k + 1
    # chunks tile the token values exactly -> one monotonic offsets array
    off = np.asarray(chunk_offsets, dtype=np.int64)
    if pa.types.is_large_list(words.type):
        clist = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), vals)
    else:
        clist = pa.ListArray.from_arrays(pa.array(off.astype(np.int32), pa.int32()), vals)
    s = np.asarray(out_s, np.int64)
    e = np.asarray(out_e, np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(out_doc, np.int64)),
            "chunk_id": pa.array(np.asarray(out_k, np.int64)),
            "start_tok": pa.array(s),
            "end_tok": pa.array(e),
            "n_toks": pa.array(e - s),
            "chunk_text": pc.binary_join(clist, " "),
        }
    )


def cdc_chunks_ds(sf_dir: str) -> "ray.data.Dataset":
    docs = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(chunk_batch, batch_format="pyarrow")


def cdc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Driver query: the full per-chunk table."""
    return cdc_chunks_ds(sf_dir)


def cdc_dedup(sf_dir: str, min_docs: int = 2) -> "ray.data.Dataset":
    """Chunk contents shared by >= min_docs distinct documents:
    (chunk_text, n_docs, n_occ).  One int64-hash-keyed exchange; the chunk
    string is pre-deduped to one copy per (hash, doc, batch) before the
    shuffle and is the output payload.  Group identity is the 64-bit md5
    prefix of the text (2^-64 collision bound, the same bound
    ngram_jaccard_pairs_ds accepts)."""
    chunks = cdc_chunks_ds(sf_dir)

    def combiner(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "chunk_text"]).to_pandas()
        df["chash"] = hash64_md5(df["chunk_text"].to_numpy()).view(np.int64)
        g = (
            df.groupby(["chash", "doc_id"], sort=False)
            .agg(n_occ=("chunk_text", "size"), chunk_text=("chunk_text", "first"))
            .reset_index()
        )
        g["n_occ"] = g["n_occ"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("chash", sort=False)
        out = pd.DataFrame(
            {
                "chunk_text": g["chunk_text"].first(),
                "n_docs": g["doc_id"].nunique().astype(np.int64),
                "n_occ": g["n_occ"].sum().astype(np.int64),
            }
        ).reset_index(drop=True)
        return out[out["n_docs"] >= min_docs]

    return hash_partitioned_apply(
        chunks.map_batches(combiner, batch_format="pyarrow"),
        "chash",
        reduce_group,
        num_parts=32,
    )


# --------------------------------------------------------------- SQL oracle


def _sql_bounds_ctes() -> str:
    """Shared CTE chain ending in ``chunks(doc_id, chunk_id, start_tok,
    end_tok, n_toks, chunk_text)`` — the exact CDC walk in SQL."""
    mulmod = (
        f"((h2.h % 4294967296) * pw.p % {_P64} + "
        f"((h2.h // 4294967296) * (pw.p % 4294967296)) % 4294967296 * 4294967296) % {_P64}"
    )
    pow_rows = ", ".join(f"({o}, {pow(CDC_P, o, _P64)}::HUGEINT)" for o in range(CDC_W))
    sm = sql_splitmix64_chain("wsum", ["doc_id", "i"], "v", "sm")
    return f"""
ws AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
dl AS MATERIALIZED (SELECT doc_id, words, len(words) AS n FROM ws),
toks AS (SELECT doc_id, unnest(words) AS tok, unnest(range(1, len(words)+1)) AS i FROM ws),
th AS (SELECT doc_id, i, CAST(CAST('0x' || substr(md5(tok),1,16) AS UBIGINT) AS HUGEINT) AS h FROM toks),
pw(o, p) AS (VALUES {pow_rows}),
wsum AS (
    SELECT t.doc_id, t.i, SUM({mulmod}) % {_P64} AS v
    FROM toks t JOIN pw ON TRUE
    JOIN th h2 ON h2.doc_id = t.doc_id AND h2.i = t.i - pw.o
    WHERE t.i >= {CDC_W}
    GROUP BY 1, 2),
{sm},
cands AS MATERIALIZED (SELECT doc_id, i AS pos FROM sm WHERE x % {CDC_D} = 0),
ptab AS (SELECT doc_id, unnest(range(0, n + 1)) AS pos FROM dl),
pcand AS (SELECT p.doc_id, p.pos, c.pos AS cval
          FROM ptab p LEFT JOIN cands c ON c.doc_id = p.doc_id AND c.pos = p.pos),
nxtw AS (SELECT doc_id, pos,
         MIN(cval) OVER (PARTITION BY doc_id ORDER BY pos
                         RANGE BETWEEN {CDC_MIN} FOLLOWING AND {CDC_MAX} FOLLOWING) AS nc
         FROM pcand),
nxt AS MATERIALIZED (
    SELECT w.doc_id, w.pos, LEAST(d.n, COALESCE(w.nc, w.pos + {CDC_MAX})) AS nxt
    FROM nxtw w JOIN dl d USING (doc_id)),
bounds AS (
    SELECT doc_id, 0::BIGINT AS k, 0::BIGINT AS pos FROM dl
    UNION ALL
    SELECT b.doc_id, b.k + 1, t.nxt
    FROM bounds b JOIN nxt t ON t.doc_id = b.doc_id AND t.pos = b.pos
                  JOIN dl d ON d.doc_id = b.doc_id
    WHERE b.pos < d.n
),
chunks AS (
    SELECT a.doc_id, a.k AS chunk_id, a.pos AS start_tok, e.pos AS end_tok,
           e.pos - a.pos AS n_toks,
           array_to_string(d.words[a.pos + 1 : e.pos], ' ') AS chunk_text
    FROM bounds a
    JOIN bounds e ON e.doc_id = a.doc_id AND e.k = a.k + 1
    JOIN dl d ON d.doc_id = a.doc_id
)"""


def sql_cdc_chunks() -> str:
    return f"""
WITH RECURSIVE
{_sql_bounds_ctes().strip()}
SELECT doc_id, chunk_id, start_tok, end_tok, n_toks, chunk_text FROM chunks
"""


def sql_cdc_dedup(min_docs: int = 2) -> str:
    return f"""
WITH RECURSIVE
{_sql_bounds_ctes().strip()}
SELECT chunk_text, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
FROM chunks GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {min_docs}
"""
