"""Dataset profiling — the schema/quality audit a pipeline runs before
committing 100 TB to a training mix: per-column row/null/distinct counts,
lexicographic min/max and total stringified length over ``documents``.

Scale shape: two independent passes, neither moving values wider than a
hash. (1) min/max/len/null are COMBINER partials — one small frame per
batch per column, fused by a column-keyed exchange over O(batches × cols)
rows. (2) exact distinct counts explode each cell to (col, h1, h2) — a
~128-bit value identity from two independent hash families, never the cell
text (dedup_exact's bytes discipline; 2^-128 per-pair collision bound, so
hash-distinct == value-distinct) — and count uniques inside a col+h1-keyed
exchange with per-partition partial counts summed in a final tiny fuse.
The two 5-row results join on the driver (bounded by column count, not
data)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ..sources.readers import read_pq

from ..functions.hashing import hash64_str
from ..stages.joins import hash_partitioned_apply

PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def column_profile(sf_dir: str) -> pd.DataFrame:
    """Output (col, n_rows, n_null, n_distinct, min_v, max_v, len_sum) —
    one row per documents column, every value stat computed over the
    stringified cell (CAST(x AS VARCHAR) in the SQL twin) so mixed column
    types share one exact contract."""
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=PROFILE_COLS)

    def partial_stats(batch: pa.Table) -> pa.Table:
        rows = []
        for c in PROFILE_COLS:
            s = batch.column(c).to_pandas()
            nn = s.notna()
            v = s[nn].astype(str)
            rows.append(
                (
                    c,
                    len(s),
                    int((~nn).sum()),
                    # None, not "": an all-null batch must not poison the
                    # cross-batch min with an empty-string sentinel
                    v.min() if len(v) else None,
                    v.max() if len(v) else None,
                    int(v.str.len().sum()) if len(v) else 0,
                )
            )
        return pa.Table.from_pandas(
            pd.DataFrame(
                rows, columns=["col", "n_rows", "n_null", "min_v", "max_v", "len_sum"]
            ).astype({"n_rows": np.int64, "n_null": np.int64, "len_sum": np.int64}),
            preserve_index=False,
        )

    def fuse_stats(df: pd.DataFrame) -> pd.DataFrame:
        def _nmin(s: pd.Series):
            s = s.dropna()
            return s.min() if len(s) else None

        def _nmax(s: pd.Series):
            s = s.dropna()
            return s.max() if len(s) else None

        g = df.groupby("col", sort=False).agg(
            n_rows=("n_rows", "sum"),
            n_null=("n_null", "sum"),
            min_v=("min_v", _nmin),  # skip the all-null-batch None partials
            max_v=("max_v", _nmax),
            len_sum=("len_sum", "sum"),
        )
        g[["min_v", "max_v"]] = g[["min_v", "max_v"]].fillna("")  # all-null column
        return g.reset_index().astype({"n_rows": np.int64, "n_null": np.int64, "len_sum": np.int64})

    stats = hash_partitioned_apply(
        ds.map_batches(partial_stats, batch_format="pyarrow"), "col", fuse_stats, num_parts=4
    ).to_pandas()

    def explode_hashes(batch: pa.Table) -> pa.Table:
        cols, h1s, h2s = [], [], []
        for ci, c in enumerate(PROFILE_COLS):
            s = batch.column(c).to_pandas()
            v = s[s.notna()].astype(str)
            cols.append(np.full(len(v), ci, np.int64))
            h1s.append(hash64_str(v.tolist()).astype(np.int64))
            h2s.append(pd.util.hash_pandas_object(v, index=False).to_numpy().astype(np.int64))
        return pa.table(
            {
                "ci": pa.array(np.concatenate(cols)),
                "h1": pa.array(np.concatenate(h1s)),
                "h2": pa.array(np.concatenate(h2s)),
            }
        )

    def partial_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("ci", sort=False).size().reset_index(name="k")
        return g.astype({"ci": np.int64, "k": np.int64})

    # (ci, h1) keys the exchange, so a value's every occurrence lands in one
    # partition and per-partition unique counts sum to the exact distinct
    parts = hash_partitioned_apply(
        ds.map_batches(explode_hashes, batch_format="pyarrow"), ["ci", "h1"], partial_distinct
    ).to_pandas()
    dist = parts.groupby("ci")["k"].sum()

    stats["n_distinct"] = (
        stats["col"].map({c: int(dist.get(i, 0)) for i, c in enumerate(PROFILE_COLS)}).astype(np.int64)
    )
    return stats[["col", "n_rows", "n_null", "n_distinct", "min_v", "max_v", "len_sum"]]


SQL_COLUMN_PROFILE = " UNION ALL ".join(
    f"""
SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT) AS n_distinct,
       COALESCE(MIN(CAST({c} AS VARCHAR)), '') AS min_v,
       COALESCE(MAX(CAST({c} AS VARCHAR)), '') AS max_v,
       CAST(COALESCE(SUM(length(CAST({c} AS VARCHAR))), 0) AS BIGINT) AS len_sum
FROM documents"""
    for c in PROFILE_COLS
)


def length_histogram(sf_dir: str):
    """Power-of-two length histogram over documents — the profiling pass
    that sizes batch/packing budgets: bucket = bit_length(n_chars) (0 for
    empty docs), i.e. bucket b covers [2^(b-1), 2^b). Exact integer bucket
    on both sides: numpy frexp exponent == SQL length(bin(x)) for x > 0
    (n_chars < 2^53 so the float64 frexp is exact). Pure combiner +
    one tiny bucket-keyed exchange. Output (bucket, n_docs, chars_sum)."""
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars").to_numpy().astype(np.int64)
        bucket = np.frexp(x.astype(np.float64))[1].astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "n_docs": 1, "chars_sum": x})
        g = df.groupby("bucket", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g.astype(np.int64), preserve_index=False)

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", sort=False).sum().reset_index().astype(np.int64)

    return hash_partitioned_apply(
        ds.map_batches(partial, batch_format="pyarrow"), "bucket", fuse, num_parts=4
    )


SQL_LENGTH_HISTOGRAM = """
SELECT CASE WHEN n_chars = 0 THEN 0
            ELSE CAST(length(bin(n_chars)) AS BIGINT) END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents GROUP BY 1
"""


def doc_id_gaps(sf_dir: str):
    """Gaps in a FILTERED id space: every maximal missing run between
    consecutive doc ids of English documents — the sequence-audit /
    hole-detection primitive (which id ranges does a subset skip?).
    Distinct surviving ids reduce via per-batch unique + one id-keyed
    exchange; the neighbor difference runs on the GLOBALLY SORTED id table
    with a distributed exclusive prefix-max (stages/joins.prefix_max_exclusive
    — O(blocks) driver carries; for sorted ids the exclusive running max IS
    the immediate predecessor), so no self-join, no LAG shuffle, and no
    driver-side id list. Output (gap_start, gap_end, gap_len)."""
    import ray.data

    from ..stages.joins import hash_partitioned_apply, prefix_max_exclusive

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def uniq(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("lang"), "en"))
        return pa.table({"id": pa.array(np.unique(t.column("doc_id").to_numpy()))})

    ids = hash_partitioned_apply(
        ds.map_batches(uniq, batch_format="pyarrow"), "id", lambda df: df.drop_duplicates()
    ).sort("id")
    scanned = prefix_max_exclusive(ids, "id", out_col="prev_id")

    def gaps(batch: pa.Table) -> pa.Table:
        cur = batch.column("id").to_numpy()
        prev = batch.column("prev_id").to_numpy()
        big_neg = np.iinfo(np.int64).min
        keep = (prev != big_neg) & (cur - prev > 1)
        return pa.table(
            {
                "gap_start": pa.array(prev[keep] + 1),
                "gap_end": pa.array(cur[keep] - 1),
                "gap_len": pa.array(cur[keep] - prev[keep] - 1),
            }
        )

    return scanned.map_batches(gaps, batch_format="pyarrow")


SQL_DOC_ID_GAPS = """
WITH ids AS (SELECT DISTINCT doc_id AS id FROM documents WHERE lang = 'en'),
nbr AS (SELECT id, LAG(id) OVER (ORDER BY id) AS prev_id FROM ids)
SELECT prev_id + 1 AS gap_start, id - 1 AS gap_end, id - prev_id - 1 AS gap_len
FROM nbr WHERE prev_id IS NOT NULL AND id - prev_id > 1
"""


def table_checksum(sf_dir: str):
    """ORDER-INVARIANT TABLE DIGEST of documents — the anti-entropy /
    replication-verification primitive (compare two copies of a table
    without sorting either): per row h = md5-hash64(doc_id ␟ text), the
    digest is Σh mod 2⁶⁴ plus the row count. ONE streaming pass, partial
    sums per batch, an O(blocks) reduce — zero shuffles, and the digest is
    independent of row order and partitioning by construction (modular
    addition commutes). Output (n_rows, checksum) with the sum emitted as
    signed int64 (the 2⁶⁴ wraparound twin of the SQL HUGEINT form)."""
    from ..functions.hashing import hash64_md5

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        keys = [f"{i}\x1f{t}" for i, t in zip(ids, texts)]
        h = hash64_md5(keys)  # uint64; np.sum wraps mod 2⁶⁴ on unsigned
        s = h.astype(np.uint64).sum(dtype=np.uint64) if len(keys) else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([np.int64(len(keys))]),
                "s": pa.array([s.view(np.int64)]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    with np.errstate(over="ignore"):
        total = parts["s"].to_numpy(np.int64).view(np.uint64).sum(dtype=np.uint64)
    return ray.data.from_pandas(
        pd.DataFrame({"n_rows": [np.int64(n)], "checksum": [np.int64(total.view(np.int64))]})
    )


SQL_TABLE_CHECKSUM = """
WITH h AS (
    SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || text), 1, 16) AS UBIGINT) AS v
    FROM documents),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(CAST(v AS HUGEINT)) % 18446744073709551616 AS s
      FROM h)
SELECT n_rows,
       CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS checksum
FROM m
"""
