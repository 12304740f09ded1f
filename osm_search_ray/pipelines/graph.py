"""Iterative link-graph analytics — distributed PageRank power iteration.

The web-corpus companion to ``webcorpus.dup_clusters`` (connected
components): where CC labels duplicate groups, PageRank ranks pages by link
authority — the canonical iterative bulk-synchronous graph computation a
crawl-curation pipeline uses for per-page quality priors (reference analogue:
the importance-weighted result ordering in
/root/reference/pkg/searcher/searcher.go is a static per-doc prior; PageRank
is the corpus-derived version of that prior).

All arithmetic is scaled int64 with floor division (the oracle-float rule):
ranks start at SCALE // N, every scatter ships ``r * 85 // (100 * outdeg)``
per edge, every gather adds ``15 * SCALE // (100 * N)``. Both sides (numpy
and DuckDB) perform the identical non-negative integer ops, so the driver
hash-check is exact — no float summation-order hazard.

Scale shape (100 TB): the edge list is materialized ONCE and reused every
iteration (the standard iterative-graph trade); each iteration is exactly
two bounded hash exchanges — (1) src-keyed: ranks and edges meet
co-partitioned, out-degree is computed inside the partition (all edges of a
src land together), contributions are emitted per edge plus one zero-valued
keep-alive row per node so dangling nodes still receive the teleport base;
(2) dst-keyed: integer sum + base. Rank state never touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources import derived as dv
from ..stages.joins import hash_partitioned_apply

SCALE = 10**12  # rank fixed-point scale (pr_x1e12)
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
PAGERANK_ITERS = 3


def pagerank(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    iters: int = PAGERANK_ITERS,
    n_nodes: int | None = None,
    num_parts: int | None = None,
    small_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Power-iteration PageRank over ``nodes`` (column ``id``) and ``edges``
    (columns ``src``, ``dst``; multi-edges allowed, out-degree = edge count).
    Returns (id, r) with r the scaled-int64 rank after ``iters`` rounds.

    Regime switch (the MinHash-verify discipline): a graph whose edge list
    fits a bounded driver budget (``small_edges``) runs the identical integer
    recurrence as one numpy loop — 6 chained exchanges cost ~2 s of fixed
    actor ramp EACH on a warm cluster, which dwarfs small graphs. Above the
    bound, the distributed two-exchange-per-iteration path runs; the paths
    are equality-tested (tests/test_graph.py)."""
    if n_nodes is None:
        n_nodes = nodes.count()
    if num_parts is None:
        # ~2M node-rows per partition, capped; tiny graphs stay in few groups
        # so the 6-exchange iteration chain doesn't drown in per-group ramp.
        num_parts = max(2, min(512, n_nodes // 2_000_000 + 2))
    base = (15 * SCALE) // (100 * n_nodes)
    r0 = SCALE // n_nodes

    edges = edges.materialize()  # reused every iteration

    if n_nodes <= small_edges and edges.count() <= small_edges:
        ids = np.sort(nodes.to_pandas()["id"].to_numpy(np.int64))
        ed = edges.to_pandas()
        si = np.searchsorted(ids, ed["src"].to_numpy(np.int64))
        di = np.searchsorted(ids, ed["dst"].to_numpy(np.int64))
        deg = np.bincount(si, minlength=len(ids)).astype(np.int64)
        r = np.full(len(ids), r0, np.int64)
        for _ in range(iters):
            contrib = (r[si] * DAMP_NUM) // (DAMP_DEN * deg[si])
            nxt = np.full(len(ids), base, np.int64)
            np.add.at(nxt, di, contrib)
            r = nxt
        return ray.data.from_arrow(pa.table({"id": pa.array(ids), "r": pa.array(r)}))

    def init(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").cast(pa.int64())
        return pa.table({"id": ids, "r": pa.array(np.full(len(batch), r0, np.int64))})

    ranks = nodes.map_batches(init, batch_format="pyarrow")

    def tag_ranks(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("id"),
                "dst": pa.array(np.full(n, -1, np.int64)),
                "r": batch.column("r"),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "r": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        rk = df[df["side"] == 0]
        eg = df[df["side"] == 1]
        # keep-alive zero rows: every node reaches the gather even if dangling
        parts = [
            pd.DataFrame(
                {"id": rk["key"].to_numpy(np.int64), "contrib": np.zeros(len(rk), np.int64)}
            )
        ]
        if len(eg):
            deg = eg.groupby("key", sort=False)["dst"].transform("size").to_numpy(np.int64)
            r = (
                eg[["key"]]
                .merge(rk[["key", "r"]], on="key", how="left")["r"]
                .fillna(0)
                .to_numpy(np.int64)
            )
            parts.append(
                pd.DataFrame(
                    {
                        "id": eg["dst"].to_numpy(np.int64),
                        "contrib": (r * DAMP_NUM) // (DAMP_DEN * deg),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def gather(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("id", sort=False)["contrib"].sum().reset_index()
        return pd.DataFrame(
            {
                "id": g["id"].to_numpy(np.int64),
                "r": base + g["contrib"].to_numpy(np.int64),
            }
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")
    for _ in range(iters):
        both = ranks.map_batches(tag_ranks, batch_format="pyarrow").union(tagged_edges)
        contribs = hash_partitioned_apply(both, "key", scatter, num_parts=num_parts)
        ranks = hash_partitioned_apply(contribs, "id", gather, num_parts=num_parts)
    return ranks


def pagerank_links(sf_dir: str):
    """Driver query: PageRank over the derived link graph (3 out-edges per
    page, sources/derived.link_edges). Output (doc_id, pr_x1e12)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nodes = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    ranks = pagerank(nodes, dv.link_edges(sf_dir), iters=PAGERANK_ITERS, n_nodes=n_docs)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("id"), "pr_x1e12": batch.column("r")})

    return ranks.map_batches(project, batch_format="pyarrow")


def _sql_iter(prev: str, cur: str) -> str:
    """One unrolled PageRank step: identical integer ops to scatter/gather."""
    return f"""{cur} AS (
    SELECT d.doc_id AS id,
           CAST(15000000000000 // (100 * (SELECT COUNT(*) FROM documents))
                + COALESCE(SUM(r.r * 85 // (100 * g.outdeg)), 0) AS BIGINT) AS r
    FROM documents d
    LEFT JOIN link_edges e ON e.dst = d.doc_id
    LEFT JOIN {prev} r ON r.id = e.src
    LEFT JOIN deg g ON g.src = e.src
    GROUP BY d.doc_id)"""


SQL_PAGERANK_LINKS = f"""
WITH {dv.SQL_LINK_EDGES.strip()},
deg AS (SELECT src, COUNT(*) AS outdeg FROM link_edges GROUP BY src),
r0 AS (
    SELECT doc_id AS id,
           CAST(1000000000000 // (SELECT COUNT(*) FROM documents) AS BIGINT) AS r
    FROM documents),
{_sql_iter('r0', 'r1')},
{_sql_iter('r1', 'r2')},
{_sql_iter('r2', 'r3')}
SELECT id AS doc_id, r AS pr_x1e12 FROM r3
"""
