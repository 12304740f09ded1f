"""PageRank over the derived link graph: edge-derivation parity with SQL,
distributed power iteration == pure-numpy reference, and mass/teleport
invariants — all at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _edges_numpy(n):
    from osm_search_ray.sources.derived import link_targets

    src = np.arange(n, dtype=np.int64)
    dsts = link_targets(src, n)
    return np.tile(src, len(dsts)), np.concatenate(dsts)


def test_link_edges_match_sql():
    from osm_search_ray.sources import derived as dv

    got = (
        dv.link_edges(SF)
        .to_pandas()
        .sort_values(["src", "dst"], kind="mergesort")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = (
        con.execute(f"WITH {dv.SQL_LINK_EDGES.strip()} SELECT * FROM link_edges")
        .df()
        .sort_values(["src", "dst"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"src": np.int64, "dst": np.int64}))
    assert len(got) == 3 * 500  # 3 out-edges per doc, multi-edges kept


def _pagerank_numpy(n, iters):
    from osm_search_ray.pipelines.graph import SCALE, DAMP_NUM, DAMP_DEN

    src, dst = _edges_numpy(n)
    deg = np.bincount(src, minlength=n).astype(np.int64)
    r = np.full(n, SCALE // n, np.int64)
    base = (15 * SCALE) // (100 * n)
    for _ in range(iters):
        contrib = (r[src] * DAMP_NUM) // (DAMP_DEN * deg[src])
        nxt = np.full(n, base, np.int64)
        np.add.at(nxt, dst, contrib)
        r = nxt
    return r


def test_pagerank_matches_numpy_reference():
    from osm_search_ray.pipelines.graph import pagerank_links, PAGERANK_ITERS

    got = pagerank_links(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _pagerank_numpy(500, PAGERANK_ITERS)
    assert len(got) == 500
    assert (got["pr_x1e12"].to_numpy() == want).all()


def test_pagerank_distributed_path_equals_small_regime():
    """Force the two-exchange-per-iteration distributed path (small_edges=0)
    and require bit-identical ranks to the driver-numpy regime."""
    import ray.data
    from osm_search_ray.pipelines.graph import pagerank
    from osm_search_ray.sources import derived as dv

    nodes = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    dist = (
        pagerank(nodes, dv.link_edges(SF), small_edges=0)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert (dist["r"].to_numpy() == _pagerank_numpy(500, 3)).all()


def test_pagerank_mass_and_floor_invariants():
    """Total mass stays ~SCALE (floor-division leakage only, bounded by
    #edges + N), and every rank >= the teleport base."""
    from osm_search_ray.pipelines.graph import SCALE, PAGERANK_ITERS

    r = _pagerank_numpy(500, PAGERANK_ITERS)
    base = (15 * SCALE) // (100 * 500)
    assert (r >= base).all()
    assert 0 < SCALE - r.sum() < (3 * 500 + 500) * PAGERANK_ITERS * 2
    assert r.max() > r.min()  # the graph actually differentiates pages
