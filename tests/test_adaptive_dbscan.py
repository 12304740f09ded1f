"""Adaptive quadtree tiling + grid DBSCAN clustering (pipelines/tiling.py).

Both operators' driver queries are SQL-oracled; these units pin the
structural invariants the hash comparison cannot see."""

import numpy as np
import pandas as pd

from osm_search_ray.functions.cells import RES_COARSE, parent_cell
from osm_search_ray.pipelines import tiling
from osm_search_ray.sources.derived import geo_pages

SF = "/root/testdata/sf0.001"


def test_adaptive_tiles_partition_property():
    """Leaves partition the corpus: every page lies in EXACTLY one leaf."""
    leaves = tiling.adaptive_tiles(SF).to_pandas()
    pages = geo_pages(SF).to_pandas()
    n_pages = len(pages)
    assert leaves["n_docs"].sum() == n_pages

    # re-derive each page's leaf by walking its own ancestor chain: the
    # unique leaf must be the page's ancestor at the leaf's level
    fine = tiling.add_cells(
        __import__("pyarrow").table(
            {"lat": pages["lat"].to_numpy(), "lon": pages["lon"].to_numpy()}
        )
    )
    cell12 = fine.column("cell_r12").to_numpy()
    leaf_set = set(zip(leaves["level"], leaves["cell"]))
    hits = np.zeros(n_pages, np.int64)
    for r in range(tiling.PYRAMID_TOP, RES_COARSE + 1):
        anc = parent_cell(cell12, RES_COARSE, r)
        hits += np.fromiter(((r, a) in leaf_set for a in anc), np.int64, n_pages)
    assert (hits == 1).all()


def test_adaptive_tiles_leaf_rule():
    """No leaf above cap except at the res_fine floor; every non-floor leaf's
    parent is over cap (i.e. the split really stopped at the leaf)."""
    leaves = tiling.adaptive_tiles(SF).to_pandas()
    over = leaves[leaves["n_docs"] > tiling.TILE_CAP]
    assert (over["level"] == RES_COARSE).all()
    assert len(leaves) > 1


def test_dbscan_matches_bruteforce():
    """Distributed grid DBSCAN == single-process replay (core rule, 8-adj CC,
    min-id labels, singleton fallback)."""
    got = (
        tiling.dbscan_cells(SF)
        .to_pandas()
        .sort_values("cell_r12")
        .reset_index(drop=True)
    )

    cells = tiling.kring_density(SF).to_pandas()
    n = 1 << RES_COARSE
    core = cells[cells["n_ring"] >= tiling.DBSCAN_MIN_PTS]
    ids = core["cell_r12"].to_numpy(np.int64)
    idset = set(ids.tolist())
    # union-find over 8-adjacency
    lab = {c: c for c in ids}

    def find(a):
        while lab[a] != a:
            lab[a] = lab[lab[a]]
            a = lab[a]
        return a

    for c in ids:
        x, y = c // n, c % n
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx) * n + (y + dy)
                if nb != c and nb in idset:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        lab[max(ra, rb)] = min(ra, rb)
    exp = pd.DataFrame(
        {
            "cell_r12": ids,
            "cluster_id": [find(c) for c in ids],
            "n_docs": core["n_docs"].to_numpy(np.int64),
        }
    ).sort_values("cell_r12").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_dbscan_has_nontrivial_cluster():
    df = tiling.dbscan_cells(SF).to_pandas()
    sizes = df.groupby("cluster_id").size()
    assert (sizes > 1).any(), "fixture should produce at least one multi-cell cluster"


def test_pip_triangles_margin_and_bruteforce():
    """Every page is strictly off every triangle edge (so winding and the
    SQL sign test cannot disagree), and the join == a numpy replay."""
    import pandas as pd

    from osm_search_ray.sources.derived import tri_polys

    t = tri_polys(SF).to_pandas()
    p = geo_pages(SF).to_pandas()
    lat, lon = p["lat"].to_numpy(), p["lon"].to_numpy()
    got = (
        tiling.pip_triangles(SF)
        .to_pandas()
        .sort_values(["doc_id", "tri_id"])
        .reset_index(drop=True)
    )
    rows = []
    min_margin = np.inf
    for _, r in t.iterrows():
        s1 = (r.blon - r.alon) * (lat - r.alat) - (r.blat - r.alat) * (lon - r.alon)
        s2 = (r.clon - r.blon) * (lat - r.blat) - (r.clat - r.blat) * (lon - r.blon)
        s3 = (r.alon - r.clon) * (lat - r.clat) - (r.alat - r.clat) * (lon - r.clon)
        inside = ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | ((s1 <= 0) & (s2 <= 0) & (s3 <= 0))
        margins = np.min(np.abs(np.stack([s1, s2, s3])), axis=0)
        if margins.size:
            min_margin = min(min_margin, margins.min())
        for d in p["doc_id"].to_numpy()[inside]:
            rows.append((d, int(r.tri_id)))
    assert min_margin > 1e-12, "a page sits numerically on a triangle edge"
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "tri_id"])
        .sort_values(["doc_id", "tri_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_rect_quantiles_match_numpy():
    import pandas as pd

    got = tiling.rect_quantiles(SF).to_pandas().sort_values("rect_id").reset_index(drop=True)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    pages = geo_pages(SF).to_pandas().merge(docs, on="doc_id")
    joined = tiling.pip_join(SF).to_pandas()[["doc_id", "rect_id"]].merge(
        pages[["doc_id", "n_chars"]], on="doc_id"
    )
    rows = []
    for rid, g in joined.groupby("rect_id", sort=True):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        qs = []
        for k in (1, 2, 3):
            pos4 = (n - 1) * k
            lo, f4 = pos4 // 4, pos4 % 4
            qs.append(int(v[lo]) * (4 - f4) + int(v[min(lo + 1, n - 1)]) * f4)
        # cross-check against numpy's float quantile
        npq = np.quantile(v, [0.25, 0.5, 0.75])
        assert np.allclose(np.array(qs) / 4.0, npq)
        rows.append((rid, n, *qs))
    exp = pd.DataFrame(rows, columns=["rect_id", "n_pages", "p25_x4", "p50_x4", "p75_x4"])
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
