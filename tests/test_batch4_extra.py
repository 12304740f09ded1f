"""related_terms / revenue_wow / kde_cells units."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.functions.tokenize import tokenize
from osm_search_ray.pipelines import relational as rel
from osm_search_ray.pipelines import textops, tiling

SF = "/root/testdata/sf0.001"


def test_related_terms_matches_bruteforce():
    got = (
        textops.related_terms(SF)
        .to_pandas()
        .sort_values(["term", "rank"])
        .reset_index(drop=True)
    )
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist()
    pairs = {}
    for tx in texts:
        toks = tokenize(tx)
        for d in range(1, textops.SKIPGRAM_WINDOW + 1):
            for i in range(len(toks) - d):
                a, b = sorted((toks[i], toks[i + d]))
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    directed = {}
    for (a, b), n in pairs.items():
        directed.setdefault(a, []).append((b, n))
        if a != b:
            directed.setdefault(b, []).append((a, n))
    rows = []
    for t in sorted(directed):
        ps = sorted(directed[t], key=lambda p: (-p[1], p[0]))
        for r, (p, n) in enumerate(ps[: textops.RELATED_TOP_K], 1):
            rows.append((t, p, n, r))
    exp = pd.DataFrame(rows, columns=["term", "partner", "n_pairs", "rank"])
    pd.testing.assert_frame_equal(
        got.astype({"n_pairs": np.int64, "rank": np.int64}),
        exp.astype({"n_pairs": np.int64, "rank": np.int64}),
    )


def test_revenue_wow_matches_pandas():
    got = rel.revenue_wow(SF).reset_index(drop=True)
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    week = od["o_orderdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000 // 7
    cents = np.rint(od["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g = pd.DataFrame({"week": week, "c": cents}).groupby("week", sort=True)["c"].sum()
    rev = g.to_numpy(np.int64)
    exp = pd.DataFrame(
        {
            "week": g.index.to_numpy(np.int64),
            "revenue_cents": rev,
            "delta_cents": np.concatenate([[np.int64(0)], rev[1:] - rev[:-1]]),
        }
    )
    pd.testing.assert_frame_equal(got, exp)


def test_kde_cells_matches_convolution():
    got = tiling.kde_cells(SF).to_pandas().sort_values("cell_r12").reset_index(drop=True)
    counts = tiling.tile_counts(SF).to_pandas()
    n = 1 << 12
    by_cell = dict(zip(counts["cell_r12"], counts["n_docs"]))
    rows = []
    for c, nd in sorted(by_cell.items()):
        x, y = c // n, c % n
        dens = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx) * n + (y + dy)
                dens += by_cell.get(nb, 0) * (4 >> (abs(dx) + abs(dy)))
        rows.append((c, nd, dens))
    exp = pd.DataFrame(rows, columns=["cell_r12", "n_docs", "density"])
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
    # smoothing conserves nothing but must dominate the center weight
    assert (got["density"] >= 4 * got["n_docs"]).all()
