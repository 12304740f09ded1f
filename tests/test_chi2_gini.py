"""Chi-square independence and domain Gini — float cross-checks with exact
floor-error bounds, plus degenerate-direction sanity."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines.textops import lang_source_chi2
from osm_search_ray.pipelines.webcorpus import domain_gini

SF = "/root/testdata/sf0.001"


def test_chi2_tracks_float_statistic():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"]).to_pandas()
    ct = pd.crosstab(t["lang"], t["source"])
    o = ct.to_numpy(np.float64)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = ((o - e) ** 2 / e).sum()
    got = lang_source_chi2(SF).to_pandas()
    assert int(got["n_rows"].iloc[0]) == int(n)
    assert int(got["n_cells"].iloc[0]) == o.size
    # per-cell floor loses < 1 micro each
    assert abs(int(got["chi2_micro"].iloc[0]) / 1e6 - chi2) < o.size / 1e6 + 1e-6


def test_gini_tracks_float_formula_and_bounds():
    import pyarrow.compute as pc_

    from osm_search_ray.sources.derived import web_pages

    dom = web_pages(SF, columns=["domain"]).to_pandas()["domain"]
    x = np.sort(dom.value_counts().to_numpy(np.float64))
    k, sx = len(x), x.sum()
    g = (2 * (np.arange(1, k + 1) * x).sum() - (k + 1) * sx) / (k * sx)
    got = domain_gini(SF).to_pandas()
    assert int(got["n_domains"].iloc[0]) == k
    assert int(got["n_pages"].iloc[0]) == int(sx)
    gm = int(got["gini_micro"].iloc[0])
    assert abs(gm / 1e6 - g) < 2e-6
    assert 0 <= gm < 1_000_000
