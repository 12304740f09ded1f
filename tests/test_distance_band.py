"""Epsilon-range self-join == blocked brute force; each pair exactly once."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines import tiling
from osm_search_ray.sources.derived import page_coords

SF = "/root/testdata/sf0.1"  # 4000 pages, ~3.4k pairs — exercises cross-cell


def _brute(sf_dir: str) -> pd.DataFrame:
    d = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(0).to_numpy()
    hg, lat, lon = page_coords(d)
    did, lat, lon = np.asarray(d, np.int64)[hg], lat[hg], lon[hg]
    e2 = np.float64(tiling.DIST_EPS) * np.float64(tiling.DIST_EPS)
    a_out, b_out = [], []
    for i in range(0, len(lat), 2000):
        dl = lat[i : i + 2000, None] - lat[None, :]
        dn = lon[i : i + 2000, None] - lon[None, :]
        hit = (dl * dl + dn * dn <= e2) & (did[i : i + 2000, None] < did[None, :])
        ii, jj = np.nonzero(hit)
        a_out.append(did[i + ii])
        b_out.append(did[jj])
    return (
        pd.DataFrame({"a_id": np.concatenate(a_out), "b_id": np.concatenate(b_out)})
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def test_distance_band_matches_bruteforce_and_is_exactly_once():
    got = tiling.distance_band_pairs(SF).to_pandas()
    assert not got.duplicated().any(), "home-cell smaller-id rule must dedup"
    got = got.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    exp = _brute(SF)
    assert len(exp) > 1000, "fixture must exercise the dense cluster"
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
