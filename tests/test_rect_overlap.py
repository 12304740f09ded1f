"""PBSM rect-overlap join == brute-force all-pairs; every pair exactly once."""

import numpy as np
import pandas as pd
import ray

from osm_search_ray.pipelines import tiling
from osm_search_ray.sources.derived import part_rects

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _brute(sf_dir: str) -> pd.DataFrame:
    r = part_rects(sf_dir).to_pandas()
    lat0, lon0 = r["lat0"].to_numpy(), r["lon0"].to_numpy()
    lat1, lon1 = r["lat1"].to_numpy(), r["lon1"].to_numpy()
    rid = r["rid"].to_numpy()
    hit = (
        (lat0[:, None] <= lat1[None, :])
        & (lat0[None, :] <= lat1[:, None])
        & (lon0[:, None] <= lon1[None, :])
        & (lon0[None, :] <= lon1[:, None])
        & (rid[:, None] < rid[None, :])
    )
    ii, jj = np.nonzero(hit)
    return (
        pd.DataFrame({"a_id": rid[ii], "b_id": rid[jj]})
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def test_rect_overlap_matches_bruteforce_and_is_exactly_once():
    for sf in (SF, SF2):
        got = tiling.rect_overlap_pairs(sf).to_pandas()
        assert not got.duplicated().any(), "PBSM reference-point rule must dedup"
        got = got.sort_values(["a_id", "b_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype(np.int64), _brute(sf).astype(np.int64))


def test_rect_overlap_fanout_spans_cells():
    """The fixture must actually exercise the multi-cell fan-out path (rects
    straddling grid lines), else the dedup rule is untested."""
    r = part_rects(SF2).to_pandas()
    G, BLAT = 0.02, -6.75
    ix0 = np.floor((r["lat0"].to_numpy() - BLAT) / G).astype(np.int64)
    ix1 = np.floor((r["lat1"].to_numpy() - BLAT) / G).astype(np.int64)
    assert (ix1 > ix0).any(), "no rect straddles a lat grid line"
