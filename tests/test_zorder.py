"""Z-order global sort: oracle parity, Morton quad contiguity, and the
interleave kernel against a bit-by-bit reference."""

import duckdb
import numpy as np
import pandas as pd

from osm_search_ray.functions.cells import morton_cell
from osm_search_ray.pipelines import tiling

SF = "/root/testdata/sf0.001"


class TestZOrder:
    def test_matches_sql(self):
        got = tiling.zorder_sort(SF).to_pandas().sort_values("rank").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(tiling.sql_zorder_sort())
            .df()
            .sort_values("rank")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_quad_rank_contiguity(self):
        """The defining Morton property: every aligned quad (z-prefix) is
        one CONTIGUOUS interval of global ranks."""
        got = tiling.zorder_sort(SF).to_pandas()
        assert got["quad"].nunique() > 1  # fixture actually spans quads
        g = got.groupby("quad")["rank"].agg(["min", "max", "count"])
        assert ((g["max"] - g["min"] + 1) == g["count"]).all()

    def test_interleave_against_bit_reference(self):
        """morton_cell == naive per-bit interleave on a coordinate sweep."""
        rng_lat = np.linspace(-89.9, 89.9, 97)
        rng_lon = np.linspace(-179.9, 179.9, 97)
        z = morton_cell(rng_lat, rng_lon)
        n = 1 << 15
        ix = np.clip(np.floor((rng_lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
        iy = np.clip(np.floor((rng_lat + 90.0) / 180.0 * n), 0, n - 1).astype(int)
        for k in range(len(z)):
            ref = 0
            for b in range(15):
                ref |= ((int(ix[k]) >> b) & 1) << (2 * b + 1)
                ref |= ((int(iy[k]) >> b) & 1) << (2 * b)
            assert int(z[k]) == ref
