"""Spatial 1-NN self-join: brute-force SQL parity, regime coverage, and a
planted seam/tie fixture for the confirmation-bound edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_search_ray.pipelines import tiling

SF = "/root/testdata/sf0.001"


class TestNNJoin:
    def test_matches_sql(self):
        got = tiling.nn_join(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(tiling.sql_nn_join())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_every_page_resolved_once(self):
        got = tiling.nn_join(SF).to_pandas()
        from osm_search_ray.sources.derived import geo_pages

        n_pages = geo_pages(SF).count()
        assert len(got) == n_pages
        assert not got.duplicated("doc_id").any()
        assert (got["doc_id"] != got["nn_id"]).all()

    def test_seam_and_sparse_fallback(self, tmp_path, monkeypatch):
        """Pages hugging the antimeridian plus an isolated page: the seam
        pair must find each other ACROSS the grid seam (grid-far,
        physically near), the isolated page resolves via fallback, and the
        result still equals brute force."""
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "lat": [0.0, 0.0, 0.01, 45.0, 45.01],
                "lon": [179.99, -179.99, 179.99, 10.0, 10.01],
            }
        )

        def fake_geo_pages(sf_dir, columns=None):
            import ray.data

            return ray.data.from_pandas(docs)

        monkeypatch.setattr(tiling, "geo_pages", fake_geo_pages)
        got = tiling.nn_join("unused").to_pandas().sort_values("doc_id").reset_index(drop=True)

        from osm_search_ray.functions.geometry import haversine_km

        want = []
        for i in range(len(docs)):
            d = haversine_km(
                docs["lat"][i], docs["lon"][i], docs["lat"].to_numpy(), docs["lon"].to_numpy()
            )
            d[i] = np.inf
            order = np.lexsort((docs["doc_id"].to_numpy(), d))
            want.append((i, int(docs["doc_id"][order[0]])))
        want = pd.DataFrame(want, columns=["doc_id", "nn_id"]).astype(np.int64)
        pd.testing.assert_frame_equal(got, want)
        # doc 1 finds its neighbor ACROSS the antimeridian (grid-far,
        # physically ~2.2 km): the seam regime resolved it correctly
        assert got.set_index("doc_id").loc[1, "nn_id"] == 0
