"""HITS hubs/authorities: oracle parity, driver==distributed regime
equality, a hand-checkable planted graph, and normalization invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osm_search_ray.pipelines import graph

SF = "/root/testdata/sf0.001"


class TestHits:
    def test_matches_sql(self):
        got = graph.hits_links(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(graph.sql_hits_links())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_regimes_agree(self):
        """Driver-side numpy recurrence == distributed two-exchange path."""
        nodes = ray.data.from_pandas(pd.DataFrame({"id": np.arange(12, dtype=np.int64)}))
        rng = [(i, (i * 5 + 1) % 12) for i in range(12)] + [(i, (i * 7 + 3) % 12) for i in range(12)]
        e = pd.DataFrame({"src": [a for a, _ in rng], "dst": [b for _, b in rng]}).astype(np.int64)
        small = graph.hits(nodes, ray.data.from_pandas(e)).to_pandas()
        nodes2 = ray.data.from_pandas(pd.DataFrame({"id": np.arange(12, dtype=np.int64)}))
        dist = graph.hits(nodes2, ray.data.from_pandas(e), small_edges=0).to_pandas()
        s = small.sort_values("id").reset_index(drop=True)
        d = dist.sort_values("id").reset_index(drop=True)[s.columns].astype(
            {c: s[c].dtype for c in s.columns}
        )
        pd.testing.assert_frame_equal(s, d)

    def test_planted_star(self):
        """A star graph: the center is the sole authority, every leaf the
        max hub; one iteration is already the fixed point."""
        nodes = ray.data.from_pandas(pd.DataFrame({"id": np.arange(5, dtype=np.int64)}))
        e = pd.DataFrame({"src": np.array([1, 2, 3, 4], np.int64), "dst": np.zeros(4, np.int64)})
        out = graph.hits(nodes, ray.data.from_pandas(e)).to_pandas().set_index("id")
        assert out.loc[0, "auth"] == graph.HITS_SCALE
        assert (out.loc[[1, 2, 3, 4], "hub"] == graph.HITS_SCALE).all()
        assert out.loc[0, "hub"] == 0
        assert (out.loc[[1, 2, 3, 4], "auth"] == 0).all()

    def test_normalization_bounds(self):
        got = graph.hits_links(SF).to_pandas()
        for c in ("hub_x1e6", "auth_x1e6"):
            assert got[c].min() >= 0
            assert got[c].max() == graph.HITS_SCALE  # max-normalized each phase


class TestTriangles:
    def test_matches_sql(self):
        got = (
            graph.triangle_counts(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(graph.SQL_TRIANGLE_COUNTS)
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_planted_clique(self, monkeypatch):
        """K4 plus a pendant edge: each clique node sits in C(3,2)=3
        triangles, the pendant in none; direction/duplication of the input
        edges must not matter (canonicalized distinct pairs)."""
        e = pd.DataFrame(
            {
                "src": [0, 0, 0, 1, 1, 2, 4, 2, 3],
                "dst": [1, 2, 3, 2, 3, 3, 0, 1, 0],  # K4 + (0,4) + dup/reversed edges
            }
        ).astype(np.int64)

        monkeypatch.setattr(
            graph.dv, "link_edges", lambda sf: ray.data.from_pandas(e)
        )
        got = graph.triangle_counts("unused").to_pandas().set_index("doc_id")["n_triangles"]
        assert got.loc[[0, 1, 2, 3]].tolist() == [3, 3, 3, 3]
        assert 4 not in got.index
