"""Count-Min sketch: DuckDB oracle parity, the over-estimate guarantee under
forced collisions, and partial-register mergeability."""

import duckdb
import numpy as np
import pandas as pd

from osm_search_ray.functions.hashing import hash64_md5
from osm_search_ray.pipelines import textops
from osm_search_ray.stages import sketches

SF = "/root/testdata/sf0.001"


class TestOracleParity:
    def test_cms_heavy_terms_matches_sql(self):
        got = textops.cms_heavy_terms(SF).sort_values("term").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(textops.sql_cms_heavy_terms())
            .df()
            .sort_values("term")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})
        )
        pd.testing.assert_frame_equal(got, want)


class TestSketchProperties:
    def test_overestimate_guarantee_under_collisions(self):
        """With a tiny width collisions are forced; est >= exact must hold
        for EVERY item and at least one item must actually over-estimate."""
        rng_items = [f"item{i}" for i in range(40)]
        counts = np.arange(1, 41, dtype=np.int64)
        stream = np.repeat(np.array(rng_items, object), counts)
        h = hash64_md5(stream)
        regs = sketches.cms_partial(h, d=2, w=8)
        uh = hash64_md5(np.array(rng_items, object))
        est = sketches.cms_estimate(regs, uh)
        assert (est >= counts).all()
        assert (est > counts).any()  # 40 items in 8 buckets must collide

    def test_partials_merge_by_sum(self):
        items = np.array([f"t{i % 13}" for i in range(200)], object)
        h = hash64_md5(items)
        whole = sketches.cms_partial(h)
        merged = sketches.cms_partial(h[:77]) + sketches.cms_partial(h[77:])
        assert (whole == merged).all()

    def test_exact_when_no_collision(self):
        """A single item's estimate equals its count when it collides with
        nothing (empty registers elsewhere)."""
        h = hash64_md5(np.array(["solo"] * 9, object))
        regs = sketches.cms_partial(h)
        est = sketches.cms_estimate(regs, hash64_md5(np.array(["solo"], object)))
        assert est[0] == 9
