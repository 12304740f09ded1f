"""CCNet perplexity bucketing: oracle parity, NTILE sizing, sentinel rule,
and monotonicity of buckets in the perplexity proxy."""

import duckdb
import numpy as np
import pandas as pd

from osm_search_ray.pipelines import curate

SF = "/root/testdata/sf0.001"


def _run():
    got = curate.ccnet_buckets(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(curate.sql_ccnet_buckets())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return got, want.astype({c: got[c].dtype for c in got.columns})


class TestCCNet:
    def test_matches_sql(self):
        got, want = _run()
        pd.testing.assert_frame_equal(got, want)

    def test_bucket_sizes_ntile_rule(self):
        got, _ = _run()
        sizes = got["bucket"].value_counts().sort_index().to_numpy()
        n, k = len(got), curate.CCNET_K
        expect = np.full(k, n // k)
        expect[: n % k] += 1
        assert (sizes == expect).all()

    def test_buckets_monotone_in_ppx(self):
        got, _ = _run()
        srt = got.sort_values(["ppx_scaled", "doc_id"])
        assert (np.diff(srt["bucket"].to_numpy()) >= 0).all()

    def test_sentinel_rule_matches_scores(self):
        """Docs flagged non-finite by the LM (or token-free) carry the
        sentinel and live in the tail."""
        from osm_search_ray.pipelines.search_docs import lm_doc_scores

        scores = lm_doc_scores(SF).to_pandas()
        got, _ = _run()
        m = got.merge(scores, on="doc_id")
        bad = m[(m["is_finite"] == 0) | (m["n_tokens"] == 0)]
        assert (bad["ppx_scaled"] == curate.PPX_SENTINEL).all()
        ok = m[(m["is_finite"] == 1) & (m["n_tokens"] > 0)]
        expect = (-ok["logprob_milli"].to_numpy() * 1000) // ok["n_tokens"].to_numpy()
        assert (ok["ppx_scaled"].to_numpy() == expect).all()
