"""Degenerate-corpus hardening for the r04 operators: empty text,
single-token docs, repeated tokens, and a NULL lang — every engine/oracle
pair must agree (or both be empty) on the weird fixture, not just sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "word", "dup dup dup dup dup dup", "a plain short sentence here"]),
            "lang": pa.array(["en", None, "es", "en"]),
            "source": pa.array(["s0", "s1", "s0", "s1"]),
            "n_chars": pa.array([0, 4, 23, 27], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def _con(edge_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    return c


def _cmp(got, sql, edge_dir, sort_cols):
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = _con(edge_dir).execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    want = want.astype({c: got[c].dtype for c in got.columns})[got.columns]
    pd.testing.assert_frame_equal(got, want)
    return got


class TestEdgeCorpus:
    def test_cdc_chunks(self, edge_dir):
        from osm_search_ray.pipelines import cdc

        got = _cmp(cdc.cdc_chunks(edge_dir), cdc.sql_cdc_chunks(), edge_dir, ["doc_id", "chunk_id"])
        # empty text still yields exactly one (empty) chunk, tiling holds
        assert (got[got["doc_id"] == 0]["chunk_text"] == "").all()
        assert len(got[got["doc_id"] == 0]) == 1

    def test_dsir_select(self, edge_dir):
        from osm_search_ray.pipelines import dsir

        got = _cmp(dsir.dsir_select(edge_dir), dsir.sql_dsir_select(), edge_dir, ["rank"])
        assert len(got) == 4  # top-k truncates to the corpus

    def test_cms_heavy_terms(self, edge_dir):
        from osm_search_ray.pipelines import textops

        # min_count=20 → empty on both sides; also exercised at threshold 3
        _cmp(textops.cms_heavy_terms(edge_dir), textops.sql_cms_heavy_terms(), edge_dir, ["term"])
        got3 = textops.cms_heavy_terms(edge_dir, min_count=3)
        assert set(got3["term"]) == {"dup"} and int(got3["n_exact"].iloc[0]) == 6

    def test_zorder_sort(self, edge_dir):
        from osm_search_ray.pipelines import tiling

        _cmp(tiling.zorder_sort(edge_dir), tiling.sql_zorder_sort(), edge_dir, ["rank"])

    def test_mix_temperature(self, edge_dir):
        from osm_search_ray.pipelines import traindata as td

        got = _cmp(td.mix_temperature(edge_dir), td.SQL_MIX_TEMPERATURE, edge_dir, ["lang", "rank"])
        # NULL lang excluded on both sides
        assert set(got["lang"]) <= {"en", "es"}

    def test_ccnet_buckets(self, edge_dir):
        from osm_search_ray.pipelines import curate

        got = _cmp(curate.ccnet_buckets(edge_dir), curate.sql_ccnet_buckets(), edge_dir, ["doc_id"])
        assert len(got) == 4
