"""Content-defined chunking: DuckDB oracle parity, structural invariants,
and the CDC locality property (boundaries realign after an edit)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_search_ray.pipelines import cdc

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def chunks_df():
    return cdc.cdc_chunks(SF).to_pandas()


class TestOracleParity:
    def test_cdc_chunks_matches_sql(self, chunks_df):
        want = _con().execute(cdc.sql_cdc_chunks()).df()
        a, b = _canon(chunks_df), _canon(want)
        b = b.astype({c: a[c].dtype for c in a.columns})
        pd.testing.assert_frame_equal(a, b)

    def test_cdc_dedup_matches_sql(self):
        got = cdc.cdc_dedup(SF).to_pandas()
        want = _con().execute(cdc.sql_cdc_dedup()).df()
        a, b = _canon(got), _canon(want)
        b = b.astype({c: a[c].dtype for c in a.columns})
        pd.testing.assert_frame_equal(a, b)


class TestInvariants:
    def test_chunks_tile_the_document(self, chunks_df):
        """Concatenating a doc's chunks in order reproduces its text."""
        rejoined = (
            chunks_df.sort_values(["doc_id", "chunk_id"])
            .groupby("doc_id")["chunk_text"]
            .apply(" ".join)
        )
        orig = (
            _con()
            .execute("SELECT doc_id, text FROM documents")
            .df()
            .set_index("doc_id")["text"]
        )
        assert (rejoined == orig.loc[rejoined.index]).all()

    def test_length_bounds(self, chunks_df):
        assert (chunks_df["n_toks"] <= cdc.CDC_MAX).all()
        assert (chunks_df["n_toks"] >= 1).all()
        # every chunk except a doc's last respects the min-length clamp
        last = chunks_df.groupby("doc_id")["chunk_id"].transform("max")
        non_final = chunks_df[chunks_df["chunk_id"] != last]
        assert (non_final["n_toks"] >= cdc.CDC_MIN).all()

    def test_offsets_consistent(self, chunks_df):
        g = chunks_df.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")
        assert (g["start_tok"].first() == 0).all()
        # end of chunk k == start of chunk k+1
        shifted = g["end_tok"].shift(1).dropna()
        starts = chunks_df.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")[
            "start_tok"
        ].apply(lambda s: s.iloc[1:]).reset_index(drop=True)
        assert (shifted.reset_index(drop=True).to_numpy() == starts.to_numpy()).all()


class TestLocality:
    def test_drop_first_chunk_realigns_exactly(self, chunks_df):
        """CDC's raison d'être: removing a doc's first chunk leaves every
        remaining boundary in place (candidates are content-local; the walk
        from a boundary depends only on what follows it).  Fixed-width
        chunking (webcorpus.explode_chunks) would shift every chunk."""
        docs = _con().execute("SELECT doc_id, text FROM documents LIMIT 20").df()
        for _, row in docs.iterrows():
            mine = chunks_df[chunks_df["doc_id"] == row["doc_id"]].sort_values("chunk_id")
            if len(mine) < 3:
                continue
            e0 = int(mine["end_tok"].iloc[0])
            rest = " ".join(row["text"].split(" ")[e0:])
            batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [rest]})
            re_bounds = cdc.chunk_batch(batch).to_pandas()["end_tok"].to_numpy()
            orig_bounds = mine["end_tok"].iloc[1:].to_numpy() - e0
            assert (re_bounds == orig_bounds).all()

    def test_batching_invariance(self):
        """Chunking is per-doc: results are identical under any batch split."""
        docs = _con().execute(
            "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 16"
        ).df()
        whole = cdc.chunk_batch(pa.Table.from_pandas(docs)).to_pandas()
        parts = [
            cdc.chunk_batch(pa.Table.from_pandas(docs.iloc[i : i + 3]))
            for i in range(0, len(docs), 3)
        ]
        split = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
        pd.testing.assert_frame_equal(
            _canon(whole), _canon(split)
        )
