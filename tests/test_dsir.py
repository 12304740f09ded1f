"""DSIR importance weighting: DuckDB oracle parity (bit-identical doubles),
brute-force replay of the estimator, and batching invariance."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_search_ray.pipelines import dsir

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


class TestOracleParity:
    def test_dsir_select_matches_sql_bitwise(self):
        got = dsir.dsir_select(SF).sort_values("rank").reset_index(drop=True)
        want = (
            _con()
            .execute(dsir.sql_dsir_select())
            .df()
            .sort_values("rank")
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})
        )
        assert (got["doc_id"] == want["doc_id"]).all()
        # doubles must be BIT-identical (libm ln + ordered fold both sides)
        assert (got["logw"].to_numpy() == want["logw"].to_numpy()).all()


class TestEstimator:
    def test_brute_force_replay(self):
        """Replay the paper's estimator doc-by-doc in plain Python on a few
        docs and require bit-identical logw."""
        docs = _con().execute(
            "SELECT doc_id, text, lang FROM documents ORDER BY doc_id"
        ).df()

        def grams(text):
            t = text.split(" ")
            return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

        from osm_search_ray.functions.hashing import hash64_md5, splitmix64

        def bucket(g):
            return int((splitmix64(hash64_md5([g])) % np.uint64(dsir.DSIR_B))[0])

        n_t = np.zeros(dsir.DSIR_B, np.int64)
        n_s = np.zeros(dsir.DSIR_B, np.int64)
        per_doc: dict[int, np.ndarray] = {}
        for _, r in docs.iterrows():
            c = np.zeros(dsir.DSIR_B, np.int64)
            for g in grams(r["text"]):
                c[bucket(g)] += 1
            per_doc[r["doc_id"]] = c
            n_s += c
            if r["lang"] == dsir.DSIR_TARGET_LANG:
                n_t += c
        tot_t, tot_s = int(n_t.sum()), int(n_s.sum())
        lam = [
            math.log((int(n_t[b]) + 1) / (tot_t + dsir.DSIR_B))
            - math.log((int(n_s[b]) + 1) / (tot_s + dsir.DSIR_B))
            for b in range(dsir.DSIR_B)
        ]

        weights = dsir.dsir_weights_ds(SF).to_pandas().set_index("doc_id")["logw"]
        for doc_id in list(per_doc)[:10]:
            c = per_doc[doc_id]
            acc = float(c[0]) * lam[0]
            for b in range(1, dsir.DSIR_B):
                acc = acc + float(c[b]) * lam[b]
            assert weights.loc[doc_id] == acc  # bit-identical

    def test_target_slice_scores_higher_on_average(self):
        """Sanity: docs from the target slice should get higher weights on
        average (the selection objective)."""
        w = dsir.dsir_weights_ds(SF).to_pandas()
        langs = _con().execute("SELECT doc_id, lang FROM documents").df()
        m = w.merge(langs, on="doc_id")
        tgt = m[m["lang"] == dsir.DSIR_TARGET_LANG]["logw"].mean()
        rest = m[m["lang"] != dsir.DSIR_TARGET_LANG]["logw"].mean()
        assert tgt > rest


class TestBatching:
    def test_gram_buckets_batch_invariant(self):
        docs = _con().execute(
            "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 12"
        ).df()
        whole_doc, whole_b = dsir._gram_buckets(pa.Table.from_pandas(docs))
        whole = sorted(zip(whole_doc.tolist(), whole_b.tolist()))
        parts = []
        base = 0
        for i in range(0, len(docs), 5):
            gd, gb = dsir._gram_buckets(pa.Table.from_pandas(docs.iloc[i : i + 5]))
            parts += [(int(d) + base, int(b)) for d, b in zip(gd, gb)]
            base += len(docs.iloc[i : i + 5])
        assert whole == sorted(parts)
