"""NEAR proximity search == pure-python per-doc pair-count replay."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.functions.tokenize import tokenize
from osm_search_ray.pipelines import search_docs as sd

SF = "/root/testdata/sf0.001"


def test_near_search_matches_python_replay():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = tokenize(text)
        for qid, ta, tb, w in sd.NEAR_QUERIES:
            pa_ = [i for i, x in enumerate(toks) if x == ta]
            pb_ = [i for i, x in enumerate(toks) if x == tb]
            n = sum(1 for i in pa_ for j in pb_ if abs(i - j) <= w)
            if n:
                rows.append((qid, did, n))
    exp = (
        pd.DataFrame(rows, columns=["query_id", "doc_id", "n_pairs"])
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(exp) > 100, "fixture must produce proximity hits"
    got = (
        sd.near_docs_search(SF)
        .to_pandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
