"""keywords_tfidf + postings_sizes units (pipelines/textops.py)."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.functions.hashing import delta_encode_postings
from osm_search_ray.functions.tokenize import tokenize
from osm_search_ray.pipelines import textops

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def test_postings_sizes_match_real_codec():
    """encoded_bytes IS the byte length delta_encode_postings produces."""
    got = textops.postings_sizes(SF).to_pandas().set_index("term")
    ids_by_term = {}
    for d, tx in zip(*_docs()):
        for t in set(tokenize(tx)):
            ids_by_term.setdefault(t, []).append(d)
    assert set(ids_by_term) == set(got.index)
    for t, ids in ids_by_term.items():
        enc = delta_encode_postings(np.asarray(sorted(ids), np.int64))
        assert got.loc[t, "encoded_bytes"] == len(enc)
        assert got.loc[t, "n_postings"] == len(ids)
        assert got.loc[t, "raw_bytes"] == 8 * len(ids)


def test_keywords_tfidf_matches_bruteforce():
    got = (
        textops.keywords_tfidf(SF)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    doc_ids, texts = _docs()
    n = float(len(doc_ids))
    df = {}
    for tx in texts:
        for t in set(tokenize(tx)):
            df[t] = df.get(t, 0) + 1
    rows = []
    for d, tx in zip(doc_ids, texts):
        toks = tokenize(tx)
        tf = pd.Series(toks).value_counts()
        sc = sorted(
            ((int(tf[t]) * math.log(n / float(df[t])), t) for t in tf.index),
            key=lambda p: (-p[0], p[1]),
        )
        for r, (_, t) in enumerate(sc[:3], 1):
            rows.append((d, t, r))
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "term", "rank"])
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_keywords_rank_shape():
    got = textops.keywords_tfidf(SF).to_pandas()
    per = got.groupby("doc_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()  # contiguous ranks
    assert (per["count"] <= 3).all()
