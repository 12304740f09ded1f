"""Lexicon tagger == pure-python str.count replay (independent of regex)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines import textops

SF = "/root/testdata/sf0.001"


def test_lexicon_tags_match_python_count():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        for kid, kw in textops.TAG_LEXICON:
            n = text.count(kw)  # str.count is left-to-right non-overlapping
            if n:
                rows.append((did, kid, n))
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "kw_id", "n"])
        .sort_values(["doc_id", "kw_id"])
        .reset_index(drop=True)
    )
    assert len(exp) > 10, "fixture must actually contain lexicon phrases"
    got = (
        textops.lexicon_tags(SF)
        .to_pandas()
        .sort_values(["doc_id", "kw_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_lexicon_self_overlap_counts_nonoverlapping():
    import re

    s = pd.Series(["batch batch batch", "batch batch batch batch"])
    n = s.str.count(re.compile(re.escape("batch batch"))).tolist()
    assert n == [1, 2] == [x.count("batch batch") for x in s]
