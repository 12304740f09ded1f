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


def test_feature_hash_matches_python_replay():
    import hashlib

    import pyarrow.parquet as pq

    from osm_search_ray.functions.tokenize import tokenize
    from osm_search_ray.pipelines.textops import FEATURE_HASH_DIMS, feature_hash

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        for tok in tokenize(text):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            k = (did, h % FEATURE_HASH_DIMS)
            exp[k] = exp.get(k, 0) + (1 if (h // FEATURE_HASH_DIMS) % 2 == 0 else -1)
    exp = {k: v for k, v in exp.items() if v}
    got = feature_hash(SF).to_pandas()
    assert len(got) == len(exp)
    for did, dim, feat in got.itertuples(index=False):
        assert exp[(int(did), int(dim))] == int(feat)


def test_lexical_diversity_matches_python_replay():
    import pyarrow.parquet as pq

    from osm_search_ray.functions.tokenize import tokenize
    from osm_search_ray.pipelines.textops import lexical_diversity

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = tokenize(text)
        if toks:
            exp[did] = (len(toks), len(set(toks)), 1000000 * len(set(toks)) // len(toks))
    got = lexical_diversity(SF).to_pandas()
    assert len(got) == len(exp)
    for did, nt, ty, ttr in got.itertuples(index=False):
        assert exp[int(did)] == (int(nt), int(ty), int(ttr))


def test_vocab_growth_matches_python_replay():
    import pyarrow.parquet as pq

    from osm_search_ray.functions.tokenize import tokenize
    from osm_search_ray.pipelines.textops import vocab_growth

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = t.num_rows
    ntok = [0] * 10
    first = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        d = did * 10 // n
        toks = tokenize(text)
        ntok[d] += len(toks)
        for tk in toks:
            if tk not in first or first[tk] > d:
                first[tk] = d
    nty = [0] * 10
    for d in first.values():
        nty[d] += 1
    got = vocab_growth(SF).to_pandas()
    assert got["cum_tokens"].tolist() == list(np.cumsum(ntok))
    assert got["cum_types"].tolist() == list(np.cumsum(nty))
    assert got["cum_types"].iloc[-1] == len(first)
