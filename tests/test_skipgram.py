"""Skip-gram PMI collocations: oracle parity at sf0.001 (including the
deterministic top-slice boundary) and a planted fixture pinning the
doc-boundary mask and the window bound."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from osm_search_ray.pipelines import textops as tx

SF = "/root/testdata/sf0.001"


def test_skipgram_matches_sql():
    got = tx.skipgram_pmi(SF)
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = c.execute(tx.sql_skipgram_pmi()).df()
    # the top slice itself must agree row-for-row (same order contract)
    got = got.sort_values(["n", "w1", "w2"], ascending=[False, True, True]).reset_index(drop=True)
    want = want.sort_values(["n", "w1", "w2"], ascending=[False, True, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({c_: got[c_].dtype for c_ in got.columns}))
    assert len(got) == tx.SKIPGRAM_TOP


def test_skipgram_planted_window_and_boundaries(tmp_path):
    # doc 0: "a b c d" -> within window 3: ab ac ad bc bd cd
    # doc 1: "d a"     -> ad (again)  — and NO cross-doc (d,d) or (d,a) leaks
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d", "d a"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([7, 3], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = tx.skipgram_pmi(str(tmp_path), window=3, top=100)
    pairs = dict(zip(zip(got["w1"], got["w2"]), got["n"]))
    assert pairs == {
        ("a", "b"): 1,
        ("a", "c"): 1,
        ("a", "d"): 2,
        ("b", "c"): 1,
        ("b", "d"): 1,
        ("c", "d"): 1,
    }
    # PMI identity on the planted numbers: T=6 tokens, P=7 pair events
    row = got[(got["w1"] == "a") & (got["w2"] == "d")].iloc[0]
    T, P = 6, 7
    want = np.floor(np.log((2 * T * T) / (2 * 2 * P)) * tx.PMI_SCALE)
    assert row["pmi_micro"] == want


def test_fuzzy_join_blocking_is_lossless(tmp_path):
    """Deletes-neighborhood blocking vs the brute-force lev<=1 cross join on
    a planted corpus: same pair set, including substitution pairs (shared
    deletion key but neither string is a deletion of the other)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.functions.hashing import hash64_md5
    from osm_search_ray.functions.tokenize import tokenize_array
    from osm_search_ray.pipelines.textops import (
        FUZZY_MIN_LEN,
        FUZZY_PROBE_MOD,
        fuzzy_join_terms,
    )
    from osm_search_ray.state.spell import _lev_leq

    texts = [
        "restaurant restaurnt cafe cafes coffee covfee street stret",
        "market markets bank banks banana bandana park dark",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = fuzzy_join_terms(str(tmp_path)).to_pandas()
    got_pairs = set(zip(got["probe"], got["term"]))

    # brute-force twin: derive probes by the same rule, cross-verify
    vocab = sorted(set(tokenize_array(texts)[0].tolist()))
    h = hash64_md5(np.array(vocab, object))
    probes = set()
    for w, hx in zip(vocab, h):
        # NB: uint64 % python-int round-trips through float64 in numpy and
        # corrupts high bits — keep the modulus uint64 like the engine does
        if len(w) >= FUZZY_MIN_LEN and hx % np.uint64(FUZZY_PROBE_MOD) == 0:
            p = int(hx % np.uint64(len(w)))
            probes.add(w[:p] + w[p + 1 :])
    want = {(p, v) for p in probes for v in vocab if _lev_leq(p, v, 1)}
    assert got_pairs == want and len(want) > 0
    # dist column: 0 iff identical strings
    assert ((got["probe"] == got["term"]) == (got["dist"] == 0)).all()
