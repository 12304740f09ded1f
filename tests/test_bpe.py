"""BPE tokenizer training (pipelines/bpe.py): fold semantics, hand-computed
merge elections, row-order independence, driver==distributed regime equality,
and the SQL twin on a planted corpus that exercises the dry-stop (the driver
check covers the registered-table twin; this pins edge semantics)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from osm_search_ray.pipelines import bpe


def test_merge_syms_fold_semantics():
    # overlaps resolve greedily left-first — the exact fold the SQL replays
    assert bpe.merge_syms(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe.merge_syms(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe.merge_syms(list("ab"), "a", "b") == ["ab"]
    assert bpe.merge_syms(list("ba"), "a", "b") == ["b", "a"]
    assert bpe.merge_syms(["ab", "a", "b"], "ab", "a") == ["aba", "b"]
    assert bpe.merge_syms(["x"], "x", "x") == ["x"]


def test_train_merges_hand_computed():
    # (a,b) occurs 2x in "abab" (cnt 2) + 1x in "ab" (cnt 3) = 7; (b,a) = 2
    merges, wlen = bpe.train_merges(["abab", "ab"], [2, 3], n_merges=10)
    assert merges.to_dict("records") == [
        {"merge_rank": 1, "left_sym": "a", "right_sym": "b", "pair_count": 7},
        {"merge_rank": 2, "left_sym": "ab", "right_sym": "ab", "pair_count": 2},
    ]
    assert wlen == {"abab": 1, "ab": 1}


def test_train_merges_min_count_stop():
    # every pair unique → counts of 1 < MIN_PAIR_COUNT → zero merges
    merges, wlen = bpe.train_merges(["abc", "xyz"], [1, 1], n_merges=5)
    assert len(merges) == 0
    assert wlen == {"abc": 3, "xyz": 3}


def test_train_merges_row_order_independent():
    words, cnts = ["spark", "park", "s", "ark", "spa"], [5, 3, 9, 2, 4]
    a, la = bpe.train_merges(words, cnts)
    b, lb = bpe.train_merges(words[::-1], cnts[::-1])
    pd.testing.assert_frame_equal(a, b)
    assert la == lb


def test_distributed_regime_equals_driver(ray_session):
    words = ["batch", "batches", "matched", "catch", "hat", "chat", "the"]
    cnts = [7, 3, 2, 5, 11, 2, 13]
    drv_merges, drv_wlen = bpe.train_merges(words, cnts, n_merges=6)
    wf = ray.data.from_arrow(
        pa.table({"word": pa.array(words, pa.string()), "cnt": pa.array(cnts, pa.int64())})
    ).repartition(3)  # force multi-block partials
    ds_merges, seg_ds = bpe.train_merges_ds(wf, n_merges=6)
    pd.testing.assert_frame_equal(drv_merges, ds_merges)
    got = {r["word"]: r["n_syms"] for r in seg_ds.take_all()}
    assert got == drv_wlen


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_tokenize_regimes_and_zero_token_docs(tmp_path, monkeypatch, ray_session):
    sf = _write_docs(
        tmp_path,
        ["spark spark batch", "batch batch sparkle", "!!! ...", "spark", ""],
    )
    driver = bpe.bpe_tokenize(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert driver.loc[2, "n_tokens_bpe"] == 0 and driver.loc[4, "n_tokens_bpe"] == 0
    monkeypatch.setattr(bpe, "DRIVER_VOCAB_LIMIT", 0)  # force the join regime
    joined = bpe.bpe_tokenize(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver, joined)


def test_sql_twin_on_planted_corpus_with_dry_stop(tmp_path, ray_session):
    # tiny corpus whose merge loop runs dry well before N_MERGES, so the SQL
    # chain's no-op tail is exercised; includes a zero-token doc
    sf = _write_docs(
        tmp_path,
        ["aa ab aa", "ab aa ab аб", "??", "zq zq"],
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    m = bpe.bpe_train(sf).reset_index(drop=True)
    o = con.execute(bpe.sql_bpe_train()).df()
    assert len(m) < bpe.N_MERGES  # the dry stop actually happened
    pd.testing.assert_frame_equal(m, o.astype(m.dtypes.to_dict()))
    tk = bpe.bpe_tokenize(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ok = con.execute(bpe.sql_bpe_tokenize()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(tk, ok.astype({c: tk[c].dtype for c in tk.columns}))
