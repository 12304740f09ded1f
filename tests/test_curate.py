"""Funnel-precedence oracle for pipelines/curate.py on a constructed corpus
where every verdict class and every precedence edge is planted by hand (the
driver check covers the SQL twin; this pins the semantics without SQL)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osm_search_ray.pipelines.curate import curate_corpus


def _doc(*parts):
    return " ".join(parts)


def test_verdict_precedence_planted(tmp_path):
    filler = [f"q{i}" for i in range(21)]  # distinct, no stopwords
    docs = {
        # doc 0: eval holdout (0 % 97 == 0) — also the contamination source
        0: _doc("alpha", "beta", "gamma", *filler),
        # doc 1: too short → quality (even though it has a stopword)
        1: _doc("the", "tiny", "doc"),
        # doc 2: 30 repeats → distinct ratio 1/30 < 2/5 → quality
        2: _doc(*(["word"] * 30)),
        # doc 3: long + distinct but ZERO stopword hits → langid
        3: _doc(*filler, "zz1", "zz2", "zz3"),
        # docs 4, 5: identical 3-token prefix, both otherwise clean →
        # 4 keeps (lowest doc_id), 5 is duplicate
        4: _doc("the", "p1", "p2", *[f"a{i}" for i in range(20)]),
        5: _doc("the", "p1", "p2", *[f"b{i}" for i in range(20)]),
        # doc 6: clean but contains doc 0's "alpha beta gamma" shingle →
        # contaminated
        6: _doc("the", "c0", "alpha", "beta", "gamma", *[f"c{i}" for i in range(20)]),
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = curate_corpus(str(tmp_path)).to_pandas().set_index("doc_id")["verdict"]
    assert out[0] == "eval_holdout"
    assert out[1] == "quality" and out[2] == "quality"
    assert out[3] == "langid"
    assert out[4] == "kept" and out[5] == "duplicate"
    assert out[6] == "contaminated"
    assert len(out) == len(docs)  # exactly one verdict per doc
