"""Training-data prep operators: deterministic split + sequence packing
(pipelines/traindata.py; DuckDB oracles cover exact parity — these tests
cover the INVARIANTS the oracles can't express)."""

import numpy as np
import ray.data

from osm_search_ray.pipelines import traindata as td

SF = "/root/testdata/sf0.001"


def test_split_deterministic_and_partition_invariant():
    a = td.train_val_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = td.train_val_split(SF)
    b = b.repartition(7).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    frac = (a["split"] == "train").mean()
    assert 0.7 < frac < 0.9, frac  # ~80% by hash bucket


def test_pack_sequences_invariants():
    out = td.pack_sequences(SF, ctx=128).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # global prefix sum: start offsets are the exclusive cumsum of counts
    np.testing.assert_array_equal(
        out["start_off"].to_numpy(),
        np.concatenate([[0], np.cumsum(out["n_tokens"].to_numpy())[:-1]]),
    )
    assert (out["window_id"] == out["start_off"] // 128).all()
    assert (out["start_in_window"] == out["start_off"] % 128).all()
    # windows are dense from 0
    w = out["window_id"].to_numpy()
    assert w.min() == 0 and set(np.diff(np.unique(w))) <= {1}
