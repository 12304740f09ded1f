"""Property-based checks (hypothesis) for the exchange/join primitives the
whole engine rides on: attach_columns vs a pandas-merge ground truth over
randomized key distributions, payload types and bucket counts, and
hash_partitioned_apply's whole-key-group guarantee."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from osm_search_ray.stages.joins import attach_columns, hash_partitioned_apply

_SETTINGS = dict(
    max_examples=12,  # each example spins Ray datasets — keep the run short
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def join_case(draw):
    n_left = draw(st.integers(0, 120))
    n_keys = draw(st.integers(1, 25))
    buckets = draw(st.integers(1, 7))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys * 2, n_left).astype(np.int64),  # half miss
            "payload": rng.integers(-5, 5, n_left).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.arange(n_keys, dtype=np.int64),
            "blob": [bytes(rng.integers(0, 255, rng.integers(0, 9)).astype(np.uint8)) for _ in range(n_keys)],
            "val": rng.integers(-100, 100, n_keys).astype(np.int64),
        }
    )
    return left, right, buckets


class TestAttachColumnsProperties:
    @settings(**_SETTINGS)
    @given(join_case())
    def test_equals_pandas_inner_merge(self, case):
        left, right, buckets = case
        want = left.merge(right, on="k", how="inner").rename(
            columns={"blob": "g", "val": "v"}
        )
        got = attach_columns(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            cols={"blob": "g", "val": "v"},
            num_buckets=buckets,
        ).to_pandas()
        if len(want) == 0:
            # Ray 2.49 drops the schema of all-empty block sets on
            # to_pandas (the documented empty-block wart grouped_apply_
            # bounded works around) — row-count equality is the invariant
            assert len(got) == 0
            return
        key = ["k", "payload", "g", "v"]
        want_s = want[key].sort_values(key).reset_index(drop=True)
        got_s = got[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got_s.astype(want_s.dtypes.to_dict()), want_s)


class TestHashPartitionedApplyProperties:
    @settings(**_SETTINGS)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 9))
    def test_whole_key_groups(self, seed, parts):
        """Every key's rows land in exactly ONE partition call — the
        invariant every partial-aggregation kernel in the repo assumes."""
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 300))
        df = pd.DataFrame({"k": rng.integers(0, 40, n).astype(np.int64)})

        def label(part: pd.DataFrame) -> pd.DataFrame:
            # one distinct label per partition CALL: min key is unique per
            # call because whole key groups co-locate
            out = part.groupby("k", as_index=False).size()
            out["call_min"] = np.int64(part["k"].min())
            return out

        got = hash_partitioned_apply(
            ray.data.from_pandas(df), "k", label, num_parts=parts
        ).to_pandas()
        # each key appears exactly once across all partition outputs,
        # with its full count
        want = df.groupby("k", as_index=False).size()
        g = got.sort_values("k").reset_index(drop=True)[["k", "size"]]
        w = want.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(g.astype(w.dtypes.to_dict()), w)


class TestScanPrimitivesProperties:
    @settings(**_SETTINGS)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 6))
    def test_zip_with_index_dense_in_sort_order(self, seed, blocks):
        from osm_search_ray.stages.joins import zip_with_index

        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 500))
        df = pd.DataFrame({"v": rng.integers(-50, 50, n).astype(np.int64)})
        ds = ray.data.from_pandas(df).repartition(blocks).sort("v")
        out = zip_with_index(ds, "row_id").to_pandas()
        assert len(out) == n
        # dense 0..n-1, and row_id order == sort order
        assert sorted(out["row_id"]) == list(range(n))
        o = out.sort_values("row_id")
        assert (np.diff(o["v"].to_numpy()) >= 0).all()

    @settings(**_SETTINGS)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 6))
    def test_prefix_max_exclusive_matches_cummax(self, seed, blocks):
        from osm_search_ray.stages.joins import PREFIX_SENTINEL, prefix_max_exclusive, zip_with_index

        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 400))
        df = pd.DataFrame(
            {
                "t": np.sort(rng.integers(0, 1000, n)).astype(np.int64),
                "v": rng.integers(-100, 100, n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(blocks).sort("t")
        out = prefix_max_exclusive(zip_with_index(ds, "rid"), "v").to_pandas()
        o = out.sort_values("rid").reset_index(drop=True)
        v = o["v"].to_numpy()
        want = np.empty(n, np.int64)
        want[0] = PREFIX_SENTINEL
        if n > 1:
            np.maximum.accumulate(v[:-1], out=want[1:])
        assert (o["prev_max"].to_numpy(np.int64) == want).all()
