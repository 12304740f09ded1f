"""Round-5 operators: props_extract_stats (semi-structured extraction),
unpivot_revenue (melt), percent_rank_orders (RANK-tie window) — each
replayed brute-force against the same parquet inputs."""

import json
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestPropsExtractStats:
    def test_matches_json_replay(self):
        from osm_search_ray.pipelines.events import props_extract_stats

        got = (
            props_extract_stats(SF)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        df = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "props"]).to_pandas()
        df["k"] = [int(json.loads(p)["k"]) for p in df["props"]]
        want = (
            df.groupby("event_type")
            .agg(n_events=("k", "size"), sum_k=("k", "sum"), n_distinct_k=("k", "nunique"))
            .reset_index()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


class TestUnpivotRevenue:
    def test_matches_long_replay(self):
        from osm_search_ray.pipelines.relational import unpivot_revenue

        got = (
            unpivot_revenue(SF)
            .to_pandas()
            .sort_values(["l_returnflag", "linestatus"])
            .reset_index(drop=True)
        )
        df = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
        ).to_pandas()
        price_c = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        df["rev"] = price_c * (100 - disc)
        long = (
            df.groupby(["l_returnflag", "l_linestatus"])["rev"].sum().reset_index()
        ).rename(columns={"l_linestatus": "linestatus", "rev": "revenue_x10000"})
        # the wide form carries a zero cell for absent (flag, status) combos
        flags = sorted(df["l_returnflag"].unique())
        full = pd.MultiIndex.from_product([flags, ["F", "O"]], names=["l_returnflag", "linestatus"])
        want = (
            long.set_index(["l_returnflag", "linestatus"])
            .reindex(full, fill_value=0)
            .reset_index()
            .sort_values(["l_returnflag", "linestatus"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)

    def test_melt_is_pivot_inverse(self):
        """Every wide cell appears exactly once in the long form."""
        from osm_search_ray.pipelines.relational import unpivot_revenue

        got = unpivot_revenue(SF).to_pandas()
        assert not got.duplicated(["l_returnflag", "linestatus"]).any()
        assert set(got["linestatus"]) == {"F", "O"}


class TestPercentRankOrders:
    def test_matches_pandas_rank(self):
        from osm_search_ray.pipelines.relational import percent_rank_orders

        got = (
            percent_rank_orders(SF)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        df = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]).to_pandas()
        cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        rank = pd.Series(cents).rank(method="min").astype(np.int64)  # RANK() ties
        n = len(df)
        want = pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "cents": cents,
                "pr_micro": 1_000_000 * (rank.to_numpy() - 1) // max(n - 1, 1),
            }
        ).sort_values("o_orderkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)

    def test_bounds_and_ties(self):
        from osm_search_ray.pipelines.relational import percent_rank_orders

        got = percent_rank_orders(SF).to_pandas()
        assert got["pr_micro"].min() == 0
        assert got["pr_micro"].max() <= 1_000_000
        # tied cents share pr
        g = got.groupby("cents")["pr_micro"].nunique()
        assert (g == 1).all()
