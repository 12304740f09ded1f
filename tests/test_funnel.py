"""Windowed funnel + FULL OUTER viewers/buyers: oracle parity, a planted
micro-fixture pinning the window/order semantics, and side-flag algebra."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_search_ray.pipelines import events as ev

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    return c


def _cmp(ds_res, sql, sf=SF):
    got = ds_res.to_pandas().sort_values("user_id").reset_index(drop=True)
    want = _con(sf).execute(sql).df().sort_values("user_id").reset_index(drop=True)
    want = want.astype({c: got[c].dtype for c in got.columns})[got.columns]
    pd.testing.assert_frame_equal(got, want)
    return got


class TestOracleParity:
    def test_funnel_matches_sql(self):
        got = _cmp(ev.events_funnel(SF), ev.SQL_EVENTS_FUNNEL)
        # the 6h window must actually differentiate on the fixture
        assert got["steps_completed"].nunique() >= 2

    def test_full_outer_matches_sql(self):
        _cmp(ev.viewers_full_outer_buyers(SF), ev.SQL_VIEWERS_FULL_OUTER_BUYERS)


class TestFunnelSemantics:
    def test_planted_window_and_order(self, tmp_path):
        """Micro-fixture: step order is strict, the window is inclusive at
        exactly +window, and out-of-window completions don't count."""
        W = ev.FUNNEL_WINDOW_US
        base = 1_700_000_000_000_000
        rows = [
            # u1: completes all three inside windows (click exactly at +W)
            (1, base, "view"), (1, base + W, "click"), (1, base + W + 5, "purchase"),
            # u2: click 1us past the window -> stuck at step 1
            (2, base, "view"), (2, base + W + 1, "click"), (2, base + W + 2, "purchase"),
            # u3: click BEFORE view -> order violated, stuck at step 1
            (3, base + 10, "click"), (3, base + 20, "view"),
            # u4: purchase only -> 0 steps (not in funnel start)
            (4, base, "purchase"),
        ]
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, tmp_path / "events.parquet")
        got = _cmp(ev.events_funnel(str(tmp_path)), ev.SQL_EVENTS_FUNNEL, str(tmp_path))
        by_user = got.set_index("user_id")["steps_completed"]
        assert by_user.loc[1] == 3
        assert by_user.loc[2] == 1
        assert by_user.loc[3] == 1
        assert by_user.loc[4] == 0

    def test_sentinels_consistent(self):
        got = ev.events_funnel(SF).to_pandas()
        for i, col in enumerate(["t1_us", "t2_us", "t3_us"], start=1):
            reached = got["steps_completed"] >= i
            assert (got.loc[reached, col] > 0).all()
            assert (got.loc[~reached, col] == -1).all()
        # step times strictly increase where reached
        m = got[got["steps_completed"] == 3]
        assert (m["t1_us"] < m["t2_us"]).all() and (m["t2_us"] < m["t3_us"]).all()


class TestFullOuterSemantics:
    def test_side_flag_algebra(self):
        got = ev.viewers_full_outer_buyers(SF).to_pandas()
        both = got["side"] == "both"
        assert ((got.loc[both, "n_view"] > 0) & (got.loc[both, "n_purchase"] > 0)).all()
        vo = got["side"] == "view_only"
        assert (got.loc[vo, "n_purchase"] == 0).all() and (got.loc[vo, "n_view"] > 0).all()
        po = got["side"] == "purchase_only"
        assert (got.loc[po, "n_view"] == 0).all() and (got.loc[po, "n_purchase"] > 0).all()

    def test_totals_conserved(self):
        got = ev.viewers_full_outer_buyers(SF).to_pandas()
        want = _con().execute(
            "SELECT COUNT(*) FILTER (WHERE event_type='view') AS v,"
            " COUNT(*) FILTER (WHERE event_type='purchase') AS p FROM events"
        ).df()
        assert got["n_view"].sum() == want["v"].iloc[0]
        assert got["n_purchase"].sum() == want["p"].iloc[0]


class TestRetentionCohorts:
    def test_matches_sql(self):
        got = (
            ev.retention_cohorts(SF)
            .to_pandas()
            .sort_values(["cohort_week", "week_k"])
            .reset_index(drop=True)
        )
        want = (
            _con()
            .execute(ev.SQL_RETENTION_COHORTS)
            .df()
            .sort_values(["cohort_week", "week_k"])
            .reset_index(drop=True)
            .astype({c: got[c].dtype for c in got.columns})[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_week_zero_counts_whole_cohort(self):
        """Every user is active in their own first week, so week_k=0 rows
        must count the full cohort, and no week_k is negative."""
        got = ev.retention_cohorts(SF).to_pandas()
        assert (got["week_k"] >= 0).all()
        w0 = got[got["week_k"] == 0].set_index("cohort_week")["n_users"]
        per_cohort_max = got.groupby("cohort_week")["n_users"].max()
        assert (w0 >= per_cohort_max.loc[w0.index]).all()
