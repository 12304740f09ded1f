"""Co-visitation pairs + next-event transitions: oracle parity at sf0.001
and planted micro-fixtures pinning the per-user cap and the user-boundary
mask (the two places a vectorized clickstream kernel silently goes wrong)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osm_search_ray.pipelines import events as ev

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    return c


class TestOracleParity:
    def test_covisit_matches_sql(self):
        got = (
            ev.covisit_pairs(SF)
            .to_pandas()
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
        want = (
            _con()
            .execute(ev.SQL_COVISIT_PAIRS)
            .df()
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want.astype({c: got[c].dtype for c in got.columns}))
        assert (got["item_a"] < got["item_b"]).all()

    def test_transitions_match_sql(self):
        got = ev.next_transitions(SF)
        want = (
            _con()
            .execute(ev.SQL_NEXT_TRANSITIONS)
            .df()
            .sort_values(["from_type", "to_type"], kind="mergesort")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want.astype({c: got[c].dtype for c in got.columns}))
        # every from_type's probabilities floor-sum to <= 1e6 (exact floor)
        s = got.groupby("from_type")["p_micro"].sum()
        assert ((s <= ev.TRANSITION_SCALE) & (s > ev.TRANSITION_SCALE - 25)).all()


def _events_table(rows):
    """rows: (event_id, ts_us, user_id, event_type, item_k)"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(['{"k": %d}' % r[4] for r in rows]),
        }
    )


class TestPlanted:
    def test_covisit_cap_keeps_first_seen(self, tmp_path):
        # user 0 views cap+2 distinct items; only the first `cap` by
        # (first_ts, item) may pair up. Re-views must not re-rank.
        import pyarrow.parquet as pq

        cap = 3
        rows = []
        for i, item in enumerate([10, 11, 12, 13, 14]):
            rows.append((i, 1_000_000 * (i + 1), 0, "view", item))
        rows.append((99, 500_000, 0, "view", 10))  # earlier re-view of item 10
        pq.write_table(_events_table(rows), tmp_path / "events.parquet")
        got = (
            ev.covisit_pairs(str(tmp_path), cap=cap)
            .to_pandas()
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
        # capped set is {10, 11, 12}: 3 pairs, each from the single user
        assert got["item_a"].tolist() == [10, 10, 11]
        assert got["item_b"].tolist() == [11, 12, 12]
        assert (got["n_users"] == 1).all()

    def test_transitions_do_not_cross_users(self, tmp_path):
        import pyarrow.parquet as pq

        rows = [
            (0, 1_000_000, 0, "view", 1),
            (1, 2_000_000, 0, "click", 1),
            # user 1 interleaves in time — no (click→signup) cross-user edge
            (2, 3_000_000, 1, "signup", 1),
            (3, 4_000_000, 1, "view", 1),
        ]
        pq.write_table(_events_table(rows), tmp_path / "events.parquet")
        got = ev.next_transitions(str(tmp_path))
        assert got[["from_type", "to_type"]].values.tolist() == [
            ["signup", "view"],
            ["view", "click"],
        ]
        assert (got["n"] == 1).all()
        assert (got["p_micro"] == ev.TRANSITION_SCALE).all()
