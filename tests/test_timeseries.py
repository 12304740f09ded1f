"""Gap-fill resample, LAG delta, URL canonicalization — structural
invariants beyond the SQL hash check."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_events_gapfill_is_dense_per_type():
    from osm_search_ray.pipelines.events import events_gapfill

    df = events_gapfill(SF).to_pandas()
    assert (df["n_events"] >= 0).all()
    for _, g in df.groupby("event_type"):
        hb = np.sort(g["hour_bucket"].to_numpy())
        assert (np.diff(hb) == 1).all(), "hour grid must be gapless"
    assert (df["n_events"] == 0).any(), "fixture should contain real gaps"


def test_events_lag_delta_matches_pandas_window():
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.events import events_lag_delta

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    want = (
        (ev["ts_us"] - ev.groupby("user_id")["ts_us"].shift(1))
        .fillna(-1)
        .astype(np.int64)
        .set_axis(ev["event_id"])
    )
    got = events_lag_delta(SF).to_pandas().set_index("event_id")["delta_us"]
    assert len(got) == len(want)
    assert (got.reindex(want.index) == want).all()


def test_url_canonical_collapses_all_variant_classes():
    from osm_search_ray.pipelines.webcorpus import url_canonical

    df = url_canonical(SF).to_pandas()
    assert df["url"].str.startswith("https://site").all()
    assert not df["url"].str.contains("[?#A-Z]", regex=True).any()
    assert not df["url"].str.endswith("/").any()
    # 3 docs share each page url and every doc contributes one messy row
    assert df["n_variants"].sum() == 500


def test_prefix_max_exclusive_across_blocks():
    import pyarrow as pa
    import ray
    import ray.data

    from osm_search_ray.stages.joins import PREFIX_SENTINEL, prefix_max_exclusive

    rng = np.arange(1000, dtype=np.int64)
    vals = (rng * 48271 + 7) % 1000  # shuffled values, sorted order = rng
    ds = ray.data.from_arrow_refs(
        [ray.put(pa.table({"i": pa.array(rng[k : k + 100]), "v": pa.array(vals[k : k + 100])}))
         for k in range(0, 1000, 100)]
    )
    got = prefix_max_exclusive(ds, "v").to_pandas().sort_values("i")
    want = np.concatenate([[PREFIX_SENTINEL], np.maximum.accumulate(vals)[:-1]])
    assert (got["prev_max"].to_numpy() == want).all()


def test_late_events_has_both_classes():
    from osm_search_ray.pipelines.events import late_events

    import pyarrow.parquet as pq

    df = late_events(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert df["n_late"].sum() > 0 and df["n_ontime"].sum() > 0
    assert int(df["n_late"].sum() + df["n_ontime"].sum()) == n


def test_events_range_sum_peer_rows_and_boundary(tmp_path):
    """RANGE-frame semantics on planted data: tied timestamps are peers
    (same frame sum), the left boundary is exclusive at exactly window_us,
    and burst rows aggregate the whole burst."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.events import RANGE_WINDOW_US, events_range_sum

    H = RANGE_WINDOW_US
    base = 1_700_000_000_000_000
    rows = [  # (event_id, ts_us, value)
        (1, base, 1.0),
        (2, base, 2.0),          # peer of 1: both frames must sum 1+2
        (3, base + H - 1, 4.0),  # still inside 1h of base
        (4, base + H, 8.0),      # exactly window later: base rows EXCLUDED
        (5, base + 3 * H, 16.0), # isolated
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([7] * len(rows), pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = events_range_sum(str(tmp_path)).to_pandas().set_index("event_id")["range_sum_cents"]
    assert got.loc[1] == got.loc[2] == 300          # peers share the frame
    assert got.loc[3] == 700                        # 1+2+4 inside the hour
    assert got.loc[4] == 1200                       # 4+8: base peers aged out
    assert got.loc[5] == 1600                       # isolated burst


def test_prefix_sum_inclusive_across_blocks():
    import pyarrow as pa
    import ray
    import ray.data

    from osm_search_ray.stages.joins import prefix_sum_inclusive

    rng = np.arange(1000, dtype=np.int64)
    vals = ((rng * 48271 + 7) % 5) - 2  # mixed-sign deltas
    ds = ray.data.from_arrow_refs(
        [ray.put(pa.table({"i": pa.array(rng[k : k + 100]), "v": pa.array(vals[k : k + 100])}))
         for k in range(0, 1000, 100)]
    )
    got = prefix_sum_inclusive(ds, "v").to_pandas().sort_values("i")
    assert (got["run_sum"].to_numpy() == np.cumsum(vals)).all()


def test_session_concurrency_planted_overlaps(tmp_path):
    """Sweep-line tie rules on planted sessions: a session ending at t
    overlaps one starting at t (closed intervals); equal-instant starts are
    serialized by (user_id, session_idx); disjoint sessions count 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.events import session_concurrency

    base = 1_700_000_000_000_000
    M = 60 * 1_000_000
    rows = [  # (event_id, ts_us, user_id)
        (1, base, 1), (2, base + 10 * M, 1),            # u1 s0: [0, 10m]
        (3, base + 10 * M, 2), (4, base + 20 * M, 2),   # u2 s0: [10m, 20m] starts AT u1's end
        (5, base + 10 * M, 3),                           # u3 s0: [10m, 10m] same instant as u2
        (6, base + 100 * M, 1),                          # u1 s1: [100m, 100m] disjoint
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = (
        session_concurrency(str(tmp_path))
        .to_pandas()
        .set_index(["user_id", "session_idx"])["concurrency"]
    )
    assert df.loc[(1, 0)] == 1          # first open
    assert df.loc[(2, 0)] == 2          # u1 still open at 10m (closed interval)
    assert df.loc[(3, 0)] == 3          # same instant, later key: sees u2's +1
    assert df.loc[(1, 1)] == 1          # everything else closed by 100m
