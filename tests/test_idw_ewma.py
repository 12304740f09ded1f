"""IDW interpolation and integer EWMA — independent replays and properties."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines import events as ev
from osm_search_ray.pipelines import tiling
from osm_search_ray.sources.derived import knn_query_points, page_coords

SF = "/root/testdata/sf0.001"


def test_idw_matches_single_shot_numpy():
    d = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    hg, lat, lon = page_coords(d["doc_id"].to_numpy())
    v = d["n_chars"].to_numpy(np.int64)[hg]
    lat, lon = lat[hg], lon[hg]
    q = knn_query_points(SF).to_pandas()
    rows = []
    for _, r in q.iterrows():
        d2 = (r.qlat - lat) ** 2 + (r.qlon - lon) ** 2
        w = np.floor(1.0 / (d2 + 1e-6)).astype(np.int64)
        sw = int(w.sum())
        if sw > 0:
            rows.append((int(r.query_id), int((w > 0).sum()), (1000 * int((w * v).sum())) // sw))
    exp = pd.DataFrame(rows, columns=["query_id", "n_pages", "idw_milli"])
    got = tiling.idw_interpolate(SF).to_pandas().sort_values("query_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
    assert (got["n_pages"] > 0).all()


def test_ewma_matches_python_recurrence_and_tracks_pandas():
    e = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    e = e.sort_values(["user_id", "ts", "event_id"])
    exp = {}
    for _, g in e.groupby("user_id"):
        acc = None
        for eid, val in zip(g["event_id"], g["value"]):
            v = int(np.rint(val * 100))
            acc = v if acc is None else (ev.EWMA_NUM * v + (ev.EWMA_DEN - ev.EWMA_NUM) * acc) // ev.EWMA_DEN
            exp[int(eid)] = acc
    got = ev.events_ewma(SF).to_pandas()
    assert len(got) == len(e)
    for eid, val in zip(got["event_id"], got["ewma_cents"]):
        assert exp[int(eid)] == int(val)
    # fixed-point track stays within 1 cent-step of pandas' float ewm
    g1 = e[e["user_id"] == e["user_id"].iloc[0]]
    fl = g1["value"].mul(100).ewm(alpha=ev.EWMA_NUM / ev.EWMA_DEN, adjust=False).mean()
    ours = np.array([exp[int(i)] for i in g1["event_id"]], dtype=np.float64)
    assert np.max(np.abs(ours - fl.to_numpy())) < 5.0


def test_autocorr_tracks_numpy_corrcoef():
    e = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hour = e["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    g = hour.value_counts().sort_index()
    h0, h1 = int(g.index.min()), int(g.index.max())
    dense = np.zeros(h1 - h0 + 1)
    dense[g.index.to_numpy() - h0] = g.to_numpy()
    r = np.corrcoef(dense[:-1], dense[1:])[0, 1]
    got = ev.events_autocorr(SF).to_pandas()
    assert int(got["n_pairs"].iloc[0]) == len(dense) - 1
    assert abs(int(got["autocorr_x1e9"].iloc[0]) / 1e9 - r) < 1e-6


def test_activity_bursts_match_interval_union_replay():
    """Engine islands == a literal interval-union replay (merge [t-1h, t+1h]
    spans pairwise), proving the Δt>2·pad shortcut implements the union."""
    e = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"]).to_pandas()
    e = e.sort_values(["user_id", "ts", "event_id"])
    P = ev.BURST_PAD_US
    exp = []
    for uid, g in e.groupby("user_id", sort=True):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        islands = []
        for x in t:
            s0, e0 = x - P, x + P
            if islands and s0 <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e0)
                islands[-1][2] += 1
            else:
                islands.append([s0, e0, 1])
        for i, (s0, e0, n) in enumerate(islands):
            exp.append((int(uid), i, s0, e0, n))
    got = (
        ev.activity_bursts(SF)
        .to_pandas()
        .sort_values(["user_id", "island"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(exp) < len(e), "fixture must merge some spans"
    assert list(map(tuple, got.astype(np.int64).to_numpy())) == exp
