"""pip_anti_join / clustering_coeff / bounce_rate / track_speed units."""

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines import events as ev
from osm_search_ray.pipelines import geofence_pipeline as gf
from osm_search_ray.pipelines import graph as gr
from osm_search_ray.pipelines import tiling
from osm_search_ray.sources import derived as dv

SF = "/root/testdata/sf0.001"


def test_pip_anti_join_is_exact_complement():
    anti = set(tiling.pip_anti_join(SF).to_pandas()["doc_id"])
    joined = set(tiling.pip_join(SF).to_pandas()["doc_id"])
    everything = set(dv.geo_pages(SF).to_pandas()["doc_id"])
    assert anti | joined == everything
    assert not (anti & joined)


def test_clustering_coeff_matches_bruteforce():
    got = (
        gr.clustering_coeff(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    e = dv.link_edges(SF).to_pandas()
    und = set()
    for s, d in zip(e["src"], e["dst"]):
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for n_, nb in sorted(adj.items()):
        deg = len(nb)
        if deg < 2:
            continue
        t = sum(1 for x, y in itertools.combinations(sorted(nb), 2) if (x, y) in und)
        rows.append((n_, deg, t, 2_000_000 * t // (deg * (deg - 1))))
    exp = pd.DataFrame(rows, columns=["doc_id", "deg", "n_triangles", "coeff_micro"])
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64)
    )


def test_bounce_rate_matches_pandas():
    got = ev.bounce_rate(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    e = pq.read_table(f"{SF}/events.parquet").to_pandas()
    e = e.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id", sort=True):
        gaps = g["ts"].diff().dt.total_seconds().fillna(np.inf)
        sess = (gaps > ev.BOUNCE_GAP_MIN * 60).cumsum()
        sizes = sess.value_counts()
        s, b = len(sizes), int((sizes == 1).sum())
        rows.append((uid, s, b, 1_000_000 * b // s))
    exp = pd.DataFrame(rows, columns=["user_id", "n_sessions", "n_bounces", "bounce_micro"])
    pd.testing.assert_frame_equal(got.astype({"user_id": exp["user_id"].dtype}), exp)


def test_track_speed_matches_pandas():
    from osm_search_ray.functions.geometry import haversine_km

    got = gf.track_speed(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    p = dv.fence_points(SF).to_pandas().sort_values(
        ["point_id", "ts", "event_id"], kind="mergesort"
    )
    rows = []
    for pid, g in p.groupby("point_id", sort=False):
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ei = g["event_id"].to_numpy()
        for i in range(1, len(g)):
            dt = ts[i] - ts[i - 1]
            if dt <= 0:
                continue
            kmh = float(haversine_km(lat[i - 1], lon[i - 1], lat[i], lon[i])) / dt * 3.6e9
            rows.append((ei[i], pid, int(np.rint(kmh * 1000.0))))
    exp = (
        pd.DataFrame(rows, columns=["event_id", "point_id", "kmh_milli"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"kmh_milli": np.int64}), exp.astype({c: got[c].dtype for c in exp.columns})
    )
