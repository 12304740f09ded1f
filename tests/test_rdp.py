"""RDP track simplification == an independent PURE-RECURSIVE replay, plus
endpoint/coverage invariants."""

import numpy as np
import pandas as pd

from osm_search_ray.pipelines import geofence_pipeline as gf
from osm_search_ray.sources.derived import fence_points

SF = "/root/testdata/sf0.001"


def _rdp_recursive(lat, lon, eps):
    keep = set()

    def rec(i0, i1):
        keep.add(i0)
        keep.add(i1)
        if i1 - i0 < 2:
            return
        best_j, best_c = None, -1.0
        for j in range(i0 + 1, i1):
            c = abs(
                (lat[i1] - lat[i0]) * (lon[j] - lon[i0])
                - (lon[i1] - lon[i0]) * (lat[j] - lat[i0])
            )
            if c > best_c:
                best_j, best_c = j, c
        if best_c > eps:
            rec(i0, best_j)
            rec(best_j, i1)

    rec(0, len(lat) - 1)
    return sorted(keep)


def test_rdp_tracks_match_recursive_replay():
    pts = fence_points(SF).to_pandas().sort_values(["point_id", "ts", "event_id"])
    rows = []
    for pid, g in pts.groupby("point_id", sort=True):
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        ev = g["event_id"].to_numpy(np.int64)
        idx = _rdp_recursive(lat, lon, gf.RDP_EPS_CROSS) if len(g) > 1 else [0]
        rows += [(pid, int(ev[i])) for i in idx]
    exp = (
        pd.DataFrame(rows, columns=["point_id", "event_id"])
        .sort_values(["point_id", "event_id"])
        .reset_index(drop=True)
    )
    got = (
        gf.rdp_tracks(SF)
        .to_pandas()
        .sort_values(["point_id", "event_id"])
        .reset_index(drop=True)
    )
    n_total = len(pts)
    assert len(exp) < n_total, "fixture must actually simplify"
    # every track keeps its first and last point
    firsts = pts.groupby("point_id").head(1)[["point_id", "event_id"]]
    lasts = pts.groupby("point_id").tail(1)[["point_id", "event_id"]]
    kept_keys = set(map(tuple, got.to_numpy()))
    for df in (firsts, lasts):
        for t in map(tuple, df.to_numpy()):
            assert t in kept_keys
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_fence_dwell_matches_pandas_replay():
    import pandas as pd

    from osm_search_ray.functions.geometry import haversine_km
    from osm_search_ray.sources.derived import fence_circles

    sf = "/root/testdata/sf0.01"
    pts = fence_points(sf).to_pandas().sort_values(["point_id", "ts", "event_id"])
    circles = fence_circles(sf)
    rows = {}
    for pid, g in pts.groupby("point_id", sort=True):
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        for _, c in circles.iterrows():
            inside = haversine_km(lat, lon, c["lat"], c["lon"]) <= c["radius_km"]
            m = inside[1:] & inside[:-1]
            if m.any():
                rows[(int(pid), int(c["key"]))] = (
                    int((ts[1:] - ts[:-1])[m].sum()),
                    int(m.sum()),
                )
    got = gf.fence_dwell(sf).to_pandas()
    assert len(got) == len(rows) > 0
    for pid, key, dw, ns in got.itertuples(index=False):
        assert rows[(int(pid), int(key))] == (int(dw), int(ns))
