"""Geofence batch flow over derived tables, with a full SQL oracle.

The status logic (3-NN fences, contains, transitions, segment×circle CROSS)
is written once vectorized in stages/geofence.py and once below in SQL —
identical float64 expressions so DuckDB verifies every emitted status row.
"""

from __future__ import annotations

from ..sources import derived as dv
from ..stages.geofence import fence_status_flow


def geofence_status(sf_dir: str):
    """(event_id, fence_key, status) for every event × its 3 nearest fences."""
    return fence_status_flow(dv.fence_points(sf_dir), dv.fence_circles(sf_dir))


def _sql() -> str:
    hav_cur = dv.SQL_HAVERSINE.format(lat1="flat", lon1="flon", lat2="lat", lon2="lon")
    hav_prev = dv.SQL_HAVERSINE.format(lat1="flat", lon1="flon", lat2="plat", lon2="plon")
    # equirectangular ranking metric — degrees into a radians-shaped formula
    # (the reference quirk, pkg/datastructure/distance.go:31-35)
    equirect = "(6371.0 * sqrt(((flon - lon) * cos(0.5 * (flat + lat))) * ((flon - lon) * cos(0.5 * (flat + lat))) + (flat - lat) * (flat - lat)))"
    # projection constants (pkg/datastructure/circle.go:44-46, R=6371007 m)
    return f"""
WITH {dv.SQL_FENCE_POINTS.strip()}, {dv.SQL_FENCE_CIRCLES.strip()},
prevs AS (
    SELECT event_id, point_id, ts, lat, lon,
           COALESCE(LAG(lat) OVER w, -999.0) AS plat,
           COALESCE(LAG(lon) OVER w, -999.0) AS plon
    FROM fence_points
    WINDOW w AS (PARTITION BY point_id ORDER BY ts, event_id)
),
nn AS (
    SELECT p.event_id, p.lat, p.lon, p.plat, p.plon,
           f.key, f.flat, f.flon, f.radius_km,
           ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY {equirect}, f.key) AS rn
    FROM prevs p CROSS JOIN fence_circles f
),
cand AS (
    SELECT *, ({hav_cur} <= radius_km) AS cur_in,
           (plat <> -999.0 AND {hav_prev} <= radius_km) AS old_in
    FROM nn WHERE rn <= 3
),
geomc AS (
    SELECT *,
           radians(plat) * 6371007.0 AS a_lat,
           radians(plon) * 6371007.0 * cos(radians(flat)) AS a_lon,
           radians(lat) * 6371007.0 AS b_lat,
           radians(lon) * 6371007.0 * cos(radians(flat)) AS b_lon,
           radians(flat) * 6371007.0 AS c_lat,
           radians(flon) * 6371007.0 * cos(radians(flat)) AS c_lon,
           radius_km * 1000.0 AS r_m
    FROM cand
),
quad AS (
    SELECT *,
           (b_lat - a_lat) * (b_lat - a_lat) + (b_lon - a_lon) * (b_lon - a_lon) AS alpha,
           (b_lat - a_lat) * (a_lat - c_lat) + (b_lon - a_lon) * (a_lon - c_lon) AS beta,
           (a_lat - c_lat) * (a_lat - c_lat) + (a_lon - c_lon) * (a_lon - c_lon) - r_m * r_m AS gamma
    FROM geomc
),
crossx AS (
    SELECT *,
           CASE WHEN beta * beta - alpha * gamma >= 0 AND (
                ((-beta + sqrt(beta * beta - alpha * gamma)) / alpha BETWEEN 0 AND 1) OR
                ((-beta - sqrt(beta * beta - alpha * gamma)) / alpha BETWEEN 0 AND 1))
           THEN TRUE ELSE FALSE END AS crossed
    FROM quad
),
primary_rows AS (
    SELECT event_id, key AS fence_key,
           CASE WHEN old_in AND cur_in THEN 'INSIDE'
                WHEN old_in AND NOT cur_in THEN 'EXIT'
                WHEN NOT old_in AND cur_in THEN 'ENTER'
                WHEN crossed THEN 'CROSS'
                ELSE 'OUTSIDE' END AS status
    FROM crossx
),
secondary_rows AS (
    SELECT event_id, key AS fence_key,
           CASE WHEN cur_in THEN 'INSIDE' ELSE 'OUTSIDE' END AS status
    FROM crossx WHERE old_in <> cur_in
)
SELECT event_id, fence_key, status FROM primary_rows
UNION ALL
SELECT event_id, fence_key, status FROM secondary_rows
"""


SQL_GEOFENCE_STATUS = _sql()


# ----------------------------------------------------- track segment speeds


def track_speed(sf_dir: str):
    """Per-entity TRACK SEGMENT SPEEDS — the trajectory-enrichment pass over
    the geofence point log: for every consecutive point pair of an entity
    (ordered by ts, event_id), the great-circle km/h of the segment. The
    distance is the engine haversine (functions/geometry.haversine_km, the
    reference formula pkg/datastructure/distance.go:19-28) whose SQL twin is
    bit-identical; speed = hav / dt_us * 3.6e9 in the SAME float op order on
    both sides, emitted as kmh_milli (ROUND × 1000 — a scaled BIGINT).

    Shape: ONE entity-keyed exchange; inside the partition a vectorized
    sort + shift produces every segment at once. Zero-dt segments are
    dropped on both sides. Output (event_id, point_id, kmh_milli)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.geometry import haversine_km
    from ..stages.joins import hash_partitioned_apply

    pts = dv.fence_points(sf_dir)

    def per_part(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = ["event_id", "point_id", "kmh_milli"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        df = df.sort_values(["point_id", "ts", "event_id"], kind="mergesort")
        pid = df["point_id"].to_numpy()
        same = np.concatenate([[False], pid[1:] == pid[:-1]])
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        # pin µs resolution before the int cast (pandas may carry ns or us)
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        dt = np.concatenate([[np.int64(0)], ts_us[1:] - ts_us[:-1]])
        keep = same & (dt > 0)
        hav = haversine_km(
            np.concatenate([[0.0], lat[:-1]])[keep],
            np.concatenate([[0.0], lon[:-1]])[keep],
            lat[keep],
            lon[keep],
        )
        kmh = hav / dt[keep].astype(np.float64) * 3.6e9
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[keep],
                "point_id": pid[keep],
                "kmh_milli": np.rint(kmh * 1000.0).astype(np.int64),
            }
        )

    return hash_partitioned_apply(pts, "point_id", per_part, num_parts=32)


def sql_track_speed() -> str:
    hav = dv.SQL_HAVERSINE.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")
    return f"""
WITH {dv.SQL_FENCE_POINTS.strip()},
seq AS (
    SELECT event_id, point_id, lat, lon,
           LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dt_us
    FROM fence_points
    WINDOW w AS (PARTITION BY point_id ORDER BY ts, event_id)
)
SELECT event_id, point_id,
       CAST(ROUND({hav} / CAST(dt_us AS DOUBLE) * 3600000000.0 * 1000.0) AS BIGINT) AS kmh_milli
FROM seq WHERE plat IS NOT NULL AND dt_us > 0
"""


RDP_EPS_CROSS = 0.1  # |cross-product| threshold (deg^2-scaled, division-free)


def rdp_tracks(sf_dir: str):
    """Per-entity POLYLINE SIMPLIFICATION — Ramer-Douglas-Peucker with the
    DIVISION-FREE cross-product criterion: a segment (i0, i1) splits at its
    max-|cross| interior point when that exceeds RDP_EPS_CROSS, where
    cross_j = (lat1−lat0)(lon_j−lon0) − (lon1−lon0)(lat_j−lat0) — pure
    subtract/multiply on the shared derived doubles, so the engine replay
    and the SQL recursive CTE compare bit-identical values (no sqrt, no
    divide; ties broken by smallest index = numpy first-argmax = ORDER BY
    maxc DESC, i ASC). Track order is (ts, event_id), endpoints always
    kept; single-point tracks survive whole.

    Shape: ONE entity-keyed exchange (tracks are the partition unit — the
    trajectory family's standing assumption, cf. track_speed); per track an
    explicit-stack loop whose per-level work is one vectorized cross-product
    scan. Output (point_id, event_id) of kept points."""
    import numpy as np
    import pandas as pd

    from ..stages.joins import hash_partitioned_apply

    pts = dv.fence_points(sf_dir)

    def _keep_mask(lat: "np.ndarray", lon: "np.ndarray") -> "np.ndarray":
        n = len(lat)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            i0, i1 = stack.pop()
            if i1 - i0 < 2:
                continue
            c = np.abs(
                (lat[i1] - lat[i0]) * (lon[i0 + 1 : i1] - lon[i0])
                - (lon[i1] - lon[i0]) * (lat[i0 + 1 : i1] - lat[i0])
            )
            k = int(np.argmax(c))
            if c[k] > RDP_EPS_CROSS:
                j = i0 + 1 + k
                keep[j] = True
                stack.append((i0, j))
                stack.append((j, i1))
        return keep

    def per_part(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = ["point_id", "event_id"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        df = df.sort_values(["point_id", "ts", "event_id"], kind="mergesort")
        out_p, out_e = [], []
        for pid, g in df.groupby("point_id", sort=False):
            lat = g["lat"].to_numpy()
            lon = g["lon"].to_numpy()
            m = _keep_mask(lat, lon) if len(g) > 1 else np.ones(1, dtype=bool)
            ev = g["event_id"].to_numpy(np.int64)[m]
            out_p.append(np.full(len(ev), pid, dtype=np.int64))
            out_e.append(ev)
        return pd.DataFrame(
            {"point_id": np.concatenate(out_p), "event_id": np.concatenate(out_e)}
        )

    return hash_partitioned_apply(pts, "point_id", per_part, num_parts=32)


def sql_rdp_tracks() -> str:
    return f"""
WITH RECURSIVE {dv.SQL_FENCE_POINTS.strip()},
pts AS (SELECT point_id, event_id, lat, lon,
        ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY ts, event_id) - 1 AS i
        FROM fence_points),
lasts AS (SELECT point_id, MAX(i) AS last FROM pts GROUP BY 1),
segs(point_id, i0, i1) AS (
    SELECT point_id, CAST(0 AS BIGINT), CAST(last AS BIGINT) FROM lasts WHERE last >= 1
  UNION ALL
    SELECT s.point_id,
           CASE WHEN v.side = 0 THEN s.i0 ELSE jm.j END,
           CASE WHEN v.side = 0 THEN jm.j ELSE s.i1 END
    FROM segs s
    JOIN LATERAL (
        SELECT pj.i AS j, abs((p1.lat - p0.lat) * (pj.lon - p0.lon)
                            - (p1.lon - p0.lon) * (pj.lat - p0.lat)) AS maxc
        FROM pts pj
        JOIN pts p0 ON p0.point_id = s.point_id AND p0.i = s.i0
        JOIN pts p1 ON p1.point_id = s.point_id AND p1.i = s.i1
        WHERE pj.point_id = s.point_id AND pj.i > s.i0 AND pj.i < s.i1
        ORDER BY maxc DESC, pj.i ASC
        LIMIT 1
    ) jm ON jm.maxc > {RDP_EPS_CROSS}
    CROSS JOIN (VALUES (0), (1)) v(side)),
kept AS (
    SELECT point_id, i0 AS i FROM segs
    UNION SELECT point_id, i1 FROM segs
    UNION SELECT point_id, i FROM pts
     WHERE point_id IN (SELECT point_id FROM lasts WHERE last = 0))
SELECT p.point_id, p.event_id
FROM kept k JOIN pts p ON p.point_id = k.point_id AND p.i = k.i
"""


def fence_dwell(sf_dir: str):
    """Per-(entity, fence) DWELL TIME — total microseconds an entity's track
    spends fully inside each circular fence, counting a segment iff BOTH
    endpoints are inside (the conservative in-fence rule; no boundary
    interpolation). The utilisation/exposure KPI the transition log
    (geofence_status) doesn't give directly. Output
    (point_id, key, dwell_us, n_segs), rows with n_segs > 0.

    Shape: the 10 fence circles broadcast as a closure constant; ONE
    entity-keyed exchange (the trajectory family's partition unit); per
    partition a vectorized sort + shift produces every segment, one
    (segments × fences) haversine broadcast classifies endpoints — the
    bit-identical SQL_HAVERSINE twin on both sides, so the <= radius
    comparisons agree exactly. dt sums are exact int64 µs."""
    import numpy as np
    import pandas as pd

    from ..functions.geometry import haversine_km
    from ..stages.joins import hash_partitioned_apply

    circles = dv.fence_circles(sf_dir)
    fkey = circles["key"].to_numpy(np.int64)
    flat = circles["lat"].to_numpy()
    flon = circles["lon"].to_numpy()
    frad = circles["radius_km"].to_numpy()

    pts = dv.fence_points(sf_dir)

    def per_part(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = ["point_id", "key", "dwell_us", "n_segs"]
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        df = df.sort_values(["point_id", "ts", "event_id"], kind="mergesort")
        pid = df["point_id"].to_numpy()
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        inside = np.empty((len(df), len(fkey)), dtype=bool)
        for j in range(len(fkey)):
            inside[:, j] = haversine_km(lat, lon, flat[j], flon[j]) <= frad[j]
        same = pid[1:] == pid[:-1]
        seg_in = inside[1:] & inside[:-1] & same[:, None]
        dt = (ts_us[1:] - ts_us[:-1])[:, None]
        out = []
        for j in range(len(fkey)):
            m = seg_in[:, j]
            if not m.any():
                continue
            g = pd.DataFrame({"point_id": pid[1:][m], "dt": dt[m, 0]}).groupby(
                "point_id", sort=False
            )["dt"]
            agg = g.agg(["sum", "size"]).reset_index()
            out.append(
                pd.DataFrame(
                    {
                        "point_id": agg["point_id"].to_numpy(np.int64),
                        "key": np.full(len(agg), fkey[j], dtype=np.int64),
                        "dwell_us": agg["sum"].to_numpy(np.int64),
                        "n_segs": agg["size"].to_numpy(np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        return pd.concat(out, ignore_index=True)

    return hash_partitioned_apply(pts, "point_id", per_part, num_parts=32)


def sql_fence_dwell() -> str:
    hav_cur = dv.SQL_HAVERSINE.format(lat1="s.lat", lon1="s.lon", lat2="c.flat", lon2="c.flon")
    hav_prev = dv.SQL_HAVERSINE.format(lat1="s.plat", lon1="s.plon", lat2="c.flat", lon2="c.flon")
    return f"""
WITH {dv.SQL_FENCE_POINTS.strip()}, {dv.SQL_FENCE_CIRCLES.strip()},
seq AS (
    SELECT point_id, ts, lat, lon,
           LAG(ts) OVER w AS pts, LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
    FROM fence_points
    WINDOW w AS (PARTITION BY point_id ORDER BY ts, event_id)),
segs AS (SELECT * FROM seq WHERE pts IS NOT NULL)
SELECT s.point_id, c.key,
       CAST(SUM(epoch_us(s.ts) - epoch_us(s.pts)) AS BIGINT) AS dwell_us,
       CAST(COUNT(*) AS BIGINT) AS n_segs
FROM segs s CROSS JOIN fence_circles c
WHERE {hav_cur} <= c.radius_km AND {hav_prev} <= c.radius_km
GROUP BY 1, 2
"""
