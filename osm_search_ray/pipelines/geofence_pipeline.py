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
