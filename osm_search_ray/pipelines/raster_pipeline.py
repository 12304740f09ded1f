"""Raster coverage query with a full SQL oracle: per tile of the admin-rect
cover, the number of 64×64 pixel centers falling inside any admin rectangle.
Pixel-center arithmetic is identical (op-for-op) between numpy and SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.cells import RES_COARSE, cover_bbox
from ..sources import derived as dv
from ..stages.raster import GRID, rasterize_coverage
from ..stages.spatial_join import PolygonSet

RES = RES_COARSE


def raster_coverage(sf_dir: str):
    """(cell, covered_px) for every tile overlapping any admin rect."""
    rects = dv.admin_rects(sf_dir)
    lat0 = rects.column("lat0").to_numpy()
    lon0 = rects.column("lon0").to_numpy()
    lat1 = rects.column("lat1").to_numpy()
    lon1 = rects.column("lon1").to_numpy()
    cells = np.unique(
        np.concatenate([cover_bbox(lat0[i], lon0[i], lat1[i], lon1[i], RES) for i in range(len(lat0))])
    )
    polys = PolygonSet.from_rects(rects.select(["rect_id", "lat0", "lon0", "lat1", "lon1"]))
    tiles = ray.data.from_pandas(pd.DataFrame({"cell": cells}))
    out = rasterize_coverage(tiles, polys, res=RES, grid=GRID)
    return out.select_columns(["cell", "covered_px"])


def _sql() -> str:
    n = 1 << RES
    return f"""
WITH {dv.SQL_ADMIN_RECTS.strip()},
rect_cells AS (
    SELECT DISTINCT gx.ix * {n} + gy.iy AS cell, gx.ix AS ix, gy.iy AS iy
    FROM admin_rects r,
    LATERAL (SELECT unnest(range(
        LEAST(GREATEST(CAST(floor((r.lon0 + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n - 1}),
        LEAST(GREATEST(CAST(floor((r.lon1 + 180.0) / 360.0 * {n}.0) AS BIGINT), 0), {n - 1}) + 1)) AS ix) gx,
    LATERAL (SELECT unnest(range(
        LEAST(GREATEST(CAST(floor((r.lat0 + 90.0) / 180.0 * {n}.0) AS BIGINT), 0), {n - 1}),
        LEAST(GREATEST(CAST(floor((r.lat1 + 90.0) / 180.0 * {n}.0) AS BIGINT), 0), {n - 1}) + 1)) AS iy) gy
),
bounds AS (
    SELECT cell,
           CAST(iy AS DOUBLE) / {n}.0 * 180.0 - 90.0 AS lat0,
           CAST(ix AS DOUBLE) / {n}.0 * 360.0 - 180.0 AS lon0,
           CAST(iy AS DOUBLE) / {n}.0 * 180.0 - 90.0 + 180.0 / {n}.0 AS lat1,
           CAST(ix AS DOUBLE) / {n}.0 * 360.0 - 180.0 + 360.0 / {n}.0 AS lon1
    FROM rect_cells
),
pixels AS (
    SELECT b.cell,
           b.lat0 + (CAST(gi.i AS DOUBLE) + 0.5) * (b.lat1 - b.lat0) / {GRID} AS py,
           b.lon0 + (CAST(gj.j AS DOUBLE) + 0.5) * (b.lon1 - b.lon0) / {GRID} AS px
    FROM bounds b,
    LATERAL (SELECT unnest(range(0, {GRID})) AS i) gi,
    LATERAL (SELECT unnest(range(0, {GRID})) AS j) gj
)
SELECT p.cell, COUNT(*) FILTER (WHERE EXISTS (
        SELECT 1 FROM admin_rects r
        WHERE p.py BETWEEN r.lat0 AND r.lat1 AND p.px BETWEEN r.lon0 AND r.lon1
    )) AS covered_px
FROM pixels p GROUP BY 1
"""


SQL_RASTER_COVERAGE = _sql()
