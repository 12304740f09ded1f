"""Tiling + spatial-join pipelines (the flagship, SURVEY.md §3.1 engine form).

pages → coordinate extraction → grid-cell assignment (tiling) → PIP join
against admin polygons → per-tile stats / partitioned Parquet tiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.cells import RES_COARSE, RES_FINE, cell_of, morton_cell
from ..sources.derived import admin_rects, geo_pages, knn_query_points
from ..stages.spatial_join import PolygonSet, broadcast_pip_join, partitioned_pip_join
from ..stages.knn import broadcast_knn


def add_cells(batch: pa.Table, lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Vectorized tile assignment: coarse + fine grid cells + Morton key."""
    lat = batch.column(lat_col).to_numpy()
    lon = batch.column(lon_col).to_numpy()
    batch = batch.append_column("cell_r12", pa.array(cell_of(lat, lon, RES_COARSE)))
    batch = batch.append_column("cell_r14", pa.array(cell_of(lat, lon, RES_FINE)))
    return batch.append_column("z_cell", pa.array(morton_cell(lat, lon)))


def tiled_pages(sf_dir: str) -> "ray.data.Dataset":
    """documents → geo pages → tile assignment."""
    return geo_pages(sf_dir).map_batches(add_cells, batch_format="pyarrow")


def tile_counts(sf_dir: str, res_col: str = "cell_r12") -> "ray.data.Dataset":
    """Per-tile document counts — pre-aggregated per batch (combiner) before
    the small groupby shuffle, so the exchange sees one row per (block, cell)
    instead of one per document."""

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column(res_col).to_numpy(), return_counts=True)
        return pa.table({res_col: u, "n_docs": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    partials = tiled_pages(sf_dir).map_batches(partial, batch_format="pyarrow")
    return partials.groupby(res_col).aggregate(Sum("n_docs", alias_name="n_docs"))


def pip_join(sf_dir: str, partitioned: bool = False) -> "ray.data.Dataset":
    """Every geo page joined to every admin rectangle containing it.

    Broadcast form by default (admin polygons are the small side); the
    ``partitioned`` flag exercises the cell-partitioned shuffle join —
    identical output, for the both-sides-large regime.
    """
    rects = admin_rects(sf_dir)
    polys = PolygonSet.from_rects(rects.select(["rect_id", "lat0", "lon0", "lat1", "lon1"]))
    pts = geo_pages(sf_dir)
    if partitioned:
        return partitioned_pip_join(pts, polys, id_out="rect_id")
    return broadcast_pip_join(pts, polys, id_out="rect_id").select_columns(["doc_id", "lat", "lon", "rect_id"])


def pip_tile_summary(sf_dir: str) -> "ray.data.Dataset":
    """Flagship composite: join + tiling + per-(rect, tile) aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"rect_id": batch.column("rect_id").to_numpy(), "cell_r12": batch.column("cell_r12").to_numpy()}
        )
        g = df.groupby(["rect_id", "cell_r12"], sort=False).size().reset_index(name="n_docs")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    joined = pip_join(sf_dir).map_batches(add_cells, batch_format="pyarrow")
    partials = joined.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["rect_id", "cell_r12"]).aggregate(Sum("n_docs", alias_name="n_docs"))


def knn_nearest_docs(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """k nearest geo pages to each region-derived query point (K2 analogue)."""
    return broadcast_knn(geo_pages(sf_dir), knn_query_points(sf_dir), k=k).select_columns(
        ["query_id", "doc_id", "rank"]
    )


def write_tiles(sf_dir: str, out_dir: str) -> str:
    """Write the tiled corpus as cell-partitioned Parquet through the
    checkpointed sink (one directory per coarse cell + lineage manifest —
    resumable; also avoids Arrow's 1024-partitions-per-fragment limit that
    plain ``write_parquet(partition_cols=...)`` hits on wide cell spreads).
    kNN and reverse geocoding prune on the cell directories."""
    from ..sources.checkpoint import checkpointed_write

    checkpointed_write(tiled_pages(sf_dir), out_dir, "cell_r12", stage="tiles")
    return out_dir


def knn_radius_lang(sf_dir: str, k: int = 5, radius_km: float = 25.0, lang: str = "en") -> "ray.data.Dataset":
    """K3 analogue — radius + feature-filtered kNN: the k nearest geo pages
    within ``radius_km`` whose ``lang`` matches (the reference's
    NearestNeighboursRadiusWithFeatureFilter, pkg/datastructure/rtree.go:648-672;
    the feature predicate filters the streamed side before the combiner)."""
    import pyarrow.compute as _pc

    pts = geo_pages(sf_dir, columns=["doc_id", "lang"])
    pts = pts.map_batches(lambda t: t.filter(_pc.equal(t.column("lang"), lang)), batch_format="pyarrow")
    return broadcast_knn(pts, knn_query_points(sf_dir), k=k, radius_km=radius_km).select_columns(
        ["query_id", "doc_id", "rank"]
    )


def reverse_geocode(sf_dir: str) -> "ray.data.Dataset":
    """Reverse geocoding = 1-NN (the reference's ReverseGeocoding,
    pkg/searcher/searcher.go:679-686): nearest geo page to each query point."""
    return broadcast_knn(geo_pages(sf_dir), knn_query_points(sf_dir), k=1).select_columns(
        ["query_id", "doc_id", "rank"]
    )
