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


def refresh_tiles(
    tiles_dir: str,
    upserts: "ray.data.Dataset | None" = None,
    deletes=None,
    id_col: str = "doc_id",
) -> list[int]:
    """Incremental index maintenance — the engine form of the reference
    R-tree's delete + reinsert (pkg/datastructure/rtree_test.go:477-713,
    rtree.go delete/condense/reinsert): instead of mutating a shared tree,
    ONLY the cell partitions touched by the change set are rewritten
    (read old partition → drop deleted/overwritten ids → append upserts →
    atomic tmp+rename, sidecar manifest refreshed); every untouched
    partition keeps its bytes and lineage. Returns the refreshed cell keys.

    ``upserts``: rows with the tile schema minus cell columns (id, lat,
    lon, ...); cells are assigned here. An id already present in a touched
    cell is REPLACED (reinsert semantics). ``deletes``: pandas frame with
    (id_col, lat, lon) — the location identifies the cell, exactly like
    the reference's Delete(bbox) API.

    STORAGE REQUIREMENT (ADVICE r02): partition merges run inside Ray
    workers with plain filesystem I/O against ``tiles_dir``, so the path
    must be visible AND writable at the same location from every node —
    a single-node cluster (this sandbox) or a shared filesystem / FUSE
    mount (NFS, s3fs, GCS-fuse) on multi-node. On a multi-node cluster
    WITHOUT a shared mount the rewrites would land on each worker's local
    disk silently; ``sources.checkpoint.assert_shared_visible`` refuses to
    run in that case by probing the directory from every node.
    """
    import json
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    del_by_cell: dict[int, set] = {}
    if deletes is not None and len(deletes):
        dcells = cell_of(
            np.asarray(deletes["lat"], np.float64), np.asarray(deletes["lon"], np.float64), RES_COARSE
        )
        for c, i in zip(dcells, deletes[id_col]):
            del_by_cell.setdefault(int(c), set()).add(int(i))

    import ray

    def merge_partition(cell: int, g, dels: set) -> dict:
        """Pure per-partition merge: drop deleted/overwritten ids, append
        upserts, atomic tmp+rename, refresh the sidecar manifest."""
        pdir = os.path.join(tiles_dir, f"part={cell}")
        path = os.path.join(pdir, "data.parquet")
        old = pq.read_table(path).to_pandas() if os.path.exists(path) else None
        if old is None:
            old = g.iloc[0:0]
        gone = dels | set(g[id_col].tolist())
        kept = old[~old[id_col].isin(gone)] if len(old) else old
        new = pd.concat([kept, g], ignore_index=True)[list(old.columns)]  # keep partition schema order
        new = new.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".tmp-data.parquet")
        pq.write_table(pa.Table.from_pandas(new, preserve_index=False), tmp)
        os.replace(tmp, path)
        row = {
            "stage": "tiles_refresh",
            "partition_key": cell,
            "row_count": int(len(new)),
            "byte_count": int(os.path.getsize(path)),
            "wall_ms": 0,
            "status": "done",
        }
        side = os.path.join(pdir, ".tmp-manifest.json")
        with open(side, "w") as f:
            json.dump(row, f)
        os.replace(side, os.path.join(pdir, "manifest.json"))
        return row

    from ..sources.checkpoint import assert_shared_visible

    assert_shared_visible(tiles_dir)
    del_ref = ray.put(del_by_cell)
    manifest_rows: list[dict] = []
    upsert_cells: set[int] = set()
    if upserts is not None:

        def rewrite_cell(g: pd.DataFrame) -> pd.DataFrame:
            dels = ray.get(del_ref)
            cell = int(g["cell_r12"].iloc[0])
            return pd.DataFrame([merge_partition(cell, g, dels.get(cell, set()))])

        out = (
            upserts.map_batches(add_cells, batch_format="pyarrow")
            .groupby("cell_r12")
            .map_groups(rewrite_cell, batch_format="pandas")
            .to_pandas()
        )
        manifest_rows += out.to_dict("records")
        upsert_cells = {int(k) for k in out["partition_key"]}

    # delete-only cells: an incremental batch touches few — merge them with
    # empty upsert frames (schema taken from the existing partition)
    for cell in sorted(set(del_by_cell) - upsert_cells):
        path = os.path.join(tiles_dir, f"part={cell}", "data.parquet")
        if not os.path.exists(path):
            continue
        empty = pq.read_table(path).to_pandas().iloc[0:0]
        manifest_rows.append(merge_partition(cell, empty, del_by_cell[cell]))

    # append refreshed rows to the compacted manifest (completed_keys reads
    # both the jsonl and the per-partition sidecars)
    if manifest_rows:
        mp = os.path.join(tiles_dir, "_manifest.jsonl")
        with open(mp, "a") as f:
            for r in manifest_rows:
                f.write(json.dumps(r) + "\n")
    return sorted(int(r["partition_key"]) for r in manifest_rows)


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


def kring_density(sf_dir: str, res: int = RES_COARSE):
    """k-ring neighborhood density (the H3 k-ring analogue on the grid,
    reference kNN seed pattern /root/reference/pkg/kv/...): for every
    OCCUPIED res-12 cell, the total docs in its 3x3 cell neighborhood.

    Shape: per-cell counts (tile_counts combiner + one small groupby), then
    each count row is FANNED OUT to its <=9 neighbor cells (flat-map, x9
    rows of an already cell-aggregated — i.e. tiny — table) and summed in
    one cell-keyed exchange; occupied-cell markers ride the same exchange,
    so unoccupied ring members never produce output rows. No driver state,
    no polygon broadcast — the ring is pure cell arithmetic."""
    from ..stages.joins import hash_partitioned_apply
    import pandas as pd

    n = 1 << res
    counts = tile_counts(sf_dir)

    def fan_out(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell_r12").to_numpy(zero_copy_only=False)
        cnt = batch.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = cell // n, cell % n
        cells_out, n_out, side_out = [cell], [cnt], [np.zeros(len(cell), np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = x + dx, y + dy
                m = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                cells_out.append((nx * n + ny)[m])
                n_out.append(cnt[m])
                side_out.append(np.ones(int(m.sum()), np.int8))
        return pa.table(
            {
                "cell_r12": pa.array(np.concatenate(cells_out)),
                "n": pa.array(np.concatenate(n_out)),
                "side": pa.array(np.concatenate(side_out)),
            }
        )

    def ring_sum(df: "pd.DataFrame") -> "pd.DataFrame":
        occ = df[df["side"] == 0][["cell_r12", "n"]].rename(columns={"n": "n_docs"})
        ring = (
            df[df["side"] == 1]
            .groupby("cell_r12", sort=False, as_index=False)["n"]
            .sum()
            .rename(columns={"n": "n_ring"})
        )
        out = occ.merge(ring, on="cell_r12")  # inner: occupied cells only
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_ring"] = out["n_ring"].astype(np.int64)
        return out

    fanned = counts.map_batches(fan_out, batch_format="pyarrow")
    return hash_partitioned_apply(fanned, "cell_r12", ring_sum, num_parts=16)


# ----------------------------------------------------- z-order global sort

Z_QUAD_RES = 10  # quadtree level reported alongside the key (fixture spans ~20 quads)


def zorder_sort(sf_dir: str):
    """Global Z-order (Morton) curve ordering of the corpus — the
    OPTIMIZE-ZORDER trick: sorting pages by the interleaved cell key makes
    any axis-aligned spatial window a SMALL number of contiguous key
    ranges, so windowed reads touch O(few) sorted runs instead of the
    whole corpus (functions/cells.morton_cell already range-partitions the
    tile sinks; this exposes the same curve as a driver-checkable global
    sort).  Output (doc_id, zkey, quad4, rank): rank by (zkey, doc_id) via
    the global-rank machinery (range-exchange sort + O(blocks) driver
    offsets), quad = the level-Z_QUAD_RES quadtree prefix — every aligned quad is
    a CONTIGUOUS rank interval (the defining Morton property, unit-pinned).
    """
    from ..functions.cells import morton_cell
    from ..stages.joins import zip_with_index

    pages = geo_pages(sf_dir, columns=["doc_id"])

    def add_z(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        z = morton_cell(lat, lon)  # res 15
        quad = z >> (2 * (15 - Z_QUAD_RES))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "zkey": pa.array(z),
                "quad": pa.array(quad.astype(np.int64)),
            }
        )

    srt = pages.map_batches(add_z, batch_format="pyarrow").sort(["zkey", "doc_id"])

    def to_rank(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rank = pc.add(t.column("row_id"), 1)
        return t.drop_columns(["row_id"]).append_column("rank", rank)

    return zip_with_index(srt, "row_id").map_batches(to_rank, batch_format="pyarrow")


def sql_zorder_sort() -> str:
    """Exact twin of functions/cells._spread_bits + morton_cell as a CTE
    chain (15-bit coords; every intermediate < 2^62 so BIGINT bit ops are
    sign-safe)."""
    from ..sources.derived import SQL_GEO_PAGES

    n = 1 << 15
    steps = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    ctes = [
        f"""xy AS (SELECT doc_id,
    LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,
    LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y
  FROM geo_pages)"""
    ]
    prev = "xy"
    for axis in ("x", "y"):
        for i, (s, m) in enumerate(steps):
            other = "y" if axis == "x" else "x"
            cur = f"s{axis}{i}"
            ctes.append(
                f"{cur} AS (SELECT doc_id, (({axis} | ({axis} << {s})) & {m}) AS {axis}, {other} FROM {prev})"
            )
            prev = cur
    chain = ",\n".join(ctes)
    return f"""
WITH {SQL_GEO_PAGES.strip()},
{chain},
z AS (SELECT doc_id, (x << 1) | y AS zkey FROM {prev})
SELECT doc_id, zkey, zkey >> {2 * (15 - Z_QUAD_RES)} AS quad,
       ROW_NUMBER() OVER (ORDER BY zkey, doc_id) AS rank
FROM z
"""


# ------------------------------------------------ nearest-neighbor self-join

_KM_PER_DEG = 111.19492664455873


def nn_join(sf_dir: str, res: int = RES_COARSE):
    """Spatial 1-NN SELF-join: every page's nearest OTHER page — the geo
    twin of simsearch.knn_graph, and the all-pairs operator the query-set
    kNN (broadcast_knn) cannot give at scale.  Output (doc_id, nn_id).

    Two regimes, together EXACT:
      1. bucketed ring pass — each page emits one member row into its res-12
         cell and query rows into the 3x3 ring; ONE cell-keyed exchange;
         per partition the per-query nearest candidate (vectorized
         haversine), then ONE doc-keyed exchange reduces the up-to-9
         per-cell candidates and evaluates the confirmation bound: any
         point outside the 3x3 block differs by >= one full cell step in
         grid lat or lon, so its distance is >= 1 x min(lat_step_km,
         lon_step_km at the maximum |lat| reachable within 2 cells) — the
         cell_knn_oneshot best-first bound at ring=1.  Seam columns
         (grid x = 0 or n-1) are NEVER confirmed: the grid does not wrap
         but the antimeridian does, so wrapped partners violate the
         grid-distance argument only there.
      2. fallback — the UNCONFIRMED remainder (sparse rings, high
         latitudes, seam; small by construction — it is the only piece
         that ever reaches the driver) is re-resolved exactly against the
         full corpus stream with the broadcast-kNN combiner.

    Nothing corpus-sized touches the driver: the confirmed side stays a
    Dataset end to end.  Tie rule both regimes and in SQL: (distance,
    nn_id) ascending."""
    import pandas as pd

    from ..functions.cells import cell_bounds
    from ..functions.geometry import haversine_km
    from ..stages.joins import hash_partitioned_apply

    n_cells = 1 << res
    pages = geo_pages(sf_dir)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        cell = cell_of(lat, lon, res)
        x, y = cell // n_cells, cell % n_cells
        out = {"cell": [], "doc_id": [], "lat": [], "lon": [], "side": []}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = x + dx, y + dy
                ok = (nx >= 0) & (nx < n_cells) & (ny >= 0) & (ny < n_cells)
                out["cell"].append((nx * n_cells + ny)[ok])
                out["doc_id"].append(ids[ok])
                out["lat"].append(lat[ok])
                out["lon"].append(lon[ok])
                side = np.ones(int(ok.sum()), np.int8)
                if dx == 0 and dy == 0:
                    side[:] = 0  # member AND query in its own cell
                out["side"].append(side)
        return pa.table(
            {
                "cell": pa.array(np.concatenate(out["cell"])),
                "doc_id": pa.array(np.concatenate(out["doc_id"])),
                "lat": pa.array(np.concatenate(out["lat"])),
                "lon": pa.array(np.concatenate(out["lon"])),
                "side": pa.array(np.concatenate(out["side"])),
            }
        )

    def best_in_cell(df: pd.DataFrame) -> pd.DataFrame:
        """Per probed cell: each query's nearest member (self excluded).
        side=0 rows (a page in its OWN cell) always emit — with a -1
        sentinel when the cell holds no other member — so every page
        reaches the doc-keyed reduce exactly once even in empty rings."""
        outs = []
        for _, g in df.groupby("cell", sort=False):
            mem = g[g["side"] == 0]
            if len(mem) == 0:
                continue
            mids = mem["doc_id"].to_numpy(np.int64)
            mlat, mlon = mem["lat"].to_numpy(), mem["lon"].to_numpy()
            qids = g["doc_id"].to_numpy(np.int64)
            qlat, qlon = g["lat"].to_numpy(), g["lon"].to_numpy()
            own = g["side"].to_numpy() == 0
            for qi in range(len(qids)):
                d = haversine_km(qlat[qi], qlon[qi], mlat, mlon)
                mask = mids != qids[qi]
                if mask.any():
                    dm, im = d[mask], mids[mask]
                    j = np.lexsort((im, dm))[0]
                    outs.append((qids[qi], int(im[j]), float(dm[j]), qlat[qi], qlon[qi]))
                elif own[qi]:
                    outs.append((qids[qi], -1, np.inf, qlat[qi], qlon[qi]))
        cols = ["doc_id", "nn_id", "dist_km", "lat", "lon"]
        if not outs:
            return pd.DataFrame({c: pd.Series(dtype=np.float64 if c in ("dist_km", "lat", "lon") else np.int64) for c in cols})
        out = pd.DataFrame(outs, columns=cols)
        return out.astype({"doc_id": np.int64, "nn_id": np.int64})

    cand = hash_partitioned_apply(
        pages.map_batches(tag, batch_format="pyarrow"), "cell", best_in_cell, num_parts=16
    )

    def reduce_doc(df: pd.DataFrame) -> pd.DataFrame:
        """Per page: best candidate across its probed cells + the ring
        confirmation bound (computed from the page's own coordinates —
        nothing leaves the partition)."""
        df = df.sort_values(["doc_id", "dist_km", "nn_id"], kind="mergesort").drop_duplicates("doc_id")
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        cell = cell_of(lat, lon, res)
        lat0, lon0, lat1, lon1 = cell_bounds(cell, res)
        lat_step = lat1 - lat0
        reach_lat = np.minimum(90.0, np.maximum(np.abs(lat0), np.abs(lat1)) + 2 * lat_step)
        lon_step_km = (lon1 - lon0) * _KM_PER_DEG * np.maximum(np.cos(np.radians(reach_lat)), 1e-9)
        bound_km = np.minimum(lat_step * _KM_PER_DEG, lon_step_km)
        x = cell // n_cells
        seam = (x <= 0) | (x >= n_cells - 1)
        confirmed = (~seam) & (df["nn_id"].to_numpy() >= 0) & (df["dist_km"].to_numpy() <= bound_km)
        out = df[["doc_id", "nn_id", "lat", "lon"]].copy()
        out["confirmed"] = confirmed
        return out

    reduced = hash_partitioned_apply(cand, "doc_id", reduce_doc, num_parts=16)

    confirmed_ds = reduced.map_batches(
        lambda t: t.filter(t.column("confirmed")).select(["doc_id", "nn_id"]),
        batch_format="pyarrow",
    )
    unresolved = reduced.map_batches(
        lambda t: t.filter(pc_not(t.column("confirmed"))).select(["doc_id", "lat", "lon"]),
        batch_format="pyarrow",
    ).to_pandas()  # small by construction: the bound confirms dense interior pages

    fallback = None
    if len(unresolved):
        from ..stages.knn import broadcast_knn

        q = pa.table(
            {
                "query_id": pa.array(unresolved["doc_id"].to_numpy(np.int64)),
                "qlat": pa.array(unresolved["lat"].to_numpy()),
                "qlon": pa.array(unresolved["lon"].to_numpy()),
            }
        )
        res2 = broadcast_knn(geo_pages(sf_dir), q, k=2).to_pandas()
        res2 = res2[res2["doc_id"] != res2["query_id"]]
        res2 = res2.sort_values(["query_id", "rank"], kind="mergesort").drop_duplicates("query_id")
        fallback = pd.DataFrame(
            {
                "doc_id": res2["query_id"].to_numpy(np.int64),
                "nn_id": res2["doc_id"].to_numpy(np.int64),
            }
        )
    # result stays a Dataset — the confirmed (corpus-sized) side never
    # collects on the driver; only the small fallback frame does
    if fallback is None or len(fallback) == 0:
        return confirmed_ds
    return confirmed_ds.union(ray.data.from_pandas(fallback))


def pc_not(arr):
    import pyarrow.compute as _pc

    return _pc.invert(arr)


def sql_nn_join() -> str:
    from ..sources.derived import SQL_GEO_PAGES, SQL_HAVERSINE

    hav = SQL_HAVERSINE.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")
    return f"""
WITH {SQL_GEO_PAGES.strip()},
scored AS (
    SELECT a.doc_id, b.doc_id AS nn_id,
           ROW_NUMBER() OVER (PARTITION BY a.doc_id ORDER BY {hav}, b.doc_id) AS rank
    FROM geo_pages a JOIN geo_pages b ON b.doc_id <> a.doc_id
)
SELECT doc_id, nn_id FROM scored WHERE rank = 1
"""


PYRAMID_TOP = 8  # coarsest rollup level (res 12 → 8 = 5 pyramid levels)


def tile_pyramid(sf_dir: str, res_fine: int = RES_COARSE, res_top: int = PYRAMID_TOP):
    """The full TILE PYRAMID in one corpus pass: per-cell doc counts at the
    finest resolution, then parent rollups level by level down to
    ``res_top`` — the map-serving aggregation every tiling engine ships
    (z/x/y count tiles at all zooms). Parent arithmetic is pure integer:
    cell = x·2^r + y → parent = (x//2)·2^(r-1) + y//2, and the equirect
    floor guarantees parent-of-child == direct assignment at the coarser
    res (clamping included, n even). The corpus is read ONCE (combiner
    partials at the finest level); each coarser level reduces the previous
    one, a 4× smaller cells-bounded exchange per level — documents never
    re-shuffle. Output (level, cell, n_docs) for level in [res_top,
    res_fine]."""
    from ray.data.aggregate import Sum

    levels = {res_fine: tile_counts(sf_dir).materialize()}
    for r in range(res_fine, res_top, -1):
        n = 1 << r
        half = n >> 1

        def to_parent(batch: pa.Table, n=n, half=half) -> pa.Table:
            c = batch.column(batch.column_names[0]).to_numpy().astype(np.int64)
            parent = (c // n // 2) * half + (c % n) // 2
            return pa.table({"cell": pa.array(parent), "n_docs": batch.column("n_docs")})

        levels[r - 1] = (
            levels[r]
            .map_batches(to_parent, batch_format="pyarrow")
            .groupby("cell")
            .aggregate(Sum("n_docs", alias_name="n_docs"))
            .materialize()
        )

    def tag(r: int):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch.column(batch.column_names[0]).to_numpy().astype(np.int64)
            return pa.table(
                {
                    "level": pa.array(np.full(len(c), r, np.int64)),
                    "cell": pa.array(c),
                    "n_docs": batch.column("n_docs"),
                }
            )

        return fn

    out = None
    for r, ds_r in sorted(levels.items()):
        tagged = ds_r.map_batches(tag(r), batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out


def sql_tile_pyramid(res_fine: int = RES_COARSE, res_top: int = PYRAMID_TOP) -> str:
    import osm_search_ray.sources.derived as _dv

    parts = []
    for r in range(res_top, res_fine + 1):
        parts.append(
            f"SELECT CAST({r} AS BIGINT) AS level, {_dv.sql_cell_expr('lat', 'lon', r)} AS cell,\n"
            f"       COUNT(*) AS n_docs FROM geo_pages GROUP BY 1, 2"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH {_dv.SQL_GEO_PAGES.strip()}
{union}
"""


def hotspot_cells(sf_dir: str):
    """Spatial hotspot detection: res-12 cells whose doc count exceeds the
    corpus-wide 95th percentile of cell counts — the density-anomaly pass
    over the tile grid. The threshold is an EXACT interpolated quantile of
    the (cells-bounded) count distribution, carried at 20× integer scale
    (quantile_cont of ints lands on k/20 grid for q=0.95) so the comparison
    2·20·n > p95_x20·2 is pure int64 on both sides. One tile-counts
    aggregate + a driver-side threshold from the cells-bounded histogram +
    one filter pass. Output (cell_r12, n_docs, p95_x20)."""
    counts = tile_counts(sf_dir).materialize()
    hist = counts.to_pandas()  # cells-bounded, not row-bounded
    v = np.sort(hist["n_docs"].to_numpy(np.int64))
    n = v.size
    pos = (n - 1) * 0.95
    lo = int(pos)
    frac = pos - lo  # multiple of 1/20 for q=.95 → exact in binary
    p95_x20 = int(round((v[lo] * (1 - frac) + v[min(lo + 1, n - 1)] * frac) * 20))

    def flt(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_docs").to_numpy()
        keep = 20 * nd > p95_x20
        c = batch.column("cell_r12").to_numpy()[keep]
        return pa.table(
            {
                "cell_r12": pa.array(c.astype(np.int64)),
                "n_docs": pa.array(nd[keep].astype(np.int64)),
                "p95_x20": pa.array(np.full(keep.sum(), p95_x20, np.int64)),
            }
        )

    return counts.map_batches(flt, batch_format="pyarrow")


def sql_hotspot_cells() -> str:
    import osm_search_ray.sources.derived as _dv

    cell12 = _dv.sql_cell_expr("lat", "lon", 12)
    return f"""
WITH {_dv.SQL_GEO_PAGES.strip()},
cells AS (SELECT {cell12} AS cell_r12, COUNT(*) AS n_docs FROM geo_pages GROUP BY 1),
thr AS (SELECT CAST(ROUND(quantile_cont(n_docs, 0.95) * 20) AS BIGINT) AS p95_x20 FROM cells)
SELECT c.cell_r12, c.n_docs, t.p95_x20
FROM cells c, thr t
WHERE 20 * c.n_docs > t.p95_x20
"""
