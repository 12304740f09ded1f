"""Deterministic geo derivations over the driver's Parquet tables.

The sandbox registers exactly these DuckDB views: region nation customer
supplier part orders lineitem events documents embeddings.  The geospatial
engine, however, operates over Common-Crawl-style ``pages`` and OSM-style
geometry.  To make every geospatial operator *oracle-checkable*, the test
``pages`` / polygon / query-point tables are derived from the registered
tables by PURE ARITHMETIC that is written once here in numpy and once in SQL
— both produce bit-identical float64 values (same operations, same order),
so DuckDB can verify cell assignments, joins, and kNN ranks exactly.

Derivation contract (keep the numpy and SQL forms in lockstep):

  pages      := documents where doc_id % 5 <> 0          (rows with coords)
    clustered = doc_id % 10 < 3                          (urban-skew cluster)
    k1 = (doc_id * 7919)   % 10000
    k2 = (doc_id * 104729) % 10000
    lat = clustered ? -6.2  + k1 * 0.000004  : -6.6  + k1 * 0.00008
    lon = clustered ? 106.8 + k2 * 0.0000045 : 106.4 + k2 * 0.00009
  admin rects := nation:  5×5 grid of 0.16° × 0.18° rectangles
    lat0 = -6.605  + (n_nationkey % 5)  * 0.16
    lon0 = 106.395 + (n_nationkey // 5) * 0.18
  knn queries := region:
    qlat = -6.5 + r_regionkey * 0.15
    qlon = 106.5 + r_regionkey * 0.17

(The offsets -6.605/106.395 guarantee no derived point falls exactly on a
rectangle edge — see tests/test_derived.py — so inclusive-edge semantics
cannot diverge between the winding-number join and SQL BETWEEN.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from .readers import read_pq

# ---------------------------------------------------------------- numpy side


def page_coords(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(has_geo, lat, lon) for each doc_id — the canonical arithmetic."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    has_geo = (doc_id % 5) != 0
    clustered = (doc_id % 10) < 3
    k1 = ((doc_id * 7919) % 10000).astype(np.float64)
    k2 = ((doc_id * 104729) % 10000).astype(np.float64)
    lat = np.where(clustered, -6.2 + k1 * 0.000004, -6.6 + k1 * 0.00008)
    lon = np.where(clustered, 106.8 + k2 * 0.0000045, 106.4 + k2 * 0.00009)
    return has_geo, lat, lon


def add_page_coords(batch: pa.Table) -> pa.Table:
    """map_batches stage: documents batch → + (lat, lon), geo-less rows dropped."""
    has_geo, lat, lon = page_coords(batch.column("doc_id").to_numpy(zero_copy_only=False))
    batch = batch.append_column("lat", pa.array(lat, pa.float64()))
    batch = batch.append_column("lon", pa.array(lon, pa.float64()))
    return batch.filter(pa.array(has_geo))


def geo_pages(sf_dir: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """documents.parquet → geo-referenced pages dataset (doc_id, lat, lon, ...)."""
    cols = columns if columns is not None else ["doc_id"]
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=cols)
    return ds.map_batches(add_page_coords, batch_format="pyarrow")


def admin_rects(sf_dir: str) -> pa.Table:
    """nation.parquet → 25 admin rectangles (small side; broadcast, never shuffled)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    key = t.column("n_nationkey").to_numpy().astype(np.int64)
    lat0 = -6.605 + (key % 5).astype(np.float64) * 0.16
    lon0 = 106.395 + (key // 5).astype(np.float64) * 0.18
    return pa.table(
        {
            "rect_id": key,
            "name": t.column("n_name"),
            "lat0": lat0,
            "lon0": lon0,
            "lat1": lat0 + 0.16,
            "lon1": lon0 + 0.18,
        }
    )


def knn_query_points(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
    key = t.column("r_regionkey").to_numpy().astype(np.int64)
    return pa.table(
        {
            "query_id": key,
            "qlat": -6.5 + key.astype(np.float64) * 0.15,
            "qlon": 106.5 + key.astype(np.float64) * 0.17,
        }
    )


# ------------------------------------------------------------------ SQL side
# CTE fragments matching the functions above bit-for-bit (float64 op order).

SQL_GEO_PAGES = """
geo_pages AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 < 3
                THEN -6.2 + CAST((doc_id * 7919) % 10000 AS DOUBLE) * 0.000004
                ELSE -6.6 + CAST((doc_id * 7919) % 10000 AS DOUBLE) * 0.00008
           END AS lat,
           CASE WHEN doc_id % 10 < 3
                THEN 106.8 + CAST((doc_id * 104729) % 10000 AS DOUBLE) * 0.0000045
                ELSE 106.4 + CAST((doc_id * 104729) % 10000 AS DOUBLE) * 0.00009
           END AS lon
    FROM documents
    WHERE doc_id % 5 <> 0
)"""

SQL_ADMIN_RECTS = """
admin_rects AS (
    SELECT n_nationkey AS rect_id, n_name AS name,
           -6.605  + CAST(n_nationkey % 5 AS DOUBLE) * 0.16  AS lat0,
           106.395 + CAST(n_nationkey // 5 AS DOUBLE) * 0.18 AS lon0,
           -6.605  + CAST(n_nationkey % 5 AS DOUBLE) * 0.16  + 0.16 AS lat1,
           106.395 + CAST(n_nationkey // 5 AS DOUBLE) * 0.18 + 0.18 AS lon1
    FROM nation
)"""

SQL_KNN_QUERIES = """
knn_queries AS (
    SELECT r_regionkey AS query_id,
           -6.5  + CAST(r_regionkey AS DOUBLE) * 0.15 AS qlat,
           106.5 + CAST(r_regionkey AS DOUBLE) * 0.17 AS qlon
    FROM region
)"""


def sql_cell_expr(lat: str, lon: str, res: int) -> str:
    """SQL for functions.cells.cell_of — identical floor arithmetic."""
    n = 1 << res
    return (
        f"(LEAST(GREATEST(CAST(floor(({lon} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) * {n} "
        f"+ LEAST(GREATEST(CAST(floor(({lat} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}))"
    )


SQL_HAVERSINE = (
    "(2.0 * 6371.0 * asin(sqrt("
    "sin(radians({lat2} - {lat1}) / 2.0) * sin(radians({lat2} - {lat1}) / 2.0) "
    "+ cos(radians({lat1})) * cos(radians({lat2})) "
    "* sin(radians({lon2} - {lon1}) / 2.0) * sin(radians({lon2} - {lon1}) / 2.0))))"
)


def fence_points(sf_dir: str) -> "ray.data.Dataset":
    """events → geofence query-point log (event_id, point_id, ts, lat, lon)."""
    ds = read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def fn(batch: pa.Table) -> pa.Table:
        ev = batch.column("event_id").to_numpy()
        k1 = ((ev * 7919) % 10000).astype(np.float64)
        k2 = ((ev * 104729) % 10000).astype(np.float64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "point_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "lat": pa.array(-6.6 + k1 * 0.00008),
                "lon": pa.array(106.4 + k2 * 0.00009),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def fence_circles(sf_dir: str):
    """supplier → 10 circular fences (key, lat, lon, radius_km)."""
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]).to_pandas()
    key = t["s_suppkey"].to_numpy().astype(np.int64)
    return pd.DataFrame(
        {
            "key": key,
            "lat": -6.55 + (key % 5).astype(np.float64) * 0.17,
            "lon": 106.45 + (key // 5).astype(np.float64) * 0.42,
            "radius_km": np.full(len(key), 5.0),
        }
    )


SQL_FENCE_POINTS = """
fence_points AS (
    SELECT event_id, user_id AS point_id, ts,
           -6.6 + CAST((event_id * 7919) % 10000 AS DOUBLE) * 0.00008 AS lat,
           106.4 + CAST((event_id * 104729) % 10000 AS DOUBLE) * 0.00009 AS lon
    FROM events
)"""

SQL_FENCE_CIRCLES = """
fence_circles AS (
    SELECT s_suppkey AS key,
           -6.55 + CAST(s_suppkey % 5 AS DOUBLE) * 0.17 AS flat,
           106.45 + CAST(s_suppkey // 5 AS DOUBLE) * 0.42 AS flon,
           5.0 AS radius_km
    FROM supplier
)"""


def contact_suffix(doc_id: np.ndarray) -> list[str]:
    """Deterministic PII-bearing suffix per doc (synthetic email + phone +
    IPv4 derived from doc_id by integer arithmetic — pure string ops, so
    the SQL twin is bit-identical). The PII-redaction operator's input."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    return [
        f" contact u{d}@mail{d % 7}.example or +1-555-{d % 10000:04d} from 10.{d % 256}.{(d // 256) % 256}.{d % 100}"
        for d in doc_id
    ]


def contact_pages(sf_dir: str) -> "ray.data.Dataset":
    """documents → (doc_id, raw_text) where raw_text = text + contact_suffix."""
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        suffix = contact_suffix(batch.column("doc_id").to_numpy(zero_copy_only=False))
        raw = pc.binary_join_element_wise(batch.column("text"), pa.array(suffix, pa.string()), "")
        return pa.table({"doc_id": batch.column("doc_id"), "raw_text": raw})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CONTACT_PAGES = """
contact_pages AS (
    SELECT doc_id,
           text || ' contact u' || CAST(doc_id AS VARCHAR)
                || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                || '.' || CAST(doc_id % 100 AS VARCHAR) AS raw_text
    FROM documents
)"""


# ------------------------------------------------------------- web snapshots
# Common-Crawl-style url/domain/crawl-timestamp derivation (input_hint shape).
# Every doc gets a url; 3 consecutive doc_ids share one url (= 3 crawl
# snapshots of the same page), 127 synthetic domains. warc_ts advances one
# hour per doc_id from 2024-01-01 UTC. Integer + string ops only, so the SQL
# twin below is bit-identical.

_WARC_EPOCH_US = 1704067200000000  # 2024-01-01 00:00:00 UTC in microseconds
_SNAPSHOTS_PER_URL = 3
_N_SITES = 127


def web_page_columns(batch: pa.Table) -> pa.Table:
    """documents batch → + (url, domain, warc_ts) columns."""
    d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    pk = d // _SNAPSHOTS_PER_URL
    site_s = pc.cast(pa.array(pk % _N_SITES), pa.string())
    pk_s = pc.cast(pa.array(pk), pa.string())
    domain = pc.binary_join_element_wise(pa.scalar("site"), site_s, pa.scalar(".example"), pa.scalar(""))
    url = pc.binary_join_element_wise(pa.scalar("https://"), domain, pa.scalar("/p"), pk_s, pa.scalar(""))
    ts = pa.array(_WARC_EPOCH_US + d * 3_600_000_000).cast(pa.timestamp("us"))
    return (
        batch.append_column("domain", domain)
        .append_column("url", url)
        .append_column("warc_ts", ts)
    )


def web_pages(sf_dir: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """documents → (doc_id, lang, n_chars, domain, url, warc_ts) Dataset."""
    ds = read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ds = ds.map_batches(web_page_columns, batch_format="pyarrow")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


SQL_WEB_PAGES = """
web_pages AS (
    SELECT doc_id, lang, n_chars,
           'site' || CAST((doc_id // 3) % 127 AS VARCHAR) || '.example' AS domain,
           'https://site' || CAST((doc_id // 3) % 127 AS VARCHAR) || '.example/p'
                || CAST(doc_id // 3 AS VARCHAR) AS url,
           TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 HOUR AS warc_ts
    FROM documents
)"""


# ---------------------------------------------------------------- visit log
# Synthetic page-visit log: every event visits one url (event_id mod the url
# count; url string built by the exact web_pages arithmetic). Integer +
# string ops only — the SQL twin is bit-identical.


def visit_urls(sf_dir: str) -> "ray.data.Dataset":
    """events → (event_id, ts_us, url) visit log."""
    import pyarrow.parquet as pq

    n_urls = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows // 3
    ds = read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def fn(batch: pa.Table) -> pa.Table:
        ev = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pk = ev % np.int64(n_urls)
        site_s = pc.cast(pa.array(pk % 127), pa.string())
        pk_s = pc.cast(pa.array(pk), pa.string())
        url = pc.binary_join_element_wise(
            pa.scalar("https://site"), site_s, pa.scalar(".example/p"), pk_s, pa.scalar("")
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
                "url": url,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_VISITS = """
visits AS (
    SELECT event_id, epoch_us(ts) AS ts_us,
           'https://site' || CAST((event_id % ((SELECT COUNT(*) FROM documents) // 3)) % 127 AS VARCHAR)
             || '.example/p' || CAST(event_id % ((SELECT COUNT(*) FROM documents) // 3) AS VARCHAR) AS url
    FROM events
)"""


# --------------------------------------------------------------- link graph
# Synthetic hyperlink graph over the (dense 0..N-1) doc_id space: every page
# links to 3 deterministic targets (quadratic-hash arithmetic, mod N — the
# square makes the map non-bijective, so in-degrees vary and hub pages
# emerge; a linear rule with P coprime to N would be a permutation and give
# every page identical in-degree 3). Multi-edges and self-loops are kept —
# out-degree is exactly 3 per page on both sides. Integer ops only, so the
# SQL twin is bit-identical.

_LINK_RULES = ((7919, 1), (104729, 2), (48271, 3))


def link_targets(src: np.ndarray, n_docs: int) -> list[np.ndarray]:
    """Canonical per-rule destination arithmetic: (src² % N * P + k) % N."""
    src = np.asarray(src, dtype=np.int64)
    n = np.int64(n_docs)
    sq = (src * src) % n
    return [(sq * p + k) % n for p, k in _LINK_RULES]


def link_edges(sf_dir: str) -> "ray.data.Dataset":
    """documents → (src, dst) edge Dataset, 3 out-edges per doc."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        src = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = link_targets(src, n_docs)
        return pa.table(
            {
                "src": pa.array(np.tile(src, len(dsts))),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_LINK_EDGES = """
nn AS (SELECT COUNT(*) AS n FROM documents),
link_edges AS (
    SELECT doc_id AS src, (doc_id * doc_id % (SELECT n FROM nn) * 7919 + 1) % (SELECT n FROM nn) AS dst FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * doc_id % (SELECT n FROM nn) * 104729 + 2) % (SELECT n FROM nn) FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * doc_id % (SELECT n FROM nn) * 48271 + 3) % (SELECT n FROM nn) FROM documents
)"""


# -------------------------------------------------- SQL splitmix64 contract
# functions/hashing.splitmix64 re-expressed as a DuckDB CTE chain: HUGEINT
# (int128) carries the 64-bit state, wraparound multiplies use the 32-bit
# split (a*b mod 2^64 = (a_lo*b + ((a_hi*b_lo mod 2^32) << 32)) mod 2^64 —
# every intermediate fits int128), xors/shifts run in UBIGINT. Bit-identical
# to the numpy form (tests/test_derived.py), which is what lets the Bloom
# decontamination and the fake image decode be oracle-checked exactly.

_P64 = 1 << 64


def _sql_mulmod64(a: str, c: int) -> str:
    return (
        f"((({a}) % 4294967296) * {c}::HUGEINT % {_P64} + "
        f"((({a}) // 4294967296) * ({c % 4294967296}::HUGEINT)) % 4294967296 * 4294967296) % {_P64}"
    )


def _sql_xorshift(col: str, s: int) -> str:
    return f"CAST(xor(CAST({col} AS UBIGINT), CAST({col} AS UBIGINT) >> {s}) AS HUGEINT)"


def sql_splitmix64_chain(src_cte: str, key_cols: list[str], x_expr: str, out_cte: str) -> str:
    """CTE steps computing ``x = splitmix64(x_expr)`` (column named x, a
    HUGEINT in [0, 2^64)) from rows of ``src_cte``, carrying ``key_cols``
    through. Returns the comma-joined CTE definitions; the final CTE is
    named ``out_cte``."""
    keys = ", ".join(key_cols) + (", " if key_cols else "")
    steps = [
        f"{out_cte}_a AS (SELECT {keys}(CAST({x_expr} AS HUGEINT) + 11400714819323198485) % {_P64} AS x FROM {src_cte})",
        f"{out_cte}_b AS (SELECT {keys}{_sql_xorshift('x', 30)} AS x FROM {out_cte}_a)",
        f"{out_cte}_c AS (SELECT {keys}{_sql_mulmod64('x', 0xBF58476D1CE4E5B9)} AS x FROM {out_cte}_b)",
        f"{out_cte}_d AS (SELECT {keys}{_sql_xorshift('x', 27)} AS x FROM {out_cte}_c)",
        f"{out_cte}_e AS (SELECT {keys}{_sql_mulmod64('x', 0x94D049BB133111EB)} AS x FROM {out_cte}_d)",
        f"{out_cte} AS (SELECT {keys}{_sql_xorshift('x', 31)} AS x FROM {out_cte}_e)",
    ]
    return ",\n".join(steps)


# hashing.hash64_md5's SQL twin: first 8 bytes of md5, big-endian
SQL_HASH64_MD5 = "CAST('0x' || substr(md5({col}), 1, 16) AS UBIGINT)"


# ------------------------------------------------- derived triangle polygons


def tri_polys(sf_dir: str) -> pa.Table:
    """nation → 25 TRIANGLE polygons (general-ring PIP inputs — the shape
    class the winding-number kernel exists for; rects never exercise a
    non-axis-aligned edge). Vertex arithmetic is one mult + adds per
    coordinate, mirrored exactly in SQL_TRI_POLYS."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    key = t.column("n_nationkey").to_numpy().astype(np.int64)
    alat = -6.62 + (key % 5).astype(np.float64) * 0.17
    alon = 106.38 + (key // 5).astype(np.float64) * 0.19
    return pa.table(
        {
            "tri_id": key,
            "alat": alat,
            "alon": alon,
            "blat": alat + 0.13,
            "blon": alon + 0.02,
            "clat": alat + 0.05,
            "clon": alon + 0.15,
        }
    )


SQL_TRI_POLYS = """
tri_polys AS (
    SELECT n_nationkey AS tri_id,
           -6.62 + CAST(n_nationkey % 5 AS DOUBLE) * 0.17 AS alat,
           106.38 + CAST(n_nationkey // 5 AS DOUBLE) * 0.19 AS alon,
           -6.62 + CAST(n_nationkey % 5 AS DOUBLE) * 0.17 + 0.13 AS blat,
           106.38 + CAST(n_nationkey // 5 AS DOUBLE) * 0.19 + 0.02 AS blon,
           -6.62 + CAST(n_nationkey % 5 AS DOUBLE) * 0.17 + 0.05 AS clat,
           106.38 + CAST(n_nationkey // 5 AS DOUBLE) * 0.19 + 0.15 AS clon
    FROM nation
)"""


# ----------------------------------------------------- derived part rects


def add_part_rects(batch: pa.Table) -> pa.Table:
    """part batch → scattered small rectangles (rid, lat0, lon0, lat1, lon1).
    Widths/heights vary ~0.001-0.01 deg so every rect fits a 0.02-deg grid
    cell per axis; SQL_PART_RECTS mirrors the float64 op order exactly."""
    key = batch.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    # quadratic scatter — two LINEAR maps form a 2D lattice whose minimum
    # distance exceeds the overlap window at small n (zero pairs at sf<=0.01)
    lat0 = -6.7 + ((key * (key + 13)) % 9000).astype(np.float64) * 0.0001
    lon0 = 106.3 + ((key * (key + 57)) % 10000).astype(np.float64) * 0.0001
    lat1 = lat0 + (0.001 + (key % 7).astype(np.float64) * 0.0015)
    lon1 = lon0 + (0.001 + (key % 5).astype(np.float64) * 0.002)
    return pa.table(
        {"rid": key, "lat0": lat0, "lon0": lon0, "lat1": lat1, "lon1": lon1}
    )


def part_rects(sf_dir: str) -> "ray.data.Dataset":
    """part.parquet → rectangle Dataset (a BIG side — streamed, never
    collected; the rect-overlap join fan-outs it through a grid exchange)."""
    ds = read_pq(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    return ds.map_batches(add_part_rects, batch_format="pyarrow")


SQL_PART_RECTS = """
part_rects AS (
    SELECT p_partkey AS rid,
           -6.7 + CAST((p_partkey * (p_partkey + 13)) % 9000 AS DOUBLE) * 0.0001 AS lat0,
           106.3 + CAST((p_partkey * (p_partkey + 57)) % 10000 AS DOUBLE) * 0.0001 AS lon0,
           -6.7 + CAST((p_partkey * (p_partkey + 13)) % 9000 AS DOUBLE) * 0.0001
               + (0.001 + CAST(p_partkey % 7 AS DOUBLE) * 0.0015) AS lat1,
           106.3 + CAST((p_partkey * (p_partkey + 57)) % 10000 AS DOUBLE) * 0.0001
               + (0.001 + CAST(p_partkey % 5 AS DOUBLE) * 0.002) AS lon1
    FROM part
)"""
