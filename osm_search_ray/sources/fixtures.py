"""Deterministic synthetic fixtures (seeded, no external data).

1. Common-Crawl-style ``pages`` per BASELINE.json ``input_hint``:
   (url, warc_ts, html, text, lang). A deterministic subset of rows embeds
   coordinates in ``text`` ("geo: <lat>, <lon>"); the extractor is a PURE
   function of ``text`` (the per-url byte-identical invariant of the north
   rule). ``html`` wraps ``text`` so extraction must look at ``text`` only.

2. OSM-style geometry tables (nodes/ways/relations) embedding the reference
   repo's own test corpora (FIXTURES.md §2): the SPIMI "Jalan ..." docs
   (pkg/index/indexer_test.go:32-326,408-651), the golden search places
   (pkg/searcher/searcher_test.go:50-190), and nested admin rectangles for
   the address-assembly / PIP cases.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

GEO_RE = re.compile(r"geo:\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)")


def embed_geo_text(body: str, lat: float, lon: float) -> str:
    """Append the canonical geo tag to a page body (6 decimals ≈ 0.11 m)."""
    return f"{body} geo: {lat:.6f}, {lon:.6f}"


def extract_coords_arrow(text_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized coordinate extractor over an Arrow string column using the
    ``extract_regex`` C++ kernel — the hot-path form of :func:`extract_coords`
    (same semantics; equality asserted in tests/test_derived.py)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    if isinstance(text_col, _pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    m = _pc.extract_regex(text_col, pattern=r"geo:\s*(?P<lat>-?\d+(?:\.\d+)?),\s*(?P<lon>-?\d+(?:\.\d+)?)")
    lat = _pc.cast(_pc.struct_field(m, "lat"), _pa.float64()).to_numpy(zero_copy_only=False)
    lon = _pc.cast(_pc.struct_field(m, "lon"), _pa.float64()).to_numpy(zero_copy_only=False)
    ok = ~np.isnan(lat) & ~np.isnan(lon) & (np.abs(lat) <= 90.0) & (np.abs(lon) <= 180.0)
    lat = np.where(ok, lat, np.nan)
    lon = np.where(ok, lon, np.nan)
    return lat, lon, ok


def extract_coords(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure coordinate extractor: text → (lat, lon, has_geo).

    Must stay a pure function of ``text`` (north-rule invariant: byte-identical
    text per url ⇒ identical coordinates). Rows without a geo tag get ok=False.
    """
    n = len(texts)
    lat = np.full(n, np.nan)
    lon = np.full(n, np.nan)
    ok = np.zeros(n, dtype=bool)
    search = GEO_RE.search
    for i, t in enumerate(texts):
        if not t:
            continue
        m = search(t)
        if m:
            la, lo = float(m.group(1)), float(m.group(2))
            if -90.0 <= la <= 90.0 and -180.0 <= lo <= 180.0:
                lat[i], lon[i], ok[i] = la, lo, True
    return lat, lon, ok


def make_pages(n: int = 1000, seed: int = 42) -> pa.Table:
    """Synthetic pages table. ~80% of rows carry a geo tag; coordinates are
    skewed: 30% cluster in a dense 'urban' tile (exercises salting)."""
    rng = np.random.default_rng(seed)
    idx = np.arange(n, dtype=np.int64)
    has_geo = (idx % 5) != 0
    clustered = (idx % 10) < 3
    lat = np.where(clustered, rng.uniform(-6.21, -6.19, n), rng.uniform(-6.8, -5.8, n))
    lon = np.where(clustered, rng.uniform(106.79, 106.81, n), rng.uniform(106.2, 107.4, n))
    langs = np.where(idx % 3 == 0, "id", "en")
    urls, texts, htmls = [], [], []
    words = ["warung", "jalan", "kota", "pasar", "taman", "museum", "data", "page", "info"]
    for i in range(n):
        body = " ".join(rng.choice(words, size=6 + int(rng.integers(0, 10))))
        text = embed_geo_text(body, lat[i], lon[i]) if has_geo[i] else body
        urls.append(f"https://example.test/{i}")
        texts.append(text)
        htmls.append(f"<html><body><p>{text}</p></body></html>".encode())
    ts = (np.int64(1700000000_000000) + idx * np.int64(60_000000)).astype("datetime64[us]")
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
        }
    )


def pages_to_points(batch: pa.Table) -> pa.Table:
    """map_batches stage: pages → (url, lat, lon, lang). Projects the wide
    ``html`` column away IMMEDIATELY (it dominates block size at scale)."""
    lat, lon, ok = extract_coords(batch.column("text").to_pylist())
    t = pa.table(
        {
            "url": batch.column("url"),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
            "lang": batch.column("lang"),
        }
    )
    return t.filter(pa.array(ok))


# ---------------------------------------------------------------------------
# Reference-parity OSM-style corpus (FIXTURES.md §2)
# ---------------------------------------------------------------------------

# SPIMI corpus names: pkg/index/indexer_test.go:32-135 (ways) and :408-651
SPIMI_WAY_NAMES = [
    "Jalan Sentosa Harapan",
    "Jalan Dunia Baru",
    "Jalan Mulwo Apel",
    "Jalan Kebun Jeruk Apel",
    "Jalan Pantai Ancol",
]
SPIMI_NODE_NAMES = [
    "Jalan Gambir",
    "Jalan Pasar Minggu",
    "Jalan Adi Sucipto",
    "Jalan Ahmad Yani",
    "Jalan Dani",
    "Jalan Dani Jadul",
]

# Golden search places: pkg/searcher/searcher_test.go:50-190 (+ real coords)
GOLDEN_PLACES = [
    ("Dunia Fantasi", -6.1256, 106.8336, "theme_park"),
    ("Kebun Binatang Ragunan", -6.3124, 106.8201, "zoo"),
    ("Monumen Nasional", -6.1754, 106.8272, "monument"),
    ("Taman Mini Indonesia", -6.3025, 106.8951, "theme_park"),
]


def make_osm_tables(seed: int = 42) -> dict[str, pa.Table]:
    """nodes / ways / relations embedding the reference test fixtures.

    Ways are polylines whose node coordinates live ONLY in ``nodes`` (so the
    way→node explode-join-regroup J1 is genuinely exercised); relations are
    nested admin rectangles at levels 2..7 around Jakarta.
    """
    rng = np.random.default_rng(seed)
    node_rows: list[tuple[int, float, float, dict]] = []
    way_rows: list[tuple[int, list[int], dict]] = []
    next_node = iter(range(1, 10_000_000))

    def add_way(way_id: int, name: str, n_nodes: int, center: tuple[float, float], tags: dict):
        ids = []
        for j in range(n_nodes):
            nid = next(next_node)
            ids.append(nid)
            node_rows.append(
                (nid, center[0] + 0.001 * j + rng.uniform(-1e-4, 1e-4), center[1] + 0.0012 * j, {})
            )
        way_rows.append((way_id, ids, {"name": name, **tags}))

    for i, name in enumerate(SPIMI_WAY_NAMES):
        add_way(100 + i, name, 4 + (i % 3), (-6.20 - 0.01 * i, 106.80 + 0.01 * i), {"highway": "residential", "addr:street": name})

    for i, name in enumerate(SPIMI_NODE_NAMES):
        nid = next(next_node)
        node_rows.append((nid, -6.15 - 0.005 * i, 106.75 + 0.004 * i, {"name": name, "historic": "yes"}))

    for i, (name, lat, lon, kind) in enumerate(GOLDEN_PLACES):
        nid = next(next_node)
        node_rows.append((nid, lat, lon, {"name": name, "tourism": kind}))

    # unnamed / disallowed-tag rows (must be filtered by M1/M2)
    nid = next(next_node)
    node_rows.append((nid, -6.5, 106.5, {"power": "tower"}))
    add_way(900, "", 3, (-6.4, 106.6), {"highway": "service"})

    # nested admin rectangles, levels 7 (kelurahan) .. 2 (country)
    rel_rows = []
    admin_ways = []
    for level, (name, half) in enumerate(
        [("Indonesia", 3.0), ("Jawa Barat", 1.0), ("Jakarta", 0.4), ("Jakarta Selatan", 0.2), ("Kebayoran", 0.1), ("Gandaria", 0.05)]
    ):
        admin_level = str(2 + level)
        wid = 2000 + level
        c = (-6.25, 106.80)
        ring = [
            (c[0] - half, c[1] - half),
            (c[0] - half, c[1] + half),
            (c[0] + half, c[1] + half),
            (c[0] + half, c[1] - half),
            (c[0] - half, c[1] - half),
        ]
        ids = []
        for la, lo in ring:
            nid = next(next_node)
            ids.append(nid)
            node_rows.append((nid, la, lo, {}))
        way_rows.append((wid, ids, {"boundary": "administrative"}))
        rel_rows.append((3000 + level, name, admin_level, f"1{level}000", [wid], {"boundary": "administrative"}))
        admin_ways.append(wid)

    nodes = pa.table(
        {
            "id": pa.array([r[0] for r in node_rows], pa.int64()),
            "lat": pa.array([r[1] for r in node_rows], pa.float64()),
            "lon": pa.array([r[2] for r in node_rows], pa.float64()),
            "tags": pa.array([r[3] for r in node_rows], pa.map_(pa.string(), pa.string())),
        }
    )
    ways = pa.table(
        {
            "id": pa.array([r[0] for r in way_rows], pa.int64()),
            "node_ids": pa.array([r[1] for r in way_rows], pa.list_(pa.int64())),
            "tags": pa.array([r[2] for r in way_rows], pa.map_(pa.string(), pa.string())),
        }
    )
    relations = pa.table(
        {
            "id": pa.array([r[0] for r in rel_rows], pa.int64()),
            "name": pa.array([r[1] for r in rel_rows]),
            "admin_level": pa.array([r[2] for r in rel_rows]),
            "postal_code": pa.array([r[3] for r in rel_rows]),
            "way_ids": pa.array([r[4] for r in rel_rows], pa.list_(pa.int64())),
            "tags": pa.array([r[5] for r in rel_rows], pa.map_(pa.string(), pa.string())),
        }
    )
    return {"nodes": nodes, "ways": ways, "relations": relations}
