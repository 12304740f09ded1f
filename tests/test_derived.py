"""The derived-geo contract: numpy and SQL derivations are bit-identical,
and no derived point sits exactly on an admin-rect edge (so inclusive-edge
semantics cannot diverge between winding PIP and SQL BETWEEN)."""

import duckdb
import numpy as np

from osm_search_ray.sources import derived as dv

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_page_coords_bit_identical_to_sql():
    con = _con()
    sql = con.execute(f"WITH {dv.SQL_GEO_PAGES.strip()} SELECT doc_id, lat, lon FROM geo_pages ORDER BY doc_id").df()
    has_geo, lat, lon = dv.page_coords(np.arange(500))
    ids = np.nonzero(has_geo)[0]
    assert (sql["doc_id"].to_numpy() == ids).all()
    # BIT-identical float64, not approximately equal
    assert (sql["lat"].to_numpy() == lat[ids]).all()
    assert (sql["lon"].to_numpy() == lon[ids]).all()


def test_cell_expr_bit_identical_to_sql():
    from osm_search_ray.functions.cells import cell_of

    con = _con()
    expr = dv.sql_cell_expr("lat", "lon", 12)
    sql = con.execute(
        f"WITH {dv.SQL_GEO_PAGES.strip()} SELECT doc_id, {expr} AS cell FROM geo_pages ORDER BY doc_id"
    ).df()
    has_geo, lat, lon = dv.page_coords(np.arange(500))
    ids = np.nonzero(has_geo)[0]
    assert (sql["cell"].to_numpy() == cell_of(lat[ids], lon[ids], 12)).all()


def test_no_point_on_rect_edge():
    """Minimum distance between any derived coordinate and any rect edge is
    far above float error — the PIP oracle contract of sources/derived.py."""
    has_geo, lat, lon = dv.page_coords(np.arange(100000))
    lat, lon = lat[has_geo], lon[has_geo]
    edges_lat = np.array([-6.605 + i * 0.16 for i in range(6)])
    edges_lon = np.array([106.395 + i * 0.18 for i in range(6)])
    dmin_lat = np.abs(lat[:, None] - edges_lat[None, :]).min()
    dmin_lon = np.abs(lon[:, None] - edges_lon[None, :]).min()
    assert dmin_lat > 1e-6 and dmin_lon > 1e-6


def test_extractor_parity_with_arithmetic():
    """The regex coordinate EXTRACTOR (pure function of page text, per the
    north rule's byte-identical-text invariant) recovers exactly the
    arithmetic coordinates that the oracle derives."""
    from osm_search_ray.sources.fixtures import embed_geo_text, extract_coords

    has_geo, lat, lon = dv.page_coords(np.arange(2000))
    ids = np.nonzero(has_geo)[0]
    texts = [embed_geo_text(f"body of page {i}", lat[i], lon[i]) for i in ids]
    got_lat, got_lon, ok = extract_coords(texts)
    assert ok.all()
    assert np.allclose(got_lat, lat[ids], atol=5e-7, rtol=0)
    assert np.allclose(got_lon, lon[ids], atol=5e-7, rtol=0)
    # texts with no geo tag must not crash and must be filtered
    _, _, ok2 = extract_coords(["no coordinates here", ""])
    assert not ok2.any()


def test_extract_coords_arrow_matches_python():
    import pyarrow as pa

    from osm_search_ray.sources.fixtures import extract_coords, extract_coords_arrow

    texts = [
        "body geo: -6.123456, 106.800000 tail",
        "no geo here",
        "",
        "geo: 91.0, 10.0",          # out of range → filtered
        "geo:  -6.5 , 107.0",       # space before comma → NOT a match (both)
        "x geo: -6.5, 107.0 geo: -1.0, 2.0",  # first match wins
        "geo: 6, 107",              # integer coords
    ]
    la1, lo1, ok1 = extract_coords(texts)
    la2, lo2, ok2 = extract_coords_arrow(pa.array(texts))
    assert ok1.tolist() == ok2.tolist()
    assert np.array_equal(la1[ok1], la2[ok2]) and np.array_equal(lo1[ok1], lo2[ok2])


def test_contact_suffix_identical_to_sql():
    """The PII-bearing contact suffix must be byte-identical between the
    Python derivation and the SQL CTE (string concat of integer arithmetic
    — no float involved, so equality is exact)."""
    con = _con()
    sql = con.execute(
        f"WITH {dv.SQL_CONTACT_PAGES.strip()} SELECT doc_id, raw_text FROM contact_pages ORDER BY doc_id"
    ).df()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    py = docs["text"] + dv.contact_suffix(docs["doc_id"].to_numpy())
    assert (sql["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (sql["raw_text"] == py).all()


def test_sql_splitmix64_chain_identical_to_numpy():
    """The DuckDB splitmix64 CTE chain (HUGEINT state, 32-bit-split
    wraparound multiplies) must be bit-identical to hashing.splitmix64 —
    the contract the Bloom and fake-image oracles stand on."""
    from osm_search_ray.functions.hashing import splitmix64

    rng = np.random.default_rng(17)
    vals = np.concatenate(
        [
            np.array([0, 1, 2**32 - 1, 2**32, 2**63, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**64, 64, dtype=np.uint64),
        ]
    )
    lst = ", ".join(f"{int(v)}::UBIGINT" for v in vals)
    sql = (
        f"WITH src AS (SELECT unnest([{lst}]) AS v),\n"
        + dv.sql_splitmix64_chain("src", ["v"], "v", "sm")
        + "\nSELECT v, x FROM sm"
    )
    rows = _con().execute(sql).fetchall()
    got = {int(v): int(x) for v, x in rows}
    want = splitmix64(vals)
    for v, w in zip(vals, want):
        assert got[int(v)] == int(w), v


def test_sql_hash64_md5_identical_to_numpy():
    from osm_search_ray.functions.hashing import hash64_md5

    strs = ["", "a", "hello world", "unicode: héllo ✓", "gram one two"]
    lst = ", ".join("'" + s.replace("'", "''") + "'" for s in strs)
    expr = dv.SQL_HASH64_MD5.format(col="s")
    rows = _con().execute(f"SELECT s, {expr} FROM (SELECT unnest([{lst}]) AS s)").fetchall()
    got = {s: int(h) for s, h in rows}
    want = hash64_md5(strs)
    for s, w in zip(strs, want):
        assert got[s] == int(w), s
