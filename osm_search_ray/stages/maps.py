"""Vectorized per-batch map/filter kernels over OSM-style tables
(reference operators M1-M4, M10 — /root/reference/pkg/geo/parse_osm.go).

Arrow ``map<string,string>`` columns are processed via the MapArray's
flattened keys/items + offsets with numpy segment reductions — no Python
loop over rows in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The 35-key whitelist of pkg/geo/parse_osm.go:34-70 (ValidSearchTags).
VALID_SEARCH_TAGS = frozenset(
    """amenity building craft emergency historic leisure military natural
    office shop sport tourism water waterway highway railway aeroway
    healthcare barrier boundary man_made public_transport place power
    landuse aerialway advertising club geological telecom name addr:street
    addr:postcode addr:housenumber short_name""".split()
)

# ValidNodeSearchTag (pkg/geo/parse_osm.go:72-75).
VALID_NODE_TAGS = frozenset({"historic", "name"})

# GetOSMObjectType priority order (pkg/geo/parse_osm.go:481-533): first
# matching key wins.
OBJECT_TYPE_PRIORITY = [
    "amenity",
    "highway",
    "historic",
    "leisure",
    "military",
    "natural",
    "office",
    "craft",
    "aeroway",
    "tourism",
    "emergency",
    "shop",
]


def _map_parts(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(keys, items, offsets) of a map column, flattened across the batch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    keys = np.asarray(col.keys.to_pylist(), dtype=object)
    items = np.asarray(col.items.to_pylist(), dtype=object)
    offsets = col.offsets.to_numpy()
    return keys, items, offsets


def map_has_any_key(col, keyset: frozenset) -> np.ndarray:
    """Per row: does the tag map contain ANY key from ``keyset``?
    Vectorized: flat membership + segment-any via reduceat."""
    keys, _, offsets = _map_parts(col)
    if len(keys) == 0:
        return np.zeros(len(offsets) - 1, dtype=bool)
    member = np.isin(keys, list(keyset))
    out = np.zeros(len(offsets) - 1, dtype=bool)
    lens = np.diff(offsets)
    nz = lens > 0
    # reduceat over non-empty segments
    idx = offsets[:-1][nz]
    out[nz] = np.logical_or.reduceat(member, idx) if idx.size else False
    # reduceat quirk: a segment starting at the same index as the next gets
    # the single element — handled because we excluded empty segments
    return out


def map_lookup(col, key: str) -> np.ndarray:
    """Per row: value of ``key`` in the tag map, or None (first occurrence).
    Vectorized over the flattened representation."""
    keys, items, offsets = _map_parts(col)
    n = len(offsets) - 1
    out = np.full(n, None, dtype=object)
    if len(keys) == 0:
        return out
    hit = keys == key
    if not hit.any():
        return out
    pos = np.nonzero(hit)[0]
    rows = np.searchsorted(offsets, pos, side="right") - 1
    # keep first occurrence per row (reverse so earlier pos wins)
    for p, r in zip(pos[::-1], rows[::-1]):
        out[r] = items[p]
    return out


def check_way_allowed(batch: pa.Table, tags_col: str = "tags") -> np.ndarray:
    """M1 — keep way if any tag key ∈ ValidSearchTags
    (pkg/geo/parse_osm.go:535-544)."""
    return map_has_any_key(batch.column(tags_col), VALID_SEARCH_TAGS)


def check_node_allowed(batch: pa.Table, tags_col: str = "tags") -> np.ndarray:
    """M2 — keep node if any tag key ∈ {historic, name}
    (pkg/geo/parse_osm.go:546-553)."""
    return map_has_any_key(batch.column(tags_col), VALID_NODE_TAGS)


def project_name_address_type(batch: pa.Table, tags_col: str = "tags") -> pa.Table:
    """M3 + M4 — project tags → (name [+ ' (short_name)'], street, tipe,
    postal_code, house_number); empty-name rows are DROPPED
    (pkg/geo/parse_osm.go:464-479, 481-533)."""
    tags = batch.column(tags_col)
    name = map_lookup(tags, "name")
    short = map_lookup(tags, "short_name")
    street = map_lookup(tags, "addr:street")
    postcode = map_lookup(tags, "addr:postcode")
    housenumber = map_lookup(tags, "addr:housenumber")

    # first-match priority type extractor (M4)
    tipe = np.full(len(batch), "", dtype=object)
    unset = np.ones(len(batch), dtype=bool)
    for key in OBJECT_TYPE_PRIORITY:
        vals = map_lookup(tags, key)
        take = unset & (vals != None)  # noqa: E711  (numpy object compare)
        tipe[take] = vals[take]
        unset &= ~take

    full_name = np.array(
        [f"{n} ({s})" if (n and s) else (n or "") for n, s in zip(name, short)], dtype=object
    )
    keep = full_name != ""
    out = batch.drop_columns([tags_col])
    out = out.append_column("name", pa.array(full_name, pa.string()))
    out = out.append_column("street", pa.array(street, pa.string()))
    out = out.append_column("tipe", pa.array(tipe, pa.string()))
    out = out.append_column("postal_code", pa.array(postcode, pa.string()))
    out = out.append_column("house_number", pa.array(housenumber, pa.string()))
    return out.filter(pa.array(keep))


def osm_features(batch: pa.Table, tags_col: str = "tags") -> pa.Array:
    """M10 — per row, the list of 'key=value' strings for keys in
    ValidSearchTags (pkg/index/indexer.go:1172-1180). Returns list<string>."""
    keys, items, offsets = _map_parts(batch.column(tags_col))
    n = len(offsets) - 1
    if len(keys) == 0:
        return pa.array([[] for _ in range(n)], pa.list_(pa.string()))
    member = np.isin(keys, list(VALID_SEARCH_TAGS))
    rows = []
    for i in range(n):
        seg = slice(offsets[i], offsets[i + 1])
        rows.append([f"{k}={v}" for k, v, m in zip(keys[seg], items[seg], member[seg]) if m])
    return pa.array(rows, pa.list_(pa.string()))
