"""Unit tests for the pure kernels (no Ray needed)."""

import numpy as np
import pandas as pd
import pytest

from osm_search_ray.functions import cells, geometry, hashing, tokenize


class TestCells:
    def test_roundtrip_bounds(self):
        lat = np.array([-6.2, 0.0, 51.5, -89.9, 89.9])
        lon = np.array([106.8, 0.0, -0.1, -179.9, 179.9])
        for res in (7, 12, 14):
            c = cells.cell_of(lat, lon, res)
            lat0, lon0, lat1, lon1 = cells.cell_bounds(c, res)
            assert ((lat >= lat0) & (lat < lat1 + 1e-9)).all()
            assert ((lon >= lon0) & (lon < lon1 + 1e-9)).all()

    def test_parent_consistency(self):
        rng = np.random.default_rng(42)
        lat = rng.uniform(-89, 89, 1000)
        lon = rng.uniform(-179, 179, 1000)
        fine = cells.cell_of(lat, lon, 14)
        coarse = cells.cell_of(lat, lon, 12)
        assert (cells.parent_cell(fine, 14, 12) == coarse).all()

    def test_k_ring_counts(self):
        c = int(cells.cell_of(np.array([-6.2]), np.array([106.8]), 12)[0])
        assert len(cells.k_ring(c, 12, 0)) == 1
        assert len(cells.k_ring(c, 12, 1)) == 9
        assert len(cells.k_ring(c, 12, 2)) == 25
        assert len(cells.ring_only(c, 12, 2)) == 16

    def test_cover_bbox_contains_point_cells(self):
        rng = np.random.default_rng(7)
        lat = rng.uniform(-6.6, -5.9, 200)
        lon = rng.uniform(106.4, 107.2, 200)
        cover = set(cells.cover_bbox(-6.6, 106.4, -5.9, 107.2, 12).tolist())
        pts = cells.cell_of(lat, lon, 12)
        assert set(pts.tolist()) <= cover

    def test_morton_locality(self):
        # adjacent points share long prefixes more often than far ones
        a = cells.morton_cell(np.array([-6.2]), np.array([106.8]))[0]
        b = cells.morton_cell(np.array([-6.2000001]), np.array([106.8000001]))[0]
        far = cells.morton_cell(np.array([40.0]), np.array([-70.0]))[0]
        assert abs(int(a) - int(b)) < abs(int(a) - int(far))


class TestGeometry:
    def test_haversine_known(self):
        # Jakarta Monas → Ragunan zoo ≈ 15.4 km
        d = geometry.haversine_km(-6.1754, 106.8272, -6.3124, 106.8201)
        assert 15.0 < float(d) < 15.6
        assert float(geometry.haversine_km(0, 0, 0, 0)) == 0.0

    def test_haversine_equator_degree(self):
        # 1 degree of longitude at the equator ≈ 111.19 km (R=6371)
        d = float(geometry.haversine_km(0.0, 0.0, 0.0, 1.0))
        assert abs(d - 111.19492664455873) < 1e-6

    def test_pip_square(self):
        ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
        ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
        lat = np.array([0.5, 0.0, 1.0, 1.5, -0.1, 0.5])
        lon = np.array([0.5, 0.5, 1.0, 0.5, 0.5, 1.0000001])
        got = geometry.points_in_polygon(lat, lon, ring_lat, ring_lon)
        # centre inside; edge + corner inclusive (reference on-segment rule);
        # outside points excluded
        assert got.tolist() == [True, True, True, False, False, False]

    def test_pip_concave(self):
        # concave "U" polygon: the notch is outside
        ring_lat = np.array([0, 0, 3, 3, 1, 1, 3, 3, 0]) * 1.0
        ring_lon = np.array([0, 3, 3, 2, 2, 1, 1, 0, 0]) * 1.0
        inside = geometry.points_in_polygon(np.array([2.0]), np.array([1.5]), ring_lat, ring_lon)
        assert not inside[0]  # inside the notch = outside polygon
        assert geometry.points_in_polygon(np.array([0.5]), np.array([1.5]), ring_lat, ring_lon)[0]

    def test_pip_matches_scalar_oracle(self):
        # vectorized winding == pure-python winding oracle on random data
        rng = np.random.default_rng(3)
        ring_lat = np.array([0, 0.2, 1.1, 0.9, 0.5])
        ring_lon = np.array([0, 1.0, 0.8, 0.1, 0.4])
        lat = rng.uniform(-0.2, 1.3, 500)
        lon = rng.uniform(-0.2, 1.3, 500)
        got = geometry.points_in_polygon(lat, lon, ring_lat, ring_lon)
        for i in range(len(lat)):
            assert got[i] == _winding_scalar(lat[i], lon[i], ring_lat, ring_lon), i

    def test_median_centroid_even_len(self):
        # reference takes element len//2 of each INDEPENDENTLY sorted axis
        lat, lon = geometry.median_centroid(np.array([4.0, 1.0, 3.0, 2.0]), np.array([10.0, 40.0, 20.0, 30.0]))
        assert (lat, lon) == (3.0, 30.0)

    def test_midpoint(self):
        lat, lon = geometry.midpoint(0.0, 0.0, 0.0, 90.0)
        assert abs(lat) < 1e-9 and abs(lon - 45.0) < 1e-9

    def test_segment_circle(self):
        hit = geometry.segment_intersects_circle(
            np.array([-2.0]), np.array([0.0]), np.array([2.0]), np.array([0.0]), 0.0, 0.0, 1.0
        )
        assert hit[0]
        miss = geometry.segment_intersects_circle(
            np.array([-2.0]), np.array([2.0]), np.array([2.0]), np.array([2.0]), 0.0, 0.0, 1.0
        )
        assert not miss[0]
        # both endpoints inside: segment does not CROSS the boundary circle
        inside = geometry.segment_intersects_circle(
            np.array([-0.1]), np.array([0.0]), np.array([0.1]), np.array([0.0]), 0.0, 0.0, 1.0
        )
        assert not inside[0]


def _winding_scalar(py, px, ring_lat, ring_lon):
    """Pure-python winding-number oracle (reference pkg/geo/geometry.go:86-122)."""
    rl = list(zip(ring_lon.tolist(), ring_lat.tolist()))
    if rl[0] != rl[-1]:
        rl.append(rl[0])
    wn = 0
    for (x0, y0), (x1, y1) in zip(rl[:-1], rl[1:]):
        # on-segment short-circuit
        cross = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
        if abs(cross) <= 1e-12 and min(x0, x1) - 1e-12 <= px <= max(x0, x1) + 1e-12 and min(y0, y1) - 1e-12 <= py <= max(y0, y1) + 1e-12:
            return True
        if y0 <= py:
            if y1 > py and cross > 0:
                wn += 1
        else:
            if y1 <= py and cross < 0:
                wn -= 1
    return wn != 0


class TestHashing:
    def test_stability(self):
        a = hashing.hash64_str(["hello", "world", "hello"])
        assert a[0] == a[2] and a[0] != a[1]
        assert a[0] == hashing.hash64_str(["hello"])[0]  # process-stable

    def test_minhash_batch_kernel_equals_naive_reference(self):
        """The cache-blocked batch kernel must be BIT-identical to a
        straightforward per-row/per-window implementation — the SQL LSH
        oracle and every minhash dedup query stand on this kernel."""

        def naive(texts, num_perm=32, k=5, seed=7):
            a, b = hashing.perm_coeffs(num_perm, seed)
            out = np.empty((len(texts), num_perm), dtype=np.uint64)
            for i, txt in enumerate(texts):
                p = txt.encode("utf-8", "surrogatepass")
                if len(p) < k:
                    p = p.ljust(k, b"\0")
                arr = np.frombuffer(p, np.uint8).astype(np.uint64)
                hs = []
                with np.errstate(over="ignore"):
                    for s in range(len(p) - k + 1):
                        v = np.uint64(0)
                        for j in range(k):
                            v = v + arr[s + j] * np.uint64(257) ** np.uint64(j)
                        hs.append(int(hashing.splitmix64(np.array([v], np.uint64))[0]))
                    hv = np.array(hs, np.uint64)
                    for q in range(num_perm):
                        out[i, q] = (a[q] * hv + b[q]).min()
            return out

        rng = np.random.default_rng(3)
        texts = [
            "",  # padded to one NUL shingle
            "ab",  # shorter than k
            "exact",  # exactly k bytes → one window
            "héllo wörld ünïcode",  # multi-byte utf-8
        ] + ["".join(rng.choice(list("abcdef ")) for _ in range(int(n))) for n in rng.integers(1, 400, 30)]
        got = hashing.minhash_signature_batch(texts, 32, 5)
        assert np.array_equal(got, naive(texts))

    def test_minhash_similarity(self):
        rng = np.random.default_rng(0)
        base = [f"tok{i}" for i in range(200)]
        h1 = hashing.hash64_str(base)
        h2 = hashing.hash64_str(base[:180] + [f"x{i}" for i in range(20)])  # J≈0.818
        s1 = hashing.minhash_signature(h1, 128)
        s2 = hashing.minhash_signature(h2, 128)
        est = (s1 == s2).mean()
        true_j = 180 / 220
        assert abs(est - true_j) < 0.12

    def test_simhash_near_dup(self):
        h1 = hashing.hash64_str([f"tok{i}" for i in range(100)])
        h2 = hashing.hash64_str([f"tok{i}" for i in range(99)] + ["other"])
        h3 = hashing.hash64_str([f"zzz{i}" for i in range(100)])
        d_near = hashing.hamming64(np.array([hashing.simhash64(h1)]), np.array([hashing.simhash64(h2)]))[0]
        d_far = hashing.hamming64(np.array([hashing.simhash64(h1)]), np.array([hashing.simhash64(h3)]))[0]
        assert d_near < 10 < d_far

    def test_rolling_fingerprint(self):
        a = hashing.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        b = hashing.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        c = hashing.rolling_fingerprint("a completely different text body here")
        assert a == b != c


class TestTokenize:
    def test_basic(self):
        assert tokenize.tokenize("Jalan Sentosa-Harapan, No.3!") == ["jalan", "sentosa", "harapan", "no", "3"]
        assert tokenize.tokenize("") == []
        assert tokenize.tokenize("   ") == []

    def test_array(self):
        toks, counts = tokenize.tokenize_array(["a b", "", "c d e"])
        assert counts.tolist() == [2, 0, 3]
        assert toks.tolist() == ["a", "b", "c", "d", "e"]

    def test_sql_parity(self):
        import duckdb

        texts = ["Jalan Sentosa-Harapan, No.3!", "", "  x  Y z0 ", "UPPER lower 123", "a—béc"]
        got = [tokenize.tokenize(t) for t in texts]
        sql = tokenize.SQL_TOKENIZE.format(col="t")
        exp = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {sql} FROM (SELECT unnest(?) AS t)", params=[texts]
            ).fetchall()
        ]
        assert got == exp


class TestReferenceDistanceFixtures:
    def test_haversine_reference_cases(self):
        """Exact fixture cases from the reference
        (pkg/datastructure/distance_test.go:9-51, delta 0.1 km)."""
        cases = [
            (-7.557155997491524, 110.77170252731288, -7.550209300671982, 110.78942094938256, 2.1),
            (-7.546196863318374, 110.7775170972345, -7.550209300671982, 110.78942094938256, 1.38),
            (-7.759889166547908, 110.36689459108496, -7.760335932763678, 110.37671195413539, 1.08),
            (-7.700002453207869, 110.37712514761436, -7.760335932763678, 110.37671195413539, 6.7),
        ]
        for la1, lo1, la2, lo2, exp in cases:
            got = float(geometry.haversine_km(la1, lo1, la2, lo2))
            assert abs(got - exp) < 0.1, (exp, got)


class TestMapsKernels:
    """M10 osm_features + MapView lookups (pkg/geo/parse_osm.go tag ops,
    pkg/index/indexer.go:1172-1180 feature lists) — VERDICT r01: M10 was
    implemented but untested."""

    def _tags_batch(self):
        import pyarrow as pa

        tags = pa.array(
            [
                [("amenity", "cafe"), ("name", "Kopi Satu"), ("wifi", "yes")],
                [("name", "Jalan X"), ("highway", "residential"), ("addr:street", "Jl X")],
                [("wikidata", "Q1")],  # no whitelisted key
                [],
            ],
            pa.map_(pa.string(), pa.string()),
        )
        return pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()), "tags": tags})

    def test_osm_features_whitelist(self):
        from osm_search_ray.stages import maps

        got = maps.osm_features(self._tags_batch()).to_pylist()
        assert got == [
            ["amenity=cafe", "name=Kopi Satu"],  # wifi not whitelisted
            ["name=Jalan X", "highway=residential", "addr:street=Jl X"],
            [],
            [],
        ]

    def test_map_lookup_first_occurrence_and_membership(self):
        import pyarrow as pa

        from osm_search_ray.stages import maps

        t = self._tags_batch()
        assert maps.map_lookup(t.column("tags"), "name").tolist() == ["Kopi Satu", "Jalan X", None, None]
        assert maps.map_has_any_key(t.column("tags"), maps.VALID_NODE_TAGS).tolist() == [True, True, False, False]
        # duplicate key keeps the FIRST value
        dup = pa.table(
            {"tags": pa.array([[("name", "a"), ("name", "b")]], pa.map_(pa.string(), pa.string()))}
        )
        assert maps.map_lookup(dup.column("tags"), "name").tolist() == ["a"]

    def test_view_single_flatten_consistency(self):
        from osm_search_ray.stages import maps

        t = self._tags_batch()
        view = maps.MapView(t.column("tags"))
        assert view.lookup("amenity").tolist() == ["cafe", None, None, None]
        assert view.has_any(frozenset({"wikidata"})).tolist() == [False, False, True, False]
        assert view.features(frozenset({"highway"})).to_pylist() == [[], ["highway=residential"], [], []]


class TestDestinationPoint:
    def test_known_destinations(self):
        """M17 (corrected formula; the reference's is dead code with a typo —
        SURVEY.md §7.4 deviation 4). Oracle: 111.195 km north = +1° lat;
        eastward at the equator = +1° lon; round-trip via haversine."""
        la, lo = geometry.destination_point(0.0, 0.0, 0.0, 111.19492664455873)
        assert abs(la - 1.0) < 1e-9 and abs(lo) < 1e-9
        la, lo = geometry.destination_point(0.0, 0.0, 90.0, 111.19492664455873)
        assert abs(la) < 1e-9 and abs(lo - 1.0) < 1e-9
        # arbitrary bearing: the haversine distance back to start matches
        la, lo = geometry.destination_point(-6.2, 106.8, 37.0, 42.0)
        assert abs(float(geometry.haversine_km(-6.2, 106.8, la, lo)) - 42.0) < 1e-6


class TestTDigest:
    def test_accuracy_and_merge_invariance(self):
        """Rank error of the k1-clustered t-digest stays ≤ ~2/delta at the
        probed quantiles, on one digest AND on a 37-way merge of per-chunk
        digests (the map_batches partial → merge shape), with total weight
        conserved and size bounded."""
        from osm_search_ray.stages.sketches import (
            tdigest_from_values,
            tdigest_merge,
            tdigest_quantiles,
        )

        rng = np.random.default_rng(0)
        x = rng.lognormal(3, 1, 200_000)
        xs = np.sort(x)
        qs = np.array([0.01, 0.25, 0.5, 0.75, 0.9, 0.99])
        for m, w in (
            tdigest_from_values(x),
            tdigest_merge([tdigest_from_values(c) for c in np.array_split(x, 37)]),
        ):
            assert len(m) <= 220  # ~delta centroids
            assert w.sum() == pytest.approx(len(x))
            est = tdigest_quantiles(m, w, qs)
            rank = np.searchsorted(xs, est) / len(xs)
            assert np.abs(rank - qs).max() <= 0.01

    def test_degenerate_inputs(self):
        from osm_search_ray.stages.sketches import tdigest_from_values, tdigest_quantiles

        m, w = tdigest_from_values(np.array([]))
        assert len(m) == 0 and np.isnan(tdigest_quantiles(m, w, [0.5])[0])
        m, w = tdigest_from_values(np.array([7.0]))
        assert tdigest_quantiles(m, w, [0.0, 0.5, 1.0]).tolist() == [7.0, 7.0, 7.0]
        # all-identical values collapse to few centroids, quantiles exact
        m, w = tdigest_from_values(np.full(1000, 3.5))
        assert np.allclose(tdigest_quantiles(m, w, [0.1, 0.9]), 3.5)


class TestMisraGries:
    def test_merge_guarantee(self):
        """Mergeable-summaries bound: after per-chunk reduce + merge, every
        item keeps true ≥ est ≥ true − N/(w+1), so all heavy hitters
        (true > N/(w+1)) survive to the candidate set."""
        from osm_search_ray.stages.sketches import mg_merge, mg_reduce

        rng = np.random.default_rng(1)
        p = 1.0 / np.arange(1, 5001) ** 1.1
        toks = rng.choice([f"t{i}" for i in range(5000)], p=p / p.sum(), size=300_000)
        true = pd.Series(toks).value_counts()
        W = 256
        parts = []
        for c in np.array_split(toks, 23):
            vc = pd.Series(c).value_counts(sort=False)
            parts.append(mg_reduce(vc.index.to_numpy(dtype=object), vc.to_numpy(np.int64), W))
        it, ct = mg_merge(parts, W)
        assert len(it) <= W
        est = pd.Series(ct, index=it)
        n = len(toks)
        heavy = set(true[true > n / (W + 1)].index)
        assert heavy <= set(it)
        diff = true[est.index] - est
        assert (diff >= 0).all() and diff.max() <= n / (W + 1)


def test_top_terms_sketch_exact_and_certificate(tmp_path):
    """top_terms_sketch == exact pandas top-k on a skewed corpus (small
    width exercises real MG reduction), and the exactness certificate
    raises when width is too small to prove the result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.functions.tokenize import tokenize_array
    from osm_search_ray.pipelines.textops import top_terms_sketch

    rng = np.random.default_rng(2)
    p = 1.0 / np.arange(1, 401) ** 1.2
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab, p=p / p.sum(), size=40)) for _ in range(300)]
    pq.write_table(pa.table({"doc_id": pa.array(range(300)), "text": pa.array(texts)}), tmp_path / "documents.parquet")
    got = top_terms_sketch(str(tmp_path), k=10, width=128)
    toks, _ = tokenize_array(texts)
    vc = pd.Series(toks).value_counts()
    exact = (
        pd.DataFrame({"term": vc.index, "n": vc.to_numpy()})
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert got["term"].tolist() == exact["term"].tolist()
    assert got["n"].tolist() == exact["n"].tolist()
    assert got["rank"].tolist() == list(range(1, 11))
    # near-uniform corpus + tiny width → kth count below N/(w+1): must refuse
    flat = [" ".join(rng.choice([f"u{i}" for i in range(2000)], size=40)) for _ in range(100)]
    pq.write_table(pa.table({"doc_id": pa.array(range(100)), "text": pa.array(flat)}), tmp_path / "documents.parquet")
    with pytest.raises(ValueError, match="not certifiably exact"):
        top_terms_sketch(str(tmp_path), k=10, width=2)
    # vocab smaller than k and width: nothing reduced → exact short result
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1]), "text": pa.array(["a b a", "b a c"])}),
        tmp_path / "documents.parquet",
    )
    tiny = top_terms_sketch(str(tmp_path), k=10, width=64)
    assert tiny["term"].tolist() == ["a", "b", "c"] and tiny["n"].tolist() == [3, 2, 1]


def test_price_quantiles_tdigest_accuracy():
    """Rows-only driver query oracle: each group's t-digest estimates must
    land within rank error 0.01 of the group's exact value distribution."""
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.relational import price_quantiles_tdigest

    sf = "/root/testdata/sf0.001"
    got = price_quantiles_tdigest(sf).to_pandas().set_index("l_returnflag")
    li = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pandas()
    for flag, sub in li.groupby("l_returnflag"):
        xs = np.sort(sub["l_extendedprice"].to_numpy())
        row = got.loc[flag]
        assert row["n_rows"] == len(xs)
        for col, q in (("p50_milli", 0.5), ("p90_milli", 0.9), ("p99_milli", 0.99)):
            est = row[col] / 1000.0
            rank = np.searchsorted(xs, est) / len(xs)
            assert abs(rank - q) <= 0.01, (flag, col, rank)


class TestPiiRedact:
    def test_redact_batch_edge_cases(self):
        """Pattern order and counting semantics: emails are consumed before
        phone/IP (so digits inside an address never double-count), counts
        are per-class non-overlapping matches, clean rows pass unchanged."""
        import pyarrow as pa

        from osm_search_ray.pipelines.pii import redact_batch

        rows = [
            "reach a@b.co or c.d+e@f-g.org now",            # 2 emails
            "call +1-555-0042 and +44-123-4567",            # 2 phones
            "hosts 10.0.0.1 and 192.168.255.254.7",         # 2 ips (greedy left)
            "mixed u9@mail2.example +1-555-0001 10.1.2.3",  # one of each
            "nothing sensitive here",                       # untouched
            "",                                             # empty row
        ]
        t = pa.table({"doc_id": pa.array(range(len(rows))), "raw_text": pa.array(rows)})
        out = redact_batch(t)
        clean = out.column("clean_text").to_pylist()
        assert clean[0] == "reach <EMAIL> or <EMAIL> now"
        assert clean[1] == "call <PHONE> and <PHONE>"
        assert clean[3] == "mixed <EMAIL> <PHONE> <IP>"
        assert clean[4] == rows[4] and clean[5] == ""
        assert out.column("n_email").to_pylist() == [2, 0, 0, 1, 0, 0]
        assert out.column("n_phone").to_pylist() == [0, 2, 0, 1, 0, 0]
        assert out.column("n_ip").to_pylist()[2] >= 1 and out.column("n_ip").to_pylist()[3] == 1
        # the email's digits must not leak into phone/ip counts
        assert out.column("n_ip").to_pylist()[0] == 0 and out.column("n_phone").to_pylist()[0] == 0


def test_bpe_pattern_counts_known_cases():
    """The BPE-ish pretokenizer pattern on hand-checked strings (RE2
    leftmost-first alternation; space binds to the following run)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from osm_search_ray.pipelines.textops import BPE_PATTERN

    cases = {
        "hello world": 2,        # " world" is one piece
        "a1b": 3,                # letter / digit / letter runs split
        "x, y!": 4,              # "x" "," " y" "!"
        "2026-08-17": 5,         # digits - digits - digits
        "": 0,
        "   ": 0,                # bare whitespace is not a piece
    }
    got = pc.count_substring_regex(pa.array(list(cases)), BPE_PATTERN).to_pylist()
    assert got == list(cases.values())


def test_corr_price_qty_matches_numpy():
    """The exact-integer-moment Pearson correlation must agree with
    np.corrcoef on the same scaled integers (independent formula path)."""
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.relational import corr_price_qty

    sf = "/root/testdata/sf0.001"
    got = corr_price_qty(sf).set_index("l_returnflag")
    df = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    df["x"] = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    df["y"] = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
    for flag, g in df.groupby("l_returnflag"):
        ref = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(got.loc[flag, "corr_x1e9"] / 1e9 - ref) < 1e-6
        assert got.loc[flag, "n_rows"] == len(g)


def test_revenue_by_nation_matches_pandas():
    """3-way join rollup == pandas merge over the same tables."""
    import pandas as pd
    from osm_search_ray.pipelines.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    got = revenue_by_nation(sf).set_index("n_name").sort_index()  # returns a pandas frame (r04)
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"])
    o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    want = m.groupby("n_name")["cents"].agg(["size", "sum"]).sort_index()
    assert (got["n_orders"].to_numpy() == want["size"].to_numpy()).all()
    assert (got["revenue_cents"].to_numpy() == want["sum"].to_numpy()).all()


def test_global_rank_chars_is_a_permutation_in_order():
    import pandas as pd
    from osm_search_ray.pipelines.relational import global_rank_chars

    sf = "/root/testdata/sf0.001"
    got = global_rank_chars(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    want = docs.sort_values(["n_chars", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    want["rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    got = got.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "n_chars", "rank"]], want)


def test_ntile_exact_sql_rule_nondivisible(tmp_path):
    """N=10, k=4 → bucket sizes 3,3,2,2 (first N mod k buckets get the
    extra row) — the exact SQL NTILE rule, checked against DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from osm_search_ray.pipelines.relational import ntile_chars, SQL_NTILE_CHARS

    t = pa.table(
        {"doc_id": pa.array(range(10), pa.int64()),
         "n_chars": pa.array([90, 80, 70, 60, 50, 40, 30, 20, 10, 5], pa.int64())}
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    got = ntile_chars(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(SQL_NTILE_CHARS).df().sort_values("doc_id").reset_index(drop=True)
    assert (got["tile"].to_numpy() == want["tile"].to_numpy()).all()
    assert got["tile"].value_counts().sort_index().tolist() == [3, 3, 2, 2]


def test_contamination_bloom_superset_of_exact():
    """Bloom decontamination: never misses an exact hit (no false
    negatives); over-flagging bounded well under 1% of shingle tests."""
    import pandas as pd
    from osm_search_ray.pipelines.textops import contamination_check, contamination_check_bloom

    sf = "/root/testdata/sf0.001"
    exact = contamination_check(sf).to_pandas().set_index("doc_id")["n_contaminated"]
    bloom = contamination_check_bloom(sf).to_pandas().set_index("doc_id")["n_flagged"]
    assert len(exact) > 0
    assert set(exact.index) <= set(bloom.index)  # every exact-hit doc flagged
    joined = pd.concat([exact, bloom], axis=1).fillna(0)
    assert (joined["n_flagged"] >= joined["n_contaminated"]).all()
    extra = (joined["n_flagged"] - joined["n_contaminated"]).sum()
    total = joined["n_flagged"].sum()
    assert extra <= max(2, 0.01 * total), (extra, total)


def test_events_moving_sum_matches_pandas_rolling():
    import pandas as pd
    from osm_search_ray.pipelines.events import events_moving_sum, MOVING_WINDOW_ROWS

    sf = "/root/testdata/sf0.001"
    got = events_moving_sum(sf).to_pandas().set_index("event_id").sort_index()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    want = (
        ev.groupby("user_id")["cents"]
        .rolling(MOVING_WINDOW_ROWS + 1, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    ev["want"] = want.astype(np.int64)
    ev = ev.set_index("event_id").sort_index()
    assert (got["moving_sum_cents"].to_numpy() == ev["want"].to_numpy()).all()
