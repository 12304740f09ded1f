"""Property-based tests (hypothesis) for the geometric/hash kernels —
mirrors the reference's structural R-tree invariant tests (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_search_ray.functions import cells, geometry, hashing

finite_lat = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
finite_lon = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)


class TestCellProperties:
    @given(finite_lat, finite_lon, st.integers(min_value=1, max_value=15))
    @settings(max_examples=200, deadline=None)
    def test_point_in_own_cell_bounds(self, lat, lon, res):
        c = cells.cell_of(np.array([lat]), np.array([lon]), res)
        lat0, lon0, lat1, lon1 = cells.cell_bounds(c, res)
        # ±1e-9 tolerance: points within one double-rounding of a cell edge
        # may land either side of floor() — consistently in numpy AND SQL
        # (both use the same arithmetic), so parity is unaffected
        assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9
        assert lon0[0] - 1e-9 <= lon <= lon1[0] + 1e-9

    @given(finite_lat, finite_lon, st.integers(min_value=4, max_value=14), st.integers(min_value=1, max_value=3))
    @settings(max_examples=100, deadline=None)
    def test_parent_of_kring_members(self, lat, lon, res, k):
        """k_ring members at res are all within k cells (Chebyshev) of center."""
        c = int(cells.cell_of(np.array([lat]), np.array([lon]), res)[0])
        n = 1 << res
        cx, cy = c // n, c % n
        for m in cells.k_ring(c, res, k):
            mx, my = int(m) // n, int(m) % n
            dx = min(abs(mx - cx), n - abs(mx - cx))  # lon wraps
            assert dx <= k and abs(my - cy) <= k

    @given(finite_lat, finite_lon)
    @settings(max_examples=100, deadline=None)
    def test_cover_bbox_contains_cell(self, lat, lon):
        res = 10
        c = cells.cell_of(np.array([lat]), np.array([lon]), res)[0]
        cov = cells.cover_bbox(lat, lon, lat, lon, res)
        assert c in set(cov.tolist())


class TestGeometryProperties:
    @given(finite_lat, finite_lon, finite_lat, finite_lon)
    @settings(max_examples=200, deadline=None)
    def test_haversine_symmetry_triangle(self, a, b, c, d):
        d1 = float(geometry.haversine_km(a, b, c, d))
        d2 = float(geometry.haversine_km(c, d, a, b))
        assert abs(d1 - d2) < 1e-9
        assert d1 >= 0
        assert d1 <= 6371.0 * np.pi + 1e-6  # half circumference

    @given(
        st.lists(st.tuples(finite_lat, finite_lon), min_size=3, max_size=10, unique=True),
        finite_lat,
        finite_lon,
    )
    @settings(max_examples=100, deadline=None)
    def test_pip_matches_scalar_winding(self, ring, lat, lon):
        ring_lat = np.array([r[0] for r in ring])
        ring_lon = np.array([r[1] for r in ring])
        got = geometry.points_in_polygon(np.array([lat]), np.array([lon]), ring_lat, ring_lon)[0]
        from tests.test_functions import _winding_scalar

        assert got == _winding_scalar(lat, lon, ring_lat, ring_lon)

    @given(st.lists(st.floats(-80, 80, allow_nan=False), min_size=1, max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_median_centroid_is_element(self, vals):
        lat, lon = geometry.median_centroid(np.array(vals), np.array(vals))
        assert lat in vals and lon in vals  # len//2 element, never interpolated


class TestHashProperties:
    @given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_batch_minhash_consistent(self, texts):
        """Batch kernel equals itself across groupings (associativity of
        per-row computation) and is deterministic."""
        a = hashing.minhash_signature_batch(texts, 16)
        b = hashing.minhash_signature_batch(texts, 16)
        assert np.array_equal(a, b)
        # splitting the batch must not change any row's signature
        half = len(texts) // 2
        if half:
            c = np.vstack(
                [hashing.minhash_signature_batch(texts[:half], 16), hashing.minhash_signature_batch(texts[half:], 16)]
            )
            assert np.array_equal(a, c)

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_varint_roundtrip(self, vals):
        arr = np.asarray(vals, dtype=np.uint64)
        assert (hashing.decode_uvarints(hashing.encode_uvarints(arr)) == arr).all()


class TestMapViewProperties:
    @given(
        st.lists(
            st.lists(
                st.tuples(
                    st.sampled_from(["name", "amenity", "wifi", "highway", "addr:street", "x"]),
                    st.text(alphabet="abcde ", min_size=0, max_size=6),
                ),
                max_size=5,
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_mapview_matches_python_oracle(self, rows):
        """MapView's Arrow-kernel lookup/has_any/features vs a plain Python
        dict oracle over arbitrary tag maps (duplicate keys allowed —
        first occurrence wins, matching Go map-build order semantics)."""
        import pyarrow as pa

        from osm_search_ray.stages.maps import VALID_SEARCH_TAGS, MapView

        col = pa.array(rows, pa.map_(pa.string(), pa.string()))
        view = MapView(col)
        for key in ("name", "amenity", "zzz"):
            got = view.lookup(key).tolist()
            want = [next((v for k, v in r if k == key), None) for r in rows]
            assert got == want, key
        keyset = frozenset({"name", "wifi"})
        assert view.has_any(keyset).tolist() == [any(k in keyset for k, _ in r) for r in rows]
        feats = view.features(VALID_SEARCH_TAGS).to_pylist()
        want_feats = [[f"{k}={v}" for k, v in r if k in VALID_SEARCH_TAGS] for r in rows]
        assert feats == want_feats

    @given(st.integers(min_value=1, max_value=5000), st.integers(min_value=1, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_term_bucket_partitions_dense_ids(self, n_terms, num_buckets):
        """Every dense term_id maps to exactly one bucket in [0, B); buckets
        are range-contiguous and non-decreasing (K6 sorted-order preserved)."""
        from osm_search_ray.pipelines.text_index import term_bucket

        ids = np.arange(n_terms, dtype=np.int64)
        b = term_bucket(ids, n_terms, num_buckets)
        assert b.min() >= 0 and b.max() < num_buckets
        assert (np.diff(b) >= 0).all()


class TestSpellProperties:
    @given(
        st.sets(st.text(alphabet="abcdef", min_size=1, max_size=7), min_size=1, max_size=40),
        st.text(alphabet="abcdefg", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=2),
    )
    @settings(max_examples=150, deadline=None)
    def test_symspell_equals_banded_dp_scan(self, vocab, word, d):
        """SymSpell deletes-index candidates == the banded-DP full scan for
        ANY vocab/word/distance (same set, same lexicographic order)."""
        from osm_search_ray.state.lm import count_ngrams
        from osm_search_ray.state.spell import SpellCorrector

        lm = count_ngrams([sorted(vocab)])
        fast = SpellCorrector.build(vocab, lm, use_deletes_index=True)
        slow = SpellCorrector.build(vocab, lm, use_deletes_index=False)
        assert fast.word_candidates(word, d) == slow.word_candidates(word, d)

    @given(
        st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    )
    @settings(max_examples=100, deadline=None)
    def test_histogram_median_equals_numpy(self, values):
        """The cumulative-count interpolated median (events_median kernel)
        == numpy's linear-interpolation median on the raw values."""
        import numpy as np

        v = np.asarray(values, dtype=np.int64)
        u, c = np.unique(v, return_counts=True)
        cum = np.cumsum(c)
        n = len(v)
        pos = (n - 1) * 0.5
        lo, frac = int(pos), pos - int(pos)
        vlo = u[np.searchsorted(cum, lo + 1)]
        vhi = u[np.searchsorted(cum, lo + 2)] if frac else vlo
        med = vlo + (vhi - vlo) * frac
        assert med == np.percentile(v, 50)


class TestVecMatrix:
    @given(
        st.integers(min_value=1, max_value=8),  # dim
        st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=1, max_size=64),
        st.integers(min_value=0, max_value=10),  # slice offset
    )
    @settings(max_examples=100, deadline=None)
    def test_matches_pylist_form_including_slices(self, dim, flat, off):
        """vec_matrix == the old np.asarray(to_pylist()) on uniform list
        columns — including SLICED arrays, where flatten() must respect the
        offset, and chunked columns."""
        import pyarrow as pa

        from osm_search_ray.functions.arrowutil import vec_matrix

        n = len(flat)
        vals = np.asarray((flat * dim)[: n * dim], dtype=np.float64)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(vals), dim)
        off = min(off, n - 1)
        for col in [arr, arr.slice(off, n - off), pa.chunked_array([arr.slice(0, max(1, n // 2)), arr.slice(max(1, n // 2))])]:
            want = np.asarray(col.to_pylist(), dtype=np.float64)
            got = vec_matrix(col)
            assert got.shape == want.shape and np.array_equal(got, want)

    def test_variable_list_and_ragged(self):
        import pyarrow as pa
        import pytest as _pytest

        from osm_search_ray.functions.arrowutil import vec_matrix

        uniform = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        assert np.array_equal(vec_matrix(uniform), [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        assert np.array_equal(vec_matrix(uniform.slice(1)), [[3.0, 4.0], [5.0, 6.0]])
        ragged = pa.array([[1.0], [2.0, 3.0], [4.0, 5.0, 6.0]])  # total divides n
        with _pytest.raises(ValueError):
            vec_matrix(ragged)


class TestBpeAndPhraseProperties:
    @given(
        st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), min_size=1, max_size=12),
        st.sampled_from([("a", "a"), ("a", "b"), ("ab", "a"), ("b", "ba")]),
    )
    @settings(max_examples=300, deadline=None)
    def test_merge_syms_equals_greedy_scan(self, syms, pair):
        """The left fold == the textbook greedy left-to-right scan-with-skip
        (the form BPE papers describe), on arbitrary symbol sequences
        including overlap traps."""
        from osm_search_ray.pipelines.bpe import merge_syms

        l, r = pair
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert merge_syms(list(syms), l, r) == out

    @given(
        st.lists(st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8), min_size=1, max_size=6),
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4),
    )
    @settings(max_examples=400, deadline=None)
    def test_phrase_mask_equals_python_window(self, docs, words):
        """The vectorized shift-match kernel == a per-doc Python sliding
        window, including doc-boundary and overlap cases (pure numpy)."""
        import numpy as np

        from osm_search_ray.pipelines.search_docs import phrase_start_mask

        toks = np.array([t for d in docs for t in d], dtype=object)
        counts = np.array([len(d) for d in docs], dtype=np.int64)
        di = np.repeat(np.arange(len(docs)), counts)
        m = phrase_start_mask(toks, di, list(words))
        L = len(words)
        expect = []
        for d in docs:
            expect.extend(d[i : i + L] == list(words) for i in range(len(d) - L + 1))
            expect.extend([False] * min(len(d), L - 1) if len(d) >= 1 else [])
        # expect covers start positions per doc INCLUDING the tail starts
        # that cannot fit the phrase (mask marks those False via the guard)
        expect = np.array(expect[: max(0, len(toks) - L + 1)], dtype=bool)
        if m is None:
            assert len(toks) < L
        else:
            assert np.array_equal(m, expect)


def test_char_entropy_planted_values(tmp_path):
    """Closed-form cases: single-char doc has H=0; uniform two-char doc has
    H=ln 2; empty docs are excluded."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.textops import char_entropy

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aaaa", "abab", "", "aab"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = char_entropy(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 3 not in df.index
    assert df.loc[1, "entropy_micro"] == 0
    assert df.loc[2, "entropy_micro"] == round(math.log(2) * 1e6)
    want3 = math.log(3) - (2 * math.log(2)) / 3
    assert df.loc[4, "entropy_micro"] == round(want3 * 1e6)


def test_containment_direction_quote_in_page(tmp_path):
    """A short passage quoted verbatim inside a long page: containment from
    the quote side is 1.0; the reverse direction is far below threshold and
    absent; Jaccard would miss the pair entirely at 0.5."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.dedup_pipelines import containment_pairs

    quote = " ".join(f"w{i}" for i in range(10))
    page = " ".join(f"p{i}" for i in range(80)) + " " + quote + " " + " ".join(
        f"q{i}" for i in range(80)
    )
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([quote, page], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = containment_pairs(str(tmp_path)).to_pandas()
    pairs = {(r.src, r.dst): r.containment_micro for r in df.itertuples()}
    assert pairs[(1, 2)] == 1_000_000          # quote fully contained
    assert (2, 1) not in pairs                 # reverse below 0.8 threshold
