"""Skyline kernel fuzz vs O(n²) brute force + pipeline equivalence, including
the skyline-of-skylines split invariance the distributed form relies on."""

import numpy as np
import pandas as pd

from osm_search_ray.pipelines.relational import _skyline_2d, part_skyline

SF = "/root/testdata/sf0.001"


def _brute(key, pc, sz):
    n = len(key)
    dom = np.zeros(n, bool)
    for i in range(n):
        m = (pc <= pc[i]) & (sz <= sz[i]) & ((pc < pc[i]) | (sz < sz[i]))
        dom[i] = m.any()
    return sorted(zip(key[~dom], pc[~dom], sz[~dom]))


def test_skyline_kernel_fuzz_and_split_invariance():
    rng = np.random.default_rng(42)
    for _ in range(200):
        n = int(rng.integers(1, 60))
        key = np.arange(n, dtype=np.int64)
        pc = rng.integers(0, 10, n).astype(np.int64)
        sz = rng.integers(0, 10, n).astype(np.int64)
        exp = _brute(key, pc, sz)
        got = sorted(zip(*_skyline_2d(key, pc, sz)))
        assert got == exp
        # skyline of local skylines == global skyline (the distributed plan)
        cut = n // 2
        k1, p1, s1 = _skyline_2d(key[:cut], pc[:cut], sz[:cut]) if cut else (key[:0], pc[:0], sz[:0])
        k2, p2, s2 = _skyline_2d(key[cut:], pc[cut:], sz[cut:])
        merged = sorted(
            zip(
                *_skyline_2d(
                    np.concatenate([k1, k2]),
                    np.concatenate([p1, p2]),
                    np.concatenate([s1, s2]),
                )
            )
        )
        assert merged == exp


def test_part_skyline_matches_bruteforce():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice", "p_size"]).to_pandas()
    key = t["p_partkey"].to_numpy(np.int64)
    pc = np.rint(t["p_retailprice"].to_numpy() * 100).astype(np.int64)
    sz = t["p_size"].to_numpy(np.int64)
    exp = _brute(key, pc, sz)
    got = sorted(map(tuple, part_skyline(SF).to_pandas().to_numpy()))
    assert got == exp and len(got) > 0


def test_benford_digits_match_string_replay():
    import pyarrow.parquet as pq

    from osm_search_ray.pipelines.relational import benford_digits

    p = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"]).to_pandas()
    cents = np.rint(p["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    cents = cents[cents > 0]
    exp = pd.Series([int(str(v)[0]) for v in cents]).value_counts().sort_index()
    got = benford_digits(SF).to_pandas().sort_values("digit")
    assert got["n"].sum() == len(cents)
    for d, n in zip(got["digit"], got["n"]):
        assert exp[int(d)] == int(n)
