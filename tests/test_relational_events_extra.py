"""price_trend / bloom_semi_join (relational.py) + assoc_rules /
events_anomaly (events.py) units: single-process pandas replays."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_search_ray.pipelines import events as ev
from osm_search_ray.pipelines import relational as rel

SF = "/root/testdata/sf0.001"


def test_price_trend_matches_pandas_moments():
    got = rel.price_trend(SF).sort_values("p_brand").reset_index(drop=True)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    df["x"] = np.rint(df["l_quantity"].to_numpy()).astype(object)
    df["y"] = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(object)
    rows = []
    for b, g in df.groupby("p_brand", sort=True):
        n = len(g)
        sx, sy = int(g["x"].sum()), int(g["y"].sum())
        sxy = int((g["x"] * g["y"]).sum())
        sxx = int((g["x"] * g["x"]).sum())
        den = float(n * sxx - sx * sx)
        rows.append(
            (
                b,
                n,
                int(np.rint(float(n * sxy - sx * sy) / den * 1e6)),
                int(np.rint(float(sy * sxx - sx * sxy) / den * 1e6)),
            )
        )
    exp = pd.DataFrame(rows, columns=["p_brand", "n_rows", "slope_x1e6", "intercept_x1e6"])
    got = got.astype({"n_rows": np.int64, "slope_x1e6": np.int64, "intercept_x1e6": np.int64})
    exp = exp.astype({"n_rows": np.int64, "slope_x1e6": np.int64, "intercept_x1e6": np.int64})
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_semi_join_is_exact():
    got = (
        rel.bloom_semi_join(SF).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    )
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    keys = set(od.loc[od["o_totalprice"] >= 200000.0, "o_orderkey"])
    s = li[li["l_orderkey"].isin(keys)].copy()
    s["cents"] = np.rint(s["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    exp = (
        s.groupby("l_returnflag", sort=True)["cents"]
        .agg(n_rows="count", revenue_cents="sum")
        .reset_index()
        .astype({"n_rows": np.int64, "revenue_cents": np.int64})
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_filter_no_false_negatives_and_low_fpr():
    from osm_search_ray.functions.hashing import splitmix64
    from osm_search_ray.stages.sketches import bloom_build, bloom_contains

    keys = np.arange(1, 2001, dtype=np.uint64)
    m = int(keys.size) * rel.BLOOM_SEMI_BITS_PER_KEY
    bl = bloom_build(splitmix64(keys), m)
    assert bloom_contains(bl, splitmix64(keys), m).all()
    probe = np.arange(100_000, 140_000, dtype=np.uint64)
    fpr = bloom_contains(bl, splitmix64(probe), m).mean()
    assert fpr < 0.001


def test_events_anomaly_matches_pandas_rolling():
    got = (
        ev.events_anomaly(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    e = pq.read_table(f"{SF}/events.parquet").to_pandas()
    e["v"] = np.rint(e["value"].to_numpy() * 100).astype(np.int64)
    e = e.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    w, z = ev.ANOM_WINDOW, ev.ANOM_Z
    rows = []
    for _, g in e.groupby("user_id", sort=False):
        v = g["v"].to_numpy()
        for i in range(len(v)):
            if i < w:
                continue
            fr = v[i - w : i]
            s, q = int(fr.sum()), int((fr.astype(object) ** 2).sum())
            if (w * int(v[i]) - s) ** 2 > z * z * (w * q - s * s):
                rows.append((g["event_id"].iloc[i], g["user_id"].iloc[i], int(v[i])))
    exp = (
        pd.DataFrame(rows, columns=["event_id", "user_id", "value_cents"])
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": got["event_id"].dtype, "value_cents": np.int64})
    )
    pd.testing.assert_frame_equal(got, exp)


def test_assoc_rules_confidence_consistency():
    df = ev.assoc_rules(SF).to_pandas()
    assert (df["n_both"] >= ev.ASSOC_MIN_SUP).all()
    assert (df["n_both"] <= df["n_ante"]).all()
    assert (df["conf_micro"] == 1_000_000 * df["n_both"] // df["n_ante"]).all()
    # every rule exists in both directions as a pair (support is symmetric)
    fwd = set(zip(df["ante"], df["cons"]))
    assert all((c, a) in fwd for a, c in fwd)


def test_bloom_semi_join_regimes_agree(monkeypatch):
    import osm_search_ray.pipelines.relational as relmod

    small = rel.bloom_semi_join(SF).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    monkeypatch.setattr(relmod, "BLOOM_VERIFY_BROADCAST_LIMIT", 0)
    big = relmod.bloom_semi_join(SF)
    big = big.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(small, big)
