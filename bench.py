"""Benchmark driver — prints ONE JSON line.

  python bench.py             # full suite at $GRAFT_SF_DIR (default sf0.1),
                              # num_cpus = $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling   # headline pipeline at num_cpus=8 vs 32 in fresh
                              # processes → throughputs + scaling efficiency

Headline: the flagship spatial pipeline at web scale — synthetic pages are
GENERATED inside the pipeline (deterministic arithmetic, no external data,
``PAGES_PER_DOC`` × rows(documents) pages), then: text build → regex
coordinate extraction → tile assignment (grid cells) → broadcast PIP join
against 25 admin rects → per-(rect, tile) rollup. Reported as pages/sec and
joined rows/sec.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_DOC = int(os.environ.get("BENCH_PAGES_PER_DOC", "120"))


def headline_spatial(sf_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from osm_search_ray.functions.cells import RES_COARSE, cell_of
    from osm_search_ray.sources.derived import admin_rects
    from osm_search_ray.sources.fixtures import embed_geo_text, extract_coords
    from osm_search_ray.stages.spatial_join import PolygonSet, broadcast_pip_join

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_pages = n_docs * PAGES_PER_DOC

    def synth_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        k1 = ((ids * 7919) % 100000).astype(np.float64)
        k2 = ((ids * 104729) % 100000).astype(np.float64)
        clustered = (ids % 10) < 3
        lat = np.where(clustered, -6.2 + k1 * 4e-7, -6.6 + k1 * 8e-6)
        lon = np.where(clustered, 106.8 + k2 * 4.5e-7, 106.4 + k2 * 9e-6)
        texts = [embed_geo_text(f"synthetic page body {i}", la, lo) for i, la, lo in zip(ids, lat, lon)]
        return pa.table({"page_id": pa.array(ids), "text": pa.array(texts)})

    def extract_and_tile(batch: pa.Table) -> pa.Table:
        lat, lon, ok = extract_coords(batch.column("text").to_pylist())
        t = pa.table({"page_id": batch.column("page_id"), "lat": pa.array(lat), "lon": pa.array(lon)})
        t = t.filter(pa.array(ok))
        cells = cell_of(t.column("lat").to_numpy(), t.column("lon").to_numpy(), RES_COARSE)
        return t.append_column("cell_r12", pa.array(cells))

    polys = PolygonSet.from_rects(admin_rects(sf_dir).select(["rect_id", "lat0", "lon0", "lat1", "lon1"]))

    t0 = time.time()
    ds = ray.data.range(n_pages, override_num_blocks=max(NUM_CPUS * 4, 32))
    ds = ds.map_batches(synth_pages, batch_format="pyarrow", batch_size=16384)
    ds = ds.map_batches(extract_and_tile, batch_format="pyarrow", batch_size=16384)
    joined = broadcast_pip_join(ds, polys, id_out="rect_id", concurrency=(2, NUM_CPUS))

    def partial_counts(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"rect_id": batch.column("rect_id").to_numpy(), "cell_r12": batch.column("cell_r12").to_numpy()})
        g = df.groupby(["rect_id", "cell_r12"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    rollup = joined.map_batches(partial_counts, batch_format="pyarrow").groupby(["rect_id", "cell_r12"]).aggregate(
        Sum("n", alias_name="n")
    )
    res = rollup.to_pandas()
    dt = time.time() - t0
    joined_rows = int(res["n"].sum())
    return {
        "sec": dt,
        "pages": n_pages,
        "joined_rows": joined_rows,
        "pages_per_sec": n_pages / dt,
        "joined_rows_per_sec": joined_rows / dt,
        "tiles": len(res),
    }


def run_suite() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ["documents", "lineitem", "orders", "events", "embeddings", "nation", "customer", "region"]:
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = round(time.time() - t0, 3)

    head = headline_spatial(SF_DIR)
    total = round(sum(timings.values()) + head["sec"], 3)
    out = {
        "metric": "spatial_pipeline_plus_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in head.items()},
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, __file__], env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    t_lo = lo["headline"]["sec"]
    t_hi = hi["headline"]["sec"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": round(t_lo, 3),
        "sec_32": round(t_hi, 3),
        "pages_per_sec_8": round(lo["headline"]["pages_per_sec"], 1),
        "pages_per_sec_32": round(hi["headline"]["pages_per_sec"], 1),
        "sf": SF_DIR,
    }


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    if os.environ.get("BENCH_HEADLINE_ONLY"):
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        head = headline_spatial(SF_DIR)
        print(json.dumps({"metric": "headline_sec", "value": round(head["sec"], 3), "unit": "sec", "num_cpus": NUM_CPUS, "headline": head}))
        ray.shutdown()
        return
    print(json.dumps(run_suite()))


if __name__ == "__main__":
    main()
