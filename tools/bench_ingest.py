"""Measure full-ingest throughput (VERDICT r02 item 5): the complete
way-join → dedup → doc-id → enrich → text-index → LM build
(jobs/build_index.py) over a scaled synthetic OSM corpus, at two CPU
levels in FRESH processes — the same two-parallelism-level methodology as
``bench.py --scaling``.

    python tools/bench_ingest.py [--records 50000] [--cpus 8,32]

Prints one JSON line: {"records": N, "runs": {"8": sec, "32": sec},
"records_per_sec": {...}}. Input generation is excluded from timing.

The corpus embeds the reference-parity fixture tables (relations /
admin rings / golden places) and appends scaled named nodes and ways with
ids disjoint from the fixture range, so every ingest stage — J1 way-node
explode-join-regroup, M1/M2 tag predicates, D1 dedup, J3 enrichment,
text/LM builds — runs at the requested scale.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORDS = (
    "museum park tower plaza market bridge garden station harbor gallery "
    "temple square fountain palace library stadium arcade terrace pavilion wharf"
).split()


def make_scaled_osm(out_dir: str, n_point_docs: int, n_way_docs: int, seed: int = 7) -> int:
    """Fixture tables + ``n_point_docs`` named nodes + ``n_way_docs`` named
    5-node ways (coordinates only in ``nodes`` — the J1 join is real work).
    Returns the expected doc count (named nodes + named ways)."""
    from osm_search_ray.sources.fixtures import make_osm_tables

    base = make_osm_tables()
    rng = np.random.default_rng(seed)
    base_id = 10_000_000  # disjoint from the fixture's id range

    # named point docs (tourism key is in the 35-key whitelist)
    pid = np.arange(base_id, base_id + n_point_docs, dtype=np.int64)
    plat = -6.25 + rng.uniform(-0.35, 0.35, n_point_docs)
    plon = 106.80 + rng.uniform(-0.35, 0.35, n_point_docs)
    ptags = [
        {"name": f"{_WORDS[i % len(_WORDS)]} {_WORDS[(i // 7) % len(_WORDS)]} {i}", "tourism": "attraction"}
        for i in range(n_point_docs)
    ]

    # named ways: 5 anonymous nodes each, referenced by id only
    wn = 5
    wid = np.arange(base_id, base_id + n_way_docs, dtype=np.int64)
    wnode_ids = np.arange(base_id + n_point_docs, base_id + n_point_docs + n_way_docs * wn, dtype=np.int64)
    wlat0 = -6.25 + rng.uniform(-0.35, 0.35, n_way_docs)
    wlon0 = 106.80 + rng.uniform(-0.35, 0.35, n_way_docs)
    wnlat = np.repeat(wlat0, wn) + np.tile(np.arange(wn) * 1e-3, n_way_docs)
    wnlon = np.repeat(wlon0, wn) + np.tile(np.arange(wn) * 1.2e-3, n_way_docs)
    wtags = [
        {"name": f"Jalan {_WORDS[i % len(_WORDS)]} {i}", "highway": "residential",
         "addr:street": f"Jalan {_WORDS[i % len(_WORDS)]} {i}"}
        for i in range(n_way_docs)
    ]

    nodes = pa.concat_tables(
        [
            base["nodes"],
            pa.table(
                {
                    "id": pa.array(np.concatenate([pid, wnode_ids])),
                    "lat": pa.array(np.concatenate([plat, wnlat])),
                    "lon": pa.array(np.concatenate([plon, wnlon])),
                    "tags": pa.array(
                        ptags + [{}] * (n_way_docs * wn), pa.map_(pa.string(), pa.string())
                    ),
                }
            ),
        ]
    )
    ways = pa.concat_tables(
        [
            base["ways"],
            pa.table(
                {
                    "id": pa.array(wid),
                    "node_ids": pa.array(wnode_ids.reshape(n_way_docs, wn).tolist(), pa.list_(pa.int64())),
                    "tags": pa.array(wtags, pa.map_(pa.string(), pa.string())),
                }
            ),
        ]
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(nodes, f"{out_dir}/nodes.parquet")
    pq.write_table(ways, f"{out_dir}/ways.parquet")
    pq.write_table(base["relations"], f"{out_dir}/relations.parquet")
    return n_point_docs + n_way_docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=50_000, help="approx doc count to ingest")
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--workdir", default="/tmp/bench_ingest")
    args = ap.parse_args()

    shutil.rmtree(args.workdir, ignore_errors=True)
    osm_dir = os.path.join(args.workdir, "osm")
    n_docs = make_scaled_osm(osm_dir, args.records * 3 // 5, args.records * 2 // 5)

    runs: dict[str, float] = {}
    rate: dict[str, float] = {}
    for cpus in [int(c) for c in args.cpus.split(",")]:
        out = os.path.join(args.workdir, f"out_{cpus}")
        t0 = time.monotonic()
        subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
             "--osm-dir", osm_dir, "--out", out, "--num-cpus", str(cpus)],
            check=True, cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        dt = time.monotonic() - t0
        runs[str(cpus)] = round(dt, 2)
        rate[str(cpus)] = round(n_docs / dt, 1)
    print(json.dumps({"records": n_docs, "runs": runs, "records_per_sec": rate}))


if __name__ == "__main__":
    main()
