"""Positional-postings store lifecycle as a `ray job submit` entry point
(the phrase-serving counterpart of jobs/build_index.py; the reference has
no positional index at all — pkg/index stores presence-only postings).

    # build (or RESUME a killed build — the checkpointed sink skips
    # finished buckets):
    python jobs/build_pos_index.py --docs docs.parquet --out /tmp/pos build

    # serve a phrase from the store (opens only the phrase terms' buckets):
    python jobs/build_pos_index.py --out /tmp/pos query --phrase "spark group fast"

Owns its Ray session (guarded) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="store directory")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_build = sub.add_parser("build", help="build/resume the positional store")
    p_build.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    p_query = sub.add_parser("query", help="phrase lookup against the store")
    p_query.add_argument("--phrase", required=True)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osm_search_ray.pipelines import search_docs as sd
    from osm_search_ray.sources import checkpoint as cp

    if args.cmd == "build":
        sd.build_positional_store(args.docs, args.out)
        n = len(cp.completed_keys(args.out))
        print(f"POS STORE COMPLETE: {n} buckets at {args.out}")
    else:
        if not cp.stage_complete(args.out):
            print("store incomplete — re-submit the build first", file=sys.stderr)
            raise SystemExit(2)
        out = sd.phrase_store_query(args.out, [(1, args.phrase)]).to_pandas()
        total = int(out["n_hits"].sum()) if len(out) else 0
        print(f"phrase found in {len(out)} docs, {total} occurrences")

    ray.shutdown()


if __name__ == "__main__":
    main()
