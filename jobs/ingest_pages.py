"""Resumable web-pages ingest — the north-star flagship as a
`ray job submit` entry point.

    python jobs/ingest_pages.py --pages /path/pages.parquet \
        --sf-dir /root/testdata/sf0.001 --out /tmp/pages_out [--extract]

Stages:
  1. read pages (input_hint schema; html binary pruned unless --extract,
     and projected away inside the extracting batch)
  2. text → coordinates (Arrow regex kernel) → grid cells
  3. PIP join against the admin rectangles derived from --sf-dir
  4. checkpointed cell-partitioned Parquet write (per-partition lineage +
     row/byte metrics; a killed run re-submitted with the same arguments
     recomputes ONLY unfinished partitions) + whole-stage marker

Owns its Ray session (guarded) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages.parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--sf-dir", required=True, help="sf dir providing the admin-rect polygons")
    ap.add_argument("--out", required=True)
    ap.add_argument("--extract", action="store_true", help="re-extract text from html instead of trusting the text column")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fail-at", type=int, default=None, help="inject failure at cell partition (resume testing)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osm_search_ray.sources import checkpoint as cp
    from osm_search_ray.sources.derived import admin_rects
    from osm_search_ray.sources.pages import pages_to_geo, read_pages
    from osm_search_ray.stages.spatial_join import PolygonSet, broadcast_pip_join

    out_dir = os.path.join(args.out, "geo_pages")
    if cp.stage_complete(out_dir):
        print(f"geo_pages stage: {len(cp.completed_keys(out_dir))} partitions already complete")
    else:
        geo = pages_to_geo(read_pages(args.pages, extract=args.extract))
        polys = PolygonSet.from_rects(
            admin_rects(args.sf_dir).select(["rect_id", "lat0", "lon0", "lat1", "lon1"])
        )
        joined = broadcast_pip_join(geo, polys, id_out="rect_id")
        fail = {args.fail_at} if args.fail_at is not None else None
        rows = cp.checkpointed_write(joined, out_dir, "cell_r12", stage="geo_pages", fail_on_keys=fail)
        cp.mark_stage_complete(out_dir, "geo_pages")
        print(f"geo_pages stage: wrote {len(rows)} partitions")

    total = cp.read_checkpointed(out_dir).count()
    print(f"INGEST COMPLETE rows={total}")
    ray.shutdown()


if __name__ == "__main__":
    main()
