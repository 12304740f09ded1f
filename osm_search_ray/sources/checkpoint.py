"""Per-partition checkpointed Parquet sink with lineage manifests
(north rule: a killed run resumes without recomputing finished partitions).

Layout per stage:

    <out_dir>/part=<key>/data.parquet        one atomic file per partition
    <out_dir>/_manifest.jsonl                one row per COMPLETED partition:
        {stage, partition_key, input_lineage_hash, row_count, byte_count,
         wall_ms, status}

Write protocol (idempotent, retry-safe, crash-safe):
  1. partition data is written to ``part=<key>/.tmp-data.parquet``
  2. os.replace → ``data.parquet``  (atomic on POSIX)
  3. the WORKER writes ``part=<key>/manifest.json`` via tmp+rename — the
     per-partition completion record survives a driver crash, so a killed
     run loses at most in-flight partitions, never finished ones
  4. on stage success the driver compacts sidecars into ``_manifest.jsonl``

Resume protocol:
  ``completed_keys()`` reads the compacted manifest AND the sidecars; the
  driver filters finished partition keys out of the input BEFORE launching
  the stage, so completed partitions cost one set-lookup per batch, not a
  recompute.

The reference has no checkpointing at all — any crash restarts indexing
from zero (SURVEY.md §4; /root/reference/cmd/indexing/main.go:47-49).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .readers import read_pq


def _lineage_hash(df: pd.DataFrame) -> str:
    """Deterministic content hash of a partition (row-order independent)."""
    import hashlib

    h = hashlib.sha256()
    for c in sorted(df.columns):
        col = df[c]
        try:
            arr = np.sort(col.to_numpy())
            h.update(np.ascontiguousarray(arr).tobytes())
        except TypeError:
            h.update("\x1f".join(sorted(col.astype(str))).encode())
    return h.hexdigest()[:16]


def assert_shared_visible(out_dir: str) -> None:
    """Refuse multi-node runs whose ``out_dir`` is not a shared mount:
    drops a token on the driver and probes it from every alive node (one
    NodeAffinity zero-cpu task each). Single-node clusters return without
    spawning anything. Partition writes happen INSIDE Ray workers with
    plain filesystem I/O — on a multi-node cluster without a shared
    filesystem (NFS / FUSE object-store mount) they would land on each
    worker's local disk silently (ADVICE r02, generalized from
    refresh_tiles to every checkpointed sink)."""
    import uuid

    import ray

    nodes = [n for n in ray.nodes() if n.get("Alive")]
    if len(nodes) <= 1:
        return
    os.makedirs(out_dir, exist_ok=True)
    token = os.path.join(out_dir, f".shared-probe-{uuid.uuid4().hex}")
    with open(token, "w") as f:
        f.write("probe")
    try:
        from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

        @ray.remote(num_cpus=0)
        def probe(path: str) -> bool:
            return os.path.exists(path)

        results = ray.get(
            [
                probe.options(
                    scheduling_strategy=NodeAffinitySchedulingStrategy(node_id=n["NodeID"], soft=False)
                ).remote(token)
                for n in nodes
            ]
        )
        if not all(results):
            raise RuntimeError(
                f"{out_dir!r} is not visible from every node — the checkpointed sink "
                "needs a shared filesystem (NFS / FUSE object-store mount) on "
                "multi-node clusters"
            )
    finally:
        os.remove(token)


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def stage_complete(out_dir: str) -> bool:
    """True only when a prior run finished the WHOLE stage (marker written
    by ``mark_stage_complete`` after ``checkpointed_write`` returned).

    Partition-level sidecars alone are NOT completion evidence: a crashed
    run leaves finished partitions behind, and a resume that skipped the
    stage because ``completed_keys()`` was non-empty would silently build
    downstream artifacts over an incomplete corpus (ADVICE r01, high)."""
    return os.path.exists(os.path.join(out_dir, "_STAGE_COMPLETE.json"))


def mark_stage_complete(out_dir: str, stage: str) -> None:
    """Write the stage-complete marker atomically (tmp + rename).

    Call only after ``checkpointed_write`` returned without raising; the
    marker records the final partition-key set for auditability."""
    keys = sorted(completed_keys(out_dir), key=str)
    tmp = os.path.join(out_dir, ".tmp-_STAGE_COMPLETE.json")
    with open(tmp, "w") as f:
        json.dump({"stage": stage, "partitions": keys, "completed_at": time.time()}, f)
    os.replace(tmp, os.path.join(out_dir, "_STAGE_COMPLETE.json"))


def completed_keys(out_dir: str) -> set:
    done = set()
    mp = manifest_path(out_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            for line in f:
                row = json.loads(line)
                if row.get("status") == "done":
                    done.add(row["partition_key"])
    # sidecars from a crashed run (not yet compacted into _manifest.jsonl)
    import glob

    for side in glob.glob(os.path.join(out_dir, "part=*", "manifest.json")):
        with open(side) as f:
            row = json.load(f)
        if row.get("status") == "done":
            done.add(row["partition_key"])
    return done


def checkpointed_write(
    ds,
    out_dir: str,
    partition_col: str,
    stage: str = "stage",
    fail_on_keys: set | None = None,
) -> list[dict]:
    """Write ``ds`` partitioned by ``partition_col``, skipping partitions
    already in the manifest. Returns the manifest rows written this run.

    ``fail_on_keys`` injects a crash after specific partitions — used by the
    kill/resume test to simulate a mid-run failure."""
    os.makedirs(out_dir, exist_ok=True)
    assert_shared_visible(out_dir)
    done = completed_keys(out_dir)
    done_list = sorted(done)

    # prune completed partitions BEFORE the shuffle (cheap set lookup)
    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(done_list)

        def prune(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column(partition_col), value_set=done_arr))
            return batch.filter(mask)

        ds = ds.map_batches(prune, batch_format="pyarrow")

    rows: list[dict] = []

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g[partition_col].iloc[0]
        key_out = int(key) if isinstance(key, (int, np.integer)) else str(key)
        t0 = time.time()
        pdir = os.path.join(out_dir, f"part={key_out}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".tmp-data.parquet")
        final = os.path.join(pdir, "data.parquet")
        table = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(table, tmp)
        if fail_on_keys and key_out in fail_on_keys:
            time.sleep(1.0)  # let sibling partitions finish → deterministic test
            raise RuntimeError(f"injected failure at partition {key_out}")
        os.replace(tmp, final)
        row = {
            "stage": stage,
            "partition_key": key_out,
            "input_lineage_hash": _lineage_hash(g),
            "row_count": int(len(g)),
            "byte_count": int(os.path.getsize(final)),
            "wall_ms": int((time.time() - t0) * 1000),
            "status": "done",
        }
        # per-partition sidecar: completion survives a driver crash
        side_tmp = os.path.join(pdir, ".tmp-manifest.json")
        with open(side_tmp, "w") as f:
            json.dump(row, f)
        os.replace(side_tmp, os.path.join(pdir, "manifest.json"))
        return pd.DataFrame([row])

    # The sink's parallelism is its FAILURE-DOMAIN granularity: groupby's
    # reduce-partition count follows the input block count, so a small
    # (few-block) input would funnel every partition through one task and
    # a single write failure would lose all sibling partitions' progress.
    # Re-block to the cluster width so partition writes run (and commit)
    # independently — the resumable-store contract the crash/resume tests
    # pin, independent of upstream read sizing.
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ds = ds.repartition(max(8, min(64, 2 * cpus)))
    manifest_rows = ds.groupby(partition_col).map_groups(write_group, batch_format="pandas").to_pandas()
    mp = manifest_path(out_dir)
    with open(mp, "a") as f:
        for _, r in manifest_rows.iterrows():
            rec = r.to_dict()
            f.write(json.dumps(rec) + "\n")
            rows.append(rec)
    return rows


def read_checkpointed(out_dir: str, columns: list[str] | None = None):
    """Read back only COMPLETED partitions (manifest-driven)."""
    import ray.data

    files = [
        os.path.join(out_dir, f"part={k}", "data.parquet")
        for k in sorted(completed_keys(out_dir), key=str)
    ]
    files = [f for f in files if os.path.exists(f)]
    return read_pq(files, columns=columns)
