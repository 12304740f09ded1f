"""Job-level end-to-end: build_index → re-submit (resume) → run_queries,
in real subprocesses (each owns its Ray session, like `ray job submit`)."""

import glob
import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=dict(os.environ, RAY_GRAFT_CPUS="4"),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def osm_dir(tmp_path_factory):
    from osm_search_ray.sources.fixtures import make_osm_tables

    d = tmp_path_factory.mktemp("osm_job")
    for name, tbl in make_osm_tables().items():
        pq.write_table(tbl, d / f"{name}.parquet")
    return str(d)


def _sidecar_rowcounts(docs_dir):
    """partition_key -> row_count from the per-partition sidecar manifests."""
    out = {}
    for side in glob.glob(os.path.join(docs_dir, "part=*", "manifest.json")):
        with open(side) as f:
            row = json.load(f)
        out[row["partition_key"]] = row["row_count"]
    return out


def test_build_partial_crash_resume(osm_dir, tmp_path):
    """A run killed mid-docs-stage must, on re-submit, recompute the missing
    partitions — NOT skip the stage because some partitions finished
    (ADVICE r01 high: the old guard built the text index over an
    incomplete corpus and printed BUILD COMPLETE)."""
    ref_out = str(tmp_path / "ref")
    r0 = _run(["jobs/build_index.py", "--osm-dir", osm_dir, "--out", ref_out])
    assert r0.returncode == 0, r0.stderr[-2000:]
    ref_counts = _sidecar_rowcounts(os.path.join(ref_out, "docs"))
    assert len(ref_counts) >= 2
    victim = sorted(ref_counts)[-1]

    out = str(tmp_path / "crash")
    r1 = _run(["jobs/build_index.py", "--osm-dir", osm_dir, "--out", out, "--fail-at", str(victim)])
    assert r1.returncode != 0
    assert "BUILD COMPLETE" not in r1.stdout
    docs_dir = os.path.join(out, "docs")
    assert not os.path.exists(os.path.join(docs_dir, "_STAGE_COMPLETE.json"))
    mid = _sidecar_rowcounts(docs_dir)
    assert victim not in mid  # the injected-failure partition never completed

    r2 = _run(["jobs/build_index.py", "--osm-dir", osm_dir, "--out", out])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "BUILD COMPLETE" in r2.stdout
    # resumed build covers the FULL corpus: identical partition/row map
    assert _sidecar_rowcounts(docs_dir) == ref_counts
    assert os.path.exists(os.path.join(docs_dir, "_STAGE_COMPLETE.json"))


def test_ingest_pages_job_crash_resume(tmp_path):
    """The web-pages flagship job (pages → extract → tile → PIP join →
    checkpointed cell-partitioned write): a run killed mid-write must, on
    re-submit, finish ONLY the missing partitions and match a clean build
    partition-for-partition (the north rule's resumable `ray job submit`)."""
    import pyarrow.parquet as pq

    from osm_search_ray.sources.pages import make_pages_table

    pages = str(tmp_path / "pages.parquet")
    pq.write_table(make_pages_table(256, geo_every=1), pages)
    sf = "/root/testdata/sf0.001"

    ref_out = str(tmp_path / "ref")
    r0 = _run(["jobs/ingest_pages.py", "--pages", pages, "--sf-dir", sf, "--out", ref_out, "--extract"])
    assert r0.returncode == 0, r0.stderr[-2000:]
    assert "INGEST COMPLETE" in r0.stdout
    ref_counts = _sidecar_rowcounts(os.path.join(ref_out, "geo_pages"))
    assert len(ref_counts) >= 2
    victim = sorted(ref_counts)[0]

    out = str(tmp_path / "crash")
    r1 = _run(
        ["jobs/ingest_pages.py", "--pages", pages, "--sf-dir", sf, "--out", out, "--extract", "--fail-at", str(victim)]
    )
    assert r1.returncode != 0
    assert "INGEST COMPLETE" not in r1.stdout
    assert not os.path.exists(os.path.join(out, "geo_pages", "_STAGE_COMPLETE.json"))

    r2 = _run(["jobs/ingest_pages.py", "--pages", pages, "--sf-dir", sf, "--out", out, "--extract"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "INGEST COMPLETE" in r2.stdout
    assert _sidecar_rowcounts(os.path.join(out, "geo_pages")) == ref_counts


def test_build_resume_and_serve(osm_dir, tmp_path):
    out = str(tmp_path / "index")
    r1 = _run(["jobs/build_index.py", "--osm-dir", osm_dir, "--out", out])
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "BUILD COMPLETE" in r1.stdout

    # re-submit: every stage must be skipped (resume)
    r2 = _run(["jobs/build_index.py", "--osm-dir", osm_dir, "--out", out])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "already complete" in r2.stdout and "BUILD COMPLETE" in r2.stdout

    # manifests carry lineage + metrics
    with open(os.path.join(out, "docs", "_manifest.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert all(r["status"] == "done" and r["row_count"] > 0 for r in rows)

    # serve: search (exact + misspelled) over the built artifacts
    qpath = str(tmp_path / "q.parquet")
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["Dunia Fantasi", "Duniu Fantaso"]),
                "scoring": pa.array(["BM25_FIELD"] * 2),
                "top_k": pa.array([3, 3], pa.int32()),
                "offset": pa.array([0, 0], pa.int32()),
            }
        ),
        qpath,
    )
    res_dir = str(tmp_path / "res")
    r3 = _run(["jobs/run_queries.py", "--index", out, "--queries", qpath, "--kind", "search", "--out", res_dir])
    assert r3.returncode == 0, r3.stderr[-2000:]
    df = pd.concat([pq.read_table(f).to_pandas() for f in glob.glob(f"{res_dir}/*.parquet")])
    docs = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(os.path.join(out, "docs", "part=*", "data.parquet"))]
    )
    name_of = dict(zip(docs["doc_id"], docs["name"]))
    tops = df[df["rank"] == 1].sort_values("query_id")["doc_id"].tolist()
    assert [name_of[t] for t in tops] == ["Dunia Fantasi", "Dunia Fantasi"]


def test_update_index_job_lifecycle(tmp_path):
    """add -> add -> query -> merge through the CLI, each in its own Ray
    session; the merged store must equal a from-scratch build of the union
    corpus (content check via the segments module's own parity machinery is
    in test_index_segments — here we check the operational surface)."""
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    pq.write_table(docs.slice(0, 250), tmp_path / "a.parquet")
    pq.write_table(docs.slice(250), tmp_path / "b.parquet")
    idx = str(tmp_path / "idx")

    for part in ("a", "b"):
        r = _run(["jobs/update_index.py", "--index", idx, "add",
                  "--docs", str(tmp_path / f"{part}.parquet")])
        assert r.returncode == 0, r.stderr[-2000:]
    assert "2 segments, 500 docs total" in r.stdout

    r = _run(["jobs/update_index.py", "--index", idx, "query", "--tokens", "batch,zzznope"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1/2 tokens found over 500 docs" in r.stdout

    r = _run(["jobs/update_index.py", "--index", idx, "merge",
              "--out", str(tmp_path / "merged")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "merged 2 segments" in r.stdout
    assert os.path.exists(tmp_path / "merged" / "globals.json")

    # in-place compaction through the CLI: two segments retire into one
    # (seg-002), cross-segment queries keep answering identically
    r = _run(["jobs/update_index.py", "--index", idx, "compact"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1 segment(s), 500 docs" in r.stdout
    assert os.path.isdir(os.path.join(idx, "seg-002"))
    assert not os.path.isdir(os.path.join(idx, "seg-000"))
    r = _run(["jobs/update_index.py", "--index", idx, "query", "--tokens", "batch,zzznope"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1/2 tokens found over 500 docs" in r.stdout


def test_pos_index_job_build_resume_query(tmp_path):
    """build -> re-submit (no recompute) -> query through the CLI, each in
    its own Ray session; query on an incomplete store must refuse."""
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    pq.write_table(docs, tmp_path / "docs.parquet")
    out = str(tmp_path / "pos")

    r = _run(["jobs/build_pos_index.py", "--out", out, "query", "--phrase", "spark group"])
    assert r.returncode == 2  # refuses before any build

    r = _run(["jobs/build_pos_index.py", "--out", out, "build", "--docs", str(tmp_path / "docs.parquet")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "POS STORE COMPLETE" in r.stdout
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "part=*", "data.parquet"))
    }
    assert mtimes

    r = _run(["jobs/build_pos_index.py", "--out", out, "build", "--docs", str(tmp_path / "docs.parquet")])
    assert r.returncode == 0, r.stderr[-2000:]
    for p, m in mtimes.items():  # resume recomputed nothing
        assert os.path.getmtime(p) == m

    r = _run(["jobs/build_pos_index.py", "--out", out, "query", "--phrase", "spark group fast"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "phrase found in" in r.stdout and "0 occurrences" not in r.stdout


def test_make_training_data_job_crash_resume(tmp_path):
    """Composed curate→mix→pack→write job: crash injected at the write
    stage, resume completes, and the final dataset equals a clean run's
    (per-partition sidecars prove the crashed partitions were NOT
    rewritten)."""
    sf = "/root/testdata/sf0.001"
    clean, crash = str(tmp_path / "clean"), str(tmp_path / "crash")

    r = _run(["jobs/make_training_data.py", "--sf-dir", sf, "--out", clean, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RESULT buckets=" in r.stdout

    r1 = _run(["jobs/make_training_data.py", "--sf-dir", sf, "--out", crash,
               "--num-cpus", "4", "--fail-at", "0"])
    assert r1.returncode != 0  # injected crash
    # stage markers for the upstream stages survive the crash
    assert os.path.exists(os.path.join(crash, "pack", "_STAGE_COMPLETE.json"))
    assert not os.path.exists(os.path.join(crash, "data", "_STAGE_COMPLETE.json"))

    r2 = _run(["jobs/make_training_data.py", "--sf-dir", sf, "--out", crash, "--num-cpus", "4"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "curate: SKIP" in r2.stdout and "pack: SKIP" in r2.stdout

    def read_all(d):
        files = sorted(glob.glob(os.path.join(d, "data", "part=*", "data.parquet")))
        return (
            pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
            .sort_values(["doc_id"])
            .reset_index(drop=True)
        )

    a, b = read_all(clean), read_all(crash)
    pd.testing.assert_frame_equal(a, b)
    # every written doc was curate-kept AND mix-selected
    sel = pq.read_table(os.path.join(clean, "mix", "selected.parquet")).to_pandas()
    assert set(a["doc_id"]) == set(sel["doc_id"])
