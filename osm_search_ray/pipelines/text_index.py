"""Two-field inverted text index built as Ray-Data streams (SURVEY.md A1-A8,
T3, M8/M9 — the reference's SPIMI indexer, pkg/index/indexer.go:689-785, IS a
hand-rolled external groupby; here even that shuffle disappears: a document's
full text lives in one row, so per-(field, term, doc) tf and per-doc field
lengths are FINAL within the batch that holds the doc — the build is a single
map_batches pass with NO all-to-all exchange (VERDICT r01 item 1).

Artifacts:
  terms      (term, term_id)              — deterministic ids by sorted order
                                            (replaces the mutex'd arrival-order
                                            IDMap, pkg/util.go:30-43). Built as
                                            a DATASET (build_term_dictionary:
                                            distinct → sort → row-index zip) —
                                            never driver-resident; written
                                            term_id-range-bucketed so lookups
                                            prune buckets via footer stats
                                            (read_term_ids).
  postings   (field, term_id, doc_id, tf, name_len, address_len, total_len)
             — one row per (field, term, doc); tf = occurrence count (the
             reference encodes tf by repetition, pkg/index/indexer.go:811-817);
             doc field lengths DENORMALIZED in at index time so scoring needs
             no doc-side join
  term_stats (term_id, df)                — distinct docs containing the term
                                            across BOTH fields (A8)
  globals    dict: docs_count, avg_name_len, avg_address_len, avg_total_len

Two build entry points:
  build_text_index_ds  → Dataset-backed artifacts (the 100 TB path); pair
                         with save_text_index_ds, which writes postings as
                         term_id-RANGE-bucketed Parquet (part=K dirs via the
                         checkpointed sink — resumable, lineage-carrying) so
                         query-time reads prune whole buckets + row groups.
  build_text_index     → small in-RAM TextIndex (pandas) for the serving
                         actors and tests — the reference also serves from
                         fully in-RAM indexes (pkg/searcher/searcher.go).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import tokenize_array

FIELD_NAME = 0
FIELD_ADDRESS = 1
_DOCLEN_FIELD = -1  # sentinel rows carrying per-doc lengths through the scan
DEFAULT_POSTINGS_BUCKETS = 16


@dataclass
class TextIndex:
    terms: pd.DataFrame  # term -> term_id
    postings: pd.DataFrame
    term_stats: pd.DataFrame  # term_id -> df
    globals: dict
    doc_lens: pd.DataFrame | None = None  # (doc_id, *_len) — segment merges need it

    def vocab(self) -> dict[str, int]:
        return dict(zip(self.terms["term"], self.terms["term_id"]))


@dataclass
class TextIndexDS:
    """Dataset-backed index artifacts (build-at-scale form). ``terms`` is a
    DATASET (term, term_id) — the dictionary never has to fit on the driver
    (VERDICT r02 missing item 2); ``n_terms`` is its (cheap, metadata)
    count, needed for term_id-range bucketing at write time."""

    postings: "ray.data.Dataset"  # (field, term, term_id, doc_id, tf, *_len)
    doc_lens: "ray.data.Dataset"  # (doc_id, name_len, address_len, total_len)
    terms: "ray.data.Dataset"  # (term, term_id), sorted by term
    n_terms: int
    term_stats: "ray.data.Dataset"  # (term_id, df)
    globals: dict


_EMPTY_GLOBALS = {
    "docs_count": 0,
    "avg_name_len": 0.0,
    "avg_address_len": 0.0,
    "avg_total_len": 0.0,
    "sum_name_len": 0,
    "sum_address_len": 0,
    "sum_total_len": 0,
}

_SCAN_SCHEMA = pa.schema(
    [
        ("field", pa.int8()),
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("name_len", pa.int64()),
        ("address_len", pa.int64()),
        ("total_len", pa.int64()),
    ]
)


def scan_postings(batch: pa.Table, text_cols: dict[str, int]) -> pa.Table:
    """One docs batch → FINAL postings rows (field, term, doc_id, tf, lens)
    plus one doc-length sentinel row per doc (field = -1, term = '')."""
    doc_ids = batch.column("doc_id").to_numpy()
    nd = len(doc_ids)
    lens: dict[int, np.ndarray] = {}
    parts = []
    for col, field in text_cols.items():
        toks, counts = tokenize_array(batch.column(col).to_pylist())
        lens[field] = counts
        if len(toks):
            pos = np.repeat(np.arange(nd), counts)
            g = (
                pd.DataFrame({"pos": pos, "term": toks})
                .groupby(["pos", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            g["field"] = field
            parts.append(g)
    name_len = lens.get(FIELD_NAME, np.zeros(nd, np.int64)).astype(np.int64)
    addr_len = lens.get(FIELD_ADDRESS, np.zeros(nd, np.int64)).astype(np.int64)
    total_len = np.zeros(nd, np.int64)
    for c in lens.values():
        total_len += c
    if parts:
        m = pd.concat(parts, ignore_index=True)
        posv = m["pos"].to_numpy(dtype=np.int64)
        terms = m["term"].to_numpy(dtype=object)
        fieldv = m["field"].to_numpy(dtype=np.int8)
        tfv = m["tf"].to_numpy(dtype=np.int64)
    else:
        posv = np.empty(0, np.int64)
        terms = np.empty(0, object)
        fieldv = np.empty(0, np.int8)
        tfv = np.empty(0, np.int64)
    return pa.table(
        {
            "field": pa.array(np.concatenate([fieldv, np.full(nd, _DOCLEN_FIELD, np.int8)])),
            "term": pa.array(terms.tolist() + [""] * nd, pa.string()),
            "doc_id": pa.array(np.concatenate([doc_ids[posv], doc_ids])),
            "tf": pa.array(np.concatenate([tfv, np.zeros(nd, np.int64)])),
            "name_len": pa.array(np.concatenate([name_len[posv], name_len])),
            "address_len": pa.array(np.concatenate([addr_len[posv], addr_len])),
            "total_len": pa.array(np.concatenate([total_len[posv], total_len])),
        },
        schema=_SCAN_SCHEMA,
    )


class _TermIdMapper:
    """Actor-pool stage: holds the sorted term array once per actor and maps
    term → dense id with one searchsorted per batch (the big-vocab-safe form
    of a broadcast dict lookup)."""

    def __init__(self, terms_ref):
        self.terms_sorted = ray.get(terms_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        terms = t.column("term").to_numpy(zero_copy_only=False)
        ids = np.searchsorted(self.terms_sorted, terms)
        return t.append_column("term_id", pa.array(ids.astype(np.int64)))


BROADCAST_TERMS_LIMIT = 2_000_000  # sorted term array ≤ ~100 MB per actor


def build_term_dictionary(raw: "ray.data.Dataset") -> tuple["ray.data.Dataset", int]:
    """The DISTRIBUTED term dictionary (VERDICT r02 missing item 2 — the
    r02 build collected per-block uniques into a driver Python set, fine
    for OSM vocab but multi-GB at web-corpus 10⁸⁺ terms):

      per-block unique (combiner: corpus → ≤ blocks×block_vocab rows)
      → hash-partitioned global distinct (bounded 64-way shuffle of
        vocab-sized rows only, never corpus-sized)
      → sort("term")  (range shuffle over the distinct terms)
      → zip_with_index (dense ids from per-block counts; O(blocks) driver
        work, no data movement — SURVEY §1.2's sorted-unique → row-index
        zip plan, replacing the reference's mutex'd arrival-order IDMap,
        pkg/util.go:30-43, deterministically)

    The dictionary never materializes on the driver. Returns (terms_ds
    sorted by term with dense term_id, n_terms)."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_partitioned_apply, zip_with_index

    def block_unique(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("term"))
        u = u.filter(pc.not_equal(u, ""))  # doc-length sentinel rows
        return pa.table({"term": u})

    uniq = hash_partitioned_apply(
        raw.map_batches(block_unique, batch_format="pyarrow"),
        "term",
        lambda df: df.drop_duplicates("term"),
        num_parts=64,
    )
    terms_ds = zip_with_index(uniq.sort("term"), id_col="term_id").materialize()
    return terms_ds, terms_ds.count()


def build_text_index_ds(
    docs: "ray.data.Dataset | None" = None,
    text_cols: dict[str, int] | None = None,
    mapper_concurrency=2,
    term_id_strategy: str = "auto",
    raw: "ray.data.Dataset | None" = None,
) -> TextIndexDS:
    """Distributed build: one scan pass (no shuffle), a Dataset-side term
    dictionary (build_term_dictionary — never driver-resident), a
    vocab-sized df groupby, and streaming aggregates for the globals.

    ``term_id_strategy`` picks how postings get their term_id:
      'broadcast' — collect the sorted term array ONCE, ray.put it, map
                    term → id by searchsorted in an actor pool (zero
                    shuffle; right whenever the vocab fits a worker heap);
      'join'      — hash-partitioned string-key join postings × dictionary
                    (the 10⁸⁺-term regime: nothing vocab-sized ever sits in
                    one process);
      'auto'      — broadcast iff n_terms <= BROADCAST_TERMS_LIMIT.
    Both paths produce identical postings (tested).

    ``raw`` bypasses the scan with an already scan-shaped (_SCAN_SCHEMA)
    stream — the segment-merge path (pipelines/index_segments.py)
    reconstructs it from stored segments instead of re-tokenizing docs."""
    from ray.data.aggregate import Sum

    raw_input = raw
    if raw is None:
        text_cols = text_cols or {"name": FIELD_NAME, "address": FIELD_ADDRESS}
        raw = docs.map_batches(lambda t: scan_postings(t, text_cols), batch_format="pyarrow")
    raw = raw.materialize()

    import pyarrow.compute as pc

    terms_ds, n_terms = build_term_dictionary(raw)

    doc_lens = raw.map_batches(
        lambda t: t.filter(pc.equal(t.column("field"), _DOCLEN_FIELD)).select(
            ["doc_id", "name_len", "address_len", "total_len"]
        ),
        batch_format="pyarrow",
    )
    postings_raw = raw.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("field"), 0)), batch_format="pyarrow"
    )

    from ray.data.aggregate import Count

    sums = doc_lens.aggregate(
        Sum("name_len", alias_name="nl"),
        Sum("address_len", alias_name="al"),
        Sum("total_len", alias_name="tl"),
        Count(alias_name="n"),
    )
    n_docs = int(sums["n"]) if sums and sums.get("n") else 0
    if n_docs:
        # integer length sums ride along so multi-segment readers can merge
        # averages EXACTLY (float(Σ ints) / Σ counts — the same single
        # division this build performs; see index_segments.merged_globals)
        globals_ = {
            "docs_count": n_docs,
            "avg_name_len": float(sums["nl"]) / n_docs,
            "avg_address_len": float(sums["al"]) / n_docs,
            "avg_total_len": float(sums["tl"]) / n_docs,
            "sum_name_len": int(sums["nl"]),
            "sum_address_len": int(sums["al"]),
            "sum_total_len": int(sums["tl"]),
        }
    else:
        globals_ = _EMPTY_GLOBALS.copy()

    use_broadcast = term_id_strategy == "broadcast" or (
        term_id_strategy == "auto" and n_terms <= BROADCAST_TERMS_LIMIT
    )
    if use_broadcast:
        # broadcast-small-side: ONE O(vocab) pull of the term column,
        # ray.put once, searchsorted per batch inside the actor pool
        terms_sorted = np.asarray(
            terms_ds.to_pandas()["term"].to_numpy(dtype=object) if n_terms else [], dtype=object
        )
        terms_ref = ray.put(terms_sorted)
        postings = postings_raw.map_batches(
            _TermIdMapper,
            fn_constructor_kwargs=dict(terms_ref=terms_ref),
            batch_format="pyarrow",
            concurrency=mapper_concurrency,
        )
    else:
        # dictionary too large for any single heap → hash-partitioned
        # string-key join; the only exchange is |postings| + |vocab| rows
        # bucketed by term hash
        from ..stages.joins import hash_bucket_join

        postings = hash_bucket_join(postings_raw, terms_ds, on="term", num_buckets=64)

    # df partials are exact per batch ONLY when a doc's rows are wholly
    # inside one batch — true for the scan path (scan_postings emits a doc's
    # rows together), NOT guaranteed for a reconstructed ``raw`` (a
    # two-field doc's rows can split across parquet read batches and be
    # double-counted). The scan path keeps the cheap batch-final combiner;
    # the raw path deduplicates exact (term, doc_id) pairs through one
    # term-keyed bounded exchange instead.
    df_batch_final = raw_input is None

    def df_partial(t: pa.Table) -> pa.Table:
        m = t.filter(pc.greater_equal(t.column("field"), 0))
        if m.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        d = m.select(["term", "doc_id"]).to_pandas().drop_duplicates()
        g = d.groupby("term", sort=False).size().reset_index(name="df")
        return pa.table({"term": pa.array(g["term"], pa.string()), "df": pa.array(g["df"], pa.int64())})

    def df_pairs(t: pa.Table) -> pa.Table:
        m = t.filter(pc.greater_equal(t.column("field"), 0))
        d = m.select(["term", "doc_id"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False)

    if df_batch_final:
        df_by_term = (
            raw.map_batches(df_partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
        )
    else:
        from ..stages.joins import hash_partitioned_apply

        df_by_term = hash_partitioned_apply(
            raw.map_batches(df_pairs, batch_format="pyarrow"),
            "term",
            lambda df: df.drop_duplicates()
            .groupby("term", sort=False)
            .size()
            .reset_index(name="df"),
            num_parts=64,
        )
    if use_broadcast:
        term_stats = df_by_term.map_batches(
            _TermIdMapper, fn_constructor_kwargs=dict(terms_ref=terms_ref), batch_format="pyarrow", concurrency=1
        ).map_batches(lambda t: t.select(["term_id", "df"]), batch_format="pyarrow")
    else:
        from ..stages.joins import hash_bucket_join as _hbj

        term_stats = _hbj(df_by_term, terms_ds, on="term", num_buckets=64).map_batches(
            lambda t: t.select(["term_id", "df"]), batch_format="pyarrow"
        )
    return TextIndexDS(
        postings=postings,
        doc_lens=doc_lens,
        terms=terms_ds,
        n_terms=n_terms,
        term_stats=term_stats,
        globals=globals_,
    )


_POSTING_COLS = ["field", "term_id", "doc_id", "tf", "name_len", "address_len", "total_len"]


def build_text_index(docs: "ray.data.Dataset", text_cols: dict[str, int] | None = None) -> TextIndex:
    """Serving-size in-RAM index: ONE distributed scan pass (tokenize + tf,
    the expensive part) and ONE collect; vocab/ids/stats finish in pandas on
    the O(index)-sized frame. The at-scale build is build_text_index_ds
    (everything Dataset-side, bucketed Parquet out)."""
    text_cols = text_cols or {"name": FIELD_NAME, "address": FIELD_ADDRESS}
    raw = docs.map_batches(lambda t: scan_postings(t, text_cols), batch_format="pyarrow").to_pandas()
    if len(raw) == 0 or "field" not in raw.columns:  # empty corpus → no blocks at all
        return TextIndex(
            terms=pd.DataFrame({"term": pd.Series(dtype=str), "term_id": pd.Series(dtype=np.int64)}),
            postings=pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS}),
            term_stats=pd.DataFrame({"term_id": pd.Series(dtype=np.int64), "df": pd.Series(dtype=np.int64)}),
            globals=_EMPTY_GLOBALS.copy(),
        )
    doclens = raw[raw["field"] == _DOCLEN_FIELD]
    p = raw[raw["field"] >= 0]
    n_docs = len(doclens)
    globals_ = {
        "docs_count": int(n_docs),
        "avg_name_len": float(doclens["name_len"].sum()) / n_docs if n_docs else 0.0,
        "avg_address_len": float(doclens["address_len"].sum()) / n_docs if n_docs else 0.0,
        "avg_total_len": float(doclens["total_len"].sum()) / n_docs if n_docs else 0.0,
        "sum_name_len": int(doclens["name_len"].sum()),
        "sum_address_len": int(doclens["address_len"].sum()),
        "sum_total_len": int(doclens["total_len"].sum()),
    }
    if len(p) == 0:
        empty_postings = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
        return TextIndex(
            terms=pd.DataFrame({"term": pd.Series(dtype=str), "term_id": pd.Series(dtype=np.int64)}),
            postings=empty_postings,
            term_stats=pd.DataFrame({"term_id": pd.Series(dtype=np.int64), "df": pd.Series(dtype=np.int64)}),
            globals=globals_ if n_docs else _EMPTY_GLOBALS.copy(),
            # token-less docs still have lengths — a segment merge must not
            # lose them (doc_lens=None here broke merge_segments)
            doc_lens=doclens[["doc_id", "name_len", "address_len", "total_len"]].reset_index(drop=True),
        )
    terms_sorted = np.sort(p["term"].unique())
    terms = pd.DataFrame({"term": terms_sorted, "term_id": np.arange(len(terms_sorted), dtype=np.int64)})
    p = p.assign(term_id=p["term"].map(dict(zip(terms["term"], terms["term_id"]))))
    postings = (
        p[_POSTING_COLS]
        .astype({"field": np.int64, "term_id": np.int64})
        .sort_values(["field", "term_id", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    term_stats = (
        postings[["term_id", "doc_id"]]
        .drop_duplicates()
        .groupby("term_id")
        .size()
        .reset_index(name="df")
        .sort_values("term_id")
        .reset_index(drop=True)
    )
    return TextIndex(
        terms=terms,
        postings=postings,
        term_stats=term_stats,
        globals=globals_,
        doc_lens=doclens[["doc_id", "name_len", "address_len", "total_len"]].reset_index(drop=True),
    )


def term_bucket(term_id, n_terms: int, num_buckets: int):
    """Range-contiguous bucket of a dense sorted term_id — keeps K6's sorted
    term order within and across bucket files."""
    tid = np.asarray(term_id, dtype=np.int64)
    if n_terms <= 0:
        return np.zeros_like(tid)
    return np.minimum(tid * num_buckets // n_terms, num_buckets - 1)


def save_text_index_ds(
    idx: TextIndexDS, out_dir: str, num_buckets: int = DEFAULT_POSTINGS_BUCKETS
) -> None:
    """Write artifacts WITHOUT collecting postings to the driver: postings
    stream through the CHECKPOINTED sink to ``postings/part=K/data.parquet``
    (term_id-range partitioned with per-partition lineage + row/byte
    metrics, resumable like every other artifact — the engine-native form
    of the reference's per-term offset sidecars,
    pkg/index/inverted_index.go:301-414)."""
    import json
    import os

    import pyarrow.parquet as pq

    from ..sources import checkpoint as cp

    os.makedirs(out_dir, exist_ok=True)
    n_terms = idx.n_terms

    # the dictionary streams out term_id-range-bucketed exactly like the
    # postings (same bucket fn → a bucket's terms and its postings share a
    # range): no driver collect, resumable, lineage-carrying; buckets are
    # lexicographic term ranges (ids are dense in sorted-term order), so
    # term lookups prune on Parquet footer min/max (read_term_ids)
    def add_tbucket(t: pa.Table) -> pa.Table:
        b = term_bucket(t.column("term_id").to_numpy(), n_terms, num_buckets)
        return t.select(["term", "term_id"]).append_column("bucket", pa.array(b.astype(np.int64)))

    tdir = f"{out_dir}/terms"
    if n_terms:
        cp.checkpointed_write(
            idx.terms.map_batches(add_tbucket, batch_format="pyarrow"), tdir, "bucket", stage="terms"
        )
    cp.mark_stage_complete(tdir, "terms")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = term_bucket(t.column("term_id").to_numpy(), n_terms, num_buckets)
        return t.select(_POSTING_COLS).append_column("bucket", pa.array(b.astype(np.int64)))

    pdir = f"{out_dir}/postings"
    if n_terms:
        cp.checkpointed_write(
            idx.postings.map_batches(add_bucket, batch_format="pyarrow"), pdir, "bucket", stage="postings"
        )
    cp.mark_stage_complete(pdir, "postings")
    # per-doc field lengths (incl. token-less docs) — what a segment merge
    # needs to reconstruct the scan stream without re-tokenizing
    # (pipelines/index_segments._segment_raw); _SUCCESS-guarded so a resumed
    # save never double-appends files
    ldir = f"{out_dir}/doclens"
    os.makedirs(ldir, exist_ok=True)
    ok = os.path.join(ldir, "_SUCCESS")
    if not os.path.exists(ok):
        for stale in os.listdir(ldir):
            os.remove(os.path.join(ldir, stale))
        idx.doc_lens.write_parquet(ldir)
        with open(ok, "w") as f:
            f.write("")
    ts = idx.term_stats.to_pandas()  # O(vocab) — same budget as the term dict
    pq.write_table(pa.Table.from_pandas(ts, preserve_index=False), f"{out_dir}/term_stats.parquet")
    with open(f"{out_dir}/globals.json", "w") as f:
        json.dump({**idx.globals, "postings_buckets": num_buckets, "n_terms": n_terms}, f)


def save_text_index(index: TextIndex, out_dir: str, num_buckets: int = DEFAULT_POSTINGS_BUCKETS) -> None:
    """Driver-side writer for the in-RAM TextIndex — emits the SAME bucketed
    layout as save_text_index_ds (one reader serves both)."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_terms = len(index.terms)
    t = index.terms.copy()
    t["bucket"] = term_bucket(t["term_id"].to_numpy(), n_terms, num_buckets) if len(t) else np.empty(0, np.int64)
    for k, g in t.groupby("bucket") if len(t) else []:
        tdir = f"{out_dir}/terms/part={int(k)}"
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g[["term", "term_id"]], preserve_index=False), f"{tdir}/data.parquet"
        )
    os.makedirs(f"{out_dir}/terms", exist_ok=True)
    p = index.postings.copy()
    p["bucket"] = term_bucket(p["term_id"].to_numpy(), n_terms, num_buckets) if len(p) else np.empty(0, np.int64)
    for k, g in p.groupby("bucket") if len(p) else []:
        pdir = f"{out_dir}/postings/part={int(k)}"
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g[_POSTING_COLS], preserve_index=False),
            f"{pdir}/data.parquet",
            row_group_size=64 * 1024,
        )
    os.makedirs(f"{out_dir}/postings", exist_ok=True)
    if index.doc_lens is not None:
        ldir = f"{out_dir}/doclens"
        os.makedirs(ldir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(index.doc_lens, preserve_index=False), f"{ldir}/data.parquet"
        )
        with open(f"{ldir}/_SUCCESS", "w") as f:
            f.write("")
    pq.write_table(
        pa.Table.from_pandas(index.term_stats, preserve_index=False), f"{out_dir}/term_stats.parquet"
    )
    with open(f"{out_dir}/globals.json", "w") as f:
        json.dump({**index.globals, "postings_buckets": num_buckets, "n_terms": n_terms}, f)


def _load_globals(out_dir: str) -> dict:
    import json

    return json.load(open(f"{out_dir}/globals.json"))


def postings_files_for_terms(out_dir: str, term_ids) -> list[str]:
    """The pruned file set: only buckets containing requested term_ids."""
    import glob
    import os

    meta = _load_globals(out_dir)
    buckets = set(
        term_bucket(np.asarray(list(term_ids), dtype=np.int64), meta["n_terms"], meta["postings_buckets"]).tolist()
    )
    files: list[str] = []
    for b in sorted(buckets):
        files.extend(sorted(glob.glob(os.path.join(out_dir, "postings", f"part={b}", "*.parquet"))))
    return files


def _load_terms(out_dir: str) -> pd.DataFrame:
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "terms", "part=*", "data.parquet")))
    if files:
        t = pd.concat([pq.read_table(f, columns=["term", "term_id"]).to_pandas() for f in files], ignore_index=True)
        return t.sort_values("term_id", kind="mergesort").reset_index(drop=True)
    legacy = os.path.join(out_dir, "terms.parquet")  # pre-r03 single-file layout
    if os.path.exists(legacy):
        return pq.read_table(legacy).to_pandas()
    return pd.DataFrame({"term": pd.Series(dtype=str), "term_id": pd.Series(dtype=np.int64)})


def read_term_ids(index_dir: str, tokens) -> dict[str, int]:
    """Pruned dictionary lookup: term buckets are LEXICOGRAPHIC ranges (ids
    are dense in sorted-term order), so a bucket whose Parquet footer
    [min, max] term statistics exclude every requested token is never read
    — the dictionary-side analogue of postings_files_for_terms (the
    reference seeks its FST in RAM; at 10⁸⁺ terms ours stays on disk and
    this is the point read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    toks = sorted(set(tokens))
    if not toks:
        return {}
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(index_dir, "terms", "part=*", "data.parquet"))):
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            # locate the term column by NAME — the checkpointed sink may
            # persist extra columns (e.g. the partition key) in any order
            st = None
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                if col.path_in_schema == "term":
                    st = col.statistics
                    break
            if st is None or not st.has_min_max:
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None and not any(lo <= t <= hi for t in toks):
            continue  # bucket's term range excludes every token
        t = pq.read_table(f, columns=["term", "term_id"], filters=[("term", "in", toks)]).to_pandas()
        out.update(zip(t["term"], t["term_id"].astype(int)))
    return out


def load_text_index(out_dir: str) -> TextIndex:
    import glob
    import os

    import pyarrow.parquet as pq

    meta = _load_globals(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "postings", "part=*", "data.parquet")))
    if files:
        postings = pd.concat([pq.read_table(f, columns=_POSTING_COLS).to_pandas() for f in files], ignore_index=True)
        postings = postings.sort_values(["field", "term_id", "doc_id"], kind="mergesort").reset_index(drop=True)
    else:
        postings = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
    return TextIndex(
        terms=_load_terms(out_dir),
        postings=postings,
        term_stats=pq.read_table(f"{out_dir}/term_stats.parquet").to_pandas(),
        globals={k: v for k, v in meta.items() if k not in ("postings_buckets", "n_terms")},
    )


def read_postings_for_terms(index_dir: str, term_ids: list[int]) -> pd.DataFrame:
    """S7/J7 analogue — read ONLY the requested terms' postings: bucket-dir
    pruning (term_id-range partitions) + Parquet row-group predicate
    pushdown (``filters`` uses footer statistics — the engine-native
    replacement for the reference's offset-sidecar seek,
    pkg/index/inverted_index.go:131-193)."""
    import pyarrow.parquet as pq

    files = postings_files_for_terms(index_dir, term_ids)
    if not files:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
    parts = [
        pq.read_table(f, columns=_POSTING_COLS, filters=[("term_id", "in", list(term_ids))]).to_pandas()
        for f in files
    ]
    return pd.concat(parts, ignore_index=True)


def point_query_store(index_dir: str, tokens) -> tuple[dict[str, int], pd.DataFrame]:
    """The at-scale point read over the on-disk index — NOTHING index-sized
    is loaded: tokens resolve through the footer-pruned dictionary buckets
    (read_term_ids), then only those terms' postings buckets/row-groups are
    opened (read_postings_for_terms). Returns (term→id for the tokens that
    exist, their postings frame) — the two reads a resident query server
    performs per request when the index exceeds RAM (the reference instead
    seeks an in-RAM FST + mmap'd postings, pkg/searcher/searcher.go)."""
    ids = read_term_ids(index_dir, tokens)
    if not ids:
        return {}, pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
    return ids, read_postings_for_terms(index_dir, sorted(ids.values()))


class StoreReader:
    """Resident handle + footer cache over an on-disk index store — the
    engine's analogue of the reference server's one-time mmap of its index
    files (pkg/searcher/searcher.go opens the FST + postings once and seeks
    thereafter). The module-level readers above re-open every bucket file
    and re-decode its footer per call; for a long-lived serving session that
    fixed cost dominates the few-KB data read. This class opens each bucket
    ONCE, keeps (ParquetFile handle, per-row-group min/max statistics), and
    answers a request with only the pruned row-group reads. Results are
    row-for-row identical to the module-level readers (tested), so scoring
    float-accumulation order is unchanged.

    A bounded row-group LRU (default 64 MB) sits on top — the analogue of
    the OS page cache under the reference's mmap: hot dictionary/postings
    row groups skip the decode, cold ones are read and evicted by recency.
    Bounded by decoded bytes, so it is never index-sized.

    Single-process state (file handles don't serialize) — construct inside
    the serving actor, never broadcast."""

    def __init__(self, index_dir: str, cache_bytes: int = 64 << 20):
        import glob
        import os
        from collections import OrderedDict

        import pyarrow.parquet as pq

        self.index_dir = index_dir
        self.meta = _load_globals(index_dir)
        self._cache: "OrderedDict[tuple, pa.Table]" = OrderedDict()
        self._cache_bytes = 0
        self._cache_cap = int(cache_bytes)
        # dictionary buckets: (handle, [(min_term, max_term)] per row group,
        # or None when any row group lacks statistics → never pruned)
        self._terms: list[tuple] = []
        for f in sorted(glob.glob(os.path.join(index_dir, "terms", "part=*", "data.parquet"))):
            pf = pq.ParquetFile(f)
            self._terms.append((pf, self._rg_stats(pf, "term")))
        # postings buckets: bucket id → [(handle, [(min_tid, max_tid)])] in
        # the same file order postings_files_for_terms yields
        self._postings: dict[int, list[tuple]] = {}
        for d in sorted(glob.glob(os.path.join(index_dir, "postings", "part=*"))):
            try:
                b = int(os.path.basename(d).split("=", 1)[1])
            except ValueError:
                continue
            entries = []
            for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                pf = pq.ParquetFile(f)
                entries.append((pf, self._rg_stats(pf, "term_id")))
            self._postings[b] = entries

    @staticmethod
    def _rg_stats(pf, column: str):
        md = pf.metadata
        out = []
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            st = None
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                if col.path_in_schema == column:
                    st = col.statistics
                    break
            if st is None or not st.has_min_max:
                return None
            out.append((st.min, st.max))
        return out

    @staticmethod
    def _prune(stats, keys) -> list[int]:
        return [i for i, (lo, hi) in enumerate(stats) if any(lo <= k <= hi for k in keys)]

    def _read(self, pf, rgs: list[int], columns: list[str]) -> pa.Table:
        """read_row_groups through the bounded LRU. Cache key includes the
        column tuple so dictionary and postings reads never alias."""
        key_cols = tuple(columns)
        keys = [(id(pf), rg, key_cols) for rg in rgs]
        # pin this request's HITS at the MRU end BEFORE any eviction — with
        # misses appended after, the request's keys are exactly the tail of
        # the OrderedDict, so the len > len(rgs) guard below can never evict
        # an entry the output loop is about to read
        for k in keys:
            if k in self._cache:
                self._cache.move_to_end(k)
        misses = [rg for rg, k in zip(rgs, keys) if k not in self._cache]
        if misses:
            fresh = pf.read_row_groups(misses, columns=columns)
            # split back per row group to keep eviction granular
            sizes = [pf.metadata.row_group(rg).num_rows for rg in misses]
            off = 0
            for rg, n in zip(misses, sizes):
                t = fresh.slice(off, n)
                off += n
                self._cache[(id(pf), rg, key_cols)] = t
                self._cache_bytes += t.nbytes
            while self._cache_bytes > self._cache_cap and len(self._cache) > len(rgs):
                _, old = self._cache.popitem(last=False)
                self._cache_bytes -= old.nbytes
        out = [self._cache[k] for k in keys]
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    def term_ids(self, tokens) -> dict[str, int]:
        """read_term_ids over the cached handles (same pruning semantics,
        row-group-granular instead of whole-file)."""
        import pyarrow.compute as pc

        toks = sorted(set(tokens))
        if not toks:
            return {}
        out: dict[str, int] = {}
        tok_set = pa.array(toks, pa.string())
        for pf, stats in self._terms:
            rgs = self._prune(stats, toks) if stats is not None else list(range(pf.metadata.num_row_groups))
            if not rgs:
                continue
            t = self._read(pf, rgs, ["term", "term_id"])
            t = t.filter(pc.is_in(t.column("term"), value_set=tok_set))
            out.update(zip(t.column("term").to_pylist(), (int(x) for x in t.column("term_id").to_pylist())))
        return out

    def postings_for_terms(self, term_ids) -> pd.DataFrame:
        """read_postings_for_terms over the cached handles — identical rows
        in identical order (bucket-sorted files, in-file order preserved)."""
        import pyarrow.compute as pc

        tids = sorted(set(int(t) for t in term_ids))
        if not tids:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
        buckets = set(
            term_bucket(np.asarray(tids, dtype=np.int64), self.meta["n_terms"], self.meta["postings_buckets"]).tolist()
        )
        tid_set = pa.array(tids, pa.int64())
        parts = []
        for b in sorted(buckets):
            for pf, stats in self._postings.get(b, []):
                rgs = self._prune(stats, tids) if stats is not None else list(range(pf.metadata.num_row_groups))
                if not rgs:
                    continue
                t = self._read(pf, rgs, _POSTING_COLS)
                t = t.filter(pc.is_in(t.column("term_id"), value_set=tid_set))
                if t.num_rows:
                    parts.append(t.to_pandas())
        if not parts:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
        return pd.concat(parts, ignore_index=True)

    def point_query(self, tokens) -> tuple[dict[str, int], pd.DataFrame]:
        """point_query_store over the cached handles."""
        ids = self.term_ids(tokens)
        if not ids:
            return {}, pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _POSTING_COLS})
        return ids, self.postings_for_terms(sorted(ids.values()))


def spimi_postings_lists(docs: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"):
    """Single-field posting lists in the reference's on-disk shape:
    term → sorted doc_ids WITH one entry per occurrence (tf by repetition,
    pkg/index/indexer.go:811-817). Pure groupby shuffle."""

    def explode(batch: pa.Table) -> pa.Table:
        toks, counts = tokenize_array(batch.column(text_col).to_pylist())
        return pa.table(
            {
                "term": pa.array(toks.astype(object), pa.string()),
                "doc_id": pa.array(np.repeat(batch.column(id_col).to_numpy(), counts)),
            }
        )

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "term": [g["term"].iloc[0]],
                "doc_ids": [np.sort(g["doc_id"].to_numpy()).tolist()],
                "n_postings": [len(g)],
            }
        )

    from ..stages.joins import grouped_apply_bounded

    return grouped_apply_bounded(
        docs.map_batches(explode, batch_format="pyarrow"), "term", collect, num_parts=64
    )
