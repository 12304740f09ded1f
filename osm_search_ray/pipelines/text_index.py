"""Two-field inverted text index built as Ray-Data shuffles (SURVEY.md A1-A8,
T3, M8/M9 — the reference's SPIMI indexer, pkg/index/indexer.go:689-785, IS a
hand-rolled external groupby; Ray's sort-based groupby subsumes it wholesale).

Artifacts (each also writable/readable as Parquet):
  terms      (term, term_id)              — deterministic ids by sorted order
                                            (replaces the mutex'd arrival-order
                                            IDMap, pkg/util.go:30-43)
  postings   (field, term_id, doc_id, tf, name_len, address_len, total_len)
             — one row per (field, term, doc); tf = occurrence count (the
             reference encodes tf by repetition, pkg/index/indexer.go:811-817);
             doc field lengths DENORMALIZED in at index time so scoring needs
             no doc-side join
  term_stats (term_id, df)                — distinct docs containing the term
                                            across BOTH fields (A8)
  globals    dict: docs_count, avg_name_len, avg_address_len, avg_total_len
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.tokenize import tokenize_array
from ..stages.joins import hash_bucket_join

FIELD_NAME = 0
FIELD_ADDRESS = 1


@dataclass
class TextIndex:
    terms: pd.DataFrame  # term -> term_id
    postings: pd.DataFrame
    term_stats: pd.DataFrame  # term_id -> df
    globals: dict

    def vocab(self) -> dict[str, int]:
        return dict(zip(self.terms["term"], self.terms["term_id"]))


def explode_tokens(batch: pa.Table, text_cols: dict[str, int]) -> pa.Table:
    """docs batch → (doc_id, field, term) one row per token OCCURRENCE."""
    out_doc, out_field, out_term = [], [], []
    doc_ids = batch.column("doc_id").to_numpy()
    for col, field in text_cols.items():
        toks, counts = tokenize_array(batch.column(col).to_pylist())
        out_doc.append(np.repeat(doc_ids, counts))
        out_field.append(np.full(len(toks), field, dtype=np.int8))
        out_term.append(toks)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc)),
            "field": pa.array(np.concatenate(out_field)),
            "term": pa.array(np.concatenate(out_term).astype(object), pa.string()),
        }
    )


def build_text_index(
    docs: "ray.data.Dataset",
    text_cols: dict[str, int] = None,
    num_buckets: int = 8,
) -> TextIndex:
    """Build the index with groupby shuffles; partial aggregation per batch
    keeps the exchanges proportional to distinct (term, doc) pairs."""
    text_cols = text_cols or {"name": FIELD_NAME, "address": FIELD_ADDRESS}
    tokens = docs.map_batches(lambda t: explode_tokens(t, text_cols), batch_format="pyarrow")

    # tf partials: batch-local (field, term, doc) counts, then global sum
    def tf_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["field", "term", "doc_id"], sort=False).size().reset_index(name="tf")
        return pa.Table.from_pandas(g, preserve_index=False)

    tf = (
        tokens.map_batches(tf_partial, batch_format="pyarrow")
        .groupby(["field", "term", "doc_id"])
        .aggregate(Sum("tf", alias_name="tf"))
    )
    tf_pd = tf.to_pandas()  # small at test scale; Parquet-partitioned at 100 TB
    if len(tf_pd) == 0:  # empty corpus → empty artifacts with fixed schema
        empty_postings = pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ["field", "term_id", "doc_id", "tf", "name_len", "address_len", "total_len"]}
        )
        return TextIndex(
            terms=pd.DataFrame({"term": pd.Series(dtype=str), "term_id": pd.Series(dtype=np.int64)}),
            postings=empty_postings,
            term_stats=pd.DataFrame({"term_id": pd.Series(dtype=np.int64), "df": pd.Series(dtype=np.int64)}),
            globals={"docs_count": 0, "avg_name_len": 0.0, "avg_address_len": 0.0, "avg_total_len": 0.0},
        )

    # deterministic term ids: sorted unique
    terms_sorted = np.sort(tf_pd["term"].unique())
    terms = pd.DataFrame({"term": terms_sorted, "term_id": np.arange(len(terms_sorted), dtype=np.int64)})
    vocab = dict(zip(terms["term"], terms["term_id"]))
    tf_pd["term_id"] = tf_pd["term"].map(vocab)

    # per-doc field lengths (A3) + global averages (A4)
    def len_partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        cols = {"doc_id": doc_ids}
        for col, field in text_cols.items():
            _, counts = tokenize_array(batch.column(col).to_pylist())
            cols[f"len_{field}"] = counts
        return pa.table(cols)

    lens = docs.map_batches(len_partial, batch_format="pyarrow").to_pandas()
    lens = lens.rename(columns={f"len_{FIELD_NAME}": "name_len", f"len_{FIELD_ADDRESS}": "address_len"})
    lens["total_len"] = lens["name_len"] + lens["address_len"]

    postings = tf_pd.merge(lens, on="doc_id")[
        ["field", "term_id", "doc_id", "tf", "name_len", "address_len", "total_len"]
    ].sort_values(["field", "term_id", "doc_id"], kind="mergesort").reset_index(drop=True)

    # df across both fields (A8: distinct docs containing term)
    term_stats = (
        tf_pd[["term_id", "doc_id"]].drop_duplicates().groupby("term_id").size().reset_index(name="df")
    )

    globals_ = {
        "docs_count": int(lens["doc_id"].nunique()),
        "avg_name_len": float(lens["name_len"].mean()),
        "avg_address_len": float(lens["address_len"].mean()),
        "avg_total_len": float(lens["total_len"].mean()),
    }
    return TextIndex(terms=terms, postings=postings, term_stats=term_stats, globals=globals_)


def save_text_index(index: TextIndex, out_dir: str) -> None:
    """Parquet artifacts; postings partitioned by term_id range so query-time
    reads prune row groups (S6/S7 analogue — Parquet footers replace the
    reference's custom offset sidecars, pkg/index/inverted_index.go:301-414)."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(index.terms, preserve_index=False), f"{out_dir}/terms.parquet")
    pq.write_table(
        pa.Table.from_pandas(index.postings, preserve_index=False),
        f"{out_dir}/postings.parquet",
        row_group_size=64 * 1024,
    )
    pq.write_table(pa.Table.from_pandas(index.term_stats, preserve_index=False), f"{out_dir}/term_stats.parquet")
    with open(f"{out_dir}/globals.json", "w") as f:
        json.dump(index.globals, f)


def load_text_index(out_dir: str) -> TextIndex:
    import json

    import pyarrow.parquet as pq

    return TextIndex(
        terms=pq.read_table(f"{out_dir}/terms.parquet").to_pandas(),
        postings=pq.read_table(f"{out_dir}/postings.parquet").to_pandas(),
        term_stats=pq.read_table(f"{out_dir}/term_stats.parquet").to_pandas(),
        globals=json.load(open(f"{out_dir}/globals.json")),
    )


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


def read_postings_for_terms(index_dir: str, term_ids: list[int]) -> pd.DataFrame:
    """S7/J7 analogue — read ONLY the requested terms' postings rows from the
    Parquet artifact via predicate pushdown (``filters`` prunes row groups
    using the Parquet footer statistics — the engine-native replacement for
    the reference's offset-sidecar seek, pkg/index/inverted_index.go:131-193).
    """
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{index_dir}/postings.parquet",
        filters=[("term_id", "in", list(term_ids))],
    ).to_pandas()
