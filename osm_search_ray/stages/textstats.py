"""Text-analysis stages: language-ID, quality scoring, fingerprinting
(training-data operators; the tokenizer is the engine-wide one).

The language-ID heuristic is deliberately SQL-expressible (stopword-set hit
counts + deterministic arg-max) so the driver oracle can verify it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import rolling_fingerprint
from ..functions.tokenize import tokenize_array

# Stopword sets per language, alphabetical language order is the tie-break.
LANG_STOPWORDS: dict[str, frozenset] = {
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein"}),
    "en": frozenset({"the", "a", "of", "to", "is", "and", "in"}),
    "es": frozenset({"el", "la", "de", "los", "es", "y", "en"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "un", "dans"}),
    "id": frozenset({"yang", "dan", "di", "dari", "jalan", "kota"}),
}
LANG_ORDER = sorted(LANG_STOPWORDS)  # deterministic tie-break order


def predict_lang(tokens: list[str]) -> str:
    scores = {lang: sum(t in sw for t in tokens) for lang, sw in LANG_STOPWORDS.items()}
    best = max(scores.values())
    if best == 0:
        return "unknown"
    for lang in LANG_ORDER:  # first language reaching the max wins
        if scores[lang] == best:
            return lang
    return "unknown"


class LangId:
    """Actor-pool stage: stopword sets prepared once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.sets = {lang: sw for lang, sw in LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, counts = tokenize_array(batch.column(self.text_col).to_pylist())
        off = np.concatenate([[0], np.cumsum(counts)])
        preds = [predict_lang(list(toks[off[i] : off[i + 1]])) for i in range(len(batch))]
        return pa.table({self.id_col: batch.column(self.id_col), "pred_lang": pa.array(preds, pa.string())})


def langid_stage(docs, text_col: str = "text", id_col: str = "doc_id", concurrency=None):
    """Stateless tasks by default (the stopword sets are module constants —
    an actor pool's spawn cost dominates this short stage); pass a
    ``concurrency`` to get an actor pool for long-running corpora."""
    if concurrency is None:
        fn = LangId(text_col=text_col, id_col=id_col)
        return docs.map_batches(lambda t, _fn=fn: _fn(t), batch_format="pyarrow")
    return docs.map_batches(
        LangId,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def fingerprint_stage(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Rolling-hash document fingerprint column (Karp–Rabin min-hash of byte
    windows) — cheap near-exact dup key."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(np.asarray(fps, dtype=np.uint64).astype(np.int64)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")
