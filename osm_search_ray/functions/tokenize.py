"""Tokenizer — the single tokenization used by BOTH index and query paths.

The reference tokenizes with ``sastrawi.Tokenize`` (lowercase, strip
punctuation/symbols, whitespace split) at pkg/index/indexer.go:804,866 and
pkg/searcher/searcher.go:158,411.  Ours is the equivalent pure function,
chosen to be exactly expressible in ANSI SQL so DuckDB oracles can reproduce
it:

    Python :  [t for t in re.split('[^a-z0-9]+', s.lower()) if t]
    DuckDB :  list_filter(string_split_regex(lower(s), '[^a-z0-9]+'),
                          x -> x <> '')

Keep the two in lockstep — SURVEY.md M8 requires byte-identical behavior
across index and query paths.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")

# SQL fragment template for the oracle contract (format with the column name).
SQL_TOKENIZE = "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def tokenize(text: str) -> list[str]:
    """Tokenize one string (hot loops should use tokenize_array)."""
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if t]


def tokenize_array(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a column of strings.

    Returns ``(flat_tokens, counts)`` where ``flat_tokens`` is every token in
    row-major order and ``counts[i]`` is the token count of row i — the shape
    wanted by explode-style ``map_batches`` stages (offsets via cumsum).
    """
    flat: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    split = TOKEN_SPLIT_RE.split
    for i, s in enumerate(texts):
        toks = [t for t in split(s.lower()) if t] if s is not None else []
        counts[i] = len(toks)
        flat.extend(toks)
    return np.asarray(flat, dtype=object), counts
