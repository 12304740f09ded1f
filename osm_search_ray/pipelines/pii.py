"""PII redaction — the webtext-pipeline scrubbing stage (training-data
operator family, SURVEY.md beyond-reference set; the reference engine has no
analogue — it indexes public OSM names).

Three pattern classes are redacted in a FIXED order (email → phone → IPv4),
each replaced by a typed placeholder, with per-class match counts taken on
the stage's own input (i.e. phone counts see the email-redacted string).
The kernels are Arrow's vectorized RE2 (`pyarrow.compute
replace_substring_regex` / `count_substring_regex`) — the same regex engine
DuckDB's `regexp_replace` / `regexp_extract_all` use, so the SQL oracle is
exact on both the redacted text and the counts.

Input is the derived ``contact_pages`` table (sources/derived.py): corpus
text + a deterministic synthetic contact suffix per doc_id, so every row
exercises all three patterns and the oracle is never vacuous.

Scale shape: stateless per-batch map — no shuffle, no state, no driver
data; the cheapest possible 100 TB operator.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources import derived as dv

# (name, RE2 pattern, replacement) — applied in order; counts are
# taken immediately before each replacement.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_batch(batch: pa.Table, text_col: str = "raw_text") -> pa.Table:
    """(.., text_col) → (.., clean_text, n_email, n_phone, n_ip)."""
    s = batch.column(text_col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
        s = pc.replace_substring_regex(s, pat, repl)
    out = batch.drop_columns([text_col]).append_column("clean_text", s)
    for k, v in counts.items():
        out = out.append_column(k, v)
    return out


def pii_redact(sf_dir: str):
    """(doc_id, clean_text, n_email, n_phone, n_ip) over contact_pages."""
    return dv.contact_pages(sf_dir).map_batches(redact_batch, batch_format="pyarrow")


_R = {name: (pat.replace("'", "''"), repl) for name, pat, repl in PII_PATTERNS}

SQL_PII_REDACT = f"""
WITH {dv.SQL_CONTACT_PAGES.strip()},
r1 AS (
    SELECT doc_id, raw_text,
           len(regexp_extract_all(raw_text, '{_R['email'][0]}')) AS n_email,
           regexp_replace(raw_text, '{_R['email'][0]}', '{_R['email'][1]}', 'g') AS t1
    FROM contact_pages
),
r2 AS (
    SELECT doc_id, n_email,
           len(regexp_extract_all(t1, '{_R['phone'][0]}')) AS n_phone,
           regexp_replace(t1, '{_R['phone'][0]}', '{_R['phone'][1]}', 'g') AS t2
    FROM r1
)
SELECT doc_id,
       regexp_replace(t2, '{_R['ip'][0]}', '{_R['ip'][1]}', 'g') AS clean_text,
       n_email, n_phone,
       len(regexp_extract_all(t2, '{_R['ip'][0]}')) AS n_ip
FROM r2
"""
