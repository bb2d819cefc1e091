"""Blocklist / PII scrubbing over the documents table.

A webtext curation pipeline scrubs two kinds of spans before training:
terms on an editorial blocklist, and PII-shaped spans (emails, phone
numbers, IPv4 addresses).  Both are the same operator — a vectorized
regex rewrite — differing only in the pattern, so one kernel serves
both (the reference has no scrubbing stage; this extends its
curation surface the way ``extras/textstats.py`` does).

Scale shape: embarrassingly parallel — ONE ``map_batches`` pass, no
exchange, no state.  The regexes run through Arrow's RE2 bindings
(``pc.replace_substring_regex`` / ``pc.count_substring_regex``), so
the whole batch is rewritten in C without materializing Python
strings.  DuckDB's regex engine is also RE2, which is what lets the
``oracle_sql`` twin hash-match byte-for-byte: the oracle replays the
same pattern, not a reimplementation.

PII patterns are deliberately conservative (precision over recall):
a training-data scrub that eats ordinary prose is worse than one
that misses an exotic phone format.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2-compatible (no backreferences, no lookaround) — identical
# semantics in Arrow and DuckDB.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PII_RE = f"(?:{EMAIL_RE})|(?:{PHONE_RE})|(?:{IPV4_RE})"

DEFAULT_MASK = "[SCRUBBED]"


def blocklist_pattern(terms) -> str:
    """Whole-word alternation for a term blocklist.  Terms are sorted
    so the pattern (and therefore the output) is independent of the
    caller's iteration order."""
    if not terms:
        raise ValueError("empty blocklist")
    return r"\b(?:" + "|".join(sorted(set(terms))) + r")\b"


def scrub_batch(t: pa.Table, pattern: str, mask: str = DEFAULT_MASK,
                text_col: str = "text") -> pa.Table:
    """One batch: count the matches, rewrite them to ``mask``."""
    text = t[text_col]
    n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
    scrubbed = pc.replace_substring_regex(text, pattern, mask)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_scrubbed": n,
        "scrubbed": scrubbed,
    })


def scrub_blocklist(sf_dir: str, terms=("spark", "customer"),
                    mask: str = DEFAULT_MASK) -> "ray.data.Dataset":
    """Scrub blocklisted terms from every document; returns
    ``(doc_id, n_scrubbed, scrubbed)`` for ALL docs (the zero-hit rows
    are kept so the output is a drop-in replacement column, not a
    filter)."""
    pattern = blocklist_pattern(terms)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: scrub_batch(t, pattern, mask), batch_format="pyarrow")


def scrub_pii(sf_dir: str, mask: str = DEFAULT_MASK) -> "ray.data.Dataset":
    """Same kernel with the built-in PII alternation."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: scrub_batch(t, PII_RE, mask), batch_format="pyarrow")


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def scrub_blocklist_sql(terms=("spark", "customer"),
                        mask: str = DEFAULT_MASK) -> str:
    pattern = _sql_quote(blocklist_pattern(terms))
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT)
         AS n_scrubbed,
       regexp_replace(text, '{pattern}', '{mask}', 'g') AS scrubbed
FROM documents
"""
