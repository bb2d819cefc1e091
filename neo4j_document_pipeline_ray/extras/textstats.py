"""Text-analysis operators for large-scale corpus curation.

Not present in the reference (whose only text analytics are the
keyword/anchor heuristics at ``graphutil.py:219-287``); these are the
standard pre-training corpus operators — language ID, quality signals,
token counting, document fingerprinting — expressed as fully vectorized
``map_batches`` stages over the ``documents`` table
(``doc_id:int64, text:string, ...``).

Everything here is pyarrow.compute kernels (regex counts compiled once
inside Arrow) — no Python row loops except the fingerprint stage, which
needs per-document rolling hashes and is still O(words).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _read_documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# --- token counting -------------------------------------------------------

def token_count_batch(t: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
    })


def token_count(sf_dir: str) -> "ray.data.Dataset":
    """Whitespace token counts (the cheap analog of the reference's
    tiktoken counting, ``ingestMD.py:90``); the engine's BPE-ish counter
    lives in ``functions/tokenizer.py`` and drives chunking."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


# --- quality signals ------------------------------------------------------

def quality_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    return pa.table({
        "doc_id": t["doc_id"],
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_words": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
        "n_punct": pc.cast(
            pc.count_substring_regex(text, r"[^A-Za-z0-9\s]"), pa.int64()),
        "n_upper": pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.int64()),
        "n_digit": pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64()),
    })


def quality_stats(sf_dir: str) -> "ray.data.Dataset":
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
       length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
       length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
FROM documents
"""


# --- language ID (n-gram/stopword heuristic) ------------------------------

_EN_STOPS = r"\b(the|and|of|to|in|is|for|with|that|are)\b"
_MS_STOPS = r"\b(dan|yang|di|ke|untuk|ini|itu|dengan|pada|adalah)\b"


def lang_id_batch(t: pa.Table) -> pa.Table:
    low = pc.utf8_lower(t["text"])
    en = pc.count_substring_regex(low, _EN_STOPS)
    ms = pc.count_substring_regex(low, _MS_STOPS)
    pred = pc.if_else(pc.greater_equal(en, ms), "en", "ms")
    return pa.table({
        "doc_id": t["doc_id"],
        "pred_lang": pred,
        "en_hits": pc.cast(en, pa.int64()),
        "ms_hits": pc.cast(ms, pa.int64()),
    })


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


# --- document fingerprinting (rolling-hash winnowing) ---------------------

_FP_BASE = np.uint64(1_000_003)
_FP_MOD_MASK = np.uint64((1 << 61) - 1)
_WINDOW = 5


def _word_hashes(text: str) -> np.ndarray:
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = np.uint64(14695981039346656037)  # FNV-1a 64
        for b in w.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def fingerprint_batch(t: pa.Table) -> pa.Table:
    doc_ids, fps, n_grams = [], [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        hs = _word_hashes(text or "")
        if len(hs) >= _WINDOW:
            # rolling polynomial hash over word-hash windows
            weights = np.array(
                [pow(int(_FP_BASE), _WINDOW - 1 - i, 1 << 61) for i in range(_WINDOW)],
                dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(hs, _WINDOW)
            grams = (win * weights).sum(axis=1, dtype=np.uint64) & _FP_MOD_MASK
            fp = int(grams.min())  # winnowing-style minimum gram hash
            ng = len(grams)
        elif len(hs) > 0:
            fp = int(hs.min())
            ng = 1
        else:
            fp, ng = 0, 0
        doc_ids.append(doc_id)
        fps.append(fp)
        n_grams.append(ng)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "fingerprint": pa.array(fps, pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
    })


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")
