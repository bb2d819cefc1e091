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


_PACK_PARTS = 16
_PACK_CAPACITY = 2048


def token_pack(sf_dir: str, capacity: int = _PACK_CAPACITY,
               n_parts: int = _PACK_PARTS) -> "ray.data.Dataset":
    """Greedy sequence packing — the sample-packing step a training
    pipeline runs before batching: assign each doc to a fixed
    ``capacity``-token bin, filling bins greedily in ascending doc_id
    order.  A doc longer than ``capacity`` gets a bin to itself
    (counted as ``capacity`` tokens — the truncate-to-context rule).

    Scale shape: packing is stateful-sequential, so it runs per
    PARTITION — ``part = doc_id % n_parts`` is a pure function of the
    key (deterministic under any block layout, SQL-replayable), each
    partition packs independently after one exchange, and bin ids are
    partition-local ``(part, bin)``.  That is exactly how distributed
    packing shards at 100 TB: global greedy order would serialize the
    whole corpus for ~zero packing-density gain.

    Returns ``(doc_id, part, bin, n_tokens)``.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    counts = ds.map_batches(token_count_batch, batch_format="pyarrow")
    def add_part(t: pa.Table) -> pa.Table:
        part = t["doc_id"].to_numpy(zero_copy_only=False) % n_parts
        return t.append_column("part", pa.array(part.astype("int64"),
                                                pa.int64()))

    counts = counts.map_batches(add_part, batch_format="pyarrow")

    def pack(df: "pd.DataFrame") -> "pd.DataFrame":
        outs = []
        for _part, g in df.groupby("part", sort=False):
            g = g.sort_values("doc_id")
            bins = []
            bin_id, fill = 0, 0
            for n in g["n_tokens"].to_numpy():
                n_eff = min(int(n), capacity)
                if fill > 0 and fill + n_eff > capacity:
                    bin_id += 1
                    fill = 0
                bins.append(bin_id)
                fill += n_eff
            g = g.copy()
            g["bin"] = pd.Series(bins, index=g.index, dtype="int64")
            outs.append(g[["doc_id", "part", "bin", "n_tokens"]])
        return pd.concat(outs) if outs else df.iloc[:0]

    return partitioned_group_map(counts, "part", pack,
                                 num_partitions=n_parts)


def token_pack_sql(capacity: int = _PACK_CAPACITY,
                   n_parts: int = _PACK_PARTS) -> str:
    """DuckDB mirror of ``token_pack``: the greedy fold replayed as a
    recursive CTE that advances every partition one doc per step."""
    return f"""WITH RECURSIVE c AS (
        SELECT doc_id,
               doc_id % {n_parts} AS part,
               least(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END, {capacity}) AS n_eff,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % {n_parts}
                                  ORDER BY doc_id) AS rn
        FROM documents
    ), f AS (
        SELECT part, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS bin, n_eff AS fill
        FROM c WHERE rn = 1
        UNION ALL
        SELECT c.part, c.rn, c.doc_id, c.n_tokens,
               CASE WHEN f.fill > 0 AND f.fill + c.n_eff > {capacity}
                    THEN f.bin + 1 ELSE f.bin END,
               CASE WHEN f.fill > 0 AND f.fill + c.n_eff > {capacity}
                    THEN c.n_eff ELSE f.fill + c.n_eff END
        FROM f JOIN c ON c.part = f.part AND c.rn = f.rn + 1
    )
    SELECT doc_id, part, bin, n_tokens FROM f"""


TOKEN_PACK_SQL = token_pack_sql()


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


LANG_ID_SQL = f"""
SELECT doc_id,
       CASE WHEN en >= ms THEN 'en' ELSE 'ms' END AS pred_lang,
       en AS en_hits, ms AS ms_hits
FROM (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_EN_STOPS}')) AS BIGINT) AS en,
           CAST(len(regexp_extract_all(lower(text), '{_MS_STOPS}')) AS BIGINT) AS ms
    FROM documents
)
"""


def lang_confusion(sf_dir: str, num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Language-ID confusion matrix: (true lang, predicted lang, n) —
    the accuracy audit a curation pass runs before trusting the
    heuristic classifier for filtering.  Prediction happens in-batch
    (same kernel as :func:`lang_id`); only (lang-pair, count) partials
    reach the exchange."""
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ds = _read_documents(sf_dir, ["text", "lang"])

    def batch(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        en = pc.count_substring_regex(low, _EN_STOPS)
        ms = pc.count_substring_regex(low, _MS_STOPS)
        return pa.table({
            "lang": t["lang"],
            "pred_lang": pc.if_else(pc.greater_equal(en, ms), "en", "ms"),
        })

    return hash_aggregate(
        ds.map_batches(batch, batch_format="pyarrow"),
        ["lang", "pred_lang"], [(None, "count", "n")],
        num_partitions=num_partitions)


LANG_CONFUSION_SQL = f"""
SELECT lang,
       CASE WHEN en >= ms THEN 'en' ELSE 'ms' END AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM (
    SELECT lang,
           len(regexp_extract_all(lower(text), '{_EN_STOPS}')) AS en,
           len(regexp_extract_all(lower(text), '{_MS_STOPS}')) AS ms
    FROM documents
) GROUP BY 1, 2
"""


# --- document fingerprinting (rolling-hash winnowing) ---------------------

_FP_BASE = np.uint64(1_000_003)
_FP_MOD_MASK = np.uint64((1 << 61) - 1)
_WINDOW = 5


def _word_hashes(text: str) -> np.ndarray:
    """Scalar FNV-1a 64 per word — the REFERENCE implementation the
    vectorized batch kernel below is pinned against in pytest."""
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


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _word_hashes_texts(texts) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized FNV-1a 64 over every word of every text in one shot.

    Returns ``(hashes, offsets)``: ``hashes`` concatenates each text's
    word-hash sequence (uint64, bit-identical to :func:`_word_hashes`);
    ``hashes[offsets[i]:offsets[i+1]]`` is text ``i``'s sequence.

    The per-byte FNV fold is inherently sequential per WORD but not
    across words: the batch loops over byte POSITIONS (bounded by the
    longest word, ~tens) with every step a full-width numpy op, instead
    of a Python loop over every byte of every word of every row.  Word
    boundaries are found in utf-8 byte space — 0x20 never occurs inside
    a multi-byte utf-8 sequence, and ``str.split()`` words contain no
    whitespace, so the single ``' '.join``-ed buffer splits exactly.
    """
    tokens_per = [(t or "").lower().split() for t in texts]
    counts = np.fromiter((len(ts) for ts in tokens_per), np.int64,
                         len(tokens_per))
    offsets = np.zeros(len(tokens_per) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    n = int(offsets[-1])
    if n == 0:
        return np.zeros(0, dtype=np.uint64), offsets
    buf = np.frombuffer(
        " ".join(w for ts in tokens_per for w in ts).encode("utf-8"),
        dtype=np.uint8)
    sep = np.flatnonzero(buf == 0x20)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = sep + 1
    ends = np.empty(n, dtype=np.int64)
    ends[:-1] = sep
    ends[-1] = len(buf)
    lens = ends - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    live = np.arange(n)          # words whose fold hasn't finished
    pos = starts.copy()
    while len(live):
        h[live] = (h[live] ^ buf[pos[live]].astype(np.uint64)) * _FNV_PRIME
        pos[live] += 1
        live = live[pos[live] < ends[live]]
    return h, offsets


_FP_WEIGHTS = np.array(
    [pow(int(_FP_BASE), _WINDOW - 1 - i, 1 << 61) for i in range(_WINDOW)],
    dtype=np.uint64,
)


def _flat_gram_hashes(
    hashes: np.ndarray, offsets: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """Window-``_WINDOW`` polynomial gram hashes for EVERY doc of a flat
    word-hash batch at once.  Returns ``(grams, gram_doc)`` where
    ``gram_doc[i]`` is the doc index of ``grams[i]``; docs shorter than
    the window contribute nothing.  Computes sliding windows over the
    concatenated array and keeps only windows that don't cross a doc
    boundary — one matmul-shaped pass instead of a per-doc loop."""
    n = len(hashes)
    if n < _WINDOW:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, _WINDOW)
    g_all = (win * _FP_WEIGHTS).sum(axis=1, dtype=np.uint64) & _FP_MOD_MASK
    p = np.arange(n - _WINDOW + 1)
    doc_of = np.searchsorted(offsets, p, side="right") - 1
    valid = (p + _WINDOW) <= offsets[doc_of + 1]
    return g_all[valid], doc_of[valid]


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Winnowing fingerprint per doc, fully vectorized over the batch:
    one flat FNV pass (:func:`_word_hashes_texts`), one flat gram pass
    (:func:`_flat_gram_hashes`), per-doc minima via ``np.minimum.at``.
    Bit-identical to the scalar reference path (pinned in pytest and by
    the FINGERPRINT_SQL hash gate)."""
    ndocs = t.num_rows
    hs, offs = _word_hashes_texts(t["text"].to_pylist())
    nw = np.diff(offs)
    grams, gdoc = _flat_gram_hashes(hs, offs)

    fps = np.zeros(ndocs, dtype=np.uint64)
    # gram path: min gram hash per doc with >= _WINDOW words
    has_grams = nw >= _WINDOW
    gmin = np.full(ndocs, np.iinfo(np.uint64).max, dtype=np.uint64)
    np.minimum.at(gmin, gdoc, grams)
    fps[has_grams] = gmin[has_grams]
    # short-doc path: min word hash masked to 61 bits like the grams
    short = (nw > 0) & ~has_grams
    if short.any():
        wmin = np.full(ndocs, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(wmin, np.repeat(np.arange(ndocs), nw), hs)
        fps[short] = wmin[short] & _FP_MOD_MASK

    n_grams = np.where(has_grams, nw - _WINDOW + 1,
                       np.where(nw > 0, 1, 0)).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"],
        "fingerprint": pa.array(fps.astype(np.int64), pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
    })


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def _fingerprint_sql() -> str:
    """DuckDB mirror of :func:`fingerprint_batch`: FNV-1a 64 per word
    folded with ``list_reduce`` (HUGEINT arithmetic emulating the
    engine's uint64 wrap), then the window-5 polynomial gram hashes and
    the winnowing minimum.  Valid for ASCII corpora (the synthetic
    documents table is ASCII; Python hashes utf-8 bytes, SQL hashes
    code points — identical for ASCII)."""
    m64 = 1 << 64
    m61 = 1 << 61
    weights = [pow(int(_FP_BASE), _WINDOW - 1 - i, m61) for i in range(_WINDOW)]
    gram = " + ".join(
        f"(hs[j + {i}] * {w}) % {m64}" for i, w in enumerate(weights)
    )
    return f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS words
        FROM documents
    ), h AS (
        SELECT doc_id,
               list_transform(words, w ->
                   list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                               i -> CAST(ascii(substr(w, i, 1)) AS HUGEINT))),
                       (acc, b) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(b AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211) % {m64}
                   )
               ) AS hs
        FROM d
    ), g AS (
        SELECT doc_id, hs, len(hs) AS nw,
               CASE WHEN len(hs) >= {_WINDOW} THEN
                   list_transform(range(1, len(hs) - {_WINDOW - 2}),
                       j -> (({gram}) % {m64}) % {m61})
               ELSE NULL END AS grams
        FROM h
    )
    SELECT doc_id,
           CASE WHEN nw >= {_WINDOW}
                     THEN CAST(list_aggregate(grams, 'min') AS BIGINT)
                WHEN nw > 0
                     THEN CAST(list_aggregate(hs, 'min') % {m61} AS BIGINT)
                ELSE 0 END AS fingerprint,
           CAST(CASE WHEN nw >= {_WINDOW} THEN len(grams)
                     WHEN nw > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_grams
    FROM g
    """


FINGERPRINT_SQL = _fingerprint_sql()


# --- vocabulary heavy hitters ----------------------------------------------

def top_tokens(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    """Global top-k most frequent lowercase whitespace tokens — the
    vocabulary heavy-hitter pass of a corpus audit.  Textbook two-phase
    shape: every batch collapses to its own (token, count) partials
    (``value_counts`` on the flattened split array), so the exchange
    carries vocabularies, not tokens; ties break lexicographically."""
    ds = _read_documents(sf_dir, ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    agg = hash_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        "token", [("n", "sum", "n")],
    )
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def top_tokens_sql(k: int = 50) -> str:
    return f"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
    FROM documents WHERE trim(text) <> ''
)
SELECT token, count(*) AS n
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT {k}
"""


# --- exact distributed quantiles -------------------------------------------

_QUANTILES = ((1, 2), (9, 10), (99, 100))  # P50 / P90 / P99 as exact rationals


def length_quantiles(sf_dir: str, col: str = "n_chars"):
    """EXACT quantiles of an integer column at any scale, without a
    global sort: per-batch ``value_counts`` partials -> one small
    (value, count) hash aggregate (cardinality = distinct lengths, not
    rows) -> the quantile read off the merged histogram.  Matches
    DuckDB ``quantile_disc`` (k-th smallest, k = ceil(q*n), computed in
    integer math so no float-ceil edge cases).  Returns a pyarrow
    Table (three rows — driver-side finalization on the tiny
    histogram, like the other small finals)."""
    import numpy as np

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ds = _read_documents(sf_dir, [col])

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t[col].combine_chunks().value_counts()
        return pa.table({
            "v": pc.cast(vc.field("values"), pa.int64()),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    hist = hash_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        "v", [("c", "sum", "c")],
    ).sort("v").take_all()
    vals = np.asarray([r["v"] for r in hist], dtype=np.int64)
    cnts = np.asarray([r["c"] for r in hist], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    out_q, out_v = [], []
    for num, den in _QUANTILES:
        kth = (num * n + den - 1) // den  # ceil(q*n) exactly
        idx = int(np.searchsorted(cum, kth))
        out_q.append(num / den)
        out_v.append(int(vals[idx]))
    return pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.int64()),
    })


def length_quantiles_sql(col: str = "n_chars") -> str:
    qs = ", ".join(f"{num}/{den}::DOUBLE" for num, den in _QUANTILES)
    vs = ", ".join(
        f"quantile_disc({col}, {num}::DOUBLE/{den})" for num, den in _QUANTILES)
    return f"""
SELECT unnest([{qs}]) AS q, unnest([{vs}]) AS value FROM documents
"""


def grouped_length_quantiles(
    sf_dir: str,
    group_col: str = "lang",
    col: str = "n_chars",
    num_partitions: "int | None" = None,
):
    """EXACT per-group quantiles of an integer column — the grouped
    generalization of :func:`length_quantiles` (per-language length
    profiles are what a curation pass tunes its thresholds against;
    one global quantile hides the per-language skew).

    Same no-global-sort shape, but the histogram is keyed
    ``(group, value)`` (cardinality = groups x distinct values, never
    rows) and finalization is DISTRIBUTED: a vectorized per-group
    cumsum scan inside hash partitions picks the ceil(q*n)-th smallest
    per group — no driver-side data path, unlike the global variant's
    three-row final (safe there, wrong once groups number in the
    millions, e.g. per-domain profiles).  Matches DuckDB
    ``quantile_disc`` per group in integer math.
    """
    import numpy as np
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import (
        hash_aggregate,
        partitioned_group_map,
    )

    ds = _read_documents(sf_dir, [group_col, col])

    def partial_counts(t: pa.Table) -> pa.Table:
        agg = t.group_by([group_col, col], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({
            group_col: agg[group_col],
            "v": pc.cast(agg[col], pa.int64()),
            "c": pc.cast(agg["count_all"], pa.int64()),
        })

    hist = hash_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        [group_col, "v"], [("c", "sum", "c")],
        num_partitions=num_partitions)

    def per_group(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([group_col, "v"], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df["v"].to_numpy()
        c = df["c"].to_numpy()
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends_ = np.r_[starts[1:], len(g)]
        out_g, out_q, out_v = [], [], []
        for s, e in zip(starts, ends_):
            cum = np.cumsum(c[s:e])
            n = int(cum[-1])
            for num, den in _QUANTILES:
                kth = (num * n + den - 1) // den  # ceil(q*n) exactly
                idx = int(np.searchsorted(cum, kth))
                out_g.append(g[s])
                out_q.append(num / den)
                out_v.append(int(v[s:e][idx]))
        return pd.DataFrame({
            group_col: pd.Series(out_g, dtype="object"),
            "q": pd.Series(out_q, dtype="float64"),
            "value": pd.Series(out_v, dtype="int64"),
        })

    return partitioned_group_map(
        hist, group_col, per_group, num_partitions=num_partitions)


def grouped_length_quantiles_sql(
    group_col: str = "lang", col: str = "n_chars") -> str:
    qs = ", ".join(f"{num}/{den}::DOUBLE" for num, den in _QUANTILES)
    vs = ", ".join(
        f"quantile_disc({col}, {num}::DOUBLE/{den})"
        for num, den in _QUANTILES)
    return f"""
SELECT {group_col}, unnest([{qs}]) AS q, unnest([{vs}]) AS value
FROM documents GROUP BY {group_col}
"""


# --- repetition signals (Gopher-style) -------------------------------------

REP_SCALE = 10**6


def repetition_batch(t: pa.Table) -> pa.Table:
    """Per-document repetition signals (the Gopher repetition filters,
    Rae et al. 2021 Table A1), integer-scaled so a DuckDB replay
    hash-matches:

    * ``dup_line_frac_scaled``    — duplicate lines / lines
    * ``dup_char_frac_scaled``    — chars in line occurrences beyond
      the first / total line chars
    * ``top_2gram_frac_scaled``   — chars covered by the most frequent
      word 2-gram / total word chars (tie: lexicographically smallest
      gram)

    Lines are ``\\n``-split and RE2-trimmed (empty dropped); words are
    ``\\s+``-split.  Entirely batch-local (a document is one row), so
    the stage fuses into the read with no exchange; the per-batch body
    is Arrow/pandas vectorized end to end.
    """
    import pandas as pd

    n = t.num_rows
    doc_ids = t["doc_id"].combine_chunks()
    text = t["text"].combine_chunks()

    trim_re = r"^\s+|\s+$"

    # ---- lines ----
    lines = pc.split_pattern(text, "\n")
    lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    flat = pc.replace_substring_regex(pc.list_flatten(lines), trim_re, "")
    idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    ldf = pd.DataFrame({
        "i": idx[keep],
        "line": flat.filter(pa.array(keep)).to_pandas(),
    })
    ldf["chars"] = ldf["line"].str.len().astype("int64")
    lc = (ldf.groupby(["i", "line"], sort=False)
             .agg(c=("chars", "size"), chars=("chars", "first"))
             .reset_index())
    lc["tc"] = lc["c"] * lc["chars"]
    lc["dc"] = (lc["c"] - 1) * lc["chars"]
    lg = lc.groupby("i")
    la = pd.DataFrame({
        "n_lines": lg["c"].sum(),
        "n_distinct": lg["c"].size(),
        "total_chars": lg["tc"].sum(),
        "dup_chars": lg["dc"].sum(),
    })

    # ---- word 2-grams ----
    trimmed = pc.replace_substring_regex(text, trim_re, "")
    words = pc.split_pattern_regex(trimmed, r"\s+")
    wlens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    wflat = pc.list_flatten(words)
    widx = np.repeat(np.arange(n, dtype=np.int64), wlens)
    wkeep = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)
    widx = widx[wkeep]
    warr = wflat.filter(pa.array(wkeep))
    wchar = pc.utf8_length(warr).to_numpy(zero_copy_only=False).astype(np.int64)
    wtot = pd.Series(wchar).groupby(pd.Series(widx)).sum()

    w = warr.to_pandas().to_numpy()
    same_doc = widx[1:] == widx[:-1] if len(widx) else np.zeros(0, bool)
    if same_doc.any():
        g1 = w[:-1][same_doc]
        g2 = w[1:][same_doc]
        gdf = pd.DataFrame({
            "i": widx[:-1][same_doc],
            "gram": pd.Series(g1) + " " + pd.Series(g2),
            "gchars": wchar[:-1][same_doc] + wchar[1:][same_doc],
        })
        gc = (gdf.groupby(["i", "gram"], sort=False)
                 .agg(c=("gchars", "size"), gchars=("gchars", "first"))
                 .reset_index())
        top = (gc.sort_values(["i", "c", "gram"],
                              ascending=[True, False, True], kind="mergesort")
                 .drop_duplicates("i").set_index("i"))
    else:
        top = pd.DataFrame({"c": [], "gchars": []},
                           index=pd.Index([], name="i"))

    # ---- assemble (every input doc gets a row; missing -> 0) ----
    base = np.arange(n, dtype=np.int64)
    n_lines = la["n_lines"].reindex(base, fill_value=0).to_numpy(np.int64)
    n_dist = la["n_distinct"].reindex(base, fill_value=0).to_numpy(np.int64)
    tchars = la["total_chars"].reindex(base, fill_value=0).to_numpy(np.int64)
    dchars = la["dup_chars"].reindex(base, fill_value=0).to_numpy(np.int64)
    topc = top["c"].reindex(base, fill_value=0).to_numpy(np.int64)
    topg = top["gchars"].reindex(base, fill_value=0).to_numpy(np.int64)
    wtotv = wtot.reindex(base, fill_value=0).to_numpy(np.int64)

    dup_line = np.where(
        n_lines > 0, ((n_lines - n_dist) * REP_SCALE) // np.maximum(n_lines, 1), 0)
    dup_char = np.where(
        tchars > 0, (dchars * REP_SCALE) // np.maximum(tchars, 1), 0)
    top_gram = np.where(
        wtotv > 0, (topc * topg * REP_SCALE) // np.maximum(wtotv, 1), 0)

    return pa.table({
        "doc_id": doc_ids,
        "n_lines": pa.array(n_lines, pa.int64()),
        "dup_line_frac_scaled": pa.array(dup_line, pa.int64()),
        "dup_char_frac_scaled": pa.array(dup_char, pa.int64()),
        "top_2gram_frac_scaled": pa.array(top_gram, pa.int64()),
    })


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style repetition signals over the documents table."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


REPETITION_SQL = r"""
WITH base AS (
    SELECT doc_id, text FROM documents
), lines0 AS (
    SELECT doc_id,
           regexp_replace(unnest(string_split(text, chr(10))),
                          '^\s+|\s+$', '', 'g') AS line
    FROM base
), lines AS (
    SELECT doc_id, line FROM lines0 WHERE line <> ''
), lc AS (
    SELECT doc_id, line, count(*) AS c, len(line) AS chars
    FROM lines GROUP BY 1, 2
), la AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c * chars) AS BIGINT) AS total_chars,
           CAST(sum((c - 1) * chars) AS BIGINT) AS dup_chars
    FROM lc GROUP BY 1
), words0 AS (
    SELECT doc_id,
           regexp_split_to_array(
               regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS l
    FROM base
), w AS (
    SELECT doc_id, unnest(l) AS wd,
           unnest(range(1, len(l) + 1)) AS i
    FROM words0
    WHERE len(l) > 0
), w2 AS (
    SELECT doc_id, wd, i FROM w WHERE wd <> ''
), wtot AS (
    SELECT doc_id, CAST(sum(len(wd)) AS BIGINT) AS wchars
    FROM w2 GROUP BY 1
), g AS (
    SELECT a.doc_id, a.wd AS w1, b.wd AS w2
    FROM w2 a JOIN w2 b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), gc AS (
    SELECT doc_id, w1 || ' ' || w2 AS gram,
           len(w1) + len(w2) AS gchars, count(*) AS c
    FROM g GROUP BY 1, 2, 3
), top AS (
    SELECT doc_id, c, gchars FROM (
        SELECT doc_id, c, gchars,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
        FROM gc
    ) WHERE rn = 1
)
SELECT b.doc_id,
       coalesce(la.n_lines, 0) AS n_lines,
       CAST(CASE WHEN coalesce(la.n_lines, 0) = 0 THEN 0
            ELSE ((la.n_lines - la.n_distinct) * 1000000) // la.n_lines
            END AS BIGINT) AS dup_line_frac_scaled,
       CAST(CASE WHEN coalesce(la.total_chars, 0) = 0 THEN 0
            ELSE (la.dup_chars * 1000000) // la.total_chars
            END AS BIGINT) AS dup_char_frac_scaled,
       CAST(CASE WHEN coalesce(wtot.wchars, 0) = 0 OR top.c IS NULL THEN 0
            ELSE (top.c * top.gchars * 1000000) // wtot.wchars
            END AS BIGINT) AS top_2gram_frac_scaled
FROM base b
LEFT JOIN la ON la.doc_id = b.doc_id
LEFT JOIN wtot ON wtot.doc_id = b.doc_id
LEFT JOIN top ON top.doc_id = b.doc_id
"""


# --- per-document salient terms (integer TF-IDF) ---------------------------

SALIENCE_SCALE = 10**6


def salient_terms(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-``k`` salient tokens per document — the keyword-extraction
    pass of a corpus index.  Salience is an integer TF-IDF surrogate
    (exact, so the DuckDB replay hash-matches; float ``log`` idf
    cannot):

        ``salience_scaled = (tf * N * scale) // (doc_len * df)``

    i.e. the token's in-doc rate lifted by its corpus rarity.  Tokens
    are the vocabulary of :func:`top_tokens` (lowercase, ``\\s+``).

    Distributed shape: per-(doc, token) counts are batch-local (a doc
    is one row); the document-frequency table is ONE two-phase hash
    aggregate over those partials (the exchange carries vocabularies,
    not tokens) and comes back through ``broadcast_join``'s size gate,
    so the doc-side rows never shuffle; the final per-doc top-k is a
    vectorized sort + head inside each batch.  ``tf * N * scale`` must
    fit int64 — at >1e9-doc corpora drop ``scale`` or pre-prune the
    vocabulary (min-df), as a production index would anyway.
    """
    import pandas as pd

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()

    def tf_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        f = pd.DataFrame({
            "doc_id": doc_ids[idx[keep]],
            "token": flat.filter(pa.array(keep)).to_pandas(),
        })
        tf = (f.groupby(["doc_id", "token"], sort=False)
                .size().rename("tf").reset_index())
        dlen = f.groupby("doc_id").size().rename("n_toks")
        tf = tf.join(dlen, on="doc_id")
        return pa.table({
            "doc_id": pa.array(tf["doc_id"].to_numpy(), pa.int64()),
            "token": pa.array(tf["token"], pa.string()),
            "tf": pa.array(tf["tf"].to_numpy(np.int64), pa.int64()),
            "n_toks": pa.array(tf["n_toks"].to_numpy(np.int64), pa.int64()),
        })

    tf_ds = ds.map_batches(tf_batch, batch_format="pyarrow")

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    df_tbl = hash_aggregate(
        tf_ds.select_columns(["token"]), "token", [(None, "count", "df")])

    joined = broadcast_join(tf_ds, df_tbl, on=("token",))

    def topk(t: pa.Table) -> pa.Table:
        import pandas as pd

        d = t.to_pandas()
        tf_arr = d["tf"].to_numpy(np.int64)
        if len(tf_arr) and int(tf_arr.max()) * n_docs * SALIENCE_SCALE > (1 << 63) - 1:
            raise OverflowError(
                f"salience would overflow int64 at n_docs={n_docs}; "
                "pre-prune the vocabulary (min-df) or lower the scale")
        d["salience_scaled"] = (
            tf_arr * n_docs * SALIENCE_SCALE
        ) // (d["n_toks"].to_numpy(np.int64) * d["df"].to_numpy(np.int64))
        d = (d.sort_values(["doc_id", "salience_scaled", "token"],
                           ascending=[True, False, True], kind="mergesort")
               .groupby("doc_id").head(k))
        return pa.table({
            "doc_id": pa.array(d["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(d["token"], pa.string()),
            "tf": pa.array(d["tf"].to_numpy(np.int64), pa.int64()),
            "salience_scaled": pa.array(
                d["salience_scaled"].to_numpy(np.int64), pa.int64()),
        })

    # The per-doc head MUST see every (doc_id, token) row of a document
    # at once: Ray's dynamic block splitting (target ~128 MB) can split
    # a task's output mid-doc, and broadcast_join's per-block batches
    # inherit those splits — a plain map_batches head would then emit up
    # to 2k rows per split doc with wrong ranks.  Route it through a
    # hash-partitioned group map on doc_id (same pattern as
    # similarity.multi_query_topk's per-query head).
    from neo4j_document_pipeline_ray.stages.grouped import (
        partitioned_group_map,
    )

    return partitioned_group_map(
        joined, "doc_id", topk, batch_format="pyarrow")


def salient_terms_sql(k: int = 3) -> str:
    return rf"""
WITH d AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS l
    FROM documents
), toks AS (
    SELECT doc_id, unnest(l) AS token FROM d WHERE len(l) > 0
), toks2 AS (
    SELECT doc_id, token FROM toks WHERE token <> ''
), tf AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM toks2 GROUP BY 1, 2
), dlen AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
    FROM toks2 GROUP BY 1
), dfreq AS (
    SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nn AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), s AS (
    SELECT tf.doc_id, tf.token, tf.tf,
           CAST((tf.tf * (SELECT n FROM nn) * 1000000)
                // (dlen.n_toks * dfreq.df) AS BIGINT) AS salience_scaled
    FROM tf
    JOIN dlen ON dlen.doc_id = tf.doc_id
    JOIN dfreq ON dfreq.token = tf.token
)
SELECT doc_id, token, tf, salience_scaled FROM (
    SELECT s.*,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY salience_scaled DESC, token) AS rn
    FROM s
) WHERE rn <= {k}
"""


# --- composed curation filter (C4/Gopher-style) -----------------------------

# documented integer thresholds (scaled by REP_SCALE where fractional)
FILTER_MIN_WORDS = 5
FILTER_MAX_WORDS = 100_000
FILTER_MIN_MEAN_WORD = 2     # integer mean word length bounds
FILTER_MAX_MEAN_WORD = 12
FILTER_MAX_DUP_LINE = 300_000    # 30% duplicate lines
FILTER_MAX_TOP2GRAM = 200_000    # 20% top-2-gram coverage
FILTER_MAX_PUNCT = 300_000       # 30% punctuation chars


def filter_batch(t: pa.Table) -> pa.Table:
    """Composed keep/drop verdict per document (first failing rule is
    the reason), the C4/Gopher-style curation gate (Raffel et al. 2020;
    Rae et al. 2021).  All signals are the engine's own batch-local
    kernels — the stage fuses into the read, no exchange."""
    n = t.num_rows
    text = t["text"]
    rep = repetition_batch(t)
    n_words = pc.cast(
        pc.count_substring_regex(text, r"\S+"), pa.int64()).to_numpy(
            zero_copy_only=False)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
        zero_copy_only=False)
    n_space = pc.cast(
        pc.count_substring_regex(text, r"\s"), pa.int64()).to_numpy(
            zero_copy_only=False)
    n_punct = pc.cast(
        pc.count_substring_regex(text, r"[^A-Za-z0-9\s]"),
        pa.int64()).to_numpy(zero_copy_only=False)
    low = pc.utf8_lower(text)
    stops = pc.add(
        pc.count_substring_regex(low, _EN_STOPS),
        pc.count_substring_regex(low, _MS_STOPS),
    ).to_numpy(zero_copy_only=False)

    mean_wc = (n_chars - n_space) // np.maximum(n_words, 1)
    dup_line = rep["dup_line_frac_scaled"].to_numpy()
    top2 = rep["top_2gram_frac_scaled"].to_numpy()

    conds = [
        (n_words < FILTER_MIN_WORDS) | (n_words > FILTER_MAX_WORDS),
        (mean_wc < FILTER_MIN_MEAN_WORD) | (mean_wc > FILTER_MAX_MEAN_WORD),
        dup_line > FILTER_MAX_DUP_LINE,
        top2 > FILTER_MAX_TOP2GRAM,
        stops == 0,
        n_punct * REP_SCALE > FILTER_MAX_PUNCT * n_chars,
    ]
    names = ["word_count", "mean_word_length", "dup_lines", "top_2gram",
             "no_stopwords", "punctuation"]
    reason = np.select(conds, names, default="")
    return pa.table({
        "doc_id": t["doc_id"],
        "keep": pa.array(reason == "", pa.bool_()),
        "reason": pa.array(reason, pa.string()),
    })


def curation_filter(sf_dir: str) -> "ray.data.Dataset":
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(filter_batch, batch_format="pyarrow")


CURATION_FILTER_SQL = rf"""
WITH rep AS ({REPETITION_SQL}
), q AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+'))
                END AS BIGINT) AS n_words,
           CAST(length(text) - length(regexp_replace(text, '\s', '', 'g'))
                AS BIGINT) AS n_space,
           CAST(length(text) -
                length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
                AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(lower(text), '{_EN_STOPS}'))
                + len(regexp_extract_all(lower(text), '{_MS_STOPS}'))
                AS BIGINT) AS stops
    FROM documents
), s AS (
    SELECT q.doc_id,
           CASE WHEN q.n_words < {FILTER_MIN_WORDS}
                     OR q.n_words > {FILTER_MAX_WORDS} THEN 'word_count'
                WHEN (q.n_chars - q.n_space) // greatest(q.n_words, 1)
                         < {FILTER_MIN_MEAN_WORD}
                     OR (q.n_chars - q.n_space) // greatest(q.n_words, 1)
                         > {FILTER_MAX_MEAN_WORD} THEN 'mean_word_length'
                WHEN rep.dup_line_frac_scaled > {FILTER_MAX_DUP_LINE}
                    THEN 'dup_lines'
                WHEN rep.top_2gram_frac_scaled > {FILTER_MAX_TOP2GRAM}
                    THEN 'top_2gram'
                WHEN q.stops = 0 THEN 'no_stopwords'
                WHEN q.n_punct * {REP_SCALE} > {FILTER_MAX_PUNCT} * q.n_chars
                    THEN 'punctuation'
                ELSE '' END AS reason
    FROM q JOIN rep ON rep.doc_id = q.doc_id
)
SELECT doc_id, reason = '' AS keep, reason FROM s
"""


# --- KMV distinct-count sketch ---------------------------------------------

_KMV_SPACE = 1 << 61  # hash space after the 61-bit mask (fits int64)


def distinct_tokens_kmv(sf_dir: str, k: int = 8):
    """Estimate the corpus' distinct-token count with a K-Minimum-Values
    sketch (Bar-Yossef et al. 2002): keep the k smallest DISTINCT token
    hashes; the estimator is ``(k-1) * SPACE / kth_smallest``.

    The 100-TB shape: each batch contributes its own k smallest distinct
    hashes (a few hundred bytes), so the exchange is O(k x n_batches)
    regardless of corpus size — the union of per-batch k-minima provably
    contains the global k minima, which is the whole trick.  Unlike
    HyperLogLog the estimator is a pure integer function of the data,
    so a DuckDB replay hash-matches it exactly (HLL's register layout
    is implementation-defined; KMV's "k smallest hashes" is not).

    Hashing reuses the fingerprint kernel's FNV-1a word hash masked to
    61 bits (same ASCII caveat as FINGERPRINT_SQL).  Returns ONE row:
    ``kmv_k, kth_hash, est_distinct`` (all int64; estimate is exact
    integer floor division, and falls back to the exact count when the
    corpus has fewer than k distinct tokens).
    """
    if k < 2:
        raise ValueError("KMV needs k >= 2")
    ds = _read_documents(sf_dir, ["text"])

    def partial_kmin(t: pa.Table) -> pa.Table:
        hs, _ = _word_hashes_texts(t["text"].to_pylist())
        flat = np.unique(hs & _FP_MOD_MASK)
        return pa.table({"h": pa.array(flat[:k].astype(np.int64), pa.int64())})

    parts = ds.map_batches(partial_kmin, batch_format="pyarrow").take_all()
    union = np.unique(np.array([r["h"] for r in parts], dtype=np.int64))
    kmin = union[:k]
    if len(kmin) == 0:
        kth, est = 0, 0
    elif len(kmin) < k:
        kth, est = int(kmin[-1]), len(kmin)  # exact: fewer than k distinct
    else:
        kth = int(kmin[-1])
        est = ((k - 1) * _KMV_SPACE) // kth
    return pa.table({
        "kmv_k": pa.array([k], pa.int64()),
        "kth_hash": pa.array([kth], pa.int64()),
        "est_distinct": pa.array([est], pa.int64()),
    })


def distinct_tokens_kmv_sql(k: int = 8) -> str:
    """DuckDB mirror of :func:`distinct_tokens_kmv` — same FNV word
    hashes (HUGEINT wrap emulation as in FINGERPRINT_SQL), 61-bit mask,
    k smallest distinct, integer-exact estimator."""
    m64 = 1 << 64
    return f"""
    WITH d AS (
        SELECT CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS words
        FROM documents
    ), h AS (
        SELECT list_transform(words, w ->
                   list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                               i -> CAST(ascii(substr(w, i, 1)) AS HUGEINT))),
                       (acc, b) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(b AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211) % {m64}
                   )
               ) AS hs
        FROM d
    ), tok AS (
        SELECT DISTINCT unnest(hs) % {_KMV_SPACE} AS h61 FROM h
    ), ranked AS (
        SELECT h61 FROM tok ORDER BY h61 LIMIT {k}
    )
    SELECT CAST({k} AS BIGINT) AS kmv_k,
           CAST(COALESCE(max(h61), 0) AS BIGINT) AS kth_hash,
           CAST(CASE WHEN count(*) = 0 THEN 0
                     WHEN count(*) < {k} THEN count(*)
                     ELSE (CAST({k - 1} AS HUGEINT) * {_KMV_SPACE})
                          // max(h61)
                END AS BIGINT) AS est_distinct
    FROM ranked
    """


def grouped_distinct_tokens_kmv(
    sf_dir: str, group_col: str = "lang", k: int = 8,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-GROUP KMV distinct-token sketch — the mergeable-sketch-as-
    grouped-aggregate shape (one sketch per language / domain is how a
    curation dashboard tracks vocabulary growth per slice).

    Unlike :func:`distinct_tokens_kmv` (one global sketch, finalized
    driver-side), the finalize here is DISTRIBUTED: per-batch k-minima
    partials keyed by group -> group-hash partitions take the k
    smallest of the union and emit the estimator row — no driver data
    path, safe at millions of groups.  Same integer estimator and FNV
    hash kernel, so the DuckDB replay hash-matches exactly.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import (
        partitioned_group_map,
    )

    if k < 2:
        raise ValueError("KMV needs k >= 2")
    ds = _read_documents(sf_dir, ["text", group_col])

    def partial_kmin(t: pa.Table) -> pa.Table:
        hs, offs = _word_hashes_texts(t["text"].to_pylist())
        doc_of = np.repeat(np.arange(t.num_rows), np.diff(offs))
        gv = t[group_col].to_pandas().iloc[doc_of].to_numpy()
        df = pd.DataFrame({
            group_col: gv,
            "h": (hs & _FP_MOD_MASK).astype(np.int64),
        }).drop_duplicates().sort_values([group_col, "h"])
        head = df.groupby(group_col, sort=False).head(k)
        if head.empty:  # typed empty block (from_pandas would emit null)
            return pa.table({group_col: pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        return pa.Table.from_pandas(head, preserve_index=False)

    def finalize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.drop_duplicates().sort_values([group_col, "h"])
        top = pdf.groupby(group_col, sort=False).head(k)
        agg = top.groupby(group_col, sort=False)["h"].agg(["count", "max"])
        cnt = agg["count"].to_numpy()
        kth = agg["max"].to_numpy()
        est = np.where(cnt < k, cnt,
                       (k - 1) * _KMV_SPACE // np.maximum(kth, 1))
        return pd.DataFrame({
            group_col: agg.index.to_numpy(),
            "kmv_k": np.full(len(agg), k, dtype=np.int64),
            "kth_hash": kth.astype(np.int64),
            "est_distinct": est.astype(np.int64),
        })

    partials = ds.map_batches(partial_kmin, batch_format="pyarrow")
    return partitioned_group_map(partials, group_col, finalize,
                                 num_partitions)


def grouped_distinct_tokens_kmv_sql(group_col: str = "lang",
                                    k: int = 8) -> str:
    """DuckDB mirror of :func:`grouped_distinct_tokens_kmv`."""
    m64 = 1 << 64
    return f"""
    WITH d AS (
        SELECT {group_col},
               CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS words
        FROM documents
    ), h AS (
        SELECT {group_col},
               list_transform(words, w ->
                   list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                               i -> CAST(ascii(substr(w, i, 1)) AS HUGEINT))),
                       (acc, b) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(b AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211) % {m64}
                   )
               ) AS hs
        FROM d
    ), tok AS (
        SELECT DISTINCT {group_col}, unnest(hs) % {_KMV_SPACE} AS h61
        FROM h
    ), ranked AS (
        SELECT {group_col}, h61,
               row_number() OVER (PARTITION BY {group_col}
                                  ORDER BY h61) AS rn
        FROM tok
    )
    SELECT {group_col},
           CAST({k} AS BIGINT) AS kmv_k,
           CAST(max(h61) AS BIGINT) AS kth_hash,
           CAST(CASE WHEN count(*) < {k} THEN count(*)
                     ELSE (CAST({k - 1} AS HUGEINT) * {_KMV_SPACE})
                          // max(h61)
                END AS BIGINT) AS est_distinct
    FROM ranked WHERE rn <= {k}
    GROUP BY {group_col}
    """


DOMAIN_REP_SCALE = 1_000_000


def domain_reputation(sf_dir: str,
                      num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Per-source reputation table — the per-domain quality/dup rollup
    a web-curation pipeline maintains (RefinedWeb blocklists, C4's
    domain filters, CCNet's per-domain stats are all consumers of this
    shape): document count, exact-duplicate count (texts occurring >=2
    times corpus-wide — recrawl/mirror signal), and integer-scaled
    mean quality signals.

    Shape: one streaming pass computes per-doc signals + text md5;
    one md5-keyed aggregate finds duplicated texts; one partition-wise
    join flags rows; one source-keyed aggregate folds everything.  All
    ratios are integer floor divisions so the DuckDB mirror
    hash-matches.
    """
    from neo4j_document_pipeline_ray.stages.grouped import (
        hash_aggregate,
        safe_join,
    )

    ds = _read_documents(sf_dir, ["doc_id", "text", "source"])

    def signals(t: pa.Table) -> pa.Table:
        import hashlib

        q = quality_batch(t)
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest()
              for x in t["text"].to_pylist()]
        return pa.table({
            "source": t["source"],
            "text_hash": pa.array(hs, pa.string()),
            "n_chars": q["n_chars"],
            "n_words": q["n_words"],
            "n_punct": q["n_punct"],
            "n_digit": q["n_digit"],
        })

    base = ds.map_batches(signals, batch_format="pyarrow")
    hcnt = hash_aggregate(base.select_columns(["text_hash"]),
                          "text_hash", [(None, "count", "n_copies")],
                          num_partitions=num_partitions)
    flagged = safe_join(base, hcnt, join_type="inner", on=("text_hash",),
                        num_partitions=num_partitions)

    def mark(t: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater_equal(t["n_copies"], 2), pa.int64())
        return pa.table({
            "source": t["source"], "n_chars": t["n_chars"],
            "n_words": t["n_words"], "n_punct": t["n_punct"],
            "n_digit": t["n_digit"], "dup": dup,
        })

    agg = hash_aggregate(
        flagged.map_batches(mark, batch_format="pyarrow"), "source", [
            (None, "count", "n_docs"),
            ("dup", "sum", "n_dup_docs"),
            ("n_chars", "sum", "sc"),
            ("n_words", "sum", "sw"),
            ("n_punct", "sum", "sp"),
            ("n_digit", "sum", "sd"),
        ], num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False)
        sc = np.maximum(t["sc"].to_numpy(zero_copy_only=False), 1)
        return pa.table({
            "source": t["source"],
            "n_docs": t["n_docs"],
            "n_dup_docs": t["n_dup_docs"],
            "mean_words_scaled": pa.array(
                t["sw"].to_numpy(zero_copy_only=False)
                * DOMAIN_REP_SCALE // n, pa.int64()),
            "punct_per_char_scaled": pa.array(
                t["sp"].to_numpy(zero_copy_only=False)
                * DOMAIN_REP_SCALE // sc, pa.int64()),
            "digit_per_char_scaled": pa.array(
                t["sd"].to_numpy(zero_copy_only=False)
                * DOMAIN_REP_SCALE // sc, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


DOMAIN_REP_SQL = f"""
WITH q AS (
    SELECT source,
           count(*) OVER (PARTITION BY md5(text)) AS n_copies,
           length(text) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
           END AS n_words,
           length(text) - length(regexp_replace(text,
               '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
           length(text) - length(regexp_replace(text,
               '[0-9]', '', 'g')) AS n_digit
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       CAST(sum(n_words) * {DOMAIN_REP_SCALE} // count(*) AS BIGINT)
           AS mean_words_scaled,
       CAST(sum(n_punct) * {DOMAIN_REP_SCALE}
            // greatest(sum(n_chars), 1) AS BIGINT)
           AS punct_per_char_scaled,
       CAST(sum(n_digit) * {DOMAIN_REP_SCALE}
            // greatest(sum(n_chars), 1) AS BIGINT)
           AS digit_per_char_scaled
FROM q GROUP BY source
"""


# --- corpus-LM document scoring (unigram log-probability) -------------------

def unigram_logprob(sf_dir: str) -> "ray.data.Dataset":
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the classic cheap "does this doc look like the
    corpus" quality score (a KenLM stand-in that needs no model
    artifact).  ``avg_logprob = mean over token instances of
    ln(count(token) / total_tokens)``.

    Distributed shape: pass 1 is the :func:`top_tokens` two-phase hash
    aggregate (the exchange carries per-batch vocabularies, not
    tokens); the merged vocabulary is ``ray.put`` ONCE and pass 2 is a
    zero-exchange ``map_batches`` — a doc is one input row, so its
    whole score is computed locally with a hash-indexer lookup + one
    ``np.bincount``.  Scale assumption (documented per the engine's
    broadcast rule): the vocabulary must fit in a worker heap — at
    open-web scale pre-prune with a min-df cut the way the salience
    operator's docstring prescribes; the score of a pruned token is
    then a smoothed floor, which this exact-parity version deliberately
    omits.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    vocab = hash_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        "token", [("n", "sum", "n")],
    ).to_pandas()  # small: one row per distinct token
    total = float(vocab["n"].sum())
    vocab_idx = pd.Index(vocab["token"])
    lnp = np.log(vocab["n"].to_numpy(np.float64) / total)

    import ray

    ref = ray.put((vocab_idx, lnp))

    def score(t: pa.Table) -> pa.Table:
        v_idx, v_lnp = ray.get(ref)
        n = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
        words = flat.filter(pa.array(keep)).to_pandas()
        pos = v_idx.get_indexer(words)  # hash lookup, -1 impossible:
        # pass 2 tokenizes identically to pass 1, so every token is in
        # the vocabulary by construction
        sums = np.bincount(idx, weights=v_lnp[pos], minlength=n)
        cnts = np.bincount(idx, minlength=n).astype(np.int64)
        has = cnts > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(has)),
            "n_tokens": pa.array(cnts[has], pa.int64()),
            "avg_logprob": pa.array(sums[has] / cnts[has], pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


UNIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
), t2 AS (
    SELECT doc_id, token FROM toks WHERE token <> ''
), vocab AS (
    SELECT token, count(*) AS c FROM t2 GROUP BY token
), tot AS (
    SELECT CAST(sum(c) AS DOUBLE) AS total FROM vocab
)
SELECT t2.doc_id,
       count(*) AS n_tokens,
       avg(ln(CAST(v.c AS DOUBLE) / tot.total)) AS avg_logprob
FROM t2 JOIN vocab v USING (token), tot
GROUP BY t2.doc_id
"""


# --- CCNet-style quality buckets -------------------------------------------

_FAM_SCALE = 10**6


def familiarity_bucket(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """CCNet-style head/middle/tail corpus bucketing (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — there by KenLM perplexity terciles; here by an
    INTEGER-EXACT familiarity surrogate so the distributed run is
    hash-checkable): ``fam = (sum of corpus-wide counts of the doc's
    tokens) * 1e6 // n_tokens`` — mean token frequency, the monotone
    cheap stand-in for negative perplexity.  Docs are split at the
    EXACT 1/3 and 2/3 ``quantile_disc`` thresholds of ``fam``:
    ``fam > t_2/3`` = head (most familiar), ``> t_1/3`` = middle,
    else tail.

    Scale shape: one vocabulary exchange (the
    :func:`unigram_logprob` template), a zero-exchange integer scoring
    pass, the engine's exact-quantile histogram (cardinality <=
    distinct fam values; at open-web scale swap in a sampled or
    sketched quantile, documented trade), then a zero-exchange
    labeling pass with the two thresholds closed over.  Ties AT a
    threshold all land on the same side in every engine because the
    comparison is integer.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    vocab = hash_aggregate(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "token", [("n", "sum", "n")],
    ).to_pandas()
    vocab_idx = pd.Index(vocab["token"])
    counts = vocab["n"].to_numpy(np.int64)

    import ray

    ref = ray.put((vocab_idx, counts))

    def fam(t: pa.Table) -> pa.Table:
        v_idx, v_n = ray.get(ref)
        n = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
        words = flat.filter(pa.array(keep)).to_pandas()
        pos = v_idx.get_indexer(words)
        sums = np.bincount(idx, weights=v_n[pos].astype(np.float64),
                           minlength=n).astype(np.int64)
        cnts = np.bincount(idx, minlength=n).astype(np.int64)
        has = cnts > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(has)),
            "n_tokens": pa.array(cnts[has], pa.int64()),
            "fam": pa.array(sums[has] * _FAM_SCALE // cnts[has], pa.int64()),
        })

    fam_ds = docs.map_batches(fam, batch_format="pyarrow").materialize()

    def partial_hist(t: pa.Table) -> pa.Table:
        vc = t["fam"].combine_chunks().value_counts()
        return pa.table({
            "v": pc.cast(vc.field("values"), pa.int64()),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    hist = hash_aggregate(
        fam_ds.map_batches(partial_hist, batch_format="pyarrow"),
        "v", [("c", "sum", "c")],
    ).sort("v").take_all()
    vals = np.asarray([r["v"] for r in hist], dtype=np.int64)
    cum = np.cumsum(np.asarray([r["c"] for r in hist], dtype=np.int64))
    n_docs = int(cum[-1]) if len(cum) else 0
    if n_docs == 0:
        return fam_ds.map_batches(
            lambda t: t.append_column("bucket", pa.array([], pa.string())),
            batch_format="pyarrow")
    thresholds = []
    for num, den in ((1, 3), (2, 3)):
        kth = (num * n_docs + den - 1) // den  # ceil(q*n) exactly
        thresholds.append(int(vals[int(np.searchsorted(cum, kth))]))
    t1, t2 = thresholds

    def label(t: pa.Table) -> pa.Table:
        f = t["fam"].to_numpy(zero_copy_only=False)
        b = np.where(f > t2, "head", np.where(f > t1, "middle", "tail"))
        return t.append_column("bucket", pa.array(b, pa.string()))

    return fam_ds.map_batches(label, batch_format="pyarrow")


def docs_ppl_bucket(sf_dir: str) -> "ray.data.Dataset":
    return familiarity_bucket(_read_documents(sf_dir, ["doc_id", "text"]))


PPL_BUCKET_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
), t2 AS (
    SELECT doc_id, token FROM toks WHERE token <> ''
), vocab AS (
    SELECT token, count(*) AS c FROM t2 GROUP BY token
), fam AS (
    SELECT t2.doc_id,
           count(*) AS n_tokens,
           CAST(sum(v.c) AS BIGINT) * {_FAM_SCALE} // count(*) AS fam
    FROM t2 JOIN vocab v USING (token)
    GROUP BY t2.doc_id
), th AS (
    SELECT quantile_disc(fam, 1::DOUBLE/3) AS t1,
           quantile_disc(fam, 2::DOUBLE/3) AS t2
    FROM fam
)
SELECT doc_id, n_tokens, fam,
       CASE WHEN fam > th.t2 THEN 'head'
            WHEN fam > th.t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM fam, th
"""


# --- trained Naive Bayes language classifier --------------------------------

_NB_SCALE = 10**6


def nb_lang_classifier(sf_dir: str) -> "ray.data.Dataset":
    """Train-and-apply multinomial Naive Bayes over the corpus — the
    fastText-style supervised classifier stage every curation pipeline
    runs (CCNet/RefinedWeb use one for language ID and quality): train
    per-class token log-likelihoods from the corpus's own ``lang``
    labels (add-1 smoothing), then score every document against every
    class and emit the argmax.

    Exactness contract: model weights are INTEGER fixed-point
    ``floor(1e6 * ln((c+1)/(total_l+V)))`` — per-doc class scores are
    then exact int64 sums (order-independent under any partitioning),
    and the argmax (ties broken by lang ASC) is hash-checkable against
    a DuckDB replay.  A float-log model would make near-tie argmaxes
    partitioning-dependent.

    Distributed shape: pass 1 is ONE (lang, token)-keyed two-phase
    hash aggregate (per-batch vocabularies ride the exchange, not
    token instances); the model — one int64 row per (lang, token) plus
    per-lang priors/defaults — is ``ray.put`` ONCE; pass 2 is a
    zero-exchange ``map_batches``: per batch, per class, one hash-index
    lookup + one ``np.bincount`` segment sum (integer-valued float64
    addends stay exact below 2^53).  Scale assumption: the model must
    fit a worker heap — at open-web vocabulary sizes pre-prune with a
    min-df cut (same prescription as :func:`unigram_logprob`); classes
    are O(100) at most.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).combine_chunks()
        keep = pc.not_equal(flat, "")
        langs = pa.array(
            np.repeat(t["lang"].to_numpy(zero_copy_only=False), lens)
        ).filter(keep)
        sub = pa.table({"lang": langs, "token": flat.filter(keep)})
        # in-batch partial: collapse to (lang, token, n) before the exchange
        g = sub.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "n"])

    model = hash_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        ["lang", "token"], [("n", "sum", "n")],
    ).to_pandas()  # small: one row per (class, distinct token)

    # per-class doc counts for the prior (exact, from the label column)
    prior_counts = hash_aggregate(
        ds.map_batches(
            lambda t: t.select(["lang"]), batch_format="pyarrow"),
        "lang", [(None, "count", "n_docs")],
    ).to_pandas()

    v = model["token"].nunique()  # shared add-1 vocabulary size
    n_total = int(prior_counts["n_docs"].sum())
    langs = sorted(prior_counts["lang"])
    totals = model.groupby("lang")["n"].sum()

    per_lang = {}
    for lang in langs:
        sub = model[model["lang"] == lang]
        denom = float(int(totals.get(lang, 0)) + v)
        llk = np.floor(
            _NB_SCALE * np.log((sub["n"].to_numpy(np.float64) + 1.0) / denom)
        ).astype(np.int64)
        default = np.int64(np.floor(_NB_SCALE * np.log(1.0 / denom)))
        n_docs = int(prior_counts.loc[
            prior_counts["lang"] == lang, "n_docs"].iloc[0])
        prior = np.int64(np.floor(_NB_SCALE * np.log(n_docs / n_total)))
        per_lang[lang] = (pd.Index(sub["token"]), llk, default, prior)

    import ray

    ref = ray.put((langs, per_lang))

    def score(t: pa.Table) -> pa.Table:
        lang_list, mdl = ray.get(ref)
        n = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
        words = flat.filter(pa.array(keep)).to_pandas()
        cnts = np.bincount(idx, minlength=n).astype(np.int64)

        best = np.full(n, -(1 << 62), dtype=np.int64)
        best_lang = np.zeros(n, dtype=np.int64)
        for li, lang in enumerate(lang_list):
            v_idx, v_llk, dflt, prior = mdl[lang]
            pos = v_idx.get_indexer(words)
            w = np.where(pos >= 0, v_llk[np.maximum(pos, 0)], dflt)
            # integer-valued addends: float64 bincount sums stay exact
            s = np.bincount(idx, weights=w.astype(np.float64),
                            minlength=n).astype(np.int64) + prior
            better = s > best  # lang ASC order => strict > keeps first
            best = np.where(better, s, best)
            best_lang = np.where(better, li, best_lang)

        has = cnts > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(has)),
            "pred_lang": pa.array(
                [lang_list[i] for i in best_lang[has]], pa.string()),
            "score_scaled": pa.array(best[has], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


NB_LANG_SQL = r"""
WITH toks AS (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
), t2 AS (
    SELECT doc_id, lang, token FROM toks WHERE token <> ''
), ct AS (
    SELECT lang, token, CAST(count(*) AS BIGINT) AS c
    FROM t2 GROUP BY 1, 2
), ctot AS (
    SELECT lang, sum(c) AS total FROM ct GROUP BY 1
), vocab AS (
    SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM t2
), cls AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
), tot AS (
    SELECT CAST(sum(n_docs) AS DOUBLE) AS n FROM cls
), dt AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM t2 GROUP BY 1, 2
), scores AS (
    SELECT dt.doc_id, cls.lang,
           CAST(CAST(floor(1000000 * ln(cls.n_docs / tot.n)) AS BIGINT)
           + sum(dt.tf * CAST(floor(1000000 * ln(
                 (coalesce(ct.c, 0) + 1.0)
                 / (ctot.total + vocab.v))) AS BIGINT)) AS BIGINT) AS s
    FROM dt
    CROSS JOIN cls
    JOIN ctot ON ctot.lang = cls.lang
    LEFT JOIN ct ON ct.lang = cls.lang AND ct.token = dt.token
    CROSS JOIN vocab
    CROSS JOIN tot
    GROUP BY dt.doc_id, cls.lang, cls.n_docs, tot.n
)
SELECT doc_id, lang AS pred_lang, s AS score_scaled
FROM (
    SELECT doc_id, lang, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, lang) AS rn
    FROM scores
)
WHERE rn = 1
"""
