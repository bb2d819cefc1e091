"""Cross-document duplicated n-gram analysis — the ExactSubstr signal.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") remove exact substrings that occur in more than one training
document, found with a suffix array; RefinedWeb / MassiveText report
the per-document *duplicated n-gram fraction* as a curation feature.
A distributed suffix array over 100 TB is its own project; this
operator computes the same decision signal at word-gram granularity:

  * ``n_dup_grams``    — gram positions whose window-``_WINDOW`` gram
    occurs in >= 2 DISTINCT documents (within-doc repetition alone
    does not count — that is :func:`textstats.repetition_stats`'
    Gopher signal),
  * ``dup_rate_scaled`` — ``n_dup_grams * 10^6 // n_grams`` (integer,
    so the DuckDB oracle hash-matches bit for bit),
  * ``max_dup_run``    — the longest run of CONSECUTIVE duplicated
    gram positions, i.e. the length (in grams) of the longest shared
    substring span, the quantity ExactSubstr thresholds on (>= 50
    tokens in the paper).

Scale shape (no driver-side data path, no broadcast of corpus-sized
state):

  1. one streaming pass emits position-level rows
     ``(gram, doc_id, pos)`` — the corpus leaves storage once;
  2. gram-hash partitions compute each gram's document frequency and
     flag positions (every row of a gram is in one partition, so the
     distinct-doc count is exact);
  3. doc-hash partitions fold flags into the per-doc rate and the
     longest run (every row of a doc is in one partition, so runs
     never split — the completeness guarantee plain ``map_batches``
     does NOT give, cf. the salient_terms ADVICE fix).

The exchange volume is ~2 rows per corpus token — the inherent cost
of a position-level signal (ExactSubstr's suffix array is likewise
token-sized).  Rate-only callers could collapse positions to
``(gram, doc, n_pos)`` partials, but the run signal needs positions.

Gram hashing reuses the fingerprint kernel (FNV-1a word hashes ->
window-5 polynomial masked to 61 bits, ``textstats._word_hashes_texts``
/ ``_flat_gram_hashes``), which already has an exact DuckDB mirror.
Documents shorter than the window produce no grams and are absent
from the output on both sides (a 3-word doc contains no 5-gram).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.extras.textstats import (
    _FP_BASE,
    _WINDOW,
    _flat_gram_hashes,
    _read_documents,
    _word_hashes_texts,
)
from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

DUP_RATE_SCALE = 1_000_000


def gram_position_rows(t: pa.Table) -> pa.Table:
    """Batch -> one row per gram position: ``(gram, doc_id, pos)``
    with ``pos`` the 0-based gram index within its document."""
    hs, offs = _word_hashes_texts(t["text"].to_pylist())
    grams, gdoc = _flat_gram_hashes(hs, offs)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[gdoc]
    # grams of one doc are emitted contiguously in order; position =
    # global index minus the doc's first global index
    n = len(grams)
    pos = np.arange(n, dtype=np.int64)
    if n:
        seg_start = np.zeros(n, dtype=np.int64)
        new_doc = np.flatnonzero(np.diff(gdoc) != 0) + 1
        seg_start[new_doc] = pos[new_doc]
        np.maximum.accumulate(seg_start, out=seg_start)
        pos = pos - seg_start
    return pa.table({
        "gram": pa.array(grams.astype(np.int64), pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def _flag_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Within a gram-hash partition: document frequency per gram,
    flag = occurs in >= 2 distinct docs."""
    dfreq = df.groupby("gram")["doc_id"].transform("nunique")
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "pos": df["pos"],
        "dup": (dfreq >= 2).to_numpy(),
    })


def _doc_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Within a doc-hash partition: per-doc totals, integer rate, and
    the longest consecutive dup run — all numpy, no per-doc loop."""
    df = df.sort_values(["doc_id", "pos"], kind="mergesort")
    doc = df["doc_id"].to_numpy()
    dup = df["dup"].to_numpy(dtype=bool)
    n = len(doc)
    if n == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_grams": pd.Series([], dtype="int64"),
            "n_dup_grams": pd.Series([], dtype="int64"),
            "dup_rate_scaled": pd.Series([], dtype="int64"),
            "max_dup_run": pd.Series([], dtype="int64"),
        })
    new_doc = np.empty(n, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc[1:] != doc[:-1]
    code = np.cumsum(new_doc) - 1  # dense doc index, sorted order
    ndocs = int(code[-1]) + 1
    n_grams = np.bincount(code, minlength=ndocs)
    n_dup = np.bincount(code, weights=dup, minlength=ndocs).astype(np.int64)
    # runs: a new run starts at a doc boundary or a dup-flag change
    new_run = new_doc.copy()
    new_run[1:] |= dup[1:] != dup[:-1]
    starts = np.flatnonzero(new_run)
    lengths = np.diff(np.append(starts, n))
    is_dup_run = dup[starts]
    max_run = np.zeros(ndocs, dtype=np.int64)
    np.maximum.at(max_run, code[starts[is_dup_run]], lengths[is_dup_run])
    return pd.DataFrame({
        "doc_id": doc[new_doc],
        "n_grams": n_grams.astype(np.int64),
        "n_dup_grams": n_dup,
        "dup_rate_scaled": n_dup * DUP_RATE_SCALE // n_grams,
        "max_dup_run": max_run,
    })


def dup_ngram_stats(
    docs: "ray.data.Dataset", num_partitions: "int | None" = None
) -> "ray.data.Dataset":
    """Per-document duplicated-gram stats over a Dataset with
    ``doc_id`` + ``text`` columns.  See module docstring for shape."""
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        gram_position_rows, batch_format="pyarrow")
    flagged = partitioned_group_map(rows, "gram", _flag_partition,
                                    num_partitions=num_partitions)
    return partitioned_group_map(flagged, "doc_id", _doc_partition,
                                 num_partitions=num_partitions)


def docs_dup_ngrams(sf_dir: str) -> "ray.data.Dataset":
    return dup_ngram_stats(_read_documents(sf_dir, ["doc_id", "text"]))


def dup_ngram_reference(rows) -> dict:
    """Pure-Python replay (test oracle): ``[(doc_id, text)]`` ->
    ``{doc_id: (n_grams, n_dup_grams, rate_scaled, max_run)}``."""
    from neo4j_document_pipeline_ray.extras.textstats import _word_hashes

    per_doc: dict = {}
    for doc_id, text in rows:
        hs = _word_hashes(text)
        grams = []
        for i in range(len(hs) - _WINDOW + 1):
            g = 0
            for j in range(_WINDOW):
                g = (g + int(hs[i + j])
                     * pow(int(_FP_BASE), _WINDOW - 1 - j, 1 << 61)) % (1 << 64)
            grams.append(g & ((1 << 61) - 1))
        if grams:
            per_doc[doc_id] = grams
    dfreq: dict = {}
    for doc_id, grams in per_doc.items():
        for g in set(grams):
            dfreq[g] = dfreq.get(g, 0) + 1
    out = {}
    for doc_id, grams in per_doc.items():
        flags = [dfreq[g] >= 2 for g in grams]
        n_dup = sum(flags)
        best = cur = 0
        for f in flags:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        out[doc_id] = (len(grams), n_dup,
                       n_dup * DUP_RATE_SCALE // len(grams), best)
    return out


def dup_ngram_sql() -> str:
    """DuckDB mirror: the FINGERPRINT_SQL gram CTE, zipped unnest for
    positions, df per gram, then the per-doc aggregate with a
    gaps-and-islands longest-run (``pos - row_number()`` is constant
    within a consecutive run of equal ``dup``)."""
    m64 = 1 << 64
    m61 = 1 << 61
    weights = [pow(int(_FP_BASE), _WINDOW - 1 - i, m61)
               for i in range(_WINDOW)]
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
        SELECT doc_id,
               CASE WHEN len(hs) >= {_WINDOW} THEN
                   list_transform(range(1, len(hs) - {_WINDOW - 2}),
                       j -> (({gram}) % {m64}) % {m61})
               ELSE CAST([] AS HUGEINT[]) END AS grams
        FROM h
    ), p AS (
        SELECT doc_id, unnest(grams) AS gram,
               unnest(range(len(grams))) AS pos
        FROM g WHERE len(grams) > 0
    ), dfreq AS (
        SELECT gram, count(DISTINCT doc_id) AS df FROM p GROUP BY gram
    ), fl AS (
        SELECT p.doc_id, p.pos, (f.df >= 2) AS dup
        FROM p JOIN dfreq f USING (gram)
    ), isl AS (
        SELECT doc_id, dup,
               pos - row_number() OVER (
                   PARTITION BY doc_id, dup ORDER BY pos) AS k
        FROM fl
    ), runs AS (
        SELECT doc_id, count(*) AS rl FROM isl WHERE dup GROUP BY doc_id, k
    ), agg AS (
        SELECT doc_id, count(*) AS n_grams,
               sum(CASE WHEN dup THEN 1 ELSE 0 END) AS n_dup
        FROM fl GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(a.n_grams AS BIGINT) AS n_grams,
           CAST(a.n_dup AS BIGINT) AS n_dup_grams,
           CAST(a.n_dup * {DUP_RATE_SCALE} // a.n_grams AS BIGINT)
               AS dup_rate_scaled,
           CAST(COALESCE(m.rl, 0) AS BIGINT) AS max_dup_run
    FROM agg a LEFT JOIN (
        SELECT doc_id, max(rl) AS rl FROM runs GROUP BY doc_id) m
        USING (doc_id)
    """


DUP_NGRAM_SQL = dup_ngram_sql()
