"""BPE pair-frequency counting — the inner loop of tokenizer training.

Byte-pair-encoding vocabulary induction (Sennrich et al. 2016; GPT-2's
byte-level variant) repeatedly counts the most frequent ADJACENT
symbol pair over the corpus and merges it.  The count step is the
distributed part — at 100 TB it is a classic two-phase aggregate whose
exchange carries (pair, count) partials (at byte level at most 65,536
keys per batch, so the shuffle is trivially small regardless of corpus
size).  This module implements iteration-0 exactly: adjacent BYTE
pairs within whitespace words (no cross-word pairs — the word-boundary
convention of the original BPE), fully vectorized:

  one ``' '.join`` buffer per batch -> ``buf[:-1] * 256 + buf[1:]``
  with the space positions masked -> one ``np.bincount`` -> the
  per-batch partial is at most 64Ki rows.

Tokenization convention matches :func:`textstats.top_tokens`
(lowercase, whitespace split).  The DuckDB mirror counts CHARACTER
pairs — identical for ASCII corpora (the documents table is ASCII;
same caveat as FINGERPRINT_SQL).  Later merge iterations re-run the
same count with a pair-merged symbol stream; the count kernel is the
reusable piece.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.extras.textstats import _read_documents
from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate


def pair_counts_batch(t: pa.Table) -> pa.Table:
    """Per-batch (pair, n) partials over adjacent within-word byte
    pairs.  The join buffer uses ``0x20`` as the separator — words
    contain no whitespace, so masking space positions removes exactly
    the cross-word pairs."""
    words = [w for s in t["text"].to_pylist()
             for w in (s or "").lower().split()]
    if not words:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    buf = np.frombuffer(" ".join(words).encode("utf-8"), dtype=np.uint8)
    if len(buf) < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    a, b = buf[:-1], buf[1:]
    mask = (a != 0x20) & (b != 0x20)
    codes = a[mask].astype(np.int64) * 256 + b[mask]
    cnt = np.bincount(codes, minlength=65536)
    nz = np.flatnonzero(cnt)
    pairs = [bytes([c >> 8, c & 255]).decode("latin-1") for c in nz]
    return pa.table({
        "pair": pa.array(pairs, pa.string()),
        "n": pa.array(cnt[nz], pa.int64()),
    })


def bpe_top_pairs(docs: "ray.data.Dataset", k: int = 50,
                  num_partitions: int = 4) -> "ray.data.Dataset":
    agg = hash_aggregate(
        docs.select_columns(["text"]).map_batches(
            pair_counts_batch, batch_format="pyarrow"),
        "pair", [("n", "sum", "n")], num_partitions=num_partitions)
    return agg.sort(["n", "pair"], descending=[True, False]).limit(k)


def docs_bpe_pairs(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    return bpe_top_pairs(_read_documents(sf_dir, ["text"]), k=k)


def bpe_pairs_sql(k: int = 50) -> str:
    return f"""
    WITH w AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), p AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     j -> substr(w, j, 2))) AS pair
        FROM w WHERE length(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {k}
    """


BPE_PAIRS_SQL = bpe_pairs_sql()
