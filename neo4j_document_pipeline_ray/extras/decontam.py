"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM §B,
The Pile §6.3 all describe variants): before training, every document
that contains an n-gram from an evaluation benchmark is flagged (and
usually dropped) so the benchmark stays out-of-distribution.  At
100 TB the only workable shape is

  1. hash every benchmark n-gram ONCE into a flat set (benchmarks are
     small — MMLU + BIG-bench together are a few million grams, tens
     of MB as a uint64 array),
  2. broadcast that array via ``ray.put`` (one object-store copy per
     node, zero-copy ``ray.get`` in every task), and
  3. stream the corpus through one ``map_batches`` pass that probes
     each document's gram hashes against the sorted set with
     ``np.searchsorted`` — no shuffle, no join, no second corpus scan.

Gram hashing reuses the fingerprint kernel (FNV-1a word hashes →
window-``_WINDOW`` polynomial rolling hash masked to 61 bits,
``textstats._word_hashes`` / ``textstats.fingerprint_batch``), which
already has an exact DuckDB mirror — so the whole operator is
hash-checkable end to end.

The "benchmark" here is carved deterministically out of the corpus
itself (``doc_id % benchmark_mod == 0``) because the sandbox allows no
external data; a real deployment passes any Dataset of benchmark text
to :func:`benchmark_gram_set`.  Documents shorter than the window
produce no grams and can never be flagged — same convention as the
published recipes (a 3-word doc cannot contain a 5-gram).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from neo4j_document_pipeline_ray.extras.textstats import (
    _FP_BASE,
    _WINDOW,
    _flat_gram_hashes,
    _read_documents,
    _word_hashes_texts,
)

# A benchmark gram set bigger than this is a sign the "benchmark" is
# actually a corpus; the broadcast-array design assumes a small side.
MAX_BENCHMARK_GRAMS = 50_000_000  # 400 MB as uint64 — still broadcastable


def gram_hashes(text: str) -> np.ndarray:
    """61-bit rolling-polynomial hashes of the word ``_WINDOW``-grams of
    ``text`` — the same grams :func:`textstats.fingerprint_batch` takes
    its winnowing minimum over (cited mirror: FINGERPRINT_SQL)."""
    grams, _ = _flat_gram_hashes(*_word_hashes_texts([text]))
    return grams


def benchmark_gram_set(bench: "ray.data.Dataset") -> "ray.ObjectRef":
    """Distinct gram hashes of a (small) benchmark Dataset with a
    ``text`` column, as a sorted uint64 array in the object store.

    Per-batch partial distinct keeps the driver pull tiny; the final
    global ``np.unique`` runs on the concatenated partials (benchmark
    side only — the corpus never flows through here).
    """

    def partial(t: pa.Table) -> pa.Table:
        grams, _ = _flat_gram_hashes(
            *_word_hashes_texts(t["text"].to_pylist()))
        flat = np.unique(grams)
        return pa.table({"gram": pa.array(flat.astype(np.int64), pa.int64())})

    parts = bench.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow").take_all()
    grams = np.unique(np.array([r["gram"] for r in parts], dtype=np.uint64))
    if len(grams) > MAX_BENCHMARK_GRAMS:
        raise ValueError(
            f"benchmark gram set has {len(grams)} grams "
            f"(> {MAX_BENCHMARK_GRAMS}); this operator broadcasts the "
            "benchmark side — a set this large should be restructured "
            "as a hash-partitioned anti-join instead")
    return ray.put(grams)  # sorted by np.unique


def decontaminate(
    docs: "ray.data.Dataset", gram_ref: "ray.ObjectRef"
) -> "ray.data.Dataset":
    """Per document: how many of its gram positions hit the benchmark
    set, and the resulting flag.  One streaming pass; the probe is
    ``np.searchsorted`` against the broadcast sorted array."""

    def probe(t: pa.Table) -> pa.Table:
        bench = ray.get(gram_ref)  # zero-copy from local object store
        hits = np.zeros(t.num_rows, dtype=np.int64)
        grams, gdoc = _flat_gram_hashes(
            *_word_hashes_texts(t["text"].to_pylist()))
        if len(grams) and len(bench):
            pos = np.searchsorted(bench, grams)
            pos[pos == len(bench)] = len(bench) - 1
            hit = bench[pos] == grams
            hits += np.bincount(gdoc[hit], minlength=t.num_rows)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_gram_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow")


def docs_decontaminate(
    sf_dir: str, benchmark_mod: int = 97
) -> "ray.data.Dataset":
    """Flag every non-benchmark document of the ``documents`` table
    against the held-out benchmark slice ``doc_id % benchmark_mod == 0``."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def _mod(t: pa.Table) -> "pa.ChunkedArray":
        # arrow has no modulo kernel; a - (a // m) * m (ids are >= 0)
        return pc.subtract(
            t["doc_id"],
            pc.multiply(pc.divide(t["doc_id"], benchmark_mod), benchmark_mod),
        )

    def is_bench(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(_mod(t), 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    ref = benchmark_gram_set(bench)

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(_mod(t), 0))

    corpus = docs.map_batches(not_bench, batch_format="pyarrow")
    return decontaminate(corpus, ref)


def docs_decontaminate_sql(benchmark_mod: int = 97) -> str:
    """DuckDB mirror: the gram CTE is the FINGERPRINT_SQL pipeline up to
    the gram list (FNV-1a per word with HUGEINT wrap emulation, window
    polynomial, 61-bit mask), then unnest + semi-join against the
    benchmark slice's distinct grams."""
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
        SELECT doc_id,
               CASE WHEN len(hs) >= {_WINDOW} THEN
                   list_transform(range(1, len(hs) - {_WINDOW - 2}),
                       j -> (({gram}) % {m64}) % {m61})
               ELSE CAST([] AS HUGEINT[]) END AS grams
        FROM h
    ), bg AS (
        SELECT DISTINCT unnest(grams) AS gram
        FROM g WHERE doc_id % {benchmark_mod} = 0
    ), dg AS (
        SELECT doc_id, unnest(grams) AS gram
        FROM g WHERE doc_id % {benchmark_mod} <> 0
    ), hits AS (
        SELECT dg.doc_id, count(*) AS n
        FROM dg JOIN bg USING (gram)
        GROUP BY dg.doc_id
    )
    SELECT g.doc_id,
           CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_gram_hits,
           CAST(CASE WHEN COALESCE(hits.n, 0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS contaminated
    FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
    WHERE g.doc_id % {benchmark_mod} <> 0
    """
