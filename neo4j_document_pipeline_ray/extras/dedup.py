"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-LSH.

None of these exist in the reference (its only dedup is per-run chunk
caching, ``ingestMD.py:744-752``, and MERGE idempotency); they are the
standard corpus-curation operators a 100 TB training-data pipeline
needs, built on the engine's shuffle primitives:

  exact      hash(text) -> groupby -> keep min doc_id per group
  minhash    shingle -> 64-perm minhash -> banded LSH groupby ->
             candidate pairs -> signature-estimated Jaccard filter ->
             connected components (bounded-round min-label propagation)
  simhash    64-bit sign-sum sketch -> 4x16-bit band buckets ->
             hamming verification
  embedding  random-hyperplane sign buckets -> within-bucket cosine

Scale notes: every stage is map_batches + groupby; candidate
generation emits (bucket, doc) rows so hot buckets are visible and can
be capped; connected components is shuffle-based label propagation with
a bounded round count (no driver-side union-find on the full graph).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from neo4j_document_pipeline_ray.stages.grouped import broadcast_join, safe_join

# --- exact dedup ----------------------------------------------------------


def _text_hash_batch(t: pa.Table) -> pa.Table:
    hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
    return pa.table({
        "doc_id": t["doc_id"],
        "text_hash": pa.array(hs, pa.string()),
    })


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(text_hash, keeper doc_id, group size) — first (=min doc_id) wins.

    Partition-wise Arrow ``group_by`` instead of Ray's sort-based
    ``groupby().aggregate`` (~100 us/row at this data shape)."""
    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    hashed = docs.map_batches(_text_hash_batch, batch_format="pyarrow")

    def fn(t: pa.Table) -> pa.Table:
        agg = t.group_by("text_hash", use_threads=False).aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        return pa.table({
            "text_hash": agg["text_hash"],
            "keep_doc_id": agg["doc_id_min"],
            "n_docs": pc.cast(agg["doc_id_count"], pa.int64()),
        })

    return partitioned_group_map(hashed, "text_hash", fn, 16,
                                 batch_format="pyarrow")


def exact_dedup_sf(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    return exact_dedup(ds)


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_docs
FROM documents
GROUP BY md5(text)
"""


# --- minhash --------------------------------------------------------------

_N_PERM = 64
_N_BANDS = 16          # 16 bands x 4 rows
_ROWS_PER_BAND = _N_PERM // _N_BANDS
_MERSENNE = (1 << 61) - 1

_rng = np.random.default_rng(0xC0FFEE)
_PERM_A = (_rng.integers(1, _MERSENNE, size=_N_PERM, dtype=np.int64)).astype(np.uint64)
_PERM_B = (_rng.integers(0, _MERSENNE, size=_N_PERM, dtype=np.int64)).astype(np.uint64)


_FNV_CACHE: dict = {}


def _fnv64(w: str) -> int:
    # word distributions are Zipfian: a per-process vocab cache removes
    # nearly all of the per-byte Python loop in the sketch hot path
    h = _FNV_CACHE.get(w)
    if h is not None:
        return h
    h = 14695981039346656037
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    if len(_FNV_CACHE) < 1_000_000:  # bounded per worker process
        _FNV_CACHE[w] = h
    return h


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-grams (lowercased) — vectorized polynomial
    combination of per-word FNV hashes (one numpy pass per doc)."""
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    whs = np.array([_fnv64(w) for w in words], dtype=np.uint64)
    kk = min(k, len(whs))
    win = np.lib.stride_tricks.sliding_window_view(whs, kk)
    weights = np.array([pow(1_000_003, kk - 1 - i, 1 << 61) for i in range(kk)],
                       dtype=np.uint64)
    return (win * weights).sum(axis=1, dtype=np.uint64) & np.uint64((1 << 61) - 1)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    hs = _shingle_hashes(text, k)
    if len(hs) == 0:
        return np.zeros(_N_PERM, dtype=np.uint64)
    # (a*x + b) mod p per permutation, min over shingles
    x = hs.astype(np.uint64)[:, None]
    vals = (x * _PERM_A[None, :] + _PERM_B[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def _minhash_batch(t: pa.Table) -> pa.Table:
    ids, sigs = [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ids.append(doc_id)
        sigs.append(minhash_signature(text or "").astype(np.int64).tobytes())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "sig": pa.array(sigs, pa.binary()),
    })


def _bands_batch(t: pa.Table) -> pa.Table:
    doc_ids, buckets = [], []
    for doc_id, sig in zip(t["doc_id"].to_pylist(), t["sig"].to_pylist()):
        s = np.frombuffer(sig, dtype=np.int64)
        for b in range(_N_BANDS):
            chunk = s[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND].tobytes()
            h = hashlib.blake2b(chunk, digest_size=8).hexdigest()
            doc_ids.append(doc_id)
            buckets.append(f"{b}:{h}")
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "bucket": pa.array(buckets, pa.string()),
    })


def _make_pairs_partition(bucket_cap: int):
    """All LSH buckets of one hash partition -> candidate pairs.

    Pathological buckets (boilerplate floods) are capped: all-pairs on
    the first ``bucket_cap`` members, chain the rest to the bucket's
    min doc — keeps connectivity while bounding the O(n^2) blow-up.
    Every capped bucket is LOGGED with its size (no silent cap)."""

    def _pairs_partition(df) -> "pd.DataFrame":
        import logging

        import pandas as pd

        out_a, out_b = [], []
        capped = 0
        multi = df.groupby("bucket", sort=False)["doc_id"]
        for _, ids_s in multi:
            ids = sorted(set(ids_s))
            if len(ids) < 2:
                continue
            if len(ids) > bucket_cap:
                capped += 1
            head = ids[:bucket_cap]
            for i in range(len(head)):
                for j in range(i + 1, len(head)):
                    out_a.append(head[i]); out_b.append(head[j])
            for i in range(bucket_cap, len(ids)):
                out_a.append(ids[0]); out_b.append(ids[i])
        if capped:
            logging.getLogger(__name__).warning(
                "minhash LSH: %d bucket(s) exceeded bucket_cap=%d; "
                "overflow members chained to the bucket head instead of "
                "all-pairs", capped, bucket_cap,
            )
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    return _pairs_partition


_SIG_SCHEMA = pa.schema([("doc_id", pa.int64()), ("sig", pa.binary())])


def minhash_candidate_pairs(
    docs: "ray.data.Dataset",
    bucket_cap: int = 50,
    checkpoint_dir: "str | None" = None,
) -> Tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Returns (signatures, candidate pairs) datasets.

    The signature table is CHECKPOINTED to parquet (the stage-B
    pattern, ``snapshot.py``) rather than pinned in the object store:
    at 10^10 docs the 64-perm int64 signatures are ~5 TB — a
    ``materialize()`` there would spill the whole table; a parquet
    checkpoint streams to disk once and every consumer (banding here,
    the verify-join in :func:`minhash_dedup_pairs`) does its own pruned
    re-read.  The candidate-pair dataset stays fully lazy — no
    materialize, no driver-side emptiness probe.
    """
    import tempfile

    from neo4j_document_pipeline_ray.stages.grouped import (
        distinct_by,
        partitioned_group_map,
    )

    if checkpoint_dir:
        sig_dir = checkpoint_dir
        if os.path.isdir(sig_dir):
            # a reused dir must start empty: write_parquet APPENDS next
            # to leftover files, and the re-read would double-count
            # every stale signature row
            for f in os.listdir(sig_dir):
                if f.endswith(".parquet"):
                    os.unlink(os.path.join(sig_dir, f))
    else:
        sig_dir = tempfile.mkdtemp(prefix="graft_minhash_sigs_")
        # the checkpoint lives as long as the process might re-read it
        # (the returned datasets are lazy); reclaim it at exit instead
        # of leaking one signature tree per invocation
        import atexit
        import shutil

        atexit.register(shutil.rmtree, sig_dir, ignore_errors=True)
    docs.map_batches(_minhash_batch, batch_format="pyarrow").write_parquet(
        sig_dir)
    if not any(f.endswith(".parquet") for f in os.listdir(sig_dir)):
        # empty input wrote no files: seed an empty typed file so the
        # re-read keeps the signature schema
        import pyarrow.parquet as pq

        pq.write_table(_SIG_SCHEMA.empty_table(),
                       os.path.join(sig_dir, "empty.parquet"))
    sigs = ray.data.read_parquet(sig_dir)
    bands = sigs.map_batches(_bands_batch, batch_format="pyarrow")
    pairs = partitioned_group_map(
        bands, "bucket", _make_pairs_partition(bucket_cap), None
    )
    # (a, b) pairs are complete within a's hash partition
    uniq = distinct_by(pairs, "a", subset=["a", "b"], num_partitions=None)
    return sigs, uniq


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def minhash_dedup_pairs(
    docs: "ray.data.Dataset", threshold: float = 0.8, bucket_cap: int = 50
) -> "ray.data.Dataset":
    """Near-duplicate pairs (a < b) with signature-estimated Jaccard >= threshold."""
    sigs, pairs = minhash_candidate_pairs(docs, bucket_cap=bucket_cap)
    # signature lookups: broadcast when the (parquet-checkpointed) sig
    # table fits, hash join otherwise — no emptiness probe (an empty
    # candidate set streams through as empty blocks)
    j = broadcast_join(pairs, sigs, on=("a",), right_on=("doc_id",),
                       num_partitions=None)
    j = j.rename_columns({"sig": "siga"})
    j = broadcast_join(j, sigs, on=("b",), right_on=("doc_id",),
                       num_partitions=None)

    def verify(t: pa.Table) -> pa.Table:
        names = t.schema.names
        sb = "sig" if "sig" in names else "sig_b"
        a, b, est = [], [], []
        for ra, rb, va, vb in zip(t["a"].to_pylist(), t["b"].to_pylist(),
                                  t["siga"].to_pylist(), t[sb].to_pylist()):
            ja = estimate_jaccard(np.frombuffer(va, dtype=np.int64),
                                  np.frombuffer(vb, dtype=np.int64))
            if ja >= threshold:
                a.append(ra); b.append(rb); est.append(ja)
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
        })

    return j.map_batches(verify, batch_format="pyarrow")


# --- connected components (bounded-round min-label propagation) -----------

def connected_components(
    pairs: "ray.data.Dataset", max_rounds: int = 8
) -> "ray.data.Dataset":
    """(node, component) from undirected edge pairs (a, b).

    Bounded-round min-label propagation, expressed entirely as
    union + groupby shuffles (no Dataset.join): each round every node's
    current label is shipped to the reducer of each neighbor alongside
    the neighbor list, and every node adopts the minimum label seen in
    its closed neighborhood.  Message rows are (id, src, lbl) — label
    carriers have src = -1 — and the per-partition merge is a vectorized
    pandas join inside ``partitioned_group_map``.  Near-dup/alias graphs
    cluster tightly so a handful of rounds converges; the loop exits
    early once the label-sum fixpoint is reached.
    """
    import pandas as pd
    import pyarrow as pa

    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    both = pairs.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "peer": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()

    from neo4j_document_pipeline_ray.stages.grouped import min_by_key

    labels = min_by_key(both, "node", num_partitions=None, adaptive=True)
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "label": pc.min_element_wise(t["node"], t["peer"]),
        }),
        batch_format="pyarrow",
    ).materialize()

    edge_msgs = both.map_batches(
        lambda t: pa.table({
            "id": t["peer"],
            "src": t["node"],
            "lbl": pa.array([-1] * t.num_rows, pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["src"] < 0][["id", "lbl"]]
        ed = df[df["src"] >= 0][["id", "src"]]
        m = ed.merge(lab, on="id", how="inner")
        out = pd.concat([
            lab.rename(columns={"id": "node", "lbl": "label"}),
            m.rename(columns={"src": "node", "lbl": "label"})[["node", "label"]],
        ])
        return out

    prev_sig = None
    for _ in range(max_rounds):
        label_msgs = labels.map_batches(
            lambda t: pa.table({
                "id": t["node"],
                "src": pa.array([-1] * t.num_rows, pa.int64()),
                "lbl": t["label"],
            }),
            batch_format="pyarrow",
        )
        # pointer jumping: each node also asks for its label's label, so
        # chains collapse in O(log n) rounds rather than O(n)
        jump_msgs = labels.map_batches(
            lambda t: pa.table({
                "id": t["label"],
                "src": t["node"],
                "lbl": pa.array([-1] * t.num_rows, pa.int64()),
            }),
            batch_format="pyarrow",
        )
        msgs = label_msgs.union(edge_msgs).union(jump_msgs)
        prop = partitioned_group_map(msgs, "id", propagate, None,
                                     adaptive=True)
        labels = min_by_key(prop, "node", num_partitions=None,
                            adaptive=True).materialize()
        sig = labels.map_batches(
            lambda t: pa.table({"s": pa.array([int(pc.sum(t["label"]).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow",
        ).sum("s")
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


# --- simhash --------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash: per-bit sign-sum over the FNV-1a word hashes.

    Uses the same cached FNV-1a 64 word hash as the minhash shingles
    (``_fnv64``) rather than a crypto hash so the DuckDB oracle
    (``SIMHASH_PAIRS_SQL``) can mirror the sketch bit-for-bit with the
    ``list_reduce`` HUGEINT emulation proven by ``FINGERPRINT_SQL``.
    """
    words = text.lower().split()
    if not words:
        return 0
    # vectorized: unpack all word-hash bits in one numpy pass
    hs = np.array([_fnv64(w) for w in words], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << shifts).sum())


def _simhash_batch(t: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": t["doc_id"],
        "simhash": pa.array(
            [np.int64(np.uint64(simhash64(x or ""))) for x in t["text"].to_pylist()],
            pa.int64()),
    })


def simhash_sketch(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_simhash_batch, batch_format="pyarrow")


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _make_simhash_bucket_partition(max_hamming, cap):
    """All band buckets of one hash partition -> hamming-verified pair
    rows (module-level so the cap-logging behavior is unit-testable
    outside a Ray worker)."""

    def bucket_pairs_partition(df):
        import logging

        import pandas as pd

        a, b = [], []
        capped = 0
        for _, g in df.groupby("bucket", sort=False):
            rows = sorted(set(zip(g["doc_id"], g["simhash"])))
            if len(rows) < 2:
                continue
            if cap is not None and len(rows) > cap:
                capped += 1
                rows = rows[:cap]
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    da, ha = rows[i]
                    db, hb = rows[j]
                    if hamming64(int(np.uint64(np.int64(ha))),
                                 int(np.uint64(np.int64(hb)))) <= max_hamming:
                        a.append(da); b.append(db)
        if capped:
            logging.getLogger(__name__).warning(
                "simhash: %d band bucket(s) over max_bucket_docs=%d "
                "truncated to the first %d (doc_id order) — pairs whose "
                "only shared band is a truncated bucket may be missed",
                capped, cap, cap,
            )
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    return bucket_pairs_partition


def simhash_near_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    max_bucket_docs: int | None = None,
) -> "ray.data.Dataset":
    """Candidate via 4x16-bit bands (any identical band), verify hamming.

    The default (``max_bucket_docs=None``) is FULLY EXACT given the
    band recall guarantee (hamming <= 3 over 4 bands => one band equal
    by pigeonhole), matching the DuckDB oracle
    (``SIMHASH_PAIRS_SQL``).  At web scale pass an explicit cap: a band
    bucket holding d docs (near-identical boilerplate) emits O(d^2)
    comparisons, so one hot bucket can dominate the job.  Over-cap
    buckets are truncated AND LOGGED.
    """
    sk = simhash_sketch(docs).materialize()

    def bands(t: pa.Table) -> pa.Table:
        ids, buckets, full = [], [], []
        for doc_id, sh in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            u = int(np.uint64(np.int64(sh)))
            for b in range(4):
                ids.append(doc_id)
                buckets.append(f"{b}:{(u >> (16 * b)) & 0xFFFF}")
                full.append(sh)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(buckets, pa.string()),
            "simhash": pa.array(full, pa.int64()),
        })

    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    pairs = partitioned_group_map(
        sk.map_batches(bands, batch_format="pyarrow"),
        "bucket", _make_simhash_bucket_partition(max_hamming, max_bucket_docs),
        16,
    )
    if pairs.count() == 0:
        return pairs
    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    return distinct_by(pairs, "a", subset=["a", "b"], num_partitions=None)


# Shared DuckDB CTE text: per-doc word list (Python `text.lower()
# .split()` semantics) and FNV-1a 64 hash per word with HUGEINT
# wrap-around emulation — the common front end of the simhash,
# minhash and fingerprint oracles.  Valid for ASCII corpora (Python
# hashes utf-8 bytes, SQL hashes code points).
_FNV_WORD_CTES = f"""d AS (
        SELECT doc_id,
               CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
               END AS words
        FROM documents
    ), wh AS (
        SELECT doc_id,
               list_transform(words, w ->
                   list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                               i -> CAST(ascii(substr(w, i, 1)) AS HUGEINT))),
                       (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(c AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211) % {1 << 64}
                   )
               ) AS hs
        FROM d
    )"""


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """DuckDB mirror of ``simhash_near_pairs``: FNV-1a 64 per word
    (HUGEINT wrap emulation as in ``FINGERPRINT_SQL``), per-bit
    sign-sum sketch, 4x16-bit band candidate join, hamming verify via
    ``bit_count(xor(...))``.  Valid for ASCII corpora (Python hashes
    utf-8 bytes, SQL hashes code points)."""
    return f"""
    WITH {_FNV_WORD_CTES}, wu AS (
        SELECT doc_id, CAST(wordhash AS UBIGINT) AS wordhash
        FROM (SELECT doc_id, unnest(hs) AS wordhash FROM wh)
    ), acc AS (
        SELECT doc_id, bits.b,
               sum(CASE WHEN (wordhash >> CAST(bits.b AS INTEGER)) & 1 = 1
                        THEN 1 ELSE -1 END) AS s
        FROM wu CROSS JOIN range(64) bits(b)
        GROUP BY doc_id, bits.b
    ), sim AS (
        SELECT d.doc_id, coalesce(a.u, CAST(0 AS UBIGINT)) AS u
        FROM d LEFT JOIN (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0
                            THEN CAST(CAST(1 AS UBIGINT)
                                      << CAST(b AS INTEGER) AS HUGEINT)
                            ELSE 0 END) AS UBIGINT) AS u
            FROM acc GROUP BY doc_id
        ) a USING (doc_id)
    ), bands AS (
        SELECT doc_id, u, r.bb,
               (u >> CAST(16 * r.bb AS INTEGER)) & 65535 AS bucket
        FROM sim CROSS JOIN range(4) r(bb)
    ), cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.u AS ua, y.u AS ub
        FROM bands x JOIN bands y
          ON x.bb = y.bb AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT a, b FROM cand WHERE bit_count(xor(ua, ub)) <= {max_hamming}
    """


SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


def _minhash_ctes(threshold: float, bucket_cap: int) -> str:
    """CTE chain mirroring ``minhash_dedup_pairs`` end-to-end in
    DuckDB, terminating in ``mh_pairs (a, b, est_jaccard)``.

    Replays the exact integer arithmetic of the Python/numpy path
    (``_shingle_hashes`` / ``minhash_signature`` / ``_bands_batch`` /
    ``_make_pairs_partition``), including numpy's uint64 wrap-around:
    every product/sum is reduced ``% 2**64`` before the final mask
    (shingles: ``% 2**61`` = the ``& (2**61 - 1)`` mask) or modulus
    (permutations: ``% (2**61 - 1)`` = the Mersenne prime — note the
    two DIFFERENT constants).  The only intended divergence is the
    band bucket key: Python buckets by blake2b of the 4-value band
    bytes, SQL by the 4 values directly — identical grouping short of
    a 2^-64 blake2b collision.  Bucket capping (all-pairs on the
    first ``bucket_cap`` doc_ids, overflow chained to the bucket
    head) is mirrored with window functions."""
    m64 = 1 << 64
    p61 = 1 << 61                 # shingle mask + 1
    mers = _MERSENNE              # permutation modulus (2**61 - 1)
    p1 = 1_000_003
    p2 = p1 * p1
    perm_a = ", ".join(str(int(x)) for x in _PERM_A)
    perm_b = ", ".join(str(int(x)) for x in _PERM_B)
    return f"""{_FNV_WORD_CTES}, shing AS (
        SELECT doc_id,
               CASE
                 WHEN len(hs) = 0 THEN CAST([] AS HUGEINT[])
                 WHEN len(hs) = 1 THEN [hs[1] % {p61}]
                 WHEN len(hs) = 2 THEN
                   [((hs[1] * {p1}) % {m64} + hs[2]) % {m64} % {p61}]
                 ELSE list_transform(range(1, len(hs) - 1), i ->
                   ((hs[i] * {p2}) % {m64}
                    + (hs[i + 1] * {p1}) % {m64}
                    + hs[i + 2]) % {m64} % {p61})
               END AS sh
        FROM wh
    ), su AS (
        SELECT doc_id, unnest(sh) AS h FROM shing
    ), perms AS (
        SELECT r.i AS i,
               (CAST([{perm_a}] AS HUGEINT[]))[r.i + 1] AS pa,
               (CAST([{perm_b}] AS HUGEINT[]))[r.i + 1] AS pb
        FROM range({_N_PERM}) r(i)
    ), minv AS (
        SELECT su.doc_id, p.i,
               min(((su.h * p.pa) % {m64} + p.pb) % {m64} % {mers}) AS v
        FROM su CROSS JOIN perms p
        GROUP BY su.doc_id, p.i
    ), sigs AS (
        SELECT d.doc_id, p.i,
               coalesce(m.v, CAST(0 AS HUGEINT)) AS v
        FROM d CROSS JOIN perms p
        LEFT JOIN minv m ON m.doc_id = d.doc_id AND m.i = p.i
    ), bnd AS (
        SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
               array_to_string(list(v ORDER BY i), ',') AS bkey
        FROM sigs GROUP BY doc_id, i // {_ROWS_PER_BAND}
    ), mem AS (
        SELECT doc_id, band, bkey,
               row_number() OVER (PARTITION BY band, bkey
                                  ORDER BY doc_id) AS rn,
               min(doc_id) OVER (PARTITION BY band, bkey) AS head
        FROM bnd
    ), cand0 AS (
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM mem x JOIN mem y
          ON x.band = y.band AND x.bkey = y.bkey
             AND x.doc_id < y.doc_id
             AND x.rn <= {bucket_cap} AND y.rn <= {bucket_cap}
        UNION ALL
        SELECT head, doc_id FROM mem WHERE rn > {bucket_cap}
    ), cand AS (
        -- explicit DISTINCT stage: inside WITH RECURSIVE DuckDB 1.0
        -- executes a plain UNION in a non-recursive CTE as UNION ALL,
        -- which would multiply the est_jaccard sums below
        SELECT DISTINCT a, b FROM cand0
    ), mh_pairs AS (
        SELECT c.a, c.b,
               sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END)
                   / {float(_N_PERM)} AS est_jaccard
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.a
        JOIN sigs sb ON sb.doc_id = c.b AND sb.i = sa.i
        GROUP BY c.a, c.b
        HAVING sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END)
                   / {float(_N_PERM)} >= {threshold}
    )"""


def _minhash_pairs_sql(threshold: float = 0.8, bucket_cap: int = 50) -> str:
    return ("WITH " + _minhash_ctes(threshold, bucket_cap)
            + "\n    SELECT a, b, est_jaccard FROM mh_pairs")


def _minhash_components_sql(threshold: float = 0.8,
                            bucket_cap: int = 50) -> str:
    """Connected components over the minhash near-dup pairs: exact
    closure via a recursive CTE with component label = min doc_id —
    the fixpoint ``connected_components`` converges to."""
    return f"""WITH RECURSIVE {_minhash_ctes(threshold, bucket_cap)}, und AS (
        SELECT a AS s, b AS t FROM mh_pairs
        UNION ALL
        SELECT b, a FROM mh_pairs
    ), cc AS (
        SELECT s AS node, s AS label FROM und
        UNION
        SELECT u.t, cc.label FROM cc JOIN und u ON u.s = cc.node
    )
    SELECT node, min(label) AS component FROM cc GROUP BY node"""


MINHASH_PAIRS_SQL = _minhash_pairs_sql()
MINHASH_COMPONENTS_SQL = _minhash_components_sql()


def near_dedup_keep(
    docs: "ray.data.Dataset", threshold: float = 0.8, bucket_cap: int = 50
) -> "ray.data.Dataset":
    """Near-duplicate FILTER — the end-to-end curation op a training
    pipeline actually runs: minhash near-dup pairs -> connected
    components -> keep ONE canonical doc (min doc_id) per cluster,
    drop the rest.  Returns ``(doc_id, cluster_size)`` for every kept
    doc (``cluster_size`` = 1 for docs in no near-dup cluster).

    Scale shape: the docs table only ever streams; the cluster map is
    small by construction (near-dup members only) and rides
    ``broadcast_join``'s size gate for both the member-drop anti-join
    and the size annotation — no all-to-all exchange over the corpus.
    """
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ids = docs.select_columns(["doc_id"])
    pairs = minhash_dedup_pairs(docs, threshold=threshold,
                                bucket_cap=bucket_cap).materialize()
    if pairs.count() == 0:
        return ids.map_batches(
            lambda t: t.append_column(
                "cluster_size", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    comp = connected_components(
        pairs.select_columns(["a", "b"])).materialize()
    sizes = hash_aggregate(
        comp, "component", [("node", "count", "cluster_size")],
        num_partitions=None,
    )
    drops = comp.map_batches(
        lambda t: pa.table({
            "doc_id": pc.filter(t["node"],
                                pc.not_equal(t["node"], t["component"])),
        }),
        batch_format="pyarrow",
    )
    drops = drops.map_batches(
        lambda t: t.append_column(
            "_dup", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    # anti-join: stream ids past the broadcast drop set
    kept = broadcast_join(ids, drops, on=("doc_id",),
                          join_type="left_outer", num_partitions=None)
    kept = kept.map_batches(
        lambda t: t.filter(pc.is_null(t["_dup"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept = broadcast_join(kept, sizes, on=("doc_id",),
                          right_on=("component",),
                          join_type="left_outer", num_partitions=None)
    return kept.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "cluster_size": pc.fill_null(t["cluster_size"], 1),
        }),
        batch_format="pyarrow",
    )


def _near_dedup_keep_sql(threshold: float = 0.8,
                         bucket_cap: int = 50) -> str:
    """DuckDB mirror of ``near_dedup_keep``: the components closure,
    then keep every doc that is not a non-representative member."""
    return f"""WITH RECURSIVE {_minhash_ctes(threshold, bucket_cap)}, und AS (
        SELECT a AS s, b AS t FROM mh_pairs
        UNION ALL
        SELECT b, a FROM mh_pairs
    ), cc AS (
        SELECT s AS node, s AS label FROM und
        UNION
        SELECT u.t, cc.label FROM cc JOIN und u ON u.s = cc.node
    ), comp AS (
        SELECT node, min(label) AS component FROM cc GROUP BY node
    ), sizes AS (
        SELECT component, count(*) AS cluster_size FROM comp
        GROUP BY component
    )
    SELECT d.doc_id,
           coalesce(s.cluster_size, 1) AS cluster_size
    FROM d
    LEFT JOIN sizes s ON s.component = d.doc_id
    WHERE d.doc_id NOT IN
        (SELECT node FROM comp WHERE node <> component)"""


NEAR_DEDUP_KEEP_SQL = _near_dedup_keep_sql()


# --- exact n-gram Jaccard -------------------------------------------------

_GRAM_WORD_RE = None  # compiled lazily per process


def _gram_words(text: str) -> List[str]:
    """Lowercased alphanumeric word tokens (matches NGRAM_JACCARD_SQL)."""
    global _GRAM_WORD_RE
    if _GRAM_WORD_RE is None:
        import re

        _GRAM_WORD_RE = re.compile(r"[a-z0-9]+")
    return _GRAM_WORD_RE.findall(text.lower())


def _gram_hashes_batch(t: pa.Table, n: int) -> pa.Table:
    """(doc_id, gram-hash) rows, distinct grams per doc."""
    ids, grams = [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        words = _gram_words(text or "")
        seen = set()
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            if g in seen:
                continue
            seen.add(g)
            ids.append(doc_id)
            grams.append(np.int64(np.uint64(_fnv64(g))))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "gram": pa.array(grams, pa.int64()),
    })


def _make_gram_pairs_partition(cap):
    """All grams of one hash partition -> co-occurrence pair rows
    (module-level so the cap-logging behavior is unit-testable outside
    a Ray worker)."""

    def gram_pairs_partition(df):
        import logging

        import pandas as pd

        out_a, out_b = [], []
        dropped = 0
        for _, ids_s in df.groupby("gram", sort=False)["doc_id"]:
            ids = sorted(set(ids_s))
            if len(ids) < 2:
                continue
            if cap is not None and len(ids) > cap:
                dropped += 1
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i]); out_b.append(ids[j])
        if dropped:
            logging.getLogger(__name__).warning(
                "ngram_jaccard: %d gram(s) shared by more than "
                "max_gram_docs=%d docs dropped from pair generation "
                "(intersection counts become lower bounds for their "
                "doc pairs)", dropped, cap,
            )
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    return gram_pairs_partition


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.8,
    max_gram_docs: int | None = None,
) -> "ray.data.Dataset":
    """EXACT word-n-gram Jaccard near-dup pairs (a < b, jaccard >= t).

    Fully shuffle-based — no driver-side set math:

      1. explode docs -> distinct (doc, gram-hash) rows;
      2. |set| per doc via ``groupby(doc_id).count()``;
      3. co-occurrence pairs per gram via partition-wise grouping, then
         ``groupby(a, b).count()`` = |A ∩ B| (each shared gram
         contributes exactly one pair row);
      4. two hash joins pull in |A| and |B|; jaccard = i / (|A|+|B|-i).

    The default (``max_gram_docs=None``) is FULLY EXACT, matching this
    function's advertised contract and its DuckDB oracle.  At web scale
    pass an explicit ``max_gram_docs`` to cap pathological grams
    (boilerplate shared by thousands of docs): a gram shared by d docs
    emits O(d^2) pair rows, so one cap-exceeding gram can dominate the
    whole job.  Grams above the cap are dropped from pair generation
    AND LOGGED — at a 0.8 threshold a single gram never decides a pair,
    but the intersection count becomes a lower bound for doc pairs
    whose overlap includes a dropped gram.  MinHash+LSH (above) is the
    probabilistic scale path.
    """
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    grams = docs.map_batches(
        lambda t: _gram_hashes_batch(t, n), batch_format="pyarrow"
    ).materialize()
    sizes = hash_aggregate(grams, "doc_id", [(None, "count", "n_grams")])

    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    pair_rows = partitioned_group_map(
        grams, "gram", _make_gram_pairs_partition(max_gram_docs), 16)
    if pair_rows.count() == 0:
        return pair_rows
    inter = hash_aggregate(pair_rows, ["a", "b"], [(None, "count", "i")])
    j = safe_join(inter, sizes, join_type="inner", num_partitions=None,
                   on=("a",), right_on=("doc_id",))
    j = j.rename_columns({"n_grams": "na"})
    j = safe_join(j, sizes, join_type="inner", num_partitions=None,
               on=("b",), right_on=("doc_id",))
    j = j.rename_columns({"n_grams": "nb"})

    def finish(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = i / (na + nb - i)
        keep = np.nonzero(jac >= threshold)[0]
        sub = t.select(["a", "b"]).take(pa.array(keep))
        return sub.append_column(
            "jaccard", pa.array(np.round(jac[keep], 6), pa.float64())
        )

    return j.map_batches(finish, batch_format="pyarrow")


NGRAM_JACCARD_SQL = """
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(
               lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' +'),
               x -> x <> '') AS ws
    FROM documents
), g AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
    FROM w WHERE len(ws) >= 3
), sizes AS (
    SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
), inter AS (
    SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS i
    FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
    GROUP BY 1, 2
)
SELECT inter.a, inter.b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.a
JOIN sizes sb ON sb.doc_id = inter.b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
"""


# --- prefix-filtered exact Jaccard (SSJoin / PPJoin) ------------------------

PREFIX_JACCARD_SCALE = 1_000_000


def _prefix_per_doc(t_num: int, t_den: int):
    def per_doc(df):
        import pandas as pd

        df = df.sort_values(["doc_id", "dfreq", "gram"], kind="mergesort")
        L = df.groupby("doc_id")["gram"].transform("size")
        rnk = df.groupby("doc_id").cumcount()  # 0-based
        # prefix length p = L - ceil(t*L) + 1 (Chaudhuri et al. 2006)
        p = L - (t_num * L + t_den - 1) // t_den + 1
        keep = (rnk < p).to_numpy()
        return pd.DataFrame({
            "gram": df["gram"][keep].to_numpy(),
            "doc_id": df["doc_id"][keep].to_numpy(),
            "L": L[keep].to_numpy(),
        })

    return per_doc


def _prefix_cand_partition(t_num: int, t_den: int):
    def cand_partition(df):
        import pandas as pd

        out_a, out_b = [], []
        for _, g in df.groupby("gram", sort=False):
            rows = sorted(set(zip(g["doc_id"], g["L"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    (a, la), (b, lb) = rows[i], rows[j]
                    # length filter: J >= t implies t*|A| <= |B|
                    if t_den * min(la, lb) >= t_num * max(la, lb):
                        out_a.append(a)
                        out_b.append(b)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    return cand_partition


def prefix_jaccard_pairs(
    docs: "ray.data.Dataset",
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """EXACT word-n-gram Jaccard pairs (a < b, J >= t_num/t_den) via
    PREFIX FILTERING (SSJoin, Chaudhuri et al. 2006; PPJoin, Xiao et
    al. 2008) — the uncapped scale path :func:`ngram_jaccard_pairs`
    documents as missing.

    That operator generates candidate pairs from EVERY shared gram —
    one boilerplate gram shared by d docs emits O(d^2) rows, so it
    needs a lossy ``max_gram_docs`` cap at web scale.  Prefix
    filtering instead orders each doc's gram set by ascending
    document frequency (rarest first) and generates candidates ONLY
    from the first ``L - ceil(t*L) + 1`` grams: any pair with
    J >= t provably shares a prefix gram (prefix-filter principle),
    and prefix grams are by construction the RAREST, so per-gram
    fan-out stays small without dropping anything.  A quadratic
    blow-up would now need many docs to share the same globally-rare
    gram — self-limiting, where the naive generator blows up on the
    most COMMON gram.

    Exactness: candidates are a superset of the true pairs and every
    candidate is verified against its full gram sets, so the output
    is identical to the naive operator's (pinned in pytest) and the
    DuckDB oracle needs no prefix replay.  All stages are
    hash-partitioned exchanges; no caps, no broadcasts of corpus-
    sized state, no driver-side data path.  Integer thresholds
    (``t_num/t_den``) keep the jaccard filter and the scaled output
    column bit-exact for the hash gate.
    """
    from neo4j_document_pipeline_ray.stages.grouped import (
        hash_aggregate,
        partitioned_group_map,
        safe_join,
    )

    # The gram table is consumed by 4 passes below and is corpus-token
    # sized — CHECKPOINT it to parquet (the stage-B / minhash pattern)
    # instead of pinning it in the object store; each consumer does its
    # own re-read.
    import atexit
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    gram_dir = tempfile.mkdtemp(prefix="graft_prefix_grams_")
    atexit.register(shutil.rmtree, gram_dir, ignore_errors=True)
    docs.map_batches(
        lambda t: _gram_hashes_batch(t, n), batch_format="pyarrow"
    ).write_parquet(gram_dir)
    if not any(f.endswith(".parquet") for f in os.listdir(gram_dir)):
        pq.write_table(
            pa.schema([("doc_id", pa.int64()),
                       ("gram", pa.int64())]).empty_table(),
            os.path.join(gram_dir, "empty.parquet"))
    grams = ray.data.read_parquet(gram_dir)
    # gram-table footer bytes scaled to in-memory units: a valid upper
    # bound for every gram-proportional exchange below (joined/prefix
    # tables only shrink or add one small int column) — lets the
    # adaptive gate skip the sorted exchange's multi-second fixed cost
    # at small scale WITHOUT a materialize-to-measure copy at corpus
    # scale (metadata says big -> straight to the sorted exchange).
    from neo4j_document_pipeline_ray.stages.grouped import FOOTER_TO_ARROW

    gram_mem = FOOTER_TO_ARROW * sum(
        sum(md.row_group(i).total_byte_size
            for i in range(md.num_row_groups))
        for md in (pq.ParquetFile(os.path.join(gram_dir, f)).metadata
                   for f in os.listdir(gram_dir)
                   if f.endswith(".parquet"))
    )
    dfreq = hash_aggregate(grams, "gram", [(None, "count", "dfreq")],
                           num_partitions=num_partitions, adaptive=True)
    gdf = safe_join(grams, dfreq, join_type="inner", on=("gram",),
                    num_partitions=num_partitions)
    prefix = partitioned_group_map(
        gdf, "doc_id", _prefix_per_doc(t_num, t_den), num_partitions,
        adaptive=True, size_hint=2 * gram_mem)
    cand = partitioned_group_map(
        prefix, "gram", _prefix_cand_partition(t_num, t_den),
        num_partitions, adaptive=True, size_hint=2 * gram_mem)
    cand = hash_aggregate(cand, ["a", "b"], [(None, "count", "_m")],
                          num_partitions=num_partitions
                          ).drop_columns(["_m"])

    # verify candidates exactly: intersection = shared-gram count,
    # computed over the grams of CANDIDATE DOCS only (semi-join)
    def ends(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([t["a"].combine_chunks(),
                                t["b"].combine_chunks()])
        return pa.table({"doc_id": ids})

    cand_ids = hash_aggregate(
        cand.map_batches(ends, batch_format="pyarrow"),
        "doc_id", [(None, "count", "_m")],
        num_partitions=num_partitions).drop_columns(["_m"])
    semi = safe_join(grams, cand_ids, join_type="inner", on=("doc_id",),
                     num_partitions=num_partitions)
    ja = safe_join(cand, semi, join_type="inner", on=("a",), right_on=("doc_id",),
                   num_partitions=num_partitions)
    jab = safe_join(ja, semi, join_type="inner", on=("b", "gram"),
                    right_on=("doc_id", "gram"),
                    num_partitions=num_partitions)
    inter = hash_aggregate(jab, ["a", "b"], [(None, "count", "i")],
                           num_partitions=num_partitions)
    sizes = hash_aggregate(grams, "doc_id", [(None, "count", "L")],
                           num_partitions=num_partitions, adaptive=True)
    j = safe_join(inter, sizes, join_type="inner", on=("a",), right_on=("doc_id",),
                  num_partitions=num_partitions)
    j = j.rename_columns({"L": "la"})
    j = safe_join(j, sizes, join_type="inner", on=("b",), right_on=("doc_id",),
                  num_partitions=num_partitions)
    j = j.rename_columns({"L": "lb"})

    def finish(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        union = (t["la"].to_numpy(zero_copy_only=False)
                 + t["lb"].to_numpy(zero_copy_only=False) - i)
        keep = np.flatnonzero(t_den * i >= t_num * union)
        sub = t.take(pa.array(keep))
        u = union[keep]
        return pa.table({
            "doc_a": sub["a"],
            "doc_b": sub["b"],
            "n_shared": sub["i"],
            "jaccard_scaled": pa.array(
                i[keep] * PREFIX_JACCARD_SCALE // u, pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


PREFIX_JACCARD_SQL = """
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(
               lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' +'),
               x -> x <> '') AS ws
    FROM documents
), g AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
    FROM w WHERE len(ws) >= 3
), sizes AS (
    SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
), inter AS (
    SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS i
    FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
    GROUP BY 1, 2
)
SELECT inter.a AS doc_a, inter.b AS doc_b,
       CAST(i AS BIGINT) AS n_shared,
       CAST(i * 1000000 // (sa.n + sb.n - i) AS BIGINT) AS jaccard_scaled
FROM inter
JOIN sizes sa ON sa.doc_id = inter.a
JOIN sizes sb ON sb.doc_id = inter.b
WHERE 5 * i >= 4 * (sa.n + sb.n - i)
"""


# --- segment-level (line) dedup -------------------------------------------

_SEG_WINDOW = 3      # tokens per segment
_SEG_MIN_DOCS = 5    # segment appearing in >= this many docs = boilerplate


def _doc_segments(t: pa.Table, window: int):
    """Vectorized segmentation of a batch: lowercase tokens split on
    whitespace, grouped into consecutive non-overlapping ``window``-token
    segments (the last, possibly short, segment included).  Returns a
    pandas frame (doc row index, seg index, seg_text, seg_toks); docs
    with no tokens contribute nothing.
    """
    import pandas as pd

    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)[keep]
    # position within doc, then the segment index it falls into
    offsets = np.zeros(t.num_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    pos = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
        offsets[:-1], lens)
    seg = pos[keep] // window
    words = flat.filter(pa.array(keep)).to_pandas()
    df = pd.DataFrame({"doc": doc_idx, "seg": seg, "tok": words})
    segs = df.groupby(["doc", "seg"], sort=True).agg(
        seg_text=("tok", " ".join), seg_toks=("tok", "size"))
    return segs.reset_index()


def segment_dedup(
    docs: "ray.data.Dataset",
    window: int = _SEG_WINDOW,
    min_docs: int = _SEG_MIN_DOCS,
) -> "ray.data.Dataset":
    """CCNet-style duplicated-segment removal over ``(doc_id, text)``:
    a SEGMENT (``window`` consecutive lowercased whitespace tokens,
    non-overlapping) occurring in >= ``min_docs`` DISTINCT documents is
    boilerplate (headers, footers, navigation chrome) and is dropped
    from every document carrying it.  Real web text would segment on
    newlines/sentences; the synthetic corpus has neither, so the window
    segmentation IS the operator's segmenter, parameterized.

    Returns per-doc ``(doc_id, n_segments, n_removed, n_tokens_kept)``
    — the removal report a curation pipeline audits before committing
    the cleaned text.

    Scale shape: two passes over the corpus.  Pass 1 exchanges
    per-batch (segment -> distinct-doc partial count) vocabularies
    (a doc lives wholly in one row, so within-doc dedup is local and
    the partials sum to distinct-doc counts); the df table is then
    FILTERED to df >= min_docs BEFORE leaving the cluster, so only the
    small boilerplate set is broadcast (``ray.put`` once) into the
    zero-exchange pass 2.  At open-web scale segments would ride a
    128-bit hash instead of the string (same contract as the minhash
    sketches above); the string keeps the DuckDB mirror exact here.
    """
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    def partial_df(t: pa.Table) -> pa.Table:
        segs = _doc_segments(t, window)
        per_doc = segs.drop_duplicates(["doc", "seg_text"])
        vc = per_doc["seg_text"].value_counts()
        return pa.table({
            "seg_text": pa.array(vc.index, pa.string()),
            "n": pa.array(vc.to_numpy(), pa.int64()),
        })

    df_tbl = hash_aggregate(
        docs.map_batches(partial_df, batch_format="pyarrow"),
        "seg_text", [("n", "sum", "n")],
    )
    boiler = df_tbl.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_docs))
                   .select(["seg_text"]),
        batch_format="pyarrow",
    )
    boiler_set = frozenset(
        x["seg_text"] for x in boiler.take_all())  # small: df-filtered

    import ray

    ref = ray.put(boiler_set)

    def report(t: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        segs = _doc_segments(t, window)
        if not len(segs):
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_segments": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "n_tokens_kept": pa.array([], pa.int64()),
            })
        dup = segs["seg_text"].isin(bset).to_numpy()
        toks = segs["seg_toks"].to_numpy()
        n = t.num_rows
        doc = segs["doc"].to_numpy()
        n_segments = np.bincount(doc, minlength=n)
        n_removed = np.bincount(doc, weights=dup, minlength=n)
        kept_toks = np.bincount(doc, weights=np.where(dup, 0, toks),
                                minlength=n)
        has = n_segments > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[has]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_segments": pa.array(n_segments[has], pa.int64()),
            "n_removed": pa.array(n_removed[has].astype(np.int64)),
            "n_tokens_kept": pa.array(kept_toks[has].astype(np.int64)),
        })

    return docs.map_batches(report, batch_format="pyarrow")


def segment_dedup_sf(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    return segment_dedup(ds)


def _segment_dedup_sql(window: int = _SEG_WINDOW,
                       min_docs: int = _SEG_MIN_DOCS) -> str:
    return f"""
WITH d AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
    FROM documents WHERE trim(text) <> ''
), p AS (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks))) AS pos
    FROM d
), t AS (
    SELECT doc_id, (pos - 1) // {window} AS seg, toks[pos] AS tok, pos
    FROM p
), segs AS (
    SELECT doc_id, seg,
           string_agg(tok, ' ' ORDER BY pos) AS seg_text,
           count(*) AS seg_toks
    FROM t GROUP BY doc_id, seg
), df AS (
    SELECT seg_text, count(DISTINCT doc_id) AS df
    FROM segs GROUP BY seg_text
), j AS (
    SELECT s.doc_id, s.seg_toks, (f.df >= {min_docs}) AS dup
    FROM segs s JOIN df f USING (seg_text)
)
SELECT doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN dup THEN 0 ELSE seg_toks END) AS BIGINT)
           AS n_tokens_kept
FROM j GROUP BY doc_id
"""


SEGMENT_DEDUP_SQL = _segment_dedup_sql()
