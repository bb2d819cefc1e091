"""Generic table profiling: per-column null counts + KMV distinct
sketches in ONE streaming pass.

The first thing any 100 TB ingestion runs over an unfamiliar table is
a column profile — row count, null fraction, distinct cardinality per
column — and the naive version (one ``COUNT(DISTINCT c)`` per column)
is one all-to-all shuffle PER COLUMN.  This operator does all columns
in a single pass with zero exchanges: each batch contributes, per
column, its (row, null) tallies and the k smallest distinct 61-bit
FNV hashes of the stringified values; the driver unions the k-minima
(O(k x n_cols x n_batches), corpus-size-independent) and finalizes
the same integer KMV estimator as ``distinct_tokens_kmv`` — so a
DuckDB replay hash-matches bit for bit (ASCII caveat as
FINGERPRINT_SQL; int columns stringify identically via Arrow cast ==
``CAST(c AS VARCHAR)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from neo4j_document_pipeline_ray.extras.textstats import (
    _FNV_OFFSET,
    _FNV_PRIME,
    _KMV_SPACE,
)

_MASK61 = np.uint64(_KMV_SPACE - 1)


def _fnv_strings(vals: "list[str]") -> np.ndarray:
    """Vectorized FNV-1a 64 over FULL strings (no tokenization): the
    batch loops over byte positions (bounded by the longest value)
    with full-width numpy ops, offsets-based so values may contain
    any byte."""
    if not vals:
        return np.zeros(0, dtype=np.uint64)
    enc = [v.encode("utf-8") for v in vals]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    h = np.full(len(enc), _FNV_OFFSET, dtype=np.uint64)
    if lens.max() == 0:
        return h
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    for pos in range(int(lens.max())):
        m = lens > pos
        b = buf[starts[m] + pos].astype(np.uint64)
        h[m] = (h[m] ^ b) * _FNV_PRIME
    return h


def table_profile(
    ds: "ray.data.Dataset",
    columns: "list[str]",
    k: int = 64,
) -> pa.Table:
    """One (col, n_rows, n_nulls, kmv_k, kth_hash, est_distinct) row
    per profiled column.  Declared ``columns`` must stringify
    identically in Arrow and DuckDB (strings and integers do; floats
    do not — leave them out or cast upstream)."""
    if k < 2:
        raise ValueError("KMV needs k >= 2")
    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        out = {"col": [], "h": [], "n_rows": [], "n_nulls": []}
        for c in cols:
            arr = t[c]
            out["col"].append(c)
            out["h"].append(-1)  # marker row carries the tallies
            out["n_rows"].append(len(arr))
            out["n_nulls"].append(arr.null_count)
            vals = pc.cast(arr.drop_null(), pa.string()).to_pylist()
            kmin = np.unique(_fnv_strings(vals) & _MASK61)[:k]
            for hv in kmin:
                out["col"].append(c)
                out["h"].append(int(hv))
                out["n_rows"].append(0)
                out["n_nulls"].append(0)
        return pa.table({
            "col": pa.array(out["col"], pa.string()),
            "h": pa.array(out["h"], pa.int64()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        })

    # driver-side finalize: O(k x n_cols x n_batches) partial rows —
    # corpus-size-independent (the distinct_tokens_kmv convention)
    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    agg: dict = {c: {"n": 0, "nulls": 0, "hs": set()} for c in cols}
    for r in parts:
        a = agg[r["col"]]
        if r["h"] < 0:
            a["n"] += r["n_rows"]
            a["nulls"] += r["n_nulls"]
        else:
            a["hs"].add(r["h"])
    rows = {"col": [], "n_rows": [], "n_nulls": [], "kmv_k": [],
            "kth_hash": [], "est_distinct": []}
    for c in cols:
        a = agg[c]
        kmin = sorted(a["hs"])[:k]
        if not kmin:
            kth, est = 0, 0
        elif len(kmin) < k:
            kth, est = kmin[-1], len(kmin)
        else:
            kth = kmin[-1]
            est = ((k - 1) * _KMV_SPACE) // kth
        rows["col"].append(c)
        rows["n_rows"].append(a["n"])
        rows["n_nulls"].append(a["nulls"])
        rows["kmv_k"].append(k)
        rows["kth_hash"].append(kth)
        rows["est_distinct"].append(est)
    return pa.table({
        "col": pa.array(rows["col"], pa.string()),
        "n_rows": pa.array(rows["n_rows"], pa.int64()),
        "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
        "kmv_k": pa.array(rows["kmv_k"], pa.int64()),
        "kth_hash": pa.array(rows["kth_hash"], pa.int64()),
        "est_distinct": pa.array(rows["est_distinct"], pa.int64()),
    })


def table_profile_sql(table: str, columns: "list[str]",
                      k: int = 64) -> str:
    """DuckDB mirror of :func:`table_profile` — per column the same
    full-string FNV fold (HUGEINT mod-2^64 emulation), 61-bit mask,
    k smallest distinct, integer estimator; one UNION ALL block per
    column."""
    m64 = 1 << 64
    blocks = []
    for c in columns:
        blocks.append(f"""
        SELECT '{c}' AS col,
               (SELECT count(*) FROM {table}) AS n_rows,
               (SELECT count(*) FROM {table} WHERE {c} IS NULL)
                   AS n_nulls,
               CAST({k} AS BIGINT) AS kmv_k,
               CAST(COALESCE(max(h61), 0) AS BIGINT) AS kth_hash,
               CAST(CASE WHEN count(*) = 0 THEN 0
                         WHEN count(*) < {k} THEN count(*)
                         ELSE (CAST({k - 1} AS HUGEINT) * {_KMV_SPACE})
                              // max(h61)
                    END AS BIGINT) AS est_distinct
        FROM (
            SELECT h61 FROM (
                SELECT DISTINCT list_reduce(
                    list_prepend(CAST({int(_FNV_OFFSET)} AS HUGEINT),
                        list_transform(range(1, length(v) + 1),
                            i -> CAST(ascii(substr(v, i, 1)) AS HUGEINT))),
                    (acc, b) -> (CAST(xor(CAST(acc AS UBIGINT),
                                          CAST(b AS UBIGINT)) AS HUGEINT)
                                 * {int(_FNV_PRIME)}) % {m64}
                ) % {_KMV_SPACE} AS h61
                FROM (SELECT DISTINCT CAST({c} AS VARCHAR) AS v
                      FROM {table} WHERE {c} IS NOT NULL)
            ) ORDER BY h61 LIMIT {k}
        )""")
    return " UNION ALL ".join(blocks)
