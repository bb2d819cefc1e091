"""Deterministic sampling operators for corpus curation.

Sampling at 100 TB must be (a) a single streaming decision per row —
no global sort, no driver round-trip — and (b) reproducible across
runs and cluster shapes.  Both properties come from ranking rows by a
pure hash of their id: the "random" order is a function of the data
alone.

``stratified_sample`` keeps up to ``per_stratum`` rows per stratum
(e.g. per language), the standard recipe for balancing a skewed corpus
before training.  The hash is the Knuth multiplicative mix
``(id * 2654435761) mod 2^32`` — trivially mirrored in SQL, vectorized
in numpy.  (For ids >= 2^32 swap in a 64-bit mix on both sides.)

Partitioning assumption: one stratum's rows must be co-partitionable
by hash of the stratum key (the usual grouped-operator contract); the
rank-then-filter inside a partition is vectorized over ALL strata of
that partition at once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

_KNUTH = 2654435761


def sample_key(ids: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-random rank key for int64 ids."""
    return (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(1 << 32)


def stratified_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    id_col: str,
    per_stratum: int = 20,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Up to ``per_stratum`` rows per stratum, chosen by hash order of
    ``id_col`` (ties impossible: the final tie-break is the unique id).
    Output adds ``sample_rank`` (1-based within stratum)."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = sample_key(df[id_col].to_numpy()).astype(np.int64)
        df = df.sort_values([stratum_col, "_h", id_col], kind="mergesort")
        df["sample_rank"] = df.groupby(stratum_col, sort=False).cumcount() + 1
        df = df[df["sample_rank"] <= per_stratum].drop(columns=["_h"])
        return df.astype({"sample_rank": "int64"})

    return partitioned_group_map(ds, stratum_col, pick,
                                 num_partitions=num_partitions)


def docs_stratified_sample(sf_dir: str, per_stratum: int = 20) -> "ray.data.Dataset":
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    return stratified_sample(docs, "lang", "doc_id", per_stratum)


def docs_stratified_sample_sql(per_stratum: int = 20) -> str:
    return f"""
SELECT doc_id, lang, sample_rank FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * {_KNUTH}) % 4294967296, doc_id
           ) AS sample_rank
    FROM documents
) WHERE sample_rank <= {per_stratum}
"""


def domain_budget_sample(
    ds: "ray.data.Dataset",
    domain_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-domain QUOTA sampling: walk each domain's rows in hash order
    and keep rows while the cumulative weight consumed BEFORE the row is
    under ``budget`` (so every domain keeps at least one row, and the
    kept set is a prefix of the same deterministic order
    ``stratified_sample`` uses — shrinking the budget nests the sample).

    This is the per-domain token-budget cap of the C4 / RefinedWeb /
    FineWeb recipes: a handful of giant domains would otherwise dominate
    the corpus, so each domain contributes at most ~``budget`` weight
    (chars here; swap in a token count column for token budgets).

    Same partitioning contract as the other grouped operators: one
    domain's rows co-located by hash of the domain key; the
    prefix-sum + filter inside a partition is vectorized over all
    domains of that partition at once.  Output adds ``cum_weight``
    (inclusive prefix sum in kept order) for auditability.
    """

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = sample_key(df[id_col].to_numpy()).astype(np.int64)
        df = df.sort_values([domain_col, "_h", id_col], kind="mergesort")
        w = df[weight_col].to_numpy()
        grp = df.groupby(domain_col, sort=False)
        cum = grp[weight_col].cumsum().to_numpy()
        before = cum - w
        df["cum_weight"] = cum
        out = df[before < budget].drop(columns=["_h"])
        return out.astype({"cum_weight": "int64"})

    return partitioned_group_map(ds, domain_col, pick,
                                 num_partitions=num_partitions)


def docs_domain_budget(sf_dir: str, budget: int = 2000) -> "ray.data.Dataset":
    """Per-source char-budget cap over the documents table.  Reads ONLY
    ``doc_id, source, n_chars`` — the text never leaves storage."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )
    return domain_budget_sample(docs, "source", "doc_id", "n_chars", budget)


def docs_domain_budget_sql(budget: int = 2000) -> str:
    return f"""
SELECT doc_id, source, n_chars, cum_weight FROM (
    SELECT doc_id, source, n_chars,
           CAST(SUM(n_chars) OVER w AS BIGINT) AS cum_weight,
           COALESCE(SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY (doc_id * {_KNUTH}) % 4294967296, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS before
    FROM documents
    WINDOW w AS (
        PARTITION BY source
        ORDER BY (doc_id * {_KNUTH}) % 4294967296, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
) WHERE before < {budget}
"""


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> "ray.data.Dataset":
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): every row gets priority
    ``-ln(u)/w`` with ``u`` a pure hash of its id mapped into (0,1),
    and the k SMALLEST priorities win — exactly a weighted draw of k
    rows without replacement, but reproducible across runs, engines
    and cluster shapes because the randomness is a function of the
    data alone (same contract as :func:`sample_key`).

    Scale shape: priority is a one-pass ``map_batches``; each batch
    pre-shrinks to its local k smallest before the global
    ``sort().limit(k)``, so the exchange carries O(k x n_blocks) rows,
    not the corpus.  Ties are broken by id (and are measure-zero
    anyway).
    """

    def prio(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = w > 0
        u = (sample_key(ids).astype(np.float64) + 1.0) / 4294967297.0
        pr = -np.log(u) / np.where(keep, w, 1.0)
        out = pa.table({
            id_col: t[id_col],
            weight_col: t[weight_col],
            "priority": pa.array(pr, pa.float64()),
        }).filter(pa.array(keep))
        if out.num_rows > k:
            order = np.lexsort((
                out[id_col].to_numpy(zero_copy_only=False),
                out["priority"].to_numpy(),
            ))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    return ds.map_batches(prio, batch_format="pyarrow") \
             .sort(["priority", id_col]).limit(k)


def docs_weighted_sample(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Char-weighted doc sample: long docs proportionally more likely,
    reading ONLY ``doc_id, n_chars`` — the text never leaves storage."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    return weighted_sample_topk(docs, "doc_id", "n_chars", k)


def docs_weighted_sample_sql(k: int = 100) -> str:
    return f"""
SELECT doc_id, n_chars,
       -ln((((doc_id * {_KNUTH}) % 4294967296) + 1) / 4294967297.0)
           / CAST(n_chars AS DOUBLE) AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority, doc_id
LIMIT {k}
"""


# --- deterministic train/val/test split -------------------------------------

def docs_split(sf_dir: str, train_pct: int = 80,
               val_pct: int = 10,
               num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Deterministic corpus split report: assign every document to
    train/val/test by the same Knuth hash the sampler ranks with
    (``(doc_id * K) mod 2^32 mod 100`` against the percentage cut
    points — reproducible across runs, cluster shapes and insertions;
    no global sort, one streaming decision per row), then report per
    (split, lang) document / token / char totals — the sanity table
    every training run reads before touching the data.

    In-batch Arrow partial aggregation means the exchange carries
    (split, lang) partials only.  Returns ``(split, lang, n_docs,
    n_tokens, n_chars)``.
    """
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        h = ((t["doc_id"].to_numpy().astype(np.uint64)
              * np.uint64(_KNUTH)) % np.uint64(1 << 32)) % np.uint64(100)
        split = np.where(
            h < train_pct, "train",
            np.where(h < train_pct + val_pct, "val", "test"))
        tok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                      pa.int64())
        work = pa.table({
            "split": pa.array(split, pa.string()),
            "lang": t["lang"],
            "n_tokens": tok,
            "n_chars": t["n_chars"],
        })
        agg = work.group_by(["split", "lang"], use_threads=False).aggregate(
            [("n_tokens", "sum"), ("n_chars", "sum"),
             ("split", "count")])
        return pa.table({
            "split": agg["split"],
            "lang": agg["lang"],
            "n_docs": agg["split_count"],
            "n_tokens": agg["n_tokens_sum"],
            "n_chars": agg["n_chars_sum"],
        })

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["split", "lang"],
        [("n_docs", "sum", "n_docs"), ("n_tokens", "sum", "n_tokens"),
         ("n_chars", "sum", "n_chars")],
        num_partitions=num_partitions)


def docs_split_sql(train_pct: int = 80, val_pct: int = 10) -> str:
    """DuckDB mirror of :func:`docs_split` (same Knuth hash cut)."""
    return f"""
    SELECT CASE WHEN h < {train_pct} THEN 'train'
                WHEN h < {train_pct + val_pct} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '\\S+')))
                AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM (SELECT *, ((doc_id * {_KNUTH}) % 4294967296) % 100 AS h
          FROM documents)
    GROUP BY 1, 2
    """


def train_shards(
    docs: "ray.data.Dataset",
    n_shards: int = 8,
    seed: int = 42,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Deterministic global shuffle into training shards — the write
    layout a training-data export needs: every document gets a
    ``(shard, pos)`` slot from a seeded hash, so readers stream shard
    files in ``pos`` order and see a reproducible pseudo-random
    document order with no global sort and no RNG state.

    ``h = ((doc_id + seed) * K) mod 2^32`` (the module's Knuth mix,
    trivially SQL-mirrored); ``shard = h mod n_shards``; ``pos`` =
    rank of ``(h, doc_id)`` within the shard.  Reshuffling is a seed
    bump.  Scale contract: one shard's keys must fit a reducer (the
    same bound as the shard FILE a writer would emit) — size
    ``n_shards`` to the corpus, e.g. 100 TB / 4096 shards.  Returns
    ``(doc_id, shard, pos)``.
    """

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids + np.uint64(seed)) * np.uint64(_KNUTH)) \
            % np.uint64(1 << 32)
        return pa.table({
            "doc_id": t["doc_id"],
            "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64),
                              pa.int64()),
            "h": pa.array(h.astype(np.int64), pa.int64()),
        })

    def rank(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["shard", "h", "doc_id"], kind="mergesort")
        df["pos"] = df.groupby("shard", sort=False).cumcount()
        return df[["doc_id", "shard", "pos"]].astype(
            {"doc_id": "int64", "shard": "int64", "pos": "int64"})

    return partitioned_group_map(
        docs.select_columns(["doc_id"]).map_batches(
            key, batch_format="pyarrow"),
        "shard", rank, num_partitions=num_partitions)


def docs_train_shards(sf_dir: str, n_shards: int = 8,
                      seed: int = 42) -> "ray.data.Dataset":
    return train_shards(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"]),
        n_shards=n_shards, seed=seed)


def docs_train_shards_sql(n_shards: int = 8, seed: int = 42) -> str:
    """DuckDB mirror of :func:`train_shards` (same seeded Knuth mix)."""
    return f"""
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
               AS pos
    FROM (
        SELECT doc_id,
               ((doc_id + {seed}) * {_KNUTH}) % 4294967296 AS h,
               (((doc_id + {seed}) * {_KNUTH}) % 4294967296)
                   % {n_shards} AS shard
        FROM documents
    )
    """
