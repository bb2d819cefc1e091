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
    num_partitions: int = 16,
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
