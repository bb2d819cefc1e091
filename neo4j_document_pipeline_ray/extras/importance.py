"""Data-selection importance weights (DSIR-style).

Not in the reference (no corpus-curation layer at all); this is the
standard importance-resampling score of Xie et al., "Data Selection
for Language Models via Importance Resampling" (NeurIPS 2023): rank
source documents by how much more likely they are under a TARGET
unigram language model than under the SOURCE (whole-corpus) model,

    w(doc) = (1/n) * sum_tokens [ ln p_tgt(tok) - ln p_src(tok) ]

with add-one smoothing over the shared corpus vocabulary ``V``:
``p(w) = (c(w) + 1) / (N + |V|)``.  DSIR proper hashes n-gram features
into buckets; the unigram/exact-token variant here keeps the score
SQL-replayable so the distributed run can be hash-checked against a
DuckDB oracle (same contract as ``textstats.unigram_logprob``, which
this operator composes: its ``avg_logprob`` is the ``p_src`` half).

Distributed shape (two passes, one exchange):
  pass 1  per-batch ``value_counts`` partials emit (token, n_src,
          n_tgt) vocabularies — a doc lives wholly in one row, so the
          target flag is local — merged by one small hash aggregate;
  bcast   per-token ``ln(c_tgt+1) - ln(c_src+1)`` deltas are
          ``ray.put`` ONCE (vocabulary must fit a worker heap; at
          open-web scale pre-prune with a min-df cut, scoring pruned
          tokens at the smoothed floor);
  pass 2  zero-exchange ``map_batches``: per-doc mean delta via one
          ``np.bincount``, plus the closed-form smoothing constant
          ``ln(N_src+|V|) - ln(N_tgt+|V|)``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def dsir_importance(
    docs: "ray.data.Dataset",
    target_col: str = "is_target",
) -> "ray.data.Dataset":
    """``(doc_id, n_tokens, importance)`` for every doc with >= 1 token.

    ``docs`` must carry ``doc_id``, ``text`` and a boolean/int
    ``target_col`` marking the rows whose empirical distribution is the
    target.  Positive ``importance`` = doc looks more like the target
    corpus than the source average.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tgt_rows = pc.cast(t[target_col], pa.bool_()).to_numpy(
            zero_copy_only=False)
        tgt = np.repeat(tgt_rows, lens)[keep]
        words = flat.filter(pa.array(keep)).to_pandas()
        g = pd.DataFrame({"token": words, "t": tgt.astype(np.int64)})
        agg = g.groupby("token", sort=False)["t"].agg(["size", "sum"])
        return pa.table({
            "token": pa.array(agg.index, pa.string()),
            "n_src": pa.array(agg["size"].to_numpy(), pa.int64()),
            "n_tgt": pa.array(agg["sum"].to_numpy(), pa.int64()),
        })

    vocab = hash_aggregate(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "token", [("n_src", "sum", "n_src"), ("n_tgt", "sum", "n_tgt")],
    ).to_pandas()  # small: one row per distinct token

    n_src = float(vocab["n_src"].sum())
    n_tgt = float(vocab["n_tgt"].sum())
    v = float(len(vocab))
    const = float(np.log(n_src + v) - np.log(n_tgt + v))
    delta = (np.log(vocab["n_tgt"].to_numpy(np.float64) + 1.0)
             - np.log(vocab["n_src"].to_numpy(np.float64) + 1.0))
    vocab_idx = pd.Index(vocab["token"])

    import ray

    ref = ray.put((vocab_idx, delta))

    def score(t: pa.Table) -> pa.Table:
        v_idx, v_delta = ray.get(ref)
        n = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)[keep]
        words = flat.filter(pa.array(keep)).to_pandas()
        pos = v_idx.get_indexer(words)  # -1 impossible: same tokenizer
        # as pass 1, so every token is in the vocabulary
        sums = np.bincount(idx, weights=v_delta[pos], minlength=n)
        cnts = np.bincount(idx, minlength=n).astype(np.int64)
        has = cnts > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(has)),
            "n_tokens": pa.array(cnts[has], pa.int64()),
            "importance": pa.array(sums[has] / cnts[has] + const,
                                   pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def docs_importance(sf_dir: str, target_lang: str = "en") -> "ray.data.Dataset":
    """DSIR importance of every document toward the ``target_lang``
    slice of the corpus (the deterministic stand-in for "my curated
    target set" on the synthetic tables)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "is_target": pc.equal(t["lang"], target_lang),
        })

    return dsir_importance(ds.map_batches(flag, batch_format="pyarrow"))


def docs_importance_sql(target_lang: str = "en") -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id, (lang = '{target_lang}') AS is_t,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
    FROM documents
), t2 AS (
    SELECT doc_id, is_t, token FROM toks WHERE token <> ''
), vocab AS (
    SELECT token,
           count(*) AS c_s,
           sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t
    FROM t2 GROUP BY token
), consts AS (
    SELECT CAST(sum(c_s) AS DOUBLE) AS n_s,
           CAST(sum(c_t) AS DOUBLE) AS n_t,
           CAST(count(*) AS DOUBLE) AS v
    FROM vocab
)
SELECT t2.doc_id,
       count(*) AS n_tokens,
       avg(ln(CAST(vo.c_t + 1 AS DOUBLE)) - ln(CAST(vo.c_s + 1 AS DOUBLE)))
           + ln(c.n_s + c.v) - ln(c.n_t + c.v) AS importance
FROM t2 JOIN vocab vo USING (token), consts c
GROUP BY t2.doc_id, c.n_s, c.n_t, c.v
"""


DOCS_IMPORTANCE_SQL = docs_importance_sql()
