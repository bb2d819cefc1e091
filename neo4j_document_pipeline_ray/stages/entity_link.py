"""Stage 5: entity linking / canonicalization (the wide shuffle).

The reference upserts entities with ``MERGE (n:Label {name})`` — exact
match on the raw surface form per label (``ingestMD.py:505-511``) — and
then, at read time, treats any two names with equal
``_normalize_name_for_key`` values as the same entity
(``graphutil.py:640-674``).  Per the north rule that read-time alias
resolution is promoted to construction time: the cluster key IS the
normalization key, label-blind (documented divergence knob from the
label-scoped MERGE; SURVEY.md §2.5 A3/A4).

Canonical identity: ``entity_id = stable_id(norm_key)`` — a pure
function, stable across runs, partitionings and cluster sizes.  The
canonical surface form is the reference-style deterministic
representative: the lexicographically smallest ``(name, label)`` pair
among the cluster's mentions (the reference's "first-seen" is
ingestion-order dependent; we fix a deterministic order, which the
set-level P/R scoring is insensitive to).

Skew design ("United States" problem): candidates are pre-deduplicated
*within every batch* in a stateless ``map_batches`` partial-aggregation
pass, so a head entity mentioned a million times enters the global
shuffle at most once per batch (bounded by #batches, not #mentions),
and each reducer group holds only the distinct surface variants of one
norm key.  That two-phase shape is the salting strategy — there is no
hot reducer left to salt.  The final groupby uses built-in vectorized
``Min`` aggregates (no per-group Python).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig

# \x1f (unit separator) sorts below all printable chars, so
# min(name \x1f label) == lexicographic min of the (name, label) pair.
_SEP = "\x1f"


def _candidates_batch(batch: pa.Table) -> "pd.DataFrame":
    """Both triple endpoints -> deduped (entity_id, norm_key, rep_key)
    candidates — vectorized in-batch partial dedup."""
    import pandas as pd

    d = batch.to_pydict()
    df = pd.DataFrame({
        "entity_id": pd.Series(d["src_id"] + d["dst_id"], dtype="int64"),
        "norm_key": d["src_norm_key"] + d["dst_norm_key"],
        # str() of None is "None" in the scalar path; astype(str) matches
        "_name": pd.Series(d["subject"] + d["object"]).astype(str),
        "_label": pd.Series(d["subject_type"] + d["object_type"]).astype(str),
    })
    df["rep_key"] = df["_name"] + _SEP + df["_label"]
    out = df.drop_duplicates(["entity_id", "rep_key"])
    return out[["entity_id", "norm_key", "rep_key"]]


def _finish_batch(batch: pa.Table) -> pa.Table:
    """Split the winning rep_key back into (name, label) + build node_key."""
    names, labels, node_keys = [], [], []
    for rep in batch["rep_key"].to_pylist():
        name, _, label = rep.rpartition(_SEP)
        names.append(name)
        labels.append(label)
        node_keys.append(f"{label}:{name}")
    return pa.table(
        {
            "entity_id": batch["entity_id"],
            "label": pa.array(labels, pa.string()),
            "name": pa.array(names, pa.string()),
            "norm_key": batch["norm_key"],
            "node_key": pa.array(node_keys, pa.string()),
        }
    )


# columns the candidate partial pass actually reads (pruned at the read)
NODE_INPUT_COLS = [
    "src_id", "dst_id", "src_norm_key", "dst_norm_key",
    "subject", "object", "subject_type", "object_type",
]


def shard_node_candidates(
    triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None
) -> "ray.data.Dataset":
    """Per-batch deduped (entity_id, norm_key, rep_key) candidate rows —
    the associative partial of the node aggregation, writable per shard
    in stage A so stage B never re-reads raw triples."""
    cfg = cfg or PipelineConfig()
    slim = triples.select_columns(NODE_INPUT_COLS)
    return slim.map_batches(
        _candidates_batch, batch_format="pyarrow", batch_size=cfg.agg_batch_size
    )


def finalize_nodes(
    cands: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None,
    mem_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """Candidate partials -> final nodes table (global min per entity).

    ``mem_hint`` (estimated IN-MEMORY bytes of the rows feeding
    ``cands``) lets a corpus-sized exchange skip the adaptive
    materialize-to-measure copy and derive its partition count from
    size; the candidate partials only shrink the input, so it is a
    valid upper bound."""
    from neo4j_document_pipeline_ray.stages.grouped import min_by_key

    cfg = cfg or PipelineConfig()
    agg = min_by_key(cands, "entity_id",
                     num_partitions=None, adaptive=True,
                     size_hint=mem_hint,
                     partition_floor=cfg.shuffle_partitions)
    return agg.map_batches(_finish_batch, batch_format="pyarrow")


def _mem_hint(triples, input_bytes: Optional[int]) -> Optional[int]:
    """Footer bytes (caller-supplied, scaled to in-memory units) or the
    plan's own zero-execution estimate — exact when the triples
    lineage is materialized/read-rooted, the kg_build case."""
    from neo4j_document_pipeline_ray.stages.grouped import (
        FOOTER_TO_ARROW,
        plan_size_estimate,
    )

    if input_bytes is not None:
        return input_bytes * FOOTER_TO_ARROW
    return plan_size_estimate(triples, source_ok=True)


def build_nodes(
    triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None,
    input_bytes: Optional[int] = None,
) -> "ray.data.Dataset":
    """triples (chunk-level ok) -> nodes(entity_id, label, name, norm_key, node_key)."""
    cfg = cfg or PipelineConfig()
    return finalize_nodes(shard_node_candidates(triples, cfg), cfg,
                          mem_hint=_mem_hint(triples, input_bytes))


def _mention_pairs_batch(batch: pa.Table) -> "pd.DataFrame":
    """Doc-level triples -> deduped (doc_id, entity_id) pairs (both
    endpoints) — vectorized in-batch partial dedup."""
    import pandas as pd

    d = batch.to_pydict()
    df = pd.DataFrame({
        "doc_id": d["doc_id"] + d["doc_id"],
        "entity_id": pd.Series(d["src_id"] + d["dst_id"], dtype="int64"),
    })
    return df.drop_duplicates(["doc_id", "entity_id"])


MENTION_INPUT_COLS = ["doc_id", "src_id", "dst_id"]


def shard_mention_pairs(
    triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None
) -> "ray.data.Dataset":
    """Per-batch deduped (doc_id, entity_id) pairs — the associative
    partial of the mention dedup, writable per shard in stage A."""
    cfg = cfg or PipelineConfig()
    slim = triples.select_columns(MENTION_INPUT_COLS)
    return slim.map_batches(
        _mention_pairs_batch, batch_format="pyarrow", batch_size=cfg.agg_batch_size
    )


def finalize_mentions(
    pairs: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None,
    mem_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    cfg = cfg or PipelineConfig()
    # partitioned by entity_id; every (doc, entity) pair lands whole.
    # mem_hint: in-memory upper bound (pair partials only shrink) —
    # see finalize_nodes.
    return distinct_by(pairs, "entity_id", subset=["doc_id", "entity_id"],
                       num_partitions=None, adaptive=True,
                       size_hint=mem_hint,
                       partition_floor=cfg.shuffle_partitions)


def build_mentions(
    triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None,
    input_bytes: Optional[int] = None,
) -> "ray.data.Dataset":
    """Distinct (doc_id, entity_id) — the MENTIONS/SOURCE provenance edges
    (reference ``ingestMD.py:538-541``), idempotent per pair like MERGE."""
    cfg = cfg or PipelineConfig()
    return finalize_mentions(shard_mention_pairs(triples, cfg), cfg,
                             mem_hint=_mem_hint(triples, input_bytes))


def alias_candidates(
    nodes: "ray.data.Dataset",
    t_num: int = 1,
    t_den: int = 2,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """NEAR-miss alias candidates over canonicalized entity names.

    Construction-time canonicalization merges only EXACT norm_key
    matches (the reference's MERGE-by-name identity, ingestMD.py:
    488-541); names that differ by a token ("acme corp" vs "acme
    corporation inc") stay distinct entities.  This surfaces those
    residual pairs for curation: token-set Jaccard >= t_num/t_den over
    the normalized name, computed with the prefix-filtered SSJoin
    kernel (extras/dedup.py:prefix_jaccard_pairs) — uncapped, exact,
    hash-partitioned, no all-pairs stage, so it holds at a 10^9-entity
    node table.  Returns ``(entity_a, entity_b, n_shared,
    jaccard_scaled)`` with entity_a < entity_b.
    """
    import pyarrow as pa

    from neo4j_document_pipeline_ray.extras.dedup import (
        prefix_jaccard_pairs,
    )

    def as_docs(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["entity_id"], "text": t["norm_key"]})

    pairs = prefix_jaccard_pairs(
        nodes.select_columns(["entity_id", "norm_key"])
             .map_batches(as_docs, batch_format="pyarrow"),
        n=1, t_num=t_num, t_den=t_den, num_partitions=num_partitions)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            "entity_a": t["doc_a"],
            "entity_b": t["doc_b"],
            "n_shared": t["n_shared"],
            "jaccard_scaled": t["jaccard_scaled"],
        })

    return pairs.map_batches(out, batch_format="pyarrow")
