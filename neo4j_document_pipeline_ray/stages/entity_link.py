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
from ray.data.aggregate import Min

from neo4j_document_pipeline_ray.config import PipelineConfig

# \x1f (unit separator) sorts below all printable chars, so
# min(name \x1f label) == lexicographic min of the (name, label) pair.
_SEP = "\x1f"


def _candidates_batch(batch: pa.Table) -> pa.Table:
    """Both triple endpoints -> deduped (entity_id, norm_key, rep_key) candidates."""
    ids, keys, reps = [], [], []
    seen = set()
    d = batch.to_pydict()
    for eid, nk, name, label in zip(
        d["src_id"] + d["dst_id"],
        d["src_norm_key"] + d["dst_norm_key"],
        d["subject"] + d["object"],
        d["subject_type"] + d["object_type"],
    ):
        rep = f"{name}{_SEP}{label}"
        k = (eid, rep)
        if k in seen:
            continue
        seen.add(k)
        ids.append(eid)
        keys.append(nk)
        reps.append(rep)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.int64()),
            "norm_key": pa.array(keys, pa.string()),
            "rep_key": pa.array(reps, pa.string()),
        }
    )


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


def build_nodes(triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    """triples (chunk-level ok) -> nodes(entity_id, label, name, norm_key, node_key)."""
    cfg = cfg or PipelineConfig()
    cands = triples.map_batches(
        _candidates_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    agg = cands.groupby("entity_id").aggregate(
        Min("rep_key", alias_name="rep_key"),
        Min("norm_key", alias_name="norm_key"),
    )
    return agg.map_batches(_finish_batch, batch_format="pyarrow")


def _mention_pairs_batch(batch: pa.Table) -> pa.Table:
    """Doc-level triples -> deduped (doc_id, entity_id) pairs (both endpoints)."""
    docs, ids = [], []
    seen = set()
    d = batch.to_pydict()
    for doc_id, eid in zip(d["doc_id"] + d["doc_id"], d["src_id"] + d["dst_id"]):
        k = (doc_id, eid)
        if k in seen:
            continue
        seen.add(k)
        docs.append(doc_id)
        ids.append(eid)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.string()),
            "entity_id": pa.array(ids, pa.int64()),
        }
    )


def build_mentions(triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    """Distinct (doc_id, entity_id) — the MENTIONS/SOURCE provenance edges
    (reference ``ingestMD.py:538-541``), idempotent per pair like MERGE."""
    cfg = cfg or PipelineConfig()
    pairs = triples.map_batches(
        _mention_pairs_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    from ray.data.aggregate import Count

    deduped = pairs.groupby(["doc_id", "entity_id"]).aggregate(Count(alias_name="_n"))
    return deduped.drop_columns(["_n"])
