"""Stage 6: edge aggregation (MERGE-equivalent upsert + source accumulation).

Reference semantics (``ingestMD.py:513-546``):

* edge identity = ``(subject node, rel_type, object node)``, extended by
  ``term`` for distribution edges (``apoc.merge.relationship(sub, label,
  {term}, {}, pl)``, ``ingestMD.py:614``);
* ``sources`` accumulates the distinct doc_ids that asserted the edge
  (append-if-absent, ``ingestMD.py:520-525``) — made deterministic here
  as the *sorted* distinct list (FIXTURES.md invariant 3);
* ``embedding``, ``source_text_full`` and ``count`` are last-write-wins
  in the reference (ingestion-order dependent); here "last" is the
  deterministic maximum of ``(doc_id, chunk_idx)`` over contributing
  mentions — documented divergence, invisible to set-level P/R.

Two-phase aggregation: a stateless ``map_batches`` partial pass folds
each batch down to one row per edge key (hub edges collapse before the
exchange — the skew mitigation), then a ``groupby(edge_key).map_groups``
merge unions source lists and applies the deterministic-last rule.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig

_EDGE_COLS = [
    ("edge_key", pa.string()),
    ("src_id", pa.int64()), ("dst_id", pa.int64()), ("rel_type", pa.string()),
    ("term", pa.string()), ("object_kind", pa.string()),
    ("src_norm_key", pa.string()), ("dst_norm_key", pa.string()),
    ("sources_json", pa.string()),   # partial: sorted distinct doc_ids as JSON
    ("ord", pa.string()),            # partial: max (doc_id, chunk_idx) seen
    ("source_text", pa.string()), ("count", pa.int64()),
    ("rel_key", pa.string()), ("start", pa.string()), ("end", pa.string()),
]


def _partial_edges_batch(batch: pa.Table) -> pa.Table:
    d = batch.to_pydict()
    acc: Dict[str, dict] = {}
    for i in range(batch.num_rows):
        term = d["term"][i] or ""
        key = f"{d['src_id'][i]}|{d['rel_type'][i]}|{d['dst_id'][i]}|{term}"
        ordv = f"{d['doc_id'][i]}:{d['chunk_idx'][i]:06d}"
        ent = acc.get(key)
        if ent is None:
            acc[key] = {
                "src_id": d["src_id"][i], "dst_id": d["dst_id"][i],
                "rel_type": d["rel_type"][i], "term": d["term"][i],
                "object_kind": d["object_kind"][i],
                "src_norm_key": d["src_norm_key"][i],
                "dst_norm_key": d["dst_norm_key"][i],
                "sources": {d["doc_id"][i]}, "ord": ordv,
                "source_text": d["src_text"][i], "count": d["count"][i],
                "rel_key": d["rel_key"][i],
                "start": d["start"][i], "end": d["end"][i],
            }
        else:
            ent["sources"].add(d["doc_id"][i])
            if ordv > ent["ord"]:
                ent["ord"] = ordv
                ent["source_text"] = d["src_text"][i]
                ent["count"] = d["count"][i]
                ent["rel_key"] = d["rel_key"][i]
                ent["object_kind"] = d["object_kind"][i]
                ent["start"] = d["start"][i]
                ent["end"] = d["end"][i]
    cols: Dict[str, List] = {name: [] for name, _ in _EDGE_COLS}
    for key, ent in acc.items():
        cols["edge_key"].append(key)
        cols["sources_json"].append(json.dumps(sorted(ent["sources"])))
        for name in ("src_id", "dst_id", "rel_type", "term", "object_kind",
                     "src_norm_key", "dst_norm_key", "ord", "source_text",
                     "count", "rel_key", "start", "end"):
            cols[name].append(ent[name])
    return pa.table({name: pa.array(cols[name], typ) for name, typ in _EDGE_COLS})


_OUT_COLS = ["src_id", "dst_id", "rel_type", "term", "object_kind",
             "src_norm_key", "dst_norm_key", "sources_json", "source_text",
             "count", "rel_key", "start", "end"]


def _merge_edges_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized merge of ALL edge groups within one hash partition.

    last-wins fields come from the max-``ord`` partial row per edge key;
    ``sources`` is the sorted union of the partials' doc-id lists.
    ``sources_json`` stays JSON-serialized until after the embedding
    join (Arrow's hash join cannot carry list-typed payload columns).
    """
    df = df.sort_values(["edge_key", "ord"], kind="mergesort")
    last = df.groupby("edge_key", sort=False).tail(1).set_index("edge_key")

    exploded = df[["edge_key"]].assign(src=df["sources_json"].map(json.loads)).explode("src")
    uniq = exploded.drop_duplicates().sort_values(["edge_key", "src"], kind="mergesort")
    srcs = uniq.groupby("edge_key", sort=False)["src"].agg(list).map(json.dumps)

    last = last.copy()
    last["sources_json"] = srcs
    return last.reset_index()[_OUT_COLS]


def decode_sources_batch(batch: pa.Table) -> pa.Table:
    """sources_json -> sources list<string> (post-join restore)."""
    srcs = [json.loads(s) for s in batch["sources_json"].to_pylist()]
    idx = batch.schema.get_field_index("sources_json")
    return batch.set_column(idx, "sources_json", pa.array(srcs, pa.list_(pa.string()))).rename_columns(
        [n if n != "sources_json" else "sources" for n in batch.schema.names]
    )


def build_edges(triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    """Doc-level triples -> aggregated edges table."""
    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    cfg = cfg or PipelineConfig()
    partial = triples.map_batches(
        _partial_edges_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    types = dict(_EDGE_COLS)
    out_schema = pa.schema([(c, types[c]) for c in _OUT_COLS])
    return partitioned_group_map(
        partial, "edge_key", _merge_edges_partition, cfg.shuffle_partitions,
        out_schema=out_schema,
    )
