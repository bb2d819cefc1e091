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
exchange — the skew mitigation), then a partition-wise vectorized merge
unions source lists and applies the deterministic-last rule.

The provenance snippet (``source_text``, <=1 KB) rides the exchange
inline: the in-batch partial keeps one row per edge key per batch, so
the exchanged volume is bounded by distinct edges x batches, not by
mentions.  (A content-hash + snippet-table join variant was measured
~60% slower end-to-end at bench scale — the extra distinct + join
barriers cost more than the text bytes; revisit if snippets grow.)
"""

from __future__ import annotations

import json
from typing import List, Optional

import pandas as pd
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig

_EXCHANGE_COLS = ["src_id", "dst_id", "rel_type", "term", "object_kind",
                  "src_norm_key", "dst_norm_key", "sources_json", "source_text",
                  "count", "rel_key", "start", "end"]

_EXCHANGE_TYPES = {
    "edge_key": pa.string(), "src_id": pa.int64(), "dst_id": pa.int64(),
    "rel_type": pa.string(), "term": pa.string(), "object_kind": pa.string(),
    "src_norm_key": pa.string(), "dst_norm_key": pa.string(),
    "sources_json": pa.string(), "source_text": pa.string(), "ord": pa.string(),
    "count": pa.int64(), "rel_key": pa.string(),
    "start": pa.string(), "end": pa.string(),
}


def _merge_edges_df(df: pd.DataFrame, out_cols: List[str]) -> pd.DataFrame:
    """Vectorized merge of ALL edge groups in one frame.

    last-wins fields come from the max-``ord`` row per edge key;
    ``sources`` is the sorted union of the rows' doc-id lists.
    ``sources_json`` stays JSON-serialized until after the joins
    (Arrow's hash join cannot carry list-typed payload columns).
    """
    df = df.sort_values(["edge_key", "ord"], kind="mergesort")
    last = df.groupby("edge_key", sort=False).tail(1).set_index("edge_key")

    exploded = df[["edge_key"]].assign(src=df["sources_json"].map(json.loads)).explode("src")
    uniq = exploded.drop_duplicates().sort_values(["edge_key", "src"], kind="mergesort")
    srcs = uniq.groupby("edge_key", sort=False)["src"].agg(list).map(json.dumps)

    last = last.copy()
    last["sources_json"] = srcs
    return last.reset_index()[out_cols]


def _partial_edges_batch(batch: pa.Table) -> pd.DataFrame:
    """In-batch partial aggregation (vectorized): one row per edge key
    leaves the batch, so hub edges collapse before the exchange."""
    df = batch.to_pandas()
    df = df.rename(columns={"src_text": "source_text"})
    df["count"] = df["count"].astype("Int64")
    # str() of None is "None" in the scalar path; astype(str) matches
    df["edge_key"] = (
        df["src_id"].astype("int64").astype(str) + "|"
        + df["rel_type"].astype(str) + "|"
        + df["dst_id"].astype("int64").astype(str) + "|"
        + df["term"].fillna("")
    )
    df["ord"] = df["doc_id"] + ":" + df["chunk_idx"].astype("int64").map("{:06d}".format)
    df["sources_json"] = '["' + df["doc_id"] + '"]'  # doc_id is hex: JSON-safe
    return _merge_edges_df(df, ["edge_key"] + _EXCHANGE_COLS + ["ord"])


def _merge_edges_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Final merge of the partial rows of one hash partition."""
    return _merge_edges_df(df, _EXCHANGE_COLS)


def decode_sources_batch(batch: pa.Table) -> pa.Table:
    """sources_json -> sources list<string> (post-join restore)."""
    srcs = [json.loads(s) for s in batch["sources_json"].to_pylist()]
    idx = batch.schema.get_field_index("sources_json")
    return batch.set_column(idx, "sources_json", pa.array(srcs, pa.list_(pa.string()))).rename_columns(
        [n if n != "sources_json" else "sources" for n in batch.schema.names]
    )


def build_edges(triples: "ray.data.Dataset", cfg: Optional[PipelineConfig] = None) -> "ray.data.Dataset":
    """Doc-level triples -> aggregated edges table (with ``source_text``)."""
    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    cfg = cfg or PipelineConfig()
    partial = triples.map_batches(
        _partial_edges_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    out_schema = pa.schema([(c, _EXCHANGE_TYPES[c]) for c in _EXCHANGE_COLS])
    return partitioned_group_map(
        partial, "edge_key", _merge_edges_partition, cfg.shuffle_partitions,
        out_schema=out_schema,
    )
