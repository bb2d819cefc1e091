"""The flagship pipeline: pages -> KG tables.

Distributed re-expression of the reference's per-file ingestion loop
(``ingestMD.py:730-797``):

    read_parquet(pages)
      -> map_batches(html->text, doc_id)            [stateless]
      -> groupby(doc_id) first                      [doc dedup, A6]
      -> map_batches(chunker)                       [stateless flat-map]
      -> groupby(chunk_id) distinct                 [A1: extract once per chunk]
      -> map_batches(TripleExtractor, actor pool)   [ST2]
      -> map_batches(normalize routing)             [M7]
      -> join back to (doc, chunk) membership       [J1]
      -> entity shuffle (A3/A4) / edge shuffle (A5) / mentions (A7)
      -> distinct-key embedding (A2) joined onto nodes & edges (J2)

Every exchange moves light rows: raw HTML is dropped in stage 1,
embeddings are computed once per distinct key and joined on at the end,
and both wide groupbys are fed by in-batch partial aggregation.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.stages.grouped import broadcast_join, min_by_key, safe_join
from neo4j_document_pipeline_ray.stages.chunker import chunk_docs
from neo4j_document_pipeline_ray.stages.edge_agg import build_edges, decode_sources_batch
from neo4j_document_pipeline_ray.stages.embed import (
    EmbedderBackend,
    build_embeddings,
    decode_embeddings_batch,
    embed_column,
)
from neo4j_document_pipeline_ray.stages.entity_link import build_mentions, build_nodes
from neo4j_document_pipeline_ray.stages.extract_text import extract_docs, title_from_url
from neo4j_document_pipeline_ray.stages.normalize import normalize_triples
from neo4j_document_pipeline_ray.stages.triple_extract import (
    TripleExtractorBackend,
    extract_triples,
)


def _retitle_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": batch["url"],
            "title": pa.array([title_from_url(u) for u in urls], pa.string()),
            "text": batch["text"],
        }
    )


def dedupe_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per doc_id; representative url = min(url) (the reference
    MERGEs Documents on doc_id and keeps first-seen title/path via
    coalesce, ``ingestMD.py:344-350`` — made deterministic here)."""
    agg = min_by_key(docs.select_columns(["doc_id", "url", "text"]), "doc_id")
    return agg.map_batches(_retitle_batch, batch_format="pyarrow")


def build_kg(
    pages: "ray.data.Dataset",
    cfg: Optional[PipelineConfig] = None,
    extract_backend: Optional[TripleExtractorBackend] = None,
    embed_backend: Optional[EmbedderBackend] = None,
    with_embeddings: bool = True,
    materialize_intermediates: bool = True,
) -> Dict[str, "ray.data.Dataset"]:
    """Run the full construction pipeline; returns the logical KG tables.

    ``materialize_intermediates`` pins the (small, post-extraction)
    triple tables in the object store so the fan-out into
    nodes/edges/mentions/embeddings does not re-run extraction per
    consumer.  The durable variant of the same idea — parquet stage
    checkpoints with manifests — lives in ``pipelines/snapshot.py``.
    """
    cfg = cfg or PipelineConfig()
    if embed_backend is None:
        from neo4j_document_pipeline_ray.stages.embed import (
            make_embedder_backend,
        )

        embed_backend = make_embedder_backend(cfg)

    docs = dedupe_docs(extract_docs(pages, cfg))
    chunks = chunk_docs(docs, cfg)
    if materialize_intermediates:
        chunks = chunks.materialize()

    membership = chunks.select_columns(["doc_id", "chunk_idx", "chunk_id"])
    uniq_chunks = min_by_key(
        chunks.select_columns(["chunk_id", "text"]), "chunk_id",
        num_partitions=cfg.shuffle_partitions,
    )

    raw = extract_triples(uniq_chunks, cfg, backend=extract_backend)
    norm = normalize_triples(raw, cfg)  # chunk-level
    if materialize_intermediates:
        norm = norm.materialize()

    triples = safe_join(norm, 
        membership,
        join_type="inner",
        num_partitions=cfg.join_partitions,
        on=("chunk_id",),
    )
    if materialize_intermediates:
        triples = triples.materialize()

    nodes = build_nodes(norm, cfg)
    mentions = build_mentions(triples, cfg)
    edges = build_edges(triples, cfg)

    embeddings = None
    if with_embeddings:
        # nodes/edges carry each key exactly once post-aggregation, so
        # embeddings attach directly (zero-shuffle); the distinct-key
        # embeddings TABLE (the reference's _emb_cache as data) is
        # produced independently for consumers that want it.
        nodes = embed_column(nodes, "node_key", cfg, backend=embed_backend)
        edges = embed_column(edges, "rel_key", cfg, backend=embed_backend)
        embeddings = build_embeddings(norm, cfg, backend=embed_backend)
    edges = edges.map_batches(decode_sources_batch, batch_format="pyarrow")

    out: Dict[str, "ray.data.Dataset"] = {
        "docs": docs,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
        "mentions": mentions,
    }
    if embeddings is not None:
        out["embeddings"] = embeddings.map_batches(
            decode_embeddings_batch, batch_format="pyarrow"
        )
    return out
