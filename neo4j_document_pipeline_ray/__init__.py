"""Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the ingestion capabilities of the
reference GraphRAG service (haja-k/neo4j-document-pipeline) as a
distributed batch pipeline over ``ray.data.Dataset``:

    pages (Parquet web pages) -> HTML->text extraction -> chunking
    -> triple extraction (actor pool) -> triple normalization
    -> entity linking / canonicalization (shuffle) -> edge aggregation
    -> node/edge/mention Parquet graph snapshot.

The reference processes one markdown file at a time through a Celery
worker and writes each triple into Neo4j with ``MERGE``
(reference ``ingestMD.py:730-780``).  Here every stage is a vectorized
``map_batches`` over Arrow batches, stateful stages (extractor model,
embedder) are actor pools, and the Neo4j upserts become explicit
groupby shuffles materialized as Parquet tables partitioned by
entity-id range.
"""

from neo4j_document_pipeline_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
