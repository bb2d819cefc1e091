from neo4j_document_pipeline_ray.sources.corpus import (
    ensure_corpus,
    generate_corpus,
    n_pages_for_sf,
)
from neo4j_document_pipeline_ray.sources.pages import read_pages

__all__ = ["ensure_corpus", "generate_corpus", "n_pages_for_sf", "read_pages"]
