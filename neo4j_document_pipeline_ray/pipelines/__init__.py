from neo4j_document_pipeline_ray.pipelines.kg_build import build_kg

__all__ = ["build_kg"]
