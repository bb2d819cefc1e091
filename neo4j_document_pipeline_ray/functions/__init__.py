from neo4j_document_pipeline_ray.functions.textnorm import (
    canonicalize_text,
    clean_name,
    norm_space,
    normalize_name_for_key,
    safe_label,
    sha256_hex,
    stable_id,
    to_json_compact,
)

__all__ = [
    "canonicalize_text",
    "clean_name",
    "norm_space",
    "normalize_name_for_key",
    "safe_label",
    "sha256_hex",
    "stable_id",
    "to_json_compact",
]
