"""Stage 1: pages -> docs (HTML -> canonical text, content identity).

Replaces the reference's file read + canonicalization + doc-id
assignment (``ingestMD.py:734-737``): ``doc_id = sha256(canonical
text)``, ``title`` = the markdown file stem — here the last url path
segment.

Stateless ``map_batches`` over Arrow batches.  The wide ``html`` binary
column is consumed and *dropped inside this stage* so every downstream
exchange moves only light rows (url, doc_id, text).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.functions.html_extract import html_to_text
from neo4j_document_pipeline_ray.functions.textnorm import sha256_hex


def title_from_url(url: str) -> str:
    """Analog of the reference's ``Path(path).stem`` (ingestMD.py:732)."""
    tail = url.rstrip("/").rsplit("/", 1)[-1]
    return tail.rsplit(".", 1)[0] if "." in tail else tail


def extract_text_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = [html_to_text(h.decode("utf-8", errors="replace")) for h in htmls]
    return pa.table(
        {
            "doc_id": pa.array([sha256_hex(t) for t in texts], pa.string()),
            "url": pa.array(urls, pa.string()),
            "title": pa.array([title_from_url(u) for u in urls], pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def extract_docs(pages: "ray.data.Dataset", cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    return pages.map_batches(
        extract_text_batch,
        batch_format="pyarrow",
        batch_size=cfg.map_batch_size,
    )
