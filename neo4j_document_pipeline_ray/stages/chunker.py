"""Stage 2: docs -> chunks (greedy paragraph packing, content-addressed).

One document row fans out to N chunk rows
``(doc_id, chunk_idx, chunk_id, text)`` with
``chunk_id = sha256(chunk text)`` (reference ``ingestMD.py:741-745``).

Implemented as a flat-mapping ``map_batches`` (not per-row ``flat_map``)
so the chunker stays vectorized at the batch level; the tokenizer is
module state, compiled once per worker process (the reference's
module-global tiktoken encoder, ``ingestMD.py:32``).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.functions.chunking import chunk_text
from neo4j_document_pipeline_ray.functions.textnorm import sha256_hex


def make_chunk_batch(cfg: PipelineConfig):
    def chunk_batch(batch: pa.Table) -> pa.Table:
        out: Dict[str, List] = {"doc_id": [], "chunk_idx": [], "chunk_id": [], "text": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for idx, chunk in enumerate(chunk_text(text, cfg.chunk_size, cfg.chunk_overlap)):
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(idx)
                out["chunk_id"].append(sha256_hex(chunk))
                out["text"].append(chunk)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "chunk_idx": pa.array(out["chunk_idx"], pa.int32()),
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    return chunk_batch


def chunk_docs(docs: "ray.data.Dataset", cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    return docs.map_batches(
        make_chunk_batch(cfg),
        batch_format="pyarrow",
        batch_size=max(64, cfg.map_batch_size // 8),
    )
