"""Stage 7: embeddings — cluster-global distinct-before-embed + actor pool.

The reference embeds three text keys per triple — ``"{Type}:{name}"``
for both endpoints and ``"{s} {p} {o}"`` for the relation
(``ingestMD.py:252-265``) — through an unbounded per-process dict cache
(``_emb_cache``, ``ingestMD.py:222-223``).  That cache is what keeps a
head entity ("United States") from being embedded once per mentioning
chunk, but it is per-worker and unbounded.

Here the dedup is explicit and cluster-global: a ``groupby(text_key)``
distinct over the (sub_key, obj_key, rel_key) columns feeds each unique
key to the embedder exactly once, and the resulting ``embeddings``
table is hash-joined back onto the final nodes/edges — so embedding
vectors (the widest payload after raw HTML) never ride through the
entity/edge shuffles.

The embedder itself is an actor-pool ``map_batches`` stage: model load
happens once per actor in ``__init__`` (the analog of the reference's
module-global vLLM HTTP client, ``ingestMD.py:225-235``).  The default
backend is a deterministic seeded-Gaussian hash projection (unit-norm,
fixed dim) — no network exists here; an HTTP/vLLM backend plugs into
the same protocol.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Protocol

import numpy as np
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig


class EmbedderBackend(Protocol):
    dim: int

    def embed(self, texts: List[str]) -> np.ndarray: ...


class HashEmbedder:
    """Deterministic stand-in for the vLLM/Qwen endpoint (``ingestMD.py:237-250``).

    vector(text) = unit-normalized standard normal draw seeded by
    sha256(text) — stable across processes, machines and runs.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed(self, texts: List[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode("utf-8")).digest()[:8], "little")
            v = np.random.default_rng(seed).standard_normal(self.dim)
            out[i] = (v / np.linalg.norm(v)).astype(np.float32)
        return out


class Embedder:
    """Actor-pool stage: batches of (text_key) in, (text_key, embedding) out."""

    def __init__(self, backend: Optional[EmbedderBackend] = None, dim: int = 64):
        self._backend = backend or HashEmbedder(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text_key"].to_pylist()
        vecs = self._backend.embed(texts)
        # float32 bytes, not list<float32>: Arrow's hash join (used to
        # attach embeddings to nodes/edges) does not support list-typed
        # payload columns; decode_embeddings() restores the list column
        # after the last join.
        return pa.table(
            {
                "text_key": batch["text_key"],
                "embedding": pa.array([v.tobytes() for v in vecs], pa.binary()),
            }
        )


_DEFAULT_EMBEDDER: "Embedder | None" = None


def decode_embeddings_batch(batch: pa.Table) -> pa.Table:
    """binary float32 payload -> list<float32> column (post-join restore)."""
    vecs = [
        np.frombuffer(b, dtype=np.float32) if b is not None else None
        for b in batch["embedding"].to_pylist()
    ]
    idx = batch.schema.get_field_index("embedding")
    return batch.set_column(idx, "embedding", pa.array(vecs, pa.list_(pa.float32())))


def _keys_batch(batch: pa.Table) -> pa.Table:
    """Unpivot (sub_key, obj_key, rel_key) to rows, deduped within batch."""
    seen = set()
    out: List[str] = []
    d = batch.to_pydict()
    for k in d["sub_key"] + d["obj_key"] + d["rel_key"]:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return pa.table({"text_key": pa.array(out, pa.string())})


def build_embeddings(
    triples: "ray.data.Dataset",
    cfg: Optional[PipelineConfig] = None,
    backend: Optional[EmbedderBackend] = None,
) -> "ray.data.Dataset":
    """Chunk-level triples -> embeddings(text_key, embedding), one row per distinct key."""
    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    cfg = cfg or PipelineConfig()
    keys = triples.select_columns(["sub_key", "obj_key", "rel_key"]).map_batches(
        _keys_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    distinct = distinct_by(keys, "text_key", num_partitions=cfg.shuffle_partitions)
    if backend is None:
        # stateless hash backend: plain tasks on the warm worker pool
        # (no actor-process spawn per run); real model/HTTP backends
        # take the actor-pool path below
        dim = cfg.embed_dim

        def embed_batch(batch: pa.Table) -> pa.Table:
            global _DEFAULT_EMBEDDER
            if _DEFAULT_EMBEDDER is None or _DEFAULT_EMBEDDER._backend.dim != dim:
                _DEFAULT_EMBEDDER = Embedder(dim=dim)
            return _DEFAULT_EMBEDDER(batch)

        return distinct.map_batches(
            embed_batch,
            batch_format="pyarrow",
            batch_size=cfg.embed_batch_size,
        )
    return distinct.map_batches(
        Embedder,
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=cfg.embed_concurrency,
        fn_constructor_kwargs={"backend": backend},
    )


def embed_column(
    ds: "ray.data.Dataset",
    key_col: str,
    cfg: Optional[PipelineConfig] = None,
    backend: Optional[EmbedderBackend] = None,
) -> "ray.data.Dataset":
    """Append ``embedding: list<float32>`` computed from ``key_col``.

    Post-aggregation tables (nodes, edges) carry their embedding key
    exactly once per row, so embedding them directly is the zero-shuffle
    path: no distinct exchange and no join-back — the stage streams.
    The global distinct-before-embed (``build_embeddings``) remains the
    right shape when the same key recurs across rows (raw triples) or
    when embeddings must be materialized as their own table.

    Stateless default backend -> plain tasks; custom (model/HTTP)
    backend -> actor pool, loaded once per actor.
    """
    cfg = cfg or PipelineConfig()
    dim = cfg.embed_dim

    def _append(batch: pa.Table, be) -> pa.Table:
        vecs = be.embed([k or "" for k in batch[key_col].to_pylist()])
        return batch.append_column(
            "embedding",
            pa.array([v for v in vecs], pa.list_(pa.float32())),
        )

    if backend is None:

        def embed_rows(batch: pa.Table) -> pa.Table:
            global _DEFAULT_EMBEDDER
            if _DEFAULT_EMBEDDER is None or _DEFAULT_EMBEDDER._backend.dim != dim:
                _DEFAULT_EMBEDDER = Embedder(dim=dim)
            return _append(batch, _DEFAULT_EMBEDDER._backend)

        return ds.map_batches(
            embed_rows, batch_format="pyarrow", batch_size=cfg.embed_batch_size
        )

    class _RowEmbedder:
        def __init__(self, be):
            self._be = be

        def __call__(self, batch: pa.Table) -> pa.Table:
            return _append(batch, self._be)

    return ds.map_batches(
        _RowEmbedder,
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=cfg.embed_concurrency,
        fn_constructor_kwargs={"be": backend},
    )
