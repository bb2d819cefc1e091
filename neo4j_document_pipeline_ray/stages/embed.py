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

import time
from typing import Any, Callable, List, Optional, Protocol

import numpy as np
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig


class EmbedderBackend(Protocol):
    dim: int

    def embed(self, texts: List[str]) -> np.ndarray: ...


_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_M64 = (1 << 64) - 1
_EMB_SCALE = float(2.0 ** -64)


def _fnv1a_cp(h: int, s: str) -> int:
    """FNV-1a 64 over UNICODE CODE POINTS (matches DuckDB ``ascii()``,
    the same convention as the minhash SQL mirror in extras/dedup.py)."""
    for c in s:
        h = ((h ^ ord(c)) * _FNV_PRIME) & _M64
    return h


# splitmix64 constants (Steele/Lea/Flood, public domain; the standard
# 64-bit finalizer — full avalanche per component index)
_SM_GOLDEN = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB


class HashEmbedder:
    """Deterministic stand-in for the vLLM/Qwen endpoint (``ingestMD.py:237-250``).

    component_j(text) = float32(int64 view of
    splitmix64(FNV-1a-64(text) + j * golden)) * 2**-64 — pure integer
    hash math followed by two EXACT float steps (a correctly-rounded
    int64→float32 conversion and a power-of-two scale), so the vector
    is bit-replayable in DuckDB SQL (:func:`hash_embedding_list_sql`)
    and the embeddings table is oracle-checkable end to end.  The
    splitmix64 finalizer gives full per-component avalanche (plain
    FNV-with-suffix leaves the top bits correlated across j).

    Vectors are NOT unit-normalized (a float normalize would not be
    SQL-replayable bit-for-bit); every cosine consumer in this repo
    (``graphrag._vector_score_table``, ``extras/similarity``,
    ``graphrag.mmr_select``) normalizes defensively, so scores are
    identical to a pre-normalized embedder's.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim
        self._js = np.arange(dim, dtype=np.uint64)

    def embed(self, texts: List[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        scale = np.float32(_EMB_SCALE)
        golden = np.uint64(_SM_GOLDEN)
        c1, c2 = np.uint64(_SM_C1), np.uint64(_SM_C2)
        s30, s27, s31 = np.uint64(30), np.uint64(27), np.uint64(31)
        with np.errstate(over="ignore"):
            for i, t in enumerate(texts):
                base = np.uint64(_fnv1a_cp(_FNV_OFFSET, t or ""))
                z = base + self._js * golden
                z = (z ^ (z >> s30)) * c1
                z = (z ^ (z >> s27)) * c2
                z = z ^ (z >> s31)
                out[i] = z.view(np.int64).astype(np.float32) * scale
        return out


def hash_embedding_list_sql(text_expr: str, dim: int = 64) -> str:
    """DuckDB ``DOUBLE[]`` expression bit-equal to
    ``HashEmbedder(dim).embed([text_expr])[0]`` (each element is the
    exact float64 widening of the pipeline's float32 component).

    Single-element ``list_transform([x], v -> ...)[1]`` is a
    poor-man's ``let`` binding so each hash stage runs once."""
    m64 = 1 << 64

    fnv = f"""list_reduce(
        list_prepend(CAST({_FNV_OFFSET} AS HUGEINT),
            list_transform(range(1, length({text_expr}) + 1),
                ci -> CAST(ascii(substr({text_expr}, ci, 1)) AS HUGEINT))),
        (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT), CAST(c AS UBIGINT))
                          AS HUGEINT) * {_FNV_PRIME}) % {m64})"""

    def mix(var: str, shift: int, mult: int) -> str:
        # (a * mult) % 2^64 via 32-bit split — a (< 2^64) times the
        # ~2^63.7 splitmix constants would overflow INT128 directly
        a = (f"CAST(xor(CAST({var} AS UBIGINT), "
             f"CAST({var} AS UBIGINT) >> {shift}) AS HUGEINT)")
        b_hi, b_lo = mult >> 32, mult & 0xFFFFFFFF
        return (f"(({a}) * {b_lo} + ((({a}) * {b_hi}) % {1 << 32})"
                f" * {1 << 32}) % {m64}")

    final = (f"CAST(xor(CAST(z2 AS UBIGINT), "
             f"CAST(z2 AS UBIGINT) >> 31) AS HUGEINT)")
    signed = f"CASE WHEN z3 >= {1 << 63} THEN z3 - {m64} ELSE z3 END"
    return f"""list_transform([{fnv}], base ->
      list_transform(range({dim}), j ->
        list_transform([(base + CAST(j AS HUGEINT) * {_SM_GOLDEN}) % {m64}],
          z0 -> list_transform([{mix('z0', 30, _SM_C1)}],
            z1 -> list_transform([{mix('z1', 27, _SM_C2)}],
              z2 -> list_transform([{final}],
                z3 -> CAST(CAST(CAST(({signed}) AS BIGINT) AS FLOAT)
                           AS DOUBLE) / {float(m64)!r}
              )[1])[1])[1])[1]))[1]"""


class HTTPEmbedderBackend:
    """Production HTTP embedding backend with the reference's exact
    resilience semantics (``ingestMD.py:222-250`` ``_embed_with_vllm``
    / ``get_embeddings_for_chunk``; ``graphutil.py:81-153``):

    * one batch POST to ``/embeddings`` per call (OpenAI/vLLM surface:
      ``{"model": ..., "input": [texts]}``), response items re-sorted
      by their ``index`` field before use (``ingestMD.py:242``);
    * each request retries up to ``max_retries`` times with
      exponential backoff 0.5 s, 1 s, 2 s (``graphutil.py:92``);
    * if the batch request exhausts its retries, fall back to
      one-by-one requests so a single poison item cannot sink the
      whole batch (``ingestMD.py:278-284``); items that still fail
      get a ZERO vector (the engine's table needs one row per key;
      zero scores 0 cosine everywhere, the analog of the reference's
      cache-miss skip) and are counted in ``n_failed``;
    * ``session_factory`` builds the HTTP client LAZILY on first use —
      once per embedding ACTOR process, never on the driver
      (``_get_vllm_client``'s module global, ``ingestMD.py:224-235``).
      The client must expose ``post(path, json=...)`` returning an
      object with ``raise_for_status()`` and ``json()`` (httpx
      surface);
    * the embedding dim is PROBED from the first successful response
      (``_EMBED_DIM``, ``ingestMD.py:247-249``) and validated against
      the declared ``dim``.
    """

    def __init__(
        self,
        session_factory: Callable[[], Any],
        model: str = "Qwen/Qwen3-Embedding-8B",
        dim: int = 64,
        max_retries: int = 3,
        base_delay: float = 0.5,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._factory = session_factory
        self._model = model
        self.dim = dim
        # at least one attempt, else _post would "raise last" with
        # last=None (a TypeError masking the misconfiguration)
        self._max_retries = max(1, max_retries)
        self._base_delay = base_delay
        self._sleep = sleep
        self._session = None
        self.n_failed = 0

    def _post(self, texts: List[str]) -> List[List[float]]:
        """One /embeddings request with 3-attempt exponential backoff."""
        if self._session is None:
            self._session = self._factory()
        last: Exception | None = None
        for attempt in range(self._max_retries):
            try:
                resp = self._session.post(
                    "/embeddings",
                    json={"model": self._model, "input": texts},
                )
                resp.raise_for_status()
                data = resp.json().get("data", [])
                data = sorted(data, key=lambda d: d.get("index", 0))
                embs = [d["embedding"] for d in data]
                if not embs or len(embs) != len(texts):
                    raise RuntimeError(
                        f"unexpected embeddings response size: got "
                        f"{len(embs)}, expected {len(texts)}")
                return embs
            except Exception as e:  # noqa: BLE001 — retry any failure
                last = e
                if attempt < self._max_retries - 1:
                    self._sleep(self._base_delay * (2 ** attempt))
        raise last  # type: ignore[misc]

    def embed(self, texts: List[str]) -> np.ndarray:
        try:
            embs: List[Optional[List[float]]] = list(self._post(texts))
        except Exception:
            # batch failed after retries: per-item fallback
            embs = []
            for t in texts:
                try:
                    embs.append(self._post([t])[0])
                except Exception:
                    embs.append(None)
                    self.n_failed += 1
        probe = next((e for e in embs if e is not None), None)
        if probe is not None and len(probe) != self.dim:
            raise RuntimeError(
                f"endpoint returned dim={len(probe)}, configured "
                f"dim={self.dim} (set PipelineConfig.embed_dim to match)")
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, e in enumerate(embs):
            if e is not None:
                out[i] = np.asarray(e, dtype=np.float32)
        return out


def make_embedder_backend(
    cfg: Optional[PipelineConfig] = None,
) -> "EmbedderBackend | None":
    """Resolve ``cfg.embed_backend`` to a backend instance.

    ``"hash"`` -> ``None`` (the pipeline's fast-path default).
    ``"http"`` -> :class:`HTTPEmbedderBackend` whose session factory
    builds an ``httpx.Client`` per actor from
    ``cfg.extra["embed_http"]`` (``base_url``/``api_key``/``model``/
    ``timeout`` — the reference's embedConfig.yaml fields,
    ``ingestMD.py:224-235``).  httpx import happens inside the
    factory, i.e. in the worker, and is gated: this sandbox has no
    network, so "http" is exercised in tests via injected mock
    sessions only.
    """
    cfg = cfg or PipelineConfig()
    if cfg.embed_backend == "hash":
        return None
    if cfg.embed_backend != "http":
        raise ValueError(f"unknown embed_backend: {cfg.embed_backend!r}")
    http_cfg = dict(cfg.extra.get("embed_http", {}))
    base_url = http_cfg.get("base_url")
    if not base_url:
        raise ValueError(
            'embed_backend="http" needs extra["embed_http"]["base_url"]')

    def session_factory():
        import httpx  # deferred: per-actor, env-gated

        headers = {}
        if http_cfg.get("api_key"):
            headers["Authorization"] = f"Bearer {http_cfg['api_key']}"
        return httpx.Client(base_url=base_url, headers=headers,
                            timeout=float(http_cfg.get("timeout", 60.0)))

    return HTTPEmbedderBackend(
        session_factory,
        model=http_cfg.get("model", "Qwen/Qwen3-Embedding-8B"),
        dim=cfg.embed_dim,
    )


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
    input_bytes: Optional[int] = None,
) -> "ray.data.Dataset":
    """Chunk-level triples -> embeddings(text_key, embedding), one row per distinct key.

    ``input_bytes``: footer-bytes upper bound of the three key columns
    (the unpivot + in-batch dedup only shrink) — a corpus-sized key
    exchange then skips the adaptive materialize-to-measure copy and
    derives its partition count from size."""
    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    cfg = cfg or PipelineConfig()
    keys = triples.select_columns(["sub_key", "obj_key", "rel_key"]).map_batches(
        _keys_batch, batch_format="pyarrow", batch_size=cfg.map_batch_size
    )
    from neo4j_document_pipeline_ray.stages.grouped import (
        FOOTER_TO_ARROW,
        plan_size_estimate,
    )

    mem_hint = (input_bytes * FOOTER_TO_ARROW if input_bytes is not None
                else plan_size_estimate(triples, source_ok=True))
    distinct = distinct_by(keys, "text_key",
                           num_partitions=None, adaptive=True,
                           size_hint=mem_hint,
                           partition_floor=cfg.shuffle_partitions)
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
