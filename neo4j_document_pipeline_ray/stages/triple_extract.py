"""Stage 3: distinct chunks -> raw triples (the stateful extraction stage).

Reference behavior being reproduced (``ingestMD.py:744-776``):

* each *distinct* chunk is extracted once — the reference gets this
  from a per-run ``in_memory_chunk_cache`` dict keyed by ``chunk_id``
  (``tasks.py:19-20``); here it is cluster-global: callers dedupe chunks
  on ``chunk_id`` *before* this stage and join results back to every
  (doc, chunk) pair afterwards;
* the primary extractor (an LLM in the reference, a deterministic rule
  extractor here) runs first; only when it returns zero triples for a
  chunk does the markdown-table fallback run — a per-chunk conditional
  kept row-level inside the stage;
* output rows carry the raw extraction contract
  ``{subject, predicate, object, subject_type, object_type}`` with
  ``object`` JSON-serialized when it is a dict (timeline/distribution
  shapes survive Arrow transport as strings + an ``object_is_json``
  flag).

The stage is an actor pool (``map_batches`` with a callable class):
``__init__`` loads the backend once per actor — the analog of the
reference's module-global Azure client (``ingestMD.py:21-26``) — and a
real NER/RE model would be loaded there.  ``concurrency`` and
``batch_size`` come from config so the pool can be sized to the node.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Protocol

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.functions.rules import extract_rule_triples
from neo4j_document_pipeline_ray.functions.tables import extract_table_triples
from neo4j_document_pipeline_ray.functions.textnorm import to_json_compact


class TripleExtractorBackend(Protocol):
    """Any ``chunk text -> list of raw triple dicts`` callable."""

    def __call__(self, text: str) -> List[Dict[str, Any]]: ...


def rule_backend(text: str) -> List[Dict[str, Any]]:
    """Default deterministic backend (stand-in for the temp-0 LLM call)."""
    return extract_rule_triples(text)


LLM_SYSTEM_PROMPT = (
    "You are a graph ontology extractor. From the given policy text, "
    "extract structured triples as JSON. Each triple must contain: "
    "subject, predicate, object, subject_type, object_type. Output only "
    "a valid JSON list."
)


def parse_llm_triples(content: str) -> List[Dict[str, Any]]:
    """The reference's response-parse hardening (``ingestMD.py:140-156``):
    strip a leading code fence (and an immediately following ``json``
    language tag), strip a trailing fence, slice to the outermost
    ``[`` ... ``]``, tolerate surrounding prose, and return ``[]`` on
    anything that still fails to parse — a malformed model response
    must never poison the batch."""
    import json

    try:
        content = (content or "").strip()
        if content.startswith("```"):
            content = content.split("```", 1)[-1]
        if content.startswith("json"):
            content = content[4:]
        if content.endswith("```"):
            content = content[:-3]
        start, end = content.find("["), content.rfind("]")
        if start != -1 and end != -1:
            content = content[start:end + 1]
        triples = json.loads(content)
        if not isinstance(triples, list):
            return []
        return [t for t in triples if isinstance(t, dict)]
    except Exception:
        return []


class LLMTripleBackend:
    """Chat-completion extraction backend (``ingestMD.py:123-156``).

    ``client_factory`` builds the HTTP/SDK client; it is called LAZILY
    on first use, i.e. once per extraction actor process — the analog
    of the reference's module-global Azure client (``ingestMD.py:21-26``)
    — never on the driver, so credentials/connections live where the
    work runs.  The client must expose the OpenAI-style
    ``chat.completions.create`` surface.  A request failure returns
    ``[]`` for that chunk, exactly like the reference's
    ``except -> []``.
    """

    def __init__(self, client_factory: Callable[[], Any],
                 model: str = "extraction-model", temperature: float = 0.0):
        self._factory = client_factory
        self._model = model
        self._temperature = temperature
        self._client = None

    def __call__(self, text: str) -> List[Dict[str, Any]]:
        if self._client is None:
            self._client = self._factory()
        try:
            resp = self._client.chat.completions.create(
                model=self._model,
                messages=[
                    {"role": "system", "content": LLM_SYSTEM_PROMPT},
                    {"role": "user", "content": f"Text:\n{text}"},
                ],
                temperature=self._temperature,
            )
            content = (resp.choices[0].message.content or "")
        except Exception:
            return []
        return parse_llm_triples(content)


def make_llm_backend(
    client_factory: Callable[[], Any], **kwargs: Any
) -> TripleExtractorBackend:
    """Build the chat-completion backend; pass to
    :func:`extract_triples` (it runs as an actor pool)."""
    return LLMTripleBackend(client_factory, **kwargs)


class TripleExtractor:
    """Actor-pool stage: batches of distinct chunks in, raw triples out."""

    def __init__(self, backend: TripleExtractorBackend | None = None):
        # once per actor: load/compile the extraction model
        self._backend = backend or rule_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        # provenance columns pass through when extraction runs per
        # (doc, chunk) without the distinct-chunk shuffle
        passthrough = [c for c in ("doc_id", "chunk_idx") if c in batch.schema.names]
        out: Dict[str, List] = {
            "chunk_id": [], "subject": [], "predicate": [], "object": [],
            "object_is_json": [], "subject_type": [], "object_type": [],
            "used_fallback": [], "src_text": [],
            **{c: [] for c in passthrough},
        }
        pt_cols = {c: batch[c].to_pylist() for c in passthrough}
        for i, (chunk_id, text) in enumerate(
            zip(batch["chunk_id"].to_pylist(), batch["text"].to_pylist())
        ):
            triples = self._backend(text)
            used_fallback = False
            if not triples:
                # fallback only on empty primary result (ingestMD.py:764-776)
                triples = extract_table_triples(text)
                used_fallback = True
            for t in triples:
                if not isinstance(t, dict):
                    continue
                obj = t.get("object")
                is_json = isinstance(obj, (dict, list))
                out["chunk_id"].append(chunk_id)
                out["subject"].append(_as_str(t.get("subject")))
                out["predicate"].append(_as_str(t.get("predicate")))
                out["object"].append(to_json_compact(obj) if is_json else _as_str(obj))
                out["object_is_json"].append(is_json)
                out["subject_type"].append(_as_str(t.get("subject_type")))
                out["object_type"].append(_as_str(t.get("object_type")))
                out["used_fallback"].append(used_fallback)
                out["src_text"].append(text)
                for c in passthrough:
                    out[c].append(pt_cols[c][i])
        res = {
            "chunk_id": pa.array(out["chunk_id"], pa.string()),
            "subject": pa.array(out["subject"], pa.string()),
            "predicate": pa.array(out["predicate"], pa.string()),
            "object": pa.array(out["object"], pa.string()),
            "object_is_json": pa.array(out["object_is_json"], pa.bool_()),
            "subject_type": pa.array(out["subject_type"], pa.string()),
            "object_type": pa.array(out["object_type"], pa.string()),
            "used_fallback": pa.array(out["used_fallback"], pa.bool_()),
            "src_text": pa.array(out["src_text"], pa.string()),
        }
        for c in passthrough:
            res[c] = pa.array(
                out[c], pa.int32() if c == "chunk_idx" else pa.string()
            )
        return pa.table(res)


def _as_str(x: Any) -> str | None:
    if x is None:
        return None
    return x if isinstance(x, str) else str(x)


_DEFAULT_EXTRACTOR: TripleExtractor | None = None


def _extract_batch_default(batch: pa.Table) -> pa.Table:
    """Stateless task path: one module-level extractor per worker
    process (reused across tasks — no per-run actor spawn)."""
    global _DEFAULT_EXTRACTOR
    if _DEFAULT_EXTRACTOR is None:
        _DEFAULT_EXTRACTOR = TripleExtractor()
    return _DEFAULT_EXTRACTOR(batch)


def extract_triples(
    distinct_chunks: "ray.data.Dataset",
    cfg: PipelineConfig | None = None,
    backend: TripleExtractorBackend | None = None,
) -> "ray.data.Dataset":
    """Run the extractor over distinct chunks ``(chunk_id, text)``.

    A custom ``backend`` (a warm model, an HTTP client) runs as an
    ACTOR POOL — loaded once per actor in ``__init__``.  The default
    rule extractor is a stateless pure function, so it runs as plain
    tasks on the warm worker pool (no actor-process spawn per run);
    Ray's streaming executor autoscales task parallelism."""
    cfg = cfg or PipelineConfig()
    if backend is None:
        return distinct_chunks.map_batches(
            _extract_batch_default,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
    return distinct_chunks.map_batches(
        TripleExtractor,
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        fn_constructor_kwargs={"backend": backend},
    )
