"""Stage 4: raw triples -> flat normalized triple rows.

Single stateless ``map_batches`` reproducing the reference's three-way
object routing inside ``store_in_neo4j`` (``ingestMD.py:358-495``):

* drop rows without subject or predicate (``ingestMD.py:361``);
* object dict with ``start``+``end`` keys -> **timeline** row: node
  label ``Time_Period``, name ``"{start}–{end}"`` (en-dash,
  ``ingestMD.py:400``); a malformed timeline (empty start or end)
  falls back to a **normal** row with the JSON-stringified object
  (``ingestMD.py:373-394``) — and, faithfully to the reference, its
  provenance text is NOT truncated (``:393``) while the plain normal
  path truncates to 1000 chars (``:494``);
* object dict with nested dict values -> **distribution** rows fanned
  out per ``(pillar, term)``, skipping ``term == "total"`` and
  non-coercible counts, rel type forced ``HAS_INITIATIVE_COUNT``,
  object label ``Pillar`` (``ingestMD.py:423-463``);
* everything else -> **normal** row with ``clean_name`` stringification
  (``ingestMD.py:317-322, 466-495``).

Each output row also carries the embedding text keys exactly as the
reference builds them (``ingestMD.py:377-379, 403-405, 446-448,
472-474``) and the entity canonicalization keys/ids:
``norm_key = normalize_name_for_key(name)`` (``graphutil.py:640-651``)
and ``entity_id = stable_id(norm_key)`` — a pure function of the key,
so edge endpoint resolution needs NO join against the nodes table
(the shuffle the reference pays via Neo4j ``MERGE`` lookups
disappears).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.functions.textnorm import (
    clean_name,
    normalize_name_for_key,
    safe_label,
    stable_id,
)

_COLS = [
    ("chunk_id", pa.string()),
    ("subject", pa.string()), ("predicate", pa.string()), ("rel_type", pa.string()),
    ("object", pa.string()), ("subject_type", pa.string()), ("object_type", pa.string()),
    ("object_kind", pa.string()), ("start", pa.string()), ("end", pa.string()),
    ("term", pa.string()), ("count", pa.int64()), ("src_text", pa.string()),
    ("sub_key", pa.string()), ("obj_key", pa.string()), ("rel_key", pa.string()),
    ("src_norm_key", pa.string()), ("dst_norm_key", pa.string()),
    ("src_id", pa.int64()), ("dst_id", pa.int64()),
]
TRIPLES_SCHEMA = pa.schema(_COLS)


def make_normalize_batch(cfg: PipelineConfig):
    max_chars = cfg.src_text_max_chars
    # entity_scope="label": reference-parity MERGE (n:Label {name})
    # identity (ingestMD.py:505-511) — the canonicalization key is
    # scoped by the (sanitized) node label, so equal names under
    # different labels stay distinct entities.  Default "norm" keeps
    # the label-blind promotion documented in the module docstring.
    label_scoped = cfg.entity_scope == "label"
    if cfg.entity_scope not in ("norm", "label"):
        raise ValueError(
            f"entity_scope must be 'norm' or 'label', got {cfg.entity_scope!r}")

    def normalize_batch(batch: pa.Table) -> pa.Table:
        cols: Dict[str, List] = {name: [] for name, _ in _COLS}
        d = batch.to_pydict()
        # passthrough provenance columns (present when extraction ran
        # per (doc, chunk) without the distinct-chunk shuffle)
        passthrough = [c for c in ("doc_id", "chunk_idx") if c in d]
        extra: Dict[str, List] = {c: [] for c in passthrough}
        cur: Dict[str, Any] = {}

        def emit(chunk_id, s, p, rel_type, obj, st, ot,
                 kind, start, end, term, count, src_text, sub_key, obj_key, rel_key):
            src_nk = normalize_name_for_key(s)
            dst_nk = normalize_name_for_key(obj)
            if label_scoped:
                # \x1f cannot appear in a norm key (normalization maps
                # non-[a-z0-9 ] to space), so the scoped key is
                # collision-free with unscoped keys
                src_nk = f"{st}\x1f{src_nk}"
                dst_nk = f"{ot}\x1f{dst_nk}"
            row = (chunk_id, s, p, rel_type, obj, st, ot,
                   kind, start, end, term, count, src_text, sub_key, obj_key,
                   rel_key, src_nk, dst_nk, stable_id(src_nk), stable_id(dst_nk))
            for (name, _), val in zip(_COLS, row):
                cols[name].append(val)
            for c in passthrough:
                extra[c].append(cur[c])

        n = batch.num_rows
        for i in range(n):
            for c in passthrough:
                cur[c] = d[c][i]
            s = d["subject"][i]
            p = d["predicate"][i]
            if not (s and p):
                continue
            chunk_id = d["chunk_id"][i]
            src_text = d["src_text"][i] or ""
            st = safe_label(d["subject_type"][i], "Entity")
            ot = safe_label(d["object_type"][i], "Entity")
            rel_type = safe_label(p, "RELATED_TO")
            sub_key = f"{st}:{s}"

            o: Any = d["object"][i]
            if d["object_is_json"][i]:
                try:
                    o = json.loads(o)
                except Exception:
                    pass  # leave as string → normal path

            if isinstance(o, dict) and {"start", "end"} <= set(o.keys()):
                start = str(o.get("start", "")).strip()
                end = str(o.get("end", "")).strip()
                if start and end:
                    tp_name = f"{start}–{end}"
                    emit(chunk_id, s, p,
                         safe_label(p, "HAS_TIMELINE"), tp_name, st, "Time_Period",
                         "timeline", start, end, None, None, src_text,
                         sub_key, f"Time_Period:{tp_name}", f"{s} {p} {tp_name}")
                else:
                    o_name = clean_name(o)
                    if not o_name:
                        continue
                    emit(chunk_id, s, p, rel_type, o_name,
                         st, ot, "normal", None, None, None, None, src_text,
                         sub_key, f"{ot}:{o_name}", f"{s} {p} {o_name}")
                continue

            if isinstance(o, dict) and any(isinstance(v, dict) for v in o.values()):
                for pillar, term_map in o.items():
                    if not isinstance(term_map, dict):
                        continue
                    pillar_name = str(pillar).strip()
                    if not pillar_name:
                        continue
                    for term, cnt in term_map.items():
                        if str(term).lower() == "total":
                            continue
                        try:
                            cnt_val = int(cnt)
                        except Exception:
                            try:
                                cnt_val = int(float(str(cnt)))
                            except Exception:
                                continue
                        emit(chunk_id, s, p,
                             "HAS_INITIATIVE_COUNT", pillar_name, st, "Pillar",
                             "distribution", None, None, str(term), cnt_val,
                             src_text, sub_key, f"Pillar:{pillar_name}",
                             f"{s} HAS_INITIATIVE_COUNT {pillar_name}")
                continue

            o_name = clean_name(o)
            if not o_name:
                continue
            emit(chunk_id, s, p, rel_type, o_name, st, ot,
                 "normal", None, None, None, None, src_text[:max_chars],
                 sub_key, f"{ot}:{o_name}", f"{s} {p} {o_name}")

        out = {name: pa.array(cols[name], typ) for name, typ in _COLS}
        for c in passthrough:
            out[c] = pa.array(
                extra[c], pa.int32() if c == "chunk_idx" else pa.string()
            )
        return pa.table(out)

    return normalize_batch


def normalize_triples(raw: "ray.data.Dataset", cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    return raw.map_batches(
        make_normalize_batch(cfg),
        batch_format="pyarrow",
        batch_size=cfg.map_batch_size,
    )
