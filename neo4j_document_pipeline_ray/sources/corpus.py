"""Deterministic synthetic web-page corpus with exact ground truth.

The reference ships no test corpus beyond two hand-written markdown
files (``Test Files/house_of_wisdom_baghdad.markdown``,
``Test Files/vaseline_benefits.markdown``); their structure — headings,
``- **Term**:`` bullets, markdown tables — plus the three LLM triple
shapes (normal / timeline / distribution, ``ingestMD.py:310-315``)
define the document shapes generated here.

Every page is derived purely from ``(seed, index)`` so generation is
order-independent, parallelizable, and reproducible.  For each page the
generator produces:

* a *plan* (list of content blocks),
* the markdown-shaped body text (= the oracle ``text`` column after
  canonicalization — the byte-identity target),
* the HTML wrapping of that body with boilerplate (nav/script/footer)
  that extraction must strip,
* the exact post-routing truth triples (what the pipeline must emit),
  computed with the *same* shared normalization functions the pipeline
  uses, so P/R vs truth is exact rather than approximate.

Corpus features exercising the engine's hard paths:
  - alias clusters ("Six Pillars"/"six pillars"/"6 Pillars") that must
    collapse under ``normalize_name_for_key`` (graphutil.py:640-651);
  - 3 heavy-hitter entities in ~10% of docs (the "United States" skew
    case for the salted/partial-agg entity shuffle);
  - duplicate documents (identical body, different url) → same doc_id,
    exercising doc/chunk dedup (ingestMD.py:737, 744-752);
  - oversize paragraphs > chunk budget → token-slice path
    (ingestMD.py:74-81);
  - table-only docs → the markdown-table fallback extractor
    (ingestMD.py:764-776), sentence docs → the primary extractor, and
    small mixed docs (guaranteed single-chunk) where the primary
    extractor wins and table triples must NOT be emitted;
  - malformed timelines and distribution "total" terms
    (ingestMD.py:373-394, 434-435).
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, List, Optional, Tuple

import pyarrow as pa

from neo4j_document_pipeline_ray.functions.chunking import chunk_text
from neo4j_document_pipeline_ray.functions.textnorm import (
    canonicalize_text,
    clean_name,
    safe_label,
)

# ---------------------------------------------------------------------------
# vocabulary (all deterministic constants)
# ---------------------------------------------------------------------------

_ADJ = ["National", "Digital", "Rural", "Urban", "Regional", "Federal",
        "Smart", "Green", "Open", "Strategic", "Inclusive", "Sustainable"]
_NOUN = ["AI Roadmap", "Economy Blueprint", "Connectivity Program",
         "Data Exchange", "Skills Initiative", "Innovation Fund",
         "Cyber Security Framework", "Broadband Plan", "Talent Pipeline",
         "Cloud Policy", "Identity Platform", "Payments Network"]

ENTITY_NAMES = [f"{a} {n}" for a in _ADJ for n in _NOUN]  # 144 names

HEAVY_HITTERS = ["United States", "Ministry of Digital", "World Bank"]
HEAVY_RATE = 0.10

# alias clusters: all variants share one normalize_name_for_key key
ALIAS_CLUSTERS = [
    ["Six Pillars", "six pillars", "6 Pillars", "Six Pillars."],
    ["Ten Goals", "ten goals", "10 Goals"],
    ["Four Thrusts", "four thrusts", "4 Thrusts!"],
    ["MyDigital Initiative", "mydigital initiative", "MyDigital-Initiative"],
    ["Two Phase Rollout", "two phase rollout", "2 Phase Rollout"],
    ["National Vision", "national vision", "National Vision."],
]

_SUBJECT_TYPES = ["Goal", "Strategy", "Policy", "Stakeholder", "Initiative",
                  "Objective", "Sector", "Technology", "Infrastructure",
                  "Vision", "Opportunity", "Target"]
_OBJECT_TYPES = ["Outcome", "Challenge", "Sector", "Stakeholder",
                 "Technology", "Target", "Opportunity", "Entity"]

from neo4j_document_pipeline_ray.functions.rules import PREDICATE_PHRASES

_TABLE_HEADERS = ["Budget", "Deadline", "Status", "Priority", "Coverage", "Owner"]
_TABLE_VALUES = ["RM 1.2 billion", "RM 350 million", "2025", "2030",
                 "Phase One", "Phase Two", "Approved", "In Progress",
                 "High", "Medium", "Low", "Nationwide", "Pilot",
                 "Ministry of Digital", "State Agencies"]

_PILLARS = ["Economy", "Society", "Government", "Infrastructure", "Talent", "Trust"]
_TERMS = ["planned", "active", "completed", "stalled"]
_YEARS = [str(y) for y in range(2020, 2032)]

_NOISE_EN = [
    "The programme continues to deliver measurable improvements across all participating agencies.",
    "Stakeholder consultations were held in every region during the reporting period.",
    "Implementation remains on schedule according to the latest quarterly review.",
    "Further details are published in the annual progress report.",
    "Funding allocations are reviewed by the steering committee twice a year.",
    "Adoption rates vary considerably between urban and rural districts.",
    "The secretariat coordinates monitoring and evaluation activities nationwide.",
]
_NOISE_MS = [
    "Program ini terus memberikan penambahbaikan yang ketara di semua agensi.",
    "Perundingan pihak berkepentingan telah diadakan di setiap wilayah.",
    "Pelaksanaan kekal mengikut jadual menurut semakan suku tahunan terkini.",
    "Butiran lanjut diterbitkan dalam laporan kemajuan tahunan.",
]

# three fixed boilerplate bodies → duplicate documents across urls
_DUP_BODIES = [
    "## Legal Notice\n\nAll content is provided for general information only.\n\n"
    "Reuse of this material requires attribution to the publishing agency.",
    "## Accessibility Statement\n\nThis portal conforms to recognised accessibility guidelines.\n\n"
    "Feedback on accessibility issues is welcome through the contact form.",
    "## Archive Notice\n\nThis page has been archived and is retained for reference.\n\n"
    "Information on this page may no longer be current.",
]

CHUNK_TOKENS = 1500  # must match PipelineConfig.chunk_size default


# ---------------------------------------------------------------------------
# per-document plan
# ---------------------------------------------------------------------------

def _pick_entity(rng: random.Random) -> str:
    r = rng.random()
    if r < HEAVY_RATE:
        return rng.choice(HEAVY_HITTERS)
    if r < HEAVY_RATE + 0.15:
        cluster = rng.choice(ALIAS_CLUSTERS)
        return rng.choice(cluster)
    return rng.choice(ENTITY_NAMES)


def _noise(rng: random.Random, lang: str) -> str:
    pool = _NOISE_MS if lang == "ms" else _NOISE_EN
    k = rng.randint(1, 3)
    return " ".join(rng.choice(pool) for _ in range(k))


def _sentence_block(rng: random.Random) -> Tuple[str, List[Dict[str, Any]]]:
    """One paragraph of template sentences + the raw triples they encode."""
    lines: List[str] = []
    triples: List[Dict[str, Any]] = []
    for _ in range(rng.randint(2, 5)):
        kind = rng.random()
        st = rng.choice(_SUBJECT_TYPES)
        subj = _pick_entity(rng)
        if kind < 0.72:
            ot = rng.choice(_OBJECT_TYPES)
            obj = _pick_entity(rng)
            pred = rng.choice(PREDICATE_PHRASES)
            lines.append(f'The {st} "{subj}" {pred} the {ot} "{obj}".')
            triples.append({"subject": subj, "predicate": pred, "object": obj,
                            "subject_type": st, "object_type": ot})
        elif kind < 0.88:
            start = rng.choice(_YEARS)
            if rng.random() < 0.15:  # malformed timeline
                lines.append(f'The {st} "{subj}" spans from {start} to an unspecified date.')
                triples.append({"subject": subj, "predicate": "spans",
                                "object": {"start": start, "end": ""},
                                "subject_type": st, "object_type": "Time_Period"})
            else:
                end = rng.choice(_YEARS)
                lines.append(f'The {st} "{subj}" spans from {start} to {end}.')
                triples.append({"subject": subj, "predicate": "spans",
                                "object": {"start": start, "end": end},
                                "subject_type": st, "object_type": "Time_Period"})
        else:
            pillar = rng.choice(_PILLARS)
            terms = rng.sample(_TERMS, rng.randint(1, 3))
            term_map: Dict[str, Any] = {t: rng.randint(1, 40) for t in terms}
            term_map["total"] = sum(term_map.values())
            items = ", ".join(f"{t}={c}" for t, c in term_map.items())
            lines.append(
                f'The {st} "{subj}" records initiative counts for pillar "{pillar}": {items}.')
            triples.append({"subject": subj, "predicate": "records",
                            "object": {pillar: term_map},
                            "subject_type": st, "object_type": "Pillar"})
    return "\n".join(lines), triples


def _table_block(rng: random.Random) -> Tuple[Tuple[List[str], List[List[str]]], List[Dict[str, Any]]]:
    headers = ["Entity"] + rng.sample(_TABLE_HEADERS, rng.randint(2, 4))
    rows: List[List[str]] = []
    triples: List[Dict[str, Any]] = []
    for _ in range(rng.randint(2, 5)):
        subj = _pick_entity(rng)
        row = [subj]
        for h in headers[1:]:
            val = rng.choice(_TABLE_VALUES)
            row.append(val)
            triples.append({"subject": subj, "predicate": h, "object": val,
                            "subject_type": "Entity", "object_type": "Value"})
        rows.append(row)
    return (headers, rows), triples


def make_doc_plan(index: int, seed: int = 42) -> Dict[str, Any]:
    rng = random.Random((seed << 24) ^ index)
    lang = "ms" if rng.random() < 0.08 else "en"
    r = rng.random()
    if r < 0.05:
        doc_type = "dup"
    elif r < 0.55:
        doc_type = "sent"
    elif r < 0.75:
        doc_type = "table"
    elif r < 0.85:
        doc_type = "mixed"
    else:
        doc_type = "noise"

    url = f"https://synth.test/{doc_type}/page-{index:08d}"
    blocks: List[Tuple[str, Any]] = []
    primary: List[Dict[str, Any]] = []   # rule-extractor truth (raw contract)
    fallback: List[Dict[str, Any]] = []  # table-extractor truth (raw contract)

    if doc_type == "dup":
        body = _DUP_BODIES[rng.randrange(len(_DUP_BODIES))]
        for para in body.split("\n\n"):
            if para.startswith("## "):
                blocks.append(("heading", (2, para[3:])))
            else:
                blocks.append(("para", para))
    else:
        blocks.append(("heading", (1, f"Progress Review {2020 + index % 12}")))
        n_sections = rng.randint(2, 5) if doc_type != "mixed" else 2
        for s in range(n_sections):
            blocks.append(("heading", (2, f"Section {s + 1}")))
            blocks.append(("para", _noise(rng, lang)))
            if doc_type in ("sent", "mixed"):
                text, tr = _sentence_block(rng)
                blocks.append(("para", text))
                primary.extend(tr)
            if doc_type in ("table", "mixed") and (doc_type == "mixed" or rng.random() < 0.8):
                tbl, tr = _table_block(rng)
                blocks.append(("table", tbl))
                fallback.extend(tr)
            if rng.random() < 0.25:
                blocks.append(("list", [
                    f"**{rng.choice(_TABLE_HEADERS)}**: {rng.choice(_TABLE_VALUES)}"
                    for _ in range(rng.randint(2, 4))
                ]))
        if doc_type == "noise" and rng.random() < 0.3:
            # oversize paragraph → token-slice path; pure noise, no triples
            blocks.append(("para", " ".join(
                rng.choice(_NOISE_EN) for _ in range(300))))

    return {
        "index": index, "url": url, "lang": lang, "doc_type": doc_type,
        "blocks": blocks, "primary": primary, "fallback": fallback,
    }


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def render_markdown(blocks: List[Tuple[str, Any]]) -> str:
    parts: List[str] = []
    for kind, payload in blocks:
        if kind == "heading":
            level, text = payload
            parts.append("#" * level + " " + text)
        elif kind == "para":
            parts.append(payload)
        elif kind == "list":
            parts.append("\n".join("- " + item for item in payload))
        elif kind == "table":
            headers, rows = payload
            lines = ["| " + " | ".join(headers) + " |",
                     "| " + " | ".join("---" for _ in headers) + " |"]
            lines += ["| " + " | ".join(r) + " |" for r in rows]
            parts.append("\n".join(lines))
    return canonicalize_text("\n\n".join(parts))


def _inline_html(text: str) -> str:
    """Escape + render inline markers: ** -> <strong>, newline -> <br>."""
    text = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    out: List[str] = []
    for i, seg in enumerate(text.split("**")):
        if i % 2 == 1:
            out.append(f"<strong>{seg}</strong>")
        else:
            out.append(seg)
    return "".join(out).replace("\n", "<br>")


def render_html(plan: Dict[str, Any]) -> str:
    rng = random.Random(plan["index"] ^ 0x5EED)
    body: List[str] = []
    for kind, payload in plan["blocks"]:
        if kind == "heading":
            level, text = payload
            body.append(f"<h{level}>{_inline_html(text)}</h{level}>")
        elif kind == "para":
            body.append(f"<p>{_inline_html(payload)}</p>")
        elif kind == "list":
            items = "\n".join(f"  <li>{_inline_html(it)}</li>" for it in payload)
            body.append(f"<ul>\n{items}\n</ul>")
        elif kind == "table":
            headers, rows = payload
            parts = ["<table>", "  <tr>" + "".join(f"<th>{_inline_html(h)}</th>" for h in headers) + "</tr>"]
            for r in rows:
                parts.append("  <tr>" + "".join(f"<td>{_inline_html(c)}</td>" for c in r) + "</tr>")
            parts.append("</table>")
            body.append("\n".join(parts))
        # interleave boilerplate the extractor must drop
        if rng.random() < 0.15:
            body.append("<aside>Related links: <a href='/a'>one</a> <a href='/b'>two</a></aside>")
    nav = "<nav><a href='/'>Home</a> | <a href='/about'>About</a></nav>"
    script = "<script>window.dataLayer=[];function gtag(){}</script>"
    footer = f"<footer>© {2020 + plan['index'] % 12} Synthetic Portal</footer>"
    return (
        "<!DOCTYPE html>\n<html><head><title>t</title>"
        f"<style>body{{margin:0}}</style>{script}</head>\n"
        f"<body>{nav}\n" + "\n".join(body) + f"\n{footer}</body></html>"
    )


# ---------------------------------------------------------------------------
# truth (post-routing, what the normalizer must emit)
# ---------------------------------------------------------------------------

def _route_truth(url: str, raw: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Mirror of the normalizer's routing (ingestMD.py:358-495) for truth rows."""
    s, p, o = raw["subject"], raw["predicate"], raw["object"]
    st = safe_label(raw.get("subject_type"), "Entity")
    ot = safe_label(raw.get("object_type"), "Entity")
    rows: List[Dict[str, Any]] = []
    base = {"url": url, "subject": s, "predicate": p, "subject_type": st,
            "start": None, "end": None, "term": None, "count": None}
    if isinstance(o, dict) and {"start", "end"} <= set(o.keys()):
        start = str(o.get("start", "")).strip()
        end = str(o.get("end", "")).strip()
        if start and end:
            rows.append({**base, "rel_type": safe_label(p, "HAS_TIMELINE"),
                         "object": f"{start}–{end}", "object_type": "Time_Period",
                         "object_kind": "timeline", "start": start, "end": end})
        else:
            rows.append({**base, "rel_type": safe_label(p, "RELATED_TO"),
                         "object": clean_name(o), "object_type": ot,
                         "object_kind": "normal"})
    elif isinstance(o, dict) and any(isinstance(v, dict) for v in o.values()):
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
                rows.append({**base, "rel_type": "HAS_INITIATIVE_COUNT",
                             "object": pillar_name, "object_type": "Pillar",
                             "object_kind": "distribution",
                             "term": str(term), "count": cnt_val})
    else:
        o_name = clean_name(o)
        if o_name:
            rows.append({**base, "rel_type": safe_label(p, "RELATED_TO"),
                         "object": o_name, "object_type": ot,
                         "object_kind": "normal"})
    return rows


def truth_for_plan(plan: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Exact expected triples for one page.

    Gating mirrors the reference's per-chunk fallback rule
    (ingestMD.py:764-776): table triples count only when the primary
    extractor found nothing in that chunk.  The corpus guarantees this
    is decidable per *document*: sentence docs contain no tables, table
    docs contain no template sentences, and mixed docs are generated
    small enough to be a single chunk (asserted in tests), where the
    primary extractor wins.
    """
    url = plan["url"]
    if plan["doc_type"] == "mixed":
        raws = plan["primary"]
    elif plan["primary"]:
        raws = plan["primary"]
    else:
        raws = plan["fallback"]
    out: List[Dict[str, Any]] = []
    for raw in raws:
        out.extend(_route_truth(url, raw))
    return out


# ---------------------------------------------------------------------------
# table assembly / persistence
# ---------------------------------------------------------------------------

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

TRUTH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("subject", pa.string()),
    ("predicate", pa.string()),
    ("rel_type", pa.string()),
    ("object", pa.string()),
    ("subject_type", pa.string()),
    ("object_type", pa.string()),
    ("object_kind", pa.string()),
    ("start", pa.string()),
    ("end", pa.string()),
    ("term", pa.string()),
    ("count", pa.int64()),
])


def build_page_row(index: int, seed: int = 42) -> Dict[str, Any]:
    plan = make_doc_plan(index, seed)
    text = render_markdown(plan["blocks"])
    return {
        "url": plan["url"],
        "warc_ts": _EPOCH_2024_US + index * 1_000_000,
        "html": render_html(plan).encode("utf-8"),
        "text": text,
        "lang": plan["lang"],
    }


def pages_batch(indices: List[int], seed: int = 42) -> pa.Table:
    rows = [build_page_row(i, seed) for i in indices]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def truth_batch(indices: List[int], seed: int = 42) -> pa.Table:
    rows: List[Dict[str, Any]] = []
    for i in indices:
        plan = make_doc_plan(i, seed)
        seen = set()
        for r in truth_for_plan(plan):
            key = tuple(sorted((k, str(v)) for k, v in r.items()))
            if key not in seen:       # truth is a distinct row set per url
                seen.add(key)
                rows.append(r)
    return pa.Table.from_pylist(rows, schema=TRUTH_SCHEMA)


def generate_corpus(
    out_dir: str, n_docs: int, seed: int = 42, docs_per_file: int = 2000
) -> Dict[str, str]:
    """Write a multi-file ``pages/`` directory + ``truth.parquet``.

    Pages are laid out as one Parquet file per ``docs_per_file`` index
    range — the Common-Crawl-style sharding the snapshot pipeline's
    per-shard checkpoints key on.  Generation is pure per-index
    (order-independent, byte-stable files); it fans out over Ray when a
    session is live and the corpus is large, else runs locally.
    """
    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "truth.parquet")
    os.makedirs(pages_dir, exist_ok=True)

    ranges = [(lo, min(lo + docs_per_file, n_docs))
              for lo in range(0, n_docs, docs_per_file)]

    def write_shard(shard_idx: int, lo: int, hi: int) -> None:
        pq.write_table(
            pages_batch(list(range(lo, hi)), seed),
            os.path.join(pages_dir, f"part-{shard_idx:05d}.parquet"),
            row_group_size=250,  # small row groups → the reader can split blocks
        )

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(ranges) > 2
    except Exception:
        pass

    if use_ray:
        import ray

        @ray.remote
        def _gen(shard_idx: int, lo: int, hi: int, d: str, s: int) -> None:
            pq.write_table(
                pages_batch(list(range(lo, hi)), s),
                os.path.join(d, f"part-{shard_idx:05d}.parquet"),
                row_group_size=250,
            )

        ray.get([_gen.remote(i, lo, hi, pages_dir, seed)
                 for i, (lo, hi) in enumerate(ranges)])
    else:
        for i, (lo, hi) in enumerate(ranges):
            write_shard(i, lo, hi)

    with pq.ParquetWriter(truth_path, TRUTH_SCHEMA) as w:
        for lo, hi in ranges:
            w.write_table(truth_batch(list(range(lo, hi)), seed))
    return {"pages": pages_dir, "truth": truth_path}


def n_pages_for_sf(sf_dir: str) -> int:
    """Corpus size for a testdata scale-factor directory (sf0.01 → 1500 docs)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(100, int(round(150_000 * sf)))


def corpus_dir_for_sf(sf_dir: str, root: str = "/tmp/graft_pages") -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, name)


def ensure_corpus(sf_dir: str, seed: int = 42, root: str = "/tmp/graft_pages") -> Dict[str, str]:
    """Idempotently materialize the corpus for a scale factor; cached on disk."""
    out_dir = corpus_dir_for_sf(sf_dir, root)
    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "truth.parquet")
    done_marker = os.path.join(out_dir, "_corpus_complete.json")
    if os.path.exists(done_marker):
        return {"pages": pages_dir, "truth": truth_path}
    paths = generate_corpus(out_dir, n_pages_for_sf(sf_dir), seed)
    import json

    with open(done_marker, "w") as f:
        json.dump({"n_docs": n_pages_for_sf(sf_dir), "seed": seed}, f)
    return paths
