"""Deterministic rule-based triple extractor (the primary extraction backend).

The reference's primary extractor is an Azure-OpenAI chat call at
temperature 0 that returns a JSON list of
``{subject, predicate, object, subject_type, object_type}`` dicts, where
``object`` may be a plain string, a timeline dict ``{start, end}``, or a
nested distribution dict ``{pillar: {term: count, ...}}``
(reference ``ingestMD.py:123-156`` for the call/parse contract,
``ingestMD.py:310-315`` for the special object shapes).

No network/LLM exists in this environment, so the engine's default
backend is a deterministic pattern extractor that emits the *same
output contract* from three sentence families (one sentence per line):

  R1  The <SubType> "<Subject>" <predicate phrase> the <ObjType> "<Object>".
        -> normal triple, predicate = the phrase verbatim
  R2  The <SubType> "<Subject>" spans from <start> to <end>.
        -> timeline triple, predicate "spans", object {"start","end"}
        ("to an unspecified date" yields end="" — the malformed-timeline
        path the normalizer must stringify, reference ingestMD.py:373-394)
  R3  The <SubType> "<Subject>" records initiative counts for pillar
      "<Pillar>": term=n, term=n, total=N.
        -> distribution triple, predicate "records",
           object {pillar: {term: n, ..., "total": N}}

Any other text yields nothing — which is what arms the per-chunk
markdown-table fallback (reference ``ingestMD.py:764-776``).  The LLM
backend slot remains: any callable ``str -> list[dict]`` satisfies the
``TripleExtractor`` protocol in ``stages/triple_extract.py``.

Ontology types follow the reference prompt list (``ingestMD.py:126-128``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

ONTOLOGY_TYPES = (
    "Goal", "Strategy", "Challenge", "Outcome", "Policy", "Stakeholder",
    "Sector", "Pillar", "Infrastructure", "Technology", "Initiative",
    "Objective", "Target", "Opportunity", "Time_Period", "Vision", "Entity",
)

# Predicate phrases the rule extractor recognizes in R1 sentences.
PREDICATE_PHRASES = (
    "supports", "targets", "addresses", "enables", "funds",
    "oversees", "depends on", "complements", "measures", "delivers",
)

_TYPE_ALT = "|".join(ONTOLOGY_TYPES)
_PRED_ALT = "|".join(sorted(PREDICATE_PHRASES, key=len, reverse=True))

_R1 = re.compile(
    rf'^The ({_TYPE_ALT}) "([^"]+)" ({_PRED_ALT}) the ({_TYPE_ALT}) "([^"]+)"\.$'
)
_R2 = re.compile(
    rf'^The ({_TYPE_ALT}) "([^"]+)" spans from (\S+) to (\S+|an unspecified date)\.$'
)
_R3 = re.compile(
    rf'^The ({_TYPE_ALT}) "([^"]+)" records initiative counts for pillar "([^"]+)": (.+)\.$'
)
_R3_ITEM = re.compile(r"\s*([A-Za-z0-9_ -]+?)=([0-9]+)\s*$")


def extract_rule_triples(text: str) -> List[Dict[str, Any]]:
    triples: List[Dict[str, Any]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or '"' not in line:
            continue
        m = _R1.match(line)
        if m:
            st, s, p, ot, o = m.groups()
            triples.append(
                {"subject": s, "predicate": p, "object": o,
                 "subject_type": st, "object_type": ot}
            )
            continue
        m = _R2.match(line)
        if m:
            st, s, start, end = m.groups()
            if end == "an unspecified date":
                end = ""
            triples.append(
                {"subject": s, "predicate": "spans",
                 "object": {"start": start, "end": end},
                 "subject_type": st, "object_type": "Time_Period"}
            )
            continue
        m = _R3.match(line)
        if m:
            st, s, pillar, items = m.groups()
            term_map: Dict[str, Any] = {}
            for part in items.split(","):
                im = _R3_ITEM.match(part)
                if im:
                    term_map[im.group(1).strip()] = int(im.group(2))
            if term_map:
                triples.append(
                    {"subject": s, "predicate": "records",
                     "object": {pillar: term_map},
                     "subject_type": st, "object_type": "Pillar"}
                )
    return triples
