"""Markdown-table triple extraction (the reference's fallback extractor).

Reproduces the observable semantics of
``extract_triples_from_markdown_tables`` (reference ``ingestMD.py:177-216``
with helpers at ``ingestMD.py:161-175``):

* a table starts at a line containing ``|`` whose next line is a header
  separator (``| --- | :---: | ---: |`` shapes);
* data rows are consumed while the line contains ``|`` and does not
  start with ``>`` (blockquote breaks the table);
* a row with fewer than 2 cells or an empty first cell stops the scan;
* first column is the subject; for each further column (bounded by the
  header width) a triple ``(subject, header, cell)`` is emitted with
  ``subject_type='Entity'``, ``object_type='Value'``, skipping empty
  headers/cells; all cells whitespace-normalized.

In this engine it runs inside the extraction stage, gated per chunk:
only when the primary extractor produced zero triples for that chunk
(reference ``ingestMD.py:764-776``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from neo4j_document_pipeline_ray.functions.textnorm import norm_space

_SEP_LINE = re.compile(r"^\s*\|?(?:\s*:?-+:?\s*\|)+\s*$")


def is_separator_line(line: str) -> bool:
    return bool(_SEP_LINE.match(line))


def split_cells(line: str) -> List[str]:
    line = line.strip()
    if line.startswith("|"):
        line = line[1:]
    if line.endswith("|"):
        line = line[:-1]
    return [c.strip() for c in line.split("|")]


def extract_table_triples(text: str) -> List[Dict[str, Any]]:
    lines = text.splitlines()
    out: List[Dict[str, Any]] = []
    i = 0
    n = len(lines)
    while i < n:
        if "|" in lines[i] and i + 1 < n and is_separator_line(lines[i + 1]):
            headers = [norm_space(h) for h in split_cells(lines[i])]
            k = i + 2
            while k < n and "|" in lines[k] and not lines[k].strip().startswith(">"):
                row = split_cells(lines[k])
                if len(row) < 2 or not row[0].strip():
                    break
                subj = norm_space(row[0])
                for col in range(1, min(len(row), len(headers))):
                    pred = norm_space(headers[col])
                    obj = norm_space(row[col])
                    if pred and obj:
                        out.append(
                            {
                                "subject": subj,
                                "predicate": pred,
                                "object": obj,
                                "subject_type": "Entity",
                                "object_type": "Value",
                            }
                        )
                k += 1
            i = k
        else:
            i += 1
    return out
