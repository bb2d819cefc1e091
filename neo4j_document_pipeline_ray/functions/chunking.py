"""Greedy paragraph-packing chunker.

Reproduces the reference chunking algorithm (``ingestMD.py:83-118``)
over this engine's tokenizer:

* split the canonical document on blank lines into stripped paragraphs;
* pack consecutive paragraphs greedily into chunks while
  ``tokens_so_far + paragraph_tokens + 1`` stays within ``max_tokens``
  (the ``+1`` models the join cost; the first paragraph of a fresh
  buffer is charged without it, exactly as the reference does);
* a single paragraph larger than the budget flushes the buffer and is
  token-sliced into budget-sized windows (``ingestMD.py:74-81``, overlap
  honored via the slide step);
* a final pass re-checks every chunk and token-slices any that still
  exceed the budget (``ingestMD.py:108-113``).

Runs inside ``map_batches`` as a flat-map: one document row in, N chunk
rows out.  Pure function — no per-worker state beyond the compiled
tokenizer regex.
"""

from __future__ import annotations

from typing import List

from neo4j_document_pipeline_ray.functions import tokenizer


def split_by_tokens(text: str, size: int, overlap: int = 0) -> List[str]:
    """Slice ``text`` into windows of ``size`` tokens sliding by ``size-overlap``."""
    toks = tokenizer.encode(text)
    step = max(1, size - overlap)
    return [tokenizer.decode(toks[i : i + size]) for i in range(0, len(toks), step)]


def chunk_text(text: str, max_tokens: int = 1500, overlap_tokens: int = 0) -> List[str]:
    paragraphs = [p.strip() for p in text.split("\n\n") if p.strip()]

    chunks: List[str] = []
    buf: List[str] = []
    used = 0

    def flush() -> None:
        nonlocal buf, used
        if buf:
            chunks.append("\n\n".join(buf))
            buf, used = [], 0

    for para in paragraphs:
        n = tokenizer.count_tokens(para)
        if n > max_tokens:
            flush()
            chunks.extend(split_by_tokens(para, max_tokens, overlap_tokens))
            continue
        if buf and used + n + 1 > max_tokens:
            flush()
            buf, used = [para], n
        else:
            buf.append(para)
            used += n + 1
    flush()

    out: List[str] = []
    for c in chunks:
        if tokenizer.count_tokens(c) <= max_tokens:
            out.append(c)
        else:
            out.extend(split_by_tokens(c, max_tokens, overlap_tokens))
    return out
