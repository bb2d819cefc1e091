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


# DuckDB-quoted mirror of tokenizer._TOKEN_RE ('' escapes the apostrophe)
_TOKEN_RE_SQL = r"[ \t]*[A-Za-z]+(?:''[A-Za-z]+)?|[ \t]*[0-9]+|[ \t]*[^\sA-Za-z0-9]+|\s+"


def chunks_sql(pages_parquet: str, max_tokens: int = 1500) -> str:
    """DuckDB mirror of ``chunk_text`` (overlap 0) over the deduped page
    corpus: ``(doc_id, chunk_idx, chunk_id)`` with
    ``chunk_id = sha256(chunk text)``.

    The greedy paragraph packing is a ``list_reduce`` fold over the
    per-paragraph token counts with a flat BIGINT[] state
    ``[used, runstart, ...span pairs]``; each finished chunk is a span
    ``(first_para, last_para)`` (re-joined with a blank line) or an
    oversize marker ``(para, -1)`` (token-sliced into
    ``max_tokens``-sized windows).  The final re-check pass of
    ``chunk_text`` is provably a no-op for this tokenizer: a packed
    chunk's token count equals the fold's ``used`` counter (each
    blank-line join is exactly one whitespace token against stripped
    paragraphs), and re-tokenizing a decoded token slice can only merge
    boundary tokens — never split — so no chunk exceeds the budget.
    Valid for ASCII corpora (the synthetic pages are ASCII)."""
    return f"""
    WITH chunk_docs AS (
        SELECT DISTINCT sha256(text) AS doc_id, text
        FROM read_parquet('{pages_parquet}')
    ), paras AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split(text, chr(10) || chr(10)),
                       p -> trim(p, ' ' || chr(9) || chr(10) || chr(13)
                                     || chr(11) || chr(12))),
                   p -> p <> '') AS ps
        FROM chunk_docs
    ), counted AS (
        SELECT doc_id, ps,
               list_transform(ps,
                   p -> len(regexp_extract_all(p, '{_TOKEN_RE_SQL}'))) AS ns
        FROM paras
    ), folded AS (
        SELECT doc_id, ps, ns,
               list_reduce(
                   list_prepend(CAST([0, 0] AS BIGINT[]),
                       list_transform(range(1, len(ns) + 1),
                           j -> CAST([ns[j], j] AS BIGINT[]))),
                   (acc, x) -> CASE
                       WHEN x[1] > {max_tokens} THEN
                           [CAST(0 AS BIGINT), 0]
                           || list_slice(acc, 3, len(acc))
                           || (CASE WHEN acc[2] > 0
                                    THEN [acc[2], x[2] - 1]
                                    ELSE CAST([] AS BIGINT[]) END)
                           || [x[2], -1]
                       WHEN acc[2] > 0 AND acc[1] + x[1] + 1 > {max_tokens} THEN
                           [x[1], x[2]]
                           || list_slice(acc, 3, len(acc))
                           || [acc[2], x[2] - 1]
                       ELSE
                           [acc[1] + x[1]
                                + CASE WHEN acc[2] > 0 THEN 1 ELSE 0 END,
                            CASE WHEN acc[2] > 0 THEN acc[2] ELSE x[2] END]
                           || list_slice(acc, 3, len(acc))
                   END
               ) AS st
        FROM counted
    ), specs AS (
        SELECT doc_id, ps, ns,
               list_slice(st, 3, len(st))
               || (CASE WHEN st[2] > 0 THEN [st[2], CAST(len(ns) AS BIGINT)]
                        ELSE CAST([] AS BIGINT[]) END) AS sp
        FROM folded
    ), chunked AS (
        SELECT doc_id,
               flatten(list_transform(range(1, len(sp) // 2 + 1), k ->
                   CASE WHEN sp[2 * k] = -1 THEN
                       list_transform(
                           range(0, CAST(ceil(
                               CAST(ns[CAST(sp[2 * k - 1] AS INTEGER)] AS DOUBLE)
                               / {max_tokens}) AS BIGINT)),
                           j -> array_to_string(
                               list_slice(
                                   regexp_extract_all(
                                       ps[CAST(sp[2 * k - 1] AS INTEGER)],
                                       '{_TOKEN_RE_SQL}'),
                                   CAST(j * {max_tokens} + 1 AS INTEGER),
                                   CAST(j * {max_tokens} + {max_tokens} AS INTEGER)),
                               ''))
                   ELSE
                       [array_to_string(
                            list_slice(ps, CAST(sp[2 * k - 1] AS INTEGER),
                                       CAST(sp[2 * k] AS INTEGER)),
                            chr(10) || chr(10))]
                   END)) AS chunks
        FROM specs
    ), ex AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(chunks) + 1),
                   j -> {{'i': j, 'c': chunks[CAST(j AS INTEGER)]}})) AS u
        FROM chunked
    )
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS chunk_idx, sha256(u.c) AS chunk_id
    FROM ex
    """
