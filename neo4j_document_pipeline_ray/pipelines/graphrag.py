"""Query layer: the reference's ``/graphrag`` retrieval path over the
materialized KG tables.

Reference flow (``main.py:221-400``): embed question -> hybrid
vector+keyword candidates (``graphutil.py:401-447``) -> optional MMR
(``graphutil.py:452-497``) -> cross-document diversification
(``graphutil.py:512-542``) -> one seed per document (``main.py:316-333``)
-> k-hop neighborhood expansion, hops clamped 1..3 (``main.py:335-338``,
``graphutil.py:547-632``) -> "Graph Facts" formatting with read-time
dedup by normalized (subject, type, object) (``graphutil.py:698-767``).

Scale shape: the *scoring* passes run distributed —
``map_batches(batch_format="pyarrow")`` over the full ``nodes`` table
with per-batch numpy top-k partials, then ``sort + limit`` over the
shrunken partials.  Everything after candidate selection operates on
<= k rows (k ~ 12, mirroring the reference) and is driver-side by
design, exactly like the reference.  The k-hop expansion broadcasts the
(small) frontier id set into a distributed filter over the (huge)
``edges`` table each round — no shuffle, bounded rounds.

The keyword channel is a deterministic BM25 stand-in (Lucene isn't in
scope; the reference's ``_extract_keywords`` LLM fallback degrades to
``question.split()`` — ``graphutil.py:241-242`` — which is the behavior
reproduced here): score = matched query tokens in the normalized node
name, quoted phrases (anchor terms, ``graphutil.py:245-264``) weighted
double.
"""

from __future__ import annotations

import re
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.functions.textnorm import normalize_name_for_key
from neo4j_document_pipeline_ray.stages.embed import HashEmbedder

# quoted-phrase anchors (reference _ANCHOR_RE, graphutil.py:244)
_ANCHOR_RE = re.compile(r'"([^"]+)"|“([^”]+)”|‘([^’]+)’|\'([^\']+)\'')
_WORD_RE = re.compile(r"[A-Za-z][A-Za-z\-]+")

# Lucene escaping (graphutil.py:199-209) — kept for parity with the
# reference's fulltext query construction; a future Lucene-backed query
# layer plugs these into the same keyword channel.
_LUCENE_ESC_RE = re.compile(r'([+\-!(){}[\]^"~*?:\\/])')
_BOOL_RE = re.compile(r"\b(AND|OR|NOT)\b", flags=re.IGNORECASE)


def sanitize_term_for_lucene(term: str) -> str:
    """Escape Lucene specials and neutralize accidental boolean
    operators inside a single term (graphutil.py:202-209)."""
    s = _LUCENE_ESC_RE.sub(r"\\\1", term)
    s = _BOOL_RE.sub(r"\\\1", s)
    return s


def fulltext_query_string(terms: List[str]) -> str:
    """Lucene-safe OR-joined query; multi-word terms are quoted
    (graphutil.py:289-304)."""
    toks = []
    for t in terms:
        t = str(t).strip()
        if not t:
            continue
        t_safe = sanitize_term_for_lucene(t)
        toks.append(f'"{t_safe}"' if " " in t else t_safe)
    return " OR ".join(toks) if toks else ""


def anchor_terms(question: str, max_terms: int = 3) -> List[str]:
    """Quoted phrases, then Title-Case bigrams (graphutil.py:245-287)."""
    anchors: List[str] = []
    for g in _ANCHOR_RE.findall(question):
        val = next((x for x in g if x), "").strip()
        if val and val.lower() not in ("and", "or", "the"):
            anchors.append(val)
    if len(anchors) < max_terms:
        words = _WORD_RE.findall(question)
        for w1, w2 in zip(words, words[1:]):
            if w1[0].isupper() and w2[0].isupper():
                pair = f"{w1} {w2}"
                if pair not in anchors:
                    anchors.append(pair)
                    if len(anchors) >= max_terms:
                        break
    seen: set = set()
    out = []
    for a in anchors:
        if a not in seen:
            out.append(a)
            seen.add(a)
    return out[:max_terms]


def keyword_terms(question: str, max_terms: int = 8) -> List[str]:
    """Deterministic keyword extraction (the reference's LLM-failure
    fallback, graphutil.py:241-242)."""
    return question.split()[:max_terms]


def _query_terms(question: str) -> Tuple[List[str], List[str]]:
    """(anchors, keywords) merged-dedup order as in fulltext_search
    (graphutil.py:313-325)."""
    anchors = anchor_terms(question, max_terms=3)
    kws = keyword_terms(question, max_terms=8)
    terms: List[str] = []
    seen: set = set()
    for t in anchors + kws:
        t = (t or "").strip()
        if t and t.lower() not in seen:
            terms.append(t)
            seen.add(t.lower())
    return anchors, terms


# ---------------------------------------------------------------------------
# distributed scoring channels
# ---------------------------------------------------------------------------


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        n = len(arr)
        return flat.reshape(n, -1)
    return np.stack(arr.to_numpy(zero_copy_only=False))


def _vector_score_table(
    t: pa.Table, q: np.ndarray, k: int, id_col: str = "entity_id"
) -> pa.Table:
    """The per-batch cosine scoring kernel shared by the distributed
    channels and the LocalKG fast path (graphrag_local.py) — one code
    path so both produce bit-identical scores and tie-breaks.

    float64 so the rounded score is batch-size independent; ties at
    the per-batch cutoff break the same way as the global sort (score
    desc, entity_id asc) or the partial would drop rows the global
    top-k keeps."""
    m = _emb_matrix(t["embedding"]).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((m @ q) / norms, 6)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims))[:k]
    sub = t.select([id_col, "label", "name"]).take(pa.array(order))
    if id_col != "entity_id":
        sub = sub.rename_columns(["entity_id", "label", "name"])
    return sub.append_column("score", pa.array(sims[order], pa.float64()))


def _unit(qvec: np.ndarray) -> np.ndarray:
    q = np.asarray(qvec, dtype=np.float64)
    return q / (np.linalg.norm(q) or 1.0)


def vector_topk(
    nodes: "ray.data.Dataset", qvec: np.ndarray, k: int = 12
) -> "ray.data.Dataset":
    """Cosine top-k over the nodes table (the per-label vector index
    queries merged with max-score dedup, graphutil.py:364-391; node ids
    are already unique post-canonicalization so the dedup is a no-op).

    Per-batch numpy scoring + per-batch top-k partial, then a tiny
    global sort/limit over ``num_batches * k`` rows.
    """
    qref = ray.put(_unit(qvec))

    def score(t: pa.Table) -> pa.Table:
        return _vector_score_table(t, ray.get(qref), k)

    partial = nodes.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", "entity_id"], descending=[True, False]).limit(k)


def build_node_ann_index(
    nodes: "ray.data.Dataset", index_dir: str, n_planes: int = 8
) -> Dict[str, Any]:
    """Persist the node-embedding ANN index: the nodes table written as
    parquet PARTITIONED by LSH hyperplane-sign bucket with the
    id/label/name payload riding along — the role of the reference's
    persistent per-label vector indexes (``ingestMD.py:692-702``,
    queried at ``graphutil.py:364-391``), expressed as data layout.  A
    query then reads only its probed bucket partitions
    (:func:`vector_index_topk`) instead of scanning every node."""
    from neo4j_document_pipeline_ray.extras.similarity import build_ann_index

    return build_ann_index(
        nodes, index_dir, n_planes=n_planes,
        id_col="entity_id", emb_col="embedding",
        payload_cols=("label", "name"),
    )


def vector_index_topk(
    index_dir: str, qvec: np.ndarray, k: int = 12, multiprobe: int = 2
) -> "ray.data.Dataset":
    """Cosine top-k against a :func:`build_node_ann_index` layout:
    reads ONLY the probed bucket partitions (multiprobe=2 touches ~14%
    of a 256-bucket index), scores them with the same rounded-float64
    kernel and tie-break as :func:`vector_topk`, and merges partial
    top-ks.  Output schema matches ``vector_topk`` (entity_id, label,
    name, score) so the hybrid blend is drop-in."""
    from neo4j_document_pipeline_ray.extras.similarity import (
        probe_partition_files,
    )

    files = probe_partition_files(index_dir, qvec, multiprobe)
    if not files:
        return ray.data.from_arrow(pa.table({
            "entity_id": pa.array([], pa.int64()),
            "label": pa.array([], pa.string()),
            "name": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        }))
    qref = ray.put(_unit(qvec))

    def score(t: pa.Table) -> pa.Table:
        return _vector_score_table(t, ray.get(qref), k, id_col="vec_id")

    partial = ray.data.read_parquet(
        files, columns=["vec_id", "label", "name", "embedding"]
    ).map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", "entity_id"], descending=[True, False]).limit(k)


def keyword_topk(
    nodes: "ray.data.Dataset", question: str, k: int = 12
) -> "ray.data.Dataset":
    """Deterministic fulltext stand-in over node names.

    score = |query tokens matched in the normalized name| + an extra
    +1 per matched anchor *phrase* (anchors are force-included in the
    reference's Lucene query and naturally score higher under BM25).
    Rows with score 0 are dropped (no Lucene hit).  Retrieval limit is
    ``max(k, 16)`` like fulltext_search (graphutil.py:329), but the
    returned set is truncated to ``k`` exactly as the reference slices
    ``hits[:limit]`` (graphutil.py:354).
    """
    anchors, terms = _query_terms(question)
    toks = sorted({
        tok for t in terms for tok in normalize_name_for_key(t).split()
    })
    phrases = sorted({
        p for p in (normalize_name_for_key(a) for a in anchors if " " in a)
        if p
    })
    lim = max(k, 16)

    def score(t: pa.Table) -> pa.Table:
        # vectorized over the precomputed norm_key column
        # (norm_key == normalize_name_for_key(name) by construction of
        # the nodes table — the cluster key IS the normalization);
        # score = |query tokens present as words| + 1 per anchor phrase
        # contained as a substring, exactly the per-row loop's semantics
        import pandas as pd

        keys = pd.Series(t["norm_key"].to_pylist()).fillna("")
        padded = " " + keys + " "
        scores = np.zeros(len(keys), dtype=np.float64)
        for tok in toks:
            scores += padded.str.contains(
                f" {tok} ", regex=False).to_numpy(float)
        for p in phrases:
            scores += keys.str.contains(p, regex=False).to_numpy(float)
        keep = np.nonzero(scores > 0)[0]
        if len(keep) > lim:
            ids = t["entity_id"].to_numpy(zero_copy_only=False)[keep]
            keep = keep[np.lexsort((ids, -scores[keep]))[:lim]]
        sub = t.select(["entity_id", "label", "name"]).take(pa.array(keep))
        return sub.append_column("score", pa.array(scores[keep], pa.float64()))

    partial = nodes.select_columns(
        ["entity_id", "label", "name", "norm_key"]
    ).map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", "entity_id"], descending=[True, False]).limit(k)


# BM25 constants — Lucene's defaults, which score the reference's
# fulltext index (graphutil.py:211-217 CREATE FULLTEXT INDEX;
# queried at graphutil.py:306-359)
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_query(question: str) -> Tuple[List[str], List[str]]:
    """(tokens, phrases) of the Lucene query fulltext_search builds
    (graphutil.py:313-328): every merged term contributes its tokens;
    multi-word anchors additionally contribute a quoted phrase."""
    anchors, terms = _query_terms(question)
    toks = sorted({
        tok for t in terms for tok in normalize_name_for_key(t).split()
    })
    phrases = sorted({
        normalize_name_for_key(a) for a in anchors
        if " " in normalize_name_for_key(a)
    })
    return toks, phrases


def _bm25_stats_partial(
    df: "pd.DataFrame", tok_arr: List[str], phr_arr: List[str]
) -> dict:
    """One batch -> one tiny partial-stats row (shared by the
    distributed pass and the LocalKG fast path)."""
    keys = df["norm_key"].fillna("")
    padded = " " + keys + " "
    row = {
        "n": len(df),
        "dl_sum": int(keys.str.count(" ").where(keys != "", -1).sum())
        + len(df),  # tokens = spaces+1 for non-empty, 0 for empty
    }
    for i, t in enumerate(tok_arr):
        row[f"t{i}"] = int(
            padded.str.contains(f" {t} ", regex=False).sum()
        )
    for i, p in enumerate(phr_arr):
        row[f"p{i}"] = int(
            padded.str.contains(f" {p} ", regex=False).sum()
        )
    return row


def _bm25_fold_stats(
    parts: List[dict], tok_arr: List[str], phr_arr: List[str]
) -> Dict[str, Any]:
    return {
        "n": sum(r["n"] for r in parts),
        "dl_sum": sum(r["dl_sum"] for r in parts),
        "df_tok": {
            t: sum(r[f"t{i}"] for r in parts) for i, t in enumerate(tok_arr)
        },
        "df_phr": {
            p: sum(r[f"p{i}"] for r in parts) for i, p in enumerate(phr_arr)
        },
    }


def _bm25_corpus_stats(
    nodes: "ray.data.Dataset", toks: List[str], phrases: List[str]
) -> Dict[str, Any]:
    """One distributed pass -> {n, dl_sum, df per token/phrase}.

    Document = a node's normalized name (the unit the reference's
    fulltext index stores).  Per batch the pass emits ONE tiny partial
    row; the driver folds #batches rows — no shuffle.  At 100 TB scale
    this is the query-time half of an inverted index; the df of the
    handful of query terms is the only statistic needed, so a full
    postings index is not required.
    """
    tok_arr = list(toks)
    phr_arr = list(phrases)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame([_bm25_stats_partial(df, tok_arr, phr_arr)])

    parts = nodes.select_columns(["norm_key"]).map_batches(
        partial, batch_format="pandas"
    ).take_all()
    return _bm25_fold_stats(parts, tok_arr, phr_arr)


def _bm25_idf(df: int, n: int) -> float:
    """Lucene's BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))


def bm25_topk(
    nodes: "ray.data.Dataset", question: str, k: int = 12
) -> "ray.data.Dataset":
    """Real BM25 over node names — the reference's Lucene fulltext
    channel (graphutil.py:306-359) re-expressed in two Ray passes.

    Pass 1 collects corpus stats (N, avgdl, df of each query token and
    anchor phrase); pass 2 scores every name with Lucene's BM25
    (k1=1.2, b=0.75) — token tf from exact token occurrences, each
    matched anchor phrase contributing as a tf=1 term of its own df —
    then per-batch top-k partials feed one tiny global sort.

    Mirrors the reference's retry: if the full query yields no hits,
    re-score with the anchor terms alone (graphutil.py:330-344), and
    slice the final result to ``k`` like ``hits[:limit]``
    (graphutil.py:354).  Note the retry is defensive parity: the
    reference reaches it when Lucene rejects a malformed main query,
    whereas this deterministic scorer's main query subsumes the anchor
    terms, so the retry fires only when the anchors also miss.
    """
    return _bm25_with_retry(
        nodes, question, k,
        lambda toks, phrases: _bm25_corpus_stats(nodes, toks, phrases))


def _bm25_with_retry(nodes, question: str, k: int, stats_fn) -> "ray.data.Dataset":
    toks, phrases = _bm25_query(question)
    # materialize: the emptiness probe below and the caller's take_all
    # would otherwise each execute the (lazy) scoring pipeline
    res = _bm25_score(nodes, toks, phrases, k, stats_fn(toks, phrases)).materialize()
    if res.count() == 0:
        # first-anchor-only retry, mirroring the reference's
        # fulltext_search fallback (graphutil.py:330-344 retries with
        # ``anchors[:1]``).  Defensive parity: the reference reaches it
        # when Lucene rejects a malformed main query, whereas this
        # deterministic scorer's main query subsumes the anchor terms,
        # so the retry fires only when the first anchor also misses.
        anchors, _terms = _query_terms(question)
        if anchors:
            a = anchors[0]
            a_norm = normalize_name_for_key(a)
            a_toks = sorted(set(a_norm.split()))
            a_phr = [a_norm] if " " in a_norm else []
            res = _bm25_score(nodes, a_toks, a_phr, k,
                              stats_fn(a_toks, a_phr))
    return res


def _bm25_weights(
    stats: Dict[str, Any], toks: List[str], phrases: List[str]
) -> Tuple[list, list, float]:
    n = max(1, stats["n"])
    avgdl = max(1e-9, stats["dl_sum"] / n)
    tok_w = [(t, _bm25_idf(stats["df_tok"][t], n)) for t in toks
             if stats["df_tok"][t] > 0]
    phr_w = [(p, _bm25_idf(stats["df_phr"][p], n)) for p in phrases
             if stats["df_phr"][p] > 0]
    return tok_w, phr_w, avgdl


def _bm25_score_table(
    t: pa.Table, tok_w: list, phr_w: list, avgdl: float, lim: int
) -> pa.Table:
    """The per-batch BM25 scoring kernel shared by the distributed
    channel and the LocalKG fast path."""
    import pandas as pd
    import re as _re

    k1, b = _BM25_K1, _BM25_B
    keys = pd.Series(t["norm_key"].to_pylist()).fillna("")
    padded = " " + keys + " "
    dl = (keys.str.count(" ") + 1).where(keys != "", 0).to_numpy(float)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    scores = np.zeros(len(keys), dtype=np.float64)
    for tok, idf in tok_w:
        # overlapping token-occurrence count via lookahead so
        # " a a " counts tf=2 (adjacent matches share a space)
        tf = padded.str.count(f"(?= {_re.escape(tok)} )").to_numpy(float)
        scores += idf * (tf * (k1 + 1.0)) / np.where(tf > 0, tf + norm, 1.0) * (tf > 0)
    for phr, idf in phr_w:
        hit = padded.str.contains(f" {phr} ", regex=False).to_numpy()
        scores += np.where(hit, idf * (k1 + 1.0) / (1.0 + norm), 0.0)
    scores = np.round(scores, 6)
    keep = np.nonzero(scores > 0)[0]
    if len(keep) > lim:
        ids = t["entity_id"].to_numpy(zero_copy_only=False)[keep]
        keep = keep[np.lexsort((ids, -scores[keep]))[:lim]]
    sub = t.select(["entity_id", "label", "name"]).take(pa.array(keep))
    return sub.append_column("score", pa.array(scores[keep], pa.float64()))


def _bm25_score(
    nodes: "ray.data.Dataset", toks: List[str], phrases: List[str], k: int,
    stats: Optional[Dict[str, Any]] = None,
) -> "ray.data.Dataset":
    if stats is None:
        stats = _bm25_corpus_stats(nodes, toks, phrases)
    tok_w, phr_w, avgdl = _bm25_weights(stats, toks, phrases)
    lim = max(k, 16)

    def score(t: pa.Table) -> pa.Table:
        return _bm25_score_table(t, tok_w, phr_w, avgdl, lim)

    partial = nodes.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", "entity_id"], descending=[True, False]).limit(k)


# longest contiguous token n-gram whose df the text index stores.
# Node names are short (entity names, not documents), so a name of L
# tokens contributes at most L*(L+1)/2 grams; the cap only bites on
# pathological names.  Together with the ``max_name_len`` recorded in
# the index meta this makes phrase df TOTAL: a phrase of <= max_gram
# tokens is served from the index, a phrase LONGER than the longest
# name in the corpus has df = 0 by definition (no name can contain
# it), and only the (cap < len <= max_name_len) sliver — which needs
# a >12-token entity name to exist at all — pays a logged scan.
_MAX_INDEXED_GRAM = 12


def build_text_index(nodes: "ray.data.Dataset", index_dir: str) -> Dict[str, Any]:
    """Persist the fulltext-index statistics: a (token, df) table
    RANGE-SORTED by token (so a query's df lookup reads only the row
    groups covering its tokens) plus a meta manifest {n, dl_sum} — the
    data-layout analog of the reference's ``CREATE FULLTEXT INDEX``
    (graphutil.py:211-217).

    df is exact document frequency (distinct names containing the
    token), computed by per-batch partial counts + one small token
    groupby.  The table also stores contiguous token n-grams up to
    ``_MAX_INDEXED_GRAM`` (the compact stand-in for Lucene's positional
    postings), so quoted-anchor-phrase queries of <= 3 tokens read their
    phrase df from the index instead of scanning the corpus; only
    longer phrases pay a scan.  n-grams contain spaces and tokens
    don't, so the two key spaces cannot collide.
    """
    import json
    import os
    import shutil

    from neo4j_document_pipeline_ray.stages.grouped import partitioned_group_map

    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        keys = df["norm_key"].fillna("")

        def grams_of(tl):
            out = set(tl)
            for n in range(2, min(len(tl), _MAX_INDEXED_GRAM) + 1):
                out.update(
                    " ".join(tl[i:i + n]) for i in range(len(tl) - n + 1)
                )
            return list(out)

        # grams_of returns a set per name, so the explode is already
        # distinct-per-name and value_counts IS the per-batch df
        ex = keys.str.split().map(grams_of).explode().dropna()
        cnt = ex.value_counts()
        return pd.DataFrame({"token": cnt.index.astype(str),
                             "df": cnt.values.astype("int64")})

    parts = nodes.select_columns(["norm_key"]).map_batches(
        partial, batch_format="pandas")

    def sum_partition(t: pa.Table) -> pa.Table:
        agg = t.group_by("token", use_threads=False).aggregate([("df", "sum")])
        return pa.table({"token": agg["token"],
                         "df": pc.cast(agg["df_sum"], pa.int64())})

    df_table = partitioned_group_map(parts, "token", sum_partition, 8,
                                     batch_format="pyarrow")
    df_table.sort("token").write_parquet(os.path.join(index_dir, "df"))

    def _meta_batch(t: pa.Table) -> pa.Table:
        lens = pc.if_else(
            pc.equal(pc.coalesce(t["norm_key"], ""), ""),
            pa.scalar(0, pa.int64()),
            pc.cast(pc.add(pc.count_substring(
                pc.coalesce(t["norm_key"], ""), " "), 1), pa.int64()),
        )
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "dl_sum": pa.array([int(pc.sum(lens).as_py() or 0)], pa.int64()),
            "max_len": pa.array([int(pc.max(lens).as_py() or 0)], pa.int64()),
        })

    meta_parts = nodes.select_columns(["norm_key"]).map_batches(
        _meta_batch, batch_format="pyarrow").take_all()
    meta = {"n": sum(r["n"] for r in meta_parts),
            "dl_sum": sum(r["dl_sum"] for r in meta_parts),
            "max_gram": _MAX_INDEXED_GRAM,
            # longest name (in tokens): any phrase longer than this has
            # df = 0 by definition — no corpus scan needed to know it
            "max_name_len": max(
                (r["max_len"] for r in meta_parts), default=0)}
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_index_topk(
    nodes: "ray.data.Dataset", index_dir: str, question: str, k: int = 12
) -> "ray.data.Dataset":
    """BM25 top-k against a :func:`build_text_index` layout: token AND
    anchor-phrase df come from a PRUNED read of the sorted (token, df)
    table (row-group stats skip everything outside the query's key
    range) and N/avgdl from the meta manifest.  Phrases up to the
    index's ``max_gram`` tokens are served from the stored n-grams;
    only longer phrases pay a corpus-stats scan.  Result is identical
    to :func:`bm25_topk` (pinned in the suite)."""
    import json
    import os

    import pyarrow.dataset as pads

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    # indexes written before n-gram support carry no max_gram: treat
    # every phrase as unindexed (scan) rather than returning df=0
    max_gram = meta.get("max_gram", 1)
    # without a recorded max name length (old index), assume unbounded
    # names so long phrases scan instead of wrongly shortcutting to 0
    max_name_len = meta.get("max_name_len", float("inf"))
    dset = pads.dataset(os.path.join(index_dir, "df"))

    def stats_fn(toks: List[str], phrases: List[str]) -> Dict[str, Any]:
        indexed_phr, scan_phr, zero_phr = [], [], []
        for p in phrases:
            plen = p.count(" ") + 1
            if plen <= max_gram:
                indexed_phr.append(p)
            elif plen > max_name_len:
                # longer than every name in the corpus: df = 0 exactly
                zero_phr.append(p)
            else:
                scan_phr.append(p)
        df_tok = {t: 0 for t in toks}
        df_phr = {p: 0 for p in indexed_phr + zero_phr}
        lookups = list(toks) + indexed_phr
        if lookups:
            tbl = dset.to_table(filter=pads.field("token").isin(lookups))
            got = dict(zip(tbl["token"].to_pylist(), tbl["df"].to_pylist()))
            df_tok.update({t: got[t] for t in toks if t in got})
            df_phr.update({p: got[p] for p in indexed_phr if p in got})
        if scan_phr:
            # only reachable when a >max_gram-token name exists AND the
            # anchor is that long; never silent
            import logging

            logging.getLogger(__name__).warning(
                "text index: %d anchor phrase(s) longer than the "
                "indexed max_gram=%d but within max_name_len=%s — "
                "paying a corpus-stats scan", len(scan_phr), max_gram,
                max_name_len)
            scan = _bm25_corpus_stats(nodes, [], scan_phr)
            df_phr.update(scan["df_phr"])
        return {"n": meta["n"], "dl_sum": meta["dl_sum"],
                "df_tok": df_tok, "df_phr": df_phr}

    return _bm25_with_retry(nodes, question, k, stats_fn)


# ---------------------------------------------------------------------------
# hybrid blend + driver-side selection (operates on <= k rows, like the
# reference)
# ---------------------------------------------------------------------------


def _minmax(vals: List[float]) -> List[float]:
    """Per-channel min-max normalization (graphutil.py:186-193;
    degenerate all-equal case maps to 0.5 like the reference)."""
    if not vals:
        return []
    lo, hi = min(vals), max(vals)
    if hi - lo < 1e-12:
        return [0.5 for _ in vals]
    return [(v - lo) / (hi - lo) for v in vals]


def hybrid_candidates(
    nodes: "ray.data.Dataset",
    question: str,
    qvec: np.ndarray,
    k_vec: int = 12,
    k_kw: int = 12,
    alpha_vec: float = 0.6,
    beta_kw: float = 0.25,
    text_index_dir: Optional[str] = None,
    ann_index_dir: Optional[str] = None,
    ann_multiprobe: int = 2,
    local_kg=None,
) -> List[Dict[str, Any]]:
    """Blend the two channels exactly as graphutil.py:401-447: max-score
    per entity within a channel, per-channel min-max normalization, then
    a weighted sum with weights renormalized to 1.

    The keyword channel is BM25 (:func:`bm25_topk`) — the reference's
    fulltext channel is Lucene, which scores with BM25.  With a
    ``text_index_dir`` (a :func:`build_text_index` layout) the token df
    comes from the persisted index instead of a corpus-stats pass; with
    an ``ann_index_dir`` (a :func:`build_node_ann_index` layout) the
    vector channel reads only its probed bucket partitions instead of
    scanning the nodes table — the reference's persistent vector
    indexes (``ingestMD.py:692-702``).  A ``local_kg``
    (:class:`graphrag_local.LocalKG`) runs both channels in-process on
    the pulled nodes projection — same kernels, no Ray jobs."""
    # the two channels are independent Ray jobs — overlap them
    from concurrent.futures import ThreadPoolExecutor

    def _vec():
        if local_kg is not None:
            return local_kg.vector_topk(qvec, k=k_vec)
        if ann_index_dir:
            return vector_index_topk(ann_index_dir, qvec, k=k_vec,
                                     multiprobe=ann_multiprobe).take_all()
        return vector_topk(nodes, qvec, k=k_vec).take_all()

    def _kw():
        if local_kg is not None:
            return local_kg.bm25_topk(question, k=k_kw)
        if text_index_dir:
            return bm25_index_topk(nodes, text_index_dir, question,
                                   k=k_kw).take_all()
        return bm25_topk(nodes, question, k=k_kw).take_all()

    with ThreadPoolExecutor(max_workers=2) as pool:
        vf, kf = pool.submit(_vec), pool.submit(_kw)
        vec_hits, kw_hits = vf.result(), kf.result()

    raw: Dict[int, Dict[str, Any]] = {}
    for h in vec_hits:
        e = raw.setdefault(h["entity_id"], {**h, "vec": 0.0, "kw": 0.0})
        e["vec"] = max(e["vec"], float(h["score"]))
    for h in kw_hits:
        e = raw.setdefault(h["entity_id"], {**h, "vec": 0.0, "kw": 0.0})
        e["kw"] = max(e["kw"], float(h["score"]))

    entries = sorted(raw.values(), key=lambda e: e["entity_id"])
    vec_n = _minmax([e["vec"] for e in entries])
    kw_n = _minmax([e["kw"] for e in entries])
    w_sum = max(1e-12, alpha_vec + beta_kw)
    w_vec, w_kw = alpha_vec / w_sum, beta_kw / w_sum
    out = []
    for e, vn, kn in zip(entries, vec_n, kw_n):
        out.append(
            {
                "entity_id": e["entity_id"],
                "label": e["label"],
                "name": e["name"],
                "score": round(w_vec * vn + w_kw * kn, 6),
            }
        )
    out.sort(key=lambda d: (-d["score"], d["entity_id"]))
    return out


def mmr_select(
    candidates: List[Dict[str, Any]],
    embeddings: Dict[int, np.ndarray],
    k: int,
    lambda_mult: float = 0.7,
) -> List[Dict[str, Any]]:
    """Maximal Marginal Relevance (graphutil.py:452-497): greedy pick
    maximizing ``lambda*relevance - (1-lambda)*max_sim_to_selected``."""
    if not candidates:
        return []

    def unit(v: Optional[np.ndarray]) -> Optional[np.ndarray]:
        if v is None:
            return None
        n = np.linalg.norm(v)
        return v / n if n else v

    embs = [unit(embeddings.get(c["entity_id"])) for c in candidates]
    rest = list(range(len(candidates)))
    best0 = max(rest, key=lambda i: (candidates[i]["score"], -candidates[i]["entity_id"]))
    selected = [best0]
    rest.remove(best0)

    def max_sim(j: int) -> float:
        ej = embs[j]
        if ej is None:
            return 0.0
        sims = [float(ej @ embs[i]) if embs[i] is not None else 0.0 for i in selected]
        return max(sims) if sims else 0.0

    while rest and len(selected) < min(k, len(candidates)):
        best_j, best_val = None, -1e9
        for j in rest:
            val = lambda_mult * candidates[j]["score"] - (1 - lambda_mult) * max_sim(j)
            if val > best_val:
                best_val, best_j = val, j
        selected.append(best_j)
        rest.remove(best_j)
    return [candidates[i] for i in selected]


def diversify_by_document(
    candidates: List[Dict[str, Any]],
    titles: Dict[int, Optional[str]],
    k: int,
) -> List[Dict[str, Any]]:
    """Round-robin across owning documents (graphutil.py:512-542):
    buckets keyed by doc title, ordered by each bucket's best score."""
    if not candidates:
        return []
    buckets: Dict[str, List[Dict[str, Any]]] = {}
    for c in candidates:
        t = titles.get(c["entity_id"]) or "__NO_DOC__"
        buckets.setdefault(t, []).append(c)
    for b in buckets.values():
        b.sort(key=lambda c: (-c["score"], c["entity_id"]))
    order = sorted(buckets, key=lambda key: (-buckets[key][0]["score"], key))
    picked: List[Dict[str, Any]] = []
    ptrs = {key: 0 for key in buckets}
    while len(picked) < min(k, len(candidates)):
        progressed = False
        for key in order:
            i = ptrs[key]
            if i < len(buckets[key]):
                picked.append(buckets[key][i])
                ptrs[key] += 1
                progressed = True
                if len(picked) >= k:
                    break
        if not progressed:
            break
    return picked


def one_seed_per_document(
    candidates: List[Dict[str, Any]],
    first_doc: Dict[int, Optional[str]],
) -> List[int]:
    """Keep the first candidate per owning document (main.py:316-333);
    nodes without a document count as their own bucket."""
    seen: set = set()
    seeds: List[int] = []
    for c in candidates:
        doc = first_doc.get(c["entity_id"]) or str(c["entity_id"])
        if doc in seen:
            continue
        seen.add(doc)
        seeds.append(c["entity_id"])
    return seeds


# ---------------------------------------------------------------------------
# provenance lookups (distributed semi-joins on the mentions/docs tables)
# ---------------------------------------------------------------------------


def _filter_by_ids(
    ds: "ray.data.Dataset", ids: Sequence[int], col: str
) -> "ray.data.Dataset":
    """Broadcast-filter a big table down to rows whose ``col`` is in a
    small id set — ``ray.put`` once, read per batch; no shuffle."""
    ref = ray.put(pa.array(sorted({int(i) for i in ids}), pa.int64()))

    def flt(t: pa.Table) -> pa.Table:
        idset = ray.get(ref)
        return t.filter(pc.is_in(t[col], value_set=idset))

    return ds.map_batches(flt, batch_format="pyarrow")


def doc_titles_for_nodes(
    mentions: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    entity_ids: Sequence[int],
) -> Dict[int, Optional[str]]:
    """{entity_id -> owning doc title} via mentions x docs
    (graphutil.py:676-696; "first" doc = min doc_id, deterministic)."""
    if not entity_ids:
        return {}
    hits = _filter_by_ids(mentions, entity_ids, "entity_id").take_all()
    if not hits:
        return {}
    first: Dict[int, str] = {}
    for h in hits:
        e = int(h["entity_id"])
        if e not in first or h["doc_id"] < first[e]:
            first[e] = h["doc_id"]
    doc_ids = sorted(set(first.values()))
    ref = ray.put(pa.array(doc_ids))

    def flt(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        mask = pc.is_in(t["doc_id"], value_set=ids)
        return t.filter(mask).select(["doc_id", "title"])

    titles = {
        r["doc_id"]: r["title"]
        for r in docs.map_batches(flt, batch_format="pyarrow").take_all()
    }
    return {e: titles.get(d) for e, d in first.items()}


def first_doc_for_nodes(
    mentions: "ray.data.Dataset", entity_ids: Sequence[int]
) -> Dict[int, Optional[str]]:
    """{entity_id -> first (min) mentioning doc_id} (main.py:317-323)."""
    if not entity_ids:
        return {}
    hits = _filter_by_ids(mentions, entity_ids, "entity_id").take_all()
    first: Dict[int, str] = {}
    for h in hits:
        e = int(h["entity_id"])
        if e not in first or h["doc_id"] < first[e]:
            first[e] = h["doc_id"]
    return {int(i): first.get(int(i)) for i in entity_ids}


# ---------------------------------------------------------------------------
# k-hop expansion
# ---------------------------------------------------------------------------


def traverse_neighbors(
    edges: "ray.data.Dataset",
    seed_ids: Sequence[int],
    max_hops: int = 1,
) -> Dict[str, Any]:
    """BFS neighborhood expansion with NODE_GLOBAL uniqueness
    (graphutil.py:547-632; hop clamp 1..3 from main.py:335-338).

    Undirected like the reference's ``-[*1..h]-`` pattern.  Each round
    broadcast-filters the edges table on the current frontier (small id
    set against a huge table — no shuffle), collects the incident
    edges, and advances the frontier to unvisited endpoints.  Rounds
    are bounded by the hop clamp, so the whole expansion is <= 3
    distributed filter passes.
    """
    hops = max(1, min(int(max_hops), 3))
    if not seed_ids:
        return {"node_ids": [], "rels": []}
    visited = set(int(i) for i in seed_ids)
    frontier = set(visited)
    # BFS rounds move ONLY the endpoint id pairs (two int64 columns) —
    # the 1 KB provenance text never rides a round.  The final rel set
    # is exactly the edges with an endpoint in a PROCESSED frontier
    # (nodes at distance <= hops-1): those are the edges on BFS paths of
    # length <= hops, matching the reference's APOC expansion — an edge
    # between two distance-`hops` nodes lies on no such path.  One
    # payload fetch at the end replaces the per-round full-row
    # collections, which also overlapped (round r re-collects round
    # r-1's edges).
    slim = edges.select_columns(["src_id", "dst_id"])
    processed: set = set()
    for _ in range(hops):
        if not frontier:
            break
        processed |= frontier
        ref = ray.put(pa.array(sorted(frontier), pa.int64()))

        def flt(t: pa.Table) -> pa.Table:
            ids = ray.get(ref)
            mask = pc.or_(
                pc.is_in(t["src_id"], value_set=ids),
                pc.is_in(t["dst_id"], value_set=ids),
            )
            return t.filter(mask)

        pairs = slim.map_batches(flt, batch_format="pyarrow").take_all()
        nxt: set = set()
        for r in pairs:
            for e in (int(r["src_id"]), int(r["dst_id"])):
                if e not in visited:
                    visited.add(e)
                    nxt.add(e)
        frontier = nxt

    rels = fetch_rel_payload(edges, processed)
    return {"node_ids": sorted(visited), "rels": rels}


# only the fields the Graph Facts formatter reads — widening this to
# every edge column (embeddings included) made the driver-side
# row materialization the dominant cost
REL_PAYLOAD_COLS = ("src_id", "dst_id", "rel_type", "term", "source_text")


def fetch_rel_payload(
    edges: "ray.data.Dataset", processed: "set[int]"
) -> List[Dict[str, Any]]:
    """One distributed filtered read of the formatter's edge columns
    for every edge incident to a processed-frontier node — shared by
    :func:`traverse_neighbors` and the LocalKG BFS when the edge
    payload itself exceeds the local budget."""
    vref = ray.put(pa.array(sorted(processed), pa.int64()))

    def fetch(t: pa.Table) -> pa.Table:
        ids = ray.get(vref)
        mask = pc.or_(
            pc.is_in(t["src_id"], value_set=ids),
            pc.is_in(t["dst_id"], value_set=ids),
        )
        return t.filter(mask)

    rel_cols = [c for c in REL_PAYLOAD_COLS if c in edges.schema().names]
    rels = edges.select_columns(rel_cols).map_batches(
        fetch, batch_format="pyarrow").take_all()
    rels.sort(key=lambda r: (r["src_id"], r["rel_type"], r["dst_id"], r.get("term") or ""))
    return rels


def khop_entity_ids(
    edges: "ray.data.Dataset", seed_ids: Sequence[int], max_hops: int = 2
) -> List[int]:
    """Just the reachable entity-id set (used by the oracle-checked query)."""
    return traverse_neighbors(edges, seed_ids, max_hops)["node_ids"]


# ---------------------------------------------------------------------------
# formatting
# ---------------------------------------------------------------------------

_SKIP_RELS = {"SOURCE", "MENTIONS"}


def format_graph_context(
    expanded: Dict[str, Any],
    node_info: Dict[int, Dict[str, str]],
    titles: Optional[Dict[int, Optional[str]]] = None,
    max_lines: Optional[int] = None,
    snippet_chars: Optional[int] = None,
    include_source: bool = False,
) -> str:
    """Render "Graph Facts" lines (graphutil.py:698-767): skip
    SOURCE/MENTIONS, dedup by (norm(subject), lower(type), norm(object))
    keeping the first occurrence, optional snippet/source suffixes."""
    rels = [r for r in expanded.get("rels", []) if r.get("rel_type") not in _SKIP_RELS]
    # normalize each node name ONCE, not once per incident rel
    norm_cache = {
        nid: normalize_name_for_key(info.get("name", ""))
        for nid, info in node_info.items()
    }
    seen: set = set()
    deduped = []
    for r in rels:
        key = (
            norm_cache.get(int(r["src_id"]), ""),
            (r.get("rel_type") or "").lower(),
            norm_cache.get(int(r["dst_id"]), ""),
        )
        if key in seen:
            continue
        seen.add(key)
        deduped.append(r)
    if not deduped:
        return "Graph Facts: (no results)"
    if isinstance(max_lines, int) and max_lines > 0:
        deduped = deduped[:max_lines]
    titles = titles or {}
    lines = ["Graph Facts:"]
    for r in deduped:
        s = node_info.get(int(r["src_id"]), {})
        t = node_info.get(int(r["dst_id"]), {})
        s_name, t_name = s.get("name", "?"), t.get("name", "?")
        s_label, t_label = s.get("label", "Entity"), t.get("label", "Entity")
        raw = (r.get("source_text") or "").replace("\n", " ").strip()
        if isinstance(snippet_chars, int) and 0 < snippet_chars < len(raw):
            snip = raw[:snippet_chars].rstrip() + "..."
        else:
            snip = raw
        snip_str = f' [snippet: "{snip}"]' if snip else ""
        src_str = ""
        if include_source:
            ts = titles.get(int(r["src_id"]))
            te = titles.get(int(r["dst_id"]))
            if ts and te and ts != te:
                src_str = f' [source: "{ts}" | "{te}"]'
            elif ts or te:
                src_str = f' [source: "{ts or te}"]'
        lines.append(
            f'- {s_label}("{s_name}") -[{r.get("rel_type")}]-> '
            f'{t_label}("{t_name}"){snip_str}{src_str}'
        )
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def embed_question(question: str, cfg: Optional[PipelineConfig] = None) -> np.ndarray:
    """Question embedding via the pipeline's embedder backend
    (reference embeds with the same endpoint used at ingest,
    main.py:262, graphutil.py:133-153)."""
    cfg = cfg or PipelineConfig()
    return HashEmbedder(dim=cfg.embed_dim).embed([question])[0]


def graphrag(
    tables: Dict[str, "ray.data.Dataset"],
    question: str,
    top_k: int = 5,
    hops: int = 1,
    use_mmr: bool = True,
    use_cross_doc: bool = True,
    include_source: bool = True,
    alpha_vec: float = 0.6,
    beta_kw: float = 0.4,
    text_index_dir: Optional[str] = None,
    ann_index_dir: Optional[str] = None,
    cfg: Optional[PipelineConfig] = None,
    local_kg=None,
    local_max_bytes: Optional[int] = None,
) -> Dict[str, Any]:
    """The full /graphrag flow (main.py:221-400) over KG tables
    ``{nodes, edges, mentions, docs}``; returns facts + seeds + per-step
    timings like the reference's response payload.

    Channel depths follow the endpoint: ``k_vec = k_kw = max(12, top_k)``
    and the blend weights default to the RagBody defaults
    ``alpha_vec=0.6 / beta_kw=0.4`` (main.py:268-272).

    Serving fast path: pass a prepared
    :class:`graphrag_local.LocalKG` (pulled once, reused across
    queries — the way a query server holds its indexes, like the
    reference's Neo4j), or set ``local_max_bytes`` to pull one for
    this call.  Every step whose tier fits the budget runs in-process
    with the SAME kernels; oversized tiers stay on the distributed
    path.  Default (both None) is fully distributed."""
    cfg = cfg or PipelineConfig()
    timings: Dict[str, float] = {}
    t = time.time()
    loc = local_kg
    if loc is None and local_max_bytes:
        from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

        loc = LocalKG.maybe_pull(tables, local_max_bytes)
    timings["local_pull"] = time.time() - t

    t = time.time()
    qvec = embed_question(question, cfg)
    timings["embed"] = time.time() - t

    t = time.time()
    k_ch = max(12, top_k)
    cands = hybrid_candidates(
        tables["nodes"], question, qvec,
        k_vec=k_ch, k_kw=k_ch, alpha_vec=alpha_vec, beta_kw=beta_kw,
        text_index_dir=text_index_dir, ann_index_dir=ann_index_dir,
        local_kg=loc,
    )
    timings["hybrid"] = time.time() - t

    if use_mmr and len(cands) > top_k:
        t = time.time()
        ids = [c["entity_id"] for c in cands]
        if loc is not None:
            embs = loc.embeddings_for(ids)
        else:
            emb_rows = _filter_by_ids(tables["nodes"], ids, "entity_id").select_columns(
                ["entity_id", "embedding"]
            ).take_all()
            embs = {
                int(r["entity_id"]): np.asarray(r["embedding"], dtype=np.float32)
                for r in emb_rows
            }
        cands = mmr_select(cands, embs, k=top_k)
        timings["mmr"] = time.time() - t
    else:
        cands = cands[:top_k]

    def _titles_for(ids):
        if loc is not None and loc.has_titles:
            return loc.doc_titles(ids)
        return doc_titles_for_nodes(tables["mentions"], tables["docs"], ids)

    if use_cross_doc and len(cands) > 1:
        t = time.time()
        titles = _titles_for([c["entity_id"] for c in cands])
        cands = diversify_by_document(cands, titles, k=len(cands))
        timings["cross_doc"] = time.time() - t

    t = time.time()
    cand_ids = [c["entity_id"] for c in cands]
    if loc is not None and loc.has_mentions:
        first_doc = loc.first_doc(cand_ids)
    else:
        first_doc = first_doc_for_nodes(tables["mentions"], cand_ids)
    seeds = one_seed_per_document(cands, first_doc)
    if loc is not None and loc.has_edges:
        expanded = loc.traverse(seeds, hops, edges_ds=tables["edges"])
    else:
        expanded = traverse_neighbors(tables["edges"], seeds, max_hops=hops)
    timings["graph_traverse"] = time.time() - t

    t = time.time()
    node_ids = expanded["node_ids"]
    if loc is not None:
        node_info = loc.node_info(node_ids)
    else:
        info_rows = _filter_by_ids(tables["nodes"], node_ids, "entity_id").select_columns(
            ["entity_id", "label", "name"]
        ).take_all()
        node_info = {
            int(r["entity_id"]): {"label": r["label"], "name": r["name"]}
            for r in info_rows
        }
    titles = _titles_for(node_ids) if include_source else {}
    facts = format_graph_context(
        expanded, node_info, titles, include_source=include_source
    )
    timings["format"] = time.time() - t

    return {
        "facts": facts,
        "seeds": seeds,
        "candidates": cands,
        "n_nodes": len(node_ids),
        "n_rels": len(expanded["rels"]),
        "timings_s": {k: round(v, 4) for k, v in timings.items()},
    }
