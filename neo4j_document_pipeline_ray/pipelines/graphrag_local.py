"""Size-gated local serving snapshot for the /graphrag query path.

The reference serves /graphrag from a single Neo4j instance whose
indexes hold the whole graph (graphutil.py:364-391 vector queries,
graphutil.py:547-632 BFS) — its query latency is index lookups, not
cluster jobs.  The distributed channels in pipelines/graphrag.py are
correct at any scale, but every step is a Ray job with a fixed
scheduling cost (~0.3-0.5 s), so a hops=2 query pays ~13 jobs of pure
overhead on a graph whose pruned serving projection is a few MB.

:class:`LocalKG` pulls that projection into driver memory ONCE, under
a hard byte budget with streaming early-abort, in tiers ordered by
size and value:

1. ``nodes``       — entity_id/label/name/norm_key/embedding (channels,
                     MMR, node info; required — no nodes, no LocalKG)
2. ``edge pairs``  — src_id/dst_id only (BFS; 16 B/edge)
3. ``mentions``    — doc_id/entity_id (seed dedup + provenance titles)
4. ``docs``        — doc_id/title
5. ``edge payload``— rel_type/term/source_text (the formatter's
                     columns — the big tier; when it overflows, the
                     final payload fetch stays a single distributed
                     job via :func:`graphrag.fetch_rel_payload`)

A tier that would cross the remaining budget is dropped (its stream
aborted) and the corresponding step falls back to the distributed
path; at 100 TB every tier overflows and graphrag behaves exactly as
before.  Every scoring kernel is SHARED with the distributed path
(``_vector_score_table``, ``_bm25_stats_partial`` /
``_bm25_score_table``), so both paths are bit-identical — pinned by
tests/test_graphrag.py::TestLocalKG.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from neo4j_document_pipeline_ray.functions.textnorm import normalize_name_for_key
from neo4j_document_pipeline_ray.pipelines.graphrag import (
    REL_PAYLOAD_COLS,
    _bm25_fold_stats,
    _bm25_query,
    _bm25_score_table,
    _bm25_stats_partial,
    _bm25_weights,
    _query_terms,
    _unit,
    _vector_score_table,
    fetch_rel_payload,
)

# Default per-query-server budget for the pulled projection.  Matches
# the broadcast-join ceiling rationale (stages/grouped.py): a side that
# fits comfortably next to the working set of one process.
DEFAULT_LOCAL_BUDGET = 256 << 20


def _pull_limited(ds, cols: Sequence[str], budget: int) -> Optional[pa.Table]:
    """Stream a pruned projection into one Arrow table, aborting (and
    returning None) the moment the running size crosses ``budget``."""
    avail = [c for c in cols if c in ds.schema().names]
    if not avail:
        return None
    got, size = [], 0
    for b in ds.select_columns(avail).iter_batches(
            batch_format="pyarrow", batch_size=None):
        size += b.nbytes
        if size > budget:
            return None
        got.append(b)
    if not got:
        base = ds.schema().base_schema
        return pa.table(
            {c: pa.array([], base.field(c).type) for c in avail})
    return pa.concat_tables(got, promote_options="permissive").combine_chunks()


def _topk_rows(scored: pa.Table, k: int) -> List[Dict[str, Any]]:
    """Local twin of ``.sort(["score", "entity_id"], descending=
    [True, False]).limit(k).take_all()``."""
    ids = scored["entity_id"].to_numpy(zero_copy_only=False)
    sc = scored["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return scored.take(pa.array(order)).to_pylist()


class LocalKG:
    """Pulled serving projection + local twins of the query steps."""

    def __init__(
        self,
        nodes: pa.Table,
        edge_pairs: Optional[pa.Table],
        mentions: Optional[pa.Table],
        docs: Optional[pa.Table],
        edge_payload: Optional[pa.Table],
    ):
        self.nodes = nodes
        # Pre-sort the payload tier ONCE by the rel ordering traverse()
        # must return — (src_id, rel_type, dst_id, term-with-null-as-"")
        # — so every request's filter comes back already ordered and the
        # per-query Python sort disappears (per-query work moved to
        # once-per-server setup, like the rest of this class).  A
        # positional tiebreaker makes the order exactly what a stable
        # sort of the unsorted table would produce.
        if edge_payload is not None and edge_payload.num_rows:
            term = (
                pc.fill_null(pc.cast(edge_payload["term"], pa.string()), "")
                if "term" in edge_payload.schema.names
                else pa.array([""] * edge_payload.num_rows, pa.string())
            )
            keys = pa.table({
                "src_id": edge_payload["src_id"],
                "rel_type": edge_payload["rel_type"],
                "dst_id": edge_payload["dst_id"],
                "term": term,
                "pos": pa.array(np.arange(edge_payload.num_rows,
                                          dtype=np.int64)),
            })
            idx = pc.sort_indices(keys, sort_keys=[
                ("src_id", "ascending"), ("rel_type", "ascending"),
                ("dst_id", "ascending"), ("term", "ascending"),
                ("pos", "ascending")])
            edge_payload = edge_payload.take(idx)
        self.edge_payload = edge_payload
        self._norm_df = pd.DataFrame(
            {"norm_key": nodes["norm_key"].to_pandas()})
        ids = nodes["entity_id"].to_pylist()
        labels = nodes["label"].to_pylist()
        names = nodes["name"].to_pylist()
        self._info = {
            int(i): {"label": l, "name": n}
            for i, l, n in zip(ids, labels, names)
        }
        self._row_of = {int(i): r for r, i in enumerate(ids)}
        if edge_pairs is not None and edge_pairs.num_rows:
            self._src = edge_pairs["src_id"].to_numpy(zero_copy_only=False)
            self._dst = edge_pairs["dst_id"].to_numpy(zero_copy_only=False)
        elif edge_pairs is not None:
            self._src = np.array([], dtype=np.int64)
            self._dst = np.array([], dtype=np.int64)
        else:
            self._src = self._dst = None
        if mentions is not None:
            self._men_eid = mentions["entity_id"].to_numpy(
                zero_copy_only=False)
            self._men_doc = mentions["doc_id"].to_numpy(zero_copy_only=False)
        else:
            self._men_eid = self._men_doc = None
        self._titles = (
            dict(zip(docs["doc_id"].to_pylist(), docs["title"].to_pylist()))
            if docs is not None else None
        )

    # -- construction -------------------------------------------------

    @classmethod
    def maybe_pull(
        cls, tables: Dict[str, Any], max_bytes: int = DEFAULT_LOCAL_BUDGET
    ) -> Optional["LocalKG"]:
        tiers = pull_tiers(tables, max_bytes)
        if tiers is None:
            return None
        return cls(tiers["nodes"], tiers["edge_pairs"], tiers["mentions"],
                   tiers["docs"], tiers["edge_payload"])

    # -- capability probes (which steps can run locally) --------------

    @property
    def has_edges(self) -> bool:
        return self._src is not None

    @property
    def has_mentions(self) -> bool:
        return self._men_eid is not None

    @property
    def has_titles(self) -> bool:
        return self.has_mentions and self._titles is not None

    # -- channels ------------------------------------------------------

    def vector_topk(self, qvec: np.ndarray, k: int) -> List[Dict[str, Any]]:
        return _topk_rows(_vector_score_table(self.nodes, _unit(qvec), k), k)

    def bm25_topk(self, question: str, k: int) -> List[Dict[str, Any]]:
        toks, phrases = _bm25_query(question)
        res = self._bm25(toks, phrases, k)
        if not res:
            # first-anchor-only retry, mirroring _bm25_with_retry
            anchors, _terms = _query_terms(question)
            if anchors:
                a_norm = normalize_name_for_key(anchors[0])
                a_toks = sorted(set(a_norm.split()))
                a_phr = [a_norm] if " " in a_norm else []
                res = self._bm25(a_toks, a_phr, k)
        return res

    def _bm25(self, toks: List[str], phrases: List[str],
              k: int) -> List[Dict[str, Any]]:
        stats = _bm25_fold_stats(
            [_bm25_stats_partial(self._norm_df, toks, phrases)],
            toks, phrases)
        tok_w, phr_w, avgdl = _bm25_weights(stats, toks, phrases)
        scored = _bm25_score_table(
            self.nodes, tok_w, phr_w, avgdl, max(k, 16))
        return _topk_rows(scored, k)

    # -- provenance ----------------------------------------------------

    def _first_doc_raw(self, entity_ids: Sequence[int]) -> Dict[int, str]:
        ids = np.array(sorted({int(i) for i in entity_ids}), dtype=np.int64)
        mask = np.isin(self._men_eid, ids)
        first: Dict[int, str] = {}
        for e, d in zip(self._men_eid[mask].tolist(), self._men_doc[mask]):
            if e not in first or d < first[e]:
                first[int(e)] = d
        return first

    def first_doc(self, entity_ids: Sequence[int]) -> Dict[int, Optional[str]]:
        if not entity_ids:
            return {}
        first = self._first_doc_raw(entity_ids)
        return {int(i): first.get(int(i)) for i in entity_ids}

    def doc_titles(self, entity_ids: Sequence[int]) -> Dict[int, Optional[str]]:
        if not entity_ids:
            return {}
        first = self._first_doc_raw(entity_ids)
        return {e: self._titles.get(d) for e, d in first.items()}

    # -- graph ---------------------------------------------------------

    def traverse(self, seed_ids: Sequence[int], max_hops: int,
                 edges_ds=None) -> Dict[str, Any]:
        """Local twin of :func:`graphrag.traverse_neighbors`: numpy BFS
        over the id pairs; payload from the local edge tier when pulled,
        else one distributed :func:`fetch_rel_payload` job."""
        hops = max(1, min(int(max_hops), 3))
        if not seed_ids:
            return {"node_ids": [], "rels": []}
        visited = set(int(i) for i in seed_ids)
        frontier = set(visited)
        processed: set = set()
        for _ in range(hops):
            if not frontier:
                break
            processed |= frontier
            f = np.fromiter(frontier, dtype=np.int64, count=len(frontier))
            mask = np.isin(self._src, f) | np.isin(self._dst, f)
            ends = set(self._src[mask].tolist()) | set(self._dst[mask].tolist())
            nxt = ends - visited
            visited |= nxt
            frontier = nxt
        if self.edge_payload is not None:
            parr = (np.fromiter(processed, dtype=np.int64,
                                count=len(processed))
                    if processed else np.array([], dtype=np.int64))
            pmask = np.isin(
                self.edge_payload["src_id"].to_numpy(zero_copy_only=False),
                parr,
            ) | np.isin(
                self.edge_payload["dst_id"].to_numpy(zero_copy_only=False),
                parr,
            )
            # payload was pre-sorted by (src, rel, dst, term) in
            # __init__ and filter preserves row order, so the result is
            # already in the contract order — no per-query sort
            rels = self.edge_payload.filter(pa.array(pmask)).to_pylist()
        else:
            rels = fetch_rel_payload(edges_ds, processed)
        return {"node_ids": sorted(visited), "rels": rels}

    # -- lookups -------------------------------------------------------

    def node_info(self, node_ids: Sequence[int]) -> Dict[int, Dict[str, str]]:
        return {
            int(i): self._info[int(i)]
            for i in node_ids if int(i) in self._info
        }

    def embeddings_for(self, entity_ids: Sequence[int]) -> Dict[int, np.ndarray]:
        emb = self.nodes["embedding"]
        out = {}
        for i in entity_ids:
            r = self._row_of.get(int(i))
            if r is not None:
                out[int(i)] = np.asarray(emb[r].as_py(), dtype=np.float32)
        return out


def pull_tiers(
    tables: Dict[str, Any], max_bytes: int = DEFAULT_LOCAL_BUDGET
) -> Optional[Dict[str, Optional[pa.Table]]]:
    """Pull the serving projection tier by tier under ``max_bytes``;
    ``None`` if even the required nodes tier overflows.  Individual
    optional tiers that overflow come back as ``None`` (their steps
    fall back to the distributed path)."""
    budget = max_bytes
    nodes = _pull_limited(
        tables["nodes"],
        ["entity_id", "label", "name", "norm_key", "embedding"], budget)
    if nodes is None:
        return None
    budget -= nodes.nbytes
    tiers: Dict[str, Optional[pa.Table]] = {"nodes": nodes}
    for name, src, cols in (
        ("edge_pairs", "edges", ["src_id", "dst_id"]),
        ("mentions", "mentions", ["doc_id", "entity_id"]),
        ("docs", "docs", ["doc_id", "title"]),
        ("edge_payload", "edges", list(REL_PAYLOAD_COLS)),
    ):
        t = (_pull_limited(tables[src], cols, budget)
             if src in tables else None)
        tiers[name] = t
        if t is not None:
            budget -= t.nbytes
    return tiers


# --- batch serving (actor pool) --------------------------------------------

class GraphRAGServer:
    """Actor-pool callable for BATCH retrieval: the serving projection
    is ``ray.put`` once on the driver and each actor reconstructs its
    :class:`LocalKG` from the shared object-store copies in
    ``__init__`` (once per actor — the "model load" of this stage);
    ``__call__`` then answers a batch of questions fully in-process.

    This is the throughput shape for offline retrieval jobs (evaluation
    sweeps, RAG-context pre-computation over a question log): millions
    of questions stream through ``map_batches`` while the graph sits in
    shared memory, instead of ~13 Ray jobs per question on the
    distributed path.  Requires EVERY tier within budget — callers
    should keep per-question ``graphrag`` as the oversized fallback.
    """

    def __init__(self, tier_refs: Dict[str, Any], top_k: int = 5,
                 hops: int = 2):
        import ray

        tabs = {k: (ray.get(r) if r is not None else None)
                for k, r in tier_refs.items()}
        self._loc = LocalKG(tabs["nodes"], tabs["edge_pairs"],
                            tabs["mentions"], tabs["docs"],
                            tabs["edge_payload"])
        if not (self._loc.has_edges and self._loc.has_titles
                and self._loc.edge_payload is not None):
            raise ValueError(
                "GraphRAGServer needs every serving tier in budget; "
                "use the per-question distributed path instead")
        self._top_k = top_k
        self._hops = hops
        # placeholder tables: with every tier local, graphrag() never
        # evaluates them (asserted above)
        self._tables = {k: None for k in
                        ("nodes", "edges", "mentions", "docs")}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag

        qids, n_nodes, n_rels, seeds_csv, first_fact = [], [], [], [], []
        for qid, q in zip(batch["question_id"].to_pylist(),
                          batch["question"].to_pylist()):
            res = graphrag(self._tables, q, top_k=self._top_k,
                           hops=self._hops, local_kg=self._loc)
            qids.append(qid)
            n_nodes.append(res["n_nodes"])
            n_rels.append(res["n_rels"])
            seeds_csv.append(",".join(str(int(s)) for s in res["seeds"]))
            lines = res["facts"].splitlines()
            first_fact.append(lines[1] if len(lines) > 1 else "")
        return pa.table({
            "question_id": pa.array(qids, pa.int64()),
            "n_nodes": pa.array(n_nodes, pa.int64()),
            "n_rels": pa.array(n_rels, pa.int64()),
            "seeds_csv": pa.array(seeds_csv, pa.string()),
            "first_fact": pa.array(first_fact, pa.string()),
        })


def graphrag_serve_batch(
    tables: Dict[str, Any],
    questions,
    top_k: int = 5,
    hops: int = 2,
    concurrency: int = 2,
    max_bytes: int = DEFAULT_LOCAL_BUDGET,
):
    """Answer a Dataset of ``(question_id, question)`` rows through a
    :class:`GraphRAGServer` actor pool.  Raises if the projection does
    not fit ``max_bytes`` (batch mode has no distributed fallback —
    fall back to per-question :func:`graphrag.graphrag`)."""
    import ray

    tiers = pull_tiers(tables, max_bytes)
    if tiers is None or any(
            tiers[k] is None
            for k in ("edge_pairs", "mentions", "docs", "edge_payload")):
        raise ValueError("serving projection exceeds max_bytes; "
                         "use per-question graphrag instead")
    refs = {k: ray.put(v) for k, v in tiers.items()}
    return questions.map_batches(
        GraphRAGServer,
        fn_constructor_kwargs={"tier_refs": refs, "top_k": top_k,
                               "hops": hops},
        concurrency=concurrency,
        batch_format="pyarrow",
    )
