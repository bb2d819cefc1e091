"""Iterative graph algorithms over the KG edge table.

The reference's graph analytics live inside Neo4j (counts/degrees via
Cypher, ``main.py:600-726``); an engine that OWNS the graph snapshot
needs the bulk analytics pass Neo4j would otherwise provide.  PageRank
here is the template for any fixed-round iterative algorithm on Ray
Data (same shape as ``extras/dedup.py:connected_components``): a
driver loop of bounded rounds, each round = one broadcast probe over
the edges + one edges→nodes exchange.

**Determinism contract**: all arithmetic is INTEGER (ranks carry a
fixed ``scale``; damping is an exact rational; divisions are floors).
Integer addition is associative, so the result is bit-identical
regardless of partitioning, batch order, or cluster shape — which is
what lets a DuckDB oracle with unrolled iterations hash-match a
distributed run.  Float PageRank cannot make that promise.

Semantics (documented, deliberately simple):
* edge set = DISTINCT directed ``(src, dst)`` pairs;
* ``r0 = scale`` for every node;
* per round: ``r'(v) = (scale*(den-num))//den
  + (num * Σ_{(u,v)} r(u)//outdeg(u)) // den`` with damping num/den
  (default 85/100); dangling nodes contribute nothing (their mass is
  dropped, the standard simplification).

Scale shape: node-sided tables (ranks, degrees, contributions) are
O(V) and ride :func:`broadcast_join`'s size gate — broadcast when they
fit, automatic hash-join fallback when they don't; the only E-sized
work per round is a streaming probe plus one hash aggregate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from functools import partial as _fn_partial

from neo4j_document_pipeline_ray.stages.grouped import (
    broadcast_join,
    partitioned_group_map,
)
from neo4j_document_pipeline_ray.stages.grouped import (
    hash_aggregate as _hash_aggregate,
)

# Every aggregate in this module exchanges node-, edge- or schema-sided
# PARTIALS (never raw corpus rows), and the module's iterative ops
# already pin tables of that size — so the adaptive small-exchange fast
# path (stages/grouped.py: one merge task instead of an all-to-all sort
# when the partials fit 64 MB) is on module-wide.  Measured: the Ray
# 2.49 sort-based exchange costs 2-7 s of fixed overhead per call at 32
# CPUs, which dominated every per-round aggregate here at sandbox scale.
hash_aggregate = _fn_partial(_hash_aggregate, adaptive=True)

PR_SCALE = 10**9  # keeps 85 * V * scale far inside int64 up to V ~ 1e8


def pagerank(
    edges: "ray.data.Dataset",
    iters: int = 3,
    scale: int = PR_SCALE,
    damping: tuple = (85, 100),
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> "ray.data.Dataset":
    """Integer PageRank over DISTINCT ``(src, dst)`` pairs of ``edges``.
    Returns ``(entity_id, rank_scaled)`` — ``rank_scaled/scale`` is the
    usual PageRank value."""
    num, den = damping
    base = (scale * (den - num)) // den

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
    ).drop_columns(["_m"])

    deg = hash_aggregate(e, src_col, [(None, "count", "outdeg")])

    def both_ends(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t[src_col].combine_chunks(), t[dst_col].combine_chunks(),
        ])
        return pa.table({"entity_id": ids})

    nodes = hash_aggregate(
        e.map_batches(both_ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "_m")],
    ).drop_columns(["_m"])

    def seed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_scaled",
            pa.array([scale] * t.num_rows, pa.int64()))

    # e/deg/nodes are probed EVERY round; materialize once so the loop
    # reuses blocks instead of re-running the distinct/degree aggregates
    e = e.materialize()
    deg = deg.materialize()
    nodes = nodes.materialize()

    ranks = nodes.map_batches(seed, batch_format="pyarrow")

    for _ in range(iters):
        # per-node contribution: rank // outdeg  (node-sided, O(V))
        with_deg = broadcast_join(deg, ranks, on=(src_col,),
                                  right_on=("entity_id",))

        def contrib(t: pa.Table) -> pa.Table:
            return pa.table({
                src_col: t[src_col],
                "c": pc.divide(t["rank_scaled"], t["outdeg"]),
            })

        c = with_deg.map_batches(contrib, batch_format="pyarrow")
        # flow along edges (E-sized streaming probe) + one exchange
        flows = broadcast_join(e, c, on=(src_col,))
        sums = hash_aggregate(
            flows.select_columns([dst_col, "c"]),
            dst_col, [("c", "sum", "s_in")],
        )
        joined = broadcast_join(nodes, sums, on=("entity_id",),
                                right_on=(dst_col,), join_type="left_outer")

        def update(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t["s_in"], 0)
            r = pc.add(base, pc.divide(pc.multiply(num, s), den))
            return pa.table({
                "entity_id": t["entity_id"],
                "rank_scaled": pc.cast(r, pa.int64()),
            })

        ranks = joined.map_batches(update, batch_format="pyarrow")

    return ranks


def pagerank_reference(edge_pairs, iters: int = 3, scale: int = PR_SCALE,
                       damping: tuple = (85, 100)) -> dict:
    """Pure-Python replay of the exact integer semantics (test oracle)."""
    num, den = damping
    base = (scale * (den - num)) // den
    e = sorted(set(edge_pairs))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg: dict = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: scale for v in nodes}
    for _ in range(iters):
        s_in = {v: 0 for v in nodes}
        for u, v in e:
            s_in[v] += r[u] // outdeg[u]
        r = {v: base + (num * s_in[v]) // den for v in nodes}
    return r


def degree_topk(
    edges: "ray.data.Dataset", k: int = 20,
    src_col: str = "src_id", dst_col: str = "dst_id",
) -> "ray.data.Dataset":
    """Top-k nodes by total degree over DISTINCT ``(src, dst)`` pairs,
    with the out/in split — the hub report of a KG audit.  ONE exchange:
    each distinct edge emits two tagged endpoint rows and a single hash
    aggregate produces out (sum of tags), total (count) and in
    (difference); ties break on entity_id."""
    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
    ).drop_columns(["_m"])

    def ends(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "entity_id": pa.concat_arrays([
                t[src_col].combine_chunks(), t[dst_col].combine_chunks(),
            ]),
            "is_out": pa.concat_arrays([
                pa.array([1] * n, pa.int64()), pa.array([0] * n, pa.int64()),
            ]),
        })

    agg = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "entity_id",
        [("is_out", "sum", "out_deg"), (None, "count", "degree")],
    )

    def split(t: pa.Table) -> pa.Table:
        return pa.table({
            "entity_id": t["entity_id"],
            "out_deg": t["out_deg"],
            "in_deg": pc.subtract(t["degree"], t["out_deg"]),
            "degree": t["degree"],
        })

    return (agg.map_batches(split, batch_format="pyarrow")
            .sort(["degree", "entity_id"], descending=[True, False])
            .limit(k))


# --- triangle counting -----------------------------------------------------

def _triangle_hits(
    edges: "ray.data.Dataset",
    src_col: str,
    dst_col: str,
    num_partitions: "int | None",
) -> "ray.data.Dataset":
    """One row per triangle ``(apex, a, b)`` (a < b), found exactly
    once at its minimum-(degree, id) apex — the degree-ordered
    node-iterator core shared by per-node triangle counts and
    per-edge truss support."""

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["lo"].combine_chunks(), t["hi"].combine_chunks(),
        ])})

    deg = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "node", [(None, "count", "deg")],
        num_partitions=num_partitions,
    )

    # e and deg are each probed twice below; materialize once so the
    # second consumer reuses blocks instead of re-running the aggregate
    e = e.materialize()
    deg = deg.materialize()

    with_dl = broadcast_join(e, deg, on=("lo",), right_on=("node",))
    with_dl = with_dl.map_batches(
        lambda t: t.rename_columns(
            [{"deg": "deg_lo"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    both = broadcast_join(with_dl, deg, on=("hi",), right_on=("node",))

    def orient(t: pa.Table) -> pa.Table:
        lo, hi = t["lo"], t["hi"]
        dl, dh = t["deg_lo"], t["deg"]
        # lower (degree, id) endpoint becomes the wedge apex candidate
        lo_first = pc.or_(
            pc.less(dl, dh),
            pc.and_(pc.equal(dl, dh), pc.less(lo, hi)),
        )
        return pa.table({
            "u": pc.if_else(lo_first, lo, hi),
            "w": pc.if_else(lo_first, hi, lo),
        })

    oriented = both.map_batches(orient, batch_format="pyarrow")

    import numpy as np
    import pandas as pd

    def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["u", "w"], kind="mergesort")
        u = df["u"].to_numpy()
        w = df["w"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends_ = np.r_[starts[1:], len(u)]
        ax, wx, wy = [], [], []
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            nb = w[s:t_]
            ax.append(np.full(len(i), u[s], dtype=np.int64))
            wx.append(nb[i])
            wy.append(nb[j])
        if not ax:
            return pd.DataFrame({
                "apex": pd.Series([], dtype="int64"),
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
            })
        x = np.concatenate(wx)
        y = np.concatenate(wy)
        return pd.DataFrame({
            "apex": np.concatenate(ax),
            # canonical (lo, hi) pair key so the wedge matches the
            # undirected edge row it needs for closure
            "a": np.minimum(x, y),
            "b": np.maximum(x, y),
        })

    wedge_ds = partitioned_group_map(
        oriented, "u", wedges, num_partitions=num_partitions)

    # closure: a wedge whose (lo, hi) endpoints are themselves an edge
    # is a triangle, found exactly once (at its minimum-(degree, id)
    # apex).  The distinct edge set rides broadcast_join's size gate:
    # broadcast inner-join per wedge batch when it fits (wedges never
    # shuffle), automatic hash-join fallback beyond the gate.
    hits = broadcast_join(wedge_ds, e, on=("a", "b"),
                          right_on=("lo", "hi"))
    return hits


def triangle_counts(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-node triangle participation counts over the UNDIRECTED
    distinct edge set (self-loops dropped) — the standard KG-audit
    cohesion metric Neo4j GDS would provide in the reference stack.

    Distributed shape (node-iterator with degree ordering, the
    MapReduce scheme of Suri & Vassilvitskii, WWW'11):

    1. canonicalize + distinct the edge set (one hash exchange);
    2. orient every edge from its lower-(degree, id) endpoint to the
       higher one — each node's ORIENTED out-degree is then O(sqrt(E))
       regardless of how hot the original hub was, which bounds wedge
       generation (the classic "curse of the last reducer" fix);
    3. wedges: group oriented edges by source, emit every neighbor
       pair once (numpy triu per node, Python only at node
       granularity inside a partition);
    4. closure: tag wedges and edges, union, hash-partition by the
       (lo, hi) pair key, and intersect per partition — a wedge whose
       endpoints are themselves an edge is a triangle, found exactly
       once (at its minimum-(degree, id) apex);
    5. one final hash aggregate: each triangle credits its 3 corners.

    Degree tables are node-sided O(V) and ride ``broadcast_join``'s
    size gate; wedge volume is O(E^1.5) worst-case and streams through
    the exchange without ever materializing per node.

    Returns ``(entity_id, n_triangles)`` for nodes in >=1 triangle.
    """
    hits = _triangle_hits(edges, src_col, dst_col, num_partitions)

    def corners(t: pa.Table) -> pa.Table:
        # each matched wedge IS a triangle (apex, a, b); credit 3 corners
        return pa.table({"node": pa.concat_arrays([
            t["apex"].combine_chunks(), t["a"].combine_chunks(),
            t["b"].combine_chunks(),
        ])})

    corners_ds = hits.map_batches(corners, batch_format="pyarrow")

    out = hash_aggregate(
        corners_ds, "node", [(None, "count", "n_triangles")],
        num_partitions=num_partitions,
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [{"node": "entity_id"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")


def triangle_counts_reference(edge_pairs) -> dict:
    """Pure-Python replay (test oracle): per-node triangle counts."""
    und = {tuple(sorted(p)) for p in edge_pairs if p[0] != p[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if a < b < c:
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


# --- entity co-occurrence --------------------------------------------------

COOC_SCALE = 10**6


def cooccurrence_topk(
    mentions: "ray.data.Dataset",
    k: int = 50,
    min_count: int = 2,
    scale: int = COOC_SCALE,
    num_partitions: "int | None" = None,
    max_doc_entities: "int | None" = None,
) -> "ray.data.Dataset":
    """Top-k entity pairs by co-occurrence lift over the mentions table
    (``doc_id, entity_id``, distinct) — the relatedness signal a KG
    curation pass uses to propose missing edges / flag conflations.

    ``lift = P(a,b) / (P(a) P(b))`` with doc-level probabilities; kept
    INTEGER (``lift_scaled = (c_ab * n_docs * scale) // (c_a * c_b)``)
    so the distributed result hash-matches a DuckDB replay — float
    log-PMI cannot promise that.  ``n_docs * c_ab * scale`` must fit
    int64: fine to ~10^9 docs at the default scale; beyond that drop
    ``scale`` or switch the final projection to float PMI.

    Shape: pair generation is per-doc (numpy triu inside a hash
    partition — a doc's entity set is small and already distinct);
    pair counts and entity counts are two-phase hash aggregates;
    entity counts are node-sided O(V) and ride ``broadcast_join``'s
    size gate; top-k is a per-batch partial with the global-sort
    tie-break (lift desc, entity_a, entity_b).
    """
    import numpy as np
    import pandas as pd

    ments = mentions.select_columns(["doc_id", "entity_id"])

    # n_docs: count of distinct docs (one tiny aggregate; the scalar
    # is closed over, not re-shipped per batch)
    n_docs = hash_aggregate(
        ments.select_columns(["doc_id"]), "doc_id", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).count()

    ecnt = hash_aggregate(
        ments, "entity_id", [(None, "count", "cnt")],
        num_partitions=num_partitions,
    )

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["doc_id", "entity_id"], kind="mergesort")
        d = df["doc_id"].to_numpy()
        e = df["entity_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        ends_ = np.r_[starts[1:], len(d)]
        xs, ys = [], []
        truncated = 0
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if n < 2:
                continue
            # pair volume is O(n^2) per doc; the opt-in cap keeps a
            # pathological hub document (an index page mentioning the
            # whole vocabulary) from exploding the exchange.  EXACT by
            # default - capping changes the counted pair set, so it is
            # never silent (same contract as ngram_jaccard_pairs).
            if max_doc_entities is not None and n > max_doc_entities:
                truncated += n - max_doc_entities
                t_ = s + max_doc_entities
                n = max_doc_entities
            i, j = np.triu_indices(n, k=1)
            ent = e[s:t_]  # sorted, so pairs come out (lo, hi)
            xs.append(ent[i])
            ys.append(ent[j])
        if truncated:
            import logging

            logging.getLogger(__name__).warning(
                "cooccurrence_topk: dropped %d entity mentions beyond "
                "max_doc_entities=%d (first-by-entity_id kept); pair "
                "counts are now approximate", truncated, max_doc_entities)
        if not xs:
            return pd.DataFrame({
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "entity_a": np.concatenate(xs),
            "entity_b": np.concatenate(ys),
        })

    pair_ds = partitioned_group_map(
        ments, "doc_id", pairs, num_partitions=num_partitions)

    pcnt = hash_aggregate(
        pair_ds, ["entity_a", "entity_b"], [(None, "count", "n_docs_both")],
        num_partitions=num_partitions,
    )

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_docs_both"], min_count))

    pcnt = pcnt.map_batches(flt, batch_format="pyarrow")

    # ecnt is probed for both pair endpoints; materialize once
    ecnt = ecnt.materialize()

    with_a = broadcast_join(pcnt, ecnt, on=("entity_a",),
                            right_on=("entity_id",))
    with_a = with_a.map_batches(
        lambda t: t.rename_columns(
            [{"cnt": "cnt_a"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    both = broadcast_join(with_a, ecnt, on=("entity_b",),
                          right_on=("entity_id",))

    def score(t: pa.Table) -> pa.Table:
        import numpy as np

        cab = t["n_docs_both"].to_numpy()
        if len(cab) and int(cab.max()) * n_docs * scale > (1 << 63) - 1:
            raise OverflowError(
                "cooccurrence lift would overflow int64 at n_docs="
                f"{n_docs}, scale={scale}; lower scale or switch the "
                "projection to float log-PMI")
        ca = t["cnt_a"].to_numpy()
        cb = t["cnt"].to_numpy()
        lift = (cab.astype(np.int64) * n_docs * scale) // (ca * cb)
        out = pa.table({
            "entity_a": t["entity_a"],
            "entity_b": t["entity_b"],
            "n_docs_both": t["n_docs_both"],
            "lift_scaled": pa.array(lift, pa.int64()),
        })
        if out.num_rows > k:
            # partial top-k with the SAME tie-break as the global sort
            order = np.lexsort((
                out["entity_b"].to_numpy(), out["entity_a"].to_numpy(),
                -out["lift_scaled"].to_numpy(),
            ))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    scored = both.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["lift_scaled", "entity_a", "entity_b"],
        descending=[True, False, False],
    ).limit(k)


def cooccurrence_reference(mention_pairs, n_docs: int = None,
                           min_count: int = 2,
                           scale: int = COOC_SCALE) -> dict:
    """Pure-Python replay of the exact integer lift (test oracle).
    Returns {(a, b): (c_ab, lift_scaled)} for pairs with c_ab >= min_count."""
    ments = sorted(set(mention_pairs))
    docs = sorted({d for d, _ in ments})
    nd = n_docs if n_docs is not None else len(docs)
    cnt: dict = {}
    for _, e in ments:
        cnt[e] = cnt.get(e, 0) + 1
    by_doc: dict = {}
    for d, e in ments:
        by_doc.setdefault(d, []).append(e)
    cab: dict = {}
    for d, es in by_doc.items():
        es = sorted(es)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                cab[(es[i], es[j])] = cab.get((es[i], es[j]), 0) + 1
    return {
        p: (c, (c * nd * scale) // (cnt[p[0]] * cnt[p[1]]))
        for p, c in cab.items() if c >= min_count
    }


# --- link prediction (common neighbors) -------------------------------------

def kcore(
    edges: "ray.data.Dataset",
    k: int = 3,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 64,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """``(entity_id, deg)`` for every node of the graph's k-core — the
    maximal subgraph where every node keeps degree >= ``k`` (Neo4j GDS
    ``kcore`` analog; the reference delegates all graph analytics to
    Neo4j, ``main.py:600-726``).  ``deg`` is the node's degree INSIDE
    the core.  Graph semantics match the other analytics here:
    undirected, distinct pairs, self-loops dropped.

    Iterative peeling as a bounded driver loop (the
    :func:`pagerank` / ``connected_components`` template): each round
    is ONE E-sized hash aggregate (degrees of the surviving subgraph)
    plus a membership filter of the edge list against the surviving
    node set — node-sided (O(V)) and riding :func:`broadcast_join`'s
    size gate, so it broadcasts when it fits and falls back to a hash
    semi-join when it doesn't.  The edge list only ever shrinks.  Exit
    is the count fixpoint: surviving sets only shrink, so equal counts
    of consecutive rounds imply equal sets.  Every non-final round
    removes at least one node, so ``max_rounds`` caps pathological
    peel chains (a long path peels one layer per round); hitting the
    cap logs a warning and returns the (conservative, superset)
    current round.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    cur = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    empty = pa.table({"entity_id": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    prev_n = None
    alive = None
    for round_no in range(max_rounds):
        deg = hash_aggregate(
            cur, "node", [(None, "count", "deg")],
            num_partitions=num_partitions,
        )
        alive = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["deg"], k)),
            batch_format="pyarrow",
        ).materialize()
        n = alive.count()
        if n == 0:
            return ray.data.from_arrow(empty)
        if n == prev_n:
            # fixpoint: alive's degrees were computed within the
            # previous (== this) surviving set — they ARE core degrees
            break
        prev_n = n
        members = alive.select_columns(["node"])
        # semi-join both endpoints against the surviving set (right
        # side is key-only and unique, so inner join == semi-join)
        cur = broadcast_join(cur, members, on=("node",),
                             num_partitions=num_partitions)
        cur = broadcast_join(cur, members.map_batches(
            lambda t: t.rename_columns(["peer"]), batch_format="pyarrow"),
            on=("peer",), num_partitions=num_partitions).materialize()
    else:
        import logging

        logging.getLogger(__name__).warning(
            "kcore: max_rounds=%d hit before fixpoint; returning the "
            "current (superset) round", max_rounds)

    return alive.map_batches(
        lambda t: pa.table({"entity_id": t["node"], "deg": t["deg"]}),
        batch_format="pyarrow",
    )


def kcore_reference(edge_pairs, k: int = 3) -> dict:
    """Pure-Python peeling replay (test oracle): dict node -> core deg."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        doomed = {v for v in alive if len(adj[v] & alive) < k}
        if not doomed:
            break
        alive -= doomed
    return {v: len(adj[v] & alive) for v in alive}


def personalized_pagerank(
    edges: "ray.data.Dataset",
    iters: int = 3,
    scale: int = PR_SCALE,
    damping: tuple = (85, 100),
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> "ray.data.Dataset":
    """Integer PERSONALIZED PageRank: all restart mass concentrates on
    one seed node — the relevance-to-a-query-entity ranking a GraphRAG
    retrieval layer uses to order an expansion frontier (the reference
    delegates this class to Neo4j GDS).  Seed = the highest-total-degree
    node of the distinct directed pair set (ties: min entity_id) —
    deterministic, so the DuckDB mirror picks the identical node.

    Same determinism contract and scale shape as :func:`pagerank`; the
    only change is the restart term: ``r0 = scale`` at the seed and 0
    elsewhere, and the per-round base is added at the seed only.
    Returns ``(entity_id, rank_scaled)`` for every node (zeros kept —
    the row set must not depend on float-free reachability accidents).
    """
    num, den = damping
    base = (scale * (den - num)) // den

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
    ).drop_columns(["_m"])

    deg = hash_aggregate(e, src_col, [(None, "count", "outdeg")])

    def both_ends(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t[src_col].combine_chunks(), t[dst_col].combine_chunks(),
        ])
        return pa.table({"entity_id": ids})

    e = e.materialize()
    deg = deg.materialize()

    # total degree (out+in over the distinct pair set) per node; the
    # argmax IS the seed — a tiny node-sided aggregate, driver takes one row
    tot = hash_aggregate(
        e.map_batches(both_ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "deg")],
    ).materialize()
    top = tot.sort(["deg", "entity_id"], descending=[True, False]).take(1)
    seed = int(top[0]["entity_id"])

    nodes = tot.drop_columns(["deg"]).materialize()

    def seed_rank(t: pa.Table) -> pa.Table:
        is_seed = pc.equal(t["entity_id"], seed)
        return t.append_column(
            "rank_scaled",
            pc.cast(pc.if_else(is_seed, scale, 0), pa.int64()))

    ranks = nodes.map_batches(seed_rank, batch_format="pyarrow")

    for _ in range(iters):
        with_deg = broadcast_join(deg, ranks, on=(src_col,),
                                  right_on=("entity_id",))

        def contrib(t: pa.Table) -> pa.Table:
            return pa.table({
                src_col: t[src_col],
                "c": pc.divide(t["rank_scaled"], t["outdeg"]),
            })

        c = with_deg.map_batches(contrib, batch_format="pyarrow")
        flows = broadcast_join(e, c, on=(src_col,))
        sums = hash_aggregate(
            flows.select_columns([dst_col, "c"]),
            dst_col, [("c", "sum", "s_in")],
        )
        joined = broadcast_join(nodes, sums, on=("entity_id",),
                                right_on=(dst_col,), join_type="left_outer")

        def update(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t["s_in"], 0)
            restart = pc.cast(
                pc.if_else(pc.equal(t["entity_id"], seed), base, 0),
                pa.int64())
            r = pc.add(restart, pc.divide(pc.multiply(num, s), den))
            return pa.table({
                "entity_id": t["entity_id"],
                "rank_scaled": pc.cast(r, pa.int64()),
            })

        ranks = joined.map_batches(update, batch_format="pyarrow")

    return ranks


def personalized_pagerank_reference(edge_pairs, iters: int = 3,
                                    scale: int = PR_SCALE,
                                    damping: tuple = (85, 100)) -> dict:
    """Pure-Python replay of the exact integer semantics (test oracle)."""
    num, den = damping
    base = (scale * (den - num)) // den
    e = sorted(set(edge_pairs))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    deg_tot: dict = {}
    for u, v in e:
        deg_tot[u] = deg_tot.get(u, 0) + 1
        deg_tot[v] = deg_tot.get(v, 0) + 1
    seed = max(nodes, key=lambda n: (deg_tot[n], -n))
    outdeg: dict = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: (scale if v == seed else 0) for v in nodes}
    for _ in range(iters):
        s_in = {v: 0 for v in nodes}
        for u, v in e:
            s_in[v] += r[u] // outdeg[u]
        r = {v: (base if v == seed else 0) + (num * s_in[v]) // den
             for v in nodes}
    return r


# --- label-propagation communities -------------------------------------------

def label_prop_communities(
    edges: "ray.data.Dataset",
    rounds: int = 4,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Community detection by SYNCHRONOUS label propagation over the
    undirected distinct graph (self-loops dropped) — the Neo4j GDS
    ``labelPropagation`` analog, a FIXED number of rounds so the
    result is a pure function of the edge set (async LPA's order
    dependence cannot hash-match an oracle).

    Per round every node adopts the minimum label among its most
    frequent neighbor labels (count ties break to the smaller label —
    fully deterministic).  Initial label = the node's own id.

    Scale shape per round: one E-sized streaming probe of the label
    table along the adjacency (node-sided O(V) right sides ride
    ``broadcast_join``'s size gate), one (node, label)-keyed two-phase
    hash aggregate, one node-keyed max, and one node-keyed min — no
    driver-side data paths, bit-identical under repartitioning.
    Returns ``(entity_id, community)``.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    labels = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "_m")],
    ).drop_columns(["_m"]).map_batches(
        lambda t: t.append_column("lab", t["node"]),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        # each (node, peer) row fetches peer's current label: E-sized
        # streaming probe against the node-sided label table
        j = broadcast_join(
            bo, labels.map_batches(
                lambda t: pa.table({"peer": t["node"], "lab": t["lab"]}),
                batch_format="pyarrow"),
            on=("peer",), num_partitions=num_partitions)
        counts = hash_aggregate(
            j.select_columns(["node", "lab"]),
            ["node", "lab"], [(None, "count", "n")],
            num_partitions=num_partitions,
        ).materialize()
        mx = hash_aggregate(
            counts, "node", [("n", "max", "mx")],
            num_partitions=num_partitions,
        )
        jm = broadcast_join(counts, mx, on=("node",),
                            num_partitions=num_partitions)
        best = jm.map_batches(
            lambda t: t.filter(pc.equal(t["n"], t["mx"])),
            batch_format="pyarrow")
        labels = hash_aggregate(
            best.select_columns(["node", "lab"]),
            "node", [("lab", "min", "lab")],
            num_partitions=num_partitions,
        ).materialize()

    return labels.map_batches(
        lambda t: pa.table({"entity_id": t["node"], "community": t["lab"]}),
        batch_format="pyarrow",
    )


def label_prop_reference(edge_pairs, rounds: int = 4) -> dict:
    """Pure-Python replay of synchronous min-of-modal LPA (test oracle)."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            cnt: dict = {}
            for u in nbrs:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        lab = new
    return lab


# --- BFS shortest-path distances ---------------------------------------------

def bfs_distances(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 32,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Single-source shortest-path (hop) distances over the undirected
    distinct graph, from the highest-degree node (ties: min
    entity_id) — the k-hop expansion generalized to per-node distances
    (the reference's APOC BFS, ``graphutil.py:547-632``, returns the
    neighborhood; this returns HOW FAR, the input a retrieval layer
    needs to decay relevance by distance).

    Frontier BFS as a bounded driver loop: each round expands the
    frontier along the adjacency (E-sized streaming probe of a
    node-sided frontier), dedups candidates with one hash aggregate,
    and anti-joins the visited set (node-sided, size-gated broadcast).
    The frontier only ever shrinks once the ball saturates; exit on
    empty frontier.  Returns ``(entity_id, dist)`` for REACHABLE nodes.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    deg = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "deg")],
        num_partitions=num_partitions,
    ).materialize()
    top = deg.sort(["deg", "node"], descending=[True, False]).take(1)
    seed = int(top[0]["node"])

    import numpy as np

    dist = ray.data.from_arrow(pa.table({
        "entity_id": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    frontier = dist

    for d in range(1, max_rounds + 1):
        hop = broadcast_join(
            bo, frontier.select_columns(["entity_id"]),
            on=("node",), right_on=("entity_id",),
            num_partitions=num_partitions)
        cand = hash_aggregate(
            hop.select_columns(["peer"]), "peer", [(None, "count", "_m")],
            num_partitions=num_partitions,
        ).drop_columns(["_m"])
        seen = dist.select_columns(["entity_id"]).map_batches(
            lambda t: t.append_column(
                "_seen", pa.array(np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")
        nxt = broadcast_join(cand, seen, on=("peer",),
                             right_on=("entity_id",),
                             join_type="left_outer",
                             num_partitions=num_partitions)
        new = nxt.map_batches(
            lambda t, _d=d: pa.table({
                "entity_id": t.filter(pc.is_null(t["_seen"]))["peer"],
                "dist": pa.array(
                    [_d] * t.filter(pc.is_null(t["_seen"])).num_rows,
                    pa.int64()),
            }),
            batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new

    return dist


def bfs_distances_reference(edge_pairs) -> dict:
    """Pure-Python BFS replay (test oracle): node -> hop distance."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return {}
    seed = max(adj, key=lambda n: (len(adj[n]), -n))
    dist = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


# --- HITS hubs/authorities ------------------------------------------------------

HITS_SCALE = 10**6


def hits(
    edges: "ray.data.Dataset",
    iters: int = 3,
    scale: int = HITS_SCALE,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Integer HITS (Kleinberg 1999) over DISTINCT directed pairs —
    the mutual-recursion centrality PageRank can't express: a HUB
    points at good authorities, an AUTHORITY is pointed at by good
    hubs (in a KG: hub = survey/index entity, authority = the entity
    facts converge on — both are curation signals PageRank conflates
    into one score).

    Determinism contract (module docstring): all-integer.  Standard
    HITS L2-normalizes each half-step; here each half-step floor-
    divides by ``ceil(max_raw / scale)`` — an exact rational
    max-normalization that keeps every score in ``[0, scale]`` and
    int64-safe at any graph size (raw sums ≤ V*scale ≤ 1e14 at
    V = 1e8), at the documented cost that scores are comparable
    WITHIN a side, not a probability mass.

    Per round: two E-sized streaming probes of node-sided score
    tables (broadcast size gate) + two node-keyed sum aggregates +
    two single-row max aggregates.  Returns
    ``(entity_id, hub_scaled, auth_scaled)`` after ``iters`` rounds.
    """
    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([
            t[src_col].combine_chunks(), t[dst_col].combine_chunks(),
        ])
        return pa.table({"entity_id": ids})

    nodes = hash_aggregate(
        e.map_batches(both_ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def _max_of(ds: "ray.data.Dataset", col: str) -> int:
        def p(t: pa.Table) -> pa.Table:
            m = pc.max(t[col]).as_py()
            return pa.table({
                "_k": pa.array([1], pa.int64()),
                "m": pa.array([0 if m is None else m], pa.int64()),
            })

        r = hash_aggregate(
            ds.map_batches(p, batch_format="pyarrow"),
            "_k", [("m", "max", "m")], num_partitions=1,
        ).take_all()
        return int(r[0]["m"]) if r else 0

    def _half_step(scores: "ray.data.Dataset", probe_col: str,
                   out_col: str, alias: str) -> "ray.data.Dataset":
        # raw(u) = sum of the counterpart score over edges keyed on
        # probe_col, re-keyed to out_col; then floor-div renormalize
        flows = broadcast_join(e, scores, on=(probe_col,),
                               right_on=("entity_id",),
                               num_partitions=num_partitions)
        raw = hash_aggregate(
            flows.select_columns([out_col, "s"]),
            out_col, [("s", "sum", "raw")],
            num_partitions=num_partitions)
        mx = _max_of(raw, "raw")
        d = max(1, (mx + scale - 1) // scale)
        joined = broadcast_join(nodes, raw, on=("entity_id",),
                                right_on=(out_col,),
                                join_type="left_outer",
                                num_partitions=num_partitions)

        def norm(t: pa.Table) -> pa.Table:
            r = pc.fill_null(t["raw"], 0)
            return pa.table({
                "entity_id": t["entity_id"],
                alias: pc.cast(pc.divide(r, d), pa.int64()),
            })

        return joined.map_batches(norm, batch_format="pyarrow")

    def seeded(alias: str) -> "ray.data.Dataset":
        return nodes.map_batches(
            lambda t, _a=alias: t.append_column(
                _a, pa.array([scale] * t.num_rows, pa.int64())),
            batch_format="pyarrow")

    auth = seeded("s")
    hub = None
    for _ in range(iters):
        # hubs sum authority over OUT-edges; authorities then sum the
        # fresh hub scores over IN-edges (the classic ordering)
        hub = _half_step(auth, dst_col, src_col, "s").materialize()
        auth = _half_step(hub, src_col, dst_col, "s").materialize()

    hub = hub.map_batches(
        lambda t: t.rename_columns(
            [{"s": "hub_scaled"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    out = broadcast_join(hub, auth, on=("entity_id",),
                         num_partitions=num_partitions)
    return out.map_batches(
        lambda t: t.rename_columns(
            [{"s": "auth_scaled"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")


def hits_reference(edge_pairs, iters: int = 3,
                   scale: int = HITS_SCALE) -> dict:
    """Pure-Python integer replay (test oracle):
    node -> (hub_scaled, auth_scaled)."""
    e = sorted(set(edge_pairs))
    nodes = sorted({x for p in e for x in p})
    auth = {n: scale for n in nodes}
    hub = {n: 0 for n in nodes}

    def half(scores, key_idx):
        raw = {n: 0 for n in nodes}
        for s, d_ in e:
            if key_idx == 0:
                raw[s] += scores[d_]
            else:
                raw[d_] += scores[s]
        mx = max(raw.values()) if raw else 0
        dv = max(1, (mx + scale - 1) // scale)
        return {n: v // dv for n, v in raw.items()}

    for _ in range(iters):
        hub = half(auth, 0)
        auth = half(hub, 1)
    return {n: (hub[n], auth[n]) for n in nodes}


# --- related documents (bipartite projection onto docs) ------------------------

RELDOC_SCALE = 10**6


def related_docs_topk(
    mentions: "ray.data.Dataset",
    k: int = 50,
    min_shared: int = 2,
    max_entity_docs: int = 50,
    scale: int = RELDOC_SCALE,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Top-k RELATED DOCUMENT pairs by shared entities — the doc-side
    projection of the doc×entity bipartite mentions graph (the
    transpose of :func:`cooccurrence_topk`): the "related pages /
    recommended reading" signal a retrieval layer serves next to each
    document (the reference's retrieval layer ranks docs per QUERY,
    ``graphutil.py``; doc-to-doc relatedness has no counterpart there).

    Semantics: entities mentioned in more than ``max_entity_docs``
    documents are EXCLUDED from the projection and from the per-doc
    set sizes — a ubiquitous entity carries no relatedness signal
    (the stopword-entity blocking rule standard in entity-resolution
    pipelines), and the exclusion is what bounds per-entity pair
    fan-out at scale (a df cap is the semantics here, not a silent
    truncation).  Score = integer Jaccard over the kept entity sets:
    ``jaccard_scaled = (scale * |A∩B|) // (|A| + |B| - |A∩B|)``.

    Shape: pair generation is per-entity (numpy triu inside a hash
    partition, fan-out ≤ C(max_entity_docs, 2)); shared counts are a
    two-phase hash aggregate; per-doc sizes are doc-sided and ride
    ``broadcast_join``'s size gate; top-k is a per-batch partial with
    the global-sort tie-break (jaccard desc, doc_a, doc_b).

    Returns ``(doc_a, doc_b, shared_entities, jaccard_scaled)``.
    """
    import numpy as np
    import pandas as pd

    m = hash_aggregate(
        mentions.select_columns(["doc_id", "entity_id"]),
        ["doc_id", "entity_id"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    edf = hash_aggregate(
        m.select_columns(["entity_id"]), "entity_id",
        [(None, "count", "df")], num_partitions=num_partitions)
    kept = edf.map_batches(
        lambda t: t.filter(
            pc.less_equal(t["df"], max_entity_docs)).drop_columns(["df"]),
        batch_format="pyarrow")

    # entity-sided filter table; broadcast when it fits.  mk is
    # MENTION-SIZED, so it is deliberately NOT materialized: the two
    # consumers below re-run the filter as two streaming passes —
    # cheaper than pinning a corpus-scale table in the object store
    mk = broadcast_join(m, kept, on=("entity_id",),
                        num_partitions=num_partitions)

    dsz = hash_aggregate(
        mk.select_columns(["doc_id"]), "doc_id", [(None, "count", "sz")],
        num_partitions=num_partitions,
    ).materialize()

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["entity_id", "doc_id"], kind="mergesort")
        e = df["entity_id"].to_numpy()
        d = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, e[1:] != e[:-1]])
        ends_ = np.r_[starts[1:], len(e)]
        xs, ys = [], []
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            docs = d[s:t_]  # sorted, so pairs come out (lo, hi)
            xs.append(docs[i])
            ys.append(docs[j])
        if not xs:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="object"),
                "doc_b": pd.Series([], dtype="object"),
            })
        return pd.DataFrame({
            "doc_a": np.concatenate(xs),
            "doc_b": np.concatenate(ys),
        })

    pair_ds = partitioned_group_map(
        mk, "entity_id", pairs, num_partitions=num_partitions)

    shared = hash_aggregate(
        pair_ds, ["doc_a", "doc_b"], [(None, "count", "shared_entities")],
        num_partitions=num_partitions)
    shared = shared.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["shared_entities"], min_shared)),
        batch_format="pyarrow")

    with_a = broadcast_join(shared, dsz, on=("doc_a",),
                            right_on=("doc_id",))
    with_a = with_a.map_batches(
        lambda t: t.rename_columns(
            [{"sz": "sz_a"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    both = broadcast_join(with_a, dsz, on=("doc_b",),
                          right_on=("doc_id",))

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        sh = df["shared_entities"].to_numpy()
        den = df["sz_a"].to_numpy() + df["sz"].to_numpy() - sh
        out = pd.DataFrame({
            "doc_a": df["doc_a"],
            "doc_b": df["doc_b"],
            "shared_entities": sh,
            "jaccard_scaled": (scale * sh.astype(np.int64)) // den,
        })
        if len(out) > k:
            # partial top-k with the SAME tie-break as the global sort
            out = out.sort_values(
                ["jaccard_scaled", "doc_a", "doc_b"],
                ascending=[False, True, True], kind="mergesort").head(k)
        return out

    scored = both.map_batches(score, batch_format="pandas")
    return scored.sort(
        ["jaccard_scaled", "doc_a", "doc_b"],
        descending=[True, False, False],
    ).limit(k)


def related_docs_reference(
    mention_pairs, min_shared: int = 2, max_entity_docs: int = 50,
    scale: int = RELDOC_SCALE,
) -> list:
    """Pure-Python replay (test oracle): (doc_id, entity_id) pairs ->
    sorted [(doc_a, doc_b, shared, jaccard_scaled)]."""
    m = set(mention_pairs)
    by_ent: dict = {}
    for d, e in m:
        by_ent.setdefault(e, set()).add(d)
    by_ent = {e: ds for e, ds in by_ent.items()
              if len(ds) <= max_entity_docs}
    sz: dict = {}
    for ds in by_ent.values():
        for d in ds:
            sz[d] = sz.get(d, 0) + 1
    cnt: dict = {}
    for ds in by_ent.values():
        docs = sorted(ds)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                p = (docs[i], docs[j])
                cnt[p] = cnt.get(p, 0) + 1
    rows = []
    for (a, b), sh in cnt.items():
        if sh < min_shared:
            continue
        jac = (scale * sh) // (sz[a] + sz[b] - sh)
        rows.append((a, b, sh, jac))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows


# --- weighted single-source shortest paths -------------------------------------

SSSP_WEIGHT_MOD = 9  # synthetic weight = 1 + (a + b) % MOD, in [1, MOD]


def sssp_weighted(
    edges: "ray.data.Dataset",
    max_rounds: int = 24,
    weight_mod: int = SSSP_WEIGHT_MOD,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Weighted single-source shortest paths over the undirected
    distinct graph — integer Bellman-Ford, the weighted generalization
    of :func:`bfs_distances` (hop counts can't express traversal COST;
    a retrieval ranker decaying by path cost, or a routing pass over a
    weighted KG, needs this relaxation class; the reference's APOC BFS,
    ``graphutil.py:547-632``, is unweighted-hops only).

    Edge weights are DETERMINISTIC INTEGERS so the result is
    bit-identical under any partitioning (the module's determinism
    contract): ``w(a, b) = 1 + (a + b) % weight_mod`` on the canonical
    ``(min, max)`` id pair — a synthetic-but-replayable weight model
    (swap in any integer weight column; the operator's contract is the
    relaxation, not the weight derivation).  Seed = top-degree node
    (ties: min id), the :func:`bfs_distances` convention.

    Scale shape: per round ONE E-sized streaming probe of the
    node-sided distance table (rides :func:`broadcast_join`'s size
    gate) + one node-keyed min aggregate; no global sort, no
    driver-side data path.  Early exit at the fixpoint — distances
    only decrease and the reachable set only grows, so an unchanged
    (count, sum) pair over one tiny scalar aggregate proves
    convergence; the fixpoint equals the ``max_rounds``-round unroll,
    which is exactly what the SQL oracle computes.

    Returns ``(entity_id, dist)`` for nodes reachable within
    ``max_rounds`` relaxation rounds.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs_weighted(t: pa.Table) -> pa.Table:
        # a % m via a - (a // m) * m (pyarrow has no mod kernel);
        # lo/hi are stable_id outputs (< 2^60, non-negative) so the
        # sum stays in int64 and truncated division == floor division
        s = pc.add(t["lo"], t["hi"])
        m = pc.subtract(s, pc.multiply(pc.divide(s, weight_mod),
                                       weight_mod))
        w = pc.add(1, pc.cast(m, pa.int64()))
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
            "w": pa.concat_arrays([
                w.combine_chunks(), w.combine_chunks()]),
        })

    bo = e.map_batches(
        both_dirs_weighted, batch_format="pyarrow").materialize()

    deg = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "deg")],
        num_partitions=num_partitions,
    ).materialize()
    top = deg.sort(["deg", "node"], descending=[True, False]).take(1)
    if not top:
        return ray.data.from_arrow(pa.table({
            "entity_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }))
    seed = int(top[0]["node"])

    dist = ray.data.from_arrow(pa.table({
        "entity_id": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()

    def _fingerprint(ds: "ray.data.Dataset") -> tuple:
        # (row count, sum of dist): dist rows only ever decrease in
        # value and grow in count, so an unchanged pair == fixpoint
        def p(t: pa.Table) -> pa.Table:
            s = pc.sum(t["dist"]).as_py()
            return pa.table({
                "_k": pa.array([1], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([0 if s is None else s], pa.int64()),
            })

        r = hash_aggregate(
            ds.map_batches(p, batch_format="pyarrow"),
            "_k", [("n", "sum", "n"), ("s", "sum", "s")],
            num_partitions=1,
        ).take_all()
        return (r[0]["n"], r[0]["s"]) if r else (0, 0)

    fp = _fingerprint(dist)
    for _ in range(max_rounds):
        # relax: E-sized probe of the node-sided distance table
        hop = broadcast_join(
            bo, dist, on=("node",), right_on=("entity_id",),
            num_partitions=num_partitions)

        def relax(t: pa.Table) -> pa.Table:
            return pa.table({
                "entity_id": t["peer"],
                "dist": pc.cast(pc.add(t["dist"], t["w"]), pa.int64()),
            })

        cand = hop.map_batches(relax, batch_format="pyarrow")
        dist = hash_aggregate(
            dist.union(cand), "entity_id", [("dist", "min", "dist")],
            num_partitions=num_partitions,
        ).materialize()
        nfp = _fingerprint(dist)
        if nfp == fp:
            break
        fp = nfp

    return dist


def sssp_weighted_reference(
    edge_pairs, max_rounds: int = 24, weight_mod: int = SSSP_WEIGHT_MOD,
) -> dict:
    """Pure-Python Bellman-Ford replay (test oracle): node -> dist
    after at most ``max_rounds`` synchronous relaxation rounds."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        w = 1 + (lo + hi) % weight_mod
        adj.setdefault(a, {})
        adj.setdefault(b, {})
        adj[a][b] = min(adj[a].get(b, w), w)
        adj[b][a] = min(adj[b].get(a, w), w)
    if not adj:
        return {}
    seed = max(adj, key=lambda n: (len(adj[n]), -n))
    dist = {seed: 0}
    for _ in range(max_rounds):
        new = dict(dist)
        for u, du in dist.items():
            for v, w in adj[u].items():
                if du + w < new.get(v, 1 << 62):
                    new[v] = du + w
        if new == dist:
            break
        dist = new
    return dist


# --- resource-allocation link prediction --------------------------------------

RA_SCALE = 10**6


def link_prediction_ra_topk(
    edges: "ray.data.Dataset",
    k: int = 20,
    scale: int = RA_SCALE,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
    max_neighbors: "int | None" = None,
) -> "ray.data.Dataset":
    """Top-k non-adjacent pairs by the RESOURCE-ALLOCATION index
    ``Σ_{z ∈ CN(a,b)} 1/deg(z)`` — the degree-weighted refinement of
    :func:`link_prediction_topk` (a hub shared by everyone carries
    less evidence than a rare mutual contact).  Kept INTEGER
    (``ra_scaled = Σ scale // deg(z)``) so a DuckDB replay
    hash-matches; the true RA value is ``ra_scaled / scale``.

    Same wedge shape and caps as :func:`link_prediction_topk`; the
    apex degree rides the wedge rows (one extra node-sided broadcast
    join before pair generation).  Ties: (entity_a, entity_b).
    """
    import numpy as np
    import pandas as pd

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "v": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    adj = e.map_batches(both_dirs, batch_format="pyarrow")

    deg = hash_aggregate(
        adj.select_columns(["u"]), "u", [(None, "count", "deg")],
        num_partitions=num_partitions,
    )
    adj_deg = broadcast_join(adj, deg, on=("u",),
                             num_partitions=num_partitions)

    def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["u", "v"], kind="mergesort")
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        dg = df["deg"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends_ = np.r_[starts[1:], len(u)]
        xs, ys, rs = [], [], []
        truncated = 0
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if max_neighbors is not None and n > max_neighbors:
                truncated += n - max_neighbors
                t_ = s + max_neighbors
                n = max_neighbors
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            nb = v[s:t_]  # sorted, so pairs come out (lo, hi)
            xs.append(nb[i])
            ys.append(nb[j])
            rs.append(np.full(len(i), scale // int(dg[s]), dtype=np.int64))
        if truncated:
            import logging

            logging.getLogger(__name__).warning(
                "link_prediction_ra_topk: dropped %d neighbors beyond "
                "max_neighbors=%d (first-by-id kept); RA scores are now "
                "approximate", truncated, max_neighbors)
        if not xs:
            return pd.DataFrame({
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
                "ra": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "entity_a": np.concatenate(xs),
            "entity_b": np.concatenate(ys),
            "ra": np.concatenate(rs),
        })

    wedge_ds = partitioned_group_map(
        adj_deg, "u", wedges, num_partitions=num_partitions)

    cn = hash_aggregate(
        wedge_ds, ["entity_a", "entity_b"],
        [("ra", "sum", "ra_scaled"), (None, "count", "common_neighbors")],
        num_partitions=num_partitions,
    )

    def mark(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": t["lo"],
            "hi": t["hi"],
            "_is_edge": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    marked = e.map_batches(mark, batch_format="pyarrow")
    j = broadcast_join(cn, marked, on=("entity_a", "entity_b"),
                       right_on=("lo", "hi"), join_type="left_outer")

    def non_edges(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_null(t["_is_edge"])).drop_columns(["_is_edge"])
        if out.num_rows > k:
            order = np.lexsort((
                out["entity_b"].to_numpy(), out["entity_a"].to_numpy(),
                -out["ra_scaled"].to_numpy(),
            ))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    cand = j.map_batches(non_edges, batch_format="pyarrow")
    return cand.sort(
        ["ra_scaled", "entity_a", "entity_b"],
        descending=[True, False, False],
    ).limit(k)


JACCARD_SCALE = 10**6


def node_similarity_topk(
    edges: "ray.data.Dataset",
    k: int = 20,
    scale: int = JACCARD_SCALE,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
    max_neighbors: "int | None" = None,
) -> "ray.data.Dataset":
    """Top-k node pairs by NEIGHBOR-SET JACCARD over the undirected
    distinct graph — the Neo4j GDS ``nodeSimilarity`` analog (the
    entity-conflation signal of a KG curation pass: two nodes whose
    neighborhoods nearly coincide are candidate aliases).  Unlike link
    prediction, ADJACENT pairs are scored too (GDS semantics: any pair
    sharing >= 1 neighbor).

    Kept INTEGER: ``jaccard_scaled = scale * |N(a) ∩ N(b)| //
    (deg(a) + deg(b) - |∩|)`` — exact-mirrorable in SQL.  Same wedge
    machinery and caps as :func:`link_prediction_topk`; the two
    endpoint degrees arrive via node-sided size-gated broadcast joins.
    Ties: (entity_a, entity_b).
    """
    import numpy as np
    import pandas as pd

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "v": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    adj = e.map_batches(both_dirs, batch_format="pyarrow")

    deg = hash_aggregate(
        adj.select_columns(["u"]), "u", [(None, "count", "deg")],
        num_partitions=num_partitions,
    ).materialize()

    def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["u", "v"], kind="mergesort")
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends_ = np.r_[starts[1:], len(u)]
        xs, ys = [], []
        truncated = 0
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if max_neighbors is not None and n > max_neighbors:
                truncated += n - max_neighbors
                t_ = s + max_neighbors
                n = max_neighbors
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            nb = v[s:t_]
            xs.append(nb[i])
            ys.append(nb[j])
        if truncated:
            import logging

            logging.getLogger(__name__).warning(
                "node_similarity_topk: dropped %d neighbors beyond "
                "max_neighbors=%d; Jaccard scores are now approximate",
                truncated, max_neighbors)
        if not xs:
            return pd.DataFrame({
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "entity_a": np.concatenate(xs),
            "entity_b": np.concatenate(ys),
        })

    wedge_ds = partitioned_group_map(
        adj, "u", wedges, num_partitions=num_partitions)

    cn = hash_aggregate(
        wedge_ds, ["entity_a", "entity_b"],
        [(None, "count", "intersection")],
        num_partitions=num_partitions,
    )

    with_a = broadcast_join(cn, deg, on=("entity_a",), right_on=("u",))
    with_a = with_a.map_batches(
        lambda t: t.rename_columns(
            [{"deg": "deg_a"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    both = broadcast_join(with_a, deg, on=("entity_b",), right_on=("u",))

    def score(t: pa.Table) -> pa.Table:
        inter = t["intersection"].to_numpy()
        da = t["deg_a"].to_numpy()
        db = t["deg"].to_numpy()
        union = da + db - inter
        jac = (scale * inter.astype(np.int64)) // union
        out = pa.table({
            "entity_a": t["entity_a"],
            "entity_b": t["entity_b"],
            "intersection": t["intersection"],
            "jaccard_scaled": pa.array(jac, pa.int64()),
        })
        if out.num_rows > k:
            order = np.lexsort((
                out["entity_b"].to_numpy(), out["entity_a"].to_numpy(),
                -out["jaccard_scaled"].to_numpy(),
            ))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    scored = both.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["jaccard_scaled", "entity_a", "entity_b"],
        descending=[True, False, False],
    ).limit(k)


def node_similarity_reference(edge_pairs, scale: int = JACCARD_SCALE) -> dict:
    """Pure-Python replay (test oracle): {(a,b): (intersection,
    jaccard_scaled)} for pairs sharing >= 1 neighbor."""
    und = {tuple(sorted(p)) for p in edge_pairs if p[0] != p[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict = {}
    seen: dict = {}
    for z, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                seen[p] = seen.get(p, 0) + 1
    for (a, b), inter in seen.items():
        union = len(adj[a]) + len(adj[b]) - inter
        out[(a, b)] = (inter, (scale * inter) // union)
    return out


def link_prediction_ra_reference(edge_pairs, scale: int = RA_SCALE) -> dict:
    """Pure-Python RA replay (test oracle): {(a,b): (cn, ra_scaled)}
    for NON-adjacent pairs with >=1 common neighbor."""
    und = {tuple(sorted(p)) for p in edge_pairs if p[0] != p[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict = {}
    for z, nbrs in adj.items():
        part = scale // len(nbrs)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                c, r = out.get(p, (0, 0))
                out[p] = (c + 1, r + part)
    return {p: v for p, v in out.items() if p not in und}


def link_prediction_topk(
    edges: "ray.data.Dataset",
    k: int = 20,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
    max_neighbors: "int | None" = None,
) -> "ray.data.Dataset":
    """Top-k NON-adjacent node pairs by common-neighbor count — the
    classic link-prediction score, i.e. the "propose missing edges"
    pass of a KG curation review.

    Unlike :func:`triangle_counts`, every common neighbor must
    generate its wedge (degree-ordering would undercount), so wedge
    volume is O(sum deg^2): each node's FULL neighbor list pairs up
    inside a hash partition.  ``max_neighbors`` (opt-in, logged, the
    ``ngram_jaccard_pairs`` contract) bounds a hub's contribution at
    scale; EXACT by default and checked against an exact SQL oracle.
    Existing edges are filtered with a broadcast membership probe
    (size-gated); ties break on (entity_a, entity_b).
    """
    import numpy as np
    import pandas as pd

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "v": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    adj = e.map_batches(both_dirs, batch_format="pyarrow")

    def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["u", "v"], kind="mergesort")
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends_ = np.r_[starts[1:], len(u)]
        xs, ys = [], []
        truncated = 0
        for s, t_ in zip(starts, ends_):
            n = t_ - s
            if max_neighbors is not None and n > max_neighbors:
                truncated += n - max_neighbors
                t_ = s + max_neighbors
                n = max_neighbors
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            nb = v[s:t_]  # sorted, so pairs come out (lo, hi)
            xs.append(nb[i])
            ys.append(nb[j])
        if truncated:
            import logging

            logging.getLogger(__name__).warning(
                "link_prediction_topk: dropped %d neighbors beyond "
                "max_neighbors=%d (first-by-id kept); common-neighbor "
                "counts are now approximate", truncated, max_neighbors)
        if not xs:
            return pd.DataFrame({
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "entity_a": np.concatenate(xs),
            "entity_b": np.concatenate(ys),
        })

    wedge_ds = partitioned_group_map(
        adj, "u", wedges, num_partitions=num_partitions)

    cn = hash_aggregate(
        wedge_ds, ["entity_a", "entity_b"],
        [(None, "count", "common_neighbors")],
        num_partitions=num_partitions,
    )

    # drop pairs that are ALREADY edges: a left-outer broadcast join
    # against the distinct edge set (size-gated; ids are 60-bit so no
    # packed composite key fits int64), keep the null side
    def mark(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": t["lo"],
            "hi": t["hi"],
            "_is_edge": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    marked = e.map_batches(mark, batch_format="pyarrow")
    j = broadcast_join(cn, marked, on=("entity_a", "entity_b"),
                       right_on=("lo", "hi"), join_type="left_outer")

    def non_edges(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_null(t["_is_edge"])).drop_columns(["_is_edge"])
        if out.num_rows > k:
            order = np.lexsort((
                out["entity_b"].to_numpy(), out["entity_a"].to_numpy(),
                -out["common_neighbors"].to_numpy(),
            ))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    cand = j.map_batches(non_edges, batch_format="pyarrow")
    return cand.sort(
        ["common_neighbors", "entity_a", "entity_b"],
        descending=[True, False, False],
    ).limit(k)


# --- deterministic random-walk corpus (DeepWalk / node2vec data gen) ----------

WALK_M61 = (1 << 61) - 1
_WALK_M64 = 1 << 64
_WALK_A = 1_000_003
_WALK_B = 999_983
_WALK_C = 998_244_353
_WALK_D = 1_099_511_628_211


def random_walks(
    edges: "ray.data.Dataset",
    walks_per_node: int = 2,
    steps: int = 3,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Deterministic random-walk corpus over the directed KG — the
    DeepWalk / node2vec DATA-GENERATION stage (Perozzi et al. 2014):
    graph-embedding training consumes walks as sentences, so the walk
    generator is a corpus operator, not an analytics one.

    Determinism contract (module docstring): instead of sampling, each
    step picks the out-neighbor minimizing the 61-bit integer hash
    ``h(seed, walk, step, dst)`` (uint64 wrap-then-mod, the minhash /
    FNV emulation pattern) with ``(h, dst)`` tie-break — a fixed
    pseudorandom choice that is bit-identical under any partitioning,
    which is what lets the unrolled DuckDB mirror hash-match a
    distributed run.  Walks START at every node with out-degree >= 1
    (``walks_per_node`` walks each) and END EARLY at sinks — the same
    absent-row semantics on both sides.

    Per step: one streaming E-sized probe of the walk frontier
    (node-sided, rides the broadcast gate) + one (seed, walk)-keyed
    head-of-group pick.  Rows: ``(seed, walk, step, node)`` with step
    0 = the seed itself.
    """
    import numpy as np

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    seeds = hash_aggregate(
        e.select_columns([src_col]), src_col, [(None, "count", "_m")],
        num_partitions=num_partitions).drop_columns(["_m"])

    def fan_out(t: pa.Table) -> pa.Table:
        ids = t[src_col].to_numpy(zero_copy_only=False)
        rep = np.repeat(ids, walks_per_node)
        w = np.tile(np.arange(walks_per_node, dtype=np.int64), len(ids))
        return pa.table({
            "seed": pa.array(rep, pa.int64()),
            "walk": pa.array(w, pa.int64()),
            "cur": pa.array(rep, pa.int64()),
        })

    frontier = seeds.map_batches(fan_out, batch_format="pyarrow")
    out_steps = [frontier.map_batches(
        lambda t: pa.table({
            "seed": t["seed"], "walk": t["walk"],
            "step": pa.array([0] * t.num_rows, pa.int64()),
            "node": t["cur"],
        }), batch_format="pyarrow")]

    def scored(step_no: int):
        def fn(t: pa.Table) -> pa.Table:
            seed = t["seed"].to_numpy(zero_copy_only=False).astype(np.uint64)
            walk = t["walk"].to_numpy(zero_copy_only=False).astype(np.uint64)
            dst = t[dst_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (seed * np.uint64(_WALK_A)
                 + walk * np.uint64(_WALK_B)
                 + np.uint64(step_no) * np.uint64(_WALK_C)
                 + dst * np.uint64(_WALK_D)) % np.uint64(WALK_M61)
            return pa.table({
                "seed": t["seed"], "walk": t["walk"],
                "dst": t[dst_col],
                "h": pa.array(h.astype(np.int64), pa.int64()),
            })

        return fn

    def pick(df):
        df = df.sort_values(["seed", "walk", "h", "dst"],
                            kind="mergesort")
        head = df.groupby(["seed", "walk"], sort=False).head(1)
        return head[["seed", "walk", "dst"]].rename(
            columns={"dst": "cur"})

    for s in range(1, steps + 1):
        cand = broadcast_join(e, frontier, on=(src_col,),
                              right_on=("cur",),
                              num_partitions=num_partitions)
        nxt = partitioned_group_map(
            cand.map_batches(scored(s), batch_format="pyarrow"),
            ["seed", "walk"], pick, num_partitions, adaptive=True)
        frontier = nxt.materialize()  # iterative: walk-frontier-sided
        out_steps.append(frontier.map_batches(
            lambda t, _s=s: pa.table({
                "seed": t["seed"], "walk": t["walk"],
                "step": pa.array([_s] * t.num_rows, pa.int64()),
                "node": t["cur"],
            }), batch_format="pyarrow"))

    out = out_steps[0]
    for ds in out_steps[1:]:
        out = out.union(ds)
    return out


def random_walks_reference(edge_pairs, walks_per_node: int = 2,
                           steps: int = 3) -> set:
    """Pure-Python replay (test oracle): set of (seed, walk, step, node)."""
    e = sorted(set(edge_pairs))
    adj: dict = {}
    for s, d in e:
        adj.setdefault(s, []).append(d)
    rows = set()
    for seed in sorted(adj):
        for w in range(walks_per_node):
            cur = seed
            rows.add((seed, w, 0, cur))
            for st in range(1, steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                best = min(
                    nbrs,
                    key=lambda d: (
                        (seed * _WALK_A + w * _WALK_B
                         + st * _WALK_C + d * _WALK_D)
                        % _WALK_M64 % WALK_M61, d))
                cur = best
                rows.add((seed, w, st, cur))
    return rows


# --- local clustering coefficient ---------------------------------------------

CC_SCALE = 10**6


def clustering_coefficient(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-node LOCAL clustering coefficient over the undirected
    distinct edge set: ``cc = 2*triangles / (deg*(deg-1))`` — the
    cohesion ratio (Watts & Strogatz 1998) that separates hub spokes
    (low cc) from clique members (high cc), a curation signal the raw
    triangle count conflates with degree.

    Integer contract: ``cc_scaled = 2*tri*CC_SCALE // (deg*(deg-1))``;
    nodes with deg < 2 get 0.  Composes :func:`triangle_counts` (the
    O(sqrt E)-oriented wedge pass) with one degree aggregate and one
    node-sided left join — no new E-sized machinery.  Returns every
    node: ``(entity_id, degree, n_triangles, cc_scaled)``.
    """

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"entity_id": pa.concat_arrays([
            t["lo"].combine_chunks(), t["hi"].combine_chunks()])})

    deg = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "degree")],
        num_partitions=num_partitions)
    tri = triangle_counts(edges, src_col=src_col, dst_col=dst_col,
                          num_partitions=num_partitions)
    j = broadcast_join(deg, tri, on=("entity_id",),
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        d = t["degree"].to_numpy(zero_copy_only=False)
        tr = pc.fill_null(t["n_triangles"], 0).to_numpy(
            zero_copy_only=False)
        denom = d * (d - 1)
        cc = np.where(denom > 0, 2 * tr * CC_SCALE // np.maximum(denom, 1),
                      0)
        return pa.table({
            "entity_id": t["entity_id"],
            "degree": t["degree"],
            "n_triangles": pa.array(tr.astype("int64"), pa.int64()),
            "cc_scaled": pa.array(cc.astype("int64"), pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def walk_skipgram_pairs(
    edges: "ray.data.Dataset",
    walks_per_node: int = 2,
    steps: int = 3,
    window: int = 2,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """(center, context) skip-gram pairs from the deterministic walk
    corpus — the word2vec-style training-pair extraction DeepWalk
    feeds its embedding model (walks are sentences, nodes are words).

    One (seed, walk)-keyed partition pass generates pairs within
    ``window`` steps (walks are ``steps+1`` nodes long, so per-walk
    work is constant); one hash aggregate folds them into
    ``(center, context, n)`` counts — the co-occurrence matrix an
    embedding trainer consumes.
    """
    import pandas as pd

    rw = random_walks(edges, walks_per_node=walks_per_node,
                      steps=steps, num_partitions=num_partitions)

    def gen(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["seed", "walk", "step"], kind="mergesort")
        out_c, out_x = [], []
        for _, g in df.groupby(["seed", "walk"], sort=False):
            nodes = g["node"].to_numpy()
            n = len(nodes)
            for i in range(n):
                for j in range(max(0, i - window),
                               min(n, i + window + 1)):
                    if i != j:
                        out_c.append(nodes[i])
                        out_x.append(nodes[j])
        return pd.DataFrame({
            "center": pd.Series(out_c, dtype="int64"),
            "context": pd.Series(out_x, dtype="int64"),
        })

    pairs = partitioned_group_map(rw, ["seed", "walk"], gen,
                                  num_partitions)
    return hash_aggregate(pairs, ["center", "context"],
                          [(None, "count", "n")],
                          num_partitions=num_partitions)


# --- approximate neighborhood function (ANF / HyperBall with KMV) --------------

NF_K = 8                   # sketch size; (k-1)*2^61 must fit uint64
NF_SPACE = 1 << 61         # hash space after the 61-bit mask
_NF_C1 = 0x9E3779B97F4A7C15   # splitmix64 increment (public constant)
_NF_A = 0x3C79AC492BA7B653    # odd multipliers < 2^62 so the DuckDB
_NF_B = 0x1C69B3F74AC4AE35    # HUGEINT emulation of *mod 2^64* fits INT128


def _nf_hash(ids) -> "object":
    """61-bit splitmix-style mix of entity ids — vectorized and
    bit-identical to the HUGEINT emulation in the SQL oracle."""
    import numpy as np

    z = np.asarray(ids, dtype=np.int64).astype(np.uint64) + np.uint64(_NF_C1)
    z ^= z >> np.uint64(30)
    z = z * np.uint64(_NF_A)
    z ^= z >> np.uint64(27)
    z = z * np.uint64(_NF_B)
    z ^= z >> np.uint64(31)
    return (z & np.uint64(NF_SPACE - 1)).astype(np.int64)


def neighborhood_function(
    edges: "ray.data.Dataset",
    hops: int = 3,
    k: int = NF_K,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "pa.Table":
    """Approximate neighborhood function N(h) = Σ_v |ball(v, h)| over
    the undirected distinct graph — the ANF of Palmer/Gibbons/Faloutsos
    (KDD'02) in the HyperBall formulation of Boldi/Vigna (2013), with
    K-Minimum-Values sketches instead of HyperLogLog registers: KMV's
    "k smallest distinct hashes" is a pure integer function of the data
    (see extras/textstats.py:distinct_tokens_kmv), so a DuckDB replay
    hash-matches the distributed run bit for bit, where HLL's register
    layout would not.

    Per round each node's sketch absorbs its neighbors' sketches and is
    re-truncated to the k smallest distinct hashes; |ball(v,h)| is the
    KMV estimate (exact below k).  N(h)/N(∞) is the standard effective-
    diameter / connectivity profile a graph-scale corpus audit needs.

    100-TB shape: sketches are O(V·k) rows and ride broadcast_join's
    size gate (hash-join fallback above it); the only E-sized work per
    round is one streaming probe whose output is cut to ≤k rows per
    (node, batch) IN-BATCH before the exchange, so the shuffle moves
    O(min(E, V·k·n_batches)) rows.  Rounds are bounded (`hops`), driver
    state is one int per hop.  Returns ``(hop, nf_est)`` int64 rows.
    """
    import numpy as np

    if k < 2:
        raise ValueError("KMV needs k >= 2")

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow")
    nodes = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def self_loop(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "peer": t["node"]})

    # self-edges keep each node's own sketch through the round merge
    adj = bo.union(nodes.map_batches(self_loop, batch_format="pyarrow"))
    adj = adj.materialize()  # probed every round

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "h": pa.array(_nf_hash(t["node"].to_numpy()), pa.int64()),
        })

    sketch = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def topk_partial(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        h = t["h"].to_numpy()
        order = np.lexsort((h, node))
        node, h = node[order], h[order]
        keep = np.ones(len(node), dtype=bool)
        keep[1:] = (node[1:] != node[:-1]) | (h[1:] != h[:-1])
        node, h = node[keep], h[keep]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]]) \
            if len(node) else np.array([], dtype=np.int64)
        runs = np.diff(np.r_[starts, len(node)])
        rank = np.arange(len(node)) - np.repeat(starts, runs)
        m = rank < k
        return pa.table({"node": pa.array(node[m], pa.int64()),
                         "h": pa.array(h[m], pa.int64())})

    def merge_part(df):
        import pandas as pd  # noqa: F401  (partition body runs remote)

        df = df.sort_values(["node", "h"]).drop_duplicates(["node", "h"])
        return df.groupby("node", sort=False).head(k)

    def nf_estimate(sk: "ray.data.Dataset") -> int:
        per_node = hash_aggregate(
            sk, "node", [(None, "count", "cnt"), ("h", "max", "kth")],
            num_partitions=num_partitions,
        )

        def partial_sum(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy().astype(np.uint64)
            kth = np.maximum(t["kth"].to_numpy(), 1).astype(np.uint64)
            est = np.where(
                cnt < k, cnt,
                (np.uint64(k - 1) * np.uint64(NF_SPACE)) // kth)
            return pa.table({"s": pa.array([int(est.sum())], pa.int64())})

        parts = per_node.map_batches(
            partial_sum, batch_format="pyarrow").take_all()
        return sum(r["s"] for r in parts)

    out_hops, out_nf = [0], [nf_estimate(sketch)]
    for hop in range(1, hops + 1):
        flows = broadcast_join(adj, sketch, on=("peer",),
                               right_on=("node",),
                               num_partitions=num_partitions)
        partial = flows.select_columns(["node", "h"]).map_batches(
            topk_partial, batch_format="pyarrow")
        sketch = partitioned_group_map(
            partial, "node", merge_part,
            num_partitions=num_partitions, adaptive=True).materialize()
        out_hops.append(hop)
        out_nf.append(nf_estimate(sketch))

    return pa.table({
        "hop": pa.array(out_hops, pa.int64()),
        "nf_est": pa.array(out_nf, pa.int64()),
    })


def neighborhood_function_reference(edge_pairs, hops: int = 3,
                                    k: int = NF_K) -> list:
    """Pure-Python replay of the exact sketch semantics (test oracle)."""
    import numpy as np

    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    sk = {v: {int(_nf_hash(np.array([v]))[0])} for v in nodes}

    def est(s: set) -> int:
        if len(s) < k:
            return len(s)
        kth = sorted(s)[k - 1]
        return ((k - 1) * NF_SPACE) // kth

    out = [(0, sum(est(sk[v]) for v in nodes))]
    for hop in range(1, hops + 1):
        nxt = {}
        for v in nodes:
            u = set(sk[v])
            for w in adj[v]:
                u |= sk[w]
            nxt[v] = set(sorted(u)[:k])
        sk = nxt
        out.append((hop, sum(est(sk[v]) for v in nodes)))
    return out


def effective_diameter(
    edges: "ray.data.Dataset",
    hops: int = 3,
    k: int = NF_K,
    coverage_num: int = 9,
    coverage_den: int = 10,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> pa.Table:
    """Integer effective diameter from the ANF profile: the smallest
    hop h with coverage_den * N(h) >= coverage_num * N(hops) (default
    the standard 90% threshold of Palmer/Gibbons/Faloutsos, KDD'02,
    without the fractional interpolation — integer hops keep the
    result a pure function of the data, so the DuckDB replay of the
    same KMV sketch hash-matches).  One reuse of the
    :func:`neighborhood_function` pass plus an O(hops) driver-side
    scan of its (hops+1)-row output.  Always returns exactly one
    (eff_diameter_hop, nf_at_hop, nf_max) int64 row (hop 0 on an
    empty graph, where every N(h) is 0).
    """
    import numpy as np

    nf = neighborhood_function(
        edges, hops=hops, k=k, src_col=src_col, dst_col=dst_col,
        num_partitions=num_partitions)
    hop = nf["hop"].to_numpy(zero_copy_only=False)
    est = nf["nf_est"].to_numpy(zero_copy_only=False)
    order = np.argsort(hop)
    hop, est = hop[order], est[order]
    nf_max = int(est[-1])
    ok = np.flatnonzero(coverage_den * est >= coverage_num * nf_max)
    i = int(ok[0])
    return pa.table({
        "eff_diameter_hop": pa.array([int(hop[i])], pa.int64()),
        "nf_at_hop": pa.array([int(est[i])], pa.int64()),
        "nf_max": pa.array([nf_max], pa.int64()),
    })


# --- degree histogram -----------------------------------------------------------

def degree_histogram(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Log2-bucket histogram of total degree over DISTINCT ``(src,
    dst)`` pairs — the power-law-tail audit of the extracted graph
    (degree definition identical to :func:`degree_topk`, so hub report
    and histogram agree).  Bucket = floor(log2(degree)); exact for
    int64 degrees because log2 of an exactly-representable double is
    >1e-9 away from the next integer except AT powers of two, where it
    is exact.  Two node-sided exchanges, nothing E-sized leaves the
    partial aggregation.  Returns ``(bucket, min_degree, n_nodes)``.
    """
    import numpy as np

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"entity_id": pa.concat_arrays([
            t[src_col].combine_chunks(), t[dst_col].combine_chunks()])})

    deg = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "degree")],
        num_partitions=num_partitions,
    )

    def to_bucket(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy()
        b = np.floor(np.log2(d.astype(np.float64))).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64())})

    hist = hash_aggregate(
        deg.map_batches(to_bucket, batch_format="pyarrow"),
        "bucket", [(None, "count", "n_nodes")],
        num_partitions=num_partitions,
    )

    def add_lo(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy()
        return pa.table({
            "bucket": t["bucket"],
            "min_degree": pa.array(np.int64(1) << b, pa.int64()),
            "n_nodes": t["n_nodes"],
        })

    return hist.map_batches(add_lo, batch_format="pyarrow")


RELCARD_SCALE = 10**6


def relation_cardinality(
    edges: "ray.data.Dataset",
    num_partitions: "int | None" = None,
    scale: int = RELCARD_SCALE,
) -> pa.Table:
    """Per-relation cardinality profile: edge count, distinct-subject
    and distinct-object counts, and the integer-scaled functionality
    fun(r) = |subjects| / |edges| and inverse functionality
    ifun(r) = |objects| / |edges| of Suchanek et al. (AMIE, WWW'13)
    — the standard schema-quality audit that tells 1:1 relations
    ("capital of") from fan-out relations ("mentions").

    Input rows are assumed unique per edge identity (the snapshot
    edges table: one row per (src, rel, dst, term), same identity as
    kg_rel_counts).  Three slim node/edge-sided exchanges, each
    pre-collapsed in-batch by hash_aggregate partials; the merge is a
    pyarrow join over per-relation tables, bounded by the number of
    distinct relation types (schema-sized, never corpus-sized).
    Returns (rel_type, n_edges, n_src, n_dst, func_scaled,
    inv_func_scaled) int64/string rows.
    """
    import numpy as np
    import ray

    slim = edges.select_columns(["rel_type", "src_id", "dst_id"])
    n_edges = hash_aggregate(
        slim.select_columns(["rel_type"]), "rel_type",
        [(None, "count", "n_edges")], num_partitions=num_partitions)
    per_end = []
    for col, alias in (("src_id", "n_src"), ("dst_id", "n_dst")):
        distinct = hash_aggregate(
            slim.select_columns(["rel_type", col]),
            ["rel_type", col], [(None, "count", "_m")],
            num_partitions=num_partitions).drop_columns(["_m"])
        per_end.append(hash_aggregate(
            distinct.select_columns(["rel_type"]), "rel_type",
            [(None, "count", alias)], num_partitions=num_partitions))

    def _small(ds, alias: str) -> pa.Table:
        parts = [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
        if not parts:
            return pa.table({"rel_type": pa.array([], pa.string()),
                             alias: pa.array([], pa.int64())})
        return pa.concat_tables(parts).select(["rel_type", alias])

    out = _small(n_edges, "n_edges")
    for d, alias in zip(per_end, ("n_src", "n_dst")):
        out = out.join(_small(d, alias), keys=["rel_type"],
                       join_type="inner")
    out = out.sort_by("rel_type")
    ne = out["n_edges"].to_numpy(zero_copy_only=False)
    ns = out["n_src"].to_numpy(zero_copy_only=False)
    nd = out["n_dst"].to_numpy(zero_copy_only=False)
    return out.append_column(
        "func_scaled", pa.array(scale * ns // ne, pa.int64())
    ).append_column(
        "inv_func_scaled", pa.array(scale * nd // ne, pa.int64()))


CONFLICT_FUNC_MIN = 800_000  # functionality >= 0.8 => treat as 1:1


def functional_conflicts(
    edges: "ray.data.Dataset",
    num_partitions: "int | None" = None,
    func_min: int = CONFLICT_FUNC_MIN,
    scale: int = RELCARD_SCALE,
) -> "ray.data.Dataset":
    """Constraint-violation audit: for relations that are MOSTLY
    functional (fun(r) >= ``func_min``/``scale``, from
    :func:`relation_cardinality`), every subject asserting 2+ distinct
    objects — the contradiction report a KG curation pass reviews
    ('capital_of' with two capitals is a conflict; 'mentions' with two
    objects is not, and its low functionality excludes it).

    Shape: the functional-relation set is schema-sized (broadcast as
    an Arrow filter constant); one distinct + one count exchange over
    the slim (rel, src) projection.  Returns
    ``(rel_type, src_id, n_objects)`` for violators only."""
    card = relation_cardinality(edges, num_partitions=num_partitions,
                                scale=scale)
    keep = card.filter(
        pc.greater_equal(card["func_scaled"], func_min))["rel_type"]
    func_rels = pa.array(sorted(keep.to_pylist()), pa.string())

    slim = edges.select_columns(["rel_type", "src_id", "dst_id"]) \
        .map_batches(
            lambda t: t.filter(pc.is_in(t["rel_type"], func_rels)),
            batch_format="pyarrow")
    distinct = hash_aggregate(
        slim, ["rel_type", "src_id", "dst_id"], [(None, "count", "_m")],
        num_partitions=num_partitions).drop_columns(["_m"])
    per_subj = hash_aggregate(
        distinct.select_columns(["rel_type", "src_id"]),
        ["rel_type", "src_id"], [(None, "count", "n_objects")],
        num_partitions=num_partitions)
    return per_subj.map_batches(
        lambda t: t.filter(pc.greater(t["n_objects"], 1)),
        batch_format="pyarrow")


# --- minimum spanning forest (Boruvka) ------------------------------------------

def minimum_spanning_forest(
    edges: "ray.data.Dataset",
    weight_mod: int = SSSP_WEIGHT_MOD,
    max_rounds: int = 32,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Minimum spanning forest over the undirected distinct graph —
    distributed Boruvka, the bulk-graph MST pass (Neo4j GDS
    spanningTree analog; the backbone extraction a KG curation layer
    uses to thin hairball neighborhoods).

    Weights follow :func:`sssp_weighted`'s deterministic integer model
    ``w(a, b) = 1 + (a + b) % weight_mod`` and edges are totally
    ordered by ``(w, lo, hi)`` — all-distinct, so the forest is UNIQUE
    and every correct MST algorithm (the pytest oracle replays
    Kruskal) returns bit-identical rows regardless of partitioning.

    Per round: each component picks its minimum incident crossing edge
    (two tagged copies of the crossing-edge table, one argmin per
    component via a partitioned group head), picked edges join the
    forest, and touched components contract via
    ``connected_components`` on the component-pair graph.  Components
    at least halve per round, so ``max_rounds=32`` covers 2^32 nodes
    (set 40+ for 10^12).  All stages are node- or component-sided
    exchanges; the only E-sized work per round is the streaming
    label probe of the crossing-edge table, which SHRINKS as
    components merge.  Returns ``(entity_a, entity_b, weight)``.
    """
    import pandas as pd

    from neo4j_document_pipeline_ray.extras.dedup import (
        connected_components,
    )

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def weigh(t: pa.Table) -> pa.Table:
        s = pc.add(t["lo"], t["hi"])
        m = pc.subtract(s, pc.multiply(pc.divide(s, weight_mod),
                                       weight_mod))
        return t.append_column("w", pc.add(m, 1))

    e = e.map_batches(weigh, batch_format="pyarrow").materialize()

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["lo"].combine_chunks(), t["hi"].combine_chunks()])})

    comp = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).map_batches(
        lambda t: t.append_column("comp", t["node"]),
        batch_format="pyarrow").materialize()

    def head_one(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["comp", "w", "lo", "hi"], kind="mergesort")
        return df.groupby("comp", sort=False).head(1)

    forest = None
    for _ in range(max_rounds):
        def _rename(col_from, col_to):
            def fn(t: pa.Table) -> pa.Table:
                names = [col_to if n == col_from else n
                         for n in t.schema.names]
                return t.rename_columns(names)
            return fn

        el = broadcast_join(e, comp, on=("lo",), right_on=("node",),
                            num_partitions=num_partitions)
        el = el.map_batches(_rename("comp", "ca"), batch_format="pyarrow")
        el = broadcast_join(el, comp, on=("hi",), right_on=("node",),
                            num_partitions=num_partitions)
        el = el.map_batches(_rename("comp", "cb"), batch_format="pyarrow")

        def crossing(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t["ca"], t["cb"]))

        inter = el.map_batches(crossing, batch_format="pyarrow")

        def tag_both(t: pa.Table) -> pa.Table:
            return pa.table({
                "comp": pa.concat_arrays([
                    t["ca"].combine_chunks(), t["cb"].combine_chunks()]),
                "w": pa.concat_arrays([
                    t["w"].combine_chunks(), t["w"].combine_chunks()]),
                "lo": pa.concat_arrays([
                    t["lo"].combine_chunks(), t["lo"].combine_chunks()]),
                "hi": pa.concat_arrays([
                    t["hi"].combine_chunks(), t["hi"].combine_chunks()]),
                "ca": pa.concat_arrays([
                    t["ca"].combine_chunks(), t["ca"].combine_chunks()]),
                "cb": pa.concat_arrays([
                    t["cb"].combine_chunks(), t["cb"].combine_chunks()]),
            })

        cand = inter.map_batches(tag_both, batch_format="pyarrow")
        picked = partitioned_group_map(
            cand, "comp", head_one, num_partitions).materialize()
        if picked.count() == 0:
            break

        new_edges = hash_aggregate(
            picked.select_columns(["lo", "hi", "w"]),
            ["lo", "hi", "w"], [(None, "count", "_m")],
            num_partitions=num_partitions,
        ).drop_columns(["_m"])
        forest = (new_edges if forest is None
                  else forest.union(new_edges)).materialize()

        merge_pairs = picked.select_columns(["ca", "cb"]).map_batches(
            lambda t: pa.table({"a": t["ca"], "b": t["cb"]}),
            batch_format="pyarrow")
        cc = connected_components(merge_pairs, max_rounds=16)
        comp = broadcast_join(
            comp, cc, on=("comp",), right_on=("node",),
            join_type="left_outer", num_partitions=num_partitions)
        comp = comp.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "comp": pc.coalesce(t["component"], t["comp"]),
            }),
            batch_format="pyarrow").materialize()

    if forest is None:
        return ray.data.from_arrow(pa.table({
            "entity_a": pa.array([], pa.int64()),
            "entity_b": pa.array([], pa.int64()),
            "weight": pa.array([], pa.int64()),
        }))
    return forest.map_batches(
        lambda t: pa.table({"entity_a": t["lo"], "entity_b": t["hi"],
                            "weight": t["w"]}),
        batch_format="pyarrow")


def minimum_spanning_forest_reference(
        edge_pairs, weight_mod: int = SSSP_WEIGHT_MOD) -> set:
    """Kruskal replay with union-find (test oracle): the unique MSF
    under the all-distinct (w, lo, hi) total order."""
    es = set()
    for a, b in edge_pairs:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        es.add((1 + (lo + hi) % weight_mod, lo, hi))
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, lo, hi in sorted(es):
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[ra] = rb
            out.add((lo, hi, w))
    return out


HARMONIC_SCALE = 10**6


def harmonic_centrality_approx(
    edges: "ray.data.Dataset",
    hops: int = 3,
    k: int = NF_K,
    scale: int = HARMONIC_SCALE,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Approximate harmonic centrality H(v) = Σ_h (1/h)·|sphere(v, h)|
    truncated at ``hops`` — the per-node application HyperBall was
    built for (Boldi/Vigna 2013), over the same KMV sketch rounds as
    :func:`neighborhood_function` (same integer estimator, same
    bit-exact SQL replayability).

    Telescoping makes it ONE aggregate: Σ_h (S//h)(b_h − b_{h−1})
    = Σ_h weight(h)·b_h with weight(0) = −S, weight(h) =
    S//h − S//(h+1) for 0 < h < H, weight(H) = S//H — so each round
    just emits (node, weight·est) rows and a single node-keyed sum
    finishes.  Returns ``(entity_id, harmonic_scaled)``; divide by
    ``scale`` for the usual value.
    """
    import numpy as np

    if k < 2:
        raise ValueError("KMV needs k >= 2")

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow")
    nodes = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def self_loop(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "peer": t["node"]})

    adj = bo.union(nodes.map_batches(self_loop, batch_format="pyarrow"))
    adj = adj.materialize()

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "h": pa.array(_nf_hash(t["node"].to_numpy()), pa.int64()),
        })

    sketch = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def topk_partial(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        h = t["h"].to_numpy()
        order = np.lexsort((h, node))
        node, h = node[order], h[order]
        keep = np.ones(len(node), dtype=bool)
        keep[1:] = (node[1:] != node[:-1]) | (h[1:] != h[:-1])
        node, h = node[keep], h[keep]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]]) \
            if len(node) else np.array([], dtype=np.int64)
        runs = np.diff(np.r_[starts, len(node)])
        rank = np.arange(len(node)) - np.repeat(starts, runs)
        m = rank < k
        return pa.table({"node": pa.array(node[m], pa.int64()),
                         "h": pa.array(h[m], pa.int64())})

    def merge_part(df):
        df = df.sort_values(["node", "h"]).drop_duplicates(["node", "h"])
        return df.groupby("node", sort=False).head(k)

    def weight(h: int) -> int:
        if h == 0:
            return -scale
        if h == hops:
            return scale // h
        return scale // h - scale // (h + 1)

    def contrib_fn(hop: int):
        wt = weight(hop)

        def fn(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy().astype(np.uint64)
            kth = np.maximum(t["kth"].to_numpy(), 1).astype(np.uint64)
            est = np.where(
                cnt < k, cnt,
                (np.uint64(k - 1) * np.uint64(NF_SPACE)) // kth)
            return pa.table({
                "node": t["node"],
                "c": pa.array(wt * est.astype(np.int64), pa.int64()),
            })
        return fn

    def per_node(sk, hop: int):
        agg = hash_aggregate(
            sk, "node", [(None, "count", "cnt"), ("h", "max", "kth")],
            num_partitions=num_partitions,
        )
        return agg.map_batches(contrib_fn(hop), batch_format="pyarrow")

    contribs = per_node(sketch, 0)
    for hop in range(1, hops + 1):
        flows = broadcast_join(adj, sketch, on=("peer",),
                               right_on=("node",),
                               num_partitions=num_partitions)
        partial = flows.select_columns(["node", "h"]).map_batches(
            topk_partial, batch_format="pyarrow")
        sketch = partitioned_group_map(
            partial, "node", merge_part,
            num_partitions=num_partitions, adaptive=True).materialize()
        contribs = contribs.union(per_node(sketch, hop))

    out = hash_aggregate(contribs, "node",
                         [("c", "sum", "harmonic_scaled")],
                         num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"entity_id": t["node"],
                            "harmonic_scaled": t["harmonic_scaled"]}),
        batch_format="pyarrow")


def harmonic_centrality_reference(edge_pairs, hops: int = 3,
                                  k: int = NF_K,
                                  scale: int = HARMONIC_SCALE) -> dict:
    """Pure-Python replay of the exact sketch + telescoped weighting."""
    import numpy as np

    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    sk = {v: {int(_nf_hash(np.array([v]))[0])} for v in nodes}

    def est(s: set) -> int:
        if len(s) < k:
            return len(s)
        return ((k - 1) * NF_SPACE) // sorted(s)[k - 1]

    def weight(h: int) -> int:
        if h == 0:
            return -scale
        if h == hops:
            return scale // h
        return scale // h - scale // (h + 1)

    out = {v: weight(0) * est(sk[v]) for v in nodes}
    for hop in range(1, hops + 1):
        nxt = {}
        for v in nodes:
            u = set(sk[v])
            for w in adj[v]:
                u |= sk[w]
            nxt[v] = set(sorted(u)[:k])
        sk = nxt
        for v in nodes:
            out[v] += weight(hop) * est(sk[v])
    return out


# --- betweenness centrality (pivot-sampled Brandes) -----------------------------

BC_SCALE = 10**6
BC_PIVOTS = 2
BC_LEVELS = 6


def betweenness_approx(
    edges: "ray.data.Dataset",
    pivots: int = BC_PIVOTS,
    levels: int = BC_LEVELS,
    scale: int = BC_SCALE,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Pivot-sampled betweenness centrality (Brandes 2001 dependency
    accumulation; Brandes/Pich 2007 pivot sampling) over the undirected
    distinct graph — the load-bearing-node audit PageRank misses (a
    bridge between communities has low rank but high betweenness).

    Deterministic semantics so a DuckDB unroll hash-matches: pivots =
    top-``pivots`` nodes by total degree (ties: min id); forward BFS
    truncated at ``levels`` hops counts shortest paths ``sigma`` in
    exact integers; the backward pass computes the integer-scaled
    dependency ``D(v) = Σ_{w∈succ(v)} (sigma_v·(scale + D_w)) //
    sigma_w`` — each term an independent floor, integer sums
    associative.  Returned ``betweenness_scaled = Σ_pivots D`` for
    non-pivot rows ≥ the pivot count (truncation documented; sigma ≤
    V^(levels−1) must fit int64 — fine for KG-sized level counts).

    Shape: per pivot ``levels`` forward rounds (frontier probe +
    sigma-sum aggregate, all node-sided against the streaming edge
    table) and ``levels`` backward rounds (successor join + term
    aggregate).  Pivot loops multiply rounds by a CONSTANT, not by V —
    the standard scalable approximation.  Returns ``(entity_id,
    betweenness_scaled)`` for nodes with nonzero dependency.
    """
    import numpy as np

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow").materialize()
    deg = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "deg")],
        num_partitions=num_partitions,
    )
    seeds = [int(r["node"]) for r in
             deg.sort(["deg", "node"], descending=[True, False])
                .take(pivots)]

    totals = None
    for s in seeds:
        # forward: levels of (node, dist, sigma)
        frontier = ray.data.from_arrow(pa.table({
            "node": pa.array([s], pa.int64()),
            "sigma": pa.array([1], pa.int64()),
        })).materialize()
        level_tables = [frontier]  # index = dist
        seen = frontier.select_columns(["node"]).materialize()
        for _ in range(levels):
            hop = broadcast_join(bo, frontier, on=("node",),
                                 num_partitions=num_partitions)
            cand = hash_aggregate(
                hop.select_columns(["peer", "sigma"]),
                "peer", [("sigma", "sum", "sigma")],
                num_partitions=num_partitions)
            mark = seen.map_batches(
                lambda t: t.append_column(
                    "_seen", pa.array(np.ones(t.num_rows, dtype=np.int8))),
                batch_format="pyarrow")
            nxt = broadcast_join(cand, mark, on=("peer",),
                                 right_on=("node",),
                                 join_type="left_outer",
                                 num_partitions=num_partitions)
            frontier = nxt.map_batches(
                lambda t: pa.table({
                    "node": t.filter(pc.is_null(t["_seen"]))["peer"],
                    "sigma": t.filter(pc.is_null(t["_seen"]))["sigma"],
                }),
                batch_format="pyarrow").materialize()
            if frontier.count() == 0:
                break
            level_tables.append(frontier)
            seen = seen.union(
                frontier.select_columns(["node"])).materialize()

        # backward: D at the deepest level is 0; walk up
        d_next = None  # (node, dep) at level l+1
        acc = None     # union of per-level (node, dep) for this pivot
        for lvl in range(len(level_tables) - 2, -1, -1):
            cur, nxt_t = level_tables[lvl], level_tables[lvl + 1]
            # successor rows: (v at lvl) -[edge]-> (w at lvl+1)
            succ = broadcast_join(bo, nxt_t, on=("node",),
                                  num_partitions=num_partitions)
            # succ: (node=w, peer=v, sigma=sigma_w); attach D(w)
            if d_next is not None:
                succ = broadcast_join(succ, d_next, on=("node",),
                                      join_type="left_outer",
                                      num_partitions=num_partitions)
            else:
                succ = succ.map_batches(
                    lambda t: t.append_column(
                        "dep", pa.nulls(t.num_rows, pa.int64())),
                    batch_format="pyarrow")
            # keep rows whose peer is at level lvl, with peer's sigma
            vjoin = broadcast_join(
                succ, cur.map_batches(
                    lambda t: pa.table({"peer": t["node"],
                                        "sigma_v": t["sigma"]}),
                    batch_format="pyarrow"),
                on=("peer",), num_partitions=num_partitions)

            def term(t: pa.Table, _sc=scale) -> pa.Table:
                dep_w = pc.fill_null(t["dep"], 0).to_numpy()
                sig_w = t["sigma"].to_numpy()
                sig_v = t["sigma_v"].to_numpy()
                val = (sig_v * (_sc + dep_w)) // sig_w
                return pa.table({
                    "node": t["peer"],
                    "dep": pa.array(val, pa.int64()),
                })

            d_cur = hash_aggregate(
                vjoin.map_batches(term, batch_format="pyarrow"),
                "node", [("dep", "sum", "dep")],
                num_partitions=num_partitions).materialize()
            d_next = d_cur
            acc = d_cur if acc is None else acc.union(d_cur)

        if acc is None:
            continue
        # drop the pivot's own row; dependencies define betweenness
        # only for v != s
        acc = acc.map_batches(
            lambda t, _s=s: t.filter(pc.not_equal(t["node"], _s)),
            batch_format="pyarrow")
        totals = acc if totals is None else totals.union(acc)

    if totals is None:
        return ray.data.from_arrow(pa.table({
            "entity_id": pa.array([], pa.int64()),
            "betweenness_scaled": pa.array([], pa.int64()),
        }))
    out = hash_aggregate(totals, "node",
                         [("dep", "sum", "betweenness_scaled")],
                         num_partitions=num_partitions)
    # zero rows can appear when every term floors to 0 (sigma_w >
    # sigma_v * scale); drop them so the "has nonzero dependency"
    # convention matches the replay and the SQL mirror exactly
    return out.map_batches(
        lambda t: pa.table({
            "entity_id": t["node"],
            "betweenness_scaled": t["betweenness_scaled"],
        }).filter(pc.not_equal(t["betweenness_scaled"], 0)),
        batch_format="pyarrow")


def betweenness_reference(edge_pairs, pivots: int = BC_PIVOTS,
                          levels: int = BC_LEVELS,
                          scale: int = BC_SCALE) -> dict:
    """Pure-Python replay of the exact truncated-Brandes semantics."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return {}
    seeds = sorted(adj, key=lambda n: (-len(adj[n]), n))[:pivots]
    out: dict = {}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        lvls = [[s]]
        for l in range(1, levels + 1):
            nxt: dict = {}
            for u in lvls[-1]:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            if not nxt:
                break
            for v, sg in nxt.items():
                dist[v] = l
                sigma[v] = sg
            lvls.append(sorted(nxt))
        dep: dict = {}
        for l in range(len(lvls) - 2, -1, -1):
            for v in lvls[l]:
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == l + 1:
                        tot += (sigma[v] * (scale + dep.get(w, 0))
                                ) // sigma[w]
                if tot:
                    dep[v] = tot
        for v, d in dep.items():
            if v != s:
                out[v] = out.get(v, 0) + d
    return out


# --- negative sampling (link-prediction training data) --------------------------

NEG_BUCKETS = 64
NEG_TRIALS = 4
_NEG_STEP = 0x9E37  # trial stride; node_id + t*step stays far inside int64


def negative_samples(
    edges: "ray.data.Dataset",
    trials: int = NEG_TRIALS,
    buckets: int = NEG_BUCKETS,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Deterministic negative edge samples — the non-edge pairs a KG
    embedding trainer (TransE-class) consumes alongside the positive
    edge list and the walk corpus.

    Hash-bucket scheme: every node hashes into one of ``buckets``
    buckets whose REPRESENTATIVE is its min entity id; the candidate
    negative for (u, trial t) is the representative of bucket
    ``splitmix61(u + t·step) % buckets``.  Candidates equal to u or
    colliding with a REAL undirected edge are rejected by one
    hash-partitioned anti-join against the distinct edge set — no
    rejection loop, no per-row retry, one pass.  The bucket-rep table
    is O(buckets) and broadcast once; everything else is node- or
    candidate-sided.  Returns ``(entity_id, trial, neg_id)``.
    """
    import numpy as np

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["lo"].combine_chunks(), t["hi"].combine_chunks()])})

    nodes = hash_aggregate(
        e.map_batches(ends, batch_format="pyarrow"),
        "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def to_bucket(t: pa.Table) -> pa.Table:
        b = _nf_hash(t["node"].to_numpy()) % buckets
        return pa.table({"b": pa.array(b, pa.int64()),
                         "node": t["node"]})

    reps = hash_aggregate(
        nodes.map_batches(to_bucket, batch_format="pyarrow"),
        "b", [("node", "min", "rep")],
        num_partitions=num_partitions)

    def expand(t: pa.Table) -> pa.Table:
        u = t["node"].to_numpy()
        us = np.repeat(u, trials)
        ts = np.tile(np.arange(trials, dtype=np.int64), len(u))
        b = _nf_hash(us + ts * _NEG_STEP) % buckets
        return pa.table({
            "node": pa.array(us, pa.int64()),
            "trial": pa.array(ts, pa.int64()),
            "b": pa.array(b, pa.int64()),
        })

    cand = broadcast_join(
        nodes.map_batches(expand, batch_format="pyarrow"),
        reps, on=("b",), num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["rep"])
        sub = t.filter(keep)
        return pa.table({
            "node": sub["node"], "trial": sub["trial"],
            "rep": sub["rep"],
            "lo": pc.min_element_wise(sub["node"], sub["rep"]),
            "hi": pc.max_element_wise(sub["node"], sub["rep"]),
        })

    oriented = cand.map_batches(orient, batch_format="pyarrow")
    marked = e.map_batches(
        lambda t: t.append_column(
            "_edge", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow")
    joined = broadcast_join(oriented, marked, on=("lo", "hi"),
                            join_type="left_outer",
                            num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.is_null(t["_edge"])
        sub = t.filter(keep)
        return pa.table({
            "entity_id": sub["node"],
            "trial": sub["trial"],
            "neg_id": sub["rep"],
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def negative_samples_reference(edge_pairs, trials: int = NEG_TRIALS,
                               buckets: int = NEG_BUCKETS) -> set:
    """Pure-Python replay (test oracle)."""
    import numpy as np

    es, ns = set(), set()
    for a, b in edge_pairs:
        if a == b:
            continue
        es.add((min(a, b), max(a, b)))
        ns.update((a, b))
    reps: dict = {}
    for v in sorted(ns):
        bk = int(_nf_hash(np.array([v]))[0]) % buckets
        if bk not in reps or v < reps[bk]:
            reps[bk] = v
    out = set()
    for u in ns:
        for t in range(trials):
            bk = int(_nf_hash(np.array([u + t * _NEG_STEP]))[0]) % buckets
            if bk not in reps:
                continue
            v = reps[bk]
            if v == u or (min(u, v), max(u, v)) in es:
                continue
            out.add((u, t, v))
    return out


# --- AMIE-style rule mining ------------------------------------------------------

RULE_TOPK = 10
RULE_SCALE = 10**6


def rule_mining(
    edges: "ray.data.Dataset",
    k: int = RULE_TOPK,
    scale: int = RULE_SCALE,
    src_col: str = "src_id",
    rel_col: str = "rel_type",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Path-rule mining over the typed edge table (AMIE's 2-atom chain
    rules, Galarraga et al. 2013): for the top-``k`` relation chains
    ``r1(a,b) ∧ r2(b,c)`` by path support, measure how often a direct
    edge ``r3(a,c)`` closes the path — the schema-discovery pass that
    turns an extracted KG into candidate inference rules.

    Scale design: path SUPPORT never materializes wedges — per mid
    node the (r1 in-count) × (r2 out-count) vectors multiply inside a
    partitioned group map, so the exchange carries (r1, r2) partials;
    the a=c degenerate paths are removed by an exact correction join
    keyed on the (b, a) pair.  Wedges ARE generated only for the
    top-k chains (typed filter prunes the edge table first) and only
    to join against direct edges for closure counts.  Rows:
    ``(r1, r2, r3, n_paths, n_closed, conf_scaled)`` for closures
    observed on top-k chains; confidence = closed·scale // paths.
    """
    import pandas as pd

    e = hash_aggregate(
        edges.select_columns([src_col, rel_col, dst_col])
             .map_batches(
                 lambda t: pa.table({
                     "a": t[src_col], "r": t[rel_col], "c": t[dst_col],
                 }).filter(pc.not_equal(t[src_col], t[dst_col])),
                 batch_format="pyarrow"),
        ["a", "r", "c"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    ins = hash_aggregate(
        e.map_batches(lambda t: pa.table({"b": t["c"], "r1": t["r"]}),
                      batch_format="pyarrow"),
        ["b", "r1"], [(None, "count", "n1")],
        num_partitions=num_partitions)
    outs = hash_aggregate(
        e.map_batches(lambda t: pa.table({"b": t["a"], "r2": t["r"]}),
                      batch_format="pyarrow"),
        ["b", "r2"], [(None, "count", "n2")],
        num_partitions=num_partitions)

    tagged = ins.map_batches(
        lambda t: pa.table({"b": t["b"], "rel": t["r1"], "n": t["n1"],
                            "side": pa.array([0] * t.num_rows,
                                             pa.int8())}),
        batch_format="pyarrow").union(outs.map_batches(
            lambda t: pa.table({"b": t["b"], "rel": t["r2"],
                                "n": t["n2"],
                                "side": pa.array([1] * t.num_rows,
                                                 pa.int8())}),
            batch_format="pyarrow"))

    def cross_per_mid(df: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for _, g in df.groupby("b", sort=False):
            gi = g[g["side"] == 0]
            go = g[g["side"] == 1]
            if gi.empty or go.empty:
                continue
            m = gi.merge(go, how="cross", suffixes=("_i", "_o"))
            m["n"] = m["n_i"] * m["n_o"]
            out.append(m[["rel_i", "rel_o", "n"]])
        if not out:
            return pd.DataFrame({"r1": pd.Series(dtype="object"),
                                 "r2": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        res = pd.concat(out, ignore_index=True)
        res.columns = ["r1", "r2", "n"]
        return res.groupby(["r1", "r2"], as_index=False)["n"].sum()

    raw = hash_aggregate(
        partitioned_group_map(tagged, "b", cross_per_mid,
                              num_partitions, adaptive=True),
        ["r1", "r2"], [("n", "sum", "n_raw")],
        num_partitions=num_partitions)

    # a = c correction: r1(a,b) ∧ r2(b,a) instances, keyed on (b, a)
    back = broadcast_join(
        e.map_batches(lambda t: pa.table(
            {"b": t["c"], "aa": t["a"], "r1": t["r"]}),
            batch_format="pyarrow"),
        e.map_batches(lambda t: pa.table(
            {"b": t["a"], "aa": t["c"], "r2": t["r"]}),
            batch_format="pyarrow"),
        on=("b", "aa"), num_partitions=num_partitions)
    corr = hash_aggregate(back, ["r1", "r2"],
                          [(None, "count", "n_corr")],
                          num_partitions=num_partitions).materialize()

    if corr.count() == 0:
        # no a=c back-paths anywhere (an empty side breaks the join)
        sup = raw.map_batches(
            lambda t: pa.table({
                "r1": t["r1"], "r2": t["r2"], "n_paths": t["n_raw"],
            }),
            batch_format="pyarrow")
    else:
        sup = broadcast_join(raw, corr, on=("r1", "r2"),
                             join_type="left_outer",
                             num_partitions=num_partitions)
        sup = sup.map_batches(
            lambda t: pa.table({
                "r1": t["r1"], "r2": t["r2"],
                "n_paths": pc.subtract(t["n_raw"],
                                       pc.fill_null(t["n_corr"], 0)),
            }),
            batch_format="pyarrow")
    top = sup.sort(["n_paths", "r1", "r2"],
                   descending=[True, False, False]).limit(k).materialize()
    rules = top.take_all()
    if not rules:
        return ray.data.from_arrow(pa.table({
            "r1": pa.array([], pa.string()),
            "r2": pa.array([], pa.string()),
            "r3": pa.array([], pa.string()),
            "n_paths": pa.array([], pa.int64()),
            "n_closed": pa.array([], pa.int64()),
            "conf_scaled": pa.array([], pa.int64()),
        }))
    r1set = {r["r1"] for r in rules}
    r2set = {r["r2"] for r in rules}
    support = {(r["r1"], r["r2"]): r["n_paths"] for r in rules}

    # FUSED closure: wedge join + a!=c filter + closure join + partial
    # counts all inside ONE map stage per left block — the hub-
    # quadratic wedge set (1e8 typed rows from 8e4 edges at sf0.1)
    # lives only inside each task's Acero pipeline and never crosses
    # an operator boundary.  Relation types are dictionary-encoded to
    # ONE int64 code per (r1, r2, r3) triple so the per-task fold is a
    # single ``np.bincount`` and the exchange carries (code, n) int
    # partials instead of 3 string columns (measured ~4x vs the staged
    # string-keyed joins at sf0.1).
    import numpy as np

    rvoc = sorted(r["r"] for r in hash_aggregate(
        e.select_columns(["r"]), "r", [(None, "count", "_m")],
        num_partitions=num_partitions).take_all())
    nrel = len(rvoc)
    voc_arr = pa.array(rvoc, pa.string())
    if nrel ** 3 > (1 << 26):
        raise RuntimeError(
            f"rule_mining closure code space {nrel}^3 exceeds the "
            "bincount bound — shard the relation vocabulary first")

    def enc(col):
        return pc.cast(pc.index_in(col, value_set=voc_arr), pa.int64())

    left = e.map_batches(
        lambda t, _s=sorted(r1set): pa.table(
            {"b": t["c"], "aa": t["a"], "i1": enc(t["r"])}).filter(
            pc.is_in(t["r"], pa.array(_s, pa.string()))),
        batch_format="pyarrow")

    def _pin(ds, names):
        # empty Ray blocks carry an EMPTY schema; drop them before the
        # concat (broadcast_join's _concat does the same)
        tbls = [t for t in ray.get(ds.materialize().to_arrow_refs())
                if t.num_rows and t.schema.names]
        if not tbls:
            return pa.table({n: pa.array([], pa.int64())
                             for n in names})
        return pa.concat_tables(tbls).select(
            list(names)).combine_chunks()

    right_ref = ray.put(_pin(e.map_batches(
        lambda t, _s=sorted(r2set): pa.table(
            {"b": t["a"], "cc": t["c"], "i2": enc(t["r"])}).filter(
            pc.is_in(t["r"], pa.array(_s, pa.string()))),
        batch_format="pyarrow"), ("b", "cc", "i2")))
    e3_ref = ray.put(_pin(e.map_batches(
        lambda t: pa.table(
            {"aa": t["a"], "cc": t["c"], "i3": enc(t["r"])}),
        batch_format="pyarrow"), ("aa", "cc", "i3")))

    def close_batch(t: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        e3 = ray.get(e3_ref)
        w = t.join(r, keys=["b"])
        w = w.filter(pc.not_equal(w["aa"], w["cc"]))
        c = w.select(["i1", "i2", "aa", "cc"]).join(
            e3, keys=["aa", "cc"], join_type="inner")
        code = ((c["i1"].to_numpy(zero_copy_only=False) * nrel
                 + c["i2"].to_numpy(zero_copy_only=False)) * nrel
                + c["i3"].to_numpy(zero_copy_only=False))
        cnt = np.bincount(code, minlength=nrel ** 3)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "code": pa.array(nz.astype(np.int64), pa.int64()),
            "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
        })

    cagg = hash_aggregate(
        left.map_batches(close_batch, batch_format="pyarrow",
                         batch_size=None),
        "code", [("n", "sum", "n_closed")],
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        code = t["code"].to_numpy(zero_copy_only=False)
        i3 = code % nrel
        i2 = (code // nrel) % nrel
        i1 = code // (nrel * nrel)
        r1 = [rvoc[i] for i in i1]
        r2 = [rvoc[i] for i in i2]
        keep = [i for i, (x, y) in enumerate(zip(r1, r2))
                if (x, y) in support]
        idx = pa.array(keep, type=pa.int64())
        paths = np.array([support[(r1[i], r2[i])] for i in keep],
                         dtype=np.int64)
        ncl = t["n_closed"].take(idx).to_numpy(zero_copy_only=False)
        return pa.table({
            "r1": pa.array([r1[i] for i in keep], pa.string()),
            "r2": pa.array([r2[i] for i in keep], pa.string()),
            "r3": pa.array([rvoc[i3[i]] for i in keep], pa.string()),
            "n_paths": pa.array(paths, pa.int64()),
            "n_closed": pa.array(ncl, pa.int64()),
            "conf_scaled": pa.array(
                ncl * scale // np.maximum(paths, 1), pa.int64()),
        })

    return cagg.map_batches(finish, batch_format="pyarrow")


def rule_mining_reference(typed_edges, k: int = RULE_TOPK,
                          scale: int = RULE_SCALE) -> set:
    """Pure-Python replay (test oracle): typed_edges = (a, r, c)."""
    es = {(a, r, c) for a, r, c in typed_edges if a != c}
    from collections import Counter

    sup: Counter = Counter()
    for a1, r1, b1 in es:
        for a2, r2, c2 in es:
            if a2 == b1 and c2 != a1:
                sup[(r1, r2)] += 1
    top = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    support = dict(top)
    closed: Counter = Counter()
    for a1, r1, b1 in es:
        for a2, r2, c2 in es:
            if a2 != b1 or c2 == a1:
                continue
            if (r1, r2) not in support:
                continue
            for a3, r3, c3 in es:
                if a3 == a1 and c3 == c2:
                    closed[(r1, r2, r3)] += 1
    return {(r1, r2, r3, support[(r1, r2)], n,
             n * scale // max(support[(r1, r2)], 1))
            for (r1, r2, r3), n in closed.items()}


# --- community supergraph (graph coarsening) -------------------------------------

def community_supergraph(
    edges: "ray.data.Dataset",
    rounds: int = 4,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Coarsen the entity graph to its label-propagation communities:
    one row per (community_a ≤ community_b) pair with the number of
    distinct underlying edges — intra-community rows carry the
    internal edge count, inter rows the cut size.  The multilevel
    view (Louvain's aggregation step; METIS coarsening) that makes a
    10^9-node graph browsable.

    Composition: :func:`label_prop_communities` labels (node-sided),
    two broadcast probes stamp each distinct undirected edge with its
    endpoint communities, one hash aggregate counts — no new exchange
    primitives.  Returns ``(community_a, community_b, n_edges)``.
    """
    comm = label_prop_communities(
        edges, rounds=rounds, src_col=src_col, dst_col=dst_col,
        num_partitions=num_partitions)

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    j = broadcast_join(e, comm.map_batches(
        lambda t: pa.table({"lo": t["entity_id"], "ca": t["community"]}),
        batch_format="pyarrow"), on=("lo",),
        num_partitions=num_partitions)
    j = broadcast_join(j, comm.map_batches(
        lambda t: pa.table({"hi": t["entity_id"], "cb": t["community"]}),
        batch_format="pyarrow"), on=("hi",),
        num_partitions=num_partitions)

    def pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "community_a": pc.min_element_wise(t["ca"], t["cb"]),
            "community_b": pc.max_element_wise(t["ca"], t["cb"]),
        })

    return hash_aggregate(
        j.map_batches(pairs, batch_format="pyarrow"),
        ["community_a", "community_b"], [(None, "count", "n_edges")],
        num_partitions=num_partitions)


# --- per-edge triangle support (k-truss foundation) ------------------------------

def edge_triangle_support(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Per-EDGE triangle support over the undirected distinct graph —
    the quantity k-truss peels on and the strongest simple signal for
    "is this edge corroborated by the neighborhood or a stray
    extraction?".  Each triangle (apex, a, b) from the shared
    degree-ordered pass credits its three canonical edges; one hash
    aggregate counts.  Returns ``(entity_a, entity_b, support)`` for
    edges in at least one triangle.
    """
    hits = _triangle_hits(edges, src_col, dst_col, num_partitions)

    def tri_edges(t: pa.Table) -> pa.Table:
        def arr(x):
            return x.combine_chunks() if isinstance(
                x, pa.ChunkedArray) else x

        ap, a, b = (arr(t["apex"]), arr(t["a"]), arr(t["b"]))
        lo = pa.concat_arrays([
            arr(pc.min_element_wise(ap, a)),
            arr(pc.min_element_wise(ap, b)),
            a,
        ])
        hi = pa.concat_arrays([
            arr(pc.max_element_wise(ap, a)),
            arr(pc.max_element_wise(ap, b)),
            b,
        ])
        return pa.table({"lo": lo, "hi": hi})

    agg = hash_aggregate(
        hits.map_batches(tri_edges, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "support")],
        num_partitions=num_partitions)
    return agg.map_batches(
        lambda t: pa.table({"entity_a": t["lo"], "entity_b": t["hi"],
                            "support": t["support"]}),
        batch_format="pyarrow")


def edge_triangle_support_reference(edge_pairs) -> dict:
    """Pure-Python replay: per canonical edge the number of common
    neighbors (test oracle)."""
    adj: dict = {}
    es = set()
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        es.add((min(a, b), max(a, b)))
    out = {}
    for lo, hi in es:
        n = len(adj[lo] & adj[hi])
        if n:
            out[(lo, hi)] = n
    return out


# --- shortest path between two entities ------------------------------------------

def shortest_path_between(
    edges: "ray.data.Dataset",
    source: int,
    target: int,
    max_rounds: int = 8,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "pa.Table":
    """One shortest path from ``source`` to ``target`` over the
    undirected distinct graph — the "how are X and Y related" query a
    KG explorer serves (the reference's Neo4j would run
    ``shortestPath``).  Deterministic: every node reached at level l
    records the MINIMUM-id level-(l−1) neighbor as parent, so the
    reconstructed path is unique regardless of partitioning (what lets
    the unrolled SQL replay hash-match).

    Forward BFS is the bfs_distances loop plus a min-parent aggregate;
    reconstruction walks ≤ ``max_rounds`` parents through per-level
    filter+take probes of the (node-sided) level tables.  Returns
    ``(step, entity_id)`` rows from source (step 0) to target, empty
    if not reached within ``max_rounds``.
    """
    import numpy as np

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    empty = pa.table({"step": pa.array([], pa.int64()),
                      "entity_id": pa.array([], pa.int64())})
    frontier = ray.data.from_arrow(pa.table({
        "node": pa.array([source], pa.int64()),
    })).materialize()
    levels = [ray.data.from_arrow(pa.table({
        "node": pa.array([source], pa.int64()),
        "parent": pa.array([None], pa.int64()),
    })).materialize()]
    seen = frontier.materialize()
    reached = source == target
    rounds = 0
    while not reached and rounds < max_rounds:
        rounds += 1
        hop = broadcast_join(bo, frontier, on=("node",),
                             num_partitions=num_partitions)
        cand = hash_aggregate(
            hop.map_batches(
                lambda t: pa.table({"node": t["peer"],
                                    "parent": t["node"]}),
                batch_format="pyarrow"),
            "node", [("parent", "min", "parent")],
            num_partitions=num_partitions)
        mark = seen.map_batches(
            lambda t: t.append_column(
                "_seen", pa.array(np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")
        nxt = broadcast_join(cand, mark, on=("node",),
                             join_type="left_outer",
                             num_partitions=num_partitions)
        lvl = nxt.map_batches(
            lambda t: pa.table({
                "node": t.filter(pc.is_null(t["_seen"]))["node"],
                "parent": t.filter(pc.is_null(t["_seen"]))["parent"],
            }),
            batch_format="pyarrow").materialize()
        if lvl.count() == 0:
            return empty
        levels.append(lvl)
        frontier = lvl.select_columns(["node"]).materialize()
        seen = seen.union(frontier).materialize()
        hit = lvl.map_batches(
            lambda t, _t=target: t.filter(pc.equal(t["node"], _t)),
            batch_format="pyarrow").take_all()
        reached = bool(hit)

    if not reached:
        return empty

    # walk parents backward; each probe filters ONE level table
    path = [target]
    for lvl_idx in range(len(levels) - 1, 0, -1):
        cur = path[-1]
        row = levels[lvl_idx].map_batches(
            lambda t, _c=cur: t.filter(pc.equal(t["node"], _c)),
            batch_format="pyarrow").take_all()
        if not row:
            # current node was reached at an earlier level; skip
            continue
        path.append(int(row[0]["parent"]))
    path.reverse()
    assert path[0] == source
    return pa.table({
        "step": pa.array(list(range(len(path))), pa.int64()),
        "entity_id": pa.array(path, pa.int64()),
    })


def shortest_path_reference(edge_pairs, source: int, target: int,
                            max_rounds: int = 8) -> list:
    """Pure-Python replay of the min-parent BFS path (test oracle)."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if source == target:
        return [(0, source)]
    parent = {source: None}
    frontier = [source]
    dist = {source: 0}
    for _ in range(max_rounds):
        nxt: dict = {}
        for u in sorted(frontier):
            for v in adj.get(u, ()):
                if v not in dist and (v not in nxt or u < nxt[v]):
                    nxt[v] = u
        if not nxt:
            return []
        for v, p in nxt.items():
            parent[v] = p
            dist[v] = dist[p] + 1
        frontier = list(nxt)
        if target in dist:
            break
    if target not in dist:
        return []
    path = [target]
    while parent[path[-1]] is not None:
        path.append(parent[path[-1]])
    path.reverse()
    return list(enumerate(path))


# --- distant supervision ----------------------------------------------------------

#: per-document distinct-entity ceiling for pair generation: a
#: pathological page mentioning 10k entities would otherwise emit 10^8
#: ordered pairs inside one partition.  Real documents are bounded by
#: length (sf-corpus max is ~2 orders of magnitude below this), so the
#: cap never fires on normal data; when it does, the doc's entity list
#: is truncated to the ``DS_DOC_ENTITY_CAP`` lowest entity_ids
#: (deterministic) and the drop is LOGGED (no silent cap — the
#: ``_make_pairs_partition`` pattern, extras/dedup.py:163-204).
DS_DOC_ENTITY_CAP = 2000


def _ds_pairgen_partition(doc_entity_cap: int):
    """Doc-keyed partition body: ordered mention pairs per doc, with
    the per-doc distinct-entity cap applied BEFORE the self-merge so a
    pathological doc never materializes its quadratic pair set."""

    def pairgen(df):
        import logging

        import pandas as pd

        uniq = df.drop_duplicates(["doc_id", "entity_id"])
        sizes = uniq.groupby("doc_id", sort=False)["entity_id"].transform(
            "size")
        if (sizes > doc_entity_cap).any():
            over = uniq.loc[sizes > doc_entity_cap, "doc_id"].nunique()
            logging.getLogger(__name__).warning(
                "distant_supervision: %d doc(s) exceeded "
                "doc_entity_cap=%d; pair generation truncated to the "
                "cap lowest entity_ids per doc", over, doc_entity_cap,
            )
            uniq = (uniq.sort_values(["doc_id", "entity_id"])
                    .groupby("doc_id", sort=False).head(doc_entity_cap))
        m = uniq.merge(uniq, on="doc_id")
        m = m[m["entity_id_x"] != m["entity_id_y"]]
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype(str),
            "src_id": m["entity_id_x"].astype("int64"),
            "dst_id": m["entity_id_y"].astype("int64"),
        })

    return pairgen


def distant_supervision(
    mentions: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    triples: "ray.data.Dataset",
    num_partitions: "int | None" = None,
    doc_entity_cap: int = DS_DOC_ENTITY_CAP,
) -> "ray.data.Dataset":
    """Distant-supervision examples for relation-extraction training
    (Mintz et al., ACL'09): for every KB edge ``(s, r, d)`` and every
    document that mentions BOTH s and d, one ``(doc_id, src_id,
    rel_type, dst_id, is_gold)`` row — ``is_gold=1`` iff the document
    is actual provenance of the edge, 0 for the silver matches the
    method exists to harvest (a doc mentioning both endpoints without
    asserting the triple).

    Shape: ordered mention pairs are generated inside doc-keyed
    partitions with one vectorized pandas self-merge per partition —
    the blowup is bounded by per-document distinct entities (document
    length), never corpus size.  The KB-pair filter and the gold
    marker ride broadcast_join's size gate (hash-join fallback at
    full scale), so nothing here assumes the KB fits in memory.
    """
    import pandas as pd  # noqa: F401  (partition body runs remote)

    pairs = partitioned_group_map(
        mentions.select_columns(["doc_id", "entity_id"]), "doc_id",
        _ds_pairgen_partition(doc_entity_cap),
        num_partitions=num_partitions)

    kb = hash_aggregate(
        edges.select_columns(["src_id", "rel_type", "dst_id"]),
        ["src_id", "rel_type", "dst_id"], [(None, "count", "_m")],
        num_partitions=num_partitions).drop_columns(["_m"])
    cand = broadcast_join(pairs, kb, on=("src_id", "dst_id"),
                          num_partitions=num_partitions)

    prov = hash_aggregate(
        triples.select_columns(["doc_id", "src_id", "rel_type", "dst_id"]),
        ["doc_id", "src_id", "rel_type", "dst_id"],
        [(None, "count", "_g")], num_partitions=num_partitions)
    labeled = broadcast_join(
        cand, prov, on=("doc_id", "src_id", "rel_type", "dst_id"),
        join_type="left_outer", num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "src_id": t["src_id"],
            "rel_type": t["rel_type"],
            "dst_id": t["dst_id"],
            "is_gold": pc.cast(pc.is_valid(t["_g"]), pa.int64()),
        })

    return labeled.map_batches(finish, batch_format="pyarrow")


# --- GraphSAGE-style ego-net sampling ---------------------------------------------

EGO_FANOUT = 8


def ego_net_sample(
    edges: "ray.data.Dataset",
    seeds: "list[int]",
    hops: int = 2,
    fanout: int = EGO_FANOUT,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """GNN training-data generation: per-seed bounded-fanout ego-net
    edge lists (the GraphSAGE neighborhood-sampling shape, Hamilton et
    al. NeurIPS'17) over the undirected distinct graph.  Deterministic
    sampling — each frontier node keeps its ``fanout`` LOWEST-id
    neighbors (no RNG, so a DuckDB ``row_number() OVER (ORDER BY
    peer)`` replay hash-matches) — expansion follows only the sampled
    neighbors, the SAGE semantics.

    Shape: the BFS is KEYED on (seed, node) — one pass per hop for ALL
    seeds, never a per-seed loop — so seed count scales like rows, not
    rounds.  Each hop: one streaming probe of the edge table against
    the (small, fanout-bounded) frontier, a per-(seed, node) head
    inside doc-keyed partitions, and a seen-set anti-join.  Frontier
    size is ≤ seeds · fanout^hop by construction.  Returns
    ``(seed_id, hop, src_id, dst_id)`` rows.
    """
    import pandas as pd  # noqa: F401

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = e.map_batches(both_dirs, batch_format="pyarrow").materialize()

    frontier = ray.data.from_arrow(pa.table({
        "seed_id": pa.array(sorted(set(seeds)), pa.int64()),
        "node": pa.array(sorted(set(seeds)), pa.int64()),
    })).materialize()
    seen = frontier.materialize()
    out = None
    for hop in range(1, hops + 1):
        cand = broadcast_join(bo, frontier, on=("node",),
                              num_partitions=num_partitions)

        def cap(df):
            g = df.sort_values(["seed_id", "node", "peer"]) \
                  .groupby(["seed_id", "node"], sort=False).head(fanout)
            return pd.DataFrame({
                "seed_id": g["seed_id"].astype("int64"),
                "node": g["node"].astype("int64"),
                "peer": g["peer"].astype("int64"),
            })

        capped = partitioned_group_map(
            cand.select_columns(["seed_id", "node", "peer"]),
            ["seed_id", "node"], cap,
            num_partitions=num_partitions).materialize()

        lvl = capped.map_batches(
            lambda t, _h=hop: pa.table({
                "seed_id": t["seed_id"],
                "hop": pa.array([_h] * t.num_rows, pa.int64()),
                "src_id": t["node"],
                "dst_id": t["peer"],
            }), batch_format="pyarrow")
        out = lvl if out is None else out.union(lvl)

        nxt = hash_aggregate(
            capped.map_batches(
                lambda t: pa.table({"seed_id": t["seed_id"],
                                    "node": t["peer"]}),
                batch_format="pyarrow"),
            ["seed_id", "node"], [(None, "count", "_m")],
            num_partitions=num_partitions).drop_columns(["_m"])
        mark = seen.map_batches(
            lambda t: t.append_column(
                "_seen", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow")
        fresh = broadcast_join(nxt, mark, on=("seed_id", "node"),
                               join_type="left_outer",
                               num_partitions=num_partitions)
        frontier = fresh.map_batches(
            lambda t: t.filter(pc.is_null(t["_seen"]))
                       .select(["seed_id", "node"]),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        seen = seen.union(frontier).materialize()
    return out


def ego_net_reference(edge_pairs, seeds, hops: int = 2,
                      fanout: int = EGO_FANOUT) -> set:
    """Pure-Python replay of the exact sampling semantics."""
    adj: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = set()
    frontier = {(s, s) for s in seeds}
    seen = set(frontier)
    for hop in range(1, hops + 1):
        nxt = set()
        for seed, node in frontier:
            for peer in sorted(adj.get(node, ()))[:fanout]:
                rows.add((seed, hop, node, peer))
                if (seed, peer) not in seen:
                    nxt.add((seed, peer))
        seen |= nxt
        frontier = nxt
        if not frontier:
            break
    return rows


# --- Weisfeiler-Leman role refinement ---------------------------------------

WL_M61 = 1 << 61          # label/message space (signed-int64 safe)
WL_P1 = 2147483647        # Mersenne primes for the multiset sums —
WL_P2 = 2147483629        # per-node partial sums stay far below 2^63


def _wl_fnv61(vals) -> "np.ndarray":
    """FNV-1a 64 of strings masked to 61 bits — shares the kernel (and
    the DuckDB ``list_reduce`` twin) with extras/profile.py."""
    import numpy as np

    from neo4j_document_pipeline_ray.extras.profile import _fnv_strings

    return (_fnv_strings(list(vals)) & np.uint64(WL_M61 - 1)).astype(np.int64)


def wl_roles(
    edges: "ray.data.Dataset",
    rounds: int = 2,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    rel_col: str = "rel_type",
) -> "ray.data.Dataset":
    """Weisfeiler-Leman structural-role refinement over the TYPED edge
    table — the 1-WL color refinement of graph-isomorphism testing
    (Weisfeiler & Leman 1968; Shervashidze et al., "Weisfeiler-Lehman
    Graph Kernels", JMLR 2011), which is also exactly the expressive
    ceiling of message-passing GNNs (Xu et al., ICLR 2019): after R
    rounds two nodes share a label iff their depth-R typed neighborhood
    trees agree, so the label histogram is the graph's WL fingerprint
    and per-node labels are role ids (entity-role clustering, GNN
    feature init, schema discovery).

    Determinism contract: the classic WL step hashes the SORTED
    multiset of neighbor messages — a per-node sequential fold.  This
    implementation replaces the sort with an ORDER-INDEPENDENT multiset
    signature, ``(count, Σ m mod P1, Σ h(m) mod P2, min m)``, folded
    into the node's previous label — every component is a commutative
    pyarrow aggregate, so the result is bit-identical under ANY
    partitioning and the whole refinement is DuckDB-replayable
    (colliding two distinct multisets needs simultaneous 31+31+61-bit
    coincidences).  All hashes live in [0, 2^61) (signed-int64 safe,
    HUGEINT-emulable); ``h`` is the splitmix chain shared with the ANF
    sketches (:func:`_nf_hash`).

    100-TB shape: per round, TWO E-sized streaming probes of the
    node-sided label table (size-gated broadcast, hash-join fallback)
    + ONE (node)-keyed aggregate of in-batch-derived message columns +
    one node-sided combine join.  Rounds are a constant; driver state
    is zero.  Returns per-node ``(entity_id, wl_label)``.
    """
    import numpy as np

    e = hash_aggregate(
        edges.select_columns([src_col, rel_col, dst_col]),
        [src_col, rel_col, dst_col], [(None, "count", "_m")],
    ).drop_columns(["_m"])

    def with_rel_hash(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": t[src_col],
            "d": t[dst_col],
            "hr": pa.array(
                _wl_fnv61(t[rel_col].to_pylist()), pa.int64()),
        })

    er = e.map_batches(with_rel_hash, batch_format="pyarrow").materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"entity_id": pa.concat_arrays([
            t["s"].combine_chunks(), t["d"].combine_chunks()])})

    nodes = hash_aggregate(
        er.map_batches(both_ends, batch_format="pyarrow"),
        "entity_id", [(None, "count", "_m")],
    ).drop_columns(["_m"]).materialize()

    labels = nodes.map_batches(
        lambda t: t.append_column(
            "lbl", pa.array([0] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )

    m61 = np.uint64(WL_M61)

    def msg_cols(t: pa.Table, direction: int, out_col: str) -> pa.Table:
        hr = t["hr"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lb = t["lbl"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # dir + 3·hr + 5·lbl < 2^64 (all operands < 2^61): no wrap
        pre = (np.uint64(direction) + np.uint64(3) * hr
               + np.uint64(5) * lb) % m61
        m = _nf_hash(pre.astype(np.int64))
        return pa.table({
            "node": t[out_col],
            "m": pa.array(m, pa.int64()),
            "m1": pa.array(m % WL_P1, pa.int64()),
            "m2": pa.array(_nf_hash(m) % WL_P2, pa.int64()),
        })

    for _ in range(rounds):
        # E-sized probes: neighbor label rides the edge both directions
        to_src = broadcast_join(er, labels, on=("d",),
                                right_on=("entity_id",)).map_batches(
            lambda t: msg_cols(t, 1, "s"), batch_format="pyarrow")
        to_dst = broadcast_join(er, labels, on=("s",),
                                right_on=("entity_id",)).map_batches(
            lambda t: msg_cols(t, 2, "d"), batch_format="pyarrow")
        agg = hash_aggregate(
            to_src.union(to_dst), "node",
            [(None, "count", "n"), ("m1", "sum", "s1"),
             ("m2", "sum", "s2"), ("m", "min", "mn")],
        )
        joined = broadcast_join(agg, labels, on=("node",),
                                right_on=("entity_id",))

        def combine(t: pa.Table) -> pa.Table:
            lb = t["lbl"].to_numpy(zero_copy_only=False).astype(np.uint64)
            s1 = t["s1"].to_numpy(zero_copy_only=False).astype(np.uint64)
            s2 = t["s2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mn = t["mn"].to_numpy(zero_copy_only=False).astype(np.uint64)
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pre = ((np.uint64(7) * lb) % m61
                   + (np.uint64(3) * (s1 % np.uint64(WL_P1))) % m61
                   + (np.uint64(5) * (s2 % np.uint64(WL_P2))) % m61
                   + (np.uint64(11) * mn) % m61
                   + n) % m61  # 5 addends < 2^61 each: sum < 2^64
            return pa.table({
                "entity_id": t["node"],
                "lbl": pa.array(_nf_hash(pre.astype(np.int64)), pa.int64()),
            })

        labels = joined.map_batches(
            combine, batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda t: t.rename_columns(["entity_id", "wl_label"]),
        batch_format="pyarrow")


def wl_roles_histogram(edges: "ray.data.Dataset",
                       rounds: int = 2) -> "ray.data.Dataset":
    """(wl_label, n_nodes) WL fingerprint of the graph, largest roles
    first — the comparable-across-snapshots summary."""
    per_node = wl_roles(edges, rounds=rounds)
    h = hash_aggregate(per_node, "wl_label", [(None, "count", "n_nodes")])
    return h.sort(["n_nodes", "wl_label"], descending=[True, False])


def wl_roles_reference(typed_edges, rounds: int = 2) -> dict:
    """Pure-Python replay of :func:`wl_roles` over (src, rel, dst)
    tuples — same hashes, same multiset signature, same fold."""
    def nf(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) % (1 << 64)
        z ^= z >> 30
        z = (z * 0x3C79AC492BA7B653) % (1 << 64)
        z ^= z >> 27
        z = (z * 0x1C69B3F74AC4AE35) % (1 << 64)
        z ^= z >> 31
        return z % WL_M61

    def fnv61(s: str) -> int:
        h = 14695981039346656037
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return h % WL_M61

    ee = {(s, r, d) for s, r, d in typed_edges}
    nodes = {s for s, _, _ in ee} | {d for _, _, d in ee}
    lbl = {v: 0 for v in nodes}
    for _ in range(rounds):
        msgs = {v: [] for v in nodes}
        for s, r, d in ee:
            hr = fnv61(r)
            msgs[s].append(nf((1 + 3 * hr + 5 * lbl[d]) % WL_M61))
            msgs[d].append(nf((2 + 3 * hr + 5 * lbl[s]) % WL_M61))
        new = {}
        for v in nodes:
            ms = msgs[v]
            s1 = sum(m % WL_P1 for m in ms) % WL_P1
            s2 = sum(nf(m) % WL_P2 for m in ms) % WL_P2
            pre = ((7 * lbl[v]) % WL_M61 + (3 * s1) % WL_M61
                   + (5 * s2) % WL_M61 + (11 * min(ms)) % WL_M61
                   + len(ms)) % WL_M61
            new[v] = nf(pre)
        lbl = new
    return lbl


# --- strongly connected components -------------------------------------------


def strongly_connected_components(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_outer: int = 16,
    max_prop: int = 48,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Strongly connected components of the DIRECTED distinct edge set
    (Neo4j GDS ``scc`` analog; :func:`kg components <label_prop_communities>`
    is the weakly-connected view — this one respects edge direction,
    the bowtie decomposition a web/citation KG audit needs: the
    reference's Neo4j store answers it with ``gds.scc``, no pipeline
    counterpart exists there).

    Label-refinement algorithm (the FW-BW family, Orzan-style, made
    deterministic): per outer round compute for every active node

    * ``f(v)`` = min id among nodes that REACH v (forward min-label
      propagation to fixpoint), and
    * ``b(v)`` = min id REACHABLE from v (backward propagation),

    both seeded ``f = b = v``.  Every node of an SCC shares the same
    ``(f, b)`` pair (mutual reachability), so the pair partitions
    nodes without ever splitting an SCC; a class with ``f == b == m``
    is EXACTLY the SCC of ``m`` (``m`` reaches every member and every
    member reaches ``m``) and is assigned ``scc_id = m``.  Surviving
    edges are only those whose endpoints share the full ``(f, b)``
    pair — cross-class edges can never be intra-SCC, and edges
    touching an assigned node drop automatically (its pair has
    ``f == b``).  Every class assigns at least its min node per round,
    and for hash-distributed ids (``stable_id`` outputs) refinement
    splits at record positions, so the expected outer-round count is
    O(log V); ``max_outer`` is a guarded cap, not a truncation — the
    operator RAISES if the graph hasn't emptied (same contract as a
    shuffle that runs out of disk, never a silently-wrong answer).

    Scale shape: state is one edge table (only ever shrinks) and one
    node-sided label table; per propagation round ONE E-sized
    streaming probe of the node-sided label table (rides
    :func:`broadcast_join`'s size gate) + one node-keyed min
    aggregate; fixpoint detected by an unchanged (count, sum) scalar
    pair (labels only decrease).  No global sort, no driver-side data
    path, no all-pairs product.  Propagation rounds are bounded by the
    active subgraph's directed diameter — the same small-world
    assumption :func:`bfs_distances` and the k-hop layer already make.

    Returns ``(entity_id, scc_id)`` with ``scc_id`` = min entity id of
    the component — singletons (the DAG part of the bowtie) map to
    themselves.
    """
    def pairs(t: pa.Table) -> pa.Table:
        return pa.table({"s": t[src_col], "d": t[dst_col]})

    e0 = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(pairs, batch_format="pyarrow"),
        ["s", "d"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"])

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["s"].combine_chunks(), t["d"].combine_chunks()])})

    active = hash_aggregate(
        e0.map_batches(endpoints, batch_format="pyarrow"),
        "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    # self-loops never change SCC membership; drop them from the
    # traversal (their nodes stay in the active set via e0 endpoints)
    e = e0.map_batches(
        lambda t: t.filter(pc.not_equal(t["s"], t["d"])),
        batch_format="pyarrow").materialize()

    def _fingerprint(lab: "ray.data.Dataset", col: str) -> tuple:
        def p(t: pa.Table) -> pa.Table:
            s = pc.sum(t[col]).as_py()
            return pa.table({
                "_k": pa.array([1], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([0 if s is None else s], pa.int64()),
            })

        r = hash_aggregate(
            lab.map_batches(p, batch_format="pyarrow"),
            "_k", [("n", "sum", "n"), ("s", "sum", "s")],
            num_partitions=1,
        ).take_all()
        return (r[0]["n"], r[0]["s"]) if r else (0, 0)

    def _min_prop(edge_ds, key_col: str, out_col: str, lab_col: str):
        """Propagate min label along ``key_col -> out_col`` edges to
        the fixpoint: f-mode uses (s -> d), b-mode the reverse."""
        lab = active.map_batches(
            lambda t, _c=lab_col: pa.table({
                "entity_id": t["node"], _c: t["node"]}),
            batch_format="pyarrow").materialize()
        fp = _fingerprint(lab, lab_col)
        for _ in range(max_prop):
            hop = broadcast_join(
                edge_ds, lab, on=(key_col,), right_on=("entity_id",),
                num_partitions=num_partitions)
            cand = hop.map_batches(
                lambda t, _o=out_col, _c=lab_col: pa.table({
                    "entity_id": t[_o], _c: t[_c]}),
                batch_format="pyarrow")
            lab = hash_aggregate(
                lab.union(cand), "entity_id",
                [(lab_col, "min", lab_col)],
                num_partitions=num_partitions,
            ).materialize()
            nfp = _fingerprint(lab, lab_col)
            if nfp == fp:
                return lab
            fp = nfp
        raise RuntimeError(
            f"SCC label propagation did not reach a fixpoint in "
            f"{max_prop} rounds (directed diameter exceeds the bound)")

    assigned: list = []
    for _ in range(max_outer):
        if active.count() == 0:
            break
        if e.count() == 0:
            assigned.append(active.map_batches(
                lambda t: pa.table({
                    "entity_id": t["node"], "scc_id": t["node"]}),
                batch_format="pyarrow").materialize())
            active = ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64())})).materialize()
            break
        f = _min_prop(e, "s", "d", "f")
        b = _min_prop(e, "d", "s", "b")
        lab = broadcast_join(
            f, b, on=("entity_id",), num_partitions=num_partitions,
        ).materialize()
        done = lab.map_batches(
            lambda t: pa.table({
                "entity_id": t.filter(
                    pc.equal(t["f"], t["b"]))["entity_id"],
                "scc_id": t.filter(pc.equal(t["f"], t["b"]))["f"],
            }),
            batch_format="pyarrow").materialize()
        assigned.append(done)
        rem = lab.map_batches(
            lambda t: t.filter(pc.not_equal(t["f"], t["b"])),
            batch_format="pyarrow").materialize()
        if rem.count() == 0:
            active = ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64())})).materialize()
            break
        active = rem.map_batches(
            lambda t: pa.table({"node": t["entity_id"]}),
            batch_format="pyarrow").materialize()
        # keep only edges whose endpoints share the FULL (f, b) pair;
        # edges into assigned nodes (f == b) vanish with them
        es = broadcast_join(
            e, rem.map_batches(
                lambda t: pa.table({
                    "s": t["entity_id"], "sf": t["f"], "sb": t["b"]}),
                batch_format="pyarrow"),
            on=("s",), num_partitions=num_partitions)
        ed = broadcast_join(
            es, rem.map_batches(
                lambda t: pa.table({
                    "d": t["entity_id"], "df": t["f"], "db": t["b"]}),
                batch_format="pyarrow"),
            on=("d",), num_partitions=num_partitions)
        e = ed.map_batches(
            lambda t: t.filter(pc.and_(
                pc.equal(t["sf"], t["df"]),
                pc.equal(t["sb"], t["db"]))).select(["s", "d"]),
            batch_format="pyarrow").materialize()
    if active.count() != 0:
        raise RuntimeError(
            f"SCC refinement did not converge in {max_outer} outer "
            f"rounds ({active.count()} nodes unassigned)")
    if not assigned:
        return ray.data.from_arrow(pa.table({
            "entity_id": pa.array([], pa.int64()),
            "scc_id": pa.array([], pa.int64()),
        }))
    out = assigned[0]
    for a in assigned[1:]:
        out = out.union(a)
    return out


def scc_reference(edge_pairs) -> dict:
    """Pure-Python SCC replay (test oracle): iterative Kosaraju;
    node -> min node id of its strongly connected component."""
    fwd: dict = {}
    bwd: dict = {}
    nodes = set()
    for a, b in edge_pairs:
        nodes.add(a)
        nodes.add(b)
        if a == b:
            continue
        fwd.setdefault(a, []).append(b)
        bwd.setdefault(b, []).append(a)
    order: list = []
    seen: set = set()
    for root in nodes:
        if root in seen:
            continue
        stack = [(root, iter(fwd.get(root, ())))]
        seen.add(root)
        while stack:
            v, it = stack[-1]
            nxt = next((w for w in it if w not in seen), None)
            if nxt is None:
                order.append(v)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(fwd.get(nxt, ()))))
    comp: dict = {}
    for root in reversed(order):
        if root in comp:
            continue
        members = [root]
        comp[root] = root
        stack = [root]
        while stack:
            v = stack.pop()
            for w in bwd.get(v, ()):
                if w not in comp:
                    comp[w] = root
                    members.append(w)
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


# --- structural profile (reciprocity + assortativity) -------------------------

ASSORT_SCALE = 10**6


def structural_profile(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    scale: int = ASSORT_SCALE,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """One-row structural audit of the KG: reciprocity and degree
    assortativity (the two numbers a graph-shape report leads with —
    Neo4j answers them with ad-hoc Cypher over the store; here they
    are one streaming pass each).

    * ``n_reciprocal`` / ``reciprocity_scaled`` — directed distinct
      edges whose reverse also exists (A cites B and B cites A), as a
      count and a scaled fraction of the distinct directed edge set.
      Computed WITHOUT a self-join: the canonical ``(lo, hi)``
      aggregate's count is 2 exactly for reciprocal pairs (the input
      is distinct), so one exchange answers it.
    * ``assortativity_scaled`` — Newman's degree assortativity over
      the undirected distinct graph, exact in integer math: summing
      over BOTH orientations of every edge makes the two marginal
      moment sets identical (``Sx == Sy``, ``Sxx == Syy``), so
      Pearson's r collapses to ``(M*Sxy - Sx^2) / (M*Sxx - Sx^2)`` —
      rational, no square root, bit-stable under any partitioning.
      Scaled by ``scale`` with sign-magnitude truncation (mirrors
      DuckDB's ``//``).  0 when the variance term is 0 (regular
      graph).

    Scale shape: degree table node-sided; moments are per-batch int64
    partials over the E-sized ordered-pair stream (two size-gated
    broadcast joins of the degree table) folded into ONE row; the
    final division runs driver-side on six scalars in arbitrary-
    precision Python ints.  Int64 partial-sum bound: requires
    ``sum(deg_i^2) < 2^63`` over the corpus (RMS degree ~3e4 at 1e10
    edges) — beyond that, promote the moment columns to per-batch
    Python-int folds.
    """
    def pairs(t: pa.Table) -> pa.Table:
        return pa.table({"s": t[src_col], "d": t[dst_col]})

    e0 = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(pairs, batch_format="pyarrow"),
        ["s", "d"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    def nn_part(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t["s"].combine_chunks(), t["d"].combine_chunks()])})

    n_nodes = hash_aggregate(
        e0.map_batches(nn_part, batch_format="pyarrow"),
        "node", [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).count()

    dd = e0.map_batches(
        lambda t: t.filter(pc.not_equal(t["s"], t["d"])),
        batch_format="pyarrow").materialize()
    n_directed = dd.count()

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": pc.min_element_wise(t["s"], t["d"]),
            "hi": pc.max_element_wise(t["s"], t["d"]),
        })

    und = hash_aggregate(
        dd.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "c")],
        num_partitions=num_partitions,
    ).materialize()
    n_undirected = und.count()

    def rec_part(t: pa.Table) -> pa.Table:
        r = pc.sum(pc.if_else(pc.equal(t["c"], 2), 2, 0)).as_py()
        return pa.table({
            "_k": pa.array([1], pa.int64()),
            "r": pa.array([0 if r is None else r], pa.int64()),
        })

    rr = hash_aggregate(
        und.map_batches(rec_part, batch_format="pyarrow"),
        "_k", [("r", "sum", "r")], num_partitions=1,
    ).take_all()
    n_reciprocal = int(rr[0]["r"]) if rr else 0

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t["lo"].combine_chunks(), t["hi"].combine_chunks()]),
            "peer": pa.concat_arrays([
                t["hi"].combine_chunks(), t["lo"].combine_chunks()]),
        })

    bo = und.map_batches(
        lambda t: both_dirs(t.select(["lo", "hi"])),
        batch_format="pyarrow").materialize()

    deg = hash_aggregate(
        bo.select_columns(["node"]), "node", [(None, "count", "deg")],
        num_partitions=num_partitions,
    ).materialize()

    m, sx, sxx, sxy = 0, 0, 0, 0
    if n_undirected:
        j1 = broadcast_join(bo, deg, on=("node",),
                            num_partitions=num_partitions)
        j2 = broadcast_join(
            j1, deg.map_batches(
                lambda t: pa.table({
                    "peer": t["node"], "pdeg": t["deg"]}),
                batch_format="pyarrow"),
            on=("peer",), num_partitions=num_partitions)

        def mom_part(t: pa.Table) -> pa.Table:
            x = t["deg"]
            y = t["pdeg"]
            return pa.table({
                "_k": pa.array([1], pa.int64()),
                "m": pa.array([t.num_rows], pa.int64()),
                "sx": pa.array([pc.sum(x).as_py() or 0], pa.int64()),
                "sxx": pa.array(
                    [pc.sum(pc.multiply(x, x)).as_py() or 0],
                    pa.int64()),
                "sxy": pa.array(
                    [pc.sum(pc.multiply(x, y)).as_py() or 0],
                    pa.int64()),
            })

        mm = hash_aggregate(
            j2.map_batches(mom_part, batch_format="pyarrow"),
            "_k", [("m", "sum", "m"), ("sx", "sum", "sx"),
                   ("sxx", "sum", "sxx"), ("sxy", "sum", "sxy")],
            num_partitions=1,
        ).take_all()
        if mm:
            m, sx = int(mm[0]["m"]), int(mm[0]["sx"])
            sxx, sxy = int(mm[0]["sxx"]), int(mm[0]["sxy"])

    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    if den == 0:
        assort = 0
    else:
        sign = 1 if num >= 0 else -1
        assort = sign * ((abs(num) * scale) // den)
    recip = (n_reciprocal * scale) // n_directed if n_directed else 0

    return ray.data.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_directed": pa.array([n_directed], pa.int64()),
        "n_undirected": pa.array([n_undirected], pa.int64()),
        "n_reciprocal": pa.array([n_reciprocal], pa.int64()),
        "reciprocity_scaled": pa.array([recip], pa.int64()),
        "assortativity_scaled": pa.array([assort], pa.int64()),
    }))


def structural_profile_reference(edge_pairs,
                                 scale: int = ASSORT_SCALE) -> dict:
    """Pure-Python replay of :func:`structural_profile`."""
    e0 = {(a, b) for a, b in edge_pairs}
    nodes = {a for a, _ in e0} | {b for _, b in e0}
    dd = {(a, b) for a, b in e0 if a != b}
    und: dict = {}
    for a, b in dd:
        und[(min(a, b), max(a, b))] = und.get((min(a, b), max(a, b)), 0) + 1
    n_rec = sum(2 for c in und.values() if c == 2)
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = sx = sxx = sxy = 0
    for a, b in und:
        for x, y in ((deg[a], deg[b]), (deg[b], deg[a])):
            m += 1
            sx += x
            sxx += x * x
            sxy += x * y
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    if den == 0:
        assort = 0
    else:
        sign = 1 if num >= 0 else -1
        assort = sign * ((abs(num) * scale) // den)
    return {
        "n_nodes": len(nodes),
        "n_directed": len(dd),
        "n_undirected": len(und),
        "n_reciprocal": n_rec,
        "reciprocity_scaled":
            (n_rec * scale) // len(dd) if dd else 0,
        "assortativity_scaled": assort,
    }


# --- k-truss (fixed K peeling) -------------------------------------------------

TRUSS_K = 4


def ktruss(
    edges: "ray.data.Dataset",
    k: int = TRUSS_K,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 32,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Edges of the K-truss of the undirected distinct graph (GDS
    ``kTruss`` analog, the edge-side twin of :func:`kcore <kcore>`):
    iteratively peel edges whose triangle support (common-neighbor
    count within the SURVIVING set) falls below ``k - 2`` until the
    set is stable.  The truss is the densest-cohesion edge subgraph a
    KG curation pass keeps when it wants only community-corroborated
    relations (every truss edge sits in ``k - 2`` triangles of other
    truss edges — far stronger than one-shot
    :func:`edge_triangle_support` filtering, which a single round of
    peeling can invalidate).

    Scale shape: each round is ONE degree-ordered triangle pass
    (:func:`_triangle_hits`' O(sqrt E) wedge bound) over the shrinking
    edge set + a left-outer support join; the edge set only shrinks,
    so round cost is monotone non-increasing.  Rounds are bounded by
    the peeling depth (3 at the sandbox corpus, small for web-shaped
    graphs); ``max_rounds`` is a guarded cap that RAISES rather than
    returning a half-peeled set.

    Returns ``(entity_a, entity_b, support)`` — canonical edge pairs
    of the K-truss with their within-truss support.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
        })

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    empty = pa.table({
        "entity_a": pa.array([], pa.int64()),
        "entity_b": pa.array([], pa.int64()),
        "support": pa.array([], pa.int64()),
    })
    n = e.count()
    for _ in range(max_rounds):
        if n == 0:
            return ray.data.from_arrow(empty)
        sup = edge_triangle_support(
            e, "lo", "hi", num_partitions=num_partitions).materialize()
        if sup.count() == 0:
            # no triangles at all: every edge peels (k >= 3), or the
            # whole set is trivially a truss with support 0 (k <= 2)
            if k <= 2:
                return e.map_batches(
                    lambda t: pa.table({
                        "entity_a": t["lo"], "entity_b": t["hi"],
                        "support": pa.array([0] * t.num_rows,
                                            pa.int64()),
                    }),
                    batch_format="pyarrow")
            return ray.data.from_arrow(empty)
        joined = broadcast_join(
            e, sup, on=("lo", "hi"), right_on=("entity_a", "entity_b"),
            join_type="left_outer", num_partitions=num_partitions)
        kept = joined.map_batches(
            lambda t, _k=k: t.filter(pc.greater_equal(
                pc.coalesce(t["support"],
                            pa.scalar(0, pa.int64())), _k - 2)),
            batch_format="pyarrow").materialize()
        kn = kept.count()
        if kn == n:
            return kept.map_batches(
                lambda t: pa.table({
                    "entity_a": t["lo"], "entity_b": t["hi"],
                    "support": pc.cast(t["support"], pa.int64()),
                }),
                batch_format="pyarrow")
        e = kept.select_columns(["lo", "hi"]).materialize()
        n = kn
    raise RuntimeError(
        f"k-truss peeling did not stabilize in {max_rounds} rounds")


def ktruss_reference(edge_pairs, k: int = TRUSS_K) -> dict:
    """Pure-Python peeling replay: canonical edge -> within-truss
    support for K-truss member edges."""
    es = {(min(a, b), max(a, b)) for a, b in edge_pairs if a != b}
    while True:
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
        drop = {e for e, s_ in sup.items() if s_ < k - 2}
        if not drop:
            return sup
        es -= drop


# --- bowtie decomposition -------------------------------------------------------


def bowtie_classes(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 64,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Broder bowtie decomposition of the directed KG (the web-graph
    structure report: giant SCC core, IN pages that reach it, OUT
    pages it reaches, everything else): per node one of ``SCC`` /
    ``IN`` / ``OUT`` / ``OTHER``.  ``OTHER`` folds tendrils, tubes and
    disconnected components (the standard coarse cut).  Deterministic:
    the core is the largest SCC (ties: min scc_id).

    Composition, not new machinery: one
    :func:`strongly_connected_components` pass, then two multi-seed
    directed frontier BFS sweeps from the core (forward = OUT,
    backward = IN), each round ONE E-sized streaming probe of the
    node-sided frontier + a visited anti-join — the
    :func:`bfs_distances` shape with direction respected.  A node both
    reaching and reached by the core would be IN the core (SCC
    maximality), so the classes are disjoint by construction.

    Returns ``(entity_id, bowtie)``.
    """
    scc = strongly_connected_components(
        edges, src_col=src_col, dst_col=dst_col,
        num_partitions=num_partitions).materialize()
    sizes = hash_aggregate(
        scc, "scc_id", [(None, "count", "n")],
        num_partitions=num_partitions)
    top = sizes.sort(["n", "scc_id"], descending=[True, False]).take(1)
    if not top:
        return ray.data.from_arrow(pa.table({
            "entity_id": pa.array([], pa.int64()),
            "bowtie": pa.array([], pa.string()),
        }))
    giant = int(top[0]["scc_id"])

    core = scc.map_batches(
        lambda t, _g=giant: pa.table({"entity_id": t.filter(
            pc.equal(t["scc_id"], _g))["entity_id"]}),
        batch_format="pyarrow").materialize()

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t[src_col], t[dst_col])
        return pa.table({"s": t[src_col].filter(keep),
                         "d": t[dst_col].filter(keep)})

    e = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(pairs, batch_format="pyarrow"),
        ["s", "d"], [(None, "count", "_m")],
        num_partitions=num_partitions,
    ).drop_columns(["_m"]).materialize()

    import numpy as np

    def _reach(in_col: str, out_col: str) -> "ray.data.Dataset":
        """Nodes reachable from the core along in_col -> out_col
        (excluding nodes only in the core), as (entity_id,)."""
        visited = core
        frontier = core
        for _ in range(max_rounds):
            if frontier.count() == 0 or e.count() == 0:
                break
            hop = broadcast_join(
                e, frontier, on=(in_col,), right_on=("entity_id",),
                num_partitions=num_partitions)
            cand = hash_aggregate(
                hop.map_batches(
                    lambda t, _o=out_col: pa.table(
                        {"entity_id": t[_o]}),
                    batch_format="pyarrow"),
                "entity_id", [(None, "count", "_m")],
                num_partitions=num_partitions,
            ).drop_columns(["_m"])
            seen = visited.map_batches(
                lambda t: t.append_column("_seen", pa.array(
                    np.ones(t.num_rows, dtype=np.int8))),
                batch_format="pyarrow")
            new = broadcast_join(
                cand, seen, on=("entity_id",),
                join_type="left_outer",
                num_partitions=num_partitions,
            ).map_batches(
                lambda t: pa.table({"entity_id": t.filter(
                    pc.is_null(t["_seen"]))["entity_id"]}),
                batch_format="pyarrow").materialize()
            if new.count() == 0:
                break
            visited = visited.union(new).materialize()
            frontier = new
        return visited

    fwd = _reach("s", "d")
    bwd = _reach("d", "s")

    def flag(ds, name):
        return ds.map_batches(
            lambda t, _n=name: t.append_column(_n, pa.array(
                np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")

    lab = broadcast_join(
        scc, flag(fwd, "_f"), on=("entity_id",),
        join_type="left_outer", num_partitions=num_partitions)
    lab = broadcast_join(
        lab, flag(bwd, "_b"), on=("entity_id",),
        join_type="left_outer", num_partitions=num_partitions)

    def classify(t: pa.Table) -> pa.Table:
        is_core = pc.equal(t["scc_id"], giant)
        cat = pc.if_else(
            is_core, pa.scalar("SCC"),
            pc.if_else(
                pc.is_valid(t["_f"]), pa.scalar("OUT"),
                pc.if_else(pc.is_valid(t["_b"]), pa.scalar("IN"),
                           pa.scalar("OTHER"))))
        return pa.table({"entity_id": t["entity_id"], "bowtie": cat})

    return lab.map_batches(classify, batch_format="pyarrow")


def bowtie_reference(edge_pairs) -> dict:
    """Pure-Python bowtie replay over :func:`scc_reference`."""
    comp = scc_reference(edge_pairs)
    if not comp:
        return {}
    from collections import Counter, deque

    sizes = Counter(comp.values())
    giant = min(c for c in sizes
                if sizes[c] == max(sizes.values()))
    fwd: dict = {}
    bwd: dict = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        fwd.setdefault(a, set()).add(b)
        bwd.setdefault(b, set()).add(a)
    core = {v for v, c in comp.items() if c == giant}

    def reach(adj):
        seen = set(core)
        q = deque(core)
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    fset, bset = reach(fwd), reach(bwd)
    out = {}
    for v in comp:
        if comp[v] == giant:
            out[v] = "SCC"
        elif v in fset:
            out[v] = "OUT"
        elif v in bset:
            out[v] = "IN"
        else:
            out[v] = "OTHER"
    return out


# --- directed triad census ------------------------------------------------------


def _triad_label(s12: int, s13: int, s23: int) -> str:
    """Isomorphism class of a CLOSED directed triad from its three
    dyad states on sorted nodes 1<2<3 (state: 1 = lo→hi, 2 = hi→lo,
    3 = mutual).  Self-describing labels (m = mutual dyads, a =
    asymmetric dyads); Holland-Leinhardt equivalents: m3=300,
    m2a1=210, m1-out=120D, m1-in=120U, m1-thru=120C, a3-cycle=030C,
    a3-trans=030T."""
    pairs = {(1, 2): s12, (1, 3): s13, (2, 3): s23}
    m = sum(1 for s in pairs.values() if s == 3)
    if m == 3:
        return "m3"
    if m == 2:
        return "m2a1"
    if m == 1:
        mut = next(p for p, s in pairs.items() if s == 3)
        t = ({1, 2, 3} - set(mut)).pop()
        outs = sum(
            1 for (p, q), s in pairs.items() if s != 3
            and (p if s == 1 else q) == t)
        return {2: "m1-out", 0: "m1-in"}.get(outs, "m1-thru")
    outdeg = {1: 0, 2: 0, 3: 0}
    for (p, q), s in pairs.items():
        outdeg[p if s == 1 else q] += 1
    return ("a3-cycle" if all(v == 1 for v in outdeg.values())
            else "a3-trans")


#: code = (s12-1)*9 + (s13-1)*3 + (s23-1) -> label, shared by the Ray
#: kernel and the generated SQL CASE (automatic parity)
TRIAD_LABELS = {
    (a - 1) * 9 + (b - 1) * 3 + (c - 1): _triad_label(a, b, c)
    for a in (1, 2, 3) for b in (1, 2, 3) for c in (1, 2, 3)
}


def triad_census(
    edges: "ray.data.Dataset",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Directed triad census over CLOSED triads (all three dyads
    connected) — the Holland-Leinhardt motif profile: how much of the
    graph's triangle mass is feed-forward (``a3-trans``, the motif
    enriched in hierarchies/citation), cyclic (``a3-cycle``), or
    mutual-core (``m*``).  The shape signature that separates a
    citation-like KG from a social-like one; Neo4j answers it with
    ad-hoc Cypher per type.

    Shape: one canonical-pair aggregate carrying the dyad state
    (``lo→hi`` / ``hi→lo`` / mutual), ONE degree-ordered triangle pass
    (shared :func:`_triangle_hits`), three size-gated broadcast joins
    stamping the per-pair states onto each triangle, a 27-entry code
    lookup, and a (label, count) aggregate.  Returns ``(triad, n)``
    sorted by count desc.
    """
    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        fwd = pc.cast(pc.less(s, d), pa.int64())
        return pa.table({
            "lo": pc.min_element_wise(s, d),
            "hi": pc.max_element_wise(s, d),
            "f": fwd,
            "b": pc.subtract(1, fwd),
        })

    est = hash_aggregate(
        edges.select_columns([src_col, dst_col])
             .map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], [("f", "max", "f"), ("b", "max", "b")],
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({
            "lo": t["lo"], "hi": t["hi"],
            "st": pc.add(t["f"], pc.multiply(t["b"], 2)),
        }),
        batch_format="pyarrow").materialize()

    hits = _triangle_hits(est, "lo", "hi", num_partitions)

    import numpy as np

    def sort_nodes(t: pa.Table) -> pa.Table:
        ap = t["apex"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        m = np.sort(np.stack([ap, a, b], axis=1), axis=1)
        return pa.table({
            "n1": pa.array(m[:, 0], pa.int64()),
            "n2": pa.array(m[:, 1], pa.int64()),
            "n3": pa.array(m[:, 2], pa.int64()),
        })

    tri = hits.map_batches(sort_nodes, batch_format="pyarrow")

    def stamp(name, lo_col, hi_col):
        def rn(t: pa.Table) -> pa.Table:
            return pa.table({
                lo_col: t["lo"], hi_col: t["hi"], name: t["st"]})

        return est.map_batches(rn, batch_format="pyarrow")

    tri = broadcast_join(tri, stamp("s12", "n1", "n2"),
                         on=("n1", "n2"), num_partitions=num_partitions)
    tri = broadcast_join(tri, stamp("s13", "n1", "n3"),
                         on=("n1", "n3"), num_partitions=num_partitions)
    tri = broadcast_join(tri, stamp("s23", "n2", "n3"),
                         on=("n2", "n3"), num_partitions=num_partitions)

    labels = [TRIAD_LABELS[c] for c in range(27)]

    def classify(t: pa.Table) -> pa.Table:
        code = ((t["s12"].to_numpy(zero_copy_only=False) - 1) * 9
                + (t["s13"].to_numpy(zero_copy_only=False) - 1) * 3
                + (t["s23"].to_numpy(zero_copy_only=False) - 1))
        lab = np.array(labels, dtype=object)[code]
        import pandas as pd

        vc = pd.Series(lab).value_counts()
        return pa.table({
            "triad": pa.array(vc.index.to_numpy(), pa.string()),
            "n": pa.array(vc.to_numpy(), pa.int64()),
        })

    agg = hash_aggregate(
        tri.map_batches(classify, batch_format="pyarrow"),
        "triad", [("n", "sum", "n")], num_partitions=num_partitions)
    return agg.sort(["n", "triad"], descending=[True, False])


def triad_census_reference(edge_pairs) -> dict:
    """Pure-Python closed-triad census replay."""
    from itertools import combinations

    dd = {(a, b) for a, b in edge_pairs if a != b}
    adj: dict = {}
    for a, b in dd:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def state(p, q):
        f = (p, q) in dd
        b = (q, p) in dd
        return (3 if f and b else (1 if f else (2 if b else 0)))

    out: dict = {}
    for n1, n2, n3 in combinations(sorted(adj), 3):
        s12, s13, s23 = state(n1, n2), state(n1, n3), state(n2, n3)
        if 0 in (s12, s13, s23):
            continue
        lab = _triad_label(s12, s13, s23)
        out[lab] = out.get(lab, 0) + 1
    return out
