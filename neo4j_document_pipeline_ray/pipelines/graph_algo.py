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

from neo4j_document_pipeline_ray.stages.grouped import (
    broadcast_join,
    hash_aggregate,
)

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
