"""Integer PageRank: distributed result must replay bit-for-bit against
the pure-Python integer reference (the same determinism contract the
SQL oracle relies on)."""

import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in pairs], pa.int64()),
        "dst_id": pa.array([b for _, b in pairs], pa.int64()),
    }))


class TestPagerank:
    def test_matches_integer_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            pagerank,
            pagerank_reference,
        )

        # a small graph with a hub, a sink, a dangling node, a cycle,
        # and duplicate edges (must collapse to DISTINCT pairs)
        pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 6),
                 (6, 5), (1, 2), (7, 3)]  # 7 -> 3 and 7 dangles after
        got = {r["entity_id"]: r["rank_scaled"]
               for r in pagerank(_edges_ds(pairs), iters=4).take_all()}
        want = pagerank_reference(pairs, iters=4)
        assert got == want

    def test_sink_outranks_source(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import pagerank

        # stars into node 0; node 0 points back to 1 only
        pairs = [(i, 0) for i in range(1, 8)] + [(0, 1)]
        got = {r["entity_id"]: r["rank_scaled"]
               for r in pagerank(_edges_ds(pairs), iters=3).take_all()}
        assert got[0] == max(got.values())
        assert got[0] > got[2] > 0

    def test_iterations_converge_toward_fixpoint(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            pagerank_reference,
        )

        pairs = [(1, 2), (2, 3), (3, 1), (3, 2)]
        r3 = pagerank_reference(pairs, iters=3)
        r8 = pagerank_reference(pairs, iters=8)
        r9 = pagerank_reference(pairs, iters=9)
        # successive-iterate distance shrinks (geometric contraction)
        d38 = sum(abs(r3[k] - r8[k]) for k in r3)
        d89 = sum(abs(r8[k] - r9[k]) for k in r8)
        assert d89 < d38


class TestTriangles:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triangle_counts,
            triangle_counts_reference,
        )

        # K4 on {1,2,3,4} (4 triangles), a pendant, a self-loop,
        # duplicate + reversed edges (direction must not matter),
        # and a disjoint triangle {10,11,12}
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 5), (5, 5), (2, 1), (1, 2),
                 (10, 11), (11, 12), (12, 10)]
        got = {r["entity_id"]: r["n_triangles"]
               for r in triangle_counts(_edges_ds(pairs)).take_all()}
        want = triangle_counts_reference(pairs)
        assert got == want
        assert got[1] == 3  # each K4 vertex sits in 3 triangles
        assert got[10] == 1
        assert 5 not in got  # pendant joins no triangle

    def test_triangle_free_graph_is_empty(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triangle_counts,
        )

        # a path and a star: no triangles anywhere
        pairs = [(1, 2), (2, 3), (3, 4), (9, 5), (9, 6), (9, 7)]
        assert triangle_counts(_edges_ds(pairs)).take_all() == []

    def test_hub_graph_matches(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triangle_counts,
            triangle_counts_reference,
        )

        # hot hub: node 0 connected to all, plus a ring — exercises
        # the degree-ordering orientation (hub must not explode wedges)
        n = 40
        pairs = [(0, i) for i in range(1, n)]
        pairs += [(i, i % (n - 1) + 1) for i in range(1, n)]
        got = {r["entity_id"]: r["n_triangles"]
               for r in triangle_counts(_edges_ds(pairs)).take_all()}
        assert got == triangle_counts_reference(pairs)


class TestCooccurrence:
    def _mentions_ds(self, pairs):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in pairs], pa.string()),
            "entity_id": pa.array([e for _, e in pairs], pa.int64()),
        }))

    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            cooccurrence_reference,
            cooccurrence_topk,
        )

        # 4 docs; (1,2) co-occur in d1, d2 and d3; d4 is a singleton
        pairs = [("d1", 1), ("d1", 2), ("d1", 3),
                 ("d2", 1), ("d2", 2),
                 ("d3", 2), ("d3", 3), ("d3", 1),
                 ("d4", 9)]
        got = {(r["entity_a"], r["entity_b"]): (r["n_docs_both"], r["lift_scaled"])
               for r in cooccurrence_topk(
                   self._mentions_ds(pairs), k=10, min_count=2).take_all()}
        want = cooccurrence_reference(pairs, min_count=2)
        assert got == want
        # (1,2): c_ab=3, c_1=3, c_2=3, n=4 -> 3*4*1e6 // 9
        assert got[(1, 2)] == (3, (3 * 4 * 10**6) // 9)

    def test_min_count_filters_and_k_truncates(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            cooccurrence_topk,
        )

        pairs = [("d1", 1), ("d1", 2),   # (1,2) once only
                 ("d2", 3), ("d2", 4),
                 ("d3", 3), ("d3", 4),
                 ("d4", 5), ("d4", 6),
                 ("d5", 5), ("d5", 6)]
        rows = cooccurrence_topk(
            self._mentions_ds(pairs), k=1, min_count=2).take_all()
        assert len(rows) == 1
        # (3,4) and (5,6) tie on lift; tie-break = smaller entity_a
        assert (rows[0]["entity_a"], rows[0]["entity_b"]) == (3, 4)

    def test_doc_entity_cap_logs_and_truncates(self, ray_session, caplog):
        import logging

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            cooccurrence_topk,
        )

        # one hub doc with 6 entities, capped at 3 -> pairs only among
        # the first 3 by entity_id; a normal doc keeps its pair
        pairs = [("hub", i) for i in range(1, 7)]
        pairs += [("d2", 1), ("d2", 2), ("d2", 3)]
        with caplog.at_level(logging.WARNING,
                             logger="neo4j_document_pipeline_ray.pipelines.graph_algo"):
            rows = cooccurrence_topk(
                self._mentions_ds(pairs), k=50, min_count=2,
                max_doc_entities=3).take_all()
        got = {(r["entity_a"], r["entity_b"]): r["n_docs_both"] for r in rows}
        # pairs among 1..3 counted in both docs; 4..6 dropped from hub
        assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 2}


class TestDegenerateInputs:
    def test_empty_edge_set(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triangle_counts,
        )

        assert triangle_counts(_edges_ds([])).take_all() == []

    def test_cooccurrence_empty_and_singleton_docs(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            cooccurrence_topk,
        )

        def mds(pairs):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([d for d, _ in pairs], pa.string()),
                "entity_id": pa.array([e for _, e in pairs], pa.int64()),
            }))

        assert cooccurrence_topk(mds([])).take_all() == []
        # every doc a singleton: no pairs anywhere
        assert cooccurrence_topk(
            mds([("a", 1), ("b", 2)])).take_all() == []


class TestLinkPrediction:
    def test_common_neighbors_exclude_existing_edges(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            link_prediction_topk,
        )

        # square 1-2-3-4-1: diagonals (1,3) and (2,4) share 2 common
        # neighbors and are NOT edges; plus a pendant 5 on 1
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)]
        rows = link_prediction_topk(_edges_ds(pairs), k=10).take_all()
        got = {(r["entity_a"], r["entity_b"]): r["common_neighbors"]
               for r in rows}
        assert got[(1, 3)] == 2 and got[(2, 4)] == 2
        # (2,5) share neighbor 1 but are non-adjacent -> included with 1
        assert got[(2, 5)] == 1 and got[(4, 5)] == 1
        # existing edges never proposed
        assert (1, 2) not in got and (3, 4) not in got

    def test_k_and_tie_break(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            link_prediction_topk,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)]
        rows = link_prediction_topk(_edges_ds(pairs), k=1).take_all()
        assert len(rows) == 1
        # (1,3) and (2,4) tie at 2; tie-break = smaller entity_a
        assert (rows[0]["entity_a"], rows[0]["entity_b"]) == (1, 3)


class TestKCore:
    def _run(self, pairs, k):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import kcore

        rows = kcore(_edges_ds(pairs), k=k).take_all()
        return {r["entity_id"]: r["deg"] for r in rows}

    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            kcore_reference,
        )

        import random

        rng = random.Random(11)
        pairs = set()
        while len(pairs) < 160:
            a, b = rng.randrange(40), rng.randrange(40)
            if a != b:
                pairs.add((a, b))
        pairs = sorted(pairs)
        for k in (2, 3, 5, 8):
            assert self._run(pairs, k) == kcore_reference(pairs, k)

    def test_multi_round_peel_chain(self, ray_session):
        # path 1-2-3-4-5 hanging off a triangle 5-6-7(-5): 2-core must
        # peel the path ONE NODE PER ROUND (4 rounds) before reaching
        # the triangle fixpoint — exercises the iterative loop depth
        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
        assert self._run(pairs, 2) == {5: 2, 6: 2, 7: 2}

    def test_empty_core(self, ray_session):
        # a tree has no 2-core
        pairs = [(1, 2), (1, 3), (2, 4), (2, 5)]
        assert self._run(pairs, 2) == {}

    def test_self_loops_and_duplicates_ignored(self, ray_session):
        pairs = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (3, 1)]
        assert self._run(pairs, 2) == {1: 2, 2: 2, 3: 2}
