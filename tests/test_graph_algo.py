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


class TestPersonalizedPagerank:
    def test_matches_integer_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            personalized_pagerank,
            personalized_pagerank_reference,
        )

        pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 6),
                 (6, 5), (1, 2), (7, 3)]
        got = {r["entity_id"]: r["rank_scaled"]
               for r in personalized_pagerank(
                   _edges_ds(pairs), iters=4).take_all()}
        want = personalized_pagerank_reference(pairs, iters=4)
        assert got == want

    def test_mass_concentrates_near_seed(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            personalized_pagerank,
        )

        # two disjoint cycles; the seed (top-degree, here node 0 of the
        # bigger component) must outrank everything, and the OTHER
        # component must stay at exactly zero (no teleport mass)
        pairs = ([(i, (i + 1) % 5) for i in range(5)] + [(0, 2), (2, 0)]
                 + [(10, 11), (11, 10)])
        got = {r["entity_id"]: r["rank_scaled"]
               for r in personalized_pagerank(
                   _edges_ds(pairs), iters=3).take_all()}
        assert got[0] == max(got.values())
        assert got[10] == 0 and got[11] == 0
        # rows are emitted for EVERY node, zeros included
        assert set(got) == {0, 1, 2, 3, 4, 10, 11}


class TestLabelPropCommunities:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            label_prop_communities,
            label_prop_reference,
        )

        import random

        rng = random.Random(7)
        pairs = set()
        while len(pairs) < 120:
            a, b = rng.randrange(30), rng.randrange(30)
            if a != b:
                pairs.add((a, b))
        pairs = sorted(pairs)
        for rounds in (1, 3, 4):
            got = {r["entity_id"]: r["community"]
                   for r in label_prop_communities(
                       _edges_ds(pairs), rounds=rounds).take_all()}
            assert got == label_prop_reference(pairs, rounds=rounds)

    def test_two_cliques_with_a_bridge(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            label_prop_communities,
        )

        k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        pairs = k1 + k2 + [(3, 10)]
        got = {r["entity_id"]: r["community"]
               for r in label_prop_communities(
                   _edges_ds(pairs), rounds=4).take_all()}
        # each clique converges to ONE community label
        assert len({got[n] for n in range(4)}) == 1
        assert len({got[n] for n in range(10, 14)}) == 1


class TestBfsDistances:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            bfs_distances,
            bfs_distances_reference,
        )

        # hub 0 (seed) - two chains and a cycle; 99 unreachable island
        pairs = [(0, 1), (0, 2), (0, 3), (1, 4), (4, 5), (2, 5),
                 (5, 6), (6, 7), (99, 98)]
        got = {r["entity_id"]: r["dist"]
               for r in bfs_distances(_edges_ds(pairs)).take_all()}
        want = bfs_distances_reference(pairs)
        assert got == want
        assert got[0] == 0
        assert 99 not in got  # unreachable nodes emit no row

    def test_direction_ignored(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            bfs_distances,
        )

        # edges all point AT the hub; undirected BFS still reaches out
        pairs = [(1, 0), (2, 0), (3, 1), (0, 9), (0, 8)]
        got = {r["entity_id"]: r["dist"]
               for r in bfs_distances(_edges_ds(pairs)).take_all()}
        assert got == {0: 0, 1: 1, 2: 1, 9: 1, 8: 1, 3: 2}


class TestHits:
    def test_matches_integer_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            hits,
            hits_reference,
        )

        # a strong authority (3), two hubs, a cycle, a self-loop,
        # duplicate edges, and a disjoint 2-cycle
        pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 6),
                 (6, 5), (1, 2), (7, 3), (8, 8)]
        got = {r["entity_id"]: (r["hub_scaled"], r["auth_scaled"])
               for r in hits(_edges_ds(pairs), iters=3).take_all()}
        want = hits_reference(pairs, iters=3)
        assert got == want

    def test_hub_and_authority_separate(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import hits

        # pure bipartite: 1,2 point at 8,9 — hubs score 0 authority,
        # authorities score 0 hub (PageRank cannot split these roles)
        pairs = [(1, 8), (1, 9), (2, 8), (2, 9)]
        got = {r["entity_id"]: (r["hub_scaled"], r["auth_scaled"])
               for r in hits(_edges_ds(pairs), iters=2).take_all()}
        for h in (1, 2):
            assert got[h][0] > 0 and got[h][1] == 0
        for a in (8, 9):
            assert got[a][0] == 0 and got[a][1] > 0


def _mentions_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in pairs], pa.string()),
        "entity_id": pa.array([e for _, e in pairs], pa.int64()),
    }))


class TestRelatedDocs:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            related_docs_reference,
            related_docs_topk,
        )

        pairs = [("d1", 10), ("d1", 11), ("d1", 12), ("d2", 10),
                 ("d2", 11), ("d3", 11), ("d3", 12), ("d3", 13),
                 ("d4", 13), ("d4", 10), ("d5", 12), ("d1", 10)]
        got = [(r["doc_a"], r["doc_b"], r["shared_entities"],
                r["jaccard_scaled"])
               for r in related_docs_topk(
                   _mentions_ds(pairs), k=10, min_shared=1,
                   max_entity_docs=4).take_all()]
        want = related_docs_reference(
            pairs, min_shared=1, max_entity_docs=4)[:10]
        assert got == want

    def test_ubiquitous_entity_excluded(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            related_docs_topk,
        )

        # entity 99 appears in all 5 docs (df 5 > cap 4): it must
        # contribute neither shared counts nor set sizes — d1/d2
        # share only entity 7, over kept sets of size 1 each
        pairs = [(f"d{i}", 99) for i in range(1, 6)]
        pairs += [("d1", 7), ("d2", 7)]
        got = [(r["doc_a"], r["doc_b"], r["shared_entities"],
                r["jaccard_scaled"])
               for r in related_docs_topk(
                   _mentions_ds(pairs), k=10, min_shared=1,
                   max_entity_docs=4).take_all()]
        assert got == [("d1", "d2", 1, 10**6)]

    def test_min_shared_filters(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            related_docs_topk,
        )

        pairs = [("a", 1), ("b", 1), ("a", 2), ("b", 2), ("c", 1)]
        got = [(r["doc_a"], r["doc_b"], r["shared_entities"])
               for r in related_docs_topk(
                   _mentions_ds(pairs), k=10, min_shared=2).take_all()]
        assert got == [("a", "b", 2)]


class TestSsspWeighted:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            sssp_weighted,
            sssp_weighted_reference,
        )

        # hub 0 (seed), chains, a cycle, duplicate/reversed edges,
        # a self-loop, and an unreachable island
        pairs = [(0, 1), (0, 2), (0, 3), (1, 4), (4, 5), (2, 5),
                 (5, 6), (6, 7), (3, 3), (2, 0), (0, 1), (99, 98)]
        got = {r["entity_id"]: r["dist"]
               for r in sssp_weighted(_edges_ds(pairs)).take_all()}
        want = sssp_weighted_reference(pairs)
        assert got == want
        assert got[0] == 0
        assert 99 not in got

    def test_cheap_detour_beats_direct_edge(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            sssp_weighted,
        )

        # w(a,b) = 1 + (a+b) % 9: direct (1,7) costs 9, the detour
        # 1-2 (w=4) + 2-7 (w=1) costs 5 — weighted relaxation must
        # prefer MORE hops when they are cheaper (BFS cannot)
        pairs = [(1, 7), (1, 2), (2, 7)]
        got = {r["entity_id"]: r["dist"]
               for r in sssp_weighted(_edges_ds(pairs)).take_all()}
        assert got == {1: 0, 2: 4, 7: 5}

    def test_bounded_rounds_cut_the_detour(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            sssp_weighted,
        )

        # with ONE relaxation round only direct edges resolve: the
        # two-hop detour to 7 is not yet visible, so dist(7) = 9
        pairs = [(1, 7), (1, 2), (2, 7)]
        got = {r["entity_id"]: r["dist"]
               for r in sssp_weighted(
                   _edges_ds(pairs), max_rounds=1).take_all()}
        assert got == {1: 0, 2: 4, 7: 9}


class TestLinkPredRA:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            link_prediction_ra_topk,
            link_prediction_ra_reference,
        )

        import random

        rng = random.Random(13)
        pairs = set()
        while len(pairs) < 90:
            a, b = rng.randrange(25), rng.randrange(25)
            if a != b:
                pairs.add((a, b))
        pairs = sorted(pairs)
        out = link_prediction_ra_topk(_edges_ds(pairs), k=10**9).take_all()
        got = {(r["entity_a"], r["entity_b"]):
               (r["common_neighbors"], r["ra_scaled"]) for r in out}
        assert got == link_prediction_ra_reference(pairs)

    def test_rare_shared_neighbor_beats_hub(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            link_prediction_ra_topk,
        )

        # hub 100 connects to everyone; z=50 connects ONLY to 1 and 2.
        # RA must weight the rare mutual contact (deg-2 z contributes
        # S/2) far above the hub (deg-7, S/7): (1,2) outranks (3,4)
        # even though plain common-neighbor count is 2 vs 1.
        from neo4j_document_pipeline_ray.pipelines.graph_algo import RA_SCALE

        hub = [(100, i) for i in range(1, 8)]
        pairs = hub + [(50, 1), (50, 2)]
        out = link_prediction_ra_topk(_edges_ds(pairs), k=10**9).take_all()
        ra = {(r["entity_a"], r["entity_b"]): r["ra_scaled"] for r in out}
        assert ra[(1, 2)] == RA_SCALE // 7 + RA_SCALE // 2
        assert ra[(3, 4)] == RA_SCALE // 7
        assert ra[(1, 2)] > ra[(3, 4)]
        # deg-2 endpoints 1 and 2 beat the deg-7 hub as common
        # neighbors of (50, 100) too: that pair tops the list
        assert (out[0]["entity_a"], out[0]["entity_b"]) == (50, 100)
        assert out[0]["ra_scaled"] == 2 * (RA_SCALE // 2)


class TestNodeSimilarity:
    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            node_similarity_topk,
            node_similarity_reference,
        )

        import random

        rng = random.Random(17)
        pairs = set()
        while len(pairs) < 90:
            a, b = rng.randrange(25), rng.randrange(25)
            if a != b:
                pairs.add((a, b))
        pairs = sorted(pairs)
        out = node_similarity_topk(_edges_ds(pairs), k=10**9).take_all()
        got = {(r["entity_a"], r["entity_b"]):
               (r["intersection"], r["jaccard_scaled"]) for r in out}
        assert got == node_similarity_reference(pairs)

    def test_twins_score_full_jaccard(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            JACCARD_SCALE,
            node_similarity_topk,
        )

        # 1 and 2 have IDENTICAL neighborhoods {10, 11, 12}: Jaccard 1.0;
        # adjacent pair (10, 11) shares {1, 2} but also has extra
        # neighbors, so it scores lower — and must still be SCORED
        # (GDS semantics include adjacent pairs)
        pairs = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12),
                 (10, 11)]
        out = node_similarity_topk(_edges_ds(pairs), k=5).take_all()
        assert (out[0]["entity_a"], out[0]["entity_b"]) == (1, 2)
        assert out[0]["jaccard_scaled"] == JACCARD_SCALE
        scored = {(r["entity_a"], r["entity_b"]) for r in out}
        assert (10, 11) in scored


class TestRandomWalks:
    PAIRS = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 6), (6, 5),
             (1, 2), (7, 3), (8, 8), (3, 9)]

    def test_matches_integer_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            random_walks,
            random_walks_reference,
        )

        got = {(r["seed"], r["walk"], r["step"], r["node"])
               for r in random_walks(_edges_ds(self.PAIRS)).take_all()}
        assert got == random_walks_reference(self.PAIRS)

    def test_walk_structure(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            random_walks,
        )

        rows = random_walks(_edges_ds(self.PAIRS), walks_per_node=2,
                            steps=3).take_all()
        by_walk = {}
        for r in rows:
            by_walk.setdefault((r["seed"], r["walk"]), {})[r["step"]] = \
                r["node"]
        # every non-sink node starts 2 walks; step 0 is the seed
        seeds = {s for s, _ in self.PAIRS}
        assert {k[0] for k in by_walk} == seeds
        for (seed, _w), path in by_walk.items():
            assert path[0] == seed
            # steps are contiguous from 0 (early stop only at a sink)
            assert sorted(path) == list(range(len(path)))
        # node 9 is a sink: any walk reaching it stops there
        adj = {}
        for s, d in self.PAIRS:
            adj.setdefault(s, set()).add(d)
        for (_seed, _w), path in by_walk.items():
            for st in sorted(path)[:-1]:
                assert path[st + 1] in adj[path[st]]


class TestClusteringCoefficient:
    def test_triangle_and_star(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            clustering_coefficient,
        )

        # K3 on {1,2,3}; node 4 is a star center to 1 and 5; node 5 leaf
        pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 5)]
        got = {r["entity_id"]: r
               for r in clustering_coefficient(
                   _edges_ds(pairs)).take_all()}
        assert got[2]["cc_scaled"] == 1_000_000          # pure clique
        assert got[3]["cc_scaled"] == 1_000_000
        # node 1: deg 3, 1 triangle -> 2*1/(3*2) = 1/3
        assert got[1]["cc_scaled"] == 2 * 1_000_000 // 6
        assert got[4]["cc_scaled"] == 0                  # open wedge
        assert got[5]["cc_scaled"] == 0 and got[5]["degree"] == 1
        assert got[1]["n_triangles"] == 1


class TestWalkSkipgrams:
    def test_matches_window_replay(self, ray_session):
        import collections

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            random_walks_reference,
            walk_skipgram_pairs,
        )

        pairs = TestRandomWalks.PAIRS
        got = {(r["center"], r["context"]): r["n"]
               for r in walk_skipgram_pairs(
                   _edges_ds(pairs), window=2).take_all()}
        walks = collections.defaultdict(dict)
        for seed, w, step, node in random_walks_reference(pairs):
            walks[(seed, w)][step] = node
        want = collections.Counter()
        for path in walks.values():
            nodes = [path[s] for s in sorted(path)]
            for i in range(len(nodes)):
                for j in range(max(0, i - 2), min(len(nodes), i + 3)):
                    if i != j:
                        want[(nodes[i], nodes[j])] += 1
        assert got == dict(want)


class TestNeighborhoodFunction:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            neighborhood_function,
            neighborhood_function_reference,
        )

        rng = random.Random(7)
        pairs = [(rng.randrange(40) + 1, rng.randrange(40) + 1)
                 for _ in range(120)]
        pairs += [(1, 2), (2, 3), (3, 4)]
        got = neighborhood_function(_edges_ds(pairs), hops=3)
        rows = list(zip(got["hop"].to_pylist(), got["nf_est"].to_pylist()))
        assert rows == neighborhood_function_reference(pairs, hops=3)

    def test_path_graph_exact_below_k(self, ray_session):
        # a 5-node path has balls smaller than k=8 at every hop, so the
        # KMV estimate is EXACT: N(h) = sum over v of |ball(v, h)|
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            neighborhood_function,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
        got = neighborhood_function(_edges_ds(pairs), hops=3)
        rows = dict(zip(got["hop"].to_pylist(), got["nf_est"].to_pylist()))
        # hop0: 5; hop1: 5 + 2*4 = 13; hop2: 3+4+5+4+3 = 19;
        # hop3: 4+5+5+5+4 = 23
        assert rows == {0: 5, 1: 13, 2: 19, 3: 23}

    def test_hash_matches_sql_mirror(self, ray_session):
        import duckdb
        import numpy as np

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            NF_SPACE, _NF_A, _NF_B, _NF_C1, _nf_hash,
        )

        ids = np.array([0, 1, 12345678901234567, (1 << 60) - 1],
                       dtype=np.int64)
        m64 = 1 << 64
        sql = f"""
        SELECT CAST(CAST(xor(z5, z5 >> 31) AS HUGEINT)
                    % {NF_SPACE} AS BIGINT) AS h
        FROM (
          SELECT CAST((CAST(xor(z3, z3 >> 27) AS HUGEINT) * {_NF_B})
                      % {m64} AS UBIGINT) AS z5
          FROM (
            SELECT CAST((CAST(xor(z1, z1 >> 30) AS HUGEINT) * {_NF_A})
                        % {m64} AS UBIGINT) AS z3
            FROM (
              SELECT CAST((CAST(id AS HUGEINT) + {_NF_C1})
                          % {m64} AS UBIGINT) AS z1
              FROM t)))
        """
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS id",
                    [ids.tolist()])
        assert [r[0] for r in con.execute(sql).fetchall()] \
            == _nf_hash(ids).tolist()


class TestDegreeHistogram:
    def test_star_plus_clique(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            degree_histogram,
        )

        # hub 1 -> 2..9 (degree 8, bucket 3); leaves degree 1 (bucket 0)
        # plus duplicate edges that must collapse before counting
        pairs = [(1, i) for i in range(2, 10)] + [(1, 5), (1, 9)]
        got = {r["bucket"]: (r["min_degree"], r["n_nodes"])
               for r in degree_histogram(_edges_ds(pairs)).take_all()}
        assert got == {0: (1, 8), 3: (8, 1)}


class TestMinimumSpanningForest:
    def test_matches_kruskal_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            minimum_spanning_forest,
            minimum_spanning_forest_reference,
        )

        rng = random.Random(11)
        pairs = [(rng.randrange(60) + 1, rng.randrange(60) + 1)
                 for _ in range(200)]
        pairs += [(100, 101), (102, 103)]  # extra small components
        got = {(r["entity_a"], r["entity_b"], r["weight"])
               for r in minimum_spanning_forest(_edges_ds(pairs)).take_all()}
        assert got == minimum_spanning_forest_reference(pairs)

    def test_forest_size_and_acyclicity(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            minimum_spanning_forest,
        )

        # triangle + tail: MSF must drop exactly the heaviest triangle
        # edge and keep |V| - #components = 4 edges
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)]
        out = minimum_spanning_forest(_edges_ds(pairs)).take_all()
        edges = {(r["entity_a"], r["entity_b"]) for r in out}
        assert len(edges) == 4
        ws = {(lo, hi): 1 + (lo + hi) % 9 for lo, hi in
              [(1, 2), (2, 3), (1, 3)]}
        heaviest = max(ws, key=lambda p: (ws[p], p))
        assert heaviest not in edges
        assert (3, 4) in edges and (10, 11) in edges


class TestHarmonicCentrality:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            harmonic_centrality_approx,
            harmonic_centrality_reference,
        )

        rng = random.Random(5)
        pairs = [(rng.randrange(40) + 1, rng.randrange(40) + 1)
                 for _ in range(100)]
        got = {r["entity_id"]: r["harmonic_scaled"]
               for r in harmonic_centrality_approx(
                   _edges_ds(pairs), hops=3).take_all()}
        assert got == harmonic_centrality_reference(pairs, hops=3)

    def test_star_center_dominates(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            HARMONIC_SCALE,
            harmonic_centrality_approx,
        )

        # star: hub sees 6 nodes at distance 1 (exact, below k=8);
        # leaves see hub at 1 + five peers at 2
        pairs = [(1, i) for i in range(2, 8)]
        got = {r["entity_id"]: r["harmonic_scaled"]
               for r in harmonic_centrality_approx(
                   _edges_ds(pairs), hops=3).take_all()}
        assert got[1] == 6 * HARMONIC_SCALE
        leaf = HARMONIC_SCALE + 5 * (HARMONIC_SCALE // 2)
        assert all(got[i] == leaf for i in range(2, 8))
        assert got[1] > max(got[i] for i in range(2, 8))


class TestBetweenness:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            betweenness_approx,
            betweenness_reference,
        )

        rng = random.Random(3)
        pairs = [(rng.randrange(30) + 1, rng.randrange(30) + 1)
                 for _ in range(70)]
        pairs += [(50, 51), (51, 52), (52, 53)]
        got = {r["entity_id"]: r["betweenness_scaled"]
               for r in betweenness_approx(_edges_ds(pairs)).take_all()}
        assert got == betweenness_reference(pairs)

    def test_bridge_dominates(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            betweenness_approx,
            betweenness_reference,
        )

        # two 4-cliques joined by bridge node 100: every cross-clique
        # shortest path runs through it
        c1, c2 = [1, 2, 3, 4], [11, 12, 13, 14]
        pairs = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
        pairs += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
        pairs += [(1, 100), (100, 11)]
        got = {r["entity_id"]: r["betweenness_scaled"]
               for r in betweenness_approx(
                   _edges_ds(pairs), pivots=2).take_all()}
        assert got == betweenness_reference(pairs, pivots=2)
        others = [v for kk, v in got.items() if kk != 100]
        assert got[100] > max(others)


class TestNegativeSamples:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            negative_samples,
            negative_samples_reference,
        )

        rng = random.Random(9)
        pairs = [(rng.randrange(50) + 1, rng.randrange(50) + 1)
                 for _ in range(150)]
        got = {(r["entity_id"], r["trial"], r["neg_id"])
               for r in negative_samples(_edges_ds(pairs)).take_all()}
        assert got == negative_samples_reference(pairs)
        assert got  # the scheme must actually yield samples here

    def test_no_real_edges_and_no_self(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            negative_samples,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
        es = {(min(a, b), max(a, b)) for a, b in pairs}
        for r in negative_samples(_edges_ds(pairs), trials=8).take_all():
            u, v = r["entity_id"], r["neg_id"]
            assert u != v
            assert (min(u, v), max(u, v)) not in es


def _typed_edges_ds(triples):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _, _ in triples], pa.int64()),
        "rel_type": pa.array([r for _, r, _ in triples], pa.string()),
        "dst_id": pa.array([c for _, _, c in triples], pa.int64()),
    }))


class TestRuleMining:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            rule_mining,
            rule_mining_reference,
        )

        rng = random.Random(21)
        rels = ["works_for", "located_in", "part_of", "born_in"]
        triples = set()
        while len(triples) < 120:
            triples.add((rng.randrange(25) + 1, rng.choice(rels),
                         rng.randrange(25) + 1))
        triples = sorted(triples)
        got = {(r["r1"], r["r2"], r["r3"], r["n_paths"], r["n_closed"],
                r["conf_scaled"])
               for r in rule_mining(_typed_edges_ds(triples),
                                    k=5).take_all()}
        assert got == rule_mining_reference(triples, k=5)
        assert got

    def test_planted_rule_is_confident(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            RULE_SCALE,
            rule_mining,
        )

        # born_in(a,b) ∧ part_of(b,c) is ALWAYS closed by lives_in(a,c)
        triples = []
        for a in range(1, 6):
            triples += [(a, "born_in", 100 + a),
                        (100 + a, "part_of", 200),
                        (a, "lives_in", 200)]
        out = {(r["r1"], r["r2"], r["r3"]): r["conf_scaled"]
               for r in rule_mining(_typed_edges_ds(triples),
                                    k=3).take_all()}
        assert out[("born_in", "part_of", "lives_in")] == RULE_SCALE


class TestMentionContexts:
    def test_offsets_point_at_names(self, ray_session):
        import __ray_entry__ as entrymod

        out = entrymod.queries()["kg_mention_contexts"](
            "/root/testdata/sf0.001").take_all()
        assert out
        kg = entrymod._kg("/root/testdata/sf0.001")
        names = {r["entity_id"]: r["name"] for r in
                 kg["nodes"].select_columns(
                     ["entity_id", "name"]).take_all()}
        texts = {r["doc_id"]: r["text"] for r in
                 kg["docs"].select_columns(["doc_id", "text"]).take_all()}
        for r in out[:200]:
            nm = names[r["entity_id"]]
            s = texts[r["doc_id"]]
            off = r["name_offset"]
            assert s[off:off + len(nm)] == nm          # offset is exact
            assert s.find(nm) == off                   # FIRST occurrence
            assert nm in r["context"]
            assert len(r["context"]) <= len(nm) + 120  # ±60 pad


class TestCommunitySupergraph:
    def test_two_cliques_and_bridge(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            community_supergraph,
            label_prop_reference,
        )

        c1, c2 = [1, 2, 3, 4], [11, 12, 13, 14]
        pairs = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
        pairs += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
        pairs += [(4, 11)]  # single bridge edge
        lab = label_prop_reference(pairs, rounds=4)
        la, lb = lab[1], lab[11]
        got = {(r["community_a"], r["community_b"]): r["n_edges"]
               for r in community_supergraph(
                   _edges_ds(pairs), rounds=4).take_all()}
        if la == lb:
            assert got == {(la, la): 13}
        else:
            lo, hi = min(la, lb), max(la, lb)
            assert got[(la, la)] == 6      # intra clique 1
            assert got[(lb, lb)] == 6      # intra clique 2
            assert got[(lo, hi)] == 1      # the cut


class TestEdgeTriangleSupport:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            edge_triangle_support,
            edge_triangle_support_reference,
        )

        rng = random.Random(17)
        pairs = [(rng.randrange(25) + 1, rng.randrange(25) + 1)
                 for _ in range(120)]
        got = {(r["entity_a"], r["entity_b"]): r["support"]
               for r in edge_triangle_support(
                   _edges_ds(pairs)).take_all()}
        assert got == edge_triangle_support_reference(pairs)
        assert got

    def test_clique_and_tail(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            edge_triangle_support,
        )

        # 4-clique: every edge in 2 triangles; tail edge in none
        c = [1, 2, 3, 4]
        pairs = [(a, b) for i, a in enumerate(c) for b in c[i + 1:]]
        pairs += [(4, 9)]
        got = {(r["entity_a"], r["entity_b"]): r["support"]
               for r in edge_triangle_support(
                   _edges_ds(pairs)).take_all()}
        assert got == {(a, b): 2 for i, a in enumerate(c)
                       for b in c[i + 1:]}


class TestDomainEntities:
    def test_multi_domain_fixture(self, ray_session):
        import pandas as pd
        import ray.data

        import __ray_entry__ as entrymod

        key = "/tmp/_fake_domain_sf"
        entrymod._KG_CACHE[key] = {
            "docs": ray.data.from_pandas(pd.DataFrame({
                "doc_id": ["d1", "d2", "d3"],
                "url": ["https://a.test/x", "https://a.test/y",
                        "http://b.test/z"],
            })),
            "mentions": ray.data.from_pandas(pd.DataFrame({
                "doc_id": ["d1", "d1", "d2", "d3"],
                "entity_id": pd.Series([10, 11, 10, 12], dtype="int64"),
            })),
        }
        try:
            out = {r["domain"]: (r["n_docs"], r["n_entities"],
                                 r["n_mentions"])
                   for r in entrymod._q_kg_domain_entities(key).take_all()}
        finally:
            del entrymod._KG_CACHE[key]
        assert out == {
            "a.test": (2, 2, 3),   # d1+d2; entities {10, 11}; 3 rows
            "b.test": (1, 1, 1),
        }


class TestShortestPathBetween:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            shortest_path_between,
            shortest_path_reference,
        )

        rng = random.Random(2)
        pairs = [(rng.randrange(30) + 1, rng.randrange(30) + 1)
                 for _ in range(60)]
        pairs += [(40, 41), (41, 42)]
        for s, t in [(1, 2), (40, 42), (1, 40), (5, 5)]:
            got = shortest_path_between(_edges_ds(pairs), s, t)
            rows = list(zip(got["step"].to_pylist(),
                            got["entity_id"].to_pylist()))
            assert rows == shortest_path_reference(pairs, s, t), (s, t)

    def test_path_is_valid_walk(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            shortest_path_between,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)]
        got = shortest_path_between(_edges_ds(pairs), 1, 4)
        path = got["entity_id"].to_pylist()
        assert path[0] == 1 and path[-1] == 4
        assert len(path) == 3  # 1-5-4 or 1-2-..; shortest is 2 hops
        es = {(min(a, b), max(a, b)) for a, b in pairs}
        for u, v in zip(path, path[1:]):
            assert (min(u, v), max(u, v)) in es


class TestEffectiveDiameter:
    def test_path_graph(self, ray_session):
        # 5-node path: N = {0:5, 1:13, 2:19, 3:23}; 90% of 23 needs
        # 10*N(h) >= 207 -> first satisfied at hop 3
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            effective_diameter,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
        got = effective_diameter(_edges_ds(pairs), hops=3)
        assert got.to_pylist() == [
            {"eff_diameter_hop": 3, "nf_at_hop": 23, "nf_max": 23}]

    def test_star_graph(self, ray_session):
        # K_{1,4}: N = {0:5, 1:13, 2:25, 3:25}; 10*N(h) >= 225 first
        # at hop 2 (130 < 225 <= 250)
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            effective_diameter,
        )

        pairs = [(1, 2), (1, 3), (1, 4), (1, 5)]
        got = effective_diameter(_edges_ds(pairs), hops=3)
        assert got.to_pylist() == [
            {"eff_diameter_hop": 2, "nf_at_hop": 25, "nf_max": 25}]

    def test_empty_graph_one_zero_row(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            effective_diameter,
        )

        got = effective_diameter(_edges_ds([]), hops=3)
        assert got.to_pylist() == [
            {"eff_diameter_hop": 0, "nf_at_hop": 0, "nf_max": 0}]


def _typed_edges_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src_id": pa.array([s for s, _, _ in rows], pa.int64()),
        "rel_type": pa.array([r for _, r, _ in rows], pa.string()),
        "dst_id": pa.array([d for _, _, d in rows], pa.int64()),
    }))


class TestRelationCardinality:
    def test_fun_ifun(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            relation_cardinality,
        )

        rows = [
            # 1:1 relation: 3 edges, 3 subjects, 3 objects
            (1, "capital_of", 10), (2, "capital_of", 11),
            (3, "capital_of", 12),
            # fan-out: 3 edges, 2 subjects, 2 objects
            (1, "mentions", 10), (1, "mentions", 11), (2, "mentions", 10),
        ]
        got = relation_cardinality(_typed_edges_ds(rows))
        assert got.to_pylist() == [
            {"rel_type": "capital_of", "n_edges": 3, "n_src": 3,
             "n_dst": 3, "func_scaled": 1_000_000,
             "inv_func_scaled": 1_000_000},
            {"rel_type": "mentions", "n_edges": 3, "n_src": 2,
             "n_dst": 2, "func_scaled": 666_666,
             "inv_func_scaled": 666_666},
        ]

    def test_empty_edges(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            relation_cardinality,
        )

        got = relation_cardinality(_typed_edges_ds([]))
        assert got.num_rows == 0
        assert got.column_names == [
            "rel_type", "n_edges", "n_src", "n_dst",
            "func_scaled", "inv_func_scaled"]


class TestDistantSupervision:
    def test_gold_silver_split(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            distant_supervision,
        )

        mentions = rd.from_arrow(pa.table({
            "doc_id": pa.array(["D1", "D1", "D1", "D2", "D2",
                                "D3", "D3"], pa.string()),
            "entity_id": pa.array([1, 2, 3, 1, 2, 2, 3], pa.int64()),
        }))
        edges = rd.from_arrow(pa.table({
            "src_id": pa.array([1, 3], pa.int64()),
            "rel_type": pa.array(["r", "r2"], pa.string()),
            "dst_id": pa.array([2, 2], pa.int64()),
        }))
        triples = rd.from_arrow(pa.table({
            "doc_id": pa.array(["D1"], pa.string()),
            "src_id": pa.array([1], pa.int64()),
            "rel_type": pa.array(["r"], pa.string()),
            "dst_id": pa.array([2], pa.int64()),
        }))
        got = {(r["doc_id"], r["src_id"], r["rel_type"], r["dst_id"]):
               r["is_gold"]
               for r in distant_supervision(mentions, edges,
                                            triples).take_all()}
        assert got == {
            ("D1", 1, "r", 2): 1,    # gold: D1 is provenance
            ("D2", 1, "r", 2): 0,    # silver: co-mention, no assertion
            ("D1", 3, "r2", 2): 0,
            ("D3", 3, "r2", 2): 0,
        }


class TestEgoNetSample:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            ego_net_reference,
            ego_net_sample,
        )

        rng = random.Random(13)
        pairs = [(rng.randrange(60) + 1, rng.randrange(60) + 1)
                 for _ in range(250)]
        seeds = [1, 7, 42]
        got = {(r["seed_id"], r["hop"], r["src_id"], r["dst_id"])
               for r in ego_net_sample(_edges_ds(pairs), seeds,
                                       hops=2).take_all()}
        assert got == ego_net_reference(pairs, seeds, hops=2)

    def test_fanout_cap_bites(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            ego_net_sample,
        )

        # star: hub 1 with 20 leaves; fanout 8 keeps the 8 lowest ids
        pairs = [(1, 100 + i) for i in range(20)]
        rows = ego_net_sample(_edges_ds(pairs), [1], hops=1,
                              fanout=8).take_all()
        assert sorted(r["dst_id"] for r in rows) == [100 + i
                                                     for i in range(8)]
        assert all(r["hop"] == 1 and r["seed_id"] == 1 and
                   r["src_id"] == 1 for r in rows)

    def test_expansion_follows_sampled_neighbors_only(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            ego_net_sample,
        )

        # 1 -> {2..11}; only the 8 lowest (2..9) are sampled; node 12
        # hangs off 11, which was NOT sampled -> never reached
        pairs = [(1, i) for i in range(2, 12)] + [(11, 12)]
        rows = ego_net_sample(_edges_ds(pairs), [1], hops=2,
                              fanout=8).take_all()
        nodes = {r["dst_id"] for r in rows} | {r["src_id"] for r in rows}
        assert 12 not in nodes and 11 not in nodes


class TestFunctionalConflicts:
    def test_detects_violators_in_functional_rel_only(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            functional_conflicts,
        )

        rows = [
            # capital_of: 5 subjects, 6 edges -> fun = 5/6 >= 0.8;
            # subject 1 asserts two capitals (the conflict)
            (1, "capital_of", 10), (1, "capital_of", 11),
            (2, "capital_of", 12), (3, "capital_of", 13),
            (4, "capital_of", 14), (5, "capital_of", 15),
            # mentions: fan-out (fun = 1/4) -> excluded even though
            # subject 9 has many objects
            (9, "mentions", 10), (9, "mentions", 11),
            (9, "mentions", 12), (9, "mentions", 13),
        ]
        got = functional_conflicts(_typed_edges_ds(rows)).take_all()
        assert got == [
            {"rel_type": "capital_of", "src_id": 1, "n_objects": 2}]

    def test_no_functional_rels_empty(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            functional_conflicts,
        )

        rows = [(1, "mentions", 10), (1, "mentions", 11),
                (1, "mentions", 12)]
        assert functional_conflicts(
            _typed_edges_ds(rows)).take_all() == []


class TestWLRoles:
    def test_matches_python_reference(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            wl_roles,
            wl_roles_reference,
        )

        rng = random.Random(11)
        rels = ["mentions", "capital_of", "born_in"]
        triples = [(rng.randrange(25) + 1, rng.choice(rels),
                    rng.randrange(25) + 1) for _ in range(80)]
        got = {r["entity_id"]: r["wl_label"]
               for r in wl_roles(_typed_edges_ds(triples)).take_all()}
        assert got == wl_roles_reference(triples)

    def test_partitioning_invariant(self, ray_session):
        import random

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            wl_roles,
            wl_roles_reference,
        )

        rng = random.Random(5)
        triples = [(rng.randrange(15) + 1, "r", rng.randrange(15) + 1)
                   for _ in range(40)]
        ds = _typed_edges_ds(triples).repartition(7)
        got = {r["entity_id"]: r["wl_label"]
               for r in wl_roles(ds).take_all()}
        assert got == wl_roles_reference(triples)

    def test_star_roles_and_isomorphic_twins(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            wl_roles,
        )

        # two disjoint isomorphic stars: hubs share a label, all 8
        # leaves share a (different) label
        triples = ([(1, "r", i) for i in range(2, 6)]
                   + [(10, "r", i) for i in range(11, 15)])
        got = {r["entity_id"]: r["wl_label"]
               for r in wl_roles(_typed_edges_ds(triples)).take_all()}
        assert got[1] == got[10]
        leaves = {got[i] for i in [2, 3, 4, 5, 11, 12, 13, 14]}
        assert len(leaves) == 1
        assert got[1] != got[2]

    def test_rel_type_distinguishes(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            wl_roles,
        )

        # same shape, different edge type: endpoints must differ
        triples = [(1, "a", 2), (3, "b", 4)]
        got = {r["entity_id"]: r["wl_label"]
               for r in wl_roles(_typed_edges_ds(triples)).take_all()}
        assert got[1] != got[3]
        assert got[2] != got[4]

    def test_histogram_ordering(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            wl_roles_histogram,
        )

        triples = ([(1, "r", i) for i in range(2, 6)]
                   + [(10, "r", i) for i in range(11, 15)])
        rows = wl_roles_histogram(_typed_edges_ds(triples)).take_all()
        assert [r["n_nodes"] for r in rows] == [8, 2]
        assert list(rows[0].keys()) == ["wl_label", "n_nodes"]


class TestSCC:
    def _run(self, pairs, **kw):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            strongly_connected_components,
        )

        return {r["entity_id"]: r["scc_id"]
                for r in strongly_connected_components(
                    _edges_ds(pairs), **kw).take_all()}

    def test_matches_kosaraju_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            scc_reference,
        )

        # two cycles joined by a DAG path, a self-loop, a dangling
        # node, duplicate edges, and a back-edge making a 3-cycle
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6),
                 (6, 5), (7, 7), (3, 4), (8, 1), (2, 8)]
        assert self._run(pairs) == scc_reference(pairs)

    def test_direction_matters(self, ray_session):
        # a -> b -> c with no back edges: all singletons (the
        # undirected view would be one component)
        got = self._run([(10, 20), (20, 30)])
        assert got == {10: 10, 20: 20, 30: 30}

    def test_cycle_collapses_to_min_id(self, ray_session):
        got = self._run([(5, 9), (9, 2), (2, 5), (9, 14)])
        assert got == {5: 2, 9: 2, 2: 2, 14: 14}

    def test_two_disjoint_cycles(self, ray_session):
        got = self._run([(1, 2), (2, 1), (8, 9), (9, 8)])
        assert got == {1: 1, 2: 1, 8: 8, 9: 8}

    def test_partitioning_invariance(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            scc_reference,
        )

        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(40), rng.randrange(40))
                 for _ in range(120)]
        want = scc_reference(pairs)
        assert self._run(pairs, num_partitions=3) == want
        assert self._run(pairs, num_partitions=16) == want

    def test_empty(self, ray_session):
        assert self._run([]) == {}


class TestStructuralProfile:
    def _run(self, pairs):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            structural_profile,
        )

        rows = structural_profile(_edges_ds(pairs)).take_all()
        assert len(rows) == 1
        return dict(rows[0])

    def test_matches_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            structural_profile_reference,
        )

        # hub + reciprocal pair + self-loop + duplicates
        pairs = [(1, 2), (2, 1), (1, 3), (1, 4), (1, 5), (5, 5),
                 (3, 4), (1, 2), (6, 1)]
        assert self._run(pairs) == structural_profile_reference(pairs)

    def test_reciprocity_counts(self, ray_session):
        got = self._run([(1, 2), (2, 1), (3, 4)])
        assert got["n_directed"] == 3
        assert got["n_reciprocal"] == 2
        assert got["reciprocity_scaled"] == 2 * 10**6 // 3

    def test_star_is_disassortative(self, ray_session):
        # star: hubs (high deg) only connect to leaves (deg 1)
        got = self._run([(0, i) for i in range(1, 9)])
        assert got["assortativity_scaled"] < 0

    def test_regular_graph_zero_variance(self, ray_session):
        # 4-cycle: every degree 2 -> variance 0 -> defined as 0
        got = self._run([(1, 2), (2, 3), (3, 4), (4, 1)])
        assert got["assortativity_scaled"] == 0

    def test_empty(self, ray_session):
        got = self._run([])
        assert got == {"n_nodes": 0, "n_directed": 0,
                       "n_undirected": 0, "n_reciprocal": 0,
                       "reciprocity_scaled": 0,
                       "assortativity_scaled": 0}


class TestKTruss:
    def _run(self, pairs, k=4):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            ktruss,
        )

        return {(r["entity_a"], r["entity_b"]): r["support"]
                for r in ktruss(_edges_ds(pairs), k=k).take_all()}

    def test_matches_peeling_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            ktruss_reference,
        )

        import random

        rng = random.Random(11)
        pairs = [(rng.randrange(25), rng.randrange(25))
                 for _ in range(140)]
        assert self._run(pairs) == ktruss_reference(pairs)

    def test_clique_survives_pendant_peels(self, ray_session):
        # 4-clique survives a 4-truss; the triangle hanging off it
        # peels (its edges have support 1 after the bridge goes)
        clique = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13),
                  (12, 13)]
        tri = [(1, 2), (1, 3), (2, 3), (3, 10)]
        got = self._run(clique + tri)
        assert set(got) == {(10, 11), (10, 12), (10, 13), (11, 12),
                            (11, 13), (12, 13)}
        assert all(v == 2 for v in got.values())

    def test_cascade_peel(self, ray_session):
        # two triangles sharing an edge: each edge has support >= 1
        # but a 4-truss needs 2 -> everything peels in cascade
        assert self._run([(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]) == {}

    def test_triangle_free(self, ray_session):
        assert self._run([(1, 2), (2, 3), (3, 4)]) == {}

    def test_k3_keeps_triangles(self, ray_session):
        got = self._run([(1, 2), (1, 3), (2, 3), (4, 5)], k=3)
        assert set(got) == {(1, 2), (1, 3), (2, 3)}

    def test_empty(self, ray_session):
        assert self._run([]) == {}


class TestBowtie:
    def _run(self, pairs):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            bowtie_classes,
        )

        return {r["entity_id"]: r["bowtie"]
                for r in bowtie_classes(_edges_ds(pairs)).take_all()}

    def test_matches_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            bowtie_reference,
        )

        import random

        rng = random.Random(3)
        pairs = [(rng.randrange(30), rng.randrange(30))
                 for _ in range(90)]
        assert self._run(pairs) == bowtie_reference(pairs)

    def test_textbook_bowtie(self, ray_session):
        # IN (1) -> core cycle (2,3,4) -> OUT (5); disconnected (8,9)
        pairs = [(1, 2), (2, 3), (3, 4), (4, 2), (4, 5), (8, 9)]
        got = self._run(pairs)
        assert got == {1: "IN", 2: "SCC", 3: "SCC", 4: "SCC",
                       5: "OUT", 8: "OTHER", 9: "OTHER"}

    def test_all_singletons_giant_is_min(self, ray_session):
        # DAG only: giant SCC = singleton with min id; its reach = OUT
        got = self._run([(7, 3), (3, 9)])
        assert got == {3: "SCC", 7: "IN", 9: "OUT"}

    def test_empty(self, ray_session):
        assert self._run([]) == {}


class TestTriadCensus:
    def _run(self, pairs):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triad_census,
        )

        return {r["triad"]: r["n"]
                for r in triad_census(_edges_ds(pairs)).take_all()}

    def test_matches_reference(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            triad_census_reference,
        )

        import random

        rng = random.Random(17)
        pairs = [(rng.randrange(18), rng.randrange(18))
                 for _ in range(110)]
        assert self._run(pairs) == triad_census_reference(pairs)

    def test_named_motifs(self, ray_session):
        # feed-forward loop
        assert self._run([(1, 2), (1, 3), (2, 3)]) == {"a3-trans": 1}
        # 3-cycle
        assert self._run([(1, 2), (2, 3), (3, 1)]) == {"a3-cycle": 1}
        # fully mutual triangle
        assert self._run([(1, 2), (2, 1), (1, 3), (3, 1),
                          (2, 3), (3, 2)]) == {"m3": 1}
        # mutual dyad + outsider pointing at both
        assert self._run([(1, 2), (2, 1), (3, 1), (3, 2)]) == {
            "m1-out": 1}
        # mutual dyad + both pointing at outsider
        assert self._run([(1, 2), (2, 1), (1, 3), (2, 3)]) == {
            "m1-in": 1}
        # mutual dyad + a path through the outsider
        assert self._run([(1, 2), (2, 1), (1, 3), (3, 2)]) == {
            "m1-thru": 1}

    def test_open_triads_excluded(self, ray_session):
        # wedge only (no closing edge): census is empty
        assert self._run([(1, 2), (2, 3)]) == {}

    def test_empty(self, ray_session):
        assert self._run([]) == {}


class TestDistantSupervisionCap:
    """Per-doc distinct-entity cap on pair generation (VERDICT r4 #4):
    a pathological doc must not materialize its quadratic pair set."""

    def test_5k_entity_doc_completes_under_cap_and_logs(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            _ds_pairgen_partition,
        )

        n = 5000
        df = pd.DataFrame({
            "doc_id": ["big"] * n + ["small"] * 3,
            "entity_id": list(range(n)) + [1, 2, 3],
        })
        with caplog.at_level(logging.WARNING):
            out = _ds_pairgen_partition(50)(df)
        # big: 50*49 ordered pairs, small: 3*2 — not 5000*4999
        assert len(out) == 50 * 49 + 3 * 2
        big = out[out["doc_id"] == "big"]
        assert big["src_id"].max() < 50  # cap keeps the LOWEST ids
        assert any("doc_entity_cap=50" in r.message for r in caplog.records)

    def test_cap_not_hit_is_silent_and_unchanged(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            _ds_pairgen_partition,
        )

        df = pd.DataFrame({
            "doc_id": ["d1"] * 4 + ["d2"] * 2,
            "entity_id": [1, 2, 3, 2, 7, 8],
        })
        with caplog.at_level(logging.WARNING):
            capped = _ds_pairgen_partition(50)(df)
        uncapped = _ds_pairgen_partition(10**9)(df)
        key = ["doc_id", "src_id", "dst_id"]
        assert (capped.sort_values(key).reset_index(drop=True)
                .equals(uncapped.sort_values(key).reset_index(drop=True)))
        assert not caplog.records

    def test_pipeline_end_to_end_with_cap(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            distant_supervision,
        )

        n = 3000
        mentions = rd.from_arrow(pa.table({
            "doc_id": ["big"] * n + ["small"] * 2,
            "entity_id": list(range(n)) + [1, 2],
        }))
        edges = rd.from_arrow(pa.table({
            "src_id": pa.array([1], pa.int64()),
            "rel_type": ["R"],
            "dst_id": pa.array([2], pa.int64()),
        }))
        triples = rd.from_arrow(pa.table({
            "doc_id": ["small"],
            "src_id": pa.array([1], pa.int64()),
            "rel_type": ["R"],
            "dst_id": pa.array([2], pa.int64()),
        }))
        out = distant_supervision(mentions, edges, triples,
                                  doc_entity_cap=50).to_pandas()
        got = sorted(out.itertuples(index=False))
        # both docs mention KB pair (1, R, 2); only "small" is provenance
        assert got == [("big", 1, "R", 2, 0), ("small", 1, "R", 2, 1)]
