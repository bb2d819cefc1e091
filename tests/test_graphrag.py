"""Query layer: retrieval semantics vs direct Python oracles.

Covers SURVEY.md §2.6 (T1 vector top-k, T3 hybrid blend, T4 MMR, T5
round-robin diversification), §2.4 J6 (k-hop expansion), §2.2 M13
(fact formatting with read-time dedup, graphutil.py:698-767)."""

import numpy as np
import pytest

from neo4j_document_pipeline_ray.functions.textnorm import normalize_name_for_key
from neo4j_document_pipeline_ray.pipelines import graphrag as gr


QUESTION = 'How does the "National Broadband Plan" support the Six Pillars rollout?'


class TestTermExtraction:
    def test_quoted_anchor(self):
        assert gr.anchor_terms(QUESTION)[0] == "National Broadband Plan"

    def test_titlecase_bigram_anchor(self):
        # bigram scan includes words inside the quoted phrase, like the
        # reference (graphutil.py:262-274 scans the whole question)
        assert gr.anchor_terms(QUESTION) == [
            "National Broadband Plan", "National Broadband", "Broadband Plan",
        ]
        assert gr.anchor_terms("the Six Pillars rollout") == ["Six Pillars"]

    def test_excluded_stopword_quotes(self):
        assert gr.anchor_terms('is "the" answer') == []

    def test_keyword_fallback_is_split(self):
        assert gr.keyword_terms("a b c d", max_terms=2) == ["a", "b"]


class TestMinmaxAndBlend:
    def test_minmax_degenerate_all_equal(self):
        # graphutil.py:192: degenerate channel maps to 0.5
        assert gr._minmax([2.0, 2.0]) == [0.5, 0.5]

    def test_minmax_range(self):
        assert gr._minmax([1.0, 3.0, 2.0]) == [0.0, 1.0, 0.5]


class TestLucene:
    def test_escape_specials(self):
        assert gr.sanitize_term_for_lucene("a+b") == "a\\+b"
        assert gr.sanitize_term_for_lucene('say "hi"') == 'say \\"hi\\"'
        assert gr.sanitize_term_for_lucene("path/to") == "path\\/to"

    def test_neutralize_booleans(self):
        assert gr.sanitize_term_for_lucene("cats AND dogs") == "cats \\AND dogs"
        assert gr.sanitize_term_for_lucene("sand") == "sand"  # word-boundary only

    def test_query_string(self):
        assert gr.fulltext_query_string(["Six Pillars", "plan"]) == (
            '"Six Pillars" OR plan'
        )
        assert gr.fulltext_query_string(["", "  "]) == ""


class TestMMR:
    def test_mmr_prefers_diverse(self):
        # two near-identical top candidates + one diverse: MMR picks the
        # diverse one second (lambda=0.7, sim penalty 0.3)
        cands = [
            {"entity_id": 1, "score": 1.0},
            {"entity_id": 2, "score": 0.99},
            {"entity_id": 3, "score": 0.80},
        ]
        embs = {
            1: np.array([1.0, 0.0], dtype=np.float32),
            2: np.array([1.0, 0.01], dtype=np.float32),
            3: np.array([0.0, 1.0], dtype=np.float32),
        }
        out = gr.mmr_select(cands, embs, k=2)
        assert [c["entity_id"] for c in out] == [1, 3]

    def test_mmr_score_only_without_embeddings(self):
        cands = [{"entity_id": i, "score": 1.0 - i / 10} for i in range(4)]
        out = gr.mmr_select(cands, {}, k=3)
        assert [c["entity_id"] for c in out] == [0, 1, 2]


class TestDiversify:
    def test_round_robin_by_doc(self):
        cands = [
            {"entity_id": 1, "score": 0.9},
            {"entity_id": 2, "score": 0.8},
            {"entity_id": 3, "score": 0.7},
            {"entity_id": 4, "score": 0.6},
        ]
        titles = {1: "A", 2: "A", 3: "B", 4: None}
        out = gr.diversify_by_document(cands, titles, k=4)
        # round 1: best of A (1), best of B (3), best of NO_DOC (4); round 2: 2
        assert [c["entity_id"] for c in out] == [1, 3, 4, 2]

    def test_one_seed_per_document(self):
        cands = [{"entity_id": i, "score": 1.0} for i in (1, 2, 3)]
        first = {1: "d1", 2: "d1", 3: None}
        assert gr.one_seed_per_document(cands, first) == [1, 3]


class TestFormat:
    def test_dedup_by_normalized_key_and_skip(self):
        node_info = {
            1: {"label": "Entity", "name": "Six Pillars"},
            2: {"label": "Entity", "name": "six pillars"},
            3: {"label": "Policy", "name": "Plan"},
        }
        rels = [
            {"src_id": 1, "dst_id": 3, "rel_type": "FUNDS", "source_text": "x"},
            {"src_id": 2, "dst_id": 3, "rel_type": "funds", "source_text": "y"},
            {"src_id": 1, "dst_id": 3, "rel_type": "MENTIONS"},
        ]
        txt = gr.format_graph_context({"rels": rels}, node_info)
        lines = txt.splitlines()
        assert lines[0] == "Graph Facts:"
        assert len(lines) == 2  # normalized dup + MENTIONS dropped
        assert 'Entity("Six Pillars") -[FUNDS]-> Policy("Plan")' in lines[1]
        assert '[snippet: "x"]' in lines[1]

    def test_snippet_truncation(self):
        node_info = {1: {"label": "A", "name": "a"}, 2: {"label": "B", "name": "b"}}
        rels = [{"src_id": 1, "dst_id": 2, "rel_type": "R", "source_text": "z" * 50}]
        txt = gr.format_graph_context({"rels": rels}, node_info, snippet_chars=10)
        assert '[snippet: "zzzzzzzzzz..."]' in txt

    def test_empty(self):
        assert gr.format_graph_context({"rels": []}, {}) == "Graph Facts: (no results)"


@pytest.fixture(scope="module")
def tables(kg_result):
    return kg_result


class TestDistributedChannels:
    def test_vector_topk_matches_numpy_oracle(self, ray_session, tables):
        qvec = gr.embed_question(QUESTION)
        got = gr.vector_topk(tables["nodes"], qvec, k=8).take_all()
        rows = tables["nodes"].select_columns(["entity_id", "embedding"]).take_all()
        q = np.asarray(qvec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = []
        for r in rows:
            v = np.asarray(r["embedding"], dtype=np.float64)
            sims.append((round(float(v @ q / (np.linalg.norm(v) or 1.0)), 6),
                         r["entity_id"]))
        want = sorted(sims, key=lambda t: (-t[0], t[1]))[:8]
        assert [(g["score"], g["entity_id"]) for g in got] == want

    def test_keyword_topk_scores(self, ray_session, tables):
        got = gr.keyword_topk(tables["nodes"], QUESTION, k=12).take_all()
        assert got, "expected keyword hits on corpus entity names"
        # verify each returned score against a direct recompute
        anchors, terms = gr._query_terms(QUESTION)
        toks = {t for term in terms for t in normalize_name_for_key(term).split()}
        phrases = {normalize_name_for_key(a) for a in anchors if " " in a}
        for h in got:
            norm = normalize_name_for_key(h["name"])
            want = float(len(set(norm.split()) & toks)) + sum(
                1.0 for p in phrases if p and p in norm
            )
            assert h["score"] == want
        scores = [h["score"] for h in got]
        assert scores == sorted(scores, reverse=True)

    def test_bm25_topk_matches_python_oracle(self, ray_session, tables):
        """Recompute Lucene-default BM25 over all node names in plain
        Python and compare the distributed top-k exactly."""
        got = gr.bm25_topk(tables["nodes"], QUESTION, k=12).take_all()
        assert got, "expected BM25 hits on corpus entity names"
        toks, phrases = gr._bm25_query(QUESTION)
        rows = tables["nodes"].select_columns(
            ["entity_id", "norm_key"]).take_all()
        n = len(rows)
        dls = {r["entity_id"]: len((r["norm_key"] or "").split())
               for r in rows}
        avgdl = sum(dls.values()) / n
        df_tok = {t: sum(1 for r in rows if t in (r["norm_key"] or "").split())
                  for t in toks}
        df_phr = {p: sum(1 for r in rows
                         if f" {p} " in f" {r['norm_key']} ")
                  for p in phrases}
        k1, b = 1.2, 0.75

        def idf(df):
            return float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))

        scores = {}
        for r in rows:
            key = r["norm_key"] or ""
            dl = dls[r["entity_id"]]
            norm = k1 * (1.0 - b + b * dl / avgdl)
            s = 0.0
            for t in toks:
                if df_tok[t] == 0:
                    continue
                tf = key.split().count(t)
                if tf:
                    s += idf(df_tok[t]) * (tf * (k1 + 1.0)) / (tf + norm)
            for p in phrases:
                if df_phr[p] and f" {p} " in f" {key} ":
                    s += idf(df_phr[p]) * (k1 + 1.0) / (1.0 + norm)
            if s > 0:
                scores[r["entity_id"]] = round(s, 6)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
        assert [(h["entity_id"], h["score"]) for h in got] == want

    def test_bm25_anchor_still_hits_with_junk_keywords(self, ray_session, tables):
        """Degenerate keywords must not mask a matching quoted anchor —
        the reference reaches this via the anchors-only retry
        (graphutil.py:330-344); here the main query subsumes the anchor
        terms, so the same question succeeds on the first pass."""
        q = 'zzqx wvut kjhg "Six Pillars" qqyyzz'
        got = gr.bm25_topk(tables["nodes"], q, k=5).take_all()
        assert got, "anchor tokens should produce hits"
        names = {normalize_name_for_key(h["name"]) for h in got}
        assert any("6 pillars" in nm for nm in names)

    def test_bm25_index_matches_scan(self, ray_session, tables, tmp_path):
        """The persisted (token, df) index + meta must reproduce the
        two-pass scan result exactly."""
        idx = str(tmp_path / "text_index")
        meta = gr.build_text_index(tables["nodes"], idx)
        assert meta["n"] == tables["nodes"].count()
        got = gr.bm25_index_topk(tables["nodes"], idx, QUESTION, k=12).take_all()
        want = gr.bm25_topk(tables["nodes"], QUESTION, k=12).take_all()
        assert [(r["entity_id"], r["score"]) for r in got] == [
            (r["entity_id"], r["score"]) for r in want
        ]

    def test_hybrid_via_text_index_identical(self, ray_session, tables, tmp_path):
        idx = str(tmp_path / "ti")
        gr.build_text_index(tables["nodes"], idx)
        qvec = gr.embed_question(QUESTION)
        a = gr.hybrid_candidates(tables["nodes"], QUESTION, qvec)
        b = gr.hybrid_candidates(tables["nodes"], QUESTION, qvec,
                                 text_index_dir=idx)
        assert a == b

    def test_vector_index_topk_matches_probed_scan(self, ray_session, tables,
                                                   tmp_path):
        """The node-ANN index is APPROXIMATE (it reads only the probed
        LSH bucket partitions); within that candidate set it must
        reproduce the exact scorer bit-for-bit — same rounded-float64
        kernel, same (score desc, entity_id asc) tie-break — and return
        vector_topk's drop-in schema."""
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.similarity import (
            probe_partition_files,
        )

        idx = str(tmp_path / "node_ann")
        meta = gr.build_node_ann_index(tables["nodes"], idx)
        assert meta["payload_cols"] == ["label", "name"]
        assert meta["n_rows"] == tables["nodes"].count()
        qvec = gr.embed_question(QUESTION)
        got = gr.vector_index_topk(idx, qvec, k=8, multiprobe=2).take_all()
        assert got and set(got[0].keys()) == {
            "entity_id", "label", "name", "score"}

        files = probe_partition_files(idx, np.asarray(qvec), multiprobe=2)
        probed = set()
        for f in files:
            probed.update(pq.read_table(f, columns=["vec_id"])
                          ["vec_id"].to_pylist())
        q = np.asarray(qvec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = []
        for r in tables["nodes"].select_columns(
                ["entity_id", "embedding"]).take_all():
            if r["entity_id"] not in probed:
                continue
            v = np.asarray(r["embedding"], dtype=np.float64)
            sims.append((round(float(v @ q / (np.linalg.norm(v) or 1.0)), 6),
                         r["entity_id"]))
        want = sorted(sims, key=lambda t: (-t[0], t[1]))[:8]
        assert [(g["score"], g["entity_id"]) for g in got] == want

    def test_vector_index_recalls_planted_neighbor(self, ray_session,
                                                   tmp_path):
        """A vector nearly parallel to the query must land in a probed
        bucket and come back first — the locality the LSH layout exists
        to exploit (isotropic hash embeddings carry none, so recall is
        asserted on planted structure, like emb_near_dup's oracle)."""
        import pyarrow as pa
        import ray.data as rd

        qvec = np.asarray(gr.embed_question(QUESTION), dtype=np.float64)
        rng = np.random.default_rng(7)
        n, dim = 300, len(qvec)
        mat = rng.standard_normal((n, dim))
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        planted = qvec / np.linalg.norm(qvec) + 0.05 * rng.standard_normal(dim)
        nodes = rd.from_arrow(pa.table({
            "entity_id": pa.array(list(range(n)) + [999], pa.int64()),
            "label": pa.array(["Entity"] * (n + 1), pa.string()),
            "name": pa.array([f"e{i}" for i in range(n)] + ["planted"],
                             pa.string()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in mat]
                + [planted.astype(np.float32).tolist()],
                pa.list_(pa.float32())),
        }))
        idx = str(tmp_path / "planted_ann")
        gr.build_node_ann_index(nodes, idx)
        got = gr.vector_index_topk(idx, qvec, k=3, multiprobe=1).take_all()
        assert got[0]["entity_id"] == 999 and got[0]["name"] == "planted"

    def test_bm25_index_serves_anchor_phrase_without_scan(
            self, ray_session, tables, tmp_path, monkeypatch):
        """A quoted anchor phrase within the index's max_gram must be
        served from the persisted n-gram df table — the corpus-stats
        scan must NOT run (round-2 verdict: phrase df fell back to a
        full scan; Lucene serves it from positional postings,
        graphutil.py:306-359)."""
        idx = str(tmp_path / "ti_phrase")
        meta = gr.build_text_index(tables["nodes"], idx)
        assert meta["max_gram"] >= 2
        q = 'zzqx wvut kjhg "Six Pillars" qqyyzz'
        want = gr.bm25_topk(tables["nodes"], q, k=12).take_all()
        assert want, "anchor phrase should hit"

        def boom(*a, **k):
            raise AssertionError("corpus-stats scan ran for an indexed phrase")

        monkeypatch.setattr(gr, "_bm25_corpus_stats", boom)
        got = gr.bm25_index_topk(tables["nodes"], idx, q, k=12).take_all()
        assert [(r["entity_id"], r["score"]) for r in got] == [
            (r["entity_id"], r["score"]) for r in want]

    def test_bm25_long_phrase_df0_shortcut_without_scan(
            self, ray_session, tables, tmp_path, monkeypatch):
        """A quoted anchor LONGER than every name in the corpus has
        df = 0 by definition — the index must shortcut via the recorded
        max_name_len instead of scanning, and the result must equal the
        scan-path bm25_topk (round-3 verdict #8: no silent corpus scan
        on any quoted-anchor query)."""
        idx = str(tmp_path / "ti_long_phrase")
        meta = gr.build_text_index(tables["nodes"], idx)
        assert meta["max_name_len"] >= 1
        # anchor with more tokens than any name can contain
        long_anchor = " ".join(["pillar"] * (meta["max_name_len"] + 2))
        q = f'broadband plan "{long_anchor}" society'
        want = gr.bm25_topk(tables["nodes"], q, k=12).take_all()

        def boom(*a, **k):
            raise AssertionError(
                "corpus-stats scan ran for a phrase longer than every "
                "name (df=0 shortcut missing)")

        monkeypatch.setattr(gr, "_bm25_corpus_stats", boom)
        got = gr.bm25_index_topk(tables["nodes"], idx, q, k=12).take_all()
        assert [(r["entity_id"], r["score"]) for r in got] == [
            (r["entity_id"], r["score"]) for r in want]

    def test_bm25_midrange_phrase_scan_is_logged(
            self, ray_session, tables, tmp_path, monkeypatch, caplog):
        """The only remaining scan sliver — phrase longer than max_gram
        but within max_name_len — must be LOGGED, never silent."""
        import logging

        idx = str(tmp_path / "ti_mid_phrase")
        gr.build_text_index(tables["nodes"], idx)
        # shrink the recorded max_gram so a 3-token anchor falls in the
        # (max_gram, max_name_len] sliver
        import json
        import os

        mp = os.path.join(idx, "_meta.json")
        with open(mp) as f:
            meta = json.load(f)
        meta["max_gram"] = 1
        meta["max_name_len"] = 99
        with open(mp, "w") as f:
            json.dump(meta, f)
        q = 'broadband "national broadband plan" society'
        want = gr.bm25_topk(tables["nodes"], q, k=12).take_all()
        with caplog.at_level(logging.WARNING,
                             logger="neo4j_document_pipeline_ray"
                                    ".pipelines.graphrag"):
            got = gr.bm25_index_topk(tables["nodes"], idx, q,
                                     k=12).take_all()
        assert any("corpus-stats scan" in r.message for r in caplog.records)
        assert [(r["entity_id"], r["score"]) for r in got] == [
            (r["entity_id"], r["score"]) for r in want]

    def test_bm25_all_miss_returns_empty(self, ray_session, tables):
        """Full miss (keywords AND quoted anchor unknown): the retry
        path executes and still yields an empty result, not an error."""
        q = 'zzqx wvut "qqyyzz aabbcc" kjhg'
        assert gr.bm25_topk(tables["nodes"], q, k=5).count() == 0

    def test_traverse_matches_python_bfs(self, ray_session, tables):
        edges = tables["edges"].select_columns(
            ["src_id", "dst_id", "rel_type", "term"]
        ).take_all()
        adj: dict = {}
        for e in edges:
            adj.setdefault(e["src_id"], set()).add(e["dst_id"])
            adj.setdefault(e["dst_id"], set()).add(e["src_id"])
        seeds = sorted(adj)[:2]
        for hops in (1, 2):
            got = gr.traverse_neighbors(tables["edges"], seeds, max_hops=hops)
            visited = set(seeds)
            frontier = set(seeds)
            for _ in range(hops):
                nxt = set()
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in visited:
                            visited.add(v)
                            nxt.add(v)
                frontier = nxt
            assert got["node_ids"] == sorted(visited), hops

    def test_traverse_hop_clamp(self, ray_session, tables):
        seeds = [tables["edges"].take(1)[0]["src_id"]]
        a = gr.traverse_neighbors(tables["edges"], seeds, max_hops=3)
        b = gr.traverse_neighbors(tables["edges"], seeds, max_hops=9)
        assert a["node_ids"] == b["node_ids"]


class TestEndToEnd:
    def test_graphrag_deterministic(self, ray_session, tables):
        r1 = gr.graphrag(tables, QUESTION, top_k=4, hops=1)
        r2 = gr.graphrag(tables, QUESTION, top_k=4, hops=1)
        assert r1["facts"] == r2["facts"]
        assert r1["seeds"] == r2["seeds"]
        assert r1["facts"].startswith("Graph Facts:")
        assert r1["n_rels"] > 0

    def test_seed_docs_distinct(self, ray_session, tables):
        res = gr.graphrag(tables, QUESTION, top_k=5, hops=1)
        first = gr.first_doc_for_nodes(tables["mentions"], res["seeds"])
        docs = [first[s] or str(s) for s in res["seeds"]]
        assert len(docs) == len(set(docs))


class TestLocalKG:
    """The size-gated serving fast path must be bit-identical to the
    distributed steps (shared kernels) and degrade tier-by-tier."""

    @pytest.fixture(scope="class")
    def loc(self, ray_session, tables):
        from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

        got = LocalKG.maybe_pull(tables, 256 << 20)
        assert got is not None
        return got

    def test_all_tiers_pulled_at_generous_budget(self, loc):
        assert loc.has_edges and loc.has_mentions and loc.has_titles
        assert loc.edge_payload is not None

    def test_vector_channel_identical(self, ray_session, tables, loc):
        qvec = gr.embed_question(QUESTION)
        dist = gr.vector_topk(tables["nodes"], qvec, k=8).take_all()
        assert loc.vector_topk(qvec, k=8) == dist

    def test_bm25_channel_identical(self, ray_session, tables, loc):
        dist = gr.bm25_topk(tables["nodes"], QUESTION, k=12).take_all()
        assert loc.bm25_topk(QUESTION, k=12) == dist

    def test_provenance_identical(self, ray_session, tables, loc):
        ids = [r["entity_id"] for r in tables["nodes"].take(20)]
        assert loc.first_doc(ids) == gr.first_doc_for_nodes(
            tables["mentions"], ids)
        assert loc.doc_titles(ids) == gr.doc_titles_for_nodes(
            tables["mentions"], tables["docs"], ids)

    def test_traverse_identical(self, ray_session, tables, loc):
        seeds = [tables["edges"].take(1)[0]["src_id"]]
        for hops in (1, 2):
            a = loc.traverse(seeds, hops)
            b = gr.traverse_neighbors(tables["edges"], seeds, max_hops=hops)
            assert a["node_ids"] == b["node_ids"], hops
            assert a["rels"] == b["rels"], hops

    def test_graphrag_end_to_end_identical(self, ray_session, tables, loc):
        dist = gr.graphrag(tables, QUESTION, top_k=5, hops=2)
        local = gr.graphrag(tables, QUESTION, top_k=5, hops=2, local_kg=loc)
        for key in ("facts", "seeds", "candidates", "n_nodes", "n_rels"):
            assert local[key] == dist[key], key

    def test_tiny_budget_returns_none(self, ray_session, tables):
        from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

        assert LocalKG.maybe_pull(tables, 10) is None

    def test_partial_budget_drops_payload_but_stays_identical(
            self, ray_session, tables, loc):
        """Budget sized so nodes + id-pairs + mentions + docs fit but
        the edge payload does not: BFS runs locally, the payload fetch
        falls back to the distributed job, results unchanged."""
        from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

        essentials = (loc.nodes.nbytes
                      + (loc.edge_payload.nbytes // 4))
        part = LocalKG.maybe_pull(tables, essentials)
        if part is None or part.edge_payload is not None:
            pytest.skip("corpus too small to split the tiers at this budget")
        assert part.has_edges
        dist = gr.graphrag(tables, QUESTION, top_k=5, hops=2)
        local = gr.graphrag(tables, QUESTION, top_k=5, hops=2, local_kg=part)
        for key in ("facts", "seeds", "candidates", "n_nodes", "n_rels"):
            assert local[key] == dist[key], key


class TestGraphRAGBatchServing:
    def test_batch_matches_per_question(self, ray_session, tables):
        import pyarrow as pa
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graphrag_local import (
            LocalKG,
            graphrag_serve_batch,
        )

        questions = [
            QUESTION,
            "Who announced the National Broadband Plan?",
            "What is the capital of Malaysia?",
        ]
        qds = rd.from_arrow(pa.table({
            "question_id": pa.array(list(range(len(questions))), pa.int64()),
            "question": pa.array(questions, pa.string()),
        }))
        got = {r["question_id"]: r for r in graphrag_serve_batch(
            tables, qds, top_k=5, hops=2, concurrency=2).take_all()}

        loc = LocalKG.maybe_pull(tables, 256 << 20)
        for i, q in enumerate(questions):
            res = gr.graphrag(tables, q, top_k=5, hops=2, local_kg=loc)
            assert got[i]["n_nodes"] == res["n_nodes"]
            assert got[i]["n_rels"] == res["n_rels"]
            assert got[i]["seeds_csv"] == ",".join(
                str(int(s)) for s in res["seeds"])
            lines = res["facts"].splitlines()
            assert got[i]["first_fact"] == (lines[1] if len(lines) > 1 else "")

    def test_oversized_budget_raises(self, ray_session, tables):
        import pyarrow as pa
        import ray.data as rd
        import pytest as _pytest

        from neo4j_document_pipeline_ray.pipelines.graphrag_local import (
            graphrag_serve_batch,
        )

        qds = rd.from_arrow(pa.table({
            "question_id": pa.array([0], pa.int64()),
            "question": pa.array([QUESTION], pa.string()),
        }))
        with _pytest.raises(ValueError):
            graphrag_serve_batch(tables, qds, max_bytes=1024)


class TestGraphragSeeds:
    """The oracle-checked /graphrag decision core (kg_graphrag_seeds):
    structural invariants beyond the SQL hash gate."""

    def test_seed_chain_invariants(self, ray_session):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entrymod

        df = entrymod.queries()["kg_graphrag_seeds"](
            "/root/testdata/sf0.001")
        assert list(df.columns) == [
            "rank", "entity_id", "label", "name", "score", "is_seed"]
        assert len(df) == 5  # MMR k
        assert list(df["rank"]) == list(range(5))
        assert df["entity_id"].is_unique
        assert df["is_seed"].isin([0, 1]).all()
        assert df["is_seed"].sum() >= 1
        # the decision core must agree with the full graphrag() flow:
        # its seeds are exactly the rows flagged is_seed
        from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag

        res = graphrag(entrymod._kg("/root/testdata/sf0.001"),
                       entrymod._QUESTION, top_k=5, hops=2)
        assert sorted(res["seeds"]) == sorted(
            df.loc[df["is_seed"] == 1, "entity_id"])
        # deterministic across runs
        df2 = entrymod.queries()["kg_graphrag_seeds"](
            "/root/testdata/sf0.001")
        assert df.equals(df2)
