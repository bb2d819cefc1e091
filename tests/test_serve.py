"""Online serving daemon: the reference's FastAPI surface (main.py
/graphrag with semaphore admission, /healthz, /queue_status,
/graph/stats, /graph/schema, /graph/search, /documents) re-expressed
over the snapshot query layer — end-to-end over real HTTP."""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

QUESTION = 'How does the "National Broadband Plan" support the Six Pillars rollout?'


@pytest.fixture(scope="module")
def service(ray_session, kg_result):
    from neo4j_document_pipeline_ray.serve import GraphRAGService

    tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions", "docs")}
    return GraphRAGService(tables, max_concurrent=4)


@pytest.fixture(scope="module")
def base_url(service):
    from neo4j_document_pipeline_ray.serve import make_server

    httpd = make_server(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


class TestReadEndpoints:
    def test_healthz_reports_node_count(self, base_url, service):
        status, out = _get(base_url + "/healthz")
        assert status == 200
        assert out["success"] is True
        assert out["nodes"] == service.tables["nodes"].count()

    def test_queue_status_idle(self, base_url):
        _, out = _get(base_url + "/queue_status")
        assert out == {"success": True, "active_requests": 0,
                       "queued_requests": 0, "max_concurrent": 4,
                       "available_slots": 4}

    def test_graph_stats_matches_tables(self, base_url, service):
        _, out = _get(base_url + "/graph/stats")
        assert out["node_count"] == service.tables["nodes"].count()
        assert out["relationship_count"] == service.tables["edges"].count()
        # per-label counts must re-add to the node count
        assert sum(out["labels"].values()) == out["node_count"]
        assert sum(out["relationship_types"].values()) == out["relationship_count"]

    def test_graph_schema_covers_every_edge(self, base_url, service):
        _, out = _get(base_url + "/graph/schema")
        rows = out["schema"]
        assert rows and all(
            set(r) == {"src_label", "rel_type", "dst_label", "n_edges"}
            for r in rows)
        # every edge lands in exactly one (src,rel,dst) bucket: endpoints
        # always resolve (integrity pinned elsewhere), so the sums match
        assert sum(r["n_edges"] for r in rows) == service.tables["edges"].count()

    def test_documents_counts_match_mentions(self, base_url, service):
        _, out = _get(base_url + "/documents?limit=10000")
        docs = out["documents"]
        assert out["total"] == service.tables["docs"].count()
        assert len(docs) == out["total"]
        # mentions is distinct (doc_id, entity_id): totals must re-add
        assert sum(d["entity_count"] for d in docs) == \
            service.tables["mentions"].count()
        # spot-check one doc against a direct count (tiny test corpus)
        target = next(d for d in docs if d["entity_count"] > 0)
        mentions = service.tables["mentions"].select_columns(["doc_id"]).to_pandas()
        assert (mentions["doc_id"] == target["doc_id"]).sum() == \
            target["entity_count"]

    def test_search_substring_case_insensitive(self, base_url):
        _, out = _get(base_url + "/graph/search?property_name=name"
                      "&property_value=NATIONAL&limit=5")
        ents = out["results"]["entities"]
        assert 0 < len(ents) <= 5
        assert all("national" in e["name"].lower() for e in ents)

    def test_search_label_filter(self, base_url, service):
        import pyarrow.compute as pc  # noqa: F401

        label = service.tables["nodes"].take(1)[0]["label"]
        _, out = _get(base_url + "/graph/search?property_name=name"
                      f"&property_value=a&label={label}&limit=5")
        assert all(e["label"] == label for e in out["results"]["entities"])

    def test_search_requires_params(self, base_url):
        _, out = _get(base_url + "/graph/search?property_name=name")
        assert out["success"] is False

    def test_unknown_route_404(self, base_url):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base_url + "/nope")
        assert ei.value.code == 404


class TestGraphRAGEndpoint:
    def test_parity_with_direct_call(self, base_url, service):
        from neo4j_document_pipeline_ray.pipelines import graphrag as gr

        _, out = _post(base_url + "/graphrag",
                       {"question": QUESTION, "top_k": 5, "hops": 2})
        assert out["success"] is True
        direct = gr.graphrag(service.tables, QUESTION, top_k=5, hops=2,
                             local_kg=service.local_kg)
        assert out["facts"] == direct["facts"]
        assert out["n_nodes"] == direct["n_nodes"]
        assert out["n_rels"] == direct["n_rels"]
        assert [int(s) for s in out["seeds"]] == [int(s) for s in direct["seeds"]]

    def test_empty_question_in_band_error(self, base_url):
        status, out = _post(base_url + "/graphrag", {"question": "   "})
        assert status == 200  # main.py:249 replies success=False, not 4xx
        assert out["success"] is False
        assert "question" in out["message"].lower()

    def test_malformed_json_is_400(self, base_url):
        req = urllib.request.Request(
            base_url + "/graphrag", data=b"{not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


class TestFromSnapshot:
    def test_snapshot_dir_round_trip(self, ray_session, snap_copy):
        """The `cli serve` path: load a built snapshot from disk and
        answer a query through the admission gate."""
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        svc = GraphRAGService.from_snapshot(snap_copy[0], max_concurrent=2)
        assert svc.healthz()["nodes"] > 0
        out = svc.graphrag_request({"question": QUESTION, "top_k": 5, "hops": 2})
        assert out["success"] is True
        assert out["n_nodes"] > 0 and out["facts"]


class TestAdminEndpoints:
    def test_test_endpoint_bare_node_count(self, base_url, service):
        """GET /test (main.py:66-70) replies {"nodes": n} with no
        success key — the reference's exact contract."""
        _, out = _get(base_url + "/test")
        assert out == {"nodes": service.tables["nodes"].count()}

    def test_debug_search(self, base_url, service):
        _, out = _post(base_url + "/debug-search", {"question": QUESTION})
        assert out["success"] is True
        assert out["hybrid_results_count"] > 0
        assert out["label_counts"] and sorted(out["label_counts"]) == \
            out["existing_labels"]
        assert sum(out["label_counts"].values()) == \
            service.tables["nodes"].count()

    def test_drop_all_requires_confirmation(self, base_url):
        _, out = _post(base_url + "/drop-all", {"confirmation": False})
        assert out["success"] is False
        assert "Confirmation required" in out["message"]

    def test_drop_all_wipes_snapshot_and_serves_empty(
            self, ray_session, snap_copy):
        import os

        from neo4j_document_pipeline_ray.serve import GraphRAGService

        snap_dir, cfg = snap_copy
        svc = GraphRAGService.from_snapshot(snap_dir, cfg=cfg,
                                            max_concurrent=2)
        before = svc.tables["nodes"].count()
        out = svc.drop_all(confirmation=True)
        assert out["success"] is True
        assert out["nodes_before"] == before > 0
        assert out["nodes_after"] == 0
        assert not os.path.isdir(snap_dir)  # tables deleted on disk
        # the emptied service still answers everything, with zero rows
        assert svc.healthz()["nodes"] == 0
        assert svc.graph_stats()["relationship_count"] == 0
        rag = svc.graphrag_request({"question": QUESTION})
        assert rag["success"] is False or rag["n_nodes"] == 0


class TestIngest:
    @pytest.fixture()
    def ingest_env(self, ray_session, small_corpus, tmp_path_factory):
        """Private writable pages dir + a snapshot built from it."""
        import shutil

        from neo4j_document_pipeline_ray.config import PipelineConfig
        from neo4j_document_pipeline_ray.pipelines.snapshot import (
            build_snapshot,
        )

        root = tmp_path_factory.mktemp("ingestenv")
        pages = str(root / "pages")
        shutil.copytree(small_corpus["pages"], pages)
        cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                             join_partitions=4, entity_buckets=4)
        snap = str(root / "snap")
        build_snapshot(pages, snap, cfg, shard_files=1)
        return pages, snap, cfg

    def _wait_done(self, svc, job_id, timeout_s=180):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            st = svc.ingest_status(job_id)
            if st["state"] in ("SUCCESS", "FAILURE"):
                return st
            time.sleep(0.5)
        raise AssertionError("ingest job did not finish")

    def test_ingest_folds_incrementally_and_hot_swaps(self, ingest_env):
        """POST /ingest (main.py:479-494): a staged pages file folds into
        the committed snapshot via the O(delta) incremental path and the
        daemon serves the new docs without restart."""
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.serve import GraphRAGService
        from neo4j_document_pipeline_ray.sources.corpus import pages_batch

        pages, snap, cfg = ingest_env
        svc = GraphRAGService.from_snapshot(
            snap, cfg=cfg, max_concurrent=2, pages_dir=pages, shard_files=1)
        docs_before = svc.tables["docs"].count()

        # 20 genuinely NEW pages (indexes past the committed corpus)
        delta = "/tmp/serve_ingest_delta.parquet"
        pq.write_table(pages_batch(list(range(150, 170)), seed=42), delta)
        out = svc.ingest({"path": delta})
        assert out["success"] is True and out["job_id"]

        st = self._wait_done(svc, out["job_id"])
        assert st["state"] == "SUCCESS", st
        assert st["result"]["stage_b_mode"] == "incremental"
        assert st["result"]["shards_skipped_on_resume"] == 3  # committed prefix

        docs_after = svc.tables["docs"].count()
        assert docs_after == docs_before + 20
        assert svc.healthz()["nodes"] == svc.tables["nodes"].count()
        rag = svc.graphrag_request({"question": QUESTION, "hops": 2})
        assert rag["success"] is True and rag["n_nodes"] > 0

        # second fold over the SAME pages is a no-op resume (MERGE analog)
        out2 = svc.ingest({"rows": [{
            "url": "https://synth.test/manual/page-x",
            "html": "<html><body><p>Plain page.</p></body></html>",
            "lang": "en",
        }]})
        st2 = self._wait_done(svc, out2["job_id"])
        assert st2["state"] == "SUCCESS", st2
        assert svc.tables["docs"].count() == docs_after + 1

    def test_staged_filenames_do_not_compound(self, ingest_env):
        """Repeated uploads must not grow the staged filename (the old
        stem-of-last-file scheme hit NAME_MAX after ~30 ingests), must
        keep strict sort-after ordering, and a fresh service over the
        same dir must not reuse a taken sequence number (restart
        safety)."""
        import os

        from neo4j_document_pipeline_ray.serve import GraphRAGService

        pages, snap, cfg = ingest_env
        svc = GraphRAGService.from_snapshot(
            snap, cfg=cfg, max_concurrent=2, pages_dir=pages, shard_files=1)
        names = []
        for _ in range(3):
            p = svc._next_upload_path()
            open(p, "wb").close()  # occupy the name like a real upload
            names.append(os.path.basename(p))
        assert len(names[0]) == len(names[1]) == len(names[2])
        listing = sorted(os.listdir(pages))
        assert listing[-3:] == names  # strictly after the corpus files
        svc2 = GraphRAGService.from_snapshot(
            snap, cfg=cfg, max_concurrent=2, pages_dir=pages, shard_files=1)
        nxt = os.path.basename(svc2._next_upload_path())
        assert nxt not in names and nxt > names[-1]
        for n in names:  # leave the shared fixture dir as we found it
            os.unlink(os.path.join(pages, n))

    def test_ingest_after_drop_all_adds_only_the_upload(self, ingest_env):
        """Reference semantics (main.py:118-155 + 479-494): after a
        confirmed drop-all, an ingest populates the cleared graph with
        ONLY the uploaded pages — the old corpus must not resurrect
        through the fold."""
        from neo4j_document_pipeline_ray.serve import GraphRAGService
        from neo4j_document_pipeline_ray.sources.corpus import pages_batch

        import pyarrow.parquet as pq

        pages, snap, cfg = ingest_env
        svc = GraphRAGService.from_snapshot(
            snap, cfg=cfg, max_concurrent=2, pages_dir=pages, shard_files=1)
        assert svc.drop_all(confirmation=True)["success"] is True
        assert svc.tables["docs"].count() == 0

        delta = "/tmp/serve_ingest_postwipe.parquet"
        pq.write_table(pages_batch(list(range(200, 205)), seed=42), delta)
        out = svc.ingest({"path": delta})
        assert out["success"] is True
        st = self._wait_done(svc, out["job_id"])
        assert st["state"] == "SUCCESS", st
        assert svc.tables["docs"].count() == 5  # uploads only, no corpus

    def test_ingest_refreshes_persisted_indexes(self, ingest_env):
        """A fold changes the nodes table; any persisted text index the
        daemon serves must be rebuilt in the same job, or the indexed
        BM25 path diverges from the scan (stale df, missing entities)."""
        import os

        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.pipelines import graphrag as gr
        from neo4j_document_pipeline_ray.serve import GraphRAGService
        from neo4j_document_pipeline_ray.sources.corpus import pages_batch

        pages, snap, cfg = ingest_env
        idx = os.path.join(snap, "text_index")
        import ray.data as rd

        gr.build_text_index(
            rd.read_parquet(os.path.join(snap, "nodes")).materialize(), idx)
        svc = GraphRAGService.from_snapshot(
            snap, cfg=cfg, max_concurrent=2, pages_dir=pages, shard_files=1)
        assert svc.text_index_dir == idx

        delta = "/tmp/serve_ingest_idx.parquet"
        pq.write_table(pages_batch(list(range(300, 310)), seed=42), delta)
        st = self._wait_done(svc, svc.ingest({"path": delta})["job_id"])
        assert st["state"] == "SUCCESS", st

        # indexed path == scan path over the POST-fold nodes table
        nodes = svc.tables["nodes"]
        scan = gr.bm25_topk(nodes, QUESTION, k=12).take_all()
        indexed = gr.bm25_index_topk(nodes, idx, QUESTION, k=12).take_all()
        assert indexed == scan

    def test_ingest_disabled_without_pages_dir(self, ray_session, kg_result):
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions",
                                            "docs")}
        svc = GraphRAGService(tables, max_concurrent=2)
        out = svc.ingest({"rows": [{"url": "u", "html": "<p>x</p>"}]})
        assert out["success"] is False and "disabled" in out["message"]

    def test_ingest_status_contract(self, ray_session, kg_result):
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions",
                                            "docs")}
        svc = GraphRAGService(tables, max_concurrent=2)
        missing = svc.ingest_status(None)
        assert missing["success"] is False
        assert "job_id" in missing["message"]
        # unknown ids report PENDING, like Celery AsyncResult
        unknown = svc.ingest_status("no-such-job")
        assert unknown["success"] is True and unknown["state"] == "PENDING"
        stats = svc.queue_stats()
        assert stats["success"] is True
        assert stats["stats"]["total_in_progress"] == 0
        assert stats["stats"]["worker_count"] == 0


class TestReplicas:
    def test_replica_answers_match_in_process(self, ray_session, kg_result):
        """replicas=2 fans /graphrag to single-process Ray actors holding
        shared object-store tier copies; answers must be bit-identical to
        the in-process LocalKG path, across several questions so the
        round-robin provably hits BOTH replicas."""
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions", "docs")}
        solo = GraphRAGService(tables, max_concurrent=4)
        repl = GraphRAGService(tables, max_concurrent=4, replicas=2)
        assert repl._replicas is not None and len(repl._replicas) == 2

        names = [r["name"] for r in tables["nodes"].limit(3).take_all()]
        questions = [QUESTION] + [f'What is "{n}" connected to?' for n in names]
        for q in questions:
            body = {"question": q, "top_k": 5, "hops": 2}
            a = solo.graphrag_request(dict(body))
            b = repl.graphrag_request(dict(body))
            assert a["success"] and b["success"]
            assert b["facts"] == a["facts"]
            assert b["n_nodes"] == a["n_nodes"]
            assert b["n_rels"] == a["n_rels"]
            assert [int(s) for s in b["seeds"]] == [int(s) for s in a["seeds"]]

    def test_replicas_refused_when_tiers_missing(self, ray_session, kg_result):
        """local_budget=0 (no local tier) must silently fall back to the
        distributed in-process path rather than build broken replicas."""
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions", "docs")}
        svc = GraphRAGService(tables, max_concurrent=2, local_budget=0,
                              replicas=2)
        assert svc._replicas is None


class TestAdmission:
    def test_semaphore_caps_concurrency(self, ray_session, kg_result):
        """4 concurrent requests against max_concurrent=1: all succeed,
        but at most one is ever inside the query flow (main.py:232-245),
        and /queue_status sees the queue build up."""
        from neo4j_document_pipeline_ray.serve import GraphRAGService

        tables = {k: kg_result[k] for k in ("nodes", "edges", "mentions", "docs")}
        svc = GraphRAGService(tables, max_concurrent=1, local_budget=0)

        lock = threading.Lock()
        state = {"inside": 0, "peak": 0}

        def slow_stub(st, body, question):
            with lock:
                state["inside"] += 1
                state["peak"] = max(state["peak"], state["inside"])
            time.sleep(0.15)
            with lock:
                state["inside"] -= 1
            return {"facts": "stub", "seeds": [], "candidates": [],
                    "n_nodes": 0, "n_rels": 0, "timings_s": {}}

        svc._run_graphrag = slow_stub
        results, statuses = [], []

        def worker():
            results.append(svc.graphrag_request({"question": "q"}))

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        time.sleep(0.05)  # mid-flight: 1 active, others queued
        statuses.append(svc.queue_status())
        for t in threads:
            t.join()

        assert state["peak"] == 1
        assert all(r["success"] for r in results)
        mid = statuses[0]
        assert mid["active_requests"] == 1
        assert mid["queued_requests"] >= 1
        idle = svc.queue_status()
        assert idle["active_requests"] == 0 and idle["queued_requests"] == 0
