"""Online serving daemon for a built KG snapshot.

The reference serves its graph through a FastAPI app (``main.py``):
``POST /graphrag`` gated by an asyncio semaphore that caps in-flight
requests at ``MAX_CONCURRENT_REQUESTS`` (main.py:35-38, 221-245), plus
read-only endpoints ``/healthz`` (main.py:109-116), ``/test``
(main.py:66-70), ``/queue_status`` (main.py:55-64), ``/documents``
(main.py:72-107), ``/graph/stats`` (main.py:590-654), ``/graph/schema``
(main.py:656-726) and ``/graph/search`` (main.py:728-800); admin/ops
endpoints ``POST /drop-all`` (confirmation-gated wipe, main.py:118-155),
``POST /debug-search`` (main.py:428-477), and the ingestion surface
``POST /ingest`` + ``GET /ingest/status`` + ``GET /queue_stats``
(main.py:479-588) — the reference queues uploads to one Celery worker;
this daemon stages pages parquet and folds it into the committed
snapshot through the O(delta) incremental path, then hot-swaps the
serving state.

This module re-expresses that surface over the Ray-Data snapshot query
layer with the standard library's threading HTTP server (FastAPI is not
in this environment; the admission CONTRACT is the part that matters,
not the framework):

* a ``threading.BoundedSemaphore(max_concurrent)`` plays the asyncio
  semaphore's role — excess ``/graphrag`` requests queue on the
  semaphore and ``/queue_status`` reports live active/queued counters
  exactly like the reference's globals (main.py:36-39, 223-244);
* each ``/graphrag`` runs the SAME :func:`graphrag` flow the batch
  entry points use, against a :class:`LocalKG` tier pulled ONCE at
  service start (the way the reference holds a warm Neo4j driver) with
  the distributed tiers as automatic fallback for oversized snapshots;
* the read-only endpoints are thin wrappers over the same two-phase
  ``hash_aggregate`` / ``broadcast_join`` kernels the query layer uses,
  computed lazily and cached (they are snapshot-static).

At 100 TB the snapshot's serving projection no longer fits the local
budget; ``LocalKG.maybe_pull`` then returns ``None`` and every request
transparently runs the distributed tiers — same code path, no flag.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

from neo4j_document_pipeline_ray.config import PipelineConfig

# The reference's admission cap (main.py:35).
MAX_CONCURRENT_REQUESTS = 20


def _jsonable(obj: Any) -> Any:
    """json.dumps fallback for numpy scalars / arrays in query results."""
    item = getattr(obj, "item", None)
    if callable(item):
        return obj.item()
    tolist = getattr(obj, "tolist", None)
    if callable(tolist):
        return obj.tolist()
    return str(obj)


def _replica_actor_cls():
    """Define the replica actor lazily (ray import stays off the module
    path for non-daemon users).  Each replica reconstructs its LocalKG
    from the object store's shared tier copies in __init__ — the same
    once-per-actor pattern as GraphRAGServer (graphrag_local.py) — and
    answers one request per call in its own process, so N replicas give
    the daemon true multi-core parallelism for the GIL-bound per-query
    work (BFS masks, dedup/format loops)."""
    import ray

    from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

    @ray.remote(num_cpus=1)
    class _Replica:
        def __init__(self, tier_refs: Dict[str, Any], cfg: PipelineConfig):
            tabs = {k: (ray.get(r) if r is not None else None)
                    for k, r in tier_refs.items()}
            self._loc = LocalKG(tabs["nodes"], tabs["edge_pairs"],
                                tabs["mentions"], tabs["docs"],
                                tabs["edge_payload"])
            self._cfg = cfg
            # with every tier local, graphrag() never evaluates these
            self._tables = {k: None for k in
                            ("nodes", "edges", "mentions", "docs")}

        def answer(self, body: Dict[str, Any], question: str) -> Dict[str, Any]:
            from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag

            return graphrag(
                self._tables,
                question,
                top_k=int(body.get("top_k", 10)),
                hops=int(body.get("hops", 1)),
                use_mmr=bool(body.get("use_mmr", True)),
                use_cross_doc=bool(body.get("use_cross_doc", True)),
                alpha_vec=float(body.get("alpha_vec", 0.6)),
                beta_kw=float(body.get("beta_kw", 0.4)),
                cfg=self._cfg,
                local_kg=self._loc,
            )

    return _Replica


def _load_tables(snapshot_dir: str) -> Dict[str, Any]:
    """Materialized snapshot tables for serving (pulled into the object
    store once; re-called after an ingest fold to pick up the new
    commit)."""
    import os

    import ray.data as rd

    return {
        name: rd.read_parquet(os.path.join(snapshot_dir, name)).materialize()
        for name in ("nodes", "edges", "mentions", "docs")
    }


class GraphRAGService:
    """Holds the warm serving state (tables, LocalKG tier, index dirs,
    admission semaphore) and implements every endpoint as a method, so
    it can be driven by the HTTP layer or called directly in tests.

    ``replicas=N`` (when every serving tier fits the local budget)
    fans /graphrag out to N single-process Ray actors holding shared
    object-store copies of the tiers — the daemon's scale-out shape:
    one HTTP front, N query processes.  ``replicas=0`` answers
    in-process (still LocalKG-fast, but one GIL)."""

    def __init__(
        self,
        tables: Dict[str, Any],
        text_index_dir: Optional[str] = None,
        ann_index_dir: Optional[str] = None,
        cfg: Optional[PipelineConfig] = None,
        max_concurrent: int = MAX_CONCURRENT_REQUESTS,
        local_budget: Optional[int] = None,
        replicas: int = 0,
        snapshot_dir: Optional[str] = None,
        pages_dir: Optional[str] = None,
        shard_files: int = 1,
    ):
        self.text_index_dir = text_index_dir
        self.ann_index_dir = ann_index_dir
        self.cfg = cfg or PipelineConfig()
        self.max_concurrent = max_concurrent
        # ingest/admin state: where the snapshot lives on disk (drop-all,
        # ingest fold target) and where new pages land (ingest staging)
        self.snapshot_dir = snapshot_dir
        self.pages_dir = pages_dir
        self._shard_files = shard_files
        self._local_budget = local_budget
        self._n_replicas = replicas
        self._jobs: Dict[str, Dict[str, Any]] = {}
        self._jobs_lock = threading.Lock()
        # serializes staged-filename pick + write: concurrent uploads
        # must not race listdir -> same path (one would silently
        # overwrite the other's staged pages)
        self._stage_lock = threading.Lock()
        self._ingest_q: Optional[Any] = None
        self._replica_rr = 0
        self._build_serving_state(tables)

        # Admission control (main.py:35-38): a bounded semaphore caps
        # in-flight /graphrag work; counters mirror the reference's
        # active_requests / queued_requests globals.
        self._sem = threading.BoundedSemaphore(max_concurrent)
        self._counter_lock = threading.Lock()
        self.active_requests = 0
        self.queued_requests = 0

        self._cache_lock = threading.Lock()
        self._cache: Dict[str, Any] = {}

    def _build_serving_state(self, tables: Dict[str, Any]) -> None:
        """(Re)build the warm per-snapshot state — LocalKG tier pull and
        replica actors — from ``tables``.  Called at startup and again
        after every ingest fold / drop-all, swapping attributes in place
        (in-flight requests keep whatever state they already grabbed —
        the snapshot is immutable, so both are consistent)."""
        from neo4j_document_pipeline_ray.pipelines.graphrag_local import (
            DEFAULT_LOCAL_BUDGET,
            LocalKG,
            pull_tiers,
        )

        budget = (DEFAULT_LOCAL_BUDGET if self._local_budget is None
                  else self._local_budget)
        # Pulled once at startup and reused across requests — the warm
        # state a query server holds (reference: module-level Neo4j
        # driver + clients, main.py:41-53).  None => distributed tiers.
        tiers = pull_tiers(tables, budget) if budget else None
        local_kg = (
            LocalKG(tiers["nodes"], tiers["edge_pairs"], tiers["mentions"],
                    tiers["docs"], tiers["edge_payload"])
            if tiers is not None else None
        )

        new_replicas = None
        if (self._n_replicas and tiers is not None and local_kg is not None
                and local_kg.has_edges and local_kg.has_titles
                and local_kg.edge_payload is not None):
            import ray

            refs = {k: (ray.put(t) if t is not None else None)
                    for k, t in tiers.items()}
            actor = _replica_actor_cls()
            new_replicas = [actor.remote(refs, self.cfg)
                            for _ in range(self._n_replicas)]
            # fail fast if a replica can't build (surfaces in startup,
            # not on the first unlucky request)
            ray.get([r.__ray_ready__.remote() for r in new_replicas])

        # ONE atomic assignment publishes the whole serving state:
        # readers grab self._state once and see a consistent
        # (tables, local_kg, replicas) triple even mid-hot-swap —
        # attribute-by-attribute swapping let a request observe new
        # tables with the old LocalKG, or a replicas list that turned
        # None between the dispatch check and the len().
        from types import SimpleNamespace

        self._state = SimpleNamespace(
            tables=tables, local_kg=local_kg, replicas=new_replicas)

    @property
    def tables(self) -> Dict[str, Any]:
        return self._state.tables

    @property
    def local_kg(self):
        return self._state.local_kg

    @property
    def _replicas(self):
        return self._state.replicas

    @classmethod
    def from_snapshot(
        cls,
        snapshot_dir: str,
        cfg: Optional[PipelineConfig] = None,
        max_concurrent: int = MAX_CONCURRENT_REQUESTS,
        local_budget: Optional[int] = None,
        replicas: int = 0,
        pages_dir: Optional[str] = None,
        shard_files: int = 1,
    ) -> "GraphRAGService":
        import os

        txt = os.path.join(snapshot_dir, "text_index")
        ann = os.path.join(snapshot_dir, "ann_index")
        return cls(
            _load_tables(snapshot_dir),
            text_index_dir=txt if os.path.isdir(txt) else None,
            ann_index_dir=ann if os.path.isdir(ann) else None,
            cfg=cfg,
            max_concurrent=max_concurrent,
            local_budget=local_budget,
            replicas=replicas,
            snapshot_dir=snapshot_dir,
            pages_dir=pages_dir,
            shard_files=shard_files,
        )

    # ---------------------------------------------------------------- rag
    def graphrag_request(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """POST /graphrag (main.py:221-245): queue on the semaphore,
        then run the shared retrieval flow.  Body fields mirror RagBody
        (main.py:45-53): question, top_k, hops, alpha_vec, beta_kw,
        use_mmr, use_cross_doc."""
        question = str(body.get("question", "")).strip()
        if not question:
            # main.py:249-251 — empty question is a success=False reply,
            # not an HTTP error.
            return {"success": False,
                    "message": "Please provide a question.",
                    "facts": "", "seeds": []}

        with self._counter_lock:
            self.queued_requests += 1
        self._sem.acquire()
        with self._counter_lock:
            self.queued_requests -= 1
            self.active_requests += 1
        try:
            t0 = time.time()
            st = self._state  # one read: consistent across the request
            if st.replicas is not None:
                res = self._dispatch_replica(st.replicas, body, question)
            else:
                res = self._run_graphrag(st, body, question)
            res_out = {
                "success": True,
                "facts": res["facts"],
                "seeds": list(res["seeds"]),
                "n_nodes": res["n_nodes"],
                "n_rels": res["n_rels"],
                "timings_s": res["timings_s"],
                "total_s": round(time.time() - t0, 4),
            }
            return res_out
        except Exception as e:  # reference returns the error in-band
            return {"success": False,
                    "message": f"graphrag error: {e}", "facts": "",
                    "seeds": []}
        finally:
            with self._counter_lock:
                self.active_requests -= 1
            self._sem.release()

    def _dispatch_replica(
        self, replicas, body: Dict[str, Any], question: str
    ) -> Dict[str, Any]:
        """Round-robin one request to a replica actor.  The HTTP handler
        thread blocks on ray.get while the replica's own process does the
        GIL-bound query work — the admission semaphore (not this counter)
        bounds total in-flight work, so a plain unlocked round-robin
        index is fine even under races (any replica can serve any
        request)."""
        import ray

        self._replica_rr = (self._replica_rr + 1) % len(replicas)
        actor = replicas[self._replica_rr]
        return ray.get(actor.answer.remote(body, question))

    def _run_graphrag(self, st, body: Dict[str, Any],
                      question: str) -> Dict[str, Any]:
        """Seam for tests (patched to a slow stub in the admission
        test); production path is the shared graphrag() flow."""
        from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag

        return graphrag(
            st.tables,
            question,
            top_k=int(body.get("top_k", 10)),
            hops=int(body.get("hops", 1)),
            use_mmr=bool(body.get("use_mmr", True)),
            use_cross_doc=bool(body.get("use_cross_doc", True)),
            alpha_vec=float(body.get("alpha_vec", 0.6)),
            beta_kw=float(body.get("beta_kw", 0.4)),
            text_index_dir=self.text_index_dir,
            ann_index_dir=self.ann_index_dir,
            cfg=self.cfg,
            local_kg=st.local_kg,
        )

    # ------------------------------------------------------------ status
    def queue_status(self) -> Dict[str, Any]:
        """GET /queue_status (main.py:55-64)."""
        with self._counter_lock:
            active, queued = self.active_requests, self.queued_requests
        return {
            "success": True,
            "active_requests": active,
            "queued_requests": queued,
            "max_concurrent": self.max_concurrent,
            "available_slots": self.max_concurrent - active,
        }

    def healthz(self) -> Dict[str, Any]:
        """GET /healthz (main.py:109-116): total node count."""
        return {"success": True, "nodes": self._cached(
            "n_nodes", lambda: self.tables["nodes"].count())}

    # --------------------------------------------------- graph read-only
    def _cached(self, key: str, compute) -> Any:
        # compute OUTSIDE the lock: a slow first /graph/schema must not
        # block /healthz on the shared cache mutex (duplicate concurrent
        # computes are idempotent and first-write-wins)
        with self._cache_lock:
            if key in self._cache:
                return self._cache[key]
        val = compute()
        with self._cache_lock:
            return self._cache.setdefault(key, val)

    def graph_stats(self) -> Dict[str, Any]:
        """GET /graph/stats (main.py:590-654): per-label node counts and
        per-type relationship counts."""
        from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

        def compute():
            def counts(ds, key):
                rows = hash_aggregate(
                    ds.select_columns([key]), key, [(None, "count", "n")]
                ).take_all()
                return {r[key]: r["n"] for r in sorted(rows, key=lambda r: r[key])}

            return {
                "success": True,
                "node_count": self.tables["nodes"].count(),
                "relationship_count": self.tables["edges"].count(),
                "labels": counts(self.tables["nodes"], "label"),
                "relationship_types": counts(self.tables["edges"], "rel_type"),
            }

        return self._cached("graph_stats", compute)

    def graph_schema(self) -> Dict[str, Any]:
        """GET /graph/schema (main.py:656-726): (src label, rel type,
        dst label, edge count) triplets — node labels broadcast onto
        the streaming edge table twice, one two-phase hash aggregate
        (the db.schema.visualization analog)."""
        from neo4j_document_pipeline_ray.stages.grouped import (
            broadcast_join,
            hash_aggregate,
        )

        def compute():
            nodes = self.tables["nodes"].select_columns(["entity_id", "label"])
            edges = self.tables["edges"].select_columns(
                ["src_id", "rel_type", "dst_id"])

            def rename(ds, frm, to):
                return ds.map_batches(
                    lambda t: t.rename_columns(
                        [{frm: to}.get(c, c) for c in t.schema.names]),
                    batch_format="pyarrow")

            j = rename(broadcast_join(edges, nodes, on=("src_id",),
                                      right_on=("entity_id",)),
                       "label", "src_label")
            j = rename(broadcast_join(j, nodes, on=("dst_id",),
                                      right_on=("entity_id",)),
                       "label", "dst_label")
            rows = hash_aggregate(
                j.select_columns(["src_label", "rel_type", "dst_label"]),
                ["src_label", "rel_type", "dst_label"],
                [(None, "count", "n_edges")],
            ).take_all()
            rows.sort(key=lambda r: (r["src_label"], r["rel_type"],
                                     r["dst_label"]))
            return {"success": True, "schema": rows}

        return self._cached("graph_schema", compute)

    def documents(self, limit: int = 100) -> Dict[str, Any]:
        """GET /documents (main.py:72-107): per-document title + distinct
        mentioned-entity count, ordered by doc_id.  The mentions table is
        already distinct (doc_id, entity_id), so the count is one
        two-phase aggregate; titles attach by broadcast join."""
        from neo4j_document_pipeline_ray.stages.grouped import (
            broadcast_join,
            hash_aggregate,
        )

        def compute():
            per_doc = hash_aggregate(
                self.tables["mentions"].select_columns(["doc_id"]),
                "doc_id", [(None, "count", "entity_count")])
            docs = self.tables["docs"].select_columns(["doc_id", "title"])
            joined = broadcast_join(docs, per_doc, on=("doc_id",),
                                    join_type="left_outer")
            # limit INSIDE the dataset: only the first `limit` rows of
            # the distributed sort reach the driver — the full doc list
            # must never materialize here (at snapshot scale it would
            # OOM the daemon even for ?limit=10)
            rows = joined.sort("doc_id").limit(limit).take_all()
            return [
                {"doc_id": r["doc_id"], "title": r["title"],
                 "entity_count": int(r["entity_count"] or 0)}
                for r in rows
            ]

        rows = self._cached(f"documents:{limit}", compute)
        total = self._cached("n_docs",
                             lambda: self.tables["docs"].count())
        return {"success": True, "documents": rows, "total": total}

    def search(
        self,
        property_name: Optional[str],
        property_value: Optional[str],
        label: Optional[str] = None,
        limit: int = 10,
    ) -> Dict[str, Any]:
        """GET /graph/search (main.py:728-800): case-insensitive
        substring match on a node property, optional label filter.
        A streaming pruned scan with a vectorized Arrow predicate +
        limit — Ray stops pulling blocks once the limit is satisfied."""
        import pyarrow.compute as pc

        if not property_name or not property_value:
            return {"success": False,
                    "message": "property_name and property_value are "
                               "required parameters"}
        nodes = self.tables["nodes"]
        cols = ["entity_id", "label", "name", "norm_key"]
        searchable = [c for c in cols if c in nodes.schema().names]
        # validate against the PROJECTED columns, not the full schema —
        # a valid-but-unprojected column (e.g. an embedding) would pass
        # a schema check and then KeyError inside the scan
        if property_name not in searchable:
            return {"success": False,
                    "message": f"unknown property: {property_name}"}
        needle = property_value.lower()

        def matches(t):
            mask = pc.match_substring(
                pc.utf8_lower(pc.cast(t[property_name], "string")), needle)
            if label is not None:
                mask = pc.and_(mask, pc.equal(t["label"], label))
            return t.filter(mask)

        rows = (
            nodes.select_columns(searchable)
            .map_batches(matches, batch_format="pyarrow")
            .limit(limit)
            .take_all()
        )
        return {"success": True,
                "results": {"entities": rows, "count": len(rows)}}

    # ---------------------------------------------------- admin / debug
    def test(self) -> Dict[str, Any]:
        """GET /test (main.py:66-70): bare node count — the reference's
        connectivity smoke check (no success key, by contract)."""
        return {"nodes": self._cached(
            "n_nodes", lambda: self.tables["nodes"].count())}

    def drop_all(self, confirmation: bool = False) -> Dict[str, Any]:
        """POST /drop-all (main.py:118-155): confirmation-gated
        destructive wipe.  The Neo4j ``MATCH (n) DETACH DELETE n``
        analog is deleting the snapshot tables on disk and swapping the
        served tables to empty ones (same schemas) — subsequent queries
        see an empty graph, like the reference's cleared database."""
        if not confirmation:
            return {
                "success": False,
                "message": "Confirmation required. Set confirmation=true "
                           "in request body to proceed with deletion.",
            }
        try:
            import pyarrow as pa
            import ray.data as rd

            initial_count = self.tables["nodes"].count()

            def empty_like(ds):
                sch = ds.schema()
                base = getattr(sch, "base_schema", None)
                if base is None:
                    base = pa.schema(zip(sch.names, sch.types))
                return rd.from_arrow(base.empty_table())

            empties = {k: empty_like(ds) for k, ds in self.tables.items()}
            if self.snapshot_dir:
                from neo4j_document_pipeline_ray.pipelines.snapshot import (
                    wipe_snapshot,
                )

                wipe_snapshot(self.snapshot_dir)
            if self.pages_dir:
                # Reference semantics: after the wipe, an ingest adds
                # ONLY the uploaded pages to the cleared graph.  Future
                # uploads therefore stage into a FRESH subdirectory
                # (``_list_input_files`` does not recurse, so the
                # original corpus files stay on disk but out of every
                # post-wipe fold).  Restart caveat: re-launching the
                # daemon with --pages pointing at the ORIGINAL dir
                # re-includes the old corpus on the next ingest.
                n = 1
                while True:
                    cand = os.path.join(self.pages_dir,
                                        f"_post_wipe_{n:03d}")
                    if not os.path.exists(cand):
                        break
                    n += 1
                os.makedirs(cand)
                self.pages_dir = cand
            self.text_index_dir = None
            self.ann_index_dir = None
            self._build_serving_state(empties)
            with self._cache_lock:
                self._cache.clear()
            return {
                "success": True,
                "message": "Successfully cleared the database",
                "nodes_before": initial_count,
                "nodes_after": self.tables["nodes"].count(),
            }
        except Exception as e:
            return {"success": False,
                    "message": f"Failed to clear database: {e}"}

    def debug_search(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """POST /debug-search (main.py:428-477): exercise the retrieval
        components separately — question embedding, hybrid channel blend
        — and report the schema introspection a debugging operator
        wants: existing labels, per-label counts, existing index
        artifacts (the SHOW INDEXES analog is the persisted text/ANN
        index layouts under the snapshot)."""
        try:
            from neo4j_document_pipeline_ray.pipelines.graphrag import (
                embed_question,
                hybrid_candidates,
            )

            question = str(body.get("question", "test"))
            qvec = embed_question(question, self.cfg)
            hybrid = hybrid_candidates(
                self.tables["nodes"], question, qvec, k_vec=5, k_kw=5,
                text_index_dir=self.text_index_dir,
                ann_index_dir=self.ann_index_dir,
                local_kg=self.local_kg)

            label_counts = self.graph_stats()["labels"]
            indexes = []
            if self.text_index_dir:
                indexes.append({"name": "text_index", "type": "FULLTEXT",
                                "path": self.text_index_dir})
            if self.ann_index_dir:
                indexes.append({"name": "ann_index", "type": "VECTOR",
                                "path": self.ann_index_dir})
            return {
                "success": True,
                "message": "Debug search completed",
                "question": question,
                "existing_labels": sorted(label_counts),
                "existing_indexes": indexes,
                "label_counts": label_counts,
                "hybrid_results_count": len(hybrid),
                "local_kg": self.local_kg is not None,
            }
        except Exception as e:
            return {"success": False, "message": f"Debug search error: {e}"}

    # ----------------------------------------------------------- ingest
    def _ingest_worker(self) -> None:
        """Single background worker draining the ingest queue — the one
        Celery worker of this daemon.  Each job: stage the new pages
        file, fold it into the committed snapshot
        (``build_snapshot(resume=True)`` auto-detects the O(delta)
        incremental path, pipelines/incremental.py), then hot-swap the
        serving state to the new commit."""
        while True:
            job_id = self._ingest_q.get()
            with self._jobs_lock:
                job = self._jobs[job_id]
                job["state"] = "STARTED"
                job["started_at"] = time.time()
            try:
                from neo4j_document_pipeline_ray.pipelines.snapshot import (
                    build_snapshot,
                )

                root = build_snapshot(
                    self.pages_dir, self.snapshot_dir, self.cfg,
                    resume=True, shard_files=self._shard_files)
                tables = _load_tables(self.snapshot_dir)
                # refresh any persisted index artifacts the daemon is
                # configured with — the fold changed the nodes table,
                # and a stale df/bucket layout would serve wrong scores
                # (and miss the new entities entirely) whenever the
                # local tier overflows and queries fall to the index
                if self.text_index_dir or self.ann_index_dir:
                    nodes = tables["nodes"]
                    if self.text_index_dir:
                        from neo4j_document_pipeline_ray.pipelines.graphrag import (  # noqa: E501
                            build_text_index,
                        )

                        build_text_index(nodes, self.text_index_dir)
                    if self.ann_index_dir:
                        from neo4j_document_pipeline_ray.pipelines.graphrag import (  # noqa: E501
                            build_node_ann_index,
                        )

                        build_node_ann_index(nodes, self.ann_index_dir)
                self._build_serving_state(tables)
                with self._cache_lock:
                    self._cache.clear()
                result = {
                    "docs": root.get("docs"),
                    "nodes": root.get("nodes"),
                    "edges": root.get("edges"),
                    "shards_skipped_on_resume":
                        root.get("shards_skipped_on_resume"),
                    "stage_b_mode": root.get("stage_b_mode"),
                }
                with self._jobs_lock:
                    job["state"] = "SUCCESS"
                    job["result"] = result
            except Exception as e:
                with self._jobs_lock:
                    job["state"] = "FAILURE"
                    job["result"] = str(e)
            finally:
                with self._jobs_lock:
                    job["finished_at"] = time.time()
                self._ingest_q.task_done()

    def _next_upload_path(self) -> str:
        """A staged-pages filename guaranteed to sort AFTER every file
        already in the pages dir (``_list_input_files`` sorts by name,
        so the committed shard prefix stays aligned and the fold is
        incremental).  '~' sorts after every alphanumeric in ASCII.

        The base stem is the last existing filename with any prior
        ``~iNNNNNN`` staging suffixes stripped (names must not compound
        upload-over-upload toward NAME_MAX), and the sequence number is
        1 + the highest suffix already on disk (not an in-memory
        counter, which would reset on daemon restart and silently
        overwrite a committed staged shard)."""
        import re

        existing = sorted(
            f for f in os.listdir(self.pages_dir) if f.endswith(".parquet"))
        if existing:
            last = existing[-1][: -len(".parquet")]
            base = re.sub(r"(~i\d{6})+$", "", last) or "pages"
        else:
            base = "pages"
        seq = 0
        pat = re.compile(re.escape(base) + r"~i(\d{6})\.parquet$")
        for f in existing:
            m = pat.match(f)
            if m:
                seq = max(seq, int(m.group(1)))
        return os.path.join(self.pages_dir,
                            f"{base}~i{seq + 1:06d}.parquet")

    def ingest(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """POST /ingest (main.py:479-494): stage an uploaded pages
        payload and queue the ingestion job; returns
        ``{"success", "message", "job_id"}`` like the reference's
        Celery dispatch.  Payload: ``{"rows": [{url, html, ...}]}``
        (inline JSON pages) or ``{"path": "/existing/pages.parquet"}``
        (server-side file).  html may be a plain string (utf-8
        encoded); missing optional columns are nulled to the corpus
        page schema."""
        if not (self.pages_dir and self.snapshot_dir):
            return {"success": False,
                    "message": "Ingest error: daemon started without "
                               "--pages/--snapshot dirs; ingest disabled"}
        try:
            import queue
            import shutil
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq

            if not (body.get("rows") or body.get("path")):
                return {"success": False,
                        "message": "Ingest error: provide 'rows' "
                                   "(inline pages) or 'path' (parquet)"}
            with self._stage_lock:
                save_path = self._next_upload_path()
                if body.get("rows"):
                    rows = body["rows"]
                    for r in rows:
                        if isinstance(r.get("html"), str):
                            r["html"] = r["html"].encode("utf-8")
                    cols = {
                        "url": pa.string(), "warc_ts": pa.timestamp("us"),
                        "html": pa.binary(), "text": pa.string(),
                        "lang": pa.string(),
                    }
                    arrays = {
                        name: pa.array([r.get(name) for r in rows], type=typ)
                        for name, typ in cols.items()
                    }
                    pq.write_table(pa.table(arrays), save_path)
                else:
                    pq.read_schema(body["path"])  # fail fast on non-parquet
                    shutil.copyfile(body["path"], save_path)

            job_id = str(uuid.uuid4())
            with self._jobs_lock:
                if self._ingest_q is None:
                    self._ingest_q = queue.Queue()
                    threading.Thread(target=self._ingest_worker,
                                     daemon=True,
                                     name="ingest-worker-1").start()
                self._jobs[job_id] = {
                    "state": "PENDING", "result": None,
                    "filename": os.path.basename(save_path),
                    "queued_at": time.time(),
                    "started_at": None, "finished_at": None,
                }
            self._ingest_q.put(job_id)
            return {"success": True, "message": "Ingestion queued.",
                    "job_id": job_id}
        except Exception as e:
            return {"success": False, "message": f"Ingest error: {e}"}

    def ingest_status(self, job_id: Optional[str]) -> Dict[str, Any]:
        """GET /ingest/status (main.py:567-588).  Unknown ids report
        PENDING, exactly like Celery's AsyncResult."""
        if not job_id:
            return {"success": False,
                    "message": "Missing value: job_id parameter is "
                               "required."}
        with self._jobs_lock:
            job = self._jobs.get(job_id, {"state": "PENDING",
                                          "result": None})
            state, result = job["state"], job["result"]
        return {"success": True, "message": "Job status retrieved",
                "job_id": job_id, "state": state, "result": result}

    def queue_stats(self) -> Dict[str, Any]:
        """GET /queue_stats (main.py:497-565): ingest-queue statistics —
        active/reserved counts and per-document progress details from
        the in-memory job registry (this daemon's Celery inspector)."""
        with self._jobs_lock:
            jobs = {k: dict(v) for k, v in self._jobs.items()}
        active = [
            {"id": jid, "filename": j["filename"],
             "started_at": j["started_at"], "worker": "ingest-worker-1"}
            for jid, j in jobs.items() if j["state"] == "STARTED"
        ]
        reserved = sum(1 for j in jobs.values() if j["state"] == "PENDING")
        return {
            "success": True,
            "message": "Queue statistics retrieved successfully",
            "stats": {
                "active_tasks": len(active),
                "reserved_tasks": reserved,
                "scheduled_tasks": 0,
                "revoked_tasks": 0,
                "total_in_progress": len(active) + reserved,
                "worker_count": 1 if self._ingest_q is not None else 0,
                "workers": (["ingest-worker-1"]
                            if self._ingest_q is not None else []),
                "documents_in_progress": active,
            },
        }


# ---------------------------------------------------------------- HTTP


def _make_handler(service: GraphRAGService):
    class Handler(BaseHTTPRequestHandler):
        # quiet: the daemon logs through the service, not stderr spam
        def log_message(self, fmt, *args):
            pass

        def _reply(self, payload: Dict[str, Any], status: int = 200) -> None:
            body = json.dumps(payload, default=_jsonable).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if url.path == "/healthz":
                return self._reply(service.healthz())
            if url.path == "/test":
                return self._reply(service.test())
            if url.path == "/queue_status":
                return self._reply(service.queue_status())
            if url.path == "/queue_stats":
                return self._reply(service.queue_stats())
            if url.path == "/ingest/status":
                return self._reply(service.ingest_status(q.get("job_id")))
            if url.path == "/graph/stats":
                return self._reply(service.graph_stats())
            if url.path == "/graph/schema":
                return self._reply(service.graph_schema())
            if url.path in ("/documents", "/graph/search"):
                try:  # non-numeric ?limit is a 400, not a dropped socket
                    limit = int(q.get("limit",
                                      100 if url.path == "/documents" else 10))
                except ValueError as e:
                    return self._reply(
                        {"success": False,
                         "message": f"bad request: {e}"}, 400)
                if url.path == "/documents":
                    return self._reply(service.documents(limit=limit))
                return self._reply(service.search(
                    property_name=q.get("property_name"),
                    property_value=q.get("property_value"),
                    label=q.get("label"),
                    limit=limit,
                ))
            self._reply({"success": False, "message": "not found"}, 404)

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            routes = {"/graphrag", "/drop-all", "/debug-search", "/ingest"}
            if url.path not in routes:
                return self._reply(
                    {"success": False, "message": "not found"}, 404)
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) or b"{}"
                body = json.loads(raw)
                # /drop-all mirrors FastAPI's Body(False): a bare JSON
                # bool is the confirmation value itself
                if url.path == "/drop-all" and isinstance(body, bool):
                    body = {"confirmation": body}
                if not isinstance(body, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(
                    {"success": False, "message": f"bad request: {e}"}, 400)
            if url.path == "/drop-all":
                return self._reply(
                    service.drop_all(bool(body.get("confirmation", False))))
            if url.path == "/debug-search":
                return self._reply(service.debug_search(body))
            if url.path == "/ingest":
                return self._reply(service.ingest(body))
            self._reply(service.graphrag_request(body))

    return Handler


def make_server(
    service: GraphRAGService, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Bind a threading HTTP server for ``service`` (port 0 = ephemeral;
    read ``server.server_address`` for the bound port).  Caller owns the
    serve_forever() loop / shutdown()."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    # every handler thread may block on the admission semaphore; daemon
    # threads let shutdown() win
    httpd.daemon_threads = True
    return httpd


def serve_forever(service: GraphRAGService, host: str, port: int) -> None:
    httpd = make_server(service, host, port)
    h, p = httpd.server_address[:2]
    print(f"serving on http://{h}:{p}  "
          f"(max_concurrent={service.max_concurrent}, "
          f"local_kg={'yes' if service.local_kg is not None else 'no'})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
