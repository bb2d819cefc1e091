"""Benchmark harness.

Headline: the full KG-construction snapshot (pages -> HTML extraction
-> chunk -> triple extraction -> entity/edge shuffles -> partitioned
Parquet) over the synthetic page corpus sized to ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1`` -> 15,000 pages).  Secondary queries
time the curation extras and relational operators.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "triples_per_sec": ...,
   "bench_reps": N, "queries_spread_s": {name: [min, max]}}

Every number is min-of-``$GRAFT_BENCH_REPS`` (default 3) wall times,
with the per-rep spread in the artifact: this host shows +-50%
(occasionally 8x) neighbor-load noise, and the minimum over
temporally-separated reps is the least-contaminated estimate.
Query reps are PASS-INTERLEAVED — rep k of every query runs a whole
sweep after rep k-1 — so a multi-minute neighbor burst contaminates
at most one pass, never all N reps of a query (observed before the
change: one burst took all 3 back-to-back reps of the graphrag family
10-20x over their quiet pins while the rest of the sweep ran clean).
The snapshot HEADLINE keeps back-to-back reps: Ray reaps idle workers
between interleaved passes, so sweep-separated snapshot reps pay
semi-cold worker spinup (+4-8 s measured) and stop measuring the
pipeline; back-to-back matches the BENCH_r01-r03 protocol.

``--scaling`` reruns the headline in fresh processes at 8 and 32 CPUs
on the same input and reports both throughputs + scaling efficiency
(the sandbox proxy for the north rule's N -> 4N-node criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# min-of-N protocol: this host shows +-50% (occasionally 8x) neighbor-
# load noise; the minimum over temporally-separated reps is the least-
# contaminated estimate, and the per-rep spread ships in the artifact
# so an inflated rep is visible as environment, not regression.
BENCH_REPS = max(1, int(os.environ.get("GRAFT_BENCH_REPS", "3")))

# --scaling uses a dedicated LARGER corpus so the job is
# compute-dominated like the 100 TB design point; at sf0.1 the fixed
# per-job latencies (Ray job startup, actor spawn, shuffle barriers)
# are the same order as the useful work and cap measurable efficiency.
# 228,000 docs = the design-point corpus of the BASELINE.md scaling
# claim; `python bench.py --scaling` reproduces that table from a
# fresh checkout in one command (corpus cached after the first run)
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "228000"))
_SCALING_PAGES_ENV = "GRAFT_SCALING_PAGES"


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        return 0.0


def run_bench() -> dict:
    import ray

    # capacity BEFORE the run (a post-run probe reads low: the sandbox
    # throttles after sustained load) and again at the end — both go
    # into the artifact
    cap_before = host_capacity()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines import relational as rel
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot
    from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

    scaling_pages = os.environ.get(_SCALING_PAGES_ENV)
    if scaling_pages:
        paths = {"pages": scaling_pages}
    else:
        paths = ensure_corpus(SF_DIR)  # cached; generation excluded from timing

    # warm the page cache so we measure compute + shuffle, not cold reads
    rd.read_parquet(paths["pages"], columns=["url"]).count()

    # warm the worker pool: import the package in every worker process so
    # measured runs see steady-state workers (the 100 TB regime), not
    # first-task import latency
    def _warm(b):
        import neo4j_document_pipeline_ray.pipelines.kg_build  # noqa: F401
        import neo4j_document_pipeline_ray.stages.edge_agg  # noqa: F401

        return b

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
        _warm, batch_size=1
    ).materialize()

    cfg = PipelineConfig(
        extract_concurrency=(1, max(2, NUM_CPUS // 8)),
        embed_concurrency=(1, max(2, NUM_CPUS // 4)),
        join_partitions=max(4, NUM_CPUS // 4),
        shuffle_partitions=max(8, NUM_CPUS),
        shard_parallelism=max(2, NUM_CPUS // 2),
        # rule extraction is a cheap pure function: extract per
        # (doc, chunk) and stream into the write (distinct-chunk shuffle
        # + join-back only pays off for model-priced backends)
        dedupe_chunks_before_extract=False,
    )
    out_dir = f"/tmp/bench_snapshot_{NUM_CPUS}"

    def _snapshot_build(dest):
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        t0 = time.time()
        # shard_files=4: checkpoint granularity of ~8k docs/shard —
        # fewer actor-pool spinups per run than one shard per file
        r = build_snapshot(paths["pages"], dest, cfg,
                           resume=False, shard_files=4)
        return round(time.time() - t0, 3), r

    # scaling mode runs ONE rep per process (run_scaling takes its own
    # min over fresh processes).  The HEADLINE keeps back-to-back reps:
    # Ray reaps idle workers between interleaved passes (the SIGTERM
    # traces in the logs), so a sweep-separated snapshot rep pays
    # semi-cold worker spinup (+4-8 s of extraction) and stops
    # measuring the pipeline; back-to-back reps 2..N run the warm pool,
    # the same protocol as BENCH_r01-r03.  The QUERY sweep below is
    # pass-interleaved instead — that is where burst contamination was
    # actually observed.
    reps = 1 if scaling_pages else BENCH_REPS
    headline_reps = []
    root = None
    for _ in range(reps):
        dt0, root = _snapshot_build(out_dir)
        headline_reps.append(dt0)
    headline = min(headline_reps)

    n_docs = root["counts"]["n_docs"]
    n_triples = root["counts"]["n_triples"]

    queries = {"kg_snapshot": round(headline, 3)}
    spread = {"kg_snapshot": [min(headline_reps), max(headline_reps)]}

    # embedding policy is part of the measured workload (the embed
    # stage writes the widest output columns) — pin it in every artifact
    embedding_policy = {
        "with_embeddings": root.get("with_embeddings", True),
        "embed_backend": cfg.embed_backend,
        "embed_dim": cfg.embed_dim,
    }

    if scaling_pages:
        # scaling mode: headline only, skip the secondary query sweep
        result = {
            "metric": "kg_snapshot_sec_end_to_end",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": round(n_docs / 150_000, 4),
            "num_cpus": NUM_CPUS,
            "n_docs": n_docs,
            "n_triples": n_triples,
            "docs_per_sec": round(n_docs / headline, 2),
            "triples_per_sec": round(n_triples / headline, 2),
            "stage_timings_s": root["stage_timings_s"],
            "embedding_policy": embedding_policy,
        }
        ray.shutdown()
        return result

    rerun_queue = []

    def timed_call(name, thunk):
        """One rep now (dependents need the output), then queued for
        the (BENCH_REPS-1) extra whole-sweep passes; min + [min, max]
        spread land in the artifact."""
        t = time.time()
        out = thunk()
        if hasattr(out, "count"):
            out.count()
        v = round(time.time() - t, 3)
        queries[name] = v
        spread[name] = [v, v]
        rerun_queue.append((name, thunk))
        return out

    def timed(name, fn):
        timed_call(name, lambda: fn(SF_DIR))

    timed("rel_lineitem_agg", rel.q_lineitem_agg)
    timed("rel_segment_topk", rel.q_segment_revenue_topk)
    timed("rel_events_hourly", rel.q_events_hourly)

    from neo4j_document_pipeline_ray.pipelines import windows as win

    timed("events_sessions", win.q_events_sessions)
    timed("events_band_pairs", win.q_events_band_pairs)

    from neo4j_document_pipeline_ray.extras.dedup import (
        exact_dedup_sf,
        minhash_dedup_pairs,
    )
    from neo4j_document_pipeline_ray.extras.similarity import (
        brute_force_topk,
        query_vector,
    )
    from neo4j_document_pipeline_ray.extras.textstats import quality_stats

    timed("docs_exact_dedup", exact_dedup_sf)
    timed("docs_quality", quality_stats)

    from neo4j_document_pipeline_ray.extras.textstats import (
        curation_filter,
        salient_terms,
    )

    timed("docs_curation_filter", curation_filter)
    timed("docs_salient_terms", salient_terms)

    def _minhash(sf):
        docs = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                               columns=["doc_id", "text"])
        return minhash_dedup_pairs(docs, threshold=0.8)

    timed("docs_minhash_pairs", _minhash)

    def _ann(sf):
        emb = rd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        return brute_force_topk(emb, query_vector(sf), k=10)

    timed("ann_topk", _ann)

    # query-path latency over the snapshot just built — the reference's
    # own perf anchors are /graphrag latencies (30 s ceiling,
    # perf_test/enhanced_performance_test.py:69); this engine answers
    # the same hybrid-retrieval + k-hop + format flow in ~1-2 s
    from neo4j_document_pipeline_ray.pipelines.graphrag import (
        build_node_ann_index,
        build_text_index,
        graphrag,
    )

    tables = {
        name: rd.read_parquet(os.path.join(out_dir, name)).materialize()
        for name in ("nodes", "edges", "mentions", "docs")
    }
    # bulk graph analytics over the snapshot's edge/mention tables
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        cooccurrence_topk,
        triangle_counts,
    )

    timed_call("kg_triangles", lambda: triangle_counts(tables["edges"]))
    timed_call("kg_cooccur_topk",
               lambda: cooccurrence_topk(tables["mentions"], k=50))

    # round-4 flagship analytics: sketch class (ANF/HyperBall) and
    # rule mining.  Boruvka MSF is deliberately NOT benched: at toy
    # node counts its wall time is pure per-round executor fixed cost
    # (outer contraction rounds x inner CC rounds, ~60 s/rep at
    # sf0.01 while the gate's single rep is 23 s) — no data-volume
    # signal; the correctness gate + pytest cover it.
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        neighborhood_function,
        rule_mining,
    )

    timed_call("kg_neighborhood",
               lambda: neighborhood_function(tables["edges"], hops=3))
    timed_call("kg_rules", lambda: rule_mining(tables["edges"]))

    # round-4 web-graph + training-data flagships: host-level harmonic
    # centrality (link extraction + KMV sketch rounds) and distant-
    # supervision pair generation (per-doc self-merge + KB joins)
    from neo4j_document_pipeline_ray.extras.urls import host_harmonic
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        distant_supervision,
    )

    pages_slim = rd.read_parquet(paths["pages"], columns=["url", "html"])
    triples = rd.read_parquet(os.path.join(out_dir, "triples"),
                              columns=["doc_id", "src_id", "rel_type",
                                       "dst_id"]).materialize()
    timed_call("pages_host_harmonic", lambda: host_harmonic(pages_slim))
    timed_call("kg_distant_pairs",
               lambda: distant_supervision(tables["mentions"],
                                           tables["edges"], triples))

    question = 'How does the "National Broadband Plan" support the Six Pillars?'

    # index DDL analog: the reference creates its vector + fulltext
    # indexes at the END of ingestion (ingestMD.py:794-796) and serves
    # /graphrag from them — build both layouts over the fresh snapshot
    ann_dir = os.path.join(out_dir, "_ann_index")
    txt_dir = os.path.join(out_dir, "_text_index")

    def _build_indexes():
        build_node_ann_index(tables["nodes"], ann_dir)
        build_text_index(tables["nodes"], txt_dir)

    timed_call("kg_index_build", _build_indexes)

    # production serving path: a query server pulls the pruned local
    # projection ONCE (the way the reference's Neo4j holds its indexes
    # in memory) and answers queries in-process with the same kernels;
    # oversized tiers would fall back to the distributed steps
    from neo4j_document_pipeline_ray.pipelines.graphrag_local import LocalKG

    loc = timed_call("kg_local_pull", lambda: LocalKG.maybe_pull(tables))
    res = timed_call(
        "kg_graphrag_query",
        lambda: graphrag(tables, question, top_k=5, hops=2, local_kg=loc))
    assert res["n_nodes"] > 0
    # diagnosis aids for noisy-host runs: which serving tiers were
    # pulled, and where the query time went
    result_extras = {
        "local_kg_tiers": None if loc is None else {
            "edge_pairs": loc.has_edges,
            "mentions": loc.has_mentions,
            "payload": loc.edge_payload is not None,
        },
        "graphrag_step_timings_s": res["timings_s"],
    }

    # distributed paths kept as the at-scale comparison points
    # (identical results — pinned in tests/test_graphrag.py)
    res_idx = timed_call(
        "kg_graphrag_query_dist_indexed",
        lambda: graphrag(tables, question, top_k=5, hops=2,
                         text_index_dir=txt_dir, ann_index_dir=ann_dir))
    # the ANN channel is approximate (multiprobe LSH): at tiny corpora
    # the probed buckets can legitimately miss scan-path seeds, so only
    # sanity-check it; exactness-where-guaranteed is pinned in
    # tests/test_graphrag.py
    assert res_idx["n_nodes"] > 0
    res_scan = timed_call(
        "kg_graphrag_query_dist_scan",
        lambda: graphrag(tables, question, top_k=5, hops=2))
    assert res_scan["facts"] == res["facts"]

    # pass-interleaved query reps: each extra pass re-times every query
    # in sweep order, so consecutive reps of the SAME query are
    # separated by the length of a whole sweep — the only burst that
    # can contaminate a min-of-N is one lasting N full sweeps
    for _ in range(BENCH_REPS - 1):
        for name, thunk in rerun_queue:
            t0 = time.time()
            o = thunk()
            if hasattr(o, "count"):
                o.count()
            v = round(time.time() - t0, 3)
            queries[name] = min(queries[name], v)
            spread[name] = [min(spread[name][0], v),
                            max(spread[name][1], v)]
    queries["kg_snapshot"] = round(headline, 3)
    spread["kg_snapshot"] = [min(headline_reps), max(headline_reps)]

    # compaction at the bench design point (the `cli compact` job):
    # fewer, larger, id-sorted files per table -> cheaper serving-side
    # reads.  Runs AFTER the rerun passes because it REWRITES the
    # parquet files the cached Datasets were planned over; the serving
    # pull + query are then re-timed over the compacted layout and the
    # facts asserted identical (compaction is a read-layout change
    # only).
    from neo4j_document_pipeline_ray.pipelines.compact import (
        compact_snapshot,
    )

    t0 = time.time()
    comp_stats = compact_snapshot(out_dir)
    compact_sec = round(time.time() - t0, 3)
    tables_c = {
        name: rd.read_parquet(os.path.join(out_dir, name)).materialize()
        for name in ("nodes", "edges", "mentions", "docs")
    }
    t0 = time.time()
    loc_c = LocalKG.maybe_pull(tables_c)
    pull_after = round(time.time() - t0, 3)
    t0 = time.time()
    res_c = graphrag(tables_c, question, top_k=5, hops=2, local_kg=loc_c)
    query_after = round(time.time() - t0, 3)
    assert res_c["facts"] == res["facts"]
    result_extras["compaction"] = {
        "compact_sec": compact_sec,
        "files": {t: {"before": s["files_before"], "after": s["files_after"]}
                  for t, s in comp_stats.items()},
        "kg_local_pull_s": {"before": queries["kg_local_pull"],
                            "after": pull_after},
        "kg_graphrag_query_s": {"before": queries["kg_graphrag_query"],
                                "after": query_after},
    }

    result = {
        "metric": "kg_snapshot_sec_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / headline, 2),
        "triples_per_sec": round(n_triples / headline, 2),
        "stage_timings_s": root["stage_timings_s"],
        # min-of-N evidence: [min, max] per query; a large max/min
        # ratio marks neighbor-load noise, not a code regression
        "bench_reps": BENCH_REPS,
        "queries_spread_s": spread,
        # measured host capacity AT BENCH TIME (shared host: neighbor
        # steal is invisible to load averages inside the sandbox) —
        # compare across artifacts to normalize wall-time drift
        "host_capacity": {"before": cap_before, "after": host_capacity()},
        "embedding_policy": embedding_policy,
        **result_extras,
    }
    ray.shutdown()
    return result


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def host_capacity() -> dict:
    """1-second integer-increment burn, single-process and full-width:
    millions of iterations completed.  A 20% drop here between two
    artifacts explains a ~20% wall-time inflation without any code
    change (observed repeatedly on this shared host)."""
    import multiprocessing as mp

    with mp.Pool(1) as p:
        single = sum(p.map(_burn, range(1)))
    with mp.Pool(NUM_CPUS) as p:
        full = sum(p.map(_burn, range(NUM_CPUS)))
    return {"single_proc_miters": round(single / 1e6, 1),
            "full_width_miters": round(full / 1e6, 1),
            "width": NUM_CPUS}


def _ensure_skew_corpus(base_pages: str) -> str:
    """Skewed variant of the bench corpus: ~30% of pages gain one extra
    sentence mentioning the SAME hot entity ("National Hub"), with ~20
    distinct objects — so one entity lands in ~30% of all docs and its
    mention/edge keys hammer a single reducer in a naive groupby.
    Ray session must be live."""
    import zlib

    import pyarrow as pa

    import ray.data as rd

    out_dir = "/tmp/graft_pages/skew_hot"
    pages_dir = os.path.join(out_dir, "pages")
    marker = os.path.join(out_dir, "_complete")
    if os.path.exists(marker):
        return pages_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    def inject(t: "pa.Table") -> "pa.Table":
        out = []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            hh = zlib.crc32(u.encode())
            # only sentence-bearing docs (60% of the corpus): injecting
            # into table/noise docs would suppress their row-level
            # table-FALLBACK triples (fallback-only-on-empty) and make
            # the corpora incomparable.  50% of 60% = ~30% of all docs.
            if ("/sent/" in u or "/mixed/" in u) and hh % 2 == 0:
                sent = (f'<p>The Policy "National Hub" supports the '
                        f'Sector "Pillar {hh % 20}".</p>').encode()
                h = h.replace(b"</body>", sent + b"</body>", 1)
            out.append(h)
        idx = t.schema.get_field_index("html")
        return t.set_column(idx, "html", pa.array(out, pa.binary()))

    rd.read_parquet(base_pages).map_batches(
        inject, batch_format="pyarrow").write_parquet(pages_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return pages_dir


def run_skew() -> dict:
    """Hot-key robustness evidence: the SAME snapshot job over the
    uniform bench corpus vs the skewed variant (one entity in ~30% of
    docs).  Because every exchange is preceded by an in-batch Arrow
    partial aggregation (hub keys collapse per batch — edge_agg.py,
    entity_link.py), the stage-B (graph shuffle) wall time must stay
    within ~1.2x of uniform; a naive sort/groupby would send every hot
    row to one reducer instead.  min-of-N per variant."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot
    from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

    paths = ensure_corpus(SF_DIR)
    skew_pages = _ensure_skew_corpus(paths["pages"])
    reps = max(1, int(os.environ.get("GRAFT_SKEW_REPS", "2")))

    cfg = PipelineConfig(
        extract_concurrency=(1, max(2, NUM_CPUS // 8)),
        embed_concurrency=(1, max(2, NUM_CPUS // 4)),
        join_partitions=max(4, NUM_CPUS // 4),
        shuffle_partitions=max(8, NUM_CPUS),
        shard_parallelism=max(2, NUM_CPUS // 2),
        dedupe_chunks_before_extract=False,
    )

    def run(pages: str, tag: str) -> dict:
        best = None
        for _ in range(reps):
            out_dir = f"/tmp/bench_skew_{tag}"
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            t0 = time.time()
            root = build_snapshot(pages, out_dir, cfg, resume=False,
                                  shard_files=4)
            wall = time.time() - t0
            if best is None or wall < best["total_s"]:
                best = {"total_s": round(wall, 3),
                        "shuffle_s": root["stage_timings_s"]["graph_shuffles"],
                        "n_triples": root["counts"]["n_triples"],
                        "n_nodes": root["counts"]["n_nodes"]}
        return best

    base = run(paths["pages"], "base")
    skew = run(skew_pages, "hot")
    result = {
        "metric": "skew_shuffle_ratio",
        "base": base,
        "skew": skew,
        "shuffle_ratio": round(skew["shuffle_s"] / base["shuffle_s"], 3),
        "total_ratio": round(skew["total_s"] / base["total_s"], 3),
        "num_cpus": NUM_CPUS,
        "sf": _sf_of(SF_DIR),
        "reps": reps,
        "host_capacity": host_capacity(),
    }
    ray.shutdown()
    return result


def run_serve() -> dict:
    """Online-serving latency/concurrency benchmark — the analog of the
    reference's perf_test/enhanced_performance_test.py, which ramps
    concurrent users against POST /graphrag and reports per-step
    avg/median/p95/min/max latency, throughput and success rate
    (its north-star ceiling: 30 s per query,
    perf_test/enhanced_performance_test.py:69).

    Builds a snapshot over the bench corpus, stands up the serving
    daemon (serve.py) on an ephemeral port, and drives it over REAL
    HTTP with stepped concurrency.  Questions are derived
    deterministically from the snapshot's own node names (quoted, so
    the BM25 phrase path is exercised like the reference's anchor
    queries)."""
    import threading

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot
    from neo4j_document_pipeline_ray.serve import GraphRAGService, make_server
    from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

    paths = ensure_corpus(SF_DIR)
    out_dir = "/tmp/bench_serve_snap"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    cfg = PipelineConfig(
        extract_concurrency=(1, max(2, NUM_CPUS // 8)),
        embed_concurrency=(1, max(2, NUM_CPUS // 4)),
        join_partitions=max(4, NUM_CPUS // 4),
        shuffle_partitions=max(8, NUM_CPUS),
        shard_parallelism=max(2, NUM_CPUS // 2),
        dedupe_chunks_before_extract=False,
    )
    t0 = time.time()
    build_snapshot(paths["pages"], out_dir, cfg, resume=False, shard_files=4)
    build_s = time.time() - t0

    n_replicas = int(os.environ.get("GRAFT_SERVE_REPLICAS",
                                    str(max(2, NUM_CPUS // 4))))
    questions = None
    configs = {}
    # two daemon shapes under the SAME sweep: in-process (one GIL) and
    # replica actors (N query processes over shared object-store tiers)
    for label, replicas in (("in_process", 0), ("replicas", n_replicas)):
        svc = GraphRAGService.from_snapshot(out_dir, max_concurrent=20,
                                            replicas=replicas)
        httpd = make_server(svc, port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        host, port = httpd.server_address[:2]
        url = f"http://{host}:{port}/graphrag"

        if questions is None:
            # deterministic question set from the snapshot's own
            # entities: first 20 multi-word node names by entity_id,
            # quoted (anchor/BM25 phrase path) — the reference's
            # QUESTIONS list is likewise a fixed 20-question rotation
            # (enhanced_performance_test.py:79)
            names = [
                r["name"]
                for r in svc.tables["nodes"]
                .select_columns(["entity_id", "name"])
                .sort("entity_id").limit(400).take_all()
                if len(str(r["name"]).split()) >= 2
            ][:20]
            questions = [f'How does "{n}" support the rollout?'
                         for n in names]

        # the client sweep runs in its OWN process so client-side work
        # doesn't share a GIL with the server under test (the
        # reference's perf harness is likewise external to the FastAPI
        # process)
        sweep_cfg = json.dumps({
            "url": url,
            "questions": questions,
            "steps": [1, 4, 8, 16],
            "requests_per_step": int(
                os.environ.get("GRAFT_SERVE_REQS", "24")),
        })
        proc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "serve_client_sweep.py")],
            input=sweep_cfg, capture_output=True, text=True, timeout=1800)
        if proc.returncode != 0:
            raise RuntimeError(f"client sweep failed: {proc.stderr[-2000:]}")
        configs[label] = {
            "replicas": replicas,
            "local_kg": svc.local_kg is not None,
            "steps": json.loads(proc.stdout.strip().splitlines()[-1])["steps"],
        }
        httpd.shutdown()

    best = configs["replicas"]["steps"]
    result = {
        "metric": "graphrag_serve_http_latency",
        "value": best[0]["median_latency_s"],
        "unit": "sec",
        "configs": configs,
        "reference_ceiling_s": 30.0,
        "snapshot_build_s": round(build_s, 3),
        "max_concurrent": 20,
        "n_questions": len(questions),
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "host_capacity": host_capacity(),
    }
    ray.shutdown()
    return result


def _ensure_scaling_corpus() -> str:
    """Generate (once) the fixed larger corpus the scaling runs share."""
    out_dir = f"/tmp/graft_pages/scaling{SCALING_DOCS}"
    pages = os.path.join(out_dir, "pages")
    marker = os.path.join(out_dir, "_complete")
    if os.path.exists(marker):
        return pages

    import ray

    from neo4j_document_pipeline_ray.sources.corpus import generate_corpus

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    generate_corpus(out_dir, n_docs=SCALING_DOCS, docs_per_file=2000)
    with open(marker, "w") as f:
        f.write("ok")
    ray.shutdown()
    return pages


def run_scaling() -> dict:
    """Same job, same input, N vs 4N CPUs in fresh processes.

    Two instantiations of the north rule's two-cluster-size criterion:

    * **4 -> 16 CPUs (primary)** — both points leave DRAM-bandwidth
      headroom on this single box, so the ratio isolates the SOFTWARE's
      scalability, which is what transfers to a real N -> 4N-node
      cluster (where every node brings its own memory subsystem and the
      bandwidth-to-CPU ratio stays constant).
    * **8 -> 32 CPUs (reported alongside)** — the high point saturates
      the single shared memory subsystem during the shuffle stages, so
      this pair under-reports multi-node scaling by construction; see
      BASELINE.md for the per-stage isolation evidence.

    Runs over the dedicated ``SCALING_DOCS`` corpus so useful work
    dominates the fixed per-job latencies, mirroring the
    compute-dominated regime of the real 100 TB deployment.
    """
    pages = _ensure_scaling_corpus()

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))

    def run(ncpu: int) -> dict:
        # min-of-k wall time per CPU level: the shared host shows up to
        # +-50% neighbor-load noise, and the minimum is the least-
        # contaminated estimate of the true runtime at each level
        best = None
        for _ in range(max(1, reps)):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            env[_SCALING_PAGES_ENV] = pages
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            res = json.loads(out.strip().splitlines()[-1])
            if best is None or res["value"] < best["value"]:
                best = res
        return best

    def pair(n_lo: int, n_hi: int) -> dict:
        lo, hi = run(n_lo), run(n_hi)
        eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
        return {
            f"sec_{n_lo}": lo["value"],
            f"sec_{n_hi}": hi["value"],
            f"docs_per_sec_{n_lo}": lo["docs_per_sec"],
            f"docs_per_sec_{n_hi}": hi["docs_per_sec"],
            f"triples_per_sec_{n_lo}": lo["triples_per_sec"],
            f"triples_per_sec_{n_hi}": hi["triples_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "n_docs": lo["n_docs"],
            "sf": lo["sf"],
            "embedding_policy": lo.get("embedding_policy"),
        }

    cap_before = host_capacity()
    primary = pair(4, 16)
    saturated = pair(8, 32)
    return {
        "metric": "scaling_efficiency_4_to_16_cpus",
        "host_capacity": {"before": cap_before, "after": host_capacity()},
        **primary,
        # the embed stage runs LIVE in every scaling leg (widest output
        # columns) — pinned from the child runs' artifacts
        "embedding_policy": primary.get("embedding_policy"),
        "scaling_efficiency_8_to_32_bandwidth_saturated": saturated[
            "scaling_efficiency"
        ],
        "pair_8_to_32": saturated,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--serve" in sys.argv:
        print(json.dumps(run_serve()))
    else:
        print(json.dumps(run_bench()))
