"""Command-line entry points (the ``ray job submit`` surface).

Replaces the reference's FastAPI/Celery operational surface
(``main.py:479-495`` upload+enqueue, ``main.py:221-400`` /graphrag,
``main.py:600-726`` stats, ``clean.py`` wipe) with batch commands:

    python -m neo4j_document_pipeline_ray.cli build --pages DIR --out DIR
    python -m neo4j_document_pipeline_ray.cli query --snapshot DIR "question"
    python -m neo4j_document_pipeline_ray.cli stats --snapshot DIR
    python -m neo4j_document_pipeline_ray.cli status --out DIR
    python -m neo4j_document_pipeline_ray.cli wipe --out DIR

``build`` resumes from committed shards by default (pass ``--no-resume``
to redo everything); ``query`` runs the full /graphrag retrieval flow
over a materialized snapshot.  The module owns its Ray session (guarded
init), per the repo convention that only CLIs, bench and the test
fixture call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_tables(snapshot_dir: str):
    import ray.data as rd

    return {
        "nodes": rd.read_parquet(os.path.join(snapshot_dir, "nodes")),
        "edges": rd.read_parquet(os.path.join(snapshot_dir, "edges")),
        "mentions": rd.read_parquet(os.path.join(snapshot_dir, "mentions")),
        "docs": rd.read_parquet(os.path.join(snapshot_dir, "docs")),
    }


def cmd_build(args: argparse.Namespace) -> int:
    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

    _init_ray(args.num_cpus)
    cfg = PipelineConfig()
    root = build_snapshot(
        args.pages, args.out, cfg,
        resume=not args.no_resume, shard_files=args.shard_files,
    )
    if args.with_indexes:
        # persisted index artifacts over the freshly written nodes table
        # — the analog of the reference's fulltext + vector index DDL at
        # ingest time (graphutil.py:211-217, ingestMD.py:669-702)
        import ray.data as rd

        from neo4j_document_pipeline_ray.pipelines.graphrag import (
            build_node_ann_index,
            build_text_index,
        )

        nodes = rd.read_parquet(os.path.join(args.out, "nodes")).materialize()
        root["text_index"] = build_text_index(
            nodes, os.path.join(args.out, "text_index"))
        # the node layout (vec_id + label/name payload) the query
        # layer's vector channel reads — a bare entity_id+embedding
        # index would KeyError in vector_index_topk
        root["ann_index"] = build_node_ann_index(
            nodes, os.path.join(args.out, "ann_index"))
    print(json.dumps(root, indent=2))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag
    from neo4j_document_pipeline_ray.pipelines.graphrag_local import (
        DEFAULT_LOCAL_BUDGET,
    )

    _init_ray(args.num_cpus)
    tables = {k: v.materialize() for k, v in _load_tables(args.snapshot).items()}
    text_index = os.path.join(args.snapshot, "text_index")
    res = graphrag(
        tables, args.question, top_k=args.top_k, hops=args.hops,
        use_mmr=not args.no_mmr, use_cross_doc=not args.no_cross_doc,
        text_index_dir=text_index if os.path.isdir(text_index) else None,
        # serving fast path: pull the pruned projection when it fits;
        # oversized tiers stay on the distributed steps
        local_max_bytes=DEFAULT_LOCAL_BUDGET,
    )
    print(res["facts"])
    print(json.dumps({"seeds": res["seeds"], "n_nodes": res["n_nodes"],
                      "n_rels": res["n_rels"], "timings_s": res["timings_s"]}),
          file=sys.stderr)
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    """Counts per label / rel type + root manifest (main.py:600-726)."""
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate
    from neo4j_document_pipeline_ray.state import manifest as mf

    _init_ray(args.num_cpus)
    t = _load_tables(args.snapshot)

    def counts(ds, key):
        # two-phase Arrow aggregate (not Ray's sort-based groupby)
        rows = hash_aggregate(ds.select_columns([key]), key,
                              [(key, "count", "n")]).take_all()
        return {r[key]: r["n"] for r in rows}

    out = {
        "root_manifest": mf.read_json(mf.root_manifest_path(args.snapshot)),
        "labels": counts(t["nodes"], "label"),
        "rel_types": counts(t["edges"], "rel_type"),
    }
    print(json.dumps(out, indent=2))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    """Per-shard build progress from the manifests alone — NO Ray
    session, safe to run while a build is in flight (the batch analog of
    the reference's ``GET /ingest/status`` + ``/queue_stats``,
    ``main.py:497-588``)."""
    from neo4j_document_pipeline_ray.state import manifest as mf

    out_dir = args.out
    committed = mf.committed_shards(out_dir)
    shards = []
    totals = {"n_docs": 0, "n_triples": 0, "wall_s": 0.0}
    for s in committed:
        man = mf.read_json(mf.shard_manifest_path(out_dir, s)) or {}
        shards.append({
            "shard": s,
            "n_docs": man.get("n_docs"),
            "n_triples": man.get("n_triples"),
            "wall_s": man.get("wall_s"),
            "input_files": man.get("input_files"),
        })
        totals["n_docs"] += man.get("n_docs") or 0
        totals["n_triples"] += man.get("n_triples") or 0
        totals["wall_s"] += man.get("wall_s") or 0.0
    # shard dirs that exist but are not committed = in flight / crashed
    trip_root = os.path.join(out_dir, "triples")
    seen_dirs = set()
    if os.path.isdir(trip_root):
        for name in os.listdir(trip_root):
            if name.startswith("shard="):
                seen_dirs.add(int(name.split("=", 1)[1]))
    in_flight = sorted(seen_dirs - set(committed))
    root = mf.read_json(mf.root_manifest_path(out_dir))
    status = {
        "committed_shards": len(committed),
        "in_flight_shards": in_flight,
        "totals": totals,
        "snapshot_committed": root is not None,
        "stage_timings_s": (root or {}).get("stage_timings_s"),
        "shards": shards if args.verbose else shards[:10],
    }
    print(json.dumps(status, indent=2))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    import json

    from neo4j_document_pipeline_ray.pipelines.compact import (
        compact_snapshot,
    )

    _init_ray(args.num_cpus)
    stats = compact_snapshot(args.out, target_bytes=args.target_mb << 20)
    print(json.dumps(stats))
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Online serving daemon: the reference's FastAPI surface
    (main.py /graphrag /healthz /queue_status /graph/* /documents)
    over a built snapshot, with semaphore admission."""
    from neo4j_document_pipeline_ray.serve import GraphRAGService, serve_forever

    _init_ray(args.num_cpus)
    svc = GraphRAGService.from_snapshot(
        args.snapshot, max_concurrent=args.max_concurrent,
        replicas=args.replicas, pages_dir=args.pages,
        shard_files=args.shard_files)
    serve_forever(svc, args.host, args.port)
    return 0


def cmd_wipe(args: argparse.Namespace) -> int:
    from neo4j_document_pipeline_ray.pipelines.snapshot import wipe_snapshot

    wipe_snapshot(args.out)
    print(f"wiped {args.out}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="neo4j_document_pipeline_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) a KG snapshot")
    b.add_argument("--pages", required=True, help="pages parquet dir/file")
    b.add_argument("--out", required=True, help="snapshot output dir")
    b.add_argument("--shard-files", type=int, default=4)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--with-indexes", action="store_true",
                   help="also build text (BM25 df) + ANN (LSH bucket) "
                        "index artifacts under the snapshot dir")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="GraphRAG retrieval over a snapshot")
    q.add_argument("question")
    q.add_argument("--snapshot", required=True)
    q.add_argument("--top-k", type=int, default=5)
    q.add_argument("--hops", type=int, default=1)
    q.add_argument("--no-mmr", action="store_true")
    q.add_argument("--no-cross-doc", action="store_true")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("stats", help="label/rel-type counts + manifest")
    s.add_argument("--snapshot", required=True)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_stats)

    st = sub.add_parser(
        "status", help="per-shard build progress (manifest-only, no Ray)")
    st.add_argument("--out", required=True, help="snapshot output dir")
    st.add_argument("--verbose", action="store_true",
                    help="list every shard, not just the first 10")
    st.set_defaults(fn=cmd_status)

    c = sub.add_parser(
        "compact",
        help="merge small part files inside each snapshot partition")
    c.add_argument("--out", required=True)
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    sv = sub.add_parser(
        "serve",
        help="HTTP serving daemon over a snapshot (/graphrag, /healthz, "
             "/queue_status, /graph/stats, /graph/schema, /graph/search, "
             "/documents)")
    sv.add_argument("--snapshot", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--max-concurrent", type=int, default=20,
                    help="admission cap on in-flight /graphrag requests")
    sv.add_argument("--replicas", type=int, default=0,
                    help="N>0: fan /graphrag out to N single-process Ray "
                         "replica actors sharing object-store tier copies "
                         "(requires the snapshot's serving tiers to fit "
                         "the local budget); 0 answers in-process")
    sv.add_argument("--pages", default=None,
                    help="writable pages dir the snapshot was built from; "
                         "enables POST /ingest (staged uploads fold into "
                         "the snapshot incrementally and the daemon "
                         "hot-swaps to the new commit)")
    sv.add_argument("--shard-files", type=int, default=1,
                    help="shard grouping used when the snapshot was built "
                         "(must match for incremental ingest folds)")
    sv.add_argument("--num-cpus", type=int, default=None)
    sv.set_defaults(fn=cmd_serve)

    w = sub.add_parser("wipe", help="destructively reset a snapshot dir")
    w.add_argument("--out", required=True)
    w.set_defaults(fn=cmd_wipe)

    args = p.parse_args(argv)
    rc = args.fn(args)

    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
