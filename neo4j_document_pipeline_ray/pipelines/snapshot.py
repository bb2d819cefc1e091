"""Durable, resumable graph-snapshot pipeline.

Two stages, mirroring where the cost lives at 100 TB:

**Stage A — extraction (embarrassingly parallel, checkpointed).**
Input files are grouped into shards (at Common-Crawl scale a shard is a
file group; here ``shard_files`` per shard).  Each shard runs
read -> text extraction -> chunk -> distinct-chunk -> triple extraction
-> normalize -> membership join, then writes doc-level triples and the
docs table under ``out/triples/shard=K/`` / ``out/docs/shard=K/`` and
commits a lineage manifest.  A rerun skips committed shards — this is
the resume point, because extraction (the model stage) dominates cost.
Chunk dedup is shard-scoped here (the reference's cache is likewise
run-scoped, ``tasks.py:19-20``); the in-memory pipeline in
``kg_build.py`` demonstrates the cluster-global variant.

**Stage B — graph shuffles (cheap, idempotent, atomic).**
Reads all checkpointed triples and runs the entity/edge/mention/
embedding shuffles, writing ``nodes`` and ``edges`` partitioned by
entity-id range (``bucket = entity_id * B >> 60``) — the bulk-loadable
replacement for the reference's Neo4j ``MERGE`` write layer.  Each
table lands in a temp dir that is atomically renamed, and a root
manifest with counts + stage timings commits the snapshot.

Re-running over the same input is idempotent: identical content hashes,
identical entity ids, identical snapshot (tested in the suite).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional

import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.pipelines.kg_build import dedupe_docs
from neo4j_document_pipeline_ray.stages.chunker import chunk_docs
from neo4j_document_pipeline_ray.stages.edge_agg import build_edges, decode_sources_batch
from neo4j_document_pipeline_ray.stages.embed import (
    build_embeddings,
    decode_embeddings_batch,
)
from neo4j_document_pipeline_ray.stages.entity_link import build_mentions, build_nodes
from neo4j_document_pipeline_ray.stages.extract_text import extract_docs
from neo4j_document_pipeline_ray.stages.normalize import normalize_triples
from neo4j_document_pipeline_ray.stages.triple_extract import extract_triples
from neo4j_document_pipeline_ray.state import manifest as mf


def _list_input_files(pages_path: str) -> List[str]:
    if os.path.isdir(pages_path):
        return sorted(
            os.path.join(pages_path, f)
            for f in os.listdir(pages_path)
            if f.endswith(".parquet")
        )
    return [pages_path]


def _shard_groups(files: List[str], shard_files: int) -> List[List[str]]:
    return [files[i : i + shard_files] for i in range(0, len(files), shard_files)]


def run_extraction_shard(
    files: List[str], out_dir: str, shard: int, cfg: PipelineConfig,
    extract_backend=None,
) -> Dict:
    t0 = time.time()
    pages = ray.data.read_parquet(files, columns=["url", "html"])
    docs = dedupe_docs(extract_docs(pages, cfg))
    chunks = chunk_docs(docs, cfg).materialize()
    membership = chunks.select_columns(["doc_id", "chunk_idx", "chunk_id"])
    uniq = chunks.groupby("chunk_id").aggregate(Min("text", alias_name="text"))
    raw = extract_triples(uniq, cfg, backend=extract_backend)
    norm = normalize_triples(raw, cfg)
    triples = norm.join(
        membership, join_type="inner",
        num_partitions=cfg.join_partitions, on=("chunk_id",),
    ).materialize()

    docs_dir = os.path.join(out_dir, "docs", f"shard={shard:05d}")
    trip_dir = os.path.join(out_dir, "triples", f"shard={shard:05d}")
    for d in (docs_dir, trip_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)  # uncommitted leftovers from a killed run
    docs.write_parquet(docs_dir)
    triples.write_parquet(trip_dir)

    n_docs = docs.count()
    n_chunks = chunks.count()
    n_triples = triples.count()
    urls = [r["url"] for r in docs.select_columns(["url"]).take_all()]
    stats = {
        "input_files": [os.path.basename(f) for f in files],
        "url_range": [min(urls), max(urls)] if urls else [None, None],
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "n_triples": n_triples,
        "wall_s": round(time.time() - t0, 3),
    }
    mf.commit_shard(out_dir, shard, stats)
    return stats


def _write_bucketed(ds, out_dir: str, name: str, cfg: PipelineConfig,
                    bucket_col: Optional[str]) -> None:
    """Write a table partitioned by entity-id range via an atomic rename."""
    final_dir = os.path.join(out_dir, name)
    tmp_dir = os.path.join(out_dir, f".tmp-{name}")
    for d in (final_dir, tmp_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    if bucket_col is not None:
        buckets = cfg.entity_buckets

        def add_bucket(t: pa.Table) -> pa.Table:
            ids = t[bucket_col].to_pylist()
            b = [(i * buckets) >> 60 for i in ids]  # entity ids are 60-bit
            return t.append_column("bucket", pa.array(b, pa.int32()))

        ds = ds.map_batches(add_bucket, batch_format="pyarrow")
        ds.write_parquet(tmp_dir, partition_cols=["bucket"])
    else:
        ds.write_parquet(tmp_dir)
    os.replace(tmp_dir, final_dir)


def build_snapshot(
    pages_path: str,
    out_dir: str,
    cfg: Optional[PipelineConfig] = None,
    resume: bool = True,
    shard_files: int = 1,
    extract_backend=None,
    embed_backend=None,
    with_embeddings: bool = True,
) -> Dict:
    """Run (or resume) the full pipeline into a partitioned Parquet snapshot."""
    cfg = cfg or PipelineConfig()
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)

    shards = _shard_groups(_list_input_files(pages_path), shard_files)
    skipped = 0
    for i, files in enumerate(shards):
        if resume and mf.shard_committed(out_dir, i):
            skipped += 1
            continue
        run_extraction_shard(files, out_dir, i, cfg, extract_backend)
    t_extract = time.time()

    triples = ray.data.read_parquet(os.path.join(out_dir, "triples")).materialize()

    nodes = build_nodes(triples, cfg)
    mentions = build_mentions(triples, cfg)
    edges = build_edges(triples, cfg)
    if with_embeddings:
        embeddings = build_embeddings(triples, cfg, backend=embed_backend).materialize()
        nodes = nodes.join(
            embeddings, join_type="inner", num_partitions=cfg.join_partitions,
            on=("node_key",), right_on=("text_key",),
        ).map_batches(decode_embeddings_batch, batch_format="pyarrow")
        edges = edges.join(
            embeddings, join_type="inner", num_partitions=cfg.join_partitions,
            on=("rel_key",), right_on=("text_key",),
        ).map_batches(decode_embeddings_batch, batch_format="pyarrow")
    edges = edges.map_batches(decode_sources_batch, batch_format="pyarrow")

    _write_bucketed(nodes, out_dir, "nodes", cfg, "entity_id")
    _write_bucketed(edges, out_dir, "edges", cfg, "src_id")
    _write_bucketed(mentions, out_dir, "mentions", cfg, None)
    t_done = time.time()

    counts = {
        "n_triples": triples.count(),
        "n_nodes": ray.data.read_parquet(os.path.join(out_dir, "nodes")).count(),
        "n_edges": ray.data.read_parquet(os.path.join(out_dir, "edges")).count(),
        "n_mentions": ray.data.read_parquet(os.path.join(out_dir, "mentions")).count(),
        "n_docs": sum(
            (mf.read_json(mf.shard_manifest_path(out_dir, s)) or {}).get("n_docs", 0)
            for s in mf.committed_shards(out_dir)
        ),
    }
    root = {
        "tables": ["docs", "triples", "nodes", "edges", "mentions"],
        "entity_buckets": cfg.entity_buckets,
        "shards": len(shards),
        "shards_skipped_on_resume": skipped,
        "counts": counts,
        "stage_timings_s": {
            "extraction": round(t_extract - t_start, 3),
            "graph_shuffles": round(t_done - t_extract, 3),
            "total": round(t_done - t_start, 3),
        },
    }
    mf.write_json_atomic(mf.root_manifest_path(out_dir), root)
    return root
