"""Durable, resumable graph-snapshot pipeline.

Two stages, mirroring where the cost lives at 100 TB:

**Stage A — extraction (embarrassingly parallel, checkpointed).**
Input files are grouped into shards (at Common-Crawl scale a shard is a
file group; here ``shard_files`` per shard).  Each shard runs
read -> text extraction -> chunk -> distinct-chunk -> triple extraction
-> normalize -> membership join, then writes doc-level triples and the
docs table under ``out/triples/shard=K/`` / ``out/docs/shard=K/`` and
commits a lineage manifest.  A rerun skips committed shards whose
recorded input file group matches the current plan — this is the
resume point, because extraction (the model stage) dominates cost.
Chunk dedup is shard-scoped here (the reference's cache is likewise
run-scoped, ``tasks.py:19-20``); the in-memory pipeline in
``kg_build.py`` demonstrates the cluster-global variant.

**Stage B — graph shuffles (cheap, idempotent, atomic).**
Reads the checkpointed triples of the current plan's shards and runs
the entity/edge/mention/embedding shuffles, writing ``nodes`` and
``edges`` partitioned by
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
import pyarrow.compute as pc

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.stages.grouped import broadcast_join, min_by_key, safe_join
from neo4j_document_pipeline_ray.pipelines.kg_build import dedupe_docs
from neo4j_document_pipeline_ray.stages.chunker import chunk_docs
from neo4j_document_pipeline_ray.stages.edge_agg import (
    EDGE_INPUT_COLS,
    build_edges,
    decode_sources_batch,
)
from neo4j_document_pipeline_ray.stages.embed import embed_column
from neo4j_document_pipeline_ray.stages.entity_link import (
    MENTION_INPUT_COLS,
    NODE_INPUT_COLS,
    build_mentions,
    build_nodes,
)
from neo4j_document_pipeline_ray.stages.extract_text import extract_docs
from neo4j_document_pipeline_ray.stages.normalize import TRIPLES_SCHEMA, normalize_triples
from neo4j_document_pipeline_ray.stages.triple_extract import extract_triples
from neo4j_document_pipeline_ray.state import manifest as mf


def _patch_fsspec_http_for_threads() -> None:
    """Make ``fsspec.implementations.http`` import-safe under threads.

    The module fails to import here (no aiohttp).  Single-threaded, Ray's
    ``_is_http_filesystem`` catches the ``ModuleNotFoundError``; but when
    several shard threads race the first import, the partially-initialized
    module raises a plain ``ImportError`` that Ray does not catch.  Install
    a stub with a never-matching ``HTTPFileSystem`` class so the import
    always succeeds deterministically.
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder: aiohttp unavailable in this env
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        try:
            import fsspec.implementations as fsi

            fsi.http = mod
        except Exception:
            pass


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


def _effective_shard_workers(cfg: PipelineConfig, n_todo: int) -> int:
    """Concurrent shard pipelines, capped so actor pools can't starve tasks.

    Each shard pipeline holds an extraction actor pool for its lifetime;
    running more shards than ``CPUs // (min_actors + 1)`` would pin every
    CPU under actors and deadlock the stateless tasks (read/join/write)
    behind them.  The ``+1`` reserves at least one task slot per shard.
    """
    import ray

    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if not cpus:
        cpus = os.cpu_count() or 8
    ec = cfg.extract_concurrency
    min_actors = ec[0] if isinstance(ec, (tuple, list)) else ec
    per_shard = max(2, int(min_actors) + 1)
    return max(1, min(cfg.shard_parallelism, n_todo, cpus // per_shard))


def run_extraction_shard(
    files: List[str], out_dir: str, shard: int, cfg: PipelineConfig,
    extract_backend=None,
) -> Dict:
    t0 = time.time()
    pages = ray.data.read_parquet(
        files, columns=["url", "html"],
        override_num_blocks=max(2, len(files) * cfg.read_blocks_per_file),
    )
    docs = dedupe_docs(extract_docs(pages, cfg)).materialize()
    chunks = chunk_docs(docs, cfg)
    if cfg.dedupe_chunks_before_extract:
        # extract once per DISTINCT chunk, join results back onto every
        # (doc, chunk) pair — the reference's chunk-cache semantics;
        # right when extraction is model-priced
        chunks = chunks.materialize()
        membership = chunks.select_columns(["doc_id", "chunk_idx", "chunk_id"])
        uniq = min_by_key(chunks.select_columns(["chunk_id", "text"]), "chunk_id",
                          num_partitions=cfg.shuffle_partitions)
        raw = extract_triples(uniq, cfg, backend=extract_backend)
        norm = normalize_triples(raw, cfg).materialize()
        if norm.count() == 0:
            # a shard whose pages yield ZERO triples (e.g. a one-page
            # incremental ingest of plain prose) leaves `norm` with no
            # schema at all — the hash join would abort ("no match for
            # key field chunk_id").  Substitute the typed empty result
            # the join would have produced (left cols then membership's
            # non-key cols, matching every other shard's parquet schema).
            empty = (TRIPLES_SCHEMA.empty_table()
                     .append_column("doc_id", pa.array([], pa.string()))
                     .append_column("chunk_idx", pa.array([], pa.int32())))
            triples = ray.data.from_arrow(empty)
        else:
            triples = safe_join(norm,
                membership, join_type="inner",
                num_partitions=cfg.join_partitions, on=("chunk_id",),
            )
    else:
        # extraction is a cheap pure function: run it per (doc, chunk)
        # and stream straight into the write — no distinct shuffle, no
        # join-back, identical output
        raw = extract_triples(
            chunks.select_columns(["doc_id", "chunk_idx", "chunk_id", "text"]),
            cfg, backend=extract_backend,
        )
        triples = normalize_triples(raw, cfg)

    docs_dir = os.path.join(out_dir, "docs", f"shard={shard:05d}")
    trip_dir = os.path.join(out_dir, "triples", f"shard={shard:05d}")
    for d in (docs_dir, trip_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)  # uncommitted leftovers from a killed run
    docs.write_parquet(docs_dir)
    triples.write_parquet(trip_dir)  # extraction streams into the write
    os.makedirs(trip_dir, exist_ok=True)  # empty write may not create it
    if not any(f.endswith(".parquet") for f in os.listdir(trip_dir)):
        # zero-triple shard: write_parquet of an empty dataset emits no
        # files, but stage B does a per-shard read_parquet(trip_dir) —
        # pin one 0-row file with the canonical triples-table schema
        import pyarrow.parquet as pq

        empty = (TRIPLES_SCHEMA.empty_table()
                 .append_column("doc_id", pa.array([], pa.string()))
                 .append_column("chunk_idx", pa.array([], pa.int32())))
        pq.write_table(empty, os.path.join(trip_dir, "empty_000000.parquet"))

    # lineage from parquet footers — no extra Ray jobs
    stats = {
        "input_files": [os.path.basename(f) for f in files],
        "url_range": list(_parquet_col_range(docs_dir, "url")),
        "n_docs": _parquet_rows(docs_dir),
        "n_chunks": chunks.count() if cfg.dedupe_chunks_before_extract else None,
        "n_triples": _parquet_rows(trip_dir),
        "wall_s": round(time.time() - t0, 3),
    }
    mf.commit_shard(out_dir, shard, stats)
    return stats


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Ray job, no data read."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _parquet_uncompressed_bytes(
    paths: List[str], columns: "Optional[List[str]]" = None,
) -> int:
    """Uncompressed (in-memory-ish) byte size from parquet footers — the
    zero-cost stand-in for ``Dataset.size_bytes()`` on a lazy read.
    ``columns`` restricts the sum to those columns' chunks, matching a
    pruned ``read_parquet(columns=...)``."""
    import pyarrow.parquet as pq

    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        if columns is None:
            for rg in range(md.num_row_groups):
                total += md.row_group(rg).total_byte_size
            continue
        idx = [
            i for i in range(md.num_columns)
            # path_in_schema is dotted for nested fields; match the root
            if md.row_group(0).column(i).path_in_schema.split(".")[0]
            in columns
        ] if md.num_row_groups else []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in idx:
                total += g.column(i).total_uncompressed_size
    return total


def _parquet_col_range(path: str, col: str):
    """(min, max) of a column from parquet footer statistics."""
    import pyarrow.parquet as pq

    lo = hi = None
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            sch_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if col not in sch_idx:
                continue
            ci = sch_idx[col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None or st.min < lo else lo
                hi = st.max if hi is None or st.max > hi else hi
    return lo, hi


def compute_bucket(ids, buckets: int) -> "pa.Array":
    """``bucket = (id * B) >> 60`` over 60-bit entity ids, in uint64
    (no wrap possible for B <= 16: (2^60-1)*16 < 2^64); power-of-two B
    reduces to a plain shift with no multiply.  This is THE snapshot
    bucket function: the incremental merge (``incremental.py``) relies
    on delta and committed partitions using bit-identical layout."""
    ids = pc.cast(ids, pa.uint64())
    if buckets & (buckets - 1) == 0:
        b = pc.shift_right(ids, 60 - (buckets.bit_length() - 1))
    elif buckets <= 16:
        b = pc.shift_right(pc.multiply(ids, pa.scalar(buckets, pa.uint64())), 60)
    else:
        raise ValueError(
            f"entity_buckets must be a power of two or <= 16 (got {buckets})"
        )
    return pc.cast(b, pa.int32())


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
            t = t.append_column("bucket", compute_bucket(t[bucket_col], buckets))
            # sort within the block so parquet row-group min/max stats on
            # the id column are range-informative (the reader can prune
            # row groups) without paying a global sort barrier — the
            # replacement for the reference's per-label b-tree indexes
            # (ingestMD.py:669-690)
            return t.sort_by(bucket_col)

        ds = ds.map_batches(add_bucket, batch_format="pyarrow")
        ds.write_parquet(tmp_dir, partition_cols=["bucket"])
    else:
        ds.write_parquet(tmp_dir)
    os.replace(tmp_dir, final_dir)


def _shard_reusable(out_dir: str, shard: int, files: List[str]) -> bool:
    """A committed shard is reusable on resume only if its recorded
    input file group matches the CURRENT plan's group for this index.

    Without this check, changing the input file set (or ``shard_files``)
    between a partial run and a resume silently mixes old and new
    inputs: shard i would map to a different file group yet be skipped
    as committed.  The manifest already records ``input_files``; compare
    and re-run on mismatch.
    """
    man = mf.read_json(mf.shard_manifest_path(out_dir, shard))
    if not man:
        return False
    if man.get("input_files") != [os.path.basename(f) for f in files]:
        return False
    for name in ("docs", "triples"):
        if not os.path.isdir(os.path.join(out_dir, name, f"shard={shard:05d}")):
            return False
    return True


def _first_parquet(path: str) -> Optional[str]:
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


def _incremental_eligible(
    out_dir: str, shards: List[List[str]], todo, cfg: PipelineConfig,
    with_embeddings: bool,
) -> bool:
    """True iff stage B can fold ONLY the new shards into the committed
    snapshot (``incremental.incremental_stage_b``) instead of re-running
    the global shuffles over every shard.

    Requirements (else fall back to a full, always-correct stage B):

    * a committed root manifest whose stage-B input was EXACTLY the
      reusable shards of the current plan (the reusable set is the
      prefix ``0..prev_n-1`` and every todo shard is new) — re-doing a
      middle shard means committed aggregates contain rows that must be
      *retracted*, which last-wins/min/union partials cannot express;
    * identical bucket layout (``entity_buckets``) and embedding policy;
    * the committed tables carry the incremental fingerprints: ``ord``
      on edges (the persisted last-wins ordinal), ``node_key`` on
      nodes, and a ``bucket=`` partitioned mentions table.
    """
    import pyarrow.parquet as pq

    if not todo:
        return False
    root = mf.read_json(mf.root_manifest_path(out_dir))
    if not root:
        return False
    prev_n = root.get("shards")
    reused = set(range(len(shards))) - {i for i, _ in todo}
    if not isinstance(prev_n, int) or reused != set(range(prev_n)):
        return False
    if root.get("entity_buckets") != cfg.entity_buckets:
        return False
    if root.get("with_embeddings") != with_embeddings:
        return False
    try:
        for name, id_col, required in (
            ("edges", "src_id", ("ord",)),
            ("nodes", "entity_id", ("node_key",)),
            ("mentions", "entity_id", ()),
        ):
            base = os.path.join(out_dir, name)
            if not any(d.startswith("bucket=") for d in os.listdir(base)):
                return False
            f = _first_parquet(base)
            if f is None:
                return False
            names = set(pq.read_schema(f).names)
            if not set(required) <= names or id_col not in names:
                return False
            if with_embeddings and name != "mentions" and "embedding" not in names:
                return False
    except OSError:
        return False
    return True


def wipe_snapshot(out_dir: str) -> None:
    """Destructive reset of a snapshot directory (the analog of the
    reference's batched full-DB wipe, ``clean.py:4-72``): removes every
    table and all manifests so the next run starts from nothing.
    ``build_snapshot(resume=False)`` already overwrites table-by-table;
    this is the explicit clean-slate tool."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)


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
    if embed_backend is None:
        from neo4j_document_pipeline_ray.stages.embed import (
            make_embedder_backend,
        )

        embed_backend = make_embedder_backend(cfg)
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)

    shards = _shard_groups(_list_input_files(pages_path), shard_files)
    todo = [(i, files) for i, files in enumerate(shards)
            if not (resume and _shard_reusable(out_dir, i, files))]
    skipped = len(shards) - len(todo)

    if resume and not todo:
        # Fully-committed snapshot over exactly this input: nothing to
        # extract and the committed stage B already covers every shard —
        # return the manifest without re-running a single Ray job (the
        # per-document MERGE analog: re-ingesting nothing writes nothing).
        root = mf.read_json(mf.root_manifest_path(out_dir))
        if (root and root.get("shards") == len(shards)
                and root.get("with_embeddings") == with_embeddings
                and all(os.path.isdir(os.path.join(out_dir, t))
                        for t in ("docs", "triples", "nodes", "edges",
                                  "mentions"))):
            root = dict(root)
            root["shards_skipped_on_resume"] = skipped
            root["stage_b_mode"] = "skipped"
            return root

    # Decide BEFORE stage A whether the committed snapshot admits an
    # incremental fold of just the new shards (manifest + schema
    # fingerprints only — stage A does not change them).
    incremental = resume and _incremental_eligible(
        out_dir, shards, todo, cfg, with_embeddings)
    if todo:
        # Shard pipelines are independent; run a few concurrently so one
        # shard's stage latency doesn't idle the cluster.  Each thread
        # drives its own streaming execution; Ray schedules tasks from
        # all of them onto the shared CPU pool.
        _patch_fsspec_http_for_threads()
        from concurrent.futures import ThreadPoolExecutor

        workers = _effective_shard_workers(cfg, len(todo))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = [
                pool.submit(run_extraction_shard, files, out_dir, i, cfg, extract_backend)
                for i, files in todo
            ]
            for f in futs:
                f.result()
    t_extract = time.time()
    timings: Dict[str, float] = {}

    def timed(name: str, fn):
        t = time.time()
        res = fn()
        timings[name] = round(time.time() - t, 3)
        return res

    # Stage-B reads are restricted to the CURRENT plan's shard dirs, and
    # out-of-plan leftovers from a previous larger run are PRUNED here so
    # whole-directory readers (cli status / _load_tables) can't see them.
    plan_ids = list(range(len(shards)))
    for name in ("docs", "triples"):
        base = os.path.join(out_dir, name)
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if d.startswith("shard=") and int(d.split("=")[1]) >= len(shards):
                shutil.rmtree(os.path.join(base, d))
                stale = mf.shard_manifest_path(out_dir, int(d.split("=")[1]))
                if os.path.exists(stale):
                    os.remove(stale)

    def _plan_dirs(name: str) -> List[str]:
        return [os.path.join(out_dir, name, f"shard={i:05d}") for i in plan_ids]

    def _plan_files(name: str) -> List[str]:
        # read_parquet expands a single directory but not a LIST of
        # directories — enumerate the shard files explicitly
        out = []
        for d in _plan_dirs(name):
            out.extend(
                sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
            )
        return out

    # Edge aggregation is the critical path (it moves the provenance
    # payload), so it runs UNCONTENDED on the main thread while one
    # helper thread serializes the two cheap shuffles (nodes, mentions)
    # beside it — measured ~25% faster than three fully concurrent
    # threads fighting for the same memory bandwidth.  Embeddings attach
    # directly to the post-aggregation rows (zero-shuffle
    # ``embed_column``), so nothing waits on an embeddings table.
    from concurrent.futures import ThreadPoolExecutor

    _patch_fsspec_http_for_threads()

    # Each consumer does its own PRUNED re-read of the checkpointed shard
    # parquet — mentions needs 3 columns, nodes 8, only edges touches the
    # 1 KB provenance text.  Nothing pins the full triples table in the
    # object store: every stage streams read -> partial-agg -> exchange
    # with backpressure, and Ray fuses the read into the first
    # map_batches so the wide ``src_text`` column lives only inside the
    # edge partial task (under ``ref`` exchange it is hashed there and
    # never enters an exchange at all).
    if incremental:
        # Fold ONLY the new shards' checkpointed triples into the
        # committed tables: the delta traverses the exchange, committed
        # rows merge bucket-locally (O(new shard) shuffle).
        from neo4j_document_pipeline_ray.pipelines.incremental import (
            incremental_stage_b,
        )

        new_files: List[str] = []
        for i, _files in todo:
            d = os.path.join(out_dir, "triples", f"shard={i:05d}")
            new_files.extend(
                sorted(os.path.join(d, f) for f in os.listdir(d)
                       if f.endswith(".parquet")))
        inc = incremental_stage_b(
            out_dir, new_files, cfg,
            with_embeddings=with_embeddings, embed_backend=embed_backend)
        timings.update(inc["timings"])
        inc_buckets = inc["buckets"]
    else:
        inc_buckets = None
        trip_files = _plan_files("triples")
        trip_bytes = _parquet_uncompressed_bytes(trip_files)

        def _read_triples(cols: List[str]) -> "ray.data.Dataset":
            return ray.data.read_parquet(trip_files, columns=cols)

        def run_mentions():
            mentions = build_mentions(
                _read_triples(MENTION_INPUT_COLS), cfg,
                input_bytes=_parquet_uncompressed_bytes(
                    trip_files, MENTION_INPUT_COLS))
            _write_bucketed(mentions, out_dir, "mentions", cfg, "entity_id")

        def run_nodes():
            nodes = build_nodes(
                _read_triples(NODE_INPUT_COLS), cfg,
                input_bytes=_parquet_uncompressed_bytes(
                    trip_files, NODE_INPUT_COLS))
            if with_embeddings:
                nodes = embed_column(nodes, "node_key", cfg, backend=embed_backend)
            _write_bucketed(nodes, out_dir, "nodes", cfg, "entity_id")

        def run_edges():
            edges = build_edges(
                _read_triples(EDGE_INPUT_COLS), cfg,
                prov_source=_read_triples(["src_text"]),
                input_bytes=trip_bytes,
                # persist the winning mention ordinal so a later run can
                # re-apply deterministic-last against the committed rows
                keep_ord=True,
            )
            if with_embeddings:
                edges = embed_column(edges, "rel_key", cfg, backend=embed_backend)
            edges = edges.map_batches(decode_sources_batch, batch_format="pyarrow")
            _write_bucketed(edges, out_dir, "edges", cfg, "src_id")

        with ThreadPoolExecutor(max_workers=1) as pool:
            side = pool.submit(
                lambda: (timed("nodes", run_nodes), timed("mentions", run_mentions))
            )
            timed("edges", run_edges)
            side.result()
    t_done = time.time()

    counts = {
        "n_triples": sum(_parquet_rows(d) for d in _plan_dirs("triples")),
        "n_nodes": _parquet_rows(os.path.join(out_dir, "nodes")),
        "n_edges": _parquet_rows(os.path.join(out_dir, "edges")),
        "n_mentions": _parquet_rows(os.path.join(out_dir, "mentions")),
        "n_docs": sum(
            (mf.read_json(mf.shard_manifest_path(out_dir, s)) or {}).get("n_docs", 0)
            for s in plan_ids
        ),
    }
    root = {
        "tables": ["docs", "triples", "nodes", "edges", "mentions"],
        "entity_buckets": cfg.entity_buckets,
        "shards": len(shards),
        "shards_skipped_on_resume": skipped,
        "with_embeddings": with_embeddings,
        "stage_b_mode": "incremental" if incremental else "full",
        **({"incremental_buckets": inc_buckets} if inc_buckets else {}),
        "counts": counts,
        "stage_timings_s": {
            "extraction": round(t_extract - t_start, 3),
            "graph_shuffles": round(t_done - t_extract, 3),
            "total": round(t_done - t_start, 3),
            **{f"shuffle_{k}": v for k, v in timings.items()},
        },
    }
    mf.write_json_atomic(mf.root_manifest_path(out_dir), root)
    return root
