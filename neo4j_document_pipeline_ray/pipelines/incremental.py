"""Incremental stage B: fold NEW extraction shards into a committed
snapshot without re-shuffling the old corpus.

The reference's write layer is per-document incremental by construction
— every ingest ``MERGE``\\ s its nodes/edges into the live Neo4j store
(``ingestMD.py:500-554``) — so adding one document never re-processes
the others.  The from-scratch stage B here re-runs the global shuffles
over every committed shard instead.  This module restores the
reference's incremental property at shard granularity, exploiting that
all three stage-B aggregations are ASSOCIATIVE partials:

* **nodes** — min-by-entity of ``rep_key`` (`entity_link.py`): the
  committed winner row converts back into one candidate row;
* **mentions** — distinct ``(doc_id, entity_id)`` pairs: set union;
* **edges** — sorted-``ord`` last-wins + source-set union
  (`edge_agg.py`): the committed row re-enters the merge as a partial,
  provided the winning ``ord`` was persisted (``build_edges(keep_ord)``).

Mechanics (and the partitioning assumption they rely on): every table
is laid out as ``bucket = f(entity id)`` hash-range partitions, the
SAME bucket function for the committed table and the delta, so a merge
is bucket-local:

1. the new shards' triples stream through the usual pruned-read →
   in-batch partial-agg passes and land in a spill dir PARTITIONED by
   bucket — the only rows that traverse an exchange, O(new shard);
2. one Ray task per TOUCHED bucket reads the committed partition +
   the delta partition, re-runs the same Arrow merge kernel the
   from-scratch path uses, and writes the replacement partition —
   committed rows move node-locally, never through a shuffle;
3. untouched buckets are hard-linked; the table flips via atomic
   rename.  Embeddings are recomputed ONLY for rows whose embedding
   key changed (model-priced at 100 TB; the committed vector rides
   along otherwise).

The merge is IDEMPOTENT (min/union/last-wins against an
already-folded delta is a no-op), so a crash between table renames is
repaired by re-running — and `snapshot.build_snapshot` falls back to a
full stage B whenever the committed fingerprint doesn't match.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.pipelines.snapshot import compute_bucket


def _write_delta(ds: "ray.data.Dataset", delta_dir: str, id_col: str,
                 buckets: int) -> None:
    """Spill a (small) delta dataset partitioned by entity-id bucket —
    the only exchange the incremental path performs."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", compute_bucket(t[id_col], buckets))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        delta_dir, partition_cols=["bucket"])


def _bucket_files(base: str) -> Dict[int, List[str]]:
    out: Dict[int, List[str]] = {}
    if not os.path.isdir(base):
        return out
    for name in sorted(os.listdir(base)):
        if not name.startswith("bucket="):
            continue
        d = os.path.join(base, name)
        files = sorted(os.path.join(d, f) for f in os.listdir(d)
                       if f.endswith(".parquet"))
        if files:
            out[int(name.split("=", 1)[1])] = files
    return out


def _read_tables(files: List[str], columns=None) -> Optional[pa.Table]:
    import pyarrow.parquet as pq

    if not files:
        return None
    return pa.concat_tables(
        [pq.read_table(f, columns=columns) for f in files])


def _embed_texts(texts: List[str], backend, dim: int):
    from neo4j_document_pipeline_ray.stages.embed import HashEmbedder

    be = backend if backend is not None else HashEmbedder(dim)
    return be.embed([t or "" for t in texts])


def _attach_embeddings(keys: List, reuse: Dict, backend, dim: int,
                       with_embeddings: bool) -> Optional[pa.Array]:
    """Per-row embedding column: committed vector where the embedding
    key is unchanged, fresh backend call batched over the rest."""
    if not with_embeddings:
        return None
    embs: List = [None] * len(keys)
    todo_idx, todo_txt = [], []
    for i, k in enumerate(keys):
        if k in reuse:
            embs[i] = reuse[k]
        else:
            todo_idx.append(i)
            todo_txt.append(k)
    if todo_idx:
        vecs = _embed_texts(todo_txt, backend, dim)
        for i, v in zip(todo_idx, vecs):
            embs[i] = [float(x) for x in v]
    return pa.array(embs, pa.list_(pa.float32()))


@ray.remote
def _merge_nodes_bucket(exist_files: List[str], delta_files: List[str],
                        out_path: str, dim: int, with_embeddings: bool,
                        backend=None) -> int:
    """min-by-entity merge of one bucket: committed winners re-enter as
    candidates; embeddings recomputed only where ``node_key`` changed."""
    from neo4j_document_pipeline_ray.stages.entity_link import (
        _SEP,
        _finish_batch,
    )
    import pyarrow.parquet as pq

    delta = _read_tables(delta_files,
                         columns=["entity_id", "norm_key", "rep_key"])
    ex = _read_tables(exist_files)
    parts = [delta]
    reuse_src = {}
    if ex is not None:
        rep = pc.binary_join_element_wise(ex["name"], ex["label"], _SEP)
        parts.append(pa.table({
            "entity_id": ex["entity_id"],
            "norm_key": ex["norm_key"],
            "rep_key": rep,
        }))
        if with_embeddings and "embedding" in ex.schema.names:
            reuse_src = dict(zip(ex["node_key"].to_pylist(),
                                 ex["embedding"].to_pylist()))
    cand = pa.concat_tables(parts, promote_options="permissive")
    agg = cand.group_by("entity_id", use_threads=False).aggregate(
        [("rep_key", "min"), ("norm_key", "min")])
    fin = _finish_batch(pa.table({
        "entity_id": agg["entity_id"],
        "norm_key": agg["norm_key_min"],
        "rep_key": agg["rep_key_min"],
    }))
    emb = _attach_embeddings(fin["node_key"].to_pylist(), reuse_src,
                             backend, dim, with_embeddings)
    if emb is not None:
        fin = fin.append_column("embedding", emb)
    fin = fin.sort_by("entity_id")
    pq.write_table(fin, out_path)
    return len(fin)


@ray.remote
def _merge_mentions_bucket(exist_files: List[str], delta_files: List[str],
                           out_path: str) -> int:
    """Set-union merge of one bucket's distinct (doc_id, entity_id)."""
    import pyarrow.parquet as pq

    cols = ["doc_id", "entity_id"]
    parts = [_read_tables(delta_files, columns=cols)]
    ex = _read_tables(exist_files, columns=cols)
    if ex is not None:
        parts.append(ex)
    both = pa.concat_tables(parts, promote_options="permissive")
    out = both.group_by(cols, use_threads=False).aggregate([])
    out = out.sort_by("entity_id")
    pq.write_table(out, out_path)
    return len(out)


@ray.remote
def _merge_edges_bucket(exist_files: List[str], delta_files: List[str],
                        out_path: str, dim: int, with_embeddings: bool,
                        backend=None) -> int:
    """Last-wins + source-union merge of one bucket: the committed row
    converts back to partial shape (its persisted ``ord`` makes the
    merge associative) and goes through the SAME Arrow kernel as the
    from-scratch path; embeddings recomputed only where ``rel_key``
    changed."""
    import json

    import pyarrow.parquet as pq

    from neo4j_document_pipeline_ray.stages.edge_agg import (
        _EXCHANGE_COLS,
        _merge_edges_partition_arrow,
        decode_sources_batch,
        edge_key_of,
    )

    part_cols = ["edge_key"] + _EXCHANGE_COLS + ["ord"]
    delta = _read_tables(delta_files, columns=part_cols)
    ex = _read_tables(exist_files)
    parts = [delta]
    reuse_src = {}
    if ex is not None:
        ek = edge_key_of(ex)
        srcs = pa.array(
            [json.dumps(s) for s in ex["sources"].to_pylist()], pa.string())
        ex_p = pa.table({
            "edge_key": ek,
            **{c: (srcs if c == "sources_json" else ex[c])
               for c in _EXCHANGE_COLS},
            "ord": ex["ord"],
        })
        parts.append(ex_p)
        if with_embeddings and "embedding" in ex.schema.names:
            reuse_src = {
                (k, r): e for k, r, e in zip(
                    ek.to_pylist(), ex["rel_key"].to_pylist(),
                    ex["embedding"].to_pylist())
            }
    both = pa.concat_tables(parts, promote_options="permissive")
    merged = _merge_edges_partition_arrow(both, keep_ord=True)
    mk = edge_key_of(merged).to_pylist()
    rel_keys = merged["rel_key"].to_pylist()
    if with_embeddings:
        reuse = {}
        keys = []
        for k, r in zip(mk, rel_keys):
            keys.append(r)
            if (k, r) in reuse_src:
                # reuse keyed by rel_key value for _attach_embeddings
                reuse[r] = reuse_src[(k, r)]
        emb = _attach_embeddings(keys, reuse, backend, dim, True)
        merged = merged.append_column("embedding", emb)
    merged = decode_sources_batch(merged)
    merged = merged.sort_by("src_id")
    pq.write_table(merged, out_path)
    return len(merged)


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _merge_table(out_dir: str, name: str, delta_base: str, merge_task,
                 task_args: tuple, buckets: int) -> Dict[str, float]:
    """Bucket-wise merge of one table: remote task per touched bucket,
    hard-link for untouched ones, atomic rename at the end."""
    final_dir = os.path.join(out_dir, name)
    tmp_dir = os.path.join(out_dir, f".tmp-{name}")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    ex_by_bucket = _bucket_files(final_dir)
    dl_by_bucket = _bucket_files(delta_base)
    futs = []
    touched = 0
    for b in sorted(set(ex_by_bucket) | set(dl_by_bucket)):
        bdir = os.path.join(tmp_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        if b in dl_by_bucket:
            touched += 1
            futs.append(merge_task.remote(
                ex_by_bucket.get(b, []), dl_by_bucket[b],
                os.path.join(bdir, "merged-00000.parquet"), *task_args))
        else:
            for f in ex_by_bucket[b]:
                _link_or_copy(f, os.path.join(bdir, os.path.basename(f)))
    ray.get(futs)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    return {"touched_buckets": touched,
            "total_buckets": len(set(ex_by_bucket) | set(dl_by_bucket))}


def incremental_stage_b(
    out_dir: str,
    new_trip_files: List[str],
    cfg: Optional[PipelineConfig] = None,
    with_embeddings: bool = True,
    embed_backend=None,
) -> Dict:
    """Fold the NEW shards' checkpointed triples into the committed
    nodes/edges/mentions tables.  Only the new rows traverse an
    exchange; committed rows merge bucket-locally."""
    cfg = cfg or PipelineConfig()
    buckets = cfg.entity_buckets
    work = os.path.join(out_dir, ".inc-delta")
    if os.path.isdir(work):
        shutil.rmtree(work)
    timings: Dict[str, float] = {}

    from neo4j_document_pipeline_ray.stages.edge_agg import (
        EDGE_INPUT_COLS,
        _partial_edges_batch,
    )
    from neo4j_document_pipeline_ray.stages.entity_link import (
        MENTION_INPUT_COLS,
        NODE_INPUT_COLS,
        shard_mention_pairs,
        shard_node_candidates,
    )

    def _read(cols):
        return ray.data.read_parquet(new_trip_files, columns=cols)

    t0 = time.time()

    # the three delta passes are independent Ray jobs — overlap them
    # (edge partials move the provenance text, so they get the main
    # thread, mirroring the full path's critical-path scheduling)
    def d_nodes():
        _write_delta(shard_node_candidates(_read(NODE_INPUT_COLS), cfg),
                     os.path.join(work, "nodes"), "entity_id", buckets)

    def d_mentions():
        _write_delta(shard_mention_pairs(_read(MENTION_INPUT_COLS), cfg),
                     os.path.join(work, "mentions"), "entity_id", buckets)

    def d_edges():
        partial = _read(EDGE_INPUT_COLS).map_batches(
            lambda t: _partial_edges_batch(t, keep_text=True),
            batch_format="pyarrow", batch_size=cfg.agg_batch_size,
        )
        _write_delta(partial, os.path.join(work, "edges"), "src_id", buckets)

    from concurrent.futures import ThreadPoolExecutor

    from neo4j_document_pipeline_ray.pipelines.snapshot import (
        _patch_fsspec_http_for_threads,
    )

    _patch_fsspec_http_for_threads()
    with ThreadPoolExecutor(max_workers=1) as pool:
        side = pool.submit(lambda: (d_nodes(), d_mentions()))
        d_edges()
        side.result()
    timings["delta"] = round(time.time() - t0, 3)

    emb_args = (cfg.embed_dim, with_embeddings, embed_backend)
    stats = {}
    for name, task, args in (
        ("edges", _merge_edges_bucket, emb_args),
        ("nodes", _merge_nodes_bucket, emb_args),
        ("mentions", _merge_mentions_bucket, ()),
    ):
        t = time.time()
        stats[name] = _merge_table(out_dir, name, os.path.join(work, name),
                                   task, args, buckets)
        timings[name] = round(time.time() - t, 3)
    shutil.rmtree(work, ignore_errors=True)
    return {"timings": timings, "buckets": stats}
