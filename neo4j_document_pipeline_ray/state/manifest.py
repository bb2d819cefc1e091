"""Checkpoint/lineage manifests for the resumable snapshot pipeline.

The reference has no durable checkpointing — a failed Celery task just
reports ``{"status": "failed"}`` and re-ingestion restarts from scratch
(``tasks.py:28-29``), relying on ``MERGE`` idempotency.  Per the north
rule this engine records per-partition lineage: each extraction shard
commits a manifest ``{shard, input_files, url_range, n_docs, n_chunks,
n_triples, wall_s}``; a rerun skips committed shards.  Manifests are
written atomically (tmp file + rename).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def shard_manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"shard-{shard:05d}.json")


def root_manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def write_json_atomic(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_json(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def commit_shard(out_dir: str, shard: int, payload: Dict[str, Any]) -> None:
    payload = {"shard": shard, "committed_at": time.time(), **payload}
    write_json_atomic(shard_manifest_path(out_dir, shard), payload)


def shard_committed(out_dir: str, shard: int) -> bool:
    return os.path.exists(shard_manifest_path(out_dir, shard))


def committed_shards(out_dir: str) -> List[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("shard-") and name.endswith(".json"):
            out.append(int(name[len("shard-"):-len(".json")]))
    return sorted(out)
