"""Snapshot compaction: merge small part files inside each partition.

Every writer in this engine emits one parquet part per task per block
(that is what makes the writes parallel and the output resumable), so
a long-running snapshot accumulates many small files per ``bucket=K``
partition — at 100 TB, thousands of tiny files per partition turn
every subsequent read into a metadata storm.  The reference never hits
this because Neo4j owns its storage; an engine that OWNS the snapshot
needs the maintenance pass.

``compact_table`` rewrites each partition's parts into files of
roughly ``target_bytes``:

* the plan is footer/stat-driven (file sizes only — no data read on
  the driver);
* leaves already at target are HARD-LINKED into the new tree (zero
  copy, zero rewrite);
* each merge group is one Ray task: read the parts, optionally re-sort
  by the table's id column (restores tight row-group min/max stats —
  the pruning contract of ``snapshot._write_bucketed``), write one
  part;
* the swap builds the full tree under ``<dir>.compact-tmp``, parks the
  original at ``<dir>.compact-old``, renames tmp into place, then
  deletes the parked copy.  A crash before the first rename leaves the
  original untouched; a crash between the renames is auto-recovered on
  the next ``compact_table`` call (the parked copy is restored), so the
  data is never present only in a partially-deleted tree.

Content is set-identical by construction (concat of all parts, order
within a partition is not part of any table's contract; the optional
re-sort only tightens statistics).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import ray

DEFAULT_TARGET_BYTES = 128 << 20


def _leaf_dirs(table_dir: str) -> List[str]:
    out = []
    for dirpath, _dirs, files in os.walk(table_dir):
        if any(f.endswith(".parquet") for f in files):
            out.append(dirpath)
    return sorted(out)


def _plan_groups(files: List[str], target_bytes: int) -> List[List[str]]:
    """Greedy consecutive grouping of (sorted) part files up to target."""
    groups: List[List[str]] = []
    cur: List[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _rewrite_group(paths: List[str], out_path: str,
                   sort_col: Optional[str]) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = [pq.read_table(p) for p in paths]
    t = pa.concat_tables(tables, promote_options="permissive")
    if sort_col is not None and sort_col in t.schema.names:
        t = t.sort_by(sort_col)
    pq.write_table(t, out_path)
    return t.num_rows


def compact_table(
    table_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_col: Optional[str] = None,
) -> Dict[str, int]:
    """Compact every partition under ``table_dir``; returns
    ``{files_before, files_after, groups_rewritten, rows_rewritten}``."""
    table_dir = os.path.normpath(table_dir)
    tmp_root = table_dir + ".compact-tmp"
    old_root = table_dir + ".compact-old"
    # recovery: a crash between the two renames of a previous run left
    # the original tree parked at .compact-old — restore it first
    if not os.path.isdir(table_dir) and os.path.isdir(old_root):
        os.replace(old_root, table_dir)
    if os.path.isdir(tmp_root):
        shutil.rmtree(tmp_root)
    if os.path.isdir(old_root):
        shutil.rmtree(old_root)
    os.makedirs(tmp_root, exist_ok=True)

    stats = {"files_before": 0, "files_after": 0,
             "groups_rewritten": 0, "rows_rewritten": 0}
    futures = []
    for leaf in _leaf_dirs(table_dir):
        rel = os.path.relpath(leaf, table_dir)
        out_leaf = (tmp_root if rel == "." else os.path.join(tmp_root, rel))
        os.makedirs(out_leaf, exist_ok=True)
        names = sorted(os.listdir(leaf))
        files = [os.path.join(leaf, f) for f in names
                 if f.endswith(".parquet")]
        # preserve sidecar files (manifests, markers) verbatim
        for f in names:
            src = os.path.join(leaf, f)
            if not f.endswith(".parquet") and os.path.isfile(src):
                dst = os.path.join(out_leaf, f)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
        stats["files_before"] += len(files)
        groups = _plan_groups(files, target_bytes)
        for gi, group in enumerate(groups):
            out_path = os.path.join(out_leaf, f"part-{gi:05d}.parquet")
            stats["files_after"] += 1
            if len(group) == 1:
                # already at target: hard-link, zero copy
                try:
                    os.link(group[0], out_path)
                except OSError:
                    shutil.copy2(group[0], out_path)
            else:
                stats["groups_rewritten"] += 1
                futures.append(_rewrite_group.remote(
                    group, out_path, sort_col))
    for n in ray.get(futures):
        stats["rows_rewritten"] += n

    # two-rename swap: park the original at .compact-old, move the
    # compacted tree into place, then delete the parked copy.  A crash
    # between the renames is recoverable (the recovery block at the top
    # of this function restores .compact-old); at no point is the data
    # present only in a partially-deleted tree.
    os.replace(table_dir, old_root)
    try:
        os.replace(tmp_root, table_dir)
    except BaseException:
        os.replace(old_root, table_dir)  # roll back
        raise
    shutil.rmtree(old_root)
    return stats


# id columns that restore the row-group pruning contract per table
SNAPSHOT_SORT_COLS = {
    "nodes": "entity_id",
    "edges": "src_id",
    "mentions": "entity_id",
}


def compact_snapshot(
    out_dir: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> Dict[str, Dict[str, int]]:
    """Compact every table of a committed snapshot (docs/triples keep
    their ``shard=K`` layout — those partitions ARE the resume unit, so
    compaction happens within each shard dir, never across shards)."""
    out = {}
    for name in ("nodes", "edges", "mentions", "docs", "triples"):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d):
            out[name] = compact_table(
                d, target_bytes, SNAPSHOT_SORT_COLS.get(name))
    return out
