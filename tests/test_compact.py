"""Compaction must reduce file counts, preserve content exactly, and
restore sorted row-group layout where asked."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_parts(leaf, tables):
    os.makedirs(leaf, exist_ok=True)
    for i, t in enumerate(tables):
        pq.write_table(t, os.path.join(leaf, f"orig-{i:03d}.parquet"))


def _read_all_sorted(d, key):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                             recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.sort_by(key)


class TestCompaction:
    def test_partitioned_table_round_trip(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.pipelines.compact import (
            compact_table,
        )

        root = str(tmp_path / "nodes")
        # two bucket partitions, 4 tiny parts each
        for b in (0, 1):
            _write_parts(os.path.join(root, f"bucket={b}"), [
                pa.table({"entity_id": pa.array(
                    [b * 100 + i * 4 + j for j in range(4)], pa.int64()),
                    "name": pa.array([f"n{b}-{i}-{j}" for j in range(4)])})
                for i in range(4)
            ])
        before = _read_all_sorted(root, "entity_id")
        n_before = len(glob.glob(os.path.join(root, "**", "*.parquet"),
                                 recursive=True))
        stats = compact_table(root, target_bytes=10 << 20,
                              sort_col="entity_id")
        after_files = glob.glob(os.path.join(root, "**", "*.parquet"),
                                recursive=True)
        assert stats["files_before"] == n_before == 8
        assert stats["files_after"] == len(after_files) == 2
        assert _read_all_sorted(root, "entity_id").equals(before)
        # each compacted file is internally sorted (row-group pruning)
        for f in after_files:
            ids = pq.read_table(f)["entity_id"].to_pylist()
            assert ids == sorted(ids)

    def test_files_at_target_are_hardlinked_not_rewritten(
            self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.pipelines.compact import (
            compact_table,
        )

        root = str(tmp_path / "flat")
        _write_parts(root, [
            pa.table({"x": pa.array(list(range(100)), pa.int64())}),
            pa.table({"x": pa.array(list(range(100, 200)), pa.int64())}),
        ])
        before = _read_all_sorted(root, "x")
        # target below single-file size -> every file is its own group
        stats = compact_table(root, target_bytes=1)
        assert stats["groups_rewritten"] == 0
        assert stats["files_after"] == 2
        assert _read_all_sorted(root, "x").equals(before)

    def test_snapshot_tables_helper(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.pipelines.compact import (
            compact_snapshot,
        )

        out = str(tmp_path)
        _write_parts(os.path.join(out, "mentions", "bucket=0"), [
            pa.table({"entity_id": pa.array([3, 1], pa.int64()),
                      "doc_id": pa.array(["a", "b"])}),
            pa.table({"entity_id": pa.array([2], pa.int64()),
                      "doc_id": pa.array(["c"])}),
        ])
        before = _read_all_sorted(os.path.join(out, "mentions"), "entity_id")
        stats = compact_snapshot(out, target_bytes=10 << 20)
        assert stats["mentions"]["files_after"] == 1
        assert _read_all_sorted(
            os.path.join(out, "mentions"), "entity_id").equals(before)


class TestCompactionOnRealSnapshot:
    def test_compact_preserves_snapshot_and_resume(
            self, ray_session, snap_copy, small_corpus):
        import shutil

        from neo4j_document_pipeline_ray.pipelines import (
            snapshot as snap_mod,
        )
        from neo4j_document_pipeline_ray.pipelines.compact import (
            compact_snapshot,
        )
        from neo4j_document_pipeline_ray.state import manifest as mf

        out, cfg = snap_copy
        key_cols = {
            "nodes": "entity_id", "edges": "src_id",
            "mentions": "entity_id", "docs": "doc_id",
        }
        before = {n: _read_all_sorted(os.path.join(out, n), k)
                  for n, k in key_cols.items()}
        stats = compact_snapshot(out, target_bytes=256 << 20)
        # the tiny fixture may already be one file per partition; merge
        # behavior itself is pinned by the synthetic tests above
        assert stats["edges"]["files_after"] <= stats["edges"]["files_before"]
        for n, k in key_cols.items():
            got = _read_all_sorted(os.path.join(out, n), k)
            # bucket partition column may be re-derived; compare common cols
            common = [c for c in before[n].schema.names
                      if c in got.schema.names and c != "bucket"]
            assert got.select(common).sort_by(k).to_pydict() == \
                before[n].select(common).sort_by(k).to_pydict()

        # a compacted snapshot must still resume: lose one shard commit,
        # rebuild, and end content-identical
        os.remove(mf.shard_manifest_path(out, 1))
        root2 = snap_mod.build_snapshot(
            small_corpus["pages"], out, cfg, shard_files=1)
        assert root2["shards_skipped_on_resume"] >= 1
        got = _read_all_sorted(os.path.join(out, "edges"), "src_id")
        common = [c for c in before["edges"].schema.names if c != "bucket"]
        assert got.select(common).sort_by("src_id").to_pydict() == \
            before["edges"].select(common).sort_by("src_id").to_pydict()
