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
