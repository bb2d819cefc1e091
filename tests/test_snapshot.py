"""Snapshot pipeline: manifests, partitioned layout, resume, idempotence."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.state import manifest as mf


def _cfg():
    return PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                          join_partitions=4, entity_buckets=4)


def _table_signature(path, sort_cols, drop=()):
    t = pq.read_table(path)
    df = t.to_pandas()
    for c in drop:
        if c in df.columns:
            df = df.drop(columns=[c])
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
    df = df[sorted(df.columns)]
    # row order out of a hash join is scheduling-dependent; sort by the
    # full row so the signature is order-insensitive
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def snap(ray_session, small_corpus, tmp_path_factory):
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

    out = str(tmp_path_factory.mktemp("snap"))
    root = build_snapshot(small_corpus["pages"], out, _cfg(), shard_files=1)
    return out, root


class TestSnapshot:
    def test_root_manifest(self, snap):
        out, root = snap
        assert root["shards"] == 3
        assert root["counts"]["n_nodes"] > 0
        assert root["counts"]["n_edges"] > 0
        assert root["counts"]["n_docs"] > 0
        assert os.path.exists(mf.root_manifest_path(out))

    def test_shard_manifests_lineage(self, snap):
        out, root = snap
        assert mf.committed_shards(out) == [0, 1, 2]
        for s in range(3):
            m = mf.read_json(mf.shard_manifest_path(out, s))
            assert m["n_docs"] > 0
            assert m["url_range"][0] <= m["url_range"][1]
            assert m["wall_s"] > 0

    def test_entity_bucket_partitioning(self, snap):
        out, _ = snap
        buckets = glob.glob(os.path.join(out, "nodes", "bucket=*"))
        assert len(buckets) > 1
        # every row in a bucket dir has the right entity-id range
        for bdir in buckets:
            b = int(os.path.basename(bdir).split("=")[1])
            t = pq.read_table(bdir)
            for eid in t["entity_id"].to_pylist():
                assert (eid * 4) >> 60 == b

    def test_resume_skips_committed_shards(self, snap, small_corpus):
        from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

        out, _ = snap
        before = _table_signature(os.path.join(out, "edges"),
                                  ["src_id", "rel_type", "dst_id"], drop=("bucket",))
        # simulate a crash that lost shard 1's commit
        os.remove(mf.shard_manifest_path(out, 1))
        root2 = build_snapshot(small_corpus["pages"], out, _cfg(), shard_files=1)
        assert root2["shards_skipped_on_resume"] == 2
        after = _table_signature(os.path.join(out, "edges"),
                                 ["src_id", "rel_type", "dst_id"], drop=("bucket",))
        assert before.equals(after)

    def test_resume_reruns_on_input_drift(self, snap, small_corpus):
        """A committed shard whose recorded input_files no longer match
        the current plan must be re-extracted, not silently skipped."""
        from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

        out, _ = snap
        p0 = mf.shard_manifest_path(out, 0)
        man = mf.read_json(p0)
        orig = man["input_files"]
        man["input_files"] = ["someone-elses-file.parquet"]
        mf.write_json_atomic(p0, man)
        root2 = build_snapshot(small_corpus["pages"], out, _cfg(), shard_files=1)
        assert root2["shards_skipped_on_resume"] == 2  # only shard 0 redone
        assert mf.read_json(p0)["input_files"] == orig  # re-commit restored

    def test_status_command(self, snap, capsys):
        import argparse
        import json

        from neo4j_document_pipeline_ray.cli import cmd_status

        out, _ = snap
        assert cmd_status(argparse.Namespace(out=out, verbose=True)) == 0
        data = json.loads(capsys.readouterr().out)
        assert data["committed_shards"] == 3
        assert data["snapshot_committed"] is True
        assert data["in_flight_shards"] == []
        assert data["totals"]["n_docs"] == sum(
            s["n_docs"] for s in data["shards"])
        assert all(s["n_triples"] > 0 for s in data["shards"])

    def test_fresh_rerun_identical(self, snap, small_corpus, tmp_path_factory):
        from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

        out, _ = snap
        out2 = str(tmp_path_factory.mktemp("snap2"))
        build_snapshot(small_corpus["pages"], out2, _cfg(), shard_files=1)
        for table, keys in [("nodes", ["entity_id"]),
                            ("edges", ["src_id", "rel_type", "dst_id", "term"]),
                            ("mentions", ["doc_id", "entity_id"])]:
            a = _table_signature(os.path.join(out, table), keys, drop=("bucket",))
            b = _table_signature(os.path.join(out2, table), keys, drop=("bucket",))
            assert a.equals(b), table

    def test_snapshot_matches_inmemory_pipeline(self, snap, kg_result):
        out, _ = snap
        snap_nodes = _table_signature(os.path.join(out, "nodes"), ["entity_id"],
                                      drop=("bucket", "embedding"))
        mem = kg_result["nodes"].to_pandas().drop(columns=["embedding"])
        for c in mem.columns:
            if mem[c].dtype == object:
                mem[c] = mem[c].map(str)
        mem = mem[sorted(mem.columns)].sort_values(["entity_id"]).reset_index(drop=True)
        assert snap_nodes.equals(mem)
