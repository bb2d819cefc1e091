"""Incremental stage B: folding new shards into a committed snapshot.

The contract (VERDICT round-2 item 5): adding one shard to a committed
snapshot re-shuffles O(new shard) rows — committed rows merge
bucket-locally, never through an exchange — and the result is
byte-identical to a from-scratch build over the full input.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.state import manifest as mf

TABLES = ("nodes", "edges", "mentions")


def _cfg():
    return PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                          join_partitions=4, entity_buckets=4)


def _signature(path, drop=("bucket",)):
    t = pq.read_table(path)
    df = t.to_pandas()
    for c in drop:
        if c in df.columns:
            df = df.drop(columns=[c])
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def grown(ray_session, small_corpus, tmp_path_factory):
    """(a) snapshot over shards 0-1, then resume after a 3rd input file
    appears (the incremental fold); (b) from-scratch over all 3 shards
    (the truth to compare against)."""
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

    files = sorted(
        os.path.join(small_corpus["pages"], f)
        for f in os.listdir(small_corpus["pages"]) if f.endswith(".parquet"))
    assert len(files) == 3
    grow = str(tmp_path_factory.mktemp("grow_pages"))
    for f in files[:2]:
        shutil.copy(f, grow)
    inc_out = str(tmp_path_factory.mktemp("snap_inc"))
    root1 = build_snapshot(grow, inc_out, _cfg(), shard_files=1)
    shutil.copy(files[2], grow)
    root2 = build_snapshot(grow, inc_out, _cfg(), shard_files=1)

    full_out = str(tmp_path_factory.mktemp("snap_full"))
    root_full = build_snapshot(
        small_corpus["pages"], full_out, _cfg(), shard_files=1)
    return {"grow": grow, "inc_out": inc_out, "full_out": full_out,
            "root1": root1, "root2": root2, "root_full": root_full}


class TestIncrementalStageB:
    def test_modes(self, grown):
        assert grown["root1"]["stage_b_mode"] == "full"
        assert grown["root2"]["stage_b_mode"] == "incremental"
        assert grown["root2"]["shards_skipped_on_resume"] == 2

    def test_tables_match_from_scratch(self, grown):
        for table in TABLES:
            a = _signature(os.path.join(grown["inc_out"], table))
            b = _signature(os.path.join(grown["full_out"], table))
            assert a.equals(b), table

    def test_counts_match(self, grown):
        assert grown["root2"]["counts"] == grown["root_full"]["counts"]

    def test_bucket_stats_recorded(self, grown):
        stats = grown["root2"]["incremental_buckets"]
        for table in TABLES:
            assert stats[table]["touched_buckets"] >= 1
            assert (stats[table]["touched_buckets"]
                    <= stats[table]["total_buckets"])

    def test_refold_is_idempotent(self, grown, tmp_path_factory):
        """Re-merging the SAME delta (crash-between-renames repair) is a
        no-op: min/union/last-wins against an already-folded delta."""
        from neo4j_document_pipeline_ray.pipelines.incremental import (
            incremental_stage_b,
        )

        out = str(tmp_path_factory.mktemp("refold"))
        shutil.copytree(grown["inc_out"], out, dirs_exist_ok=True)
        d = os.path.join(out, "triples", "shard=00002")
        new_files = sorted(os.path.join(d, f) for f in os.listdir(d)
                           if f.endswith(".parquet"))
        incremental_stage_b(out, new_files, _cfg())
        for table in TABLES:
            a = _signature(os.path.join(out, table))
            b = _signature(os.path.join(grown["full_out"], table))
            assert a.equals(b), table

    def test_refold_reuses_all_embeddings(self, grown, tmp_path_factory):
        """Embedding is the model-priced step at 100 TB: a fold whose
        delta changes no winning key must reuse every committed vector
        and never call the backend."""
        from neo4j_document_pipeline_ray.pipelines.incremental import (
            incremental_stage_b,
        )

        class ExplodingBackend:  # defined in-test so cloudpickle ships by value
            dim = 64

            def embed(self, texts):
                raise AssertionError(
                    f"embedder called for {len(texts)} keys in a no-change fold")

        out = str(tmp_path_factory.mktemp("refold_emb"))
        shutil.copytree(grown["inc_out"], out, dirs_exist_ok=True)
        d = os.path.join(out, "triples", "shard=00002")
        new_files = sorted(os.path.join(d, f) for f in os.listdir(d)
                           if f.endswith(".parquet"))
        incremental_stage_b(out, new_files, _cfg(),
                            with_embeddings=True,
                            embed_backend=ExplodingBackend())

    def test_unchanged_input_skips_stage_b(self, grown):
        from neo4j_document_pipeline_ray.pipelines.snapshot import (
            build_snapshot,
        )

        root3 = build_snapshot(grown["grow"], grown["inc_out"], _cfg(),
                               shard_files=1)
        assert root3["stage_b_mode"] == "skipped"
        assert root3["shards_skipped_on_resume"] == 3

    def test_middle_shard_redo_falls_back_to_full(
            self, grown, tmp_path_factory):
        """Re-extracting a committed shard means committed aggregates
        would need retraction — the builder must take the full path."""
        from neo4j_document_pipeline_ray.pipelines.snapshot import (
            build_snapshot,
        )

        out = str(tmp_path_factory.mktemp("redo"))
        shutil.copytree(grown["inc_out"], out, dirs_exist_ok=True)
        os.remove(mf.shard_manifest_path(out, 1))
        root = build_snapshot(grown["grow"], out, _cfg(), shard_files=1)
        assert root["stage_b_mode"] == "full"
        for table in TABLES:
            a = _signature(os.path.join(out, table))
            b = _signature(os.path.join(grown["full_out"], table))
            assert a.equals(b), table
