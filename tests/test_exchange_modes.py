"""Invariants for the scale-adaptive execution strategies: every
strategy knob must leave the snapshot content byte-identical."""

import os

import pyarrow.parquet as pq
import pytest

from neo4j_document_pipeline_ray.config import PipelineConfig


def _sig(out, table):
    df = pq.read_table(os.path.join(out, table)).to_pandas()
    if "bucket" in df.columns:
        df = df.drop(columns=["bucket"])
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(str)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _build(pages, out, **cfg_kwargs):
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

    cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                         join_partitions=4, entity_buckets=4, **cfg_kwargs)
    build_snapshot(pages, out, cfg, shard_files=2)
    return out


@pytest.fixture(scope="module")
def baseline_snap(ray_session, small_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("base"))
    return _build(small_corpus["pages"], out)


class TestStrategyKnobsPreserveContent:
    def test_streaming_extraction_identical(self, baseline_snap, small_corpus,
                                            tmp_path_factory):
        """dedupe_chunks_before_extract=False: no distinct-chunk shuffle,
        no membership join — identical tables."""
        out = _build(small_corpus["pages"], str(tmp_path_factory.mktemp("s")),
                     dedupe_chunks_before_extract=False)
        for table in ("nodes", "edges", "mentions"):
            assert _sig(baseline_snap, table).equals(_sig(out, table)), table

    def test_ref_edge_exchange_identical(self, baseline_snap, small_corpus,
                                         tmp_path_factory):
        """edge_text_exchange='ref': hash + snippet-table join — identical
        tables (auto picks 'inline' at this size)."""
        out = _build(small_corpus["pages"], str(tmp_path_factory.mktemp("r")),
                     edge_text_exchange="ref")
        for table in ("nodes", "edges", "mentions"):
            assert _sig(baseline_snap, table).equals(_sig(out, table)), table

    def test_invalid_mode_raises(self, ray_session, kg_result):
        from neo4j_document_pipeline_ray.stages.edge_agg import build_edges

        with pytest.raises(ValueError, match="edge_text_exchange"):
            build_edges(kg_result["triples"],
                        PipelineConfig(edge_text_exchange="bogus"))

    def test_direct_embeddings_match_backend(self, baseline_snap):
        """embed_column attaches exactly HashEmbedder(node_key)."""
        import numpy as np

        from neo4j_document_pipeline_ray.stages.embed import HashEmbedder

        t = pq.read_table(os.path.join(baseline_snap, "nodes")).to_pandas()
        he = HashEmbedder(dim=PipelineConfig().embed_dim)
        for _, row in t.head(10).iterrows():
            want = he.embed([row["node_key"]])[0]
            assert np.allclose(np.asarray(row["embedding"]), want)
