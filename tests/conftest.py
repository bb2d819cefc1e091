import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 150-doc corpus shared by the integration tests."""
    from neo4j_document_pipeline_ray.sources.corpus import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    return generate_corpus(str(out), n_docs=150, seed=42, docs_per_file=50)


@pytest.fixture(scope="session")
def kg_result(ray_session, small_corpus):
    """One shared full-pipeline run over the small corpus."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines.kg_build import build_kg

    pages = rd.read_parquet(small_corpus["pages"], columns=["url", "html"])
    cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2, join_partitions=4)
    out = build_kg(pages, cfg)
    # materialize once; tests consume repeatedly
    return {k: v.materialize() for k, v in out.items()}


@pytest.fixture()
def snap_copy(ray_session, small_corpus, tmp_path_factory):
    """A freshly-built snapshot in a private dir (mutation-safe)."""
    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot

    cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                         join_partitions=4, entity_buckets=4)
    out = str(tmp_path_factory.mktemp("snapcopy"))
    build_snapshot(small_corpus["pages"], out, cfg, shard_files=1)
    return out, cfg
