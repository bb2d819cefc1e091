"""entity_scope knob: label-blind (default) vs reference-parity
label-scoped entity identity (MERGE (n:Label {name}),
ingestMD.py:505-511) — VERDICT r4 item #6."""

import pyarrow as pa
import pytest

from neo4j_document_pipeline_ray.config import PipelineConfig
from neo4j_document_pipeline_ray.stages.normalize import make_normalize_batch


def _raw_batch():
    rows = [
        ("c1", "Paris", "located_in", "France", "City", "Country"),
        ("c2", "Paris", "works_at", "Acme", "Person", "Organization"),
    ]
    return pa.table({
        "chunk_id": [r[0] for r in rows],
        "subject": [r[1] for r in rows],
        "predicate": [r[2] for r in rows],
        "object": [r[3] for r in rows],
        "subject_type": [r[4] for r in rows],
        "object_type": [r[5] for r in rows],
        "object_is_json": [False] * len(rows),
        "src_text": ["snippet"] * len(rows),
    })


def test_default_norm_scope_merges_across_labels():
    out = make_normalize_batch(PipelineConfig())(_raw_batch()).to_pydict()
    # label-blind: City-Paris and Person-Paris share one entity id
    assert out["src_id"][0] == out["src_id"][1]
    assert out["src_norm_key"] == ["paris", "paris"]


def test_label_scope_keeps_labels_distinct():
    cfg = PipelineConfig(entity_scope="label")
    out = make_normalize_batch(cfg)(_raw_batch()).to_pydict()
    assert out["src_id"][0] != out["src_id"][1]
    assert out["src_norm_key"] == ["City\x1fparis", "Person\x1fparis"]
    # special-label routing scopes by the EMITTED label, not the raw one
    tl = pa.table({
        "chunk_id": ["c3"],
        "subject": ["Plan"],
        "predicate": ["spans"],
        "object": ['{"start": "2020", "end": "2024"}'],
        "subject_type": ["Project"],
        "object_type": ["Whatever"],
        "object_is_json": [True],
        "src_text": ["s"],
    })
    got = make_normalize_batch(cfg)(tl).to_pydict()
    assert got["dst_norm_key"] == ["Time_Period\x1f2020 2024"]


def test_invalid_scope_rejected():
    with pytest.raises(ValueError, match="entity_scope"):
        make_normalize_batch(PipelineConfig(entity_scope="bogus"))


def test_label_scope_end_to_end_nodes(ray_session):
    import ray.data as rd

    from neo4j_document_pipeline_ray.stages.entity_link import build_nodes

    raw = _raw_batch()
    norm_nodes = build_nodes(
        rd.from_arrow(make_normalize_batch(PipelineConfig())(raw))
    ).to_pandas()
    label_nodes = build_nodes(
        rd.from_arrow(
            make_normalize_batch(PipelineConfig(entity_scope="label"))(raw))
    ).to_pandas()
    # default: Paris collapses to ONE node (4 total: Paris, France, Acme
    # ... minus the merge); label mode: both Paris survive
    names = lambda df: sorted(zip(df["label"], df["name"]))
    assert names(norm_nodes) == [
        ("City", "Paris"), ("Country", "France"), ("Organization", "Acme")]
    assert names(label_nodes) == [
        ("City", "Paris"), ("Country", "France"),
        ("Organization", "Acme"), ("Person", "Paris")]
    assert label_nodes["entity_id"].is_unique
