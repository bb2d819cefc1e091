"""Unit tests for the Arrow edge-aggregation kernels: last-wins must be
ROW-wise (the max-ord row's values, nulls included) and the
pandas/Arrow implementations must agree byte-for-byte.
"""

import json

import pandas as pd
import pyarrow as pa
import pytest

from neo4j_document_pipeline_ray.stages.edge_agg import (
    _merge_edges_partition,
    _merge_edges_partition_arrow,
    _partial_edges_batch,
)


def _triples_batch(rows):
    cols = {
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "chunk_idx": pa.array([r.get("chunk_idx", 0) for r in rows], pa.int64()),
        "src_id": pa.array([r.get("src_id", 1) for r in rows], pa.int64()),
        "dst_id": pa.array([r.get("dst_id", 2) for r in rows], pa.int64()),
        "rel_type": pa.array([r.get("rel_type", "FUNDS") for r in rows], pa.string()),
        "term": pa.array([r.get("term") for r in rows], pa.string()),
        "object_kind": pa.array([r.get("object_kind", "normal") for r in rows], pa.string()),
        "src_norm_key": pa.array(["a"] * len(rows), pa.string()),
        "dst_norm_key": pa.array(["b"] * len(rows), pa.string()),
        "count": pa.array([r.get("count") for r in rows], pa.int64()),
        "rel_key": pa.array(["k"] * len(rows), pa.string()),
        "start": pa.array([r.get("start") for r in rows], pa.string()),
        "end": pa.array([r.get("end") for r in rows], pa.string()),
        "src_text": pa.array([r.get("src_text") for r in rows], pa.string()),
    }
    return pa.table(cols)


class TestLastWinsNullSemantics:
    def test_winner_nulls_not_resurrected(self):
        """The max-ord row has null text/count/start — the merged edge
        must carry THOSE nulls, not resurrect the earlier row's values
        (Arrow's default 'last' skips nulls; we pass skip_nulls=False)."""
        batch = _triples_batch([
            {"doc_id": "aa", "chunk_idx": 0, "src_text": "early text",
             "count": 7, "start": "2001"},
            {"doc_id": "bb", "chunk_idx": 3, "src_text": None,
             "count": None, "start": None},
        ])
        out = _partial_edges_batch(batch).to_pylist()
        assert len(out) == 1
        r = out[0]
        assert r["source_text"] is None
        assert r["count"] is None
        assert r["start"] is None
        assert r["ord"] == "bb:000003"
        assert json.loads(r["sources_json"]) == ["aa", "bb"]

    def test_merge_partition_arrow_matches_pandas(self):
        """Arrow and pandas partition merges agree on a partition with
        null-bearing winners and multi-row source unions."""
        p1 = _partial_edges_batch(_triples_batch([
            {"doc_id": "aa", "chunk_idx": 0, "src_text": "t1", "count": 1},
            {"doc_id": "cc", "chunk_idx": 1, "src_text": None, "count": None},
        ]))
        p2 = _partial_edges_batch(_triples_batch([
            {"doc_id": "bb", "chunk_idx": 5, "src_text": "t2", "count": 2},
        ]))
        partition = pa.concat_tables([p1, p2])
        got = _merge_edges_partition_arrow(partition).to_pandas()
        want = _merge_edges_partition(partition.to_pandas())
        got = got.sort_values(["src_id"]).reset_index(drop=True)[want.columns]
        want = want.reset_index(drop=True)
        for c in ("count",):
            got[c] = got[c].astype("float64")
            want[c] = want[c].astype("float64")
        # sources_json separators may differ in whitespace; compare parsed
        assert got["sources_json"].map(json.loads).tolist() == \
            want["sources_json"].map(json.loads).tolist()
        got = got.drop(columns=["sources_json"])
        want = want.drop(columns=["sources_json"])
        assert got.equals(want)
        # the global winner is cc (max ord "cc:000001" > "bb:000005")
        # and carries its OWN null text, in both implementations
        assert want["source_text"].iloc[0] is None
        assert json.loads(
            _merge_edges_partition_arrow(partition).to_pandas()["sources_json"].iloc[0]
        ) == ["aa", "bb", "cc"]

    def test_null_rel_type_matches_str_of_none(self):
        """rel_type=None keys as the string 'None', like str(None) in
        the reference's scalar path."""
        batch = _triples_batch([
            {"doc_id": "aa", "rel_type": None},
        ])
        out = _partial_edges_batch(batch).to_pylist()
        assert out[0]["edge_key"].split("|")[1] == "None"
