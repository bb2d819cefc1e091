"""Neo4j bulk-import export: headerless parts + typed header files,
round-trippable and complete."""

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv


def _kg_tables():
    import ray.data as rd

    nodes = rd.from_arrow(pa.table({
        "entity_id": pa.array([1, 2, 3], pa.int64()),
        "label": pa.array(["Person", "Org", "Person"], pa.string()),
        "name": pa.array(['Alice "A"', "Acme, Inc.", "Bob\nB"], pa.string()),
        "norm_key": pa.array(["alice a", "acme inc", "bob b"], pa.string()),
    }))
    edges = rd.from_arrow(pa.table({
        "src_id": pa.array([1, 2], pa.int64()),
        "dst_id": pa.array([2, 3], pa.int64()),
        "rel_type": pa.array(["WORKS_AT", "EMPLOYS"], pa.string()),
        "term": pa.array(["t1", None], pa.string()),
        "count": pa.array([3, 1], pa.int64()),
        "sources": pa.array([["d1", "d2"], []], pa.list_(pa.string())),
    }))
    return {"nodes": nodes, "edges": edges}


def _read_parts(header_path, parts_dir, colnames):
    txt = open(header_path).read().strip()
    assert txt.count("\n") == 0
    frames = []
    for p in sorted(glob.glob(os.path.join(parts_dir, "*.csv"))):
        frames.append(pacsv.read_csv(
            p, read_options=pacsv.ReadOptions(column_names=colnames)
        ).to_pandas())
    import pandas as pd

    return pd.concat(frames, ignore_index=True)


class TestNeo4jExport:
    def test_round_trip(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.sources.export import (
            EDGES_HEADER,
            NODES_HEADER,
            export_neo4j_bulk,
        )

        out = export_neo4j_bulk(_kg_tables(), str(tmp_path))
        assert open(out["nodes_header"]).read().strip() == NODES_HEADER
        assert open(out["edges_header"]).read().strip() == EDGES_HEADER

        nodes = _read_parts(out["nodes_header"], out["nodes_dir"],
                            ["entity_id", "name", "norm_key", "label"])
        nodes = nodes.sort_values("entity_id").reset_index(drop=True)
        assert list(nodes["entity_id"]) == [1, 2, 3]
        # RFC quoting survives embedded quote/comma/newline
        assert list(nodes["name"]) == ['Alice "A"', "Acme, Inc.", "Bob\nB"]
        assert list(nodes["label"]) == ["Person", "Org", "Person"]

        edges = _read_parts(out["edges_header"], out["edges_dir"],
                            ["src_id", "dst_id", "rel_type", "term",
                             "count", "sources"])
        edges = edges.sort_values("src_id").reset_index(drop=True)
        assert list(edges["src_id"]) == [1, 2]
        assert list(edges["rel_type"]) == ["WORKS_AT", "EMPLOYS"]
        # null term -> empty field; list sources -> ';'-joined
        assert list(edges["term"].fillna("")) == ["t1", ""]
        assert list(edges["sources"].fillna("")) == ["d1;d2", ""]
        assert list(edges["count"]) == [3, 1]
