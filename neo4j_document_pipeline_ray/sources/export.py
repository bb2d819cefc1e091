"""Neo4j bulk-import export sink.

The reference loads the graph into a LIVE Neo4j over bolt, one
``MERGE`` at a time per Celery worker (``ingestMD.py:500-554``) — fine
for thousands of documents, impossible for a 100 TB corpus.  Neo4j's
own scale path is offline bulk import (``neo4j-admin database
import``), which consumes CSV files with typed header lines
(``:ID``/``:LABEL``/``:START_ID``/``:END_ID``/``:TYPE``).  This module
renders the engine's snapshot tables into exactly that layout, so a
user of the reference can still end up with the same Neo4j database —
built by this engine at cluster scale, imported in one shot.

Layout written under ``out_dir``::

    nodes.header.csv      one header line (written by the driver)
    nodes/*.csv           data-only part files (one per block, written
                          in parallel by Ray tasks — headerless so any
                          number of parts concatenates cleanly)
    edges.header.csv
    edges/*.csv

``neo4j-admin database import full --nodes=nodes.header.csv,nodes/.*
--relationships=edges.header.csv,edges/.*`` is the matching invocation
(regex form accepts multiple headerless parts after one header file —
the documented multi-file pattern).

Everything streams: each block becomes one CSV part via Arrow's CSV
writer (RFC-4180 quoting), no driver-side collection, resumable by
directory like every other sink in this engine.
"""

from __future__ import annotations

import os
from typing import Dict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# neo4j-admin header lines for the snapshot's node/edge shapes
NODES_HEADER = "entity_id:ID,name,norm_key,:LABEL"
EDGES_HEADER = ":START_ID,:END_ID,:TYPE,term,count:long,sources"


def _nodes_csv_batch(t: pa.Table) -> pa.Table:
    return pa.table({
        "entity_id": t["entity_id"],
        "name": t["name"],
        "norm_key": t["norm_key"],
        "label": t["label"],
    })


def _edges_csv_batch(t: pa.Table) -> pa.Table:
    # sources is list<string>; the bulk importer's array syntax is a
    # ';'-joined string field
    srcs = t["sources"].to_pylist() if "sources" in t.schema.names else None
    return pa.table({
        "src_id": t["src_id"],
        "dst_id": t["dst_id"],
        "rel_type": t["rel_type"],
        "term": pc.fill_null(t["term"], ""),
        "count": pc.cast(t["count"], pa.int64()),
        "sources": pa.array(
            [";".join(s or []) for s in srcs] if srcs is not None
            else [""] * t.num_rows,
            pa.string()),
    })


def export_neo4j_bulk(
    tables: Dict[str, "ray.data.Dataset"], out_dir: str
) -> Dict[str, str]:
    """Write ``tables['nodes']`` / ``tables['edges']`` as a
    neo4j-admin bulk-import dataset under ``out_dir``; returns the
    header-file paths."""
    from ray.data.datasource import FilenameProvider

    class _Parts(FilenameProvider):
        def __init__(self, stem: str):
            self._stem = stem

        def get_filename_for_block(self, block, write_uuid, task_index,
                                   block_index) -> str:
            return (f"{self._stem}-{write_uuid}-{task_index:05d}"
                    f"-{block_index:05d}.csv")

    os.makedirs(out_dir, exist_ok=True)

    def _headerless():
        # built on the worker: WriteOptions itself is not picklable
        from pyarrow import csv as pacsv

        return {"write_options": pacsv.WriteOptions(include_header=False)}

    nodes_dir = os.path.join(out_dir, "nodes")
    tables["nodes"].map_batches(
        _nodes_csv_batch, batch_format="pyarrow",
    ).write_csv(nodes_dir, filename_provider=_Parts("nodes"),
                arrow_csv_args_fn=_headerless)

    edges_dir = os.path.join(out_dir, "edges")
    tables["edges"].map_batches(
        _edges_csv_batch, batch_format="pyarrow",
    ).write_csv(edges_dir, filename_provider=_Parts("edges"),
                arrow_csv_args_fn=_headerless)

    nh = os.path.join(out_dir, "nodes.header.csv")
    eh = os.path.join(out_dir, "edges.header.csv")
    with open(nh, "w", encoding="utf-8") as f:
        f.write(NODES_HEADER + "\n")
    with open(eh, "w", encoding="utf-8") as f:
        f.write(EDGES_HEADER + "\n")
    return {"nodes_header": nh, "edges_header": eh,
            "nodes_dir": nodes_dir, "edges_dir": edges_dir}
