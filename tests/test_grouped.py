"""Tests for stages/grouped.py — in particular the null-safe key
encoding that sidesteps a pyarrow hash-grouper bug.

The pinned parquet (tests/data/grouped_null_keys_repro.parquet) is a
449-row slice of the real triples table at sf0.01: 11 string/int64
columns where the last 4 (start/end/term/count) are mostly null.
pyarrow 16.1's ``Table.group_by`` over all 11 columns returns 447
"distinct" rows where the true distinct count is 441 — rows that are
byte- and validity-identical fail to merge once the row-encoded null
mask spills into its second byte.  ``null_safe_group_keys`` re-encodes
each nullable key as (null-filled value, validity bit), which keeps
the exact same group structure with no nulls in any key column.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from neo4j_document_pipeline_ray.stages.grouped import (
    distinct_by,
    null_safe_group_keys,
)

REPRO = os.path.join(os.path.dirname(__file__), "data",
                     "grouped_null_keys_repro.parquet")


def _true_distinct(t: pa.Table) -> int:
    return len(t.to_pandas().drop_duplicates())


class TestNullSafeGroupKeys:
    def test_repro_table_groups_exactly(self):
        t = pq.read_table(REPRO)
        cols = t.schema.names
        work, keys, restore = null_safe_group_keys(t, cols)
        agg = work.group_by(keys, use_threads=False).aggregate([])
        assert agg.num_rows == _true_distinct(t) == 441
        # nullable tail columns got the (filled, validity) encoding
        assert set(restore) == {"start", "end", "term", "count"}
        for c, vc in restore.items():
            assert work[c].null_count == 0
            assert vc in keys

    def test_noop_without_nulls(self):
        t = pa.table({"a": ["x", "y"], "b": [1, 2]})
        work, keys, restore = null_safe_group_keys(t, ["a", "b"])
        assert keys == ["a", "b"] and restore == {}
        assert work is t

    def test_restore_reproduces_nulls(self):
        t = pa.table({
            "k": ["a", "a", "b", "b"],
            "v": pa.array([None, None, "z", None], pa.string()),
        })
        work, keys, restore = null_safe_group_keys(t, ["k", "v"])
        agg = work.group_by(keys, use_threads=False).aggregate([])
        vc = restore["v"]
        restored = pc.if_else(
            agg[vc], agg["v"], pa.nulls(len(agg), pa.string()))
        got = sorted(zip(agg["k"].to_pylist(), restored.to_pylist()),
                     key=lambda p: (p[0], p[1] or ""))
        assert got == [("a", None), ("b", None), ("b", "z")]

    def test_fill_values_cover_types(self):
        t = pa.table({
            "s": pa.array(["x", None]),
            "i": pa.array([1, None], pa.int64()),
            "f": pa.array([1.5, None], pa.float64()),
            "b": pa.array([True, None], pa.bool_()),
            "y": pa.array([b"p", None], pa.binary()),
        })
        work, keys, restore = null_safe_group_keys(t, t.schema.names)
        for c in t.schema.names:
            assert work[c].null_count == 0, c


class TestDistinctBy:
    def test_full_row_distinct_with_null_heavy_keys(self, ray_session):
        """End-to-end: distinct_by over the repro slice must match
        pandas drop_duplicates (441 rows), not the buggy 447."""
        import ray

        t = pq.read_table(REPRO)
        ds = ray.data.from_arrow(t).repartition(4)
        out = distinct_by(ds, "subject", subset=list(t.schema.names),
                          num_partitions=4)
        got = out.to_pandas()
        assert len(got) == 441
        assert got.duplicated().sum() == 0
        # content identical to pandas dedup, order-insensitive
        import pandas as pd
        want = t.to_pandas().drop_duplicates()
        key = lambda d: d.fillna("<NA>").apply(tuple, axis=1).sort_values()
        assert sorted(key(got)) == sorted(key(want))

    def test_distinct_keeps_first_row_payload(self, ray_session):
        import ray

        t = pa.table({
            "k": ["a", "a", "b"],
            "payload": [1, 2, 3],
        })
        out = distinct_by(ray.data.from_arrow(t), "k", num_partitions=2)
        got = sorted(out.to_pandas().itertuples(index=False))
        assert got == [("a", 1), ("b", 3)]
