"""Relational operator invariants not already pinned by the SQL oracles."""

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


class TestAntiJoin:
    def test_anti_plus_semi_partitions_orders(self, ray_session):
        """Anti-join result ∪ orders-with-lineitems == all orders, and
        the two sets are disjoint."""
        from neo4j_document_pipeline_ray.pipelines.relational import (
            q_orders_no_lineitem,
        )

        anti = {r["o_orderkey"]
                for r in q_orders_no_lineitem(SF).take_all()}
        orders = set(pq.read_table(
            f"{SF}/orders.parquet", columns=["o_orderkey"]
        )["o_orderkey"].to_pylist())
        li_keys = set(pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey"]
        )["l_orderkey"].to_pylist())
        assert anti == orders - li_keys
        assert anti.isdisjoint(li_keys)
