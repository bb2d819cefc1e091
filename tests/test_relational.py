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


class TestRollup:
    def test_levels_are_consistent(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.relational import (
            q_lineitem_rollup,
        )

        rows = q_lineitem_rollup(SF).take_all()
        fine = [r for r in rows if r["l_returnflag"] != "ALL"
                and r["l_linestatus"] != "ALL"]
        mid = {r["l_returnflag"]: r for r in rows
               if r["l_returnflag"] != "ALL" and r["l_linestatus"] == "ALL"}
        grand = [r for r in rows if r["l_returnflag"] == "ALL"]
        assert len(grand) == 1 and grand[0]["l_linestatus"] == "ALL"
        # every per-flag subtotal equals the sum of its fine rows
        for flag, m in mid.items():
            fr = [r for r in fine if r["l_returnflag"] == flag]
            assert m["sum_qty"] == sum(r["sum_qty"] for r in fr)
            assert m["n_rows"] == sum(r["n_rows"] for r in fr)
        assert grand[0]["n_rows"] == sum(r["n_rows"] for r in fine)
        assert grand[0]["sum_qty"] == sum(r["sum_qty"] for r in fine)

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from neo4j_document_pipeline_ray.pipelines.relational import (
            Q_LINEITEM_ROLLUP_SQL,
            q_lineitem_rollup,
        )

        got = (q_lineitem_rollup(SF).to_pandas()
               .sort_values(["l_returnflag", "l_linestatus"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
        want = (con.sql(Q_LINEITEM_ROLLUP_SQL).df()
                .sort_values(["l_returnflag", "l_linestatus"])
                .reset_index(drop=True))
        import pandas as pd

        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)


class TestPivot:
    def test_row_sums_and_duckdb_parity(self, ray_session):
        import duckdb
        import pandas as pd

        from neo4j_document_pipeline_ray.pipelines.relational import (
            Q_EVENTS_PIVOT_SQL,
            q_events_pivot,
        )

        got = (q_events_pivot(SF).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
        want = (con.sql(Q_EVENTS_PIVOT_SQL).df()
                .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)
        # wide counts add back up to the long row count
        n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
        wide_cols = [c for c in got.columns if c.startswith("n_")]
        assert int(got[wide_cols].to_numpy().sum()) == n_events
