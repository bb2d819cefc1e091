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


class TestRevenueByNation:
    def test_matches_duckdb_q5_shape(self, ray_session):
        import duckdb

        from neo4j_document_pipeline_ray.pipelines.relational import (
            Q_REVENUE_BY_NATION_SQL,
            q_revenue_by_nation,
        )

        got = q_revenue_by_nation(SF).to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders", "customer", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
        want = con.execute(Q_REVENUE_BY_NATION_SQL).df()
        assert list(got.columns) == list(want.columns)
        assert got["n_name"].tolist() == want["n_name"].tolist()
        assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()
        assert got["n_lineitems"].tolist() == want["n_lineitems"].tolist()
        # the date window actually bites: fewer lineitems than the table
        n_li = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
        assert 0 < got["n_lineitems"].sum() < n_li

    def test_sorted_descending(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.relational import (
            q_revenue_by_nation,
        )

        rev = [r["revenue_cents"] for r in q_revenue_by_nation(SF).take_all()]
        assert rev == sorted(rev, reverse=True)


class TestOrdersRunning:
    def test_matches_duckdb_window(self, ray_session):
        import duckdb

        from neo4j_document_pipeline_ray.pipelines.relational import (
            Q_ORDERS_RUNNING_SQL,
            q_orders_running,
        )

        got = (q_orders_running(SF).to_pandas()
               .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
        want = (con.execute(Q_ORDERS_RUNNING_SQL).df()
                .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True))
        assert len(got) == len(want)
        for c in got.columns:
            assert got[c].tolist() == want[c].tolist(), c

    def test_window_invariants(self, ray_session):
        """Ranks are 1..n_orders per customer; running total is
        monotone within a customer and ends at the customer's exact
        cents total."""
        from neo4j_document_pipeline_ray.pipelines.relational import (
            q_orders_running,
        )

        df = q_orders_running(SF).to_pandas()
        assert len(df) == pq.read_metadata(f"{SF}/orders.parquet").num_rows
        for _, g in df.groupby("o_custkey"):
            g = g.sort_values("order_rank")
            assert g["order_rank"].tolist() == list(range(1, len(g) + 1))
            run = g["running_cents"].to_numpy()
            assert (run[1:] >= run[:-1]).all()
