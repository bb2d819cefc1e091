"""Temporal operators (pipelines/windows.py) against independent
brute-force references computed in-process on the sf0.001 events table
(1,000 rows — small enough for O(n^2) truth)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_df():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["epoch_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    return df


class TestSessions:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            _value_milli_np,
            q_events_sessions,
        )

        gap_us = 1800 * 1_000_000
        got = (
            q_events_sessions(SF, gap_s=1800).to_pandas()
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True)
        )

        rows = []
        for uid, g in events_df.sort_values("epoch_us").groupby("user_id"):
            t = g["epoch_us"].to_numpy()
            vm = _value_milli_np(g["value"].to_numpy())
            brk = np.r_[True, np.diff(t) > gap_us]
            sid = np.cumsum(brk)
            for s in np.unique(sid):
                m = sid == s
                rows.append((uid, t[m].min(), t[m].max(),
                             int(m.sum()), int(vm[m].sum())))
        want = pd.DataFrame(rows, columns=[
            "user_id", "session_start_us", "session_end_us",
            "n_events", "sum_value_milli",
        ]).sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[want.columns].astype("int64"), want.astype("int64"))

    def test_gap_parameter_merges_sessions(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.windows import q_events_sessions

        tight = q_events_sessions(SF, gap_s=600).count()
        loose = q_events_sessions(SF, gap_s=6 * 3600).count()
        assert loose < tight  # larger gap merges sessions


class TestSlidingWindow:
    def test_each_event_in_exactly_reps_windows(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_sliding_window,
        )

        got = q_events_sliding_window(SF).to_pandas()
        assert got["n"].sum() == 4 * len(events_df)
        # every window start is a multiple of the slide
        assert (got["win_start_us"] % (900 * 1_000_000) == 0).all()

    def test_window_membership_semantics(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_sliding_window,
        )

        got = q_events_sliding_window(SF).to_pandas()
        # brute force one (type, window) cell
        row = got.sort_values(["event_type", "win_start_us"]).iloc[37]
        lo = row["win_start_us"]
        hi = lo + 3600 * 1_000_000
        mask = (
            (events_df["event_type"] == row["event_type"])
            & (events_df["epoch_us"] >= lo)
            & (events_df["epoch_us"] < hi)
        )
        assert int(mask.sum()) == row["n"]

    def test_rejects_non_multiple(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_sliding_window,
        )

        with pytest.raises(ValueError):
            q_events_sliding_window(SF, window_s=1000, slide_s=300)


class TestBandPairs:
    def _brute(self, events_df, band_us):
        out = set()
        by_type = events_df.groupby("event_type")
        for _etype, g in by_type:
            t = g["epoch_us"].to_numpy()
            eid = g["event_id"].to_numpy()
            d = np.abs(t[:, None] - t[None, :]) <= band_us
            iu, ju = np.where(np.triu(d, k=1))
            for i, j in zip(iu, ju):
                a, b = sorted((int(eid[i]), int(eid[j])))
                out.add((a, b, int(abs(t[i] - t[j]))))
        return out

    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_band_pairs,
        )

        band_s = 3600  # wide band -> plenty of pairs at 1k rows
        got = q_events_band_pairs(SF, band_s=band_s).to_pandas()
        got_set = set(zip(got["event_id_a"], got["event_id_b"], got["dt_us"]))
        assert len(got_set) == len(got)  # exactly-once emission
        assert got_set == self._brute(events_df, band_s * 1_000_000)

    def test_narrow_band_subset_of_wide(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_band_pairs,
        )

        narrow = q_events_band_pairs(SF, band_s=1800).to_pandas()
        wide = q_events_band_pairs(SF, band_s=3600).to_pandas()
        nset = set(zip(narrow["event_id_a"], narrow["event_id_b"]))
        wset = set(zip(wide["event_id_a"], wide["event_id_b"]))
        assert nset < wset


class TestAsof:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_asof_purchase,
        )

        got = (
            q_events_asof_purchase(SF).to_pandas()
            .set_index("event_id").sort_index()
        )
        assert len(got) == len(events_df)
        purchases = events_df[events_df["event_type"] == "purchase"]
        for _, e in events_df.sample(100, random_state=7).iterrows():
            prior = purchases[
                (purchases["user_id"] == e["user_id"])
                & (purchases["epoch_us"] < e["epoch_us"])
            ]
            r = got.loc[e["event_id"]]
            if len(prior):
                best = prior.loc[prior["epoch_us"].idxmax()]
                assert r["prior_purchase_id"] == best["event_id"]
                assert r["us_since_purchase"] == e["epoch_us"] - best["epoch_us"]
            else:
                assert r["prior_purchase_id"] == -1
                assert r["us_since_purchase"] == -1

    def test_purchase_self_is_strictly_prior(self, ray_session):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_asof_purchase,
        )

        got = q_events_asof_purchase(SF).to_pandas()
        p = got[got["event_type"] == "purchase"]
        # a purchase never matches itself (strict inequality)
        assert (p["prior_purchase_id"] != p["event_id"]).all()
        matched = p[p["prior_purchase_id"] >= 0]
        assert (matched["us_since_purchase"] > 0).all()


class TestAnomaly:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_anomaly,
        )

        got = (
            q_events_anomaly(SF, z_thresh=1.5).to_pandas()
            .sort_values(["event_type", "hour_start_us"])
            .reset_index(drop=True)
        )

        hour_us = 3600 * 1_000_000
        df = events_df.copy()
        df["hour_start_us"] = (df["epoch_us"] // hour_us) * hour_us
        counts = (df.groupby(["event_type", "hour_start_us"])
                  .size().rename("n").reset_index())
        rows = []
        for et, g in counts.groupby("event_type"):
            n = g["n"].to_numpy(dtype=float)
            mu, sd = n.mean(), n.std()  # population std
            if sd <= 0:
                continue
            z = (n - mu) / sd
            keep = np.abs(z) > 1.5
            for hr, cnt, zz in zip(
                    g["hour_start_us"].to_numpy()[keep],
                    n[keep].astype(int), z[keep]):
                rows.append((et, int(hr), int(cnt), zz))
        want = pd.DataFrame(rows, columns=[
            "event_type", "hour_start_us", "n", "z",
        ]).sort_values(["event_type", "hour_start_us"]).reset_index(drop=True)
        assert len(got) == len(want) and len(got) > 0
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False, atol=1e-9)

    def test_uniform_counts_yield_nothing(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_anomaly,
        )

        # 3 hours x exactly 2 events each: sd == 0 -> no anomalies
        base = 1_600_000_000_000_000
        ts = [base + h * 3600_000_000 + i for h in range(3) for i in (0, 1)]
        pq.write_table(pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["click"] * 6, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([1.0] * 6, pa.float64()),
        }), tmp_path / "events.parquet")
        assert q_events_anomaly(str(tmp_path)).count() == 0


class TestRangeJoin:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            _value_milli_np,
            q_events_range_join,
        )

        win_us = 3600 * 1_000_000
        got = (
            q_events_range_join(SF, window_s=3600).to_pandas()
            .set_index("event_id").sort_index()
        )
        purchases = events_df[events_df["event_type"] == "purchase"]
        clicks = events_df[events_df["event_type"] == "click"].copy()
        clicks["vm"] = _value_milli_np(clicks["value"].to_numpy())
        assert len(got) == len(purchases)
        for _, p in purchases.iterrows():
            m = clicks[
                (clicks["user_id"] == p["user_id"])
                & (clicks["epoch_us"] < p["epoch_us"])
                & (p["epoch_us"] - clicks["epoch_us"] <= win_us)
            ]
            r = got.loc[p["event_id"]]
            assert r["n_clicks"] == len(m)
            assert r["sum_click_value_milli"] == int(m["vm"].sum())

    def test_window_edges(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_range_join,
        )

        base = 1_600_000_000_000_000
        win = 10 * 1_000_000  # 10 s
        # clicks at -win-1 (out), -win (in, inclusive far edge),
        # -1 (in), 0 (out: strictly before), and another user's click
        rows = [
            (1, 10, "click", base - win - 1, 1.0),
            (2, 10, "click", base - win, 2.0),
            (3, 10, "click", base - 1, 4.0),
            (4, 10, "click", base, 8.0),
            (5, 99, "click", base - 1, 16.0),
            (6, 10, "purchase", base, 0.0),
        ]
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }), tmp_path / "events.parquet")
        out = q_events_range_join(str(tmp_path), window_s=10).take_all()
        assert len(out) == 1
        assert out[0]["n_clicks"] == 2
        assert out[0]["sum_click_value_milli"] == 6000


class TestFunnel:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_funnel,
        )

        steps = ("view", "click", "purchase")
        got = (
            q_events_funnel(SF, steps=steps).to_pandas()
            .sort_values("user_id").reset_index(drop=True)
        )
        rows = []
        for uid, g in events_df.groupby("user_id"):
            ts = [-1, -1, -1]
            prev = -(1 << 62)
            for i, step in enumerate(steps):
                cand = g[(g["event_type"] == step)
                         & (g["epoch_us"] > prev)]["epoch_us"]
                if prev == (1 << 62) or not len(cand):
                    prev = 1 << 62
                    continue
                ts[i] = int(cand.min())
                prev = ts[i]
            rows.append((uid, *ts))
        want = pd.DataFrame(rows, columns=[
            "user_id", "t1_us", "t2_us", "t3_us",
        ]).sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns].astype("int64"),
                                      want.astype("int64"))
        # the funnel is ordered: each reached step is strictly later
        r = got[(got["t1_us"] >= 0) & (got["t2_us"] >= 0)]
        assert (r["t2_us"] > r["t1_us"]).all()

    def test_abandoned_user_cannot_reenter(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_funnel,
        )

        base = 1_600_000_000_000_000
        # user 1: click BEFORE any view -> t2 must be the click AFTER
        # the view, not the earlier one; user 2: never views -> all -1
        # beyond t1; user 3: only an error event -> row of sentinels
        rows = [
            (1, 1, "click", base + 1),
            (2, 1, "view", base + 2),
            (3, 1, "click", base + 3),
            (4, 2, "click", base + 1),
            (5, 2, "purchase", base + 2),
            (6, 3, "error", base + 1),
        ]
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }), tmp_path / "events.parquet")
        got = {r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"])
               for r in q_events_funnel(str(tmp_path)).take_all()}
        assert got[1] == (base + 2, base + 3, -1)
        assert got[2] == (-1, -1, -1)
        assert got[3] == (-1, -1, -1)


class TestTransitions:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_transitions,
        )

        got = (
            q_events_transitions(SF).to_pandas()
            .sort_values(["prev_type", "next_type"]).reset_index(drop=True)
        )
        df = events_df.sort_values(["user_id", "epoch_us", "event_id"])
        prev = df.groupby("user_id")["event_type"].shift(1)
        want = (
            pd.DataFrame({"prev_type": prev, "next_type": df["event_type"]})
            .dropna().groupby(["prev_type", "next_type"])
            .size().rename("n").reset_index()
            .sort_values(["prev_type", "next_type"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False)
        assert int(got["n"].sum()) == len(events_df) - df["user_id"].nunique()


class TestRetention:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_retention,
        )

        day_us = 86400 * 1_000_000
        got = (
            q_events_retention(SF).to_pandas()
            .sort_values(["cohort_day_us", "day_offset"])
            .reset_index(drop=True)
        )
        df = events_df.copy()
        df["day_us"] = (df["epoch_us"] // day_us) * day_us
        d = df[["user_id", "day_us"]].drop_duplicates()
        first = d.groupby("user_id")["day_us"].min().rename("cohort_day_us")
        j = d.merge(first, on="user_id")
        j["day_offset"] = (j["day_us"] - j["cohort_day_us"]) // day_us
        want = (
            j.groupby(["cohort_day_us", "day_offset"])
            .size().rename("n_users").reset_index()
            .sort_values(["cohort_day_us", "day_offset"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns].astype("int64"), want.astype("int64"))
        # offset-0 cell of each cohort equals the cohort size
        base = got[got["day_offset"] == 0].set_index("cohort_day_us")["n_users"]
        sizes = first.value_counts()
        assert base.sort_index().to_dict() == sizes.sort_index().to_dict()


class TestLateData:
    def test_matches_bruteforce(self, ray_session, events_df):
        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_late_data,
        )

        win_us = 3600 * 1_000_000
        late_us = 900 * 1_000_000
        got = {(r["win_start_us"], r["status"]): r["n"]
               for r in q_events_late_data(SF).take_all()}
        df = events_df.sort_values("event_id")
        t = df["epoch_us"].to_numpy()
        import numpy as np

        wm = np.maximum.accumulate(np.r_[-(1 << 62), t[:-1]])
        late = t < wm - late_us
        want = {}
        for ti, li in zip(t, late):
            k = ((ti // win_us) * win_us, "late" if li else "on_time")
            want[k] = want.get(k, 0) + 1
        assert got == want

    def test_out_of_order_arrival_is_late(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.pipelines.windows import (
            q_events_late_data,
        )

        h = 3600 * 1_000_000
        base = 444_444_445 * h  # hour-aligned epoch (~2026)
        # arrival order: t=0h, t=3h (advances watermark), then a
        # STRAGGLER with t=0h+1s — watermark 3h-15min > its event time
        # -> late; a second straggler within lateness -> on_time
        rows = [(0, base), (1, base + 3 * h), (2, base + 1_000_000),
                (3, base + 3 * h - 600 * 1_000_000)]
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * 4, pa.float64()),
        }), tmp_path / "events.parquet")
        got = {(r["win_start_us"], r["status"]): r["n"]
               for r in q_events_late_data(str(tmp_path)).take_all()}
        assert got[(base, "late")] == 1            # the straggler
        assert got[(base, "on_time")] == 1         # the first event
        assert got[(base + 2 * h, "on_time")] == 1  # within lateness
        assert got[(base + 3 * h, "on_time")] == 1
        assert sum(got.values()) == 4
