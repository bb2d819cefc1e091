"""Temporal operators over the event stream: sessionization, sliding
windows, band (range) self-joins, and as-of joins.

The reference has no streaming/temporal layer (its event-shaped work is
one-document-at-a-time Celery ingestion, ``tasks.py:11-27``), but a
training-data engine at 100 TB needs the classic time-series operators
that Ray Data lacks natively.  Each one here is expressed as the
composition the engine's design rules prescribe:

  sessionize     hash-partition by entity key -> per-partition
                 vectorized gap-break scan (sort + diff + cumsum)
  sliding window replicate each row to the ``window/slide`` covering
                 windows inside ``map_batches`` (no shuffle added),
                 then the usual two-phase hash aggregate
  band join      bucket by ``floor(ts/band)``, replicate each row to
                 its successor bucket, pair within buckets via a
                 composite-key ``searchsorted`` (fully vectorized,
                 exactly-once emission: a pair is emitted only where
                 its EARLIER member is the replica copy)
  as-of join     hash-partition by key -> per-partition grouped
                 shift+ffill (the "most recent prior match" scan)

Partitioning assumptions (documented per the engine's custom-operator
rule): sessionize and as-of require each entity key's rows to fit in
one partition group (a user's events — bounded in practice; a hot key
would need a secondary time-range split); the band join requires each
``(type, band-bucket)``'s rows to fit (bounded by band width ×  event
rate).  All are checked against exact DuckDB window/inequality-join
oracles at sf0.01 via ``oracle_sql()``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from neo4j_document_pipeline_ray.stages.grouped import (
    hash_aggregate,
    partitioned_group_map,
)

_US = 1_000_000


def _read_events(sf_dir: str, columns) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def _value_milli_np(v: np.ndarray) -> np.ndarray:
    """DuckDB-compatible ``round(value * 1000)`` (half away from zero;
    numpy's default round is half-to-even).  Events carry positive
    values only, but keep the sign-safe form."""
    x = v * 1000.0
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


# --- sessionization (gap-based) --------------------------------------------

def q_events_sessions(sf_dir: str, gap_s: int = 1800) -> "ray.data.Dataset":
    """Gap-based sessions per user: a new session starts when the gap to
    the user's previous event exceeds ``gap_s``.  One output row per
    session with start/end/count/value-sum.

    Scale shape: one hash exchange on ``user_id``; inside a partition
    everything is a single sort + vectorized diff/cumsum + C groupby —
    no per-row or per-session Python.
    """
    gap_us = gap_s * _US
    ev = _read_events(sf_dir, ["user_id", "ts", "value"])

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vm = _value_milli_np(df["value"].to_numpy())
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | (np.r_[gap_us + 1, np.diff(t)] > gap_us)
        sid = np.cumsum(brk)  # partition-local session label
        g = pd.DataFrame({
            "user_id": uid, "t": t, "vm": vm, "sid": sid,
        }).groupby("sid", sort=False)
        out = g.agg(
            user_id=("user_id", "first"),
            session_start_us=("t", "min"),
            session_end_us=("t", "max"),
            n_events=("t", "size"),
            sum_value_milli=("vm", "sum"),
        ).reset_index(drop=True)
        return out.astype({"n_events": "int64", "sum_value_milli": "int64"})

    return partitioned_group_map(ev, "user_id", sessionize, num_partitions=None)


def events_sessions_sql(gap_s: int = 1800) -> str:
    gap_us = gap_s * _US
    return f"""
WITH g AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM g
)
SELECT user_id,
       min(epoch_us(ts)) AS session_start_us,
       max(epoch_us(ts)) AS session_end_us,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM s GROUP BY user_id, sid
"""


# --- sliding-window aggregate ----------------------------------------------

def q_events_sliding_window(
    sf_dir: str, window_s: int = 3600, slide_s: int = 900
) -> "ray.data.Dataset":
    """Per-type aggregates over sliding windows of ``window_s`` seconds
    advancing every ``slide_s`` (window starts are the multiples of the
    slide; each event lands in ``window_s / slide_s`` windows).

    The replication happens INSIDE ``map_batches`` — the exchange the
    aggregate pays is over (type, window) partials, already shrunk by
    the in-batch combine, not over the replicated rows.
    """
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    reps = window_s // slide_s
    slide_us = slide_s * _US
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        m = pc.cast(pc.floor(pc.divide(epoch, slide_us)), pa.int64())
        vm = pa.array(
            _value_milli_np(
                t["value"].combine_chunks().to_numpy(zero_copy_only=False)),
            pa.int64(),
        )
        parts = []
        for k in range(reps):
            win = pc.multiply(pc.subtract(m, k), slide_us)
            parts.append(pa.table({
                "event_type": t["event_type"],
                "win_start_us": win,
                "value_milli": vm,
            }))
        return pa.concat_tables(parts)

    return hash_aggregate(
        ev.map_batches(expand, batch_format="pyarrow"),
        ["event_type", "win_start_us"],
        [(None, "count", "n"),
         ("value_milli", "sum", "sum_value_milli"),
         ("value_milli", "max", "max_value_milli")],
    )


def events_sliding_window_sql(window_s: int = 3600, slide_s: int = 900) -> str:
    reps = window_s // slide_s
    slide_us = slide_s * _US
    return f"""
SELECT event_type,
       (CAST(floor(epoch_us(ts) / {slide_us}) AS BIGINT) - t.k) * {slide_us}
         AS win_start_us,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       max(CAST(round(value * 1000) AS BIGINT)) AS max_value_milli
FROM events, range({reps}) t(k)
GROUP BY event_type, win_start_us
"""


# --- band (range) self-join -------------------------------------------------

def q_events_band_pairs(sf_dir: str, band_s: int = 60) -> "ray.data.Dataset":
    """All pairs of same-type events within ``band_s`` seconds of each
    other — the band-join special case of a range join, expressed as a
    bucketed self-join: bucket by ``floor(ts/band)``, replicate each
    event to its successor bucket, pair inside ``(type, bucket)`` groups.

    Exactly-once emission: a qualifying pair's two members always
    coexist in the earlier member's successor bucket (|dt| <= band), so
    a pair is emitted only where its earlier member is the REPLICA copy.
    The in-group pairing is a composite-key ``searchsorted`` — zero
    Python per row, O(members + pairs) per group.
    """
    band_us = band_s * _US
    ev = _read_events(sf_dir, ["event_id", "event_type", "ts"])

    def replicate(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        home = pc.cast(pc.floor(pc.divide(epoch, band_us)), pa.int64())
        base = pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "epoch_us": epoch,
        })
        n = t.num_rows
        own = base.append_column("bucket", home).append_column(
            "is_rep", pa.array(np.zeros(n, dtype=bool)))
        rep = base.append_column(
            "bucket", pc.add(home, 1)).append_column(
            "is_rep", pa.array(np.ones(n, dtype=bool)))
        return pa.concat_tables([own, rep])

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_id_a": pd.Series([], dtype="int64"),
                "event_id_b": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype="object"),
                "dt_us": pd.Series([], dtype="int64"),
            })
        # composite sort key: group ordinal g spaced 4*band apart, plus
        # the in-bucket-relative timestamp (< 2*band) — searchsorted at
        # +band can then never cross a group boundary.
        g, _ = pd.factorize(
            df["event_type"].astype(str) + "\x00" + df["bucket"].astype(str),
            sort=True)
        t = df["epoch_us"].to_numpy()
        rel = t - (df["bucket"].to_numpy() - 1) * band_us
        key = g.astype(np.int64) * (4 * band_us) + rel
        order = np.argsort(key, kind="stable")
        key = key[order]
        eid = df["event_id"].to_numpy()[order]
        t = t[order]
        etype = df["event_type"].to_numpy()[order]
        is_rep = df["is_rep"].to_numpy()[order]

        hi = np.searchsorted(key, key + band_us, side="right")
        idx = np.arange(len(key))
        counts = hi - idx - 1
        # emit only pairs whose earlier member is the replica copy
        counts = np.where(is_rep, counts, 0)
        total = int(counts.sum())
        if not total:
            return pair_partition(df.iloc[0:0])
        lefts = np.repeat(idx, counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        rights = np.arange(total) - starts + lefts + 1
        a, b = eid[lefts], eid[rights]
        lo = np.minimum(a, b)
        hi_id = np.maximum(a, b)
        return pd.DataFrame({
            "event_id_a": pd.Series(lo, dtype="int64"),
            "event_id_b": pd.Series(hi_id, dtype="int64"),
            "event_type": etype[lefts],
            "dt_us": pd.Series(t[rights] - t[lefts], dtype="int64"),
        })

    replicated = ev.map_batches(replicate, batch_format="pyarrow")
    return partitioned_group_map(
        replicated, ["event_type", "bucket"], pair_partition,
        num_partitions=None,
    )


def events_band_pairs_sql(band_s: int = 60) -> str:
    band_us = band_s * _US
    return f"""
SELECT a.event_id AS event_id_a, b.event_id AS event_id_b, a.event_type,
       abs(epoch_us(a.ts) - epoch_us(b.ts)) AS dt_us
FROM events a JOIN events b
  ON a.event_type = b.event_type AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {band_us}
"""


# --- as-of join --------------------------------------------------------------

def q_events_asof_purchase(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: every event gets the user's most recent STRICTLY
    prior ``purchase`` event (id + microseconds elapsed); ``-1`` when
    the user has no prior purchase (sentinel instead of NULL so the
    result hashes identically across engines' nullable-int handling).

    Scale shape: one hash exchange on the key, then a per-partition
    sort + grouped shift/ffill — the merge scan of a sort-merge as-of
    join, vectorized.  Both join sides here are one table; two-table
    as-of works identically by unioning tagged rows first.
    """
    ev = _read_events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_p = df["event_type"].to_numpy() == "purchase"
        pid = pd.Series(np.where(is_p, eid, np.nan))
        pts = pd.Series(np.where(is_p, t, np.nan))
        grp = pd.Series(uid)
        # shift(1) then ffill within user == last purchase at a strictly
        # earlier row in (user, ts) order
        prior_id = pid.groupby(grp, sort=False).shift(1)
        prior_id = prior_id.groupby(grp, sort=False).ffill()
        prior_ts = pts.groupby(grp, sort=False).shift(1)
        prior_ts = prior_ts.groupby(grp, sort=False).ffill()
        since = t - prior_ts.to_numpy()
        return pd.DataFrame({
            "event_id": pd.Series(eid, dtype="int64"),
            "user_id": pd.Series(uid, dtype="int64"),
            "event_type": df["event_type"].to_numpy(),
            "prior_purchase_id": pd.Series(
                np.where(np.isnan(prior_id), -1, prior_id), dtype="int64"),
            "us_since_purchase": pd.Series(
                np.where(np.isnan(since), -1, since), dtype="int64"),
        })

    return partitioned_group_map(ev, "user_id", asof, num_partitions=None)


EVENTS_ASOF_PURCHASE_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type,
    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      OVER win AS ppid,
    epoch_us(ts) -
    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
      OVER win AS since
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, event_type,
       CAST(coalesce(ppid, -1) AS BIGINT) AS prior_purchase_id,
       CAST(coalesce(since, -1) AS BIGINT) AS us_since_purchase
FROM w
"""


# --- hourly anomaly detection (z-score per type) -----------------------------

def q_events_anomaly(sf_dir: str, z_thresh: float = 2.0) -> "ray.data.Dataset":
    """Hours whose per-type event count is anomalous: |z| > ``z_thresh``
    against that type's own mean/population-std over its OBSERVED hours
    (an hour with zero events of a type contributes nothing — the
    operator audits traffic that happened, it does not impute gaps).

    Scale shape: one two-phase hash aggregate to (type, hour) counts
    (the exchange carries per-batch partials), one tiny per-type
    moments aggregate (rows = #types), broadcast back through
    ``broadcast_join``'s size gate, then a vectorized z + filter per
    batch.  No sort, no driver loop.
    """
    hour_us = 3600 * _US
    ev = _read_events(sf_dir, ["ts", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        hr = pc.multiply(
            pc.cast(pc.floor(pc.divide(epoch, hour_us)), pa.int64()),
            hour_us)
        return pa.table({"event_type": t["event_type"], "hour_start_us": hr})

    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    counts = hash_aggregate(
        ev.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "hour_start_us"], [(None, "count", "n")],
    )

    def add_sq(t: pa.Table) -> pa.Table:
        return t.append_column("n2", pc.multiply(t["n"], t["n"]))

    stats = hash_aggregate(
        counts.map_batches(add_sq, batch_format="pyarrow"),
        "event_type",
        [("n", "sum", "s"), ("n2", "sum", "s2"), (None, "count", "h")],
    )

    joined = broadcast_join(counts, stats, on=("event_type",))

    def zfilter(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        mu = s / h
        var = np.maximum(s2 / h - mu * mu, 0.0)
        sd = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (n - mu) / sd, 0.0)
        keep = (sd > 0) & (np.abs(z) > z_thresh)
        out = t.select(["event_type", "hour_start_us", "n"]).filter(
            pa.array(keep))
        return out.append_column("z", pa.array(z[keep], pa.float64()))

    return joined.map_batches(zfilter, batch_format="pyarrow")


def events_anomaly_sql(z_thresh: float = 2.0) -> str:
    hour_us = 3600 * _US
    return f"""
WITH c AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {hour_us}) AS BIGINT) * {hour_us}
           AS hour_start_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         avg(CAST(n AS DOUBLE)) AS mu,
         stddev_pop(CAST(n AS DOUBLE)) AS sd
  FROM c GROUP BY 1
)
SELECT c.event_type, c.hour_start_us, CAST(c.n AS BIGINT) AS n,
       (CAST(c.n AS DOUBLE) - s.mu) / s.sd AS z
FROM c JOIN s USING (event_type)
WHERE s.sd > 0
  AND abs((CAST(c.n AS DOUBLE) - s.mu) / s.sd) > {z_thresh}
"""


# --- windowed range-join aggregate -------------------------------------------

def q_events_range_join(sf_dir: str, window_s: int = 3600) -> "ray.data.Dataset":
    """For every ``purchase``: how many of the same user's ``click``
    events landed in the preceding ``window_s`` seconds (inclusive at
    the far edge, strictly before the purchase), plus their value sum —
    the attribution-window special case of a keyed range join, which
    the as-of join (most recent ONE match) cannot express.

    Scale shape: one hash exchange on ``user_id``, then a per-partition
    composite-key ``searchsorted`` against the clicks' prefix sums —
    zero Python per row, O(n log n) per partition.  Same exactly-once
    partitioning assumption as the other keyed temporal operators: a
    user's events fit one partition group.  Composite-key headroom:
    ``user_ordinal * span`` must fit int64 — with span = time-range +
    window (~years in us) that allows ~1e5 users per PARTITION GROUP
    (not per corpus); a denser corpus lowers ``num_partitions`` head-on
    or sub-buckets time like the band join.
    """
    win_us = window_s * _US
    ev = _read_events(
        sf_dir, ["event_id", "user_id", "event_type", "ts", "value"])

    def slim(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "click"]))
        t = t.filter(keep)
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "is_purchase": pc.equal(t["event_type"], "purchase"),
            "epoch_us": pc.cast(t["ts"], pa.int64()),
            "value_milli": pa.array(
                _value_milli_np(
                    t["value"].combine_chunks().to_numpy(
                        zero_copy_only=False)), pa.int64()),
        })

    def rjoin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "n_clicks": pd.Series([], dtype="int64"),
            "sum_click_value_milli": pd.Series([], dtype="int64"),
        })
        if not len(df):
            return empty
        df = df.sort_values(["user_id", "epoch_us"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        t = df["epoch_us"].to_numpy()
        g = pd.factorize(pd.Series(uid), sort=False)[0].astype(np.int64)
        rel = t - t.min()
        span = int(rel.max()) + win_us + 2
        key = g * span + rel  # user blocks can never overlap: a
        # purchase's window floor (key - win_us) stays inside its block
        is_p = df["is_purchase"].to_numpy()
        ckey = key[~is_p]
        cval = df["value_milli"].to_numpy()[~is_p]
        csum = np.r_[0, np.cumsum(cval)]
        pkey = key[is_p]
        lo = np.searchsorted(ckey, pkey - win_us, side="left")
        hi = np.searchsorted(ckey, pkey, side="left")  # strictly before
        if not is_p.any():
            return empty
        return pd.DataFrame({
            "event_id": pd.Series(
                df["event_id"].to_numpy()[is_p], dtype="int64"),
            "user_id": pd.Series(uid[is_p], dtype="int64"),
            "n_clicks": pd.Series(hi - lo, dtype="int64"),
            "sum_click_value_milli": pd.Series(
                csum[hi] - csum[lo], dtype="int64"),
        })

    slimmed = ev.map_batches(slim, batch_format="pyarrow")
    return partitioned_group_map(slimmed, "user_id", rjoin,
                                 num_partitions=None)


def q_events_funnel(
    sf_dir: str, steps: "tuple[str, ...]" = ("view", "click", "purchase")
) -> "ray.data.Dataset":
    """Ordered-funnel detection (the MATCH_RECOGNIZE / sequence-pattern
    class no batch relational operator expresses directly): for every
    user, the earliest ``steps[0]`` event, the earliest ``steps[1]``
    STRICTLY after it, the earliest ``steps[2]`` strictly after that,
    and so on.  One row per user with the per-step timestamps
    (microseconds; ``-1`` once the funnel is abandoned, the same
    sentinel convention as the as-of join).

    Scale shape: one hash exchange on ``user_id``, then a per-partition
    vectorized scan — per step, a groupby-min over the step's rows
    filtered against the previous step's per-user timestamp (pandas
    merge + boolean mask; no per-row Python).  Same partitioning
    assumption as sessionize: a user's events fit one partition group.
    """
    ev = _read_events(sf_dir, ["user_id", "event_type", "ts"])
    want = pa.array(list(steps))

    def slim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=want))
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "epoch_us": pc.cast(t["ts"], pa.int64()),
        })

    # every user with >=1 event appears in the output, even if they
    # never hit steps[0] — the funnel reports abandonment, not presence
    all_users = hash_aggregate(
        _read_events(sf_dir, ["user_id"]), "user_id", [(None, "count", "_m")],
    ).drop_columns(["_m"])

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": df["user_id"].unique()})
        prev = pd.Series(
            np.full(len(out), -(1 << 62), dtype=np.int64),
            index=out["user_id"].to_numpy())
        for i, step in enumerate(steps):
            rows = df[df["event_type"] == step]
            # strictly after the user's previous-step timestamp
            pv = prev.reindex(rows["user_id"].to_numpy()).to_numpy()
            ok = rows[rows["epoch_us"].to_numpy() > pv]
            t_i = ok.groupby("user_id")["epoch_us"].min()
            col = t_i.reindex(out["user_id"].to_numpy())
            out[f"t{i + 1}_us"] = pd.Series(
                np.where(np.isnan(col), -1, col), dtype="int64").to_numpy()
            # an abandoned user can never re-enter: -1 maps to +inf
            prev = t_i.reindex(prev.index)
            prev = prev.fillna(np.inf)
        return out

    per_user = partitioned_group_map(
        ev.map_batches(slim, batch_format="pyarrow"),
        "user_id", funnel, num_partitions=None)

    # left-attach so step-less users still emit a row of sentinels
    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    j = broadcast_join(all_users, per_user, on=("user_id",),
                       join_type="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for i in range(len(steps)):
            cols[f"t{i + 1}_us"] = pc.fill_null(t[f"t{i + 1}_us"], -1)
        return pa.table(cols)

    return j.map_batches(fill, batch_format="pyarrow")


def events_funnel_sql(
    steps: "tuple[str, ...]" = ("view", "click", "purchase")
) -> str:
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)"]
    prev = None
    for i, step in enumerate(steps):
        cond = (f" JOIN s{i - 1} p ON e.user_id = p.user_id "
                f"AND epoch_us(e.ts) > p.t" if prev else "")
        ctes.append(f"""
  s{i} AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t
    FROM events e{cond}
    WHERE e.event_type = '{step}'
    GROUP BY e.user_id
  )""")
        prev = step
    sel = ", ".join(
        f"CAST(coalesce(s{i}.t, -1) AS BIGINT) AS t{i + 1}_us"
        for i in range(len(steps)))
    joins = "".join(
        f" LEFT JOIN s{i} ON u.user_id = s{i}.user_id"
        for i in range(len(steps)))
    return (f"WITH {','.join(ctes)}\n"
            f"SELECT u.user_id, {sel} FROM u{joins}")


def q_events_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Event-type transition matrix: counts of consecutive
    ``(prev_type, next_type)`` pairs along every user's timeline
    (ordered by ``ts`` then ``event_id`` — the deterministic total
    order).  The Markov-chain summary of a clickstream, i.e. the
    sequence-mining counterpart of :func:`q_events_funnel`'s pattern
    match.

    Scale shape: one hash exchange on ``user_id``, per-partition
    vectorized shift, then a tiny (|types|^2-row) hash aggregate of
    in-partition partial counts.
    """
    ev = _read_events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "epoch_us": pc.cast(t["ts"], pa.int64()),
        })

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "epoch_us", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.r_[False, uid[1:] == uid[:-1]]
        prev = np.r_[[""], et[:-1]]
        g = pd.DataFrame({
            "prev_type": prev[same], "next_type": et[same],
        }).groupby(["prev_type", "next_type"], sort=False)
        out = g.size().rename("n").reset_index()
        return out.astype({"n": "int64"})

    partials = partitioned_group_map(
        ev.map_batches(slim, batch_format="pyarrow"),
        "user_id", transitions, num_partitions=None)
    return hash_aggregate(
        partials, ["prev_type", "next_type"], [("n", "sum", "n")],
        num_partitions=1)


EVENTS_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_events_retention(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention matrix: users are cohorted by their FIRST
    active day; each ``(cohort_day_us, day_offset)`` cell counts how
    many of that cohort's users were active ``day_offset`` days later
    (offset 0 = cohort size).  The standard product-analytics operator
    a clickstream warehouse serves.

    Scale shape: distinct (user, day) pairs via one two-phase hash
    aggregate; per-user first day via a second (user-keyed) aggregate,
    broadcast back through the size gate; the final cell aggregate is
    tiny (cohorts × offsets).  No sort, no driver-side data paths.
    """
    day_us = 86400 * _US
    ev = _read_events(sf_dir, ["user_id", "ts"])

    def day(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        d = pc.multiply(
            pc.cast(pc.floor(pc.divide(epoch, day_us)), pa.int64()), day_us)
        return pa.table({"user_id": t["user_id"], "day_us": d})

    days = hash_aggregate(
        ev.map_batches(day, batch_format="pyarrow"),
        ["user_id", "day_us"], [(None, "count", "_m")],
    ).drop_columns(["_m"]).materialize()

    first = hash_aggregate(days, "user_id", [("day_us", "min", "cohort_day_us")])

    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    j = broadcast_join(days, first, on=("user_id",))

    def offset(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day_us": t["cohort_day_us"],
            "day_offset": pc.divide(
                pc.subtract(t["day_us"], t["cohort_day_us"]), day_us),
        })

    return hash_aggregate(
        j.map_batches(offset, batch_format="pyarrow"),
        ["cohort_day_us", "day_offset"], [(None, "count", "n_users")],
        num_partitions=1)


EVENTS_RETENTION_SQL = f"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / {86400 * _US}) AS BIGINT) * {86400 * _US}
           AS day_us
  FROM events
), f AS (
  SELECT user_id, min(day_us) AS cohort_day_us FROM d GROUP BY user_id
)
SELECT f.cohort_day_us,
       (d.day_us - f.cohort_day_us) // {86400 * _US} AS day_offset,
       count(*) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_events_late_data(
    sf_dir: str, window_s: int = 3600, lateness_s: int = 900,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Streaming watermark semantics over a batch log: each event
    arrives in ``event_id`` order; the WATERMARK at its arrival is the
    maximum event-time seen over all STRICTLY earlier arrivals minus
    ``lateness_s``.  An event whose own event-time is below the
    watermark is LATE (a streaming engine would route it to a side
    output instead of its tumbling window).  Output: per
    ``(win_start_us, status)`` counts, status in {on_time, late} — the
    batch replay of the window/watermark/late-data contract the
    reference's strictly-batch design never had (SURVEY.md §2.8).

    Scale shape — distributed PREFIX SCAN over arrival order: one tiny
    aggregate finds the arrival-id span; events partition into K
    contiguous arrival ranges; pass 1 computes each range's event-time
    max (per-batch Arrow partials, group-sized exchange); the driver
    turns K maxima into K exclusive prefix offsets (O(K) scalars);
    pass 2 streams each range again with its offset broadcast, running
    an in-partition vectorized cummax — no global sort, no driver-side
    data path.
    """
    win_us = window_s * _US
    late_us = lateness_s * _US
    ev = _read_events(sf_dir, ["event_id", "ts"])

    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    # arrival-id span (two scalars) -> K contiguous ranges
    def span_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": pa.array([pc.min(t["event_id"]).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t["event_id"]).as_py()], pa.int64()),
            "_k": pa.array([1], pa.int64()),
        })

    span = hash_aggregate(
        ev.map_batches(span_partial, batch_format="pyarrow"),
        "_k", [("lo", "min", "lo"), ("hi", "max", "hi")],
        num_partitions=1,
    ).take_all()
    if not span:
        return ray.data.from_arrow(pa.table({
            "win_start_us": pa.array([], pa.int64()),
            "status": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }))
    lo, hi = span[0]["lo"], span[0]["hi"]
    if num_partitions is None:
        from neo4j_document_pipeline_ray.stages.grouped import (
            derive_partitions,
            plan_size_estimate,
        )

        num_partitions = derive_partitions(
            plan_size_estimate(ev, source_ok=True), floor=16)
    k = max(1, min(num_partitions, hi - lo + 1))
    width = (hi - lo) // k + 1

    def bucketed(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pc.cast(pc.divide(
                pc.subtract(t["event_id"], lo), width), pa.int64()),
            "event_id": t["event_id"],
            "epoch_us": pc.cast(t["ts"], pa.int64()),
        })

    # bev is EVENT-SIZED, so it is deliberately not materialized: the
    # two passes below each re-run the pruned 2-column read + bucket
    # map — two streaming scans instead of a corpus-scale pin
    bev = ev.map_batches(bucketed, batch_format="pyarrow")

    # pass 1: per-range event-time max (group-sized exchange of partials)
    rng_max = hash_aggregate(
        bev.select_columns(["bucket", "epoch_us"]),
        "bucket", [("epoch_us", "max", "mx")],
        num_partitions=1,
    ).take_all()
    mx_by_bucket = {r["bucket"]: r["mx"] for r in rng_max}
    # exclusive prefix maxima: watermark floor entering each range
    prefix = {}
    run = None
    for b in range(k):
        prefix[b] = run
        if b in mx_by_bucket:
            run = mx_by_bucket[b] if run is None else max(run, mx_by_bucket[b])

    import numpy as np

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        # a hash partition holds SEVERAL arrival ranges; each range is
        # scanned independently with ITS prefix maximum as the seed
        if not len(df):
            return pd.DataFrame({
                "win_start_us": pd.Series([], dtype="int64"),
                "status": pd.Series([], dtype="object"),
            })
        df = df.sort_values(["bucket", "event_id"], kind="mergesort")
        b = df["bucket"].to_numpy()
        t = df["epoch_us"].to_numpy()
        wins, stats = [], []
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends_ = np.r_[starts[1:], len(b)]
        for s, e in zip(starts, ends_):
            ts = t[s:e]
            pre = prefix.get(int(b[s]))
            # watermark basis at each arrival: max event-time STRICTLY
            # before it = shift-by-one cummax seeded with the prior
            # ranges' prefix max (None only before any data at all)
            cm = np.maximum.accumulate(
                np.r_[(-(1 << 62)) if pre is None else pre, ts[:-1]])
            late = ts < cm - late_us
            wins.append((ts // win_us) * win_us)
            stats.append(np.where(late, "late", "on_time"))
        return pd.DataFrame({
            "win_start_us": np.concatenate(wins),
            "status": np.concatenate(stats),
        })

    scanned = partitioned_group_map(
        bev, "bucket", scan, num_partitions=num_partitions)
    return hash_aggregate(
        scanned, ["win_start_us", "status"], [(None, "count", "n")],
        num_partitions=1)


def events_late_data_sql(window_s: int = 3600, lateness_s: int = 900) -> str:
    win_us = window_s * _US
    late_us = lateness_s * _US
    return f"""
WITH w AS (
  SELECT epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT (t // {win_us}) * {win_us} AS win_start_us,
       CASE WHEN wm IS NOT NULL AND t < wm - {late_us}
            THEN 'late' ELSE 'on_time' END AS status,
       count(*) AS n
FROM w GROUP BY 1, 2
"""


def events_range_join_sql(window_s: int = 3600) -> str:
    win_us = window_s * _US
    return f"""
SELECT p.event_id, p.user_id,
       count(c.event_id) AS n_clicks,
       CAST(coalesce(sum(CAST(round(c.value * 1000) AS BIGINT)), 0)
            AS BIGINT) AS sum_click_value_milli
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts < p.ts
 AND epoch_us(p.ts) - epoch_us(c.ts) <= {win_us}
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""
