"""Stream-shaped operators over the ``events`` table: tumbling windows,
as-of (previous-event) join, session windows.

Ray Data has no event-time watermarks (neither does the reference — "no
windows/watermarks/late data anywhere", SURVEY.md §1.3); events are treated
as an ordered, partitioned log: partition by user, sort by ts within group,
window with pandas inside ``map_groups`` (ray_guide.md streaming pattern).
The per-user partition is the documented ordering assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .util import buckets_for_table, derive_buckets, parquet_rows, tbl

SQL: dict[str, str] = {}

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def window_hourly(sf_dir: str):
    """Tumbling 1h window count/sum per event_type; the window key is
    computed vectorized per batch, then it's an ordinary grouped aggregate
    (oracle: GROUP BY date_trunc)."""
    ds = tbl(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        epoch = pc.divide(pc.cast(hour, pa.int64()), 1_000_000)
        return pa.table({"event_type": batch["event_type"],
                         "hour_epoch": epoch,
                         "value": batch["value"]})

    out = (ds.map_batches(bucket, batch_format="pyarrow")
             .groupby(["event_type", "hour_epoch"])
             .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "hour_epoch"]).reset_index(drop=True)


SQL["window_hourly"] = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY event_type, hour_epoch
"""


def asof_prev_event(sf_dir: str):
    """As-of self-join: each event matched to the same user's previous event
    (partition by user_id, sort by (ts, event_id) within group — the
    merge_asof/map_groups pattern; oracle: lag() window fn)."""
    ds = tbl(sf_dir, "events", ["event_id", "user_id", "ts"])
    nb = buckets_for_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        # user count scales with the data: shuffle on a BOUNDED bucket key
        # (all of a user's rows co-located) and diff all users of a bucket
        # in one vectorized grouped pass — not one Python call per user.
        # Bucket count derives from the pruned events size (round-5 #1).
        # Arrow-native full-data pass (round-2 verdict item #8): the bucket
        # key is numpy over the zero-copy int64 column, no pandas detour
        b = (batch["user_id"].to_numpy() * np.int64(2654435761)) % nb
        return batch.append_column("b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        # Arrow/numpy segment fold (round-4): one lexsort, grouped diff
        # via the user-boundary mask — no pandas conversion per bucket
        uid = g["user_id"].to_numpy()
        ts = pc.cast(g["ts"], pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, t, e = uid[order], ts[order], eid[order]
        gap = np.full(len(u), -1, dtype=np.int64)
        if len(u) > 1:
            same = u[1:] == u[:-1]
            gap[1:] = np.where(same, t[1:] - t[:-1], -1)
        return pa.table({"event_id": pa.array(e), "gap_us": pa.array(gap)})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("b").map_groups(per_bucket, batch_format="pyarrow")
             .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


SQL["asof_prev_event"] = """
SELECT event_id,
       COALESCE(CAST(epoch_us(ts - lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT), -1) AS gap_us
FROM events ORDER BY event_id
"""


def sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user → session count and
    max session size (the reference has no streaming semantics; this is the
    engine's windowed extension, per-partition sequential with pandas)."""
    ds = tbl(sf_dir, "events", ["event_id", "user_id", "ts"])
    nb = buckets_for_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() * np.int64(2654435761)) % nb
        return batch.append_column("b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        # all users of the bucket sessionized in ONE Arrow/numpy pass:
        # session starts from the grouped ts-diff (a user's first row
        # starts a session), a global cumsum numbers sessions uniquely
        # across users, bincount/reduceat produce the per-user stats
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "n_sessions": pa.array([], type=pa.int64()),
            "max_session_events": pa.array([], type=pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        uid = g["user_id"].to_numpy()
        ts = pc.cast(g["ts"], pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        new_sess = np.ones(n, dtype=bool)
        same = u[1:] == u[:-1]
        new_sess[1:] = ~same | (t[1:] - t[:-1] > SESSION_GAP_US)
        sid = np.cumsum(new_sess) - 1
        sess_size = np.bincount(sid)[sid]
        ustart = np.ones(n, dtype=bool)
        ustart[1:] = ~same
        useg = np.cumsum(ustart) - 1
        starts = np.flatnonzero(ustart)
        return pa.table({
            "user_id": pa.array(u[starts]),
            "n_events": pa.array(np.bincount(useg)),
            "n_sessions": pa.array(
                np.bincount(useg, weights=new_sess).astype(np.int64)),
            "max_session_events": pa.array(
                np.maximum.reduceat(sess_size, starts)),
        })

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("b").map_groups(per_bucket, batch_format="pyarrow")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


SQL["sessionize"] = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts - lag(ts) OVER w) > 1800000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), sized AS (
  SELECT user_id, session_id, count(*) AS session_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, CAST(sum(session_events) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(session_events) AS BIGINT) AS max_session_events
FROM sized GROUP BY user_id ORDER BY user_id
"""


SLIDE_US = 30 * 60 * 1_000_000   # 30-min slide
WIN_US = 60 * 60 * 1_000_000     # 1-h window


def window_sliding(sf_dir: str):
    """Sliding window (1h length, 30min slide): every event belongs to
    exactly WIN/SLIDE = 2 windows — emitted per batch as a vectorized
    2x row expansion (flat_map shape), then an ordinary grouped count.
    Ray Data has no native windows (nor does the reference, SURVEY.md §1.3);
    the expansion IS the window assignment."""
    ds = tbl(sf_dir, "events", ["event_type", "ts", "value"])
    k = WIN_US // SLIDE_US  # windows per event

    def expand(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch["ts"], pa.int64()))
        last_start = (ts // SLIDE_US) * SLIDE_US
        parts = []
        et = batch["event_type"].to_pandas().to_numpy()
        val = np.asarray(batch["value"])
        for i in range(k):
            start = last_start - i * SLIDE_US
            parts.append(pa.table({
                "event_type": pa.array(et),
                "window_start": pa.array(start // 1_000_000, type=pa.int64()),
                "value": pa.array(val),
            }))
        return pa.concat_tables(parts)

    out = (ds.map_batches(expand, batch_format="pyarrow")
             .groupby(["event_type", "window_start"])
             .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
             .to_pandas())
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return (out.sort_values(["event_type", "window_start"])
               .reset_index(drop=True))


SQL["window_sliding"] = """
WITH expanded AS (
  SELECT event_type, value,
         (epoch_us(ts) // 1800000000) * 1800 - offs * 1800 AS window_start
  FROM events, (SELECT unnest([0, 1]) AS offs)
)
SELECT event_type, window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM expanded
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_steps(sf_dir: str):
    """Ordered funnel analysis over the event stream: users who viewed,
    then clicked strictly AFTER their first view, then purchased strictly
    after that first qualifying click — the step-conversion count every
    product-event pipeline runs. One bucketed shuffle of the (filtered)
    relevant events; each user's whole history folds inside its user-hash
    bucket with vectorized pandas (bounded-groupby rule), and the driver
    sums the bounded per-bucket partial rows."""
    import numpy as np

    ds = tbl(sf_dir, "events", ["user_id", "event_type", "ts"])
    nb = buckets_for_table(sf_dir, "events",
                           ["user_id", "event_type", "ts"])

    def bucketize(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(FUNNEL_STEPS))
        b = batch.filter(keep)
        key = b["user_id"].to_numpy() % nb
        return b.append_column("b", pa.array(key))

    def fold(g: pa.Table) -> pa.Table:
        # Arrow/numpy: per-user step times via minimum.at scatter over
        # factorized user codes — the three merge joins become three
        # masked scatters (round-4, no pandas per bucket)
        uniq, codes = np.unique(g["user_id"].to_numpy(),
                                return_inverse=True)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        nu = len(uniq)
        INF = np.int64(1 << 62)

        def step_min(mask: np.ndarray, after: np.ndarray) -> np.ndarray:
            t = np.full(nu, INF)
            m = mask & (ts > after[codes])
            np.minimum.at(t, codes[m], ts[m])
            return t

        t1 = step_min(et == FUNNEL_STEPS[0], np.full(nu, -INF))
        t2 = step_min(et == FUNNEL_STEPS[1], t1)
        t3 = step_min(et == FUNNEL_STEPS[2], t2)
        return pa.table({
            "step_view": pa.array([int((t1 < INF).sum())]),
            "step_click": pa.array([int((t2 < INF).sum())]),
            "step_purchase": pa.array([int((t3 < INF).sum())])})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("b").map_groups(fold, batch_format="pyarrow")
               .to_pandas())
    return pd.DataFrame({
        "step_view": [int(parts["step_view"].sum())],
        "step_click": [int(parts["step_click"].sum())],
        "step_purchase": [int(parts["step_purchase"].sum())]})


SQL["funnel_steps"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS step_view,
       (SELECT count(*) FROM c) AS step_click,
       (SELECT count(*) FROM p) AS step_purchase
"""


def retention_hourly(sf_dir: str):
    """Hour-over-hour retention: for every hour h, how many users active
    in h were also active in h+1. Distinct (user, hour) pairs co-locate
    under a user-hash bucket (one shuffle), consecutive-hour pairs are a
    vectorized diff inside the bucket, and the final per-hour aggregate is
    bounded by the time range."""
    import numpy as np

    ds = tbl(sf_dir, "events", ["user_id", "ts"])
    nb = buckets_for_table(sf_dir, "events", ["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        # unit-safe hour id: parquet timestamps may arrive as ns OR us
        h = (batch["ts"].to_numpy().astype("datetime64[s]")
             .astype(np.int64) // 3600)
        t = pa.table({"user_id": batch["user_id"], "h": pa.array(h)})
        # per-batch (user, hour) dedup shrinks the shuffle; the bucket fold
        # re-dedups globally
        t = t.group_by(["user_id", "h"]).aggregate([])
        key = t["user_id"].to_numpy() % nb
        return t.append_column("b", pa.array(key))

    def fold(g: pa.Table) -> pa.Table:
        # Arrow/numpy: global (user, hour) dedup + consecutive-hour diff
        # in one sorted pass (round-4, no pandas per bucket)
        empty = pa.table({"hour_id": pa.array([], type=pa.int64()),
                          "retained": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy()
        h = g["h"].to_numpy()
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        u, h = u[keep], h[keep]
        consec = (u[1:] == u[:-1]) & (h[1:] == h[:-1] + 1)
        first = h[:-1][consec]
        if first.size == 0:
            return empty
        hours, counts = np.unique(first, return_counts=True)
        return pa.table({"hour_id": pa.array(hours),
                         "retained": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum
    out = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("b").map_groups(fold, batch_format="pyarrow")
             .groupby("hour_id")
             .aggregate(Sum("retained", alias_name="retained"))
             .to_pandas())
    out["hour_id"] = out["hour_id"].astype("int64")
    out["retained"] = out["retained"].astype("int64")
    return out.sort_values("hour_id").reset_index(drop=True)


SQL["retention_hourly"] = """
WITH a AS (
  -- date_trunc, not epoch(ts)::BIGINT: the cast ROUNDS fractional
  -- seconds, pushing hh:59:59.5+ events into the next hour
  SELECT DISTINCT user_id,
         (epoch(date_trunc('hour', ts))::BIGINT // 3600) AS h FROM events)
SELECT a.h AS hour_id, count(*) AS retained
FROM a JOIN a b ON a.user_id = b.user_id AND b.h = a.h + 1
GROUP BY a.h ORDER BY hour_id
"""
