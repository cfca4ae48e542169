"""Windowed aggregation + sessionization over the ``events`` stream table.

The reference has no streaming operators (SURVEY.md §2.2 "Streaming-only
features: None"), but the task brief asks for the windowed-aggregate /
stateful-window family a training-data pipeline needs.  Both operators
follow the (a)-composition from the brief: ``map_batches`` (derive the
window / partition key) + ``groupby`` + per-batch partial combine or
``map_groups`` — no raw actors needed, and the partitioning assumption
is documented per op.

Partitioning assumptions:

- ``window_agg``: tumbling windows are independent — any row order
  works; per-batch partial aggregation bounds the shuffle to
  |windows x types| x blocks rows.
- ``sessionize``: all events of one ``user_id`` must meet in one group
  (hash partition by user); inside the group events are sorted by
  ``ts`` — the stateful gap-split runs per group, vectorized.  Skewed
  power-users would need per-user time-range salting + a merge pass;
  the sf tables have no such skew.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .analysis import round_half_up

ROUND = 2
SESSION_GAP_MIN = 30


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def window_agg(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + sum(value).

    Window key derived vectorized (timestamp floor to hour); per-batch
    Arrow ``group_by`` partials, then one small shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]").astype("datetime64[us]")
        t = pa.table(
            {
                "window_start": pa.array(hour),
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        return t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )

    out = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("count_all", alias_name="n_events"),
        )
    )
    pdf = out.to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    pdf["sum_value"] = round_half_up(pdf["sum_value"].to_numpy(), ROUND)
    return pdf


WINDOW_AGG_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       round(sum(value), {ROUND}) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""


def sessionize(sf_dir: str):
    """Split each user's event stream into sessions at >30-minute gaps.

    Output: one row per session (user_id, session_idx, n_events,
    start_s, end_s) with epoch-second bounds.  groupby(user_id) ->
    vectorized gap-split inside ``map_groups``.
    """

    def split(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
        gap = np.diff(ts, prepend=ts[0]) > SESSION_GAP_MIN * 60
        sess = np.cumsum(gap)
        n = sess[-1] + 1 if len(sess) else 0
        counts = np.bincount(sess, minlength=n)
        first = np.searchsorted(sess, np.arange(n))
        last = np.append(first[1:], len(ts)) - 1
        return pd.DataFrame(
            {
                "user_id": np.full(n, int(group["user_id"].iloc[0]), np.int64),
                "session_idx": np.arange(n, dtype=np.int64),
                "n_events": counts.astype(np.int64),
                "start_s": ts[first],
                "end_s": ts[last],
            }
        )

    out = (
        _events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(split, batch_format="pandas")
    )
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )


SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
  FROM events
),
flagged AS (
  SELECT user_id, s,
         CASE WHEN prev_s IS NULL OR s - prev_s > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sessions AS (
  SELECT user_id, s,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY s
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(s) AS start_s, max(s) AS end_s
FROM sessions
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# as-of join (brief: "an operator Ray Data lacks — as-of join, range
# join": composition (a) — map_batches + groupby(user).map_groups with
# an in-group ordered merge)
# ---------------------------------------------------------------------------

ASOF_MARK = "click"


def asof_last_click(sf_dir: str):
    """For every event: the event_id/ts of the same user's most recent
    *strictly prior* '{ASOF_MARK}' event (NULL if none).

    Partitioning assumption: all rows of one user meet in one group
    (hash partition by user_id); within the group the as-of lookup is a
    vectorized backward search over the time-sorted marker rows.  Time-
    range bucketing + boundary exchange would replace the per-user group
    at 100 TB if single users outgrew a task.
    """

    def asof(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        eid = g["event_id"].to_numpy()
        is_mark = (g["event_type"] == ASOF_MARK).to_numpy()
        mark_pos = np.nonzero(is_mark)[0]
        # index of the latest marker strictly before each row (row order
        # == (ts, event_id) order, so "prior" = earlier position)
        idx = np.searchsorted(mark_pos, np.arange(len(g)), side="left") - 1
        has = idx >= 0
        last_id = np.full(len(g), -1, np.int64)
        last_s = np.full(len(g), -1, np.int64)
        last_id[has] = eid[mark_pos[idx[has]]]
        last_s[has] = s[mark_pos[idx[has]]]
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": np.full(len(g), int(group["user_id"].iloc[0]), np.int64),
                "event_type": g["event_type"],
                "last_click_id": last_id,
                "last_click_s": last_s,
            }
        )

    out = (
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(asof, batch_format="pandas")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


ASOF_LAST_CLICK_SQL = f"""
WITH ordered AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
marked AS (
  SELECT *,
         max(CASE WHEN event_type = '{ASOF_MARK}' THEN rn END)
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mark_rn
  FROM ordered
)
SELECT m.event_id, m.user_id, m.event_type,
       coalesce(o.event_id, -1) AS last_click_id,
       coalesce(o.s, -1) AS last_click_s
FROM marked m
LEFT JOIN ordered o ON o.user_id = m.user_id AND o.rn = m.mark_rn
ORDER BY m.event_id
"""


# ---------------------------------------------------------------------------
# range join (brief: "an operator Ray Data lacks — as-of join, range
# join": same composition — groupby(user).map_groups with a vectorized
# interval search inside the group)
# ---------------------------------------------------------------------------

RANGE_MARK = "purchase"
RANGE_REF = "error"
RANGE_WINDOW_MIN = 10


def range_join_errors(sf_dir: str):
    """For every '{RANGE_MARK}' event: how many '{RANGE_REF}' events the
    same user had in the strict interval [ts - 10 min, ts), plus the
    latest such event's id (-1 if none) — a banded time-range join.

    Partitioning assumption: per-user groups (hash partition on
    user_id), like ``asof_last_click``; inside the group the interval
    membership is two vectorized ``searchsorted`` probes over the
    time-sorted reference rows.  All timestamp math is integer
    microseconds on both engines — no fractional-epoch drift.
    """

    def rjoin(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        is_ref = (g["event_type"] == RANGE_REF).to_numpy()
        ref_pos = np.nonzero(is_ref)[0]
        ref_us = us[ref_pos]
        is_mark = (g["event_type"] == RANGE_MARK).to_numpy()
        mp = np.nonzero(is_mark)[0]
        lo = np.searchsorted(ref_us, us[mp] - RANGE_WINDOW_MIN * 60_000_000, "left")
        hi = np.searchsorted(ref_us, us[mp], "left")  # strict: ref.ts < mark.ts
        n = (hi - lo).astype(np.int64)
        last = np.full(len(mp), -1, np.int64)
        has = hi > lo
        # latest ref in-window: max event_id among ties on the max ts is
        # not needed — ref rows are (ts, event_id)-sorted, so hi-1 is it
        last[has] = eid[ref_pos[hi[has] - 1]]
        return pd.DataFrame(
            {
                "event_id": eid[mp],
                "user_id": np.full(len(mp), int(group["user_id"].iloc[0]), np.int64),
                "n_errors_10m": n,
                "last_error_id": last,
            }
        )

    out = (
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(rjoin, batch_format="pandas")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


RANGE_JOIN_ERRORS_SQL = f"""
WITH marks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{RANGE_MARK}'
),
refs AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{RANGE_REF}'
),
pairs AS (
  SELECT m.event_id, m.user_id, r.event_id AS rid, r.ts AS rts
  FROM marks m JOIN refs r
    ON r.user_id = m.user_id
   AND r.ts >= m.ts - INTERVAL '{RANGE_WINDOW_MIN} minutes'
   AND r.ts < m.ts
),
latest AS (
  SELECT event_id, rid FROM (
    SELECT event_id, rid,
           row_number() OVER (PARTITION BY event_id ORDER BY rts DESC, rid DESC) AS rn
    FROM pairs
  ) WHERE rn = 1
),
counts AS (
  SELECT event_id, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY event_id
)
SELECT m.event_id, m.user_id,
       coalesce(c.n, 0) AS n_errors_10m,
       coalesce(l.rid, -1) AS last_error_id
FROM marks m
LEFT JOIN counts c USING (event_id)
LEFT JOIN latest l USING (event_id)
ORDER BY m.event_id
"""


# ---------------------------------------------------------------------------
# sliding (hopping) window aggregate — each event lands in
# WINDOW_MIN/HOP_MIN windows; the tumbling window_agg above is the
# degenerate hop == size case
# ---------------------------------------------------------------------------

SLIDE_SIZE_MIN = 60
SLIDE_HOP_MIN = 30


def window_sliding(sf_dir: str):
    """1-hour windows hopping every 30 min, per event_type: count +
    sum(value).  Each event explodes into size/hop window keys inside
    ``map_batches`` (vectorized floor arithmetic), then the same
    partial-combine + small groupby as the tumbling variant — shuffle
    volume is windows x types x blocks, not events."""
    from ray.data.aggregate import Sum

    n_wins = SLIDE_SIZE_MIN // SLIDE_HOP_MIN
    hop_us = SLIDE_HOP_MIN * 60_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = (us // hop_us) * hop_us  # latest window start containing ts
        starts = base[None, :] - hop_us * np.arange(n_wins)[:, None]
        t = pa.table(
            {
                "window_start": pa.array(
                    starts.reshape(-1).astype("datetime64[us]")
                ),
                "event_type": pa.concat_arrays(
                    [batch["event_type"].combine_chunks()] * n_wins
                ),
                "value": pa.concat_arrays(
                    [batch["value"].combine_chunks()] * n_wins
                ),
            }
        )
        return t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )

    out = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("count_all", alias_name="n_events"),
        )
    )
    pdf = out.to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    pdf["sum_value"] = round_half_up(pdf["sum_value"].to_numpy(), ROUND)
    return pdf


WINDOW_SLIDING_SQL = f"""
WITH hops AS (SELECT unnest(generate_series(0, {SLIDE_SIZE_MIN // SLIDE_HOP_MIN - 1})) AS k),
exploded AS (
  SELECT make_timestamp((epoch_us(e.ts) // {SLIDE_HOP_MIN * 60_000_000} - h.k)
                        * {SLIDE_HOP_MIN * 60_000_000}) AS window_start,
         e.event_type, e.value
  FROM events e CROSS JOIN hops h
)
SELECT window_start, event_type,
       round(sum(value), {ROUND}) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM exploded
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# semi-structured column extraction (the events.props JSON strings) —
# regex-extract a field vectorized (RE2 kernel), bucket, aggregate
# ---------------------------------------------------------------------------

PROPS_BUCKET = 10


def props_agg(sf_dir: str):
    """Parse ``props`` JSON strings (regex-extracted 'k' field), bucket
    k by 10, and aggregate count + sum(value) per (event_type, bucket).

    The extraction is one RE2 kernel call per batch
    (``pc.extract_regex``) — the semi-structured-parsing shape where the
    JSON stays a string column and only the needed field leaves it.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)')
        k = pc.struct_field(m, "k").cast(pa.string()).cast(pa.int64())
        karr = k.to_numpy(zero_copy_only=False)
        bucket = (karr // PROPS_BUCKET) * PROPS_BUCKET
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k_bucket": pa.array(bucket, pa.int64()),
                "value": batch["value"],
            }
        )
        return t.group_by(["event_type", "k_bucket"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )

    out = (
        _events(sf_dir, ["event_type", "value", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("count_all", alias_name="n_events"),
        )
    )
    pdf = out.to_pandas().sort_values(["event_type", "k_bucket"]).reset_index(drop=True)
    pdf["sum_value"] = round_half_up(pdf["sum_value"].to_numpy(), ROUND)
    return pdf


PROPS_AGG_SQL = f"""
SELECT event_type,
       (CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) // {PROPS_BUCKET}) * {PROPS_BUCKET} AS k_bucket,
       round(sum(value), {ROUND}) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, (CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) // {PROPS_BUCKET}) * {PROPS_BUCKET}
ORDER BY event_type, k_bucket
"""


# ---------------------------------------------------------------------------
# regex scrub (PII-style redaction over the semi-structured props column)
# ---------------------------------------------------------------------------

#: digit-run scrub — the synthetic stand-in for PII patterns (emails,
#: phone numbers); both sides are RE2 (Arrow and DuckDB), so the
#: pattern language is identical by construction.
REDACT_PATTERN = "[0-9]+"
REDACT_WITH = "#"


def redact_props(sf_dir: str):
    """Redact digit runs in ``props`` — the regex-scrub primitive a
    training-data pipeline runs for PII removal.  Stateless one-pass
    ``map_batches`` over the pruned two-column read; the regex kernel
    is Arrow's RE2 ``replace_substring_regex`` (global, like the SQL
    mirror's ``'g'`` flag)."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(
            batch["props"], pattern=REDACT_PATTERN, replacement=REDACT_WITH
        )
        return pa.table({"event_id": batch["event_id"], "props_redacted": red})

    return (
        _events(sf_dir, ["event_id", "props"])
        .map_batches(scrub, batch_format="pyarrow")
        .sort("event_id")
        .to_pandas()
    )


REDACT_PROPS_SQL = f"""
SELECT event_id, regexp_replace(props, '{REDACT_PATTERN}', '{REDACT_WITH}', 'g') AS props_redacted
FROM events ORDER BY event_id
"""
