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


# ---------------------------------------------------------------------------
# funnel analysis (ordered step conversion — product-analytics shape)
# ---------------------------------------------------------------------------

#: funnel step sequence: a user converts step i+1 only with an event of
#: that type STRICTLY AFTER their first qualifying step-i event (the
#: "first-touch" funnel; ordering key = (ts, event_id))
FUNNEL_STEPS = ("view", "click", "purchase")

#: per-step conversion window: the step-(i+1) event must also land
#: within this many seconds of the first step-i event (clock restarts
#: at each step) — without it every user of a long-lived stream
#: eventually converts and the funnel is vacuous
FUNNEL_WINDOW_S = 86_400


def funnel_counts(
    sf_dir: str, steps=FUNNEL_STEPS, window_s: int = FUNNEL_WINDOW_S
) -> pd.DataFrame:
    """Ordered funnel over the event stream: how many users reach each
    step, where step i+1 counts only events strictly after — and within
    ``window_s`` seconds of — the user's first qualifying step-i event.
    The sequence-within-window constraint is what windowed counts can't
    express — the classic product-analytics operator the reference has
    no analog for.

    Per-user event order resolves inside ``groupby(user_id).map_groups``
    (the sessionize shape: one hash shuffle on user_id, vectorized
    in-group), emitting one boolean row per user; the step reduction is
    a 3-number driver sum.  Output: (step, event_type, n_users,
    conv_rate) with conv_rate = step / previous step (step 1 converts
    from the distinct-user total).  Gate ``funnel_counts``; oracle
    :data:`FUNNEL_COUNTS_SQL` (rank-over-(ts,event_id) positional
    chain)."""

    win_us = int(window_s) * 1_000_000

    def reach(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        types = g["event_type"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        reached = np.zeros(len(steps), bool)
        pos = -1  # index of the first qualifying event of the prior step
        for i, step in enumerate(steps):
            cand = np.flatnonzero(types[pos + 1 :] == step)
            if i > 0 and len(cand):  # step clock: within window of step i-1
                cand = cand[ts_us[pos + 1 + cand] <= ts_us[pos] + win_us]
            if not len(cand):
                break
            pos = pos + 1 + cand[0]
            reached[i] = True
        return pd.DataFrame(
            {
                "user_id": [np.int64(group["user_id"].iloc[0])],
                **{f"r{i}": [reached[i]] for i in range(len(steps))},
            }
        )

    flags = (
        _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(reach, batch_format="pandas")
        .to_pandas()
    )
    from .analysis import round_half_up

    n_total = len(flags)
    prev = n_total
    rows = []
    for i, step in enumerate(steps):
        n = int(flags[f"r{i}"].sum())
        rows.append(
            {
                "step": np.int32(i + 1),
                "event_type": step,
                "n_users": np.int64(n),
                "conv_rate": round_half_up(n / prev if prev else 0.0, 6),
            }
        )
        prev = n
    return pd.DataFrame(rows)


def _funnel_sql(steps=FUNNEL_STEPS, window_s: int = FUNNEL_WINDOW_S) -> str:
    win_us = int(window_s) * 1_000_000
    chain = [
        "r AS (SELECT user_id, event_type, epoch_us(ts) AS s, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events)",
        "tot AS (SELECT count(DISTINCT user_id) AS n FROM events)",
        f"s1 AS (SELECT user_id, min(rn) AS r, min(s) AS t FROM r "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)",
    ]
    for i, step in enumerate(steps[1:], start=2):
        # ts is monotone in rn, so min(rn) and min(s) of the qualifying
        # set name the same event
        chain.append(
            f"s{i} AS (SELECT r.user_id, min(r.rn) AS r, min(r.s) AS t FROM r "
            f"JOIN s{i - 1} p ON p.user_id = r.user_id "
            f"WHERE r.event_type = '{step}' AND r.rn > p.r "
            f"AND r.s <= p.t + {win_us} GROUP BY r.user_id)"
        )
    selects = [
        f"SELECT CAST(1 AS INTEGER) AS step, '{steps[0]}' AS event_type, "
        f"CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users, "
        f"round((SELECT count(*) FROM s1) * 1.0 / nullif((SELECT n FROM tot), 0), 6) AS conv_rate"
    ]
    for i, step in enumerate(steps[1:], start=2):
        selects.append(
            f"SELECT CAST({i} AS INTEGER), '{step}', "
            f"CAST((SELECT count(*) FROM s{i}) AS BIGINT), "
            f"round((SELECT count(*) FROM s{i}) * 1.0 / "
            f"nullif((SELECT count(*) FROM s{i - 1}), 0), 6)"
        )
    return (
        "WITH " + ",\n".join(chain) + "\nSELECT * FROM (\n"
        + "\nUNION ALL ".join(selects) + "\n) ORDER BY step"
    )


FUNNEL_COUNTS_SQL = _funnel_sql()


# ---------------------------------------------------------------------------
# cohort retention (first-seen-day cohorts x active-day offsets)
# ---------------------------------------------------------------------------

#: retention horizon: day offsets 0..RETENTION_DAYS-1 are reported
RETENTION_DAYS = 7
_DAY_US = 86_400_000_000


def cohort_retention(sf_dir: str, days: int = RETENTION_DAYS) -> pd.DataFrame:
    """Cohort retention over the event stream: users cohort by the UTC
    day of their first event; retention at offset d = the fraction of
    the cohort active (>=1 event) on cohort day + d.  The
    product-analytics companion of :func:`funnel_counts`.

    One user-keyed shuffle (``groupby.map_groups``, the sessionize
    shape) emits each user's distinct active-day offsets within the
    horizon; the (cohort, offset) reduction is output-sized (days x
    horizon).  The full grid is emitted (zero-activity cells included)
    so the result is schema-stable.  Offset 0 is always active by
    construction (the first event itself), so cohort size ==
    n_active(0) and retention(0) == 1.  Output: (cohort_day epoch-day
    BIGINT, day_offset, n_active, retention).  Gate
    ``cohort_retention``; oracle :data:`COHORT_RETENTION_SQL`."""

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        d = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // _DAY_US
        c = int(d.min())
        off = np.unique(d - c)
        off = off[(off >= 0) & (off < days)]
        return pd.DataFrame(
            {
                "cday": np.full(len(off), c, np.int64),
                "off": off.astype(np.int64),
            }
        )

    pdf = (
        _events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    from .analysis import round_half_up

    counts = pdf.groupby(["cday", "off"]).size()
    sizes = pdf[pdf["off"] == 0].groupby("cday").size()
    rows = []
    for cday, sz in sizes.sort_index().items():
        for off in range(days):
            n = int(counts.get((cday, off), 0))
            rows.append(
                {
                    "cohort_day": np.int64(cday),
                    "day_offset": np.int32(off),
                    "n_active": np.int64(n),
                    "retention": round_half_up(n / sz, 6),
                }
            )
    return pd.DataFrame(rows)


COHORT_RETENTION_SQL = f"""
WITH f AS (
  SELECT user_id, min(epoch_us(ts) // {_DAY_US}) AS cday FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT e.user_id, f.cday,
         epoch_us(e.ts) // {_DAY_US} - f.cday AS off
  FROM events e JOIN f USING (user_id)
),
counts AS (
  SELECT cday, off, count(*) AS n FROM a
  WHERE off BETWEEN 0 AND {RETENTION_DAYS - 1} GROUP BY cday, off
),
sizes AS (SELECT cday, count(*) AS sz FROM f GROUP BY cday),
grid AS (
  SELECT s.cday, g.off, s.sz
  FROM sizes s CROSS JOIN (SELECT unnest(range({RETENTION_DAYS})) AS off) g
)
SELECT CAST(g.cday AS BIGINT) AS cohort_day,
       CAST(g.off AS INTEGER) AS day_offset,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_active,
       round(coalesce(c.n, 0) * 1.0 / g.sz, 6) AS retention
FROM grid g LEFT JOIN counts c ON c.cday = g.cday AND c.off = g.off
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# numeric histogram (the ES histogram aggregation — fixed-interval
# buckets over a value column, the numeric dual of window_agg's
# date_histogram)
# ---------------------------------------------------------------------------

#: fixed bucket width over events.value (domain ~0..500 at test scale)
HIST_INTERVAL = 25.0


def value_histogram(sf_dir: str):
    """Fixed-interval numeric histogram over ``events.value``: bucket
    key ``floor(value / interval) * interval``, per-bucket count and
    value sum.  Same partial shape as :func:`window_agg` — per-batch
    Arrow ``group_by`` partials over the bounded bucket domain, then one
    tiny groupby; the shuffle moves at most
    ``n_buckets x n_blocks`` rows at any corpus size.  Gate
    ``value_histogram``; oracle :data:`VALUE_HISTOGRAM_SQL`.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / HIST_INTERVAL) * HIST_INTERVAL
        t = pa.table({"bucket": pa.array(b), "value": batch["value"]})
        return t.group_by(["bucket"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )

    out = (
        _events(sf_dir, ["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("count_all", alias_name="n_events"),
        )
    )
    pdf = out.to_pandas().sort_values("bucket").reset_index(drop=True)
    pdf["sum_value"] = round_half_up(pdf["sum_value"].to_numpy(), ROUND)
    return pdf[["bucket", "n_events", "sum_value"]]


VALUE_HISTOGRAM_SQL = f"""
SELECT floor(value / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {ROUND}) AS sum_value
FROM events
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# rollup (ES rollup-job analog: persisted pre-aggregation, query from it)
# ---------------------------------------------------------------------------


def _rollup_dir(sf_dir: str) -> str:
    """Deterministic rollup location keyed by the source file identity
    (path + size + mtime) — a changed events table gets a fresh rollup."""
    from .analysis import md5int60

    p = os.path.join(sf_dir, "events.parquet")
    st = os.stat(p)
    # mtime at ns resolution: a same-size rewrite within the same
    # second must NOT reuse the stale rollup.  Dir name = stable
    # source-path key + content key, so a rebuilt fixture's stale
    # rollup can be evicted without touching other corpora's caches.
    pathkey = md5int60(os.path.abspath(p))
    key = md5int60(f"{os.path.abspath(p)}|{st.st_size}|{st.st_mtime_ns}")
    return os.path.join(
        "/tmp", "raystorm_rollup", f"r{pathkey & 0xFFFFFFFF:08x}-{key:015x}"
    )


def rollup_events(sf_dir: str) -> str:
    """Build (once) the persisted HOURLY rollup of ``events``: per
    (hour, event_type) count / sum / min / max, written as hash-sharded
    resumable parquet (:func:`sinks.write_partitioned` — completed
    shards skip on rerun, the crawler resume-by-key discipline).  This
    is the ES rollup job / continuous-transform shape: the raw stream
    is aggregated ONCE near ingest; every later report reads rollup
    rows (|hours × types|), not raw events — the only layout where
    dashboard queries stay sub-second when the raw table is 100 TB.
    Returns the rollup directory."""
    out_dir = _rollup_dir(sf_dir)
    done = os.path.join(out_dir, "_rollup_manifest.json")
    if os.path.isfile(done):
        return out_dir
    # building fresh: drop this source's STALE rollups (prefix shares
    # the path key, not the content key) so rebuilt fixtures don't
    # leak a rollup copy into /tmp per rebuild
    from .sinks import evict_fingerprint_siblings

    base = os.path.basename(out_dir)
    evict_fingerprint_siblings(
        os.path.dirname(out_dir), base[: base.index("-") + 1], out_dir
    )
    _write_rollup(
        _events(sf_dir, ["ts", "event_type", "value"]), out_dir, source=sf_dir
    )
    return out_dir


#: canonical rollup row layout (readers, writers and the append merge
#: all project through it so unions line up)
_ROLLUP_COLS = ["hour", "event_type", "n_events", "sum_value", "min_value", "max_value"]


def _hourly_partials(ds):
    """events Dataset -> UNcombined per-batch hourly partial rows in
    :data:`_ROLLUP_COLS` order (mergeable: additive n_events/sum_value,
    idempotent min/max) — the shuffle-free half of the rollup, unioned
    directly into the append merge so a delta pays ONE combine, not
    two."""

    _RENAME = {
        "value_sum": "sum_value",
        "value_min": "min_value",
        "value_max": "max_value",
        "count_all": "n_events",
    }

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]").astype("datetime64[us]")
        t = pa.table(
            {
                "hour": pa.array(hour),
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        t = t.group_by(["hour", "event_type"]).aggregate(
            [("value", "sum"), ("value", "min"), ("value", "max"), ([], "count_all")]
        )
        t = t.rename_columns([_RENAME.get(c, c) for c in t.column_names])
        return t.select(_ROLLUP_COLS)

    return ds.map_batches(partial, batch_format="pyarrow")


def _rollup_combine(ds):
    """(hour, event_type)-keyed combine over _ROLLUP_COLS partial rows."""
    from ray.data.aggregate import Max, Min, Sum

    def project(b: pa.Table) -> pa.Table:
        return b.select(_ROLLUP_COLS)

    return (
        ds.groupby(["hour", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
        .map_batches(project, batch_format="pyarrow")
    )


def _hourly_rollup(ds):
    """events Dataset -> aggregated hourly rollup Dataset in
    :data:`_ROLLUP_COLS` order (per-batch Arrow partials, one combine
    shuffle)."""
    return _rollup_combine(_hourly_partials(ds))


def _write_rollup(ds, out_dir: str, source: str, generation: int = 0) -> None:
    """Aggregate ``ds`` hourly and persist as resumable shards +
    rollup manifest."""
    import json

    from . import sinks

    sinks.write_partitioned(
        _hourly_rollup(ds),
        out_dir,
        key_column="event_type",
        num_shards=4,
        fingerprint=f"{os.path.basename(out_dir)}|g{generation}",
    )
    with open(os.path.join(out_dir, "_rollup_manifest.json"), "w") as f:
        json.dump({"source": source, "grain": "hour", "generation": generation}, f)


_PENDING = "_pending_append"

#: how many applied delta_ids the rollup manifest remembers (rolling
#: window).  Retries normally arrive within the SAME cron cycle or the
#: next — thousands of batches beyond any realistic retry horizon — so
#: the window is a deliberate, documented bound (the no-silent-caps
#: rule): a delta retried after >APPLIED_DELTA_MEMORY newer appends is
#: indistinguishable from a new delta and would re-apply.
APPLIED_DELTA_MEMORY = 4096


def _apply_staged(out_dir: str) -> None:
    """Roll a staged append FORWARD: rewrite shards from the staged
    merged table (idempotent — completed shards at the target
    generation skip), commit the manifest generation, drop the
    journal."""
    import json
    import shutil

    import ray.data as rd

    from . import sinks

    jdir = os.path.join(out_dir, _PENDING)
    j = json.load(open(os.path.join(jdir, "journal.json")))
    staged = rd.read_parquet(
        os.path.join(jdir, "merged.parquet"), columns=_ROLLUP_COLS
    )
    sinks.write_partitioned(
        staged,
        out_dir,
        key_column="event_type",
        num_shards=4,
        fingerprint=f"{os.path.basename(out_dir)}|g{j['generation']}",
    )
    man_path = os.path.join(out_dir, "_rollup_manifest.json")
    man = json.load(open(man_path))
    man["generation"] = j["generation"]
    if j.get("delta_id"):
        # applied-delta memory: makes a SUCCESS-then-retry of the same
        # delta a no-op in rollup_append (the journal only guards the
        # crashed-pending window).  Rolling window, loudly bounded —
        # see APPLIED_DELTA_MEMORY.
        mem = man.get("applied_deltas", [])
        mem.append(j["delta_id"])
        man["applied_deltas"] = mem[-APPLIED_DELTA_MEMORY:]
    with open(man_path, "w") as f:
        json.dump(man, f)
    shutil.rmtree(jdir)


def rollforward_pending(out_dir: str) -> bool:
    """Finish a crashed :func:`rollup_append` (intent journal present):
    the staged merged table re-applies deterministically — the
    update.py roll-FORWARD discipline, because a half-flipped shard set
    mixes generations and cannot be rolled back.  Returns True if a
    pending append was completed."""
    j = os.path.join(out_dir, _PENDING, "journal.json")
    if not os.path.isfile(j):
        return False
    _apply_staged(out_dir)
    return True


def rollup_append(out_dir: str, delta_ds, delta_id: str) -> str:
    """Merge a DELTA event stream into an existing hourly rollup — the
    continuous-transform increment (ES transform checkpoint / rollup
    job catch-up): the delta's per-batch hourly partials union with the
    stored rollup rows and ONE (hour, type) combine re-derives every
    touched bucket — count/sum are additive, min/max idempotent, so
    partially-covered hours merge losslessly.  Cost is delta-sized +
    rollup-sized, never raw-history-sized.

    Crash safety (the update.py intent-journal discipline): the merged
    table stages under ``_pending_append/`` with a journal BEFORE any
    shard rewrites; a crash mid-rewrite leaves a mixed-generation shard
    set that the journal rolls FORWARD on the next entry (re-applying
    the staged result — half-flipped shards skip at the target
    fingerprint, the rest complete).  ``delta_id`` is REQUIRED and must
    be stable across retries of the same delta (e.g. the ingest batch
    name): a pending journal carrying that id means the delta is
    already staged, so the retry finishes the roll-forward instead of
    double-applying it, and the manifest's applied-delta memory
    (:data:`APPLIED_DELTA_MEMORY` rolling window) makes even a retry
    AFTER a successful apply a no-op — at-least-once delivery (cron
    re-runs, redelivering queues) cannot double-count.  An optional id
    would silently double-count on exactly the retry path this
    protocol exists for.

    Concurrency contract: ONE appender at a time (a lost journal race
    raises instead of corrupting); readers concurrent with an in-flight
    append may see a mixed-generation shard set — serve strict readers
    from a snapshot or alias-flipped copy, the same single-writer
    discipline as the index update path.
    Pytest pins append == full rebuild and the kill-window replay."""
    import json
    import shutil
    import uuid

    import pyarrow.parquet as pq

    from . import sinks

    if not delta_id:
        raise ValueError("rollup_append requires a stable, non-empty delta_id")
    # sweep crash-orphaned staging dirs (a death between makedirs and
    # os.replace leaves an un-journaled tmp copy nothing else removes)
    for d in os.listdir(out_dir):
        if d.startswith(_PENDING + ".tmp-"):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    # a pending append first: either THIS delta (finish and return) or
    # an earlier one (complete it, then merge ours on top)
    jpath = os.path.join(out_dir, _PENDING, "journal.json")
    if os.path.isfile(jpath):
        j = json.load(open(jpath))
        same = j.get("delta_id") == delta_id
        _apply_staged(out_dir)
        if same:
            return out_dir

    man_path = os.path.join(out_dir, "_rollup_manifest.json")
    man = json.load(open(man_path))
    if delta_id in man.get("applied_deltas", []):
        # success-then-retry of the SAME delta (cron re-run, at-least-
        # once queue): already merged — a second apply would double-
        # count exactly the rows the id exists to protect
        return out_dir
    gen = int(man.get("generation", 0)) + 1
    existing = sinks.read_partitioned(out_dir, columns=_ROLLUP_COLS)
    merged = (
        _rollup_combine(existing.union(_hourly_partials(delta_ds)))
        # fully read BEFORE shards rewrite underneath
        .materialize()
    )
    # stage + journal (the commit point), then apply
    jdir = os.path.join(out_dir, _PENDING)
    tmp = jdir + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(merged.to_pandas()[_ROLLUP_COLS], preserve_index=False),
        os.path.join(tmp, "merged.parquet"),
    )
    with open(os.path.join(tmp, "journal.json"), "w") as f:
        json.dump({"generation": gen, "delta_id": delta_id}, f)
    if os.path.isdir(jdir):  # lost race with a concurrent appender
        shutil.rmtree(tmp)
        raise RuntimeError("concurrent rollup_append in flight")
    try:
        os.replace(tmp, jdir)
    except OSError as exc:  # TOCTOU loser: clean our staging, surface it
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError("concurrent rollup_append in flight") from exc
    _apply_staged(out_dir)
    return out_dir


def rollup_daily(sf_dir: str) -> pd.DataFrame:
    """Daily per-type report answered FROM THE ROLLUP ONLY (hour rows
    re-aggregate to days; count/sum/min/max compose losslessly) — raw
    events are never re-read once the rollup exists.  The oracle
    computes the identical report from RAW events, so the gate proves
    the rollup loses nothing.  Gate ``rollup_daily``."""
    out_dir = rollup_events(sf_dir)
    rollforward_pending(out_dir)  # finish any crashed append first
    return _daily_report(out_dir)


def _daily_report(out_dir: str) -> pd.DataFrame:
    """(hour, type) rollup rows -> the daily per-type report (shared by
    rollup_daily and rollup_catchup so both gates answer through the
    identical read path)."""
    from . import sinks

    # manifest-gated shard listing (never orphan tmp dirs) + pruned read
    pdf = sinks.read_partitioned(
        out_dir,
        columns=["hour", "event_type", "n_events", "sum_value", "min_value", "max_value"],
    ).to_pandas()
    pdf["day"] = pdf["hour"].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
    out = (
        pdf.groupby(["day", "event_type"], as_index=False)
        .agg(
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), ROUND)
    return out[["day", "event_type", "n_events", "sum_value", "min_value", "max_value"]]


def rollup_catchup(sf_dir: str) -> pd.DataFrame:
    """SQL-exact gate for the INCREMENTAL append path: build the hourly
    rollup from the FIRST HALF of the raw events, :func:`rollup_append`
    the second half as a delta, then answer the daily report from the
    merged rollup — the oracle (:data:`ROLLUP_DAILY_SQL`) computes the
    same report from ALL raw events, so the gate proves
    build-then-catch-up loses nothing vs a full rebuild (the round-4
    verdict's stretch #8; the append==rebuild pytest pins bytes, this
    pins the driver's rows+schema+hash contract).

    The half/half split is GATE-ONLY plumbing (a real catch-up receives
    its delta as a stream); the driver-side slice is bounded by the sf
    fixture, never a production corpus.  The rollup dir is
    fingerprinted on source identity with a completion marker:
    re-running the gate reuses the merged rollup (rollup_append is NOT
    idempotent after its journal clears, so the marker — not the append
    — is the replay guard), while a regenerated fixture rebuilds fresh
    and evicts its stale copy."""
    import json as _json

    import pyarrow.parquet as _pq
    import ray.data as rd

    from .analysis import md5int60
    from .sinks import evict_fingerprint_siblings

    p = os.path.join(sf_dir, "events.parquet")
    st = os.stat(p)
    pathkey = md5int60(os.path.abspath(p))
    key = md5int60(f"catchup|{os.path.abspath(p)}|{st.st_size}|{st.st_mtime_ns}")
    out_dir = os.path.join(
        "/tmp", "raystorm_rollup", f"c{pathkey & 0xFFFFFFFF:08x}-{key:015x}"
    )
    done = os.path.join(out_dir, "_catchup_done.json")
    if not os.path.isfile(done):
        base = os.path.basename(out_dir)
        evict_fingerprint_siblings(
            os.path.dirname(out_dir), base[: base.index("-") + 1], out_dir
        )
        tbl = _pq.read_table(p, columns=["ts", "event_type", "value"])
        half = tbl.num_rows // 2
        _write_rollup(rd.from_arrow(tbl.slice(0, half)), out_dir, source=sf_dir)
        rollup_append(
            out_dir, rd.from_arrow(tbl.slice(half)), delta_id=f"catchup-{key:015x}"
        )
        with open(done, "w") as f:
            _json.dump({"rows": tbl.num_rows, "base_rows": half}, f)
    return _daily_report(out_dir)


#: moving-average window (hours) for the trend report
TREND_WINDOW = 7


def rollup_trends(sf_dir: str) -> pd.DataFrame:
    """ES pipeline-aggregation analog (``moving_fn`` + ``derivative``)
    answered FROM THE ROLLUP: per event type, hourly event count, its
    :data:`TREND_WINDOW`-hour trailing moving average, and the delta vs
    the previous PRESENT hour (first hour's delta = 0 — both engines
    use ``coalesce(lag, current)`` so no NULL crosses the hash gate).
    Hours with zero events have no rollup row and are absent from the
    window on BOTH sides (ES ``min_doc_count=1`` semantics).  The
    windowing runs on the (hours × types)-bounded rollup table — the
    raw stream is never re-read.  Gate ``rollup_trends``; oracle
    :data:`ROLLUP_TRENDS_SQL` recomputes from raw events."""
    out_dir = rollup_events(sf_dir)
    rollforward_pending(out_dir)
    from . import sinks

    pdf = sinks.read_partitioned(
        out_dir, columns=["hour", "event_type", "n_events"]
    ).to_pandas()
    pdf = pdf.sort_values(["event_type", "hour"]).reset_index(drop=True)
    g = pdf.groupby("event_type", sort=False)["n_events"]
    ma = g.rolling(TREND_WINDOW, min_periods=1).mean().reset_index(drop=True)
    prev = g.shift(1)
    delta = (pdf["n_events"] - prev.fillna(pdf["n_events"])).astype(np.int64)
    return pd.DataFrame(
        {
            "hour": pdf["hour"],
            "event_type": pdf["event_type"],
            "n_events": pdf["n_events"].astype(np.int64),
            "ma": round_half_up(ma.to_numpy(np.float64), ROUND),
            "delta": delta,
        }
    )


ROLLUP_TRENDS_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n_events,
       round(avg(n_events) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN {TREND_WINDOW - 1} PRECEDING AND CURRENT ROW), {ROUND}) AS ma,
       n_events - coalesce(lag(n_events) OVER (
         PARTITION BY event_type ORDER BY hour), n_events) AS delta
FROM hourly
ORDER BY event_type, hour
"""


ROLLUP_DAILY_SQL = f"""
SELECT date_trunc('day', ts) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {ROUND}) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY day, event_type
"""
