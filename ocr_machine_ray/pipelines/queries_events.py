"""Event-log analytics: ordered funnels, cohort retention, per-key rolling
windows — the window-function family a training-data/telemetry pipeline
runs over its ingestion event stream (reference analog: the run-report
aggregations of SURVEY.md §2.5 A5/A6 generalized to ordered per-key
analytics; the reference's pipeline_metrics.py only ever needed unordered
counters because its engine could not express per-key ordering).

Scale notes common to the family:
- Events are consumed once with column pruning; every per-user computation
  rides ONE hash shuffle on the user BUCKET (``user_id >> 8`` — all of a
  user's rows share a bucket), the same partitioning key reused across
  this family. Group size is bounded by ~256 users' activity, never by
  corpus size, and the per-group pandas dispatch (~0.6-3 ms each,
  BASELINE.md) amortizes across the bucket's vectorized segmented kernels.
- map_groups emits one tiny block per group; any stage feeding a later
  all-to-all repartitions first (tiny-block shuffle tax, BASELINE.md).
- Aggregate keys are packed into a single int64 (multi-key groupby is
  pathologically slow on many small blocks in ray 2.49 — BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import query
from .extraction import parquet_num_rows


def _read(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# per-user map_groups dispatches the UDF once PER GROUP (~0.6-3 ms of
# pandas overhead each — BASELINE.md); every per-user computation in this
# family therefore groups on a USER BUCKET (user_id >> 8, ~256 users per
# group) and vectorizes across users inside the bucket with segmented
# np.*.reduceat / cumsum kernels over rows sorted by user. Bucketing on a
# user_id prefix preserves the groupby contract — all of a user's rows
# land in exactly one group.
_USER_BUCKET_BITS = 8


def _cents(arr: np.ndarray) -> np.ndarray:
    scaled = np.asarray(arr, dtype=np.float64) * 100.0
    return np.where(
        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase with strict min-ts-after
# semantics (stage k+1 counts only events strictly after the user's
# earliest stage-k completion). The event stream is filtered to the three
# funnel types AT THE SCAN, so the one user_id shuffle moves only funnel
# events; per-user stage resolution is a vectorized three-min scan.
# ---------------------------------------------------------------------------
_FUNNEL_STAGES = ("view", "click", "purchase")

_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
       CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3
"""


@query("funnel_counts", _FUNNEL_SQL)
def q_funnel_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    def keep_funnel(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch["event_type"], value_set=pa.array(_FUNNEL_STAGES)
        )
        t = batch.filter(mask)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_ub", pa.array(uid >> _USER_BUCKET_BITS))

    def bucket_stages(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 users' funnel events per group: segmented three-min scan —
        # per-user stage-k min-ts is np.minimum.reduceat over rows sorted
        # by user, with the stage-(k-1) min broadcast back per row as the
        # strictly-after gate. HUGE marks "stage not reached"; ts > HUGE
        # is never true, so missing earlier stages propagate for free.
        uid = g["user_id"].to_numpy().astype(np.int64)
        order = np.argsort(uid, kind="mergesort")
        uid = uid[order]
        ts = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
        )
        et = g["event_type"].to_numpy()[order]
        change = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        HUGE = np.iinfo(np.int64).max
        t_prev: np.ndarray | None = None
        n_reached = []
        for name in _FUNNEL_STAGES:
            m = et == name
            if t_prev is not None:
                m &= ts > t_prev[seg]
            t_k = np.minimum.reduceat(np.where(m, ts, HUGE), starts)
            n_reached.append(int((t_k < HUGE).sum()))
            t_prev = t_k
        return pd.DataFrame(
            {
                "stage": np.array([1, 2, 3], dtype=np.int64),
                "n": np.array(n_reached, dtype=np.int64),
            }
        )

    counts: dict[int, int] = {1: 0, 2: 0, 3: 0}
    if parquet_num_rows(sf_dir, "events") > 0:
        partials = (
            _read(sf_dir, ["user_id", "ts", "event_type"])
            .map_batches(
                keep_funnel, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_ub")
            .map_groups(bucket_stages, batch_format="pandas")
            .repartition(8)  # collapse one-block-per-bucket before shuffle
        )
        # final reduce output is <= 3 rows; merging it on the driver is
        # output-sized, not input-sized (empty-after-filter streams come
        # back schema-less in ray 2.49 — the dict fill handles that too)
        agg = partials.groupby("stage").aggregate(Sum("n", alias_name="n"))
        for row in agg.take_all():
            counts[int(row["stage"])] = int(row["n"])
    return pa.table(
        {
            "stage": pa.array([1, 2, 3], type=pa.int64()),
            "event_type": pa.array(list(_FUNNEL_STAGES), type=pa.string()),
            "n_users": pa.array(
                [counts[1], counts[2], counts[3]], type=pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Cohort retention: users bucketed by first-active week (epoch-day/7 from
# the corpus anchor — closed-form on both sides, no date_trunc semantics to
# mirror); n distinct users active per (cohort_week, week_index).
# Batch-local (user, week) pre-distinct shrinks the stream before the ONE
# user_id shuffle; per-user cohort/week_index resolution is group-local;
# the final count rides a packed single-int64-key aggregate.
# ---------------------------------------------------------------------------
_COHORT_ANCHOR = "2024-01-01"
_COHORT_SQL = f"""
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', TIMESTAMP '{_COHORT_ANCHOR}', ts) // 7
              AS BIGINT) AS week
  FROM events
),
first_wk AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
)
SELECT f.cohort_week, w.week - f.cohort_week AS week_index,
       CAST(count(*) AS BIGINT) AS n_users
FROM wk w JOIN first_wk f ON w.user_id = f.user_id
GROUP BY 1, 2
"""

_WEEK_BITS = 20  # weeks << 2^20; packed key = cohort_week << 20 | week_index


@query("cohort_retention", _COHORT_SQL)
def q_cohort_retention(sf_dir: str):
    anchor = np.datetime64(_COHORT_ANCHOR, "D")

    empty = pa.table(
        {
            "cohort_week": pa.array([], type=pa.int64()),
            "week_index": pa.array([], type=pa.int64()),
            "n_users": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    from ray.data.aggregate import Sum

    def user_weeks(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        days = (ts.astype("datetime64[D]") - anchor).astype(np.int64)
        week = days // 7
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = np.unique((uid << _WEEK_BITS) | week)
        uid = packed >> _WEEK_BITS
        return pa.table(
            {
                "user_id": pa.array(uid),
                "week": pa.array(packed & ((1 << _WEEK_BITS) - 1)),
                "_ub": pa.array(uid >> _USER_BUCKET_BITS),
            }
        )

    def cohortize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # batch-local pre-distinct leaves cross-batch repeats; the bucket
        # holds every pair for its ~256 users, so one packed unique both
        # dedups exactly AND sorts by (user, week) — per-user cohort is
        # then the first week of each user segment, and the (cohort,
        # week_index) keys pre-count inside the bucket before the final
        # Sum shuffle.
        uid = g["user_id"].to_numpy().astype(np.int64)
        wk = g["week"].to_numpy().astype(np.int64)
        packed = np.unique((uid << _WEEK_BITS) | wk)
        uid = packed >> _WEEK_BITS
        wk = packed & ((1 << _WEEK_BITS) - 1)
        change = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(change) - 1
        cohort = wk[np.flatnonzero(change)][seg]
        key = (cohort << _WEEK_BITS) | (wk - cohort)
        vals, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": vals, "n_users": cnt.astype(np.int64)})

    def unpack(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cohort_week": pa.array(key >> _WEEK_BITS),
                "week_index": pa.array(key & ((1 << _WEEK_BITS) - 1)),
                "n_users": batch["n_users"].cast(pa.int64()),
            }
        )

    return (
        _read(sf_dir, ["user_id", "ts"])
        .map_batches(user_weeks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(cohortize_bucket, batch_format="pandas")
        .repartition(8)  # collapse one-block-per-bucket before the shuffle
        .groupby("key")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(unpack, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Per-user rolling window (ROWS 2 PRECEDING .. CURRENT ROW over ts,
# event_id order): integer-cent rolling sum + window row count per event.
# The cumsum-difference trick makes the window O(group); scores stay exact
# int64 so the value gate is order-independent.
# ---------------------------------------------------------------------------
_ROLL_W = 3  # current row + 2 preceding

_ROLLING_SQL = f"""
SELECT event_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS roll_sum_cents,
       CAST(count(*) OVER w AS BIGINT) AS roll_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
"""


@query("rolling_event_sum", _ROLLING_SQL)
def q_rolling_event_sum(sf_dir: str):
    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "roll_sum_cents": pa.array([], type=pa.int64()),
            "roll_n": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> _USER_BUCKET_BITS))

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 users per group: ONE lexsort by (user, ts, event_id), then
        # the cumsum-difference window runs segmented — the per-user base
        # offset is subtracted via the segment index, and window starts
        # clamp at each user's first row.
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        cents = _cents(g["value"].to_numpy()[order])
        change = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        csum = np.cumsum(cents)
        seg_csum = csum - (csum[starts] - cents[starts])[seg]
        idx = np.arange(len(uid), dtype=np.int64)
        pos = idx - starts[seg]
        out = seg_csum.copy()
        deep = pos >= _ROLL_W
        out[deep] -= seg_csum[idx[deep] - _ROLL_W]
        return pd.DataFrame(
            {
                "event_id": eid,
                "roll_sum_cents": out,
                "roll_n": np.minimum(pos + 1, _ROLL_W).astype(np.int64),
            }
        )

    return (
        _read(sf_dir, ["event_id", "user_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(roll_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Wide pivot: per-user event-type count matrix (the reference's A4-style
# class-balance counters widened to a feature row — SURVEY §2.5). Per-batch
# vectorized partials, then one Sum-aggregate shuffle on user_id.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_SQL = "SELECT user_id,\n" + ",\n".join(
    f"  CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in _EVENT_TYPES
) + "\nFROM events GROUP BY user_id"


@query("pivot_event_counts", _PIVOT_SQL)
def q_pivot_event_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    empty = pa.table(
        {"user_id": pa.array([], type=pa.int64())}
        | {f"n_{t}": pa.array([], type=pa.int64()) for t in _EVENT_TYPES}
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        users, inv = np.unique(uid, return_inverse=True)
        cols = {"user_id": pa.array(users)}
        for t in _EVENT_TYPES:
            acc = np.zeros(len(users), dtype=np.int64)
            np.add.at(acc, inv, (et == t).astype(np.int64))
            cols[f"n_{t}"] = pa.array(acc)
        return pa.table(cols)

    return (
        _read(sf_dir, ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES])
    )


# ---------------------------------------------------------------------------
# Per-day top event type (streaming top-k per window): count partials per
# batch, ONE day-keyed shuffle, group-local argmax with a lexicographic
# tie-break.
# ---------------------------------------------------------------------------
_DAILY_TOP_SQL = f"""
WITH d AS (
  SELECT CAST(date_diff('day', TIMESTAMP '{_COHORT_ANCHOR}', ts) AS BIGINT)
             AS day, event_type
  FROM events
),
c AS (SELECT day, event_type, count(*) AS n FROM d GROUP BY 1, 2),
r AS (
  SELECT day, event_type, n,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, event_type) AS rnk
  FROM c
)
SELECT day, event_type, CAST(n AS BIGINT) AS n_events FROM r WHERE rnk = 1
"""


@query("daily_top_event", _DAILY_TOP_SQL)
def q_daily_top_event(sf_dir: str):
    anchor = np.datetime64(_COHORT_ANCHOR, "D")

    empty = pa.table(
        {
            "day": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "n_events": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        day = (ts.astype("datetime64[D]") - anchor).astype(np.int64)
        df = pd.DataFrame(
            {
                "day": day,
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby(["day", "event_type"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby("event_type", sort=True)["n"].sum().reset_index()
        )
        s = s.sort_values(
            ["n", "event_type"], ascending=[False, True], kind="mergesort"
        ).head(1)
        return pd.DataFrame(
            {
                "day": [np.int64(g["day"].iloc[0])],
                "event_type": s["event_type"].to_numpy(),
                "n_events": s["n"].to_numpy().astype(np.int64),
            }
        )

    return (
        _read(sf_dir, ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .map_groups(top1, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Distributed OLS via sufficient statistics: per event_type the mergeable
# (n, Σx, Σy, Σxx, Σxy) integer sums over x = minutes since the corpus
# anchor, y = value cents. Slope/intercept are a driver-side O(groups)
# division; the data path is partial sums + one tiny Sum-aggregate — the
# canonical scale shape for grouped regression.
# ---------------------------------------------------------------------------
_REG_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('minute', TIMESTAMP '{_COHORT_ANCHOR}', ts)
              AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM e GROUP BY event_type
"""


@query("regression_stats", _REG_SQL)
def q_regression_stats(sf_dir: str):
    from ray.data.aggregate import Sum

    anchor_m = np.datetime64(_COHORT_ANCHOR, "m")

    empty = pa.table(
        {"event_type": pa.array([], type=pa.string())}
        | {
            c: pa.array([], type=pa.int64())
            for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy")
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        x = (ts.astype("datetime64[m]") - anchor_m).astype(np.int64)
        y = _cents(batch["value"].to_numpy(zero_copy_only=False))
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        k = len(types)

        def gsum(v: np.ndarray) -> np.ndarray:
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, inv, v)
            return acc

        return pa.table(
            {
                "event_type": pa.array(types),
                "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "sum_x": pa.array(gsum(x)),
                "sum_y": pa.array(gsum(y)),
                "sum_xx": pa.array(gsum(x * x)),
                "sum_xy": pa.array(gsum(x * y)),
            }
        )

    return (
        _read(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            *[
                Sum(c, alias_name=c)
                for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy")
            ]
        )
    )


# ---------------------------------------------------------------------------
# Semi-structured column extraction: the events props column is JSON; pull
# the integer field out with ONE vectorized RE2 kernel (pc.extract_regex —
# no per-row json.loads in the hot path) and aggregate per type. The SQL
# oracle parses it as real JSON, so the regex fast path is value-checked
# against a true JSON decoder.
# ---------------------------------------------------------------------------
_PROPS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k
FROM events WHERE props IS NOT NULL
GROUP BY event_type
"""


@query("props_json_stats", _PROPS_SQL)
def q_props_json_stats(sf_dir: str):
    from ray.data.aggregate import Max, Min, Sum

    empty = pa.table(
        {"event_type": pa.array([], type=pa.string())}
        | {c: pa.array([], type=pa.int64())
           for c in ("n", "sum_k", "min_k", "max_k")}
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["props"]))
        m = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        nt = len(types)
        sums = np.zeros(nt, dtype=np.int64)
        np.add.at(sums, inv, k)
        mins = np.full(nt, np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, k)
        maxs = np.full(nt, np.iinfo(np.int64).min)
        np.maximum.at(maxs, inv, k)
        return pa.table(
            {
                "event_type": pa.array(types),
                "n": pa.array(np.bincount(inv, minlength=nt).astype(np.int64)),
                "sum_k": pa.array(sums),
                "min_k": pa.array(mins),
                "max_k": pa.array(maxs),
            }
        )

    return (
        _read(sf_dir, ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 dimension-history build: collapse each user's event stream into
# validity intervals of their "current state" (the event_type), the
# slowly-changing-dimension type-2 table a warehouse load would maintain.
# Consecutive same-state events merge into one interval; the open interval
# carries a NULL valid_to. One shuffle on user_id, per-group vectorized
# diff — the same sorted-group shape as rolling_event_sum, so the skew
# levers (salting, byte repartition) apply unchanged at scale.
# ---------------------------------------------------------------------------
_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER w AS prev_state
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  SELECT user_id, state, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to
FROM starts
"""


@query("scd2_history", _SCD2_SQL)
def q_scd2_history(sf_dir: str):
    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "state": pa.array([], type=pa.string()),
            "valid_from": pa.array([], type=pa.timestamp("us")),
            "valid_to": pa.array([], type=pa.timestamp("us")),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> _USER_BUCKET_BITS))

    def intervals_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 users per group: one lexsort by (user, ts, event_id);
        # interval starts are rows whose state differs from the previous
        # row OR that open a new user segment; valid_to = the next
        # interval start of the SAME user, NaT on each user's open tail.
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy()
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts_i, uid))
        uid, ts = uid[order], ts[order]
        state = g["event_type"].to_numpy()[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        start = new_user.copy()
        if len(g) > 1:
            start[1:] |= state[1:] != state[:-1]
        s_idx = np.flatnonzero(start)
        nxt = np.r_[s_idx[1:], 0]  # dummy for the final interval
        closes = np.r_[~new_user[s_idx[1:]], False]  # next start, same user
        vto = np.where(closes, ts[nxt], np.datetime64("NaT", "ns"))
        return pd.DataFrame(
            {
                "user_id": uid[s_idx],
                "state": state[s_idx],
                "valid_from": ts[s_idx],
                "valid_to": vto,
            }
        )

    return (
        _read(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(intervals_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Daily active users (the ubiquitous engagement metric): exact per-day
# distinct-user counts. Per-batch (day, user) pre-dedup packs both into one
# int64 key so the shuffle carries distinct pairs only and the aggregate
# stays on the fast single-key path; final per-day count is a second tiny
# aggregate over pair rows.
# ---------------------------------------------------------------------------
_DAU_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


@query("daily_active_users", _DAU_SQL)
def q_daily_active_users(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    empty = pa.table(
        {
            "day": pa.array([], type=pa.timestamp("us")),
            "n_users": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty

    _US_PER_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // _US_PER_DAY
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # distinct (day, user) pairs + per-pair event counts in one sweep;
        # day fits far below 2^20, user below 2^43
        key = day * (1 << 43) + uid
        vals, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(vals.astype(np.int64)),
                "n_events": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = (
        _read(sf_dir, ["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "day_i": pa.array([], type=pa.int64()),
                    "n_users": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                }
            )
        key = batch["key"].to_numpy(zero_copy_only=False)
        ev = batch["n_events"].to_numpy(zero_copy_only=False)
        day = key >> 43
        vals, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day_i": pa.array(vals.astype(np.int64)),
                "n_users": pa.array(
                    np.bincount(inv, minlength=len(vals)).astype(np.int64)
                ),
                "n_events": pa.array(
                    np.bincount(
                        inv, weights=ev, minlength=len(vals)
                    ).astype(np.int64)
                ),
            }
        )

    days = (
        pairs.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day_i")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        day_i = t["day_i"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                # match the oracle's date_trunc: midnight timestamp[us]
                "day": pa.array(
                    (day_i * _US_PER_DAY).view("datetime64[us]")
                ),
                "n_users": t["n_users"].cast(pa.int64()),
                "n_events": t["n_events"].cast(pa.int64()),
            }
        )

    return days.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Recency-weighted activity scores (time-decay sampling prior: fresher
# interactions count exponentially more — the weighting a recommender /
# continual-pretraining mixer applies before sampling). Exact integer
# half-life-per-day weights via bit shifts (1 << (HORIZON - age_days)), so
# the oracle hashes exactly. One global max-ts aggregate (a scalar,
# broadcast into the scan), one per-user Sum shuffle of pre-agg partials.
# ---------------------------------------------------------------------------
_RECENCY_HORIZON = 30

_RECENCY_SQL = f"""
WITH mx AS (SELECT date_trunc('day', max(ts)) AS m FROM events),
w AS (
  SELECT user_id,
    CASE WHEN date_diff('day', date_trunc('day', ts), (SELECT m FROM mx))
              <= {_RECENCY_HORIZON}
         THEN CAST(1 AS BIGINT)
              << ({_RECENCY_HORIZON}
                  - date_diff('day', date_trunc('day', ts),
                              (SELECT m FROM mx)))
         ELSE CAST(0 AS BIGINT) END AS wt
  FROM events
)
SELECT user_id, CAST(sum(wt) AS BIGINT) AS recency_score
FROM w GROUP BY user_id
"""


@query("recency_scores", _RECENCY_SQL)
def q_recency_scores(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "recency_score": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty
    _US_DAY = 86_400_000_000
    ds = _read(sf_dir, ["user_id", "ts"])
    max_us = ds.aggregate(Max("ts", alias_name="m"))["m"]
    max_day = int(pd.Timestamp(max_us).value // 1000) // _US_DAY

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        age = max_day - ts // _US_DAY
        wt = np.where(
            age <= _RECENCY_HORIZON,
            np.int64(1) << np.maximum(_RECENCY_HORIZON - age, 0),
            0,
        ).astype(np.int64)
        vals, inv = np.unique(uid, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(vals),
                "recency_score": pa.array(
                    np.bincount(
                        inv, weights=wt, minlength=len(vals)
                    ).astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("recency_score", alias_name="recency_score"))
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the daily event rate (ingest-drift
# monitoring: "which day did the feed change?"). Deviations are scaled to
# integers (c_d * D - T) so the cumulative sum is exact; the distributed
# part is the daily-count aggregate, the CUSUM itself runs on the D-row
# result (one row per day — driver-side by size, like every final top-k
# merge in this repo). Reported change point = day of max |CUSUM|,
# earliest day on ties.
# ---------------------------------------------------------------------------
_CUSUM_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS c
  FROM events GROUP BY 1
),
tot AS (SELECT sum(c) AS t, count(*) AS d FROM daily),
cs AS (
  SELECT day,
         sum(c * (SELECT d FROM tot) - (SELECT t FROM tot))
           OVER (ORDER BY day) AS cusum
  FROM daily
)
SELECT day, CAST(abs(cusum) AS BIGINT) AS cusum_abs
FROM cs ORDER BY abs(cusum) DESC, day LIMIT 1
"""


@query("rate_changepoint", _CUSUM_SQL)
def q_rate_changepoint(sf_dir: str):
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "day": pa.array([], type=pa.timestamp("us")),
            "cusum_abs": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty
    _US_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // _US_DAY
        vals, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day_i": pa.array(vals.astype(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    daily = (
        _read(sf_dir, ["ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_i")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # one row per DAY — tiny by construction
    )
    if daily.empty:
        return empty
    daily = daily.sort_values("day_i")
    c = daily["c"].to_numpy().astype(np.int64)
    D, T = len(c), int(c.sum())
    cusum = np.cumsum(c * D - T)
    order = np.lexsort((daily["day_i"].to_numpy(), -np.abs(cusum)))
    i = int(order[0])
    return pa.table(
        {
            "day": pa.array(
                np.array(
                    [daily["day_i"].iloc[i] * _US_DAY], dtype=np.int64
                ).view("datetime64[us]")
            ),
            "cusum_abs": pa.array(
                np.array([abs(int(cusum[i]))], dtype=np.int64)
            ),
        }
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users (WAU — windowed DISTINCT, the metric rolling
# sums can't give you): for each observed day, distinct users active in
# [day-6, day]. Distinct (day, user) pairs shuffle once; each pair then
# fans out to at most 7 observed window days (bounded amplification), and
# a second packed-key distinct + per-day count finishes. The observed-day
# set (one row per day) broadcasts as a scalar-sized side.
# ---------------------------------------------------------------------------
_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM du),
w AS (
  SELECT days.d, du.user_id
  FROM days JOIN du
    ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
)
SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_wau
FROM w GROUP BY d
"""


@query("weekly_active_users", _WAU_SQL)
def q_weekly_active_users(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    empty = pa.table(
        {
            "day": pa.array([], type=pa.timestamp("us")),
            "n_wau": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "events") == 0:
        return empty
    _US_DAY = 86_400_000_000
    ds = _read(sf_dir, ["user_id", "ts"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        key = (ts // _US_DAY) * (1 << 43) + uid
        return pa.table({"key": pa.array(np.unique(key))})

    pairs = (
        ds.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("key")
        .aggregate(Count(alias_name="_c"))
        .repartition(4)
        .materialize()  # consumed twice: observed-day set + window fanout
    )

    # observed days: tiny (one per day) — broadcast into the fanout
    day_rows = pairs.map_batches(
        lambda t: pa.table(
            {
                "d": pa.array(
                    np.unique(
                        t["key"].to_numpy(zero_copy_only=False) >> 43
                    ).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    observed = np.unique(day_rows["d"].to_numpy().astype(np.int64))
    observed_set = set(int(d) for d in observed)

    def fanout(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        if len(key) == 0:
            return pa.table({"wkey": pa.array([], type=pa.int64())})
        day = key >> 43
        uid = key & ((1 << 43) - 1)
        outs = []
        for k in range(7):
            wd = day + k
            keep = np.isin(wd, observed)
            outs.append(wd[keep] * (1 << 43) + uid[keep])
        return pa.table(
            {"wkey": pa.array(np.unique(np.concatenate(outs)))}
        )

    windowed = (
        pairs.map_batches(fanout, batch_format="pyarrow")
        .groupby("wkey")
        .aggregate(Count(alias_name="_c"))
    )

    def day_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "day_i": pa.array([], type=pa.int64()),
                    "n_wau": pa.array([], type=pa.int64()),
                }
            )
        wd = batch["wkey"].to_numpy(zero_copy_only=False) >> 43
        vals, cnt = np.unique(wd, return_counts=True)
        return pa.table(
            {
                "day_i": pa.array(vals.astype(np.int64)),
                "n_wau": pa.array(cnt.astype(np.int64)),
            }
        )

    days = (
        windowed.map_batches(day_counts, batch_format="pyarrow")
        .groupby("day_i")
        .aggregate(Sum("n_wau", alias_name="n_wau"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        d = t["day_i"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "day": pa.array((d * _US_DAY).view("datetime64[us]")),
                "n_wau": t["n_wau"].cast(pa.int64()),
            }
        )

    return days.map_batches(finish, batch_format="pyarrow")
