"""Driver-checked queries: relational operator coverage on the TPC-H-ish
tables (groupby aggregates, broadcast joins, sort/top-k, filters, windowed
event aggregation).

Money is aggregated in integer cents (round(x*100) -> int64) on BOTH sides
so value hashes are exact regardless of float summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import query


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: np.ndarray) -> np.ndarray:
    # round halves AWAY from zero (both signs) to match DuckDB round();
    # np.round's half-to-even would diverge by one cent on exact-.5 inputs,
    # and a bare floor(x*100+0.5) rounds negative halves toward +inf
    scaled = np.asarray(arr, dtype=np.float64) * 100.0
    return np.where(
        scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
    ).astype(np.int64)


def _int_bincount(inv: np.ndarray, weights: np.ndarray, n: int) -> np.ndarray:
    """Exact int64 grouped sum (np.bincount accumulates weights in float64,
    which rounds once partials exceed 2^53)."""
    acc = np.zeros(n, dtype=np.int64)
    np.add.at(acc, inv, weights.astype(np.int64))
    return acc


# ---------------------------------------------------------------------------
# Q1-style pricing summary: partial aggregation inside map_batches (combiner)
# then a tiny groupby over per-batch partials — the pre-aggregate pattern.
# ---------------------------------------------------------------------------
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(100 - l_discount * 100) AS BIGINT)) AS BIGINT)
           AS sum_disc_units,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing", _Q1_SQL)
def q_q1_pricing(sf_dir: str):
    from ray.data.aggregate import Sum

    cutoff = np.datetime64("1998-09-01T00:00:00")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        rf = batch["l_returnflag"].to_numpy(zero_copy_only=False)[keep]
        ls = batch["l_linestatus"].to_numpy(zero_copy_only=False)[keep]
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        price_c = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        )
        disc_pct = np.floor(
            100.5 - batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        key = np.char.add(np.char.add(rf.astype(str), "|"), ls.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        out_rf = [k.split("|")[0] for k in uk]
        out_ls = [k.split("|")[1] for k in uk]
        return pa.table(
            {
                "l_returnflag": pa.array(out_rf, type=pa.string()),
                "l_linestatus": pa.array(out_ls, type=pa.string()),
                "sum_qty": pa.array(_int_bincount(inv, qty, len(uk))),
                "sum_base_cents": pa.array(
                    _int_bincount(inv, price_c, len(uk))
                ),
                "sum_disc_units": pa.array(
                    _int_bincount(inv, price_c * disc_pct, len(uk))
                ),
                "n_items": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    partials = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_units", alias_name="sum_disc_units"),
        Sum("n_items", alias_name="n_items"),
    )


# ---------------------------------------------------------------------------
# Broadcast join: orders -> customer -> nation (small sides via ray.put).
# ---------------------------------------------------------------------------
_NATION_REV_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@query("revenue_by_nation", _NATION_REV_SQL)
def q_revenue_by_nation(sf_dir: str):
    """Map-side (broadcast) join: customer->nation lookup built once on the
    driver from the small tables, shipped via ray.put, applied per batch;
    only the per-nation partials shuffle."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nk_to_name = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    cust_keys = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cust_nk = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    order_srt = np.argsort(cust_keys)
    lookup = (cust_keys[order_srt], cust_nk[order_srt], nk_to_name)
    ref = ray.put(lookup)

    class JoinNation:
        def __init__(self):
            keys, nks, names = ray.get(ref)
            self.keys, self.nks, self.names = keys, nks, names

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck).clip(0, len(self.keys) - 1)
            # inner-join semantics: drop orders whose custkey is absent
            # (searchsorted alone would mis-attribute them to a neighbor)
            hit = self.keys[pos] == ck
            nk = self.nks[pos[hit]]
            price_c = _cents(
                batch["o_totalprice"].to_numpy(zero_copy_only=False)[hit]
            )
            uk, inv = np.unique(nk, return_inverse=True)
            return pa.table(
                {
                    "n_name": pa.array(
                        [self.names[int(k)] for k in uk], type=pa.string()
                    ),
                    "revenue_cents": pa.array(
                        _int_bincount(inv, price_c, len(uk))
                    ),
                    "n_orders": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                }
            )

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        JoinNation, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 2)
    )
    return partials.groupby("n_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )


# ---------------------------------------------------------------------------
# Sort / top-k.
# ---------------------------------------------------------------------------
_TOP_ORDERS_SQL = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@query("top_orders", _TOP_ORDERS_SQL)
def q_top_orders(sf_dir: str):
    """LIMIT-10 without a whole-table Sort: each batch keeps its local
    top-10 (a numpy lexsort over the batch), so the final Sort operator only
    sees <=10 rows per block — the `bm25_topk` partial-top-k pattern
    (queries_search.py). At 100 TB the all-to-all a global sort would pay
    disappears; the final sort input is 10 x n_blocks tiny rows."""

    def partial_top(batch: pa.Table) -> pa.Table:
        import numpy as np

        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        order = np.lexsort((key, -cents))[:10]
        return pa.table(
            {
                "o_orderkey": pa.array(key[order]),
                "totalprice_cents": pa.array(cents[order]),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    cands = ds.map_batches(
        partial_top, batch_format="pyarrow", zero_copy_batch=True
    )
    return cands.sort(
        ["totalprice_cents", "o_orderkey"], descending=[True, False]
    ).limit(10)


# ---------------------------------------------------------------------------
# Filter + projection pushdown (read prunes columns; row filter at the read).
# ---------------------------------------------------------------------------
_PART_FILTER_SQL = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(p_size) AS BIGINT) AS total_size
FROM part WHERE p_size >= 25 GROUP BY p_brand
"""


@query("part_filter", _PART_FILTER_SQL)
def q_part_filter(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_size"],
        filter=(pc.field("p_size") >= 25),
    )
    return ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"), Sum("p_size", alias_name="total_size")
    )


# ---------------------------------------------------------------------------
# Windowed event aggregation (streaming-shaped: tumbling 1-hour windows).
# min/max of doubles are order-insensitive-exact; counts are ints.
# ---------------------------------------------------------------------------
_EVENTS_WINDOW_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


@query("events_window", _EVENTS_WINDOW_SQL)
def q_events_window(sf_dir: str):
    """Tumbling windows as a partial-aggregate map_batches + small groupby.
    n_users (count distinct) needs the user set per (type, window): emit the
    distinct pairs per batch, then count in the final groupby via a per-group
    pandas step."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        win = ts.astype("datetime64[h]").astype("datetime64[us]")
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"event_type": et, "window_start": win, "user_id": uid, "value": val}
        )
        g = (
            df.groupby(["event_type", "window_start", "user_id"], sort=False)
            .agg(n_events=("value", "size"), min_value=("value", "min"),
                 max_value=("value", "max"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_wb(t: pa.Table) -> pa.Table:
        # bucket of 16 window-hours (every event type of those hours):
        # dense hour index -> prefix bucket; also avoids ray 2.49's slow
        # multi-key hash aggregate (BASELINE.md)
        h = (
            t["window_start"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[h]")
            .astype(np.int64)
        )
        return t.append_column("_wb", pa.array(h >> 4))

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # segmented combine over (type, window) cells: one lexsort by
        # (type, window, user); sums/min/max via reduceat, distinct users
        # via first-occurrence flags within each cell
        et = g["event_type"].to_numpy(dtype=object)
        tcodes, tc = np.unique(et, return_inverse=True)
        win = g["window_start"].to_numpy()
        w_i = win.astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        ne = g["n_events"].to_numpy().astype(np.int64)
        mn = g["min_value"].to_numpy().astype(np.float64)
        mx = g["max_value"].to_numpy().astype(np.float64)
        order = np.lexsort((uid, w_i, tc))
        tc, w_i, uid = tc[order], w_i[order], uid[order]
        cell = np.r_[True, (tc[1:] != tc[:-1]) | (w_i[1:] != w_i[:-1])]
        starts = np.flatnonzero(cell)
        first_user = cell | np.r_[True, uid[1:] != uid[:-1]]
        return pd.DataFrame(
            {
                "event_type": tcodes[tc[starts]],
                "window_start": win[order][starts],
                "n_events": np.add.reduceat(ne[order], starts),
                "n_users": np.add.reduceat(
                    first_user.astype(np.int64), starts
                ),
                "min_value": np.minimum.reduceat(mn[order], starts),
                "max_value": np.maximum.reduceat(mx[order], starts),
            }
        )

    partials = _read(
        sf_dir, "events", ["ts", "event_type", "user_id", "value"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.map_batches(add_wb, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(final_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Sessionization (streaming-shaped: per-user session windows, 30-min gap).
# ---------------------------------------------------------------------------
SESSION_GAP_MIN = 30

_SESSIONS_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Session windows over a bucket of users: one lexsort by (user, ts),
    session breaks where a user changes or the gap exceeds the threshold,
    then every session is a contiguous run — counts/start/end are pure
    segment arithmetic. Property-tested against a per-user reference in
    tests/test_bucketed_merges.py."""
    gap = np.timedelta64(SESSION_GAP_MIN, "m")
    uid = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy()
    order = np.lexsort((ts.view(np.int64), uid))
    uid, ts = uid[order], ts[order]
    new_user = np.r_[True, uid[1:] != uid[:-1]]
    start = new_user.copy()
    if len(uid) > 1:
        start[1:] |= (ts[1:] - ts[:-1]) > gap
    s_idx = np.flatnonzero(start)
    ends = np.r_[s_idx[1:], len(uid)] - 1
    sess_user = uid[s_idx]
    # session ordinal within user (1-based): session index minus the
    # index of the user's first session
    first_sess = np.r_[True, sess_user[1:] != sess_user[:-1]]
    sess_ord = np.arange(len(s_idx), dtype=np.int64)
    base = sess_ord[first_sess]
    sid = sess_ord - base[np.cumsum(first_sess) - 1] + 1
    return pd.DataFrame(
        {
            "user_id": sess_user,
            "session_id": sid,
            "n_events": np.diff(np.r_[s_idx, len(uid)]).astype(np.int64),
            "session_start": ts[s_idx],
            "session_end": ts[ends],
        }
    )


@query("sessionize", _SESSIONS_SQL)
def q_sessionize(sf_dir: str):
    """Session windows over user-BUCKETED groups (user_id >> 8, ~256 users
    per group — per-user map_groups pays ~0.6-3 ms of pandas dispatch per
    group, BASELINE.md)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> 8))

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Sliding windows (1h size, 30min hop): each event lands in 2 windows.
# ---------------------------------------------------------------------------
_SLIDING_SQL = """
WITH shifted AS (
  SELECT event_type, ts, value, unnest([0, 1]) AS k
  FROM events
),
win AS (
  SELECT event_type,
         date_trunc('hour', ts - k * INTERVAL 30 MINUTE)
           + k * INTERVAL 30 MINUTE AS window_start,
         value
  FROM shifted
)
SELECT event_type, window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM win GROUP BY event_type, window_start
"""


@query("sliding_window", _SLIDING_SQL)
def q_sliding_window(sf_dir: str):
    """1h windows hopping every 30min: each event is assigned to its two
    covering windows inside map_batches (vectorized), then a partial+final
    aggregate — the flat_map-then-combine pattern for overlapping windows."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        half = np.timedelta64(30, "m")
        frames = []
        for k in (0, 1):
            start = (ts - k * half).astype("datetime64[h]").astype(
                "datetime64[us]"
            ) + k * half
            frames.append(
                pd.DataFrame(
                    {"event_type": et, "window_start": start, "value": val}
                )
            )
        df = pd.concat(frames, ignore_index=True)
        g = (
            df.groupby(["event_type", "window_start"], sort=False)["value"]
            .agg(n_events="size", min_value="min", max_value="max")
            .reset_index()
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_wb(t: pa.Table) -> pa.Table:
        h = (
            t["window_start"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[h]")
            .astype(np.int64)
        )
        return t.append_column("_wb", pa.array(h >> 4))

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # segmented combine over (type, window) cells (see events_window)
        et = g["event_type"].to_numpy(dtype=object)
        tcodes, tc = np.unique(et, return_inverse=True)
        win = g["window_start"].to_numpy()
        w_i = win.astype("datetime64[us]").astype(np.int64)
        ne = g["n_events"].to_numpy().astype(np.int64)
        mn = g["min_value"].to_numpy().astype(np.float64)
        mx = g["max_value"].to_numpy().astype(np.float64)
        order = np.lexsort((w_i, tc))
        tc, w_i = tc[order], w_i[order]
        cell = np.r_[True, (tc[1:] != tc[:-1]) | (w_i[1:] != w_i[:-1])]
        starts = np.flatnonzero(cell)
        return pd.DataFrame(
            {
                "event_type": tcodes[tc[starts]],
                "window_start": win[order][starts],
                "n_events": np.add.reduceat(ne[order], starts),
                "min_value": np.minimum.reduceat(mn[order], starts),
                "max_value": np.maximum.reduceat(mx[order], starts),
            }
        )

    partials = _read(
        sf_dir, "events", ["ts", "event_type", "value"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.map_batches(add_wb, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(final_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Per-group top-k (window-function analog): top-2 orders by price per
# customer.
# ---------------------------------------------------------------------------
_TOPK_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 2
"""


@query("topk_per_customer", _TOPK_PER_CUST_SQL)
def q_topk_per_customer(sf_dir: str):
    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return batch.append_column("_cb", pa.array(ck >> 8))

    def top2_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 customers per group: one lexsort by (cust, -price, key),
        # keep positions 0-1 of each customer segment
        ck = g["o_custkey"].to_numpy().astype(np.int64)
        ok = g["o_orderkey"].to_numpy().astype(np.int64)
        price = g["o_totalprice"].to_numpy().astype(np.float64)
        order = np.lexsort((ok, -price, ck))
        ck, ok = ck[order], ok[order]
        change = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(change)
        pos = np.arange(len(ck)) - starts[np.cumsum(change) - 1]
        keep = pos < 2
        return pd.DataFrame(
            {
                "o_custkey": ck[keep],
                "o_orderkey": ok[keep],
                "rnk": (pos[keep] + 1).astype(np.int64),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cb")
        .map_groups(top2_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# As-of join: for each purchase, the most recent prior click by the same
# user — pd.merge_asof per user-hash bucket inside map_groups (the
# documented Ray Data pattern for as-of/range joins).
# ---------------------------------------------------------------------------
# tie-break: among clicks sharing the latest prior ts, the highest
# event_id wins on BOTH sides (ASOF JOIN leaves ties unspecified)
_ASOF_SQL = """
SELECT p.event_id AS purchase_id,
       (SELECT c.event_id FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts < p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM events p
WHERE p.event_type = 'purchase'
  AND EXISTS (SELECT 1 FROM events c WHERE c.user_id = p.user_id
              AND c.event_type = 'click' AND c.ts < p.ts)
"""


def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Merge-sorted as-of over a bucket of users: sort by (user, ts,
    purchase-before-click, event_id) and forward-fill the last click row
    index. Purchases sort BEFORE equal-ts clicks, so the ffill a purchase
    sees only covers strictly-earlier clicks; among ties of the latest
    prior ts, the LAST accumulated click is the highest event_id — both
    matching the SQL's ORDER BY ts DESC, id DESC. Property-tested against
    an O(n^2) reference in tests/test_bucketed_merges.py."""
    uid = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = g["event_id"].to_numpy().astype(np.int64)
    is_click = g["event_type"].to_numpy() == "click"
    order = np.lexsort((eid, is_click.astype(np.int8), ts, uid))
    uid, eid = uid[order], eid[order]
    is_click = is_click[order]
    n = len(uid)
    idx = np.where(is_click, np.arange(n, dtype=np.int64), -1)
    last_click = np.maximum.accumulate(idx)
    change = np.r_[True, uid[1:] != uid[:-1]]
    seg_start = np.flatnonzero(change)[np.cumsum(change) - 1]
    hit = (~is_click) & (last_click >= seg_start)
    return pd.DataFrame(
        {
            "purchase_id": eid[hit],
            "click_id": eid[last_click[hit]],
        }
    )


@query("asof_purchase_click", _ASOF_SQL)
def q_asof(sf_dir: str):
    def keep_and_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.is_in(
                batch["event_type"],
                value_set=pa.array(["purchase", "click"]),
            )
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_ub", pa.array(uid >> 8))

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(
            keep_and_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_ub")
        .map_groups(asof_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Distinct (ds.unique shuffle form).
# ---------------------------------------------------------------------------
_DISTINCT_SQL = """
SELECT DISTINCT event_type FROM events
"""


@query("distinct_event_types", _DISTINCT_SQL)
def q_distinct(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = ds.unique("event_type") or []  # None on a fully-empty stream
    return pa.table({"event_type": pa.array(sorted(vals), type=pa.string())})


# ---------------------------------------------------------------------------
# Both-sides-large join: explicit bucketed hash join (no broadcast).
# Each side gets bucket = key % B; matching buckets join pairwise inside
# map_groups — the portable partitioned-hash-join pattern for Ray Data.
# Revenue (cents) per order priority from orders x lineitem.
# ---------------------------------------------------------------------------
_BUCKET_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

JOIN_BUCKETS = 16


@query("bucketed_join_revenue", _BUCKET_JOIN_SQL)
def q_bucketed_join(sf_dir: str):
    """Partitioned hash join: tag both sides with bucket = orderkey % B,
    union them with a side marker, groupby(bucket), and join each bucket
    pairwise with a pandas merge inside map_groups. Only per-bucket partial
    aggregates leave the join stage. Skew lever: B and per-bucket salting
    (hot orderkeys would be salted into sub-buckets)."""
    import ray.data
    from ray.data.aggregate import Sum

    def tag_orders(batch: pa.Table) -> pa.Table:
        b = (
            batch["o_orderkey"].to_numpy(zero_copy_only=False) % JOIN_BUCKETS
        ).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(b),
                "orderkey": batch["o_orderkey"],
                "priority": batch["o_orderpriority"],
                "price_cents": pa.array(
                    np.zeros(len(batch), dtype=np.int64)
                ),
                "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        b = (
            batch["l_orderkey"].to_numpy(zero_copy_only=False) % JOIN_BUCKETS
        ).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(b),
                "orderkey": batch["l_orderkey"],
                "priority": pa.array([""] * len(batch), type=pa.string()),
                "price_cents": pa.array(
                    _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
                ),
                "side": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    )
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        tag_lineitem, batch_format="pyarrow", zero_copy_batch=True
    )
    both = orders.union(items)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["orderkey", "priority"]]
        l = g[g["side"] == 1][["orderkey", "price_cents"]]
        m = l.merge(o, on="orderkey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"o_orderpriority": pd.Series(dtype="object"),
                 "revenue_cents": pd.Series(dtype="int64"),
                 "n_items": pd.Series(dtype="int64")}
            )
        agg = (
            m.groupby("priority")["price_cents"]
            .agg(revenue_cents="sum", n_items="size")
            .reset_index()
            .rename(columns={"priority": "o_orderpriority"})
        )
        agg["revenue_cents"] = agg["revenue_cents"].astype(np.int64)
        agg["n_items"] = agg["n_items"].astype(np.int64)
        return agg

    partials = both.groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )
    return partials.groupby("o_orderpriority").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    )


# ---------------------------------------------------------------------------
# Exact distinct count per group (the oracle-checkable side of the HLL
# sketch implemented in functions/sketch.py).
# ---------------------------------------------------------------------------
_DISTINCT_USERS_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


@query("distinct_users_exact", _DISTINCT_USERS_SQL)
def q_distinct_users(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": [np.int64(g["user_id"].nunique())],
            }
        )

    partials = _read(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("event_type").map_groups(
        final, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Native hash-partitioned join (ray.data.Dataset.join, Ray >= 2.46): same
# semantics as bucketed_join_revenue via the built-in hash-shuffle join.
# ---------------------------------------------------------------------------
@query("native_join_revenue", _BUCKET_JOIN_SQL)
def q_native_join(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    # ray 2.49's hash-join aggregator raises on fully-empty inputs
    if (parquet_num_rows(sf_dir, "orders") == 0
            or parquet_num_rows(sf_dir, "lineitem") == 0):
        return pa.table(
            {
                "o_orderpriority": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
                "n_items": pa.array([], type=pa.int64()),
            }
        )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    joined = items.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(pr, return_inverse=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(uk, type=pa.string()),
                "revenue_cents": pa.array(_int_bincount(inv, cents, len(uk))),
                "n_items": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("o_orderpriority").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    )


# ---------------------------------------------------------------------------
# Running cumulative aggregate per key (window-function family): event
# number and cumulative value per user in ts order.
# ---------------------------------------------------------------------------
_RUNNING_SQL = """
SELECT event_id,
       CAST(row_number() OVER w AS BIGINT) AS event_seq,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS running_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


@query("running_totals", _RUNNING_SQL)
def q_running_totals(sf_dir: str):
    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> 8))

    def running_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ~256 users per group: one lexsort, segmented cumsum/positions
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
        return pd.DataFrame(
            {
                "event_id": eid,
                "event_seq": (
                    np.arange(len(uid), dtype=np.int64) - starts[seg] + 1
                ),
                "running_value_cents": csum
                - (csum[starts] - cents[starts])[seg],
            }
        )

    return (
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(running_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Range join: for each purchase, the number of clicks by the same user in
# the 30 minutes AFTER it — interval-predicate join via per-user-group
# searchsorted over the sorted click timeline (the same hash-bucketed
# map_groups shape as the as-of join; a sort-merge interval join is the
# scale form, and the partitioning assumption — co-located user keys —
# is identical).
# ---------------------------------------------------------------------------
_RANGE_JOIN_SQL = """
SELECT p.event_id AS purchase_id,
       CAST((SELECT count(*) FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts > p.ts
               AND c.ts <= p.ts + INTERVAL 30 MINUTE) AS BIGINT)
         AS n_clicks_30m
FROM events p WHERE p.event_type = 'purchase'
"""


_RANGE_WINDOW_US = 30 * 60 * 1_000_000


def range_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Interval counts over a bucket of users via the two-probe merge:
    each purchase contributes a probe at t (the window's strict left edge)
    and one at t+W (inclusive right edge); sort clicks and probes together
    by (user, ts, clicks-first) and the running click count at each probe
    gives count(ts <= probe) — the window count is the hi-probe minus
    lo-probe difference, which cancels everything before the user's
    segment. Property-tested against an O(n^2) reference in
    tests/test_bucketed_merges.py."""
    uid = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = g["event_id"].to_numpy().astype(np.int64)
    is_p = g["event_type"].to_numpy() == "purchase"
    p_uid, p_ts, p_eid = uid[is_p], ts[is_p], eid[is_p]
    c_uid, c_ts = uid[~is_p], ts[~is_p]
    n_p, n_c = len(p_uid), len(c_uid)
    if n_p == 0:
        return pd.DataFrame(
            {"purchase_id": pd.Series(dtype="int64"),
             "n_clicks_30m": pd.Series(dtype="int64")}
        )
    m_uid = np.concatenate([c_uid, p_uid, p_uid])
    m_ts = np.concatenate([c_ts, p_ts, p_ts + _RANGE_WINDOW_US])
    # clicks sort BEFORE probes at equal ts => count(ts <= probe)
    m_typ = np.concatenate(
        [np.zeros(n_c, dtype=np.int8), np.ones(2 * n_p, dtype=np.int8)]
    )
    order = np.lexsort((m_typ, m_ts, m_uid))
    cum = np.cumsum(m_typ[order] == 0)
    pos = np.empty(len(order), dtype=np.int64)
    pos[order] = np.arange(len(order))
    lo = cum[pos[n_c : n_c + n_p]]
    hi = cum[pos[n_c + n_p :]]
    return pd.DataFrame(
        {
            "purchase_id": p_eid,
            "n_clicks_30m": (hi - lo).astype(np.int64),
        }
    )


@query("range_join_counts", _RANGE_JOIN_SQL)
def q_range_join(sf_dir: str):
    def keep_and_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.is_in(
                batch["event_type"],
                value_set=pa.array(["purchase", "click"]),
            )
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_ub", pa.array(uid >> 8))

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(
            keep_and_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_ub")
        .map_groups(range_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Per-user inter-arrival gaps (lag/lead window analog). Gaps are exact
# int64 microseconds; users with a single event report NULL gaps, matching
# the SQL lag() semantics. Ties in ts are ordered by event_id on both
# sides — max_gap depends on adjacency, and total_gap telescopes to
# (last - first) regardless, so the tie-break keeps both deterministic.
# Scale: per-user groups are bounded (a user's event history), the same
# partitioning contract as sessionize/asof above.
# ---------------------------------------------------------------------------
_GAP_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(date_diff('microsecond', prev, ts)) AS BIGINT) AS max_gap_us,
       CAST(sum(date_diff('microsecond', prev, ts)) AS BIGINT) AS total_gap_us
FROM lagged GROUP BY user_id
"""


@query("event_gap_stats", _GAP_SQL)
def q_event_gap_stats(sf_dir: str):
    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> 8))

    def gaps_bucket(g: pd.DataFrame) -> pa.Table:
        # ~256 users per group (user_id >> 8): per-user map_groups costs
        # ~0.6-3 ms of pandas dispatch PER GROUP (BASELINE.md), so gap
        # stats vectorize across the bucket — one lexsort, masked diff,
        # segmented max via reduceat; total_gap telescopes to last-first.
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lens = np.diff(np.r_[starts, len(uid)])
        total = ts[starts + lens - 1] - ts[starts]
        multi = lens > 1
        if len(uid) > 1:
            d = np.diff(ts)
            # cross-user diff positions poisoned so reduceat's slice
            # [starts[s], starts[s+1]) maxes only within-user gaps
            d[starts[1:] - 1] = np.iinfo(np.int64).min
            mg = np.maximum.reduceat(d, np.minimum(starts, len(d) - 1))
        else:
            mg = np.zeros(len(starts), dtype=np.int64)
        # pyarrow output: int64 columns stay NULLABLE (pandas would coerce
        # the single-event-user NULL gap to float NaN)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(lens.astype(np.int64)),
                "max_gap_us": pa.array(mg, type=pa.int64(), mask=~multi),
                "total_gap_us": pa.array(total, type=pa.int64(), mask=~multi),
            }
        )

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_ub")
        .map_groups(gaps_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Grouping-sets rollup over (event_type, hour): the finest level is a
# distributed partial-agg + single-key groupby (keys PACKED into one
# string — ray 2.49's multi-key hash aggregate is pathologically slow on
# many small blocks); the coarser levels are re-aggregated from the finest
# RESULT, which is output-sized (|event types| x 24), not data-sized — the
# pre-agg-reuse pattern a warehouse rollup compiles to. Sentinel encoding
# ('ALL', -1) instead of SQL's NULL grouping markers keeps the value-hash
# comparison away from NULL-vs-NaN coercion.
# ---------------------------------------------------------------------------
_GSETS_SQL = """
WITH finest AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
  FROM events GROUP BY event_type, hour(ts)
)
SELECT event_type, hr, CAST(n AS BIGINT) AS n FROM finest
UNION ALL
SELECT event_type, CAST(-1 AS BIGINT) AS hr, CAST(sum(n) AS BIGINT) AS n
FROM finest GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, CAST(-1 AS BIGINT) AS hr,
       CAST(sum(n) AS BIGINT) AS n
FROM finest HAVING count(*) > 0
"""


@query("grouping_sets_events", _GSETS_SQL)
def q_grouping_sets_events(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        hr = (
            batch["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[h]")
            .astype(np.int64)
            % 24
        )
        keys = np.char.add(
            np.char.add(et.astype(str), "|"), hr.astype(str)
        )
        uk, inv = np.unique(keys, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(uk, type=pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    finest = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # output-sized: |event types| x 24 rows
    )
    if finest.empty:
        return pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "hr": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    split = finest["key"].str.rsplit("|", n=1, expand=True)
    fin = pd.DataFrame(
        {
            "event_type": split[0],
            "hr": split[1].astype(np.int64),
            "n": finest["n"].astype(np.int64),
        }
    )
    by_type = (
        fin.groupby("event_type", as_index=False)["n"].sum().assign(hr=-1)
    )
    total = pd.DataFrame(
        {"event_type": ["ALL"], "hr": [-1], "n": [int(fin["n"].sum())]}
    )
    return pd.concat([fin, by_type, total], ignore_index=True)[
        ["event_type", "hr", "n"]
    ]


# ---------------------------------------------------------------------------
# Bloom-filter pushdown join (sideways information passing): monthly
# revenue of line items whose order is F-status / 1-URGENT. The filtered
# small side (~1/15 of orders) builds a Bloom bitmap DISTRIBUTED — one
# bitmap per block inside map_batches, OR-reduced driver-side (per-block
# bitmaps are O(blocks * 2^log2_m/8) bytes, never rows) — and the bitmap
# broadcasts once via ray.put to prune lineitem batches BEFORE the hash-
# join shuffle. False positives only, so the join on the survivors keeps
# the result exact while ~93% of the big side never enters the shuffle.
# At 10^12 rows this is the difference between shuffling the full fact
# table and shuffling the selectivity-sized slice; size log2_m to the
# small side's key count (here 2^17 bits for ~1k keys => fp ~ 0).
# ---------------------------------------------------------------------------
_BLOOM_LOG2_M = 17

_BLOOM_JOIN_SQL = """
SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F' AND o.o_orderpriority = '1-URGENT'
GROUP BY month
"""


@query("bloom_join_revenue", _BLOOM_JOIN_SQL)
def q_bloom_join_revenue(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    from ..functions.sketch import bloom_build, bloom_contains

    empty = pa.table(
        {
            "month": pa.array([], type=pa.string()),
            "revenue_cents": pa.array([], type=pa.int64()),
            "n_items": pa.array([], type=pa.int64()),
        }
    )

    def keep_small(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch["o_orderstatus"], "F"),
            pc.equal(batch["o_orderpriority"], "1-URGENT"),
        )
        return batch.filter(m).select(["o_orderkey", "o_orderdate"])

    small = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority"],
    ).map_batches(keep_small, batch_format="pyarrow", zero_copy_batch=True)
    # the small side is consumed twice (bitmap build + join probe) and is
    # selectivity-sized by construction — pin it in the object store.
    # repartition first: the strict filter leaves mostly-empty blocks, and
    # empty schema-less blocks both bloat the bitmap pass and break the
    # join's FieldRef resolution (ray 2.49 tiny-block trap)
    small = small.repartition(4).materialize()
    if small.count() == 0:
        return empty

    def bloom_partial(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        bits = bloom_build(keys, _BLOOM_LOG2_M)
        return pa.table({"bloom": pa.array([bits.tobytes()], type=pa.binary())})

    parts = small.map_batches(
        bloom_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one fixed-size bitmap per block, not data rows
    bits = np.zeros((1 << _BLOOM_LOG2_M) // 8, dtype=np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bits_ref = ray.put(bits)

    def prune(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(bloom_contains(b, keys, _BLOOM_LOG2_M))
        )

    survivors = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]
    ).map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    joined = survivors.join(
        small,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.strftime(batch["o_orderdate"], format="%Y-%m")
        cents = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(
            month.to_numpy(zero_copy_only=False), return_inverse=True
        )
        return pa.table(
            {
                "month": pa.array(uk, type=pa.string()),
                "revenue_cents": pa.array(_int_bincount(inv, cents, len(uk))),
                "n_items": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("month").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    )


# ---------------------------------------------------------------------------
# Upsert compaction: the latest event per user (max (ts, event_id)) — the
# lakehouse "keep newest version per key" shape. Two-level argmax: each
# batch reduces to at most one row per user it contains (vectorized
# lexsort + group-boundary pick, no Python loop), so the groupby shuffle
# carries <= |users| x |blocks| pre-reduced rows instead of the event log;
# the final per-user pick runs over those few rows. map_groups emits one
# block per group (ray 2.49), hence the closing repartition.
# ---------------------------------------------------------------------------
_LATEST_SQL = """
SELECT user_id, event_id, ts, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC
) = 1
"""


@query("latest_event_per_user", _LATEST_SQL)
def q_latest_event_per_user(sf_dir: str):
    def argmax_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        # last row of each (user asc, ts asc, event_id asc) run = per-user
        # argmax of (ts, event_id) in this batch
        order = np.lexsort((eid, ts, user))
        u = user[order]
        last = np.r_[u[1:] != u[:-1], True]
        return batch.take(pa.array(order[last]))

    partials = _read(
        sf_dir, "events",
        ["user_id", "event_id", "ts", "event_type", "value"],
    ).map_batches(argmax_partial, batch_format="pyarrow", zero_copy_batch=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ub", pa.array(uid >> 8))

    def pick_latest_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # same argmax kernel as the batch partial, across ~256 users at
        # once: last row of each (user, ts, event_id)-sorted user run
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort(
            (eid, ts.astype("datetime64[us]").astype(np.int64), uid)
        )
        u = uid[order]
        last = order[np.r_[u[1:] != u[:-1], True]]
        return pd.DataFrame(
            {
                "user_id": uid[last],
                "event_id": eid[last],
                "ts": ts[last],
                "event_type": g["event_type"].to_numpy(dtype=object)[last],
                "value_cents": _cents(g["value"].to_numpy()[last]),
            }
        )

    return (
        partials.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_ub")
        .map_groups(pick_latest_bucket, batch_format="pandas")
        .repartition(4)
    )


# ---------------------------------------------------------------------------
# Explicit semi / anti joins (the reference expresses these as python-set
# membership inside one process — e.g. removed-Id scrub, SURVEY §2.4 J6;
# here they're the distributed idiom: distinct build keys -> hash join /
# left-outer + null-probe filter). Build side is the DISTINCT key set of a
# filtered fact scan (predicate pushed into the parquet read), so the join
# moves keys, never order rows.
# ---------------------------------------------------------------------------
_SEMI_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""

_ANTI_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def _urgent_custkeys(sf_dir: str):
    """Distinct custkeys holding >=1 urgent order, as a marker table."""
    from ray.data.aggregate import Count

    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )
    return (
        ds.groupby("o_custkey")
        .aggregate(Count(alias_name="mark"))
        # hash-aggregate emits empty schema-less blocks that break the
        # downstream join's FieldRef (BASELINE.md) — collapse first
        .repartition(4)
    )


def _semi_anti_small(sf_dir: str, anti: bool) -> pa.Table:
    """Driver-side fallback for degenerate shards: an all-empty build side
    reaches ray's hash join as schema-less blocks (1-row sweep)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    )
    urgent = set(
        orders.filter(
            pc.equal(orders["o_orderpriority"], "1-URGENT")
        )["o_custkey"].to_pylist()
    )
    keys = cust["c_custkey"].to_numpy(zero_copy_only=False)
    member = np.array([k in urgent for k in keys], dtype=bool)
    return cust.filter(pa.array(~member if anti else member))


def _semi_anti(sf_dir: str, anti: bool):
    import ray.data

    from .extraction import parquet_num_rows

    if parquet_num_rows(sf_dir, "customer") == 0:
        return pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "c_name": pa.array([], type=pa.string()),
            }
        )
    if parquet_num_rows(sf_dir, "orders") < 32:
        return _semi_anti_small(sf_dir, anti)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    build = _urgent_custkeys(sf_dir)
    if not anti:
        joined = cust.join(
            build, join_type="inner", num_partitions=8,
            on=("c_custkey",), right_on=("o_custkey",),
        )
    else:
        joined = cust.join(
            build, join_type="left_outer", num_partitions=8,
            on=("c_custkey",), right_on=("o_custkey",),
        )

    def finish(t: pa.Table) -> pa.Table:
        if anti:
            if "mark" in t.column_names:
                t = t.filter(pc.is_null(t["mark"]))
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "c_name": t["c_name"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


@query("semi_join_urgent", _SEMI_SQL)
def q_semi_join_urgent(sf_dir: str):
    return _semi_anti(sf_dir, anti=False)


@query("anti_join_urgent", _ANTI_SQL)
def q_anti_join_urgent(sf_dir: str):
    return _semi_anti(sf_dir, anti=True)


# ---------------------------------------------------------------------------
# Global ranking (zipWithIndex over a total order): TeraSort-style
# range-partition ranking. Pass 1 counts rows per price bucket (mergeable
# partials, driver holds only the bucket histogram); pass 2 shuffles ONCE
# on the bucket key and each group sorts locally, adding its bucket's
# cumulative offset. No global sort materialization, no driver-side data
# pass. At 100 TB the static bucket width becomes sampled split points
# (same shape as ray's own sort); ranks stay exact either way.
# ---------------------------------------------------------------------------
_RANK_SQL = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rnk
FROM orders
"""

_RANK_BUCKET_W = 4096.0  # ~122 buckets over the [0, 500k) price range


@query("global_rank_orders", _RANK_SQL)
def q_global_rank_orders(sf_dir: str):
    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "rnk": pa.array([], type=pa.int64()),
        }
    )
    if parquet_num_rows(sf_dir, "orders") == 0:
        return empty

    def bucketize(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "o_totalprice": batch["o_totalprice"],
                "bucket": pa.array(
                    np.floor(p / _RANK_BUCKET_W).astype(np.int64)
                ),
            }
        )

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_totalprice"]
    ).map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    # histogram pass: driver reduces blocks x buckets tiny rows
    hist: dict[int, int] = {}
    for row in ds.map_batches(
        bucket_counts, batch_format="pyarrow"
    ).take_all():
        hist[int(row["bucket"])] = hist.get(int(row["bucket"]), 0) + int(
            row["n"]
        )
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(hist, reverse=True):  # descending price order
        offsets[b] = acc
        acc += hist[b]

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"],
            ascending=[False, True],
            kind="mergesort",
        )
        base = offsets[int(g["bucket"].iloc[0])]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "rnk": base
                + np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return ds.groupby("bucket").map_groups(rank_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed skyline (Pareto frontier) over anti-correlated document
# metrics: maximize BOTH token count and lexical diversity (distinct/total
# in integer per-mille — longer docs repeat more, so the criteria genuinely
# trade off; 53 of 500 corpus docs are Pareto-optimal). The classic
# distributed shape (Borzsony/Kossmann/Stocker, ICDE 2001 lineage): each
# block computes its LOCAL skyline — dominated points can never re-enter —
# then the unioned candidates take one exact pass in a single task. Local
# pruning bounds the merge input by sum of block-skyline sizes (worst case
# fully anti-correlated data degrades to a single-task full skyline; that
# bound is the documented cost, never wrong answers). The oracle is the
# textbook NOT EXISTS dominance query.
# ---------------------------------------------------------------------------
_SKYLINE_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT tok) * 1000 // count(*) AS BIGINT)
           AS diversity
  FROM toks GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens, t.diversity FROM m t WHERE NOT EXISTS (
  SELECT 1 FROM m o
  WHERE o.n_tokens >= t.n_tokens AND o.diversity >= t.diversity
    AND (o.n_tokens > t.n_tokens OR o.diversity > t.diversity))
"""


def pareto_mask(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Exact 2-D maxima mask, O(n log n): sort by (a desc, b desc); a
    point survives iff it holds its a-group's max b AND beats the best b
    of every strictly-larger a. Ties on (a, b) all survive (neither
    dominates — the SQL's strict-in-one clause)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-b, -a))
    a_s, b_s = a[order], b[order]
    new_grp = np.concatenate([[True], a_s[1:] != a_s[:-1]])
    gid = np.cumsum(new_grp) - 1
    gmax = b_s[new_grp]  # per-group max b (first in desc order)
    prev_best = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]]
    )
    surv = (b_s == gmax[gid]) & (b_s > prev_best[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = surv
    return mask


@query("doc_skyline", _SKYLINE_SQL)
def q_doc_skyline(sf_dir: str):
    import pandas as pd

    from ..corpus import FlatTokens
    from .extraction import read_documents

    def local_skyline(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "diversity": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ft = FlatTokens(batch)
        if not len(ft.doc_ids):
            return empty
        g = pd.DataFrame(
            {"d": ft.doc_ids, "t": ft.tokens}
        ).groupby("d")["t"].agg(["count", "nunique"])
        a = g["count"].to_numpy(dtype=np.int64)
        b = g["nunique"].to_numpy(dtype=np.int64) * 1000 // a
        keep = pareto_mask(a, b)
        return pa.table(
            {
                "doc_id": pa.array(
                    g.index.to_numpy(dtype=np.int64)[keep]
                ),
                "n_tokens": pa.array(a[keep]),
                "diversity": pa.array(b[keep]),
            }
        )

    def final_skyline(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        a = batch["n_tokens"].to_numpy(zero_copy_only=False)
        b = batch["diversity"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(pareto_mask(a, b)))

    cands = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        local_skyline, batch_format="pyarrow", zero_copy_batch=True
    )
    # pruning is composable (lossless-prune pytest), so merge as a tree:
    # block skylines -> 8 partition skylines -> one exact final task
    return (
        cands.repartition(8)
        .map_batches(
            final_skyline, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .repartition(1)
        .map_batches(
            final_skyline, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )


# ---------------------------------------------------------------------------
# MERGE INTO / upsert (the Delta/Iceberg MERGE shape): an updates stream —
# per-customer urgent-order repricings, plus brand-new rows for a
# deterministic subset — merges into the customer base table with
# update / insert / keep row dispositions. The updates side is built by a
# pre-aggregated shuffle (per-batch urgent counts -> one Sum groupby);
# the merge itself is ONE full-outer hash join keyed on the merge key,
# partition count scaled to base-table size. Insert keys are offset by
# 10^9 (customer keys are dense from 1; the offset stays collision-free
# past sf10^4 — assert-guarded).
# ---------------------------------------------------------------------------
_MERGE_INS_OFFSET = 1_000_000_000

_MERGE_UPSERT_SQL = f"""
WITH upd AS (
  SELECT o_custkey AS k, CAST(100000 + count(*) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
),
ins AS (
  SELECT k + {_MERGE_INS_OFFSET} AS k, CAST(12345 AS BIGINT) AS v
  FROM upd WHERE v % 3 = 0
),
allu AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT CAST(coalesce(u.k, b.c_custkey) AS BIGINT) AS c_custkey,
       CAST(coalesce(u.v, round(b.c_acctbal * 100)) AS BIGINT)
         AS acctbal_cents,
       CASE WHEN u.k IS NULL THEN 'keep'
            WHEN b.c_custkey IS NULL THEN 'insert'
            ELSE 'update' END AS op
FROM customer b FULL OUTER JOIN allu u ON u.k = b.c_custkey
"""


@query("merge_upsert", _MERGE_UPSERT_SQL)
def q_merge_upsert(sf_dir: str):
    from ray.data.aggregate import Sum

    from .extraction import parquet_num_rows

    empty = pa.table(
        {
            "c_custkey": pa.array([], type=pa.int64()),
            "acctbal_cents": pa.array([], type=pa.int64()),
            "op": pa.array([], type=pa.string()),
        }
    )
    n_cust = parquet_num_rows(sf_dir, "customer")
    n_ord = parquet_num_rows(sf_dir, "orders")
    if n_cust == 0 and n_ord == 0:
        return empty

    def urgent_partial(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        k = key[pri == "1-URGENT"].astype(np.int64)
        uniq, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def mk_updates(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size and int(k.max()) >= _MERGE_INS_OFFSET:
            raise ValueError(
                "merge_upsert insert-key offset would collide; raise "
                "_MERGE_INS_OFFSET for this corpus"
            )
        v = 100000 + batch["n"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ins = v % 3 == 0
        return pa.table(
            {
                "k": pa.array(
                    np.concatenate([k, k[ins] + _MERGE_INS_OFFSET])
                ),
                "v": pa.array(
                    np.concatenate(
                        [v, np.full(int(ins.sum()), 12345, dtype=np.int64)]
                    )
                ),
            }
        )

    updates = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            urgent_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .repartition(4)  # hash-aggregate empty-block trap before the join
        .map_batches(
            mk_updates, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()  # small (<= one row per repriced customer + inserts);
        # consumed twice below (count + join), and a ZERO-row aggregate
        # emits schema-less blocks the join's right side cannot key on
    )

    def base_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pa.array(
                    batch["c_custkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "bal_cents": pa.array(
                    _cents(
                        batch["c_acctbal"].to_numpy(zero_copy_only=False)
                    )
                ),
            }
        )

    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        base_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    if updates.count() == 0:  # no urgent orders anywhere: all rows keep
        return base.map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "acctbal_cents": t["bal_cents"],
                    "op": pa.array(["keep"] * len(t), type=pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    merged = base.join(
        updates,
        join_type="full_outer",
        num_partitions=int(max(2, min(64, n_cust // 100_000 + 2))),
        on=("c_custkey",),
        right_on=("k",),
    )

    def dispatch(batch: pa.Table) -> pa.Table:
        # the hash join coalesces the merge key into the LEFT key column;
        # side presence is read off the value columns' validity
        bal = batch["bal_cents"]
        v = batch["v"]
        has_u = pc.is_valid(v)
        has_b = pc.is_valid(bal)
        op = pc.if_else(
            pc.invert(has_u),
            pa.scalar("keep"),
            pc.if_else(
                pc.invert(has_b), pa.scalar("insert"), pa.scalar("update")
            ),
        )
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "acctbal_cents": pc.coalesce(
                    pc.cast(v, pa.int64()), pc.cast(bal, pa.int64())
                ),
                "op": pc.cast(op, pa.string()),
            }
        )

    return merged.map_batches(
        dispatch, batch_format="pyarrow", zero_copy_batch=True
    )
