"""Group-count stress for the events family's bucketed map_groups.

The per-user ``groupby(user_id).map_groups`` pattern costs ~0.6-3 ms of
pandas dispatch PER GROUP (BASELINE.md); the family now groups on
``user_id >> 8`` buckets and vectorizes across users. This script
measures both shapes on the same amplified input so the win is on the
record at 80k+ groups. Usage:

    python tools/stress_events.py [sf_dir] [amp]

Amplifies the sf events table to ``amp * n_users`` distinct users
(shifted user_id copies, same timestamps/values), writes it to /tmp
once, then times rolling_event_sum in both shapes. Prints one JSON
line: users, rows, bucketed_sec, per_user_sec (per_user skipped above
200k users — it would dominate the run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amp = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from bench import host_probe

    src = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    uid = src["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = src["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    parts = []
    for i in range(amp):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eid + i * 10_000_000),
                    "user_id": pa.array(uid + i * 1_000_000),
                    "ts": src["ts"],
                    "value": src["value"],
                }
            )
        )
    big = pa.concat_tables(parts)
    n_users = len(np.unique(big["user_id"].to_numpy(zero_copy_only=False)))
    out_dir = "/tmp/stress_events"
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(big, f"{out_dir}/events.parquet")

    # the amplified events keep only the columns the rolling query needs;
    # the other bucketed kernels also read event_type — synthesize it
    # deterministically from event_id so the stress dir is self-contained
    if "event_type" not in big.column_names:
        et = np.array(["view", "click", "purchase", "signup", "error"])
        big = big.append_column(
            "event_type",
            pa.array(
                et[
                    big["event_id"].to_numpy(zero_copy_only=False) % len(et)
                ],
                type=pa.string(),
            ),
        )
        pq.write_table(big, f"{out_dir}/events.parquet")

    from ocr_machine_ray.pipelines.queries_events import (
        _cents,
        _ROLL_W,
        q_rolling_event_sum,
    )
    from ocr_machine_ray.pipelines.queries_relational import (
        q_asof,
        q_event_gap_stats,
        q_range_join,
        q_sessionize,
    )

    # warm the worker pool: the first query of a Ray session pays 15-30 s
    # of worker-spawn/first-touch (BASELINE.md), which would be billed to
    # whichever leg runs first
    ray.data.read_parquet(f"{out_dir}/events.parquet").map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).materialize()

    probe_pre = host_probe()

    t0 = time.perf_counter()
    n_bucketed = q_rolling_event_sum(out_dir).materialize().count()
    bucketed_sec = time.perf_counter() - t0

    per_user_sec = None
    if n_users <= 200_000:
        def roll(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            cents = _cents(g["value"].to_numpy())
            csum = np.cumsum(cents)
            out = csum.copy()
            out[_ROLL_W:] = csum[_ROLL_W:] - csum[:-_ROLL_W]
            n = np.minimum(np.arange(1, len(g) + 1), _ROLL_W)
            return pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(),
                    "roll_sum_cents": out,
                    "roll_n": n.astype(np.int64),
                }
            )

        t0 = time.perf_counter()
        n_per_user = (
            ray.data.read_parquet(f"{out_dir}/events.parquet")
            .groupby("user_id")
            .map_groups(roll, batch_format="pandas")
            .materialize()
            .count()
        )
        per_user_sec = round(time.perf_counter() - t0, 2)
        assert n_per_user == n_bucketed, (n_per_user, n_bucketed)

    extra = {}
    for label, qfn in (
        ("gaps_sec", q_event_gap_stats),
        ("sessionize_sec", q_sessionize),
        ("asof_sec", q_asof),
        ("range_join_sec", q_range_join),
    ):
        t0 = time.perf_counter()
        qfn(out_dir).materialize().count()
        extra[label] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "users": int(n_users),
                "rows": len(big),
                "bucketed_sec": round(bucketed_sec, 2),
                "per_user_sec": per_user_sec,
                **extra,
                "probe_pre": round(probe_pre, 3),
                "probe_post": round(host_probe(), 3),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
