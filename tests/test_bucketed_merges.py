"""Property tests for the bucketed merge kernels (asof / range join).

These two rewrites replace per-user map_groups with ONE merge-sorted pass
over a bucket of interleaved users — the tie-handling (equal timestamps,
equal ids, cross-user boundaries) is where such merges break, so both are
pinned against O(n^2) per-user references over adversarial streams
(hypothesis draws small ts/user universes to force collisions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_machine_ray.pipelines.queries_relational import (
    _RANGE_WINDOW_US,
    asof_bucket,
    range_bucket,
)


def _events(draw):
    n = draw(st.integers(1, 60))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(0, 4)),  # user: tiny universe -> overlap
                draw(st.integers(0, 8)),  # ts slot: forces exact ties
                i,  # unique event_id
                draw(st.sampled_from(["purchase", "click", "view"])),
            )
        )
    return rows


@st.composite
def event_frames(draw):
    rows = _events(draw)
    # ts slots scaled so some purchases' windows cover several slots and
    # some none (slot spacing of half the window)
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": np.array(
                [r[1] * (_RANGE_WINDOW_US // 2) for r in rows],
                dtype="datetime64[us]",
            ),
            "event_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
        }
    )


@settings(max_examples=200, deadline=None)
@given(event_frames())
def test_asof_bucket_matches_bruteforce(df):
    got = asof_bucket(df[df["event_type"].isin(["purchase", "click"])])
    got = set(map(tuple, got.to_numpy()))
    want = set()
    for _, p in df[df["event_type"] == "purchase"].iterrows():
        c = df[
            (df["event_type"] == "click")
            & (df["user_id"] == p["user_id"])
            & (df["ts"] < p["ts"])
        ]
        if len(c):
            c = c.sort_values(["ts", "event_id"], ascending=False)
            want.add((int(p["event_id"]), int(c["event_id"].iloc[0])))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(event_frames())
def test_range_bucket_matches_bruteforce(df):
    sub = df[df["event_type"].isin(["purchase", "click"])]
    got = dict(
        zip(
            range_bucket(sub)["purchase_id"].tolist(),
            range_bucket(sub)["n_clicks_30m"].tolist(),
        )
    )
    w = np.timedelta64(_RANGE_WINDOW_US, "us")
    want = {}
    for _, p in df[df["event_type"] == "purchase"].iterrows():
        c = df[
            (df["event_type"] == "click")
            & (df["user_id"] == p["user_id"])
            & (df["ts"] > p["ts"])
            & (df["ts"] <= p["ts"] + w)
        ]
        want[int(p["event_id"])] = len(c)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(event_frames())
def test_sessions_bucket_matches_per_user(df):
    from ocr_machine_ray.pipelines.queries_relational import (
        SESSION_GAP_MIN,
        sessions_bucket,
    )

    got = (
        sessions_bucket(df[["user_id", "ts"]])
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    gap = np.timedelta64(SESSION_GAP_MIN, "m")
    rows = []
    for u in sorted(df["user_id"].unique()):
        ts = np.sort(df.loc[df["user_id"] == u, "ts"].to_numpy())
        sid = 0
        start = None
        for i, t in enumerate(ts):
            if start is None or t - ts[i - 1] > gap:
                if start is not None:
                    rows.append((u, sid, n, start, ts[i - 1]))
                sid += 1
                start, n = t, 0
            n += 1
        rows.append((u, sid, n, start, ts[-1]))
    want = pd.DataFrame(
        rows,
        columns=[
            "user_id", "session_id", "n_events",
            "session_start", "session_end",
        ],
    )
    want["user_id"] = want["user_id"].astype(np.int64)
    want["session_id"] = want["session_id"].astype(np.int64)
    want["n_events"] = want["n_events"].astype(np.int64)
    want["session_start"] = want["session_start"].astype(df["ts"].dtype)
    want["session_end"] = want["session_end"].astype(df["ts"].dtype)
    pd.testing.assert_frame_equal(got, want)
