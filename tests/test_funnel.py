"""funnel_stages: ordering semantics — a click BEFORE the first view
must not count, an equal-timestamp event must (>=), and stages must
chain off the FIRST qualifying reach time."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.relational import funnel_stages


def _ts(s):
    return pd.Timestamp(f"2026-01-01 00:00:{s:02d}")


def test_dedup_event_bursts():
    from fuzzy_matching_ray.extras.relational import dedup_event_bursts

    rows = [
        # u1 click burst: 0s, 30s (dropped), 95s (kept: >60s after 30s)
        (1, "u1", "click", 0), (2, "u1", "click", 30), (3, "u1", "click", 95),
        # same ts repeats collapse; id tiebreak keeps the smaller id
        (4, "u1", "view", 10), (5, "u1", "view", 10),
        # different type is an independent stream
        (6, "u2", "click", 0), (7, "u2", "view", 1),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": [_ts_sec(r[3]) for r in rows],
        }
    )
    out = dedup_event_bursts(rd.from_pandas(df).repartition(3), num_partitions=4)
    kept = sorted(out.to_pandas()["event_id"].tolist())
    assert kept == [1, 3, 4, 6, 7]


def _ts_sec(s):
    return pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=s)


def test_funnel_order_and_ties():
    rows = [
        # u1: full ordered funnel
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        # u2: click precedes the only view → stage 1 only
        ("u2", "click", 1), ("u2", "view", 2),
        # u3: click at the SAME ts as first view counts (>=)
        ("u3", "view", 5), ("u3", "click", 5),
        # u4: purchase before click → stuck at 2
        ("u4", "view", 1), ("u4", "purchase", 2), ("u4", "click", 3),
        # u5: only non-funnel events → excluded entirely
        ("u5", "error", 1),
        # u6: second view is later; click after FIRST view qualifies
        ("u6", "view", 1), ("u6", "view", 9), ("u6", "click", 4),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": [_ts(r[2]) for r in rows],
        }
    )
    out = (
        funnel_stages(rd.from_pandas(df).repartition(3), num_partitions=4)
        .to_pandas()
        .set_index("user_id")["n_stages"]
        .sort_index()
    )
    assert out.to_dict() == {"u1": 3, "u2": 1, "u3": 2, "u4": 2, "u6": 2}


def test_session_stats_boundaries_match_sessionize():
    """Rollup counts must agree with the sessionize labels, and span
    is max-min within the session (µs)."""
    from fuzzy_matching_ray.extras.relational import session_stats, sessionize

    rows = []
    eid = 0
    for u, secs in ((1, [0, 10, 4000, 4005]), (2, [0])):
        for s in secs:
            rows.append((eid, u, _ts_sec(s)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    ds = rd.from_pandas(df)
    stats = (
        session_stats(ds, gap_seconds=1800, num_partitions=2)
        .to_pandas()
        .set_index(["user_id", "session_id"])
        .sort_index()
    )
    # u1: sessions {0,10} and {4000,4005}; u2: one singleton
    assert stats.loc[(1, 1)].tolist() == [2, 10_000_000, 0]
    assert stats.loc[(1, 2)].tolist() == [2, 5_000_000, 2]
    assert stats.loc[(2, 1)].tolist() == [1, 0, 4]
    # label agreement
    lab = sessionize(ds, key="user_id", ts="ts", id_col="event_id").to_pandas()
    sizes = lab.groupby(["user_id", "session_id"]).size()
    assert sizes.to_dict() == stats["n_events"].to_dict()
