"""Custom relational operators: as-of join tie-breaks, rolling-window
edges, deterministic sampling (extras/relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from fuzzy_matching_ray.extras.relational import (
    asof_join,
    hash_sample,
    rolling_window_stats,
)


def test_asof_join_backward_with_ties(ray_session):
    t = pd.Timestamp("2024-01-01")
    left = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([7, 7, 7, 9], pa.int64()),
                "ts": pa.array([t, t + pd.Timedelta(days=2), t + pd.Timedelta(days=9),
                                t + pd.Timedelta(days=1)]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([7, 7, 7, 8], pa.int64()),
                # two orders on the SAME date → tie broken by max key
                "o_orderdate": pa.array(
                    [t + pd.Timedelta(days=1), t + pd.Timedelta(days=1),
                     t + pd.Timedelta(days=5), t]
                ),
                "o_orderkey": pa.array([100, 200, 150, 999], pa.int64()),
            }
        )
    )
    out = (
        asof_join(
            left, right,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            right_val="o_orderkey", out_val="last_orderkey",
            left_cols=["event_id", "user_id"], num_partitions=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out.event_id, out.last_orderkey))
    assert np.isnan(got[1])          # no order before the event
    assert got[2] == 200             # date tie → max orderkey wins
    assert got[3] == 150             # latest date wins over earlier tie
    assert np.isnan(got[4])          # user 9 has no orders at all


def test_rolling_window_count_and_max(ray_session):
    t = pd.Timestamp("2024-01-01")
    ev = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(list(range(6)), pa.int64()),
                "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
                "ts": pa.array([t + pd.Timedelta(minutes=i) for i in range(6)]),
                "value": pa.array([5.0, 1.0, 9.0, 2.0, 3.0, 7.0], pa.float64()),
            }
        )
    )
    out = (
        rolling_window_stats(ev, window=3, num_partitions=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.n_window.tolist() == [1, 2, 3, 3, 3, 1]
    assert out.max_value.tolist() == [5.0, 5.0, 9.0, 9.0, 9.0, 7.0]


def test_hash_sample_deterministic(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(1000)), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(1000)], pa.string()),
            }
        )
    )
    a = hash_sample(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = hash_sample(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # pure function of the id
    # rate ≈ 0x33/256 ≈ 19.9%
    assert 0.14 < len(a) / 1000 < 0.26
    import hashlib

    assert all(hashlib.md5(str(i).encode()).hexdigest()[:2] < "33" for i in a.doc_id)


def test_sessionize_gap_edges(ray_session):
    from fuzzy_matching_ray.extras.relational import sessionize

    t = pd.Timestamp("2024-03-01")
    s = pd.Timedelta(seconds=1)
    events = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 9, 9, 9], pa.int64()),
                "ts": pa.array(
                    [
                        t,
                        t + 1800 * s,                       # gap == 1800s → SAME session
                        t + 3600 * s + pd.Timedelta(microseconds=1800_000_001),  # > 1800s → new
                        t + 3600 * s + pd.Timedelta(microseconds=1800_000_001),  # tie ts, id order
                        t,
                        t + 5000 * s,                       # new session
                        t + 5001 * s,
                    ]
                ),
            }
        )
    )
    out = (
        sessionize(events, gap_seconds=1800, num_partitions=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out.event_id, out.session_id))
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 2, 7: 2}
    assert out.session_id.dtype == np.int64


def test_grouped_topk_matches_window_rank(ray_session):
    from fuzzy_matching_ray.extras.relational import grouped_topk

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 200, n).astype(np.int64),
            "v": np.round(rng.random(n) * 10, 1),  # plenty of value ties
            "i": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        grouped_topk(
            rd.from_pandas(df), key="g", val="v", tiebreak="i", k=3, num_partitions=8
        )
        .to_pandas()
        .sort_values(["g", "rk"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "v", "i"], ascending=[True, False, True]).groupby("g").head(3)
    exp = exp.reset_index(drop=True)
    exp["rk"] = exp.groupby("g").cumcount() + 1
    pd.testing.assert_frame_equal(out[["g", "v", "i", "rk"]], exp[["g", "v", "i", "rk"]])


def test_grouped_topk_partial_combiner_prunes(ray_session):
    """The pre-shuffle combiner must keep ≤ k rows per key per batch
    without losing any global winner (single-batch worst case)."""
    from fuzzy_matching_ray.extras.relational import grouped_topk

    df = pd.DataFrame(
        {
            "g": np.zeros(10, dtype=np.int64),
            "v": np.arange(10, dtype=np.float64),
            "i": np.arange(10, dtype=np.int64),
        }
    )
    out = (
        grouped_topk(rd.from_pandas(df), key="g", val="v", tiebreak="i", k=2)
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    assert out.v.tolist() == [9.0, 8.0] and out.rk.tolist() == [1, 2]


def test_stratified_sample_rates_and_determinism(ray_session):
    import hashlib

    import ray.data as rd

    from fuzzy_matching_ray.extras.relational import stratified_sample

    rows = [
        {"doc_id": i, "lang": ["en", "zh"][i % 2], "text": f"t{i}"} for i in range(400)
    ]
    ds = rd.from_items(rows)
    out = stratified_sample(
        ds, rates={"en": "cc"}, default_rate="0c"
    ).to_pandas()
    # membership is exactly the md5-prefix contract per group
    for r in rows:
        thr = "cc" if r["lang"] == "en" else "0c"
        expect = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2] < thr
        assert (r["doc_id"] in set(out.doc_id)) == expect
    # en rate ~80%, zh rate ~5%
    n_en = (out.lang == "en").sum()
    n_zh = (out.lang == "zh").sum()
    assert n_en > 120 and n_zh < 30

    with pytest.raises(ValueError):
        stratified_sample(ds, rates={"en": "ZZ"})


def test_weighted_mix_multiplicity_and_copy_idx(ray_session):
    """Every row's emission count must equal the serial md5 contract
    (int weight + fractional top-up), copies numbered 0..n-1."""
    import hashlib

    from fuzzy_matching_ray.extras.relational import weighted_mix

    rows = [
        {"doc_id": i, "source": ["a", "b", "c", "d"][i % 4], "text": f"t{i}"}
        for i in range(400)
    ]
    weights = {"a": (3, "66"), "b": (0, "80"), "c": (2, "00")}
    out = weighted_mix(
        rd.from_items(rows).repartition(4),
        group_col="source",
        weights=weights,
        default_weight=(1, "19"),
        cols=("doc_id", "source", "text"),
    ).to_pandas()
    got = out.groupby("doc_id")["copy_idx"].agg(["count", "min", "max"])
    for r in rows:
        n_int, thr = weights.get(r["source"], (1, "19"))
        frac = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2] < thr
        expect = n_int + int(frac)
        if expect == 0:
            assert r["doc_id"] not in got.index
        else:
            g = got.loc[r["doc_id"]]
            assert g["count"] == expect and g["min"] == 0 and g["max"] == expect - 1
    # exact-integer weight: source c is exactly doubled
    assert (out.source == "c").sum() == 2 * sum(r["source"] == "c" for r in rows)

    with pytest.raises(ValueError):
        weighted_mix(rd.from_items(rows), weights={"a": (1, "XX")})
    with pytest.raises(ValueError):
        weighted_mix(rd.from_items(rows), weights={"a": (-1, "00")})
