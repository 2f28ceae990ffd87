"""Relational custom operators Ray Data lacks natively (build-brief
examples: as-of join, windowed aggregate, deterministic sampling) —
each expressed as a bucketed single-shuffle transform with an exact
ANSI-SQL oracle (``__ray_entry__.oracle_sql``).

Partitioning assumption (documented per the brief): both the as-of
join and the rolling window co-locate rows by their key's hash bucket
— one shuffle, vectorized pandas kernels per bucket (``merge_asof`` /
``rolling``), no per-group Python calls."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
    out_val: str,
    left_cols: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Backward as-of join: for every left row, the ``right_val`` of
    the latest right row with ``right_ts <= left_ts`` and matching key
    (ties on ``right_ts`` broken by max ``right_val`` — the same total
    order an ``ORDER BY ts DESC, val DESC LIMIT 1`` lateral uses).

    Left and right rows are co-partitioned by ``hash(key) % P`` and
    merged per bucket with ``pd.merge_asof`` — one shuffle, no
    broadcast of either side (both may be large)."""

    from fuzzy_matching_ray.stages.verify import _pad_column

    left_schema = left.schema()
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def _left_rows(b: pa.Table) -> pa.Table:
        cols = {"key": b[left_key].cast(pa.int64()), "_side": pa.array([0] * b.num_rows, pa.int8())}
        for c in left_cols:
            cols["l_" + c] = b[c]
        cols["_ts"] = b[left_ts]
        # zero-filled, not null: null int64 columns round-trip through
        # pandas as float64 (see stages/verify._pad_column)
        cols["_val"] = _pad_column(pa.int64(), b.num_rows)
        return pa.table(cols)

    def _right_rows(b: pa.Table, names=tuple(left_cols)) -> pa.Table:
        cols = {"key": b[right_key].cast(pa.int64()), "_side": pa.array([1] * b.num_rows, pa.int8())}
        for c in names:
            cols["l_" + c] = _pad_column(left_types[c], b.num_rows)
        cols["_ts"] = b[right_ts]
        cols["_val"] = b[right_val].cast(pa.int64())
        return pa.table(cols)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        lv = df[df["_side"] == 0]
        rv = df[df["_side"] == 1]
        out_cols = ["l_" + c for c in left_cols]
        if lv.empty:
            out = lv[out_cols].copy()
            out.columns = left_cols
            out[out_val] = pd.Series(dtype="Int64")
            return out
        lv = lv.sort_values("_ts", kind="mergesort")
        if rv.empty:
            out = lv[out_cols].copy()
            out.columns = left_cols
            out[out_val] = pd.Series(pd.NA, index=out.index, dtype="Int64")
            return out
        rv = rv.sort_values(["_ts", "_val"], kind="mergesort")
        merged = pd.merge_asof(
            lv[["key", "_ts"] + out_cols],
            rv[["key", "_ts", "_val"]],
            on="_ts",
            by="key",
            direction="backward",
        )
        out = merged[out_cols].copy()
        out.columns = left_cols
        # nullable Int64, not float64: the oracle's LATERAL join yields
        # int64-with-NULL and the driver's value hash sees 123.0 != 123
        # (pandas Int64 -> Arrow int64+nulls via from_pandas in
        # bucketed_group_apply)
        out[out_val] = merged["_val"].astype("Int64")
        return out

    rows = left.map_batches(_left_rows, batch_format="pyarrow").union(
        right.map_batches(_right_rows, batch_format="pyarrow")
    )
    return bucketed_group_apply(rows, "key", _merge, num_partitions)


def rolling_window_stats(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    id_col: str = "event_id",
    window: int = 4,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-key rolling-window aggregate over time order:
    ``(id, key, n_window, max_value)`` where the window is the current
    row plus the ``window-1`` preceding rows (``ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW``).  Count and max only — both are exact
    under floating point, so the SQL oracle hashes identically
    (a rolling SUM drifts between pandas' sliding accumulator and the
    oracle's per-window sums)."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b[id_col].cast(pa.int64()),
                "key": b[key].cast(pa.int64()),
                "ts": b[ts],
                "val": b[val].cast(pa.float64()),
            }
        )

    slim = events.map_batches(_prep, batch_format="pyarrow")

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        # id as final tiebreak: a bare [key, ts] mergesort is stable on
        # post-shuffle arrival order, which is nondeterministic across
        # runs when timestamps tie within a key (oracle mirrors with
        # ORDER BY ts, event_id)
        df = df.sort_values(["key", "ts", "id"], kind="mergesort")
        g = df.groupby("key", sort=False)
        n_window = (g.cumcount().clip(upper=window - 1) + 1).astype("int64")
        max_val = g["val"].rolling(window, min_periods=1).max().to_numpy()
        return pd.DataFrame(
            {
                id_col: df["id"].to_numpy(),
                key: df["key"].to_numpy(),
                "n_window": n_window.to_numpy(),
                "max_value": max_val,
            }
        )

    return bucketed_group_apply(slim, "key", _roll, num_partitions)


def sessionize(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Gap-based sessionization: per key, events ordered by
    ``(ts, id)`` belong to the same session until a gap strictly
    greater than ``gap_seconds`` opens a new one; sessions are
    numbered 1.. per key.  The training-data staple for turning an
    event log into per-session documents.

    One shuffle (co-partition by ``hash(key) % P``), then a fully
    vectorized per-bucket kernel: global cumsum of new-session flags
    minus a per-key base — no per-group Python.  Gap comparison is in
    microseconds on both sides (the SQL oracle mirrors with
    ``date_diff('microsecond', ...)``) so sub-second gaps can't
    straddle a truncation boundary between engines."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b[id_col].cast(pa.int64()),
                "key": b[key].cast(pa.int64()),
                "ts": b[ts],
            }
        )

    gap_us = int(gap_seconds) * 1_000_000

    def _sess(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    key: pd.Series(dtype="int64"),
                    "session_id": pd.Series(dtype="int64"),
                }
            )
        # id as final tiebreak: deterministic under nondeterministic
        # post-shuffle arrival order when timestamps tie within a key
        df = df.sort_values(["key", "ts", "id"], kind="mergesort")
        keys = df["key"].to_numpy()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        np.not_equal(keys[1:], keys[:-1], out=new_key[1:])
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = 0
        np.subtract(ts_us[1:], ts_us[:-1], out=gap[1:])
        new_sess = new_key | (gap > gap_us)
        cum = np.cumsum(new_sess)
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, len(df)))
        base = np.repeat(cum[starts], counts)
        return pd.DataFrame(
            {
                id_col: df["id"].to_numpy(),
                key: keys,
                "session_id": (cum - base + 1).astype(np.int64),
            }
        )

    slim = events.map_batches(_prep, batch_format="pyarrow")
    return bucketed_group_apply(slim, "key", _sess, num_partitions)


def session_stats(
    events: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Session-level rollup in the SAME shuffle as sessionization:
    ``(key, session_id, n_events, span_us, first_event_id)`` — the
    event log → per-session documents step.  Identical session
    boundaries to :func:`sessionize` (µs gap compare, ``(ts, id)``
    tiebreak); the rollup is a vectorized segment reduction inside the
    bucket, so turning 10⁹ events into sessions costs exactly one
    exchange, not sessionize + a second groupby."""
    gap_us = np.int64(gap_seconds) * np.int64(1_000_000)

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"id": b[id_col].cast(pa.int64()), "key": b[key], "ts": b[ts]}
        )

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    key: pd.Series(dtype=object),
                    "session_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "span_us": pd.Series(dtype="int64"),
                    "first_event_id": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["key", "ts", "id"], kind="mergesort")
        keys = df["key"].to_numpy()
        ids = df["id"].to_numpy()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        np.not_equal(keys[1:], keys[:-1], out=new_key[1:])
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = 0
        np.subtract(ts_us[1:], ts_us[:-1], out=gap[1:])
        new_sess = new_key | (gap > gap_us)
        s_start = np.flatnonzero(new_sess)
        s_end = np.append(s_start[1:], len(df))
        cum = np.cumsum(new_sess)
        k_start = np.flatnonzero(new_key)
        base = np.repeat(cum[k_start], np.diff(np.append(k_start, len(df))))
        return pd.DataFrame(
            {
                key: keys[s_start],
                "session_id": (cum[s_start] - base[s_start] + 1).astype(np.int64),
                "n_events": (s_end - s_start).astype(np.int64),
                "span_us": (ts_us[s_end - 1] - ts_us[s_start]).astype(np.int64),
                "first_event_id": ids[s_start].astype(np.int64),
            }
        )

    slim = events.map_batches(_prep, batch_format="pyarrow")
    return bucketed_group_apply(slim, "key", _roll, num_partitions)


def grouped_topk(
    ds: ray.data.Dataset,
    *,
    key: str,
    val: str,
    tiebreak: str,
    k: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group top-k by ``val`` (descending, ties broken by
    ``tiebreak`` ascending), with a 1-based ``rk`` rank column —
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY val DESC,
    tiebreak) <= k``.

    Scale shape: a *partial top-k combiner* runs inside
    ``map_batches`` BEFORE the shuffle — each batch keeps at most
    ``k`` rows per key it contains (the global top-k per key is a
    subset of every batch-local top-k), so the all-to-all exchange
    carries ≤ k·groups rows instead of the full table.  The same
    vectorized sort + ``groupby().head(k)`` kernel then finalizes per
    bucket and attaches ranks via ``cumcount``."""

    cols = [key, val, tiebreak]

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].sort_values(
            [key, val, tiebreak], ascending=[True, False, True], kind="mergesort"
        )
        return df.groupby(key, sort=False).head(k)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = _local(df)
        rk = df.groupby(key, sort=False).cumcount().to_numpy() + 1
        out = df.reset_index(drop=True)
        out["rk"] = rk.astype(np.int64)
        return out

    pruned = ds.map_batches(_local, batch_format="pandas")
    return bucketed_group_apply(pruned, key, _final, num_partitions)


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    low_seconds: int,
    high_seconds: int = 0,
    upper_exclusive: bool = True,
    out_left: str = "left_id",
    out_right: str = "right_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Equi+range (interval) join: emit ``(out_left, out_right)`` for
    every pair with matching key and ``right_ts`` inside
    ``[left_ts - low_seconds, left_ts + high_seconds]`` (upper bound
    strict when ``upper_exclusive`` — the self-join "preceding
    window" form excludes the row itself that way).

    Both sides are co-partitioned by ``hash(key) % P`` in ONE shuffle
    (no broadcast — either side may be large); per bucket a C-level
    hash equi-join on the key produces per-key candidate pairs which
    the vectorized interval mask then filters.  The intermediate is
    Σ_k |L_k|·|R_k| *within the bucket* — fine for bounded per-key
    fan-out (the common case: events per user per window); a key hot
    enough to blow that product up needs the same salting/budget
    treatment the dedup channels apply (`stages/minhash.py` pair
    budgets) and is intentionally out of scope here."""

    def _l_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b[left_key].cast(pa.int64()),
                "_side": pa.array([0] * b.num_rows, pa.int8()),
                "_id": b[left_id].cast(pa.int64()),
                "_ts": b[left_ts],
            }
        )

    def _r_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b[right_key].cast(pa.int64()),
                "_side": pa.array([1] * b.num_rows, pa.int8()),
                "_id": b[right_id].cast(pa.int64()),
                "_ts": b[right_ts],
            }
        )

    low_us = int(low_seconds) * 1_000_000
    high_us = int(high_seconds) * 1_000_000

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        lv = df[df["_side"] == 0]
        rv = df[df["_side"] == 1]
        if lv.empty or rv.empty:
            return pd.DataFrame(
                {
                    out_left: pd.Series(dtype="int64"),
                    out_right: pd.Series(dtype="int64"),
                }
            )
        m = lv[["key", "_id", "_ts"]].merge(
            rv[["key", "_id", "_ts"]], on="key", suffixes=("_l", "_r")
        )
        lt = m["_ts_l"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rt = m["_ts_r"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ok = rt >= lt - low_us
        if upper_exclusive:
            ok &= rt < lt + high_us
        else:
            ok &= rt <= lt + high_us
        return pd.DataFrame(
            {
                out_left: m["_id_l"].to_numpy()[ok],
                out_right: m["_id_r"].to_numpy()[ok],
            }
        )

    rows = left.map_batches(_l_rows, batch_format="pyarrow").union(
        right.map_batches(_r_rows, batch_format="pyarrow")
    )
    return bucketed_group_apply(rows, "key", _join, num_partitions)


def dedup_event_bursts(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 60,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Event-log burst dedup: within each ``(user, type)`` stream
    ordered by ``(ts, id)``, keep an event only when the previous one
    is more than ``gap_seconds`` older (the first of every burst
    survives; double-clicks / retry storms collapse).  Equal-timestamp
    repeats always collapse.  Gap compare is in microseconds on both
    sides, mirroring :func:`sessionize`.

    One user-bucketed shuffle; per-bucket kernel is one sort plus a
    vectorized shift-compare — no per-stream Python."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b[id_col],
                "u": b[user_col],
                "t": b[type_col],
                "ts": b[ts_col],
            }
        )

    slim = ds.map_batches(_prep, batch_format="pyarrow")
    gap_td = pd.Timedelta(seconds=gap_seconds)

    def _burst(df: pd.DataFrame) -> pd.DataFrame:
        cols = {id_col: "id", user_col: "u", type_col: "t", ts_col: "ts"}
        if df.empty:
            return pd.DataFrame({k: pd.Series(dtype=object) for k in cols})
        df = df.sort_values(["u", "t", "ts", "id"], kind="mergesort")
        same = df["u"].eq(df["u"].shift()) & df["t"].eq(df["t"].shift())
        # Timedelta compare is tick-unit-safe (pandas may hand us ns
        # or µs resolution depending on version); source precision is
        # µs, so strict-greater matches the SQL date_diff('microsecond')
        gap_ok = (df["ts"] - df["ts"].shift()) > gap_td
        keep = (~same) | gap_ok.fillna(False)
        out = df[keep.to_numpy()]
        return pd.DataFrame(
            {k: out[v].to_numpy() for k, v in cols.items()}
        )

    return bucketed_group_apply(slim, "u", _burst, num_partitions)


def funnel_stages(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Ordered funnel analysis: ``(user, n_stages)`` where stage *k*
    counts as reached iff an event of ``stages[k]`` occurs at-or-after
    the time stage *k−1* was first reached (min-timestamp semantics
    throughout, so the result is row-order independent and the SQL
    mirror — chained ``min(ts) … WHERE ts >= prev`` joins — hashes
    identically).

    One user-bucketed shuffle carrying only ``(user, type, ts)`` rows
    pre-filtered to funnel stages; inside each bucket the per-stage
    reach times are ``len(stages)`` vectorized masked groupby-mins, no
    per-user Python."""
    stage_list = list(stages)

    def _prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(b[type_col], value_set=pa.array(stage_list))
        b = b.filter(keep)
        return pa.table(
            {
                "u": b[user_col],
                "t": b[type_col],
                "ts": b[ts_col],
            }
        )

    slim = ds.map_batches(_prep, batch_format="pyarrow")

    def _funnel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    user_col: pd.Series(dtype=object),
                    "n_stages": pd.Series(dtype="int64"),
                }
            )
        users = pd.Series(df["u"].unique())
        n_stages = pd.Series(0, index=users, dtype="int64")
        prev: pd.Series | None = None  # user → reach time of prior stage
        for i, st in enumerate(stage_list):
            sub = df[df["t"] == st]
            if prev is not None:
                bound = sub["u"].map(prev)
                sub = sub[bound.notna() & (sub["ts"] >= bound)]
            if sub.empty:
                break
            cur = sub.groupby("u")["ts"].min()
            n_stages.loc[cur.index] = i + 1
            prev = cur
        return pd.DataFrame(
            {user_col: users.to_numpy(), "n_stages": n_stages.to_numpy(np.int64)}
        )

    return bucketed_group_apply(slim, "u", _funnel, num_partitions)


def grouped_quantiles(
    ds: ray.data.Dataset,
    *,
    key: str,
    val: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    out_names: tuple[str, ...] = ("p25", "p50", "p90"),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group exact DISCRETE quantiles (``quantile_disc`` /
    ``percentile_disc`` semantics: the element at rank ``ceil(q·n)``
    of the sorted group) plus the group count — float-exact, because
    the output is an actual member value, never an interpolation, so
    the SQL oracle hashes identically.

    One shuffle co-partitions groups by ``hash(key) % P``; the bucket
    kernel is one global sort + vectorized per-group rank picks (no
    per-group Python).  A single group too large for one bucket would
    need distributed selection (sample → count → refine) — out of
    scope; groups here are event types / categories, i.e. many groups
    of moderate size."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({"key": b[key].cast(pa.string()), "val": b[val].cast(pa.float64())})

    qarr = np.asarray(qs, dtype=np.float64)

    def _quant(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = {key: pd.Series(dtype=object)}
            for nm in out_names:
                cols[nm] = pd.Series(dtype="float64")
            cols["n"] = pd.Series(dtype="int64")
            return pd.DataFrame(cols)
        df = df.sort_values(["key", "val"], kind="mergesort")
        keys = df["key"].to_numpy()
        vals = df["val"].to_numpy()
        newk = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(newk)
        counts = np.diff(np.append(starts, len(df)))
        # rank ceil(q*n) - 1 within each group, offset by group start;
        # clamp the rank to ≥1 so q=0 picks the group MIN (DuckDB
        # percentile_disc(0) semantics) instead of wrapping to the
        # previous group's max via index -1
        ranks = np.maximum(
            np.ceil(qarr[None, :] * counts[:, None]).astype(np.int64), 1
        )
        picks = starts[:, None] + ranks - 1
        out = {key: keys[starts]}
        for j, nm in enumerate(out_names):
            out[nm] = vals[picks[:, j]]
        out["n"] = counts.astype(np.int64)
        return pd.DataFrame(out)

    slim = ds.map_batches(_prep, batch_format="pyarrow")
    return bucketed_group_apply(slim, "key", _quant, num_partitions)


def hash_sample(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    cols: tuple[str, ...] | None = ("doc_id", "text"),
    hex_threshold: str = "33",
) -> ray.data.Dataset:
    """Deterministic content-addressed sample: keep rows whose
    ``md5(str(id))`` hex digest starts below ``hex_threshold``
    (two hex chars → rate ≈ int(threshold,16)/256; '33' ≈ 19.9%).
    Unlike seeded ``random_sample``, membership is a pure function of
    the id — stable across runs, partitionings and engines, so the
    same expression reproduces the sample in SQL (or any other
    system) exactly."""

    # a 2-lowercase-hex-char threshold compares identically as a byte
    # (hex digits sort lexicographically = numerically), unlocking the
    # vectorized single-block MD5 kernel; anything else falls back to
    # the literal per-row hexdigest-prefix compare
    import string

    vec_ok = len(hex_threshold) == 2 and all(
        ch in string.digits + "abcdef" for ch in hex_threshold
    )
    thr_byte = int(hex_threshold, 16) if vec_ok else None

    def _filter(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        if vec_ok:
            from fuzzy_matching_ray.hashing import md5_leading_byte

            keep = md5_leading_byte(ids) < thr_byte
        else:
            keep = np.fromiter(
                (
                    hashlib.md5(str(i).encode()).hexdigest()[:2] < hex_threshold
                    for i in ids
                ),
                dtype=bool,
                count=len(ids),
            )
        # cols=None keeps every column, resolved per batch (reading
        # the schema off the batch is free; ds.schema() on a lazy
        # dataset would force an extra upstream execution)
        keep_cols = b.column_names if cols is None else cols
        return pa.table({c: b[c].filter(pa.array(keep)) for c in keep_cols})

    return ds.map_batches(_filter, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str = "lang",
    rates: dict[str, str] | None = None,
    default_rate: str = "00",
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("doc_id", "lang", "text"),
) -> ray.data.Dataset:
    """Per-group deterministic sampling (domain mixing): keep rows
    whose ``md5(str(id))`` hex prefix falls below the GROUP's
    2-hex-char threshold — e.g. upsample `en` at 80% while keeping
    `zh` at 12%.  Same content-addressed md5 contract as
    :func:`hash_sample`, so membership is a pure function of
    ``(id, group)``: stable across runs, partitionings and engines,
    and reproducible in SQL as a ``CASE``-selected prefix compare.
    A training-data mixer's core primitive: zero shuffles, streams."""
    rates = rates or {}
    import string

    for t in (*rates.values(), default_rate):
        if len(t) != 2 or any(ch not in string.digits + "abcdef" for ch in t):
            raise ValueError(f"rates must be 2 lowercase hex chars, got {t!r}")

    def _filter(b: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import md5_leading_byte

        byte = md5_leading_byte(b[id_col].to_pylist())
        groups = b[group_col].to_numpy(zero_copy_only=False)
        thr = np.full(byte.size, int(default_rate, 16), dtype=np.int16)
        for g, t in rates.items():
            thr[groups == g] = int(t, 16)
        keep = pa.array(byte < thr)
        return pa.table({c: b[c].filter(keep) for c in cols})

    return ds.map_batches(_filter, batch_format="pyarrow")


def weighted_mix(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    weights: dict[str, tuple[int, str]] | None = None,
    default_weight: tuple[int, str] = (1, "00"),
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("doc_id", "source", "text"),
) -> ray.data.Dataset:
    """Deterministic mixture resampling WITH upsampling — the other
    half of a training-data mixer (:func:`stratified_sample` is the
    downsampling half).  Each row is emitted ``n + [md5_byte(id) <
    frac_threshold]`` times where ``(n, frac_threshold)`` is its
    group's weight: ``('wiki', (3, '66'))`` ≈ weight 3.4 (every wiki
    doc 3×, plus a content-addressed 0x66/256 ≈ 39.8 % of them a 4th
    time).  Repeats carry ``copy_idx`` 0..k-1 so downstream shuffles
    keep the copies distinct.  Membership and multiplicity are pure
    functions of ``(id, group)`` — stable across runs, partitionings
    and engines, reproducible in SQL as a lateral ``generate_series``
    over the same md5-prefix compare.  Zero shuffles; the expansion
    happens inside each batch (Arrow ``take`` on a repeated index —
    no per-row Python), so output blocks grow by at most
    ``max(weight)+1`` and stream through backpressure like any other
    map stage."""
    weights = weights or {}
    import string

    for n_int, t in (*weights.values(), default_weight):
        if n_int < 0:
            raise ValueError(f"integer weight must be >= 0, got {n_int}")
        if len(t) != 2 or any(ch not in string.digits + "abcdef" for ch in t):
            raise ValueError(f"frac threshold must be 2 lowercase hex chars, got {t!r}")

    def _expand(b: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import md5_leading_byte

        byte = md5_leading_byte(b[id_col].to_pylist())
        groups = b[group_col].to_numpy(zero_copy_only=False)
        base = np.full(byte.size, default_weight[0], dtype=np.int64)
        thr = np.full(byte.size, int(default_weight[1], 16), dtype=np.int16)
        for g, (n_int, t) in weights.items():
            sel = groups == g
            base[sel] = n_int
            thr[sel] = int(t, 16)
        counts = base + (byte < thr)
        idx = np.repeat(np.arange(byte.size, dtype=np.int64), counts)
        # copy_idx = position within each row's run of repeats
        starts = np.zeros(byte.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        copy_idx = np.arange(idx.size, dtype=np.int64) - starts[idx]
        out = b.select(list(cols)).take(pa.array(idx))
        return out.append_column("copy_idx", pa.array(copy_idx, pa.int64()))

    return ds.map_batches(_expand, batch_format="pyarrow")
