"""Aggregation operators built on map-side partial combining.

``token_heavy_hitters`` — EXACT global token frequencies above a
threshold.  The scale pattern is the point: each batch pre-aggregates
its own token counts (``value_counts``), so the all-to-all exchange
carries one row per *distinct token per batch* instead of one row per
token occurrence — on natural-language data that's a 10-100×
reduction before the only shuffle.  The final per-bucket sum and the
``HAVING``-style filter are exact, so the DuckDB oracle hashes
identically.

``approx_ndistinct`` — per-group distinct-count estimate via a
HyperLogLog sketch (Flajolet et al. 2007).  Per-batch sketches merge
associatively (register-wise max), so the exchange carries one
``2^p``-byte sketch per (group, batch) — constant per group, never
the values.  Approximate by construction: verified by a pytest
relative-error gate against the exact count, not a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply


def token_heavy_hitters(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 100,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact ``(token, n)`` for whitespace-lowered tokens with global
    count ≥ ``min_count``."""

    def _partial(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow combiner: lower→split→flatten→value_counts
        # are all C++ kernels; no pandas object conversion per batch
        import pyarrow.compute as pc

        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(batch[text_col], "")))
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["n"].sum()
        g = g[g >= min_count]
        return pd.DataFrame({"token": g.index.to_numpy(dtype=object), "n": g.to_numpy(np.int64)})

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_group_apply(partial, "token", _final, num_partitions)


def grouped_top_tokens(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    text_col: str = "text",
    k: int = 10,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-``k`` tokens per group by exact global count —
    ``(group, token, n, term_rank)`` with ties broken token-ASC.  The
    per-domain vocabulary profile a corpus-mixing pipeline reports.

    Two-level exact aggregation, combiner-first like
    :func:`token_heavy_hitters`: batches emit ``(group, token, n)``
    partials (one row per distinct pair per batch), a token-keyed
    bucket sums them globally, and a second tiny group-keyed pass —
    cardinality = distinct tokens per group, not occurrences — picks
    the top ``k`` vectorized."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        toks = (
            batch[text_col].fillna("").astype(str).str.lower().str.split().explode()
        )
        toks = toks[toks.notna() & (toks != "")]
        if toks.empty:
            # typed empty frame: an all-float64 empty block refuses to
            # schema-merge with the real (string,string,int64) blocks
            return pd.DataFrame(
                {
                    "grp": pd.Series(dtype=object),
                    "token": pd.Series(dtype=object),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        g = (
            pd.DataFrame(
                {
                    # NULL groups fold to '' so no row silently
                    # vanishes (pandas groupby drops NaN keys)
                    "grp": batch[group_col]
                    .reindex(toks.index)
                    .fillna("")
                    .to_numpy(dtype=object),
                    "token": toks.to_numpy(dtype=object),
                }
            )
            .groupby(["grp", "token"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["grp", "token"], sort=False)["n"].sum().reset_index()
        )

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["grp", "n", "token"], ascending=[True, False, True], kind="mergesort"
        )
        top = df.groupby("grp", sort=False).head(k).copy()
        top["term_rank"] = top.groupby("grp", sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                group_col: top["grp"].to_numpy(dtype=object),
                "token": top["token"].to_numpy(dtype=object),
                "n": top["n"].to_numpy(np.int64),
                "term_rank": top["term_rank"].to_numpy(np.int64),
            }
        )

    partial = ds.map_batches(_partial, batch_format="pandas")
    summed = bucketed_group_apply(partial, "token", _sum, num_partitions)
    return bucketed_group_apply(summed, "grp", _topk, 8)


def pivot_counts(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    pivot_col: str,
    categories: tuple[str, ...],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Wide pivot: one row per ``key_col`` with a count column per
    ``categories`` value of ``pivot_col`` plus ``n_total`` — the
    feature-vector layout (user × event-type counts) a training
    pipeline derives from event logs.

    Scale shape: each batch pre-aggregates ``(key, pivot, n)`` (one
    row per distinct pair per batch), so the single shuffle carries
    pair-counts, never events; the per-bucket pivot is an ``unstack``
    over already-combined counts.  Unlisted pivot values — including
    NULL, which is folded to '' so the row is not dropped — still
    count toward ``n_total`` (mirroring SQL ``count(*)``); rows with
    a NULL *key* are dropped (grouping keys are non-null by the
    table contracts here — a NULL-keyed mirror would need
    ``dropna=False`` plus a NULL-vs-'nan' hash convention)."""

    def _partial(batch: pa.Table) -> pa.Table:
        # Arrow hash-aggregate combiner (C++): NULL pivot folds to ''
        # (counted); NULL-keyed rows are dropped, matching the pandas
        # groupby semantics documented above
        import pyarrow.compute as pc

        slim = pa.table(
            {
                key_col: batch[key_col],
                pivot_col: pc.fill_null(batch[pivot_col], ""),
            }
        ).filter(pc.is_valid(batch[key_col]))
        g = slim.group_by([key_col, pivot_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                pivot_col: g[pivot_col],
                "n": g["count_all"].cast(pa.int64()),
            }
        )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        sums = (
            df.groupby([key_col, pivot_col], sort=True, observed=True)["n"]
            .sum()
            .unstack(fill_value=0)
        )
        out = pd.DataFrame({key_col: sums.index.to_numpy()})
        for c in categories:
            col = sums[c] if c in sums.columns else pd.Series(0, index=sums.index)
            out[f"n_{c}"] = col.to_numpy(np.int64)
        out["n_total"] = sums.sum(axis=1).to_numpy(np.int64)
        return out

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_group_apply(partial, key_col, _final, num_partitions)


def group_size_histogram(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    size_name: str = "group_size",
    count_name: str = "n_groups",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distribution of group sizes: ``(group_size, n_groups)``.

    The dedup reporting primitive (cluster-size histogram): two-level
    exact aggregation where BOTH exchanges carry combined partials —
    per-batch ``(key, n)`` counts into the key-bucketed shuffle, then
    per-bucket size histograms into a final tiny groupby whose
    cardinality is the number of DISTINCT sizes, not keys."""

    def _key_partial(batch: pa.Table) -> pa.Table:
        # Arrow value_counts: C++ hash count, no object conversion
        vc = batch[key_col].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {key_col: vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    def _sizes(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(key_col, sort=False)["n"].sum()
        vc = sizes.value_counts()  # bucket-local histogram partial
        return pd.DataFrame(
            {size_name: vc.index.to_numpy(np.int64), count_name: vc.to_numpy(np.int64)}
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(size_name, sort=True)[count_name].sum()
        return pd.DataFrame(
            {size_name: g.index.to_numpy(np.int64), count_name: g.to_numpy(np.int64)}
        )

    partial = ds.map_batches(_key_partial, batch_format="pyarrow")
    per_key = bucketed_group_apply(partial, key_col, _sizes, num_partitions)
    return bucketed_group_apply(per_key, size_name, _merge, 8)


def quantile_bucket_assign(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    out_col: str = "decile",
) -> ray.data.Dataset:
    """Assign every row its global quantile bucket WITHOUT a global
    sort: ``(id, val, bucket)`` where ``bucket`` = number of exact
    discrete-quantile cutpoints strictly below ``val`` (deciles by
    default, 0..len(qs)).

    Exact global order statistics by histogram combine: each batch
    emits ``(value, count)`` partials (one row per distinct value per
    batch), ONE remote reduce builds the global value histogram and
    picks the ``quantile_disc`` cutpoints (element at rank
    ``ceil(q·n)`` — same contract as ``grouped_quantiles``), and the
    assignment pass probes the broadcast cutpoint array with
    ``searchsorted``.  Assumes the value domain has moderate distinct
    cardinality (lengths, scores, counts — the curation cases); an
    unbounded continuous domain would need a mergeable quantile
    sketch instead (t-digest / KLL), trading exactness."""

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch[val_col]
        if not pa.types.is_integer(col.type):
            # silent float→int truncation would collapse score-like
            # domains onto bucket 0; fail loudly instead
            raise TypeError(
                f"quantile_bucket_assign needs an integer {val_col!r} "
                f"(got {col.type}); discretize floats explicitly first"
            )
        if col.null_count:
            # nulls would vanish from the histogram but reach the
            # assignment pass as INT64_MIN garbage — fail loudly
            raise TypeError(
                f"quantile_bucket_assign: {val_col!r} contains "
                f"{col.null_count} null(s); drop or fill them first"
            )
        vc = col.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {
                "v": vc.field("values").cast(pa.int64()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    @ray.remote
    def _cutpoints(*tables: pa.Table) -> np.ndarray:
        frames = [t.to_pandas() for t in tables if t.num_rows and "v" in t.schema.names]
        if not frames:
            return np.empty(0, np.int64)
        g = pd.concat(frames, ignore_index=True).groupby("v", sort=True)["n"].sum()
        vals = g.index.to_numpy(np.int64)
        cum = g.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        ranks = np.ceil(np.asarray(qs, np.float64) * n).astype(np.int64)
        idx = np.searchsorted(cum, ranks, side="left")
        return vals[idx]

    blocks = (
        ds.select_columns([val_col])
        .map_batches(_partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    cuts_ref = _cutpoints.remote(*blocks)

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        cuts = ray.get(cuts_ref)
        v = batch[val_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                val_col: v,
                out_col: np.searchsorted(cuts, v, side="left").astype(np.int64),
            }
        )

    return ds.map_batches(_assign, batch_format="pandas")


_HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_sketch(hashes: np.ndarray) -> np.ndarray:
    """Register array (uint8[2^p]) for a batch of uint64 hashes."""
    regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    idx = (hashes >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = hashes << np.uint64(_HLL_P)
    # rank = position of the leftmost 1 bit in the remaining 64-p bits
    # (computed vectorized via the float64 exponent of the value)
    nz = rest != 0
    rank = np.full(hashes.size, 64 - _HLL_P + 1, dtype=np.uint8)
    # log2 via float conversion locates the leading bit; clip to ≥1
    # (values within 2^11 of 2^64 can round up to 2^64 in float64)
    rank[nz] = np.maximum(
        64 - np.floor(np.log2(rest[nz].astype(np.float64))), 1.0
    ).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(regs.size)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_ndistinct(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    val_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-``key_col`` HyperLogLog estimate of distinct ``val_col``
    values: ``(key, ndv_est)``."""
    from fuzzy_matching_ray.hashing import hash64_str

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, sub in batch.groupby(key_col, sort=False):
            vals = sub[val_col].astype(str).to_numpy(dtype=object)
            hashes = np.fromiter(
                (hash64_str(v) for v in vals), dtype=np.uint64, count=vals.size
            )
            rows.append({"key": k, "sketch": _hll_sketch(hashes).tobytes()})
        return pd.DataFrame(rows, columns=["key", "sketch"])

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_e = [], []
        for k, sub in df.groupby("key", sort=False):
            regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
            for blob in sub["sketch"]:
                np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
            out_k.append(k)
            out_e.append(_hll_estimate(regs))
        return pd.DataFrame({key_col: out_k, "ndv_est": np.asarray(out_e, np.float64)})

    partial = ds.map_batches(_partial, batch_format="pandas")
    return bucketed_group_apply(partial, "key", _final, num_partitions)


# ---------------------------------------------------------------------------
# DDSketch-style approximate quantiles (unbounded domains)

def _dd_gamma(rel_err: float) -> float:
    return (1.0 + rel_err) / (1.0 - rel_err)


# bucket-key bias: the log-bucket index b = ceil(ln|v|/ln γ) is
# NEGATIVE for |v| < 1, so sign-encoding needs a bias that keeps every
# positive value's key strictly above 0 and every negative value's
# below.  |b| is bounded by |ln v|/ln γ over the finite-double range
# (denormals: ln|v| ≥ −744.45; max double: ln v ≤ 709.79), so the bias
# must scale with 1/ln γ — a fixed constant silently sign-flips keys
# once rel_err gets small enough (b > const at rel_err ≈ 7e-4)
def _dd_bias(gamma_log: float) -> int:
    return int(np.ceil(745.0 / gamma_log)) + 2


def _dd_bucket_keys(vals: np.ndarray, gamma_log: float) -> np.ndarray:
    """Order-preserving int64 bucket keys: ``sign(v)·(b + bias)`` with
    ``b = ceil(ln|v|/ln γ)``, 0 for exact zeros.  Monotone in v — a
    more-negative value has larger |v|, larger b, more-negative key —
    so a cumulative count over sorted keys yields rank-correct
    quantile buckets."""
    bias = _dd_bias(gamma_log)
    keys = np.zeros(vals.size, np.int64)
    pos = vals > 0
    neg = vals < 0
    if pos.any():
        b = np.ceil(np.log(vals[pos]) / gamma_log).astype(np.int64)
        keys[pos] = b + bias
    if neg.any():
        b = np.ceil(np.log(-vals[neg]) / gamma_log).astype(np.int64)
        keys[neg] = -(b + bias)
    return keys


def _dd_rep(key: int, gamma: float, gamma_log: float) -> float:
    """Bucket representative: the γ-midpoint ``2γᵇ/(γ+1)`` — within
    ``rel_err`` of every value the bucket holds."""
    if key == 0:
        return 0.0
    b = abs(key) - _dd_bias(gamma_log)
    rep = 2.0 * (gamma ** b) / (gamma + 1.0)
    return rep if key > 0 else -rep


def approx_quantiles_sketch(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    q_names: tuple[str, ...] = ("p25", "p50", "p90"),
    rel_err: float = 0.01,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-key approximate quantiles with a GUARANTEED relative error
    bound over an UNBOUNDED value domain — the scale path
    ``quantile_bucket_assign`` documents (that operator's exact
    histogram needs a moderate distinct-value cardinality; this one's
    state is ~``log(range)/log γ`` buckets per key regardless of
    cardinality).

    DDSketch (Masson, Rim & Lee, VLDB 2019) shape: values map to
    log-spaced buckets with γ = (1+r)/(1−r), per-batch ``(key, bucket,
    n)`` partial counts combine BEFORE the single key-bucketed
    shuffle, and the per-key quantile is the γ-midpoint of the bucket
    holding rank ``ceil(q·n)`` (the ``quantile_disc`` rank contract).
    Every reported quantile is within ``rel_err`` of the exact
    discrete quantile (pytest gate); the sketch is mergeable and
    order-independent, so the output is deterministic under any
    partitioning — value-hashable against a serial golden
    (``fixtures.ensure_ddq_golden``)."""
    assert len(qs) == len(q_names)
    if not 0.0 < rel_err < 1.0:
        # rel_err ≥ 1 makes γ ≤ 0 (log of a non-positive number);
        # rel_err ≤ 0 inverts the bucket ordering — both silent
        raise ValueError(f"rel_err must be in (0, 1), got {rel_err}")
    gamma = _dd_gamma(rel_err)
    gamma_log = float(np.log(gamma))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[val_col].to_numpy(np.float64)
        g = (
            pd.DataFrame(
                {
                    "key": batch[key_col].to_numpy(),
                    "bucket": _dd_bucket_keys(vals, gamma_log),
                }
            )
            .groupby(["key", "bucket"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in df.groupby("key", sort=False):
            counts = sub.groupby("bucket", sort=True)["n"].sum()
            cum = counts.cumsum().to_numpy(np.int64)
            buckets = counts.index.to_numpy(np.int64)
            n = int(cum[-1])
            row = {key_col: key, "n": n}
            for q, name in zip(qs, q_names):
                rank = max(1, int(np.ceil(q * n)))
                row[name] = _dd_rep(
                    int(buckets[np.searchsorted(cum, rank)]), gamma, gamma_log
                )
            rows.append(row)
        return pd.DataFrame(rows, columns=[key_col, *q_names, "n"])

    partial = ds.map_batches(_partial, batch_format="pandas")
    return bucketed_group_apply(partial, "key", _final, num_partitions)


# ---- grouping-set aggregation: ROLLUP / CUBE over N keys ----------
#
# Shared machinery: ONE per-batch Arrow combiner reduces raw rows to
# ``(keys..., sum_val, n_vals, min_val, max_val, n_rows)`` partials —
# the exchange unit.  Every grouping set is then derived from those
# partials by bucketed shuffles keyed on the FIRST key each set
# retains (so the set is bucket-local and final), and the grand total
# merges per-bucket partials in a final output-sized exchange.  Raw
# rows never shuffle, whatever the key count or aggregate list.

_CUBE_AGG_COLS = {
    "sum": "sum_val",
    "count": "n_rows",
    "min": "min_val",
    "max": "max_val",
    "avg": "avg_val",
}
_CUBE_STATS = ["sum_val", "n_vals", "min_val", "max_val", "n_rows"]


def _cube_partial_fn(keys: tuple[str, ...], value_col: str):
    """Per-batch Arrow combiner shared by :func:`grouped_rollup` and
    :func:`grouped_cube`: raw rows → ``(keys..., sum_val, n_vals,
    min_val, max_val, n_rows)`` partials with SQL semantics —
    ``n_rows`` = count(*) (NULL values still count), ``sum/min/max``
    skip NULLs and are NULL for all-NULL groups, ``n_vals`` =
    count(value) (the avg denominator)."""

    def _partial(batch: pa.Table) -> pa.Table:
        kcols = {}
        for c in keys:
            col = batch[c]
            if pa.types.is_dictionary(col.type):
                col = col.cast(col.type.value_type)  # parquet dict-encoding
            # subtotal rows put NULL into the key columns and
            # _cube_stable_keys pins object keys to pa.string(); a
            # non-string key would leave leaf blocks in the native dtype
            # and subtotal blocks as string — an un-unionable mix.  Loud
            # beats latent: require (logically) string keys.
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                raise ValueError(
                    f"grouped_rollup/cube requires string key columns; {c!r} is "
                    f"{batch[c].type} — cast it upstream"
                )
            kcols[c] = col
        t = pa.table(
            {
                **kcols,
                "v": batch[value_col].cast(pa.int64()),
                "one": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        # ("one","sum") = count(*); ("v","sum"/"min"/"max") skip NULL
        # values and are NULL for an all-NULL group; ("v","count")
        # counts valid values — all exactly SQL's aggregates
        g = t.group_by(list(keys)).aggregate(
            [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"), ("one", "sum")]
        )
        return pa.table(
            {
                **{c: g[c] for c in keys},
                "sum_val": g["v_sum"].cast(pa.int64()),
                "n_vals": g["v_count"].cast(pa.int64()),
                "min_val": g["v_min"].cast(pa.int64()),
                "max_val": g["v_max"].cast(pa.int64()),
                "n_rows": g["one_sum"].cast(pa.int64()),
            }
        )

    return _partial


def _cube_stable_keys(out: pd.DataFrame, keys: tuple[str, ...]) -> pd.DataFrame:
    # subtotal rows put None into the key columns; a bucket whose
    # output keys are ALL None would otherwise infer a null-typed
    # Arrow column that cannot union with string blocks from other
    # buckets — pin object keys to pandas "string" dtype so every
    # block converts to pa.string()
    for c in keys:
        if out[c].dtype == object:
            out[c] = out[c].astype("string")
    return out


def _cube_norm_vals(df: pd.DataFrame) -> pd.DataFrame:
    # NULL-able stats ride Arrow int64; pandas rehydrates them as
    # float64+NaN — pin to nullable Int64 so arithmetic stays exact
    # and NULL groups stay NULL (min_count=1 at the sum aggregations)
    df = df.copy()
    for c in ("sum_val", "min_val", "max_val"):
        df[c] = df[c].astype("Int64")
    for c in ("n_vals", "n_rows"):
        df[c] = df[c].astype(np.int64)
    return df


def _cube_grand_seed(keys: tuple[str, ...]) -> ray.data.Dataset:
    """One NULL-sum/zero-count level-2 partial: guarantees the
    grand-total grouping-set row exists even on an empty input (it is
    the aggregation identity whenever real partials exist)."""
    return ray.data.from_arrow(
        pa.table(
            {
                **{c: pa.array([None], pa.string()) for c in keys},
                "sum_val": pa.array([None], pa.int64()),
                "n_vals": pa.array([0], pa.int64()),
                "min_val": pa.array([None], pa.int64()),
                "max_val": pa.array([None], pa.int64()),
                "n_rows": pa.array([0], pa.int64()),
                "__lvl": pa.array([2], pa.int8()),
            }
        )
    )


def _cube_agg_set(
    df: pd.DataFrame, keys: tuple[str, ...], kept: tuple[str, ...]
) -> pd.DataFrame:
    """Aggregate normalized partials to ONE grouping set: keys not in
    ``kept`` come out NULL.  ``dropna=False`` keeps a NULL key value in
    the DATA as its own group (SQL GROUP BY semantics) — it emits a row
    whose visible key values may equal a subtotal row's, exactly as SQL
    ROLLUP/CUBE multisets do."""
    gb = df.groupby(list(kept), as_index=False, sort=False, dropna=False)
    out = gb["sum_val"].sum(min_count=1)
    # sort=False group order is identical across the per-stat calls on
    # the same groupby, so positional assignment lines up
    out["n_vals"] = gb["n_vals"].sum()["n_vals"].to_numpy(np.int64)
    out["min_val"] = gb["min_val"].min()["min_val"].array
    out["max_val"] = gb["max_val"].max()["max_val"].array
    out["n_rows"] = gb["n_rows"].sum()["n_rows"].to_numpy(np.int64)
    for c in keys:
        if c not in kept:
            out[c] = None
    out["__lvl"] = np.int8(0)
    return out[[*keys, *_CUBE_STATS, "__lvl"]]


def _cube_levels_fn(
    keys: tuple[str, ...], sets: tuple[tuple[str, ...], ...], emit_grand: bool
):
    """Bucket callback shared by rollup and cube (hoisted per ADVICE
    r4): emit every grouping set in ``sets`` (each must retain the
    shuffle key, so it is bucket-local and final) plus, when
    ``emit_grand``, one level-2 grand-total partial for this bucket."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _cube_norm_vals(df)
        frames = [_cube_agg_set(df, keys, kept) for kept in sets]
        if emit_grand:
            frames.append(
                pd.DataFrame(
                    {
                        **{c: [None] for c in keys},
                        "sum_val": pd.array([df["sum_val"].sum(min_count=1)], dtype="Int64"),
                        "n_vals": [np.int64(df["n_vals"].sum())],
                        "min_val": pd.array([df["min_val"].min()], dtype="Int64"),
                        "max_val": pd.array([df["max_val"].max()], dtype="Int64"),
                        "n_rows": [np.int64(df["n_rows"].sum())],
                        "__lvl": [np.int8(2)],
                    }
                )
            )
        return _cube_stable_keys(pd.concat(frames, ignore_index=True), keys)

    return _fn


def _cube_finalize_fn(keys: tuple[str, ...], aggs: tuple[str, ...]):
    """Final single-bucket merge: fold the per-bucket grand partials
    into THE grand row, then project the requested aggregate columns
    (computing ``avg_val`` = sum/count(value), NULL for value-less
    groups).  The exchange feeding this is rollup/cube-OUTPUT-sized,
    never data-sized, so one task is the right size at any scale."""
    out_cols = [*keys, *(_CUBE_AGG_COLS[a] for a in aggs)]

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _cube_norm_vals(df)
        done = df[df["__lvl"] < 2].drop(columns="__lvl")
        partials = df[df["__lvl"] == 2]
        total = pd.DataFrame(
            {
                **{c: [None] for c in keys},
                "sum_val": pd.array([partials["sum_val"].sum(min_count=1)], dtype="Int64"),
                "n_vals": [np.int64(partials["n_vals"].sum())],
                "min_val": pd.array([partials["min_val"].min()], dtype="Int64"),
                "max_val": pd.array([partials["max_val"].max()], dtype="Int64"),
                "n_rows": [np.int64(partials["n_rows"].sum())],
            }
        )
        allr = pd.concat([done, total], ignore_index=True)
        if "avg" in aggs:
            nv = allr["n_vals"].to_numpy(np.int64)
            sv = allr["sum_val"].astype("float64").to_numpy()
            allr["avg_val"] = np.where(nv > 0, sv / np.maximum(nv, 1), np.nan)
        return _cube_stable_keys(allr, keys)[out_cols]

    return _fn


def _check_cube_args(key_cols, aggs) -> tuple[tuple[str, ...], tuple[str, ...]]:
    keys = tuple(key_cols)
    aggs = tuple(aggs)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    bad = [a for a in aggs if a not in _CUBE_AGG_COLS]
    if bad:
        raise ValueError(f"unknown aggs {bad}; supported: {sorted(_CUBE_AGG_COLS)}")
    return keys, aggs


def grouped_rollup(
    ds: ray.data.Dataset,
    *,
    key_cols: tuple[str, ...] = ("source", "lang"),
    value_col: str = "n_chars",
    aggs: tuple[str, ...] = ("sum", "count"),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Hierarchical ``ROLLUP (k1, ..., kn)`` totals — every key-prefix
    grouping set plus the grand total — without ever re-reading the
    input or running a second aggregate over raw rows.  ``aggs``
    selects the output aggregate columns: ``sum`` (``sum_val``),
    ``count`` (``n_rows`` = count(*)), ``min``/``max``
    (``min_val``/``max_val``) and ``avg`` (``avg_val`` =
    sum/count(value)), all with exact SQL NULL semantics.

    One combiner-first pass: the per-batch Arrow combiner reduces raw
    rows to per-key-tuple stat partials; every non-empty prefix
    retains ``k1``, so ONE bucketed shuffle on ``k1`` makes all of
    them bucket-local — a single vectorized callback emits every
    level plus a per-bucket grand-total partial; a second tiny
    exchange (rollup-output-sized, not data-sized) merges the grand
    partials.  At 100 TB the raw data is read once and only
    rollup-output-sized rows ever shuffle.

    SQL parity details: ``n_rows`` is ``count(*)`` (rows with a NULL
    value still count), ``sum_val`` is SQL ``sum`` (NULLs skipped,
    NULL when a group is all-NULL), and an empty input still emits
    the grand-total grouping-set row."""
    keys, aggs = _check_cube_args(key_cols, aggs)
    # prefixes (k1..ki for i=n..1); the empty set is the grand total
    sets = tuple(keys[:i] for i in range(len(keys), 0, -1))
    partial = ds.map_batches(_cube_partial_fn(keys, value_col), batch_format="pyarrow")
    rolled = bucketed_group_apply(
        partial, keys[0], _cube_levels_fn(keys, sets, emit_grand=True), num_partitions
    )
    return bucketed_group_apply(
        rolled.union(_cube_grand_seed(keys)),
        "__lvl",
        _cube_finalize_fn(keys, aggs),
        1,
    )


def grouped_cube(
    ds: ray.data.Dataset,
    *,
    key_cols: tuple[str, ...] = ("source", "lang"),
    value_col: str = "n_chars",
    aggs: tuple[str, ...] = ("sum", "count"),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``GROUP BY CUBE (k1, ..., kn)`` — all ``2^n`` grouping sets,
    with :func:`grouped_rollup`'s exact SQL parity (count(*) counts
    NULL values, sum/min/max skip them, empty input emits the grand
    row) and the same ``aggs`` column selection.

    The per-batch combiner runs ONCE and its reduced partials are
    materialized (they are the exchange unit — distinct key combos per
    batch, never raw rows), then shuffled once per key ``ki``: the
    ``ki`` exchange computes every grouping set whose FIRST retained
    key is ``ki`` (each such set is fully bucket-local under a ``ki``
    shuffle), and the grand total merges per-bucket partials in a
    final output-sized exchange.  All ``n`` exchanges move only
    cube-output-sized rows, so at 100 TB the raw data is still read
    exactly once.

    NOTE: the ``.materialize()`` on the combiner output makes building
    this query EAGER — constructing the plan executes the full
    scan+combiner and pins the (reduced) partials in the object store
    for the operator's lifetime.  That is the price of fanning the
    partials out to ``n`` consumers without re-reading the input;
    callers composing fully-lazy plans should be aware."""
    keys, aggs = _check_cube_args(key_cols, aggs)
    n = len(keys)
    # every non-empty subset of keys, assigned to the shuffle of its
    # first (lowest-index) member; the empty set is the grand total
    by_first: list[list[tuple[str, ...]]] = [[] for _ in range(n)]
    for mask in range(1, 1 << n):
        members = tuple(keys[i] for i in range(n) if mask & (1 << i))
        by_first[keys.index(members[0])].append(members)
    partial = ds.map_batches(
        _cube_partial_fn(keys, value_col), batch_format="pyarrow"
    ).materialize()
    shuffled = None
    for i, k in enumerate(keys):
        out_i = bucketed_group_apply(
            partial,
            k,
            _cube_levels_fn(keys, tuple(by_first[i]), emit_grand=(i == 0)),
            num_partitions,
        )
        shuffled = out_i if shuffled is None else shuffled.union(out_i)
    return bucketed_group_apply(
        shuffled.union(_cube_grand_seed(keys)),
        "__lvl",
        _cube_finalize_fn(keys, aggs),
        1,
    )


def source_ngram_overlap(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Cross-source content-overlap matrix: for every unordered source
    pair ``(src_a < src_b)``, the number of DISTINCT word ``n``-grams
    both sources contain — the curation report that says *which feeds
    copy which* (mirror sites, syndication, template farms) before any
    per-document dedup runs.  Exact-duplicate overlap is this matrix's
    degenerate case; n-gram grain keeps it informative on corpora with
    no verbatim dups.

    Shuffle shape: the exchange carries one row per distinct
    ``(ngram, source)`` per batch (never per occurrence); ONE bucketed
    shuffle on ``hash(ngram)`` co-locates all sources of a gram, so
    each bucket cross-joins its (tiny, ≤ n_sources) per-gram source
    sets and emits pre-counted ``(src_a, src_b)`` partials; the final
    exchange is sources²-sized.  Tokenization is the corpus-wide
    lowercase whitespace contract (see ``extras/tfidf._tokens``), so
    the SQL mirror joins on the literal gram strings."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def _grams(batch: pd.DataFrame) -> pd.DataFrame:
        from fuzzy_matching_ray.extras.tfidf import _tokens

        batch = batch.reset_index(drop=True)
        # the corpus-wide tokenization contract lives in ONE place
        # (tfidf._tokens) so the SQL-oracle gram join cannot drift
        ex = _tokens(batch[text_col])
        empty = pd.DataFrame(
            {"g": pd.Series([], dtype=object), "src": pd.Series([], dtype=object)}
        )
        if len(ex) < n:
            return empty
        toks = ex.to_numpy(dtype=object)
        rows = ex.index.to_numpy(np.int64)
        # gram i spans tokens [i, i+n); valid iff all in the same row
        valid = rows[: len(rows) - n + 1] == rows[n - 1 :]
        if not valid.any():
            return empty
        parts = [pd.Series(toks[k : len(toks) - n + 1 + k][valid]) for k in range(n)]
        g = parts[0].str.cat(parts[1:], sep=" ") if n > 1 else parts[0]
        src = batch[group_col].to_numpy(dtype=object)[rows[: len(rows) - n + 1][valid]]
        return pd.DataFrame({"g": g.to_numpy(dtype=object), "src": src}).drop_duplicates()

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # batch-level distinct -> global distinct
        m = d.merge(d, on="g")
        m = m[m["src_x"] < m["src_y"]]
        out = (
            m.groupby(["src_x", "src_y"], sort=False)
            .size()
            .rename("shared_ngrams")
            .reset_index()
            .rename(columns={"src_x": "src_a", "src_y": "src_b"})
        )
        out["shared_ngrams"] = out["shared_ngrams"].astype(np.int64)
        return out

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src_a", "src_b"], sort=False, as_index=False)[
            "shared_ngrams"
        ].sum()
        out["shared_ngrams"] = out["shared_ngrams"].astype(np.int64)
        return out

    partial = ds.select_columns([group_col, text_col]).map_batches(
        _grams, batch_format="pandas"
    )
    counted = bucketed_group_apply(partial, "g", _pairs, num_partitions)
    # final exchange is sources^2-sized regardless of corpus size
    return bucketed_group_apply(counted, "src_a", _sum, min(num_partitions, 8))
