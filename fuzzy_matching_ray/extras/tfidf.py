"""Corpus-aware term statistics: TF-IDF top terms and rarity signals.

Both operators need the *global* document frequency of every token —
a corpus-wide statistic — while emitting per-document rows.  The scale
shape mirrors ``decontaminate`` (`filtering.py`) and
``token_heavy_hitters`` (`aggregates.py`): pass 1 pre-aggregates
per-batch document frequencies inside ``map_batches`` (the exchange
carries one row per *distinct token per batch*, never occurrences) and
reduces them in ONE remote task whose return value IS the broadcast
(sorted terms, df) pair — the driver only ever holds the ref.  Pass 2
streams the corpus and probes df with a vectorized ``searchsorted``;
no shuffle touches token occurrences, so the only all-to-all is the
distinct-term reduce (bounded by vocabulary size, not corpus size).

Determinism contract with the SQL oracles: tokenization is
lowercase + whitespace split (identical to ``token_heavy_hitters``),
tf and df are exact integers, and the TF-IDF ranking key ``tf / df``
is ONE IEEE-754 double division — exactly rounded, so DuckDB's
``tf * 1.0 / df`` orders identically and the driver hash matches.
(At fixed corpus size N, ranking by the raw-idf weight tf·(N/df) is
ranking by tf/df.)  Ties break on ``term ASC``.

Reference anchor: generalizes the per-field *weighted scoring* idea of
``core/data_matcher.py`` (weights static there) to corpus-derived
term weights, the form a training-data curation pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# per-worker-process cache of the rehydrated DF table, keyed by the
# broadcast ref hex (same pattern as simhash's token cache): stateless
# tasks schedule wide immediately, and every batch after the first
# reuses the zero-copy ray.get + no rebuild
_DF_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _tokens(texts: pd.Series) -> pd.Series:
    """Exploded (row-index, token) series: lowercase whitespace split,
    empties dropped — the exact dual of DuckDB
    ``list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')``."""
    ex = texts.fillna("").astype(str).str.lower().str.split().explode()
    return ex[ex.notna() & (ex != "")]


def _df_broadcast(ds: ray.data.Dataset, text_col: str) -> "ray.ObjectRef":
    """ObjectRef of ``(terms_sorted: object[], df: int64[])`` for the
    whole corpus.  Map-side partial (distinct tokens per doc, counted
    per batch), ONE remote reduce."""

    def _partial(batch: pd.DataFrame) -> pa.Table:
        ex = _tokens(batch[text_col])
        if ex.empty:
            return pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        dd = pd.DataFrame({"r": ex.index.to_numpy(), "t": ex.to_numpy(dtype=object)})
        vc = dd.drop_duplicates()["t"].value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "df": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    @ray.remote
    def _reduce(*tables: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        frames = [
            t.to_pandas() for t in tables if t.num_rows and "term" in t.schema.names
        ]
        if not frames:
            return np.empty(0, object), np.empty(0, np.int64)
        g = pd.concat(frames, ignore_index=True).groupby("term", sort=True)["df"].sum()
        return g.index.to_numpy(dtype=object), g.to_numpy(np.int64)

    blocks = (
        ds.map_batches(_partial, batch_format="pandas").materialize().to_arrow_refs()
    )
    return _reduce.remote(*blocks)


def _get_df(ref: "ray.ObjectRef") -> tuple[np.ndarray, np.ndarray]:
    key = ref.hex()
    hit = _DF_CACHE.get(key)
    if hit is None:
        _DF_CACHE.clear()  # one live corpus per worker is the norm
        hit = _DF_CACHE[key] = ray.get(ref)
    return hit


def _doc_tf(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(doc position, term, tf) for one batch, vectorized."""
    ex = _tokens(batch[text_col])
    if ex.empty:
        return pd.DataFrame({"r": [], "term": [], "tf": []})
    tf = (
        pd.DataFrame({"r": ex.index.to_numpy(), "term": ex.to_numpy(dtype=object)})
        .groupby(["r", "term"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    return tf


def tfidf_top_terms(
    ds: ray.data.Dataset,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Top-``k`` terms per document by TF-IDF (raw idf ``N/df``):
    ``(doc_id, term, tf, df, term_rank)``, integer-exact columns."""
    df_ref = _df_broadcast(ds.select_columns([text_col]), text_col)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)  # 'r' must be positional
        terms_sorted, dfs = _get_df(df_ref)
        tf = _doc_tf(batch, text_col)
        if tf.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=batch[id_col].dtype),
                    "term": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype=np.int64),
                    "df": pd.Series([], dtype=np.int64),
                    "term_rank": pd.Series([], dtype=np.int64),
                }
            )
        pos = np.searchsorted(terms_sorted, tf["term"].to_numpy(dtype=object))
        tf["df"] = dfs[pos]
        # ranking key: ONE double division (exactly rounded → SQL-equal)
        tf["_score"] = tf["tf"].to_numpy(np.float64) / tf["df"].to_numpy(np.float64)
        tf = tf.sort_values(
            ["r", "_score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        top = tf.groupby("r", sort=False).head(k).copy()
        top["term_rank"] = top.groupby("r", sort=False).cumcount() + 1
        ids = batch[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids[top["r"].to_numpy()],
                "term": top["term"].to_numpy(dtype=object),
                "tf": top["tf"].to_numpy(np.int64),
                "df": top["df"].to_numpy(np.int64),
                "term_rank": top["term_rank"].to_numpy(np.int64),
            }
        )

    return ds.map_batches(_probe, batch_format="pandas")


def rare_token_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_df: int = 1,
) -> ray.data.Dataset:
    """Corpus-aware rarity quality signal per document:
    ``(doc_id, n_tokens, n_rare, n_distinct_rare)`` where a token is
    *rare* when its global document frequency ≤ ``rare_df`` (hapax
    legomena at the default).  A high rare fraction flags OCR noise /
    mojibake / codegen junk that doc-local stats
    (``quality_stats_documents``) cannot see; all-integer output."""
    df_ref = _df_broadcast(ds.select_columns([text_col]), text_col)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)  # 'r' must be positional
        terms_sorted, dfs = _get_df(df_ref)
        tf = _doc_tf(batch, text_col)
        ids = batch[id_col].to_numpy()
        out = pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": np.zeros(len(ids), np.int64),
                "n_rare": np.zeros(len(ids), np.int64),
                "n_distinct_rare": np.zeros(len(ids), np.int64),
            }
        )
        if tf.empty:
            return out
        pos = np.searchsorted(terms_sorted, tf["term"].to_numpy(dtype=object))
        is_rare = dfs[pos] <= rare_df
        g = tf.groupby("r", sort=False)
        agg = pd.DataFrame(
            {
                "n_tokens": g["tf"].sum(),
                "n_rare": tf["tf"].where(is_rare, 0).groupby(tf["r"], sort=False).sum(),
                "n_distinct_rare": pd.Series(is_rare, index=tf.index)
                .groupby(tf["r"], sort=False)
                .sum(),
            }
        )
        r = agg.index.to_numpy()
        for c in ("n_tokens", "n_rare", "n_distinct_rare"):
            out.loc[r, c] = agg[c].to_numpy(np.int64)
        return out

    return ds.map_batches(_probe, batch_format="pandas")
