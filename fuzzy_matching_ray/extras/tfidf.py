"""Corpus-aware term statistics: TF-IDF top terms and rarity signals.

Both operators need the *global* document frequency of every token —
a corpus-wide statistic — while emitting per-document rows.  Two
execution modes, selected per call (``df_mode``):

* ``broadcast`` — pass 1 pre-aggregates per-batch document
  frequencies inside ``map_batches`` (the exchange carries one row
  per *distinct token per batch*, never occurrences), reduces them
  with a DISTRIBUTED native ``groupby('term').sum`` (no single
  vocabulary-sized task), and broadcasts the reduced ``(terms, df)``
  arrays once via ``ray.put``.  Pass 2 streams the corpus and probes
  df with a vectorized ``searchsorted``.  Fastest when the distinct
  vocabulary fits one worker heap; HARD-BOUNDED by
  ``broadcast_max_terms`` — exceeding it is never silent.

* ``bucketed`` — the web-scale path: no broadcast, no driver-side
  vocabulary at all.  The distinct ``(doc, term, tf)`` rows are
  shuffled once on ``hash(term)`` — every row of one term lands in
  one bucket, so the bucket computes exact global df locally and
  attaches it — then once on ``hash(doc)`` to finalize per-document
  output.  Peak per-task state is one bucket (vocabulary / P), not
  the vocabulary.

* ``auto`` (default) — run the distributed DF aggregation, count the
  distinct terms (the aggregate is materialized, so the count is
  free), and pick: broadcast under ``broadcast_max_terms``, bucketed
  above (with a log line — no silent mode flips).  The exact loud
  bound has a known price: when auto flips to bucketed, the
  aggregation pass it decided from is discarded (the bucketed term
  shuffle recomputes df from rows it already holds — a join back to
  the aggregate would move MORE data, vocabulary-sized, than the
  per-bucket recount).  Callers that know they are at web scale
  should pass ``df_mode='bucketed'`` explicitly, which skips the
  decision pass entirely; both modes produce identical exact output.

Determinism contract with the SQL oracles (both modes): tokenization
is lowercase + whitespace split.  Precision note: Python ``str.split``
(here), Arrow ``utf8_split_whitespace`` (``token_heavy_hitters``) and
DuckDB/RE2 ``\\s+`` (the oracles) agree exactly on ASCII whitespace
(space/tab/CR/LF — the documents-table domain) but diverge on exotic
separators (Python additionally splits U+001C–U+001F; Arrow
additionally splits U+00A0/U+2028-class Unicode White_Space; RE2
``\\s`` splits neither) — corpora containing those need one
tokenizer chosen explicitly,
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

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

# per-worker-process cache of the rehydrated DF table, keyed by the
# broadcast ref hex (same pattern as simhash's token cache): stateless
# tasks schedule wide immediately, and every batch after the first
# reuses the zero-copy ray.get + no rebuild
_DF_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _tokens(texts: pd.Series) -> pd.Series:
    """Exploded (row-index, token) series: lowercase whitespace split,
    empties dropped — the exact dual of DuckDB
    ``list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')``.

    This is THE corpus-wide tokenization contract: every token-grain
    operator with a SQL mirror (tfidf, unigram_logfreq,
    source_ngram_overlap, rare-term rarity) must tokenize through this
    function.  Known edge: pandas ``str.split()`` splits on ALL
    Unicode whitespace while DuckDB's RE2 ``\\s+`` matches only ASCII
    whitespace — a corpus containing NBSP / U+2028 etc. would diverge
    from the oracles.  The engine deliberately keeps pandas semantics
    (Unicode-correct at scale) and documents the ASCII-whitespace
    assumption for the oracle comparisons; the synthetic test corpora
    contain ASCII whitespace only."""
    ex = texts.fillna("").astype(str).str.lower().str.split().explode()
    return ex[ex.notna() & (ex != "")]


def _df_aggregate(
    ds: ray.data.Dataset, text_col: str, num_partitions: int = 32, counts: bool = False
) -> ray.data.Dataset:
    """Distributed ``(term, df)`` aggregation: map-side partial
    (distinct tokens per doc, counted per batch) + ONE term-hash
    bucketed shuffle with a vectorized per-bucket sum — the reduce is
    sharded into ``num_partitions`` tasks of ~vocab/P state each,
    never one vocabulary-sized task.  ``counts=True`` aggregates raw
    OCCURRENCE counts instead of document frequency (same exchange
    shape — one row per distinct token per batch)."""

    def _partial(batch: pd.DataFrame) -> pa.Table:
        ex = _tokens(batch[text_col])
        if ex.empty:
            return pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        if counts:
            vc = ex.value_counts()
        else:
            dd = pd.DataFrame({"r": ex.index.to_numpy(), "t": ex.to_numpy(dtype=object)})
            vc = dd.drop_duplicates()["t"].value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "df": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", sort=False, as_index=False)["df"].sum()
        out["df"] = out["df"].astype(np.int64)
        return out

    partial = ds.map_batches(_partial, batch_format="pandas")
    return bucketed_group_apply(partial, "term", _sum, num_partitions)


def _resolve_df_mode(
    ds: ray.data.Dataset,
    text_col: str,
    df_mode: str,
    broadcast_max_terms: int,
    num_partitions: int = 32,
    counts: bool = False,
) -> "ray.ObjectRef | None":
    """``None`` → run bucketed; otherwise the broadcast ObjectRef of
    ``(terms_sorted, df)``.  The vocabulary only ever reaches one
    address space when it is PROVEN ≤ ``broadcast_max_terms``."""
    if df_mode == "bucketed":
        return None
    if df_mode not in ("auto", "broadcast"):
        raise ValueError(f"df_mode must be auto|broadcast|bucketed, got {df_mode!r}")
    dfds = _df_aggregate(ds, text_col, num_partitions, counts=counts).materialize()
    n_terms = dfds.count()
    if n_terms == 0:  # token-less corpus: empty probe arrays
        return ray.put((np.empty(0, object), np.empty(0, np.int64)))
    if n_terms > broadcast_max_terms:
        if df_mode == "broadcast":
            raise ValueError(
                f"distinct vocabulary ({n_terms}) exceeds broadcast_max_terms "
                f"({broadcast_max_terms}); use df_mode='bucketed' (or 'auto')"
            )
        print(
            f"[tfidf] vocabulary {n_terms} > broadcast_max_terms "
            f"{broadcast_max_terms}: switching to the bucketed path "
            f"(the decision aggregate is discarded — pass "
            f"df_mode='bucketed' to skip it when scale is known upfront)"
        )
        return None
    # sort+pack in ONE remote task whose return value IS the broadcast
    # object: the driver only ever holds the ref — pulling the whole
    # vocabulary through the driver (to_pandas + argsort + ray.put)
    # made driver memory O(vocabulary)
    return _pack_df_task.remote(*dfds.to_arrow_refs())


@ray.remote
def _pack_df_task(*tables: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    live = [t for t in tables if t.num_rows]
    terms = np.concatenate(
        [t["term"].to_numpy(zero_copy_only=False) for t in live]
    ) if live else np.empty(0, object)
    dfs = np.concatenate(
        [t["df"].to_numpy(zero_copy_only=False) for t in live]
    ) if live else np.empty(0, np.int64)
    order = np.argsort(terms, kind="stable")  # searchsorted needs sorted terms
    return terms[order], dfs[order].astype(np.int64, copy=False)


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


def _doc_tf_rows(
    ds: ray.data.Dataset, id_col: str, text_col: str
) -> ray.data.Dataset:
    """Distinct ``(id, term, tf)`` rows — the bucketed paths' exchange
    unit (one row per doc-term, never per occurrence)."""

    def _tf(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        tf = _doc_tf(batch, text_col)
        ids = batch[id_col].to_numpy()
        if tf.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=batch[id_col].dtype),
                    "term": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                id_col: ids[tf["r"].to_numpy()],
                "term": tf["term"].to_numpy(dtype=object),
                "tf": tf["tf"].to_numpy(np.int64),
            }
        )

    return ds.map_batches(_tf, batch_format="pandas")


def _attach_df_bucketed(
    tf_rows: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Shuffle the tf rows on ``hash(term)``; every row of a term is in
    exactly one bucket, so df(term) = the bucket-local row count (tf
    rows are distinct per doc-term by construction)."""

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["df"] = (
            df.groupby("term", sort=False)["term"].transform("size").to_numpy(np.int64)
        )
        return out

    return bucketed_group_apply(tf_rows, "term", _attach, num_partitions)


def _empty_topk(id_dtype, id_col: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            id_col: pd.Series([], dtype=id_dtype),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
            "term_rank": pd.Series([], dtype=np.int64),
        }
    )


def _rank_topk(scored: pd.DataFrame, id_col: str, k: int) -> pd.DataFrame:
    """Per-doc top-k over (id, term, tf, df) rows: ranking key is ONE
    double division (exactly rounded → SQL-equal), ties on term ASC."""
    scored = scored.copy()
    scored["_score"] = scored["tf"].to_numpy(np.float64) / scored["df"].to_numpy(
        np.float64
    )
    scored = scored.sort_values(
        [id_col, "_score", "term"], ascending=[True, False, True], kind="mergesort"
    )
    top = scored.groupby(id_col, sort=False).head(k).copy()
    top["term_rank"] = (top.groupby(id_col, sort=False).cumcount() + 1).astype(np.int64)
    return top[[id_col, "term", "tf", "df", "term_rank"]].reset_index(drop=True)


def tfidf_top_terms(
    ds: ray.data.Dataset,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_mode: str = "auto",
    broadcast_max_terms: int = 5_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-``k`` terms per document by TF-IDF (raw idf ``N/df``):
    ``(doc_id, term, tf, df, term_rank)``, integer-exact columns.
    See the module docstring for the broadcast/bucketed scale modes."""
    slim = ds.select_columns([id_col, text_col])
    df_ref = _resolve_df_mode(slim, text_col, df_mode, broadcast_max_terms, num_partitions)

    if df_ref is None:
        # bucketed: df attaches in the term shuffle, top-k finalizes in
        # the doc shuffle — vocabulary never concentrates anywhere
        with_df = _attach_df_bucketed(
            _doc_tf_rows(slim, id_col, text_col), num_partitions
        )

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _empty_topk(df[id_col].dtype, id_col)
            return _rank_topk(df, id_col, k)

        return bucketed_group_apply(with_df, id_col, _fin, num_partitions)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)  # 'r' must be positional
        terms_sorted, dfs = _get_df(df_ref)
        tf = _doc_tf(batch, text_col)
        if tf.empty:
            return _empty_topk(batch[id_col].dtype, id_col)
        pos = np.searchsorted(terms_sorted, tf["term"].to_numpy(dtype=object))
        ids = batch[id_col].to_numpy()
        scored = pd.DataFrame(
            {
                id_col: ids[tf["r"].to_numpy()],
                "term": tf["term"].to_numpy(dtype=object),
                "tf": tf["tf"].to_numpy(np.int64),
                "df": dfs[pos],
            }
        )
        return _rank_topk(scored, id_col, k)

    return slim.map_batches(_probe, batch_format="pandas")


def rare_token_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_df: int = 1,
    df_mode: str = "auto",
    broadcast_max_terms: int = 5_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Corpus-aware rarity quality signal per document:
    ``(doc_id, n_tokens, n_rare, n_distinct_rare)`` where a token is
    *rare* when its global document frequency ≤ ``rare_df`` (hapax
    legomena at the default).  A high rare fraction flags OCR noise /
    mojibake / codegen junk that doc-local stats
    (``quality_stats_documents``) cannot see; all-integer output.
    Same broadcast/bucketed scale modes as :func:`tfidf_top_terms`."""
    slim = ds.select_columns([id_col, text_col])
    df_ref = _resolve_df_mode(slim, text_col, df_mode, broadcast_max_terms, num_partitions)

    if df_ref is None:
        # bucketed: mark rarity in the term shuffle, sum in the doc
        # shuffle; zero rows for every doc guarantee token-less docs
        # still appear (and sum as identity elsewhere)
        def _mark(df: pd.DataFrame) -> pd.DataFrame:
            dfc = df.groupby("term", sort=False)["term"].transform("size").to_numpy(
                np.int64
            )
            rare = dfc <= rare_df
            tf = df["tf"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "n_tokens": tf,
                    "n_rare": np.where(rare, tf, 0).astype(np.int64),
                    "n_distinct_rare": rare.astype(np.int64),
                }
            )

        marked = bucketed_group_apply(
            _doc_tf_rows(slim, id_col, text_col), "term", _mark, num_partitions
        )

        def _zeros(batch: pd.DataFrame) -> pd.DataFrame:
            z = np.zeros(len(batch), np.int64)
            return pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    "n_tokens": z,
                    "n_rare": z,
                    "n_distinct_rare": z,
                }
            )

        zero_rows = slim.map_batches(_zeros, batch_format="pandas")

        def _sum(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(id_col, sort=False, as_index=False)[
                ["n_tokens", "n_rare", "n_distinct_rare"]
            ].sum()
            for c in ("n_tokens", "n_rare", "n_distinct_rare"):
                g[c] = g[c].astype(np.int64)
            return g

        return bucketed_group_apply(
            marked.union(zero_rows), id_col, _sum, num_partitions
        )

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

    return slim.map_batches(_probe, batch_format="pandas")


def unigram_logfreq(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_mode: str = "auto",
    broadcast_max_terms: int = 5_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Unigram-LM fluency score per document — the corpus-statistics
    quality dimension (the CCNet/Gopher "LM score" shape, with the
    corpus itself as the model): ``(doc_id, n_tokens, logfreq)`` where
    ``logfreq = Σ_tokens ln(cnt(token)) / n_tokens`` and ``cnt`` is the
    token's global OCCURRENCE count.  The true mean log-probability is
    ``logfreq − ln(total_tokens)`` — a per-corpus constant shift, so
    ranking/filtering on ``logfreq`` is ranking on unigram
    log-likelihood without any global-scalar coordination (the same
    trick :func:`tfidf_top_terms` uses to avoid corpus size N).  Low
    values flag mojibake / OCR noise / codegen junk built from rare
    vocabulary; high values flag boilerplate built from stopwords.
    Token-less docs get ``n_tokens = 0, logfreq = NULL``.

    Same broadcast/bucketed scale modes as :func:`tfidf_top_terms`
    (the broadcast table is ``(term, cnt)`` instead of ``(term, df)``);
    ``ln`` is evaluated only on integer counts, and the one division
    per doc is exactly rounded, so the SQL mirror hashes identically
    up to float-sum reassociation far below the 9-significant-digit
    compare.

    Reference anchor: extends the static per-field weights of
    ``core/data_matcher.py`` to corpus-derived likelihoods — the
    quality-scoring form a curation pipeline needs at scale."""
    slim = ds.select_columns([id_col, text_col])
    cnt_ref = _resolve_df_mode(
        slim, text_col, df_mode, broadcast_max_terms, num_partitions, counts=True
    )

    if cnt_ref is None:
        # bucketed: every row of a term is in one bucket, so the global
        # occurrence count is the bucket-local tf sum; ln attaches in
        # the term shuffle, the doc shuffle just sums
        def _mark(df: pd.DataFrame) -> pd.DataFrame:
            cnt = df.groupby("term", sort=False)["tf"].transform("sum").to_numpy(np.int64)
            tf = df["tf"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "n_tokens": tf,
                    "s": tf.astype(np.float64) * np.log(cnt.astype(np.float64)),
                }
            )

        marked = bucketed_group_apply(
            _doc_tf_rows(slim, id_col, text_col), "term", _mark, num_partitions
        )

        def _zeros(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    "n_tokens": np.zeros(len(batch), np.int64),
                    "s": np.zeros(len(batch), np.float64),
                }
            )

        zero_rows = slim.map_batches(_zeros, batch_format="pandas")

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(id_col, sort=False, as_index=False)[["n_tokens", "s"]].sum()
            n = g["n_tokens"].to_numpy(np.int64)
            with np.errstate(invalid="ignore"):
                lf = np.where(n > 0, g["s"].to_numpy(np.float64) / n, np.nan)
            return pd.DataFrame(
                {id_col: g[id_col].to_numpy(), "n_tokens": n, "logfreq": lf}
            )

        return bucketed_group_apply(marked.union(zero_rows), id_col, _fin, num_partitions)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)  # 'r' must be positional
        terms_sorted, cnts = _get_df(cnt_ref)
        tf = _doc_tf(batch, text_col)
        ids = batch[id_col].to_numpy()
        n = np.zeros(len(ids), np.int64)
        s = np.zeros(len(ids), np.float64)
        if not tf.empty:
            pos = np.searchsorted(terms_sorted, tf["term"].to_numpy(dtype=object))
            tfv = tf["tf"].to_numpy(np.int64)
            contrib = tfv.astype(np.float64) * np.log(cnts[pos].astype(np.float64))
            r = tf["r"].to_numpy(np.int64)
            np.add.at(n, r, tfv)
            np.add.at(s, r, contrib)
        with np.errstate(invalid="ignore"):
            lf = np.where(n > 0, s / n, np.nan)
        return pd.DataFrame({id_col: ids, "n_tokens": n, "logfreq": lf})

    return slim.map_batches(_probe, batch_format="pandas")
