"""Lexical search primitives over document tables.

``bm25_topk`` is a BM25-family ranked keyword search expressed as two
streaming passes over the corpus:

1. **stats pass** — per-batch partial (doc count, total token count,
   per-term document frequency) rows, reduced on the driver (one tiny
   row per batch).
2. **score pass** — per-batch vectorized term-frequency scoring with a
   batch-local partial top-k combiner, so the driver only ever sees
   ``k`` rows per batch, never the corpus.

Engine-exact scoring contract: the idf is the RATIONAL BM25 idf
``(N - df + 0.5) / (df + 0.5)`` **without the log** — every operation
in the score is IEEE +,-,*,/ in a fixed order, so the DuckDB oracle
(``__ray_entry__.oracle_sql()['bm25_search']``) reproduces the scores
bit-for-bit (a ``ln`` would tie the hash check to the engines' libm).
Term contributions are summed in query order; constants are injected
into the SQL via ``repr`` so both engines parse identical doubles.

At 100 TB the stats pass amortizes: document lengths and term dfs are
corpus statistics a real deployment precomputes once per snapshot and
broadcasts; both passes here stream with no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _tokens(texts: pd.Series) -> pd.Series:
    return texts.fillna("").astype(str).str.lower().str.split()


def bm25_topk(
    ds: ray.data.Dataset,
    *,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Top-``k`` documents for ``terms`` under log-free BM25.
    Returns a pandas DataFrame ``(doc_id, score)`` ordered by
    ``score DESC, doc_id`` (deterministic ties)."""
    terms = tuple(terms)

    def _stats(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch[text_col])
        dl = toks.str.len().fillna(0).astype(np.int64)
        row = {"n": np.int64(len(batch)), "tot": np.int64(dl.sum())}
        for j, t in enumerate(terms):
            row[f"df{j}"] = np.int64(toks.apply(lambda ts, t=t: t in ts).sum())
        return pd.DataFrame([row])

    parts = ds.map_batches(_stats, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    tot = int(parts["tot"].sum())
    if n == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    avgdl = float(tot) / n
    dfs = [int(parts[f"df{j}"].sum()) for j in range(len(terms))]
    idfs = [(n - df + 0.5) / (df + 0.5) for df in dfs]
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch[text_col])
        ex = toks.explode()
        dl = toks.str.len().fillna(0).to_numpy(dtype=np.float64)
        idx = pd.RangeIndex(len(batch))
        score = np.zeros(len(batch), dtype=np.float64)
        # term contributions accumulate in QUERY ORDER (the oracle
        # sums the same way — float addition is not associative)
        denom_tail = k1 * (one_minus_b + b * dl / avgdl)
        for t, idf in zip(terms, idfs):
            tf = (
                (ex == t).groupby(level=0).sum().reindex(idx, fill_value=0).to_numpy(dtype=np.float64)
            )
            score += idf * (tf * k1p1) / (tf + denom_tail)
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "score": score})
        # batch-local partial top-k: the global top-k is a subset of
        # every batch-local top-k
        out = out.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return out.head(k)

    partials = ds.map_batches(_score, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return partials.reset_index(drop=True)


def bm25_oracle_sql(
    terms: tuple[str, ...],
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """The DuckDB mirror of :func:`bm25_topk`, with every float
    constant injected via ``repr`` (shortest round-trip decimal) so
    both engines compute on identical doubles."""
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    df_sel = ", ".join(
        f"(SELECT count(*) FROM tok WHERE list_contains(toks, '{t}'))::BIGINT AS df{j}"
        for j, t in enumerate(terms)
    )
    contribs = " + ".join(
        f"((n - df{j} + 0.5) / (df{j} + 0.5)) * (tf{j} * {k1p1!r}) "
        f"/ (tf{j} + {k1!r} * ({one_minus_b!r} + {b!r} * dl / avgdl))"
        for j in range(len(terms))
    )
    tf_sel = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf{j}"
        for j, t in enumerate(terms)
    )
    return (
        f"WITH tok AS (SELECT {id_col}, "
        f"list_filter(regexp_split_to_array(lower({text_col}), '\\s+'), x -> x <> '') AS toks "
        f"FROM {table}), "
        f"st AS (SELECT count(*)::BIGINT AS n, sum(len(toks))::BIGINT AS tot FROM tok), "
        f"stat AS (SELECT n, CAST(tot AS DOUBLE) / n AS avgdl, {df_sel} FROM st), "
        f"sc AS (SELECT {id_col}, len(toks)::DOUBLE AS dl, {tf_sel} FROM tok) "
        f"SELECT sc.{id_col} AS {id_col}, {contribs} AS score "
        f"FROM sc, stat ORDER BY score DESC, sc.{id_col} LIMIT {k}"
    )
