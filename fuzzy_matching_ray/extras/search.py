"""Lexical search primitives over document tables.

``bm25_topk`` is a BM25-family ranked keyword search expressed as two
streaming passes over the corpus:

1. **stats pass** — per-batch partial (doc count, total token count,
   per-term document frequency) rows, reduced by Ray Data's
   distributed ``Dataset.sum`` aggregate (combiner-first tree), so the
   driver receives ONE summary row no matter how many blocks emitted
   partials.
2. **score pass** — per-batch vectorized term-frequency scoring with a
   batch-local partial top-k combiner, then a second-level
   ``repartition`` + per-block top-k prune, so the driver collects at
   most ``merge_partitions × k`` rows — constant in the block count
   (the round-4 ANN pattern, ``extras/ann.py``).

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
    merge_partitions: int = 64,
) -> pd.DataFrame:
    """Top-``k`` documents for ``terms`` under log-free BM25.
    Returns a pandas DataFrame ``(doc_id, score)`` ordered by
    ``score DESC, doc_id`` (deterministic ties).

    Driver-row bound: the stats reduce lands exactly one summary row
    on the driver (``Dataset.sum`` is a distributed combiner-first
    aggregate) and the score merge lands at most
    ``merge_partitions × k`` rows — both constants, independent of the
    corpus block count (``tools/bench_bm25_scale.py`` evidences this
    at 10× blocks)."""
    terms = tuple(terms)

    def _stats(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        toks = _tokens(batch[text_col])
        dl = toks.str.len().fillna(0).astype(np.int64)
        row = {"n": np.int64(len(batch)), "tot": np.int64(dl.sum())}
        # df per term, vectorized: explode once, keep only query-term
        # hits, count distinct (row, term) combinations — no per-row
        # Python membership scan
        ex = toks.explode()
        ex = ex[ex.isin(terms)]
        hits = (
            pd.DataFrame({"row": ex.index, "term": ex.to_numpy()})
            .drop_duplicates()
            .groupby("term")
            .size()
        )
        for j, t in enumerate(terms):
            row[f"df{j}"] = np.int64(hits.get(t, 0))
        return pd.DataFrame([row])

    stat_cols = ["n", "tot"] + [f"df{j}" for j in range(len(terms))]
    # distributed tree reduce: per-block partial rows -> Dataset.sum
    # (combiner per block, small final merge) -> ONE dict on the driver
    sums = ds.map_batches(_stats, batch_format="pandas").sum(stat_cols)
    n = int(sums["sum(n)"] or 0) if sums is not None else 0
    if n == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    tot = int(sums["sum(tot)"])
    avgdl = float(tot) / n
    dfs = [int(sums[f"sum(df{j})"]) for j in range(len(terms))]
    idfs = [(n - df + 0.5) / (df + 0.5) for df in dfs]
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        # blocks sliced from a driver DataFrame keep their original
        # index — the explode/groupby(level=0)/reindex alignment below
        # requires a fresh 0-based RangeIndex per batch
        batch = batch.reset_index(drop=True)
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

    def _prune(batch: pd.DataFrame) -> pd.DataFrame:
        # second-level combiner: the global top-k is a subset of every
        # partition-local top-k over the batch-local partials
        return batch.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    partials = ds.map_batches(_score, batch_format="pandas")
    # two-level merge: ≤ k rows/block -> repartition into a fixed
    # number of merge blocks -> ≤ k rows/merge-block -> driver sees
    # ≤ merge_partitions·k rows regardless of corpus block count
    merged = partials.repartition(merge_partitions).map_batches(
        _prune, batch_format="pandas"
    )
    out = merged.to_pandas()  # ≤ merge_partitions × k rows by construction
    out = out.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out.reset_index(drop=True)


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
