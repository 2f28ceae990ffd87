"""Similarity search over an embedding column (``list<float>``).

* ``knn_bruteforce`` — exact top-k cosine: the query matrix is
  broadcast once via ``ray.put`` (never re-shipped per batch); each
  ``map_batches`` task does one float64 matmul of its batch against
  the query matrix and emits per-query partial top-k; a final small
  groupby reduces partials to the global top-k.  This is the
  scale path for "few queries × huge corpus".

* ``knn_lsh`` — random-hyperplane LSH (Charikar 2002) bucketing as
  the approximate scale path for "many queries": corpus and queries
  hash to sign-pattern buckets; candidates share a bucket in at least
  one of ``n_tables`` tables; exact cosine re-ranks candidates.

Ranking is deterministic: similarity rounded to 6 decimals, ties
broken by ascending neighbor id (so an ANSI-SQL oracle with the same
rounding ranks identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


_EMPTY_TOPK = {
    "query_id": pd.Series(dtype="int64"),
    "neighbor_id": pd.Series(dtype="int64"),
    "rank": pd.Series(dtype="int64"),
}


def _global_topk(partials: ray.data.Dataset, k: int) -> pd.DataFrame:
    """Distributed final merge: per-query top-k over the per-batch
    candidate partials via ``grouped_topk`` (partial combiner before
    the shuffle), so the driver collects ≤ Q·k rows no matter how many
    corpus blocks emitted candidates.  Ranking is the shared total
    order: rounded sim DESC, neighbor_id ASC."""
    from fuzzy_matching_ray.extras.relational import grouped_topk

    ranked = grouped_topk(
        partials,
        key="query_id",
        val="sim",
        tiebreak="neighbor_id",
        k=k,
        num_partitions=8,
    )
    df = ranked.to_pandas()  # ≤ Q×k rows by construction
    if df.empty:
        return pd.DataFrame(_EMPTY_TOPK)
    df = df.sort_values(["query_id", "rk"]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "query_id": df["query_id"].to_numpy(np.int64),
            "neighbor_id": df["neighbor_id"].to_numpy(np.int64),
            "rank": df["rk"].to_numpy(np.int64),
        }
    )


def knn_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns a pandas DataFrame ``(query_id, neighbor_id, rank)`` —
    small (|queries| × k), so driver-side materialization is fine.
    """
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((qmat, qids))

    def _partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi = ray.get(qref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]]))
        sims = qm @ mat.T  # (Q, B)
        rows = []
        for r in range(qm.shape[0]):
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qi[r]
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            # rank by the ROUNDED similarity with ascending-id ties —
            # the same total order the global reduce and the SQL oracle
            # use, so a rounded tie at the k-boundary can never drop
            # the lower-id neighbor inside a partial
            sr = np.round(sims[r][cand], 6)
            take = cand[np.lexsort((ids[cand], -sr))[:k]]
            for c in take:
                rows.append((int(qi[r]), int(ids[c]), round(float(sims[r][c]), 6)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"]).astype(
            {"query_id": "int64", "neighbor_id": "int64"}
        )

    partials = ds.map_batches(_partial_topk, batch_format="pandas", batch_size=4096)
    return _global_topk(partials, k)


class HyperplaneLSH:
    """Seeded random-hyperplane signatures: sign(R @ v) packed to an
    integer bucket id per table."""

    def __init__(self, dim: int, bits: int = 12, n_tables: int = 4, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_tables, bits, dim))
        self.bits = bits
        self.n_tables = n_tables

    def buckets(self, mat: np.ndarray) -> np.ndarray:
        """(n, n_tables) integer bucket ids."""
        out = np.empty((mat.shape[0], self.n_tables), dtype=np.int64)
        weights = 1 << np.arange(self.bits, dtype=np.int64)
        for t in range(self.n_tables):
            signs = (self.planes[t] @ mat.T) > 0  # (bits, n)
            out[:, t] = (signs.T @ weights) + (t << 48)
        return out


def train_ivf_centroids(
    sample: np.ndarray, nlists: int, *, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (Lloyd on
    unit vectors, cosine assignment).  ``nlists × dim`` is tiny, so
    training runs on the driver over a bounded sample; the centroid
    matrix is then broadcast once."""
    mat = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.Generator(np.random.PCG64(seed))
    init = rng.choice(mat.shape[0], size=min(nlists, mat.shape[0]), replace=False)
    cent = mat[np.sort(init)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for j in range(cent.shape[0]):  # bounded by nlists, not rows
            sel = assign == j
            if sel.any():
                c = mat[sel].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlists: int = 16,
    nprobe: int = 4,
    train_rows: int = 2048,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer (the classic
    scale path: train ``nlists`` centroids, assign every corpus vector
    to its nearest list, search only each query's ``nprobe`` closest
    lists).  Same output contract and deterministic ranking as
    ``knn_bruteforce``; quality is gated by a pytest recall assertion
    (approximate by contract, like ``knn_lsh``).

    Scale shape: centroids train on a bounded driver-side sample and
    broadcast once via ``ray.put``; each batch task assigns its rows
    with one matmul against the centroid matrix and computes exact
    similarities ONLY on columns some query probes — compute scales
    with ``nprobe/nlists`` of the corpus instead of all of it."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    sample = np.stack(
        [
            np.asarray(v, dtype=np.float64)
            for v in ds.limit(train_rows).to_pandas()[vec_col]
        ]
    )
    cent = train_ivf_centroids(sample, nlists, seed=seed)
    nprobe = min(nprobe, cent.shape[0])
    # (Q, nlists) bool: which lists each query probes
    q_sims = qmat @ cent.T
    probe_idx = np.argsort(-q_sims, axis=1, kind="stable")[:, :nprobe]
    probe_mask = np.zeros((qmat.shape[0], cent.shape[0]), dtype=bool)
    np.put_along_axis(probe_mask, probe_idx, True, axis=1)
    shared = ray.put((qmat, qids, cent, probe_mask))

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi, ce, pm = ray.get(shared)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(
            np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        )
        assign = (mat @ ce.T).argmax(axis=1)  # (B,) list per row
        cand_mask = pm[:, assign]  # (Q, B): query probes the row's list
        if exclude_self:
            cand_mask &= ids[None, :] != qi[:, None]
        col_any = cand_mask.any(axis=0)
        if not col_any.any():
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        # exact matmul over probed columns only
        col_idx = np.flatnonzero(col_any)
        sims_sub = qm @ mat[col_idx].T
        out_rows = []
        for r in range(qm.shape[0]):
            local = np.flatnonzero(cand_mask[r][col_idx])
            if local.size == 0:
                continue
            nbr_ids = ids[col_idx[local]]
            sr = np.round(sims_sub[r][local], 6)
            take = np.lexsort((nbr_ids, -sr))[:k]
            for c in take:
                out_rows.append((int(qi[r]), int(nbr_ids[c]), float(sr[c])))
        return pd.DataFrame(
            out_rows, columns=["query_id", "neighbor_id", "sim"]
        ).astype({"query_id": "int64", "neighbor_id": "int64"})

    partials = ds.map_batches(_probe, batch_format="pandas", batch_size=4096)
    return _global_topk(partials, k)


def knn_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k via hyperplane-LSH candidate filtering +
    exact cosine re-rank.  Same output contract as ``knn_bruteforce``."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    dim = qmat.shape[1]
    lsh = HyperplaneLSH(dim, bits, n_tables, seed)
    q_buckets = lsh.buckets(qmat)  # (Q, T)
    shared = ray.put((qmat, qids, q_buckets, lsh))

    def _candidates(batch: pd.DataFrame) -> pd.DataFrame:
        qm, qi, qb, h = ray.get(shared)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]]))
        bks = h.buckets(mat)  # (B, T)
        # candidate mask per (query, row): shares ≥1 bucket in any table
        cand_mask = (bks[None, :, :] == qb[:, None, :]).any(axis=2)  # (Q, B)
        if exclude_self:
            cand_mask &= ids[None, :] != qi[:, None]
        col_any = cand_mask.any(axis=0)
        if not col_any.any():
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")}
            )
        # the exact-similarity matmul touches ONLY candidate columns —
        # this is where the LSH actually saves compute (the previous
        # formulation computed the full Q×B matmul and used the buckets
        # merely as an output filter)
        col_idx = np.flatnonzero(col_any)
        sims_sub = qm @ mat[col_idx].T  # (Q, |candidates|)
        out_rows = []
        for r in range(qm.shape[0]):
            local = np.flatnonzero(cand_mask[r][col_idx])
            if local.size == 0:
                continue
            nbr_ids = ids[col_idx[local]]
            sr = np.round(sims_sub[r][local], 6)
            take = np.lexsort((nbr_ids, -sr))[:k]
            for c in take:
                out_rows.append((int(qi[r]), int(nbr_ids[c]), float(sr[c])))
        return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "sim"]).astype(
            {"query_id": "int64", "neighbor_id": "int64"}
        )

    # no cross-batch duplicates by construction: each corpus row lives
    # in exactly one batch and the per-batch mask already unions tables
    partials = ds.map_batches(_candidates, batch_format="pandas", batch_size=4096)
    return _global_topk(partials, k)
