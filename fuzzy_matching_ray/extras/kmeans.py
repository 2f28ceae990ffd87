"""Distributed spherical k-means (Lloyd's) and SemDeDup-style
semantic deduplication over an embedding column (``list<float>``).

Reference parity note: the reference repo (marginalprog/fuzzy-matching)
has no embedding operators at all — this module is part of the
engine's added LLM-training-data surface (SURVEY.md "beyond the
reference"), following the published SemDeDup recipe (Abbas et al.
2023, arXiv:2303.09540): k-means partitions the corpus so near-dup
search is O(n²/k) instead of O(n²), then within-cluster cosine
pairs above a threshold mark semantic duplicates.

Why this is bit-deterministic across ANY block layout (the property
the value-hash oracles need): every distributed reduction is over
int64 — unit vectors are quantized to ``round(x · 2**SCALE_BITS)``,
assignment uses exact integer dot products (numpy int64 matmul never
routes through BLAS, so per-row results cannot depend on batch
shape), and per-cluster sums are int64 adds, which commute exactly.
The only floating-point math (centroid mean → normalize → re-quantize)
happens on the driver over a k×d matrix, identically regardless of
how the data was partitioned.  A serial golden running independent
per-row loops over the same quantized representation therefore
matches the distributed output bit-for-bit
(``fixtures.ensure_kmeans_golden``).

Scale shape (the 100-TB reading):

* the slim quantized projection (id + d×int64) is materialized ONCE
  and every Lloyd iteration streams over it — Lloyd's is inherently
  multi-pass, and re-decoding the raw embedding column T times would
  cost more than letting the object store hold (and spill) the slim
  blocks;
* per-iteration exchange is k rows per *batch* of integer partials,
  reduced through one ``bucketed_group_apply`` keyed by cluster — the
  driver only ever sees k rows (the centroid matrix), never data rows;
* centroids ride ``ray.put`` once per iteration (zero-copy plasma
  reads in every task), never per batch;
* SemDeDup's within-cluster pairwise pass is blockwise triangular
  (``block_rows`` × ``block_rows`` integer matmuls), so a hot cluster
  costs bounded memory no matter its size; k must grow with the
  corpus (the paper uses k ≈ n/100) to bound per-cluster work.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

SCALE_BITS = 24
_SCALE = 1 << SCALE_BITS


def quantize_unit(mat: np.ndarray) -> np.ndarray:
    """float (n, d) → int64 quantized unit vectors: L2-normalize in
    float64, then ``round(x · 2**SCALE_BITS)``.  Zero vectors stay
    zero.  Shared scalar helper: the serial golden MUST quantize
    through this function for the outputs to be comparable at all
    (same contract as ``ann._normalize`` in ``ensure_ann_golden``)."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return np.rint(mat / norms[:, None] * _SCALE).astype(np.int64)


def sim_threshold_int(threshold: float) -> int:
    """Cosine threshold → integer dot-product threshold on quantized
    unit vectors (similarity contract: ``dot_int / 2**(2·SCALE_BITS)``).
    Shared by the distributed path and the serial golden."""
    return int(math.ceil(threshold * float(_SCALE) * float(_SCALE)))


def update_centroids(
    cent_q: np.ndarray, counts: np.ndarray, sums: np.ndarray
) -> np.ndarray:
    """Driver-side Lloyd update over exact integer partials: mean →
    L2-normalize → re-quantize.  Clusters that captured no points keep
    their previous centroid.  k×d driver math — runs identically no
    matter how the partials were produced."""
    new = cent_q.copy()
    nz = counts > 0
    if nz.any():
        mean = sums[nz].astype(np.float64) / counts[nz][:, None]
        new[nz] = quantize_unit(mean)
    return new


def _quant_table(batch: pa.Table, id_col: str, vec_col: str) -> pa.Table:
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = batch[vec_col].combine_chunks()
    if isinstance(vecs, pa.ChunkedArray):  # single-chunk after combine
        vecs = vecs.chunk(0) if vecs.num_chunks else pa.array([], pa.list_(pa.float32()))
    flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(ids)
    d = flat.size // n if n else 0
    q = quantize_unit(flat.reshape(n, d)) if n else np.empty((0, 0), np.int64)
    return pa.table(
        {
            "nid": pa.array(ids, pa.int64()),
            "qv": pa.FixedSizeListArray.from_arrays(pa.array(q.ravel(), pa.int64()), d or 1),
        }
    )


def _qv_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n, d) int64) from a slim quantized batch, zero-copy."""
    ids = batch["nid"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch["qv"].combine_chunks()
    d = col.type.list_size
    q = col.values.to_numpy(zero_copy_only=False).reshape(-1, d)
    return ids, q


def _smallest_k_rows(slim: ray.data.Dataset, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(ids, vectors) of the k smallest ``nid`` rows: per-batch k-smallest
    partials, one k×blocks-row exchange to a single reducer, ≤ k rows
    to the driver.  Deterministic seed selection without a full sort."""

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        order = pa.compute.sort_indices(batch, sort_keys=[("nid", "ascending")])
        return batch.take(order[:k])

    rows = (
        slim.map_batches(_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_partial, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: r["nid"])
    ids = np.array([r["nid"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in rows])
    return ids, mat


def _iter_partials(ref, k: int):
    """Per-batch assignment + exact integer per-cluster partial sums.
    One output row per nonempty cluster per batch."""

    def _fn(batch: pa.Table) -> pa.Table:
        ids, q = _qv_matrix(batch)
        cent = ray.get(ref)  # zero-copy plasma read, once per task call
        d = q.shape[1]
        if not len(ids):
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sums": pa.FixedSizeListArray.from_arrays(pa.array([], pa.int64()), d),
                }
            )
        assign = np.argmax(q @ cent.T, axis=1)  # exact int64 dots
        kk = cent.shape[0]
        sums = np.zeros((kk, d), np.int64)
        np.add.at(sums, assign, q)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cluster": pa.array(nz.astype(np.int64), pa.int64()),
                "cnt": pa.array(counts[nz], pa.int64()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].ravel(), pa.int64()), d
                ),
            }
        )

    return _fn


def _sum_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket reduce of (cluster, cnt, sums) partials:
    int64 adds commute, so any arrival order yields the same result."""
    mats = np.stack(df["sums"].to_numpy())
    codes, uniq = pd.factorize(df["cluster"].to_numpy(), sort=True)
    out_sums = np.zeros((len(uniq), mats.shape[1]), np.int64)
    np.add.at(out_sums, codes, mats)
    out_cnt = np.zeros(len(uniq), np.int64)
    np.add.at(out_cnt, codes, df["cnt"].to_numpy().astype(np.int64))
    return pd.DataFrame(
        {
            "cluster": uniq.astype(np.int64),
            "cnt": out_cnt,
            "sums": list(out_sums),
        }
    )


def kmeans_fit(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Fit spherical k-means; returns ``(slim, centroids_q)`` where
    ``slim`` is the materialized quantized projection (``nid``, ``qv``)
    and ``centroids_q`` the final (k, d) int64 quantized centroid
    matrix.  Init: the k smallest ids' vectors (deterministic, no RNG
    — the corpus defines its own seeds)."""
    slim = ds.map_batches(
        lambda b: _quant_table(b, id_col, vec_col), batch_format="pyarrow"
    ).materialize()
    _, cent = _smallest_k_rows(slim, k)
    for _ in range(iters):
        ref = ray.put(cent)
        partials = slim.map_batches(_iter_partials(ref, k), batch_format="pyarrow")
        rows = bucketed_group_apply(
            partials, "cluster", _sum_partials, num_partitions=min(8, max(1, k))
        ).take_all()  # ≤ k rows by construction
        counts = np.zeros(cent.shape[0], np.int64)
        sums = np.zeros_like(cent)
        for r in rows:
            counts[int(r["cluster"])] = int(r["cnt"])
            sums[int(r["cluster"])] = np.asarray(r["sums"], dtype=np.int64)
        cent = update_centroids(cent, counts, sums)
    return slim, cent


def kmeans_embeddings(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Final (``vec_id``, ``cluster``) assignment under the fitted
    quantized centroids — bit-deterministic for any block layout."""
    slim, cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cent)

    def _assign(batch: pa.Table) -> pa.Table:
        ids, q = _qv_matrix(batch)
        cent = ray.get(ref)
        a = np.argmax(q @ cent.T, axis=1).astype(np.int64) if len(ids) else np.array([], np.int64)
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "cluster": pa.array(a, pa.int64())})

    return slim.map_batches(_assign, batch_format="pyarrow")


def _cluster_dedup_fn(thr_int: int, block_rows: int):
    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        out_keep: list[np.ndarray] = []
        # clusters per bucket = k / P (few); the per-cluster work is a
        # matmul, so this Python loop is amortized — not the
        # millions-of-tiny-groups case bucketed_group_apply exists for
        for cl, g in df.groupby("cluster", sort=True):
            g = g.sort_values("nid")
            ids = g["nid"].to_numpy().astype(np.int64)
            q = np.stack(g["qv"].to_numpy()).astype(np.int64)
            n = len(ids)
            dup = np.zeros(n, bool)
            for lo in range(0, n, block_rows):
                hi = min(lo + block_rows, n)
                blk = q[lo:hi]
                flag = np.zeros(hi - lo, bool)
                # vs every earlier block (bounded B×B integer matmuls)
                for plo in range(0, lo, block_rows):
                    prev = q[plo : min(plo + block_rows, lo)]
                    flag |= (blk @ prev.T >= thr_int).any(axis=1)
                # strict upper triangle within the block: row i is a
                # dup if ANY lower-id row j has sim ≥ threshold
                # (pairwise rule, not the greedy kept-chain — documented
                # contract shared with the serial golden)
                s = blk @ blk.T
                tri = np.tril(s >= thr_int, k=-1)
                flag |= tri.any(axis=1)
                dup[lo:hi] = flag
            out_id.append(ids)
            out_cl.append(np.full(n, int(cl), np.int64))
            out_keep.append(~dup)
        if not out_id:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                    "keep": pd.Series(dtype="bool"),
                }
            )
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_id),
                "cluster": np.concatenate(out_cl),
                "keep": np.concatenate(out_keep),
            }
        )

    return _fn


def semdedup_embeddings(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    iters: int = 5,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SemDeDup: k-means partition, then within-cluster quantized-cosine
    pairwise marking.  Returns (``vec_id``, ``cluster``, ``keep``) —
    ``keep`` is False iff some lower-id member of the same cluster has
    similarity ≥ ``threshold``.  Pick ``k ∝ corpus size`` so the
    per-cluster pairwise pass stays O((n/k)²) per cluster."""
    slim, cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cent)

    def _assign_with_vec(batch: pa.Table) -> pa.Table:
        ids, q = _qv_matrix(batch)
        cent = ray.get(ref)
        a = np.argmax(q @ cent.T, axis=1).astype(np.int64) if len(ids) else np.array([], np.int64)
        return batch.append_column("cluster", pa.array(a, pa.int64()))

    assigned = slim.map_batches(_assign_with_vec, batch_format="pyarrow")
    thr_int = sim_threshold_int(threshold)
    return bucketed_group_apply(
        assigned,
        "cluster",
        _cluster_dedup_fn(thr_int, block_rows),
        num_partitions=min(num_partitions, max(1, k)),
    )
