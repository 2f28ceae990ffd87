"""Similarity search (extras/ann.py): exactness of the brute-force
path, recall gates for the two approximate scale paths (LSH, IVF),
and serial-golden agreement (fixtures.ensure_ann_golden) — the
deterministic value contract the driver's oracle hash checks at
sf0.01 is also pinned here at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.ann import (
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    train_ivf_centroids,
)


def _corpus(n: int = 3000, dim: int = 32, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((40, dim))
    mat = centers[rng.integers(0, 40, n)] + 0.15 * rng.standard_normal((n, dim))
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)}
    )


def _exact_topk(df: pd.DataFrame, qmat: np.ndarray, qids: np.ndarray, k: int):
    mat = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    qn = qmat / np.linalg.norm(qmat, axis=1)[:, None]
    sims = np.round(qn @ mat.T, 6)
    ids = df["vec_id"].to_numpy()
    out = {}
    for r, qid in enumerate(qids):
        s = sims[r].copy()
        s[ids == qid] = -np.inf
        order = np.lexsort((ids, -s))[:k]
        out[int(qid)] = [int(ids[i]) for i in order]
    return out


def test_knn_bruteforce_exact(ray_session):
    df = _corpus(800)
    qmat = np.stack([np.asarray(v, np.float64) for v in df["embedding"][:6]])
    qids = df["vec_id"].to_numpy()[:6]
    got = knn_bruteforce(rd.from_pandas(df), qmat, list(qids), k=5)
    exp = _exact_topk(df, qmat, qids, 5)
    for qid, grp in got.groupby("query_id"):
        assert grp.sort_values("rank")["neighbor_id"].tolist() == exp[int(qid)]


def _recall_at_k(got: pd.DataFrame, exp: dict[int, list[int]], k: int) -> float:
    hits = tot = 0
    for qid, nbrs in exp.items():
        g = set(got[got.query_id == qid]["neighbor_id"])
        hits += len(g & set(nbrs))
        tot += len(nbrs)
    return hits / max(tot, 1)


def test_knn_lsh_recall(ray_session):
    df = _corpus()
    qmat = np.stack([np.asarray(v, np.float64) for v in df["embedding"][:20]])
    qids = df["vec_id"].to_numpy()[:20]
    got = knn_lsh(rd.from_pandas(df), qmat, list(qids), k=5)
    assert _recall_at_k(got, _exact_topk(df, qmat, qids, 5), 5) >= 0.9


def test_knn_ivf_recall(ray_session):
    df = _corpus()
    qmat = np.stack([np.asarray(v, np.float64) for v in df["embedding"][:20]])
    qids = df["vec_id"].to_numpy()[:20]
    got = knn_ivf(rd.from_pandas(df), qmat, list(qids), k=5, nlists=16, nprobe=4)
    assert _recall_at_k(got, _exact_topk(df, qmat, qids, 5), 5) >= 0.9
    # contract: at most k ranked rows per query, ranks 1..k contiguous
    for _, grp in got.groupby("query_id"):
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))


def test_ann_serial_golden_agreement(ray_session):
    """Distributed LSH/IVF output == the independent per-query serial
    golden at sf0.001 (same contract the sf0.01 driver oracle hashes)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from fuzzy_matching_ray import fixtures

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        import pytest

        pytest.skip("testdata not present")
    shutil.rmtree(os.path.join(fixtures.CACHE_ROOT, "ann_golden_sf0.001"), ignore_errors=True)
    paths = fixtures.ensure_ann_golden(sf_dir)

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.slice(0, 10)
    qids = head["vec_id"].to_pylist()
    qmat = np.stack([np.asarray(v, np.float64) for v in head["embedding"].to_pylist()])
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    for fn, path in ((knn_lsh, paths["lsh"]), (knn_ivf, paths["ivf"])):
        got = (
            fn(ds, qmat, qids, k=5)
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        exp = (
            pq.read_table(path)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)


def test_ivf_centroids_deterministic():
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((500, 16))
    a = train_ivf_centroids(sample, 8, seed=9)
    b = train_ivf_centroids(sample, 8, seed=9)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
