"""Both embedding_cosine_pairs kernels (projection window / chunked
matmul) must emit the exact brute-force pair set.

The kernel choice is a per-block census decision, so the two scenarios
force each path: a high threshold on tightly clustered vectors makes
the ±ε window selective (window path); a low threshold on isotropic
64-d vectors makes ε exceed the projection spread (matmul path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.doc_dedup import embedding_cosine_pairs


def _brute(df: pd.DataFrame, threshold: float) -> set[tuple[int, int]]:
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    sims = mat @ mat.T
    ids = df["vec_id"].to_numpy()
    iu, ju = np.triu_indices(len(ids), k=1)
    m = sims[iu, ju] >= threshold
    return {
        (min(int(ids[a]), int(ids[b])), max(int(ids[a]), int(ids[b])))
        for a, b in zip(iu[m], ju[m])
    }


def _frame(n: int, dim: int, spread: float, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((max(n // 15, 1), dim))
    mat = centers[rng.integers(0, len(centers), n)] + spread * rng.standard_normal(
        (n, dim)
    )
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "block": np.repeat(np.arange(3, dtype=np.int64), -(-n // 3))[:n],
            "embedding": list(mat),
        }
    )


def _run(df: pd.DataFrame, threshold: float) -> set[tuple[int, int]]:
    out = embedding_cosine_pairs(
        rd.from_pandas(df),
        id_col="vec_id",
        vec_col="embedding",
        block_col="block",
        threshold=threshold,
        num_partitions=3,
    ).to_pandas()
    assert list(out.columns) == ["src", "dst"]
    return set(zip(out["src"].astype(int), out["dst"].astype(int)))


def test_window_path_matches_bruteforce(ray_session):
    # tight clusters + high threshold → selective window
    df = _frame(600, 16, spread=0.05, seed=3)
    exp = set()
    for _, g in df.groupby("block"):
        exp |= _brute(g, 0.97)
    assert _run(df, 0.97) == exp


def test_matmul_fallback_matches_bruteforce(ray_session):
    # isotropic 64-d + low threshold → ε=1.18 prunes nothing → matmul
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(500, dtype=np.int64),
            "block": np.zeros(500, dtype=np.int64),
            "embedding": list(rng.standard_normal((500, 64))),
        }
    )
    assert _run(df, 0.3) == _brute(df, 0.3)


def test_hot_block_budget_bounds_pairs_with_exact_drop_count(ray_session):
    """One hot block larger than max_block_rows is split into id-sorted
    chunks: emitted pairs are exactly the union of chunk-local brute
    force sets, and ONE sentinel row (src=-1) carries the exact count
    of skipped cross-chunk comparisons."""
    rng = np.random.default_rng(5)
    n, chunk = 300, 100
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "block": np.zeros(n, dtype=np.int64),
            "embedding": list(rng.standard_normal((n, 16))),
        }
    )
    out = embedding_cosine_pairs(
        rd.from_pandas(df),
        id_col="vec_id",
        vec_col="embedding",
        block_col="block",
        threshold=0.3,
        num_partitions=2,
        max_block_rows=chunk,
    ).to_pandas()
    sent = out[out["src"] < 0]
    pairs = out[out["src"] >= 0]
    # exact skip accounting: full space minus the three chunk spaces
    expected_dropped = n * (n - 1) // 2 - 3 * (chunk * (chunk - 1) // 2)
    assert sent["dst"].tolist() == [expected_dropped]
    exp = set()
    for s in range(0, n, chunk):
        exp |= _brute(df.iloc[s : s + chunk], 0.3)
    got = set(zip(pairs["src"].astype(int), pairs["dst"].astype(int)))
    assert got == exp
    # emission is bounded by the chunk-local space
    assert len(got) <= 3 * (chunk * (chunk - 1) // 2)


def test_dedup_clusters_filter_sentinels(ray_session):
    """embedding_dedup_clusters drops the skew sentinel before
    union-find: every output id is a real vec_id."""
    from fuzzy_matching_ray.extras.doc_dedup import embedding_dedup_clusters

    rng = np.random.default_rng(9)
    n = 120
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": np.zeros(n, dtype=np.int64),
            "embedding": list(rng.standard_normal((n, 8))),
        }
    )
    out = embedding_dedup_clusters(
        rd.from_pandas(df), threshold=0.9, num_partitions=2, max_block_rows=50
    ).to_pandas()
    assert len(out) == n
    assert out["vec_id"].min() >= 0
    assert out["cluster_id"].min() >= 0
