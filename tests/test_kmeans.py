"""Distributed spherical k-means + SemDeDup (extras/kmeans.py).

The contract under test is BIT-determinism across block layouts
(integer-quantized vectors, exact int64 reductions) and equality with
the independent serial golden (fixtures.ensure_kmeans_golden)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _read_embeddings(num_blocks: int):
    import ray.data

    return ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        override_num_blocks=num_blocks,
    )


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


def test_kmeans_block_layout_invariance(ray_session):
    from fuzzy_matching_ray.extras.kmeans import kmeans_embeddings

    a = _sorted_df(kmeans_embeddings(_read_embeddings(1), k=5, iters=3))
    b = _sorted_df(kmeans_embeddings(_read_embeddings(7), k=5, iters=3))
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"vec_id", "cluster"}
    assert a["cluster"].between(0, 4).all()


def test_kmeans_matches_serial_golden(ray_session, tmp_path):
    from fuzzy_matching_ray import fixtures
    from fuzzy_matching_ray.extras.kmeans import kmeans_embeddings

    paths = fixtures.ensure_kmeans_golden(SF_DIR, k=5, iters=3, threshold=0.3)
    golden = pq.read_table(paths["kmeans"]).to_pandas().sort_values("vec_id").reset_index(drop=True)
    got = _sorted_df(kmeans_embeddings(_read_embeddings(4), k=5, iters=3))
    pd.testing.assert_frame_equal(got, golden)


def test_semdedup_matches_serial_golden(ray_session):
    from fuzzy_matching_ray import fixtures
    from fuzzy_matching_ray.extras.kmeans import semdedup_embeddings

    paths = fixtures.ensure_kmeans_golden(SF_DIR, k=5, iters=3, threshold=0.3)
    golden = (
        pq.read_table(paths["semdedup"]).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    got = _sorted_df(semdedup_embeddings(_read_embeddings(4), k=5, iters=3, threshold=0.3))
    pd.testing.assert_frame_equal(got, golden)


def test_semdedup_drops_exact_duplicate_higher_id(ray_session):
    """Two identical vectors in one corpus: the lower id is kept, the
    higher id marked keep=False; dissimilar rows all survive."""
    import ray.data

    from fuzzy_matching_ray.extras.kmeans import semdedup_embeddings

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(6, 16)).astype(np.float32)
    base[4] = base[1]  # vec_id 4 duplicates vec_id 1
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(6)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in base], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = _sorted_df(semdedup_embeddings(ds, k=2, iters=2, threshold=0.999))
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert keep[1] is True or keep[1] == True  # noqa: E712 — numpy bool
    assert not keep[4]
    assert sum(1 for v in keep.values() if not v) == 1


def test_semdedup_blockwise_matches_whole_cluster(ray_session):
    """block_rows smaller than the cluster must not change decisions
    (the blockwise triangular pass is an exact tiling, not an
    approximation)."""
    from fuzzy_matching_ray.extras.kmeans import semdedup_embeddings

    a = _sorted_df(
        semdedup_embeddings(_read_embeddings(3), k=2, iters=2, threshold=0.25, block_rows=4)
    )
    b = _sorted_df(
        semdedup_embeddings(_read_embeddings(3), k=2, iters=2, threshold=0.25, block_rows=4096)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (~a["keep"]).sum() > 0, "threshold chosen so the test corpus has drops"


def test_kmeans_clusters_separable_synthetic(ray_session):
    """Sanity on a separable corpus: two far-apart bundles end up in
    two distinct clusters with zero mixing."""
    import ray.data

    from fuzzy_matching_ray.extras.kmeans import kmeans_embeddings

    rng = np.random.Generator(np.random.PCG64(11))
    a = rng.normal(loc=5.0, scale=0.05, size=(20, 8))
    b = rng.normal(loc=-5.0, scale=0.05, size=(20, 8))
    mat = np.vstack([a, b]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(40)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
        }
    )
    out = _sorted_df(kmeans_embeddings(ray.data.from_arrow(tbl), k=2, iters=4))
    first = set(out.loc[out["vec_id"] < 20, "cluster"])
    second = set(out.loc[out["vec_id"] >= 20, "cluster"])
    assert len(first) == 1 and len(second) == 1 and first != second
