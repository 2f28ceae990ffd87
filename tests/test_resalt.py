"""Hot-bucket re-salt mode (cfg.hot_bucket_mode='resalt'): finer LSH
banding inside over-budget buckets instead of sorted-id chunk drops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.hashing import salt_keys
from fuzzy_matching_ray.stages.minhash import (
    CHANNEL_CODES,
    RESALT_CHANNEL,
    SKEW_CHANNEL,
    _bucket_pairs_resalt,
    channel_code,
)


def test_salt_keys_group_by_trailing_rows():
    rng = np.random.default_rng(7)
    sigs = rng.integers(0, 1 << 60, size=(6, 12), dtype=np.uint64)
    # docs 0/1/2 agree on the last 4 rows; 3/4 agree on a different tail
    sigs[1, -4:] = sigs[0, -4:]
    sigs[2, -4:] = sigs[0, -4:]
    sigs[4, -4:] = sigs[3, -4:]
    keys = salt_keys(sigs, 4)
    assert keys[0] == keys[1] == keys[2]
    assert keys[3] == keys[4]
    assert keys[0] != keys[3] and keys[5] not in (keys[0], keys[3])
    # agreeing on only 3 of the 4 salt rows must NOT collide
    sigs2 = sigs.copy()
    sigs2[5, -3:] = sigs[0, -3:]
    assert salt_keys(sigs2, 4)[5] != keys[0]


def test_bucket_pairs_resalt_accounting_identity():
    # 30 ids in 3 salt groups of 4/3/2 + 21 singletons
    ids = np.arange(100, 130, dtype=np.uint64)
    salts = np.arange(100, 130, dtype=np.uint64) * np.uint64(7919)
    salts[0:4] = 11
    salts[4:7] = 22
    salts[7:9] = 33
    out, dropped, resalted = _bucket_pairs_resalt(
        ids, salts, max_bucket=64, channel=channel_code("minhash")
    )
    n = 30
    emitted = len(out)
    assert emitted == 6 + 3 + 1  # C(4,2)+C(3,2)+C(2,2)
    assert dropped == 0
    assert emitted + dropped + resalted == n * (n - 1) // 2
    # pairs stay within their salt group
    groups = dict(zip(ids.tolist(), salts.tolist()))
    assert all(groups[int(s)] == groups[int(d)] for s, d in zip(out["src"], out["dst"]))
    assert (out["bucket_size"] == n).all()


def test_bucket_pairs_resalt_oversize_group_falls_back_to_budget():
    # one salt group larger than max_bucket → chunk/budget path inside it
    ids = np.arange(0, 40, dtype=np.uint64)
    salts = np.full(40, 5, dtype=np.uint64)
    out, dropped, resalted = _bucket_pairs_resalt(
        ids, salts, max_bucket=8, channel=channel_code("minhash"), max_pairs=28
    )
    # first chunk C(8,2)=28 pairs + 4 chain links from the other chunks
    assert len(out) == 28 + 4
    assert resalted == 0  # everything shares one salt: nothing separated
    assert dropped == 40 * 39 // 2 - 32


def test_resalt_mode_flagship_matches_budget_on_clean_corpus(
    ray_session, tiny_transcripts
):
    """On a corpus with no hot buckets both modes must produce
    identical clusters (the modes only differ inside over-budget
    buckets)."""
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    res_b = dedup_transcripts(turns, PipelineConfig(num_partitions=4))
    res_r = dedup_transcripts(
        turns, PipelineConfig(num_partitions=4, hot_bucket_mode="resalt")
    )
    assert res_b.metrics["dropped_pairs_hot_buckets"] == 0
    assert res_r.metrics["resalted_pairs_hot_buckets"] == 0
    cb = res_b.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    cr = res_r.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(cb, cr)


def _boilerplate_docs(n_filler: int = 60, seed: int = 3):
    """Docs sharing heavy boilerplate (hot LSH buckets, pairwise
    Jaccard ≈ 0.4 — NOT dups) plus one true near-dup pair whose texts
    differ by a few words."""
    rng = np.random.default_rng(seed)
    boiler = " ".join(f"boilerplate{w}" for w in range(260))
    rows = []
    for i in range(n_filler):
        uniq = " ".join(
            f"tok{rng.integers(0, 1 << 30)}" for _ in range(170)
        )
        rows.append({"conv_id": f"doc{i:04d}", "text_canon": boiler + " " + uniq})
    shared_tail = " ".join(f"pair{w}" for w in range(170))
    rows.append({"conv_id": "dup_a", "text_canon": boiler + " " + shared_tail})
    rows.append(
        {"conv_id": "dup_b", "text_canon": boiler + " " + shared_tail + " extra"}
    )
    return rows


def _minhash_pair_stats(rows, cfg):
    """docs → (emitted_candidate_pairs, dropped, resalted, pair_df)."""
    from fuzzy_matching_ray.stages.minhash import (
        candidate_pairs_from_buckets,
        compute_signatures,
        dedup_pairs,
        minhash_band_rows,
    )

    docs = rd.from_items(rows)
    sigs = compute_signatures(docs, cfg, with_shingles=False, n_docs=len(rows))
    band_rows = minhash_band_rows(sigs, cfg)
    pairs = dedup_pairs(
        candidate_pairs_from_buckets(band_rows, cfg, "minhash", cfg.num_partitions),
        cfg.num_partitions,
    ).to_pandas()
    skew = pairs["channel"] == CHANNEL_CODES[SKEW_CHANNEL]
    resalt = pairs["channel"] == CHANNEL_CODES[RESALT_CHANNEL]
    live = pairs[~skew & ~resalt]
    return (
        len(live),
        int(pairs.loc[skew, "dropped"].sum()),
        int(pairs.loc[resalt, "dropped"].sum()),
        live,
    )


def test_resalt_reduces_drops_and_keeps_true_pair_on_skewed_corpus(ray_session):
    from fuzzy_matching_ray.hashing import nid_of

    rows = _boilerplate_docs()
    base = dict(num_partitions=4, max_band_bucket=16, max_pairs_per_bucket=120)
    n_live_b, dropped_b, resalted_b, _ = _minhash_pair_stats(
        rows, PipelineConfig(**base)
    )
    n_live_r, dropped_r, resalted_r, live_r = _minhash_pair_stats(
        rows, PipelineConfig(**base, hot_bucket_mode="resalt")
    )
    # the boilerplate corpus must actually exercise the hot path
    assert dropped_b > 0
    assert resalted_b == 0
    # resalt: separations are accounted as resalted, budget drops shrink
    assert resalted_r > 0
    assert dropped_r < dropped_b
    # the true near-dup pair survives re-salting as a candidate (its
    # signatures agree far beyond the boilerplate bands)
    a, b = (int(x) for x in nid_of(["dup_a", "dup_b"]))
    lo, hi = min(a, b), max(a, b)
    assert ((live_r["src"] == lo) & (live_r["dst"] == hi)).any()
    # bounded work: resalt emits no more candidates than the budget path
    assert n_live_r <= n_live_b


def test_resalt_config_validation():
    with pytest.raises(ValueError):
        PipelineConfig(hot_bucket_mode="nope")
    with pytest.raises(ValueError):
        PipelineConfig(resalt_rows=0)
