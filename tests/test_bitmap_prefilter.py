"""Bitmap union-popcount prefilter (config.bitmap_bits): the exactness
contract is that culling only ever removes pairs whose true Jaccard is
provably below the gray-zone floor ``lo = min(edit_gate_low,
jaccard_threshold)`` — so the scored stream differs from the
prefilter-off run ONLY on sub-``lo`` pairs, and the post-filter edge
set plus clusters are bit-identical."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig


def test_union_popcount_matches_numpy():
    from fuzzy_matching_ray.stages.verify import _union_popcount

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**63, size=(257, 16), dtype=np.uint64)
    b = rng.integers(0, 2**63, size=(257, 16), dtype=np.uint64)
    got = _union_popcount(a, b)
    want = np.array(
        [sum(bin(int(x)).count("1") for x in row) for row in (a | b)], dtype=np.int64
    )
    assert np.array_equal(got, want)


def test_build_bitmaps_sets_exactly_the_hashed_bits():
    from fuzzy_matching_ray.stages.verify import _build_bitmaps

    rng = np.random.default_rng(3)
    lens = rng.integers(0, 50, size=300).astype(np.int64)
    flat = rng.integers(0, 2**32, size=int(lens.sum()), dtype=np.uint64).astype(
        np.uint32
    )
    bits = 256
    bm = _build_bitmaps(flat, lens, bits)
    assert bm.shape == (300, bits // 64)
    off = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    for i in range(300):
        want = np.zeros(bits, dtype=bool)
        want[(flat[off[i] : off[i + 1]] & np.uint32(bits - 1)).astype(np.int64)] = True
        got_words = bm[i]
        got = np.unpackbits(
            got_words.view(np.uint8), bitorder="little"
        ).astype(bool)
        assert np.array_equal(got, want), f"doc {i}"


def test_bitmap_bound_is_exact_on_random_sets():
    """i_ub = |A|+|B|−popcount(bm_A|bm_B) must always be ≥ |A∩B|: the
    cull condition can then never remove a pair at or above lo."""
    from fuzzy_matching_ray.stages.verify import _build_bitmaps, _union_popcount

    rng = np.random.default_rng(11)
    for bits in (64, 256, 1024):
        sets = [
            np.unique(rng.integers(0, 5000, size=rng.integers(1, 400)).astype(np.uint32))
            for _ in range(60)
        ]
        lens = np.array([s.size for s in sets], dtype=np.int64)
        flat = np.concatenate(sets)
        bm = _build_bitmaps(flat, lens, bits)
        for _ in range(200):
            i, j = rng.integers(0, 60, size=2)
            inter = np.intersect1d(sets[i], sets[j], assume_unique=True).size
            pc = int(_union_popcount(bm[i : i + 1], bm[j : j + 1])[0])
            i_ub = sets[i].size + sets[j].size - pc
            assert i_ub >= inter


def _run(turns_dir: str, bitmap_bits: int):
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    turns = rd.read_parquet(turns_dir)
    cfg = PipelineConfig(num_partitions=4, bitmap_bits=bitmap_bits)
    res = dedup_transcripts(turns, cfg)
    edges = (
        res.edges.to_pandas()[["src", "dst", "channel", "score"]]
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    clusters = res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return edges, clusters


def test_flagship_edges_identical_with_and_without_prefilter(
    ray_session, tiny_transcripts
):
    e_on, c_on = _run(tiny_transcripts["turns_dir"], 8192)
    e_off, c_off = _run(tiny_transcripts["turns_dir"], 0)
    pd.testing.assert_frame_equal(e_on, e_off)
    pd.testing.assert_frame_equal(c_on, c_off)


def test_prefilter_only_culls_sub_lo_pairs(ray_session, tiny_transcripts):
    """Score every candidate pair with the prefilter on and off: rows
    may differ only where BOTH runs sit strictly below lo (the culled
    side reports 0.0; the uncv side reports the true sub-lo score)."""
    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.stages.assemble import assemble_documents
    from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
    from fuzzy_matching_ray.stages.minhash import compute_signatures
    from fuzzy_matching_ray.stages.verify import VerifierPool, attach_texts_broadcast

    import itertools

    import pyarrow as pa
    import ray

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = canonicalize_documents(
        assemble_documents(turns, num_partitions=4), PipelineConfig(num_partitions=4)
    ).materialize()
    ids = [r["conv_id"] for r in docs.select_columns(["conv_id"]).take(60)]
    nids = nid_of(ids)
    pairs = list(itertools.combinations(range(len(nids)), 2))
    from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES

    batch = pa.table(
        {
            "src": pa.array([int(nids[a]) for a, _ in pairs], pa.uint64()),
            "dst": pa.array([int(nids[b]) for _, b in pairs], pa.uint64()),
            # the minhash channel: gate-bypassing channels (substring)
            # legitimately report est-vs-exact below lo, tested separately
            "channel": pa.array([CHANNEL_CODES["minhash"]] * len(pairs), pa.int8()),
        }
    )

    scores = {}
    for bits in (8192, 0):
        cfg = PipelineConfig(num_partitions=4, bitmap_bits=bits)
        sigs = compute_signatures(docs, cfg).materialize()
        _, store_ref = attach_texts_broadcast(None, docs, cfg, sigs=sigs)
        store = ray.get(store_ref)
        assert (store["bitmaps"] is not None) == (bits > 0)
        pool = VerifierPool(cfg, store_ref)
        out = pool(batch)
        scores[bits] = out["jaccard"].to_numpy(zero_copy_only=False)

    lo = min(PipelineConfig().edit_gate_low, PipelineConfig().jaccard_threshold)
    on, off = scores[8192], scores[0]
    diff = on != off
    # the prefilter must actually fire on an all-pairs stream
    assert diff.any()
    assert np.all(on[diff] == 0.0)
    assert np.all(off[diff] < lo)
    # agreement everywhere at or above lo
    assert np.array_equal(on >= lo, off >= lo)
    assert np.allclose(on[on >= lo], off[off >= lo])


def test_prefilter_substring_channel_stays_sub_lo(ray_session, tiny_transcripts):
    """Gate-bypassing channels (substring) are force-scored even below
    the sig gate, so a culled pair reports its est instead of the exact
    sub-lo score — both sides must still sit strictly below lo and the
    at-or-above-lo stream must be untouched (edges are decided there)."""
    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.stages.assemble import assemble_documents
    from fuzzy_matching_ray.stages.canonicalize import canonicalize_documents
    from fuzzy_matching_ray.stages.minhash import (
        CHANNEL_CODES,
        compute_signatures,
    )
    from fuzzy_matching_ray.stages.verify import VerifierPool, attach_texts_broadcast

    import itertools

    import pyarrow as pa
    import ray

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = canonicalize_documents(
        assemble_documents(turns, num_partitions=4), PipelineConfig(num_partitions=4)
    ).materialize()
    ids = [r["conv_id"] for r in docs.select_columns(["conv_id"]).take(60)]
    nids = nid_of(ids)
    pairs = list(itertools.combinations(range(len(nids)), 2))
    batch = pa.table(
        {
            "src": pa.array([int(nids[a]) for a, _ in pairs], pa.uint64()),
            "dst": pa.array([int(nids[b]) for _, b in pairs], pa.uint64()),
            "channel": pa.array([CHANNEL_CODES["substring"]] * len(pairs), pa.int8()),
        }
    )
    scores = {}
    for bits in (8192, 0):
        cfg = PipelineConfig(num_partitions=4, bitmap_bits=bits)
        sigs = compute_signatures(docs, cfg).materialize()
        _, store_ref = attach_texts_broadcast(None, docs, cfg, sigs=sigs)
        out = VerifierPool(cfg, store_ref)(batch)
        scores[bits] = out["jaccard"].to_numpy(zero_copy_only=False)
    lo = min(PipelineConfig().edit_gate_low, PipelineConfig().jaccard_threshold)
    on, off = scores[8192], scores[0]
    diff = on != off
    assert diff.any()
    assert np.all(on[diff] < lo)
    assert np.all(off[diff] < lo)
    assert np.array_equal(on >= lo, off >= lo)
    assert np.allclose(on[on >= lo], off[off >= lo])
