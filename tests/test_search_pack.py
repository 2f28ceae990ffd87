"""Grouped quantiles, BM25 search, and sequence packing semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.packing import pack_sequences
from fuzzy_matching_ray.extras.relational import grouped_quantiles
from fuzzy_matching_ray.extras.search import bm25_topk


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_matches_disc_definition():
    rng = np.random.Generator(np.random.PCG64(7))
    rows = [
        {"k": f"g{i % 3}", "v": float(x)}
        for i, x in enumerate(rng.integers(0, 1000, size=400))
    ]
    out = (
        grouped_quantiles(rd.from_items(rows), key="k", val="v", num_partitions=4)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    df = pd.DataFrame(rows)
    for g, sub in df.groupby("k"):
        vals = np.sort(sub["v"].to_numpy())
        n = vals.size
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            expect = vals[int(np.ceil(q * n)) - 1]
            assert out.loc[g, col] == expect, (g, col)
        assert out.loc[g, "n"] == n

    # q=0 is percentile_disc(0) = the group MIN (regression: the
    # unclamped rank ceil(0·n)-1 = -1 wrapped to a neighboring group)
    out0 = (
        grouped_quantiles(
            rd.from_items(rows), key="k", val="v", qs=(0.0, 1.0),
            out_names=("vmin", "vmax"), num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
    )
    for g, sub in df.groupby("k"):
        assert out0.loc[g, "vmin"] == sub["v"].min()
        assert out0.loc[g, "vmax"] == sub["v"].max()


@pytest.mark.usefixtures("ray_session")
def test_bm25_ranks_term_dense_doc_first():
    rows = [
        {"doc_id": 1, "text": "hash join hash join hash"},
        {"doc_id": 2, "text": "merge sort only here"},
        {"doc_id": 3, "text": "nothing relevant at all whatsoever"},
        {"doc_id": 4, "text": "hash once amid much other unrelated text padding tokens"},
    ]
    out = bm25_topk(rd.from_items(rows), terms=("hash", "join"), k=3)
    assert out["doc_id"].tolist()[0] == 1
    assert 3 not in out["doc_id"].tolist()
    # deterministic: same input -> identical frame
    out2 = bm25_topk(rd.from_items(rows), terms=("hash", "join"), k=3)
    pd.testing.assert_frame_equal(out, out2)


@pytest.mark.usefixtures("ray_session")
def test_bm25_block_layout_invariant():
    """Regression: scores must not depend on block layout.

    Two traps this pins down: (1) blocks sliced from a driver
    DataFrame keep their ORIGINAL pandas index, so the per-batch
    explode/groupby(level=0)/reindex alignment must reset the index
    (pre-round-5 bug: every block after the first scored tf=0); (2)
    the two-level distributed merge (repartition + per-block prune)
    must keep the exact global top-k when partials arrive from many
    more blocks than ``merge_partitions``."""
    rng = np.random.default_rng(11)
    vocab = "alpha beta gamma delta hash join scan".split()
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=int(n)).tolist())
                for n in rng.integers(3, 30, size=500)
            ],
        }
    )
    out1 = bm25_topk(
        rd.from_pandas(df, override_num_blocks=1), terms=("hash", "join"), k=10
    )
    out40 = bm25_topk(
        rd.from_pandas(df, override_num_blocks=40),
        terms=("hash", "join"),
        k=10,
        merge_partitions=4,
    )
    pd.testing.assert_frame_equal(out1, out40)


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_concat_and_chunk_layout():
    # shard 0 (doc_ids all % 64 distinct -> use ids within one shard)
    rows = [
        {"doc_id": 0, "text": " ".join(["w"] * 300)},   # [0, 300)
        {"doc_id": 64, "text": " ".join(["w"] * 300)},  # [300, 600) straddles 512
        {"doc_id": 128, "text": ""},                     # empty at 600
        {"doc_id": 192, "text": " ".join(["w"] * 500)},  # [600, 1100)
        {"doc_id": 1, "text": " ".join(["w"] * 10)},     # other shard restarts at 0
    ]
    out = (
        pack_sequences(rd.from_items(rows), budget=512, num_shards=64, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, ["seq_start", "pack_first", "pack_last"]].tolist() == [0, 0, 0]
    assert out.loc[64, ["seq_start", "pack_first", "pack_last"]].tolist() == [300, 0, 1]
    assert out.loc[128, ["seq_start", "pack_first", "pack_last"]].tolist() == [600, 1, 1]
    assert out.loc[192, ["seq_start", "pack_first", "pack_last"]].tolist() == [600, 1, 2]
    assert out.loc[1, ["seq_start", "pack_first", "pack_last"]].tolist() == [0, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_multimodal_resize_and_frame_sample():
    from fuzzy_matching_ray.extras.multimodal import (
        frame_sample_media,
        resize_media,
        text_to_fake_binary,
    )

    rows = [{"doc_id": 1, "text": "x" * 2000}, {"doc_id": 2, "text": "y" * 100}]
    media = text_to_fake_binary(rd.from_items(rows))
    rs = resize_media(media, width=10, height=10).to_pandas().set_index("doc_id")
    blob = rs.loc[1, "media"]
    import struct

    assert blob[:4] == b"FMRB" and struct.unpack("<HH", blob[4:8]) == (10, 10)
    assert len(blob) < 2008  # payload subsampled

    fr = frame_sample_media(media, frame_bytes=256, stride=4).to_pandas()
    f1 = fr[fr.doc_id == 1]
    # 2000 bytes -> 8 frames -> sampled idx 0 and 4
    assert f1["frame_idx"].tolist() == [0, 4]
    assert f1["frame_len"].tolist() == [256, 256]
    f2 = fr[fr.doc_id == 2]
    assert f2["frame_idx"].tolist() == [0] and f2["frame_len"].tolist() == [100]


@pytest.mark.usefixtures("ray_session")
def test_multimodal_features():
    from fuzzy_matching_ray.extras.multimodal import media_features, text_to_fake_binary

    rows = [{"doc_id": 1, "text": "abc"}, {"doc_id": 2, "text": "é"}, {"doc_id": 3, "text": ""}]
    media = text_to_fake_binary(rd.from_items(rows))
    out = media_features(media).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [3, ord("a") + ord("b") + ord("c"), ord("c"), 0]
    assert out.loc[2, "n_bytes"] == 2  # é is 2 utf-8 bytes
    assert out.loc[2, "n_hi"] == 2  # both continuation/high bytes ≥ 0x80
    assert out.loc[3].tolist() == [0, 0, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_hll_approx_ndistinct_within_error():
    from fuzzy_matching_ray.extras.aggregates import approx_ndistinct

    rng = np.random.Generator(np.random.PCG64(3))
    rows = []
    truth = {"a": 5000, "b": 700, "c": 12}
    for k, ndv in truth.items():
        vals = rng.integers(0, ndv, size=ndv * 3)  # repeats; ndv distinct-ish
        for v in vals:
            rows.append({"grp": k, "val": f"{k}-{v}"})
    out = (
        approx_ndistinct(rd.from_items(rows), key_col="grp", val_col="val", num_partitions=4)
        .to_pandas()
        .set_index("grp")["ndv_est"]
    )
    import pandas as pd_

    df = pd_.DataFrame(rows)
    for k in truth:
        exact = df[df.grp == k]["val"].nunique()
        rel = abs(out[k] - exact) / exact
        assert rel < 0.08, (k, out[k], exact)
