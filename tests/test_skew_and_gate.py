"""Skew handling (pair budget + drop accounting) and the verifier's
signature-estimate gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.stages.minhash import channel_code, _bucket_pairs
from fuzzy_matching_ray.cli import parse_match_fields, parse_name_fields


def test_bucket_pair_budget_and_chain_links():
    ids = np.arange(1000, 1300, dtype=np.uint64)  # 300 node ids
    out, dropped = _bucket_pairs(ids, max_bucket=64, channel=channel_code("minhash"), max_pairs=2016)
    # first chunk emits C(64,2)=2016 cross pairs; the remaining 4 chunks
    # contribute exactly one chain link each
    cross = len(out) - 4
    assert cross == 2016
    assert (out["bucket_size"] == 300).all()
    # chain links anchor to the bucket's min id
    assert (out["src"] == ids.min()).sum() >= 4
    # exact drop accounting returned alongside the pairs: chain links
    # are emitted cross pairs, so they are NOT counted as dropped
    assert dropped == 300 * 299 // 2 - 2016 - 4 == 42830


def test_bucket_pairs_unbudgeted_full():
    ids = np.arange(10, dtype=np.uint64)
    out, dropped = _bucket_pairs(ids, max_bucket=64, channel=channel_code("minhash"))
    assert len(out) == 45  # C(10,2), no chunking below max_bucket
    assert dropped == 0


def test_sig_est_gate_preserves_edges(ray_session, tiny_transcripts):
    """Edges with the estimate gate on must equal edges with it off
    (the gate may only skip pairs that cannot pass the thresholds)."""
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    e_gated = (
        dedup_transcripts(turns, PipelineConfig(num_partitions=4))
        .edges.to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    e_exact = (
        dedup_transcripts(turns, PipelineConfig(num_partitions=4, sig_est_gate=0.0))
        .edges.to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        e_gated[["src", "dst", "channel"]], e_exact[["src", "dst", "channel"]]
    )


def test_parse_match_fields_grammar():
    fields = parse_match_fields("last:0.4:true:token_sort,first:0.3,solo")
    assert [f.field for f in fields] == ["last", "first", "solo"]
    assert fields[0].weight == 0.4 and fields[0].transliterate
    assert fields[0].fuzzy_algorithm is not None
    assert fields[1].weight == 0.3 and not fields[1].transliterate
    assert fields[2].weight == 1.0
    # unknown algorithm falls back to None (reference behavior)
    assert parse_match_fields("x:1:false:bogus")[0].fuzzy_algorithm is None


def test_parse_name_fields():
    assert parse_name_fields("a=b, c = d") == {"a": "b", "c": "d"}
    assert parse_name_fields(None) is None
    assert parse_name_fields("") is None


def test_skew_sentinels_flow_and_exact_drop_metric(ray_session):
    """Sentinel rows must survive pair dedup, carry the exact dropped
    count, and be excluded from the verification stream."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.pipelines.dedup import _dropped_pairs
    from fuzzy_matching_ray.stages.minhash import (
        SKEW_CHANNEL,
        candidate_pairs_from_buckets,
        dedup_pairs,
    )

    cfg = PipelineConfig(num_partitions=4, max_band_bucket=8, max_pairs_per_bucket=28)
    # one mega-band (100 docs) + one small band (3 docs)
    nids = np.arange(1, 101, dtype=np.uint64)
    rows = pa.table(
        {
            "band_key": pa.array(
                np.concatenate([np.full(100, 7, np.uint64), np.full(3, 9, np.uint64)]),
                pa.uint64(),
            ),
            "nid": pa.array(np.concatenate([nids, nids[:3]]), pa.uint64()),
        }
    )
    pairs = dedup_pairs(
        candidate_pairs_from_buckets(rd.from_arrow(rows), cfg, "minhash", 4), 4
    ).materialize()
    dropped = _dropped_pairs(pairs)
    # mega-band: 13 chunks of ≤8; budget 28 = C(8,2) allows exactly the
    # first chunk's 28 cross pairs; the 12 chain links are emitted cross
    # pairs too → dropped = C(100,2) - 28 - 12
    assert dropped == 100 * 99 // 2 - 28 - 12
    df = pairs.to_pandas()
    skew = df[df.channel == channel_code(SKEW_CHANNEL)]
    assert len(skew) == 1 and int(skew.dropped.iloc[0]) == dropped
    # real pairs: 28 cross + 12 chain links; the small band's C(3,2)=3
    # pairs duplicate mega-band first-chunk pairs and are deduped away
    real = df[df.channel != channel_code(SKEW_CHANNEL)]
    assert (real.dropped == 0).all()
    assert len(real) == 28 + 12

def test_size_prefilter_clamped_to_jaccard_threshold(ray_session):
    """A config with edit_gate_low ABOVE jaccard_threshold merely
    deadens the edit channel — Jaccard edges must still come through.
    The verify size-ratio prefilter once used edit_gate_low unclamped
    as its bound, silently culling true-Jaccard edges whose size ratio
    sat in [jaccard_threshold, edit_gate_low)."""
    import pyarrow as pa
    import ray.data as rd

    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    # conv b = an 80% prefix of conv a: shingle containment puts true
    # Jaccard ≈ 0.8 and size ratio ≈ 0.8 — above the 0.72 threshold,
    # below the pathological 0.95 edit_gate_low
    # non-repetitive text (repetition would collapse the DISTINCT
    # shingle sets of the full text and its prefix onto each other)
    import random

    rnd = random.Random(7)
    base = " ".join(
        "w%04d%s" % (i, "abcdefgh"[rnd.randrange(8)]) for i in range(220)
    )
    cut = int(len(base) * 0.8)
    rows = []
    for cid, text in (("conv_a", base), ("conv_b", base[:cut]), ("conv_c", "entirely unrelated filler text about spreadsheets")):
        for i, piece in enumerate([text[: len(text) // 2], text[len(text) // 2 :]]):
            rows.append(
                {"conv_id": cid, "turn_idx": i, "role": "user", "text": piece,
                 "tool": "", "ts": 0}
            )
    turns = rd.from_arrow(pa.Table.from_pylist(rows))
    for cfg in (
        PipelineConfig(num_partitions=2, edit_accept_threshold=0.99, edit_gate_low=0.95),
        PipelineConfig(num_partitions=2, edit_accept_threshold=0.0),
    ):
        edges = dedup_transcripts(turns, cfg).edges.to_pandas()
        assert len(edges) >= 1, f"prefix-dup edge lost under {cfg.edit_gate_low=}"
