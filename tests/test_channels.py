"""Channel registry: the user-extension surface (SURVEY.md §2.11)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.stages.minhash import channel_code
from fuzzy_matching_ray.stages.channels import (
    get_channel,
    register_channel,
    registered_channels,
)


def test_builtin_channels_registered():
    assert {"minhash", "simhash", "substring"} <= set(registered_channels())
    with pytest.raises(ValueError, match="unknown channel"):
        get_channel("nope")


def test_custom_channel_plugs_into_pipeline(ray_session, tiny_transcripts):
    """A registered custom channel feeds candidate pairs straight into
    pair-dedup → verify → clustering."""
    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    @register_channel("_test_first_last")
    def _pair_first_last(uniq_docs, sigs, cfg):
        def _emit(b: pa.Table) -> pa.Table:
            nids = nid_of(b["conv_id"].to_pylist())
            if nids.size < 2:
                nids = np.concatenate([nids, nids])
            return pa.table(
                {
                    "src": pa.array(nids[:1], pa.uint64()),
                    "dst": pa.array(nids[-1:], pa.uint64()),
                    "channel": pa.array([channel_code("_test_first_last")], pa.int8()),
                    "bucket_size": pa.array([2], pa.int32()),
                    "dropped": pa.array([0], pa.int64()),
                }
            )

        return uniq_docs.select_columns(["conv_id"]).map_batches(
            _emit, batch_format="pyarrow"
        )

    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    res = dedup_transcripts(
        turns,
        PipelineConfig(num_partitions=4),
        channels=("minhash", "_test_first_last"),
    )
    # the custom channel only adds CANDIDATES; verification still gates
    # edges, so the cluster structure must match the minhash-only run
    base = dedup_transcripts(turns, PipelineConfig(num_partitions=4))
    a = res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = base.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_custom_channel_edge_survives_to_decode(ray_session):
    """A custom-channel candidate that PASSES verification must decode
    its channel name on the worker (the driver-side registry isn't
    visible in worker processes — regression for the captured-mapping
    decode)."""
    from fuzzy_matching_ray.hashing import nid_of
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    @register_channel("_test_dup_pair")
    def _pair_dups(uniq_docs, sigs, cfg):
        # per the channel contract, the code is assigned ON THE DRIVER
        # at stage-build time (worker registries are fresh copies)
        code = channel_code("_test_dup_pair")

        def _emit(b: pa.Table) -> pa.Table:
            # pair every doc with every other IN THIS BATCH — tiny
            # corpus, so the near-identical pair is guaranteed emitted
            nids = nid_of(b["conv_id"].to_pylist())
            n = nids.size
            iu, ju = np.triu_indices(n, k=1)
            return pa.table(
                {
                    "src": pa.array(nids[iu], pa.uint64()),
                    "dst": pa.array(nids[ju], pa.uint64()),
                    "channel": pa.array(np.full(iu.size, code, np.int8), pa.int8()),
                    "bucket_size": pa.array(np.full(iu.size, n, np.int32), pa.int32()),
                    "dropped": pa.array(np.zeros(iu.size, np.int64), pa.int64()),
                }
            )

        return uniq_docs.select_columns(["conv_id"]).map_batches(
            _emit, batch_format="pyarrow", batch_size=None
        )

    import ray.data as rd2

    body = "a genuinely long shared conversation body repeated verbatim " * 5
    turns = rd2.from_pandas(
        pd.DataFrame(
            {
                "conv_id": ["cA", "cB", "cC"],
                "turn_idx": [0, 0, 0],
                "role": ["user"] * 3,
                "text": [body, body + " tail", "completely different short text"],
                "tool": [""] * 3,
                "ts": pd.to_datetime(["2026-01-01"] * 3),
            }
        )
    ).repartition(1)
    res = dedup_transcripts(
        turns, PipelineConfig(num_partitions=2), channels=("_test_dup_pair",)
    )
    edges = res.edges.to_pandas()
    assert len(edges) == 1  # cA–cB accepted, decode didn't crash
    assert edges["channel"].iloc[0] == "_test_dup_pair"


def test_simhash_batch_kernel_bit_identical():
    """The batched SimHash kernel must reproduce the scalar per-doc
    formulation bit-for-bit (the serial golden oracle depends on it)."""
    import hashlib
    import random

    import numpy as np

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.stages.simhash import SimHashSignatures

    def scalar(text):
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
                )
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = np.unpackbits(hs.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
        acc = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
        return int.from_bytes(np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big")

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(300)] + ["приве́т", "мир"]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(0, 60))) for _ in range(500)
    ] + ["", "  \t\n ", "one", "a b a b a", " ".join(["x"] * (1 << 15))]
    got = SimHashSignatures(PipelineConfig())._simhash_batch(texts)
    exp = np.array([scalar(t) for t in texts], dtype=np.uint64)
    assert (got == exp).all()

    # empty docs at segment ENDS (batch tail and the 256-doc chunk
    # boundary): the old clamp-based reduceat stole the preceding
    # doc's last token here
    edge_cases = [
        ["hello world foo", ""],
        ["", "a b c", "", ""],
        ["one two", "", "three four five", ""],
        [""] * 4,
        ["alpha beta gamma"] * 255 + [""] + ["delta epsilon"] * 10 + [""],
    ]
    kern = SimHashSignatures(PipelineConfig())
    for case in edge_cases:
        got = kern._simhash_batch(list(case))
        exp = np.array([scalar(t) for t in case], dtype=np.uint64)
        assert (got == exp).all(), case[:3]
