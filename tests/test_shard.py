"""shard_documents: content-addressed layout must be a pure function
of the ids (identical across partitionings) with dense 0-based ranks;
md5_first_word must stay bit-exact with hashlib."""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.packing import shard_documents
from fuzzy_matching_ray.hashing import md5_first_word, md5_leading_byte


def test_md5_word_bit_exact_including_long_and_unicode():
    vals = [str(i) for i in range(300)] + ["x" * 80, "", "ünïcødé"]
    w = md5_first_word(vals)
    b = md5_leading_byte(vals)
    for v, wi, bi in zip(vals, w, b):
        d = hashlib.md5(str(v).encode()).digest()
        assert wi == int.from_bytes(d[:4], "big")
        assert bi == d[0]


def test_shard_documents_deterministic_and_dense():
    df = pd.DataFrame({"doc_id": range(200)})
    outs = []
    for parts in (1, 7):
        out = (
            shard_documents(
                rd.from_pandas(df).repartition(parts), n_shards=8, num_partitions=4
            )
            .to_pandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert len(out) == 200
    assert set(out["shard"]) <= set(range(8))
    # ranks dense per shard
    for _, g in out.groupby("shard"):
        assert g["pos"].tolist() == list(range(len(g)))
    # shard matches the hex-prefix contract
    row = out.iloc[0]
    w = int.from_bytes(hashlib.md5(str(row["doc_id"]).encode()).digest()[:4], "big")
    assert row["shard"] == w % 8
