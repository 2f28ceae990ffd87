"""Declarative pipeline composer: spec validation fails at build time,
and a filter→dedup→sample→shard chain matches the operators applied
by hand."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
import ray.data as rd

from fuzzy_matching_ray.pipelines.compose import build_pipeline


def _docs():
    dup = "an identical long document body repeated across ids " * 4
    return pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                dup,
                dup,  # exact dup of 0 → dropped
                "short",  # < 4 words → quality-filtered
                "a perfectly fine unique document with enough words here",
                dup + " tail",  # near-dup of 0 (Jaccard ≈ 0.85)
                "another unique document that easily passes the word bar",
                "yet another clean unique document with many distinct words",
                "final unique document also passing the quality filter",
            ],
        }
    )


def test_build_validates_eagerly():
    with pytest.raises(ValueError, match="unknown op"):
        build_pipeline({"steps": [{"op": "nope"}]})
    with pytest.raises(ValueError, match="unknown params"):
        build_pipeline({"steps": [{"op": "quality_filter", "min_wordz": 3}]})
    with pytest.raises(ValueError, match="non-empty"):
        build_pipeline({"steps": []})


def test_composed_chain(ray_session):
    spec = {
        "steps": [
            {"op": "quality_filter", "min_words": 4},
            {"op": "exact_dedup"},
            {"op": "redact_pii"},
            {"op": "minhash_dedup"},
            {"op": "shard", "n_shards": 4},
        ]
    }
    src = _docs()
    src["source"] = "web"  # payload column that must ride through
    out = build_pipeline(spec)(rd.from_pandas(src)).to_pandas()
    # every step preserves full rows: payload columns survive the chain
    assert {"doc_id", "text", "source", "shard", "n_email"} <= set(out.columns)
    assert (out["source"] == "web").all()
    kept = sorted(out["doc_id"].tolist())
    # 2 fails quality; 1 exact-dups 0; 4 near-dups 0 (rep = min id 0)
    assert kept == [0, 3, 5, 6, 7]
    # shard step output shape with content-addressed shards
    for _, row in out.iterrows():
        w = int.from_bytes(hashlib.md5(str(row["doc_id"]).encode()).digest()[:4], "big")
        assert row["shard"] == w % 4


def test_lang_filter_step(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the cat is on the mat with a hat for it",
                "el gato es una manta que para los del",
            ],
        }
    )
    out = build_pipeline({"steps": [{"op": "lang_filter", "keep": ["en"]}]})(
        rd.from_pandas(df)
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]


def test_composed_chain_empty_input(ray_session):
    """The full composed chain must stream a 0-row dataset through
    (broadcast membership sets come back empty, not crashed)."""
    import pyarrow as pa

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("source", pa.string())]
    )
    spec = {
        "steps": [
            {"op": "quality_filter", "min_words": 4},
            {"op": "exact_dedup"},
            {"op": "minhash_dedup"},
            {"op": "redact_pii"},
            {"op": "hash_sample", "hex_threshold": "80"},
            {"op": "shard", "n_shards": 4},
        ]
    }
    out = build_pipeline(spec)(rd.from_arrow(schema.empty_table()))
    assert out.count() == 0
