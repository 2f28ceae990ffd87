"""Composed curation pipeline: each stage's effect must be visible in
the end-to-end output — a doc dropped by ANY stage (too short, too
punctuated, wrong language, duplicate, out of sample) never surfaces."""

from __future__ import annotations

import hashlib

import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.curate import curate_documents

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs on with it "
    "for a while in the sun"
)


def _in_sample(doc_id: int, hex_threshold: str = "aa") -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[:2] < hex_threshold


@pytest.mark.usefixtures("ray_session")
def test_curate_stage_composition():
    rows = [
        {"doc_id": 1, "text": GOOD},  # survives (md5('1')=c4ca.. >= aa? check below)
        {"doc_id": 2, "text": "short text"},  # < 10 tokens
        {"doc_id": 3, "text": "!!! ??? " * 20},  # punct-heavy, no stopwords
        {"doc_id": 4, "text": "le chat est dans la maison avec un chien et une souris"},  # fr
        {"doc_id": 5, "text": GOOD},  # dup of 1 -> min id (1) survives
        {"doc_id": 6, "text": GOOD + " extra tail words to make it distinct"},
    ]
    out = curate_documents(
        rd.from_items(rows), num_partitions=4
    ).to_pandas()

    expect_ids = sorted(i for i in (1, 6) if _in_sample(i))
    assert sorted(out["doc_id"].tolist()) == expect_ids
    # n_tokens carried through dedup+sample unchanged
    for _, r in out.iterrows():
        src = next(x for x in rows if x["doc_id"] == r["doc_id"])
        assert r["n_tokens"] == len(src["text"].split())


@pytest.mark.usefixtures("ray_session")
def test_curate_dedup_keeps_min_id_in_sample():
    # both dup ids are in-sample candidates; min must win regardless
    # of which would pass the sample filter
    ids = [7, 9]  # md5('7')=8f14.. < aa (in), md5('9')=45c4.. < aa (in)
    rows = [{"doc_id": i, "text": GOOD} for i in ids]
    out = curate_documents(rd.from_items(rows), num_partitions=2).to_pandas()
    expect = [min(ids)] if _in_sample(min(ids)) else []
    assert out["doc_id"].tolist() == expect
