"""gram_novelty: earlier-doc attribution must be exact across batch
and bucket boundaries, count DISTINCT grams only, and skip short docs."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.filtering import gram_novelty


def test_gram_novelty_attribution():
    base = "alpha beta gamma delta epsilon"  # 2 distinct 4-grams
    df = pd.DataFrame(
        {
            "doc_id": [10, 20, 30, 40],
            "text": [
                base,  # first occurrence: 0 dup
                base + " zeta",  # repeats both base grams + 2 new
                "totally different words entirely here",  # novel
                "too short",  # < 4 words: no row
            ],
        }
    )
    out = (
        gram_novelty(rd.from_pandas(df).repartition(3), num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [10, 20, 30]
    assert out.loc[10].tolist() == [2, 0]  # n_grams, n_dup_grams
    assert out.loc[20].tolist() == [3, 2]
    assert out.loc[30].tolist() == [2, 0]


def test_gram_novelty_string_ids():
    """String doc ids (the CLI report path): lexicographic min-id
    semantics, no int cast."""
    df = pd.DataFrame(
        {
            "doc_id": ["doc-b", "doc-a", "doc-c"],
            "text": ["one two three four", "one two three four", "five six seven eight"],
        }
    )
    out = gram_novelty(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc["doc-a", "n_dup_grams"] == 0  # lexicographic first
    assert out.loc["doc-b", "n_dup_grams"] == 1
    assert out.loc["doc-c", "n_dup_grams"] == 0


def test_gram_novelty_duplicate_grams_within_doc_counted_once():
    rep = "a b c d a b c d"  # gram 'a b c d' occurs twice in-doc
    df = pd.DataFrame({"doc_id": [1, 2], "text": [rep, "a b c d x"]})
    out = gram_novelty(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    # doc 1: distinct grams of 8 tokens = 5 windows, distinct = 5? no:
    # windows: abcd bcda cdab dabc abcd -> distinct 4
    assert out.loc[1, "n_grams"] == 4
    assert out.loc[1, "n_dup_grams"] == 0
    # doc 2: grams abcd, bcdx -> abcd seen in doc 1
    assert out.loc[2].tolist() == [2, 1]
