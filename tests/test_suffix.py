"""Suffix-array channel: vectorized LCP correctness and the char-budget
drop accounting (VERDICT round-1 item #6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fuzzy_matching_ray.stages.minhash import channel_code
from fuzzy_matching_ray.stages.suffix_array import (
    _substring_pairs_bucket,
    adjacent_lcp_at_least,
    build_suffix_array,
)


def _naive_lcp(s: np.ndarray, i: int, j: int) -> int:
    h = 0
    n = s.size
    while i + h < n and j + h < n and s[i + h] == s[j + h]:
        h += 1
    return h


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adjacent_lcp_matches_naive(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    # small alphabet → long repeats → nontrivial LCPs
    s = rng.integers(97, 100, size=400).astype(np.int64)
    sa = build_suffix_array(s)
    for k in (1, 3, 7, 20):
        got = adjacent_lcp_at_least(s, sa, k)
        want = np.array(
            [_naive_lcp(s, int(sa[i]), int(sa[i + 1])) >= k for i in range(s.size - 1)]
        )
        assert (got == want).all(), k


def test_substring_bucket_finds_shared_fragment():
    shared = "one very specific shared fragment appearing verbatim in both documents x" * 2
    ids = ["a", "b", "c"]
    texts = ["start " + shared, shared + " ending", "completely different content here"]
    df = _substring_pairs_bucket(ids, texts, min_len=64, max_pairs=100)
    real = df[df["channel"] == channel_code("substring")]
    assert len(real) == 1
    assert int(df["dropped"].sum()) == 0


def test_substring_char_budget_emits_skew_sentinel(monkeypatch):
    import fuzzy_matching_ray.stages.suffix_array as sa_mod
    from fuzzy_matching_ray.stages.minhash import channel_code, SKEW_CHANNEL

    # budget admits only the first (sorted) two of four docs
    # (each doc = 144 chars + 1 sentinel)
    monkeypatch.setattr(sa_mod, "_SUFFIX_MAX_CHARS", 300)
    shared = "a long shared fragment that runs for at least sixty four characters!!" * 2
    ids = ["d3", "d4", "d1", "d2"]
    texts = [shared + " tail3", shared + " tail4", shared + " tail1", shared + " tail2"]
    df = _substring_pairs_bucket(ids, texts, min_len=64, max_pairs=100)
    skew = df[df["channel"] == channel_code(SKEW_CHANNEL)]
    # C(4,2) - C(2,2)=1 → 5 cross pairs lost to the char budget
    assert len(skew) == 1 and int(skew["dropped"].iloc[0]) == 5
    real = df[df["channel"] == channel_code("substring")]
    # included docs are the conv_id-sorted prefix {d1, d2}
    assert len(real) == 1 and (real["bucket_size"] == 2).all()
