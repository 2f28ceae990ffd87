"""Property tests for the pure hot-path kernels: the verify stage's
sorted-set intersect against numpy's reference, and the md5 contracts
every hash_sample / weighted_mix SQL oracle depends on."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(0, 2**32 - 1), max_size=200),
    st.lists(st.integers(0, 2**32 - 1), max_size=200),
)
@settings(max_examples=200, deadline=None)
def test_sorted_intersect_size_matches_numpy(xs, ys):
    """The verify kernel's binary-search intersect must equal
    np.intersect1d on sorted-unique inputs of any size/skew — including
    empty sides and fully-disjoint/fully-equal sets."""
    from fuzzy_matching_ray.stages.verify import _sorted_intersect_size

    a = np.unique(np.asarray(xs, dtype=np.uint64))
    b = np.unique(np.asarray(ys, dtype=np.uint64))
    want = np.intersect1d(a, b).size
    assert _sorted_intersect_size(a, b) == want
    assert _sorted_intersect_size(b, a) == want  # symmetric


@given(st.lists(st.one_of(st.integers(-(10**9), 10**9), st.text(max_size=30)), max_size=60))
@settings(max_examples=100, deadline=None)
def test_md5_contracts_match_hashlib(values):
    """md5_leading_byte / md5_first_word are the bit-exact duals of the
    DuckDB-side md5(str(v)) prefix compares (the determinism contract
    behind hash_sample, weighted_mix and stratified_sample oracles)."""
    from fuzzy_matching_ray.hashing import md5_first_word, md5_leading_byte

    lead = md5_leading_byte(values)
    word = md5_first_word(values)
    assert lead.dtype == np.uint8 and word.dtype == np.uint32
    for i, v in enumerate(values):
        dig = hashlib.md5(str(v).encode()).digest()
        assert lead[i] == dig[0]
        assert word[i] == int.from_bytes(dig[:4], "big")


@given(st.text(max_size=120), st.integers(1, 8))
@settings(max_examples=150, deadline=None)
def test_char_shingle_hashes_shape_contract(text, k):
    """Shingle hashes are sorted-unique 32-bit values; count is bounded
    by the number of windows; short texts hash as one whole-text
    shingle; and the function is deterministic."""
    from fuzzy_matching_ray.hashing import char_shingle_hashes

    h = char_shingle_hashes(text, k)
    assert h.dtype == np.uint64
    assert (h < 2**32).all()
    assert (np.diff(h.astype(np.int64)) > 0).all()  # sorted strictly unique
    n = len(text)
    if n == 0:
        assert h.size == 0
    elif n < k:
        assert h.size == 1
    else:
        assert 1 <= h.size <= n - k + 1
    assert np.array_equal(h, char_shingle_hashes(text, k))
