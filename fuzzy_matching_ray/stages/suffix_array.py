"""Channel C — partitioned suffix-array pass for exact long-substring
contamination (no reference equivalent; north_rule addition).

Per hash-bucket of documents, an actor-pool stage concatenates the
bucket's canonical texts (with per-doc sentinels), builds a suffix
array by rank doubling (Manber–Myers, O(n log n) with numpy
``lexsort``), computes LCP by Kasai's algorithm, and emits a candidate
pair for every pair of *distinct* documents whose suffixes are adjacent
in suffix order with LCP ≥ ``min_substring_len`` — i.e. the two
documents share a verbatim substring at least that long.

**Partitioning assumption** (documented per the build brief): pairs are
only found *within* a bucket.  Cross-bucket contamination is
approximated by the MinHash channel; to co-locate likely offenders,
bucket by content anchor instead of conv_id hash if needed.  Memory per
actor is O(bucket chars × ~16 bytes); size ``num_partitions`` so a
bucket fits (``suffix_max_chars`` guards the concatenation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

_SUFFIX_MAX_CHARS = 4_000_000  # per-bucket concatenation guard


def build_suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array by rank doubling (Manber–Myers)."""
    n = s.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        # recompute ranks: same (rank, second) pair → same new rank
        r_sorted = rank[sa]
        s_sorted = second[sa]
        neq = np.empty(n, dtype=bool)
        neq[0] = False
        neq[1:] = (r_sorted[1:] != r_sorted[:-1]) | (s_sorted[1:] != s_sorted[:-1])
        tmp[sa] = np.cumsum(neq)
        rank, tmp = tmp.copy(), rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = lcp(sa[i-1], sa[i])), Kasai's algorithm."""
    n = s.size
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            max_h = n - max(i, j)
            while h < max_h and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def _substring_pairs_bucket(
    ids: list[str], texts: list[str], min_len: int, max_pairs: int
) -> pd.DataFrame:
    """All distinct-doc pairs sharing a ≥min_len verbatim substring."""
    # concatenate with unique sentinels (negative ints) between docs
    parts = []
    owners = []
    total = 0
    for di, t in enumerate(texts):
        if not t:
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        if total + cps.size > _SUFFIX_MAX_CHARS:
            break
        parts.append(cps)
        parts.append(np.array([-(di + 1)], dtype=np.int64))  # unique sentinel
        owners.append(np.full(cps.size + 1, di, dtype=np.int64))
        total += cps.size + 1
    empty = pd.DataFrame(
        {
            "src": pd.Series(dtype="uint64"),
            "dst": pd.Series(dtype="uint64"),
            "channel": pd.Series(dtype=object),
            "bucket_size": pd.Series(dtype="int32"),
            "dropped": pd.Series(dtype="int64"),
        }
    )
    if not parts:
        return empty
    s = np.concatenate(parts)
    owner = np.concatenate(owners)
    sa = build_suffix_array(s)
    lcp = kasai_lcp(s, sa)

    from fuzzy_matching_ray.hashing import nid_of

    nids = nid_of(list(ids))
    # adjacent suffixes with long LCP and different owners → pair
    long_mask = lcp >= min_len
    pairs: set[tuple[int, int]] = set()
    idx = np.nonzero(long_mask)[0]
    for r in idx:
        a = owner[sa[r - 1]]
        b = owner[sa[r]]
        if a != b:
            pa_, pb = int(nids[int(a)]), int(nids[int(b)])
            if pa_ > pb:
                pa_, pb = pb, pa_
            pairs.add((pa_, pb))
            if len(pairs) >= max_pairs:
                break
    if not pairs:
        return empty
    src, dst = zip(*sorted(pairs))
    return pd.DataFrame(
        {
            "src": np.asarray(src, dtype=np.uint64),
            "dst": np.asarray(dst, dtype=np.uint64),
            "channel": "substring",
            "bucket_size": np.int32(len(ids)),
            "dropped": np.int64(0),
        }
    )


def substring_pairs(
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """docs(conv_id, text_canon) → candidate pairs sharing a verbatim
    substring of ≥ ``cfg.min_substring_len`` chars (bucket-local)."""
    P = num_partitions or cfg.num_partitions
    min_len = cfg.min_substring_len
    max_pairs = cfg.max_pairs_per_bucket

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _substring_pairs_bucket(
            list(df["conv_id"]), list(df["text_canon"]), min_len, max_pairs
        )

    slim = docs.select_columns(["conv_id", "text_canon"])
    return bucketed_group_apply(slim, "conv_id", _bucket, P)
