"""Channel C — partitioned suffix-array pass for exact long-substring
contamination (no reference equivalent; north_rule addition).

Per hash-bucket of documents, a bucketed task concatenates the
bucket's canonical texts (with per-doc sentinels), builds a suffix
array by rank doubling (Manber–Myers, O(n log n) with numpy
``lexsort``), and emits a candidate pair for every pair of *distinct*
documents whose suffixes are adjacent in suffix order and agree on
their first ``min_substring_len`` characters — i.e. the two documents
share a verbatim substring at least that long.  The LCP≥k test is a
vectorized staged comparison (``adjacent_lcp_at_least``): the first
character kills ~all adjacencies, survivors are compared in growing
chunks — no per-character Python loop (the Kasai formulation computed
full LCPs one character at a time in Python and dominated the stage).

**Partitioning assumption** (documented per the build brief): pairs are
only found *within* a bucket.  Cross-bucket contamination is
approximated by the MinHash channel; to co-locate likely offenders,
bucket by content anchor instead of conv_id hash if needed.  Memory per
actor is O(bucket chars × ~16 bytes); size ``num_partitions`` so a
bucket fits (``suffix_max_chars`` guards the concatenation).

**Drop accounting** (north_rule): docs beyond the per-bucket char
budget are excluded deterministically (conv_id order) and every cross
pair lost that way — plus any found pairs beyond the pair budget — is
counted EXACTLY on a ``__skew`` sentinel row, summed into the
flagship's ``dropped_pairs_hot_buckets`` metric alongside the MinHash
channel's sentinels.
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


def adjacent_lcp_at_least(s: np.ndarray, sa: np.ndarray, k: int) -> np.ndarray:
    """Boolean per adjacency i: lcp(suffix sa[i], suffix sa[i+1]) ≥ k.

    Position-at-a-time vectorized filtering: each round compares ONE
    more character for every still-alive adjacency with two 1-D
    gathers and shrinks the survivor set (adjacent suffixes in suffix
    order share prefixes by construction, but random-text LCPs die
    within ~log_σ(n) positions, so the alive set collapses fast); once
    it is small, the remaining positions are checked in one 2-D
    gather.  The array is padded with globally-unique negative values
    so out-of-range gathers can never spuriously match."""
    n = s.size
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=bool)
    pad = -(np.arange(1, k + 2, dtype=np.int64) + (np.int64(1) << np.int64(40)))
    sp = np.concatenate([s, pad])
    la = sa[:-1]
    ra = sa[1:]
    idx = np.arange(n - 1)
    off = 0
    while off < k and idx.size:
        if idx.size > 4096:
            eq = sp[la + off] == sp[ra + off]
            la, ra, idx = la[eq], ra[eq], idx[eq]
            off += 1
        else:
            cols = np.arange(off, k)
            eq = (sp[la[:, None] + cols] == sp[ra[:, None] + cols]).all(axis=1)
            la, ra, idx = la[eq], ra[eq], idx[eq]
            off = k
    out = np.zeros(n - 1, dtype=bool)
    out[idx] = True
    return out


def _substring_pairs_bucket(
    ids: list[str], texts: list[str], min_len: int, max_pairs: int
) -> pd.DataFrame:
    """All distinct-doc pairs sharing a ≥min_len verbatim substring,
    plus one ``__skew`` sentinel when the char/pair budgets dropped
    anything."""
    from fuzzy_matching_ray.hashing import hash64_str, nid_of
    from fuzzy_matching_ray.stages.minhash import CHANNEL_CODES, SKEW_CHANNEL

    # deterministic inclusion order (bucket arrival order depends on
    # shuffle scheduling): sort docs by conv_id before applying the
    # char budget
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    ids = [ids[i] for i in order]
    texts = [texts[i] for i in order]

    parts = []
    owners = []
    total = 0
    n_docs = len(ids)
    included = 0
    for di, t in enumerate(texts):
        cps = (
            np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            if t
            else np.empty(0, dtype=np.int64)
        )
        if total + cps.size > _SUFFIX_MAX_CHARS:
            break
        parts.append(cps)
        parts.append(np.array([-(di + 1)], dtype=np.int64))  # unique sentinel
        owners.append(np.full(cps.size + 1, di, dtype=np.int64))
        total += cps.size + 1
        included += 1

    # cross pairs lost to the char budget: every pair touching an
    # excluded doc
    dropped = n_docs * (n_docs - 1) // 2 - included * (included - 1) // 2

    def _with_sentinel(frame: pd.DataFrame) -> pd.DataFrame:
        if not dropped:
            return frame
        sentinel = pd.DataFrame(
            {
                "src": np.zeros(1, dtype=np.uint64),
                # unique per bucket, disjoint from band-key sentinel space
                "dst": np.asarray(
                    [hash64_str("substr:" + (ids[0] if ids else ""))], dtype=np.uint64
                ),
                "channel": np.int8(CHANNEL_CODES[SKEW_CHANNEL]),
                "bucket_size": np.int32(0),
                "dropped": np.int64(dropped),
            }
        )
        return pd.concat([frame, sentinel], ignore_index=True)

    empty = pd.DataFrame(
        {
            "src": pd.Series(dtype="uint64"),
            "dst": pd.Series(dtype="uint64"),
            "channel": pd.Series(dtype="int8"),
            "bucket_size": pd.Series(dtype="int32"),
            "dropped": pd.Series(dtype="int64"),
        }
    )
    if not parts:
        return _with_sentinel(empty)
    s = np.concatenate(parts)
    owner = np.concatenate(owners)
    sa = build_suffix_array(s)
    long_adj = adjacent_lcp_at_least(s, sa, min_len)

    a_own = owner[sa[:-1]][long_adj]
    b_own = owner[sa[1:]][long_adj]
    diff = a_own != b_own
    if not diff.any():
        return _with_sentinel(empty)
    nids = nid_of(list(ids))
    pa_ = nids[a_own[diff]]
    pb = nids[b_own[diff]]
    lo = np.minimum(pa_, pb)
    hi = np.maximum(pa_, pb)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    if pairs.shape[0] > max_pairs:
        dropped += pairs.shape[0] - max_pairs
        pairs = pairs[:max_pairs]
    return _with_sentinel(
        pd.DataFrame(
            {
                "src": pairs[:, 0].astype(np.uint64),
                "dst": pairs[:, 1].astype(np.uint64),
                "channel": np.int8(CHANNEL_CODES["substring"]),
                "bucket_size": np.int32(included),
                "dropped": np.int64(0),
            }
        )
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
