"""Fuzzy string-similarity kernels.

Two families:

1. **Reference-surface scorers** (``ratio``/``partial_ratio``/
   ``token_sort_ratio``/``token_set_ratio``/``wratio``): the five
   algorithms the reference dispatches to
   (``core/data_matcher.py:601-638`` → ``thefuzz.fuzz``).  We implement
   the *published* normalized-Indel definitions (the semantics rapidfuzz
   documents) with fuzzywuzzy's token-processing structure.  Note: the
   reference's committed conformance table
   (``tests/results/algorithm_comp_res.md:5-19``) was produced by a
   historical thefuzz build and is not exactly reproducible by any
   current public implementation (e.g. its ratio("Ivan Petrov",
   "Petrov Ivan")=71 vs 55 for both difflib and Indel semantics); our
   conformance tests pin the rows that agree and band the rest.

2. **Scale kernels** (``lcs_length``/``indel_distance``/
   ``levenshtein_distance``): bit-parallel big-int implementations
   (Allison & Dix 1986; Myers 1999; Hyyrö 2004) — O(|b|·|a|/64) — used
   both as the scorer core and by the document verifier where O(n*m)
   DP would be too slow.
"""

from __future__ import annotations

import re
from collections import defaultdict

__all__ = [
    "lcs_length",
    "indel_distance",
    "levenshtein_distance",
    "indel_ratio",
    "ratio",
    "partial_ratio",
    "token_sort_ratio",
    "token_set_ratio",
    "wratio",
    "similarity",
    "full_process",
]

# ---------------------------------------------------------------------------
# bit-parallel scale kernels


def _char_masks(a: str) -> dict[str, int]:
    masks: dict[str, int] = defaultdict(int)
    for i, c in enumerate(a):
        masks[c] |= 1 << i
    return masks


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence (bit-parallel)."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    m = len(a)
    masks = _char_masks(a)
    full = (1 << m) - 1
    v = full
    for c in b:
        p = masks.get(c, 0)
        u = v & p
        if u:
            v = ((v + u) | (v - u)) & full
    # zero bits in v mark LCS cells
    return m - bin(v).count("1")


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance: |a| + |b| - 2*LCS(a, b)."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


def indel_ratio(a: str, b: str) -> float:
    """Normalized Indel similarity in [0, 1] — the verifier's
    edit-similarity kernel for long documents."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0 if a == b else 0.0
    return (2 * lcs_length(a, b)) / total


def levenshtein_distance(a: str, b: str) -> int:
    """Classic Levenshtein (substitutions cost 1), bit-parallel
    (Myers 1999)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    m = len(a)
    masks = _char_masks(a)
    full = (1 << m) - 1
    vp = full
    vn = 0
    dist = m
    high = 1 << (m - 1)
    for c in b:
        pm = masks.get(c, 0)
        d0 = (((pm & vp) + vp) ^ vp) | pm | vn
        hp = vn | ~(d0 | vp)
        hn = d0 & vp
        if hp & high:
            dist += 1
        if hn & high:
            dist -= 1
        hp = ((hp << 1) | 1) & full
        hn = (hn << 1) & full
        vp = (hn | ~(d0 | hp)) & full
        vn = d0 & hp
    return dist


# ---------------------------------------------------------------------------
# reference-parity scorers (thefuzz/difflib observed semantics)

_NON_ALNUM = re.compile(r"(?ui)\W")


def full_process(s: str) -> str:
    """fuzzywuzzy's default processor: non-alphanumeric → space,
    lowercase, trim."""
    return _NON_ALNUM.sub(" ", s).lower().strip()


def ratio(a: str, b: str) -> float:
    """Normalized Indel similarity in [0, 100] (no preprocessing)."""
    total = len(a) + len(b)
    if total == 0:
        return 0.0
    return 100.0 * (2 * lcs_length(a, b)) / total


def partial_ratio(a: str, b: str) -> float:
    """Best ``ratio`` of the shorter string against every same-length
    window of the longer string (exhaustive sliding alignment)."""
    if not a and not b:
        return 0.0
    if len(a) <= len(b):
        shorter, longer = a, b
    else:
        shorter, longer = b, a
    if not shorter:
        return 0.0
    la, lb = len(shorter), len(longer)
    if la == lb:
        return ratio(shorter, longer)
    best = 0.0
    for start in range(lb - la + 1):
        r = ratio(shorter, longer[start : start + la])
        if r >= 100.0:
            return 100.0
        if r > best:
            best = r
    return best


def _token_sort_prep(s: str) -> str:
    return " ".join(sorted(full_process(s).split()))


def token_sort_ratio(a: str, b: str) -> float:
    """Tokens sorted and re-joined after full processing, then ratio."""
    return ratio(_token_sort_prep(a), _token_sort_prep(b))


def _partial_token_sort_ratio(a: str, b: str) -> float:
    return partial_ratio(_token_sort_prep(a), _token_sort_prep(b))


def _token_set(a: str, b: str, partial: bool) -> float:
    ta = set(full_process(a).split())
    tb = set(full_process(b).split())
    if not ta and not tb:
        return 0.0
    inter = " ".join(sorted(ta & tb))
    sect_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sect_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    fn = partial_ratio if partial else ratio
    return max(fn(inter, sect_a), fn(inter, sect_b), fn(sect_a, sect_b))


def token_set_ratio(a: str, b: str) -> float:
    return _token_set(a, b, partial=False)


def wratio(a: str, b: str) -> float:
    """fuzzywuzzy's weighted combination over processed strings."""
    pa, pb = full_process(a), full_process(b)
    if not pa or not pb:
        return 0.0
    base = ratio(pa, pb)
    len_ratio = max(len(pa), len(pb)) / max(1, min(len(pa), len(pb)))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(pa, pb) * unbase_scale,
            token_set_ratio(pa, pb) * unbase_scale,
        )
    partial_scale = 0.90 if len_ratio < 8.0 else 0.60
    return max(
        base,
        partial_ratio(pa, pb) * partial_scale,
        _partial_token_sort_ratio(pa, pb) * unbase_scale * partial_scale,
        _token_set(pa, pb, partial=True) * unbase_scale * partial_scale,
    )


_DISPATCH = {
    "ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort": token_sort_ratio,
    "token_set": token_set_ratio,
    "wratio": wratio,
}


def similarity(a: str | None, b: str | None, algorithm: str = "ratio") -> float:
    """Reference-parity similarity in [0, 1].

    Reproduces ``_get_similarity`` (``core/data_matcher.py:601-638``):
    empty/None on either side → 0; inputs lowercased; unknown algorithm
    falls back to ``ratio``; result divided by 100.
    """
    if not a or not b:
        return 0.0
    fn = _DISPATCH.get(str(algorithm).lower(), ratio)
    return fn(a.lower(), b.lower()) / 100.0
