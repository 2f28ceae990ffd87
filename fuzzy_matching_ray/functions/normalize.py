"""Text canonicalization kernels (vectorized, Arrow-first).

Covers the reference's normalizers — ``normalize_name_ru`` /
``normalize_name_en`` (``transliteration_utils.py:351-386``: lowercase,
collapse whitespace, ``ё``→``е``) and the load-time ``str.strip`` pass
(``core/data_matcher.py:79,104``) — as vectorized ``pyarrow.compute``
batch kernels, plus the document-level canonicalization used before
shingling (NFKC + lowercase + whitespace collapse).
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")


def normalize_name(s: str) -> str:
    """Scalar name normalizer: lowercase, collapse whitespace, ``ё→е``.

    Matches the observed behavior of the reference's ru/en name
    normalizers (``transliteration_utils.py:351-386``) — the en variant
    is the same minus the ``ё`` fold, which is a no-op on Latin text,
    so one function covers both.
    """
    if not s:
        return ""
    s = _WS.sub(" ", s.strip().lower())
    return s.replace("ё", "е")


def canonicalize_text(
    s: str,
    *,
    lowercase: bool = True,
    nfkc: bool = True,
    collapse_whitespace: bool = True,
    fold_yo: bool = True,
) -> str:
    """Scalar document canonicalizer applied once per document before
    shingling (the reference instead re-normalized per *pair* inside
    ``_process_transliteration`` — ``data_matcher.py:331-410`` — which
    is its dominant per-pair cost; we hoist it here)."""
    if not s:
        return ""
    if nfkc:
        s = unicodedata.normalize("NFKC", s)
    if lowercase:
        s = s.lower()
    if fold_yo:
        s = s.replace("ё", "е")
    if collapse_whitespace:
        s = _WS.sub(" ", s).strip()
    return s


def canonicalize_column(
    col: pa.ChunkedArray | pa.Array,
    *,
    lowercase: bool = True,
    nfkc: bool = True,
    collapse_whitespace: bool = True,
    fold_yo: bool = True,
) -> pa.Array | pa.ChunkedArray:
    """Canonicalize a string column, byte-identical to
    ``canonicalize_text`` per value.

    ASCII values (the bulk of real corpora) take the fully vectorized
    ``pyarrow.compute`` path — exact by construction for ASCII (NFKC is
    the identity, ``utf8_lower`` matches ``str.lower``, and the
    collapse class below includes Python's ASCII ``\\s`` extras
    ``\\x1c-\\x1f``).  Non-ASCII values route through the scalar kernel
    itself: Arrow's unicode kernels diverge from Python in several
    corners (``utf8_normalize('NFKC')`` emits decomposed sequences,
    ``utf8_lower`` drops İ's combining dot and ignores final-sigma
    context, RE2's ``\\s`` is ASCII-only), and a near-dup engine cannot
    afford two canonical forms of the same text."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return col

    out = col
    if lowercase:
        out = pc.utf8_lower(out)
    if fold_yo:
        out = pc.replace_substring(out, pattern="ё", replacement="е")
    if collapse_whitespace:
        out = pc.replace_substring_regex(
            out,
            pattern=(
                r"[\t\n\x0b\x0c\r\x1c-\x1f "
                r"\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}"
                r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+"
            ),
            replacement=" ",
        )
        out = pc.utf8_trim_whitespace(out)

    is_ascii = pc.match_substring_regex(col, r"^[\x00-\x7F]*$")
    if pc.min(is_ascii).as_py():
        return out
    vals = col.to_pylist()
    fast = out.to_pylist()
    mask = is_ascii.to_numpy(zero_copy_only=False)
    flags = dict(
        lowercase=lowercase,
        nfkc=nfkc,
        collapse_whitespace=collapse_whitespace,
        fold_yo=fold_yo,
    )
    return pa.array(
        [
            fast[i] if (s is None or mask[i]) else canonicalize_text(s, **flags)
            for i, s in enumerate(vals)
        ],
        type=pa.string(),
    )


def strip_column(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """The reference's load-time value strip (``data_matcher.py:79``),
    vectorized."""
    return pc.utf8_trim_whitespace(col)
