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
    """Vectorized canonicalization of a string column with
    ``pyarrow.compute`` kernels (no Python loop)."""
    if nfkc:
        # pyarrow's utf8_normalize(form="NFKC") emits DECOMPOSED
        # sequences (e.g. ё → е + U+0308), diverging from Python's
        # unicodedata and silently defeating the ё→е fold below.
        # ASCII-only values are NFKC-invariant and skip the Python
        # pass entirely; only the non-ASCII minority is normalized
        # per-value for exact parity with ``canonicalize_text``.
        is_ascii = pc.match_substring_regex(col, r"^[\x00-\x7F]*$")
        if not pc.min(is_ascii).as_py():
            vals = col.to_pylist()
            mask = (
                is_ascii.combine_chunks()
                if isinstance(is_ascii, pa.ChunkedArray)
                else is_ascii
            ).to_numpy(zero_copy_only=False)
            col = pa.array(
                [
                    s if (s is None or mask[i]) else unicodedata.normalize("NFKC", s)
                    for i, s in enumerate(vals)
                ],
                type=pa.string(),
            )
    if lowercase:
        col = pc.utf8_lower(col)
    if fold_yo:
        col = pc.replace_substring(col, pattern="ё", replacement="е")
    if collapse_whitespace:
        # RE2's \s is ASCII-only; spell out Python's unicode \s class
        # (U+2028/NEL/\x1c-\x1f etc.) so the column path collapses
        # exactly what the scalar path does
        col = pc.replace_substring_regex(
            col,
            pattern=(
                r"[\t\n\x0b\x0c\r\x1c-\x1f "
                r"\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}"
                r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+"
            ),
            replacement=" ",
        )
        col = pc.utf8_trim_whitespace(col)
    return col


def strip_column(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """The reference's load-time value strip (``data_matcher.py:79``),
    vectorized."""
    return pc.utf8_trim_whitespace(col)
