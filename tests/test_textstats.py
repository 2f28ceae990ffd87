"""Text-analysis extras: the vectorized language-ID must keep the
per-row heuristic's exact semantics on edge cases (ties, Cyrillic
dominance, CJK, empties) that the documents-table oracle never hits."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.textstats import _STOPWORDS, language_id


def _reference_lang(s: str) -> str:
    """The original per-row formulation (kept as the semantic spec)."""
    s = s or ""
    if any("一" <= c <= "鿿" for c in s[:400]):
        return "zh"
    letters = [c for c in s[:2000] if c.isalpha()]
    if letters and sum("а" <= c.lower() <= "я" for c in letters) / len(letters) > 0.5:
        return "ru"
    toks = set(s.lower().split())
    best, best_hits = "und", 0
    for lang in ("en", "fr", "es", "de"):
        hits = len(toks & _STOPWORDS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


CASES = [
    "",
    "   ",
    "the of and a to",
    "le la de est pour",
    "el la de y una",
    "der die und das ein",
    "привет как дела это тест на русском",
    "你好 world the of",
    "la de",            # en/fr/es tie on 'la'/'de' → first-wins
    "und",              # German stopword, also the fallback label
    "the le el der",    # four-way single-hit tie → en
    "ё ё ё",            # ё excluded from the Cyrillic range → not ru
    "mixed привет the of and a to in is it that",
    "xyz qwerty asdf",  # no stopwords → und
    "der la the es que",
]


def test_langid_vectorized_matches_reference(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(CASES)), "text": CASES}))
    got = language_id(ds).to_pandas().sort_values("doc_id")
    want = [_reference_lang(s) for s in CASES]
    assert got["lang_pred"].tolist() == want
