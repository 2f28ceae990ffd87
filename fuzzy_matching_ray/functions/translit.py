"""Russian ↔ English transliteration.

Same three public standards the reference supports
(``transliteration_utils.py:64-200``): GOST 7.79-2000 System A (ISO 9,
diacritics, reversible), Scientific (ISO/R 9), and Passport (Russian
MFA Order No. 2113 of 2020 — ASCII-only, lossy).  Implementation is our
own: each direction is a single compiled regex alternation (longest
sequence first) with a case-preserving replacement function — one regex
pass per string instead of the reference's per-character scan with a
sorted-keys inner loop (``transliteration_utils.py:203-279``), which
matters when this runs inside ``map_batches`` over millions of rows.

Also provides ``detect_language`` with the reference's exact decision
rule (``transliteration_utils.py:282-310``): >0.7 Cyrillic → ``ru``,
>0.7 Latin → ``en``, else ``mixed``; no letters → ``None``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

# --- public standard tables (lowercase canonical forms) --------------------

_GOST_RU_EN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "ë",
    "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "ш": "š", "щ": "ŝ", "ъ": "ʺ",
    "ы": "y", "ь": "ʹ", "э": "è", "ю": "û", "я": "â",
}

_SCIENTIFIC_RU_EN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "ë",
    "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "x", "ц": "c", "ч": "č", "ш": "š", "щ": "ŝ", "ъ": "″",
    "ы": "y", "ь": "′", "э": "è", "ю": "ju", "я": "ja",
}

_PASSPORT_RU_EN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "ie", "ы": "y", "ь": "", "э": "e", "ю": "iu", "я": "ia",
}

# Reverse maps.  For Passport the reverse is explicitly curated (the
# standard is lossy): multi-letter sequences first, plus the common
# ``yu``/``ya`` spellings; ``y`` alone reads back as ``й``.
_PASSPORT_EN_RU = {
    "shch": "щ", "zh": "ж", "kh": "х", "ts": "ц", "ch": "ч", "sh": "ш",
    "yu": "ю", "ya": "я", "iu": "ю", "ia": "я",
    "a": "а", "b": "б", "v": "в", "g": "г", "d": "д", "e": "е", "z": "з",
    "i": "и", "k": "к", "l": "л", "m": "м", "n": "н", "o": "о", "p": "п",
    "r": "р", "s": "с", "t": "т", "u": "у", "f": "ф", "y": "й",
}


def _invert(ru_en: dict[str, str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for ru, en in ru_en.items():
        if en and en not in out:
            out[en] = ru
    return out


@dataclass(frozen=True)
class Standard:
    """A transliteration standard: name + the two direction maps with
    their precompiled longest-first regex alternations."""

    name: str
    ru_en: dict[str, str]
    en_ru: dict[str, str]
    _ru_pattern: re.Pattern = field(init=False, repr=False)
    _en_pattern: re.Pattern = field(init=False, repr=False)

    def __post_init__(self) -> None:
        object.__setattr__(self, "_ru_pattern", _compile(self.ru_en))
        object.__setattr__(self, "_en_pattern", _compile(self.en_ru))


def _compile(mapping: dict[str, str]) -> re.Pattern:
    keys = sorted(mapping, key=len, reverse=True)
    return re.compile("|".join(re.escape(k) for k in keys), re.IGNORECASE)


GOST = Standard("GOST", _GOST_RU_EN, _invert(_GOST_RU_EN))
SCIENTIFIC = Standard("Scientific", _SCIENTIFIC_RU_EN, _invert(_SCIENTIFIC_RU_EN))
PASSPORT = Standard("Passport", _PASSPORT_RU_EN, _PASSPORT_EN_RU)

STANDARDS: tuple[Standard, ...] = (GOST, SCIENTIFIC, PASSPORT)


def get_standard(name: str | None) -> Standard:
    """Standard lookup by case-insensitive name; unknown names fall back
    to Passport, matching the reference's observed fallback
    (``tests/test_error_handling.py:55-67``)."""
    if name:
        for std in STANDARDS:
            if std.name.lower() == str(name).lower():
                return std
    return PASSPORT


def _case_like(template: str, repl: str) -> str:
    """Propagate the case of the matched sequence's first letter onto
    the replacement (``Щука → Shchuka``, ``ЩУКА → SHCHUKA``-ish: only
    the first letter is uppercased, per the reference's behavior at
    ``transliteration_utils.py:256-263``)."""
    if not repl:
        return repl
    if template[:1].isupper():
        return repl[0].upper() + repl[1:]
    return repl


def transliterate_ru_to_en(text: str, standard: Standard | str = PASSPORT) -> str:
    """Russian → Latin per the given standard.  Unknown characters pass
    through unchanged.  Note: the reference lowercases the entire input
    first (``transliteration_utils.py:212``) — we preserve case instead
    (strictly more information); the match pipeline canonicalizes to
    lowercase anyway."""
    if not text:
        return ""
    std = standard if isinstance(standard, Standard) else get_standard(standard)

    def repl(m: re.Match) -> str:
        seq = m.group(0)
        return _case_like(seq, std.ru_en.get(seq.lower(), seq))

    return std._ru_pattern.sub(repl, text)


def transliterate_en_to_ru(text: str, standard: Standard | str = PASSPORT) -> str:
    """Latin → Russian per the given standard, longest sequence first
    (so ``shch`` wins over ``sh``), case of the first letter preserved."""
    if not text:
        return ""
    std = standard if isinstance(standard, Standard) else get_standard(standard)

    def repl(m: re.Match) -> str:
        seq = m.group(0)
        return _case_like(seq, std.en_ru.get(seq.lower(), seq))

    return std._en_pattern.sub(repl, text)


_RU_CHARS = re.compile(r"[а-яёА-ЯЁ]")
_EN_CHARS = re.compile(r"[a-zA-Z]")


def detect_language(text: str | None) -> str | None:
    """The reference's decision rule (``transliteration_utils.py:282-310``)."""
    if not text:
        return None
    ru = len(_RU_CHARS.findall(text))
    en = len(_EN_CHARS.findall(text))
    total = ru + en
    if total == 0:
        return None
    if ru / total > 0.7:
        return "ru"
    if en / total > 0.7:
        return "en"
    return "mixed"


@lru_cache(maxsize=1 << 16)
def _cached_ru_en(text: str, std_name: str) -> str:
    return transliterate_ru_to_en(text, get_standard(std_name))


def to_target_language(text: str, target: str, standard: Standard | str = PASSPORT) -> str:
    """Transliterate ``text`` into the target script iff it is not
    already there (the reference's per-field skip logic,
    ``core/data_matcher.py:516-543``)."""
    lang = detect_language(text)
    if lang is None or lang == target:
        return text
    if target == "en":
        return transliterate_ru_to_en(text, standard)
    if target == "ru":
        return transliterate_en_to_ru(text, standard)
    return text


def positional_match_ratio(a: str, b: str) -> float:
    """Share of positions with equal characters (case-insensitive),
    normalized by the longer length — the reference's transliteration
    validity metric (``transliteration_utils.py:313-348``)."""
    if not a or not b:
        return 0.0
    al, bl = a.lower(), b.lower()
    n = min(len(al), len(bl))
    matches = sum(1 for i in range(n) if al[i] == bl[i])
    return matches / max(len(al), len(bl))


def all_transliterations(text: str) -> dict[str, str]:
    """``{standard name: ru→en transliteration}`` across all standards
    (reference: ``transliteration_utils.py:389-405``)."""
    return {std.name: transliterate_ru_to_en(text, std) for std in STANDARDS}


def best_transliteration_match(
    source: str, candidates: list[str]
) -> tuple[str | None, str | None, float]:
    """Argmax of positional-match score over standards × candidates
    (reference: ``transliteration_utils.py:408-454``).  Returns
    (best candidate, standard name, score)."""
    best: tuple[str | None, str | None, float] = (None, None, 0.0)
    for std in STANDARDS:
        t = transliterate_ru_to_en(source, std)
        for cand in candidates:
            score = positional_match_ratio(t, cand)
            if score > best[2]:
                best = (cand, std.name, score)
    return best
