"""Transliteration parity with the reference's observed behavior
(``transliteration_utils.py``; quality pairs from
``tests/test_transliteration.py:39-55``)."""

from __future__ import annotations

from fuzzy_matching_ray.config import MatchConfig, TransliterationConfig
from fuzzy_matching_ray.functions import translit as T
from fuzzy_matching_ray.pipelines.record_match import ReferenceMatcher

QUALITY_PAIRS = [
    ("Иванов", "Ivanov"),
    ("Михаил", "Mikhail"),
    ("Санкт-Петербург", "Sankt-Peterburg"),
]


def test_passport_roundtrip_names():
    assert T.transliterate_ru_to_en("Иванов") == "Ivanov"
    assert T.transliterate_ru_to_en("Михаил") == "Mikhail"
    assert T.transliterate_ru_to_en("Щука") == "Shchuka"
    assert T.transliterate_en_to_ru("Shchuka") == "Щука"


def test_quality_above_reference_threshold():
    # reference asserts quality > 0.7 for these (test_transliteration.py:39-55)
    m = ReferenceMatcher(MatchConfig(transliteration=TransliterationConfig(enabled=True)))
    for ru, en in QUALITY_PAIRS:
        t = T.transliterate_ru_to_en(ru)
        q = m._evaluate_transliteration_quality(ru, t, en)
        assert q > 0.7, (ru, en, t, q)


def test_quality_empty_is_zero():
    m = ReferenceMatcher(MatchConfig())
    assert m._evaluate_transliteration_quality("", "x", "y") == 0.0
    assert m._evaluate_transliteration_quality("x", "", "y") == 0.0
    assert m._evaluate_transliteration_quality("x", "y", "") == 0.0


def test_detect_language_classes():
    # reference decision rule (transliteration_utils.py:282-310)
    assert T.detect_language("привет мир") == "ru"
    assert T.detect_language("hello world") == "en"
    assert T.detect_language("привет hello мир world ok da") == "mixed"
    assert T.detect_language("12345 !!!") is None
    assert T.detect_language("") is None
    assert T.detect_language(None) is None


def test_unknown_standard_falls_back_to_passport():
    # reference behavior (tests/test_error_handling.py:55-67)
    std = T.get_standard("NoSuchStandard")
    assert std.name == "Passport"
    assert T.transliterate_ru_to_en("Иванов", "NoSuchStandard") == "Ivanov"


def test_gost_reversibility():
    for word in ["Привет", "Жёлтый", "Чаща"]:
        en = T.transliterate_ru_to_en(word, T.GOST)
        back = T.transliterate_en_to_ru(en, T.GOST)
        assert back.lower() == word.lower().replace("ё", "ё"), (word, en, back)


def test_case_preservation():
    assert T.transliterate_ru_to_en("Жуков")[0] == "Z"
    assert T.transliterate_en_to_ru("Zhukov")[0] == "Ж"


def test_positional_match_ratio():
    assert T.positional_match_ratio("Ivanov", "Ivanov") == 1.0
    assert T.positional_match_ratio("", "x") == 0.0
    assert 0 < T.positional_match_ratio("Ivanov", "Ivanoff") < 1


def test_all_transliterations_standards():
    out = T.all_transliterations("Хороший")
    assert set(out) == {"GOST", "Scientific", "Passport"}
    assert out["Passport"].startswith("Kh")


def test_best_transliteration_match():
    cand, std, score = T.best_transliteration_match("Иванов", ["Ivanov", "Smith"])
    assert cand == "Ivanov" and score > 0.7
