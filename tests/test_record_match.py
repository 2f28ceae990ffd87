"""Reference-parity record matching: distributed == pure-Python oracle,
plus the reference's error-handling behaviors
(``tests/test_error_handling.py``)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.config import (
    FuzzyAlgorithm,
    MatchConfig,
    MatchFieldConfig,
    TransliterationConfig,
)
from fuzzy_matching_ray.datagen import PersonGenConfig, generate_person_records
from fuzzy_matching_ray.pipelines.record_match import (
    ReferenceMatcher,
    match_records,
    transliterate_dataset,
)

CFG = MatchConfig(
    fields=(
        MatchFieldConfig("last_name", 0.4),
        MatchFieldConfig("first_name", 0.3),
        MatchFieldConfig("middle_name", 0.2),
        MatchFieldConfig("email", 0.1),
    ),
    threshold=0.7,
    block_field="last_name",
    sort_before_match=True,
)


def test_oracle_matches_most_true_pairs():
    orig, var = generate_person_records(PersonGenConfig(n_records=120, language="mixed"))
    matches, consolidated = ReferenceMatcher(CFG).match_and_consolidate(orig, var)
    correct = sum(1 for m in matches if m["variant"]["id"] == m["original"]["id"] + "_v")
    assert correct / len(orig) > 0.9
    # consolidated = one survivor per match + unmatched from both sides
    assert len(consolidated) == len(orig) + len(var) - len(matches)


def test_distributed_equals_oracle(ray_session):
    orig, var = generate_person_records(PersonGenConfig(n_records=80, language="mixed"))
    oracle_matches, _ = ReferenceMatcher(CFG).match_and_consolidate(orig, var)
    oracle_pairs = sorted(
        (m["original"]["id"], m["variant"]["id"], round(m["similarity"], 9))
        for m in oracle_matches
    )

    ds1 = rd.from_pandas(pd.DataFrame(orig))
    ds2 = rd.from_pandas(pd.DataFrame(var))
    out = match_records(ds1, ds2, CFG).to_pandas()
    got_pairs = sorted(
        (r.o_id, r.v_id, round(r.similarity, 9)) for r in out.itertuples()
    )
    assert got_pairs == oracle_pairs


def test_missing_fields_do_not_crash():
    # reference: scoring records lacking fields → similarity 0, no error
    m = ReferenceMatcher(CFG)
    sim, _ = m.weighted_similarity({"id": "1"}, {"id": "2"})
    assert sim == 0.0


def test_empty_block_value_excluded():
    m = ReferenceMatcher(CFG)
    recs = [{"last_name": "", "id": "1"}, {"last_name": "Smith", "id": "2"}]
    blocks = m.block(recs)
    assert "S" in blocks and len(blocks) == 1  # empty value silently dropped


def test_cleaner_record_prefers_fewer_special_chars():
    m = ReferenceMatcher(CFG)
    clean = {"last_name": "Smith", "first_name": "John", "middle_name": "", "email": ""}
    noisy = {"last_name": "Sm!th", "first_name": "J@hn", "middle_name": "", "email": ""}
    assert m.select_cleaner_record(clean, noisy) is clean
    # tie → shorter combined
    short = {"last_name": "Li", "first_name": "", "middle_name": "", "email": ""}
    longer = {"last_name": "Long", "first_name": "", "middle_name": "", "email": ""}
    assert m.select_cleaner_record(short, longer) is short


def test_length_weight_quirk():
    # MatchConfig.length_weight is ignored; a field literally named
    # 'length' is what carries weight (data_matcher.py:270)
    cfg = MatchConfig(
        fields=(MatchFieldConfig("name", 1.0), MatchFieldConfig("length", 0.5)),
        threshold=0.5,
    )
    m = ReferenceMatcher(cfg)
    a = {"name": "xx", "length": ""}
    b = {"name": "xxxxxxxx", "length": ""}
    # with 'length' weight 0.5, longer combined text scores worse
    assert m.select_cleaner_record(a, b) is a


def test_unknown_algorithm_falls_back_to_ratio():
    cfg = MatchConfig(fields=(MatchFieldConfig("f", 1.0, fuzzy_algorithm=None),))
    m = ReferenceMatcher(cfg)
    sim, _ = m.weighted_similarity({"f": "abc"}, {"f": "abc"})
    assert sim == 1.0


def test_no_blocking_single_block():
    cfg = MatchConfig(fields=(MatchFieldConfig("f", 1.0),), block_field=None)
    m = ReferenceMatcher(cfg)
    assert list(m.block([{"f": "a"}, {"f": "b"}])) == ["ALL"]


def test_transliterate_dataset(ray_session):
    ds = rd.from_pandas(pd.DataFrame([
        {"name": "Иванов"}, {"name": "Ivanov"}, {"name": ""},
    ]))
    out = transliterate_dataset(ds, "en", ["name"]).to_pandas()
    assert set(out.name) == {"Ivanov", ""}
