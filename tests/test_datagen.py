"""Generator invariants (mirroring the reference's generator tests,
``tests/test_error_handling.py:76-100``) + determinism."""

from __future__ import annotations

import os

import numpy as np

from fuzzy_matching_ray.datagen import (
    PersonGenConfig,
    TranscriptGenConfig,
    _swap_chars,
    _change_char,
    _double_char,
    generate_person_records,
    generate_transcripts,
)


def _rng():
    return np.random.Generator(np.random.PCG64(123))


def test_swap_invariants():
    rng = _rng()
    for word in ["Alexander", "Иванов", "abcdef"]:
        for _ in range(50):
            out = _swap_chars(rng, word)
            assert out[0] == word[0]           # first char fixed
            assert len(out) == len(word)       # length preserved
            assert sorted(out) == sorted(word)
    assert _swap_chars(rng, "ab") == "ab"      # short strings untouched
    assert _swap_chars(rng, "") == ""


def test_change_char_never_first():
    rng = _rng()
    for _ in range(50):
        out = _change_char(rng, "Alexander")
        assert out[0] == "A"
        assert len(out) == len("Alexander")
    assert _change_char(rng, "a") == "a"


def test_double_char_grows_by_one():
    rng = _rng()
    out = _double_char(rng, "abc")
    assert len(out) == 4
    assert _double_char(rng, "") == ""


def test_transcripts_deterministic():
    cfg = TranscriptGenConfig(n_convs=30, seed=7)
    t1, d1 = generate_transcripts(cfg)
    t2, d2 = generate_transcripts(cfg)
    assert t1.equals(t2)
    assert d1.equals(d2)


def test_transcripts_schema_and_ordering():
    cfg = TranscriptGenConfig(n_convs=20, seed=1)
    t, truth = generate_transcripts(cfg)
    names = t.schema.names
    assert names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        idx = g.sort_values("turn_idx")
        # dense 0-based turn_idx, monotone ts
        assert list(idx.turn_idx) == list(range(len(idx)))
        assert idx.ts.is_monotonic_increasing
    # variants exist and follow the _v{k} convention
    assert all(d.startswith(o) and "_v" in d
               for o, d in zip(truth["orig_conv_id"].to_pylist(), truth["dup_conv_id"].to_pylist()))


def test_person_records_pairing():
    orig, var = generate_person_records(PersonGenConfig(n_records=25))
    assert len(orig) == len(var) == 25
    for o, v in zip(orig, var):
        assert v["id"] == o["id"] + "_v"


def test_person_generator_reference_fidelity_knobs():
    """Reference data_generator.py:172-232,322-373 parity: phone field
    with digit doubling, full-surname replacement that regenerates the
    email local part; default knobs must not consume extra RNG draws
    (fixtures stay byte-identical)."""
    from fuzzy_matching_ray.datagen import PersonGenConfig, generate_person_records

    base_o, base_v = generate_person_records(PersonGenConfig(n_records=40, language="mixed"))
    again_o, again_v = generate_person_records(PersonGenConfig(n_records=40, language="mixed"))
    assert base_o == again_o and base_v == again_v
    assert "phone" not in base_o[0]

    o, v = generate_person_records(
        PersonGenConfig(n_records=40, language="mixed",
                        include_phone=True, change_name_probability=0.5)
    )
    assert all(r["phone"].startswith(("+7", "+1")) and len(r["phone"]) == 12 for r in o)
    # doubled digits lengthen the phone by exactly one, never the prefix
    assert any(len(b["phone"]) == 13 for b in v)
    assert all(b["phone"][:2] == a["phone"][:2] for a, b in zip(o, v))
    # full replacement regenerates the email local part to match
    replaced = [(a, b) for a, b in zip(o, v) if a["last_name"] != b["last_name"]
                and len(b["last_name"]) == len(b["last_name"].strip())]
    assert any(b["email"].split("@")[0] != a["email"].split("@")[0] for a, b in replaced)


def test_person_gender_consistency():
    """Reference invariant (utils/data_generator.py + gender_guesser):
    a record's patronymic gender matches its first-name gender, and
    Russian female surnames carry the feminine declension."""
    from fuzzy_matching_ray.datagen import (
        _EN_NAMES,
        _EN_NAMES_F,
        _RU_NAMES,
        _RU_NAMES_F,
        PersonGenConfig,
        generate_person_records,
    )

    orig, _ = generate_person_records(
        PersonGenConfig(n_records=400, language="mixed", seed=11)
    )
    saw_f = saw_m = False
    for r in orig:
        first, middle, last = r["first_name"], r["middle_name"], r["last_name"]
        if first in _RU_NAMES_F:
            saw_f = True
            assert middle.endswith(("овна", "евна")), (first, middle)
            assert last.endswith("а"), (first, last)
        elif first in _RU_NAMES:
            saw_m = True
            assert middle.endswith(("ович", "евич")), (first, middle)
            assert not last.endswith("а"), (first, last)
        elif first in _EN_NAMES_F:
            assert middle in _EN_NAMES_F, (first, middle)
        else:
            assert first in _EN_NAMES and middle in _EN_NAMES, (first, middle)
    assert saw_f and saw_m  # both genders actually generated


def test_write_transcripts_stale_marker_cleanup(tmp_path):
    """Regenerating with a different config must invalidate the OLD
    config's marker too: the cleanup deletes the old shard files, so a
    surviving marker would make a later call with the old config
    silently return the wrong corpus."""
    import glob

    import pyarrow.parquet as pq

    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts

    root = str(tmp_path)

    def n_rows(turns_dir: str) -> int:
        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(turns_dir, "*.parquet"))
        )

    d = write_transcripts(root, TranscriptGenConfig(n_convs=30, seed=1))
    rows_30 = n_rows(d)
    write_transcripts(root, TranscriptGenConfig(n_convs=60, seed=1))
    # third call with the FIRST config again: must regenerate (marker
    # was invalidated), yielding the 30-conv corpus, not the 60-conv one
    d3 = write_transcripts(root, TranscriptGenConfig(n_convs=30, seed=1))
    assert n_rows(d3) == rows_30
