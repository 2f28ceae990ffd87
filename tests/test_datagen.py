"""Generator invariants (mirroring the reference's generator tests,
``tests/test_error_handling.py:76-100``) + determinism."""

from __future__ import annotations

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
