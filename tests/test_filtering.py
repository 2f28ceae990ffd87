"""PII redaction, benchmark decontamination, repetition stats."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from fuzzy_matching_ray.extras.filtering import (
    decontaminate,
    redact_pii,
    repetition_stats,
)


def _docs(rows):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in rows])


@pytest.mark.usefixtures("ray_session")
def test_redact_pii_patterns_and_counts():
    out = (
        redact_pii(
            _docs(
                [
                    (1, "mail a.b+c@foo-bar.co.uk now, call +1-555-123-4567 twice"),
                    (2, "ssn 123-45-6789 and 987-65-4321; no email here"),
                    (3, "clean text with 1234-56-7890 (not an ssn: 4-digit prefix)"),
                ]
            )
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "text_redacted"] == "mail <EMAIL> now, call <PHONE> twice"
    assert (out.loc[1, ["n_email", "n_phone", "n_ssn"]] == [1, 1, 0]).all()
    assert out.loc[2, "text_redacted"] == "ssn <SSN> and <SSN>; no email here"
    assert out.loc[2, "n_ssn"] == 2
    # RE2 finds the leftmost-longest digit run: "234-56-7890" inside
    # the 4-digit prefix still matches the unanchored SSN shape
    assert out.loc[3, "n_ssn"] == 1


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_shared_ngrams():
    bench = _docs([(0, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        [
            (1, "intro words then the quick brown fox appears here"),  # 1 shared 4-gram
            (2, "completely unrelated text about arrow record batches"),
            (3, "quick brown fox jumps over and over again today"),  # 2 shared 4-grams
        ]
    )
    out = decontaminate(corpus, bench, n=4).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 3]
    assert out.loc[1, "n_contaminated"] == 1
    assert out.loc[3, "n_contaminated"] == 2


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_empty_bench():
    corpus = _docs([(1, "some words in a row here")])
    assert decontaminate(corpus, _docs([]), n=4).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_counts_and_tiebreak():
    out = (
        repetition_stats(
            _docs(
                [
                    (1, "a b a b a b"),  # "a b" x3, "b a" x2
                    (2, "z y z y"),  # "z y" x2 beats "y z" x1
                    (3, "solo"),  # <2 words
                    (4, "x x y y"),  # all bigrams count 1 -> lexicographic min
                ]
            )
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out.loc[1, ["n_words", "n_distinct_words", "top_bigram_count"]] == [6, 2, 3]).all()
    assert out.loc[1, "top_bigram"] == "a b"
    assert out.loc[2, "top_bigram"] == "z y"
    assert out.loc[3, "top_bigram"] == "" and out.loc[3, "top_bigram_count"] == 0
    assert out.loc[4, "top_bigram"] == "x x"  # min among count-1 ties


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_windows():
    from fuzzy_matching_ray.extras.chunking import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # starts 0,4,8 at stride 4
        (2, "a b"),                                  # single short chunk
        (3, ""),                                     # no chunks
        (4, "   "),                                  # whitespace-only: no chunks
    ]
    out = (
        chunk_documents(_docs(rows), window=6, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_idx) == [0, 1, 2]
    assert list(d1.n_tokens) == [6, 6, 2]
    assert d1.iloc[0].chunk_text == "w0 w1 w2 w3 w4 w5"
    assert d1.iloc[2].chunk_text == "w8 w9"
    d2 = out[out.doc_id == 2]
    assert list(d2.n_tokens) == [2] and d2.iloc[0].chunk_text == "a b"
    assert not (out.doc_id.isin([3, 4])).any()

    with pytest.raises(ValueError):
        chunk_documents(_docs(rows), window=6, stride=0)


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_property_vs_reference():
    from hypothesis import given, settings, strategies as st

    from fuzzy_matching_ray.extras.chunking import chunk_documents

    word = st.text(alphabet="abcxyz", min_size=1, max_size=4)
    doc = st.lists(word, min_size=0, max_size=40).map(" ".join)

    @settings(max_examples=15, deadline=None)
    @given(
        texts=st.lists(doc, min_size=1, max_size=8),
        window=st.integers(1, 10),
        stride=st.integers(1, 10),
    )
    def run(texts, window, stride):
        rows = list(enumerate(texts))
        out = chunk_documents(_docs(rows), window=window, stride=stride).to_pandas()
        expect = []
        for i, t in rows:
            toks = t.split()
            s = 0
            ci = 0
            while s < len(toks):
                take = toks[s : s + window]
                expect.append((i, ci, len(take), " ".join(take)))
                s += stride
                ci += 1
        if out.empty:
            assert expect == []
            return
        out = out.sort_values(["doc_id", "chunk_idx"])
        got = list(map(tuple, out[["doc_id", "chunk_idx", "n_tokens", "chunk_text"]].to_numpy()))
        assert got == expect

    run()


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_string_ids():
    import ray.data as rd

    bench = rd.from_items([{"doc_id": "b1", "text": "one two three four five"}])
    corpus = rd.from_items(
        [
            {"doc_id": "d1", "text": "zzz one two three four yyy"},
            {"doc_id": "d2", "text": "nothing shared at all here now"},
        ]
    )
    out = decontaminate(corpus, bench, n=4).to_pandas()
    assert list(out.doc_id) == ["d1"] and list(out.n_contaminated) == [1]
