"""Corpus-aware term weighting: tfidf_top_terms / rare_token_stats
edge cases the sf0.01 oracle never hits — empty documents, ranking
ties broken by term, multi-batch DF correctness, and the dual of the
DuckDB tokenizer on whitespace runs."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.tfidf import rare_token_stats, tfidf_top_terms

DOCS = [
    # doc 0: 'b b a' — tf(b)=2 df(b)=2 → 1.0; tf(a)=1 df(a)=3 → 1/3
    (0, "b B a"),
    # doc 1: same score for 'a' and 'q' (both tf=1; df(a)=3 … no —
    # use true tie: 'x y' each tf=1, df=1 → tie broken by term asc
    (1, "x y a"),
    (2, ""),  # empty doc: no tfidf rows, zero-row rare stats
    (3, "a   b\t\nb"),  # whitespace runs + tabs/newlines
]


def _ds():
    return rd.from_pandas(
        pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]})
    )


def test_tfidf_top_terms_ranking_and_ties():
    out = (
        tfidf_top_terms(_ds(), k=3)
        .to_pandas()
        .sort_values(["doc_id", "term_rank"])
        .reset_index(drop=True)
    )
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    # doc 0: b (tf2/df2=1.0) beats a (tf1/df3)
    assert by_doc[0]["term"].tolist() == ["b", "a"]
    assert by_doc[0]["tf"].tolist() == [2, 1]
    assert by_doc[0]["df"].tolist() == [2, 3]
    # doc 1: x and y tie at 1/1 → term ASC; a (1/3) last
    assert by_doc[1]["term"].tolist() == ["x", "y", "a"]
    assert by_doc[1]["term_rank"].tolist() == [1, 2, 3]
    # doc 2 (empty) emits nothing
    assert 2 not in by_doc
    # doc 3 tokenizes across whitespace runs: b tf=2
    assert by_doc[3].set_index("term")["tf"]["b"] == 2


def test_tfidf_df_spans_batches():
    """DF must be global even when docs land in different batches."""
    df = pd.DataFrame({"doc_id": range(8), "text": ["zz common"] * 8})
    ds = rd.from_pandas(df).repartition(4)
    out = tfidf_top_terms(ds, k=1).to_pandas()
    assert (out["df"] == 8).all()


def test_rare_token_stats_hapax():
    out = (
        rare_token_stats(_ds())
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # every doc (incl. empty) has a row
    assert out.index.tolist() == [0, 1, 2, 3]
    # doc 1: x, y are hapax (df=1); a is not (df=3)
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[1, "n_rare"] == 2
    assert out.loc[1, "n_distinct_rare"] == 2
    # empty doc: zeros
    assert out.loc[2].tolist() == [0, 0, 0]
    # doc 3: 'a b b' → b occurs twice but df(b)=2 → not rare
    assert out.loc[3, "n_tokens"] == 3
    assert out.loc[3, "n_rare"] == 0


def test_bucketed_mode_matches_broadcast():
    """The no-broadcast web-scale path emits exactly the broadcast
    path's rows for both operators (same ranking, same integers)."""
    import numpy as np

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 25)).tolist())
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    ds = rd.from_pandas(df).repartition(5)

    a = (
        tfidf_top_terms(ds, k=3, df_mode="broadcast")
        .to_pandas()
        .sort_values(["doc_id", "term_rank"])
        .reset_index(drop=True)
    )
    b = (
        tfidf_top_terms(ds, k=3, df_mode="bucketed", num_partitions=7)
        .to_pandas()
        .sort_values(["doc_id", "term_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    ra = (
        rare_token_stats(ds, df_mode="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rb = (
        rare_token_stats(ds, df_mode="bucketed", num_partitions=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ra, rb, check_dtype=False)
    assert len(ra) == 200  # token-less docs still appear


def test_broadcast_cap_is_loud():
    """df_mode='broadcast' above the vocabulary bound raises; 'auto'
    switches to bucketed and still answers correctly."""
    import pytest

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "c d e"]})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="broadcast_max_terms"):
        tfidf_top_terms(ds, df_mode="broadcast", broadcast_max_terms=2).to_pandas()
    out = tfidf_top_terms(ds, df_mode="auto", broadcast_max_terms=2).to_pandas()
    assert set(out["doc_id"]) == {0, 1}


def test_unigram_logfreq_serial_golden_and_modes():
    """Score must equal the serial per-doc mean ln(corpus count) in
    BOTH scale modes; token-less docs get n_tokens=0 / NULL score."""
    import math

    import numpy as np

    from fuzzy_matching_ray.extras.tfidf import unigram_logfreq

    ds = _ds().repartition(3)
    # serial golden
    toks = {d: t.lower().split() for d, t in DOCS}
    cnt: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1

    for mode in ("broadcast", "bucketed"):
        out = (
            unigram_logfreq(ds, df_mode=mode)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == len(DOCS)
        for d, ts in toks.items():
            assert out.loc[d, "n_tokens"] == len(ts)
            if ts:
                want = sum(math.log(cnt[t]) for t in ts) / len(ts)
                assert abs(out.loc[d, "logfreq"] - want) < 1e-12
            else:
                assert np.isnan(out.loc[d, "logfreq"])
