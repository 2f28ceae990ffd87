"""Transcript integrity validation over malformed conversations."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from fuzzy_matching_ray.extras.transcripts import validate_transcripts


def _turns(rows):
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def test_validate_transcripts_flags(ray_session):
    rows = [
        # clean alternating conversation
        ("a", 0, "user", "hi"),
        ("a", 1, "assistant", "hello"),
        ("a", 2, "user", "bye"),
        # duplicated turn_idx + role repeat
        ("b", 0, "user", "x"),
        ("b", 0, "user", "y"),
        ("b", 1, "assistant", "z"),
        # gapped indices + empty turn
        ("c", 0, "user", "q"),
        ("c", 3, "assistant", "   "),
    ]
    out = (
        validate_transcripts(_turns(rows), num_partitions=4)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    a, b, c = out.loc["a"], out.loc["b"], out.loc["c"]
    assert list(a[["n_turns", "n_roles", "dup_turn_idx", "idx_gaps"]]) == [3, 2, 0, 0]
    assert a["n_role_repeats"] == 0 and a["starts_role"] == "user"
    assert b["dup_turn_idx"] == 1 and b["n_role_repeats"] == 1
    assert b["starts_role"] == "user"  # tie at idx 0 broken by (role, text)
    assert c["idx_gaps"] == 2 and c["n_empty_turns"] == 1


def test_validate_matches_pandas_reference(ray_session):
    # cross-check against a direct single-frame computation
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for ci in range(40):
        n = int(rng.integers(1, 9))
        for t in range(n):
            idx = t if rng.random() > 0.1 else max(0, t - 1)  # occasional dup
            role = ["user", "assistant"][int(rng.integers(0, 2))]
            rows.append((f"c{ci}", idx, role, f"text {ci} {t}"))
    out = (
        validate_transcripts(_turns(rows), num_partitions=8)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    df = df.sort_values(["conv_id", "turn_idx", "role", "text"], kind="mergesort")
    g = df.groupby("conv_id")
    assert (out.set_index("conv_id")["n_turns"] == g.size()).all()
    assert (
        out.set_index("conv_id")["dup_turn_idx"]
        == g["turn_idx"].size() - g["turn_idx"].nunique()
    ).all()
    rep = (
        (df["role"].eq(df["role"].shift()) & df["conv_id"].eq(df["conv_id"].shift()))
        .groupby(df["conv_id"])
        .sum()
    )
    assert (out.set_index("conv_id")["n_role_repeats"] == rep).all()
    assert (out.set_index("conv_id")["starts_role"] == g["role"].first()).all()


def test_pack_chat_layout_and_mask(ray_session):
    from fuzzy_matching_ray.extras.transcripts import pack_chat_sequences

    rows = [
        ("a", 0, "system", "be helpful"),          # 2 tokens, mask 0
        ("a", 1, "user", "one two three"),         # 3 tokens, mask 0
        ("a", 2, "assistant", "w1 w2 w3 w4"),      # 4 tokens, mask 1
        ("b", 0, "user", " ".join(f"t{i}" for i in range(6))),  # 6 tokens
        ("b", 1, "assistant", "x y"),              # straddles budget=4
    ]
    out = (
        pack_chat_sequences(_turns(rows), budget=4, num_partitions=4)
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    assert list(out.loc[("a", 0)][["seq_start", "n_tokens", "loss_mask"]]) == [0, 2, 0]
    assert list(out.loc[("a", 2)][["seq_start", "n_tokens", "loss_mask"]]) == [5, 4, 1]
    # a's assistant turn spans tokens 5..8 -> packs 1..2 at budget 4
    assert list(out.loc[("a", 2)][["pack_first", "pack_last"]]) == [1, 2]
    # b turn 0 spans 0..5 -> packs 0..1; turn 1 spans 6..7 -> pack 1
    assert list(out.loc[("b", 0)][["pack_first", "pack_last"]]) == [0, 1]
    assert list(out.loc[("b", 1)][["pack_first", "pack_last"]]) == [1, 1]


def test_boilerplate_turns_counts(ray_session):
    from fuzzy_matching_ray.extras.transcripts import boilerplate_turns

    rows = (
        [(f"c{i}", 0, "system", "you are helpful") for i in range(5)]
        + [(f"c{i}", 1, "user", f"unique question {i}") for i in range(5)]
        + [("c0", 2, "assistant", "ok"), ("c0", 3, "assistant", "ok")]
    )
    out = (
        boilerplate_turns(_turns(rows), min_count=2, num_partitions=4)
        .to_pandas()
        .set_index("text")
        .sort_index()
    )
    assert list(out.index) == ["ok", "you are helpful"]
    assert list(out.loc["you are helpful"]) == [5, 5]
    assert list(out.loc["ok"]) == [2, 1]  # twice, in one conversation


def test_null_robustness(ray_session):
    """NULL text / turn_idx must not crash and must mirror SQL
    semantics (NULL text is not 'empty'; NULL idx sorts last)."""
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, None, 0, 1, 2], pa.int32()),
            "role": pa.array(["user", "assistant", None, "user", "user", "user"]),
            "text": pa.array(["hi", None, "late", None, None, None], pa.string()),
        }
    )
    ds = rd.from_arrow(t)

    from fuzzy_matching_ray.extras.transcripts import (
        boilerplate_turns,
        pack_chat_sequences,
        validate_transcripts,
    )

    v = validate_transcripts(ds, num_partitions=2).to_pandas().set_index("conv_id")
    assert v.loc["a", "n_empty_turns"] == 0  # NULL text is not empty
    assert v.loc["a", "dup_turn_idx"] == 1  # the NULL idx row
    assert v.loc["a", "starts_role"] == "user"
    assert v.loc["b", "n_role_repeats"] == 2

    p = pack_chat_sequences(ds, num_partitions=2).to_pandas()
    assert len(p) == 6 and p["turn_idx"].isna().sum() == 1

    b = boilerplate_turns(ds, min_count=3, num_partitions=2).to_pandas()
    assert len(b) == 1 and pd.isna(b.iloc[0]["text"])  # the NULL-text group
    assert b.iloc[0]["n_occurrences"] == 4 and b.iloc[0]["n_convs"] == 2
