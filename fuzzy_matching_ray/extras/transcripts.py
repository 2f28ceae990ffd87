"""Transcript-table hygiene operators (conv_id, turn_idx, role, text).

Training pipelines over agent/conversation transcripts need integrity
checks BEFORE dedup/packing: duplicated or gapped turn indices break
stable reassembly (the per-turn-equality invariant the flagship
relies on), role-alternation violations and empty turns are quality
signals.  One bucketed shuffle on conv_id (same machinery as document
assembly, `stages/grouped.py`), vectorized pandas groupby inside each
bucket — no per-conversation Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def validate_transcripts(
    turns: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Per-conversation integrity report:

    - ``n_turns``, ``n_roles`` — sizes
    - ``dup_turn_idx`` — rows sharing a turn_idx (breaks stable order)
    - ``idx_gaps`` — holes in the [min..max] turn_idx range
    - ``n_empty_turns`` — whitespace-only texts
    - ``n_role_repeats`` — adjacent same-role turns (alternation check)
    - ``starts_role`` — role of the first turn (min turn_idx; ties by
      role then text, so the value is deterministic and SQL-mirrorable)

    All counts int64; sort order inside a conversation is
    ``(turn_idx, role, text)`` in BOTH this kernel and the SQL oracle
    so adjacent-row semantics agree even on malformed input."""

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    slim = turns.select_columns(["conv_id", "turn_idx", "role", "text"])

    def _val(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_turns": pd.Series(dtype="int64"),
                    "n_roles": pd.Series(dtype="int64"),
                    "dup_turn_idx": pd.Series(dtype="int64"),
                    "idx_gaps": pd.Series(dtype="int64"),
                    "n_empty_turns": pd.Series(dtype="int64"),
                    "n_role_repeats": pd.Series(dtype="int64"),
                    "starts_role": pd.Series(dtype=object),
                }
            )
        # NULLS LAST in both engines (pandas na_position default /
        # DuckDB ASC default), so "first turn" agrees even on
        # malformed rows; NULL text is NOT empty (mirrors SQL
        # `trim(NULL) = ''` → NULL → 0), NULL role never counts as a
        # repeat (mirrors `role = lag(role)` with NULLs)
        df = df.sort_values(["conv_id", "turn_idx", "role", "text"], kind="mergesort")
        df = df.assign(
            _empty=df["text"].str.strip().eq("").fillna(False).astype("int64"),
            _rep=(
                df["role"].eq(df["role"].shift()) & df["conv_id"].eq(df["conv_id"].shift())
            ).astype("int64"),
        )
        g = df.groupby("conv_id", sort=False)
        out = g.agg(
            n_turns=("turn_idx", "size"),
            n_idx=("turn_idx", "nunique"),
            n_roles=("role", "nunique"),
            _mn=("turn_idx", "min"),
            _mx=("turn_idx", "max"),
            n_empty_turns=("_empty", "sum"),
            n_role_repeats=("_rep", "sum"),
        ).reset_index()
        # positional first row per conv (keeps a NULL role, unlike
        # groupby-first which would skip it)
        starts = df.drop_duplicates("conv_id")[["conv_id", "role"]].rename(
            columns={"role": "starts_role"}
        )
        out = out.merge(starts, on="conv_id", how="left")
        out["dup_turn_idx"] = (out["n_turns"] - out["n_idx"]).astype("int64")
        # all-NULL turn_idx → no usable range: report 0 gaps rather
        # than crashing on the malformed input this report exists for
        span_ok = out["_mx"].notna() & out["_mn"].notna()
        gaps = pd.Series(0, index=out.index, dtype="int64")
        if span_ok.any():
            gaps[span_ok] = (
                out.loc[span_ok, "_mx"].astype("int64")
                - out.loc[span_ok, "_mn"].astype("int64")
                + 1
                - out.loc[span_ok, "n_idx"]
            ).astype("int64")
        out["idx_gaps"] = gaps
        for c in ("n_turns", "n_roles", "n_empty_turns", "n_role_repeats"):
            out[c] = out[c].astype("int64")
        return out[
            [
                "conv_id",
                "n_turns",
                "n_roles",
                "dup_turn_idx",
                "idx_gaps",
                "n_empty_turns",
                "n_role_repeats",
                "starts_role",
            ]
        ]

    return bucketed_group_apply(slim, "conv_id", _val, num_partitions)


def loop_stats_transcripts(
    turns: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Agent-loop detection per conversation: an agent stuck in a loop
    emits (near-)identical turns back to back.  Reports, per conv:

    - ``n_turns``
    - ``n_adjacent_repeats`` — adjacent turns with the same role AND
      the same normalized text (lower, whitespace-collapsed, trimmed)
    - ``max_run`` — longest run of identical consecutive (role, norm)
      turns (≥1 for any non-empty conv)

    Adjacency is defined on the deterministic order
    ``(turn_idx, role, text)`` — same contract as
    :func:`validate_transcripts` — and the normalization is the exact
    dual of DuckDB ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``.
    One conv_id-bucketed shuffle; per-bucket kernel is fully
    vectorized (shift-compare + run-id cumsum, no per-conv loop)."""

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    slim = turns.select_columns(["conv_id", "turn_idx", "role", "text"])

    def _loops(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_turns": pd.Series(dtype="int64"),
                    "n_adjacent_repeats": pd.Series(dtype="int64"),
                    "max_run": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["conv_id", "turn_idx", "role", "text"], kind="mergesort")
        norm = (
            df["text"]
            .fillna("")
            .astype(str)
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        same = (
            df["conv_id"].eq(df["conv_id"].shift())
            & df["role"].eq(df["role"].shift())
            & norm.eq(norm.shift())
        ).to_numpy()
        run_id = np.cumsum(~same)  # new run wherever adjacency breaks
        runs = pd.DataFrame({"conv_id": df["conv_id"].to_numpy(), "run": run_id})
        run_len = runs.groupby("run", sort=False).agg(
            conv_id=("conv_id", "first"), length=("run", "size")
        )
        out = run_len.groupby("conv_id", sort=False)["length"].max().rename("max_run")
        g = pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "_rep": same.astype(np.int64),
            }
        ).groupby("conv_id", sort=False)
        res = g.agg(n_turns=("_rep", "size"), n_adjacent_repeats=("_rep", "sum")).reset_index()
        res = res.merge(out.reset_index(), on="conv_id")
        for c in ("n_turns", "n_adjacent_repeats", "max_run"):
            res[c] = res[c].astype("int64")
        return res[["conv_id", "n_turns", "n_adjacent_repeats", "max_run"]]

    return bucketed_group_apply(slim, "conv_id", _loops, num_partitions)


def tool_stats_transcripts(
    turns: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Tool-usage profile per conversation (agent transcripts):
    ``(conv_id, n_turns, n_tool_turns, n_distinct_tools, top_tool,
    top_tool_count)`` where ``top_tool`` is the most frequent
    non-empty tool (ties → lexicographically smallest; '' when the
    conv never calls a tool).  All-integer counts + one string."""

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    slim = turns.select_columns(["conv_id", "tool"])

    def _tools(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_turns": pd.Series(dtype="int64"),
                    "n_tool_turns": pd.Series(dtype="int64"),
                    "n_distinct_tools": pd.Series(dtype="int64"),
                    "top_tool": pd.Series(dtype=object),
                    "top_tool_count": pd.Series(dtype="int64"),
                }
            )
        tool = df["tool"].fillna("")
        base = pd.DataFrame({"conv_id": df["conv_id"].to_numpy(), "tool": tool.to_numpy()})
        g = base.groupby("conv_id", sort=False)
        out = g.agg(n_turns=("tool", "size")).reset_index()
        used = base[base["tool"] != ""]
        per_tool = (
            used.groupby(["conv_id", "tool"], sort=False).size().rename("n").reset_index()
        )
        agg = per_tool.groupby("conv_id", sort=False).agg(
            n_tool_turns=("n", "sum"), n_distinct_tools=("tool", "nunique")
        )
        # mode with deterministic tiebreak: count DESC, tool ASC
        per_tool = per_tool.sort_values(
            ["conv_id", "n", "tool"], ascending=[True, False, True], kind="mergesort"
        )
        top = per_tool.drop_duplicates("conv_id").rename(
            columns={"tool": "top_tool", "n": "top_tool_count"}
        )
        out = out.merge(agg.reset_index(), on="conv_id", how="left").merge(
            top, on="conv_id", how="left"
        )
        out["top_tool"] = out["top_tool"].fillna("")
        for c in ("n_turns", "n_tool_turns", "n_distinct_tools", "top_tool_count"):
            out[c] = out[c].fillna(0).astype("int64")
        return out[
            [
                "conv_id",
                "n_turns",
                "n_tool_turns",
                "n_distinct_tools",
                "top_tool",
                "top_tool_count",
            ]
        ]

    return bucketed_group_apply(slim, "conv_id", _tools, num_partitions)


def pack_chat_sequences(
    turns: ray.data.Dataset,
    *,
    budget: int = 512,
    loss_roles: tuple[str, ...] = ("assistant",),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SFT-style chat packing layout: each conversation is one
    training sequence (turns concatenated in stable order); per turn
    emit its whitespace-token count, its token offset in the
    sequence, the fixed-size pack indices it touches, and the loss
    mask (1 only for ``loss_roles`` — the standard
    assistant-turns-only supervision).  Integer-exact, one conv_id
    shuffle, vectorized cumsum inside buckets; the actual token-id
    materialization is the tokenizer's job downstream — this operator
    defines the REPRODUCIBLE layout (same contract as
    :func:`fuzzy_matching_ray.extras.packing.pack_sequences`)."""
    import numpy as np

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    slim = turns.select_columns(["conv_id", "turn_idx", "role", "text"])
    roles = set(loss_roles)

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "turn_idx": pd.Series(dtype="int64"),
                    "seq_start": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "loss_mask": pd.Series(dtype="int64"),
                    "pack_first": pd.Series(dtype="int64"),
                    "pack_last": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["conv_id", "turn_idx", "role", "text"], kind="mergesort")
        n = (
            df["text"].fillna("").str.strip().str.count(r"\S+").astype("int64").to_numpy()
        )
        cum = df.assign(_n=n).groupby("conv_id", sort=False)["_n"].cumsum().to_numpy() - n
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                # nullable Int64: a NULL turn_idx (malformed input)
                # sorts last and stays NULL instead of crashing the
                # int cast; the token layout is still well-defined
                "turn_idx": df["turn_idx"].astype("Int64").reset_index(drop=True),
                "seq_start": cum.astype("int64"),
                "n_tokens": n,
                "loss_mask": df["role"].isin(roles).astype("int64").to_numpy(),
                "pack_first": (cum // budget).astype("int64"),
                "pack_last": ((cum + np.maximum(n, 1) - 1) // budget).astype("int64"),
            }
        )
        return out

    return bucketed_group_apply(slim, "conv_id", _pack, num_partitions)


def boilerplate_turns(
    turns: ray.data.Dataset,
    min_count: int = 3,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Repeated-turn (boilerplate) detection: turns whose exact text
    recurs ``min_count``+ times across the corpus — system prompts,
    canned greetings, templated tool outputs.  Output
    ``(text, n_occurrences, n_convs)``.

    Scale shape: a per-batch combiner first collapses each batch to
    distinct ``(text, conv_id)`` rows with local counts — boilerplate
    is by definition highly duplicated, so the text-keyed shuffle that
    follows moves the REDUCED stream, not one row per turn (the same
    partial-aggregate-before-groupby rule as the token heavy-hitters
    operator)."""

    def _local(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        # Arrow hash-aggregate combiner (C++); Arrow group_by keeps
        # NULL-text groups, same as the pandas dropna=False it replaces
        g = batch.group_by(["text", "conv_id"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "text": g["text"],
                "conv_id": g["conv_id"],
                "_cnt": g["count_all"].cast(pa.int64()),
            }
        )

    local = turns.select_columns(["conv_id", "text"]).map_batches(
        _local, batch_format="pyarrow"
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text", sort=False, dropna=False).agg(
            n_occurrences=("_cnt", "sum"), n_convs=("conv_id", "nunique")
        )
        g = g[g["n_occurrences"] >= min_count].reset_index()
        g["n_occurrences"] = g["n_occurrences"].astype("int64")
        g["n_convs"] = g["n_convs"].astype("int64")
        return g[["text", "n_occurrences", "n_convs"]]

    from fuzzy_matching_ray.stages.grouped import bucketed_group_apply

    return bucketed_group_apply(local, "text", _merge, num_partitions)
