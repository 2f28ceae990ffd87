"""loop_stats_transcripts / tool_stats_transcripts edge cases the
fixture oracle never hits: whitespace-normalized repeats, run lengths,
mode ties, and tool-free conversations."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.extras.transcripts import (
    loop_stats_transcripts,
    tool_stats_transcripts,
)


def _turns(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    )


def test_loop_stats_runs_and_normalization():
    ds = _turns(
        [
            # c1: assistant repeats the same (whitespace-mangled) turn
            # 3× in a row → max_run 3, 2 adjacent repeats; the user
            # turn in between roles doesn't extend the run
            ("c1", 0, "user", "hi", ""),
            ("c1", 1, "assistant", "Running  the tool", ""),
            ("c1", 2, "assistant", "running the\ttool ", ""),
            ("c1", 3, "assistant", " RUNNING THE TOOL", ""),
            ("c1", 4, "user", "stop", ""),
            # c2: same text, different roles → never a repeat
            ("c2", 0, "user", "same", ""),
            ("c2", 1, "assistant", "same", ""),
        ]
    )
    out = loop_stats_transcripts(ds, num_partitions=2).to_pandas().set_index("conv_id")
    assert out.loc["c1", "n_turns"] == 5
    assert out.loc["c1", "n_adjacent_repeats"] == 2
    assert out.loc["c1", "max_run"] == 3
    assert out.loc["c2", "n_adjacent_repeats"] == 0
    assert out.loc["c2", "max_run"] == 1


def test_tool_stats_mode_tiebreak_and_empty():
    ds = _turns(
        [
            # c1: grep×2, awk×2 → tie broken by tool ASC → awk
            ("c1", 0, "assistant", "x", "grep"),
            ("c1", 1, "assistant", "x", "awk"),
            ("c1", 2, "assistant", "x", "grep"),
            ("c1", 3, "assistant", "x", "awk"),
            ("c1", 4, "user", "x", ""),
            # c2: never calls a tool
            ("c2", 0, "user", "y", ""),
        ]
    )
    out = tool_stats_transcripts(ds, num_partitions=2).to_pandas().set_index("conv_id")
    assert out.loc["c1", "n_tool_turns"] == 4
    assert out.loc["c1", "n_distinct_tools"] == 2
    assert out.loc["c1", "top_tool"] == "awk"
    assert out.loc["c1", "top_tool_count"] == 2
    assert out.loc["c2", "n_tool_turns"] == 0
    assert out.loc["c2", "top_tool"] == ""
    assert out.loc["c2", "top_tool_count"] == 0
