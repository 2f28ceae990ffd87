"""Per-turn text-equality invariant (north_rule / BASELINE.json
``input_hint``): re-exploding assembled documents reproduces every
``(conv_id, turn_idx) → (role, text, tool)`` of the source Parquet
exactly."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from fuzzy_matching_ray.stages.assemble import assemble_documents, explode_docs


def test_per_turn_invariant(ray_session, tiny_transcripts):
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = assemble_documents(turns, num_partitions=4)
    back = explode_docs(docs).to_pandas()
    src = turns.to_pandas()[["conv_id", "turn_idx", "role", "text", "tool"]]

    key = ["conv_id", "turn_idx"]
    back = back.sort_values(key).reset_index(drop=True)
    src = src.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, src, check_like=True)


def test_doc_text_is_ordered_join(ray_session, tiny_transcripts):
    turns = rd.read_parquet(tiny_transcripts["turns_dir"])
    docs = assemble_documents(turns, separator="\n", num_partitions=4).to_pandas()
    src = turns.to_pandas()
    one = docs.iloc[0]
    expected = "\n".join(
        src[src.conv_id == one.conv_id].sort_values("turn_idx").text
    )
    assert one.doc_text == expected
    assert one.n_turns == (src.conv_id == one.conv_id).sum()


def test_canonicalize_column_matches_scalar_path():
    """The Arrow canonicalization must equal the scalar reference path
    byte-for-byte — pyarrow's utf8_normalize(form='NFKC') emits
    DECOMPOSED sequences (ё → е+U+0308), which silently defeated the
    ё→е fold until round 2."""
    import pyarrow as pa

    from fuzzy_matching_ray.functions.normalize import (
        canonicalize_column,
        canonicalize_text,
    )

    cases = ["счёт Ё тест", "ASCII only", "", "  spaces\t\nhere  ",
             "é café", "ﬁle ℕ ½", "ё pre-decomposed", None,
             # Python whitespace class is unicode, RE2 backslash-s is ASCII
             "nbsp\u00a0x", "sep\u2028x", "nel\u0085x", "fs\u001cx",
             "em\u2003x", "ideo\u3000x",
             # Arrow utf8_lower corners: Turkish dotted I, final sigma
             "\u0130stanbul", "\u03a3\u039f\u03a6\u039f\u03a3"]
    col = canonicalize_column(pa.array(cases, pa.string()))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    got = col.to_pylist()
    want = [canonicalize_text(s) if s is not None else None for s in cases]
    assert got == want
