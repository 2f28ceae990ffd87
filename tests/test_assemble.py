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


def test_file_assembly_equals_generic(ray_session):
    """The shuffle-free fast path (read+assemble fused per conv-sharded
    file) must emit exactly the generic sort-shuffle path's documents —
    including a conv-count invariant that catches the straddling
    failure mode (a conversation assembled as two half-docs)."""
    import ray.data as rd

    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts
    from fuzzy_matching_ray.stages.assemble import (
        assemble_documents,
        assemble_documents_from_files,
    )

    turns_dir = write_transcripts(
        "/tmp/fmr_prepart_test", TranscriptGenConfig(n_convs=150, seed=7), shards=6
    )
    import glob

    files = sorted(glob.glob(turns_dir + "/*.parquet"))
    assert len(files) == 6

    fast = (
        assemble_documents_from_files(files)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    generic = (
        assemble_documents(rd.read_parquet(files), num_partitions=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(fast) == len(generic) == fast["conv_id"].nunique()
    for col in ("conv_id", "n_turns", "doc_text"):
        assert fast[col].tolist() == generic[col].tolist()
