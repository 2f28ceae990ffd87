"""Empty-input hardening: every document/event/transcript operator
must stream a 0-row dataset through without raising (the resume /
partition-pruned paths regularly hand stages empty inputs)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)
EVENT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.string()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)
TURN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _empty(schema: pa.Schema) -> rd.Dataset:
    return rd.from_arrow(schema.empty_table())


def _docs_ops():
    from fuzzy_matching_ray.extras import aggregates, filtering, packing, textstats, tfidf

    return {
        "token_heavy_hitters": lambda ds: aggregates.token_heavy_hitters(ds, min_count=1),
        "pivot_like": lambda ds: aggregates.pivot_counts(
            ds, key_col="lang", pivot_col="source", categories=("a",)
        ),
        "group_size_histogram": lambda ds: aggregates.group_size_histogram(
            ds, key_col="lang"
        ),
        "quantile_bucket_assign": lambda ds: aggregates.quantile_bucket_assign(
            ds, id_col="doc_id", val_col="n_chars"
        ),
        "tfidf_top_terms": lambda ds: tfidf.tfidf_top_terms(ds),
        "rare_token_stats": lambda ds: tfidf.rare_token_stats(ds),
        "gram_novelty": lambda ds: filtering.gram_novelty(ds),
        "redact_pii": lambda ds: filtering.redact_pii(ds),
        "repetition_stats": lambda ds: filtering.repetition_stats(ds),
        "token_counts": lambda ds: textstats.token_counts(ds),
        "language_id": lambda ds: textstats.language_id(ds),
        "language_mismatch": lambda ds: textstats.language_mismatch(ds),
        "shard_documents": lambda ds: packing.shard_documents(ds),
        "pack_sequences": lambda ds: packing.pack_sequences(ds),
    }


@pytest.mark.parametrize("name", sorted(_docs_ops()))
def test_document_ops_empty(ray_session, name):
    out = _docs_ops()[name](_empty(DOC_SCHEMA))
    assert out.count() == 0


def test_event_ops_empty(ray_session):
    from fuzzy_matching_ray.extras.relational import funnel_stages, sessionize

    ds = _empty(EVENT_SCHEMA)
    assert funnel_stages(ds).count() == 0
    assert sessionize(ds, key="user_id", ts="ts").count() == 0


def test_transcript_ops_empty(ray_session):
    from fuzzy_matching_ray.extras.transcripts import (
        loop_stats_transcripts,
        tool_stats_transcripts,
        validate_transcripts,
    )

    ds = _empty(TURN_SCHEMA)
    assert validate_transcripts(ds).count() == 0
    assert loop_stats_transcripts(ds).count() == 0
    assert tool_stats_transcripts(ds).count() == 0
