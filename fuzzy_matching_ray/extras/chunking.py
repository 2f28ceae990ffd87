"""Sliding-window document chunking (RAG / embedding-prep layout).

``chunk_documents`` splits each document into overlapping fixed-size
word windows with stable ``(doc_id, chunk_idx)`` identities — the
standard retrieval-corpus preparation step before embedding.  The
kernel is fully vectorized: tokens are exploded once per batch, chunk
membership is pure index arithmetic (``np.repeat`` + offset ramps),
and the chunk texts are materialized by ONE Arrow C-level
``binary_join_element_wise``-style list join (``pc.binary_join`` over
a ``ListArray`` built from offsets) — no per-chunk Python string
joins.  Chunk rule (mirrored exactly by the SQL oracle): window
starts at token offsets ``0, stride, 2·stride, …`` while the start is
inside the document; each chunk takes ``min(window, n - start)``
tokens; empty documents emit no chunks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    window: int = 32,
    stride: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-chunk rows ``(doc_id, chunk_idx, n_tokens, chunk_text)``."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def _chunk(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tokens = texts.fillna("").str.strip().str.split()
        lens = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
        empty_out = pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        if lens.sum() == 0:
            return empty_out
        flat = pa.array(tokens.explode().dropna().to_numpy(dtype=object), pa.string())
        doc_tok_start = np.concatenate([[0], np.cumsum(lens)[:-1]])

        # chunk starts: 0, stride, ... while start < n (per doc)
        n_chunks = np.where(lens > 0, (lens - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty_out
        doc_of = np.repeat(np.arange(lens.size), n_chunks)
        # chunk_idx within its doc: a 0..n_chunks-1 ramp per doc
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
        start = chunk_idx * stride
        take = np.minimum(window, lens[doc_of] - start)

        # token gather indices: for chunk c, tokens [start, start+take)
        tok_first = np.concatenate([[0], np.cumsum(take)[:-1]])
        ramp = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(tok_first, take)
        gather = np.repeat(doc_tok_start[doc_of] + start, take) + ramp

        values = pc.take(flat, pa.array(gather, pa.int64()))
        offsets = pa.array(np.concatenate([[0], np.cumsum(take)]), pa.int32())
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(offsets, values), " "
        )
        return pa.table(
            {
                id_col: pa.array(ids[doc_of]).cast(batch[id_col].type),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "n_tokens": pa.array(take.astype(np.int64), pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(_chunk, batch_format="pyarrow")
