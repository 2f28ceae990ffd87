"""Sequence packing for training-data preparation.

``pack_sequences`` implements the GPT-style concat-and-chunk layout:
documents are laid end-to-end in a deterministic order and the stream
is cut into fixed ``budget``-token packs; a document may straddle a
pack boundary (exactly like block-packed pretraining corpora).

Distribution: the corpus is split into ``num_shards`` deterministic
shards (``doc_id % num_shards``); the layout is defined PER SHARD, so
every shard packs independently in parallel after one co-partitioning
shuffle, and adding shards scales the operator linearly.  Within a
shard the order is ``doc_id`` ascending — a pure function of the
data, so the layout is reproducible anywhere (the DuckDB oracle
mirrors it with a window cumsum; everything is integer arithmetic).

Output, one row per document: ``(doc_id, shard, seq_start,
pack_first, pack_last)`` where ``seq_start`` is the document's token
offset in its shard's stream and ``pack_first``/``pack_last`` are the
pack indices its tokens touch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.stages.grouped import bucketed_group_apply


def shard_documents(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    n_shards: int = 64,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Deterministic training-shard layout: ``(id, shard, pos)`` where
    ``shard = md5_word(id) % n_shards`` and ``pos`` is the 0-based
    rank within the shard ordered by ``(md5_word, id)`` — a
    content-addressed global shuffle that is a pure function of the
    ids: stable across runs, partitionings, and engines (SQL mirror:
    hex-prefix cast + ``row_number``), unlike seeded
    ``random_shuffle``, and resumable per shard by construction.

    One bucketed exchange carrying ``(id, word)`` pairs; the
    per-bucket kernel is one sort + cumcount.  Ordering uses only the
    first digest word with the id as tiebreak, so equal-word
    collisions (~n²/2³³) stay deterministic."""
    from fuzzy_matching_ray.hashing import md5_first_word

    def _prep(b: pa.Table) -> pa.Table:
        w = md5_first_word(b[id_col].to_pylist())
        return pa.table(
            {
                id_col: b[id_col],
                "shard": pa.array((w % np.uint32(n_shards)).astype(np.int64), pa.int64()),
                "_w": pa.array(w.astype(np.int64), pa.int64()),
            }
        )

    slim = ds.select_columns([id_col]).map_batches(_prep, batch_format="pyarrow")

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shard", "_w", id_col], kind="mergesort")
        pos = df.groupby("shard", sort=False).cumcount()
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shard": df["shard"].to_numpy(np.int64),
                "pos": pos.to_numpy(np.int64),
            }
        )

    return bucketed_group_apply(slim, "shard", _rank, min(num_partitions, n_shards))


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_shards: int = 64,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Whitespace-token concat-and-chunk packing (see module doc)."""

    def _prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.count_substring_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\S+"
        ).cast(pa.int64())
        ids_arr = b[id_col].cast(pa.int64())
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": ids_arr,
                "shard": pa.array(ids_np % num_shards, pa.int64()),
                "n_tokens": toks,
            }
        )

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "shard": pd.Series(dtype="int64"),
                    "seq_start": pd.Series(dtype="int64"),
                    "pack_first": pd.Series(dtype="int64"),
                    "pack_last": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["shard", "doc_id"], kind="mergesort")
        n = df["n_tokens"].to_numpy()
        shard = df["shard"].to_numpy()
        cum = np.cumsum(n) - n
        # restart the stream offset at each shard boundary
        newsh = np.r_[True, shard[1:] != shard[:-1]]
        starts = np.flatnonzero(newsh)
        counts = np.diff(np.append(starts, len(df)))
        base = np.repeat(cum[starts], counts)
        start = cum - base
        first = start // budget
        # empty docs occupy zero tokens: they "touch" only the pack at
        # their offset (last == first)
        last = np.where(n > 0, (start + n - 1) // budget, first)
        return pd.DataFrame(
            {
                id_col: df["doc_id"].to_numpy(),
                "shard": shard,
                "seq_start": start,
                "pack_first": first,
                "pack_last": last,
            }
        )

    slim = ds.map_batches(_prep, batch_format="pyarrow")
    return bucketed_group_apply(slim, "shard", _pack, num_partitions)
