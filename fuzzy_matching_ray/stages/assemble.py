"""Turn table → document table (conversation assembly).

The reference's unit of matching is a flat record; ours is a
*conversation* reassembled from its turns under stable ``turn_idx``
ordering (BASELINE.json ``input_hint``).  This is shuffle #1 of the
pipeline (SURVEY.md §3.4).

Scale design: instead of ``groupby("conv_id").map_groups`` (one Python
call per conversation — millions of tiny groups), we bucket by a hash
of ``conv_id`` into ``num_partitions`` coarse partitions and assemble a
whole bucket at a time with Arrow's C++ hash-group ``list``
aggregation plus a vectorized ``binary_join``.  One shuffle either
way, but there are ZERO Python calls per conversation.

The original per-turn payload (``turn_idx``/``role``/``text``/``tool``)
is carried as list columns so the per-turn text-equality invariant can
re-explode documents exactly (north_rule; see ``explode_docs``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

DOC_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int32()),
        ("doc_text", pa.string()),
        ("turn_idxs", pa.list_(pa.int32())),
        ("roles", pa.list_(pa.string())),
        ("turn_texts", pa.list_(pa.string())),
        ("tools", pa.list_(pa.string())),
        ("min_ts", pa.timestamp("us")),
        ("max_ts", pa.timestamp("us")),
    ]
)


def add_partition_column(batch: pa.Table, num_partitions: int, col: str = "conv_id") -> pa.Table:
    """Stable hash-bucket column used for coarse partitioning (the ONE
    partitioning key reused across stages) — vectorized SipHash over
    the id column (a per-row Python hash loop was the turn table's
    hottest line at 10⁶+ turns)."""
    from fuzzy_matching_ray.stages.grouped import _bucket_of_column

    parts = _bucket_of_column(batch[col], num_partitions)
    return batch.append_column("part", pa.array(parts, pa.int32()))


def _assert_lists_sorted(col: pa.ChunkedArray | pa.ListArray) -> None:
    """Assembly depends on Arrow's hash-group ``list`` aggregation
    accumulating rows in sorted scan order — behavior Arrow does not
    document.  Guard the invariant cheaply (one vectorized diff per
    bucket) so a pyarrow upgrade that scrambles within-group order
    fails loudly instead of silently reordering turns."""
    import numpy as np

    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(la.offsets)
    flat = np.asarray(la.values)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    if flat.size > 1:
        bad = np.flatnonzero(np.diff(flat) <= 0) + 1
        if bad.size and not np.isin(bad, offs[1:-1]).all():
            raise AssertionError(
                "turn_idx list aggregation lost within-group sort order "
                "(pyarrow group_by 'list' no longer preserves scan order)"
            )


def _assemble_bucket(tbl: pa.Table, separator: str) -> pa.Table:
    """Assemble every conversation in one hash bucket — fully
    vectorized Arrow: sort, C++ hash-group ``list`` aggregation
    (accumulation preserves the sorted scan order), and a
    ``binary_join`` kernel for the turn concatenation.  Zero Python
    calls per conversation."""
    import pyarrow.compute as pc

    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    g = tbl.group_by("conv_id", use_threads=False).aggregate(
        [
            ("turn_idx", "list"),
            ("role", "list"),
            ("text", "list"),
            ("tool", "list"),
            ("ts", "min"),
            ("ts", "max"),
            ("turn_idx", "count"),
        ]
    )
    _assert_lists_sorted(g["turn_idx_list"])
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "n_turns": g["turn_idx_count"].cast(pa.int32()),
            "doc_text": pc.binary_join(g["text_list"], separator),
            "turn_idxs": g["turn_idx_list"],
            "roles": g["role_list"],
            "turn_texts": g["text_list"],
            "tools": g["tool_list"],
            "min_ts": g["ts_min"],
            "max_ts": g["ts_max"],
        }
    )


def assemble_documents_from_files(
    files: list[str],
    *,
    separator: str = "\n",
) -> ray.data.Dataset:
    """Shuffle-free assembly for conversation-partitioned parquet files
    (every conversation's turns in exactly ONE file — the hash-sharded
    layout ``datagen.write_transcripts`` produces, and the natural way
    a 100-TB turn corpus is written).

    Each task reads one file and assembles it IN THE SAME UDF — the
    file→document boundary can never be split by Ray's dynamic block
    sizing, so no conversation can straddle tasks (the failure mode
    that killed the block-boundary-trusting variant).  No all-to-all:
    parquet decode, sort, group-aggregate and join all run file-local,
    and downstream canonicalize/hash stages fuse into the same tasks.

    PARTITIONING ASSUMPTION (caller-asserted, like the suffix-array
    channel's bucket locality): a conversation split ACROSS FILES is
    emitted as one document per file.  Equivalence with the generic
    shuffle path on a sharded fixture is pinned in
    ``tests/test_assemble.py``."""
    import ray.data as rd

    def _read_assemble(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = [
            _assemble_bucket(pq.read_table(path), separator)
            for path in batch["path"].to_pylist()
        ]
        return pa.concat_tables(out) if out else DOC_SCHEMA.empty_table()

    paths = rd.from_items(
        [{"path": f} for f in files], override_num_blocks=max(1, len(files))
    )
    return paths.map_batches(
        _read_assemble, batch_size=None, batch_format="pyarrow"
    )


def assemble_documents(
    turns: ray.data.Dataset,
    *,
    separator: str = "\n",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(conv_id, turn_idx, role, text, tool, ts)`` rows →
    one document row per conversation.

    For conversation-partitioned FILES use
    :func:`assemble_documents_from_files` — the shuffle-free fast
    path.  (A Dataset-based "trust the block boundaries" variant was
    tried and removed: ``override_num_blocks`` is a hint, and a split
    file silently assembles a straddling conversation as two
    half-documents — caught by the conv-count invariant at
    scale72000.)"""
    bucketed = turns.map_batches(
        add_partition_column,
        fn_kwargs={"num_partitions": num_partitions},
        batch_format="pyarrow",
    )
    docs = bucketed.groupby("part").map_groups(
        lambda t: _assemble_bucket(t.drop_columns(["part"]), separator),
        batch_format="pyarrow",
    )
    return docs


def explode_docs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Inverse of assembly: document rows → per-turn rows
    ``(conv_id, turn_idx, role, text, tool)``.  Used by the per-turn
    text-equality invariant test."""

    def _explode(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        idxs = batch["turn_idxs"].combine_chunks()
        # repeat each conv_id by its list length, flatten the list
        # columns — all Arrow/numpy kernels, zero per-turn Python
        lens = pc.list_value_length(idxs).to_numpy(zero_copy_only=False)
        rep = pa.array(
            np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens), pa.int64()
        )
        return pa.table(
            {
                "conv_id": batch["conv_id"].take(rep),
                "turn_idx": idxs.flatten().cast(pa.int32()),
                "role": batch["roles"].combine_chunks().flatten(),
                "text": batch["turn_texts"].combine_chunks().flatten(),
                "tool": batch["tools"].combine_chunks().flatten(),
            }
        )

    return docs.map_batches(_explode, batch_format="pyarrow")
