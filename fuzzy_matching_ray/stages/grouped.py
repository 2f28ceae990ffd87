"""Bucketed grouped-apply: the scale-safe alternative to per-group
``map_groups``.

``ds.groupby(key).map_groups(fn)`` costs one Python call per *group*;
with millions of tiny groups (per-document hashes, per-pair keys,
per-node labels) that Python overhead dominates the stage.  Instead we
hash the key into ``num_partitions`` coarse buckets, shuffle once on
the bucket id, and hand each bucket to a *vectorized* pandas callback
that processes all of its groups at once (``df.groupby`` /
``drop_duplicates`` / ``merge`` inside).  Same single shuffle, O(P)
Python calls instead of O(groups).

Bucket ids must be stable across processes: strings are hashed with
``pandas.util.hash_array`` (fixed-key SipHash, process-stable);
integer keys are already uniform hashes and are bucketed by modulo.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

PART_COL = "__part"


def sized_pool(ceiling: int, n_units: int | None, units_per_actor: int) -> int:
    """Actor-pool size clamped to cluster CPUs (minus shuffle headroom)
    AND data volume.  The data floor never exceeds the CPU clamp — a
    fixed pool larger than the cluster deadlocks waiting for actors
    that can never get a CPU."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = max(1, min(ceiling, ncpu - 2))
    if n_units is not None:
        pool = max(1, min(pool, n_units // units_per_actor + 1))
    return pool


def sized_partitions(num_partitions: int, n_rows: int | None, rows_per_partition: int = 200_000) -> int:
    """Partition count clamped to data volume (oversized P makes every
    grouped round pay sort/task overhead proportional to P)."""
    if n_rows is None:
        return num_partitions
    return max(8, min(num_partitions, n_rows // rows_per_partition + 8))


def _bucket_of_column(col: pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        return (vals % np.uint64(num_partitions)).astype(np.int32)
    arr = np.asarray(col.to_pylist(), dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_partitions)).astype(np.int32)


def add_bucket_column(
    ds: ray.data.Dataset, key: str, num_partitions: int
) -> ray.data.Dataset:
    def _add(batch: pa.Table) -> pa.Table:
        b = _bucket_of_column(batch[key], num_partitions)
        # drop schema metadata (parquet files carry a `pandas` blob):
        # pa.Schema.__hash__ RAISES on schemas with metadata, which
        # makes Ray's shuffle-reduce schema dedup warn on every reduce
        # task ("Failed to hash the schemas: unhashable type: 'dict'")
        batch = batch.replace_schema_metadata(None)
        return batch.append_column(PART_COL, pa.array(b, pa.int32()))

    return ds.map_batches(_add, batch_format="pyarrow")


def bucketed_group_apply(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Shuffle on ``hash(key) % P`` and apply ``fn`` to each bucket's
    full DataFrame (bucket column already dropped).  ``fn`` must be
    vectorized over the groups inside the bucket."""
    bucketed = add_bucket_column(ds, key, num_partitions)

    def _apply(df: pd.DataFrame):
        out = fn(df.drop(columns=[PART_COL]))
        # emit Arrow blocks when cleanly convertible: downstream stages
        # consume zero-copy, unions never mix block types, and Ray's
        # schema bookkeeping stops warning about pandas metadata.
        # Frames with exotic object columns (nested lists etc.) stay
        # pandas.
        try:
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
                None
            )
        except Exception:
            return out

    return bucketed.groupby(PART_COL).map_groups(_apply, batch_format="pandas")
