"""Driver-side reductions over a *materialized* Dataset's blocks.

A materialized Dataset already holds its blocks in the object store;
``iter_internal_ref_bundles()`` lists their refs without running a new
execution.  Metrics that only need a tiny reduction over those blocks
(a filtered column sum, a projected column gather) are computed here
with small Ray tasks over the existing refs instead of one more
Dataset execution — each avoided execution saves ~1s of fixed
scheduling overhead (see ``state/execmeter.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _to_table(block) -> pa.Table:
    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    return block


def block_refs_of(ds: ray.data.Dataset) -> list:
    return [r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs]


def _sum_where_block(block, value_col: str, eq_col: str, eq_value) -> int:
    t = _to_table(block)
    if t.num_rows == 0 or value_col not in t.column_names:
        return 0
    col = t[value_col]
    if eq_col is not None:
        col = col.filter(pc.equal(t[eq_col], eq_value))
    s = pc.sum(col).as_py()
    return int(s or 0)


def sum_where(
    ds: ray.data.Dataset, value_col: str, eq_col: str | None = None, eq_value=None
) -> int:
    """``sum(value_col) where eq_col == eq_value`` over a materialized
    Dataset, as parallel per-block Ray tasks (no Dataset execution)."""
    remote = ray.remote(num_cpus=0.5)(_sum_where_block)
    refs = [remote.remote(r, value_col, eq_col, eq_value) for r in block_refs_of(ds)]
    return int(sum(ray.get(refs)))


@ray.remote
def _sorted_unique_reduce(col: str, *tables) -> np.ndarray:
    """Sorted unique values of ``col`` across blocks.  0-row blocks
    can arrive schema-less — skip them (the subtle guard every
    broadcast-set build needs; keep ONE copy of it)."""
    arrs = []
    for t in tables:
        tab = _to_table(t)
        if tab.num_rows and col in tab.schema.names:
            arrs.append(tab[col].to_numpy(zero_copy_only=False))
    return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.uint64)


def sorted_unique_broadcast(ds: ray.data.Dataset, col: str) -> "ray.ObjectRef":
    """ObjectRef of the sorted unique ``col`` values of ``ds`` —
    reduced in ONE remote task whose return value IS the broadcast
    object (the driver only ever holds the ref).  The shared shape
    behind every broadcast-membership probe: decontamination bench
    sets, incremental-dedup base membership, composed near-dup drops."""
    blocks = ds.materialize().to_arrow_refs()
    return _sorted_unique_reduce.remote(col, *blocks)


def _gather_block(block, col: str) -> list:
    t = _to_table(block)
    if t.num_rows == 0 or col not in t.column_names:
        return []
    return t[col].to_pylist()


def gather_column(ds: ray.data.Dataset, col: str) -> list:
    """All values of one column of a materialized Dataset, gathered to
    the driver via per-block projection tasks (only the projected
    column ships back).  For *small* results (edge lists, dup-id sets)
    — not a corpus-scale collect."""
    remote = ray.remote(num_cpus=0.5)(_gather_block)
    out: list = []
    for part in ray.get([remote.remote(r, col) for r in block_refs_of(ds)]):
        out.extend(part)
    return out
