"""Source/sink facade.

Covers the reference's IO surface (SURVEY.md §2.1): CSV/JSON readers
with column rename/merge (``core/data_matcher.py:65-114``), writers
(``:116-168``), and format-by-extension dispatch (``api.py:148-181``) —
re-expressed as thin wrappers over ``ray.data.read_parquet`` /
``read_csv`` / ``read_json`` with a vectorized Arrow projection stage
instead of per-row dict rewriting.  Parquet is the primary format.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _rename_project(batch: pa.Table, name_fields: dict[str, str]) -> pa.Table:
    """Rename/merge columns per a ``{source: target}`` mapping and strip
    every string cell — the reference's load-time projection
    (``data_matcher.py:78-84``).  When several source columns map to the
    same target, values are concatenated with a single space
    (``data_matcher.py:81-84``)."""
    targets: dict[str, list[pa.ChunkedArray]] = {}
    for src in batch.column_names:
        tgt = name_fields.get(src, src)
        targets.setdefault(tgt, []).append(batch[src])
    cols: dict[str, pa.Array] = {}
    for tgt, parts in targets.items():
        strs = [
            pc.utf8_trim_whitespace(p.cast(pa.string()))
            if pa.types.is_string(p.type) or pa.types.is_large_string(p.type)
            else p
            for p in parts
        ]
        if len(strs) == 1:
            cols[tgt] = strs[0]
        else:
            merged = strs[0]
            for nxt in strs[1:]:
                merged = pc.binary_join_element_wise(
                    merged.cast(pa.string()), nxt.cast(pa.string()), " "
                )
            cols[tgt] = merged
    return pa.table(cols)


def strip_schema_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop Arrow schema metadata from every block (a metadata-only,
    zero-copy map that fuses with downstream stages).  Parquet files
    written by pandas carry a ``pandas`` schema-metadata blob, and
    ``pa.Schema.__hash__`` RAISES on schemas with metadata — so every
    shuffle reduce over such blocks logs Ray's "Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'" warning."""

    def _strip(batch: pa.Table) -> pa.Table:
        return batch.replace_schema_metadata(None)

    return ds.map_batches(_strip, batch_format="pyarrow")


def load_dataset(
    path: str,
    file_format: str | None = None,
    name_fields: dict[str, str] | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Format-dispatching reader (reference ``api.load_dataset``,
    ``api.py:148-181``).  Prunes ``columns`` at the read for Parquet."""
    fmt = (file_format or os.path.splitext(path)[1].lstrip(".")).lower()
    if fmt in ("parquet", "pq"):
        ds = strip_schema_metadata(ray.data.read_parquet(path, columns=columns))
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
    elif fmt == "json":
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")
    if name_fields:
        ds = ds.map_batches(
            _rename_project,
            fn_kwargs={"name_fields": name_fields},
            batch_format="pyarrow",
        )
    return ds


def write_dataset(ds: ray.data.Dataset, path: str, file_format: str = "parquet") -> None:
    """Partitioned sink (reference writers S3-S6 → ``write_parquet``)."""
    fmt = file_format.lower()
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "json":
        ds.write_json(path)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")
