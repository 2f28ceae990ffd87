"""Document canonicalization stage.

Vectorized ``map_batches`` over Arrow batches: NFKC + lowercase +
``ё→е`` + whitespace collapse of ``doc_text`` into ``text_canon``.
Replaces the reference's per-*pair* normalization/transliteration
(``data_matcher.py:331-410``) with a once-per-document pass — the
single biggest algorithmic win over the reference's hot loop
(SURVEY.md §6: transliteration cost it +172–354%).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from fuzzy_matching_ray.config import PipelineConfig
from fuzzy_matching_ray.functions.normalize import canonicalize_column


def canonicalize_documents(
    docs: ray.data.Dataset,
    cfg: PipelineConfig,
    text_col: str = "doc_text",
    out_col: str = "text_canon",
) -> ray.data.Dataset:
    def _canon(batch: pa.Table) -> pa.Table:
        col = canonicalize_column(
            batch[text_col],
            lowercase=cfg.lowercase,
            nfkc=cfg.nfkc,
            collapse_whitespace=cfg.collapse_whitespace,
            fold_yo=cfg.fold_yo,
        )
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.append_column(out_col, col)

    return docs.map_batches(_canon, batch_format="pyarrow")
