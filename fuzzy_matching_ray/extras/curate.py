"""End-to-end document curation: the composed filter→dedup→sample
pipeline a training-data run applies before tokenization.

One fused ``map_batches`` pass computes quality metrics and language
ID and drops failing rows (so rejected documents never reach the
shuffle), then one bucketed shuffle deduplicates exact text, then a
deterministic content-addressed sample picks the output fraction.
Every stage is SQL-expressible, so the WHOLE composition has an exact
DuckDB oracle (``__ray_entry__.oracle_sql()['curate_documents']``) —
the point is verifying stage *composition*, not just stages.

Scale shape: the fused filter is embarrassingly parallel and
typically removes most rows before the only shuffle; the dedup
shuffle keys on the text hash (uniform); the sample is a pure
per-row hash predicate.  Nothing materializes on the driver.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from fuzzy_matching_ray.extras.textstats import langid_frame, quality_frame
from fuzzy_matching_ray.stages.exact_dedup import add_text_hash
from fuzzy_matching_ray.stages.grouped import bucketed_group_apply


def curate_documents(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct_per_5_chars: int = 1,
    lang: str = "en",
    sample_hex: str = "aa",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Keep documents that (a) have ≥ ``min_tokens`` whitespace
    tokens, (b) have punctuation ratio ≤ 1/5 (``n_punct * 5 <=
    n_chars`` with the default knob), (c) language-ID to ``lang``,
    then (d) exact-dedup identical texts (min id survives), and
    (e) hash-sample survivors by md5 prefix.  Output:
    ``(doc_id, n_tokens)``."""

    def _filter(batch: pa.Table) -> pa.Table:
        q = quality_frame(batch, id_col, text_col)
        n_tokens = q["n_tokens"].to_numpy()
        n_punct = q["n_punct"].to_numpy()
        n_chars = q["n_chars_calc"].to_numpy()
        keep = (n_tokens >= min_tokens) & (
            n_punct * 5 <= n_chars * max_punct_per_5_chars
        )
        sub = batch.filter(pa.array(keep))
        nt = n_tokens[keep]
        if sub.num_rows:
            m = (
                langid_frame(sub.to_pandas(), id_col, text_col)["lang_pred"] == lang
            ).to_numpy()
            sub = sub.filter(pa.array(m))
            nt = nt[m]
        return pa.table(
            {
                id_col: sub[id_col],
                text_col: sub[text_col],
                "n_tokens": pa.array(nt, pa.int64()),
            }
        )

    filtered = ds.map_batches(_filter, batch_format="pyarrow").map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow"
    )

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_sha256", id_col], kind="mergesort")
        return df[~df["text_sha256"].duplicated()][[id_col, "n_tokens"]]

    deduped = bucketed_group_apply(filtered, "text_sha256", _first, num_partitions)

    from fuzzy_matching_ray.extras.relational import hash_sample

    return hash_sample(deduped, id_col=id_col, cols=(id_col, "n_tokens"), hex_threshold=sample_hex)
