"""Text-analysis operators over document tables (training-data
pipeline components; no reference equivalent — built to the brief).

All are stateless, vectorized ``map_batches`` stages.  The counting
operators are defined with *integer* outputs and tokenization rules
that an ANSI-SQL oracle can reproduce exactly (see
``__ray_entry__.oracle_sql``), so the driver's value-hash comparison
is float-free.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# --- token counting --------------------------------------------------------

_WS_TOKEN = re.compile(r"\s+")
_BPEISH = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def token_counts(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Per-document token counts: whitespace tokens and a BPE-ish
    regex tokenization (``\\w+|[^\\w\\s]``), plus char count."""

    def _counts(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ws = np.fromiter(
            (len([t for t in _WS_TOKEN.split(s.strip()) if t]) if s else 0 for s in texts),
            dtype=np.int64,
            count=len(texts),
        )
        bpe = np.fromiter(
            (len(_BPEISH.findall(s)) if s else 0 for s in texts), dtype=np.int64, count=len(texts)
        )
        n_chars = pc.utf8_length(batch[text_col]).cast(pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(ws, pa.int64()),
                "n_tokens_bpe": pa.array(bpe, pa.int64()),
                "n_chars_calc": n_chars,
            }
        )

    return ds.map_batches(_counts, batch_format="pyarrow")


# --- quality scoring -------------------------------------------------------

_PUNCT = re.compile(r"[^A-Za-z0-9\s]")
_DIGIT = re.compile(r"[0-9]")
_UPPER = re.compile(r"[A-Z]")

# small multilingual stopword sets for the language-ID heuristic
_STOPWORDS = {
    "en": {"the", "of", "and", "a", "to", "in", "is", "it", "that", "for", "with", "on", "as"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "du"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "para", "en", "del"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "mit", "für", "auf", "den"},
    "ru": {"и", "в", "не", "на", "что", "с", "по", "это", "как", "его", "для"},
}


def quality_frame(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Batch kernel behind :func:`quality_stats` — module-level so
    composed pipelines (``extras.curate``) can fuse it into their own
    passes without re-stating the metric definitions."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    punct = np.empty(n, dtype=np.int64)
    digit = np.empty(n, dtype=np.int64)
    upper = np.empty(n, dtype=np.int64)
    toks = np.empty(n, dtype=np.int64)
    for i, s in enumerate(texts):
        s = s or ""
        punct[i] = len(_PUNCT.findall(s))
        digit[i] = len(_DIGIT.findall(s))
        upper[i] = len(_UPPER.findall(s))
        toks[i] = len([t for t in _WS_TOKEN.split(s.strip()) if t])
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars_calc": pc.utf8_length(batch[text_col]).cast(pa.int64()),
            "n_punct": pa.array(punct, pa.int64()),
            "n_digits": pa.array(digit, pa.int64()),
            "n_upper": pa.array(upper, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
        }
    )


def quality_stats(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Integer quality metrics per document: char/punct/digit/upper
    counts and whitespace token count — the inputs to any downstream
    quality filter, kept integer-valued for oracle parity."""
    return ds.map_batches(
        lambda b: quality_frame(b, id_col, text_col), batch_format="pyarrow"
    )


def langid_frame(batch: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Batch kernel behind :func:`language_id` (module-level for the
    same composability reason as :func:`quality_frame`): CJK chars →
    zh; Cyrillic-dominant → ru; else first-wins argmax of
    distinct-token stopword hits over {en, fr, es, de}, 'und' if 0.

    Fully vectorized (pandas str kernels + one explode/isin/groupby per
    language) — semantics identical to the per-row formulation and to
    the DuckDB oracle (``__ray_entry__.oracle_sql()['langid_documents']``)."""
    ser = batch[text_col].fillna("").astype(str).reset_index(drop=True)
    zh = ser.str.slice(0, 400).str.contains("[一-鿿]", regex=True)
    head = ser.str.slice(0, 2000)
    n_alpha = head.str.count(r"[^\W\d_]")
    n_cyr = head.str.count("[а-яА-Я]")
    ru = (n_alpha > 0) & (n_cyr > 0.5 * n_alpha)

    ex = ser.str.lower().str.split().explode()
    tok = pd.DataFrame({"i": ex.index, "t": ex.to_numpy()}).drop_duplicates()
    hits = {}
    for lang in ("en", "fr", "es", "de"):
        m = tok["t"].isin(_STOPWORDS[lang])
        hits[lang] = (
            tok.loc[m].groupby("i").size().reindex(ser.index, fill_value=0).to_numpy()
        )
    h_en, h_fr, h_es, h_de = hits["en"], hits["fr"], hits["es"], hits["de"]
    pred = np.select(
        [
            zh.to_numpy(),
            ru.to_numpy(),
            (h_en == 0) & (h_fr == 0) & (h_es == 0) & (h_de == 0),
            (h_en >= h_fr) & (h_en >= h_es) & (h_en >= h_de),
            (h_fr >= h_es) & (h_fr >= h_de),
            h_es >= h_de,
        ],
        ["zh", "ru", "und", "en", "fr", "es"],
        default="de",
    )
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "lang_pred": pred})


def language_id(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Stopword/char-class language-ID heuristic (see
    :func:`langid_frame` for the exact rules)."""
    return ds.map_batches(
        lambda b: langid_frame(b, id_col, text_col), batch_format="pandas"
    )


def language_mismatch(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    declared_col: str = "lang",
) -> ray.data.Dataset:
    """Metadata-validation pass: detected language vs the declared
    ``lang`` column — ``(doc_id, lang, lang_pred, agree)``.  Web
    corpora carry unreliable language metadata; this is the audit
    view curation uses to decide whether to trust it.  Zero shuffles
    (the detector is per-batch vectorized)."""

    def _check(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        out = langid_frame(batch, id_col, text_col)
        declared = batch[declared_col].fillna("").astype(str)
        out[declared_col] = declared.to_numpy(dtype=object)
        out["agree"] = (
            (out[declared_col] == out["lang_pred"]).to_numpy().astype(np.int64)
        )
        return out[[id_col, declared_col, "lang_pred", "agree"]]

    return ds.map_batches(_check, batch_format="pandas")


# --- document fingerprinting ----------------------------------------------


class FingerprintStage:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-gram rolling hashes, minimum per sliding window — an actor-pool
    stage (window/k fixed per actor)."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fuzzy_matching_ray.hashing import codepoints, _splitmix64, _POLY_BASE

        ids = batch["doc_id"] if "doc_id" in batch.column_names else batch[batch.column_names[0]]
        texts = batch["text"].to_pylist()
        n_fp = np.empty(len(texts), dtype=np.int64)
        fp_min = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            t = t or ""
            cps = codepoints(t)
            if cps.size < self.k:
                n_fp[i] = 0
                fp_min[i] = 0
                continue
            # ordered k-gram hashes (not unique — winnowing needs positions)
            m = cps.size - self.k + 1
            with np.errstate(over="ignore"):
                acc = np.zeros(m, dtype=np.uint64)
                powers = np.empty(self.k, dtype=np.uint64)
                powers[-1] = np.uint64(1)
                for j in range(self.k - 2, -1, -1):
                    powers[j] = powers[j + 1] * _POLY_BASE
                for j in range(self.k):
                    acc = acc + cps[j : j + m] * powers[j]
            hashes = _splitmix64(acc)
            if m <= self.window:
                sel = np.array([hashes.argmin()])
            else:
                # sliding-window minima via stride tricks
                sw = np.lib.stride_tricks.sliding_window_view(hashes, self.window)
                sel = np.unique(sw.argmin(axis=1) + np.arange(sw.shape[0]))
            fps = np.unique(hashes[sel])
            n_fp[i] = fps.size
            fp_min[i] = fps.min() if fps.size else 0
        return pa.table(
            {
                "doc_id": ids,
                "n_fingerprints": pa.array(n_fp, pa.int64()),
                "fingerprint_min": pa.array(fp_min, pa.uint64()),
            }
        )


def fingerprints(ds: ray.data.Dataset, k: int = 8, window: int = 16) -> ray.data.Dataset:
    # fixed cluster-clamped pool (an autoscaling (1,N) pool ramps from
    # one actor and leaves the stage serial for most of its life; a
    # hard cap of 4 starves big clusters — see stages/grouped.sized_pool)
    from fuzzy_matching_ray.stages.grouped import sized_pool

    try:
        n_docs = ds.count()
    except Exception:
        n_docs = None
    pool = sized_pool(32, n_docs, 2000)
    return ds.map_batches(
        FingerprintStage,
        fn_constructor_args=(k, window),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=pool,
        num_cpus=1,
    )
