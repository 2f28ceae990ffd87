"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on synthetic
transcripts at sf0.001 scale.  ``queries()`` exposes every implemented
operator/pipeline (SURVEY.md §2 + the training-data extras);
``oracle_sql()`` gives DuckDB oracles for the SQL-expressible ones.
Column names and integer-valued contracts are aligned between the Ray
code and the SQL so the driver's order-insensitive value-hash matches.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in these call paths.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# transcripts scale per test-data scale factor (the transcripts table is
# ours to synthesize — BASELINE.json input_hint; deterministic, cached)
_SF_CONVS = {"sf0.001": 100, "sf0.01": 800, "sf0.1": 6000}
_CACHE_ROOT = "/tmp/fmr_cache"


def _transcripts_dir(sf_dir: str) -> str:
    import re

    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts

    sf = os.path.basename(os.path.normpath(sf_dir))
    m = re.fullmatch(r"scale(\d+)", sf)
    n = int(m.group(1)) if m else _SF_CONVS.get(sf, 200)
    out = os.path.join(_CACHE_ROOT, f"transcripts_{sf}")
    return write_transcripts(out, TranscriptGenConfig(n_convs=n, seed=42))


def _ensure_oracle_fixtures() -> None:
    """Pre-write the deterministic fixtures the sf0.01 DuckDB oracles
    read (``fixtures.py``): the oracle SQL may run before or after the
    Ray query, and both must see identical files.  Pure numpy/pyarrow —
    no Ray."""
    from fuzzy_matching_ray import fixtures

    _transcripts_dir("/root/testdata/sf0.01")
    fixtures.ensure_person_fixtures("sf0.01")
    fixtures.ensure_translit_fixtures()
    fixtures.ensure_flagship_golden("sf0.01", _SF_CONVS["sf0.01"])
    fixtures.ensure_simhash_golden("sf0.01", _SF_CONVS["sf0.01"])
    fixtures.ensure_substring_golden("sf0.01", _SF_CONVS["sf0.01"])
    fixtures.ensure_fingerprint_golden("/root/testdata/sf0.01")
    fixtures.ensure_ann_golden("/root/testdata/sf0.01")
    fixtures.ensure_hll_golden("/root/testdata/sf0.01")
    fixtures.ensure_ddq_golden("/root/testdata/sf0.01")
    fixtures.ensure_kmeans_golden("/root/testdata/sf0.01")


try:  # never let fixture generation break module import...
    _ensure_oracle_fixtures()
except Exception as _fixture_exc:  # pragma: no cover
    # ...but say WHY it failed: a silent pass here surfaces later as an
    # opaque oracle read error on stale/missing fixture files
    import traceback

    print(
        "[__ray_entry__] fixture pre-generation failed "
        f"(oracles may read stale files): {_fixture_exc!r}"
    )
    traceback.print_exc()


def _read(sf_dir: str, table: str):
    import ray.data as rd

    from fuzzy_matching_ray.sources.io import strip_schema_metadata

    # metadata-strip at the read boundary: parquet `pandas` schema
    # metadata makes pa.Schema unhashable, which floods every shuffle
    # reduce with Ray's schema-dedup warning
    return strip_schema_metadata(rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet")))


def _pipeline_cfg() -> "Any":
    import ray

    from fuzzy_matching_ray.config import PipelineConfig

    # push-based shuffle moves the sort exchange's coordination off
    # the driver (in-session A/B: candidate-pair stage 4.7s → 3.8s at
    # 32 CPUs, same pair set) — set on the global context, which is
    # where Ray keeps this knob
    try:
        from ray.data import DataContext

        DataContext.get_current().use_push_based_shuffle = True
    except Exception:
        pass
    # partition count is purely physical (every grouped stage is
    # deterministic per key), so scale it with the cluster: a fixed
    # small P caps shuffle parallelism at P tasks no matter how many
    # CPUs exist
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return PipelineConfig(num_partitions=max(16, 2 * ncpu))


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale transcripts → clusters."""
    import ray.data as rd

    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    turns = rd.read_parquet(_transcripts_dir("/root/testdata/sf0.001"))
    res = dedup_transcripts(turns, _pipeline_cfg())
    return res.clusters


# ---------------------------------------------------------------------------
# query implementations


def _ensure_golden(sf_dir: str) -> None:
    """Idempotent (marker-cached) brute-force golden for the flagship
    oracles — belt-and-braces in case the import-time ensure was
    skipped."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf == "sf0.01":  # the driver's oracle-compare scale; brute
        # force at larger SFs would be quadratic for nothing
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_flagship_golden(sf, _SF_CONVS[sf])


# one flagship run serves clusters/reps/sizes: the three queries are
# different VIEWS of the same deterministic result, so the harness
# shouldn't pay three pipeline executions (results are materialized
# datasets; keyed per sf_dir within this process)
_FLAGSHIP_CACHE: dict = {}


def _flagship_result(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    res = _FLAGSHIP_CACHE.get(sf_dir)
    if res is None:
        _ensure_golden(sf_dir)
        turns = rd.read_parquet(_transcripts_dir(sf_dir))
        res = _FLAGSHIP_CACHE[sf_dir] = dedup_transcripts(turns, _pipeline_cfg())
    return res


def _q_dedup_minhash_clusters(sf_dir: str):
    return _flagship_result(sf_dir).clusters


def _q_dedup_cluster_reps(sf_dir: str):
    return _flagship_result(sf_dir).representatives


def _q_dedup_cluster_sizes(sf_dir: str):
    """Cluster-size distribution of the flagship output — the dedup
    reporting view (how much mass sits in big near-dup families).
    Oracle: the same histogram over the brute-force golden clusters."""
    from fuzzy_matching_ray.extras.aggregates import group_size_histogram

    clusters = _flagship_result(sf_dir).clusters
    return group_size_histogram(
        clusters, key_col="cluster_id", size_name="cluster_size", count_name="n_clusters"
    )


def _q_dedup_resalt_clusters(sf_dir: str):
    """Flagship pipeline with hot_bucket_mode='resalt' (hot LSH buckets
    re-banded by extra signature rows instead of budget-chunked) — must
    reproduce the same brute-force all-pairs golden clusters: re-salting
    may only re-route candidate generation, never change which pairs
    the exact verifier accepts."""
    import dataclasses

    import ray.data as rd

    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    _ensure_golden(sf_dir)
    turns = rd.read_parquet(_transcripts_dir(sf_dir))
    cfg = dataclasses.replace(_pipeline_cfg(), hot_bucket_mode="resalt")
    return dedup_transcripts(turns, cfg).clusters


def _q_dedup_simhash_clusters(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_simhash_golden(sf, _SF_CONVS[sf])
    turns = rd.read_parquet(_transcripts_dir(sf_dir))
    return dedup_transcripts(turns, _pipeline_cfg(), channels=("simhash",)).clusters


# the substring channel is bucket-local BY DESIGN (its documented
# partitioning assumption, stages/suffix_array.py) — the edge set
# therefore depends on the partition count, so the query pins it to a
# fixed value the serial golden replicates instead of scaling it with
# the cluster CPU count
_SUBSTRING_QUERY_PARTITIONS = 32


def _q_substring_pairs(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_substring_golden(
            sf, _SF_CONVS[sf], num_partitions=_SUBSTRING_QUERY_PARTITIONS
        )
    turns = rd.read_parquet(_transcripts_dir(sf_dir))
    cfg = PipelineConfig(num_partitions=_SUBSTRING_QUERY_PARTITIONS)
    res = dedup_transcripts(turns, cfg, channels=("minhash", "substring"))
    return res.edges


def _q_assemble_docs(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray.stages.assemble import assemble_documents

    turns = rd.read_parquet(_transcripts_dir(sf_dir))
    docs = assemble_documents(turns, num_partitions=8)
    return docs.map_batches(
        lambda b: pa.table(
            {
                "conv_id": b["conv_id"],
                "n_turns": b["n_turns"],
                "n_chars": pa.compute.utf8_length(b["doc_text"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_record_match(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray import fixtures
    from fuzzy_matching_ray.pipelines.record_match import match_records

    sf = os.path.basename(os.path.normpath(sf_dir))
    paths = fixtures.ensure_person_fixtures(sf)
    cfg = fixtures._match_config()
    return match_records(
        rd.read_parquet(paths["originals"]), rd.read_parquet(paths["variants"]), cfg
    )


def _q_transliterate(sf_dir: str):
    import ray.data as rd

    from fuzzy_matching_ray import fixtures
    from fuzzy_matching_ray.pipelines.record_match import transliterate_dataset

    paths = fixtures.ensure_translit_fixtures()
    ds = rd.read_parquet(paths["originals"])
    return transliterate_dataset(ds, "en", ["last_name", "first_name", "middle_name"])


def _q_exact_dedup_documents(sf_dir: str):
    from fuzzy_matching_ray.extras.doc_dedup import exact_dedup_docs

    return exact_dedup_docs(_read(sf_dir, "documents"))


def _q_token_count(sf_dir: str):
    from fuzzy_matching_ray.extras.textstats import token_counts

    return token_counts(_read(sf_dir, "documents"))


def _q_quality_stats(sf_dir: str):
    from fuzzy_matching_ray.extras.textstats import quality_stats

    return quality_stats(_read(sf_dir, "documents"))


def _q_langid(sf_dir: str):
    from fuzzy_matching_ray.extras.textstats import language_id

    return language_id(_read(sf_dir, "documents"))


def _q_fingerprints(sf_dir: str):
    from fuzzy_matching_ray.extras.textstats import fingerprints

    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_fingerprint_golden(sf_dir)
    return fingerprints(_read(sf_dir, "documents"))


def _q_ngram_jaccard(sf_dir: str):
    from fuzzy_matching_ray.extras.doc_dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(sf_dir, "documents"), min_ratio_pct=30)


def _q_minhash_dedup_documents(sf_dir: str):
    from fuzzy_matching_ray.extras.doc_dedup import minhash_dedup_docs

    return minhash_dedup_docs(_read(sf_dir, "documents"))


def _q_dedup_rate_by_source(sf_dir: str):
    """Per-source dedup dashboard: cluster labels attach to the source
    column via the native hash join, then combiner-first group counts."""
    from fuzzy_matching_ray.extras.doc_dedup import dedup_rate_by_group

    return dedup_rate_by_group(_read(sf_dir, "documents"), group_col="source")


def _q_dedup_best_reps(sf_dir: str):
    """Quality-first consolidation (the reference's select_cleaner_record
    generalized to clusters): longest member survives, ties to min id."""
    from fuzzy_matching_ray.extras.doc_dedup import cluster_best_representatives

    return cluster_best_representatives(_read(sf_dir, "documents"))


def _q_embedding_cosine_pairs(sf_dir: str):
    from fuzzy_matching_ray.extras.doc_dedup import embedding_cosine_pairs

    return embedding_cosine_pairs(_read(sf_dir, "embeddings"), threshold=0.3)


def _q_embedding_dedup_clusters(sf_dir: str):
    from fuzzy_matching_ray.extras.doc_dedup import embedding_dedup_clusters

    return embedding_dedup_clusters(_read(sf_dir, "embeddings"), threshold=0.3)


def _q_knn_bruteforce(sf_dir: str):
    import pyarrow.parquet as pq

    from fuzzy_matching_ray.extras.ann import knn_bruteforce

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.slice(0, 10)
    qids = head["vec_id"].to_pylist()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()])
    ds = _read(sf_dir, "embeddings")
    return knn_bruteforce(ds, qmat, qids, k=5)


def _q_knn_lsh(sf_dir: str):
    import pyarrow.parquet as pq

    from fuzzy_matching_ray.extras.ann import knn_lsh

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_ann_golden(sf_dir)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.slice(0, 10)
    qids = head["vec_id"].to_pylist()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()])
    ds = _read(sf_dir, "embeddings")
    return knn_lsh(ds, qmat, qids, k=5)


def _q_knn_ivf(sf_dir: str):
    import pyarrow.parquet as pq

    from fuzzy_matching_ray.extras.ann import knn_ivf

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_ann_golden(sf_dir)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.slice(0, 10)
    qids = head["vec_id"].to_pylist()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()])
    ds = _read(sf_dir, "embeddings")
    return knn_ivf(ds, qmat, qids, k=5)


def _q_kmeans_embeddings(sf_dir: str):
    from fuzzy_matching_ray.extras.kmeans import kmeans_embeddings

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_kmeans_golden(sf_dir)
    return kmeans_embeddings(_read(sf_dir, "embeddings"), k=10, iters=5)


def _q_semdedup_embeddings(sf_dir: str):
    from fuzzy_matching_ray.extras.kmeans import semdedup_embeddings

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_kmeans_golden(sf_dir)
    return semdedup_embeddings(
        _read(sf_dir, "embeddings"), k=10, iters=5, threshold=0.3
    )


def _q_multimodal(sf_dir: str):
    from fuzzy_matching_ray.extras.multimodal import decode_media, text_to_fake_binary

    media = text_to_fake_binary(_read(sf_dir, "documents"))
    feats = decode_media(media)
    return feats.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "width": b["width"], "payload_bytes": b["payload_bytes"]}
        ),
        batch_format="pyarrow",
    )


def _q_lineitem_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "lineitem")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n_rows"),
        Sum("l_quantity", alias_name="sum_qty"),
        Min("l_extendedprice", alias_name="min_price"),
        Max("l_extendedprice", alias_name="max_price"),
    )
    return out


def _q_orders_top10(sf_dir: str):
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def _q_customer_per_nation(sf_dir: str):
    import ray

    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    nation = _read(sf_dir, "nation").to_pandas()
    lookup_ref = ray.put(
        (
            pa.array(nation.n_nationkey.to_numpy()),
            pa.array(nation.n_name, pa.string()),
        )
    )

    def _attach(batch: pa.Table) -> pa.Table:
        keys_arr, names_arr = ray.get(lookup_ref)
        # vectorized broadcast probe: index_in + take (no per-row Python)
        pos = pc.index_in(batch["c_nationkey"], value_set=keys_arr)
        return pa.table({"n_name": names_arr.take(pos)})

    ds = _read(sf_dir, "customer").select_columns(["c_nationkey"]).map_batches(
        _attach, batch_format="pyarrow"
    )
    return ds.groupby("n_name").aggregate(Count(alias_name="n_customers"))


def _keyset_join(
    probe, probe_key: str, build, build_key: str, build_pred, invert: bool
):
    """Broadcast key-set semi/anti join (SURVEY.md §2.8): collect the
    (predicate-filtered) build-side keys once, ``ray.put`` them, filter
    probe batches with vectorized ``pc.is_in``."""
    import ray
    import pyarrow.compute as pc

    keys = set()
    for b in build.iter_batches(batch_size=65536, batch_format="pyarrow"):
        flt = b.filter(build_pred(b))
        keys.update(flt[build_key].to_pylist())
    keys_ref = ray.put(sorted(keys))

    def _filter(batch: pa.Table) -> pa.Table:
        vs = pa.array(ray.get(keys_ref))
        mask = pc.is_in(batch[probe_key], value_set=vs)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return probe.map_batches(_filter, batch_format="pyarrow")


def _q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no high-value order (predicate pushed
    into the key-side scan)."""
    import pyarrow.compute as pc

    return _keyset_join(
        _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"]),
        "c_custkey",
        _read(sf_dir, "orders").select_columns(["o_custkey", "o_totalprice"]),
        "o_custkey",
        lambda b: pc.greater(b["o_totalprice"], 300000.0),
        invert=True,
    )


def _q_suppliers_with_parts(sf_dir: str):
    """Semi-join: suppliers with at least one top-priced lineitem."""
    import pyarrow.compute as pc

    return _keyset_join(
        _read(sf_dir, "supplier").select_columns(["s_suppkey", "s_name"]),
        "s_suppkey",
        _read(sf_dir, "lineitem").select_columns(["l_suppkey", "l_extendedprice"]),
        "l_suppkey",
        lambda b: pc.greater_equal(b["l_extendedprice"], 104800.0),
        invert=False,
    )


def _q_events_asof_orders(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import asof_join

    events = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    return asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_val="o_orderkey",
        out_val="last_orderkey",
        left_cols=["event_id", "user_id"],
    )


def _q_events_rolling_window(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import rolling_window_stats

    return rolling_window_stats(
        _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts", "value"])
    )


def _q_sample_documents(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import hash_sample

    return hash_sample(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_events_range_join(sf_dir: str):
    """Self interval join: for each event, the same user's events in
    the strictly-preceding 1-hour window (b.ts in [a.ts-1h, a.ts))."""
    from fuzzy_matching_ray.extras.relational import range_join

    ev = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    return range_join(
        ev,
        ev,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_id="event_id",
        right_id="event_id",
        low_seconds=3600,
        out_left="event_id",
        out_right="prior_event_id",
    )


def _q_events_quantiles(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import grouped_quantiles

    return grouped_quantiles(
        _read(sf_dir, "events").select_columns(["event_type", "value"]),
        key="event_type",
        val="value",
    )


_BM25_TERMS = ("hash", "join", "merge")


def _q_bm25_search(sf_dir: str):
    """Ranked keyword search (log-free BM25 — extras/search.py) for a
    fixed 3-term query; scores are engine-exact by construction."""
    from fuzzy_matching_ray.extras.search import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        terms=_BM25_TERMS,
    )


def _q_pack_sequences(sf_dir: str):
    from fuzzy_matching_ray.extras.packing import pack_sequences

    return pack_sequences(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_multimodal_frames(sf_dir: str):
    """Frame sampling over the fake-codec media column — the video
    explode shape (one row in, many frame rows out)."""
    from fuzzy_matching_ray.extras.multimodal import frame_sample_media, text_to_fake_binary

    media = text_to_fake_binary(_read(sf_dir, "documents"))
    return frame_sample_media(media)


def _q_multimodal_features(sf_dir: str):
    """Actor-pool feature extraction over media payload bytes (the
    embed/classify precursor; integer byte statistics here)."""
    from fuzzy_matching_ray.extras.multimodal import media_features, text_to_fake_binary

    return media_features(text_to_fake_binary(_read(sf_dir, "documents")))


def _q_multimodal_audio(sf_dir: str):
    """REAL WAV decode (stdlib wave) + integer PCM features over an
    audio binary column: the blobs are genuine RIFF containers whose
    PCM16 samples derive deterministically from text ((byte-128)*256),
    so the DuckDB oracle reproduces every feature exactly."""
    from fuzzy_matching_ray.extras.multimodal import audio_features, text_to_fake_wav

    return audio_features(text_to_fake_wav(_read(sf_dir, "documents")))


def _q_multimodal_jpeg(sf_dir: str):
    """REAL baseline JPEG decode (extras/jpeg.py, from-scratch SOF0
    Huffman+IDCT codec) over deterministically synthesized JPEG blobs:
    dimensions and decoded-payload size are lossless facts the DuckDB
    oracle recomputes from octet_length(text)."""
    from fuzzy_matching_ray.extras.multimodal import decode_media, text_to_jpeg_binary

    media = text_to_jpeg_binary(_read(sf_dir, "documents"))
    return decode_media(media).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "width": b["width"],
                "height": b["height"],
                "payload_bytes": b["payload_bytes"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_token_heavy_hitters(sf_dir: str):
    """Exact global heavy hitters with map-side partial counts (the
    exchange carries distinct-tokens-per-batch, never occurrences)."""
    from fuzzy_matching_ray.extras.aggregates import token_heavy_hitters

    return token_heavy_hitters(
        _read(sf_dir, "documents").select_columns(["text"]), min_count=100
    )


def _q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF terms.  Global document frequencies are a
    map-side partial + bucketed distributed reduce, broadcast only
    when the vocabulary is proven small (auto mode falls back to the
    no-broadcast bucketed-join path above the bound); ranking key is
    one IEEE double division so the SQL oracle orders identically."""
    from fuzzy_matching_ray.extras.tfidf import tfidf_top_terms

    return tfidf_top_terms(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_rare_token_stats(sf_dir: str):
    """Corpus-aware rarity signal (hapax counts per doc) — the quality
    dimension doc-local stats can't see; all-integer output."""
    from fuzzy_matching_ray.extras.tfidf import rare_token_stats

    return rare_token_stats(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_events_pivot(sf_dir: str):
    """User × event-type count matrix (wide feature vectors): the
    exchange carries per-batch (user, type) pair counts, never events."""
    from fuzzy_matching_ray.extras.aggregates import pivot_counts

    return pivot_counts(
        _read(sf_dir, "events").select_columns(["user_id", "event_type"]),
        key_col="user_id",
        pivot_col="event_type",
        categories=("click", "error", "purchase", "signup", "view"),
    )


def _q_lang_mismatch(sf_dir: str):
    """Metadata audit: detected vs declared language, zero shuffles."""
    from fuzzy_matching_ray.extras.textstats import language_mismatch

    return language_mismatch(_read(sf_dir, "documents"))


def _q_shard_documents(sf_dir: str):
    """Content-addressed training-shard layout (deterministic global
    shuffle): md5-word shard + within-shard rank, engine-reproducible."""
    from fuzzy_matching_ray.extras.packing import shard_documents

    return shard_documents(_read(sf_dir, "documents"))


def _q_top_tokens_per_lang(sf_dir: str):
    """Per-language top-10 tokens (domain vocabulary profile):
    combiner-first two-level exact aggregation."""
    from fuzzy_matching_ray.extras.aggregates import grouped_top_tokens

    return grouped_top_tokens(
        _read(sf_dir, "documents").select_columns(["lang", "text"]), group_col="lang"
    )


def _q_session_stats(sf_dir: str):
    """Session-level rollup in the same shuffle as sessionization."""
    from fuzzy_matching_ray.extras.relational import session_stats

    return session_stats(
        _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    )


def _q_dedup_event_bursts(sf_dir: str):
    """Burst dedup: first event of every (user, type) burst survives;
    repeats within 60s collapse."""
    from fuzzy_matching_ray.extras.relational import dedup_event_bursts

    return dedup_event_bursts(
        _read(sf_dir, "events").select_columns(
            ["event_id", "user_id", "event_type", "ts"]
        )
    )


def _q_events_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel per user (min-timestamp
    semantics — row-order independent, SQL-mirrorable)."""
    from fuzzy_matching_ray.extras.relational import funnel_stages

    return funnel_stages(
        _read(sf_dir, "events").select_columns(["user_id", "event_type", "ts"])
    )


def _q_gram_novelty(sf_dir: str):
    """Duplication attribution: per doc, distinct 4-grams already seen
    in an earlier (smaller-id) doc.  Exchanges carry (id, hash) pairs."""
    from fuzzy_matching_ray.extras.filtering import gram_novelty

    return gram_novelty(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_length_deciles(sf_dir: str):
    """Exact global decile buckets over doc lengths WITHOUT a global
    sort (histogram combine + one remote cutpoint reduce + broadcast
    searchsorted assignment)."""
    from fuzzy_matching_ray.extras.aggregates import quantile_bucket_assign

    return quantile_bucket_assign(
        _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"]),
        id_col="doc_id",
        val_col="n_chars",
    )


def _q_approx_ndistinct(sf_dir: str):
    """HLL distinct-user estimate per event type.  The sketch is
    deterministic given the hash, so the sf0.01 oracle is a serial
    integer-bit-scan golden (fixtures.ensure_hll_golden); accuracy is
    additionally gated in pytest (<8% relative error vs exact)."""
    from fuzzy_matching_ray.extras.aggregates import approx_ndistinct

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_hll_golden(sf_dir)
    return approx_ndistinct(
        _read(sf_dir, "events").select_columns(["event_type", "user_id"]),
        key_col="event_type",
        val_col="user_id",
    )


def _q_approx_quantiles(sf_dir: str):
    """DDSketch approximate per-type value quantiles — the
    unbounded-domain scale path next to the exact `events_quantiles`.
    Deterministic and order-independent, so the sf0.01 oracle is a
    serial per-row golden (fixtures.ensure_ddq_golden); the relative
    error bound is gated in pytest."""
    from fuzzy_matching_ray.extras.aggregates import approx_quantiles_sketch

    if os.path.basename(os.path.normpath(sf_dir)) == "sf0.01":
        from fuzzy_matching_ray import fixtures

        fixtures.ensure_ddq_golden(sf_dir)
    return approx_quantiles_sketch(
        _read(sf_dir, "events").select_columns(["event_type", "value"]),
        key_col="event_type",
        val_col="value",
    )


def _q_incremental_dedup(sf_dir: str):
    """Incremental mode: even doc_ids are the already-deduped base,
    odd doc_ids are the new batch; base×base pairs are culled before
    verification."""
    from fuzzy_matching_ray.extras.doc_dedup import incremental_dedup_pairs

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _parity(batch, odd: bool):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ids % 2 == 1) == odd))

    base = docs.map_batches(lambda b: _parity(b, False), batch_format="pyarrow")
    new = docs.map_batches(lambda b: _parity(b, True), batch_format="pyarrow")
    return incremental_dedup_pairs(new, base)


def _q_redact_pii(sf_dir: str):
    """PII redaction over a deterministic PII-bearing column (the
    synthetic documents carry no PII, so both sides synthesize the
    SAME emails/phones/SSNs from doc_id before redacting — the
    operator under test is the Arrow RE2 redaction kernel)."""
    from fuzzy_matching_ray.extras.filtering import redact_pii

    def _with_pii(batch):
        df = batch
        i = df["doc_id"]
        df = df.copy()
        df["text"] = (
            df["text"]
            + " Contact: user"
            + i.astype(str)
            + "@example.com, phone +1-"
            + (100 + i % 900).astype(str)
            + "-"
            + (100 + (i * 7) % 900).astype(str)
            + "-"
            + (1000 + (i * 13) % 9000).astype(str)
            + ", ssn "
            + (100 + i % 900).astype(str)
            + "-"
            + (10 + i % 90).astype(str)
            + "-"
            + (1000 + (i * 3) % 9000).astype(str)
            + "."
        )
        return df

    ds = (
        _read(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(_with_pii, batch_format="pandas")
    )
    return redact_pii(ds)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 23 == 0 act as
    the held-out benchmark set; every other doc sharing any word
    4-gram with it is flagged with its distinct-contaminated-gram
    count.  Broadcast sorted-hash probe — the corpus side streams.
    (Real decontamination uses 8-13-grams; the synthetic word-salad
    docs are short enough that n=4 is the equivalent signal.)"""
    from fuzzy_matching_ray.extras.filtering import decontaminate

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def _split(batch, bench: bool):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ids % 23 == 0) == bench))

    bench = docs.map_batches(lambda b: _split(b, True), batch_format="pyarrow")
    corpus = docs.map_batches(lambda b: _split(b, False), batch_format="pyarrow")
    return decontaminate(corpus, bench, n=4)


def _q_repetition_stats(sf_dir: str):
    from fuzzy_matching_ray.extras.filtering import repetition_stats

    return repetition_stats(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_validate_transcripts(sf_dir: str):
    """Transcript integrity report over the turns table — the
    pre-dedup hygiene pass (dup/gapped turn indices, role-alternation
    violations, empty turns)."""
    import ray.data as rd

    from fuzzy_matching_ray.extras.transcripts import validate_transcripts

    return validate_transcripts(rd.read_parquet(_transcripts_dir(sf_dir)))


def _q_loop_stats_transcripts(sf_dir: str):
    """Agent-loop detection: adjacent identical (role, normalized
    text) turns per conversation, plus the longest such run."""
    import ray.data as rd

    from fuzzy_matching_ray.extras.transcripts import loop_stats_transcripts

    return loop_stats_transcripts(rd.read_parquet(_transcripts_dir(sf_dir)))


def _q_tool_stats_transcripts(sf_dir: str):
    """Tool-usage profile per conversation (deterministic mode with
    count DESC / tool ASC tiebreak)."""
    import ray.data as rd

    from fuzzy_matching_ray.extras.transcripts import tool_stats_transcripts

    return tool_stats_transcripts(rd.read_parquet(_transcripts_dir(sf_dir)))


def _q_cluster_safe_split(sf_dir: str):
    """Leakage-free train/val split: near-dup clusters assigned
    wholesale by md5(cluster_id) prefix."""
    from fuzzy_matching_ray.extras.doc_dedup import cluster_safe_split

    return cluster_safe_split(_read(sf_dir, "documents"), val_hex="33")


def _q_pack_chat(sf_dir: str):
    """SFT chat-packing layout with assistant-only loss masks over
    the transcripts table."""
    import ray.data as rd

    from fuzzy_matching_ray.extras.transcripts import pack_chat_sequences

    return pack_chat_sequences(rd.read_parquet(_transcripts_dir(sf_dir)))


def _q_chunk_documents(sf_dir: str):
    """RAG-style sliding-window chunking (32-word windows, stride 8),
    fully vectorized including the Arrow C-level chunk-text join."""
    from fuzzy_matching_ray.extras.chunking import chunk_documents

    return chunk_documents(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        window=32,
        stride=8,
    )


def _q_boilerplate_turns(sf_dir: str):
    """Repeated-turn detection over the transcripts table (system
    prompts / canned responses), partial-aggregated before the
    text-keyed shuffle."""
    import ray.data as rd

    from fuzzy_matching_ray.extras.transcripts import boilerplate_turns

    return boilerplate_turns(rd.read_parquet(_transcripts_dir(sf_dir)), min_count=3)


def _q_stratified_sample(sf_dir: str):
    """Domain mixing: per-language sampling rates (en 80%, de/fr 25%,
    es 12.5%, everything else — zh here — 5%), content-addressed so
    SQL reproduces membership exactly."""
    from fuzzy_matching_ray.extras.relational import stratified_sample

    return stratified_sample(
        _read(sf_dir, "documents").select_columns(["doc_id", "lang", "text"]),
        group_col="lang",
        rates={"en": "cc", "de": "40", "fr": "40", "es": "20"},
        default_rate="0c",
    )


def _q_mix_sources(sf_dir: str):
    """Mixture resampling WITH upsampling (the Pile/Llama recipe
    shape): src0 at weight ~3.4 (3 copies + content-addressed 39.8 %
    of a 4th), src1 downsampled to ~50 %, src2 at exactly 2, the rest
    at ~1.1.  Deterministic md5 multiplicity, copies tagged
    ``copy_idx`` — reproduced in SQL by ``unnest(range(n))`` over the
    same md5-prefix compare."""
    from fuzzy_matching_ray.extras.relational import weighted_mix

    return weighted_mix(
        _read(sf_dir, "documents").select_columns(["doc_id", "source", "text"]),
        group_col="source",
        weights={"src0": (3, "66"), "src1": (0, "80"), "src2": (2, "00")},
        default_weight=(1, "19"),
    )


def _q_rollup_documents(sf_dir: str):
    """Hierarchical ROLLUP(source, lang) char/row totals: leaf rows,
    per-source subtotals and the grand total, all derived from one
    combiner-first pass (raw rows never shuffle; see
    extras/aggregates.grouped_rollup)."""
    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    return grouped_rollup(
        _read(sf_dir, "documents").select_columns(["source", "lang", "n_chars"]),
        key_cols=("source", "lang"),
        value_col="n_chars",
    )


def _q_rollup_documents_3key(sf_dir: str):
    """ROLLUP(source, lang, len_bucket) with the full aggregate set
    (sum/count/min/max/avg) — the N-key generalization: every key
    prefix plus the grand total from ONE combiner pass, raw rows never
    shuffling (see extras/aggregates.grouped_rollup)."""
    import pyarrow.compute as pc

    from fuzzy_matching_ray.extras.aggregates import grouped_rollup

    def _bucket(t: pa.Table) -> pa.Table:
        n = t["n_chars"]
        lb = pc.if_else(
            pc.less(n, 200),
            pa.scalar("short"),
            pc.if_else(pc.less(n, 1000), pa.scalar("mid"), pa.scalar("long")),
        )
        return t.append_column("len_bucket", lb.cast(pa.string()))

    ds = (
        _read(sf_dir, "documents")
        .select_columns(["source", "lang", "n_chars"])
        .map_batches(_bucket, batch_format="pyarrow")
    )
    return grouped_rollup(
        ds,
        key_cols=("source", "lang", "len_bucket"),
        value_col="n_chars",
        aggs=("sum", "count", "min", "max", "avg"),
    )


def _q_cube_documents(sf_dir: str):
    """Full CUBE(source, lang) char/row totals: all four grouping
    sets from ONE combiner pass over the raw rows (the reduced
    partials shuffle twice; see extras/aggregates.grouped_cube)."""
    from fuzzy_matching_ray.extras.aggregates import grouped_cube

    return grouped_cube(
        _read(sf_dir, "documents").select_columns(["source", "lang", "n_chars"]),
        key_cols=("source", "lang"),
        value_col="n_chars",
    )


def _q_unigram_logfreq(sf_dir: str):
    """Unigram-LM fluency score (corpus-statistics quality dimension):
    mean ln(global token count) per doc — mean log-likelihood up to the
    per-corpus ln(total) shift, so no global scalar is coordinated."""
    from fuzzy_matching_ray.extras.tfidf import unigram_logfreq

    return unigram_logfreq(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    )


def _q_source_overlap(sf_dir: str):
    """Which sources copy which: distinct shared word-trigram counts
    per unordered source pair, pre-dedup content attribution."""
    from fuzzy_matching_ray.extras.aggregates import source_ngram_overlap

    return source_ngram_overlap(
        _read(sf_dir, "documents").select_columns(["source", "text"]), n=3
    )


def _q_curate_documents(sf_dir: str):
    """Composed curation: fused quality+langid filter → exact dedup →
    content-addressed sample, all in one lazy Dataset plan.  The
    oracle checks the stage *composition* end-to-end, not just the
    stages (each is individually oracled elsewhere)."""
    from fuzzy_matching_ray.extras.curate import curate_documents

    return curate_documents(_read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def _q_orders_customer_join(sf_dir: str):
    """Large×large inner equi-join via Ray Data's native hash join
    (`Dataset.join`, Ray 2.49): both sides are hash-partitioned on the
    key — no broadcast, so either side may exceed worker memory.  The
    value-side predicate is pushed before the shuffle."""
    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"])
    return orders.filter(expr="o_totalprice > 400000").join(
        cust, "inner", 16, on=("o_custkey",), right_on=("c_custkey",)
    )


def _q_customer_order_counts(sf_dir: str):
    """Left-outer native hash join against a pre-aggregated side:
    customers with zero orders survive with n_orders = 0.  The
    aggregate runs BEFORE the join (combiner-first), so the exchange
    moves one row per customer, not one per order."""
    import pyarrow.compute as pc

    orders = (
        _read(sf_dir, "orders")
        .select_columns(["o_custkey"])
        .groupby("o_custkey")
        .count()
    )
    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"])
    joined = cust.join(
        orders, "left_outer", 16, on=("c_custkey",), right_on=("o_custkey",)
    )

    def _fin(b):
        cnt = b["count()"] if "count()" in b.column_names else b["count"]
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_name": b["c_name"],
                "n_orders": pc.fill_null(cnt.cast(pa.int64()), 0),
            }
        )

    return joined.map_batches(_fin, batch_format="pyarrow")


def _q_events_sessionize(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import sessionize

    return sessionize(
        _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    )


def _q_orders_topk_per_cust(sf_dir: str):
    from fuzzy_matching_ray.extras.relational import grouped_topk

    return grouped_topk(
        _read(sf_dir, "orders").select_columns(
            ["o_custkey", "o_totalprice", "o_orderkey"]
        ),
        key="o_custkey",
        val="o_totalprice",
        tiebreak="o_orderkey",
        k=3,
    )


def _q_events_hourly(sf_dir: str):
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events").select_columns(["user_id", "ts", "value"])

    def _trunc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour": pc.floor_temporal(batch["ts"], unit="hour"),
                "value": batch["value"],
            }
        )

    return (
        ds.map_batches(_trunc, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship transcripts pipeline (non-SQL: LSH/sketches/union-find)
        "dedup_minhash_clusters": _q_dedup_minhash_clusters,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "dedup_best_reps": _q_dedup_best_reps,
        "dedup_cluster_reps": _q_dedup_cluster_reps,
        "dedup_simhash_clusters": _q_dedup_simhash_clusters,
        "dedup_resalt_clusters": _q_dedup_resalt_clusters,
        "dedup_substring_edges": _q_substring_pairs,
        "assemble_docs": _q_assemble_docs,
        # reference record-linkage surface
        "record_match_persons": _q_record_match,
        "transliterate_persons": _q_transliterate,
        # document-table operators (SQL oracles)
        "exact_dedup_documents": _q_exact_dedup_documents,
        "token_count_documents": _q_token_count,
        "quality_stats_documents": _q_quality_stats,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "multimodal_decode": _q_multimodal,
        # document-table operators (heuristic / sketch)
        "langid_documents": _q_langid,
        "fingerprint_documents": _q_fingerprints,
        "minhash_dedup_documents": _q_minhash_dedup_documents,
        # embeddings.  knn_lsh / knn_ivf are approximate by contract
        # (recall gated in pytest) but deterministic at their pinned
        # seeds, so their sf0.01 oracles are serial per-query goldens
        # (fixtures.ensure_ann_golden) — value-hashable like the
        # simhash/substring channels.
        "embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "embedding_dedup_clusters": _q_embedding_dedup_clusters,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "kmeans_embeddings": _q_kmeans_embeddings,
        "semdedup_embeddings": _q_semdedup_embeddings,
        # relational coverage (groupby/sort/limit/join/window)
        "lineitem_agg": _q_lineitem_agg,
        "orders_top10": _q_orders_top10,
        # round 5: the new codec/grouping-set operators take the
        # driver-checked slots of three simple relational queries
        # (most-load-bearing-first ordering; all 80 stay hash-exact
        # under tools/check_oracles.py either way)
        "multimodal_jpeg_decode": _q_multimodal_jpeg,
        "multimodal_audio": _q_multimodal_audio,
        "rollup_documents_3key": _q_rollup_documents_3key,
        "cube_documents": _q_cube_documents,
        "customer_per_nation": _q_customer_per_nation,
        "customers_without_orders": _q_customers_without_orders,
        "events_hourly": _q_events_hourly,
        "orders_customer_join": _q_orders_customer_join,
        "customer_order_counts": _q_customer_order_counts,
        # custom relational operators (as-of join / window / sampling)
        "events_sessionize": _q_events_sessionize,
        "orders_topk_per_cust": _q_orders_topk_per_cust,
        "events_asof_orders": _q_events_asof_orders,
        "events_range_join": _q_events_range_join,
        "events_quantiles": _q_events_quantiles,
        "bm25_search": _q_bm25_search,
        "pack_sequences": _q_pack_sequences,
        # tfidf/rarity moved into the driver-checked first 50 after the
        # round-4 DF-sharding rework (most-load-bearing-first ordering)
        "tfidf_top_terms": _q_tfidf_top_terms,
        "rare_token_stats": _q_rare_token_stats,
        "token_heavy_hitters": _q_token_heavy_hitters,
        # HLL sketch — deterministic given the hash; serial bit-scan
        # golden oracle at sf0.01 plus a pytest relative-error gate
        "approx_ndistinct_events": _q_approx_ndistinct,
        # DDSketch quantiles — deterministic log-bucket sketch; serial
        # golden oracle plus a pytest relative-error gate
        "approx_quantiles_events": _q_approx_quantiles,
        "incremental_dedup_pairs": _q_incremental_dedup,
        "redact_pii_documents": _q_redact_pii,
        "decontaminate_documents": _q_decontaminate,
        "repetition_stats_documents": _q_repetition_stats,
        "stratified_sample_documents": _q_stratified_sample,
        "validate_transcripts": _q_validate_transcripts,
        "loop_stats_transcripts": _q_loop_stats_transcripts,
        "tool_stats_transcripts": _q_tool_stats_transcripts,
        "pack_chat_sequences": _q_pack_chat,
        "cluster_safe_split": _q_cluster_safe_split,
        "boilerplate_turns": _q_boilerplate_turns,
        "chunk_documents": _q_chunk_documents,
        "events_rolling_window": _q_events_rolling_window,
        "sample_documents": _q_sample_documents,
        # composed curation pipeline (filter -> dedup -> sample in one plan)
        "curate_documents": _q_curate_documents,
        "multimodal_frames": _q_multimodal_frames,
        "multimodal_features": _q_multimodal_features,
        "suppliers_with_parts": _q_suppliers_with_parts,
        "events_pivot": _q_events_pivot,
        "length_deciles_documents": _q_length_deciles,
        "gram_novelty_documents": _q_gram_novelty,
        "events_funnel": _q_events_funnel,
        "shard_documents": _q_shard_documents,
        "lang_mismatch_documents": _q_lang_mismatch,
        "dedup_event_bursts": _q_dedup_event_bursts,
        "session_stats": _q_session_stats,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "mix_sources_documents": _q_mix_sources,
        "rollup_documents": _q_rollup_documents,
        "unigram_logfreq_documents": _q_unigram_logfreq,
        "source_overlap_documents": _q_source_overlap,
    }


# Queries whose oracle reads a fixture/golden file pinned to the
# driver's compare scale — their SQL is only meaningful at sf0.01
# (tools/check_oracles.py skips them at other scales).
FIXTURE_ORACLE_SF = "sf0.01"
FIXTURE_ORACLE_QUERIES = frozenset(
    {
        "dedup_minhash_clusters",
        "dedup_cluster_sizes",
        "dedup_cluster_reps",
        "dedup_simhash_clusters",
        "dedup_substring_edges",
        "fingerprint_documents",
        "assemble_docs",
        "validate_transcripts",
        "loop_stats_transcripts",
        "tool_stats_transcripts",
        "pack_chat_sequences",
        "boilerplate_turns",
        "record_match_persons",
        "transliterate_persons",
        "knn_lsh",
        "knn_ivf",
        "kmeans_embeddings",
        "semdedup_embeddings",
        "approx_ndistinct_events",
        "approx_quantiles_events",
    }
)


def _bm25_oracle() -> str:
    from fuzzy_matching_ray.extras.search import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS)


def oracle_sql() -> dict[str, str]:
    # The driver compares at sf=0.01 only, so fixture-backed oracles
    # reference the deterministic sf0.01 files written at import time
    # by _ensure_oracle_fixtures() (same seed → byte-identical whether
    # the Ray query or the SQL runs first).
    return {
        "dedup_minhash_clusters": (
            # brute-force ALL-PAIRS golden (fixtures.ensure_flagship_golden):
            # serial implementation with no LSH / estimate gate / bucket
            # budgets — the distributed candidate machinery must find
            # every accepted pair for this to hash-match
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/flagship_golden_sf0.01/clusters.parquet')"
        ),
        "dedup_cluster_reps": (
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/flagship_golden_sf0.01/reps.parquet')"
        ),
        "dedup_cluster_sizes": (
            "SELECT size AS cluster_size, count(*)::BIGINT AS n_clusters "
            "FROM (SELECT cluster_id, count(*)::BIGINT AS size "
            f"FROM read_parquet('{_CACHE_ROOT}/flagship_golden_sf0.01/clusters.parquet') "
            "GROUP BY cluster_id) GROUP BY size"
        ),
        "dedup_simhash_clusters": (
            # serial golden (fixtures.ensure_simhash_golden): independent
            # scalar SimHash + band bucketing + the same acceptance rule,
            # all single-process — the distributed SimHash channel must
            # reproduce it exactly
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/simhash_golden_sf0.01/clusters.parquet')"
        ),
        "dedup_resalt_clusters": (
            # same brute-force golden as dedup_minhash_clusters: the
            # resalt hot-bucket mode changes candidate ROUTING only,
            # so the accepted clusters must be identical
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/flagship_golden_sf0.01/clusters.parquet')"
        ),
        "dedup_substring_edges": (
            # serial golden (fixtures.ensure_substring_golden): all-pairs
            # acceptance scan + bucket-local suffix-array channel tags
            # under the same pinned partitioning
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/substring_golden_sf0.01/edges.parquet')"
        ),
        "fingerprint_documents": (
            # frozen pure-Python winnowing golden
            # (fixtures.ensure_fingerprint_golden)
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/fingerprint_golden_sf0.01/fingerprints.parquet')"
        ),
        "assemble_docs": (
            # per-conversation reassembly invariant: n_turns = turn
            # count, n_chars = sum of turn lengths + (n_turns-1)
            # one-char separators ('\n' join)
            "SELECT conv_id, count(*)::INT AS n_turns, "
            "(sum(length(text)) + count(*) - 1)::BIGINT AS n_chars "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet') "
            "GROUP BY conv_id"
        ),
        "record_match_persons": (
            # greedy 1:1 matcher golden: serial ReferenceMatcher output
            # frozen at fixture-write time (fixtures.py) — checks the
            # distributed blocking/shuffle path against single-process
            # reference semantics
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/persons_sf0.01/match_golden.parquet')"
        ),
        "transliterate_persons": (
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/persons_translit/translit_golden.parquet')"
        ),
        "langid_documents": (
            # exact SQL mirror of extras.textstats.language_id: CJK →
            # zh, Cyrillic-dominant → ru, else first-wins argmax of
            # stopword hits over distinct lowercase tokens, 'und' if 0
            "WITH t AS (SELECT doc_id, text, "
            "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS toks "
            "FROM documents), "
            "h AS (SELECT doc_id, text, "
            "len(list_intersect(toks, ['the','of','and','a','to','in','is','it','that','for','with','on','as'])) AS h_en, "
            "len(list_intersect(toks, ['le','la','les','de','des','et','un','une','est','que','pour','dans','du'])) AS h_fr, "
            "len(list_intersect(toks, ['el','la','los','las','de','y','un','una','es','que','para','en','del'])) AS h_es, "
            "len(list_intersect(toks, ['der','die','das','und','ein','eine','ist','zu','mit','für','auf','den'])) AS h_de "
            "FROM t) "
            "SELECT doc_id, CASE "
            "WHEN regexp_matches(substr(text, 1, 400), '[\\x{4e00}-\\x{9fff}]') THEN 'zh' "
            "WHEN length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0 "
            "AND length(regexp_replace(substr(text, 1, 2000), '[^а-яА-Я]', '', 'g'))::DOUBLE "
            "/ length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0.5 THEN 'ru' "
            "WHEN h_en = 0 AND h_fr = 0 AND h_es = 0 AND h_de = 0 THEN 'und' "
            "WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en' "
            "WHEN h_fr >= h_es AND h_fr >= h_de THEN 'fr' "
            "WHEN h_es >= h_de THEN 'es' ELSE 'de' END AS lang_pred "
            "FROM h"
        ),
        "lang_mismatch_documents": (
            # the langid oracle joined back to the declared column
            "WITH t AS (SELECT doc_id, text, "
            "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS toks "
            "FROM documents), "
            "h AS (SELECT doc_id, text, "
            "len(list_intersect(toks, ['the','of','and','a','to','in','is','it','that','for','with','on','as'])) AS h_en, "
            "len(list_intersect(toks, ['le','la','les','de','des','et','un','une','est','que','pour','dans','du'])) AS h_fr, "
            "len(list_intersect(toks, ['el','la','los','las','de','y','un','una','es','que','para','en','del'])) AS h_es, "
            "len(list_intersect(toks, ['der','die','das','und','ein','eine','ist','zu','mit','für','auf','den'])) AS h_de "
            "FROM t), "
            "p AS (SELECT doc_id, CASE "
            "WHEN regexp_matches(substr(text, 1, 400), '[\\x{4e00}-\\x{9fff}]') THEN 'zh' "
            "WHEN length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0 "
            "AND length(regexp_replace(substr(text, 1, 2000), '[^а-яА-Я]', '', 'g'))::DOUBLE "
            "/ length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0.5 THEN 'ru' "
            "WHEN h_en = 0 AND h_fr = 0 AND h_es = 0 AND h_de = 0 THEN 'und' "
            "WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en' "
            "WHEN h_fr >= h_es AND h_fr >= h_de THEN 'fr' "
            "WHEN h_es >= h_de THEN 'es' ELSE 'de' END AS lang_pred "
            "FROM h) "
            "SELECT d.doc_id, coalesce(d.lang, '') AS lang, p.lang_pred, "
            "(CASE WHEN coalesce(d.lang, '') = p.lang_pred THEN 1 ELSE 0 END)::BIGINT AS agree "
            "FROM documents d JOIN p USING (doc_id)"
        ),
        "minhash_dedup_documents": (
            # brute-force independent oracle for the LSH pipeline:
            # exact string 5-shingle sets over canonicalized text,
            # all-pairs Jaccard ≥ 0.7, connected components via a
            # recursive CTE, cluster_id = lexicographic min member
            # (matching union_find's min-conv_id label)
            "WITH RECURSIVE canon AS ("
            "SELECT doc_id::VARCHAR AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t "
            "FROM documents), "
            "sh AS (SELECT id, CASE WHEN length(t) < 5 THEN [t] "
            "ELSE list_distinct(list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))) END AS s "
            "FROM canon), "
            "e AS (SELECT a.id AS src, b.id AS dst "
            "FROM sh a JOIN sh b ON a.id < b.id "
            "WHERE len(list_intersect(a.s, b.s))::DOUBLE "
            "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7), "
            "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "reach(a, b) AS (SELECT id, id FROM sh UNION "
            "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src) "
            "SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a"
        ),
        "dedup_best_reps": (
            # components oracle + quality-first representative pick
            "WITH RECURSIVE canon AS ("
            "SELECT doc_id::VARCHAR AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t "
            "FROM documents), "
            "sh AS (SELECT id, CASE WHEN length(t) < 5 THEN [t] "
            "ELSE list_distinct(list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))) END AS s "
            "FROM canon), "
            "e AS (SELECT a.id AS src, b.id AS dst "
            "FROM sh a JOIN sh b ON a.id < b.id "
            "WHERE len(list_intersect(a.s, b.s))::DOUBLE "
            "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7), "
            "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "reach(a, b) AS (SELECT id, id FROM sh UNION "
            "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src), "
            "lab AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a), "
            "q AS (SELECT l.id, l.cluster_id, length(d.text)::BIGINT AS score "
            "FROM lab l JOIN documents d ON d.doc_id::VARCHAR = l.id), "
            "r AS (SELECT cluster_id, id, score, "
            "row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, id ASC) AS rn, "
            "count(*) OVER (PARTITION BY cluster_id) AS n_members FROM q) "
            "SELECT cluster_id, id AS rep_id, score AS rep_score, "
            "n_members::BIGINT AS n_members FROM r WHERE rn = 1"
        ),
        "dedup_rate_by_source": (
            # the minhash_dedup_documents components oracle + per-source
            # kept/removed rollup (kept = min-id representative)
            "WITH RECURSIVE canon AS ("
            "SELECT doc_id::VARCHAR AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t "
            "FROM documents), "
            "sh AS (SELECT id, CASE WHEN length(t) < 5 THEN [t] "
            "ELSE list_distinct(list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))) END AS s "
            "FROM canon), "
            "e AS (SELECT a.id AS src, b.id AS dst "
            "FROM sh a JOIN sh b ON a.id < b.id "
            "WHERE len(list_intersect(a.s, b.s))::DOUBLE "
            "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7), "
            "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "reach(a, b) AS (SELECT id, id FROM sh UNION "
            "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src), "
            "lab AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a), "
            "j AS (SELECT d.source, CASE WHEN l.id = l.cluster_id THEN 1 ELSE 0 END AS kept "
            "FROM documents d JOIN lab l ON d.doc_id::VARCHAR = l.id) "
            "SELECT source, count(*)::BIGINT AS n_docs, sum(kept)::BIGINT AS n_kept, "
            "(count(*) - sum(kept))::BIGINT AS n_removed FROM j GROUP BY source"
        ),
        "cluster_safe_split": (
            # the minhash_dedup_documents components oracle + a
            # content-addressed whole-cluster split assignment
            "WITH RECURSIVE canon AS ("
            "SELECT doc_id::VARCHAR AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t "
            "FROM documents), "
            "sh AS (SELECT id, CASE WHEN length(t) < 5 THEN [t] "
            "ELSE list_distinct(list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))) END AS s "
            "FROM canon), "
            "e AS (SELECT a.id AS src, b.id AS dst "
            "FROM sh a JOIN sh b ON a.id < b.id "
            "WHERE len(list_intersect(a.s, b.s))::DOUBLE "
            "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7), "
            "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "reach(a, b) AS (SELECT id, id FROM sh UNION "
            "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src), "
            "cl AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a) "
            "SELECT doc_id, cluster_id, "
            "CASE WHEN substr(md5(cluster_id), 1, 2) < '33' THEN 'val' ELSE 'train' END AS split "
            "FROM cl"
        ),
        "exact_dedup_documents": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "token_count_documents": (
            "SELECT doc_id, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens, "
            "len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))::BIGINT AS n_tokens_bpe, "
            "length(text)::BIGINT AS n_chars_calc "
            "FROM documents"
        ),
        "quality_stats_documents": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars_calc, "
            "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::BIGINT AS n_punct, "
            "length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digits, "
            "length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS n_upper, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens "
            "FROM documents"
        ),
        "ngram_jaccard_pairs": (
            "WITH toks AS (SELECT doc_id, source, "
            "list_distinct(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "pairs AS (SELECT a.doc_id AS src, b.doc_id AS dst, "
            "len(list_intersect(a.tok, b.tok))::BIGINT AS inter_size, "
            "len(list_distinct(list_concat(a.tok, b.tok)))::BIGINT AS union_size "
            "FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id) "
            "SELECT src, dst, inter_size, union_size FROM pairs "
            "WHERE 100 * inter_size >= 30 * union_size"
        ),
        "multimodal_decode": (
            "SELECT doc_id, ((octet_length(encode(text)) % 640) + 1)::INT AS width, "
            "octet_length(encode(text))::BIGINT AS payload_bytes FROM documents"
        ),
        "multimodal_jpeg_decode": (
            # the lossless facts of the JPEG transform: dimensions ride
            # the SOF0 header exactly; decoded grayscale nbytes = w*h
            "WITH m AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n "
            "FROM documents) "
            "SELECT doc_id, ((n % 24) + 8)::INT AS width, "
            "(((n * 7) % 24) + 8)::INT AS height, "
            "(((n % 24) + 8) * (((n * 7) % 24) + 8))::BIGINT AS payload_bytes "
            "FROM m"
        ),
        "embedding_cosine_pairs": (
            "SELECT a.vec_id AS src, b.vec_id AS dst "
            "FROM embeddings a JOIN embeddings b "
            "ON a.label = b.label AND a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3"
        ),
        "embedding_dedup_clusters": (
            # independent brute force: exact within-block cosine pairs,
            # connected components via a recursive CTE, cluster_id =
            # numeric min member (matching union_find's min label)
            "WITH RECURSIVE e AS ("
            "SELECT a.vec_id AS src, b.vec_id AS dst "
            "FROM embeddings a JOIN embeddings b "
            "ON a.label = b.label AND a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3), "
            "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e), "
            "reach(a, b) AS (SELECT vec_id, vec_id FROM embeddings UNION "
            "SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src) "
            "SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a"
        ),
        "knn_lsh": (
            # serial golden (fixtures.ensure_ann_golden): same seeded
            # hyperplanes, independent per-query candidate loops —
            # deterministic at the pinned seed, so value-hashable
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/ann_golden_sf0.01/knn_lsh.parquet')"
        ),
        "knn_ivf": (
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/ann_golden_sf0.01/knn_ivf.parquet')"
        ),
        "kmeans_embeddings": (
            # serial golden (fixtures.ensure_kmeans_golden): independent
            # per-row integer-dot loops over the same quantized unit
            # vectors — bit-deterministic at the pinned (k, iters)
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/kmeans_golden_sf0.01/kmeans.parquet')"
        ),
        "semdedup_embeddings": (
            # serial golden: per-pair integer-dot loop, lower-id-wins
            # pairwise rule at the pinned threshold
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/kmeans_golden_sf0.01/semdedup.parquet')"
        ),
        "approx_ndistinct_events": (
            # serial golden (fixtures.ensure_hll_golden): integer
            # bit-scan registers, same HLL estimate formula
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/hll_golden_sf0.01/ndv.parquet')"
        ),
        "approx_quantiles_events": (
            # serial golden (fixtures.ensure_ddq_golden): per-row
            # Python loops + dict counters, same DDSketch γ
            f"SELECT * FROM read_parquet('{_CACHE_ROOT}/ddq_golden_sf0.01/quantiles.parquet')"
        ),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 10), "
            "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank "
            "FROM sims) "
            "SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows, "
            "sum(l_quantity) AS sum_qty, min(l_extendedprice) AS min_price, "
            "max(l_extendedprice) AS max_price "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_top10": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
        ),
        "customer_order_counts": (
            "SELECT c_custkey, c_name, coalesce(o.cnt, 0)::BIGINT AS n_orders "
            "FROM customer LEFT JOIN (SELECT o_custkey, count(*) AS cnt "
            "FROM orders GROUP BY o_custkey) o ON c_custkey = o.o_custkey"
        ),
        "customer_per_nation": (
            "SELECT n_name, count(*)::BIGINT AS n_customers FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
        ),
        "suppliers_with_parts": (
            "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN "
            "(SELECT l_suppkey FROM lineitem WHERE l_extendedprice >= 104800)"
        ),
        "events_hourly": (
            "SELECT user_id, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n_events, "
            "min(value) AS min_value, max(value) AS max_value "
            "FROM events GROUP BY user_id, date_trunc('hour', ts)"
        ),
        "orders_customer_join": (
            "SELECT o_orderkey, o_custkey, o_totalprice, c_name "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "WHERE o_totalprice > 400000"
        ),
        "events_sessionize": (
            # gap comparison in microseconds on BOTH sides: a
            # date_diff('second') truncation would let a 1800.5 s gap
            # straddle the boundary between engines
            "SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id "
            "FROM (SELECT event_id, user_id, "
            "SUM(CASE WHEN prev_ts IS NULL OR "
            "date_diff('microsecond', prev_ts, ts) > 1800000000 "
            "THEN 1 ELSE 0 END) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS session_id "
            "FROM (SELECT event_id, user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events))"
        ),
        "orders_topk_per_cust": (
            "SELECT o_custkey, o_totalprice, o_orderkey, rk FROM ("
            "SELECT o_custkey, o_totalprice, o_orderkey, "
            "ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rk "
            "FROM orders) WHERE rk <= 3"
        ),
        "events_asof_orders": (
            # backward as-of join, ties on orderdate broken by max key —
            # the same total order merge_asof's last-row pick uses
            "SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey "
            "FROM events e LEFT JOIN LATERAL ("
            "SELECT o_orderkey FROM orders "
            "WHERE o_custkey = e.user_id AND o_orderdate <= e.ts "
            "ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE"
        ),
        "events_rolling_window": (
            "SELECT event_id, user_id, "
            "count(*) OVER w AS n_window, max(value) OVER w AS max_value "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        "sample_documents": (
            "SELECT doc_id, text FROM documents "
            "WHERE substr(md5(doc_id::VARCHAR), 1, 2) < '33'"
        ),
        "events_range_join": (
            "SELECT a.event_id AS event_id, b.event_id AS prior_event_id "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts >= a.ts - INTERVAL 3600 SECOND AND b.ts < a.ts"
        ),
        "events_quantiles": (
            # discrete quantiles are member values, so doubles compare
            # exactly between engines
            "SELECT event_type, quantile_disc(value, 0.25) AS p25, "
            "quantile_disc(value, 0.5) AS p50, "
            "quantile_disc(value, 0.9) AS p90, count(*)::BIGINT AS n "
            "FROM events GROUP BY event_type"
        ),
        "bm25_search": _bm25_oracle(),
        "incremental_dedup_pairs": (
            # brute-force mirror of the incremental contract: exact
            # 5-shingle Jaccard >= 0.7 over canonicalized text, pairs
            # where at least one id is odd (the "new" batch)
            "WITH canon AS ("
            "SELECT doc_id, doc_id::VARCHAR AS id, "
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, id, CASE WHEN length(t) < 5 THEN [t] "
            "ELSE list_distinct(list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))) END AS s "
            "FROM canon) "
            "SELECT least(a.id, b.id) AS src, greatest(a.id, b.id) AS dst "
            "FROM sh a JOIN sh b ON a.id < b.id "
            "WHERE NOT (a.doc_id % 2 = 0 AND b.doc_id % 2 = 0) "
            "AND len(list_intersect(a.s, b.s))::DOUBLE "
            "/ (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7"
        ),
        "redact_pii_documents": (
            "WITH p AS (SELECT doc_id, text || ' Contact: user' || doc_id "
            "|| '@example.com, phone +1-' || (100 + doc_id % 900)::VARCHAR "
            "|| '-' || (100 + (doc_id * 7) % 900)::VARCHAR "
            "|| '-' || (1000 + (doc_id * 13) % 9000)::VARCHAR "
            "|| ', ssn ' || (100 + doc_id % 900)::VARCHAR "
            "|| '-' || (10 + doc_id % 90)::VARCHAR "
            "|| '-' || (1000 + (doc_id * 3) % 9000)::VARCHAR || '.' AS t "
            "FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), "
            "'[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS text_redacted, "
            "len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email, "
            "len(regexp_extract_all(t, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone, "
            "len(regexp_extract_all(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))::BIGINT AS n_ssn "
            "FROM p"
        ),
        "decontaminate_documents": (
            "WITH w AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, list_distinct(list_transform("
            "range(1, len(w) - 2), i -> array_to_string(w[i:i+3], ' '))) AS g "
            "FROM w WHERE len(w) >= 4), "
            "b AS (SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % 23 = 0), "
            "d AS (SELECT doc_id, unnest(g) AS gram FROM g WHERE doc_id % 23 <> 0) "
            "SELECT d.doc_id, count(*)::BIGINT AS n_contaminated "
            "FROM d JOIN b USING (gram) GROUP BY d.doc_id"
        ),
        "validate_transcripts": (
            "WITH t AS (SELECT conv_id, turn_idx, role, text "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet')), "
            "a AS (SELECT conv_id, count(*)::BIGINT AS n_turns, "
            "count(DISTINCT role)::BIGINT AS n_roles, "
            "(count(*) - count(DISTINCT turn_idx))::BIGINT AS dup_turn_idx, "
            "(max(turn_idx) - min(turn_idx) + 1 - count(DISTINCT turn_idx))::BIGINT AS idx_gaps, "
            "sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END)::BIGINT AS n_empty_turns "
            "FROM t GROUP BY conv_id), "
            "o AS (SELECT conv_id, role, "
            "CASE WHEN role = lag(role) OVER w THEN 1 ELSE 0 END AS rep, "
            "row_number() OVER w AS rn FROM t "
            "WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, role, text)), "
            "r AS (SELECT conv_id, sum(rep)::BIGINT AS n_role_repeats FROM o GROUP BY conv_id), "
            "s AS (SELECT conv_id, role AS starts_role FROM o WHERE rn = 1) "
            "SELECT a.conv_id, n_turns, n_roles, dup_turn_idx, idx_gaps, "
            "n_empty_turns, n_role_repeats, starts_role "
            "FROM a JOIN r USING (conv_id) JOIN s USING (conv_id)"
        ),
        "chunk_documents": (
            "WITH w AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents) "
            "SELECT doc_id, "
            "unnest(list_transform(range(0, len(w), 8), s -> (s // 8)::BIGINT)) AS chunk_idx, "
            "unnest(list_transform(range(0, len(w), 8), s -> least(32, len(w) - s)::BIGINT)) AS n_tokens, "
            "unnest(list_transform(range(0, len(w), 8), "
            "s -> array_to_string(w[(s + 1)::INT : least(s + 32, len(w))::INT], ' '))) AS chunk_text "
            "FROM w WHERE len(w) > 0"
        ),
        "loop_stats_transcripts": (
            "WITH t AS (SELECT conv_id, turn_idx, role, text, "
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet')), "
            "o AS (SELECT conv_id, role, norm, "
            "CASE WHEN role = lag(role) OVER w AND norm = lag(norm) OVER w "
            "THEN 1 ELSE 0 END AS rep, row_number() OVER w AS rn FROM t "
            "WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, role, text)), "
            "runs AS (SELECT conv_id, rn - row_number() OVER ("
            "PARTITION BY conv_id, role, norm ORDER BY rn) AS grp, role, norm FROM o), "
            "rl AS (SELECT conv_id, count(*)::BIGINT AS runlen "
            "FROM runs GROUP BY conv_id, grp, role, norm), "
            "a AS (SELECT conv_id, count(*)::BIGINT AS n_turns, "
            "sum(rep)::BIGINT AS n_adjacent_repeats FROM o GROUP BY conv_id), "
            "m AS (SELECT conv_id, max(runlen)::BIGINT AS max_run FROM rl GROUP BY conv_id) "
            "SELECT a.conv_id, n_turns, n_adjacent_repeats, max_run "
            "FROM a JOIN m USING (conv_id)"
        ),
        "tool_stats_transcripts": (
            "WITH t AS (SELECT conv_id, coalesce(tool, '') AS tool "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet')), "
            "a AS (SELECT conv_id, count(*)::BIGINT AS n_turns FROM t GROUP BY conv_id), "
            "u AS (SELECT conv_id, tool, count(*)::BIGINT AS n FROM t "
            "WHERE tool <> '' GROUP BY conv_id, tool), "
            "agg AS (SELECT conv_id, sum(n)::BIGINT AS n_tool_turns, "
            "count(*)::BIGINT AS n_distinct_tools FROM u GROUP BY conv_id), "
            "top AS (SELECT conv_id, tool AS top_tool, n AS top_tool_count, "
            "row_number() OVER (PARTITION BY conv_id ORDER BY n DESC, tool ASC) AS rn FROM u) "
            "SELECT a.conv_id, a.n_turns, "
            "coalesce(agg.n_tool_turns, 0)::BIGINT AS n_tool_turns, "
            "coalesce(agg.n_distinct_tools, 0)::BIGINT AS n_distinct_tools, "
            "coalesce(tp.top_tool, '') AS top_tool, "
            "coalesce(tp.top_tool_count, 0)::BIGINT AS top_tool_count "
            "FROM a LEFT JOIN agg USING (conv_id) "
            "LEFT JOIN (SELECT * FROM top WHERE rn = 1) tp USING (conv_id)"
        ),
        "boilerplate_turns": (
            "SELECT text, count(*)::BIGINT AS n_occurrences, "
            "count(DISTINCT conv_id)::BIGINT AS n_convs "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet') "
            "GROUP BY text HAVING count(*) >= 3"
        ),
        "pack_chat_sequences": (
            "WITH t AS (SELECT conv_id, turn_idx, role, text "
            f"FROM read_parquet('{_CACHE_ROOT}/transcripts_sf0.01/turns/*.parquet')), "
            "n AS (SELECT conv_id, turn_idx, role, text, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens "
            "FROM t), "
            "c AS (SELECT conv_id, turn_idx::BIGINT AS turn_idx, n_tokens, "
            "(sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx, role, text "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS seq_start, "
            "(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS loss_mask FROM n) "
            "SELECT conv_id, turn_idx, seq_start, n_tokens, loss_mask, "
            "(seq_start // 512)::BIGINT AS pack_first, "
            "((seq_start + greatest(n_tokens, 1) - 1) // 512)::BIGINT AS pack_last "
            "FROM c"
        ),
        "stratified_sample_documents": (
            "SELECT doc_id, lang, text FROM documents "
            "WHERE substr(md5(doc_id::VARCHAR), 1, 2) < "
            "CASE lang WHEN 'en' THEN 'cc' WHEN 'de' THEN '40' "
            "WHEN 'fr' THEN '40' WHEN 'es' THEN '20' ELSE '0c' END"
        ),
        "repetition_stats_documents": (
            "WITH w AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), "
            "i -> w[i] || ' ' || w[i+1])) AS gram FROM w WHERE len(w) >= 2), "
            "c AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY doc_id, gram), "
            "top AS (SELECT doc_id, gram, cnt, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn FROM c) "
            "SELECT w.doc_id, len(w.w)::BIGINT AS n_words, "
            "len(list_distinct(w.w))::BIGINT AS n_distinct_words, "
            "coalesce(t.gram, '') AS top_bigram, "
            "coalesce(t.cnt, 0)::BIGINT AS top_bigram_count "
            "FROM w LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)"
        ),
        "token_heavy_hitters": (
            "WITH t AS (SELECT unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token "
            "FROM documents) "
            "SELECT token, count(*)::BIGINT AS n FROM t "
            "GROUP BY token HAVING count(*) >= 100"
        ),
        "shard_documents": (
            "WITH w AS (SELECT doc_id, "
            "CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS BIGINT) AS w "
            "FROM documents) "
            "SELECT doc_id, (w % 64)::BIGINT AS shard, "
            "(row_number() OVER (PARTITION BY w % 64 ORDER BY w, doc_id) - 1)::BIGINT AS pos "
            "FROM w"
        ),
        "mix_sources_documents": (
            "WITH base AS (SELECT doc_id, source, text, "
            "(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 0 "
            "WHEN 'src2' THEN 2 ELSE 1 END "
            "+ CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < "
            "(CASE source WHEN 'src0' THEN '66' WHEN 'src1' THEN '80' "
            "WHEN 'src2' THEN '00' ELSE '19' END) "
            "THEN 1 ELSE 0 END)::BIGINT AS n FROM documents) "
            "SELECT doc_id, source, text, "
            "unnest(range(n))::BIGINT AS copy_idx FROM base"
        ),
        "rollup_documents": (
            "SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sum_val, "
            "count(*)::BIGINT AS n_rows "
            "FROM documents GROUP BY ROLLUP (source, lang)"
        ),
        "cube_documents": (
            "SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sum_val, "
            "count(*)::BIGINT AS n_rows "
            "FROM documents GROUP BY CUBE (source, lang)"
        ),
        "rollup_documents_3key": (
            "SELECT source, lang, len_bucket, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_val, "
            "count(*)::BIGINT AS n_rows, "
            "CAST(min(n_chars) AS BIGINT) AS min_val, "
            "CAST(max(n_chars) AS BIGINT) AS max_val, "
            "avg(n_chars) AS avg_val "
            "FROM (SELECT source, lang, "
            "CASE WHEN n_chars < 200 THEN 'short' "
            "WHEN n_chars < 1000 THEN 'mid' ELSE 'long' END AS len_bucket, "
            "n_chars FROM documents) "
            "GROUP BY ROLLUP (source, lang, len_bucket)"
        ),
        "unigram_logfreq_documents": (
            "WITH tok AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf "
            "FROM tok GROUP BY doc_id, term), "
            "cnt AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term), "
            "per_doc AS (SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens, "
            "sum(tf.tf * ln(cnt.cnt)) AS s "
            "FROM tf JOIN cnt USING (term) GROUP BY tf.doc_id) "
            "SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens, "
            "CASE WHEN p.n_tokens > 0 THEN p.s / p.n_tokens END AS logfreq "
            "FROM documents d LEFT JOIN per_doc p USING (doc_id)"
        ),
        "source_overlap_documents": (
            "WITH toks AS (SELECT source, list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT source, "
            "w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g "
            "FROM toks, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3) "
            "SELECT a.source AS src_a, b.source AS src_b, "
            "count(*)::BIGINT AS shared_ngrams "
            "FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source "
            "GROUP BY 1, 2"
        ),
        "top_tokens_per_lang": (
            "WITH t AS (SELECT lang, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token "
            "FROM documents), "
            "c AS (SELECT lang, token, count(*)::BIGINT AS n "
            "FROM t GROUP BY lang, token), "
            "r AS (SELECT lang, token, n, row_number() OVER ("
            "PARTITION BY lang ORDER BY n DESC, token ASC) AS rnk FROM c) "
            "SELECT lang, token, n, rnk::BIGINT AS term_rank FROM r WHERE rnk <= 10"
        ),
        "session_stats": (
            "WITH s AS (SELECT event_id, user_id, ts, "
            "SUM(CASE WHEN prev_ts IS NULL OR "
            "date_diff('microsecond', prev_ts, ts) > 1800000000 "
            "THEN 1 ELSE 0 END) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS session_id "
            "FROM (SELECT event_id, user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events)), "
            "o AS (SELECT user_id, session_id, event_id, "
            "row_number() OVER (PARTITION BY user_id, session_id "
            "ORDER BY ts, event_id) AS rn FROM s), "
            "a AS (SELECT user_id, session_id, count(*)::BIGINT AS n_events, "
            "date_diff('microsecond', min(ts), max(ts))::BIGINT AS span_us "
            "FROM s GROUP BY user_id, session_id) "
            "SELECT a.user_id, CAST(a.session_id AS BIGINT) AS session_id, "
            "a.n_events, a.span_us, f.event_id AS first_event_id "
            "FROM a JOIN (SELECT * FROM o WHERE rn = 1) f "
            "USING (user_id, session_id)"
        ),
        "dedup_event_bursts": (
            "WITH o AS (SELECT event_id, user_id, event_type, ts, "
            "lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS pts FROM events) "
            "SELECT event_id, user_id, event_type, ts FROM o "
            "WHERE pts IS NULL OR date_diff('microsecond', pts, ts) > 60000000"
        ),
        "events_funnel": (
            "WITH e AS (SELECT user_id, event_type, ts FROM events "
            "WHERE event_type IN ('view', 'click', 'purchase')), "
            "s0 AS (SELECT user_id, min(ts) AS t0 FROM e "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "s1 AS (SELECT e.user_id, min(ts) AS t1 FROM e JOIN s0 USING (user_id) "
            "WHERE event_type = 'click' AND ts >= t0 GROUP BY e.user_id), "
            "s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id) "
            "WHERE event_type = 'purchase' AND ts >= t1 GROUP BY e.user_id), "
            "u AS (SELECT DISTINCT user_id FROM e) "
            "SELECT u.user_id, (CASE WHEN s2.user_id IS NOT NULL THEN 3 "
            "WHEN s1.user_id IS NOT NULL THEN 2 "
            "WHEN s0.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_stages "
            "FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id) "
            "LEFT JOIN s2 USING (user_id)"
        ),
        "gram_novelty_documents": (
            # string 4-grams (same construction as decontaminate),
            # min-doc-id window decides "earlier"
            "WITH w AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_distinct(list_transform("
            "range(1, len(w) - 2), i -> array_to_string(w[i:i+3], ' ')))) AS gram "
            "FROM w WHERE len(w) >= 4), "
            "m AS (SELECT gram, min(doc_id) AS md FROM g GROUP BY gram) "
            "SELECT g.doc_id, count(*)::BIGINT AS n_grams, "
            "sum(CASE WHEN m.md < g.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams "
            "FROM g JOIN m USING (gram) GROUP BY g.doc_id"
        ),
        "length_deciles_documents": (
            # quantile_disc cutpoints (rank ceil(q*n)) + strict-less count
            "WITH cuts AS (SELECT quantile_disc(n_chars, "
            "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c FROM documents) "
            "SELECT d.doc_id, d.n_chars::BIGINT AS n_chars, "
            "len(list_filter(cuts.c, x -> x < d.n_chars))::BIGINT AS decile "
            "FROM documents d, cuts"
        ),
        "events_pivot": (
            "SELECT user_id, "
            "count(*) FILTER (event_type = 'click')::BIGINT AS n_click, "
            "count(*) FILTER (event_type = 'error')::BIGINT AS n_error, "
            "count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase, "
            "count(*) FILTER (event_type = 'signup')::BIGINT AS n_signup, "
            "count(*) FILTER (event_type = 'view')::BIGINT AS n_view, "
            "count(*)::BIGINT AS n_total "
            "FROM events GROUP BY user_id"
        ),
        "tfidf_top_terms": (
            # ranking key tf*1.0/df is ONE exactly-rounded double
            # division — identical to the numpy kernel's tf/df
            "WITH t AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf "
            "FROM t GROUP BY doc_id, term), "
            "dfx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
            "FROM t GROUP BY term), "
            "s AS (SELECT tf.doc_id, tf.term, tf.tf, dfx.df, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf * 1.0 / dfx.df DESC, tf.term ASC) AS rn "
            "FROM tf JOIN dfx USING (term)) "
            "SELECT doc_id, term, tf, df, rn::BIGINT AS term_rank "
            "FROM s WHERE rn <= 3"
        ),
        "rare_token_stats": (
            "WITH t AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf "
            "FROM t GROUP BY doc_id, term), "
            "dfx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
            "FROM t GROUP BY term), "
            "agg AS (SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens, "
            "sum(CASE WHEN dfx.df <= 1 THEN tf.tf ELSE 0 END)::BIGINT AS n_rare, "
            "sum(CASE WHEN dfx.df <= 1 THEN 1 ELSE 0 END)::BIGINT AS n_distinct_rare "
            "FROM tf JOIN dfx USING (term) GROUP BY tf.doc_id) "
            "SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens, "
            "coalesce(a.n_rare, 0)::BIGINT AS n_rare, "
            "coalesce(a.n_distinct_rare, 0)::BIGINT AS n_distinct_rare "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "multimodal_features": (
            # byte statistics over the fake-codec payload (= utf8
            # bytes of text): hex-pair arithmetic mirrors numpy exactly
            "WITH m AS (SELECT doc_id, hex(encode(text)) AS hx, "
            "octet_length(encode(text))::BIGINT AS n FROM documents), "
            "b AS (SELECT doc_id, n, list_transform(range(0, n), "
            "i -> ('0x' || substr(hx, (2*i+1)::INT, 2))::BIGINT) AS bytes FROM m) "
            "SELECT doc_id, n AS n_bytes, "
            "coalesce(list_sum(bytes), 0)::BIGINT AS byte_sum, "
            "coalesce(list_max(bytes), 0)::BIGINT AS max_byte, "
            "coalesce(len(list_filter(bytes, x -> x >= 128)), 0)::BIGINT AS n_hi "
            "FROM b"
        ),
        "multimodal_audio": (
            # PCM16 mono samples derive from utf8 bytes: (b-128)*256 —
            # hex-pair arithmetic mirrors the wave-decoded numpy exactly
            "WITH m AS (SELECT doc_id, hex(encode(text)) AS hx, "
            "octet_length(encode(text))::BIGINT AS n FROM documents), "
            "s AS (SELECT doc_id, n, list_transform(range(0, n), "
            "i -> (('0x' || substr(hx, (2*i+1)::INT, 2))::BIGINT - 128) * 256) "
            "AS smp FROM m) "
            "SELECT doc_id, n AS n_samples, 8000::BIGINT AS sample_rate, "
            "(n * 1000) // 8000 AS duration_ms, "
            "coalesce(list_max(list_transform(smp, x -> abs(x))), 0)::BIGINT AS peak, "
            "coalesce(list_sum(list_transform(smp, x -> abs(x))), 0)::BIGINT AS sum_abs, "
            "coalesce(list_sum(list_transform(smp, x -> x * x)), 0)::BIGINT AS energy "
            "FROM s"
        ),
        "multimodal_frames": (
            # frame math over the fake codec: payload = utf8 bytes of
            # text, frames of 256 bytes, every 4th kept
            "WITH m AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS plen "
            "FROM documents), "
            "f AS (SELECT doc_id, plen, "
            "unnest(range(0, ((plen + 255) // 256)::BIGINT, 4)) AS frame_idx FROM m "
            "WHERE plen > 0) "
            "SELECT doc_id, frame_idx, "
            "least(256, plen - frame_idx * 256)::BIGINT AS frame_len FROM f"
        ),
        "pack_sequences": (
            # GPT-style concat-and-chunk layout, shard-local: window
            # cumsum per shard, integer-exact
            "WITH t AS (SELECT doc_id, doc_id % 64 AS shard, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n "
            "FROM documents), "
            "c AS (SELECT doc_id, shard, n, "
            "coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS seq_start "
            "FROM t) "
            "SELECT doc_id, shard, seq_start, seq_start // 512 AS pack_first, "
            "CASE WHEN n > 0 THEN (seq_start + n - 1) // 512 "
            "ELSE seq_start // 512 END AS pack_last FROM c"
        ),
        "curate_documents": (
            # the full composition: quality filter (>=10 ws tokens,
            # punct*5 <= chars) AND lang_pred='en', then exact text
            # dedup (min doc_id survives), then md5-prefix sample.
            # lang_pred is per-row, so computing it before or after
            # the quality filter is equivalent.
            "WITH q AS (SELECT doc_id, text, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens, "
            "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::BIGINT AS n_punct, "
            "length(text)::BIGINT AS n_chars FROM documents), "
            "f AS (SELECT doc_id, text, n_tokens FROM q "
            "WHERE n_tokens >= 10 AND n_punct * 5 <= n_chars), "
            "t AS (SELECT doc_id, text, n_tokens, "
            "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS toks "
            "FROM f), "
            "h AS (SELECT doc_id, text, n_tokens, "
            "len(list_intersect(toks, ['the','of','and','a','to','in','is','it','that','for','with','on','as'])) AS h_en, "
            "len(list_intersect(toks, ['le','la','les','de','des','et','un','une','est','que','pour','dans','du'])) AS h_fr, "
            "len(list_intersect(toks, ['el','la','los','las','de','y','un','una','es','que','para','en','del'])) AS h_es, "
            "len(list_intersect(toks, ['der','die','das','und','ein','eine','ist','zu','mit','für','auf','den'])) AS h_de "
            "FROM t), "
            "l AS (SELECT doc_id, text, n_tokens FROM h "
            "WHERE NOT regexp_matches(substr(text, 1, 400), '[\\x{4e00}-\\x{9fff}]') "
            "AND NOT (length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0 "
            "AND length(regexp_replace(substr(text, 1, 2000), '[^а-яА-Я]', '', 'g'))::DOUBLE "
            "/ length(regexp_replace(substr(text, 1, 2000), '[^\\p{L}]', '', 'g')) > 0.5) "
            "AND (h_en + h_fr + h_es + h_de > 0) "
            "AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_de), "
            "d AS (SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens "
            "FROM l GROUP BY text) "
            "SELECT doc_id, n_tokens FROM d "
            "WHERE substr(md5(doc_id::VARCHAR), 1, 2) < 'aa'"
        ),
    }
