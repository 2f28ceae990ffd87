"""Similarity-channel registry (SURVEY.md §2.11 — the engine's
user-extension surface, generalizing the reference's pluggable
per-field algorithm enum, ``match_config_classes.py:30``, and
transliteration-standard registry, ``transliteration_utils.py:35-58``).

A *channel* is a candidate-pair generator: a callable
``(uniq_docs, sigs, cfg) -> Dataset`` emitting PAIR_SCHEMA rows
(``stages/minhash.py``).  ``dedup_transcripts`` resolves its
``channels=("minhash", ...)`` tuple through this registry, so a user
can plug a custom blocking strategy (e.g. a metadata-key channel or a
model-embedding LSH) without touching the pipeline:

    from fuzzy_matching_ray.stages.channels import register_channel

    @register_channel("byline")
    def byline_pairs(uniq_docs, sigs, cfg):
        ...return candidate-pair Dataset...

    dedup_transcripts(turns, cfg, channels=("minhash", "byline"))

``sigs`` is the MinHash signature dataset when the minhash channel is
active, else ``None`` — channels that need it must declare so by
raising a clear error.
"""

from __future__ import annotations

from typing import Callable, Optional

import ray.data

from fuzzy_matching_ray.config import PipelineConfig

ChannelFn = Callable[
    [ray.data.Dataset, Optional[ray.data.Dataset], PipelineConfig], ray.data.Dataset
]

_REGISTRY: dict[str, ChannelFn] = {}


def register_channel(name: str) -> Callable[[ChannelFn], ChannelFn]:
    """Decorator: register a candidate-pair generator under ``name``."""

    def _wrap(fn: ChannelFn) -> ChannelFn:
        _REGISTRY[name] = fn
        return fn

    return _wrap


def get_channel(name: str) -> ChannelFn:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown channel {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_channels() -> list[str]:
    return sorted(_REGISTRY)


# --- built-in channels ------------------------------------------------------


@register_channel("minhash")
def _minhash_channel(
    uniq_docs: ray.data.Dataset,
    sigs: Optional[ray.data.Dataset],
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    from fuzzy_matching_ray.stages.minhash import (
        candidate_pairs_from_buckets,
        minhash_band_rows,
    )

    if sigs is None:
        raise ValueError("minhash channel requires the signature dataset")
    band_rows = minhash_band_rows(sigs, cfg)
    return candidate_pairs_from_buckets(band_rows, cfg, "minhash", cfg.num_partitions)


@register_channel("simhash")
def _simhash_channel(
    uniq_docs: ray.data.Dataset,
    sigs: Optional[ray.data.Dataset],
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    from fuzzy_matching_ray.stages.minhash import candidate_pairs_from_buckets
    from fuzzy_matching_ray.stages.simhash import simhash_band_rows

    srows = simhash_band_rows(uniq_docs, cfg)
    return candidate_pairs_from_buckets(srows, cfg, "simhash", cfg.num_partitions)


@register_channel("substring")
def _substring_channel(
    uniq_docs: ray.data.Dataset,
    sigs: Optional[ray.data.Dataset],
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    from fuzzy_matching_ray.stages.suffix_array import substring_pairs

    return substring_pairs(uniq_docs, cfg)
