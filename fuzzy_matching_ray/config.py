"""Configuration dataclasses.

Mirrors the *surface* of the reference's config model
(``fuzzy_matching/core/match_config_classes.py:6-75``) — field-weighted
fuzzy scoring, per-field algorithm override, transliteration toggles,
blocking — and adds the Ray-Data pipeline knobs (shingle size, MinHash
permutations, LSH bands, SimHash bits, skew caps, checkpointing).

All configs are frozen; ``PipelineConfig.config_hash()`` fingerprints
the parameters so checkpoint lineage can refuse to mix configs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional


class FuzzyAlgorithm(str, Enum):
    """Fuzzy string-similarity algorithm selector.

    Same five algorithms as the reference enum
    (``match_config_classes.py:6-14``); the kernels are our own
    implementations (``functions/similarity.py``).
    """

    RATIO = "ratio"
    PARTIAL_RATIO = "partial_ratio"
    TOKEN_SORT = "token_sort"
    TOKEN_SET = "token_set"
    WRATIO = "wratio"


@dataclass(frozen=True)
class MatchFieldConfig:
    """One field participating in weighted record matching.

    Reference: ``match_config_classes.py:17-30``.
    """

    field: str
    weight: float = 1.0
    transliterate: bool = False
    fuzzy_algorithm: Optional[FuzzyAlgorithm] = None


@dataclass(frozen=True)
class TransliterationConfig:
    """Reference: ``match_config_classes.py:33-48``."""

    enabled: bool = False
    standard: str = "Passport"  # "GOST" | "Scientific" | "Passport"
    threshold: float = 0.7
    auto_detect: bool = True
    normalize_names: bool = True


@dataclass(frozen=True)
class MatchConfig:
    """Record-matching configuration (reference surface).

    Reference: ``match_config_classes.py:51-75``.  ``length_weight`` is
    kept for API parity; note the reference never reads it (it looks up
    a field literally named ``'length'`` — ``data_matcher.py:270``), and
    our cleanliness scorer reproduces that observed behavior.
    """

    fields: tuple[MatchFieldConfig, ...] = ()
    length_weight: float = 0.0
    threshold: float = 0.7
    block_field: Optional[str] = None
    group_fields: tuple[str, ...] = ()
    sort_before_match: bool = False
    sort_field: Optional[str] = None
    transliteration: TransliterationConfig = field(default_factory=TransliterationConfig)
    fuzzy_algorithm: FuzzyAlgorithm = FuzzyAlgorithm.RATIO


@dataclass(frozen=True)
class PipelineConfig:
    """Near-duplicate pipeline configuration (the Ray-Data engine).

    The LSH parameters follow Broder (1997) / Leskovec-Rajaraman-Ullman
    ch.3: ``num_perm = bands * rows_per_band``; the S-curve threshold is
    roughly ``(1/bands)^(1/rows_per_band)``.
    """

    seed: int = 42

    # document assembly
    turn_separator: str = "\n"

    # canonicalization
    lowercase: bool = True
    nfkc: bool = True
    collapse_whitespace: bool = True
    fold_yo: bool = True  # ё→е, as the reference's normalize_name_ru does

    # MinHash / LSH channel.  42 bands × 3 rows → S-curve threshold
    # (1/42)^(1/3) ≈ 0.29: a pair at true Jaccard 0.5 is caught with
    # p ≈ 0.996, which is what the ≥0.99 dup-pair recall gate needs
    # (accepted pairs can sit as low as ~0.5 Jaccard when their edit
    # similarity clears the reference's 0.7 ratio threshold).
    shingle_k: int = 5
    num_perm: int = 126
    bands: int = 42
    rows_per_band: int = 3

    # SimHash channel
    simhash_bits: int = 64
    simhash_bands: int = 4  # bands over the 64 bits; radius = bands-1 guaranteed

    # suffix-array channel
    min_substring_len: int = 64

    # skew handling: buckets larger than max_band_bucket are salted
    # into sorted chunks; each bucket emits at most max_pairs_per_bucket
    # cross pairs (further chunks add only chain-link candidates).  A
    # band shared by thousands of docs is boilerplate ("stopword band")
    # — its cross pairs are both quadratic and uninformative, and every
    # skipped pair is accounted in the dropped-pairs metric.
    max_band_bucket: int = 64
    max_pairs_per_bucket: int = 2016  # C(64,2)
    # hot-bucket strategy: 'budget' (default — sorted-id chunks under
    # the pair budget above; skipped cross pairs counted on __skew
    # sentinels) or 'resalt' — re-band the hot bucket's members by a
    # salt key derived from `resalt_rows` extra signature rows (finer
    # LSH): members agreeing on the salt emit full pairs, the rest are
    # separated the same way non-colliding docs are separated by any
    # LSH band, counted EXACTLY on a __resalt sentinel
    # (`resalted_pairs_hot_buckets`).  On boilerplate-heavy corpora
    # resalt keeps recall concentrated on pairs whose signatures agree
    # beyond the stopword band instead of arbitrary sorted-id chunks.
    hot_bucket_mode: str = "budget"
    # signature rows mixed into the salt key (P[same salt | Jaccard j]
    # ≈ j^resalt_rows: 0.41 at j=0.8, 1e-4 at j=0.1)
    resalt_rows: int = 4

    # verification: accept a pair if shingle Jaccard >= jaccard_threshold,
    # OR if its Indel edit similarity >= edit_accept_threshold (the
    # reference's ratio-threshold semantic, data_matcher.py:671).  The
    # (expensive) edit kernel only runs in the gray zone
    # [edit_gate_low, jaccard_threshold).
    jaccard_threshold: float = 0.7
    edit_accept_threshold: float = 0.7
    # lower bound of the Jaccard gray zone in which the (expensive)
    # edit kernel runs.  Empirically every true-dup pair that needs the
    # edit channel (jac < 0.7, edit ≥ 0.7) sits at jac ≥ 0.507 on the
    # synthetic corpus — 0.45 keeps a 0.05 margin while cutting indel
    # invocations ~100× vs 0.3 (candidates in [0.3, 0.45) are ~6% of
    # the LSH stream; [0.45, 0.7) is ~0.06%).  Pairs below this bound
    # with high edit similarity are intentionally not edges (documented
    # deviation from pure reference ratio semantics; lower it for
    # adversarial heavy-rewrite data).
    edit_gate_low: float = 0.45
    # signature-estimate gate: pairs whose MinHash-estimated Jaccard
    # (mean signature agreement, std ≈ sqrt(J(1-J)/num_perm) ≈ 0.04)
    # falls below this never reach the exact shingle-intersection /
    # edit kernels.  An edge requires true Jaccard ≥ edit_gate_low
    # (0.45), so 0.30 sits >3σ below any pair that could still become
    # an edge while rejecting the mass of LSH background collisions
    # whose true Jaccard hugs the ~0.29 banding threshold.  Set to 0
    # to disable.
    sig_est_gate: float = 0.30
    # bitmap union-popcount prefilter: each doc carries a fixed-size
    # bit-set sketch (shingle hash → bit h & (bits-1)) in the broadcast
    # store.  popcount(bits_A | bits_B) ≤ |A ∪ B| exactly (collisions
    # only merge bits), so i_ub = |A|+|B|−popcount is an EXACT upper
    # bound on |A ∩ B| and pairs with i_ub·(1+lo) < lo·(|A|+|B|) are
    # provably below the gray-zone floor lo = min(edit_gate_low,
    # jaccard_threshold) — bit-identical edges, no recall loss.
    # Measured at scale72000: culls 94% of sig-gate passers while
    # reading 2×1 KB bitmap rows instead of 2×~3.1 KB shingle sets, the
    # bandwidth cut that lifts verify scaling at high CPU counts.
    # Must be a power of two ≥ 64; 0 disables.
    bitmap_bits: int = 8192
    verify_batch_size: int = 4096
    # verify executor: 'tasks' (stateless map tasks + per-worker
    # verifier cache — lands on warm workers, no actor-spawn ramp) or
    # 'actors' (fixed actor pool).  Same kernels either way.
    verify_executor: str = "tasks"
    # pool ceilings; actual pool size is clamped to cluster CPUs − 2 at
    # stage construction (see verify_pairs / compute_signatures)
    verify_concurrency: int = 32
    sig_batch_size: int = 1024
    sig_concurrency: int = 32

    # docs block granularity: signature/band/verify TASK parallelism is
    # bounded by the docs block count (map_batches schedules one task
    # per block; batch_size only re-chunks within a task).  When the
    # corpus arrives as fewer input units (files / assembly partitions)
    # than ~4× the cluster CPUs, a StreamingRepartition (task-local
    # split, NO all-to-all) re-slices the assembled docs to this many
    # rows per block so every downstream stage can use the whole
    # cluster.  At real scale (files ≫ cores) the split is skipped.
    docs_rows_per_block: int = 256

    # checkpointing
    workdir: Optional[str] = None
    num_partitions: int = 16

    def config_hash(self) -> str:
        payload = json.dumps(dataclasses.asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.simhash_bits % self.simhash_bands != 0:
            raise ValueError("simhash_bits must divide evenly into simhash_bands")
        if self.hot_bucket_mode not in ("budget", "resalt"):
            raise ValueError(
                f"hot_bucket_mode must be 'budget' or 'resalt', got {self.hot_bucket_mode!r}"
            )
        if not 1 <= self.resalt_rows <= self.num_perm:
            raise ValueError(
                f"resalt_rows ({self.resalt_rows}) must be in [1, num_perm={self.num_perm}]"
            )
        if self.bitmap_bits and (
            self.bitmap_bits < 64 or self.bitmap_bits & (self.bitmap_bits - 1)
        ):
            raise ValueError(
                f"bitmap_bits ({self.bitmap_bits}) must be 0 or a power of two >= 64"
            )
