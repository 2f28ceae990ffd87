"""Record-linkage surface: the reference's match/consolidate pipeline.

Two implementations sharing the same kernels:

* ``ReferenceMatcher`` — a pure-Python reimplementation of the
  reference's *observed* semantics (``core/data_matcher.py``), used as
  the parity oracle for small fixtures and as a drop-in API for users
  of the reference.  Reproduced quirks (SURVEY.md §7.4):

  - records with an empty blocking value are silently excluded from
    matching (``data_matcher.py:246-248,256-258``);
  - the low-similarity consolidation branch is dead code —
    ``process_block`` already filters at the threshold
    (``:455-460``);
  - ``MatchConfig.length_weight`` is never read; cleanliness looks up
    a weight for a field literally named ``'length'`` (``:270``);
  - greedy 1:1 matching is input-order dependent unless
    ``sort_before_match`` (``:427-430``).

* ``match_records`` — the distributed Ray Data version: first-char
  blocking becomes a grouped shuffle; each block is greedily matched
  with the same kernel, so with ``sort_before_match=True`` the
  distributed output equals the oracle's exactly (blocks are
  independent and internally deterministic).
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
import ray.data

from fuzzy_matching_ray.config import MatchConfig
from fuzzy_matching_ray.functions import translit
from fuzzy_matching_ray.functions.normalize import normalize_name
from fuzzy_matching_ray.functions.similarity import similarity, token_sort_ratio

_SPECIAL = re.compile(r"[^a-zA-Zа-яА-Я0-9\s]")
_RU = re.compile(r"[а-яА-ЯёЁ]")
_EN = re.compile(r"[a-zA-Z]")

Record = dict[str, Any]


class ReferenceMatcher:
    """Pure-Python matcher with the reference's observed behavior."""

    def __init__(self, config: MatchConfig):
        self.config = config
        self.match_fields = [f.field for f in config.fields]
        self.weights = {f.field: f.weight for f in config.fields}
        self.threshold = config.threshold

    # --- scoring ----------------------------------------------------------

    def _evaluate_transliteration_quality(
        self, source_text: str, transliterated: str, target_text: str
    ) -> float:
        """0.6·token_sort + 0.3·char-class ratio + 0.1·length ratio
        (reference ``data_matcher.py:283-329``)."""
        if not source_text or not transliterated or not target_text:
            return 0.0
        semantic = token_sort_ratio(transliterated.lower(), target_text.lower()) / 100.0
        pattern = _RU if translit.detect_language(target_text) == "ru" else _EN
        total = len(transliterated.strip())
        if total == 0:
            return 0.0
        char_quality = len(pattern.findall(transliterated)) / total
        target_len = len(target_text.strip())
        if target_len == 0:
            length_ratio = 0.0
        else:
            length_ratio = max(0.0, 1 - abs(len(transliterated.strip()) - target_len) / target_len)
        return semantic * 0.6 + char_quality * 0.3 + length_ratio * 0.1

    def _process_transliteration(self, v1: str, v2: str) -> tuple[str, str, float]:
        """Cross-script pair handling (reference ``data_matcher.py:331-410``):
        detect both languages; same/undetected → token_sort similarity;
        different → transliterate in both directions and keep whichever
        direction scores the higher quality."""
        if not v1 or not v2:
            return v1, v2, 0.0
        lang1 = translit.detect_language(v1)
        lang2 = translit.detect_language(v2)
        if lang1 is None or lang2 is None:
            sim = token_sort_ratio(v1.lower(), v2.lower()) / 100.0
            return v1, v2, sim
        if self.config.transliteration.normalize_names:
            v1 = normalize_name(v1)
            v2 = normalize_name(v2)
        std = translit.get_standard(self.config.transliteration.standard)
        if lang1 != lang2 and {lang1, lang2} == {"ru", "en"}:
            if lang1 == "ru":
                v1_en = translit.transliterate_ru_to_en(v1, std)
                q1 = self._evaluate_transliteration_quality(v1, v1_en, v2)
                v2_ru = translit.transliterate_en_to_ru(v2, std)
                q2 = self._evaluate_transliteration_quality(v2, v2_ru, v1)
                return (v1_en, v2, q1) if q1 >= q2 else (v1, v2_ru, q2)
            else:
                v1_ru = translit.transliterate_en_to_ru(v1, std)
                q1 = self._evaluate_transliteration_quality(v1, v1_ru, v2)
                v2_en = translit.transliterate_ru_to_en(v2, std)
                q2 = self._evaluate_transliteration_quality(v2, v2_en, v1)
                return (v1_ru, v2, q1) if q1 >= q2 else (v1, v2_en, q2)
        sim = token_sort_ratio(v1.lower(), v2.lower()) / 100.0
        return v1, v2, sim

    def weighted_similarity(self, r1: Record, r2: Record) -> tuple[float, list]:
        """Σ(sim·w)/Σ(w) over configured fields (reference
        ``data_matcher.py:186-230``)."""
        sims: list[float] = []
        weights: list[float] = []
        field_sims = []
        for fc in self.config.fields:
            v1 = r1.get(fc.field, "")
            v2 = r2.get(fc.field, "")
            if fc.transliterate and self.config.transliteration.enabled:
                v1, v2, _ = self._process_transliteration(v1, v2)
            algo = (fc.fuzzy_algorithm or self.config.fuzzy_algorithm).value
            sim = similarity(v1, v2, algo)
            field_sims.append((fc.field, v1, v2, sim))
            sims.append(sim)
            weights.append(fc.weight)
        if not sims:
            return 0.0, []
        tw = sum(weights)
        return (sum(s * w for s, w in zip(sims, weights)) / tw if tw > 0 else 0.0), field_sims

    # --- blocking / matching ---------------------------------------------

    def _sort_data(self, recs: list[Record]) -> list[Record]:
        key_field = self.config.sort_field
        if key_field:
            return sorted(recs, key=lambda r: str(r.get(key_field, "")))
        return sorted(recs, key=lambda r: tuple(str(r.get(f, "")) for f in self.match_fields))

    def block(self, recs: list[Record]) -> dict[str, list[Record]]:
        """First-char blocking; empty block values excluded (reference
        ``data_matcher.py:232-260``; the broken nested group_fields path
        is intentionally not reproduced — SURVEY.md B2)."""
        if self.config.block_field is None:
            return {"ALL": list(recs)}
        blocks: dict[str, list[Record]] = {}
        for rec in recs:
            val = str(rec.get(self.config.block_field, "") or "")
            if not val:
                continue
            blocks.setdefault(val[0].upper(), []).append(rec)
        return blocks

    def process_block(self, block1: list[Record], block2: list[Record]) -> list[dict]:
        """Greedy 1:1 argmax matching (reference ``data_matcher.py:640-685``)."""
        matches = []
        used2: set[int] = set()
        for r1 in block1:
            best_sim = 0.0
            best_j = None
            for j, r2 in enumerate(block2):
                if j in used2:
                    continue
                sim, _ = self.weighted_similarity(r1, r2)
                if sim > best_sim:
                    best_sim = sim
                    best_j = j
            if best_sim >= self.threshold and best_j is not None:
                matches.append(
                    {"original": r1, "variant": block2[best_j], "similarity": best_sim}
                )
                used2.add(best_j)
        return matches

    def select_cleaner_record(self, r1: Record, r2: Record) -> Record:
        """Fewer special chars wins; 'length' weight quirk preserved;
        tie → shorter combined text (reference ``data_matcher.py:262-281``)."""

        def score(rec: Record) -> float:
            combined = " ".join(str(rec.get(f, "")) for f in self.match_fields)
            return len(_SPECIAL.findall(combined)) + len(combined) * self.weights.get("length", 0)

        s1, s2 = score(r1), score(r2)
        if s1 < s2:
            return r1
        if s2 < s1:
            return r2
        l1 = sum(len(str(r1.get(f, ""))) for f in self.match_fields)
        l2 = sum(len(str(r2.get(f, ""))) for f in self.match_fields)
        return r1 if l1 <= l2 else r2

    def match_and_consolidate(
        self, data1: list[Record], data2: list[Record]
    ) -> tuple[list[dict], list[Record]]:
        """Reference ``data_matcher.py:412-499`` (the dead low-similarity
        branch folds away: process_block already thresholds)."""
        data1 = [dict(r) for r in data1]
        data2 = [dict(r) for r in data2]
        if self.config.sort_before_match:
            data1 = self._sort_data(data1)
            data2 = self._sort_data(data2)
        matches: list[dict] = []
        if self.config.block_field:
            b1 = self.block(data1)
            b2 = self.block(data2)
            for key in b1:
                if key in b2:
                    matches.extend(self.process_block(b1[key], b2[key]))
        else:
            matches.extend(self.process_block(data1, data2))

        consolidated: list[Record] = []
        used1: set[int] = set()
        used2: set[int] = set()
        for m in matches:
            consolidated.append(self.select_cleaner_record(m["original"], m["variant"]))
            used1.add(id(m["original"]))
            used2.add(id(m["variant"]))
        for rec in data1:
            if id(rec) not in used1:
                consolidated.append(dict(rec))
        for rec in data2:
            if id(rec) not in used2:
                consolidated.append(dict(rec))
        return matches, consolidated

    def transliterate_data(
        self, data: list[Record], target_lang: str, fields: list[str]
    ) -> list[Record]:
        """Reference ``data_matcher.py:501-547``: per record/field —
        detect language, skip if already target, transliterate with the
        configured standard, restore capitalization."""
        std = translit.get_standard(self.config.transliteration.standard)
        out = []
        for rec in data:
            rec = dict(rec)
            for f in fields:
                val = str(rec.get(f, "") or "")
                if not val:
                    continue
                lang = translit.detect_language(val)
                if lang is None or lang == target_lang:
                    continue
                if target_lang == "en":
                    t = translit.transliterate_ru_to_en(val, std)
                elif target_lang == "ru":
                    t = translit.transliterate_en_to_ru(val, std)
                else:
                    continue
                if val[:1].isupper() and t:
                    t = t[0].upper() + t[1:]
                rec[f] = t
            out.append(rec)
        return out


# ---------------------------------------------------------------------------
# distributed version


def _flatten_matches(matches: list[dict], fields: list[str]) -> pd.DataFrame:
    rows = []
    for m in matches:
        row = {"similarity": m["similarity"]}
        for f in fields:
            row["o_" + f] = str(m["original"].get(f, ""))
            row["v_" + f] = str(m["variant"].get(f, ""))
        rows.append(row)
    cols = ["similarity"] + ["o_" + f for f in fields] + ["v_" + f for f in fields]
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype=float if c == "similarity" else object) for c in cols})
    return pd.DataFrame(rows)[cols]


def match_records(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    config: MatchConfig,
    *,
    all_fields: list[str] | None = None,
) -> ray.data.Dataset:
    """Distributed match: block on the first character of
    ``config.block_field`` via a grouped shuffle, then run the greedy
    kernel per block.  With ``sort_before_match=True`` the result is
    identical to ``ReferenceMatcher`` on the same inputs.

    **Parallelism ceiling (by design):** the reference's greedy 1:1
    matcher is order-dependent *within* a block, so a block cannot be
    split without changing its output — the distributed ceiling is the
    number of first-char blocks (≤ alphabet size) and a hot block costs
    O(|b1|·|b2|).  This is reference-semantics fidelity, not an
    accident; for large-scale similarity matching use the LSH dedup
    pipeline (``pipelines.dedup``), whose blocking is content-hashed
    and skew-salted.

    Returns a matches Dataset with columns ``similarity``, ``o_<field>``
    and ``v_<field>`` for every matched pair.
    """
    import pyarrow as pa

    if all_fields is None:
        all_fields = [f for f in ds1.schema().names]
    block_field = config.block_field

    def _tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if block_field is None:
                keys = pa.array(["ALL"] * batch.num_rows, pa.string())
            else:
                vals = batch[block_field].to_pylist()
                keys = pa.array(
                    [(str(v)[0].upper() if v else "") for v in vals], pa.string()
                )
            return batch.append_column("block_key", keys).append_column(
                "side", pa.array([side] * batch.num_rows, pa.int8())
            )

        return fn

    tagged = ds1.map_batches(_tag(1), batch_format="pyarrow").union(
        ds2.map_batches(_tag(2), batch_format="pyarrow")
    )
    if block_field is not None:
        # vectorized expression filter — a per-row Python lambda costs
        # one interpreter call per record on the hot path
        tagged = tagged.filter(expr="block_key != ''")

    matcher_cfg = config

    def _match_block(df: pd.DataFrame) -> pd.DataFrame:
        matcher = ReferenceMatcher(matcher_cfg)
        recs1 = df[df["side"] == 1].drop(columns=["block_key", "side"]).to_dict("records")
        recs2 = df[df["side"] == 2].drop(columns=["block_key", "side"]).to_dict("records")
        if not recs1 or not recs2:
            return _flatten_matches([], all_fields)
        if matcher_cfg.sort_before_match:
            recs1 = matcher._sort_data(recs1)
            recs2 = matcher._sort_data(recs2)
        return _flatten_matches(matcher.process_block(recs1, recs2), all_fields)

    return tagged.groupby("block_key").map_groups(_match_block, batch_format="pandas")


def transliterate_dataset(
    ds: ray.data.Dataset,
    target_lang: str,
    fields: list[str],
    standard: str = "Passport",
) -> ray.data.Dataset:
    """Distributed column transliteration (reference mode
    ``--mode transliterate``, ``cli/process_data.py:627-710``)."""
    std_name = standard

    def _tr(batch: pd.DataFrame) -> pd.DataFrame:
        std = translit.get_standard(std_name)
        for f in fields:
            if f not in batch.columns:
                continue

            def one(val: str) -> str:
                val = str(val or "")
                if not val:
                    return val
                lang = translit.detect_language(val)
                if lang is None or lang == target_lang:
                    return val
                if target_lang == "en":
                    t = translit.transliterate_ru_to_en(val, std)
                elif target_lang == "ru":
                    t = translit.transliterate_en_to_ru(val, std)
                else:
                    return val
                if val[:1].isupper() and t:
                    t = t[0].upper() + t[1:]
                return t

            batch[f] = batch[f].map(one)
        return batch

    return ds.map_batches(_tr, batch_format="pandas")
