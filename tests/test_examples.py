"""Smoke-run every examples/ script in-process (they share the pytest
session's Ray) — the examples are documentation that must not rot."""

from __future__ import annotations

import pytest

import examples.algorithm_comparison_example as alg
import examples.api_example as api_ex
import examples.curate_example as curate_ex
import examples.data_examples as data_ex
import examples.dedup_example as dedup_ex
import examples.mixing_example as mix_ex
import examples.multimodal_example as mm_ex
import examples.quality_example as qual_ex
import examples.search_example as search_ex
import examples.simple_example as simple_ex
import examples.transliteration_example as tr_ex


@pytest.mark.parametrize(
    "mod, checks",
    [
        (simple_ex, lambda r: r["n_matches"] > 0),
        (api_ex, lambda r: r["n_matches"] > 0),
        (tr_ex, lambda r: r["n_rows"] == 30 and r["best"] == "Shchukin"),
        (alg, lambda r: r["n_pairs"] == 5),
        (data_ex, lambda r: r["n_files"] >= 4 and r["n_truth"] > 0),
        (dedup_ex, lambda r: r["recall_hits"] >= r["n_truth"] - 2),
        (curate_ex, lambda r: 0 < r["n_out"] < r["n_in"]),
        (search_ex, lambda r: r["bm25_hits"] == 5 and r["knn_rows"] == 6),
        (mm_ex, lambda r: r["n_media"] == 8),
        (mix_ex, lambda r: r["rollup_rows"] == 10),
        (qual_ex, lambda r: r["worst_source"] == "scan" and r["overlap_pairs"] == 3),
    ],
    ids=lambda p: getattr(p, "__name__", "check"),
)
def test_example_runs(ray_session, mod, checks):
    res = mod.main()
    assert checks(res), res
