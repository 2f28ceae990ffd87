"""One-call programmatic facade (reference parity surface).

Mirrors ``fuzzy_matching/api.py:55-373`` — ``create_config`` /
``create_matcher`` / ``load_dataset`` / ``match_datasets`` /
``transliterate_dataset`` / ``generate_test_datasets`` /
``save_results`` — so a user of the reference's programmatic API can
switch with the same call shapes.  Differences, by design:

* list-of-dicts inputs run the serial ``ReferenceMatcher`` (exact
  reference semantics, right for small in-memory data); file-path
  inputs run the distributed Ray Data pipeline and return plain
  Python results.
* ``generate_test_datasets`` works (the reference's crashes on an
  undefined ``gen_fields`` — ``api.py:323,334``) and is seeded.
* algorithm names accept both enum-style (``"TOKEN_SORT"``) and value
  style (``"token_sort"``); unknown names warn and fall back, like the
  reference.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional, Union

from fuzzy_matching_ray.config import (
    FuzzyAlgorithm,
    MatchConfig,
    MatchFieldConfig,
    TransliterationConfig,
)

Record = dict[str, Any]


def _resolve_algorithm(name: Optional[str]) -> Optional[FuzzyAlgorithm]:
    if not name:
        return None
    try:
        return FuzzyAlgorithm[name.upper()]
    except KeyError:
        try:
            return FuzzyAlgorithm(name.lower())
        except ValueError:
            warnings.warn(f"unknown fuzzy algorithm {name!r}; falling back")
            return None


def create_config(
    fields: list[dict[str, Any]],
    threshold: float = 0.7,
    block_field: Optional[str] = None,
    transliteration_enabled: bool = False,
    transliteration_standard: str = "Passport",
    fuzzy_algorithm: Optional[str] = "TOKEN_SORT",
    sort_before_match: bool = False,
) -> MatchConfig:
    """Build a :class:`MatchConfig` from plain dicts (reference
    ``api.create_config``, ``api.py:55-128``).  Each field dict:
    ``{"field": name, "weight": w, "transliterate": bool,
    "algorithm": name}``."""
    match_fields = tuple(
        MatchFieldConfig(
            field=d["field"],
            weight=d.get("weight", 1.0),
            transliterate=d.get("transliterate", False),
            fuzzy_algorithm=_resolve_algorithm(d.get("algorithm")),
        )
        for d in fields
    )
    return MatchConfig(
        fields=match_fields,
        threshold=threshold,
        block_field=block_field,
        sort_before_match=sort_before_match,
        transliteration=TransliterationConfig(
            enabled=transliteration_enabled,
            standard=transliteration_standard,
            threshold=threshold,
        ),
        fuzzy_algorithm=_resolve_algorithm(fuzzy_algorithm) or FuzzyAlgorithm.TOKEN_SORT,
    )


def create_matcher(config: Optional[MatchConfig] = None, **kwargs):
    """Serial reference-semantics matcher (reference
    ``api.create_matcher``, ``api.py:131-145``)."""
    from fuzzy_matching_ray.pipelines.record_match import ReferenceMatcher

    if config is None:
        config = create_config(**kwargs) if kwargs else MatchConfig()
    return ReferenceMatcher(config)


def load_dataset(
    file_path: str,
    file_format: Optional[str] = None,
    field_mapping: Optional[dict[str, str]] = None,
) -> list[Record]:
    """Load a CSV/JSON/Parquet file into a list of string-valued
    records (reference ``api.load_dataset``, ``api.py:148-181``)."""
    from fuzzy_matching_ray.sources.io import load_dataset as _load

    ds = _load(file_path, file_format=file_format, name_fields=field_mapping)
    return [{k: str(v) if v is not None else "" for k, v in r.items()} for r in ds.take_all()]


def match_datasets(
    dataset1: Union[str, list[Record]],
    dataset2: Union[str, list[Record]],
    config: Optional[MatchConfig] = None,
    field_mapping: Optional[dict[str, str]] = None,
    **kwargs,
) -> tuple[list[dict], list[Record]]:
    """Match two datasets → ``(matches, consolidated)`` (reference
    ``api.match_datasets``, ``api.py:184-217``)."""
    matcher = create_matcher(config, **kwargs)
    data1 = load_dataset(dataset1, field_mapping=field_mapping) if isinstance(dataset1, str) else dataset1
    data2 = load_dataset(dataset2, field_mapping=field_mapping) if isinstance(dataset2, str) else dataset2
    return matcher.match_and_consolidate(data1, data2)


def transliterate_dataset(
    dataset: Union[str, list[Record]],
    target_lang: str = "en",
    transliteration_standard: str = "Passport",
    fields: Optional[list[str]] = None,
    field_mapping: Optional[dict[str, str]] = None,
) -> list[Record]:
    """Transliterate configured fields of a dataset (reference
    ``api.transliterate_dataset``, ``api.py:220-263``)."""
    data = load_dataset(dataset, field_mapping=field_mapping) if isinstance(dataset, str) else dataset
    if fields is None:
        fields = list(data[0].keys()) if data else []
    matcher = create_matcher(
        create_config(
            fields=[{"field": f} for f in fields],
            transliteration_enabled=True,
            transliteration_standard=transliteration_standard,
        )
    )
    return matcher.transliterate_data(data, target_lang, fields)


def generate_test_datasets(
    count: int = 100,
    language: str = "ru",
    seed: int = 42,
    double_char_probability: float = 0.1,
    change_char_probability: float = 0.05,
    suffix_probability: float = 0.1,
    email_noise_probability: float = 0.3,
    save_to_file: bool = False,
    output_original: Optional[str] = None,
    output_variant: Optional[str] = None,
    output_format: str = "json",
) -> tuple[list[Record], list[Record]]:
    """Seeded original/variant person fixtures (reference
    ``api.generate_test_datasets``, ``api.py:266-334`` — which crashes
    on an undefined ``gen_fields``; this one works)."""
    from fuzzy_matching_ray.datagen import PersonGenConfig, generate_person_records

    orig, var = generate_person_records(
        PersonGenConfig(
            n_records=count,
            seed=seed,
            language=language,
            double_char_probability=double_char_probability,
            change_char_probability=change_char_probability,
            suffix_probability=suffix_probability,
            email_noise_probability=email_noise_probability,
        )
    )
    if save_to_file:
        save_results(
            [], orig, consolidated_file=output_original, output_format=output_format
        )
        save_results(
            [], var, consolidated_file=output_variant, output_format=output_format
        )
    return orig, var


def save_results(
    matches: list[dict],
    consolidated: list[Record],
    matches_file: Optional[str] = None,
    consolidated_file: Optional[str] = None,
    output_format: str = "json",
) -> None:
    """Write matches / consolidated records as JSON or CSV (reference
    ``api.save_results``, ``api.py:337-373``)."""
    import csv
    import json

    def _dump(rows: list[dict], path: str) -> None:
        if output_format == "json":
            with open(path, "w", encoding="utf-8") as f:
                json.dump(rows, f, ensure_ascii=False, indent=4)
        elif output_format == "csv":
            with open(path, "w", encoding="utf-8", newline="") as f:
                if rows:
                    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                    w.writeheader()
                    w.writerows(rows)
        else:
            raise ValueError(f"unknown output_format {output_format!r}")

    if matches_file:
        flat = [
            {
                **{f"o_{k}": v for k, v in m["original"].items()},
                **{f"v_{k}": v for k, v in m["variant"].items()},
                "similarity": round(m["similarity"], 2),
            }
            for m in matches
        ]
        _dump(flat, matches_file)
    if consolidated_file:
        _dump(consolidated, consolidated_file)
