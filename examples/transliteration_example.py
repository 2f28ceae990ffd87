"""Transliteration across all three standards (reference
examples/transliteration_example.py): per-name ru→en under GOST /
Scientific / Passport, best-match scoring, and the distributed
dataset path."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    import ray.data as rd

    from fuzzy_matching_ray.api import generate_test_datasets
    from fuzzy_matching_ray.functions.translit import (
        all_transliterations,
        best_transliteration_match,
        to_target_language,
    )
    from fuzzy_matching_ray.pipelines.record_match import transliterate_dataset

    owned = ensure_ray()
    try:
        names = ["Иванов", "Пётр", "Щукин", "Юрьев"]
        rows = []
        for n in names:
            rows.append({"name": n, **all_transliterations(n)})
        print_table(rows, title="per-standard transliteration")
        cand, std, score = best_transliteration_match(
            "Щукин", ["Shchukin", "Schukin", "Shukin"]
        )
        print(f"best match for Щукин: {cand} ({std}, score={score:.2f})")
        assert to_target_language("Иванов", "en") == all_transliterations("Иванов")["Passport"]

        originals, _ = generate_test_datasets(count=30, language="ru", seed=5)
        ds = rd.from_items(originals)
        out = transliterate_dataset(
            ds, "en", ["last_name", "first_name", "middle_name"]
        ).to_pandas()
        print_table(out.to_dict("records"), title="distributed dataset path")
        return {"n_rows": len(out), "best": cand}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
