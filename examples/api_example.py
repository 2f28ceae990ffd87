"""API facade tour (reference examples/api_example.py): generate →
save → load → match → save results, all through fuzzy_matching_ray.api."""

from __future__ import annotations

import os

from examples._common import ensure_ray, finish_ray, print_table, scratch_dir


def main() -> dict:
    from fuzzy_matching_ray.api import (
        create_config,
        generate_test_datasets,
        load_dataset,
        match_datasets,
        save_results,
    )

    owned = ensure_ray()
    try:
        out = scratch_dir("api")
        orig_path = os.path.join(out, "originals.json")
        var_path = os.path.join(out, "variants.json")
        generate_test_datasets(
            count=40,
            language="ru",
            seed=3,
            save_to_file=True,
            output_original=orig_path,
            output_variant=var_path,
        )
        originals = load_dataset(orig_path)
        variants = load_dataset(var_path)
        config = create_config(
            fields=[
                {"field": "last_name", "weight": 0.5},
                {"field": "first_name", "weight": 0.3},
                {"field": "middle_name", "weight": 0.2},
            ],
            threshold=0.65,
            sort_before_match=True,
        )
        matches, consolidated = match_datasets(originals, variants, config)
        save_results(
            matches,
            consolidated,
            matches_file=os.path.join(out, "matches.json"),
            consolidated_file=os.path.join(out, "consolidated.csv"),
            output_format="json",
        )
        print_table(
            [{"file": f} for f in sorted(os.listdir(out))], title="written files"
        )
        return {"n_matches": len(matches), "out_dir": out}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
