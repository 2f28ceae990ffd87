"""Minimal record-matching walkthrough (reference
examples/simple_example.py): generate noisy person data, run the
weighted fuzzy matcher, print the matches."""

from __future__ import annotations

from examples._common import ensure_ray, finish_ray, print_table


def main() -> dict:
    from fuzzy_matching_ray.api import create_config, generate_test_datasets, match_datasets

    owned = ensure_ray()
    try:
        originals, variants = generate_test_datasets(count=60, language="mixed", seed=7)
        config = create_config(
            fields=[
                {"field": "last_name", "weight": 0.4},
                {"field": "first_name", "weight": 0.3},
                {"field": "middle_name", "weight": 0.2},
                {"field": "email", "weight": 0.1},
            ],
            threshold=0.7,
            block_field="last_name",
            sort_before_match=True,
        )
        matches, consolidated = match_datasets(originals, variants, config)
        print_table(
            [
                {
                    "original": m["original"]["id"],
                    "variant": m["variant"]["id"],
                    "similarity": round(m["similarity"], 3),
                }
                for m in matches
            ],
            title="matches",
        )
        print(f"{len(matches)} matches, {len(consolidated)} consolidated records")
        return {"n_matches": len(matches), "n_consolidated": len(consolidated)}
    finally:
        finish_ray(owned)


if __name__ == "__main__":
    main()
