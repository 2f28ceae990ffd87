"""The five fuzzy similarity algorithms side by side (reference
examples/algorithm_comparison_example.py): same pairs, all kernels."""

from __future__ import annotations

from examples._common import print_table

PAIRS = [
    ("Иванов Иван", "Иванов Иван"),
    ("Иванов Иван", "Иван Иванов"),          # word order
    ("Smith John", "Smith Jon"),              # typo
    ("Anderson", "Andersen Anderson Jr"),     # subset + extras
    ("hello world", "completely different"),
]


def main() -> dict:
    from fuzzy_matching_ray.functions.similarity import similarity

    algos = ("ratio", "partial_ratio", "token_sort", "token_set", "wratio")
    rows = []
    for a, b in PAIRS:
        rows.append(
            {
                "a": a,
                "b": b,
                **{alg: round(similarity(a, b, alg), 3) for alg in algos},
            }
        )
    print_table(rows, limit=len(rows), title="algorithm comparison")
    # token_sort is order-invariant; ratio is not
    assert rows[1]["token_sort"] == 1.0 and rows[1]["ratio"] < 1.0
    return {"n_pairs": len(rows)}


if __name__ == "__main__":
    main()
