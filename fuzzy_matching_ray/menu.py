"""Interactive terminal menu — UX parity with the reference's
menu-driven entry point (``fuzzy_matching/cli/main.py:37-227`` and the
demo submenu at ``cli/main.py:230-272``), re-expressed over this
engine's argparse subcommands and Ray Data pipelines.

The reference menu offers: an interactive demo submenu, match /
transliterate / generate launchers that print example commands and run
a user-entered one, and a help screen with algorithm recommendations.
This module mirrors that flow 1:1 but

- drives OUR ``fuzzy_matching_ray.cli`` subcommands (never
  ``os.system`` — a typed command is parsed by the same argparse tree,
  so the menu cannot drift from the real CLI), and
- the demos run REAL pipelines on seeded synthetic data in a temp dir
  (the reference demos likewise generate-then-match in-process,
  ``cli/demo.py:252-760``), including a flagship transcript-dedup demo
  the reference has no counterpart for.

Everything is injectable (``input_fn`` / ``out``) so pytest can script
a session without a TTY.
"""

from __future__ import annotations

import shlex
import sys
import tempfile
from typing import Callable, TextIO


class _C:
    """ANSI palette (reference ``cli/main.py:24-34``); disabled when
    the stream is not a terminal so piped/pytest output stays clean."""

    def __init__(self, enabled: bool):
        self.HEADER = "\033[95m" if enabled else ""
        self.CYAN = "\033[96m" if enabled else ""
        self.GREEN = "\033[92m" if enabled else ""
        self.YELLOW = "\033[93m" if enabled else ""
        self.RED = "\033[91m" if enabled else ""
        self.BOLD = "\033[1m" if enabled else ""
        self.END = "\033[0m" if enabled else ""


_MATCH_EXAMPLE = (
    "python -m fuzzy_matching_ray.cli match "
    "--input1 /tmp/fmr_demo/original.parquet --input2 /tmp/fmr_demo/variant.parquet "
    '--fields "last_name:0.4:true:token_sort,first_name:0.3:false:partial_ratio,'
    'middle_name:0.2:false:ratio,email:0.1:false:ratio" '
    "--threshold 0.7 --output /tmp/fmr_demo/matches.parquet"
)
_TRANSLIT_EXAMPLE = (
    "python -m fuzzy_matching_ray.cli transliterate "
    "--input /tmp/fmr_demo/original.parquet --target-lang en "
    "--fields last_name,first_name,middle_name --standard passport "
    "--output /tmp/fmr_demo/transliterated.parquet"
)
_GENERATE_EXAMPLE = (
    "python -m fuzzy_matching_ray.cli generate --count 100 "
    "--output-original /tmp/fmr_demo/original.parquet "
    "--output-variant /tmp/fmr_demo/variant.parquet"
)
_DEDUP_EXAMPLE = (
    "python -m fuzzy_matching_ray.cli dedup --input /tmp/fmr_demo/turns "
    "--output /tmp/fmr_demo/dedup --channels minhash_lsh,simhash"
)


def _run_cli_line(line: str, out: TextIO) -> None:
    """Parse and run a user-entered engine command through the real
    argparse tree (reference runs ``os.system`` here; going through
    ``cli.main`` keeps the menu and the CLI a single surface)."""
    from fuzzy_matching_ray import cli

    argv = shlex.split(line)
    # accept both bare subcommand lines and full "python -m ..." pastes
    if argv[:3] == ["python", "-m", "fuzzy_matching_ray.cli"]:
        argv = argv[3:]
    elif argv[:2] == ["python", "-m"]:
        argv = argv[3:]
    try:
        parsed = cli.build_parser().parse_args(argv)
        out.write(f"[exit code {parsed.fn(parsed)}]\n")
    except SystemExit as exc:  # argparse error — report, stay in menu
        out.write(f"[argparse rejected the command: {exc}]\n")
    except Exception as exc:
        out.write(f"[command failed: {exc!r}]\n")


def _table(rows: list[dict], out: TextIO, limit: int = 8) -> None:
    """Minimal fixed-width table (reference uses prettytable; stdlib
    keeps us dependency-free)."""
    if not rows:
        out.write("(no rows)\n")
        return
    cols = list(rows[0].keys())
    widths = {
        c: max(len(str(c)), *(len(str(r.get(c, ""))) for r in rows[:limit])) for c in cols
    }
    line = " | ".join(str(c).ljust(widths[c]) for c in cols)
    out.write(line + "\n" + "-" * len(line) + "\n")
    for r in rows[:limit]:
        out.write(" | ".join(str(r.get(c, "")).ljust(widths[c]) for c in cols) + "\n")
    if len(rows) > limit:
        out.write(f"... ({len(rows) - limit} more rows)\n")


def _demo_person_match(out: TextIO, num_cpus: int | None) -> None:
    """Personal-data matching demo (reference
    ``cli/demo.py:252-370``): generate a seeded original/variant pair,
    match with the reference's field weights, show the top matches."""
    from fuzzy_matching_ray.config import (
        FuzzyAlgorithm,
        MatchConfig,
        MatchFieldConfig,
    )
    from fuzzy_matching_ray.datagen import (
        PersonGenConfig,
        generate_person_records,
        person_records_table,
    )
    from fuzzy_matching_ray.pipelines.record_match import match_records

    _ensure_ray(num_cpus)
    import ray.data as rd

    orig, var = generate_person_records(PersonGenConfig(n_records=40, seed=7))
    cfg = MatchConfig(
        fields=(
            MatchFieldConfig("last_name", 0.4, True, FuzzyAlgorithm.TOKEN_SORT),
            MatchFieldConfig("first_name", 0.3, False, FuzzyAlgorithm.PARTIAL_RATIO),
            MatchFieldConfig("middle_name", 0.2, False, FuzzyAlgorithm.RATIO),
            MatchFieldConfig("email", 0.1, False, FuzzyAlgorithm.RATIO),
        ),
        threshold=0.7,
        sort_before_match=True,
    )
    ds1 = rd.from_arrow(person_records_table(orig))
    ds2 = rd.from_arrow(person_records_table(var))
    matches = match_records(ds1, ds2, cfg).to_pandas()
    out.write("\n40 original records vs 40 distorted variants, threshold 0.7\n")
    out.write(f"matched pairs: {len(matches)}\n")
    show = matches.sort_values("similarity", ascending=False).head(8)
    _table(
        [
            {
                "id": r["o_id"],
                "id_v": r["v_id"],
                "similarity": f"{r['similarity']:.3f}",
            }
            for _, r in show.iterrows()
        ],
        out,
    )


def _demo_transliteration(out: TextIO) -> None:
    """Transliteration demo (reference ``cli/demo.py:615-760``): the
    same sample names through all three public standards, both ways."""
    from fuzzy_matching_ray.functions.translit import (
        GOST,
        PASSPORT,
        SCIENTIFIC,
        transliterate_en_to_ru,
        transliterate_ru_to_en,
    )

    samples = ["Иванов", "Щербаков", "Юрьев", "Ёлкина"]
    rows = [
        {
            "russian": s,
            "gost": transliterate_ru_to_en(s, GOST),
            "scientific": transliterate_ru_to_en(s, SCIENTIFIC),
            "passport": transliterate_ru_to_en(s, PASSPORT),
        }
        for s in samples
    ]
    out.write("\nRussian → English under the three public standards:\n")
    _table(rows, out)
    out.write("\nEnglish → Russian (GOST round-trip):\n")
    _table(
        [
            {
                "english": transliterate_ru_to_en(s, GOST),
                "russian": transliterate_en_to_ru(transliterate_ru_to_en(s, GOST), GOST),
            }
            for s in samples
        ],
        out,
    )


def _demo_dedup(out: TextIO, num_cpus: int | None) -> None:
    """Flagship demo: seeded synthetic transcripts → near-dup
    clustering, with the run metrics the engine reports at scale."""
    from fuzzy_matching_ray.config import PipelineConfig
    from fuzzy_matching_ray.datagen import TranscriptGenConfig, write_transcripts
    from fuzzy_matching_ray.pipelines.dedup import dedup_transcripts

    _ensure_ray(num_cpus)
    import ray.data as rd

    with tempfile.TemporaryDirectory(prefix="fmr_menu_demo_") as tmp:
        turns_dir = write_transcripts(
            f"{tmp}/turns", TranscriptGenConfig(n_convs=300, seed=11)
        )
        res = dedup_transcripts(
            rd.read_parquet(turns_dir), PipelineConfig(num_partitions=8)
        )
        n_clusters = res.representatives.count()
        out.write(
            f"\n300 conversations (+ near-dup variants) → "
            f"{n_clusters} duplicate clusters\n"
        )
        keep = (
            "docs_rows",
            "unique_docs",
            "candidate_pairs",
            "edges",
            "gate_skipped_pairs",
        )
        _table([{k: res.metrics.get(k) for k in keep if k in res.metrics}], out)


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs: dict = {
            "address": "local",
            "include_dashboard": False,
            "logging_level": "ERROR",
        }
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _help_screen(c: _C, out: TextIO) -> None:
    """Algorithm recommendations (reference ``cli/main.py:113-227``),
    restated for this engine's operator surface."""
    out.write(f"\n{c.HEADER}{c.BOLD}=== Algorithm recommendations ==={c.END}\n")
    out.write(f"{c.BOLD}Fuzzy similarity algorithms (record matching):{c.END}\n")
    out.write(f"{c.CYAN}- ratio:{c.END} plain Levenshtein — short strings, exact-ish fields (ids, patronymics)\n")
    out.write(f"{c.CYAN}- partial_ratio:{c.END} best substring window — first names / diminutives\n")
    out.write(f"{c.CYAN}- token_sort:{c.END} sort words first — addresses, compound surnames\n")
    out.write(f"{c.CYAN}- token_set:{c.END} word-set compare — company names, reordered words\n")
    out.write(f"{c.CYAN}- wratio:{c.END} weighted combination — general-purpose default\n")
    out.write(f"\n{c.BOLD}Near-duplicate channels (transcript/document dedup):{c.END}\n")
    out.write(f"{c.CYAN}- minhash_lsh:{c.END} the flagship recall channel — char-shingle MinHash + banded LSH\n")
    out.write(f"{c.CYAN}- simhash:{c.END} cheap 64-bit prefilter with Hamming-ball probing\n")
    out.write(f"{c.CYAN}- substring:{c.END} partitioned suffix-array pass for exact long-substring contamination\n")
    out.write(f"{c.CYAN}- exact:{c.END} sha256 canonical-text equality (always on)\n")
    out.write(f"\n{c.BOLD}Subcommands:{c.END} match, transliterate, generate, generate-transcripts,\n")
    out.write("dedup, incremental, curate, report, run, search, pack\n")
    out.write("(run any of them with --help for the full flag list)\n")


def _usage_examples(c: _C, out: TextIO) -> None:
    out.write(f"\n{c.CYAN}=== Usage examples ==={c.END}\n")
    for title, cmd in (
        ("Match two person-record files", _MATCH_EXAMPLE),
        ("Transliterate name columns", _TRANSLIT_EXAMPLE),
        ("Generate distorted test data", _GENERATE_EXAMPLE),
        ("Near-dup cluster a transcripts directory", _DEDUP_EXAMPLE),
    ):
        out.write(f"\n{c.YELLOW}{title}:{c.END}\n{c.GREEN}{cmd}{c.END}\n")


def _demo_menu(c: _C, input_fn: Callable[[str], str], out: TextIO, num_cpus: int | None) -> None:
    """Demo submenu (reference ``show_demo_menu`` /
    ``show_interactive_demo``, ``cli/main.py:230-272``)."""
    while True:
        out.write(f"\n{c.CYAN}=== Demo mode ==={c.END}\n")
        out.write(f"{c.YELLOW}1. Personal-data matching demo{c.END}\n")
        out.write(f"{c.YELLOW}2. Transliteration demo{c.END}\n")
        out.write(f"{c.YELLOW}3. Transcript near-dup clustering demo (flagship){c.END}\n")
        out.write(f"{c.YELLOW}4. Show usage examples{c.END}\n")
        out.write(f"{c.YELLOW}5. Back{c.END}\n")
        choice = input_fn(f"{c.GREEN}Pick a demo (1-5): {c.END}").strip()
        if choice == "1":
            _demo_person_match(out, num_cpus)
        elif choice == "2":
            _demo_transliteration(out)
        elif choice == "3":
            _demo_dedup(out, num_cpus)
        elif choice == "4":
            _usage_examples(c, out)
        elif choice == "5":
            return
        else:
            out.write(f"{c.RED}Invalid choice — pick 1-5.{c.END}\n")


def _launcher(c: _C, input_fn, out: TextIO, title: str, example: str) -> None:
    """Print the canonical example for a mode, then run a typed
    command (or return on empty input) — reference ``main.py:66-110``."""
    out.write(f"\n{c.BOLD}{title}{c.END}\n")
    out.write(f"{c.GREEN}{example}{c.END}\n")
    cmd = input_fn(
        f"{c.YELLOW}Enter a command to run (or press Enter to go back): {c.END}"
    ).strip()
    if cmd:
        _run_cli_line(cmd, out)


def run_menu(
    input_fn: Callable[[str], str] = input,
    out: TextIO | None = None,
    num_cpus: int | None = None,
    color: bool | None = None,
) -> int:
    """Top-level interactive loop (reference ``cli/main.py:51-111``).
    Returns 0 on a clean exit; EOF on stdin also exits cleanly."""
    out = out or sys.stdout
    if color is None:
        color = hasattr(out, "isatty") and out.isatty()
    c = _C(color)
    while True:
        out.write(f"\n{c.HEADER}{c.BOLD}===== fuzzy-matching-ray ====={c.END}\n")
        out.write(f"{c.CYAN}1. Run an interactive demo{c.END}\n")
        out.write(f"{c.CYAN}2. Match data (person-record pipeline){c.END}\n")
        out.write(f"{c.CYAN}3. Transliterate data{c.END}\n")
        out.write(f"{c.CYAN}4. Generate test data{c.END}\n")
        out.write(f"{c.CYAN}5. Near-dup cluster transcripts (flagship){c.END}\n")
        out.write(f"{c.CYAN}6. Help & algorithm recommendations{c.END}\n")
        out.write(f"{c.RED}0. Exit{c.END}\n")
        try:
            choice = input_fn(f"{c.YELLOW}Pick an option (0-6): {c.END}").strip()
        except (EOFError, StopIteration):
            out.write("\n")
            return 0
        if choice == "0":
            out.write(f"{c.GREEN}Goodbye!{c.END}\n")
            return 0
        elif choice == "1":
            _demo_menu(c, input_fn, out, num_cpus)
        elif choice == "2":
            _launcher(c, input_fn, out, "Record-matching launcher", _MATCH_EXAMPLE)
        elif choice == "3":
            _launcher(c, input_fn, out, "Transliteration launcher", _TRANSLIT_EXAMPLE)
        elif choice == "4":
            _launcher(c, input_fn, out, "Test-data generator launcher", _GENERATE_EXAMPLE)
        elif choice == "5":
            _launcher(c, input_fn, out, "Flagship dedup launcher", _DEDUP_EXAMPLE)
        elif choice == "6":
            _help_screen(c, out)
        else:
            out.write(f"{c.RED}Invalid choice — pick 0-6.{c.END}\n")
