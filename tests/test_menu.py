"""Interactive-menu parity tests (reference ``cli/main.py:37-272``):
a scripted session walks every top-level branch, the demo submenu, and
the launcher flow without a TTY."""

from __future__ import annotations

import io

import pytest

from fuzzy_matching_ray.menu import run_menu


def _scripted(*choices: str):
    it = iter(choices)

    def fn(prompt: str) -> str:
        return next(it)

    return fn


def test_menu_help_examples_and_exit():
    out = io.StringIO()
    code = run_menu(_scripted("6", "1", "4", "5", "0"), out=out, color=False)
    assert code == 0
    text = out.getvalue()
    assert "Algorithm recommendations" in text
    assert "minhash_lsh" in text  # engine channels documented
    assert "token_sort" in text  # reference algorithms documented
    assert "Usage examples" in text
    assert "fuzzy_matching_ray.cli match" in text
    assert "Goodbye!" in text


def test_menu_invalid_choice_and_eof():
    out = io.StringIO()
    # invalid top-level choice, then EOF (iterator exhausts → StopIteration)
    code = run_menu(_scripted("9"), out=out, color=False)
    assert code == 0
    assert "Invalid choice" in out.getvalue()


def test_menu_launchers_show_examples_and_return():
    out = io.StringIO()
    # 2/3/4/5 launchers, empty command each time (= back), then exit
    code = run_menu(_scripted("2", "", "3", "", "4", "", "5", "", "0"), out=out, color=False)
    assert code == 0
    text = out.getvalue()
    assert "Record-matching launcher" in text
    assert "Transliteration launcher" in text
    assert "Test-data generator launcher" in text
    assert "Flagship dedup launcher" in text


def test_menu_launcher_runs_generate_command(tmp_path):
    out = io.StringIO()
    cmd = (
        f"generate --count 5 --output-original {tmp_path}/o.parquet "
        f"--output-variant {tmp_path}/v.parquet"
    )
    code = run_menu(_scripted("4", cmd, "0"), out=out, color=False)
    assert code == 0
    assert "[exit code 0]" in out.getvalue()
    import pyarrow.parquet as pq

    assert pq.read_table(f"{tmp_path}/o.parquet").num_rows == 5


def test_menu_launcher_rejects_bad_command():
    out = io.StringIO()
    code = run_menu(_scripted("2", "match --no-such-flag", "0"), out=out, color=False)
    assert code == 0
    assert "argparse rejected" in out.getvalue()


def test_menu_transliteration_demo():
    out = io.StringIO()
    code = run_menu(_scripted("1", "2", "5", "0"), out=out, color=False)
    assert code == 0
    text = out.getvalue()
    # GOST round-trip shown both directions
    assert "Ivanov" in text or "ivanov" in text.lower()
    assert "Иванов" in text


def test_menu_person_match_demo(ray_session):
    out = io.StringIO()
    code = run_menu(_scripted("1", "1", "5", "0"), out=out, color=False)
    assert code == 0
    text = out.getvalue()
    assert "matched pairs:" in text
    assert "similarity" in text


def test_menu_dedup_demo(ray_session):
    out = io.StringIO()
    code = run_menu(_scripted("1", "3", "5", "0"), out=out, color=False)
    assert code == 0
    text = out.getvalue()
    assert "duplicate clusters" in text
    assert "candidate_pairs" in text
