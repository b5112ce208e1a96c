"""CLI-argument hygiene for tools/check_catalog.py (round-8 verdict
"What's wrong" #3: an unknown name used to KeyError mid-run, wasting
the whole session).  resolve_names must reject bad input BEFORE any
Spark/DuckDB work, and --first must slice the driver-style window."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_catalog import resolve_names  # noqa: E402

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402


def test_unknown_name_exits_before_work():
    with pytest.raises(SystemExit) as exc:
        resolve_names(["dedup_exact", "no_such_query"])
    assert "no_such_query" in str(exc.value)


def test_all_unknowns_reported_at_once():
    with pytest.raises(SystemExit) as exc:
        resolve_names(["typo_a", "typo_b"])
    msg = str(exc.value)
    assert "typo_a" in msg and "typo_b" in msg


def test_first_window_slices_registry_order():
    assert resolve_names(["--first", "3"]) == list(CATALOG)[:3]
    assert resolve_names(["--first", "50"]) == list(CATALOG)[:50]


@pytest.mark.parametrize("argv", [["--first"], ["--first", "0"],
                                  ["--first", "x"], ["--first", "-2"]])
def test_first_rejects_malformed(argv):
    with pytest.raises(SystemExit):
        resolve_names(argv)


def test_empty_tail_means_full_catalog():
    assert resolve_names([]) == list(CATALOG)


def test_valid_names_pass_through():
    assert resolve_names(["dedup_exact"]) == ["dedup_exact"]
