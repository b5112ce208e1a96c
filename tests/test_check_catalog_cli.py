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


def test_parse_rtol_strips_flag():
    from check_catalog import parse_rtol

    rtol, rest = parse_rtol(["--rtol", "1e-9", "dedup_exact"])
    assert rtol == 1e-9 and rest == ["dedup_exact"]
    rtol, rest = parse_rtol(["dedup_exact"])
    assert rtol is None and rest == ["dedup_exact"]


@pytest.mark.parametrize("argv", [["--rtol"], ["--rtol", "x"],
                                  ["--rtol", "0"], ["--rtol", "-1e-9"]])
def test_parse_rtol_rejects_malformed(argv):
    from check_catalog import parse_rtol

    with pytest.raises(SystemExit):
        parse_rtol(argv)


def test_values_close_rounding_boundary_straddle():
    """r9 review repro: a pair agreeing within rtol but straddling
    the .round(2) grid (0.004999.. vs 0.005000..) used to mis-key and
    cross-pair against OTHER rows — a spurious FAIL.  The raw-value
    alignment fallback must accept it; a genuinely different frame
    must still fail under BOTH alignments."""
    import pandas as pd

    from check_catalog import values_close

    s = pd.DataFrame({"g": [0.004999999999998, 0.0048]})
    o = pd.DataFrame({"g": [0.005000000000002, 0.0048]})
    assert values_close(s, o, rtol=1e-9)

    o_bad = pd.DataFrame({"g": [0.0052, 0.0048]})
    assert not values_close(s, o_bad, rtol=1e-9)


def test_error_class_gates_both_raise():
    """Both-engines-raise counts as agreement only for MATCHING error
    classes; two unrelated errors class as 'other' and never match."""
    from check_catalog import error_class

    spark_overflow = Exception(
        "[ARITHMETIC_OVERFLOW] long overflow. SQLSTATE: 22003"
    )
    duck_overflow = Exception(
        "Out of Range Error: Overflow in multiplication of INT64"
    )
    assert error_class(spark_overflow) == "overflow"
    assert error_class(duck_overflow) == "overflow"
    assert error_class(Exception("[ANALYSIS_ERROR] missing column")) == "other"
    assert error_class(Exception("IO Error: no files found")) == "other"


def test_values_close_tolerates_ulp_drift_and_catches_real_diffs():
    """The float-extreme sweep's compare: last-ulp sum-order drift at
    1e15 magnitude passes; a genuinely different value fails; NaN
    aligns with NaN; non-float columns stay exact."""
    import pandas as pd

    from check_catalog import values_close

    s = pd.DataFrame({"k": ["a", "b"], "v": [1.0e15 + 0.25, float("nan")]})
    o = pd.DataFrame({"k": ["b", "a"], "v": [float("nan"), 1.0e15]})
    assert values_close(s, o, rtol=1e-9)

    o2 = pd.DataFrame({"k": ["a", "b"], "v": [1.001e15, float("nan")]})
    assert not values_close(s, o2, rtol=1e-9)

    o3 = pd.DataFrame({"k": ["a", "X"], "v": [1.0e15, float("nan")]})
    assert not values_close(s, o3, rtol=1e-9)
