"""Pins for the two Spark-vs-DuckDB Unicode divergences probed in
round 9 (tools/adversarial_corpus.py UNICODE_PAYLOADS header).

The unicode adversarial mode plants only cross-engine-AGREEING exotic
content; the two divergent characters are excluded from the plant set
and PINNED here instead, so the exclusion stays visible and we notice
if either engine's behavior moves (at which point the corpus can widen
or the oracle can guard).

These are engine-LEVEL divergences, not defects in this repo: Java
regex ``\\s`` vs RE2 ``\\s``, and Java ``toLowerCase`` vs utf8proc.
"""

import duckdb
import pytest
from pyspark.sql import functions as F


def _duck(sql: str, *params):
    con = duckdb.connect()
    try:
        return con.execute(sql, list(params)).fetchone()[0]
    finally:
        con.close()


def test_vertical_tab_whitespace_divergence(spark):
    """U+000B: Java \\s matches it (Spark normalizes it to a space);
    DuckDB's RE2 \\s is ASCII [\\t\\n\\f\\r ] WITHOUT VT (stays put)."""
    vt = "a\x0bb"
    got = (
        spark.range(1)
        .select(F.regexp_replace(F.lit(vt), r"\s+", " ").alias("x"))
        .first()["x"]
    )
    assert got == "a b"  # Spark: VT is whitespace
    duck = _duck("SELECT regexp_replace(?, '\\s+', ' ', 'g')", vt)
    assert duck == vt  # DuckDB: VT is NOT \s — the pinned divergence
    # both agree VT is not a plain space, so the divergence is ONLY \s
    assert " " not in vt


def test_turkish_capital_dotted_i_lower_divergence(spark):
    """U+0130: Java lower() emits i + U+0307 (two codepoints);
    DuckDB's utf8proc emits plain i (one codepoint)."""
    s = "İstanbul"
    got = spark.range(1).select(F.lower(F.lit(s)).alias("x")).first()["x"]
    assert got == "i̇stanbul"  # Spark/Java: combining dot survives
    duck = _duck("SELECT lower(?)", s)
    assert duck == "istanbul"  # DuckDB/utf8proc: plain i — the pin


@pytest.mark.parametrize("payload_idx", range(10))
def test_planted_payloads_agree_on_probed_primitives(spark, payload_idx):
    """Every UNICODE_PAYLOADS entry must keep agreeing on the probed
    primitives (lower, length, \\s+ normalize, md5) — the precondition
    for the unicode sweep's exact compare.  If an engine upgrade
    breaks one, this test points at the exact payload to re-triage."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from adversarial_corpus import UNICODE_PAYLOADS

    t = UNICODE_PAYLOADS[payload_idx]
    row = (
        spark.range(1)
        .select(
            F.lower(F.lit(t)).alias("lo"),
            F.length(F.lit(t)).alias("ln"),
            F.regexp_replace(F.lower(F.lit(t)), r"\s+", " ").alias("no"),
            F.md5(F.lit(t)).alias("h"),
        )
        .first()
    )
    con = duckdb.connect()
    try:
        d = con.execute(
            "SELECT lower(?), length(?), "
            "regexp_replace(lower(?), '\\s+', ' ', 'g'), md5(?)",
            [t, t, t, t],
        ).fetchone()
    finally:
        con.close()
    assert d[0] == row["lo"], f"lower diverges on payload {payload_idx}"
    assert d[1] == row["ln"], f"length diverges on payload {payload_idx}"
    assert d[2] == row["no"], f"normalize diverges on payload {payload_idx}"
    assert d[3] == row["h"], f"md5 diverges on payload {payload_idx}"


def test_final_sigma_lower_divergence(spark):
    """Word-final capital sigma: Java toLowerCase is context-sensitive
    and emits U+03C2 (final sigma) after a letter at word end; DuckDB's
    utf8proc maps per-codepoint to U+03C3.  Found by the payload-5
    probe (round 9); capital sigma is planted word-initial only."""
    s = "ΣΟΦΟΣ"  # all-caps sigma-final word
    got = spark.range(1).select(F.lower(F.lit(s)).alias("x")).first()["x"]
    assert got == "σοφος"  # Java: final sigma
    duck = _duck("SELECT lower(?)", s)
    assert duck == "σοφοσ"  # utf8proc: sigma
