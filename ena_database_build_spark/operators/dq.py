"""Data-quality constraint checking (Deequ-style) — the validation
gate a 100 TB ingest runs before publishing a snapshot.

The reference validates row-by-row with regex drops (`/root/reference/
ena_build/parse_embl.py:339-359` — malformed IDs and unknown
topologies are skipped with a warning); at corpus scale the complement
is TABLE-level contracts: completeness, uniqueness, value bounds,
referential integrity.  The engine computes them in as few passes as
Spark allows:

* every row-local metric (completeness, uniqueness, bounds,
  membership) folds into ONE ``agg`` over the table — a single scan,
  all metrics map-side combinable;
* referential integrity needs a join by nature; it broadcast
  semi-joins the (small) key side so the fact table still never
  shuffles.

All metrics are fractions in [0, 1] derived from exact integer counts
(one float division each), so the report is engine-portable and
oracle-checkable to the last digit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def completeness(col: str) -> Column:
    """Fraction of rows with a non-NULL value."""
    return F.try_divide(
        F.count(F.col(col)).cast("double"), F.count(F.lit(1))
    )


def uniqueness(col: str) -> Column:
    """Distinct non-NULL values over non-NULL rows (1.0 == key-like)."""
    return F.try_divide(
        F.count_distinct(F.col(col)).cast("double"), F.count(F.col(col))
    )


def in_range(col: str, lo, hi) -> Column:
    """Fraction of non-NULL values inside [lo, hi]."""
    v = F.col(col)
    return F.try_divide(
        F.sum(v.between(F.lit(lo), F.lit(hi)).cast("long")).cast("double"),
        F.count(v),
    )


def member_of(col: str, allowed: list) -> Column:
    """Fraction of non-NULL values inside the allowed set."""
    v = F.col(col)
    return F.try_divide(
        F.sum(v.isin(allowed).cast("long")).cast("double"), F.count(v)
    )


def metrics_report(
    df: DataFrame,
    checks: dict[str, tuple[Column, float]],
    ndigits: int = 6,
) -> DataFrame:
    """Evaluates ``{check_name: (metric_expr, min_required)}`` in ONE
    aggregation pass; returns ``(check_name, metric, passed)`` rows.
    ``passed`` compares the ROUNDED metric so the verdict is stable
    across engines' float printing; a NULL metric (empty input — the
    count-ratio checks all try_divide by a zero count) reports
    ``passed = False``, never NULL: an un-measurable gate must fail
    closed (round-3 ADVICE item #2).

    Check names are carried exclusively as ``lit()`` values — the
    un-pivot is an explode over an array of (name, metric) structs
    with positional internal aliases, never interpolated into SQL —
    so any printable name (quotes, backticks, dots) is safe."""
    names = list(checks)
    row = df.agg(
        *[
            F.round(expr, ndigits).alias(f"_m{i}")
            for i, (expr, _) in enumerate(checks.values())
        ]
    )
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(f"_m{i}").alias("metric"),
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("kv")
    ).select("kv.check_name", "kv.metric")
    thresholds = F.create_map(
        *[
            x
            for name, (_, min_req) in checks.items()
            for x in (F.lit(name), F.lit(float(min_req)))
        ]
    )
    return stacked.select(
        "check_name",
        "metric",
        F.coalesce(
            F.col("metric") >= thresholds[F.col("check_name")],
            F.lit(False),
        ).alias("passed"),
    )


def uniqueness_report(
    df: DataFrame,
    col: str,
    check_name: str,
    min_required: float = 1.0,
    ndigits: int = 6,
) -> DataFrame:
    """Key uniqueness as a standalone report row (same metric and
    verdict as ``uniqueness`` inside :func:`metrics_report`, same
    fail-closed NULL posture) computed from a column-PRUNED
    aggregation.

    Folding ``count_distinct`` into the shared metrics agg makes Spark
    key the WHOLE aggregation by the distinct column: on a unique key
    the "partial" aggregation reduces nothing, so the exchange
    re-ships every input row widened by one partial-count state per
    sibling metric.  Standalone, the plan dedups and shuffles the key
    column alone while the sibling metrics stay a map-side one-row
    agg — shuffle bytes drop by the full metric-state width.  Returns
    a ``(check_name, metric, passed)`` row that unions with
    :func:`metrics_report` output."""
    metric = F.round(uniqueness(col), ndigits)
    return (
        df.select(col)
        .agg(metric.alias("metric"))
        .select(
            F.lit(check_name).alias("check_name"),
            "metric",
            F.coalesce(
                F.col("metric") >= F.lit(float(min_required)), F.lit(False)
            ).alias("passed"),
        )
    )


def ri_attach(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
    """Broadcast-attach the referential-integrity match marker
    (``_hit_<fk> = 1`` where ``fk`` has a dimension match) without
    changing the fact row count — the dim collapses to distinct keys
    first, so the left join can never duplicate.  Lets an RI fraction
    ride the SAME scan and one-row agg as the row-local metrics (see
    :func:`ri_fraction`) instead of paying a second pass over the
    fact table per RI check.  The marker is named per foreign key so
    chained attaches for different fks never clash (round-13 ADVICE
    item #3)."""
    marked = F.broadcast(
        dim.select(F.col(pk).alias(fk)).distinct().withColumn(
            f"_hit_{fk}", F.lit(1)
        )
    )
    return fact.join(marked, fk, "left")


def ri_fraction(fk: str) -> Column:
    """RI coverage metric over a :func:`ri_attach`-ed relation:
    fraction of non-NULL foreign keys with a dimension match, 1.0
    (vacuously intact) when there are none — digit-identical to
    :func:`ri_coverage`'s metric, usable inside
    :func:`metrics_report`'s shared aggregation.  Reads the per-fk
    marker :func:`ri_attach` wrote for the same ``fk``."""
    return F.coalesce(
        F.try_divide(
            F.count(f"_hit_{fk}").cast("double"), F.count(F.col(fk))
        ),
        F.lit(1.0),
    )


def ri_coverage(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    check_name: str,
    min_required: float = 1.0,
    ndigits: int = 6,
) -> DataFrame:
    """Referential integrity as a metric row: fraction of non-NULL
    foreign keys with a match in the dimension.  The dim collapses to
    distinct keys and broadcasts with a match marker; the fact side
    is scanned ONCE with a map-only broadcast join feeding the same
    count aggregation as the row-local metrics — fully lazy, one job,
    no fact shuffle.  Returns a ``(check_name, metric, passed)`` row that
    unions with :func:`metrics_report` output."""
    marked = F.broadcast(
        dim.select(F.col(pk).alias(fk)).distinct().withColumn(
            "_hit", F.lit(1)
        )
    )
    metric = F.round(
        F.try_divide(F.count("_hit").cast("double"), F.count(F.lit(1))),
        ndigits,
    )
    return (
        fact.where(F.col(fk).isNotNull())
        .join(marked, fk, "left")
        .agg(metric.alias("metric"))
        .select(
            F.lit(check_name).alias("check_name"),
            # an empty fact side yields a NULL ratio: vacuously intact
            F.coalesce("metric", F.lit(1.0)).alias("metric"),
            (
                F.coalesce("metric", F.lit(1.0))
                >= F.lit(float(min_required))
            ).alias("passed"),
        )
    )
