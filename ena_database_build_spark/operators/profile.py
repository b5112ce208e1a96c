"""One-pass table profiling (SURVEY.md §2.11 extension surface — the
data-quality monitor a training-data pipeline runs on every ingested
snapshot: row counts, null rates, cardinalities, value ranges per
column, as a small table you can diff between snapshots or alert on).

Plan shape: ONE wide aggregation over one scan.  Every per-column
statistic is an independent aggregate expression in the same
``agg(...)`` call, so Spark computes them all in a single map-side
partial + one merge — the output is a handful of rows regardless of
input size.  The long-form pivot happens AFTER aggregation on a 1-row
relation (``stack`` over literals — free).

Distinct counts: ``approx`` (default) uses HyperLogLog++
(``approx_count_distinct``) — constant state per column, the only sane
choice at 100 TB.  ``exact`` uses ``count(DISTINCT col)``; Spark plans
multi-column exact distincts via EXPAND (one pass, one shuffle per
distinct-column group) — affordable on dimension-sized tables and used
by the oracle-checked catalog entry, since HLL estimates are
engine-specific."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "approx",
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) — one
    row per profiled column; min/max rendered as strings so mixed
    column types share one schema (NULL when the column is all-NULL).

    Cost note: ``distinct='exact'`` with several columns triggers
    Spark's multi-distinct EXPAND rewrite (each input row replicated
    once per distinct column before the shuffle).  That is the
    DELIBERATE trade at scale — one replicated scan beats one scan
    per column, which is the only exact alternative — and it is why
    the sf1 bench reads this query well above the single-process
    oracle.  ``distinct='approx'`` (the default, HLL partials, no
    expand) is the production path; exact exists so the oracle can
    check values."""
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn_{i}"))
        aggs.append(
            (
                F.countDistinct(col)
                if distinct == "exact"
                else F.approx_count_distinct(col)
            ).alias(f"_nd_{i}")
        )
        aggs.append(F.min(col).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{i}"))
    wide = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            f"'{c}'",
            "_n",
            f"_n - _nn_{i}",
            f"_nd_{i}",
            f"_min_{i}",
            f"_max_{i}",
        ]
    return wide.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )
