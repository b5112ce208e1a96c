"""Incremental aggregate maintenance: algebraic partial statistics
that MERGE instead of recomputing.

The reference pipeline is one-shot batch (`/root/reference/ena_build/
dask_tskmgr.py` rebuilds the full table every run); a 100 TB corpus
cannot afford that — when a new crawl lands, per-source statistics
must update from the delta alone.  The classic fix is to keep
*algebraic* partials (count, sum, min, max, sum of squares): each is
re-aggregable with the same associative+commutative operation, so

    stats(base ∪ delta) == merge(partial(base), partial(delta))

holds EXACTLY, not approximately.  Partials for the whole historical
corpus are one tiny keyed table (rows = #groups); maintaining them
turns a 100 TB rescan into a delta-sized scan plus a groups-sized
merge.  (Non-algebraic stats — medians, distincts — need sketches
instead: t-digest/HLL; see ``operators/profile.py`` for the HLL
side.)

Exactness across engines: ``n``, ``total``, ``total_sq``, ``min``,
``max`` are integer-exact, so derived mean/variance are each ONE
float expression over exact integers — bit-identical in any engine
that rounds the same way, which is what lets the oracle check an
incremental pipeline against a full recompute."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_stats(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Algebraic partials of ``value_col`` per key group:
    ``(keys..., n, total, total_sq, min_val, max_val)``.  One
    map-side-combinable groupBy; NULL values are excluded (they carry
    no statistic)."""
    v = F.col(value_col)
    return (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(v).alias("total"),
            F.sum(v * v).alias("total_sq"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
        )
    )


_STAT_COLS = ("n", "total", "total_sq", "min_val", "max_val")


def merge_stats(*parts: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merges partial-stats tables: union + one groupBy re-applying
    each partial's own combine operation.  The shuffle carries
    #groups × #parts rows — independent of the underlying corpus
    size, which is the entire point.

    ``keys`` defaults to "every column not named like a statistic",
    matching :func:`partial_stats` output — but a GROUP KEY that
    happens to be named ``n``/``total``/... would silently be summed
    as a statistic under that inference, corrupting the merge
    (round-3 ADVICE item #3).  Pass ``keys`` explicitly to merge such
    schemas; the inferred path raises if any statistic column is
    missing (the schema is then ambiguous, not partial-stats-shaped)."""
    if not parts:
        raise ValueError("merge_stats needs at least one partial")
    if keys is None:
        missing = [c for c in _STAT_COLS if c not in parts[0].columns]
        if missing:
            raise ValueError(
                f"partial is missing statistic columns {missing}; if a "
                "group key shares a statistic name, pass keys=[...] "
                "explicitly"
            )
        keys = [c for c in parts[0].columns if c not in _STAT_COLS]
    unioned = reduce(DataFrame.unionByName, parts)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.sum("total_sq").alias("total_sq"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


def finalize_stats(merged: DataFrame, ndigits: int = 6) -> DataFrame:
    """Derives presentation stats from exact partials: mean and
    population variance, each one float expression over exact
    integers (engine-portable)."""
    n = F.col("n").cast("double")
    total = F.col("total").cast("double")
    sq = F.col("total_sq").cast("double")
    return merged.select(
        *[c for c in merged.columns if c not in ("total_sq",)],
        F.round(total / n, ndigits).alias("mean_val"),
        F.round((sq - total * total / n) / n, ndigits).alias("var_val"),
    )
