"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key — the canonical time-series enrichment
join (quotes->trades, price-as-of, feature-as-of-label-time) that Spark
has no built-in operator for.

Spark-first composition (no UDFs, no range explosion):

* UNION the two sides with a marker column, one window pass per key
  ordered by ``(ts, marker)``: ``last(<right col>, ignorenulls=True)``
  over ``rowsBetween(unboundedPreceding, currentRow)`` carries the
  latest right values forward; filtering back to left rows yields the
  as-of match.  Right rows sort BEFORE left rows at equal timestamps,
  giving the standard ``right.ts <= left.ts`` inclusive semantics.
* ONE shuffle, keyed by the join key — same cost as a plain equi-join
  of the two sides; no per-row binary search, no interval cross
  product.  Catalyst plans the whole carry as a single Window over the
  union scan.
* Scale note: a pathologically hot key serializes its window into one
  task (true of any per-key ordered scan).  For that shape, range-
  bucket the time axis instead: ``operators/rangejoin.py`` shows the
  bucketed pattern; an as-of variant adds per-bucket boundary carry
  (the last right row of bucket i seeds bucket i+1), which AQE cannot
  derive but this module's union trick composes with.

DuckDB expresses the identical semantics natively (``ASOF JOIN``),
which the catalog uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each ``left`` row, the latest ``right`` row with
    ``right[on] <= left[on]`` within the same ``by`` key(s).

    Returns all ``left`` columns plus ``right_cols`` (default: every
    right column except the keys) renamed with ``suffix``; rows with no
    prior right row keep nulls — left-join semantics.

    Right rows that tie on ``(by, on)`` are reduced to one
    deterministic winner (max over the struct of ``right_cols``) before
    the carry, so the result never depends on partition order.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*by, on}]
    out_names = [c + suffix for c in right_cols]

    # deterministic tie-break: one right row per (by, on)
    r = right.groupBy(*by, on).agg(
        F.max(F.struct(*right_cols)).alias("_r")
    )
    l_tagged = left.withColumn("_m", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r.schema["_r"].dataType)
    )
    r_tagged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in {*by, on}],
        *by,
        F.col(on),
        F.lit(0).alias("_m"),
        F.col("_r"),
    ).select(*l_tagged.columns)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_m").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_carry", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_m") == 1).select(
        *left.columns,
        *[
            F.col("_carry").getField(c).alias(n)
            for c, n in zip(right_cols, out_names)
        ],
    )
