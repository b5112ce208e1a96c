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
  task (true of any per-key ordered scan).  :func:`asof_join_bucketed`
  is the scale path for that shape: it range-buckets the time axis so
  window partitions are ``(key, bucket)``, and seeds each bucket with
  the carry from earlier buckets via a second, bucket-granularity
  as-of over one row per (key, bucket) — never a per-event scan.

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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    bucket_width: int = 3600,
) -> DataFrame:
    """Identical semantics to :func:`asof_join` (parity-tested), built
    for HOT keys: the per-key ordered window there puts one whole key
    on one task; here window partitions are ``(key, time-bucket)``, so
    a key's events spread across ``span / bucket_width`` tasks.

    ``on`` must be castable to long (epoch seconds/micros, ints);
    ``bucket_width`` is in those units.  Three stages, all bounded:

    1. rights reduce to one deterministic row per ``(key, on)`` (same
       tie rule as :func:`asof_join`), then to one FINAL row per
       ``(key, bucket)`` (``max_by`` over the bucket — map-side
       combinable);
    2. the carry INTO each left-occupied bucket is a bucket-granularity
       as-of: union the distinct left ``(key, bucket)`` rows with the
       per-bucket finals, one window over rows-per-bucket (not
       rows-per-event) ordered so same-bucket finals are EXCLUDED from
       the seed (they participate as real rows in stage 3);
    3. within each ``(key, bucket)`` partition: seed row (sorts first,
       NULL ``on``) + real right rows + left rows, the same
       last-ignorenulls carry as :func:`asof_join`.

    A hot key's cost is now O(its densest bucket) per task; the seed
    relation is one row per (key, occupied bucket) regardless of row
    counts."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*by, on}]
    out_names = [c + suffix for c in right_cols]
    bkt = F.expr(f"cast({on} as long) div {int(bucket_width)}")

    r = right.groupBy(*by, on).agg(
        F.max(F.struct(*right_cols)).alias("_r")
    ).withColumn("_b", bkt)
    r_type = r.schema["_r"].dataType
    # stage 1: one final right value per (key, bucket).  Struct-max on
    # (on, _r), NOT max_by(_r, on): max_by yields NULL when the order
    # value is NULL, silently dropping the NULL-timestamp group that
    # asof_join carries as before-everything.  `on` is unique within
    # the bucket after the (key, on) dedup, so the struct max is the
    # latest row; the lone NULL-on group has exactly one row.
    finals = r.groupBy(*by, "_b").agg(
        F.max(F.struct(F.col(on).alias("_o"), F.col("_r"))).alias("_sr")
    ).select(*by, "_b", F.col("_sr")["_r"].alias("_r"))

    # stage 2: bucket-granularity as-of — seed for each left bucket =
    # last final from a STRICTLY earlier bucket (left marker 0 sorts
    # before same-bucket finals, and the frame ends 1 row back)
    lb = (
        left.select(*by, bkt.alias("_b"))
        .distinct()
        .withColumn("_bm", F.lit(0))
        .withColumn("_r", F.lit(None).cast(r_type))
    )
    fb = finals.select(*by, "_b", F.lit(1).alias("_bm"), "_r")
    w_seed = (
        Window.partitionBy(*by)
        .orderBy(F.col("_b").asc_nulls_first(), F.col("_bm").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        lb.unionByName(fb)
        .withColumn("_seed", F.last("_r", ignorenulls=True).over(w_seed))
        .where(F.col("_bm") == 0)
        .select(*by, "_b", F.col("_seed").alias("_r"))
    )

    # stage 3: in-bucket carry; seed sorts first via NULL `on`
    null_on = F.lit(None).cast(left.schema[on].dataType)
    pad = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
        if c not in {*by, on}
    ]
    s_t = seeds.select(*pad, *by, null_on.alias(on), F.lit(0).alias("_m"), "_b", "_r")
    r_t = r.select(*pad, *by, F.col(on), F.lit(1).alias("_m"), "_b", "_r")
    l_t = (
        left.withColumn("_m", F.lit(2))
        .withColumn("_b", bkt)
        .withColumn("_r", F.lit(None).cast(r_type))
        .select(*s_t.columns)
    )
    w = (
        Window.partitionBy(*by, "_b")
        .orderBy(F.col(on).asc_nulls_first(), F.col("_m").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = s_t.unionByName(r_t).unionByName(l_t).withColumn(
        "_carry", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_m") == 2).select(
        *left.columns,
        *[
            F.col("_carry").getField(c).alias(n)
            for c, n in zip(right_cols, out_names)
        ],
    )
