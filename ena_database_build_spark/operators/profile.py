"""One-pass table profiling (SURVEY.md §2.11 extension surface — the
data-quality monitor a training-data pipeline runs on every ingested
snapshot: row counts, null rates, cardinalities, value ranges per
column, as a small table you can diff between snapshots or alert on).

Plan shape, ``approx`` (the production default): ONE wide aggregation
over one scan.  Every per-column statistic is an independent aggregate
expression in the same ``agg(...)`` call — HyperLogLog++ partials for
cardinality — so Spark computes them all in a single map-side partial
+ one merge; the output is a handful of rows regardless of input size.
The long-form pivot happens AFTER aggregation on a 1-row relation
(``stack`` over literals — free).

Plan shape, ``exact``: the naive ``count(DISTINCT c1), ..,
count(DISTINCT cN)`` form makes Catalyst plan an EXPAND (input
replicated N+1 times) followed by a SORT aggregate keyed on every
profiled column at once — a full sort of (N+1)x|input| wide rows, the
single worst plan in the round-6 profile (92x its oracle).  Two
no-Expand rewrites replace it:

* **single-scan long form** (used when every profiled column's type
  admits an order-preserving string encoding — strings, integral
  types, booleans, dates, timestamps): each row projects to
  ``posexplode(array(struct(enc_i, disp_i)))`` where ``enc`` sorts
  like the native value (fixed-width sign-flipped hex for the
  temporal/integral types, identity for strings) and ``disp`` is the
  ``cast(value AS string)`` rendering the caller gets back.  One
  hash aggregate dedups (col_idx, struct) WITH a per-group count
  (map-side partial collapses duplicates before the exchange), then
  a per-col_idx aggregate reads every statistic off the deduped
  relation: n_rows = sum(cnt), n_nulls = cnt of the NULL-struct
  group, n_distinct = count of non-NULL groups, min/max =
  ``min/max(struct).disp`` (struct ordering = enc ordering = native
  ordering).  Three stages, one scan, shuffles bounded by the number
  of DISTINCT values — the same bound any exact-distinct plan pays.

* **two-job long form** (fallback when a column's type has no such
  encoding — float/double, decimals, binary): the ``approx`` wide
  aggregation minus the distincts (count/nulls/min/max on native
  types, one scan, no sort), plus a long-form grouped
  ``count_distinct`` over string-cast values, broadcast-joined.
  Two pruned scans; every aggregate is hash-based.

Exactness caveat (fallback path only): distinctness is judged on the
STRING rendering, which is injective for Spark's atomic types with
one exception — floating -0.0 and 0.0 render differently while
``count(DISTINCT)`` treats them as equal, so float/double columns are
normalized with ``+ 0.0`` (IEEE: turns -0.0 into 0.0, identity for
every other value incl. NaN) before the cast."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

_SIGN_BIT = -9223372036854775808  # 1 << 63 as a signed long


def _hex_enc(longcol: Column) -> Column:
    """Order-preserving fixed-width encoding of a signed long: flip the
    sign bit (signed order -> unsigned order), render as zero-padded
    hex (fixed-width hex compares like the unsigned value)."""
    return F.lpad(F.hex(longcol.bitwiseXOR(F.lit(_SIGN_BIT))), 16, "0")


def _sortable_enc(col: Column, dt: DataType) -> Column | None:
    """A string whose binary ordering equals the native ordering of
    ``col``, or None when the type has no cheap such encoding."""
    if isinstance(dt, StringType):
        return col
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return _hex_enc(col.cast("long"))
    if isinstance(dt, BooleanType):
        return _hex_enc(col.cast("long"))
    if isinstance(dt, DateType):
        return _hex_enc(F.unix_date(col).cast("long"))
    if isinstance(dt, TimestampType):
        return _hex_enc(F.unix_micros(col))
    return None


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "approx",
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) — one
    row per profiled column; min/max rendered as strings so mixed
    column types share one schema (NULL when the column is all-NULL).

    ``distinct='approx'`` (default): HLL++ cardinalities, one
    aggregation, no Expand — the production path.
    ``distinct='exact'``: exact cardinalities via the no-Expand
    two-phase long-form distinct (module docstring); used by the
    oracle-checked catalog entry since HLL estimates are
    engine-specific."""
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    cols = cols or df.columns

    if distinct == "exact":
        encs = [_sortable_enc(F.col(c), df.schema[c].dataType) for c in cols]
        if all(e is not None for e in encs):
            return _exact_single_scan(df, cols, encs)
        return _exact_two_job(df, cols)

    return _wide_stack(df, cols, approx_nd=True)


def _wide_stack(df: DataFrame, cols: list[str], approx_nd: bool) -> DataFrame:
    """One wide aggregation + stack pivot.  ``approx_nd=False`` leaves
    ``n_distinct`` NULL for the two-job exact path to fill in."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        if approx_nd:
            aggs.append(F.approx_count_distinct(col).alias(f"_nd_{i}"))
        aggs.append(F.count(col).alias(f"_nn_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{i}"))
    wide = df.agg(*aggs)

    stack_args = []
    for i, c in enumerate(cols):
        nd = f"_nd_{i}" if approx_nd else "CAST(NULL AS BIGINT)"
        stack_args += [
            f"'{c}'",
            "_n",
            f"_n - _nn_{i}",
            nd,
            f"_min_{i}",
            f"_max_{i}",
        ]
    return wide.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )


def _exact_single_scan(
    df: DataFrame, cols: list[str], encs: list[Column]
) -> DataFrame:
    """All statistics off ONE scan: explode to (col_idx,
    struct(enc, disp)), dedup with counts, fold per column.  Struct
    ordering is dominated by ``enc`` (order-preserving by
    construction; ``disp`` only breaks ties between equal values,
    where it is identical too), so min/max of the struct IS the
    native min/max.  NULL values become a NULL struct: its group
    carries the null count and is skipped by count/min/max."""
    pairs = df.select(
        F.posexplode(
            F.array(
                *[
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(
                            enc.alias("enc"),
                            F.col(c).cast("string").alias("disp"),
                        ),
                    )
                    for c, enc in zip(cols, encs)
                ]
            )
        ).alias("_ci", "_s")
    )
    per_col = (
        pairs.groupBy("_ci", "_s")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("_ci")
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("_s").isNull(), F.col("_cnt"))), F.lit(0)
            ).alias("n_nulls"),
            F.count("_s").alias("n_distinct"),
            F.min("_s").getField("disp").alias("min_val"),
            F.max("_s").getField("disp").alias("max_val"),
        )
    )
    # spine: guarantee one output row per profiled column even on an
    # EMPTY input (aggregate-without-group-by semantics, same as the
    # wide-agg paths); per_col is <= len(cols) rows -> broadcast
    spine = df.sparkSession.range(1).select(
        F.posexplode(F.array(*[F.lit(c) for c in cols])).alias(
            "_ci", "col_name"
        )
    )
    return spine.join(F.broadcast(per_col), "_ci", "left").select(
        "col_name",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_val",
        "max_val",
    )


def _exact_two_job(df: DataFrame, cols: list[str]) -> DataFrame:
    """Fallback for column types without an order-preserving string
    encoding: native-typed wide agg (count/nulls/min/max) + long-form
    grouped count_distinct on string-cast values, broadcast-joined.
    No Expand: a single distinct aggregate per group never triggers
    Catalyst's multi-distinct rewrite."""

    def _norm(c: str) -> Column:
        col = F.col(c)
        if isinstance(df.schema[c].dataType, (FloatType, DoubleType)):
            col = col + F.lit(0.0)  # -0.0 -> 0.0; identity otherwise
        return col.cast("string")

    base = _wide_stack(df, cols, approx_nd=False)
    pairs = df.select(
        F.posexplode(F.array(*[_norm(c) for c in cols])).alias("_ci", "_v")
    )
    nd = (
        pairs.groupBy("_ci")
        .agg(F.count_distinct("_v").alias("_nd"))
        .select(
            F.element_at(
                F.array(*[F.lit(c) for c in cols]), F.col("_ci") + 1
            ).alias("col_name"),
            "_nd",
        )
    )
    return base.drop("n_distinct").join(
        F.broadcast(nd), "col_name", "left"
    ).select(
        "col_name",
        "n_rows",
        "n_nulls",
        F.coalesce("_nd", F.lit(0)).alias("n_distinct"),
        "min_val",
        "max_val",
    )
