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
  admits an order-preserving long encoding or is a string — integral
  types, booleans, dates, timestamps, strings): each row projects to
  ``posexplode(array(struct(el_i, es_i)))`` where exactly one field
  is populated per column — ``el`` a native long that sorts like the
  value (cast for integral/boolean, ``unix_date``/``unix_micros``
  for temporal), ``es`` the raw string.  One hash aggregate dedups
  (col_idx, struct) WITH a per-group count (map-side partial
  collapses duplicates before the exchange), then a per-col_idx
  aggregate reads every statistic off the deduped relation:
  n_rows = sum(cnt), n_nulls = cnt of the NULL-struct group,
  n_distinct = count of non-NULL groups, min/max = min/max over each
  encoding field separately (the unused field is all-NULL, which
  min/max ignore — and scalar long/string aggregates keep the fold a
  HashAggregate where a struct min/max would force a Sort), decoded
  to the ``cast(value AS string)`` rendering AFTER aggregation on
  <= 2 values per column.  Three stages, one scan, shuffle payload 8
  fixed bytes (or the raw string) per DISTINCT value — the same
  cardinality bound any exact-distinct plan pays, without the
  round-6 form's per-row hex/string rendering.

* **two-job long form** (fallback when a column's type has no such
  encoding — float/double, decimals, binary, arrays, structs): the
  ``approx`` wide aggregation minus the distincts (count/nulls/min/max
  on native types, one scan, no sort), plus exact distinct counts
  broadcast-joined in: columns whose string cast is injective share a
  long-form grouped ``count_distinct`` over the cast values, while
  non-atomic columns (arrays, structs — where the rendering is NOT
  injective: ``["a, b"]`` and ``["a","b"]`` both render ``[a, b]``)
  each run a native per-column ``count_distinct`` aggregation
  (maps included — counted key-order-insensitively; their min/max
  report NULL since maps define no ordering).

Exactness caveat (fallback path only): for the string-cast columns,
floating -0.0 and 0.0 render differently while ``count(DISTINCT)``
treats them as equal, so float/double columns are normalized with
``+ 0.0`` (IEEE: turns -0.0 into 0.0, identity for every other value
incl. NaN) before the cast."""

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

def _long_enc(col: Column, dt: DataType) -> Column | None:
    """A LONG whose native ordering equals ``col``'s, or None when the
    type has no such encoding (strings ride the struct's second field
    verbatim; float/decimal/binary take the two-job fallback).  A
    native long shuffles as 8 fixed bytes and hashes/compares without
    the per-row hex rendering the round-6 string encoding paid."""
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return col.cast("long")
    if isinstance(dt, BooleanType):
        return col.cast("long")
    if isinstance(dt, DateType):
        return F.unix_date(col).cast("long")
    if isinstance(dt, TimestampType):
        return F.unix_micros(col)
    return None


def _decode_disp(el: Column, es: Column, dt: DataType) -> Column:
    """Render a min/max encoding back to the string the caller sees —
    identical to ``cast(value AS string)`` on the native column.  Runs
    on <= 2 values per profiled column, so decode cost is nil."""
    if isinstance(dt, StringType):
        return es
    if isinstance(dt, BooleanType):
        return el.cast("boolean").cast("string")
    if isinstance(dt, DateType):
        return F.date_from_unix_date(el.cast("int")).cast("string")
    if isinstance(dt, TimestampType):
        return F.timestamp_micros(el).cast("string")
    return el.cast("string")


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
        dts = [df.schema[c].dataType for c in cols]
        if all(
            isinstance(dt, StringType) or _long_enc(F.col(c), dt) is not None
            for c, dt in zip(cols, dts)
        ):
            return _exact_single_scan(df, cols)
        return _exact_two_job(df, cols)

    return _wide_stack(df, cols, approx_nd=True)


def _orderable(dt: DataType) -> bool:
    """Whether Spark's min/max accept the type: atomic types yes,
    arrays/structs of orderable types yes, maps (at any nesting) no."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _wide_stack(df: DataFrame, cols: list[str], approx_nd: bool) -> DataFrame:
    """One wide aggregation + stack pivot.  ``approx_nd=False`` leaves
    ``n_distinct`` NULL for the two-job exact path to fill in.
    Non-orderable columns (maps) report NULL min/max — Spark defines
    no ordering for them — while count/nulls/HLL still apply."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    null_s = F.lit(None).cast("string")
    for i, c in enumerate(cols):
        col = F.col(c)
        ordb = _orderable(df.schema[c].dataType)
        if approx_nd:
            aggs.append(F.approx_count_distinct(col).alias(f"_nd_{i}"))
        aggs.append(F.count(col).alias(f"_nn_{i}"))
        aggs.append(
            (F.min(col).cast("string") if ordb else F.min(null_s)).alias(
                f"_min_{i}"
            )
        )
        aggs.append(
            (F.max(col).cast("string") if ordb else F.max(null_s)).alias(
                f"_max_{i}"
            )
        )
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


def _exact_single_scan(df: DataFrame, cols: list[str]) -> DataFrame:
    """All statistics off ONE scan: explode to (col_idx,
    struct(el: long, es: string)), dedup with counts, fold per column.
    Exactly one struct field is populated per COLUMN (``el`` for
    integral/boolean/temporal values via the order-preserving long
    encoding, ``es`` for strings), so per-field min/max aggregates
    (which ignore the unused field's NULLs) recover the native
    min/max without a struct-valued — hence sort-based — aggregate.
    The shuffled payload is 8
    fixed bytes (or the raw string) per distinct value — no per-row
    hex/string rendering; the caller-facing ``cast(value AS string)``
    display is decoded AFTER aggregation on <= 2 values per column.
    NULL values become a NULL struct: its group carries the null
    count and is skipped by count/min/max."""
    dts = [df.schema[c].dataType for c in cols]
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")

    def enc_struct(c: str, dt: DataType) -> Column:
        el = _long_enc(F.col(c), dt)
        if el is None:  # string column
            pair = F.struct(null_l.alias("el"), F.col(c).alias("es"))
        else:
            pair = F.struct(el.alias("el"), null_s.alias("es"))
        return F.when(F.col(c).isNotNull(), pair)

    pairs = df.select(
        F.posexplode(
            F.array(*[enc_struct(c, dt) for c, dt in zip(cols, dts)])
        ).alias("_ci", "_s")
    )
    # min/max aggregate the two encoding fields SEPARATELY (the field
    # the column does not use is all-NULL, which min/max ignore): long
    # and string are hash-aggregable, so the fold stays a
    # HashAggregate — a struct-valued min/max would force Catalyst to
    # a SortAggregate and a Sort of the deduped relation
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
            F.min(F.col("_s").getField("el")).alias("_min_l"),
            F.max(F.col("_s").getField("el")).alias("_max_l"),
            F.min(F.col("_s").getField("es")).alias("_min_str"),
            F.max(F.col("_s").getField("es")).alias("_max_str"),
        )
    )

    def decode(lf: str, sf: str) -> Column:
        out = null_s
        for i, dt in enumerate(dts):
            out = F.when(
                F.col("_ci") == i, _decode_disp(F.col(lf), F.col(sf), dt)
            ).otherwise(out)
        return out

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
        decode("_min_l", "_min_str").alias("min_val"),
        decode("_max_l", "_max_str").alias("max_val"),
    )


def _cast_faithful(dt: DataType) -> bool:
    """True when ``cast(col AS string)`` is injective over the type's
    value domain (after the -0.0 normalization for float/double), so
    distinct-over-rendering equals distinct-over-values.  Atomic types
    qualify: strings trivially, long-encodable types by order
    isomorphism, float/double/decimal by unique decimal renderings,
    binary because the cast is a byte-passthrough (UTF8String wraps
    the raw bytes; equality is byte-wise).  Arrays/structs/maps do NOT
    — e.g. array values ``["a, b"]`` and ``["a", "b"]`` both render
    ``[a, b]`` (r7 ADVICE); see :func:`_json_faithful` for the nested
    types that can still share the scan via ``to_json``."""
    from pyspark.sql.types import BinaryType, DecimalType

    return (
        isinstance(
            dt, (StringType, FloatType, DoubleType, DecimalType, BinaryType)
        )
        or _long_enc(F.col("_"), dt) is not None
    )


def _json_faithful(dt: DataType) -> bool:
    """True when ``to_json(col)`` is injective w.r.t. Spark's VALUE
    equality for a nested type, so the column can ride the shared
    single-scan long-form distinct instead of its own per-column
    ``count_distinct`` job (r8 verdict #3).  JSON quotes and escapes
    strings, so ``["a, b"]`` vs ``["a", "b"]`` render distinctly —
    the defect that disqualified the plain string cast.

    Two exclusions keep the encoding faithful:

    * maps (at any nesting): Spark's group-by equality is key-order-
      insensitive while to_json renders entry order verbatim;
    * float/double (at any nesting): group-by NORMALIZES -0.0 to 0.0
      inside nested types (NormalizeFloatingNumbers) while to_json
      renders the sign, so [-0.0] and [0.0] would double-count.

    Nested timestamps stay IN, but only because :func:`_exact_two_job`
    renders them with explicit MICROSECOND formats: Spark's default
    to_json timestampFormat is millisecond ([.SSS]), which collapses
    microsecond-distinct values — array(ts'..00.123456') and
    array(ts'..00.123999') both rendered ["..00.123Z"] and
    undercounted (r9 review finding, probed on this Spark build;
    regression-pinned in tests/test_profile.py).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    def clean(t: DataType) -> bool:
        if isinstance(t, (MapType, FloatType, DoubleType)):
            return False
        if isinstance(t, ArrayType):
            return clean(t.elementType)
        if isinstance(t, StructType):
            return all(clean(f.dataType) for f in t.fields)
        return True

    return isinstance(dt, (ArrayType, StructType)) and clean(dt)


def _exact_two_job(df: DataFrame, cols: list[str]) -> DataFrame:
    """Fallback for column types without an order-preserving long
    encoding: native-typed wide agg (count/nulls/min/max) + exact
    distinct counts, broadcast-joined.  No Expand: a single distinct
    aggregate per group never triggers Catalyst's multi-distinct
    rewrite.

    Distinct counts come from TWO sources keyed by type (r7 ADVICE —
    the string rendering is non-injective for non-atomic types):

    * columns whose string cast is injective (:func:`_cast_faithful`)
      AND nested columns with an injective ``to_json`` canonical
      encoding (:func:`_json_faithful` — r8 verdict #3: this folds
      most array/struct columns back into the shared scan) share ONE
      long-form grouped ``count_distinct`` — one scan for all of them;
    * every other column (maps at any nesting, float-bearing nested
      types) gets its own native ``count_distinct`` aggregation —
      exact, one pruned scan per column, unioned into the same tiny
      broadcast side.  Maps aggregate key-order-insensitively
      (count_distinct treats {a:1,b:2} == {b:2,a:1}) but define no
      ordering, so their min/max report NULL (see
      :func:`_orderable`)."""

    def _norm(c: str) -> Column:
        col = F.col(c)
        dt = df.schema[c].dataType
        if _json_faithful(dt):
            # microsecond formats: the defaults truncate to [.SSS],
            # collapsing microsecond-distinct nested timestamps (see
            # _json_faithful)
            return F.to_json(
                col,
                {
                    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                },
            )
        if isinstance(dt, (FloatType, DoubleType)):
            col = col + F.lit(0.0)  # -0.0 -> 0.0; identity otherwise
        return col.cast("string")

    faithful = [
        c for c in cols
        if _cast_faithful(df.schema[c].dataType)
        or _json_faithful(df.schema[c].dataType)
    ]
    native = [c for c in cols if c not in faithful]

    base = _wide_stack(df, cols, approx_nd=False)
    nd_parts = []
    if faithful:
        pairs = df.select(
            F.posexplode(F.array(*[_norm(c) for c in faithful])).alias(
                "_ci", "_v"
            )
        )
        nd_parts.append(
            pairs.groupBy("_ci")
            .agg(F.count_distinct("_v").alias("_nd"))
            .select(
                F.element_at(
                    F.array(*[F.lit(c) for c in faithful]), F.col("_ci") + 1
                ).alias("col_name"),
                "_nd",
            )
        )
    for c in native:
        nd_parts.append(
            df.agg(F.count_distinct(F.col(c)).alias("_nd")).select(
                F.lit(c).alias("col_name"), "_nd"
            )
        )
    nd = nd_parts[0]
    for part in nd_parts[1:]:
        nd = nd.unionByName(part)
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
