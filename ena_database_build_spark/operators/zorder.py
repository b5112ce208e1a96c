"""Z-order (Morton-curve) data layout (SURVEY.md §2.11 extension
surface — multi-dimensional data-skipping for 100 TB parquet lakes).

A table range-partitioned and sorted by ONE column skips files only for
predicates on that column.  Interleaving the bits of several columns
into one Morton key and laying files out along that key gives every
interleaved dimension tight per-file min/max ranges, so parquet
footer/row-group statistics prune files for predicates on ANY of the
dimensions — the same layout trick Delta Lake's OPTIMIZE ZORDER BY and
Hudi clustering use.

Everything here is a pure column expression (shift/mask/or — inside
whole-stage codegen, no UDF) plus one ``repartitionByRange`` whose
range boundaries come from Spark's reservoir sampling of the z-key —
the write itself is a single shuffle at ``target_files`` granularity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column
    (column j contributes bit i to output bit ``i * len(cols) + j``).
    Inputs must be non-negative integers already scaled to the
    ``bits``-bit domain (callers bucketize or mod first); higher bits
    are masked off.  len(cols) * bits must fit in a signed 64-bit
    long."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError("interleaved width exceeds a signed 64-bit long")
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql(exprs: list[str], bits: int = 16) -> str:
    """The identical Morton key as ANSI SQL (for oracles and for
    engines without the DataFrame API)."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            # every term fully parenthesized: Postgres-family parsers
            # (DuckDB included) give '|', '&', '<<' EQUAL precedence,
            # left-associative, so an unparenthesized 'a << 1 | b << 3'
            # parses as '((a << 1) | b) << 3'
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    target_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``zcols``: range-partition into ``target_files`` splits of the
    z-key (reservoir-sampled boundaries — balanced files even on
    skewed data), sort within each split, drop the helper column.
    Readers filtering on any z-dimension skip non-overlapping files
    via footer min/max stats."""
    keyed = df.withColumn(
        "_z", z_value([F.col(c) for c in zcols], bits=bits)
    )
    (
        keyed.repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    size_col: str = "bytes",
    prefix_len: int = 2,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE half of layout
    maintenance, alongside :func:`write_zordered`): assigns every file
    the ``group_id`` of the boundary-aligned byte range its START
    offset falls in — ``group = floor(exclusive_cumsum(bytes) /
    target)``.  Groups are therefore byte ranges of the path-ordered
    concatenation, NOT a strict size cap: a file whose bytes straddle
    a boundary lands wholly in the lower group, which may then exceed
    ``target_bytes`` by up to one file (and an oversized file spans
    several boundaries but is still assigned once, to its start
    offset's group).  Path order keeps each group's files
    directory-adjacent (compacted outputs stay partition-local).

    Scale shape: the global cumulative sum over path order uses the
    repo's two-phase prefix-sum pattern (packing.pack_sequences), with
    the bucket = the path's ``prefix_len``-char prefix — lexicographic
    order makes every prefix bucket CONTIGUOUS, so bucket-local
    cumsums + a tiny bucket-offset pass compose to the exact global
    sum without a single-partition window over all files.

    NULL paths are excluded (the path is the file identity); NULL
    sizes count 0.  Returns ``(path, bytes, group_id)``.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from pyspark.sql import Window

    sized = (
        files.where(F.col(path_col).isNotNull())
        .select(
            F.col(path_col),
            F.coalesce(F.col(size_col), F.lit(0))
            .cast("long")
            .alias("bytes"),
        )
        .withColumn("_bucket", F.substring(path_col, 1, prefix_len))
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(path_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "_local_cum", F.coalesce(F.sum("bytes").over(w_local), F.lit(0))
    )
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # one row per prefix bucket — tiny by construction
    offsets = (
        local.groupBy("_bucket")
        .agg(F.max(F.col("_local_cum") + F.col("bytes")).alias("_btot"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
        )
        .select("_bucket", "_offset")
    )
    # left join for the same ReusedExchange reason as pack_sequences
    return local.join(F.broadcast(offsets), "_bucket", "left").select(
        F.col(path_col),
        "bytes",
        ((F.col("_offset") + F.col("_local_cum")) / target_bytes)
        .cast("long")
        .alias("group_id"),
    )
