"""Skew mitigation utilities (SURVEY.md 'Partitioning & shuffle':
salting for skewed keys, bucketed writes for co-located joins).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two cases it can't:

* ``salted_aggregate`` — a single hot key in a hash aggregation (AQE
  splits skewed *join* partitions, not agg partitions): two-phase agg
  over a salted key.
* ``salted_join`` — joining a skewed fact against a small-but-not-
  broadcastable dim: explode the dim per salt so each salted fact
  partition finds its match.
* ``write_bucketed`` / bucketed tables — co-locate repeated big-big
  joins at write time so every future join on the bucket key runs
  with zero exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row hash (no
    rand(): deterministic across retries, which matters for exactly-once
    sinks).

    Limitation: the salt hashes ALL columns, so fully identical
    duplicate rows of a hot key land in ONE salt bucket — salting only
    spreads a hot key whose non-key columns vary.  For duplicate-heavy
    skew, first make rows distinct-ish (e.g. add an ingest offset/
    ``line_no``-style column upstream); ``monotonically_increasing_id``
    is deliberately NOT mixed in here because it is not stable across
    task retries."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``aggs`` maps output column -> 'sum(col)' | 'count(*)' | 'min(col)'
    | 'max(col)' — the re-aggregable functions.  A hot key's rows are
    spread over ``n_salts`` partial groups before the final (tiny)
    combine, so one key can no longer pin a single reducer.
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.lower()
        if fn == "count":
            partial_exprs.append(F.count("*").alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(arg).alias(f"_p_{out}"))
            final_exprs.append(
                (F.sum if fn == "sum" else getattr(F, fn))(f"_p_{out}").alias(out)
            )
        else:
            raise ValueError(f"non-re-aggregable function: {spec}")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed fact with a dim too big to broadcast:
    salt the fact rows, replicate each dim row across all salts, join
    on (keys + salt).  The dim side grows n_salts-fold — use only when
    dim_rows * n_salts stays shuffle-friendly.

    Only inner/left/left_semi/left_anti are sound: the replicated dim
    side would emit ``n_salts`` duplicate rows for each unmatched dim
    row under right/full outer joins."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the dim side is replicated per salt, so right/full outer joins "
            "would duplicate unmatched dim rows n_salts times"
        )
    fact_s = with_salt(fact, n_salts)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = fact_s.join(dim_s, [*on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) table: later equi-joins
    or aggregations on ``bucket_cols`` between tables bucketed the same
    way run with no exchange (and no sort, when sorted)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
