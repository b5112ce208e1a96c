"""One-off experiment (round 9, verdict #3): can a different exact-
distinct plan shape beat ``_exact_single_scan`` on the table_profile
row's workload (orders; o_orderkey/o_custkey long + two low-card
strings)?

Forms measured, all value-identical to profile(distinct='exact'):

* ``single_scan``  — current: posexplode to (col_idx, struct) ->
  dedup-with-count -> per-col fold.  One scan, but the explode
  multiplies rows x4 and the exchange ships structs.
* ``union_percol`` — one oracle-shaped branch per column:
  agg(count, count(c), min, max, count_distinct(c)) — Spark's
  single-distinct rewrite plans each branch as partial-groupBy(c) ->
  exchange(c) -> merge, with a column-PRUNED scan; branches are
  independent stage pipelines inside ONE job.  N scans of one column
  each ~= one scan of N columns (columnar parquet), native-typed
  exchange, no row multiplication.
* ``widestack_plus_longform`` — the two-job shape with the long-form
  distinct riding the (el, es) struct encoding.

Usage: python tools/profile_forms_probe.py <data_dir> [reps]
(data_dir = a dir with orders.parquet or orders.parquet/ shards, e.g.
the tools/bench_bars.py replica dirs)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ena_database_build_spark.operators import profile as PRF  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def union_percol(df: DataFrame, cols: list[str]) -> DataFrame:
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def single_scan_flat(df: DataFrame, cols: list[str]) -> DataFrame:
    """_exact_single_scan with FLAT group keys: after the explode the
    struct unwraps to two plain columns, so the first hash aggregate
    keys on (int, long, string) instead of (int, struct) — cheaper
    hashing/equality in codegen, same rows and bytes."""
    from pyspark.sql.types import StringType

    from ena_database_build_spark.operators.profile import (
        _decode_disp, _long_enc,
    )

    dts = [df.schema[c].dataType for c in cols]
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")

    def enc_struct(c, dt):
        el = _long_enc(F.col(c), dt)
        if el is None:
            pair = F.struct(null_l.alias("el"), F.col(c).alias("es"))
        else:
            pair = F.struct(el.alias("el"), null_s.alias("es"))
        return F.when(F.col(c).isNotNull(), pair)

    pairs = df.select(
        F.posexplode(
            F.array(*[enc_struct(c, dt) for c, dt in zip(cols, dts)])
        ).alias("_ci", "_s")
    ).select(
        "_ci",
        F.col("_s").isNull().alias("_null"),
        F.col("_s").getField("el").alias("_el"),
        F.col("_s").getField("es").alias("_es"),
    )
    per_col = (
        pairs.groupBy("_ci", "_null", "_el", "_es")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("_ci")
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("_null"), F.col("_cnt"))), F.lit(0)
            ).alias("n_nulls"),
            F.count(F.when(~F.col("_null"), F.lit(1))).alias("n_distinct"),
            F.min("_el").alias("_min_l"),
            F.max("_el").alias("_max_l"),
            F.min("_es").alias("_min_str"),
            F.max("_es").alias("_max_str"),
        )
    )

    def decode(lf, sf):
        out = null_s
        for i, dt in enumerate(dts):
            out = F.when(
                F.col("_ci") == i, _decode_disp(F.col(lf), F.col(sf), dt)
            ).otherwise(out)
        return out

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


def main() -> None:
    data = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-forms", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{data}/orders.parquet"
    if Path(path).is_dir():
        path = f"{path}/*.parquet"
    orders = spark.read.parquet(path)

    forms = {
        "single_scan": lambda: PRF.profile(orders, COLS, distinct="exact"),
        "union_percol": lambda: union_percol(orders, COLS),
        "single_scan_flat": lambda: single_scan_flat(orders, COLS),
    }
    # sanity: identical values
    ref = {tuple(r) for r in forms["single_scan"]().collect()}
    for name, fn in forms.items():
        got = {tuple(r) for r in fn().collect()}
        assert got == ref, (name, got ^ ref)
    print("values identical across forms")

    for name, fn in forms.items():
        walls = []
        for _ in range(reps):
            df = fn()  # fresh plan per rep (no cached exchange reuse)
            st = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - st, 3))
        print(f"{name:28s} best={min(walls):.3f}  runs={walls}")


if __name__ == "__main__":
    main()
