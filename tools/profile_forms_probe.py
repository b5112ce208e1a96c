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
