"""Two-pass exact heavy hitters (operators/heavyhitters.py).

The contract under test: the two-pass plan is EXACTLY equivalent to the
naive global ``GROUP BY item HAVING count*(k+1) > n`` — the Misra-Gries
pass may only affect the candidate set, never the result — under
adversarial partitioning, skew, NULLs, and empty input.
"""

import random

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators import heavyhitters as HH


def naive(df, item_col, k):
    counted = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count("*").alias("freq"))
    )
    n = df.where(F.col(item_col).isNotNull()).count()
    return counted.where(F.col("freq") * (k + 1) > F.lit(n))


def rows(df):
    return sorted((r.item, r.freq) for r in df.collect())


def zipf_items(n, n_distinct, seed):
    rng = random.Random(seed)
    return [
        f"w{min(int(rng.paretovariate(1.1)), n_distinct)}" for _ in range(n)
    ]


@pytest.mark.parametrize("k,parts", [(5, 1), (5, 7), (20, 3), (50, 13)])
def test_matches_naive_on_zipf(spark, k, parts):
    data = [(w,) for w in zipf_items(20000, 400, seed=k * 100 + parts)]
    df = spark.createDataFrame(data, "item string").repartition(parts)
    got = rows(HH.heavy_hitters(df, "item", k))
    want = rows(naive(df, "item", k))
    assert got == want
    assert len(got) > 0  # non-vacuous: the zipf head qualifies


def test_adversarial_partition_layout(spark):
    # every partition sees a different dominant item; the true heavy
    # hitter is spread thin across all partitions (the classic case
    # where per-partition top-k WITHOUT the MG guarantee goes wrong)
    data = []
    for p in range(8):
        data += [(f"local{p}_{i % 30}",) for i in range(300)]
        data += [("global",)] * 150
    df = spark.createDataFrame(data, "item string").repartition(8)
    k = 6
    got = rows(HH.heavy_hitters(df, "item", k))
    want = rows(naive(df, "item", k))
    assert got == want
    assert ("global", 1200) in got


def test_nulls_excluded_and_empty_input(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "item string"
    )
    got = rows(HH.heavy_hitters(df, "item", 2))
    # n = 3 non-NULL rows; 'a' has 2 > 3/3 = 1 qualifies, 'b' 1 == 1 not
    assert got == [("a", 2)]
    empty = spark.createDataFrame([], "item string")
    assert HH.heavy_hitters(empty, "item", 5).count() == 0


def test_candidate_superset_guarantee(spark):
    # every item with freq > n/(k+1) must appear in the pass-1 union
    data = [(w,) for w in zipf_items(5000, 200, seed=7)]
    df = spark.createDataFrame(data, "item string").repartition(5)
    k = 10
    cands = {
        r.item
        for r in HH.misra_gries_partials(df, "item", k)
        .where(F.col("item").isNotNull())
        .collect()
    }
    for item, _freq in rows(naive(df, "item", k)):
        assert item in cands
    # and the candidate set stays sketch-sized: <= partitions * k
    assert len(cands) <= 5 * k


def test_pass2_broadcasts_candidates(spark):
    data = [(w,) for w in zipf_items(2000, 50, seed=3)]
    df = spark.createDataFrame(data, "item string").repartition(4)
    plan = HH.heavy_hitters(df, "item", 8)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
