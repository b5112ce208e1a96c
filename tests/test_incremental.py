"""Incremental stats (operators/incremental.py): merge-of-partials
equals full recompute, associativity, and NULL handling."""

import math
import random

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators import incremental as INC

random.seed(7)
ROWS = [
    (i, ["a", "b", "c"][i % 3], random.randint(0, 1000))
    for i in range(300)
] + [(900, "a", None)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id long, grp string, v long"
    ).cache()


def full(df):
    return INC.finalize_stats(INC.partial_stats(df, ["grp"], "v"))


def test_merge_equals_full_recompute(spark, df):
    parts = [
        INC.partial_stats(df.where(F.col("id") % 4 == k), ["grp"], "v")
        for k in range(4)
    ]
    merged = INC.finalize_stats(INC.merge_stats(*parts))
    assert sorted(merged.collect()) == sorted(full(df).collect())


def test_merge_is_associative(spark, df):
    a = INC.partial_stats(df.where(F.col("id") < 100), ["grp"], "v")
    b = INC.partial_stats(
        df.where((F.col("id") >= 100) & (F.col("id") < 200)), ["grp"], "v"
    )
    c = INC.partial_stats(df.where(F.col("id") >= 200), ["grp"], "v")
    left = INC.merge_stats(INC.merge_stats(a, b), c)
    right = INC.merge_stats(a, INC.merge_stats(b, c))
    assert sorted(left.collect()) == sorted(right.collect())


def test_values_match_python(spark, df):
    got = {r.grp: r for r in full(df).collect()}
    for g in ("a", "b", "c"):
        vals = [v for _, grp, v in ROWS if grp == g and v is not None]
        r = got[g]
        assert r.n == len(vals)
        assert r.total == sum(vals)
        assert r.min_val == min(vals) and r.max_val == max(vals)
        mean = sum(vals) / len(vals)
        var = sum(x * x for x in vals) / len(vals) - mean * mean
        assert math.isclose(r.mean_val, round(mean, 6), abs_tol=1e-6)
        assert math.isclose(r.var_val, round(var, 6), abs_tol=1e-6)


def test_empty_delta_is_identity(spark, df):
    base = INC.partial_stats(df, ["grp"], "v")
    empty = INC.partial_stats(df.where(F.lit(False)), ["grp"], "v")
    merged = INC.finalize_stats(INC.merge_stats(base, empty))
    assert sorted(merged.collect()) == sorted(full(df).collect())
