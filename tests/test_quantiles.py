"""Relational exact quantiles (operators/quantiles.py) vs Spark's
built-in exact percentile — both implement percentile_cont."""

import pyspark.sql.functions as F

from ena_database_build_spark.operators import quantiles as QNT


def _ref(spark, df, qs):
    row = df.groupBy("g").agg(
        F.percentile("v", F.lit(qs)).alias("p")
    ).collect()
    return {
        (r["g"], q): r["p"][i] for r in row for i, q in enumerate(qs)
    }


def test_matches_builtin_percentile(spark):
    data = [("a", float(v)) for v in [1, 2, 2, 3, 10, 10, 10, 50]] + [
        ("b", float(v)) for v in range(1, 101)
    ]
    df = spark.createDataFrame(data, "g string, v double")
    qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
    want = _ref(spark, df, qs)
    for width in (None, 7.0):
        got = {
            (r["g"], r["q"]): r["value"]
            for r in QNT.exact_quantiles(df, "v", ["g"], qs, width).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (width, k, got[k], want[k])


def test_single_row_group(spark):
    df = spark.createDataFrame([("a", 42.0)], "g string, v double")
    got = QNT.exact_quantiles(df, "v", ["g"], [0.25, 0.75]).collect()
    assert all(r["value"] == 42.0 for r in got)


def test_exact_quantiles_ignores_nulls(spark):
    from ena_database_build_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)],
        "grp string, v double",
    )
    out = exact_quantiles(df, "v", by=["grp"], qs=[0.5]).collect()
    # percentile_cont ignores NULLs: median of {1,2,3} is 2.0, not the
    # null-shifted 1.5
    assert len(out) == 1 and out[0]["value"] == 2.0


def test_quantile_normalize_matches_global_window(spark):
    """The value-level bucketed rank equals the single-window
    percent-rank definition (rank(), so ties share one qnorm) on
    random data with ties, independent of partitioning; single-row
    input normalizes to 0."""
    import random

    from pyspark.sql import Window as W

    from ena_database_build_spark.operators.quantiles import (
        quantile_normalize,
    )

    rng = random.Random(5)
    rows = [(i, float(rng.randint(0, 30))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {
        r.doc_id: r.qnorm
        for r in quantile_normalize(
            df.repartition(7), "score", bins=16
        ).collect()
    }
    want_df = df.select(
        "doc_id",
        F.round(
            (F.rank().over(W.orderBy("score")) - 1).cast("double")
            / (300 - 1),
            6,
        ).alias("qnorm"),
    )
    want = {r.doc_id: r.qnorm for r in want_df.collect()}
    assert got == want
    single = spark.createDataFrame([(1, 9.0)], "doc_id long, score double")
    assert quantile_normalize(single, "score").head().qnorm == 0.0


def test_exact_quantiles_negative_values_bucketed(spark):
    """Negative values produce NEGATIVE bucket indices in the
    distributed prefix sum (floor(-3.7/2) = -2); the bucket-ordinal
    window and offset join must still concatenate buckets in value
    order.  Differential vs Spark's builtin percentile over a mix
    spanning zero, with ties on both sides, at several widths
    including one smaller than the value gaps."""
    data = [("a", float(v)) for v in
            [-50, -10, -10, -3, -1, 0, 0, 2, 7, 7, 25]] + [
           ("b", float(v)) for v in range(-20, 21)]
    df = spark.createDataFrame(data, "g string, v double")
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    want = _ref(spark, df, qs)
    for width in (0.5, 3.0, 1000.0):
        got = {
            (r["g"], r["q"]): r["value"]
            for r in QNT.exact_quantiles(df, "v", ["g"], qs, width).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, (width, k)
