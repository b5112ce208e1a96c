"""One-pass table profiling (operators/profile.py)."""

import pytest

from ena_database_build_spark.operators import profile as PRF


def sample_df(spark):
    rows = [
        (1, "a", 1.5),
        (2, "b", None),
        (2, None, 2.5),
        (None, "a", 2.5),
    ]
    return spark.createDataFrame(rows, "k long, s string, v double")


def test_exact_profile(spark):
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct, r.min_val, r.max_val)
        for r in PRF.profile(sample_df(spark), distinct="exact").collect()
    }
    assert got["k"] == (4, 1, 2, "1", "2")
    assert got["s"] == (4, 1, 2, "a", "b")
    assert got["v"] == (4, 1, 2, "1.5", "2.5")


def test_approx_profile_counts_and_bounds(spark):
    got = {
        r.col_name: r
        for r in PRF.profile(sample_df(spark), distinct="approx").collect()
    }
    # HLL on tiny inputs is exact; null/row counts identical to exact
    assert got["k"].n_distinct == 2
    assert got["k"].n_nulls == 1
    assert got["s"].min_val == "a"


def test_column_subset_and_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    got = PRF.profile(df, cols=["x"], distinct="exact").collect()[0]
    assert (got.n_rows, got.n_nulls, got.n_distinct) == (2, 2, 0)
    assert got.min_val is None and got.max_val is None


def test_single_aggregation_plan(spark):
    df = sample_df(spark)
    plan = (
        PRF.profile(df, distinct="approx")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # approx profile must stay one aggregation: no Expand, one exchange
    assert "Expand" not in plan
    assert plan.count("Exchange") <= 1


def test_exact_path_no_expand(spark):
    """The exact path must use the two-phase long-form distinct, NOT
    Catalyst's multi-distinct Expand rewrite (which sorts an
    (N+1)x-replicated relation on every profiled column at once —
    round-6 verdict item 2)."""
    df = sample_df(spark)
    plan = (
        PRF.profile(df, distinct="exact")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    # the Expand rewrite's real cost was the full Sort of the
    # replicated relation on every profiled column; a keyless
    # SortAggregate (string min/max fold) is fine — an actual Sort
    # node is not
    assert "Sort [" not in plan


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError):
        PRF.profile(sample_df(spark), distinct="nope")


def encodable_df(spark):
    """Every type the single-scan exact path encodes, with NULLs and
    duplicates in each column."""
    import datetime as dt

    rows = [
        (1, 10, True, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5), "b"),
        (2, -10, False, dt.date(2023, 12, 31), dt.datetime(2024, 1, 1), "a"),
        (1, None, True, None, dt.datetime(2024, 1, 1), None),
        (None, 10, None, dt.date(2024, 1, 2), None, "a"),
    ]
    return spark.createDataFrame(
        rows, "k long, i int, b boolean, d date, t timestamp, s string"
    )


def test_single_scan_exact_all_types(spark):
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct, r.min_val, r.max_val)
        for r in PRF.profile(encodable_df(spark), distinct="exact").collect()
    }
    assert got["k"] == (4, 1, 2, "1", "2")
    assert got["i"] == (4, 1, 2, "-10", "10")
    assert got["b"] == (4, 1, 2, "false", "true")
    assert got["d"] == (4, 1, 2, "2023-12-31", "2024-01-02")
    assert got["t"][1:3] == (1, 2)
    assert got["t"][3].startswith("2024-01-01 00:00:00")
    assert got["t"][4].startswith("2024-01-02 03:04:05")
    assert got["s"] == (4, 1, 2, "a", "b")


def test_single_scan_matches_two_job_renderings(spark):
    """The post-aggregation decode must render min/max exactly like
    cast(value AS string) — pin it against the wide-agg fallback on
    the same data."""
    df = encodable_df(spark)
    exact = {
        r.col_name: (r.min_val, r.max_val)
        for r in PRF.profile(df, distinct="exact").collect()
    }
    wide = {
        r.col_name: (r.min_val, r.max_val)
        for r in PRF.profile(df, distinct="approx").collect()
    }
    assert exact == wide


def test_single_scan_empty_and_all_null(spark):
    import datetime  # noqa: F401

    df = spark.createDataFrame([], "k long, s string")
    rows = {r.col_name: r for r in PRF.profile(df, distinct="exact").collect()}
    assert set(rows) == {"k", "s"}
    for r in rows.values():
        assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
        assert r.min_val is None and r.max_val is None


def test_single_scan_plan_shape(spark):
    """One scan, no Expand, no Sort of DATA rows.  The per-column fold
    is a SortAggregate (string min/max buffers are not
    hash-aggregable), but its Sort sits ABOVE the dedup exchange —
    bounded by the number of distinct values, the same bound the
    exchange itself pays — never below it on the raw-row side."""
    df = encodable_df(spark)
    plan = (
        PRF.profile(df, distinct="exact")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    assert plan.count("Scan ExistingRDD") <= 1
    # top-down print: everything after the LAST hashpartitioning
    # exchange is the scan side of the dedup — no Sort may touch it
    below_dedup = plan[plan.rindex("Exchange hashpartitioning") :]
    assert "Sort [" not in below_dedup


def test_exact_distinct_on_array_columns_is_native(spark):
    """Array values whose STRING renderings collide (["a, b"] vs
    ["a","b"] both print "[a, b]") must still count as distinct — the
    r7 ADVICE regression: the two-job fallback judged distinctness on
    the rendering.  Also covers a struct column and checks the float
    column sharing the relation still normalizes -0.0 == 0.0."""
    rows = [
        (["a, b"], (1, "x"), -0.0),
        (["a", "b"], (1, "x"), 0.0),
        (["a", "b"], (2, "y"), 1.5),
        (None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "arr array<string>, st struct<a:int,b:string>, f double",
    )
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in PRF.profile(df, distinct="exact").collect()
    }
    assert got["arr"] == (4, 1, 2)  # renderings collide, values do not
    assert got["st"] == (4, 1, 2)
    assert got["f"] == (4, 1, 2)  # -0.0 and 0.0 are ONE distinct value


def test_exact_distinct_nested_timestamp_microseconds(spark):
    """Nested timestamps ride the to_json shared scan, where Spark's
    DEFAULT timestampFormat truncates to milliseconds — microsecond-
    distinct values rendered identically and undercounted (r9 review
    finding).  The encoding now pins explicit microsecond formats for
    both timestamp and timestamp_ntz at any nesting depth."""
    df = spark.sql("""
        SELECT array(timestamp'2020-01-01 00:00:00.123456') AS a,
               named_struct('t', timestamp_ntz'2020-01-01 00:00:00.123456') AS s
        UNION ALL
        SELECT array(timestamp'2020-01-01 00:00:00.123999'),
               named_struct('t', timestamp_ntz'2020-01-01 00:00:00.123999')
    """)
    got = {
        r.col_name: r.n_distinct
        for r in PRF.profile(df, distinct="exact").collect()
    }
    assert got["a"] == 2  # default [.SSS] format rendered both .123
    assert got["s"] == 2


def test_exact_distinct_map_column_native(spark):
    """Map columns take the native count_distinct path: counted
    key-order-insensitively ({a:1,b:2} == {b:2,a:1}), NULL min/max
    (maps define no ordering).  Nested maps (array<map>) behave the
    same."""
    rows = [
        ({"a": 1, "b": 2}, [{"x": 1}]),
        ({"b": 2, "a": 1}, [{"x": 1}]),  # same map, different key order
        ({"a": 9}, [{"x": 2}]),
        (None, None),
    ]
    df = spark.createDataFrame(
        rows, "m map<string,int>, am array<map<string,int>>"
    )
    for mode in ("exact", "approx"):
        got = {
            r.col_name: r for r in PRF.profile(df, distinct=mode).collect()
        }
        assert (got["m"].n_rows, got["m"].n_nulls) == (4, 1)
        assert (got["am"].n_rows, got["am"].n_nulls) == (4, 1)
        assert got["m"].min_val is None and got["m"].max_val is None
        assert got["am"].min_val is None and got["am"].max_val is None
        if mode == "exact":
            assert got["m"].n_distinct == 2
            assert got["am"].n_distinct == 2


def test_json_faithful_type_routing():
    """r8 verdict #3: nested types WITHOUT maps or floats ride the
    shared to_json long-form distinct; maps and float-bearing nested
    types stay on the native per-column path."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, FloatType, IntegerType, MapType,
        StringType, StructField, StructType,
    )

    assert PRF._json_faithful(ArrayType(StringType()))
    assert PRF._json_faithful(ArrayType(ArrayType(IntegerType())))
    assert PRF._json_faithful(
        StructType([StructField("a", IntegerType()),
                    StructField("b", StringType())])
    )
    assert not PRF._json_faithful(ArrayType(DoubleType()))
    assert not PRF._json_faithful(ArrayType(FloatType()))
    assert not PRF._json_faithful(MapType(StringType(), IntegerType()))
    assert not PRF._json_faithful(
        ArrayType(MapType(StringType(), IntegerType()))
    )
    assert not PRF._json_faithful(
        StructType([StructField("a", DoubleType())])
    )
    # atomic types are _cast_faithful's domain, not json's
    assert not PRF._json_faithful(StringType())


def test_json_faithful_columns_share_the_distinct_scan(spark):
    """A json-faithful array column must NOT add a per-column
    count_distinct branch: the exact plan carries exactly two scans of
    the input (wide agg + shared long-form distinct), same as an
    all-atomic profile.  A float-bearing array adds its one native
    branch (third scan)."""
    df = spark.createDataFrame(
        [(1, ["a, b"], [0.5]), (2, ["a", "b"], [0.5])],
        "k long, arr array<string>, farr array<double>",
    )
    def scans(d):
        # createDataFrame materializes as LogicalRDD in the optimized
        # plan; each occurrence is one scan of the input
        return d._jdf.queryExecution().optimizedPlan().toString().count(
            "LogicalRDD"
        )

    shared = PRF.profile(df, cols=["k", "arr"], distinct="exact")
    assert scans(shared) == 2, scans(shared)
    with_native = PRF.profile(df, distinct="exact")
    assert scans(with_native) == 3, scans(with_native)
    # correctness unchanged: colliding renderings still distinct
    got = {r.col_name: r.n_distinct for r in with_native.collect()}
    assert got == {"k": 2, "arr": 2, "farr": 1}


def test_exact_distinct_float_array_negative_zero(spark):
    """[-0.0] and [0.0] are ONE distinct value under Spark's group-by
    normalization; the float-bearing array stays on the native path so
    the count is right (to_json would render the sign and say 2)."""
    df = spark.createDataFrame(
        [([-0.0],), ([0.0],), ([1.0],)], "fa array<double>"
    )
    got = {r.col_name: r for r in PRF.profile(df, distinct="exact").collect()}
    assert got["fa"].n_distinct == 2
