"""Snapshot diff (operators/diff.py) and per-source cap
(curation.source_cap)."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import diff as DIFF
from ena_database_build_spark.operators.curation import source_cap


def fp(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return DIFF.with_fingerprint(df)


def test_snapshot_diff_statuses(spark):
    old = fp(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = fp(spark, [(2, "b"), (3, "c CHANGED"), (4, ""), (5, "e")])
    got = {r.doc_id: r.status for r in DIFF.snapshot_diff(
        old, new, "doc_id", "_fp").collect()}
    # doc 4: NULL -> "" is the SAME no-content identity => unchanged
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = fp(spark, [(1, "a"), (2, "b")])
    new = fp(spark, [(1, "a"), (2, "B ")])  # normalizes to 'b': unchanged
    got = {r.doc_id: r.status for r in DIFF.snapshot_diff(
        old, new, "doc_id", "_fp", include_unchanged=True).collect()}
    assert got == {1: "unchanged", 2: "unchanged"}


def test_snapshot_diff_join_is_fingerprint_narrow(spark):
    old = fp(spark, [(1, "a" * 10000)])
    new = fp(spark, [(1, "b" * 10000)])
    plan = DIFF.snapshot_diff(old, new, "doc_id", "_fp")._jdf.queryExecution(
    ).optimizedPlan().toString()
    # the text column must be pruned away before the join
    assert "text#" not in plan.split("Join")[0]


def test_source_cap(spark):
    rows = [
        ("s1", 1, 0.9), ("s1", 2, 0.8), ("s1", 3, 0.7),
        ("s2", 4, 0.5), ("s2", 5, 0.5),  # tie: lower id wins rank 1
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, q double")
    got = sorted(
        r.doc_id
        for r in source_cap(df, "source", "q", n=2, id_col="doc_id").collect()
    )
    assert got == [1, 2, 4, 5]
    got1 = sorted(
        r.doc_id
        for r in source_cap(df, "source", "q", n=1, id_col="doc_id").collect()
    )
    assert got1 == [1, 4]


def test_source_cap_rank_limit_pushdown(spark):
    rows = [("s%d" % (i % 3), i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, q double")
    plan = (
        source_cap(df, "source", "q", n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Spark 3.5+/4.x inserts WindowGroupLimit below the exchange so map
    # tasks pre-trim to their local top-n
    assert "WindowGroupLimit" in plan


def test_bucket_checksums_partition_and_order_independent(spark):
    from ena_database_build_spark.operators.diff import bucket_checksums

    df = spark.createDataFrame(
        [(i, f"v{i}", i % 5) for i in range(300)],
        "id long, s string, g long",
    )
    a = bucket_checksums(df.repartition(1), "id", ["id", "s", "g"])
    b = bucket_checksums(df.repartition(17), "id", ["id", "s", "g"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_replica_diff_localizes_damage(spark):
    from ena_database_build_spark.operators.diff import replica_diff
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(400)], "id long, s string"
    )
    # identical replicas -> no differing bucket
    assert replica_diff(base, base, "id", ["id", "s"]).count() == 0
    # drop one row and corrupt one value -> only their buckets differ
    replica = base.where(F.col("id") != 123).withColumn(
        "s", F.when(F.col("id") == 7, F.lit("BAD")).otherwise(F.col("s"))
    )
    got = replica_diff(base, replica, "id", ["id", "s"]).collect()
    assert 1 <= len(got) <= 2  # the damaged buckets only (may collide)
    # the dropped row's bucket shows the count gap
    assert any(r.n_rows_a == r.n_rows_b + 1 for r in got)
