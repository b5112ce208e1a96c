"""Tests for skew salting and bucketed co-located joins."""

import pyspark.sql.functions as F
import pytest

from ena_database_build_spark.operators import skew as K


def test_salted_aggregate_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [(1 if i % 10 else i, float(i % 7)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"])
        for r in K.salted_aggregate(
            df, ["k"], {"n": "count(*)", "total": "sum(v)", "mx": "max(v)"}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i % 5, i) for i in range(1000)], "k long, payload long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(5)], "k long, label string")
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in K.salted_join(fact, dim, ["k"], n_salts=4).collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["label"])
        for r in fact.join(dim, "k").collect()
    )
    assert got == want


def test_salted_aggregate_rejects_non_reaggregable(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError):
        K.salted_aggregate(df, ["k"], {"a": "avg(v)"})


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    K.write_bucketed(left, "t_left", ["k"], n_buckets=8, sort_cols=["k"])
    K.write_bucketed(right, "t_right", ["k"], n_buckets=8, sort_cols=["k"])
    joined = spark.table("t_left").join(spark.table("t_right"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 1000


def test_global_shuffle_matches_serial_rank(spark):
    import hashlib

    from ena_database_build_spark.operators.sampling import global_shuffle

    ids = list(range(100))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r["doc_id"]: r for r in global_shuffle(df, n_shards=7).collect()}
    order = sorted(
        ids,
        key=lambda i: (
            hashlib.md5(f"shuffle|{i}".encode()).hexdigest()[:8],
            i,
        ),
    )
    for pos, doc_id in enumerate(order):
        r = out[doc_id]
        assert r["global_pos"] == pos
        assert r["shard_id"] == pos % 7
        assert r["shard_pos"] == pos // 7
    # round-robin sharding is exactly balanced
    sizes = {}
    for r in out.values():
        sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_global_shuffle_partition_independent(spark):
    from ena_database_build_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    a = sorted(map(tuple, global_shuffle(df, 4).collect()))
    b = sorted(map(tuple, global_shuffle(df.repartition(11), 4).collect()))
    assert a == b


def test_global_shuffle_excludes_null_ids_without_rank_shift(spark):
    """A NULL id must neither appear in the output nor shift real
    rows' ranks (a NULL bucket would sort first in the offsets prefix
    sum and offset every rank by the NULL count)."""
    from ena_database_build_spark.operators.sampling import global_shuffle

    clean = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    dirty = clean.unionByName(
        spark.createDataFrame([(None,), (None,)], "doc_id long")
    )
    a = sorted(map(tuple, global_shuffle(clean, 4).collect()))
    b = sorted(map(tuple, global_shuffle(dirty, 4).collect()))
    assert a == b
    assert len(b) == 40  # ranks dense 0..39, NULL rows dropped
    assert {r[1] for r in b} == set(range(40))


def test_hash_sample_full_fraction_keeps_everything(spark):
    from ena_database_build_spark.operators.sampling import (
        hash_sample,
        train_test_split,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # fraction >= 1 must keep all rows (a 9-hex-digit threshold used to
    # break the fixed-width compare and keep only hashes under '1')
    assert hash_sample(df, 1.0).count() == 200
    splits = train_test_split(df, test_fraction=1.0).groupBy("split").count()
    assert {r["split"]: r["count"] for r in splits.collect()} == {"test": 200}
