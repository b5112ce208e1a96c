"""Z-order layout (operators/zorder.py)."""

import random

from pyspark.sql import functions as F

from ena_database_build_spark.operators import zorder as Z


def interleave_model(vals, bits):
    """Reference Morton key in plain Python."""
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_z_value_matches_model(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(0, 1 << 10), rng.randrange(0, 1 << 10))
        for _ in range(200)
    ] + [(0, 0), ((1 << 10) - 1, (1 << 10) - 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", Z.z_value([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r.z == interleave_model([r.x, r.y], 10)


def test_z_value_masks_high_bits_and_three_dims(spark):
    df = spark.createDataFrame([(0b1111_0101, 0b0011, 0b1000)], "a long, b long, c long")
    r = df.select(
        Z.z_value([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]
    assert r.z == interleave_model([0b0101, 0b0011, 0b1000], 4)


def test_width_guard():
    import pytest

    with pytest.raises(ValueError):
        Z.z_value([F.col("a"), F.col("b")], bits=32)


def test_layout_prunes_both_dimensions(spark, tmp_path):
    # two independent uniform dims; a z-layout must give BOTH dims
    # file-level selectivity (a single-column sort gives only one)
    rng = random.Random(5)
    rows = [
        (i, rng.randrange(0, 256), rng.randrange(0, 256))
        for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "zordered")
    Z.write_zordered(df, path, zcols=["x", "y"], bits=8, target_files=16)

    back = spark.read.parquet(path).withColumn(
        "_f", F.input_file_name()
    )
    stats = back.groupBy("_f").agg(
        F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
    ).collect()
    n_files = len(stats)
    assert n_files >= 12  # repartitionByRange hit ~target_files

    def overlapping(lo_col, hi_col, lo, hi):
        return sum(
            1 for s in stats if s[lo_col] <= hi and s[hi_col] >= lo
        )

    # a 1/8-wide predicate on EITHER dim must skip at least half the files
    assert overlapping("x_lo", "x_hi", 0, 31) <= n_files // 2
    assert overlapping("y_lo", "y_hi", 0, 31) <= n_files // 2
    # and no rows were lost or duplicated by the rewrite
    assert back.count() == 20000
    assert back.select("id").distinct().count() == 20000


def test_plan_compaction_greedy_fill(spark):
    from ena_database_build_spark.operators.zorder import plan_compaction

    files = spark.createDataFrame(
        [(f"d{i % 4}/f{i:04d}", 100 + (i * 37) % 400) for i in range(200)]
        + [("d9/huge", 5000), ("d9/nullsize", None)],
        "path string, bytes long",
    )
    got = plan_compaction(files, target_bytes=1000).collect()
    rows = sorted(got, key=lambda r: r.path)
    # reference: greedy fill in path order
    cum, want = 0, {}
    for r in rows:
        want[r.path] = cum // 1000
        cum += r.bytes
    assert {r.path: r.group_id for r in rows} == want
    # groups are contiguous in path order
    gids = [r.group_id for r in rows]
    assert gids == sorted(gids)
    # the oversized file got its own group span
    huge = next(r for r in rows if r.path == "d9/huge")
    assert sum(1 for r in rows if r.group_id == huge.group_id) <= 2


def test_plan_compaction_partition_independent(spark):
    from ena_database_build_spark.operators.zorder import plan_compaction

    files = spark.createDataFrame(
        [(f"p{i % 7}/f{i:05d}", (i * 131) % 900) for i in range(500)],
        "path string, bytes long",
    )
    a = plan_compaction(files.repartition(1), 2000).collect()
    b = plan_compaction(files.repartition(13), 2000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
