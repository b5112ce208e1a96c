"""JL projection and mean-pool rollup (operators/similarity.py)."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import similarity as SIM


def test_jl_project_matches_model(spark):
    dim, out = 6, 3
    vecs = [(0, [1.0, 0.0, 2.0, -1.0, 0.5, 3.0]), (1, [0.0] * 6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: [r.proj_0, r.proj_1, r.proj_2]
        for r in SIM.jl_project(df, out_dim=out, dim=dim).collect()
    }
    planes = [SIM._srp_plane(p, dim) for p in range(out)]
    for vid, v in vecs:
        want = [sum(a * b for a, b in zip(v, pl)) for pl in planes]
        assert [round(x, 9) for x in got[vid]] == [
            round(x, 9) for x in want
        ]


def test_jl_project_preserves_cosine_sign_structure(spark):
    # identical vectors project identically; opposite vectors negate
    rows = [(0, [1.0, 2.0, -1.0, 0.5]), (1, [1.0, 2.0, -1.0, 0.5]),
            (2, [-1.0, -2.0, 1.0, -0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.proj_0, r.proj_1)
        for r in SIM.jl_project(df, out_dim=2, dim=4).collect()
    }
    assert got[0] == got[1]
    assert got[2] == (-got[0][0], -got[0][1])


def test_mean_pool(spark):
    rows = [
        (10, [1.0, 2.0]),
        (10, [3.0, 6.0]),
        (11, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "doc long, embedding array<double>")
    got = sorted(
        (r.grp, r.dim, r.mean_val)
        for r in SIM.mean_pool(df, "doc").collect()
    )
    assert got == [(10, 1, 2.0), (10, 2, 4.0), (11, 1, 5.0), (11, 2, 5.0)]


def test_mean_pool_partition_independent(spark):
    rows = [(i % 7, [float(i), float(i * 2), 1.0]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc long, embedding array<double>")
    a = sorted(
        (r.grp, r.dim, round(r.mean_val, 9))
        for r in SIM.mean_pool(df.repartition(1), "doc").collect()
    )
    b = sorted(
        (r.grp, r.dim, round(r.mean_val, 9))
        for r in SIM.mean_pool(df.repartition(13), "doc").collect()
    )
    assert a == b


def test_standardize_dims_hand_computed(spark):
    """z-scores per dimension: dim 0 has mean 2, pop-std 1 -> z in
    {-1,0,1}; dim 1 is constant -> z = 0.0 everywhere (not NULL)."""
    from ena_database_build_spark.operators.similarity import (
        standardize_dims,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [2.0, 5.0]), (3, [3.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_id, r.pos): r.z for r in standardize_dims(df).collect()
    }
    import math

    std = math.sqrt(2.0 / 3.0)
    assert got[(1, 0)] == round(-1.0 / std, 6)
    assert got[(2, 0)] == 0.0
    assert got[(3, 0)] == round(1.0 / std, 6)
    assert got[(1, 1)] == 0.0 and got[(3, 1)] == 0.0
