"""SemDeDup-style semantic dedup (operators/semdedup.py)."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import semdedup as SD


def make_emb(spark):
    # two well-separated directions; ids interleaved so the winner rule
    # (lowest id survives) is exercised across both clusters
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (3, [0.0, 0.98, 0.02, 0.0]),   # near-dup of 1
        (4, [2.0, 0.0, 0.0, 0.0]),     # scalar multiple of 0: cos 1.0
        (5, [0.0, 0.0, 0.0, 1.0]),     # isolated direction
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pairs_and_winners(spark):
    df = make_emb(spark)
    pairs = SD.semantic_dedup_pairs(df, k=2, max_iter=2, threshold=0.95)
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    # 0-2 and 0-4 and 2-4 share a cluster at cos >= 0.95; 1-3 likewise
    assert (0, 2) in got and (0, 4) in got
    assert (1, 3) in got
    survivors = {
        r.vec_id
        for r in SD.semantic_dedup(
            df, k=2, max_iter=2, threshold=0.95
        ).collect()
    }
    # lowest id of each duplicate group survives; isolated vector stays
    assert 0 in survivors and 1 in survivors and 5 in survivors
    assert 2 not in survivors and 4 not in survivors and 3 not in survivors


def test_threshold_is_respected(spark):
    df = make_emb(spark)
    # at threshold 1.0 only the exact scalar multiple (0,4) is a dup
    survivors = {
        r.vec_id
        for r in SD.semantic_dedup(
            df, k=2, max_iter=2, threshold=1.0
        ).collect()
    }
    assert survivors == {0, 1, 2, 3, 5}


def test_cross_cluster_pairs_never_compared(spark):
    # identical vectors in different clusters would be missed by
    # design: verify the pair relation carries the cluster id and that
    # every emitted pair is within one cluster
    df = make_emb(spark)
    pairs = SD.semantic_dedup_pairs(df, k=2, max_iter=2, threshold=0.0)
    assigned = {
        r.vec_id: r.cluster
        for r in SD.semantic_dedup(
            df, k=2, max_iter=2, threshold=2.0
        ).collect()  # threshold > 1 drops nothing; gives assignments
    }
    for r in pairs.collect():
        assert assigned[r.left_id] == assigned[r.right_id] == r.cluster


def test_dedup_is_deterministic_across_partitioning(spark):
    df = make_emb(spark)
    a = sorted(
        (r.vec_id, r.cluster)
        for r in SD.semantic_dedup(df.repartition(1), k=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster)
        for r in SD.semantic_dedup(df.repartition(5), k=2).collect()
    )
    assert a == b


def test_within_cluster_pairs_across_block_boundary(spark):
    """The blocked GEMM must find a duplicate pair whose members land
    in different 4096-row left blocks of one cluster (the block-index
    arithmetic ids[lo:][ii] is what this pins)."""
    import random

    from ena_database_build_spark.operators.semdedup import (
        _within_cluster_pairs,
    )

    rng = random.Random(11)
    n = 5000
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], 0) for i in range(n)
    ]
    # plant: id 10 (block 0) duplicated at id 4500 (block 1)
    rows[4500] = (4500, [2.0 * x for x in rows[10][1]], 0)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, cluster int")
    got = {
        (r["left_id"], r["right_id"])
        for r in _within_cluster_pairs(df, 0.9999, "vec_id").collect()
    }
    assert (10, 4500) in got
    # random 16-dim vectors essentially never reach cos >= 0.9999
    assert all(l < r for l, r in got)


def test_semantic_dedup_null_empty_zero_vectors_survive(spark):
    """Rows whose embedding is NULL/empty/all-zero cannot pair, so
    they must always SURVIVE dedup (the pre-GEMM column form's NULL
    cosine failed the gate; the kernel must not crash on them)."""
    rows = [
        (0, [1.0, 2.0, 1.0, 0.5]),
        (1, [1.0, 2.0, 1.0, 0.5]),   # exact copy of 0 -> same cluster, dropped
        (2, None),
        (3, []),
        (4, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in SD.semantic_dedup(df, k=2, max_iter=1, threshold=0.95).collect()}
    assert 1 not in got
    assert {0, 2, 3, 4} <= got


def test_within_cluster_pairs_ragged_lengths_no_crash(spark):
    """A wrong-length vector must not crash the kernel (np.stack on a
    ragged batch raises): cross-length pairs are impossible (the
    column form's zip_with padded NULL and the score failed the gate),
    while equal-length vectors still pair normally."""
    from ena_database_build_spark.operators.semdedup import (
        _within_cluster_pairs,
    )

    rows = [
        (0, [1.0, 2.0, 1.0, 0.5], 0),
        (1, [1.0, 2.0, 1.0, 0.5], 0),   # same length -> pairs with 0
        (2, [1.0, 2.0, 1.0], 0),        # 3-dim: cannot pair with 4-dim
        (3, [1.0, 2.0, 1.0], 0),        # but pairs with its own length
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, cluster int")
    got = {
        (r["left_id"], r["right_id"])
        for r in _within_cluster_pairs(df, 0.999, "vec_id").collect()
    }
    assert got == {(0, 1), (2, 3)}


def test_salted_pairs_parity_under_hot_cluster(spark):
    """Adversarial skew (r6 verdict #3): force k=1 so EVERY vector
    lands in one cluster — the worst straggler case — and check the
    salted cogrouped GEMM returns exactly the unsalted pairs,
    including across 4096-row GEMM blocks being irrelevant here but
    ragged lengths and ties being present."""
    import random

    rng = random.Random(17)
    rows = []
    for i in range(120):
        v = [rng.uniform(-1, 1) for _ in range(6)]
        rows.append((i, v))
        if i % 4 == 0:  # planted duplicates
            rows.append((10000 + i, [1.5 * x for x in v]))
    rows.append((20001, [0.1, 0.2]))  # ragged length pair
    rows.append((20002, [0.2, 0.4]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairs(salt):
        return {
            (r["left_id"], r["right_id"], r["cos_sim"])
            for r in SD.semantic_dedup_pairs(
                df, k=1, max_iter=1, threshold=0.95, salt=salt
            ).collect()
        }

    want = pairs(1)
    assert len(want) >= 30  # planted dupes + the ragged pair
    assert (20001, 20002, 1.0) in want
    for salt in (2, 7):
        assert pairs(salt) == want, salt


def test_salted_dedup_survivors_match_unsalted(spark):
    import random

    rng = random.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(80)]
    rows += [(5000 + i, [2.0 * x for x in rows[i][1]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def survivors(salt):
        return {
            r["vec_id"]
            for r in SD.semantic_dedup(
                df, k=2, max_iter=2, threshold=0.98, salt=salt
            ).collect()
        }

    want = survivors(1)
    assert survivors(3) == want
    assert len(want) < len(rows)  # dupes actually dropped


def test_salt_auto_parity_and_strict_validation(spark):
    """salt='auto' (sized from the cluster histogram) returns exactly
    the unsalted pairs; bool/float salts that compare equal to 1 must
    raise instead of silently taking the unsalted path (r7 ADVICE)."""
    import pytest
    import random

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    rows += [(7000 + i, [3.0 * x for x in rows[i][1]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairs(**kw):
        return {
            (r["left_id"], r["right_id"], r["cos_sim"])
            for r in SD.semantic_dedup_pairs(
                df, k=1, max_iter=1, threshold=0.95, **kw
            ).collect()
        }

    want = pairs(salt=1)
    assert len(want) >= 10
    # tiny target forces auto to pick salt > 1 on the single hot cluster
    assert pairs(salt="auto", target_rows_per_task=8) == want

    for bad in (True, 1.0, 0, -2, "always"):
        with pytest.raises(ValueError, match="salt"):
            SD.semantic_dedup_pairs(df, k=1, threshold=0.95, salt=bad)


def test_kmeans_and_semdedup_empty_input(spark):
    """Empty input: kmeans_train returns an empty model + empty
    assignment with the contract schema instead of failing analysis
    on array_min(array()) (r8 empty-corpus sweep finding);
    semantic_dedup then yields zero survivors."""
    from ena_database_build_spark.operators import kmeans as KM

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    centroids, assigned = KM.kmeans_train(df, k=4, max_iter=2)
    assert centroids == []
    assert assigned.columns == ["vec_id", "cluster", "v"]
    assert assigned.count() == 0
    assert SD.semantic_dedup(df, k=4).count() == 0


def test_target_rows_per_task_strict_validation(spark):
    """r8 ADVICE: the auto-salt divisor gets the same strict int check
    as salt — 0 used to ZeroDivisionError inside the ceil-div and a
    negative value silently yielded salt=1."""
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for bad in (0, -1, True, 1.0, "64k"):
        with pytest.raises(ValueError, match="target_rows_per_task"):
            SD.semantic_dedup_pairs(
                df, k=1, threshold=0.9, salt="auto",
                target_rows_per_task=bad,
            )


def test_kmeans_null_vector_among_lowest_ids(spark):
    """r8 ADVICE: a NULL (or empty) vector inside the k lowest-id rows
    must not crash seed construction — seeds come from the k lowest-id
    VALID vectors; an all-invalid input falls through to the
    empty-model branch."""
    from ena_database_build_spark.operators import kmeans as KM

    df = spark.createDataFrame(
        [(0, None), (1, []), (2, [1.0, 0.0]), (3, [0.0, 1.0]),
         (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    centroids, assigned = KM.kmeans_train(df, k=2, max_iter=1)
    assert len(centroids) == 2 and all(len(c) == 2 for c in centroids)
    assert assigned.count() == 5  # assignment still covers every row

    all_bad = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    centroids, assigned = KM.kmeans_train(all_bad, k=2, max_iter=1)
    assert centroids == []
    assert assigned.count() == 0
