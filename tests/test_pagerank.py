"""Fixed-iteration PageRank (operators/pagerank.py)."""

import pytest

from ena_database_build_spark.operators import pagerank as PR


def ranks_of(df):
    return {r.id: round(r.rank, 6) for r in df.collect()}


def model(edges, iters, d=0.85):
    """Reference implementation in plain Python."""
    nodes = {n for e in edges for n in e}
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {}
        for s, t in set(edges):
            contrib[t] = contrib.get(t, 0.0) + rank[s] / out[s]
        rank = {n: (1 - d) + d * contrib.get(n, 0.0) for n in nodes}
    return {n: round(r, 6) for n, r in rank.items()}


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]


@pytest.mark.parametrize("iters", [1, 3, 10])
def test_matches_reference_model(spark, iters):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = ranks_of(PR.pagerank(df, iters=iters, checkpoint_every=4))
    assert got == model(EDGES, iters)


def test_duplicate_edges_count_once_and_nulls_drop(spark):
    noisy = EDGES + [(1, 2), (1, 2), (None, 2), (3, None)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    got = ranks_of(PR.pagerank(df, iters=3))
    assert got == model(EDGES, 3)


def test_dangling_node_keeps_base_rank(spark):
    # node 9 has an in-edge but no out-edges; node 8 has only out-edges
    edges = [(8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = ranks_of(PR.pagerank(df, iters=2))
    # 8 receives nothing: rank = 0.15 every iteration
    # 9 receives all of 8's rank: 0.15 + 0.85 * rank(8)
    assert got[8] == 0.15
    assert got[9] == round(0.15 + 0.85 * 0.15, 6)


def test_triangle_count_hand_computed(spark):
    """K4 has 4 triangles; adding a pendant edge adds none; duplicate
    and reversed edges collapse to one orientation."""
    from ena_database_build_spark.operators.pagerank import (
        triangle_count,
    )

    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(3, 9), (9, 3), (0, 1)]  # pendant + reversed dup + dup
    df = spark.createDataFrame(edges, "left_id long, right_id long")
    row = triangle_count(df).head()
    assert row.n_nodes == 5
    assert row.n_edges == 7  # C(4,2) + the pendant
    assert row.n_triangles == 4
