"""Fixed-iteration PageRank (SURVEY.md §2.11 extension surface —
link-graph quality signals for corpus curation: rank web documents by
the link structure before sampling, the CommonCrawl-style prior).

Semantics match GraphX's ``staticPageRank``: every node starts at
rank 1.0 and each iteration computes

    rank'(v) = (1 - d) + d * sum_{(u,v) in E} rank(u) / outdeg(u)

with damping ``d`` and NO dangling-mass redistribution — deterministic
given the edge set, which is what makes the operator exactly
SQL-replayable (the catalog oracle unrolls the same fixed number of
iterations as CTEs).

Scale design (the same discipline as operators/cc.py):

* The joined edge relation ``(src, dst, outdeg)`` is built once and
  reused every iteration — on a cluster you'd persist it partitioned by
  ``src`` so each iteration's contribution join is a co-partitioned
  zipper, not a re-shuffle of the edges.
* Per iteration: one join keyed on ``src`` (ranks are hash-partitioned
  by id), one ``groupBy(dst)`` partial-agg shuffle, one left join back
  to the node list.  All keys are node ids — never a global structure.
* ``checkpoint_every`` truncates the growing lineage with
  ``localCheckpoint`` exactly as the connected-components fixpoint
  does, so a 50-iteration run does not replan a 50-deep DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(id, rank) after ``iters`` synchronous iterations over the
    directed edge list.  Duplicate edges count once (the relation is
    de-duplicated), NULL endpoints are excluded."""
    e = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("_src").alias("id"))
        .unionByName(e.select(F.col("_dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_outdeg"))
    linked = e.join(outdeg, "_src")
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for it in range(1, iters + 1):
        contribs = (
            linked.join(ranks, linked["_src"] == ranks["id"])
            .select(
                F.col("_dst").alias("id"),
                (F.col("rank") / F.col("_outdeg")).alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("rank"),
        )
        if it % checkpoint_every == 0 and it < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list — the
    canonical distributed graph-analytics kernel (clustering
    coefficient, community density; on a co-occurrence graph, how
    clique-ish the collaboration structure is).

    ``edges`` carries (left_id, right_id); the count uses the
    canonical-orientation algorithm: normalize every edge to
    ``a < b``, then triangles are exactly the two-path joins
    ``(a,b) + (b,c) -> (a,c)`` closed by an edge — each triangle
    counted ONCE because its three vertices admit exactly one
    ascending orientation.  Two keyed equi-joins, no all-pairs; the
    two-path fan-out is bounded by the max out-degree in the
    ascending orientation (provably <= sqrt(2m) on the high-degree
    side — the standard reason this shape scales).

    Returns one row: ``(n_nodes, n_edges, n_triangles)``."""
    e = (
        edges.select(
            F.least("left_id", "right_id").alias("a"),
            F.greatest("left_id", "right_id").alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    nodes = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .distinct()
    )
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    paths = ab.join(bc, "b")
    tri = paths.join(
        ac,
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
        "left_semi",
    )
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(nodes.agg(F.count("*").alias("n_nodes"))))
        .crossJoin(F.broadcast(e.agg(F.count("*").alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )
