"""SemDeDup-style semantic deduplication (SURVEY.md §2.11 extension
surface): cluster embeddings with distributed k-means, then compare
pairs ONLY within a cluster and drop every vector that has a
higher-priority (lower-id) semantic duplicate at cosine >= threshold.

This is the published SemDeDup recipe (Abbas et al., 2023,
arXiv:2303.09540): k-means bounds the candidate set so the pairwise
step is O(sum |cluster|^2), never O(n^2) over the corpus.  At 100 TB
the knob is ``k`` — scale it with corpus size (the paper uses
k ~ sqrt(n)) so the densest cluster stays a bounded per-task join; the
cluster-id equi-join shuffles each vector once, and a skewed (huge)
cluster can additionally be SRP-pre-bucketed with
``similarity.srp_buckets`` before pairing.

Winner rule matches ``dedup.exact_dedup``: the lowest id in a duplicate
pair survives; a vector is dropped iff SOME lower-id cluster-mate is
within the threshold.  Deterministic (rounded cosine, min-id), so the
whole operator is exactly SQL-expressible and oracle-checked in the
catalog (``semantic_dedup``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ena_database_build_spark.operators import kmeans as KM
from ena_database_build_spark.operators import similarity as SIM


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 2,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(left_id, right_id, cluster, cos_sim) — all within-cluster pairs
    (left_id < right_id) at rounded cosine >= threshold."""
    _, assigned = KM.kmeans_train(
        df, k=k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    left = assigned.select(
        F.col(id_col).alias("left_id"), F.col("v").alias("_lv"), "cluster"
    )
    right = assigned.select(
        F.col(id_col).alias("right_id"), F.col("v").alias("_rv"), "cluster"
    )
    return (
        left.join(right, "cluster")
        .where(F.col("left_id") < F.col("right_id"))
        .select(
            "left_id",
            "right_id",
            "cluster",
            F.round(SIM.cosine(F.col("_lv"), F.col("_rv")), 6).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 2,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Survivors ``(id, cluster)``: every vector minus those with a
    lower-id semantic duplicate in their cluster.  One cluster-keyed
    self-join + a left-anti join — two shuffles total, both on bounded
    keys."""
    _, assigned = KM.kmeans_train(
        df, k=k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    left = assigned.select(
        F.col(id_col).alias("_l_id"), F.col("v").alias("_lv"), "cluster"
    )
    right = assigned.select(
        F.col(id_col).alias("_r_id"), F.col("v").alias("_rv"), "cluster"
    )
    dropped = (
        left.join(right, "cluster")
        .where(F.col("_l_id") < F.col("_r_id"))
        .where(
            F.round(SIM.cosine(F.col("_lv"), F.col("_rv")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("_r_id").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(
        id_col, "cluster"
    )
