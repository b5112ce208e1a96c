"""Distributed Lloyd's k-means over an embedding column — the training
step that produces IVF coarse centroids (``similarity.srp_buckets`` /
``plans/catalog.py:q_ivf_topk`` consume such cells at query time).

Scale shape (the one Spark MLlib itself uses):

* Model state is O(k * dim) — centroids live on the DRIVER and enter
  each assignment pass as literal arrays folded into a single
  whole-stage-codegen'd projection: per row, k squared-distances and an
  ``array_min`` over (dist, cid) structs.  NO join and NO shuffle for
  assignment, regardless of corpus size.
* The update step is the only shuffle per iteration: posexplode the
  assigned vectors to (cluster, dim, val), hash-aggregate the mean
  (map-side partial sums make the exchange k * dim rows), rebuild the
  k arrays, collect k rows.  Collecting the MODEL is not a driver-side
  data loop — it is k*dim doubles, the irreducible state of any
  iterative training algorithm.
* Determinism: seeds are the k lowest-id vectors; the argmin compares
  ROUNDED (6 dp) distances with a cluster-id tie-break, so float
  summation-order jitter across engines/partitionings cannot flip an
  assignment (same trick as the IVF probe ranking).  The DuckDB oracle
  replays the identical fixed-iteration procedure in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(v: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, v) — nearest centroid per row, min cluster id on
    rounded-distance ties.  Pure projection: no join, no shuffle."""
    v = F.col(vec_col).cast("array<double>")
    cands = F.array(
        *[
            F.struct(
                F.round(_sq_dist(v, c), 6).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.select(
        F.col(id_col),
        F.array_min(cands).getField("cid").alias("cluster"),
        v.alias("v"),
    )


def _mean_centroids(assigned: DataFrame, k: int) -> list[list[float]]:
    comp = (
        assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.avg("val").alias("m"))
    )
    rows = (
        comp.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"))
        .select("cluster", F.transform("_dm", lambda s: s["m"]).alias("c"))
        .collect()
    )
    got = {r["cluster"]: list(r["c"]) for r in rows}
    # a cluster can lose all members; keep its previous position empty ->
    # caller passes prior centroids to fill (handled in kmeans_train)
    return [got.get(i) for i in range(k)]


def kmeans_train(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Fixed-iteration Lloyd's: seeds = the k lowest-id vectors, then
    ``max_iter`` (assign -> mean) rounds.  Returns the final centroids
    and the assignment of every row under them."""
    seeds = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        # r8 ADVICE: a NULL/empty vector among the k lowest ids must
        # not crash seed construction (list(None) TypeError) — mirror
        # srp_cosine_pairs' isNotNull guard; seeds come from the k
        # lowest-id VALID vectors, and if none exist we fall through
        # to the empty-model branch below
        .where(F.col("v").isNotNull() & (F.size("v") > 0))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    if not centroids:
        # empty input (or all-invalid vectors): no seeds exist, so
        # there is no model — return
        # an empty assignment with the contract schema instead of
        # letting assign_clusters build array_min(array()) (a VOID-
        # typed expression that fails analysis with a cryptic error)
        empty = df.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("cluster"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).where(F.lit(False))
        return [], empty
    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, vec_col, id_col)
        new = _mean_centroids(assigned, k)
        centroids = [
            n if n is not None else old for n, old in zip(new, centroids)
        ]
    return centroids, assign_clusters(df, centroids, vec_col, id_col)
