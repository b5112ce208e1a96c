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


def _within_cluster_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str,
    salt: int | str = 1,
    target_rows_per_task: int = 65536,
) -> DataFrame:
    """All within-cluster pairs at ROUNDED (6-decimal) cosine >=
    ``threshold``, canonical ``left_id < right_id`` — computed as one
    blocked GEMM per cluster via ``applyInPandas``.

    This replaces the cluster-keyed self-join + per-pair higher-order-
    function cosine: HOF lambdas are interpreted per element, ~13us per
    64-dim pair, while the per-cluster matrix multiply is vectorized C
    (measured ~7x on 250k candidate pairs at sf0.1).  Each cluster is
    one task — the SemDeDup contract that ``k`` bounds cluster size
    already requires a cluster to be joinable per-task; the left-block
    loop additionally caps the score-matrix memory at
    ``block x |cluster|`` so a dense cluster cannot allocate |c|^2
    doubles at once.  Rounding uses half-up (matching Spark's
    ``F.round`` and the DuckDB oracle), not numpy's half-even.

    ``salt > 1`` is the straggler escape hatch for a HOT cluster (r6
    verdict #3): the row side splits into ``salt`` deterministic
    sub-groups (``crc32(id) % salt``) while the full cluster ships
    ``salt`` copies as the column side of a cogrouped GEMM — wall time
    of the densest task shrinks ~salt-x for salt-x extra shuffle of
    the replicated side.  A pair lands in exactly ONE (cluster, salt)
    group (the lower id's salt), so the output is identical to the
    unsalted form (parity-pinned in tests); the triangle-halving FLOP
    trick is traded away on the salted path."""
    # validate BEFORE the salt==1 fast path: bool is an int subclass
    # and 1.0 == 1, so salt=True / salt=1.0 would otherwise silently
    # take the unsalted path instead of raising (r7 ADVICE)
    if salt != "auto" and not (
        isinstance(salt, int) and not isinstance(salt, bool) and salt >= 1
    ):
        raise ValueError(f"salt must be a positive int or 'auto', not {salt!r}")
    # same strict check for the auto-salt divisor (r8 ADVICE): 0 would
    # ZeroDivisionError inside the ceil-div and a negative value would
    # silently yield salt=1
    if not (
        isinstance(target_rows_per_task, int)
        and not isinstance(target_rows_per_task, bool)
        and target_rows_per_task >= 1
    ):
        raise ValueError(
            "target_rows_per_task must be a positive int, not "
            f"{target_rows_per_task!r}"
        )
    if threshold < 0:
        # the kernel's half-up rounding (floor(S*1e6 + 0.5)) rounds
        # NEGATIVE scores half-toward-+inf, diverging from Spark
        # F.round / DuckDB round (half-away-from-zero) exactly on the
        # x.xxxxx5 boundaries a negative gate would compare against
        # (round-6 ADVICE) — forbid rather than silently mis-gate
        raise ValueError(
            "threshold must be >= 0: the GEMM kernel's half-up rounding "
            "is only F.round-equivalent for non-negative scores"
        )
    # NULL/empty vectors cannot pair (the column form's NULL cosine
    # failed the gate implicitly; np.stack would crash on them) — they
    # are excluded here, so in semantic_dedup they always survive
    assigned = assigned.where(
        F.col(id_col).isNotNull()
        & F.col("v").isNotNull()
        & (F.size("v") > 0)
    )
    id_type = assigned.schema[id_col].dataType.simpleString()
    schema = (
        f"left_id {id_type}, right_id {id_type}, "
        "cluster int, cos_sim double"
    )

    def score(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"left_id": [], "right_id": [], "cluster": [], "cos_sim": []}
        )
        if len(pdf) < 2:
            return empty
        outs = []
        # length-homogeneous subgroups: vectors of different lengths
        # cannot pair (the column form's zip_with padded with NULL and
        # the NULL score failed the gate; np.stack would crash on a
        # ragged batch), while equal-length vectors pair normally
        for _, sub in pdf.groupby(pdf["v"].str.len(), sort=False):
            if len(sub) < 2:
                continue
            # sort by id so ascending index implies non-descending id:
            # each block then multiplies only against columns from its
            # own start — the upper triangle — halving the GEMM FLOPs
            sub = sub.sort_values(id_col, kind="stable")
            with np.errstate(invalid="ignore", divide="ignore"):
                V = np.stack(sub["v"].to_numpy())
                N = V / np.linalg.norm(V, axis=1, keepdims=True)
            ids = sub[id_col].to_numpy()
            for lo in range(0, len(N), 4096):
                hi = min(lo + 4096, len(N))
                S = N[lo:hi] @ N[lo:].T
                # half-up rounding to 6 decimals (F.round semantics in
                # the positive gate regime; a NEGATIVE threshold would
                # round boundary scores half-toward-+inf instead of
                # half-away-from-zero — no catalog path gates there)
                S = np.floor(S * 1e6 + 0.5) / 1e6
                ii, jj = np.nonzero(
                    (S >= threshold)
                    & (ids[lo:hi, None] < ids[None, lo:])
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "left_id": ids[lo:][ii],
                            "right_id": ids[lo:][jj],
                            "cluster": sub["cluster"].iloc[0],
                            "cos_sim": S[ii, jj],
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    if salt == "auto":
        # task key IS the cluster, so the cluster histogram (k rows,
        # bounded by construction) sizes the densest task directly.
        # The probe is one extra aggregation job over the (lazy)
        # assignment relation — one additional pass of the broadcast-
        # centroid assignment map, run eagerly at build time.
        hist = (
            assigned.groupBy("cluster").count().agg(F.max("count")).collect()
        )
        biggest = hist[0][0] or 0
        salt = max(1, -(-int(biggest) // int(target_rows_per_task)))
    if salt == 1:
        return assigned.groupBy("cluster").applyInPandas(score, schema)

    left = assigned.withColumn(
        "_salt", F.pmod(F.crc32(F.col(id_col).cast("string")), salt)
    )
    right = assigned.select(
        F.col(id_col).alias("_rid"),
        F.col("v").alias("_rv"),
        F.col("cluster").alias("_rcluster"),
        F.explode(
            F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")
        ).alias("_salt"),
    )

    def score_salted(l, r):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"left_id": [], "right_id": [], "cluster": [], "cos_sim": []}
        )
        if l.empty or r.empty:
            return empty
        outs = []
        # same length-homogeneous pairing rule as the unsalted kernel
        r_by_len = {n: sub for n, sub in r.groupby(r["_rv"].str.len(), sort=False)}
        for n, lsub in l.groupby(l["v"].str.len(), sort=False):
            rsub = r_by_len.get(n)
            if rsub is None:
                continue
            with np.errstate(invalid="ignore", divide="ignore"):
                L = np.stack(lsub["v"].to_numpy())
                Ln = L / np.linalg.norm(L, axis=1, keepdims=True)
                R = np.stack(rsub["_rv"].to_numpy())
                Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
            li = lsub[id_col].to_numpy()
            ri = rsub["_rid"].to_numpy()
            for lo in range(0, len(Ln), 4096):
                hi = min(lo + 4096, len(Ln))
                S = Ln[lo:hi] @ Rn.T
                S = np.floor(S * 1e6 + 0.5) / 1e6  # half-up, as unsalted
                ii, jj = np.nonzero(
                    (S >= threshold) & (li[lo:hi, None] < ri[None, :])
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "left_id": li[lo:hi][ii],
                            "right_id": ri[jj],
                            "cluster": lsub["cluster"].iloc[0],
                            "cos_sim": S[ii, jj],
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return (
        left.groupBy("cluster", "_salt")
        .cogroup(right.groupBy("_rcluster", "_salt"))
        .applyInPandas(score_salted, schema)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 2,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: int | str = 1,
    target_rows_per_task: int = 65536,
) -> DataFrame:
    """(left_id, right_id, cluster, cos_sim) — all within-cluster pairs
    (left_id < right_id) at rounded cosine >= threshold.  ``salt``
    splits a hot cluster across tasks; ``salt='auto'`` sizes it from
    the cluster histogram (see _within_cluster_pairs)."""
    _, assigned = KM.kmeans_train(
        df, k=k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    return _within_cluster_pairs(
        assigned, threshold, id_col, salt=salt,
        target_rows_per_task=target_rows_per_task,
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 4,
    max_iter: int = 2,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: int | str = 1,
    target_rows_per_task: int = 65536,
) -> DataFrame:
    """Survivors ``(id, cluster)``: every vector minus those with a
    lower-id semantic duplicate in their cluster.  One cluster-keyed
    shuffle into the per-cluster GEMM + a left-anti join — two
    shuffles total, both on bounded keys.  ``salt`` splits a hot
    cluster across tasks; ``salt='auto'`` sizes it from the cluster
    histogram (see _within_cluster_pairs)."""
    _, assigned = KM.kmeans_train(
        df, k=k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
    )
    dropped = (
        _within_cluster_pairs(
            assigned, threshold, id_col, salt=salt,
            target_rows_per_task=target_rows_per_task,
        )
        .select(F.col("right_id").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(
        id_col, "cluster"
    )
