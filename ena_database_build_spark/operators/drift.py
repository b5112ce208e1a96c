"""Distribution-drift monitoring: per-group Population Stability
Index (PSI) between a reference and a current snapshot of a numeric
column — the standard production-ML gate for "has this feature's
distribution moved enough to retrain / alert".

The reference pipeline rebuilds everything per run and has no notion
of drift; a 100 TB continuously-ingested corpus needs exactly this
between-snapshot check (alongside ``diff.py``'s row-level anti-entropy
and ``profile.py``'s single-snapshot profiling).

Determinism discipline: bin edges come from the REFERENCE side's
min/max only (fixed-width bins), so the binning of both sides is one
shared float expression — identical IEEE arithmetic in any engine;
bin COUNTS are exact integers; the smoothed p/q ratios and the PSI sum
are then deterministic float expressions over exact integers (the
incremental-stats discipline).  Laplace smoothing (+0.5 per bin,
+bins/2 per total) keeps empty bins finite without branching.

Scale shape: two snapshot scans feed ONE union + one (key, side, bin)
keyed map-side-combinable count; the bin spine (keys x bins rows) and
the per-key edges/totals are broadcast-sized; no window over data
rows, no all-pairs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """PSI per key group: ``(keys..., n_ref, n_cur, psi)``.

    ``psi = sum_i (p_i - q_i) * ln(p_i / q_i)`` over ``bins``
    fixed-width bins spanning the reference min/max (values outside —
    i.e. current-side drift past the reference range — clamp into the
    edge bins, which is what makes range drift visible).  Groups that
    exist only in one snapshot are reported with the other side's
    count 0 and ``psi`` NULL when no reference edges exist (no
    reference group -> no bin geometry to compare against: an
    explicit "new group" signal, not a fake 0)."""
    keys = keys or []
    r = ref.where(F.col(value_col).isNotNull()).select(
        *keys, F.col(value_col).cast("double").alias("_v")
    )
    c = cur.where(F.col(value_col).isNotNull()).select(
        *keys, F.col(value_col).cast("double").alias("_v")
    )
    edges = r.groupBy(*keys).agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    both = r.withColumn("_side", F.lit("r")).unionByName(
        c.withColumn("_side", F.lit("c"))
    )
    joined = (
        both.join(F.broadcast(edges), keys, "left")
        if keys
        else both.crossJoin(F.broadcast(edges))
    )
    # shared binning expression: floor((v - mn) / (mx - mn) * bins),
    # clamped into [0, bins-1]; degenerate mn == mx puts everything in
    # bin 0.  Rows with no reference edges (new group) keep bin NULL.
    width_pos = F.col("_mx") > F.col("_mn")
    raw = F.floor(
        (F.col("_v") - F.col("_mn"))
        / (F.col("_mx") - F.col("_mn"))
        * bins
    )
    bin_idx = F.when(
        F.col("_mn").isNotNull(),
        F.when(
            width_pos,
            F.greatest(F.least(raw, F.lit(bins - 1)), F.lit(0)),
        ).otherwise(F.lit(0)),
    )
    counted = (
        joined.withColumn("_bin", bin_idx)
        .groupBy(*keys, "_bin", "_side")
        .agg(F.count("*").alias("_n"))
    )
    pivoted = counted.groupBy(*keys, "_bin").agg(
        F.sum(F.when(F.col("_side") == "r", F.col("_n"))).alias("_rn"),
        F.sum(F.when(F.col("_side") == "c", F.col("_n"))).alias("_cn"),
    )
    # full bin spine per key (a bin empty on BOTH sides still carries
    # its smoothed contribution): keys x bins rows, broadcast-sized
    spine = edges.select(
        *keys, F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("_bin")
    )
    filled = spine.join(pivoted, [*keys, "_bin"], "left").select(
        *keys,
        "_bin",
        F.coalesce("_rn", F.lit(0)).alias("_rn"),
        F.coalesce("_cn", F.lit(0)).alias("_cn"),
    )
    totals = filled.groupBy(*keys).agg(
        F.sum("_rn").alias("_rt"), F.sum("_cn").alias("_ct")
    )
    per_bin = filled.join(F.broadcast(totals), keys) if keys else (
        filled.crossJoin(F.broadcast(totals))
    )
    p = (F.col("_rn") + 0.5) / (F.col("_rt") + bins * 0.5)
    q = (F.col("_cn") + 0.5) / (F.col("_ct") + bins * 0.5)
    contrib = (p - q) * F.log(p / q)
    psi_rows = per_bin.groupBy(*keys).agg(
        F.min("_rt").alias("n_ref"),
        F.min("_ct").alias("n_cur"),
        F.round(F.sum(contrib), ndigits).alias("psi"),
    )
    # groups with no reference edges never enter the spine: surface
    # them from the current side with psi NULL
    if keys:
        new_groups = (
            c.join(edges.select(*keys), keys, "left_anti")
            .groupBy(*keys)
            .agg(
                F.lit(0).cast("long").alias("n_ref"),
                F.count("*").alias("n_cur"),
                F.lit(None).cast("double").alias("psi"),
            )
        )
        psi_rows = psi_rows.unionByName(new_groups)
    else:
        # keyless with an EMPTY reference snapshot: the keyless
        # groupBy still yields one all-NULL edges row, every current
        # row gets a NULL bin and never reaches the spine, so the
        # aggregate above would report n_ref=0, n_cur=0, psi=0.0 — a
        # fail-open "no drift" verdict that also miscounts current
        # rows.  Mirror the keyed new_groups branch: report the TRUE
        # current count with psi NULL.  Both patches are 1-row
        # broadcasts (the repo's bounded-crossJoin pattern).
        cur_total = c.agg(F.count("*").alias("_c_all"))
        has_ref = edges.select(F.col("_mn").alias("_has_ref"))
        psi_rows = (
            psi_rows.crossJoin(F.broadcast(cur_total))
            .crossJoin(F.broadcast(has_ref))
            .select(
                F.col("n_ref"),
                F.when(F.col("_has_ref").isNotNull(), F.col("n_cur"))
                .otherwise(F.col("_c_all"))
                .alias("n_cur"),
                F.when(
                    F.col("_has_ref").isNotNull(), F.col("psi")
                ).alias("psi"),
            )
        )
    return psi_rows
