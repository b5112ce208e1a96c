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

from pyspark.sql import DataFrame, Window
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
    # NULL group keys are excluded from edges EXPLICITLY: a NULL key
    # could never equi-match its own edges row anyway (those rows
    # surface through the NULL-bin path below), and writing the
    # filter here keeps the edges subtree identical between its two
    # consumers — the binning broadcast join (which pushes an
    # IsNotNull(key) filter into its branch) and the bin spine — so
    # the aggregation is planned once and reused, not re-scanned.
    r_keyed = r
    for kcol in keys:
        r_keyed = r_keyed.where(F.col(kcol).isNotNull())
    edges = r_keyed.groupBy(*keys).agg(
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
    # its smoothed contribution): keys x bins rows, broadcast-sized.
    # The when() guard is ALWAYS true (edges rows come from non-null
    # values) but referencing _mn/_mx keeps the min/max aggregate in
    # this branch's plan — without it Catalyst prunes the aggregate
    # functions here, the edges subtree stops matching the binning
    # join's, and the reference snapshot is scanned a third time (the
    # bm25/quantile_normalize ReusedExchange alignment pattern).
    spine = edges.select(
        *keys,
        F.explode(
            F.when(
                F.col("_mn").isNotNull() & F.col("_mx").isNotNull(),
                F.sequence(F.lit(0), F.lit(bins - 1)),
            )
        ).alias("_bin"),
    )
    # ONE full-outer join keeps everything in a single lineage:
    # spine rows fill zeros for bins empty on both sides, and
    # NULL-bin pivoted rows — current-side rows of groups with no
    # reference edges (reference rows always bin: each reference
    # group defines its own edges) — ride along as the "new group"
    # signal instead of a separate anti-join branch that would scan
    # the current snapshot a second time (and, before round 5, DID:
    # the union's second branch re-executed the whole counted
    # subtree).  `filled` is keys x bins (+1) rows — bounded — so the
    # group totals are a window over it, not another join branch.
    filled = spine.join(pivoted, [*keys, "_bin"], "full_outer").select(
        *keys,
        "_bin",
        F.coalesce("_rn", F.lit(0)).alias("_rn"),
        F.coalesce("_cn", F.lit(0)).alias("_cn"),
    )
    wk = Window.partitionBy(*keys)  # keys x bins rows: bounded frame
    binned = F.col("_bin").isNotNull()
    rt = F.sum(F.when(binned, F.col("_rn"))).over(wk)
    ct = F.sum(F.when(binned, F.col("_cn"))).over(wk)
    p = (F.col("_rn") + 0.5) / (rt + bins * 0.5)
    q = (F.col("_cn") + 0.5) / (ct + bins * 0.5)
    per_bin = filled.withColumn(
        "_contrib", F.when(binned, (p - q) * F.log(p / q))
    ).withColumn("_rt", rt)
    # n_ref counts BINNED reference rows only (a NULL group key on the
    # reference side lands in the NULL bin — never equi-matching its
    # own edges row — and is excluded, as the anti-join form did);
    # n_cur additionally sums the NULL-bin rows so a new group reports
    # its true current count.  psi is NULL exactly when the group has
    # no binned reference rows (new group, or a keyless call against
    # an empty reference snapshot) — no fail-open 0.0.
    return per_bin.groupBy(*keys).agg(
        F.coalesce(
            F.sum(F.when(binned, F.col("_rn"))), F.lit(0)
        ).cast("long").alias("n_ref"),
        F.sum("_cn").cast("long").alias("n_cur"),
        F.when(
            F.max("_rt") > 0, F.round(F.sum("_contrib"), ndigits)
        ).alias("psi"),
    )
