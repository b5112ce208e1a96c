"""Exact interpolated quantiles, relationally — the at-scale form.

Spark's built-in exact ``percentile`` aggregate buffers EVERY group
value in the aggregation state (an in-memory array per group): exact,
but it cannot survive a 100 TB group.  ``percentile_approx`` survives
anything but is approximate.  This operator is both exact and
bounded-state:

1. one hash aggregation to per-(group, value) counts — map-side
   combinable, shuffle volume = distinct values, not rows (duplicated
   distributions — prices, lengths, scores — compress by their
   duplication factor);
2. a DISTRIBUTED PREFIX SUM for the cumulative count: values range-
   bucket by ``value / bucket_width``, each (group, bucket) sorts in
   parallel for its local running sum, bucket totals (a few rows per
   group) cumsum on the tiny side and broadcast back as offsets —
   no single task ever sorts a whole group (with ``bucket_width=None``
   it degrades to one ordered window per group, fine for small groups);
3. the quantile list explodes map-side as a literal array (partition-
   preserving — no join, no extra exchange) and, per target rank
   ``r = 1 + (n-1) * q`` (``percentile_cont`` semantics), the bracketing
   values ``v_floor(r)`` / ``v_ceil(r)`` aggregate out and linearly
   interpolate — on the window's own partitioning, so everything after
   the cumulative sum is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_counts(
    counts: DataFrame, value_col: str, by: list[str], bucket_width: float | None
) -> DataFrame:
    """per (by, value): running count <= value (``_cum``), the same
    minus own count (``_cum_prev``), and the group total (``_n``).

    ``_n`` comes from a SECOND window over the same partitioning
    (unbounded frame), never from a separate aggregation branch: a
    ``counts.groupBy(by).sum()`` subtree re-executes the whole
    upstream (scan + partial agg) because its exchange keys on
    ``by`` while the count exchange keys on ``(by, value)`` — the
    round-6 quantiles_exact plan read the input parquet twice for
    exactly this reason."""
    if bucket_width is None:
        w = Window.partitionBy(*by).orderBy(value_col)
        w_all = Window.partitionBy(*by)  # same exchange, no extra sort
        return counts.select(
            *by,
            F.col(value_col).alias("_v"),
            F.sum("_c").over(w).alias("_cum"),
            (F.sum("_c").over(w) - F.col("_c")).alias("_cum_prev"),
            F.sum("_c").over(w_all).alias("_n"),
        )
    bkt = F.floor(F.col(value_col) / F.lit(float(bucket_width)))
    local = counts.withColumn("_bkt", bkt)
    w_local = Window.partitionBy(*by, "_bkt").orderBy(value_col)
    cum_local = local.select(
        *by,
        "_bkt",
        F.col(value_col).alias("_v"),
        F.col("_c"),
        F.sum("_c").over(w_local).alias("_lcum"),
    )
    # bucket totals from the SAME windowed frame (counts are positive,
    # so the bucket's max running sum IS its total), NOT a fresh
    # aggregation over `local` — the branches must share one physical
    # subtree so the count relation materializes once.  One row per
    # (group, bucket) — tiny; the exclusive running sum is each
    # bucket's offset into the group, and the group sum is ``_n`` —
    # both window over the tiny relation.
    w_bkt = Window.partitionBy(*by).orderBy("_bkt")
    w_all = Window.partitionBy(*by)
    offsets = (
        cum_local.groupBy(*by, "_bkt")
        .agg(F.max("_lcum").alias("_bc"))
        .select(
            *by,
            "_bkt",
            (F.sum("_bc").over(w_bkt) - F.col("_bc")).alias("_off"),
            F.sum("_bc").over(w_all).alias("_n"),
        )
    )
    # LEFT join (offsets covers every (group, bucket) of cum_local by
    # construction, so it is equivalent to inner): an inner join lets
    # Catalyst infer isnotnull(_bkt) = isnotnull(FLOOR(value/width))
    # and push it below the caller's shared exchange — on ONE consumer
    # branch only, desyncing the subtrees so ReusedExchange stops
    # firing and the upstream re-executes (observed in quantile_gate).
    return cum_local.join(
        F.broadcast(offsets), [*by, "_bkt"], "left"
    ).select(
        *by,
        "_v",
        (F.col("_lcum") + F.col("_off")).alias("_cum"),
        (F.col("_lcum") + F.col("_off") - F.col("_c")).alias("_cum_prev"),
        "_n",
    )


def quantile_gate(
    df: DataFrame,
    value_col: str,
    q: float,
    id_col: str,
    bucket_width: float,
) -> DataFrame:
    """Keep rows with ``value_col >= `` the exact interpolated
    ``q``-quantile — evaluating ``df`` ONCE.

    Filtering by a percentile threshold naively consumes the scored
    relation twice (threshold aggregation + the filter itself), and a
    lazy engine re-executes the expensive upstream (e.g. text feature
    scoring) for each consumer.  Here both consumers read the SAME
    physical exchange, so the upstream map work runs exactly once:

    1. rows (already projected narrow by the caller) shuffle once by
       a hash of ``id_col`` — balanced by construction, so no value
       distribution can skew the only full-row exchange (the earlier
       value-bucket partitioning sent every row of a heavily-tied
       score — a mass of identically-scored empty docs, say — to ONE
       task for a row-level rank window);
    2. the threshold branch aggregates that exchange to one count per
       DISTINCT value (tie mass collapses here), and the exact
       interpolated quantile comes from the same bucketed cumulative
       machinery as :func:`exact_quantiles` — windows only ever see
       distinct-value count rows, never data rows;
    3. the rows serving ranks ``floor(r)``/``ceil(r)`` (``r = 1 +
       (n-1) q``, percentile_cont semantics) interpolate into a 1-row
       threshold, broadcast back against the SAME exchange.

    Both consumers (threshold branch, gate filter) read one
    materialized exchange via ReusedExchange (pinned by
    tests/test_plan_shapes.py) — the scale property that lets a
    quality gate run over 100 TB of scored text with one scoring
    pass.  The repartition keys on ``id_col``, so the id column
    survives Catalyst pruning identically below the exchange in both
    branches (callers passing columns beyond ``(id, value)`` should
    project narrow first, as the catalog queries do).  NULL values
    are excluded from the threshold and output (percentile_cont
    ignores NULLs; a NULL score cannot pass a ``>=`` gate anyway).

    Returns ``df``'s rows (original columns) that pass the gate.
    """
    v = F.col(value_col)
    base = df.where(v.isNotNull())
    part = base.repartition(F.col(id_col))
    counts = part.groupBy(value_col).agg(F.count("*").alias("_c"))
    cum = _cumulative_counts(counts, value_col, [], bucket_width)
    r = F.lit(1.0) + (F.col("_n") - 1) * F.lit(float(q))
    lo_k = F.floor(r)
    hi_k = F.ceil(r)
    serves_lo = (F.col("_cum_prev") < lo_k) & (lo_k <= F.col("_cum"))
    serves_hi = (F.col("_cum_prev") < hi_k) & (hi_k <= F.col("_cum"))
    thr = (
        cum.where(serves_lo | serves_hi)
        .groupBy()
        .agg(
            F.max(F.when(serves_lo, F.col("_v"))).alias("_vlo"),
            F.max(F.when(serves_hi, F.col("_v"))).alias("_vhi"),
            F.max(r - F.floor(r)).alias("_frac"),
        )
        .select(
            (
                F.col("_vlo")
                + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
            ).alias("_thr")
        )
    )
    return (
        part.crossJoin(F.broadcast(thr))
        .where(v >= F.col("_thr"))
        .select(*df.columns)
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str],
    qs: list[float],
    bucket_width: float | None = None,
) -> DataFrame:
    """``by... , q, value`` — the exact interpolated ``q``-quantile of
    ``value_col`` per group, for each q in ``qs``.  Pass
    ``bucket_width`` (in value units) to parallelize the per-group
    cumulative sort across range buckets.

    NULL values are ignored (percentile_cont semantics).  A group
    whose values are ALL NULL is absent from the output (SQL would
    return a NULL-valued row for it); left-join the result if callers
    must see every group."""
    # percentile_cont semantics ignore NULLs; counting them would both
    # inflate _n and shift every rank (nulls sort first in the window)
    df = df.where(F.col(value_col).isNotNull())
    counts = df.groupBy(*by, value_col).agg(F.count("*").alias("_c"))
    cum = _cumulative_counts(counts, value_col, by, bucket_width)
    # the quantile list is a LITERAL: explode it map-side rather than
    # broadcast-joining a 1-column DataFrame — a BroadcastNestedLoopJoin
    # reports unknown output partitioning, which forced a fresh
    # exchange before the bracket aggregation; Generate preserves the
    # window's hash(by) partitioning, so the groupBys below it need no
    # further shuffle
    qlist = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    # target rank r in [1, n]; the value at integer rank k is the first
    # value whose cumulative count reaches k: _cum_prev < k <= _cum
    r = F.lit(1.0) + (F.col("_n") - 1) * F.col("q")
    lo_k = F.floor(r)
    hi_k = F.ceil(r)
    serves_lo = (F.col("_cum_prev") < lo_k) & (lo_k <= F.col("_cum"))
    serves_hi = (F.col("_cum_prev") < hi_k) & (hi_k <= F.col("_cum"))
    hit = cum.select(cum["*"], qlist).where(serves_lo | serves_hi)
    agg = hit.groupBy(*by, "q").agg(
        F.max(F.when(serves_lo, F.col("_v"))).alias("vlo"),
        F.max(F.when(serves_hi, F.col("_v"))).alias("vhi"),
        F.max("_n").alias("n"),
    )
    rr = F.lit(1.0) + (F.col("n") - 1) * F.col("q")
    frac = rr - F.floor(rr)
    return agg.select(
        *by,
        "q",
        (F.col("vlo") + frac * (F.col("vhi") - F.col("vlo"))).alias("value"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    bins: int = 256,
    out_col: str = "qnorm",
    ndigits: int = 6,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact percent-rank normalization of a score column to [0, 1]:
    ``qnorm = |{rows with value < v}| / (N - 1)`` — SQL
    ``(rank() OVER (ORDER BY value) - 1) / (N - 1)``, so TIED values
    share one qnorm — the calibration step that makes scores from
    different models/heuristics comparable before mixing them into
    one quality gate (rank-based, so any monotone transform of the
    input yields identical output, and equal evidence gets equal
    calibrated score).

    Scale shape — no window ever sees a data row:

    1. rows shuffle ONCE by a hash of ``id_col`` (balanced by
       construction; this exchange is the materialization point every
       other consumer reuses, so the upstream scoring runs once);
    2. the rank map aggregates that exchange to one count per
       DISTINCT value (map-side combinable — tie mass collapses to a
       single row per task before moving), then values range-bucket
       into ``bins`` bins, each bin prefix-sums its count rows
       locally, and the ``bins`` bin totals prefix-sum on the tiny
       side — the exact_quantiles cumulative machinery (a formerly
       row-level per-bin rank window pinned every tied row of a
       degenerate score onto one un-splittable task);
    3. the (value -> qnorm) map joins back hint-free on the value, so
       AQE broadcasts it when the distinct-value set is small and
       skew-splits the shuffle join when it is not.

    NULL values/ids are excluded (no position in the order); a
    single-row input normalizes to 0.0.  Adds ``out_col`` to the
    surviving rows.

    Pass ``bounds=(lo, hi)`` when the score's domain is known (a
    [0, 1] classifier, a bounded heuristic): binning then needs no
    min/max pass over the count rows (with no bounds the edges
    aggregate reads the SAME shared exchange — either way the
    upstream evaluates once).  Any monotone non-decreasing binning
    yields the exact same ranks — values outside the declared bounds
    just clamp into the edge bins and still order correctly within
    them — so the output is identical either way."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    )
    part = base.repartition(F.col(id_col))
    counts = part.groupBy(value_col).agg(F.count("*").alias("_c"))
    v = F.col(value_col).cast("double")
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
        if not hi > lo:
            raise ValueError("bounds must satisfy hi > lo")
        binned = counts.withColumn(
            "_bin",
            F.greatest(
                F.least(
                    F.floor((v - F.lit(lo)) / F.lit(hi - lo) * bins),
                    F.lit(bins - 1),
                ),
                F.lit(0),
            ).cast("long"),
        )
    else:
        edges = counts.agg(
            F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
        )
        binned = counts.crossJoin(F.broadcast(edges)).withColumn(
            "_bin",
            F.when(
                F.col("_mx") > F.col("_mn"),
                F.least(
                    F.floor(
                        (v - F.col("_mn"))
                        / (F.col("_mx").cast("double") - F.col("_mn"))
                        * bins
                    ),
                    F.lit(bins - 1),
                ),
            ).otherwise(F.lit(0)).cast("long"),
        ).drop("_mn", "_mx")
    w_local = Window.partitionBy("_bin").orderBy(value_col)
    cum_local = binned.select(
        value_col,
        "_c",
        "_bin",
        F.sum("_c").over(w_local).alias("_lcum"),
    )
    # bin totals from the windowed frame (max running sum), NOT a
    # fresh aggregation over `binned` — the branches must share one
    # subtree so the count relation materializes once
    bin_totals = cum_local.groupBy("_bin").agg(
        F.max("_lcum").alias("_bc")
    )
    w_off = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, -1
    )  # rows = distinct bins — tiny by construction
    offsets = bin_totals.select(
        "_bin",
        F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).alias("_off"),
    )
    total = bin_totals.agg(F.sum("_bc").cast("double").alias("_n"))
    # LEFT join for the same reason as _cumulative_counts: an inner
    # join would infer isnotnull(_bin) and desync the shared subtree
    qmap = (
        cum_local.join(F.broadcast(offsets), "_bin", "left")
        .crossJoin(F.broadcast(total))
        .select(
            value_col,
            F.when(
                F.col("_n") > 1,
                F.round(
                    (F.col("_off") + F.col("_lcum") - F.col("_c"))
                    / (F.col("_n") - 1),
                    ndigits,
                ),
            ).otherwise(F.lit(0.0)).alias(out_col),
        )
    )
    return part.join(qmap, value_col)
