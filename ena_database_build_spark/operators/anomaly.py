"""Rate-anomaly detection over an event stream: per (group, fixed
time window) counts scored as z-scores against the group's own
window-count distribution — the ops-monitoring gate ("error rate
spiked", "ingest stalled") next to psi_report's feature-drift gate.

Zero-count windows are REAL rows, not gaps: an outage is the anomaly
most worth catching, so the window spine is materialized from the
global time bounds and left-joined with the observed counts.

Determinism discipline: window ids come from integer `div` on the
epoch (never float division), counts and their sums/sums-of-squares
are exact integers, and mean/variance/z are single IEEE expressions
over those integers — any engine reproduces the flags bit-for-bit.

Scale shape: one (group, window)-keyed map-side-combinable count, a
1-row bounds broadcast + a #groups-row distinct crossed into the
window spine (both broadcast-sized), one #groups-row stats
aggregation broadcast back — the event stream is scanned twice
(counts, groups) and shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_s: int = 3600,
    z_threshold: float = 3.0,
    ndigits: int = 6,
) -> DataFrame:
    """Per (group, window) rate scoring: ``(group, win_start_s, n, z,
    is_anomaly)`` for EVERY window in the observed time range,
    including empty ones.  ``z`` is the count's z-score against the
    group's own window-count distribution (population variance); a
    constant-rate group (zero variance) scores ``z = 0``."""
    win_us = window_s * 1_000_000
    ev = events.where(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("_grp"),
        F.expr(f"unix_micros({ts_col}) div {win_us}").alias("_win"),
    )
    counts = ev.groupBy("_grp", "_win").agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.min("_win").alias("_wmin"), F.max("_win").alias("_wmax")
    )
    groups = ev.select("_grp").distinct()
    spine = groups.crossJoin(F.broadcast(bounds)).select(
        "_grp",
        F.explode(
            F.sequence(F.col("_wmin"), F.col("_wmax"))
        ).alias("_win"),
    )
    filled = spine.join(counts, ["_grp", "_win"], "left").select(
        "_grp", "_win", F.coalesce("n", F.lit(0)).alias("n")
    )
    stats = filled.groupBy("_grp").agg(
        F.count("*").alias("_c"),
        F.sum("n").alias("_s"),
        F.sum(F.col("n") * F.col("n")).alias("_sq"),
    )
    c = F.col("_c").cast("double")
    s = F.col("_s").cast("double")
    mean = s / c
    var = (F.col("_sq").cast("double") - s * s / c) / c
    z = F.when(
        var > 0,
        F.round((F.col("n").cast("double") - mean) / F.sqrt(var), ndigits),
    ).otherwise(F.lit(0.0))
    return (
        filled.join(F.broadcast(stats), "_grp")
        .select(
            F.col("_grp").alias(type_col),
            (F.col("_win") * window_s).alias("win_start_s"),
            "n",
            z.alias("z"),
            (F.abs(z) > z_threshold).alias("is_anomaly"),
        )
    )
