"""Type-2 slowly-changing dimension (SCD2) build from a change-event
stream (SURVEY.md §2.11 extension surface — the standard warehouse shape
for "what was this entity's state at time T" over mutable metadata:
document licensing, source quality tier, user state).

Plan shape: ONE shuffle.  Both window passes (the no-op-change collapse
via ``lag`` and the interval close via ``lead``) share the identical
``(key)`` partitioning and ``(ts, seq)`` ordering, so Catalyst plans a
single Exchange + Sort with the Window operators pipelined on top — at
100 TB the operator costs exactly one shuffle of the change stream,
and a skewed entity is still just one partition's sort (bounded by that
entity's change count, not the corpus).

Conventions (documented, both engines): rows with a NULL key, NULL
timestamp, or NULL state are excluded up front — NULL state is not a
trackable value, and NULL keys/timestamps have no position in the
dimension; ties on ``ts`` break deterministically by ``seq_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    seq_col: str,
) -> DataFrame:
    """(key, state, eff_from, eff_to, is_current) — one row per state
    EPISODE: consecutive events carrying the same state collapse into
    one interval; ``eff_to`` is the next episode's start (NULL for the
    open, current episode)."""
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(state_col).isNotNull()
    ).select(key_col, ts_col, state_col, seq_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    changes = base.withColumn(
        "_prev", F.lag(state_col).over(w)
    ).where(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
    scd = changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("eff_from"),
        F.lead(ts_col).over(w).alias("eff_to"),
    )
    return scd.withColumn("is_current", F.col("eff_to").isNull())


def scd2_snapshot(scd: DataFrame, at, ts_expr=None) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the single state row
    per key valid at ``at`` (``eff_from <= at < eff_to``, open episodes
    included).  Pure filter — map-only, no shuffle; partition pruning
    applies when the dimension is stored partitioned by eff_from
    range."""
    at_lit = F.lit(at) if ts_expr is None else ts_expr
    return scd.where(
        (F.col("eff_from") <= at_lit)
        & (F.col("eff_to").isNull() | (F.col("eff_to") > at_lit))
    ).drop("is_current")


def latest_snapshot(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Latest-wins CDC compaction: collapse a change stream to the
    current snapshot — the newest row per key (ties broken by
    ``seq_col`` descending), with keys whose newest change is a
    tombstone (``op_col == delete_op``) absent from the result.

    One shuffle keyed on ``key_col``; the rank-limit (n=1) lets Spark
    insert a WindowGroupLimit partial below the exchange, so map tasks
    forward one candidate row per key each, not the full history.
    NULL keys/timestamps are excluded (no position in the snapshot)."""
    base = changes.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    latest = (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.where(F.col(op_col) != F.lit(delete_op))
    return latest


def merge_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE INTO analog (the lakehouse upsert): apply a CDC changelog
    to an existing snapshot, producing the new snapshot —

    * keys the changelog never touches pass through unchanged,
    * keys whose newest change is an upsert take the change row,
    * keys whose newest change is the ``delete_op`` tombstone drop,
      even if present in the snapshot.

    ``changes`` must carry every snapshot column (the row replaces the
    snapshot row wholesale; partial-column updates are a projection
    the caller does first).  Newest-change resolution reuses
    :func:`latest_snapshot`'s ordering (``ts`` desc, ``seq`` desc).

    Scale shape: one key-partitioned window over the changelog (with
    the WindowGroupLimit map-side pre-trim), one key-keyed anti-join
    that removes every touched key from the snapshot, and a union —
    the snapshot is never windowed and never shuffled beyond the
    anti-join; at 100 TB the changelog is the small side and the
    snapshot moves once."""
    base = changes.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    latest = (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = snapshot.join(
        latest.select(key_col), key_col, "left_anti"
    )
    upserts = (
        latest.where(F.col(op_col) != F.lit(delete_op))
        if op_col is not None
        else latest
    )
    return untouched.unionByName(upserts.select(*snapshot.columns))
