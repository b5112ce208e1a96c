"""Range (interval) joins without cross products.

Spark's optimizer turns a plain ``a.start <= b.x AND b.x <= a.end``
join condition into BroadcastNestedLoopJoin (all-pairs per partition) —
unusable at scale.  These operators re-express interval predicates as
equi-joins on a bucketed axis, which Catalyst shuffles/broadcasts like
any other key join:

* :func:`range_join` — point-in-interval: intervals explode to the
  fixed-width buckets they span (span/width + 1 rows each), points map
  to exactly ONE bucket, the join is a plain equi-join on the bucket,
  and the residual ``start <= p <= end`` filter runs post-join.  A
  point lies in exactly one bucket, so no dedup pass is needed.
  Bucket width tunes replication vs selectivity: width ~ the typical
  interval span keeps replication ~2x while each bucket pairs only
  nearby rows.
* :func:`interval_overlap_join` — interval-interval overlap with the
  first-overlap-bucket trick: both sides explode, and a candidate pair
  is kept only in the bucket containing ``greatest(a.start, b.start)``
  — each overlapping pair survives in EXACTLY one bucket, eliminating
  the post-join DISTINCT (a whole shuffle) that naive bucket joins
  need.
* :func:`concurrent_intervals` — the sweep-line form of "how many
  intervals cover each point": +1/-1 boundary events, one sort, one
  running sum.  For per-point coverage COUNTS this beats any join —
  shuffle volume is 2 rows per interval regardless of span — and it is
  the shape to reach for when the join's only purpose is counting.
* :func:`coverage_at_points` — the count-only range join: probe
  points ride the sweep as zero-delta boundaries, so each probe reads
  its exact coverage without ever materializing the point-interval
  pair relation (round-6 verdict #4: count-only shapes route here;
  :func:`range_join` is for queries that need the joined payload).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _require_integral(df: DataFrame, col: str, fn: str) -> None:
    """The sweep-line forms compare POSITIONS AFTER a long cast, so a
    fractional position column would silently truncate (0.7 counted at
    0) and break the documented equivalence to ``range_join(...)``'s
    native-value residual filter (r7 ADVICE).  ``range_join`` itself
    is exempt: truncation there only picks the bucket (monotone, so
    containment never escapes the bucket range) and the residual
    filter compares native values."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    dt = df.schema[col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"{fn} requires integral position columns; {col!r} is "
            f"{dt.simpleString()} — the long cast would truncate "
            "fractional positions and silently diverge from "
            "range_join's native-value containment"
        )


def _bucket(col: Column, width: int) -> Column:
    # Float division + truncating cast, NOT the repo's usual integer
    # `div` (which needs a NAMED column for F.expr — one call site
    # buckets a greatest(...) expression).  That is sound HERE, unlike
    # plan_batches' capacity math: a bucket id is only a partition
    # key, so the mapping just has to be deterministic, monotone
    # non-decreasing (IEEE division by a positive constant and
    # truncation both are), and the same expression at every call
    # site — a double-rounded quotient near 2^53 shifts a bucket
    # BOUNDARY consistently for points and intervals alike, never a
    # point out of its interval's bucket range.
    return (col.cast("long") / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``), all columns of both sides preserved.

    ``point_col``/``start_col``/``end_col`` must be castable to long
    (epoch days/seconds, ints); ``bucket_width`` is in those units.

    Only ``how='inner'`` is sound: the containment predicate runs as a
    post-join filter, which would silently drop the null-extended rows
    an outer join produces (turning 'left' back into 'inner') and
    cannot reference interval columns after a semi/anti join.
    """
    if how != "inner":
        raise ValueError(
            f"range_join supports only how='inner', not {how!r}: the "
            "containment filter runs after the bucket join and would "
            "drop outer-join null rows / fail on semi-anti output"
        )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_width),
                _bucket(F.col(end_col), bucket_width),
            )
        ),
    )
    pt = points.withColumn("_b", _bucket(F.col(point_col), bucket_width))
    joined = pt.join(iv, "_b", how).where(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (left, right) pairs whose intervals overlap
    (``l.start <= r.end AND r.start <= l.end``), each pair emitted
    exactly once — kept only in the bucket of the later start, so no
    dedup shuffle."""
    lv = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(left_start), bucket_width),
                _bucket(F.col(left_end), bucket_width),
            )
        ),
    )
    rv = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(right_start), bucket_width),
                _bucket(F.col(right_end), bucket_width),
            )
        ),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_bucket = _bucket(
        F.greatest(F.col(left_start), F.col(right_start)), bucket_width
    )
    return (
        lv.join(rv, "_b")
        .where(overlap & (F.col("_b") == first_bucket))
        .drop("_b")
    )


def concurrent_intervals(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Coverage count at every interval boundary: for each distinct
    position where coverage can change, the number of intervals
    containing it (end-inclusive).  Sweep line: explode each interval
    to (+1 at start, -1 at end+1), one running sum over the position
    order.  Output: ``by... , pos, n_active`` — ``n_active`` holds for
    ``[pos, next_pos)``.

    With ``bucket_width=None`` the running sum is one ordered window
    per ``by`` group — for an EMPTY ``by`` that is a single-partition
    global sort, fine for small boundary sets but a scale bottleneck.
    Pass ``bucket_width`` (position units) to switch to the two-phase
    distributed prefix sum (same shape as ``packing.pack_sequences``):
    positions range-bucket by ``pos div width``, each bucket runs its
    local cumulative sum in parallel, and the per-bucket delta totals
    (one row per bucket) prefix-sum on the tiny side and broadcast
    back as offsets — bucket-concatenation order IS position order, so
    ``offset + local cumsum`` is the exact sweep value and no task
    ever sorts the whole axis."""
    by = by or []
    for c in (start_col, end_col):
        _require_integral(intervals, c, "concurrent_intervals")
    deltas = _interval_deltas(intervals, start_col, end_col, by)
    return _sweep(deltas, by, bucket_width)


def coverage_at_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Count-only range join: every ``points`` row with ``n_active`` =
    the number of ``intervals`` rows containing it (``start <= p <=
    end``) — including 0.  Equivalent to ``range_join(...).groupBy(
    point).count()`` but never materializes the point-interval pair
    relation: the probe positions enter the sweep as zero-delta
    boundary rows, so the sweep value AT each probe position is exactly
    its coverage, and shuffle volume stays 2 rows per interval + 1 per
    probe position regardless of interval span or match fan-out.  The
    shape to reach for whenever the join's only purpose is counting
    (the payload-preserving form is :func:`range_join`).

    ``by`` keys the sweep per group (probe rows must carry the same
    columns); ``bucket_width`` selects the distributed two-phase prefix
    sum exactly as in :func:`concurrent_intervals`.

    This form joins the sweep back to ``points`` so arbitrary point
    columns survive — which evaluates the ``points`` subtree twice
    (once into the sweep, once as the join side).  When the probe
    position is all a caller needs, :func:`coverage_at_positions`
    reads the coverage straight off the sweep (single evaluation of
    both inputs).

    Position columns must be integral (:func:`_require_integral`).
    NULL handling: a points row with a NULL position is contained in
    no interval, so it comes back with ``n_active = 0``; intervals
    with a NULL endpoint contain nothing (NULL comparisons are false
    in the inner-join form) and are dropped from the sweep."""
    by = by or []
    sweep = coverage_at_positions(
        points, intervals, point_col, start_col, end_col, by, bucket_width
    )
    keys = [*by, "pos"]
    return (
        points.withColumn("pos", F.col(point_col).cast("long"))
        .join(sweep, keys, "left")
        .drop("pos")
        .withColumn("n_active", F.coalesce("n_active", F.lit(0)))
    )


def coverage_at_positions(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """``(by..., pos, n_active)`` for each DISTINCT probe position in
    ``points`` — the no-join core of :func:`coverage_at_points`: probe
    rows ride the sweep as zero-delta boundaries carrying a marker,
    and the output is the sweep filtered to marked positions.

    Each input relation is evaluated exactly once on BOTH sweep forms
    (plan-test pinned): with ``bucket_width=None`` trivially, and with
    ``bucket_width`` set because the offsets branch reads the windowed
    frame through a ReusedExchange — the probe mark is referenced in
    the offsets aggregation's max_by ordering key purely so column
    pruning cannot desync the two consumers of the shared exchange
    (r7 verdict #5; see the comment in :func:`_sweep`).

    Position columns must be integral (:func:`_require_integral`);
    NULL probe positions are excluded (no ``pos = NULL`` output row —
    NULL comparisons are false in the inner-join form this mirrors)."""
    by = by or []
    _require_integral(points, point_col, "coverage_at_positions")
    for c in (start_col, end_col):
        _require_integral(intervals, c, "coverage_at_positions")
    probe_pos = (
        points.where(F.col(point_col).isNotNull())
        .select(*by, F.col(point_col).cast("long").alias("pos"))
        .distinct()
        .withColumn("d", F.lit(0))
        .withColumn("_p", F.lit(1))
    )
    deltas = (
        _interval_deltas(intervals, start_col, end_col, by)
        .withColumn("_p", F.lit(0))
        .unionByName(probe_pos)
    )
    sweep = _sweep(deltas, by, bucket_width, mark_col="_p")
    return sweep.where(F.col("_p") == 1).select(*by, "pos", "n_active")


def _interval_deltas(
    intervals: DataFrame, start_col: str, end_col: str, by: list[str]
) -> DataFrame:
    """+1 at start, -1 just past the (inclusive) end.  Intervals with
    a NULL endpoint contain nothing (NULL comparisons are false in the
    join form the sweep mirrors) and are dropped."""
    intervals = intervals.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    return intervals.select(
        *by,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).cast("long").alias("pos"),
                    F.lit(1).alias("d"),
                ),
                F.struct(
                    (F.col(end_col).cast("long") + 1).alias("pos"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e"),
    ).select(*by, "e.pos", "e.d")


def _sweep(
    deltas: DataFrame,
    by: list[str],
    bucket_width: int | None,
    mark_col: str | None = None,
) -> DataFrame:
    """Running sum of deltas in position order: (by..., pos, n_active),
    one row per distinct position.  ``mark_col`` names an extra 0/1
    column of ``deltas`` carried through (max per position) so probe
    rows remain identifiable downstream."""
    marks = [F.max(mark_col).alias(mark_col)] if mark_col else []
    mark_cols = [mark_col] if mark_col else []
    per_pos = deltas.groupBy(*by, "pos").agg(
        F.sum("d").alias("delta"), *marks
    )
    if bucket_width is None:
        w = Window.partitionBy(*by).orderBy("pos")
        return per_pos.select(
            *by, "pos", F.sum("delta").over(w).alias("n_active"), *mark_cols
        )
    # `div` truncation is monotone, so bucket order == position order
    local = per_pos.withColumn("_bkt", F.expr(f"pos div {int(bucket_width)}"))
    w_local = Window.partitionBy(*by, "_bkt").orderBy("pos")
    cum_local = local.withColumn("_lcum", F.sum("delta").over(w_local))
    # bucket totals from the SAME windowed frame (ReusedExchange — a
    # second aggregation over per_pos would re-execute the upstream):
    # the running sum at each bucket's max pos IS the bucket total
    # (max(_lcum) would be wrong: deltas go negative)
    w_bkt = Window.partitionBy(*by).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the offsets aggregation must REFERENCE mark_col: otherwise
    # column pruning reads the windowed frame without the mark in this
    # branch while the main branch reads it with, the two subtrees
    # stop canonicalizing equal, and ReusedExchange never fires —
    # re-executing the whole delta union (probe distinct included) a
    # second time (r7 verdict #5, the quality_ensemble defect class).
    # A dropped dummy aggregate gets pruned right back out, so the
    # reference rides the max_by ORDERING key instead: pos is unique
    # per (by, _bkt) group (per_pos grouped on it), so the struct
    # tie-break on the mark can never change the argmax.
    ord_key = F.struct("pos", mark_col) if mark_col else F.col("pos")
    offsets = (
        cum_local.groupBy(*by, "_bkt")
        .agg(F.max_by("_lcum", ord_key).alias("_btot"))
        .select(
            *by,
            "_bkt",
            F.coalesce(F.sum("_btot").over(w_bkt), F.lit(0)).alias("_off"),
        )
    )
    return cum_local.join(F.broadcast(offsets), [*by, "_bkt"], "left").select(
        *by,
        "pos",
        (F.col("_off") + F.col("_lcum")).alias("n_active"),
        *mark_cols,
    )
