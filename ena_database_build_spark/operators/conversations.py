"""Conversation/transcript assembly — the SFT-data shape of an event
log: per-user sessions become ordered multi-turn transcripts with a
turn cap, the unit a supervised-fine-tuning or dialogue-modeling
pipeline trains on.

The reference pipeline has no conversational surface (its records are
flat EMBL loci); this extends the §2.11 LLM-data mandate the same way
packing/chunking do — by re-expressing a sequential-looking assembly
(walk a user's events in order, cut at idle gaps, emit the first N
turns) as pure relational operators:

* sessionization is the proven lag/cumsum shape (strict ``> gap``
  split on microsecond timestamps — identical semantics to the
  streaming session window and the catalog's session oracles);
* turn ordering is ``sort_array`` over collected (ts, id, turn)
  structs — per-session state, bounded by the session's own events,
  never a global or per-user-lifetime window;
* the turn cap is ``slice`` on the sorted array, so a transcript's
  memory is bounded by ``max_turns`` regardless of session length.

Scale shape: one user-keyed window exchange (sessionization) + one
(user, session)-keyed aggregation — both map-side-combinable-free but
strictly keyed; no driver collect, no UDF, whole plan codegen-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_transcripts(
    events: DataFrame,
    gap: str = "30 minutes",
    max_turns: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    payload_col: str = "props",
    id_col: str = "event_id",
) -> DataFrame:
    """Per (user, idle-gap session): an ordered ``role:payload``
    transcript of the first ``max_turns`` events.

    Returns ``(user_id, session_start_s, n_turns, n_total_turns,
    truncated, transcript)`` — ``n_turns`` is the capped count that
    made it into the transcript, ``n_total_turns`` the session's full
    size, ``truncated`` whether the cap bit.  Turn text is
    ``event_type:payload`` (payload passed through as a string —
    float formatting is engine-specific, strings are not) joined by
    ``" | "``; ties on the timestamp break by ``id_col`` so the
    transcript is deterministic.

    ``gap`` accepts the Spark interval forms ``"30 minutes"`` /
    ``"10 minutes"`` used by the session operators."""
    n_min = int(gap.split()[0])
    unit = gap.split()[1].rstrip("s")
    gap_us = n_min * {"minute": 60, "second": 1, "hour": 3600}[unit] * 1_000_000

    ev = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.concat_ws(
            ":", F.col(type_col), F.coalesce(F.col(payload_col), F.lit(""))
        ).alias("_turn"),
    )
    w = Window.partitionBy(user_col).orderBy("_us", id_col)
    sess = ev.withColumn(
        "_new",
        F.when(
            F.lag("_us").over(w).isNull()
            | ((F.col("_us") - F.lag("_us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # cap BEFORE collecting: row_number within the session gates which
    # turns are buffered, so per-session aggregation state is bounded
    # by max_turns even for a bot session with millions of events
    # (the funnel_stages_bounded discipline)
    w2 = Window.partitionBy(user_col, "_sess").orderBy("_us", id_col)
    ranked = sess.select(
        F.col(user_col),
        F.col("_sess"),
        F.col("_us"),
        F.col(id_col),
        F.col("_turn"),
        F.row_number().over(w2).alias("_rn"),
        F.count("*").over(Window.partitionBy(user_col, "_sess")).alias(
            "_tot"
        ),
        F.min("_us").over(Window.partitionBy(user_col, "_sess")).alias(
            "_start_us"
        ),
    ).where(F.col("_rn") <= max_turns)
    agg = ranked.groupBy(user_col, "_sess").agg(
        # integer `div`, not `/`: double division of an int64 epoch can
        # round up across the second boundary before the cast truncates
        # (the t() nanosAsLong discipline)
        F.expr("min(_start_us) div 1000000").alias("session_start_s"),
        F.min("_tot").alias("n_total_turns"),
        F.sort_array(
            F.collect_list(
                F.struct(F.col("_us"), F.col(id_col), F.col("_turn"))
            )
        ).alias("_turns"),
    )
    return agg.select(
        F.col(user_col),
        "session_start_s",
        F.size("_turns").cast("long").alias("n_turns"),
        "n_total_turns",
        (F.col("n_total_turns") > max_turns).alias("truncated"),
        F.concat_ws(
            " | ", F.transform(F.col("_turns"), lambda s: s["_turn"])
        ).alias("transcript"),
    )
