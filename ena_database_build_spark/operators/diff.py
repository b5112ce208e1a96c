"""Snapshot diff between two corpus versions (SURVEY.md §2.11
extension surface — dataset versioning: "what changed between last
week's crawl and this one" drives incremental re-processing, cache
invalidation, and audit trails in a training-data pipeline).

Plan shape: a single full-outer join keyed on the document id — one
shuffle per side (or zero when both snapshots are stored bucketed by
id, the recommended layout for 100 TB corpora that diff every cycle).
Change detection compares a content fingerprint, NOT the full payload,
so the join rows stay narrow regardless of document size; callers pass
a fingerprint column or let this module derive the canonical
``dedup.fingerprint`` of a text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ena_database_build_spark.operators.dedup import fingerprint


def with_fingerprint(
    df: DataFrame, text_col: str = "text", fp_col: str = "_fp"
) -> DataFrame:
    """Attach the canonical content fingerprint (md5 of normalized
    text, the same identity every dedup operator uses)."""
    return df.withColumn(fp_col, fingerprint(F.col(text_col)))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fp_col: str,
    include_unchanged: bool = False,
) -> DataFrame:
    """(id, status) with status in {'added', 'removed', 'changed'}
    (plus 'unchanged' when requested).  Inputs must be one row per id
    (snapshots); both sides are projected to (id, fingerprint) before
    the join so the shuffle never carries document bodies."""
    o = old.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_old_fp")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_new_fp")
    )
    joined = o.join(n, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    if include_unchanged:
        return joined
    return joined.where(F.col("status") != "unchanged")
