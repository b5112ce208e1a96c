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


def bucket_checksums(
    df: DataFrame,
    id_col: str,
    cols: list[str],
    bucket_hex: int = 2,
) -> DataFrame:
    """Merkle-style bucket summary for replica comparison:
    ``(bucket, n_rows, checksum)`` — one scan collapsed to
    ``16**bucket_hex`` rows.

    Two replicas of a 100 TB table compare by exchanging THESE rows
    (kilobytes) instead of shuffling content: equal summaries prove
    buckets equal (up to hash collision); differing buckets localize
    the damage to id-ranges a targeted :func:`snapshot_diff` can then
    inspect.  The checksum is a ``bit_xor`` over a 60-bit md5-derived
    row hash — order-independent (replicas partition differently) and
    overflow-free at any row count; the known xor weakness (identical
    row PAIRS cancel) is acceptable for corruption detection and
    standard for anti-entropy scans.

    ``cols`` must cast to VARCHAR identically in any engine that
    recomputes the summary (ints/strings; avoid bare floats and
    timestamps — fingerprint them first).  NULL encodes as ``chr(0)``
    so (NULL) and ('') differ.
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    row_repr = F.concat_ws("\x1f", *parts)
    row_hash = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = F.substring(
        F.md5(F.col(id_col).cast("string")), 1, bucket_hex
    )
    return (
        df.where(F.col(id_col).isNotNull())
        .select(bucket.alias("bucket"), row_hash.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
    )


def replica_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    cols: list[str],
    bucket_hex: int = 2,
) -> DataFrame:
    """Buckets on which two replicas disagree:
    ``(bucket, n_rows_a, n_rows_b)`` — absent buckets count 0 rows.
    The join input is two bucket-count tables (bounded by the bucket
    space), never the replicas themselves."""
    ca = bucket_checksums(a, id_col, cols, bucket_hex).select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("checksum").alias("_ck_a"),
    )
    cb = bucket_checksums(b, id_col, cols, bucket_hex).select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("checksum").alias("_ck_b"),
    )
    return (
        ca.join(cb, "bucket", "full_outer")
        .where(
            F.coalesce(F.col("_ck_a") != F.col("_ck_b"), F.lit(True))
            | F.coalesce(
                F.col("n_rows_a") != F.col("n_rows_b"), F.lit(True)
            )
        )
        .select(
            "bucket",
            F.coalesce("n_rows_a", F.lit(0)).alias("n_rows_a"),
            F.coalesce("n_rows_b", F.lit(0)).alias("n_rows_b"),
        )
    )
