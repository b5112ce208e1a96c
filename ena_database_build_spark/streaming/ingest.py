"""Continuous corpus ingestion with incremental dedup.

The batch operator :func:`~ena_database_build_spark.operators.dedup.
dedup_incremental` already makes ingestion idempotent (a batch's rows
are kept only if their content fingerprint appears neither in the
corpus nor earlier in the batch).  This module turns it into a
Structured Streaming sink via ``foreachBatch`` — the standard pattern
for streaming writes that need a read-modify-write against existing
state Spark's stateful operators can't hold (here: the whole corpus's
fingerprint set, which lives in the corpus parquet itself, not in
bounded stream state).

Exactly-once notes: ``foreachBatch`` re-executes a micro-batch after
failure; because the dedup is a pure function of (batch content,
corpus content) and re-ingesting already-appended rows finds their own
fingerprints in the corpus, a replayed batch appends nothing — the
sink is idempotent at the row-content level, which is the property a
training corpus needs (no duplicate documents), without any external
transaction log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException

from ena_database_build_spark.operators.dedup import dedup_incremental


def dedup_append_batch(
    batch_df: DataFrame,
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> int:
    """One micro-batch of deduplicating ingestion: drop rows whose
    fingerprint already exists in the corpus at ``corpus_path`` (or
    earlier in the batch), append the survivors, return how many rows
    were appended.  Usable directly for batch backfills too.

    ``fmt`` is any appendable Spark batch format ("parquet", "orc",
    ...): the dedup logic never touches bytes, only the (id, text)
    relation, so the sink is format-agnostic by construction — pinned
    by a test that runs the same scenario against an ORC corpus."""
    spark = batch_df.sparkSession
    try:
        existing = spark.read.format(fmt).load(corpus_path).select(
            id_col, text_col
        )
    except AnalysisException:  # first batch: corpus does not exist yet
        existing = spark.createDataFrame(
            [], batch_df.select(id_col, text_col).schema
        )
    kept = dedup_incremental(
        batch_df, existing, text_col=text_col, id_col=id_col
    )
    # localCheckpoint before the append: `kept` reads the corpus the
    # write is about to extend, and file sources re-list files per
    # action — materializing first pins the read set (classic
    # read-modify-write self-overwrite hazard).
    kept = kept.localCheckpoint(eager=True)
    n = kept.count()
    if n:
        kept.write.mode("append").format(fmt).save(corpus_path)
    return n


def dedup_ingest_stream(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
):
    """Wire a streaming DataFrame into deduplicating corpus ingestion.
    Returns the started StreamingQuery; the caller awaits/stops it."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_append_batch(batch_df, corpus_path, text_col, id_col, fmt)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
