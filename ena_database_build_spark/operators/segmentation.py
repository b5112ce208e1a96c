"""Ordered-line sessionization (operators G1-G4).

The reference parses each EMBL file with a single-pass state machine
(ena_build/parse_embl.py:444-570).  Relationally that machine is two
nested sessionizations over an ordered line stream; here they are
conditional running sums over ``Window.partitionBy(file).orderBy(line_no)``.

Scale note: one window partition = one file, which is exactly the
reference's parallelism unit (one Dask task holds a handful of files —
ena_build/dask_tasks.py:168-178).  EMBL files are "relatively small"
(reference README.md:48), so a per-file partition fits executor memory;
AQE handles stragglers.  All downstream group-bys key on
``(file, record_idx, block_idx)`` which only ever *refines* the window
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ena_database_build_spark.functions import embl as E


def segment_lines(embl_lines: DataFrame) -> DataFrame:
    """G1+G2: assign ``record_idx`` and ``block_idx`` to every retained line.

    Input schema: ``file STRING, line_no LONG, line STRING`` (order pinned
    by ``line_no``).  Output adds:

    * ``record_idx`` — running count of ``ID   `` lines in the file; each
      ID line opens a new record (G1, parse_embl.py:494-520).  Lines
      before the first ID get 0 and belong to no record.
    * ``block_idx`` — running count of feature-block-start lines (P4);
      every feature start closes the previous block and opens a new one
      (G2, parse_embl.py:545-559).  Because an ID line does not increment
      ``block_idx``, blocks are keyed by (record_idx, block_idx) so a
      stale block index can never leak across records.
    """
    w = (
        Window.partitionBy("file")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    line = F.col("line")
    return (
        embl_lines.where(E.is_interesting_line(line))
        .withColumn("is_id", E.is_id_line(line))
        .withColumn("is_ft_start", E.is_feature_start(line))
        .withColumn("record_idx", F.sum(F.col("is_id").cast("long")).over(w))
        .withColumn("block_idx", F.sum(F.col("is_ft_start").cast("long")).over(w))
    )


def extract_records(segmented: DataFrame) -> DataFrame:
    """Per-record header + taxonomy gate (P1, F3, F4, F5, F6).

    Returns one row per (file, record_idx) with the parsed ID-line struct
    flattened, plus ``fungi_dropped`` (F3: any OC line in the record names
    Eukaryota without `` Fungi`` — parse_embl.py:527-535) and
    ``reject_reason`` for the dead-letter channel.
    """
    parsed = segmented.withColumn(
        "id_info",
        F.when(F.col("is_id"), E.parse_id_line(F.col("line"))),
    )
    return (
        parsed.where(F.col("record_idx") > 0)
        .groupBy("file", "record_idx")
        .agg(
            # exactly one ID line per record_idx by construction
            F.first("id_info", ignorenulls=True).alias("id_info"),
            F.max(
                E.is_drop_taxonomy_line(F.col("line")).cast("int")
            ).alias("_fungi_drop"),
        )
        .select(
            "file",
            "record_idx",
            F.col("id_info.ena_id").alias("ena_id"),
            F.col("id_info.chr_struct").alias("chr_struct"),
            F.col("id_info.chr_len").alias("chr_len"),
            F.when(F.col("_fungi_drop") == 1, F.lit("non_fungi_eukaryote"))
            .otherwise(F.col("id_info.reject_reason"))
            .alias("reject_reason"),
            (F.col("_fungi_drop") == 1).alias("fungi_dropped"),
        )
    )


def extract_cds_blocks(segmented: DataFrame) -> DataFrame:
    """G2 close-out: one row per CDS feature block.

    A block belongs to a CDS iff its head line (the feature-start line
    that opened it) starts with ``FT   CDS `` (P5, parse_embl.py:557).
    Only the head line and ``FT    `` qualifier-continuation lines (P6,
    parse_embl.py:564) enter the block's line buffer; anything else
    inside the block span is ignored, matching the state machine's
    fall-through.

    Output: ``file, record_idx, block_idx, first_line_no, block_lines
    ARRAY<STRING>`` (in line order).
    """
    candidate = segmented.where(
        (F.col("block_idx") > 0)
        & (F.col("record_idx") > 0)
        & (F.col("is_ft_start") | E.is_qualifier_continuation(F.col("line")))
    )
    return (
        candidate.groupBy("file", "record_idx", "block_idx")
        .agg(
            F.min("line_no").alias("first_line_no"),
            F.min_by("line", "line_no").alias("head_line"),
            F.array_sort(
                F.collect_list(F.struct("line_no", "line"))
            ).alias("_ordered"),
        )
        .where(E.is_cds_head(F.col("head_line")))
        .select(
            "file",
            "record_idx",
            "block_idx",
            "first_line_no",
            F.transform(F.col("_ordered"), lambda s: s["line"]).alias("block_lines"),
        )
    )


def number_loci(parsed_blocks: DataFrame) -> DataFrame:
    """G4: assign ``locus_num`` = 1-based ordinal of *successfully parsed*
    CDS blocks within a record, in block order (quirk SURVEY.md §2.10.4:
    failed blocks — F7 — are dropped before numbering, reference
    parse_embl.py:150-154 returns before the count increment at :190).

    Input must already be filtered to blocks with >=1 location range.
    """
    w = Window.partitionBy("file", "record_idx").orderBy("first_line_no")
    return parsed_blocks.withColumn("locus_num", F.row_number().over(w))
