"""The end-to-end ENA build pipeline as one lazy DataFrame lineage.

Reference semantics (ena_build/parse_embl.py:444-570 +
mysql_database.py:50-134) re-expressed Spark-first:

    embl_lines ─ G1/G2 windows ─┬─ records  (P1, F3-F6)
                                └─ cds blocks (P5/P6) ─ P7/P3/P8 ─ F7
                                        │
                 records ⋈ blocks ─ A3/A4 span ─ G4 ordinals ─ A1 sets
                                        │
                 explode protein_ids ⋈ idmapping (J1) ─ A-collect
                                        │
                 J3 fallback-coalesce ─ O1 explode ─ O2 project → ena_tab

Pinned quirks (SURVEY.md §2.10): 1=linear encoding, strict-> circular
gap tie-break, end<start legal, ordinals skip failed blocks, lenient
range regex, same-line Fungi gate, mapping-hit-wins fallback, **no**
global dedup of output rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ena_database_build_spark.functions import embl as E
from ena_database_build_spark.functions.locations import (
    has_range,
    location_ranges,
    resolved_span,
)
from ena_database_build_spark.operators import segmentation as S

ENA_TAB_COLUMNS = [
    "ena_id",
    "uniprot_id",
    "locus_num",
    "chr_struct",
    "direction",
    "start",
    "end",
]


@dataclass
class EnaBuildResult:
    """All materialized channels of the pipeline (each still lazy)."""

    records: DataFrame
    loci: DataFrame
    ena_tab: DataFrame
    rejected_records: DataFrame
    rejected_blocks: DataFrame


def parse_records(embl_lines: DataFrame) -> DataFrame:
    segmented = S.segment_lines(embl_lines)
    return S.extract_records(segmented)


def parse_loci(
    embl_lines: DataFrame,
    segmented: DataFrame | None = None,
    broadcast_records: bool = False,
) -> DataFrame:
    """records+blocks -> loci with resolved spans and per-locus id sets.

    Pass a pre-computed (ideally persisted) ``segmented`` DataFrame to
    avoid re-running ingest + windowing for each consumer branch.
    """
    if segmented is None:
        segmented = S.segment_lines(embl_lines)
    # NB: a "light" records path that re-derived record_idx from a
    # pre-filtered ID/OC line set measured 2-5x SLOWER end-to-end than
    # sharing the segmented lineage (it forfeits subtree reuse with the
    # blocks branch); keep both branches on `segmented`.
    records = S.extract_records(segmented)
    blocks = S.extract_cds_blocks(segmented)

    live_records = records.where(
        F.col("reject_reason").isNull() & (F.col("ena_id") != "")
    )

    parsed = blocks.withColumn(
        "loc_str", E.cds_location_string(F.col("loc_parts"))
    ).withColumn("loc_ranges", location_ranges(F.col("loc_str")))

    # F7: blocks with no x..y range are dropped *before* ordinal
    # assignment (quirk §2.10.4) and contribute no xrefs at all.
    good = parsed.where(F.size("loc_ranges") > 0)
    numbered = S.number_loci(good)

    # A1: per-locus xref sets were already collect_set'd map-side in
    # extract_cds_blocks.
    with_ids = numbered.select(
        "file",
        "record_idx",
        "locus_num",
        "first_line_no",
        "loc_str",
        "loc_ranges",
        E.strand_direction(F.col("loc_str")).alias("direction"),
        "uniprot_ids",
        "protein_ids",
    )

    # Record join is 1:N on (file, record_idx).  Default
    # broadcast_records=False: NO hint — a hint is always honored, and at
    # corpus scale the record-header relation (one row per chromosome)
    # can reach GBs; AQE decides from runtime sizes (broadcast when
    # small, shuffle join on the existing file-prefixed partitioning
    # otherwise).  Pass True to force the hint for small corpora where
    # skipping AQE's size probe measurably helps; build_ena_tab /
    # build_all plumb this through.
    join_records = (
        F.broadcast(live_records) if broadcast_records else live_records
    )
    joined = with_ids.join(join_records, ["file", "record_idx"])

    return joined.select(
        "file",
        "record_idx",
        "ena_id",
        "chr_struct",
        "chr_len",
        "locus_num",
        "direction",
        resolved_span(
            F.col("loc_ranges"), F.col("chr_struct"), F.col("chr_len")
        ).alias("span"),
        "uniprot_ids",
        "protein_ids",
    ).select(
        "file",
        "record_idx",
        "ena_id",
        "chr_struct",
        "chr_len",
        "locus_num",
        "direction",
        F.col("span.start").alias("start"),
        F.col("span.end").alias("end"),
        "uniprot_ids",
        "protein_ids",
    )


def resolve_uniprot_ids(
    loci: DataFrame, idmapping: DataFrame, broadcast_mapping: bool = False
) -> DataFrame:
    """J1 + J2 + J3: reverse-map protein ids, falling back to parsed ids.

    * J1 — explode the per-locus ``protein_ids`` set and inner-join the
      deduplicated idmapping on ``foreign_id`` (replaces the per-record
      ``IN (...)`` round-trip, mysql_database.py:92-93).
    * J2 — the anti-join/no-match bookkeeping vanishes: unmatched ids
      simply produce no join rows (the reference's ``not in no_match``
      check is provably redundant — SURVEY.md §2.6 J2).
    * J3 — a locus whose protein ids found *any* mapping uses exactly the
      mapped ids (duplicates across protein ids preserved, the reference
      emits one row per list element — parse_embl.py:236-255); otherwise
      it falls back to its parsed ``uniprot_ids``; loci with neither emit
      nothing.
    """
    mapping = idmapping.dropDuplicates(["foreign_id", "uniprot_id"])
    if broadcast_mapping:
        mapping = F.broadcast(mapping)

    locus_key = ["file", "record_idx", "locus_num"]
    other_cols = [c for c in loci.columns if c not in locus_key]

    # Single consumption of `loci`: explode the protein-id set
    # (explode_outer keeps protein-less loci alive for the fallback),
    # join the mapping, and fold back to locus grain.  The group-by
    # keys extend the pipeline's file-prefixed partitioning, so with a
    # broadcast mapping this whole step adds ZERO exchanges.
    exploded = loci.select(
        *loci.columns, F.explode_outer("protein_ids").alias("foreign_id")
    )
    joined = exploded.join(
        mapping.withColumnRenamed("uniprot_id", "_mapped_id"), "foreign_id", "left"
    )
    # any_value, not first: every exploded row of a locus carries
    # identical non-key values, so ANY value is the right one — encode
    # that invariant structurally instead of leaning on first()'s
    # row-order-dependent determinism surviving future refactors.
    regrouped = joined.groupBy(*locus_key).agg(
        *[F.any_value(c).alias(c) for c in other_cols],
        F.collect_list("_mapped_id").alias("mapped_uniprot_ids"),
    )
    resolved = regrouped.withColumn(
        "resolved_uniprot_ids",
        F.when(
            F.size("mapped_uniprot_ids") > 0, F.col("mapped_uniprot_ids")
        ).otherwise(F.col("uniprot_ids")),
    )
    return resolved.where(F.size("resolved_uniprot_ids") > 0)


def build_ena_tab(
    embl_lines: DataFrame,
    idmapping: DataFrame,
    broadcast_mapping: bool = False,
    broadcast_records: bool = False,
    persist_intermediates: bool = False,
) -> DataFrame:
    """Full pipeline: ordered lines + idmapping -> the 7-column table.

    Output grain: one row per (locus, resolved uniprot id list element);
    duplicates across overlapping input files are preserved (quirk
    §2.10.8 — the reference never dedups globally).

    ``persist_intermediates`` caches the segmented lines and the loci.
    Default OFF: the multi-consumer branches (records/blocks, the
    explode/join sides of J1/J3) share identical exchange subplans that
    Spark's ReuseExchange already dedups within the single write job,
    and measurements show caching the 10^6-row line table costs more
    (memory pressure + materialization) than it saves.  Turn on only
    when running several separate actions over one small corpus.
    """
    segmented = S.segment_lines(embl_lines)
    if persist_intermediates:
        segmented = segmented.persist()
    loci = parse_loci(
        embl_lines, segmented=segmented, broadcast_records=broadcast_records
    )
    if persist_intermediates:
        loci = loci.persist()
    resolved = resolve_uniprot_ids(loci, idmapping, broadcast_mapping)
    return _project_ena_tab(resolved)


def _project_ena_tab(resolved: DataFrame) -> DataFrame:
    """O1+O2: one output row per resolved uniprot id, reference column
    order (parse_embl.py:255)."""
    return resolved.select(
        "file",
        "ena_id",
        F.explode("resolved_uniprot_ids").alias("uniprot_id"),
        "locus_num",
        "chr_struct",
        "direction",
        "start",
        "end",
    ).select("file", *ENA_TAB_COLUMNS)


def build_all(
    embl_lines: DataFrame,
    idmapping: DataFrame,
    broadcast_mapping: bool = False,
    broadcast_records: bool = False,
) -> EnaBuildResult:
    """Run the pipeline and expose dead-letter channels (SURVEY.md §4.3:
    the reference print-and-skips malformed rows; we surface them as
    filterable DataFrames instead).

    The segmented line table is persisted because the result's channels
    are consumed as separate actions; call
    ``result.records.sparkSession.catalog.clearCache()`` (or unpersist)
    when done with a long-lived session.
    """
    segmented = S.segment_lines(embl_lines).persist()
    records = S.extract_records(segmented)
    loci = parse_loci(
        embl_lines, segmented=segmented, broadcast_records=broadcast_records
    )
    resolved = resolve_uniprot_ids(loci, idmapping, broadcast_mapping)
    ena_tab = _project_ena_tab(resolved)

    rejected_records = records.where(F.col("reject_reason").isNotNull()).select(
        "file", "record_idx", "reject_reason"
    )
    blocks = S.extract_cds_blocks(segmented)
    rejected_blocks = (
        blocks.withColumn("loc_str", E.cds_location_string(F.col("loc_parts")))
        # dead-letter gate only asks "no x..y range at all" — the
        # pattern-match predicate, not the full parse (locations.has_range
        # is pinned equivalent to size(location_ranges(s)) == 0 negated)
        .where(~has_range(F.col("loc_str")))
        .select(
            "file",
            "record_idx",
            "block_idx",
            F.lit("unparseable_cds_location").alias("reject_reason"),
        )
    )
    return EnaBuildResult(records, loci, ena_tab, rejected_records, rejected_blocks)
