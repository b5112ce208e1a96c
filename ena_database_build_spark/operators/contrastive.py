"""Contrastive training-pair mining (embedding-model data prep, §2.11
extension surface).

A bi-encoder trains on (anchor, positive, negative) triples; at corpus
scale the standard recipe is: positives = adjacent chunks of the same
document (local coherence), negatives = content from an unrelated
document chosen WITHOUT any similarity computation ("in-batch"-style
random negatives — here made deterministic).

Determinism is the design constraint (retry-safe pipelines): the
negative for each chunk is its SUCCESSOR ON A HASH RING — order all
chunks by (md5(seed|chunk_id), chunk_id) and take the next one.  A
hash order is equivalent to a uniform random pairing, but it is a pure
function of the corpus, so reruns and incremental builds emit the same
triples.

Scale shape: the ring is ordered WITHIN each 2-hex-digit hash bucket
(256 contiguous ranges), so the successor window partitions by bucket
— never a single-partition global sort.  Each bucket's LAST chunk has
no in-bucket successor and drops (≤256 of millions, documented); a
successor from the anchor's own document also drops (it would not be
a negative).  Positives ride the (doc, chunk_idx) partitioning the
chunker already produces.  Texts leave as md5 fingerprints so triple
rows stay narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ena_database_build_spark.operators.packing import chunk_documents
from ena_database_build_spark.operators.sampling import sample_hash


def contrastive_triples(
    df: DataFrame,
    size: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "neg",
) -> DataFrame:
    """``(chunk_id, anchor_fp, positive_fp, negative_fp)`` triples:
    positive = the document's next chunk, negative = the hash-ring
    successor from a different document."""
    ch = chunk_documents(
        df, size=size, stride=stride, text_col=text_col, id_col=id_col
    ).select(
        F.col(id_col),
        "chunk_idx",
        "chunk_text",
        F.concat_ws(
            "#", F.col(id_col).cast("string"), F.col("chunk_idx")
        ).alias("chunk_id"),
    )
    w_doc = Window.partitionBy(id_col).orderBy("chunk_idx")
    with_pos = ch.withColumn(
        "_pos_text", F.lead("chunk_text").over(w_doc)
    )
    h = sample_hash(F.col("chunk_id"), seed)
    ring = with_pos.withColumn("_h", h).withColumn(
        "_bucket", F.substring("_h", 1, 2)
    )
    w_ring = Window.partitionBy("_bucket").orderBy("_h", "chunk_id")
    ring = ring.withColumn(
        "_neg_text", F.lead("chunk_text").over(w_ring)
    ).withColumn("_neg_doc", F.lead(id_col).over(w_ring))
    return (
        ring.where(
            F.col("_pos_text").isNotNull()
            & F.col("_neg_text").isNotNull()
            & (F.col("_neg_doc") != F.col(id_col))
        )
        .select(
            "chunk_id",
            F.md5("chunk_text").alias("anchor_fp"),
            F.md5("_pos_text").alias("positive_fp"),
            F.md5("_neg_text").alias("negative_fp"),
        )
    )


def supervised_pairs(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    seed: str = "sup",
    bucket_hex: int = 2,
) -> DataFrame:
    """Supervised contrastive sampling over a labeled table:
    ``(id, positive_id, negative_id)`` with the positive the next
    SAME-label row on a per-label hash ring and the negative the next
    OTHER-label row on the bucketed global ring — the
    SupCon/triplet-loss pair builder, deterministic like everything
    else here.

    Shapes: the positive window partitions by (label, bucket) and the
    negative window by bucket alone — both bounded partitions, no
    global sort.  Rows whose ring successor is missing (bucket tail)
    or label-identical (for the negative) drop; with balanced labels
    that is a small, deterministic fraction.  ``bucket_hex`` sizes
    the ring partitions (16**bucket_hex buckets): small tables want 1
    hex digit so buckets stay dense enough to have successors; corpus
    scale wants 2+ so partitions stay bounded."""
    h = sample_hash(F.col(id_col).cast("string"), seed)
    base = (
        df.where(F.col(id_col).isNotNull() & F.col(label_col).isNotNull())
        .select(F.col(id_col), F.col(label_col))
        .withColumn("_h", h)
        .withColumn("_bucket", F.substring("_h", 1, bucket_hex))
    )
    w_pos = Window.partitionBy(label_col, "_bucket").orderBy(
        "_h", id_col
    )
    w_neg = Window.partitionBy("_bucket").orderBy("_h", id_col)
    out = (
        base.withColumn("_pos", F.lead(id_col).over(w_pos))
        .withColumn("_neg", F.lead(id_col).over(w_neg))
        .withColumn("_neg_label", F.lead(label_col).over(w_neg))
    )
    return (
        out.where(
            F.col("_pos").isNotNull()
            & F.col("_neg").isNotNull()
            & (F.col("_neg_label") != F.col(label_col))
        )
        .select(
            F.col(id_col),
            F.col(label_col),
            F.col("_pos").alias("positive_id"),
            F.col("_neg").alias("negative_id"),
        )
    )
