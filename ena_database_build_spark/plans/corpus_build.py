"""End-to-end training-corpus construction: the full curation flow a
pre-training data team runs, composed from the tested operators —
score -> percentile quality gate -> exact + near dedup ->
decontaminate against the eval split -> split -> shuffle/shard.

Each stage is the scale-shaped operator documented in its own module;
this plan only decides the composition order and what crosses each
stage boundary:

* the quality gate ranks a NARROW (id, quality) projection and
  semi-joins the winners back, so document text never rides the
  rank shuffle;
* dedup runs exact-first (cheap fingerprint groupBy halves the
  near-dedup's candidate volume), then banded MinHash/Jaccard/CC;
* decontamination drops train docs sharing k-grams with the eval
  split (the report operator's ids anti-join the train side);
* ordering is a deterministic hash shuffle + round-robin sharding,
  a pure function of (seed, id) — reproducible across retries.

Everything stays one lazy lineage per output; nothing collects to the
driver except fixpoint/centroid scalars inside the reused operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ena_database_build_spark.operators import textstats as T
from ena_database_build_spark.operators.cc import near_dedup
from ena_database_build_spark.operators.curation import decontaminate
from ena_database_build_spark.operators.dedup import exact_dedup
from ena_database_build_spark.operators.packing import with_token_counts
from ena_database_build_spark.operators.quantiles import quantile_gate
from ena_database_build_spark.operators.sampling import (
    global_shuffle,
    train_test_split,
)


@dataclass
class CorpusBuildResult:
    """Every channel still lazy; materialize what you need."""

    gated: DataFrame       # docs past the quality gate
    deduped: DataFrame     # after exact + near dedup
    train: DataFrame       # decontaminated train split
    test: DataFrame        # held-out split
    ordered: DataFrame     # train ids with (global_pos, shard_id, shard_pos)
    stats: DataFrame       # per-(source, split) doc/token counts


def build_training_corpus(
    docs: DataFrame,
    quality_quantile: float = 0.1,
    near_dup_threshold: float = 0.8,
    decon_k: int = 5,
    test_fraction: float = 0.1,
    n_shards: int = 8,
    seed: str = "corpus",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> CorpusBuildResult:
    """Run the full curation flow over ``docs`` (needs ``id``, ``text``
    and optionally ``source`` columns).  Deterministic end to end: the
    same input produces the same corpus, splits, and training order on
    any partitioning."""
    scored = docs.select(
        F.col(id_col),
        F.round(T.quality_score(F.col(text_col)), 6).alias("_q"),
    )
    winners = quantile_gate(
        scored, "_q", q=quality_quantile, id_col=id_col, bucket_width=0.05
    ).select(id_col)
    gated = docs.join(winners, id_col, "left_semi")

    deduped = near_dedup(
        exact_dedup(gated, text_col=text_col, id_col=id_col),
        text_col=text_col,
        id_col=id_col,
        threshold=near_dup_threshold,
    )

    split = train_test_split(
        deduped, test_fraction=test_fraction, id_col=id_col, seed=seed
    )
    test = split.where(F.col("split") == "test").drop("split")
    # bloom_prefilter: the exact contamination join runs only on train
    # shingles the eval-side Bloom filter can't rule out — provably
    # the same result (no false negatives), train-shuffle shrunk to
    # near the true overlap at corpus scale
    contaminated = decontaminate(
        deduped,
        k=decon_k,
        eval_fraction=test_fraction,
        seed=seed,
        text_col=text_col,
        id_col=id_col,
        bloom_prefilter=True,
    ).select(id_col)
    train = (
        split.where(F.col("split") == "train")
        .drop("split")
        .join(contaminated, id_col, "left_anti")
    )

    ordered = global_shuffle(train, n_shards=n_shards, id_col=id_col, seed=seed)

    src = (
        F.col("source") if "source" in docs.columns else F.lit("all")
    ).alias("source")
    counted = with_token_counts(split, text_col=text_col, id_col=id_col)
    stats = counted.select(src, "split", "n_tokens").groupBy(
        "source", "split"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    return CorpusBuildResult(gated, deduped, train, test, ordered, stats)
