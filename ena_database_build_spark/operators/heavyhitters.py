"""Exact distributed heavy hitters (frequent items) via the two-pass
Misra-Gries pattern (SURVEY.md §2.11 extension surface — corpus-level
frequency analysis for LLM training-data pipelines: stopword discovery,
boilerplate-token detection, vocabulary pruning).

Why not ``groupBy(item).count()`` alone?  At 100 TB the item column
(tokens, URLs, n-grams) can have billions of distinct values — a full
count shuffles one row per DISTINCT item just to discard almost all of
them.  The classical fix is a two-pass plan whose shuffle volume is
independent of the distinct count:

* **Pass 1 (candidates):** each partition builds a Misra-Gries summary
  of capacity ``k`` — a mergeable sketch (Agarwal et al., *Mergeable
  Summaries*, PODS'12) whose per-partition undercount is at most
  ``n_p/(k+1)``.  Summing over partitions, any item with global
  frequency > ``n/(k+1)`` has a positive residual in at least one
  partition, so the UNION of per-partition survivor sets is a
  guaranteed superset of the true heavy hitters.  The pass is
  ``mapInPandas`` (Arrow-batched, vectorized ``value_counts`` per
  batch) and emits at most ``k`` candidate rows plus one total-count
  row per partition — a few KB per task, no shuffle of the data.
* **Pass 2 (exact counts):** a broadcast left-semi join keeps only
  candidate rows, then an ordinary hash aggregation counts them
  exactly and keeps ``freq * (k+1) > n``.  The shuffle now carries at
  most ``partitions × k`` distinct keys instead of the full vocabulary.

The result is EXACT — identical to the naive global count-and-filter —
which is what makes it oracle-checkable; the sketch only bounds the
*candidate* set.  NULL items are excluded (callers filter; the pass-1
scan also drops them defensively), consistent with the NULL-identity
conventions in ``dedup``/``sampling``.

No reference citation: the reference pipeline
(/root/reference/ena_build) has no frequency-analysis layer; this is
§2.11 extension surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PASS1_SCHEMA = "item string, wt long"


def _mg_reduce(counts: dict, k: int) -> dict:
    """Shrink a merged counter to at most ``k`` entries by subtracting
    the (k+1)-th largest value from every entry and dropping the
    non-positive remainder — the Mergeable-Summaries reduction, which
    preserves the ``undercount <= n/(k+1)`` bound."""
    if len(counts) <= k:
        return counts
    m = sorted(counts.values(), reverse=True)[k]
    return {item: c - m for item, c in counts.items() if c > m}


def misra_gries_partials(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries.

    Returns a tiny DataFrame with two row kinds:

    * ``item IS NOT NULL`` — a candidate item (at most ``k`` per
      partition); ``wt`` is its residual sketch count (diagnostic
      only — pass 2 recounts exactly).
    * ``item IS NULL`` — one per partition; ``wt`` is the partition's
      non-NULL row count, so the global ``n`` comes out of the same
      single scan.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n = 0
        for pdf in batches:
            col = pdf[item_col].dropna()
            n += len(col)
            # vectorized per-batch exact counts, then one sketch merge
            for item, w in col.value_counts().items():
                counts[item] = counts.get(item, 0) + int(w)
            counts = _mg_reduce(counts, k)
        out = pd.DataFrame(
            {
                "item": list(counts.keys()) + [None],
                "wt": [int(c) for c in counts.values()] + [n],
            }
        )
        yield out.astype({"item": object, "wt": "int64"})

    return df.select(F.col(item_col)).mapInPandas(part, _PASS1_SCHEMA)


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Exact items with frequency strictly greater than ``n/(k+1)``
    (``n`` = non-NULL rows), as ``(item, freq)``.

    Equivalent to ``SELECT item, count(*) FROM df GROUP BY item HAVING
    count(*) * (k+1) > n`` — but the aggregation only ever sees the
    sketch-certified candidate superset, so shuffle volume is bounded
    by ``partitions × k`` keys, not the distinct-item count.
    """
    partials = misra_gries_partials(df, item_col, k)
    # Both derivatives of pass 1 are tiny; localCheckpoint would also
    # work, but the partials relation is cheap enough to recompute and
    # keeping it lazy preserves one lineage for retries.
    cands = (
        partials.where(F.col("item").isNotNull())
        .select(F.col("item").alias("_hh_cand"))
        .distinct()
    )
    total = partials.where(F.col("item").isNull()).agg(
        F.sum("wt").alias("_n")
    )
    exact = (
        df.where(F.col(item_col).isNotNull())
        .join(
            F.broadcast(cands),
            F.col(item_col) == F.col("_hh_cand"),
            "left_semi",
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count("*").alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("freq") * (k + 1) > F.col("_n"))
        .select("item", "freq")
    )
