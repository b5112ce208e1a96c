"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), re-expressed relationally.

DSIR scores every raw document by how much more likely its hashed
n-gram features are under a TARGET distribution (e.g. high-quality or
in-domain text) than under the raw-corpus distribution; resampling by
that importance weight yields a target-like training set.  Both
feature models are smoothed bag-of-hashed-ngrams fit from the data
itself, so the whole method is three aggregations over one token
explode — no learned model, no Python in the hot path.

Scale shape (the part that must survive 100 TB):

* features (unigrams + bigrams) are composed MAP-SIDE from each
  document's token array (``transform`` over the bound array — the
  span_dedup discipline), so the only token-level shuffle is the
  ``(doc, bucket)`` count, which map-side combines down to at most
  ``16^hex_chars`` rows per document;
* the raw and target bucket models are ONE further aggregation of
  that same relation (the target flag rides along as a boolean); the
  ``(doc, bucket)`` counts are materialized once with a lazy
  ``localCheckpoint`` — the same band_index discipline as
  ``cc.near_dedup_incremental`` — because the model branch and the
  scoring branch cannot share the exchange through the broadcast
  boundary (measured: without it the token-level lineage re-executes
  from a second corpus scan), so the corpus is scanned exactly once;
* the fitted model is at most ``16^hex_chars`` rows — broadcast by
  construction, which is exactly why ``hex_chars`` is capped at 5
  (~1M rows) — and the corpus totals fold into a window over that
  bounded model, so scoring adds no shuffle beyond the per-doc sum.
  The checkpointed counts persist for the life of the returned
  DataFrame; Spark's ContextCleaner reclaims the blocks once the
  result is released (same lifetime as any cached intermediate).

The md5 bucket hash makes every weight engine-exact (the DuckDB
oracle reproduces it bit-for-bit), the repo-wide convention for
making approximate-by-nature methods oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ena_database_build_spark.operators.dedup import tokens


def _gram_array(text: Column) -> Column:
    """ARRAY<STRING> of salted unigram + bigram features, composed in
    place from the token array (bound once via the single-element
    ``array`` + ``transform`` trick so nothing re-tokenizes per
    element).  Empty tokens from blank text are filtered before
    pairing; docs with < 2 tokens contribute unigrams only."""
    return F.flatten(
        F.transform(
            F.array(F.filter(tokens(text), lambda t: t != "")),
            lambda tw: F.concat(
                F.transform(tw, lambda t: F.concat(F.lit("u|"), t)),
                F.when(
                    F.size(tw) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(tw) - 1),
                        lambda i: F.concat(
                            F.lit("b|"),
                            F.element_at(tw, i),
                            F.lit(" "),
                            F.element_at(tw, i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            ),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_col: str,
    hex_chars: int = 2,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance weight
    ``log p_target(features) - log p_raw(features)`` under
    add-``smoothing`` hashed-ngram models fit from ``df`` itself.

    ``target_col`` names a BOOLEAN column marking the target subset
    (callers encode their in-domain predicate there); the raw model is
    the whole input.  Buckets are the first ``hex_chars`` md5 hex
    chars of each salted feature, i.e. ``16**hex_chars`` buckets.

    Returns ``(id, n_grams, dsir_weight)`` for every document with at
    least one token; weights are summed log-ratios (the paper's form
    — longer docs move further from 0), rounded to 6 places.
    Documents with NULL/blank text have no features and are absent,
    the same no-content policy as the n-gram scorers.
    """
    # cap at 5 (16^5 = ~1M model rows): the scale argument REQUIRES the
    # fitted model to be broadcastable, and F.broadcast of a 16^8-row
    # relation would be a driver OOM, not a model
    if hex_chars < 1 or hex_chars > 5:
        raise ValueError(f"hex_chars must be in [1, 5], got {hex_chars}")
    if not smoothing > 0:
        raise ValueError(
            f"smoothing must be > 0 (a zero-count bucket would hit "
            f"log(0)), got {smoothing}"
        )
    m = float(16**hex_chars)
    lam = float(smoothing)
    # NULL target flags count as off-target (the raw model only), the
    # same coercion the catalog row applies to NULL lang
    base = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        F.coalesce(F.col(target_col), F.lit(False)).alias("_tgt"),
        F.explode(_gram_array(F.col(text_col))).alias("_gram"),
    )
    # (doc, bucket) occurrence counts: the ONLY token-level shuffle,
    # map-side combined to <= m rows per doc.  The target flag is
    # constant per doc so it rides in the key for free.
    db = (
        base.select(
            id_col,
            "_tgt",
            F.substring(F.md5("_gram"), 1, hex_chars).alias("_b"),
        )
        .groupBy(id_col, "_tgt", "_b")
        .agg(F.count("*").alias("_c"))
        # materialize once (lazily): model fit and scoring both consume
        # this relation, and the broadcast boundary between them
        # defeats exchange reuse — without this the explode + md5 +
        # count lineage runs twice from two corpus scans
        .localCheckpoint(eager=False)
    )
    model = db.groupBy("_b").agg(
        F.sum("_c").alias("_n_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(0)).alias("_n_tgt"),
    )
    # corpus totals as a global window OVER THE MODEL (<= m rows — the
    # repo's bounded-summary-relation pattern), NOT a separate
    # aggregate branch: a totals subtree re-derived the whole
    # token-level lineage from a second scan (a 1-row-broadcast
    # crossJoin nested in the scoring broadcast defeats exchange
    # reuse), while the window keeps the model single-lineage so the
    # corpus is scanned exactly once (pinned by test)
    w = Window.partitionBy()
    lr = model.select(
        "_b",
        (
            F.log(
                (F.col("_n_tgt") + lam)
                / (F.sum("_n_tgt").over(w) + lam * m)
            )
            - F.log(
                (F.col("_n_raw") + lam)
                / (F.sum("_n_raw").over(w) + lam * m)
            )
        ).alias("_lr"),
    )
    return (
        db.join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            F.round(F.sum(F.col("_c") * F.col("_lr")), 6).alias("dsir_weight"),
        )
    )
