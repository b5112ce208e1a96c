"""Deterministic sampling for training-data pipelines.

``df.sample()`` is partition-order-dependent and unrepeatable across
retries/engines — useless for reproducible corpus construction.  These
operators derive every decision from ``md5(seed || id)``, so a sample
is a pure function of the row, stable under re-partitioning, task
retry, incremental re-runs, and even engine swaps (any md5 agrees):

* :func:`hash_sample` — Bernoulli-style p-sample, one stateless map
  pass, no count/shuffle.  The threshold is compared as a lowercase
  HEX STRING (first 8 digest chars vs ``format(p * 16^8, '08x')``) —
  lexicographic hex order == numeric order, so no engine-specific
  hex-to-int conversion can disagree.
* :func:`train_test_split` — disjoint labeled buckets from the same
  hash axis; a row's split never changes as the corpus grows.
* :func:`stratified_sample` — exactly ``n`` rows per stratum, winners
  = lowest hash (one window pass over the stratum partitioning).  The
  per-stratum sort is the inherent cost of exact-n semantics; for
  proportional sampling at scale prefer :func:`hash_sample`, which
  needs no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    # fraction >= 1 would format to 9 hex digits ('100000000'), which
    # BREAKS the fixed-width lexicographic compare (most hashes sort
    # above '1...' and get dropped).  'g' sorts after every hex digit,
    # so this threshold keeps all rows.
    if fraction >= 1.0:
        return "gggggggg"
    # Clamp to 16^8 - 1: fractions just below 1.0 (e.g. 1 - 2**-53)
    # would otherwise round up to 16^8 and format as 9 hex digits,
    # breaking the fixed-width compare the 'g' branch exists to avoid.
    return format(min(max(int(fraction * (16**8)), 0), 16**8 - 1), "08x")


def sample_hash(id_col: Column, seed: str = "") -> Column:
    """First 8 hex chars of md5(seed || '|' || id) — the sampling axis."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string"))), 1, 8
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """~``fraction`` of rows, chosen deterministically by content of
    ``id_col`` alone."""
    return df.where(
        sample_hash(F.col(id_col), seed) < F.lit(_hex_threshold(fraction))
    )


def hash_sample_weighted(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Per-row-probability Bernoulli sample: each row is kept with
    probability ``clamp(weight, 0, 1)`` — deterministically, as a pure
    function of ``(seed, id)``, like :func:`hash_sample`.

    The curation use case: quality-weighted corpus sampling (keep
    high-quality documents with probability ~1, dubious ones at their
    score), reproducible across retries, re-partitioning, and
    incremental re-runs.  One stateless map pass, no shuffle.

    The fixed hex threshold of :func:`hash_sample` can't vary per row,
    so the comparison here is numeric: the first 8 hash hex digits
    parse to a long (uniform on [0, 16^8)) and compare against
    ``weight * 16^8``.  Rows keep exactly when
    ``hash_long < weight * 16^8`` — weight >= 1 keeps always,
    weight <= 0 (or NULL) never."""
    u = F.conv(sample_hash(F.col(id_col), seed), 16, 10).cast("long")
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0)
    )
    return df.where(u < w * F.lit(float(16**8)))


def exact_n_sample(
    df: DataFrame, n: int, id_col: str = "doc_id", seed: str = ""
) -> DataFrame:
    """Exactly ``min(n, |df|)`` rows, deterministically: the ``n``
    lowest points on the hash axis.  ``orderBy(hash).limit(n)``
    compiles to TakeOrderedAndProject — a per-partition top-n heap plus
    a driver merge of n rows per partition, never a global sort — so
    this is the scale-safe global counterpart of
    :func:`stratified_sample`'s per-stratum window."""
    return (
        df.withColumn("_h", sample_hash(F.col(id_col), seed))
        .orderBy("_h", id_col)
        .limit(n)
        .drop("_h")
    )


def train_test_split(
    df: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split`` = 'test' for the lowest ``test_fraction`` of the
    hash axis, else 'train'.  Disjoint, exhaustive, growth-stable."""
    return df.withColumn(
        split_col,
        F.when(
            sample_hash(F.col(id_col), seed)
            < F.lit(_hex_threshold(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic corpus shuffle + round-robin shard assignment —
    the "shuffle then shard" step of training-order construction, as a
    pure function of ``(seed, id)``.

    ``global_pos`` is the row's rank in ``md5(seed || id)`` order —
    the shuffled training order.  ``shard_id = global_pos % n_shards``
    and ``shard_pos = global_pos div n_shards`` round-robin that order
    into ``n_shards`` exactly balanced output shards that interleave
    the shuffled stream (reading shard files in step reproduces it).

    The global rank deliberately NEVER uses a global-order window
    (single-partition at scale).  Same two-phase distributed prefix
    sum as :func:`packing.pack_sequences`: the hash's first four hex
    digits form 65,536 contiguous uniform ranges (deep enough that a
    100 B-row corpus still sorts ~1.5 M rows per task, while the
    offset side stays a few-MB broadcast; any prefix depth yields the
    IDENTICAL ranks, because bucket order concatenated equals global
    hash order); a per-bucket ``row_number`` plus an exclusive prefix
    sum over the populated-bucket counts (tiny, broadcast back) IS
    the exact global rank.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    # NULL ids are excluded: a NULL hash would sort into a NULL bucket
    # ahead of every real bucket in the offsets prefix sum (shifting
    # every rank up) while its own rows fell out of the inner join.
    # Ids are the shuffle identity; rows without one have no position.
    base = (
        df.select(F.col(id_col), sample_hash(F.col(id_col), seed).alias("_h"))
        .where(F.col("_h").isNotNull())
        .withColumn("_bucket", F.substring("_h", 1, 4))
    )
    w_local = Window.partitionBy("_bucket").orderBy("_h", id_col)
    local = base.withColumn("_rn", F.row_number().over(w_local))
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= 65,536 count rows — single-partition here stays tiny
    offsets = (
        base.groupBy("_bucket")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
        .select("_bucket", "_off")
    )
    pos = local.join(F.broadcast(offsets), "_bucket").select(
        F.col(id_col),
        (F.col("_off") + F.col("_rn") - 1).cast("long").alias("global_pos"),
    )
    return pos.select(
        id_col,
        "global_pos",
        (F.col("global_pos") % n_shards).alias("shard_id"),
        F.expr(f"global_pos div {n_shards}").alias("shard_pos"),
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum — the lowest-hash
    winners, deterministic and partition-independent."""
    w = Window.partitionBy(*strata).orderBy(
        sample_hash(F.col(id_col), seed), id_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): rank every row by ``ln(u) / w`` with ``u`` the row's
    deterministic (seed, id)-hash uniform, keep the top ``n`` —
    exactly the distribution of sequential weighted draws without
    replacement, but embarrassingly parallel (each row's key is
    independent; the selection is one top-n).

    Deterministic end to end: ``u`` comes from the md5 hash axis every
    sampler here uses, so the same corpus yields the same sample on
    any partitioning — and an oracle can recompute the identical
    ranking.  Rows with NULL, zero, or negative weight never qualify
    (they'd have key -inf).  The top-n is Spark's
    TakeOrderedAndProject (per-partition heads + one merge), not a
    global sort."""
    u = (
        F.conv(sample_hash(F.col(id_col), seed), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**8 + 1))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        df.where(w.isNotNull() & (w > 0) & F.col(id_col).isNotNull())
        .withColumn("_es_key", key)
        .orderBy(F.desc("_es_key"), id_col)
        .limit(n)
        .drop("_es_key")
    )


def weighted_sample_n_by(
    df: DataFrame,
    n: int,
    weight_col: str,
    by: list[str],
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Stratified A-ES: :func:`weighted_sample_n` independently within
    every ``by`` group — n weighted draws without replacement per
    stratum (the per-source curation quota, but weighted).  Same
    deterministic ln(u)/w key; the global top-n becomes one
    row_number window over the group partitioning, so the whole
    sample is a single shuffle keyed by the strata."""
    from pyspark.sql import Window

    u = (
        F.conv(sample_hash(F.col(id_col), seed), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**8 + 1))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    win = Window.partitionBy(*by).orderBy(
        F.desc("_es_key"), id_col
    )
    return (
        df.where(w.isNotNull() & (w > 0) & F.col(id_col).isNotNull())
        .withColumn("_es_key", key)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= n)
        .drop("_es_key", "_rn")
    )


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based group rebalancing (the XLM-R / mC4
    multilingual sampling scheme): languages (or any group) are kept
    at rates proportional to ``p_group^(alpha-1)``, flattening the
    head of the distribution toward the tail — ``alpha = 1`` keeps
    everything, ``alpha -> 0`` approaches uniform-over-groups.

    Downsampling-only formulation: ``rate_g = (n_g / n_min)^(alpha-1)``
    (the rarest group keeps everything, larger groups shed), applied
    as a deterministic per-row Bernoulli on the md5 hash axis — the
    same reproducibility contract as every sampler here: re-runs,
    re-partitions, and engine swaps agree row-for-row.

    NULL groups pass through unchanged (no group identity to
    rebalance by — :func:`grouped_split`'s NULL policy): they are
    excluded from the group counts, so a small NULL cohort can never
    become ``n_min`` and inflate every real group's shed rate.

    Scale shape: one map-side-combinable group count (rows = #groups),
    a 1-row min broadcast, a broadcast join of the #groups rate table
    onto the corpus, and a stateless filter — the corpus itself never
    shuffles."""
    counts = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count("*").alias("_n"))
    )
    mn = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        group_col,
        "_n",
        F.least(
            F.lit(1.0),
            F.pow(
                F.col("_n").cast("double") / F.col("_nmin"),
                F.lit(alpha - 1.0),
            ),
        ).alias("_rate"),
    )
    u = F.conv(sample_hash(F.col(id_col), seed), 16, 10).cast("long")
    return (
        df.join(F.broadcast(rates), group_col, "left")
        .where(
            F.col(group_col).isNull()
            | (u < F.col("_rate") * F.lit(float(16**8)))
        )
        .drop("_n", "_rate")
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.1,
    seed: str = "gsplit",
) -> DataFrame:
    """Leakage-free train/test split: the hash decision is a function
    of the GROUP (user, session, document family), never the row, so
    every row of a group lands in the same split — the property that
    keeps a user's test events from leaking into training, which a
    row-hashed split silently violates.  Same md5 axis and
    determinism contract as :func:`hash_sample`; NULL groups go to
    'train' (no identity to leak by).  Adds a ``split`` column."""
    is_test = sample_hash(F.col(group_col), seed) < F.lit(
        _hex_threshold(test_fraction)
    )
    return df.withColumn(
        "split",
        F.when(
            F.col(group_col).isNotNull() & is_test, F.lit("test")
        ).otherwise(F.lit("train")),
    )
