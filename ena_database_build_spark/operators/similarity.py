"""Similarity search over embedding columns (SURVEY.md §2.11).

The embedding column is ``ARRAY<FLOAT>``; all math happens in JVM
higher-order functions (``aggregate``/``zip_with``) — no Python in the
hot path.

Scale path:

* ``cosine_topk`` — brute force: one map-side pass + a global top-k
  (``orderBy ... limit k`` compiles to TakeOrderedAndProject: per
  partition heap + driver merge of k rows per partition, never a full
  sort/shuffle of the corpus).
* ``srp_bucket_topk`` — signed-random-projection LSH: each vector maps
  to a small bit-bucket; the query probes only its own bucket, so the
  scan cost drops by ~2^bits.  Hyperplanes are derived deterministically
  from md5 so results are reproducible run to run and across engines.
* For repeated query workloads, materialize ``srp_buckets`` once
  (bucketed/partitioned by ``bucket``) and every probe becomes a
  partition-pruned scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def _srp_plane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is +1/-1 by
    the parity of the first byte of md5('{plane}|{d}')."""
    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane_idx}|{d}".encode()).digest()[0]
        comps.append(1.0 if h % 2 == 0 else -1.0)
    return comps


def srp_buckets(
    df: DataFrame,
    dim: int,
    bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector a ``bits``-char sign bucket (e.g. ``'1010'``)."""
    v = F.col(vec_col).cast("array<double>")
    bit_cols = []
    for p in range(bits):
        plane = F.array(*[F.lit(c) for c in _srp_plane(p, dim)])
        bit_cols.append(F.when(dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.col(vec_col), F.concat(*bit_cols).alias("bucket"))


def probe_buckets(bucket: str, probe_bits: int = 1) -> list[str]:
    """The multiprobe set of an SRP bucket: the bucket itself plus all
    buckets within Hamming distance ``probe_bits`` (driver-side — the
    bucket strings are tiny).  1-bit probes recover the near-misses a
    vector close to one hyperplane causes, the standard recall fix for
    sign-LSH without widening every bucket."""
    probes = {bucket}
    frontier = {bucket}
    for _ in range(probe_bits):
        frontier = {
            b[:i] + ("0" if b[i] == "1" else "1") + b[i + 1 :]
            for b in frontier
            for i in range(len(b))
        } - probes
        probes |= frontier
    return sorted(probes)


def probe_buckets_col(bucket_col: Column, bits: int) -> Column:
    """Column form of 1-bit multiprobe: ARRAY of the bucket and its
    ``bits`` single-bit flips — for expanding a corpus-side bucket
    column (e.g. the near-dup candidate join) where the bucket value is
    per-row, not a driver constant."""
    probes = [bucket_col]
    for i in range(bits):
        probes.append(
            F.concat(
                F.substring(bucket_col, 1, i),
                F.when(
                    F.substring(bucket_col, i + 1, 1) == "1", "0"
                ).otherwise("1"),
                F.substring(bucket_col, i + 2, bits - i - 1),
            )
        )
    return F.array(*probes)


def srp_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket
    — plus, with ``probe_bits`` > 0, every bucket within that Hamming
    distance (multiprobe: scan cost grows by the probe count, recall
    recovers vectors that fell across one near-zero hyperplane)."""
    q_bucket = "".join(
        "1" if sum(q * c for q, c in zip(query_vec, _srp_plane(p, dim))) >= 0 else "0"
        for p in range(bits)
    )
    bucketed = srp_buckets(df, dim, bits, vec_col, id_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    targets = probe_buckets(q_bucket, probe_bits)
    return (
        bucketed.where(F.col("bucket").isin(targets))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def srp_cosine_pairs(
    df: DataFrame,
    dim: int,
    bits: int = 4,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: int | str = 1,
    target_rows_per_task: int = 65536,
) -> DataFrame:
    """All pairs with cosine >= ``threshold`` whose SRP buckets are
    within Hamming distance 1 (the 1-bit multiprobe recall fix), in
    canonical ``left_id < right_id`` orientation.

    Scale shape — this is the embedding near-dup candidate+verify
    kernel, so the expensive part is scoring, and scoring is done as
    ONE BLAS matrix multiply per bucket via a cogrouped
    ``applyInPandas``:

    * both sides ship their vectors ONCE per probe bucket (the left
      side explodes to its <= ``bits``+1 probes), never the expanded
      candidate-pair relation — at 1-bit probes that is a ~bucket-size
      reduction in shuffled bytes versus joining pairs first and
      scoring row-at-a-time;
    * within a bucket the score matrix is ``Ln @ Rn.T`` on unit-
      normalized rows — vectorized C, not an interpreted per-element
      fold (measured 8-10x faster than the ``aggregate``/``zip_with``
      column form on 630k candidates at sf0.1);
    * a bucket is one whole task (cogrouped groups cannot be split by
      AQE), so parallelism AND the densest bucket are both governed by
      ``bits`` — size ``2**bits`` to the corpus so buckets stay
      bounded, exactly the SemDeDup ``k ~ sqrt(n)`` discipline; the
      block loop below caps the score-matrix memory either way, and
      nothing driver-side ever sees a vector;
    * ``salt`` is the straggler escape hatch for a HOT bucket (r6
      verdict #3): with ``salt=S`` the left side splits into S
      deterministic sub-groups per probe bucket (``crc32(id) % S``)
      while the right side ships S copies — left vectors still move
      once, right shuffle bytes grow Sx, and the densest task shrinks
      ~Sx in wall time.  A (left, right) pair lands in exactly one
      (probe, salt) group, so the output is identical to the unsalted
      form (parity-pinned in tests).  ``salt="auto"`` probes the
      bucket histogram first (<= 2**bits + handful rows, driver-safe
      by construction) and picks ``ceil(max_bucket /
      target_rows_per_task)``, so callers need no prior knowledge of
      the skew; the probe costs one extra small aggregation job over
      the bucketed projection.

    A (left, right) pair can match in at most one probe bucket (the
    right row's bucket fixes which left probe equals it), so the
    output carries no cross-bucket duplicates by construction.

    Vector contract: rows whose vector is NULL or whose length is not
    exactly ``dim`` are excluded before bucketing (the per-pair column
    form dropped cross-length pairs implicitly via NULL cosine; a
    ragged batch would crash ``np.stack`` outright, so the contract is
    made explicit).  All-zero vectors score nan and fall out of the
    threshold gate, matching the column form's NULL-comparison drop.

    Float caveat: BLAS sums products in SIMD-blocked order, not the
    left-to-right fold of the HOF ``cosine``; results can differ in
    the last ulp.  Callers that hash-compare scores should round
    (the catalog rounds to 6 decimals) or compare with a tolerance.
    """
    # validate BEFORE any salt==1 / salt>1 comparison: bool is an int
    # subclass and 1.0 == 1, so salt=True / salt=1.0 would otherwise
    # silently take the unsalted path instead of raising (r7 ADVICE)
    if salt != "auto" and not (
        isinstance(salt, int) and not isinstance(salt, bool) and salt >= 1
    ):
        raise ValueError(f"salt must be a positive int or 'auto', not {salt!r}")
    # same strict check for the auto-salt divisor (r8 ADVICE): 0 would
    # ZeroDivisionError inside the ceil-div and a negative value would
    # silently yield salt=1
    if not (
        isinstance(target_rows_per_task, int)
        and not isinstance(target_rows_per_task, bool)
        and target_rows_per_task >= 1
    ):
        raise ValueError(
            "target_rows_per_task must be a positive int, not "
            f"{target_rows_per_task!r}"
        )
    df = df.where(
        F.col(id_col).isNotNull()  # NULL ids would raise in the kernel
        & (F.size(vec_col) == dim)  # NULL/ragged vectors cannot pair
    )
    b = srp_buckets(df, dim, bits, vec_col, id_col)
    if salt == "auto":
        # the cogrouped left task is keyed on PROBE — the union of up
        # to bits+1 neighboring buckets — so size the salt from the
        # exploded probe histogram, not the raw bucket histogram
        # (which under-estimates the hottest task by up to (bits+1)x,
        # r7 ADVICE).  <= 2**bits output rows — driver-safe.
        hist = (
            b.select(
                F.explode(probe_buckets_col(F.col("bucket"), bits)).alias(
                    "probe"
                )
            )
            .groupBy("probe")
            .count()
            .agg(F.max("count"))
            .collect()
        )
        biggest = hist[0][0] or 0
        salt = max(1, -(-int(biggest) // int(target_rows_per_task)))
    left = b.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).cast("array<double>").alias("lv"),
        F.explode(probe_buckets_col(F.col("bucket"), bits)).alias("probe"),
    )
    right = b.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).cast("array<double>").alias("rv"),
        F.col("bucket").alias("rb"),
    )
    if salt > 1:
        left = left.withColumn(
            "_salt", F.pmod(F.crc32(F.col("left_id").cast("string")), salt)
        )
        right = right.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")),
        )
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"left_id {id_type}, right_id {id_type}, cos double"

    def score(l, r):
        import numpy as np
        import pandas as pd

        if l.empty or r.empty:
            return pd.DataFrame({"left_id": [], "right_id": [], "cos": []})
        err = np.errstate(invalid="ignore", divide="ignore")  # zero-norm -> nan
        with err:
            Ln = np.stack(l["lv"].to_numpy())
            Ln /= np.linalg.norm(Ln, axis=1, keepdims=True)
            Rn = np.stack(r["rv"].to_numpy())
            Rn /= np.linalg.norm(Rn, axis=1, keepdims=True)
        li = l["left_id"].to_numpy()
        ri = r["right_id"].to_numpy()
        outs = []
        # left-block loop caps score-matrix memory at block x |bucket|
        # so one skewed bucket cannot allocate |L| x |R| doubles
        for lo in range(0, len(Ln), 4096):
            S = Ln[lo : lo + 4096] @ Rn.T
            ii, jj = np.nonzero(
                (S >= threshold) & (li[lo : lo + 4096, None] < ri[None, :])
            )
            outs.append(
                pd.DataFrame(
                    {"left_id": li[lo:][ii], "right_id": ri[jj], "cos": S[ii, jj]}
                )
            )
        return pd.concat(outs, ignore_index=True)

    lkeys = ["probe", "_salt"] if salt > 1 else ["probe"]
    rkeys = ["rb", "_salt"] if salt > 1 else ["rb"]
    return (
        left.groupBy(*lkeys)
        .cogroup(right.groupBy(*rkeys))
        .applyInPandas(score, out_schema)
    )


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 10_000,
) -> DataFrame:
    """k nearest right-rows for every left-row (cross join + window).
    Quadratic — only for small/filtered inputs; the scale path is
    bucketing both sides with ``srp_buckets`` and joining on bucket.

    Guarded so the quadratic utility cannot be reached by accident at
    scale: raises unless BOTH sides count at most ``max_rows`` rows
    (an eager pre-count — acceptable for the small inputs this is
    for).  Callers that really want a larger cross product must opt
    in by raising ``max_rows`` explicitly."""
    from pyspark.sql import Window

    n_left, n_right = left.count(), right.count()
    if n_left > max_rows or n_right > max_rows:
        raise ValueError(
            f"knn_join_bruteforce is quadratic: inputs are "
            f"{n_left} x {n_right} rows but max_rows={max_rows}; "
            f"use srp_buckets/batch_cosine_topk at scale, or raise "
            f"max_rows explicitly to opt in"
        )
    l = left.select(F.col(id_col).alias("left_id"), F.col(vec_col).alias("lv"))
    r = right.select(F.col(id_col).alias("right_id"), F.col(vec_col).alias("rv"))
    scored = l.crossJoin(r).select(
        "left_id",
        "right_id",
        cosine(F.col("lv").cast("array<double>"), F.col("rv").cast("array<double>")).alias("cos_sim"),
    )
    w = Window.partitionBy("left_id").orderBy(F.desc("cos_sim"), "right_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("left_id", "right_id", "cos_sim", "rank")
    )


def jl_project(
    df: DataFrame,
    out_dim: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions using the same deterministic +/-1 hyperplanes as
    ``srp_buckets`` (Achlioptas-style sign projections, reproducible
    across engines and runs).  Pure ``aggregate``/``zip_with`` column
    math — one map pass, no shuffle, no UDF.  Components are UNSCALED
    dot products; distance-preserving scaling is 1/sqrt(out_dim),
    a constant factor downstream cosine ignores entirely."""
    v = F.col(vec_col).cast("array<double>")
    comps = [
        dot(
            v,
            F.array(*[F.lit(float(c)) for c in _srp_plane(p, dim)]),
        ).alias(f"proj_{p}")
        for p in range(out_dim)
    ]
    return df.select(F.col(id_col), *comps)


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of vectors per group (chunk-embedding ->
    document-embedding rollup), in LONG form ``(grp, dim, mean_val)``
    with 1-based dims.

    Relational on purpose: posexplode + partial-aggregated avg keyed by
    ``(grp, dim)`` — the shuffle carries per-dimension partial sums, so
    a document with millions of chunks is many small rows, never one
    giant buffered array (same discipline as kmeans' _mean_centroids).
    Reassemble to an array column only when the consumer needs it:
    ``sort_array(collect_list(struct(dim, mean_val)))``."""
    e = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim0", "val"
        ),
    )
    return (
        e.groupBy("grp", (F.col("dim0") + 1).alias("dim"))
        .agg(F.avg("val").alias("mean_val"))
    )


def batch_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batched exact serving: score EVERY query in ``queries`` against
    the corpus in one pass.  The query set broadcasts (a serving batch
    is bounded by construction); the crossJoin multiplies the corpus
    scan map-side by |Q| — no corpus shuffle — and the only exchange
    is the per-query top-k window over |corpus| x |Q| scored rows,
    which AQE sizes like any aggregation.  Scores are rounded BEFORE
    ranking so near-tie membership at the k boundary is engine-stable
    (same convention as cosine_topk).

    Returns ``(query_id, id, cos_sim, rank)`` rows, k per query."""
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(queries)).select(
        F.col(qid_col),
        F.col(id_col),
        F.round(
            cosine(F.col(vec_col).cast("array<double>"), F.col(qvec_col)),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def standardize_dims(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    ndigits: int = 6,
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding corpus —
    the feature-scaling pass before k-means / quantile bucketing /
    drift monitoring treats every dimension comparably.  Returns
    long-form ``(id, pos, z)`` rows.

    Engine-exact arithmetic (the embedding_meanpool discipline): each
    component is quantized to an integer (``round(x * scale)``) so the
    per-dimension sum and sum-of-squares are EXACT integers in any
    engine, and mean/variance/z each collapse to one deterministic
    IEEE double expression over those integers — no float-association
    drift between Spark's partial aggregation order and a sequential
    oracle.  A zero-variance dimension standardizes to ``z = 0.0``
    (the convention that keeps constant features from emitting
    NULL/inf into downstream distance math).

    Scale shape: one posexplode (map-only), one dimension-keyed
    map-side-combinable aggregation whose output is #dims rows, one
    broadcast join back — the corpus is scanned twice, shuffled
    never (the dim-stats exchange carries #dims rows)."""
    q = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.round(x * scale).cast("long"),
            )
        ).alias("pos", "_xq"),
    )
    stats = q.groupBy("pos").agg(
        F.count("*").alias("_n"),
        F.sum("_xq").alias("_s"),
        F.sum(F.col("_xq") * F.col("_xq")).alias("_sq"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    mean = s / n
    var = (F.col("_sq").cast("double") - s * s / n) / n
    z = F.when(
        var > 0,
        F.round((F.col("_xq").cast("double") - mean) / F.sqrt(var), ndigits),
    ).otherwise(F.lit(0.0))
    return (
        q.join(F.broadcast(stats), "pos")
        .select(F.col(id_col), F.col("pos"), z.alias("z"))
    )
