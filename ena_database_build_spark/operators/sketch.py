"""Approximate-membership sketches: a relational, engine-portable
Bloom filter.

The reference engine has no sketches (its only membership structure is
the in-memory ``idmapping`` dict, ``/root/reference/ena_build/
mysql_database.py:123-127``); this module extends the engine's
training-data-pipeline surface.  At 100 TB, exact eval-set
decontamination (:func:`~ena_database_build_spark.operators.curation.
decontaminate`) shuffles every distinct train shingle; a Bloom
pre-filter instead reduces the train side to the (tiny) flagged subset
before the exact join runs, at the cost of a bounded, *deterministic*
false-positive rate.

Determinism is the design constraint here: positions derive from md5
prefixes (not an engine-private hash), so ANY engine reproduces the
same filter bit-for-bit — including its false positives — which is
what makes a Bloom pass oracle-checkable rather than "approximately
right".  The bit space is a power of 16 so "mod n_bits" is a fixed-
width hex *substring*, never an integer conversion (the same trick as
:func:`~ena_database_build_spark.operators.sampling.sample_hash`).

Scale shape: the built filter is a one-column DataFrame of distinct
set bits, bounded by ``16**hex_chars`` rows REGARDLESS of input size
— always broadcastable (a 16^6 filter is at most ~16M 6-char strings;
a real deployment would fold it into a driver-side bitmap broadcast,
but the relational form keeps the probe a plain broadcast-hash
semi-join that AQE and codegen already optimize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    value: Column, n_hashes: int = 3, hex_chars: int = 3
) -> Column:
    """Array of ``n_hashes`` bit positions for ``value``, each a
    fixed-width hex string in a ``16**hex_chars``-bit space."""
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"bf{j}|"), value)), 1, hex_chars
            )
            for j in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    value_col: str = "value",
    n_hashes: int = 3,
    hex_chars: int = 3,
) -> DataFrame:
    """The filter: distinct set bits as a one-column ``(pos)``
    DataFrame.  One explode + one distinct; the distinct's shuffle
    carries at most ``16**hex_chars`` groups."""
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.explode(
                bloom_positions(F.col(value_col), n_hashes, hex_chars)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    value_col: str = "value",
    n_hashes: int = 3,
    hex_chars: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose ``value_col`` is (approximately) a member:
    ALL ``n_hashes`` positions are set.

    Probe shape: one broadcast LEFT SEMI join per hash function, each
    on its own position expression — every join is map-only against
    the same broadcast table, so the probe never shuffles OR explodes
    the big side (an explode+count formulation costs a 3x row blowup
    plus a groupBy shuffle for the same answer; measured ~2x slower
    at sf0.1).  AND-of-semi-joins is exactly "all positions set"."""
    out = df.where(F.col(value_col).isNotNull())
    bcast = F.broadcast(bits)
    for j in range(n_hashes):
        pos_j = F.substring(
            F.md5(F.concat(F.lit(f"bf{j}|"), F.col(value_col))),
            1,
            hex_chars,
        )
        out = out.join(bcast, pos_j == bits["pos"], "left_semi")
    return out


def bloom_decontaminate(
    df: DataFrame,
    k: int = 5,
    eval_fraction: float = 0.1,
    seed: str = "decon",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 3,
    hex_chars: int = 3,
) -> DataFrame:
    """Bloom-prefiltered benchmark-contamination report: train
    documents holding at least one word ``k``-gram whose positions are
    all set by the eval split's ``k``-grams.

    Output includes the filter's (deterministic) false positives — by
    construction a SUPERSET of the exact
    :func:`~ena_database_build_spark.operators.curation.decontaminate`
    doc set, so the exact join only ever needs to verify this small
    flagged subset.  Same split seed/axis as the exact operator, so
    the two compose.

    Returns one row per flagged train document:
    ``(doc_id, n_flagged_shingles)``.
    """
    from .dedup import shingle_rows
    from .sampling import train_test_split

    split = train_test_split(
        df, test_fraction=eval_fraction, id_col=id_col, seed=seed
    )
    train_sh = shingle_rows(
        split.where(F.col("split") == "train"),
        text_col=text_col,
        id_col=id_col,
        k=k,
        distinct=True,
    ).select(id_col, "shingle")
    eval_sh = shingle_rows(
        split.where(F.col("split") == "test"),
        text_col=text_col,
        id_col=id_col,
        k=k,
        distinct=True,
    )
    bits = bloom_build(
        eval_sh, value_col="shingle", n_hashes=n_hashes, hex_chars=hex_chars
    )
    flagged = bloom_probe(
        train_sh,
        bits,
        value_col="shingle",
        n_hashes=n_hashes,
        hex_chars=hex_chars,
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_flagged_shingles")
    )


def cms_positions(
    value: Column, n_hashes: int = 3, hex_chars: int = 3
) -> Column:
    """Count-min row positions for ``value``: one ``16**hex_chars``-
    wide counter row per hash function, md5-derived like
    :func:`bloom_positions` — any engine rebuilds the identical
    sketch, so its (over-)estimates are exactly checkable."""
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"cm{j}|"), value)), 1, hex_chars
            )
            for j in range(n_hashes)
        ]
    )


def cms_build(
    df: DataFrame,
    value_col: str = "value",
    n_hashes: int = 3,
    hex_chars: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """The sketch as a relation: ``(row_idx, pos, cnt)`` — at most
    ``n_hashes * 16**hex_chars`` rows regardless of input size (the
    count-min matrix in long form).  One posexplode + one
    map-side-combinable count; the aggregate's shuffle carries
    matrix-sized, not corpus-sized, data.

    ``weight_col`` (r13): build from pre-aggregated ``(value, n)``
    rows — each value contributes ``n`` instead of 1 to its counters.
    Because positions depend only on the VALUE, the weighted build
    over per-value counts is cell-identical to the unweighted build
    over the raw stream (``sum_over_values n[v] == count of
    occurrences`` per cell), while hashing each distinct value once
    instead of once per occurrence.

    CONTRACT (round-13 ADVICE #2): ``weight_col`` must hold exact
    non-negative integer COUNTS (a ``count(*)``-style aggregate of the
    stream this sketch stands in for).  NULL weights contribute 0 to
    their cells (the sum skips them) and fractional weights are
    truncated by the ``cast('long')`` — passing scores, rates or other
    non-count weights silently builds a sketch of something else.
    Callers that cannot guarantee the contract should aggregate to
    counts first (the cms_frequencies catalog row's shape)."""
    exploded = df.where(F.col(value_col).isNotNull()).select(
        F.posexplode(
            cms_positions(F.col(value_col), n_hashes, hex_chars)
        ).alias("row_idx", "pos"),
        *([F.col(weight_col)] if weight_col else []),
    )
    # coalesce(…, 0): keeps cnt non-nullable like count(*), so the
    # weighted sketch's schema (not just its cells) matches the
    # stream-built one
    agg = (
        F.coalesce(F.sum(weight_col).cast("long"), F.lit(0).cast("long"))
        if weight_col
        else F.count("*")
    )
    return exploded.groupBy("row_idx", "pos").agg(agg.alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    value_col: str = "value",
    n_hashes: int = 3,
    hex_chars: int = 3,
) -> DataFrame:
    """Point-frequency estimates for ``queries`` rows: min over each
    value's ``n_hashes`` counters — count-min's guarantee is
    ``estimate >= true`` with bounded overestimation.  The sketch
    broadcasts (bounded by the matrix size); the probe is a map-only
    join + a per-value min."""
    exploded = queries.where(F.col(value_col).isNotNull()).select(
        F.col(value_col),
        F.posexplode(
            cms_positions(F.col(value_col), n_hashes, hex_chars)
        ).alias("row_idx", "pos"),
    )
    return (
        exploded.join(F.broadcast(sketch), ["row_idx", "pos"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def kmv_estimate(
    df: DataFrame,
    value_col: str,
    by: list[str],
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count estimation per group:
    ``(by..., n_seen, est_distinct)``.

    KMV keeps each group's ``k`` smallest hash values; if the k-th
    smallest is the fraction ``t`` of the hash space, the group holds
    ~``(k-1)/t`` distinct values.  Unlike engine-private HLL
    registers, the md5 hash makes the sketch — and therefore the
    ESTIMATE — identical in any engine, so approximate cardinalities
    get exact oracle rows.  KMV sketches also merge (union the
    min-sets, re-take the k smallest), the same re-aggregation
    property the incremental-stats partials rely on.

    Shape: distinct (group, value) pairs -> one group-keyed window
    rank -> a group-sized aggregate.  Groups with fewer than ``k``
    distinct values report their EXACT count (every value is in the
    sketch)."""
    from pyspark.sql import Window

    h = F.substring(
        F.md5(F.concat(F.lit("kmv|"), F.col(value_col).cast("string"))),
        1,
        8,
    )
    pairs = (
        df.where(F.col(value_col).isNotNull())
        .select(*by, h.alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("_h")
    ranked = pairs.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    frac = (
        F.conv(F.max("_h"), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**8))
    n_seen = F.count("*")
    return ranked.groupBy(*by).agg(
        n_seen.alias("n_seen"),
        F.round(
            F.when(n_seen < k, n_seen.cast("double")).otherwise(
                (F.lit(float(k - 1))) / frac
            ),
            2,
        ).alias("est_distinct"),
    )
