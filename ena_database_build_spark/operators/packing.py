"""Training-batch construction operators: deterministic sequence
packing and source-mixture rebalancing (SURVEY.md §2.11 extension
surface).

Both are pure relational plans with deterministic, partition-
independent results — the properties a 100 TB pre-training corpus
build needs for retry-safety and incremental re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ena_database_build_spark.operators.dedup import tokens
from ena_database_build_spark.operators.sampling import sample_hash


def with_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Adds ``n_tokens`` (whitespace tokens of the normalized text) —
    one map pass, no shuffle.  No-content text (NULL, empty, or
    whitespace-only) counts 0 tokens: ``size(NULL)`` is -1 on pre-ANSI
    Spark (3.5) and NULL on 4.x, and ``split('')`` yields ``['']`` (a
    phantom token) — either corrupts downstream cumulative sums, and
    chunk_documents/dedup.fingerprint already treat such docs as
    empty."""
    text = F.col(text_col)
    toks = tokens(text)
    has_tokens = (F.size(toks) > 1) | (F.element_at(toks, 1) != F.lit(""))
    return df.withColumn(
        "n_tokens",
        F.when(text.isNull() | ~has_tokens, F.lit(0)).otherwise(
            F.size(toks)
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
) -> DataFrame:
    """Assign documents to training packs of ~``budget`` tokens.

    Documents are ordered by a deterministic content hash (so the
    packing is a pure function of the corpus, independent of partition
    layout or arrival order), then cut into bins by the running token
    total: a document lands in ``floor(cumsum_exclusive / budget)``.
    This is the scalable streaming approximation of first-fit packing:
    every pack except possibly the last holds ≥ ``budget`` - max_doc
    and < ``budget`` + max_doc tokens; exact first-fit is inherently
    sequential and cannot scale out.

    The global running sum is the classic two-phase distributed prefix
    sum — NEVER a global-order window, which Spark executes on a
    single partition.  The hash's first four hex digits define 65,536
    contiguous, uniformly-loaded hash ranges (a 100 B-doc corpus
    still cumsums ~1.5 M rows per task; the result is IDENTICAL for
    any prefix depth): phase 1 computes local cumulative sums per
    bucket (one window over the bucket partitioning); phase 2
    prefix-sums the populated-bucket totals (a windowed pass over at
    most 65,536 count rows) and broadcasts the offsets back.
    Concatenating buckets in order IS the global hash order, so
    ``offset + local_cumsum`` equals the exact global cumulative sum.

    Returns one row per pack: ``(pack_id, n_docs, n_tokens)``.
    """
    sized = (
        with_token_counts(df, text_col, id_col)
        .select(
            F.col(id_col),
            "n_tokens",
            sample_hash(F.col(id_col), seed).alias("_h"),
        )
        # a NULL id hashes to NULL -> NULL bucket, which would miss
        # the offsets join and surface as a phantom NULL pack; exclude
        # explicitly (ids are the packing identity — a NULL id has no
        # deterministic place in the order)
        .where(F.col("_h").isNotNull())
        .withColumn("_bucket", F.substring("_h", 1, 4))
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "_local_cum",
        F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)),
    )
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= 65,536 count rows — single-partition here stays tiny
    # bucket totals come from the WINDOWED frame (last row's exclusive
    # cumsum + own count), not from a second aggregation over `sized`:
    # aggregating `sized` directly builds a second physical subtree
    # whose scan + tokenization re-executes, while both consumers of
    # `local` share one exchange (ReusedExchange) — the tokenize map
    # pass runs once
    offsets = (
        local.groupBy("_bucket")
        .agg(
            F.max(F.col("_local_cum") + F.col("n_tokens")).alias("_btot")
        )
        .withColumn(
            "_offset", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
        )
        .select("_bucket", "_offset")
    )
    # LEFT join, not inner: an inner join infers isnotnull(_bucket)
    # and pushes it into the window branch's scan but leaves it above
    # the offsets branch's aggregate — the asymmetry makes the two
    # otherwise-identical bucket exchanges non-canonical-equal and
    # defeats ReusedExchange.  _bucket (an md5 substring) is never
    # null, so left == inner here, and with the left join both
    # branches share one exchange: the tokenize pass runs ONCE.
    packed = local.join(F.broadcast(offsets), "_bucket", "left").select(
        F.col(id_col),
        "n_tokens",
        ((F.col("_offset") + F.col("_local_cum")) / budget)
        .cast("long")
        .alias("pack_id"),
    )
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into training windows of
    ``size`` tokens starting every ``stride`` tokens (``stride`` <
    ``size`` gives overlapping context windows; default is
    non-overlapping).

    Chunk starts are ``0, stride, 2*stride, ...`` while the start lies
    inside the document, so every token is covered and the final chunk
    may be short.  The whole operator is a narrow per-row transform —
    tokenize once into a materialized array column (Catalyst does not
    CSE repeated calls inside HOF lambdas), ``sequence`` the starts,
    ``posexplode``, ``slice`` — so it pipelines into the scan with NO
    shuffle at any scale; output size is input tokens × size/stride.

    Returns ``(id, chunk_idx, start, n_tokens, chunk_text)``.
    """
    if stride is None:
        stride = size
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    sized = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        # split('') yields [''] (size 1, never 0), so "has tokens" is
        # "more than one element, or a non-empty first element" —
        # a plain _n > 0 is dead code and would emit a phantom chunk
        # with one nonexistent token for every empty/whitespace doc
        .where((F.col("_n") > 1) | (F.element_at("_toks", 1) != ""))
    )
    chunks = sized.select(
        F.col(id_col),
        "_toks",
        "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_start").cast("long").alias("start"),
        F.least(F.lit(size), F.col("_n") - F.col("_start"))
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("_toks", F.col("_start") + 1, F.lit(size))
        ).alias("chunk_text"),
    )


def mixture_rebalance(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Thin each source to approach a target token mixture.

    ``weights`` maps source -> target share (normalized internally).
    The feasible corpus is anchored by the most over-subscribed source:
    every source keeps
    ``fraction_s = min(1, target_share_s * T / tokens_s)`` where ``T``
    is the largest total corpus size for which no source needs more
    tokens than it has.  Thinning is the deterministic md5-hash
    Bernoulli (:mod:`sampling`), so reruns and incremental builds keep
    identical rows.

    Returns per-source accounting:
    ``(source, total_tokens, kept_docs, kept_tokens, keep_fraction)``.

    Shape: two token-counting map passes (one feeding the per-source
    totals, one feeding the filtered aggregation — separate lazy
    consumers with no shared exchange to reuse), plus the #sources-row
    aggregations broadcast back.  No large shuffle: the only exchanges
    carry #sources rows.
    """
    total = sum(weights.values())
    shares = {s: v / total for s, v in weights.items()}
    sized = with_token_counts(df, text_col, id_col).select(
        F.col(id_col), F.col(source_col), "n_tokens"
    )
    per_source = (
        sized.where(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    )
    share_col = F.create_map(
        *[x for s, v in shares.items() for x in (F.lit(s), F.lit(v))]
    )
    # T = min over sources of tokens_s / share_s — the largest feasible
    # corpus size; computed from the #sources-row aggregate, so the
    # min is a 1-row broadcast, not a second corpus pass
    feasible = per_source.select(
        F.min(
            F.col("total_tokens") / share_col[F.col(source_col)]
        ).alias("_T")
    )
    fractions = per_source.join(F.broadcast(feasible)).select(
        source_col,
        "total_tokens",
        F.least(
            F.lit(1.0),
            share_col[F.col(source_col)]
            * F.col("_T")
            / F.col("total_tokens"),
        ).alias("keep_fraction"),
    )
    # hex-STRING threshold comparison, the same engine-portable axis as
    # hash_sample: format the per-source fraction as an 8-hex-digit
    # string and compare lexicographically (== numerically for fixed
    # width).  fraction >= 1 keeps everything (its threshold would need
    # 9 digits and break the fixed-width comparison).
    threshold = F.lpad(
        F.hex(
            F.floor(F.col("keep_fraction") * F.lit(float(16**8))).cast(
                "bigint"
            )
        ),
        8,
        "0",
    )
    kept = (
        sized.join(F.broadcast(fractions), source_col)
        .where(
            (F.col("keep_fraction") >= 1.0)
            | (sample_hash(F.col(id_col), seed) < F.lower(threshold))
        )
        .groupBy(source_col)
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
    )
    return (
        fractions.join(kept, source_col, "left")
        .select(
            source_col,
            "total_tokens",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            F.round("keep_fraction", 6).alias("keep_fraction"),
        )
    )


def span_corruption(
    df: DataFrame,
    mask_hex: str = "26666666",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "sc",
) -> DataFrame:
    """T5/UL2-style span corruption, fully deterministic: tokens whose
    md5(seed|doc|pos) prefix sorts under ``mask_hex`` (8 hex chars;
    '26666666' ~ 15%) are masked; RUNS of masked tokens collapse into
    one sentinel span.  Emits per doc the corrupted input (spans
    replaced by ``<extra_id_k>``), the target (each sentinel followed
    by its span's tokens), and span stats — the (input, target) pair
    a span-corruption pretraining objective trains on, reproducible
    across retries and partitionings because the "noise" is a pure
    hash of (seed, doc, position).

    Shape: one explode, every window on the SAME doc partitioning
    (mask islands via the pos-minus-rank trick, span ids via
    dense_rank, first-of-span via row_number), one doc-keyed rebuild
    — two shuffles total, no UDF, no RNG.  Texts return as md5
    fingerprints so the compared row stays narrow."""
    from .dedup import tokens as _tokens

    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )
    h = F.substring(
        F.md5(
            F.concat_ws("|", F.lit(seed), F.col(id_col), F.col("pos"))
        ),
        1,
        8,
    )
    marked = toks.withColumn("_m", h < F.lit(mask_hex))
    w_doc = Window.partitionBy(id_col)
    w_masked = Window.partitionBy(id_col, "_m").orderBy("pos")
    # island key constant within a consecutive masked run
    isl = marked.withColumn(
        "_isl",
        F.when(F.col("_m"), F.col("pos") - F.row_number().over(w_masked)),
    )
    # rank islands within the MASKED partition only: a doc-wide rank
    # would order the unmasked rows' NULL island keys too, and the
    # engines disagree on NULL sort position (Spark nulls-first,
    # DuckDB nulls-last)
    w_span = Window.partitionBy(id_col, "_m").orderBy("_isl")
    w_in_span = Window.partitionBy(id_col, "_isl").orderBy("pos")
    spans = isl.withColumn(
        "_span_k",
        F.when(F.col("_m"), F.dense_rank().over(w_span) - 1),
    ).withColumn(
        "_first", F.col("_m") & (F.row_number().over(w_in_span) == 1)
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("_span_k").cast("string"), F.lit(">")
    )
    rendered = spans.select(
        F.col(id_col),
        "pos",
        "_m",
        "_first",
        F.when(~F.col("_m"), F.col("tok"))
        .when(F.col("_first"), sentinel)
        .alias("_inp"),
        F.when(
            F.col("_m") & F.col("_first"),
            F.concat_ws(" ", sentinel, F.col("tok")),
        )
        .when(F.col("_m"), F.col("tok"))
        .alias("_tgt"),
    )

    def _joined(col: str) -> F.Column:
        return F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col(col).isNotNull(),
                                F.struct(F.col("pos"), F.col(col).alias("s")),
                            )
                        )
                    ),
                    lambda x: x.isNotNull(),
                ),
                lambda x: x["s"],
            ),
        )

    return rendered.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("_m").cast("long")).alias("n_masked"),
        F.sum(F.col("_first").cast("long")).alias("n_spans"),
        F.md5(_joined("_inp")).alias("input_fp"),
        F.md5(_joined("_tgt")).alias("target_fp"),
    )


def mixture_upsample(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "up",
) -> DataFrame:
    """Deterministic fractional upsampling: each source repeats at its
    ``epochs`` rate (e.g. 2.3 = every doc twice, plus a 30% hash-chosen
    subset a third time) — the standard epoch-weighting move when a
    small high-quality source must punch above its byte share and
    thinning (:func:`mixture_rebalance`) can't get there.

    Every doc yields ``floor(e)`` copies plus one more when its
    (seed, id) hash lands under ``frac(e)`` — the same md5 axis as
    every sampler here, so the replica multiset is a pure function of
    content, stable across retries, partitionings, and incremental
    runs.  Map-only: a literal-map lookup + ``explode(sequence(...))``;
    no shuffle, no RNG.  Rows gain ``epoch`` (1-based copy index) —
    downstream shuffling treats each copy as its own row, and
    ``(id, epoch)`` stays a stable identity.  Unlisted sources keep
    one epoch.
    """
    emap = F.create_map(
        *[
            x
            for s, e in epochs.items()
            for x in (F.lit(s), F.lit(float(e)))
        ]
    )
    e = F.coalesce(emap[F.col(source_col)], F.lit(1.0))
    base = F.floor(e).cast("int")
    frac = e - F.floor(e)
    # fixed-width hex compare against the per-row fractional threshold:
    # frac in [0,1) scaled to the 16^8 hash space (integer-exact for
    # the usual one-decimal epoch rates)
    extra = (
        F.conv(sample_hash(F.col(id_col), seed), 16, 10).cast("long")
        < frac * F.lit(float(16**8))
    ).cast("int")
    n_copies = base + extra
    return (
        df.withColumn("_n", n_copies)
        .where(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def plan_batches(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "batch",
) -> DataFrame:
    """Padding-aware dynamic batch planning: documents group into
    power-of-two LENGTH buckets (pad target = the bucket ceiling, the
    standard bucketed-batching practice) and each bucket fills
    batches of ``floor(budget / ceiling)`` docs in deterministic hash
    order — the training-loader counterpart of :func:`pack_sequences`
    (which concatenates; this BATCHES with padding, and reports the
    padding cost so mixture tuning can see it).

    Within a length bucket every doc pads to the same ceiling, so
    batch membership needs the doc's RANK in the bucket — computed
    with the same two-phase prefix pattern as pack_sequences, sub-
    bucketed by the hash's first two hex digits so no single-partition
    window ever sees a whole length bucket.

    Returns one row per batch:
    ``(batch_id, len_bucket, pad_len, n_docs, n_tokens,
    padding_waste)`` where ``pad_len`` is the bucket ceiling every
    member pads to and ``padding_waste = n_docs * pad_len -
    n_tokens``.  Zero-token docs are excluded (nothing to batch); a
    budget smaller than a bucket's ceiling still emits one doc per
    batch (capacity clamps to 1)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    sized = (
        with_token_counts(df, text_col, id_col)
        .where(F.col("n_tokens") > 0)
        .select(
            F.col(id_col),
            "n_tokens",
            sample_hash(F.col(id_col), seed).alias("_h"),
            # bit-length arithmetic, not floor(log2(n)): libm log2 of
            # an exact power of two can return 9.9999... in one engine
            # and 10.0 in another, silently shifting the bucket
            (
                F.length(
                    F.conv(F.col("n_tokens").cast("string"), 10, 2)
                )
                - 1
            ).cast("long").alias("_lb"),
        )
        .where(F.col("_h").isNotNull())
        # 3 hex digits: 4,096 sub-ranges per length bucket (offsets
        # stay a per-lb-bounded broadcast; ranks are depth-invariant)
        .withColumn("_sub", F.substring("_h", 1, 3))
    )
    w_local = Window.partitionBy("_lb", "_sub").orderBy("_h", id_col)
    local = sized.withColumn(
        "_lr", F.row_number().over(w_local) - 1
    )
    w_off = (
        Window.partitionBy("_lb")
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_lb", "_sub")
        .agg(F.count("*").alias("_c"))
        .withColumn(
            "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
        )
        .select("_lb", "_sub", "_off")
    )
    # integer div throughout (the repo-wide discipline, see
    # conversations.py): float `/` then cast can land the rounded
    # quotient on the next integer before truncation near 2^53/cap
    ceiling_sql = "CAST(shiftleft(1L, CAST(_lb + 1 AS INT)) AS BIGINT)"
    ceiling = F.expr(ceiling_sql)
    cap = F.greatest(
        F.expr(f"CAST({int(budget)} AS BIGINT) div {ceiling_sql}"),
        F.lit(1),
    )
    ranked = local.join(F.broadcast(offsets), ["_lb", "_sub"], "left")
    batched = ranked.withColumn("_cap", cap).select(
        F.col(id_col),
        "n_tokens",
        F.col("_lb").alias("len_bucket"),
        ceiling.alias("_ceil"),
        F.concat_ws(
            ":",
            F.col("_lb"),
            F.expr("(_off + _lr) div _cap"),
        ).alias("batch_id"),
    )
    return batched.groupBy("batch_id", "len_bucket").agg(
        F.min("_ceil").alias("pad_len"),
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (
            F.count("*") * F.min("_ceil") - F.sum("n_tokens")
        ).cast("long").alias("padding_waste"),
    )
