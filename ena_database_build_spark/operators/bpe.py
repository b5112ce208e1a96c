"""Distributed BPE (byte-pair-encoding) vocabulary learning — the
tokenizer-training half of a training-data pipeline.

The reference engine has no tokenizer surface (its only text model is
the EMBL line grammar, ``/root/reference/ena_build/parse_embl.py``);
this extends the §2.11 LLM-pipeline operators.  Classic BPE (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") trains on the WORD-FREQUENCY table, not the raw corpus — the
first aggregation collapses 100 TB of text to a vocabulary of unique
words with counts (a few million rows), and every merge iteration
after that runs on that bounded table.  That collapse is what makes
BPE training a Spark-shaped problem:

* ``word_freqs``        — one explode + one count groupBy (the only
  corpus-scale shuffle in the whole algorithm);
* ``pair_counts``       — map-only pair expansion over symbol arrays
  + a map-side-combinable weighted sum;
* ``learn_bpe``         — Lloyd's-style driver loop: each iteration
  collects exactly ONE row (the argmax pair — same bounded-driver-
  state pattern as ``operators/kmeans.py`` centroids) and rewrites
  the symbol arrays with a pure-column left-to-right fold.  A
  ``localCheckpoint`` per iteration truncates both the lineage and
  the otherwise exponentially nesting lambda expression tree.

Ties in the argmax pair break deterministically (weight desc, then
left/right lexicographic), so the learned merge table is reproducible
across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, freq)`` — the corpus collapsed to its vocabulary.
    One explode + one groupBy; partial aggregation makes the shuffle
    carry vocabulary-sized, not corpus-sized, data."""
    from .dedup import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def chars(word: Column) -> Column:
    """Initial symbol array: one single-character symbol per CODE
    POINT.

    NOT a regex split: the former ``split(word, '(?!^)(?=.)')`` put
    its zero-width split points at Java CODE-UNIT boundaries, so an
    astral-plane character (emoji, rare CJK — anything above U+FFFF)
    was torn into two lone-surrogate "symbols" (r9 unicode sweep:
    '\\U0001f600\\U0001f525' became four broken pieces where every
    other engine counts two characters).  ``Column.substr`` indexes
    UTF8String by code point, so the sequence/substr form yields one
    whole character per symbol at any plane.  Cost is the same
    map-only shape (words are vocabulary entries, tens of bytes).

    Empty-string and NULL behavior preserved: ``''`` -> ``['']``
    (callers upstream filter empties anyway), NULL -> NULL."""
    return (
        F.when(
            F.length(word) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.length(word)),
                lambda i: word.substr(i, F.lit(1)),
            ),
        )
        .when(word.isNotNull(), F.array(F.lit("")))
    )


def sym_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs of a symbol array as
    ``array<struct<left,right>>`` — map-only, no shuffle."""
    pairs = F.transform(
        syms,
        # try_element_at: the final element's missing right neighbour
        # is NULL (ANSI element_at raises), then sliced away below
        lambda s, i: F.struct(
            s.alias("left"), F.try_element_at(syms, i + 2).alias("right")
        ),
    )
    # the last element has no right neighbour
    return F.slice(pairs, 1, F.greatest(F.size(syms) - 1, F.lit(0)))


def pair_counts(
    words: DataFrame, syms_col: str = "syms", freq_col: str = "freq"
) -> DataFrame:
    """Weighted adjacent-pair counts over the vocabulary:
    ``(left, right, pair_weight)``.  Explode + sum groupBy on the
    (small) word table; this is the per-iteration workhorse."""
    return (
        words.select(
            F.explode(sym_pairs(F.col(syms_col))).alias("p"), F.col(freq_col)
        )
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum(freq_col).alias("pair_weight"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent
    ``(left, right)`` into one symbol — the BPE merge rule — as a
    pure-column fold.  Greedy left-to-right falls out of the fold
    order: once a pair merges, the new combined symbol is the
    accumulator tail, so ``aaa`` under ``(a,a)`` becomes ``[aa, a]``,
    never ``[a, aa]`` or ``[aaa]``."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        syms, F.array().cast("array<string>"), step
    )


def merge_pairs_disjoint(
    syms: Column, pairs: list[tuple[str, str]]
) -> Column:
    """One-pass fold applying SEVERAL merge pairs simultaneously.

    ONLY valid when the pairs are pairwise SYMBOL-DISJOINT (no
    symbol — left, right, or merged — shared between any two pairs;
    :func:`learn_bpe_batched` enforces this): disjoint merges commute
    and never create/destroy each other's occurrences, so one scan
    produces exactly what applying the pairs sequentially (in any
    order) would.  A shared symbol would make the result
    scan-order-dependent, which is why the batch builder stops at the
    first conflicting pair instead of skipping it."""
    def step(acc: Column, s: Column) -> Column:
        expr = F.concat(acc, F.array(s))
        for left, right in pairs:
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right))
            )
            expr = F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(expr)
        return expr

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def learn_bpe(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learns ``n_merges`` BPE merges from the corpus; returns the
    merge table ``(rank, left, right, merged, pair_weight)`` ordered
    by learn order.

    Driver state per iteration is exactly one row (the argmax pair);
    the vocabulary table itself never leaves the executors.  Stops
    early if no pair remains (fully merged vocabulary).

    COST MODEL (production posture, r9 verdict #5): each merge is one
    Spark job (a pair_counts aggregation + a 1-row collect + a
    localCheckpoint of the vocabulary table), so learning is
    O(n_merges) DRIVER ROUND-TRIPS over a vocabulary-sized (never
    corpus-sized) table.  At catalog scale (n_merges <= 10) that is
    exactly right; a production 32k-merge vocabulary would mean 32k
    sequential jobs (~hours of pure scheduling floor even with a
    millisecond vocabulary).  For that regime use
    :func:`learn_bpe_batched`, which learns the same kind of merge
    table in n_merges / batch jobs (e.g. 32k merges in ~256 rounds at
    batch=128) at the cost of the documented batch-boundary
    approximation.  This sequential form remains the semantic
    ground truth the batched form is parity-tested against."""
    spark = df.sparkSession
    words = (
        word_freqs(df, text_col=text_col)
        .select(chars(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges = []
    for rank in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(
                F.col("pair_weight").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append(
            (rank, row["left"], row["right"], row["left"] + row["right"],
             int(row["pair_weight"]))
        )
        nxt = words.select(
            merge_pair(F.col("syms"), row["left"], row["right"]).alias(
                "syms"
            ),
            "freq",
        ).localCheckpoint()
        words.unpersist()
        words = nxt
    words.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
        "pair_weight long",
    )


def learn_bpe_batched(
    df: DataFrame,
    n_merges: int = 10,
    batch: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Batched BPE learning: up to ``batch`` merges per Spark job —
    the production form of :func:`learn_bpe` (same return schema).

    Each round ranks pairs once, then takes the maximal PREFIX of the
    ranked list whose pairs are pairwise symbol-disjoint (stopping at
    the first pair sharing a left/right/merged symbol with an earlier
    choice — skipping it instead would apply a stale-ranked pair
    whose count the conflict would have changed), and applies the
    whole prefix in ONE :func:`merge_pairs_disjoint` fold pass.
    Driver round-trips drop from O(n_merges) to O(n_merges / batch):
    a 32k-merge vocabulary trains in a few hundred jobs instead of
    32k (see the learn_bpe cost model).

    SEMANTICS vs the sequential ground truth: at ``batch=1`` the
    output is IDENTICAL to :func:`learn_bpe` (parity-tested).  For
    ``batch>1`` the recorded pair_weights are exact (disjoint merges
    cannot change each other's counts), and the single divergence is
    the batch boundary: a pair CREATED by an earlier merge in the
    same batch (one involving its merged symbol) only becomes
    rankable next round, so sequential BPE could interleave it
    earlier.  That is the standard batched-BPE trade (cf. the
    max-frequency batching in industrial tokenizer trainers); rank
    order within a batch and across clean batches is preserved."""
    spark = df.sparkSession
    words = (
        word_freqs(df, text_col=text_col)
        .select(chars(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple] = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # the prefix rule below STOPS at the first conflict (it never
        # skips past one), so rows beyond the first `want` can never
        # be chosen — limit(want) is exact, not a truncation
        top = (
            pair_counts(words)
            .orderBy(
                F.col("pair_weight").desc(), F.col("left"), F.col("right")
            )
            .limit(want)
            .collect()
        )
        if not top:
            break
        chosen: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if len(chosen) == want:
                break
            symset = {row["left"], row["right"], row["left"] + row["right"]}
            if used & symset:
                break  # prefix rule: stop, don't skip
            used |= symset
            chosen.append((row["left"], row["right"]))
            merges.append(
                (
                    len(merges),
                    row["left"],
                    row["right"],
                    row["left"] + row["right"],
                    int(row["pair_weight"]),
                )
            )
        nxt = words.select(
            merge_pairs_disjoint(F.col("syms"), chosen).alias("syms"),
            "freq",
        ).localCheckpoint()
        words.unpersist()
        words = nxt
    words.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
        "pair_weight long",
    )


def _exploded_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from .dedup import tokens

    return df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).where(F.col("word") != "")


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expr_merges: int = 16,
) -> DataFrame:
    """Tokenizes documents with a learned merge list: per word, each
    merge applied once in rank order (equivalent to the classic
    priority-loop encode for any SELF-CONSISTENT learned list — a
    merge can only create pairs whose own merge was learned later, so
    rank order never has to revisit an earlier rule).  Returns
    ``(id, word, pieces array<string>)`` rows; map-only, no shuffle.

    Dispatch: short lists inline as pure column expressions (one
    nested fold per merge — JVM-side, codegen'd); beyond
    ``max_expr_merges`` the expression tree nests too deep for
    Catalyst, so a production-size vocabulary (30k+ merges) runs the
    Arrow-batched pandas path instead, with the merge table shipped
    once per executor and a per-batch memo over distinct words."""
    out = _exploded_words(df, text_col, id_col)
    if len(merges) <= max_expr_merges:
        pieces = chars(F.col("word"))
        for left, right in merges:
            pieces = merge_pair(pieces, left, right)
        return out.select(id_col, "word", pieces.alias("pieces"))
    return apply_bpe_pandas(df, merges, text_col=text_col, id_col=id_col)


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Single-process BPE encode: one left-to-right pass per merge in
    rank order — the same semantics as ``merge_pair``'s fold."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched tokenization for production-size merge lists.
    The merge list rides the closure (serialized once per executor,
    like a broadcast vocab); a per-batch memo collapses repeated
    words, so cost scales with DISTINCT words per batch, the same
    property that makes word-frequency BPE training tractable."""
    out = _exploded_words(df, text_col, id_col)
    schema = f"{id_col} long, word string, pieces array<string>"
    merge_list = list(merges)

    def encode(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = [
                memo.setdefault(w, _encode_word(w, merge_list))
                for w in pdf["word"]
            ]
            yield pdf

    return out.mapInPandas(encode, schema=schema)
