"""BPE learner (operators/bpe.py): differential check against a
straightforward single-process reference implementation, plus merge
semantics and partition independence."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators import bpe as B

CORPUS = [
    (0, "low low low low low lower lower newest newest newest"),
    (1, "newest newest newest widest widest widest low lower"),
    (2, "the newest widest low low the the"),
]


def ref_bpe(texts, n_merges):
    """Reference BPE on word frequencies: greedy argmax pair with
    (weight desc, left, right) tie-break, left-to-right merges."""
    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(w): f for w, f in wf.items()}
    out = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), w = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, a, b, a + b, w))
        nv = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nv[tuple(merged)] = nv.get(tuple(merged), 0) + f
        vocab = nv
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"]).cache()


def test_learn_matches_reference(spark, docs):
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_weight)
        for r in B.learn_bpe(docs, n_merges=8).orderBy("rank").collect()
    ]
    want = ref_bpe([t for _, t in CORPUS], 8)
    assert got == want


def test_merge_is_left_to_right_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    got = df.select(
        B.merge_pair(F.col("syms"), "a", "a").alias("m")
    ).head()["m"]
    assert got == ["aa", "a"]


def test_merged_symbol_does_not_chain(spark):
    # after (a,b)->ab, a following b must NOT merge with the new ab's
    # trailing b context: [a, b, b] -> [ab, b], not [ab b] merged again
    df = spark.createDataFrame([(["a", "b", "b"],)], "syms array<string>")
    got = df.select(
        B.merge_pair(F.col("syms"), "a", "b").alias("m")
    ).head()["m"]
    assert got == ["ab", "b"]


def test_partition_independent(spark, docs):
    a = B.learn_bpe(docs.repartition(1), n_merges=5).collect()
    b = B.learn_bpe(docs.repartition(7), n_merges=5).collect()
    assert sorted(a) == sorted(b)


def test_pandas_path_matches_expression_path(spark, docs):
    merges = [
        (r.left, r.right)
        for r in B.learn_bpe(docs, n_merges=6).orderBy("rank").collect()
    ]
    expr = B.apply_bpe(docs, merges)  # 6 <= max_expr_merges
    arrow = B.apply_bpe_pandas(docs, merges)
    assert sorted(map(tuple, expr.collect())) == sorted(
        map(tuple, arrow.collect())
    )


def test_apply_bpe_roundtrip(spark, docs):
    merges = [
        (r.left, r.right)
        for r in B.learn_bpe(docs, n_merges=6).orderBy("rank").collect()
    ]
    pieces = B.apply_bpe(docs, merges)
    # concatenating the pieces of every word must reproduce the word
    bad = pieces.where(
        F.concat_ws("", F.col("pieces")) != F.col("word")
    ).count()
    assert bad == 0
    # and at least one word must actually be compressed below chars
    compressed = pieces.where(
        F.size("pieces") < F.length("word")
    ).count()
    assert compressed > 0


def test_chars_codepoint_safe_on_astral_plane(spark):
    """r9 unicode sweep: the former regex char-split put zero-width
    split points at Java CODE-UNIT boundaries, tearing astral-plane
    characters (emoji) into lone-surrogate halves.  chars() must
    yield one whole character per CODE POINT at any plane, and keep
    the documented ''/NULL edge behavior."""
    import pyspark.sql.functions as F

    from ena_database_build_spark.operators.bpe import chars

    df = spark.createDataFrame(
        [("\U0001f600\U0001f525",), ("ab\U0001f600c",), ("",), (None,)],
        "word string",
    )
    got = {r["word"]: r["ch"] for r in
           df.select("word", chars(F.col("word")).alias("ch")).collect()}
    assert got["\U0001f600\U0001f525"] == ["\U0001f600", "\U0001f525"]
    assert got["ab\U0001f600c"] == ["a", "b", "\U0001f600", "c"]
    assert got[""] == [""]
    assert got[None] is None


def test_batched_batch1_parity_with_sequential(spark, docs):
    """batch=1 must be EXACTLY learn_bpe (the documented ground-truth
    parity gate for the batched production form)."""
    seq = [
        (r.rank, r.left, r.right, r.merged, r.pair_weight)
        for r in B.learn_bpe(docs, n_merges=6).orderBy("rank").collect()
    ]
    bat = [
        (r.rank, r.left, r.right, r.merged, r.pair_weight)
        for r in B.learn_bpe_batched(docs, n_merges=6, batch=1)
        .orderBy("rank")
        .collect()
    ]
    assert seq == bat


def test_batched_disjoint_corpus_matches_sequential(spark):
    """On a corpus whose top pairs are symbol-disjoint (distinct
    letters per word), a whole batch equals the sequential result —
    the commutation argument merge_pairs_disjoint relies on."""
    rows = [(0, "aa aa aa bb bb cc"), (1, "aa bb bb cc dd dd")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    seq = [
        (r.left, r.right, r.pair_weight)
        for r in B.learn_bpe(d, n_merges=4).orderBy("rank").collect()
    ]
    bat = [
        (r.left, r.right, r.pair_weight)
        for r in B.learn_bpe_batched(d, n_merges=4, batch=4)
        .orderBy("rank")
        .collect()
    ]
    assert seq == bat


def test_batched_prefix_rule_stops_at_conflict(spark):
    """A batch must stop at the first pair sharing a symbol with an
    earlier choice: in this corpus the rank-1 and rank-2 pairs share
    the symbol 'a'/'b', so a batch=2 round applies ONLY rank-1 and
    rank-2 is re-ranked with fresh counts the next round — which is
    exactly what sequential BPE produces on this corpus."""
    rows = [(0, "aba aba aba ab ab")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    seq = [
        (r.left, r.right)
        for r in B.learn_bpe(d, n_merges=3).orderBy("rank").collect()
    ]
    bat = [
        (r.left, r.right)
        for r in B.learn_bpe_batched(d, n_merges=3, batch=2)
        .orderBy("rank")
        .collect()
    ]
    assert seq == bat


def test_batched_partition_independent(spark, docs):
    a = B.learn_bpe_batched(docs.repartition(1), n_merges=5, batch=3).collect()
    b = B.learn_bpe_batched(docs.repartition(7), n_merges=5, batch=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
