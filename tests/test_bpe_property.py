"""Property-based check of the BPE learner: on arbitrary small
corpora, the distributed learner must agree with the single-process
reference implementation in tests/test_bpe.py, and applying the
learned merges must always losslessly re-concatenate."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ena_database_build_spark.operators import bpe as B
from tests.test_bpe import ref_bpe

# short words over a tiny alphabet force dense pair collisions,
# repeated merges of merged symbols, and tie-breaks
words = st.text(alphabet="abc", min_size=1, max_size=6)
texts = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None)
@given(texts=texts)
def test_learner_matches_reference_on_random_corpora(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_weight)
        for r in B.learn_bpe(docs, n_merges=5).orderBy("rank").collect()
    ]
    assert got == ref_bpe(texts, 5)


@settings(max_examples=10, deadline=None)
@given(texts=texts)
def test_apply_is_lossless(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r.left, r.right)
        for r in B.learn_bpe(docs, n_merges=4).orderBy("rank").collect()
    ]
    pieces = B.apply_bpe(docs, merges)
    bad = pieces.where(
        F.concat_ws("", F.col("pieces")) != F.col("word")
    ).count()
    assert bad == 0
