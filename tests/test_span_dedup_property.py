"""Property-based check of span_dedup: on arbitrary small corpora the
relational k-gram cover must agree with a direct single-process
implementation — same kept/dropped counts and rebuilt text per doc."""

from hypothesis import given, settings, strategies as st

from ena_database_build_spark.operators.curation import span_dedup

# tiny vocabulary forces dense k-gram collisions across docs and
# repeats within one doc; whitespace runs exercise the tokenizer
words = st.sampled_from(["aa", "bb", "cc", "dd"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=10).map(" ".join),
    min_size=1,
    max_size=6,
)


def ref_span_dedup(texts, k, min_docs):
    toks = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    gram_docs = {}
    for d, ws in toks.items():
        for i in range(len(ws) - k + 1):
            gram_docs.setdefault(tuple(ws[i : i + k]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for d, ws in toks.items():
        covered = [False] * len(ws)
        for i in range(len(ws) - k + 1):
            if tuple(ws[i : i + k]) in dup:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        out[d] = (len(kept), sum(covered), " ".join(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(texts=docs_strategy, k=st.integers(2, 4), min_docs=st.integers(2, 3))
def test_span_dedup_matches_reference(spark, texts, k, min_docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_kept, r.n_dropped, r.text)
        for r in span_dedup(df, k=k, min_docs=min_docs).collect()
    }
    assert got == ref_span_dedup(texts, k, min_docs)
