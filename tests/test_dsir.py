"""DSIR importance-weight operator (operators/dsir.py).

Checks the two properties the method exists for: (1) documents drawn
from the target subset score higher on average than off-target ones,
and (2) the weight is the exact sum of per-bucket smoothed log-ratios
(verified by hand on a tiny corpus where the bucket models are
computable directly).
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ena_database_build_spark.operators.dsir import dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, tgt=g) for i, (t, g) in enumerate(rows)]
    )


def test_target_docs_score_higher(spark):
    # target docs share a vocabulary; raw-only docs use a disjoint one
    rows = [(f"alpha beta gamma delta run {i}", True) for i in range(8)]
    rows += [(f"zug blorp quix nerf item {i}", False) for i in range(8)]
    out = dsir_weights(_docs(spark, rows), "tgt").join(
        _docs(spark, rows).select("doc_id", "tgt"), "doc_id"
    )
    means = {
        r["tgt"]: r["m"]
        for r in out.groupBy("tgt").agg(F.avg("dsir_weight").alias("m")).collect()
    }
    assert means[True] > means[False]
    assert means[True] > 0 > means[False]


def test_weights_match_hand_model(spark):
    # hex_chars=1 -> 16 buckets; with two 1-token docs the models are
    # small enough to recompute exactly here
    import hashlib

    rows = [("aa", True), ("bb", False)]
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(
            _docs(spark, rows), "tgt", hex_chars=1
        ).collect()
    }
    b = {t: hashlib.md5(f"u|{t}".encode()).hexdigest()[0] for t in ("aa", "bb")}
    # per-bucket counts: raw has one gram in each bucket, target only 'aa'
    n_raw = {b["aa"]: 1, b["bb"]: 1}
    n_tgt = {b["aa"]: 1, b["bb"]: 0}
    for i, tok in enumerate(("aa", "bb")):
        k = b[tok]
        exp = math.log((n_tgt[k] + 1) / (1 + 16)) - math.log(
            (n_raw[k] + 1) / (2 + 16)
        )
        assert out[i] == pytest.approx(exp, abs=1e-6)


def test_blank_and_null_docs_absent(spark):
    rows = [("hello world", True), ("", False), (None, False)]
    got = dsir_weights(_docs(spark, rows), "tgt").collect()
    assert {r["doc_id"] for r in got} == {0}
    assert got[0]["n_grams"] == 3  # 2 unigrams + 1 bigram


def test_hex_chars_validation(spark):
    with pytest.raises(ValueError):
        dsir_weights(_docs(spark, [("x", True)]), "tgt", hex_chars=0)


def test_dsir_matches_python_model_randomized(spark):
    """Randomized differential: the engine's weights must equal a
    plain-Python reimplementation of the smoothed hashed-ngram model
    on an arbitrary corpus (seeded, like the dedup differentials)."""
    import hashlib
    import random
    from collections import Counter

    rng = random.Random(99)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", ""]
    rows = []
    for i in range(40):
        n = rng.randint(0, 6)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((i, text, rng.random() < 0.4))
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    hexc, lam, m = 2, 1.0, 256.0

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:hexc]

    def grams(text):
        toks = [t for t in (text or "").split() if t]
        gs = [f"u|{t}" for t in toks]
        gs += [f"b|{a} {b}" for a, b in zip(toks, toks[1:])]
        return gs

    n_raw, n_tgt = Counter(), Counter()
    per_doc = {}
    for i, text, tgt in rows:
        bs = Counter(bucket(g) for g in grams(text))
        if bs:
            per_doc[i] = bs
        for b, c in bs.items():
            n_raw[b] += c
            if tgt:
                n_tgt[b] += c
    t_raw, t_tgt = sum(n_raw.values()), sum(n_tgt.values())
    expected = {}
    for i, bs in per_doc.items():
        w = sum(
            c
            * (
                math.log((n_tgt[b] + lam) / (t_tgt + lam * m))
                - math.log((n_raw[b] + lam) / (t_raw + lam * m))
            )
            for b, c in bs.items()
        )
        expected[i] = (sum(bs.values()), round(w, 6))

    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_weight"])
        for r in dsir_weights(df, "tgt", hex_chars=hexc, smoothing=lam).collect()
    }
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0]
        assert got[i][1] == pytest.approx(expected[i][1], abs=2e-6)


def test_null_target_flag_is_off_target(spark):
    """NULL in the target column must mean 'raw model only', exactly
    like False — not silently drop the doc's grams from both models."""
    from pyspark.sql import Row

    rows = [
        Row(doc_id=0, text="aa bb", tgt=True),
        Row(doc_id=1, text="aa bb", tgt=None),
        Row(doc_id=2, text="aa bb", tgt=False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(df, "tgt").collect()}
    assert got[1] == got[2]  # NULL behaves as False
    assert got[0] == got[1]  # identical text -> identical weight


def test_smoothing_validation(spark):
    with pytest.raises(ValueError):
        dsir_weights(_docs(spark, [("x", True)]), "tgt", smoothing=0.0)


def test_dsir_single_corpus_scan(spark):
    """The module docstring claims the corpus is scanned exactly once
    (the checkpointed (doc, bucket) counts feed both the model fit and
    the scoring).  Pin it: the executed plan must hold at most one
    parquet/LocalTableScan-free source traversal — concretely, no more
    than one 'Scan' of the input after the checkpoint materializes."""
    rows = [(i, f"tok{i % 5} tok{(i + 1) % 5} tok{i % 3}", i % 2 == 0)
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir_weights(df, "tgt")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the checkpointed relation appears as a scan of existing RDD
    # blocks; the raw input must not be traversed twice
    assert final.count("LocalTableScan") + final.count("Scan parquet") <= 1
