"""Bloom-filter sketch (operators/sketch.py): membership guarantees,
superset relation to exact decontamination, partition independence."""

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators import sketch as SK
from ena_database_build_spark.operators.curation import decontaminate

DOCS = [
    # doc_id, text — ids chosen so the 'decon' split puts some in test
    (i, f"alpha beta gamma delta epsilon zeta token{i} eta theta iota kappa")
    for i in range(40)
] + [
    # exact copies of doc 1's text under new ids: guaranteed shared
    # 5-grams with whatever split side doc 1 lands on
    (100 + i, "alpha beta gamma delta epsilon zeta token1 eta theta iota kappa")
    for i in range(3)
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_no_false_negatives(spark):
    """Every value inserted at build time MUST probe positive."""
    vals = spark.createDataFrame(
        [(f"value {i}",) for i in range(200)], ["value"]
    )
    bits = SK.bloom_build(vals, "value")
    hit = SK.bloom_probe(vals, bits, "value")
    assert hit.count() == 200


def test_non_member_mostly_rejected(spark):
    """With a roomy bit space the false-positive rate stays small —
    the filter must actually discriminate (a saturated filter passes
    everything and proves nothing)."""
    member = spark.createDataFrame(
        [(f"in {i}",) for i in range(100)], ["value"]
    )
    other = spark.createDataFrame(
        [(f"out {i}",) for i in range(1000)], ["value"]
    )
    bits = SK.bloom_build(member, "value", n_hashes=3, hex_chars=4)
    fp = SK.bloom_probe(other, bits, "value", n_hashes=3, hex_chars=4).count()
    # 300/65536 fill, 3 hashes -> expected fp ~ (0.005)^3; allow slack
    assert fp < 20


def test_bloom_flags_superset_of_exact(spark, docs):
    exact = {
        r.doc_id
        for r in decontaminate(docs, k=5, eval_fraction=0.3).collect()
    }
    bloom = {
        r.doc_id
        for r in SK.bloom_decontaminate(
            docs, k=5, eval_fraction=0.3
        ).collect()
    }
    assert exact, "fixture must produce at least one true contamination"
    assert exact <= bloom


def test_partition_independent(spark, docs):
    a = SK.bloom_decontaminate(docs.repartition(1), k=5, eval_fraction=0.3)
    b = SK.bloom_decontaminate(docs.repartition(7), k=5, eval_fraction=0.3)
    assert sorted(a.collect()) == sorted(b.collect())


def test_null_values_ignored(spark):
    vals = spark.createDataFrame(
        [("x",), (None,), ("y",)], ["value"]
    )
    bits = SK.bloom_build(vals, "value")
    hit = SK.bloom_probe(vals, bits, "value")
    got = sorted(r.value for r in hit.collect())
    assert got == ["x", "y"]


def test_cms_never_underestimates_and_bounds_error(spark):
    from collections import Counter

    from ena_database_build_spark.operators import sketch as SK

    vals = [f"k{i % 37}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    sketch = SK.cms_build(df, "value", n_hashes=3, hex_chars=3)
    qdf = spark.createDataFrame(
        [(f"k{i}",) for i in range(37)] + [("absent",)], ["value"]
    )
    est = {
        r.value: r.est
        for r in SK.cms_estimate(qdf, sketch, "value").collect()
    }
    truth = Counter(vals)
    for k, t in truth.items():
        assert est[k] >= t  # one-sided error
        assert est[k] <= t + len(vals) // 100  # far under the eps*N bound
    # an absent key may collide but stays small
    assert est["absent"] <= len(vals) // 100


def test_cms_deterministic(spark):
    from ena_database_build_spark.operators import sketch as SK

    df = spark.createDataFrame([(f"v{i % 9}",) for i in range(200)], ["value"])
    a = sorted(map(tuple, SK.cms_build(df, "value").collect()))
    b = sorted(map(tuple, SK.cms_build(df.repartition(7), "value").collect()))
    assert a == b


def test_cms_weighted_build_matches_stream_build(spark):
    """r13: a weighted build over per-value counts must be
    cell-identical to the unweighted build over the raw stream —
    positions depend only on the value, so per-cell sums agree."""
    from pyspark.sql import functions as F

    from ena_database_build_spark.operators import sketch as SK

    df = spark.createDataFrame(
        [(f"v{i % 9}",) for i in range(200)] + [(None,)], ["value"]
    )
    stream = sorted(map(tuple, SK.cms_build(df, "value").collect()))
    counts = df.where(F.col("value").isNotNull()).groupBy("value").agg(
        F.count("*").alias("n")
    )
    weighted = sorted(
        map(
            tuple,
            SK.cms_build(counts, "value", weight_col="n").collect(),
        )
    )
    assert stream == weighted
    # same column types (cnt stays long)
    assert (
        SK.cms_build(counts, "value", weight_col="n").schema
        == SK.cms_build(df, "value").schema
    )


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    from ena_database_build_spark.operators import sketch as SK

    rows = [("big", f"v{i}") for i in range(2000)] + [
        ("small", f"s{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: r for r in SK.kmv_estimate(df, "v", ["g"], k=64).collect()}
    # sub-k group reports exactly
    assert got["small"].n_seen == 10 and got["small"].est_distinct == 10.0
    # k=64 KMV has ~1/sqrt(64) ~ 12.5% relative error; allow 3 sigma
    assert abs(got["big"].est_distinct - 2000) / 2000 < 0.4
    # determinism across partitionings
    again = {
        r.g: r.est_distinct
        for r in SK.kmv_estimate(df.repartition(9), "v", ["g"], k=64).collect()
    }
    assert again == {g: r.est_distinct for g, r in got.items()}
