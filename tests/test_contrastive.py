"""Contrastive triple mining (operators/contrastive.py): pair
semantics, determinism, and drop rules."""

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators.contrastive import (
    contrastive_triples,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 12 docs x 5 chunks of 4 tokens each (size=4 below)
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(20))) for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_triples_semantics(spark, docs):
    out = contrastive_triples(docs, size=4).collect()
    assert out, "must emit triples"
    # anchors never pair with themselves
    for r in out:
        assert r.anchor_fp != r.positive_fp
        assert r.anchor_fp != r.negative_fp
    # positive = the doc's NEXT chunk: verify one concrete case
    trip = {r.chunk_id: r for r in out}
    import hashlib

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    chunk = lambda d, k: " ".join(f"d{d}w{j}" for j in range(4 * k, 4 * k + 4))
    if "0#0" in trip:
        assert trip["0#0"].positive_fp == fp(chunk(0, 1))


def test_deterministic_across_partitionings(spark, docs):
    a = sorted(map(tuple, contrastive_triples(docs, size=4).collect()))
    b = sorted(
        map(
            tuple,
            contrastive_triples(docs.repartition(7), size=4).collect(),
        )
    )
    assert a == b


def test_last_chunks_have_no_positive(spark, docs):
    out = contrastive_triples(docs, size=4).collect()
    # chunk_idx 4 is each doc's last chunk -> no positive -> absent
    assert not [r for r in out if r.chunk_id.endswith("#4")]
