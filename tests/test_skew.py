"""Tests for skew salting and bucketed co-located joins."""

import pyspark.sql.functions as F
import pytest

from ena_database_build_spark.operators import skew as K


def test_salted_aggregate_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [(1 if i % 10 else i, float(i % 7)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"])
        for r in K.salted_aggregate(
            df, ["k"], {"n": "count(*)", "total": "sum(v)", "mx": "max(v)"}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i % 5, i) for i in range(1000)], "k long, payload long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(5)], "k long, label string")
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in K.salted_join(fact, dim, ["k"], n_salts=4).collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["label"])
        for r in fact.join(dim, "k").collect()
    )
    assert got == want


def test_salted_aggregate_rejects_non_reaggregable(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError):
        K.salted_aggregate(df, ["k"], {"a": "avg(v)"})


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    K.write_bucketed(left, "t_left", ["k"], n_buckets=8, sort_cols=["k"])
    K.write_bucketed(right, "t_right", ["k"], n_buckets=8, sort_cols=["k"])
    joined = spark.table("t_left").join(spark.table("t_right"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 1000


def test_global_shuffle_matches_serial_rank(spark):
    import hashlib

    from ena_database_build_spark.operators.sampling import global_shuffle

    ids = list(range(100))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r["doc_id"]: r for r in global_shuffle(df, n_shards=7).collect()}
    order = sorted(
        ids,
        key=lambda i: (
            hashlib.md5(f"shuffle|{i}".encode()).hexdigest()[:8],
            i,
        ),
    )
    for pos, doc_id in enumerate(order):
        r = out[doc_id]
        assert r["global_pos"] == pos
        assert r["shard_id"] == pos % 7
        assert r["shard_pos"] == pos // 7
    # round-robin sharding is exactly balanced
    sizes = {}
    for r in out.values():
        sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_global_shuffle_partition_independent(spark):
    from ena_database_build_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    a = sorted(map(tuple, global_shuffle(df, 4).collect()))
    b = sorted(map(tuple, global_shuffle(df.repartition(11), 4).collect()))
    assert a == b


def test_global_shuffle_excludes_null_ids_without_rank_shift(spark):
    """A NULL id must neither appear in the output nor shift real
    rows' ranks (a NULL bucket would sort first in the offsets prefix
    sum and offset every rank by the NULL count)."""
    from ena_database_build_spark.operators.sampling import global_shuffle

    clean = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    dirty = clean.unionByName(
        spark.createDataFrame([(None,), (None,)], "doc_id long")
    )
    a = sorted(map(tuple, global_shuffle(clean, 4).collect()))
    b = sorted(map(tuple, global_shuffle(dirty, 4).collect()))
    assert a == b
    assert len(b) == 40  # ranks dense 0..39, NULL rows dropped
    assert {r[1] for r in b} == set(range(40))


def test_hash_sample_full_fraction_keeps_everything(spark):
    from ena_database_build_spark.operators.sampling import (
        hash_sample,
        train_test_split,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # fraction >= 1 must keep all rows (a 9-hex-digit threshold used to
    # break the fixed-width compare and keep only hashes under '1')
    assert hash_sample(df, 1.0).count() == 200
    splits = train_test_split(df, test_fraction=1.0).groupBy("split").count()
    assert {r["split"]: r["count"] for r in splits.collect()} == {"test": 200}


def test_tie_mass_quantile_ops_stay_correct(spark):
    """Degenerate score distributions (half the corpus identically
    scored — the tie-mass case that used to co-locate every tied row
    in one value-keyed window partition) must still produce exact
    results from the value-level plans."""
    from pyspark.sql import Window as W

    from ena_database_build_spark.operators.quantiles import (
        quantile_gate,
        quantile_normalize,
    )

    n = 400
    # 50% of rows score exactly 0.0, the rest spread over (0, 1]
    rows = [
        (i, 0.0 if i % 2 == 0 else round((i % 97) / 97.0, 6))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, quality double")

    got = {
        r.doc_id: r.qnorm
        for r in quantile_normalize(df, "quality", bins=16).collect()
    }
    want = {
        r.doc_id: r.qnorm
        for r in df.select(
            "doc_id",
            F.round(
                (F.rank().over(W.orderBy("quality")) - 1).cast("double")
                / (n - 1),
                6,
            ).alias("qnorm"),
        ).collect()
    }
    assert got == want
    # every tied row shares one qnorm, and it is the group minimum
    assert {got[i] for i in range(0, n, 2)} == {0.0}

    vals = sorted(r[1] for r in rows)
    q = 0.6
    r_pos = 1.0 + (n - 1) * q
    import math

    lo, hi = vals[math.floor(r_pos) - 1], vals[math.ceil(r_pos) - 1]
    thr = lo + (r_pos - math.floor(r_pos)) * (hi - lo)
    kept = sorted(
        r.doc_id
        for r in quantile_gate(
            df, "quality", q=q, id_col="doc_id", bucket_width=0.1
        ).collect()
    )
    assert kept == sorted(i for i, v in rows if v >= thr)


def test_tie_mass_span_dedup_boilerplate_gram(spark):
    """A k-gram present in EVERY document (corpus boilerplate — the
    case the aggregate+join gram verdict exists for) is removed from
    all docs while unique spans survive."""
    from ena_database_build_spark.operators.curation import span_dedup

    docs = spark.createDataFrame(
        [
            (i, f"unique{i} words here COMMON BOILERPLATE SPAN tail{i}")
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(docs, k=3).collect()}
    assert len(out) == 60
    for i, r in out.items():
        # the 3-gram cover of the shared span removes it everywhere;
        # the unique head/tail tokens survive
        assert "COMMON" not in r.text and "BOILERPLATE" not in r.text
        assert f"unique{i}" in r.text and f"tail{i}" in r.text
        assert r.n_dropped >= 3
