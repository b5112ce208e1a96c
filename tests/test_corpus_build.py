"""Invariant tests for the end-to-end training-corpus build plan."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators.dedup import fingerprint, shingles
from ena_database_build_spark.plans.corpus_build import build_training_corpus


def _text(i, n=11):
    # per-doc disjoint vocabulary: no k-gram is ever shared across
    # docs, so decontamination only fires where the fixture plants it
    return " ".join(f"w{i}t{j}" for j in range(n))


def _docs(spark):
    rows = []
    # 40 reasonable docs across two sources
    for i in range(40):
        rows.append((i, "src_a" if i % 2 else "src_b", _text(i)))
    # near-duplicate of doc 7 (only the trailing token differs)
    rows.append((100, "src_a", _text(7, 10) + " zzz"))
    # exact duplicate (normalized) of doc 0
    rows.append((101, "src_b", _text(0).upper().replace(" ", "  ", 3)))
    # contamination pair: distinct docs sharing a 5-token run, so if
    # the split separates them the train one must be dropped
    shared = "shared benchmark prompt token run"
    rows.append((200, "src_a", shared + " " + _text(200, 6)))
    rows.append((201, "src_b", shared + " " + _text(201, 6)))
    # junk that should fail the quality gate (bottom decile)
    for i in range(110, 114):
        rows.append((i, "src_a", "!!!! ???? ;;;; >>>> <<<<"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_build_training_corpus_invariants(spark):
    res = build_training_corpus(_docs(spark), n_shards=4, decon_k=4)

    # quality gate: junk gone, real docs kept
    gated_ids = {r["doc_id"] for r in res.gated.select("doc_id").collect()}
    assert not gated_ids & {110, 111, 112, 113}
    assert 0 in gated_ids

    # dedup: exact dup 101 and near-dup loser 100 are gone; content
    # fingerprints unique
    ded_ids = {r["doc_id"] for r in res.deduped.select("doc_id").collect()}
    assert 101 not in ded_ids and 100 not in ded_ids
    fps = res.deduped.select(fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()

    # splits partition the corpus; train is decontaminated: no train
    # doc shares a 4-shingle with any test doc
    train_ids = {r["doc_id"] for r in res.train.select("doc_id").collect()}
    test_ids = {r["doc_id"] for r in res.test.select("doc_id").collect()}
    assert train_ids.isdisjoint(test_ids)
    sh_train = res.train.select(
        F.explode(shingles(F.col("text"), k=4)).alias("s")
    )
    sh_test = res.test.select(
        F.explode(shingles(F.col("text"), k=4)).alias("s")
    )
    assert sh_train.join(sh_test, "s", "left_semi").count() == 0

    # ordering covers exactly the train ids with dense positions and
    # balanced shards
    ordered = res.ordered.collect()
    assert {r["doc_id"] for r in ordered} == train_ids
    assert sorted(r["global_pos"] for r in ordered) == list(
        range(len(train_ids))
    )
    sizes = {}
    for r in ordered:
        sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1

    # stats account for every deduped doc (they are computed on the
    # split BEFORE decontamination removes contaminated train docs)
    stats = {
        (r["source"], r["split"]): r["n_docs"] for r in res.stats.collect()
    }
    assert sum(stats.values()) == len(ded_ids)
    assert all(n > 0 for n in stats.values())


def test_build_training_corpus_partition_independent(spark):
    docs = _docs(spark)
    a = build_training_corpus(docs, n_shards=3)
    b = build_training_corpus(docs.repartition(11), n_shards=3)
    rows_a = sorted(map(tuple, a.ordered.collect()))
    rows_b = sorted(map(tuple, b.ordered.collect()))
    assert rows_a == rows_b
