"""Unit tests for sequence packing and mixture rebalancing."""

import hashlib

from ena_database_build_spark.operators import packing as PK


def _hash(doc_id, seed):
    return hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8]


def test_pack_sequences_matches_serial_cumsum(spark):
    rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 10
    out = {
        r["pack_id"]: (r["n_docs"], r["n_tokens"])
        for r in PK.pack_sequences(docs, budget=budget).collect()
    }
    # serial reference: sort by (hash, id), exclusive cumsum, floor-div
    order = sorted(rows, key=lambda r: (_hash(r[0], "pack"), r[0]))
    expected = {}
    cum = 0
    for doc_id, text in order:
        n = len(text.split())
        pack = cum // budget
        d, t = expected.get(pack, (0, 0))
        expected[pack] = (d + 1, t + n)
        cum += n
    assert out == expected
    # every pack holds at least one doc and pack ids are dense from 0
    assert sorted(out) == list(range(len(out)))


def test_with_token_counts_no_content_is_zero(spark):
    """NULL, empty, and whitespace-only text all count 0 tokens —
    consistent with chunk_documents and the unified no-content
    fingerprint identity (split('') yields [''], a phantom token)."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in PK.with_token_counts(docs).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 2}


def test_pack_sequences_partition_independent(spark):
    rows = [(i, " ".join(["tok"] * 5)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        PK.pack_sequences(docs, budget=17).collect(),
        key=lambda r: r["pack_id"],
    )
    b = sorted(
        PK.pack_sequences(docs.repartition(13), budget=17).collect(),
        key=lambda r: r["pack_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pack_sequences_invariants(spark):
    # irregular doc lengths incl. one over-budget doc
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(
        [3, 50, 7, 1, 12, 9, 30, 2, 2, 18, 5, 41, 1, 6]
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 20
    packs = PK.pack_sequences(docs, budget=budget).collect()
    max_doc = 50
    # token conservation
    assert sum(r["n_tokens"] for r in packs) == sum(
        len(t.split()) for _, t in rows
    )
    # every pack but the last (by id) is bounded by budget +/- max_doc
    last = max(r["pack_id"] for r in packs)
    for r in packs:
        assert r["n_tokens"] < budget + max_doc
        if r["pack_id"] != last:
            assert r["n_tokens"] > budget - max_doc


def test_mixture_rebalance_anchor_keeps_everything(spark):
    rows = []
    did = 0
    for src, n_docs in [("a", 10), ("b", 40)]:
        for _ in range(n_docs):
            rows.append((did, src, "x y z w"))  # 4 tokens each
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # equal target shares but b has 4x the tokens: a anchors (keeps all),
    # b thins to ~a's token count
    out = {
        r["source"]: r
        for r in PK.mixture_rebalance(docs, {"a": 0.5, "b": 0.5}).collect()
    }
    assert out["a"]["keep_fraction"] == 1.0
    assert out["a"]["kept_docs"] == 10
    assert abs(out["b"]["keep_fraction"] - 0.25) < 1e-9
    assert 0 < out["b"]["kept_docs"] < 40
    # deterministic: rerun returns identical counts
    again = {
        r["source"]: r["kept_docs"]
        for r in PK.mixture_rebalance(docs, {"a": 0.5, "b": 0.5}).collect()
    }
    assert again == {s: out[s]["kept_docs"] for s in out}


def test_mixture_rebalance_ignores_unweighted_sources(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x"), (2, "zz", "x y")],
        "doc_id long, source string, text string",
    )
    out = PK.mixture_rebalance(docs, {"a": 1.0}).collect()
    assert [r["source"] for r in out] == ["a"]


def test_chunk_documents_covers_all_tokens(spark):
    texts = [
        (0, " ".join(f"w{i}" for i in range(10))),
        (1, " ".join(f"x{i}" for i in range(7))),   # shorter than size
        (2, "single"),
        (3, " ".join(f"y{i}" for i in range(23))),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = PK.chunk_documents(docs, size=8, stride=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts:
        toks = text.split()
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # starts are 0, stride, ... while inside the doc
        assert [c["start"] for c in chunks] == list(range(0, len(toks), 5))
        # dense chunk indices
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            want = toks[c["start"]:c["start"] + 8]
            assert c["chunk_text"].split() == want
            assert c["n_tokens"] == len(want)
        # stride <= size -> every token appears in at least one chunk
        covered = set()
        for c in chunks:
            covered.update(range(c["start"], c["start"] + c["n_tokens"]))
        assert covered == set(range(len(toks)))


def test_chunk_documents_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "one two")],
        "doc_id long, text string",
    )
    out = PK.chunk_documents(docs, size=4).collect()
    # empty / whitespace-only / NULL text must emit NO phantom chunks
    assert sorted(r["doc_id"] for r in out) == [3]
    assert out[0]["chunk_text"] == "one two"


def test_chunk_documents_non_overlapping_partition(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["t"] * 17))], "doc_id long, text string"
    )
    out = sorted(
        PK.chunk_documents(docs, size=5).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # default stride == size: exact partition, last chunk short
    assert [r["n_tokens"] for r in out] == [5, 5, 5, 2]
    assert sum(r["n_tokens"] for r in out) == 17


def test_span_corruption_invariants(spark):
    from ena_database_build_spark.operators.packing import span_corruption
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    out = span_corruption(docs).collect()
    assert len(out) == 20
    for r in out:
        assert r.n_tokens == 40
        # ~15% mask rate, binomial spread over 40 tokens
        assert 0 <= r.n_masked <= 20
        # spans can't outnumber masked tokens; zero masked -> zero spans
        assert r.n_spans <= r.n_masked
        assert (r.n_masked == 0) == (r.n_spans == 0)
    # corpus-level rate close to 15%
    total = sum(r.n_masked for r in out) / sum(r.n_tokens for r in out)
    assert 0.08 < total < 0.22
    # deterministic across partitionings
    again = span_corruption(docs.repartition(7)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # changing the seed changes the corruption
    other = span_corruption(docs, seed="other").collect()
    assert {r.input_fp for r in other} != {r.input_fp for r in out}


def test_mixture_upsample_epochs(spark):
    from ena_database_build_spark.operators.packing import mixture_upsample
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], f"t{i}") for i in range(300)],
        "doc_id long, source string, text string",
    )
    up = mixture_upsample(docs, {"a": 3.0, "b": 0.5})
    agg = {r.source: r for r in up.groupBy("source").agg(
        F.count("*").alias("n"),
        F.count_distinct("doc_id").alias("d"),
    ).collect()}
    # integral epochs: exactly 3 copies of every 'a' doc
    assert agg["a"].n == 3 * 100 and agg["a"].d == 100
    # fractional: roughly half of 'b' docs, one copy each
    assert 30 <= agg["b"].n <= 70 and agg["b"].n == agg["b"].d
    # unlisted source: exactly one epoch
    assert agg["c"].n == 100 and agg["c"].d == 100
    # determinism across partitionings
    a = sorted(map(tuple, up.collect()))
    b = sorted(map(tuple, mixture_upsample(
        docs.repartition(13), {"a": 3.0, "b": 0.5}).collect()))
    assert a == b


def test_plan_batches_hand_computed(spark):
    """Power-of-two bucket assignment, capacity = budget/ceiling
    (clamped to 1 when a bucket's ceiling exceeds the budget),
    exact padding accounting, zero-token docs excluded."""
    from ena_database_build_spark.operators.packing import plan_batches

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         enumerate([1, 2, 3, 4, 7, 8, 9, 15, 16, 31, 32, 100, 101, 0])],
        "doc_id long, text string",
    )
    out = {r.batch_id: r for r in plan_batches(docs, budget=64).collect()}
    # bucket 6 (65..128 tokens): ceiling 128 > budget -> singletons
    b6 = [r for r in out.values() if r.len_bucket == 6]
    assert len(b6) == 2 and all(r.n_docs == 1 for r in b6)
    assert all(r.pad_len == 128 for r in b6)
    # bucket 3 (8..15): docs of 8, 9, 15 tokens -> cap 64/16 = 4, one
    # batch, waste = 3*16 - 32
    b3 = [r for r in out.values() if r.len_bucket == 3]
    assert len(b3) == 1 and b3[0].n_docs == 3
    assert b3[0].padding_waste == 3 * 16 - 32
    # every batch's invariant: waste = n_docs * pad_len - n_tokens >= 0
    for r in out.values():
        assert r.padding_waste == r.n_docs * r.pad_len - r.n_tokens
        assert r.padding_waste >= 0
    # zero-token doc 13 appears nowhere
    assert sum(r.n_docs for r in out.values()) == 13
