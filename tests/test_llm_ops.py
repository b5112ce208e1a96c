"""Unit tests for the LLM-data-pipeline extension operators
(SURVEY.md §2.11): dedup, similarity, text analysis, multimodal."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import cc as CCOMP
from ena_database_build_spark.operators import dedup as D
from ena_database_build_spark.operators import kmeans as KM
from ena_database_build_spark.operators import multimodal as M
from ena_database_build_spark.operators import sampling as SMP
from ena_database_build_spark.operators import similarity as SIM
from ena_database_build_spark.operators import textstats as T

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (4, "completely different words appear here nothing shared at all"),
    (5, "  The  QUICK brown fox jumps over the lazy dog "),  # dup modulo norm
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_stable_winner(spark):
    out = D.exact_dedup(_docs(spark))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4]


def test_minhash_identical_docs_same_signature(spark):
    sigs = {
        r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
        for r in D.minhash_signatures(_docs(spark), num_hashes=4).collect()
    }
    assert sigs[1] == sigs[2] == sigs[5]
    assert sigs[1] != sigs[4]


def test_lsh_candidates_and_jaccard(spark):
    docs = _docs(spark)
    pairs = D.lsh_candidate_pairs(docs, num_hashes=4, band_size=1, k=2)
    got = {(r["left_id"], r["right_id"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always collide
    assert (1, 3) in got  # near dups share a band with high probability
    jac = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in D.jaccard_pairs(docs, pairs, k=2).collect()
    }
    assert jac[(1, 2)] == 1.0
    assert 0.0 < jac[(1, 3)] < 1.0


def test_simhash_properties(spark):
    out = {
        r["doc_id"]: r["sh"]
        for r in _docs(spark)
        .select("doc_id", D.simhash16(F.col("text")).alias("sh"))
        .collect()
    }
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in out.values())
    assert out[1] == out[2] == out[5]
    # near-dup hamming distance < far-pair hamming distance
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(out[1], out[3]) < ham(out[1], out[4])


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_orders_by_similarity(spark):
    out = SIM.cosine_topk(_vectors(spark), [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 4]
    assert abs(out[0]["cos_sim"] - 1.0) < 1e-12


def test_srp_bucket_topk_subset_of_bruteforce(spark):
    vecs = _vectors(spark)
    q = [1.0, 0.0, 0.0, 0.0]
    approx = SIM.srp_bucket_topk(vecs, q, dim=4, k=5, bits=2).collect()
    brute = {r["vec_id"]: r["cos_sim"] for r in SIM.cosine_topk(vecs, q, k=5).collect()}
    for r in approx:
        assert abs(brute[r["vec_id"]] - r["cos_sim"]) < 1e-12
    # the opposite vector lands in a different bucket
    assert 3 not in {r["vec_id"] for r in approx}


def test_knn_join(spark):
    vecs = _vectors(spark)
    out = SIM.knn_join_bruteforce(vecs, vecs, k=2).collect()
    by_left = {}
    for r in out:
        by_left.setdefault(r["left_id"], []).append(r["right_id"])
    # nearest neighbor of each vector is itself (cos=1)
    for left, rights in by_left.items():
        assert rights[0] == left


def test_knn_join_guard_rejects_large_inputs(spark):
    """The documented-quadratic utility must refuse inputs above
    max_rows instead of silently planning an at-scale cross join;
    raising max_rows is the explicit opt-in."""
    import pytest

    vecs = _vectors(spark)
    with pytest.raises(ValueError, match="quadratic"):
        SIM.knn_join_bruteforce(vecs, vecs, k=2, max_rows=2)
    # explicit opt-in still works
    assert SIM.knn_join_bruteforce(vecs, vecs, k=1, max_rows=100).count()


def test_detect_lang(spark):
    rows = [
        (1, "the cat and the dog sat in a house of bricks"),
        (2, "el perro y la casa de los amigos en la ciudad"),
        (3, "der hund und die katze ist nicht in das haus"),
        (4, "xyzzy plugh qwertz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", T.detect_lang(F.col("text")).alias("lang")).collect()
    }
    assert out == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! This is a test sentence with 42 tokens?")],
        "doc_id long, text string",
    )
    row = df.select(
        T.whitespace_token_count(F.col("text")).alias("ws"),
        T.regexp_token_count(F.col("text")).alias("re"),
        T.quality_score(F.col("text")).alias("q"),
    ).head()
    assert row["ws"] == 10
    # 9 words + the number 42 + 3 punctuation marks
    assert row["re"] == 13
    assert 0.0 <= row["q"] <= 1.0


def test_quality_score_null_text_is_0375(spark):
    """r13 regression (caught by the nulls sweep axis): `aggregate`
    over a NULL token array short-circuits WITHOUT running the finish
    lambda, but the pre-fold composition — and the DuckDB oracle —
    score NULL text as (1.0 + 0.0 + 0.0 + 0.5)/4 = 0.375 because
    least/greatest skip NULL operands.  The explicit NULL branch must
    keep that value."""
    df = spark.createDataFrame(
        [(1, None), (2, "some ordinary text")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", T.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert out[1] == 0.375
    assert out[2] is not None and 0.0 <= out[2] <= 1.0


def test_multimodal_decode_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in M.decode_media(M.attach_binary_payload(docs)).collect()
    }
    assert out[1]["payload_bytes"] == 11
    assert out[1]["width"] == 64 + 11 % 64
    assert out[1]["height"] == 64
    assert len(out[1]["payload_digest"]) == 32
    assert out[2]["payload_bytes"] == 0 and out[2]["width"] == 0


def test_multimodal_feature_extract_feeds_similarity(spark):
    """Feature extraction yields a fixed-dim float embedding that the
    existing similarity stack consumes unchanged; no-content payloads
    produce the zero vector."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "")],
        "doc_id long, text string",
    )
    feats = M.extract_features(M.attach_binary_payload(docs))
    rows = {r["doc_id"]: list(r["feature"]) for r in feats.collect()}
    assert all(len(v) == M.FEATURE_DIM for v in rows.values())
    assert rows[1] == rows[2] != rows[3]  # content-deterministic
    assert rows[3] == [0.0] * M.FEATURE_DIM
    assert abs(sum(rows[1]) - 1.0) < 1e-6  # normalized histogram
    # identical payloads land in one SRP bucket and score cosine 1
    b = SIM.srp_buckets(
        feats.select("doc_id", F.col("feature").alias("embedding")),
        dim=M.FEATURE_DIM,
        bits=3,
        id_col="doc_id",
    )
    buckets = {r["doc_id"]: r["bucket"] for r in b.collect()}
    assert buckets[1] == buckets[2]


def test_multimodal_resize_bounds_payloads(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in M.resize_media(
            M.attach_binary_payload(docs), target_bytes=8
        ).collect()
    }
    assert out[1] == b"x" * 8          # truncated
    assert out[2] == b"abababab"       # cycled up to size
    assert out[3] == b""               # empty stays empty


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame([(1, "x" * 25)], "doc_id long, text string")
    frames = M.frame_sample_plan(
        M.attach_binary_payload(docs), every_n=10
    ).collect()
    # 26 frames (25 % 300 + 1) sampled every 10 -> indices 0, 10, 20
    assert [r["frame_idx"] for r in frames] == [0, 10, 20]


def test_embedding_near_dup_via_srp_buckets(spark):
    """Near-identical embeddings land in the same SRP bucket, so the
    bucketed near-dup join finds them without a cross product."""
    rows = [
        (0, [1.0, 0.2, -0.3, 0.8]),
        (1, [0.99, 0.21, -0.29, 0.81]),  # near-dup of 0
        (2, [-0.5, 0.9, 0.4, -0.7]),
        (3, [0.1, -0.8, 0.6, 0.2]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = SIM.srp_buckets(vecs, dim=4, bits=3)
    buckets = {r["vec_id"]: r["bucket"] for r in b.collect()}
    assert buckets[0] == buckets[1]
    l = b.select(
        F.col("vec_id").alias("left_id"),
        F.col("embedding").alias("lv"),
        F.col("bucket"),
    )
    r = b.select(
        F.col("vec_id").alias("right_id"),
        F.col("embedding").alias("rv"),
        F.col("bucket"),
    )
    pairs = (
        l.join(r, "bucket")
        .where(F.col("left_id") < F.col("right_id"))
        .select(
            "left_id",
            "right_id",
            SIM.cosine(
                F.col("lv").cast("array<double>"), F.col("rv").cast("array<double>")
            ).alias("cos"),
        )
        .where(F.col("cos") >= 0.95)
    )
    got = [(r["left_id"], r["right_id"]) for r in pairs.collect()]
    assert got == [(0, 1)]


def test_srp_multiprobe_recovers_boundary_neighbor(spark):
    """A vector close to one hyperplane lands one bucket-bit away from
    its near neighbor; probe_bits=1 must recover it while probe_bits=0
    documents the miss."""
    planes = [SIM._srp_plane(p, 4) for p in range(3)]

    def bucket_of(v):
        return "".join(
            "1" if sum(a * b for a, b in zip(v, pl)) >= 0 else "0"
            for pl in planes
        )

    q = [1.0, 0.2, -0.3, 0.8]
    qb = bucket_of(q)
    # flip the query's smallest-margin plane: nudge along that plane's
    # normal until exactly one bucket bit differs
    import itertools

    neighbor = None
    for eps in (x / 50.0 for x in range(1, 200)):
        for signs in itertools.product((1, -1), repeat=3):
            cand = [
                vi + eps * sum(s * pl[i] for s, pl in zip(signs, planes))
                for i, vi in enumerate(q)
            ]
            hd = sum(a != b for a, b in zip(bucket_of(cand), qb))
            if hd == 1:
                neighbor = cand
                break
        if neighbor:
            break
    assert neighbor is not None
    vecs = spark.createDataFrame(
        [(0, [float(x) for x in neighbor]), (1, [-0.5, 0.9, 0.4, -0.7])],
        "vec_id long, embedding array<float>",
    )
    miss = SIM.srp_bucket_topk(vecs, q, dim=4, k=5, bits=3, probe_bits=0)
    hit = SIM.srp_bucket_topk(vecs, q, dim=4, k=5, bits=3, probe_bits=1)
    assert 0 not in [r["vec_id"] for r in miss.collect()]
    assert 0 in [r["vec_id"] for r in hit.collect()]


def test_probe_buckets_enumeration(spark):
    assert SIM.probe_buckets("1010", 0) == ["1010"]
    one = SIM.probe_buckets("1010", 1)
    assert len(one) == 5 and "1010" in one and "0010" in one
    two = SIM.probe_buckets("1010", 2)
    assert len(two) == 1 + 4 + 6  # C(4,0) + C(4,1) + C(4,2)
    # the column form must enumerate exactly the Hamming<=1 set
    df = spark.createDataFrame([("1010",)], "b string")
    got = sorted(
        df.select(
            F.explode(SIM.probe_buckets_col(F.col("b"), 4)).alias("p")
        ).toPandas()["p"]
    )
    assert got == one


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 (transitive: 1,3 never share an edge), island 7-8,
    # 5-6 pair; labels must be the min id of each component
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (5, 6)], "left_id long, right_id long"
    )
    got = {
        r["node"]: r["component"]
        for r in CCOMP.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7}


def test_connected_components_long_path_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter 11)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "left_id long, right_id long"
    )
    got = CCOMP.connected_components(edges)
    assert {r["component"] for r in got.collect()} == {1}
    assert got.count() == 12


def test_near_dedup_keeps_min_id_per_cluster(spark):
    out = CCOMP.near_dedup(_docs(spark), threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1,2,5 are one cluster (exact dups modulo norm), 3 is a near dup
    # of them at jaccard>=0.5 on 2-shingles; 4 is alone
    assert 1 in kept and 4 in kept
    assert 2 not in kept and 5 not in kept


def test_near_dedup_degenerate_docs(spark):
    """No-content docs are excluded from the exact-collapse (round-3
    ADVICE #1): NULL-text docs yield zero shingle rows so LSH never
    pairs them — ALL must survive, not be collapsed to one — while
    whitespace-only docs share the '' shingle and dedup through the
    LSH pipeline itself (min id wins).  Sub-k-token identical docs
    emit their partial shingle, so they exact-collapse safely."""
    docs = spark.createDataFrame(
        [
            (1, None),            # NULL content: survives
            (2, None),            # NULL content: survives
            (3, "   "),           # whitespace: LSH-dedups vs 4
            (4, "\t \n"),         # whitespace: loses to 3
            (5, "tok"),           # sub-k identical pair: collapse
            (6, "tok"),           #   keeps min id 5
            (7, "w x y z a b c"), # normal unique doc
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in CCOMP.near_dedup(docs, threshold=0.5, k=2).collect()
    )
    assert kept == [1, 2, 3, 5, 7]


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs around (0,0) and (10,10); seeds (ids 0,1) start
    # one in each blob, so 2 Lloyd rounds must separate them cleanly
    vecs = [
        (0, [0.1, 0.0]), (2, [0.0, 0.2]), (4, [0.2, 0.1]),
        (1, [10.0, 9.9]), (3, [9.8, 10.1]), (5, [10.2, 10.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents, assigned = KM.kmeans_train(df, k=2, max_iter=2)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    assert abs(cents[0][0] - 0.1) < 1e-9 and abs(cents[1][0] - 10.0) < 1e-9


def test_hash_sample_deterministic_and_partition_free(spark):
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = SMP.hash_sample(docs, 0.3, id_col="doc_id", seed="x")
    b = SMP.hash_sample(docs.repartition(7), 0.3, id_col="doc_id", seed="x")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())
    assert 200 < len(ids_a) < 400  # ~30%


def test_train_test_split_disjoint_and_growth_stable(spark):
    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"] for r in SMP.train_test_split(small).collect()}
    g = {r["doc_id"]: r["split"] for r in SMP.train_test_split(big).collect()}
    assert all(g[k] == v for k, v in s.items())  # split stable under growth
    assert set(s.values()) == {"train", "test"}


def test_stratified_sample_exact_n(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(40)],
        "doc_id long, grp string",
    )
    out = SMP.stratified_sample(df, ["grp"], 5)
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 5, "b": 5}


def test_hash_sample_weighted(spark):
    """Per-row keep probability: weight 1 always keeps, 0/NULL never,
    fractional weights land near their expectation; decisions are a
    pure function of (seed, id) — partition-independent."""
    import hashlib

    rows = [
        (i, 1.0 if i < 100 else (0.0 if i < 200 else 0.5))
        for i in range(1200)
    ]
    rows.append((9999, None))
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = sorted(
        r["doc_id"] for r in SMP.hash_sample_weighted(df, "w").collect()
    )
    assert all(i in kept for i in range(100))          # w=1 kept
    assert all(i not in kept for i in range(100, 200))  # w=0 dropped
    assert 9999 not in kept                             # NULL dropped
    half = [i for i in kept if i >= 200]
    assert 380 < len(half) < 620                        # ~50% of 1000
    # exact per-row model: first 8 md5 hex digits vs w * 16^8
    for i in (200, 201, 202, 203, 204):
        h = int(hashlib.md5(f"|{i}".encode()).hexdigest()[:8], 16)
        assert (i in kept) == (h < 0.5 * 16**8)
    # partition independence
    again = sorted(
        r["doc_id"]
        for r in SMP.hash_sample_weighted(df.repartition(13), "w").collect()
    )
    assert again == kept


def test_exact_n_sample(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = SMP.exact_n_sample(df, 50)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert len(ids) == 50
    # deterministic: same 50 under any partitioning; oversized n = all
    ids2 = sorted(
        r["doc_id"]
        for r in SMP.exact_n_sample(df.repartition(7), 50).collect()
    )
    assert ids2 == ids
    assert SMP.exact_n_sample(df, 10_000).count() == 500


def test_dedup_incremental_semantics(spark):
    from ena_database_build_spark.operators.dedup import dedup_incremental

    existing = spark.createDataFrame(
        [(1, "Alpha  beta"), (2, "gamma")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha beta"),   # dup of existing (normalized) -> dropped
            (11, "delta"),        # fresh -> kept
            (12, "delta"),        # in-batch dup, higher id -> dropped
            (13, "GAMMA"),        # dup of existing -> dropped
            (14, "epsilon"),      # fresh -> kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_incremental(incoming, existing).collect()
    )
    assert kept == [11, 14]
    # NULL text fingerprints as '' so idempotence survives NULL rows
    existing_n = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    incoming_n = spark.createDataFrame(
        [(10, None), (11, None), (12, "delta")],
        "doc_id long, text string",
    )
    kept_n = sorted(
        r["doc_id"]
        for r in dedup_incremental(incoming_n, existing_n).collect()
    )
    assert kept_n == [12]
    # idempotent: re-ingesting the kept batch against existing+kept drops all
    kept_df = dedup_incremental(incoming, existing)
    rerun = dedup_incremental(kept_df, existing.unionByName(kept_df))
    assert rerun.count() == 0


def test_dedup_incremental_null_id_never_beats_real_id(spark):
    """Ids are the dedup identity and the contract is min-id-wins:
    NULLS FIRST ordering would let a NULL-id row win its fingerprint."""
    from ena_database_build_spark.operators.dedup import dedup_incremental

    existing = spark.createDataFrame([], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(None, "alpha"), (5, "alpha"), (7, "beta")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_incremental(incoming, existing).collect()
    )
    assert kept == [5, 7]


def test_near_dedup_incremental(spark):
    """Incoming docs near-matching the corpus drop; survivors
    near-dedup among themselves with min-id cluster winners; exact
    members of neither pass through."""
    from ena_database_build_spark.operators.cc import near_dedup_incremental

    existing = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "a b c d e f g h i k"),   # near-dup of corpus doc 1 -> drop
            (11, "q r s t u v w x y z"),   # fresh -> keep
            (12, "q r s t u v w x y a"),   # near-dup of 11, higher id -> drop
            (13, "m n o p m n o p m n"),   # unique -> keep
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in near_dedup_incremental(incoming, existing).collect()
    )
    assert kept == [11, 13]
    # a later batch matching an already-kept doc drops against the
    # grown corpus
    batch2 = spark.createDataFrame(
        [(20, "q r s t u v w x y b"), (21, "totally new words appear here")],
        "doc_id long, text string",
    )
    corpus2 = existing.unionByName(
        incoming.where(F.col("doc_id").isin(11, 13))
    )
    kept2 = sorted(
        r["doc_id"]
        for r in near_dedup_incremental(batch2, corpus2).collect()
    )
    assert kept2 == [21]


def test_hash_sample_fraction_just_below_one_keeps_width(spark):
    """fraction = 1 - 2^-53 must not overflow the 8-hex-digit threshold
    (a 9-digit '100000000' breaks the fixed-width compare and drops
    most rows)."""
    thr = SMP._hex_threshold(1 - 2**-53)
    assert len(thr) == 8 and thr == "ffffffff"
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    n = SMP.hash_sample(docs, 1 - 2**-53, id_col="doc_id").count()
    assert n >= 199  # keeps (essentially) everything; never collapses


def test_indexed_incremental_near_dedup_matches_direct(spark):
    from ena_database_build_spark.operators.cc import (
        band_index,
        near_dedup_incremental,
        near_dedup_incremental_indexed,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(40):
        rows.append((i, f"{base} unique{i} widget{i}"))
    # near-dups of doc 3 and doc 7 (small perturbations), plus exact
    # copies of doc 5
    rows += [
        (100, f"{base} unique3 gadget"),
        (101, f"{base} unique7 gadget"),
        (102, f"{base} unique5 widget5"),
        (103, f"{base} unique5 widget5"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    incoming = docs.where("doc_id >= 100 OR doc_id % 4 = 0")
    existing = docs.where("doc_id < 100 AND doc_id % 4 <> 0")
    direct = sorted(
        r.doc_id
        for r in near_dedup_incremental(incoming, existing, k=2).collect()
    )
    idx = band_index(existing, k=2)
    indexed = sorted(
        r.doc_id
        for r in near_dedup_incremental_indexed(
            incoming, existing, idx, k=2
        ).collect()
    )
    assert direct == indexed
    assert direct, "fixture must keep at least one survivor"
    assert len(direct) < incoming.count(), "fixture must drop something"


def test_weighted_sample_n_properties(spark):
    from collections import Counter

    from ena_database_build_spark.operators.sampling import (
        weighted_sample_n,
    )

    rows = [(i, 100 if i < 20 else 1) for i in range(420)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = [
        r.doc_id for r in weighted_sample_n(df, 40, "w").collect()
    ]
    assert len(picked) == len(set(picked)) == 40  # without replacement
    # the 20 heavy rows carry 2000/2400 of the weight: expect most in
    heavy = sum(1 for i in picked if i < 20)
    assert heavy >= 15
    # deterministic across partitionings
    again = [
        r.doc_id
        for r in weighted_sample_n(df.repartition(9), 40, "w").collect()
    ]
    assert sorted(picked) == sorted(again)
    # zero/NULL weights never qualify
    df2 = spark.createDataFrame(
        [(1, 0), (2, None), (3, 5)], "doc_id long, w long"
    )
    assert [r.doc_id for r in weighted_sample_n(df2, 3, "w").collect()] == [3]


def test_temperature_rebalance_flattens_groups(spark):
    """XLM-R temperature sampling: the rarest group keeps everything,
    the majority group sheds toward (n/n_min)^(alpha-1); alpha=1 is a
    no-op; decisions are deterministic across partitionings."""
    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = SMP.temperature_rebalance(df, "lang", alpha=0.5)
    by = {r.lang: r.n for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert by["small"] == 25                 # rate 1: all kept
    # big rate = (400/25)^-0.5 = 0.25 -> ~100 kept (hash variance)
    assert 60 <= by["big"] <= 140
    # alpha = 1 keeps everything
    assert SMP.temperature_rebalance(df, "lang", alpha=1.0).count() == 425
    # partition-independent determinism
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id
        for r in SMP.temperature_rebalance(
            df.repartition(13), "lang", alpha=0.5
        ).collect()
    )
    assert a == b


def test_temperature_rebalance_null_groups_pass_through(spark):
    """NULL groups have no identity to rebalance by: they pass
    through unchanged AND are excluded from the counts, so a tiny
    NULL cohort can never become n_min and inflate every real
    group's shed rate."""
    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "small") for i in range(25)]
        + [(2000, None), (2001, None)]  # 2-row NULL cohort
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = SMP.temperature_rebalance(df, "lang", alpha=0.5)
    by = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # NULLs pass through, small stays n_min and keeps everything
    assert by.get(None) == 2
    assert by["small"] == 25
    # big still sheds at (400/25)^-0.5, NOT (400/2)^-0.5 (~28 kept)
    assert 60 <= by["big"] <= 140


def test_near_dedup_best_keeps_highest_quality(spark):
    """Quality-aware survivor policy: the longest/best-scored member
    of each near-dup cluster wins (ties -> min id); unique docs pass
    through; NULL quality never beats a scored row; exact-dup groups
    collapse to their best member first."""
    docs = spark.createDataFrame(
        [
            # near-dup cluster: 2 is the longest -> wins despite max id
            (1, "a b c d e f g h", 8),
            (2, "a b c d e f g h i j", 10),
            (3, "a b c d e f g x", 8),
            # exact-dup pair: same text, higher quality (9) wins
            (10, "p q r s t u v w", 3),
            (11, "p q r s t u v w", 9),
            # unique
            (20, "totally different words here now", 5),
            # NULL quality loses to its scored exact twin
            (30, "m n o p q r s t", None),
            (31, "m n o p q r s t", 1),
        ],
        "doc_id long, text string, quality int",
    )
    out = CCOMP.near_dedup_best(docs, "quality", threshold=0.5, k=2)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 11, 20, 31]


def test_perceptual_hash_collision_structure(spark):
    """Identical payloads hash equal; histogram-near payloads differ
    in few bits; empty payload is all zeros; the bit rule is the
    integer 16*count > total comparison."""
    docs = spark.createDataFrame(
        [
            (1, "aaaabbbbccccdddd"),
            (2, "aaaabbbbccccdddd"),       # identical -> equal hash
            (3, "aaaabbbbcccceeee"),       # one histogram bin moved
            (4, ""),                        # empty -> all zeros
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.phash
        for r in M.perceptual_hash(M.attach_binary_payload(docs)).collect()
    }
    assert all(len(v) == M.PHASH_BITS for v in out.values())
    assert out[1] == out[2]
    assert out[4] == "0" * M.PHASH_BITS
    ham = sum(a != b for a, b in zip(out[1], out[3]))
    assert 0 < ham <= 4  # near payloads stay hamming-close


def test_grouped_split_no_leakage(spark):
    """Every row of a group lands in ONE split (the property a
    row-hashed split violates); NULL groups default to train."""
    rows = [(u, e) for u in range(50) for e in range(4)] + [(None, 999)]
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    out = SMP.grouped_split(df, "user_id", test_fraction=0.4)
    per_user = (
        out.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count_distinct("split").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_user)
    splits = {r.split for r in out.collect()}
    assert splits == {"train", "test"}
    assert (
        out.where(F.col("user_id").isNull()).head().split == "train"
    )


def test_simhash_candidates_complete_within_radius(spark):
    """The banded join must surface EVERY pair within the Hamming
    radius (pigeonhole over 4 bands), with the exact distance
    attached; far pairs with no shared band never appear."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.left_id, r.right_id): r.hamming
        for r in D.simhash_candidates(
            docs, bands=4, max_hamming=3, width=32
        ).collect()
    }
    # exact dups (1,2,5 modulo norm) are hamming 0 of each other
    assert got[(1, 2)] == 0 and got[(1, 5)] == 0 and got[(2, 5)] == 0
    # brute-force reference: every pair within radius 3 must be present
    sigs = {
        r.doc_id: r.simhash
        for r in D.simhash_signatures(docs, width=32).collect()
    }
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if h <= 3:
                assert got[(a, b)] == h, (a, b)
            else:
                assert (a, b) not in got or got[(a, b)] > 3


def test_edit_distance1_pairs_exact(spark):
    """The position-keyed deletion join is EXACT at radius 1:
    substitutions and indels pair, transpositions (ed 2) never do,
    and the output matches a brute-force Levenshtein-1 sweep."""
    words = ["cat", "bat", "cart", "dog", "dogs", "ab", "ba",
             "hello", "hallo", "hell"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        (r.left, r.right): r.kind
        for r in D.edit_distance1_pairs(df, "w").collect()
    }

    def ed1(a, b):
        if a == b:
            return None
        la, lb = len(a), len(b)
        if la == lb:
            return "sub" if sum(x != y for x, y in zip(a, b)) == 1 else None
        if abs(la - lb) != 1:
            return None
        lo, hi = (a, b) if la < lb else (b, a)
        for i in range(len(hi)):
            if hi[:i] + hi[i + 1:] == lo:
                return "indel"
        return None

    want = {}
    ws = sorted(set(words))
    for i, a in enumerate(ws):
        for b in ws[i + 1:]:
            k = ed1(a, b)
            if k:
                want[(a, b)] = k
    assert got == want
    assert ("ab", "ba") not in got  # transposition stays out


def test_temperature_rebalance_matches_python_hash(spark):
    """The kept set is a pure function of (seed, id, group rates):
    recompute every Bernoulli decision in Python from the same md5
    axis and rate formula and require the identical row set."""
    import hashlib

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(240)] + [
        (1000 + i, "rare") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    alpha = 0.5
    got = sorted(
        r.doc_id
        for r in SMP.temperature_rebalance(
            df, "lang", alpha=alpha, seed="tt"
        ).collect()
    )
    counts = {}
    for _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    nmin = min(counts.values())
    want = []
    for i, g in rows:
        rate = min(1.0, (counts[g] / nmin) ** (alpha - 1.0))
        u = int(hashlib.md5(f"tt|{i}".encode()).hexdigest()[:8], 16)
        if u < rate * 16**8:
            want.append(i)
    assert got == sorted(want)


def test_shingles_array_matches_shingle_rows(spark):
    # the array utility and the relational path must agree as SETS per
    # doc, including docs shorter than k (single partial shingle) and
    # blank docs — and slice-based composition must not raise past the
    # array end (element_at would, under ANSI semantics)
    rows = [
        (1, "a b c d e"),
        (2, "x y"),
        (3, ""),
        (4, "   "),
        (5, "one"),
        (6, "a a a a"),
        (7, " pad  multi   space "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_array = {
        r.doc_id: set(r.s)
        for r in df.select(
            "doc_id", D.shingles(F.col("text")).alias("s")
        ).collect()
    }
    via_rows = {}
    for r in D.shingle_rows(df, k=3, distinct=True).collect():
        via_rows.setdefault(r.doc_id, set()).add(r.shingle)
    assert via_array == via_rows
