"""Unit tests for the corpus-curation operators (repetition stats,
PII redaction, TF-IDF ranking, decontamination)."""

import hashlib

from pyspark.sql import functions as F

from ena_database_build_spark.operators import curation as CUR


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),  # 4 toks, 2 distinct; bigrams: aa aa ab -> max 2
            (2, "w x y z"),  # no repetition; bigram max 1
            (3, "solo"),  # 1 token, partial bigram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CUR.repetition_stats(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.5
    assert out[1]["top_bigram_frac"] == 1.0  # 2 * 2 / 4
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 0.5  # 2 * 1 / 4
    assert out[3]["n_tokens"] == 1


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith@corp.example.org now"),
            (2, "host 192.168.1.7 then call 555-123-4567"),
            (3, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    counts = CUR.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            counts["phone"].alias("p"),
            CUR.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 0, 0)
    assert out[1]["red"] == "mail <EMAIL> now"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 1, 1)
    assert out[2]["red"] == "host <IP> then call <PHONE>"
    assert out[3]["red"] == "clean text with no identifiers"


def test_tfidf_ranking_integer_deterministic(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry date common"),
        ],
        "doc_id long, text string",
    )
    out = CUR.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 ranks first; 'common' (df=3) has idf 0
    assert by_doc[1][0]["term"] == "apple"
    assert by_doc[1][0]["tf"] == 2
    # every doc capped at k=2 rows
    assert all(len(v) == 2 for v in by_doc.values())
    # a term in every doc scores exactly 0
    common = [r for r in out if r["term"] == "common"]
    assert all(r["tfidf"] == 0.0 for r in common)
    # rank ties broken by rarity then term: doc 2's top is cherry
    # (tf=1 ties with banana/common; banana df=2, cherry df=2, common df=3
    #  -> banana before cherry alphabetically)
    assert [r["term"] for r in by_doc[2]] == ["banana", "cherry"]


def test_unigram_logprob_typical_beats_atypical(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "common common common"),
            (2, "common rare"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in CUR.unigram_logprob(docs).collect()
    }
    # corpus: common x4, rare x1, total 5
    p_common, p_rare = 4 / 5, 1 / 5
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["mean_logprob"] - math.log(p_common)) < 1e-5
    expect2 = (math.log(p_common) + math.log(p_rare)) / 2
    assert abs(out[2]["mean_logprob"] - expect2) < 1e-5
    # the all-common doc is more "typical" -> higher mean logprob
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"]


def test_bm25_shorter_doc_scores_higher(spark):
    # same tf for 'rare' in both docs; the shorter doc must score higher
    docs = spark.createDataFrame(
        [
            (1, "rare filler"),
            (2, "rare filler filler filler filler filler filler filler"),
            (3, "other words entirely unique"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): r["bm25"]
        for r in CUR.bm25_top_terms(docs, k=5).collect()
    }
    assert out[(1, "rare")] > out[(2, "rare")]
    # idf is identical, so the gap is purely length normalization
    assert out[(1, "rare")] > 0


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(
        [(1, "b a b"), (2, "a c"), (10, "a")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in CUR.inverted_index(docs).collect()}
    assert out["a"]["doc_freq"] == 3
    assert out["a"]["total_tf"] == 3
    # lexicographic sort of 'doc:first_pos' strings (':' > '0', so
    # '10:0' precedes '1:1')
    assert out["a"]["postings"] == "10:0|1:1|2:0"
    assert out["b"]["doc_freq"] == 1
    assert out["b"]["total_tf"] == 2
    assert out["b"]["postings"] == "1:0"


def test_phrase_search_consecutive_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data rocks"),  # match
            (2, "big and data"),  # words present but not consecutive
            (3, "big data big data"),  # two matches
            (4, "data big"),  # reversed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in CUR.phrase_search(docs, ["big", "data"]).collect()
    }
    assert out == {1: 1, 3: 2}


def _split_of(doc_id: int, seed: str = "decon", frac: float = 0.5) -> str:
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8]
    return "test" if h < format(int(frac * 16**8), "08x") else "train"


def test_decontaminate_matches_pure_python(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),  # shares the 5-gram prefix
        (3, "one two three four five six"),
        (4, "seven eight nine ten eleven twelve"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    frac = 0.5
    out = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_eval_docs"])
        for r in CUR.decontaminate(docs, k=5, eval_fraction=frac).collect()
    }

    def shingles(text, k=5):
        w = text.split()
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    split = {d: _split_of(d, frac=frac) for d, _ in rows}
    expected = {}
    for d, txt in rows:
        if split[d] != "train":
            continue
        shared, evals = set(), set()
        for e, etxt in rows:
            if split[e] != "test":
                continue
            ov = shingles(txt) & shingles(etxt)
            if ov:
                shared |= ov
                evals.add(e)
        if shared:
            expected[d] = (len(shared), len(evals))
    assert out == expected


def test_line_dedup_drops_boilerplate_and_preserves_order(spark):
    from ena_database_build_spark.operators.curation import line_dedup

    footer = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha one\n{footer}\nunique alpha two"),
            (2, f"{footer}\nunique beta"),
            (3, f"unique gamma\n{footer}"),
            (4, f"unique delta\n{footer}\n\n  \nunique delta two"),
            (5, "only unique content here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs, max_doc_freq=3).collect()}
    # footer appears in 4 docs > 3 -> dropped everywhere
    assert got[1].text == "unique alpha one\nunique alpha two"
    assert got[1].n_dropped == 1 and got[1].n_kept == 2
    assert got[2].text == "unique beta"
    assert got[3].text == "unique gamma"
    # blank lines vanish without counting as kept or dropped
    assert got[4].text == "unique delta\nunique delta two"
    assert got[4].n_kept == 2 and got[4].n_dropped == 1
    assert got[5].text == "only unique content here"
    assert got[5].n_dropped == 0


def test_line_dedup_regex_metachar_separator_is_literal(spark):
    """sep is a literal, not a Java regex (round-3 ADVICE #4): '|'
    used to split on the empty alternation (every character)."""
    from ena_database_build_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "keep me|common footer"),
            (2, "common footer|also unique"),
            (3, "common footer"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in line_dedup(docs, max_doc_freq=2, sep="|").collect()
    }
    assert got[1].text == "keep me" and got[1].n_dropped == 1
    assert got[2].text == "also unique"
    assert got[3].n_kept == 0 and got[3].text == ""


def test_decontaminate_bloom_prefilter_is_result_identical(spark):
    from ena_database_build_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon tok{i} zeta eta theta")
            for i in range(60)
        ]
        + [(100 + i, "alpha beta gamma delta epsilon tok3 zeta eta theta")
           for i in range(3)],
        "doc_id long, text string",
    )
    plain = decontaminate(docs, k=5, eval_fraction=0.3).collect()
    pre = decontaminate(
        docs, k=5, eval_fraction=0.3, bloom_prefilter=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, pre))
    assert plain, "fixture must produce contamination"


def test_span_dedup_removes_cross_doc_spans_only(spark):
    """Lee-et-al-style exact substring removal at k=4: a 4-gram shared
    by two docs strips its covering tokens from BOTH docs, unique
    text survives, sub-k docs are untouched, and a fully-duplicated
    doc empties out."""
    from ena_database_build_spark.operators.curation import span_dedup

    shared = "the quick brown fox"          # the duplicated 4-gram
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared}"),               # fully duplicated -> empty
            (3, "alpha beta gamma delta"),  # no shared 4-gram
            (4, "tiny doc"),                # sub-k: no gram, untouched
            (5, "the quick brown wolf ran away"),  # 3-token overlap only
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in span_dedup(docs, k=4).collect()}
    assert got[1].text == "alpha beta gamma delta"
    assert got[1].n_dropped == 4 and got[1].n_kept == 4
    assert got[2].text == "" and got[2].n_kept == 0
    assert got[3].text == "alpha beta gamma delta" and got[3].n_dropped == 0
    assert got[4].text == "tiny doc" and got[4].n_dropped == 0
    assert got[5].n_dropped == 0  # k-1 overlap is below the resolution


def test_span_dedup_matches_pure_python_randomized(spark):
    """Randomized differential: span_dedup vs a direct pure-Python
    implementation of 'mark every token covered by a k-gram appearing
    in >= min_docs distinct docs' on a seeded corpus with planted
    shared spans, repeats within one doc, and whitespace noise."""
    import random

    from ena_database_build_spark.operators.curation import span_dedup

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    shared_a = [rng.choice(vocab) for _ in range(6)]
    shared_b = [rng.choice(vocab) for _ in range(9)]
    rows = []
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if d % 4 == 0:
            at = rng.randint(0, len(words))
            words[at:at] = shared_a
        if d % 7 == 0:
            at = rng.randint(0, len(words))
            words[at:at] = shared_b
        sep = rng.choice([" ", "  ", " \t "])
        rows.append((d, sep.join(words)))
    k = 4
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_dedup(docs, k=k).collect()}

    # pure-python reference
    toks = {d: t.split() for d, t in rows if t.strip()}
    gram_docs = {}
    for d, ws in toks.items():
        for i in range(len(ws) - k + 1):
            gram_docs.setdefault(tuple(ws[i : i + k]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    for d, ws in toks.items():
        covered = [False] * len(ws)
        for i in range(len(ws) - k + 1):
            if tuple(ws[i : i + k]) in dup:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        assert got[d].n_kept == len(kept), d
        assert got[d].n_dropped == sum(covered), d
        assert got[d].text == " ".join(kept), d
    assert set(got) == set(toks)


def test_span_dedup_min_docs_threshold_path(spark):
    """min_docs > 2 takes the count+join fallback: a 4-gram shared by
    exactly two docs survives at min_docs=3; shared by three, it
    strips from all three."""
    from ena_database_build_spark.operators.curation import span_dedup

    pair = "one two three four"
    trio = "five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{pair} alpha"),
            (2, f"{pair} beta"),
            (3, f"{trio} gamma"),
            (4, f"{trio} delta"),
            (5, f"{trio} epsilon"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in span_dedup(docs, k=4, min_docs=3).collect()}
    assert got[1].text == f"{pair} alpha" and got[1].n_dropped == 0
    assert got[3].text == "gamma" and got[3].n_dropped == 4
    assert got[5].text == "epsilon"


def test_bigram_logprob_order_sensitivity(spark):
    """The conditional model separates natural from scrambled word
    order even with identical token multisets — the property the
    unigram score cannot have; hand-check the smoothed math on a
    2-doc corpus."""
    import math

    from ena_database_build_spark.operators.curation import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),
            (3, "sat the cat"),   # same tokens, scrambled order
            (4, "solo"),          # < 2 tokens: absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob(docs, k=0.5).collect()}
    assert 4 not in out
    assert out[1].n_bigrams == 2
    # natural order repeats its bigrams across docs 1-2 -> higher
    # conditional probability than doc 3's one-off transitions
    assert out[1].mean_logprob == out[2].mean_logprob
    assert out[1].mean_logprob > out[3].mean_logprob
    # exact check: V=4 ('the','cat','sat','solo').  'the cat' occurs
    # in all three docs (doc 3 contributes 'sat the', 'the cat'), so
    # C(the cat)=3, C(the .)=3; C(cat sat)=2, C(cat .)=2.  doc1 mean
    # = mean(ln(3.5/5), ln(2.5/4)).
    want = round((math.log(3.5 / 5.0) + math.log(2.5 / 4.0)) / 2, 6)
    assert abs(out[1].mean_logprob - want) < 1e-6


def test_line_dedup_matches_pure_python_randomized(spark):
    """Randomized differential: line_dedup vs a direct pure-Python
    model of 'drop lines whose trimmed fingerprint occurs in more
    than max_doc_freq DISTINCT docs' on a seeded corpus with planted
    boilerplate headers/footers, per-doc repeats (repeats within ONE
    doc must not count as extra docs), blank/whitespace lines, and
    leading/trailing spaces that the trim-normalized fingerprint must
    fold together."""
    import random

    from ena_database_build_spark.operators.curation import line_dedup

    rng = random.Random(31)
    pool = [f"line {i} body" for i in range(12)]
    header, footer = "SHARED HEADER", "(c) footer"
    rows = []
    for d in range(30):
        ls = []
        if d % 2 == 0:
            ls.append(rng.choice(["SHARED HEADER", " SHARED HEADER  "]))
        ls += [rng.choice(pool) for _ in range(rng.randint(0, 6))]
        if d % 3 == 0:
            ls.append(ls[-1] if ls else "dup me")  # in-doc repeat
        if d % 5 == 0:
            ls += ["", "   "]  # blank / whitespace-only
        if d % 4 == 0:
            ls.append(footer)
        rows.append((d, "\n".join(ls)))
    mdf = 3
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(docs, max_doc_freq=mdf).collect()}

    # pure-python model; a doc with NO non-blank line has no row to
    # rebuild from and is absent from the output (matching the oracle)
    doc_lines = {
        d: ls
        for d, t in rows
        if (ls := [l for l in t.split("\n") if l.strip() != ""])
    }
    fp_docs = {}
    for d, ls in doc_lines.items():
        for l in ls:
            fp_docs.setdefault(l.strip(), set()).add(d)
    for d, ls in doc_lines.items():
        kept = [l for l in ls if len(fp_docs[l.strip()]) <= mdf]
        dropped = len(ls) - len(kept)
        assert got[d].n_kept == len(kept), d
        assert got[d].n_dropped == dropped, d
        assert got[d].text == "\n".join(kept), d
    assert set(got) == set(doc_lines)
