"""Randomized brute-force differentials for the near-dup stack.

Each test replays the operator's documented semantics in plain Python
(hashlib md5, set algebra, union-find, numpy) on small random inputs
and requires exact agreement.  These pin the *portable* contracts the
DuckDB oracles rely on: the md5 hash family, the partial-shingle rule
for short docs, band grouping, and min-id component labelling.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from ena_database_build_spark.operators.cc import connected_components
from ena_database_build_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)

# ---------------------------------------------------------------------------
# python reference model (mirrors dedup.py's documented semantics)
# ---------------------------------------------------------------------------


def _ref_tokens(text: str) -> list[str]:
    # normalized_text: lowercase, collapse whitespace, trim.  Spark's
    # F.split("", " ") yields [""], same as "".split(" ") in python.
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _ref_shingles(text: str, k: int) -> set[str]:
    toks = _ref_tokens(text)
    n = max(len(toks) - k + 1, 1)  # short docs keep one partial shingle
    return {" ".join(toks[i : i + k]) for i in range(n)}


def _ref_minhash(text: str, num_hashes: int, k: int) -> list[str]:
    sh = _ref_shingles(text, k)
    return [
        min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
        for i in range(num_hashes)
    ]


def _ref_candidates(
    docs: list[tuple[int, str]], num_hashes: int, band_size: int, k: int
) -> set[tuple[int, int]]:
    sigs = {d: _ref_minhash(t, num_hashes, k) for d, t in docs}
    nbands = num_hashes // band_size
    pairs = set()
    ids = sorted(sigs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            for band in range(nbands):
                lo, hi = band * band_size, (band + 1) * band_size
                if sigs[a][lo:hi] == sigs[b][lo:hi]:
                    pairs.add((a, b))
                    break
    return pairs


def _random_corpus(seed: int, n_docs: int) -> list[tuple[int, str]]:
    # tiny vocabulary + doc cloning forces real shingle collisions;
    # mixed case and whitespace runs exercise the normalizer; short
    # docs (< k tokens) exercise the partial-shingle rule
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "EE"]
    docs = []
    for i in range(n_docs):
        if i >= 2 and rng.random() < 0.4:  # near-clone of an earlier doc
            base = _ref_tokens(docs[rng.randrange(i)][1])
            if base and rng.random() < 0.5:
                base[rng.randrange(len(base))] = rng.choice(vocab)
            words = base
        else:
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
        sep = "  " if rng.random() < 0.3 else " "
        docs.append((i, sep.join(words)))
    return docs


# ---------------------------------------------------------------------------
# minhash / LSH / jaccard
# ---------------------------------------------------------------------------


def test_minhash_signatures_match_python_md5(spark):
    docs = _random_corpus(seed=7, n_docs=12)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(6)]
        for r in minhash_signatures(df, num_hashes=6, k=3).collect()
    }
    want = {d: _ref_minhash(t, num_hashes=6, k=3) for d, t in docs}
    assert got == want


@pytest.mark.parametrize("seed,k", [(11, 2), (13, 3)])
def test_lsh_candidates_match_bruteforce_randomized(spark, seed, k):
    docs = _random_corpus(seed, n_docs=14)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = lsh_candidate_pairs(df, num_hashes=8, band_size=2, k=k)
    got = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert got == _ref_candidates(docs, num_hashes=8, band_size=2, k=k)


def test_jaccard_verify_matches_set_algebra_randomized(spark):
    docs = _random_corpus(seed=17, n_docs=14)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cands = lsh_candidate_pairs(df, num_hashes=8, band_size=2, k=3)
    out = jaccard_pairs(df, cands, k=3).collect()
    text = dict(docs)
    # one row per candidate pair, with the exact shingle-set jaccard
    assert len(out) == len({(r["left_id"], r["right_id"]) for r in out})
    assert {(r["left_id"], r["right_id"]) for r in out} == _ref_candidates(
        docs, num_hashes=8, band_size=2, k=3
    )
    for r in out:
        a = _ref_shingles(text[r["left_id"]], 3)
        b = _ref_shingles(text[r["right_id"]], 3)
        want = len(a & b) / len(a | b)
        assert r["jaccard"] == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# connected components vs union-find
# ---------------------------------------------------------------------------


def _ref_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(3, 30, 12), (5, 24, 40)])
def test_connected_components_match_union_find_randomized(
    spark, seed, n_nodes, n_edges
):
    """Sparse (many singleton/pair components) and dense (one giant
    component) random graphs, with self-loops and duplicate edges."""
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]
    edges.append((0, 0))  # self-loop: a node must still label itself
    df = spark.createDataFrame(edges, "left_id long, right_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=40).collect()
    }
    assert got == _ref_components(edges)


# ---------------------------------------------------------------------------
# cosine top-k vs numpy
# ---------------------------------------------------------------------------


def test_cosine_topk_matches_numpy_randomized(spark):
    import numpy as np

    from ena_database_build_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(29)
    mat = rng.normal(size=(40, 8))
    q = rng.normal(size=8)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = 5
    got = cosine_topk(df, [float(v) for v in q], k=k).collect()

    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(mat)), key=lambda i: (-sims[i], i))
    # exact id agreement is required only when the k-boundary gap is
    # real; random gaussians give gaps far above float noise
    assert abs(sims[order[k - 1]] - sims[order[k]]) > 1e-9
    assert [r["vec_id"] for r in got] == order[:k]
    for r in got:
        assert r["cos_sim"] == pytest.approx(sims[r["vec_id"]], abs=1e-9)


def test_batch_cosine_topk_matches_numpy_randomized(spark):
    import numpy as np

    from ena_database_build_spark.operators.similarity import batch_cosine_topk

    rng = np.random.default_rng(31)
    mat = rng.normal(size=(30, 6))
    qs = rng.normal(size=(4, 6))
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(len(mat))],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(j, [float(v) for v in qs[j]]) for j in range(len(qs))],
        "query_id long, qvec array<double>",
    )
    k = 4
    got = batch_cosine_topk(corpus, queries, k=k).collect()
    assert len(got) == k * len(qs)
    for j in range(len(qs)):
        sims = mat @ qs[j] / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qs[j]))
        order = sorted(
            range(len(mat)), key=lambda i: (-round(sims[i], 6), i)
        )
        mine = sorted(
            (r for r in got if r["query_id"] == j), key=lambda r: r["rank"]
        )
        assert abs(sims[order[k - 1]] - sims[order[k]]) > 1e-9
        assert [r["vec_id"] for r in mine] == order[:k]
