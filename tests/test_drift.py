"""PSI drift monitor (operators/drift.py): hand-computed index,
identical-distribution baseline, out-of-range clamping, new groups."""

import math

from ena_database_build_spark.operators.drift import psi_report


def _psi(rn, cn, bins=10):
    rt, ct = sum(rn), sum(cn)
    out = 0.0
    for a, b in zip(rn, cn):
        p = (a + 0.5) / (rt + bins * 0.5)
        q = (b + 0.5) / (ct + bins * 0.5)
        out += (p - q) * math.log(p / q)
    return round(out, 6)


def test_psi_identical_distribution_is_zero(spark):
    rows = [("a", float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = psi_report(df, df, "v", keys=["k"]).head()
    assert got.psi == 0.0 and got.n_ref == got.n_cur == 100


def test_psi_hand_computed_shift_and_clamp(spark):
    # ref: uniform over [0,10) -> bins 0..9 get 10 each
    ref = spark.createDataFrame(
        [("a", float(i) / 10) for i in range(100)], "k string, v double"
    )
    # cur: everything at 25.0, past the ref max -> clamps into bin 9
    cur = spark.createDataFrame(
        [("a", 25.0) for _ in range(50)], "k string, v double"
    )
    got = psi_report(ref, cur, "v", keys=["k"]).head()
    # ref bin counts: value spread over [0, 9.9]; bin = floor(v/9.9*10)
    rn = [0] * 10
    for i in range(100):
        v = i / 10
        rn[min(int(v / 9.9 * 10), 9)] += 1
    cn = [0] * 9 + [50]
    assert got.psi == _psi(rn, cn)
    assert got.n_ref == 100 and got.n_cur == 50


def test_psi_new_group_reports_null(spark):
    ref = spark.createDataFrame([("a", 1.0)], "k string, v double")
    cur = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "k string, v double"
    )
    got = {r.k: r for r in psi_report(ref, cur, "v", keys=["k"]).collect()}
    assert got["b"].psi is None
    assert got["b"].n_ref == 0 and got["b"].n_cur == 2
    assert got["a"].psi is not None


def test_psi_keyless_empty_reference_not_fail_open(spark):
    """Keyless with an empty reference snapshot must mirror the keyed
    new-group branch — true current count, psi NULL — not the
    fail-open (n_ref=0, n_cur=0, psi=0.0) verdict the all-NULL edges
    row used to produce."""
    ref = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    got = psi_report(ref, cur, "v").head()
    assert got.n_ref == 0 and got.n_cur == 3
    assert got.psi is None
    # and the normal keyless path is unchanged
    ok = psi_report(cur, cur, "v").head()
    assert ok.psi == 0.0 and ok.n_ref == ok.n_cur == 3


def test_psi_matches_pure_python_randomized(spark):
    """Randomized differential: psi_report vs a direct implementation
    of reference-anchored binning + Laplace smoothing on seeded data
    with out-of-range drift and uneven group sizes."""
    import random

    rng = random.Random(23)
    ref_rows, cur_rows = [], []
    for k in ("a", "b", "c"):
        base = rng.uniform(-5, 5)
        for _ in range(rng.randint(20, 60)):
            ref_rows.append((k, base + rng.uniform(0, 10)))
        shift = rng.uniform(-8, 8)
        for _ in range(rng.randint(10, 50)):
            cur_rows.append((k, base + shift + rng.uniform(0, 10)))
    ref = spark.createDataFrame(ref_rows, "k string, v double")
    cur = spark.createDataFrame(cur_rows, "k string, v double")
    got = {
        r.k: (r.n_ref, r.n_cur, r.psi)
        for r in psi_report(ref, cur, "v", keys=["k"], bins=10).collect()
    }

    for k in ("a", "b", "c"):
        rv = [v for g, v in ref_rows if g == k]
        cv = [v for g, v in cur_rows if g == k]
        mn, mx = min(rv), max(rv)

        def bin_of(x):
            if mx <= mn:
                return 0
            return max(min(int((x - mn) / (mx - mn) * 10), 9), 0)

        rn, cn = [0] * 10, [0] * 10
        for x in rv:
            rn[bin_of(x)] += 1
        for x in cv:
            cn[bin_of(x)] += 1
        assert got[k][:2] == (len(rv), len(cv))
        assert got[k][2] == _psi(rn, cn)
