"""Property differentials for the bucketed range/interval joins
(round 9): brute-force python models on random small-domain inputs,
swept across bucket widths.

The width sweep matters more than the row count: bucketing must be a
pure physical choice (every width yields the same relation), and the
emit-once rule of the overlap join (pair kept only in the bucket of
the later start) is exactly the kind of invariant a fixture corpus
can pass by luck.  Domains are small so interval/point collisions,
zero-length intervals, and bucket-boundary endpoints are routine.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ena_database_build_spark.operators import rangejoin as RJ

pos = st.integers(min_value=0, max_value=20)
points = st.lists(st.tuples(st.integers(0, 99), pos), min_size=0,
                  max_size=10)
# (id, start, length) -> intervals with start <= end by construction
intervals = st.lists(
    st.tuples(st.integers(0, 99), pos, st.integers(0, 6)),
    min_size=0, max_size=10,
)
width = st.sampled_from([1, 3, 7, 50])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=points, ivs=intervals, w=width)
def test_range_join_matches_brute_force(spark, pts, ivs, w):
    pdf = spark.createDataFrame(
        pts or [(None, None)], "pid long, p long"
    )
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in ivs] or [(None, None, None)],
        "iid long, s long, e long",
    )
    if not pts:
        pdf = pdf.where("pid is not null")
    if not ivs:
        idf = idf.where("iid is not null")
    got = sorted(
        (r["pid"], r["p"], r["iid"])
        for r in RJ.range_join(pdf, idf, "p", "s", "e", bucket_width=w)
        .collect()
    )
    want = sorted(
        (pid, p, iid)
        for pid, p in pts
        for iid, s, ln in ivs
        if s <= p <= s + ln
    )
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(livs=intervals, rivs=intervals, w=width)
def test_interval_overlap_join_emit_once(spark, livs, rivs, w):
    ldf = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in livs] or [(None, None, None)],
        "lid long, ls long, le long",
    )
    rdf = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in rivs] or [(None, None, None)],
        "rid long, rs long, re long",
    )
    if not livs:
        ldf = ldf.where("lid is not null")
    if not rivs:
        rdf = rdf.where("rid is not null")
    got = sorted(
        (r["lid"], r["ls"], r["rid"], r["rs"])
        for r in RJ.interval_overlap_join(
            ldf, rdf, "ls", "le", "rs", "re", bucket_width=w
        ).collect()
    )
    want = sorted(
        (lid, ls, rid, rs)
        for lid, ls, ll in livs
        for rid, rs, rl in rivs
        if ls <= rs + rl and rs <= ls + ll
    )
    # exact list equality doubles as the EMIT-ONCE check: a pair
    # surviving in two buckets would appear twice in `got`
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=points, ivs=intervals, w=st.sampled_from([None, 1, 5, 50]))
def test_coverage_at_points_matches_brute_force(spark, pts, ivs, w):
    """The count-only sweep (probes as zero-delta boundaries) against
    per-point brute-force containment counting, across the global-
    window form (bucket_width=None) and three bucket widths — every
    variant must read the same coverage, including 0 for uncovered
    points and duplicate probe positions counted once each."""
    if not pts:
        return
    pdf = spark.createDataFrame(pts, "pid long, p long")
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in ivs] or [(None, None, None)],
        "iid long, s long, e long",
    )
    if not ivs:
        idf = idf.where("iid is not null")
    got = sorted(
        (r["pid"], r["p"], r["n_active"])
        for r in RJ.coverage_at_points(
            pdf, idf, "p", "s", "e", bucket_width=w
        ).collect()
    )
    want = sorted(
        (pid, p, sum(1 for _, s, ln in ivs if s <= p <= s + ln))
        for pid, p in pts
    )
    assert got == want
