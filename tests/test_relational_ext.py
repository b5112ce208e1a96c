"""Unit tests for the extended relational operators: as-of join
(operators/asof.py) and range/interval joins (operators/rangejoin.py).
Semantics are pinned with hand-computable fixtures; the catalog's
DuckDB oracles (ASOF JOIN / inequality join) pin them at data scale."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import asof as A
from ena_database_build_spark.operators import rangejoin as RJ


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 100)],
        "id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, 7.0), (10, 200, 8.0), (10, 300, 9.0), (30, 50, 1.0)],
        "user_id long, ts long, px double",
    )
    out = {
        r["id"]: r["px_right"]
        for r in A.asof_join(left, right, on="ts", by="user_id").collect()
    }
    # id=1: right row AT ts=100 matches (inclusive); id=2: latest <=205
    # is 200; id=3: user 20 has no right rows -> null
    assert out == {1: 7.0, 2: 8.0, 3: None}


def test_asof_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, 1, 100)], "id long, user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 5.0), (1, 100, 6.0)], "user_id long, ts long, px double"
    )
    out = A.asof_join(left, right, on="ts", by="user_id").collect()
    assert out[0]["px_right"] == 6.0  # max-struct winner, not partition order


def test_asof_bucketed_matches_unbucketed(spark):
    """asof_join_bucketed must agree with asof_join exactly across
    bucket widths — matches landing in the same bucket, earlier
    buckets, far-earlier buckets (empty buckets between), bucket-
    boundary timestamps, ties, keys with no right rows, and NULL
    timestamps on both sides."""
    import random

    rng = random.Random(7)
    left_rows = [
        (i, rng.choice([1, 2, 3, 9]), rng.choice([rng.randrange(0, 500), None]))
        for i in range(120)
    ]
    right_rows = [
        (rng.choice([1, 2, 3]), rng.choice([rng.randrange(0, 500), None]),
         float(i))
        for i in range(80)
    ]
    # boundary-exact events plus a duplicate-(key, ts) tie
    right_rows += [(1, 100, 999.0), (1, 100, 998.0), (2, 0, 1.0)]
    left_rows += [(900, 1, 100), (901, 2, 0), (902, 1, 99)]
    left = spark.createDataFrame(left_rows, "id long, user_id long, ts long")
    right = spark.createDataFrame(
        right_rows, "user_id long, ts long, px double"
    )
    base = sorted(
        (r["id"], r["px_right"])
        for r in A.asof_join(left, right, on="ts", by="user_id").collect()
    )
    for width in (7, 100, 1000):
        got = sorted(
            (r["id"], r["px_right"])
            for r in A.asof_join_bucketed(
                left, right, on="ts", by="user_id", bucket_width=width
            ).collect()
        )
        assert got == base, (width, got[:10], base[:10])


def test_asof_bucketed_spreads_hot_key(spark):
    """The point of the bucketed form: window partitions are
    (key, bucket), so one hot key's rows hash across partitions
    instead of serializing onto one task."""
    left = spark.createDataFrame(
        [(i, 1, i) for i in range(0, 1000, 3)], "id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, i, float(i)) for i in range(0, 1000, 10)],
        "user_id long, ts long, px double",
    )
    out = A.asof_join_bucketed(
        left, right, on="ts", by="user_id", bucket_width=50
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the event-level window must partition by (user_id, _b), never by
    # the key alone
    import re

    event_windows = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(user_id" in ln and "_m" in ln
    ]
    assert event_windows, plan
    assert all("_b" in ln for ln in event_windows), plan
    # and the answer is still right (spot check)
    got = {r["id"]: r["px_right"] for r in out.collect()}
    assert got[999] == 990.0 and got[3] == 0.0 and got[9] == 0.0


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 11), (4, 64)], "pid long, day long"
    )
    intervals = spark.createDataFrame(
        [(100, 5, 10), (200, 60, 70)], "iid long, sd long, ed long"
    )
    out = RJ.range_join(
        points, intervals, "day", "sd", "ed", bucket_width=7
    ).select("pid", "iid")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # 5 and 10 hit [5,10] (both ends inclusive), 11 misses, 64 hits the
    # interval even though it spans bucket boundaries
    assert got == [(1, 100), (2, 100), (4, 200)]


def test_interval_overlap_exactly_once(spark):
    # [0, 100] overlaps [50, 150] across many 7-wide buckets; the
    # first-overlap-bucket rule must emit the pair exactly once
    left = spark.createDataFrame([(1, 0, 100)], "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(2, 50, 150), (3, 101, 200)], "rid long, rs long, re long"
    )
    out = RJ.interval_overlap_join(left, right, "ls", "le", "rs", "re", 7)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 2)]  # (1,3) touches only at 101 > le=100


def test_sweepline_matches_bruteforce(spark):
    intervals = spark.createDataFrame(
        [(0, 10), (5, 15), (5, 15), (20, 20)], "sd long, ed long"
    )
    out = {
        r["pos"]: r["n_active"]
        for r in RJ.concurrent_intervals(intervals, "sd", "ed").collect()
    }
    # boundaries: 0(+1) 5(+2) 11(-1) 16(-2) 20(+1) 21(-1)
    assert out == {0: 1, 5: 3, 11: 2, 16: 0, 20: 1, 21: 0}


def test_sweepline_bucketed_matches_windowed(spark):
    """The two-phase bucketed prefix sum must agree with the global
    ordered window exactly — including buckets whose running sum dips
    negative relative to their own start, empty buckets, and negative
    positions (div truncates toward zero there)."""
    rows = [
        (-25, -10),
        (-12, 3),
        (0, 10),
        (5, 15),
        (5, 15),
        (20, 20),
        (95, 140),
        (100, 101),
    ]
    intervals = spark.createDataFrame(rows, "sd long, ed long")
    base = {
        (r["pos"],): r["n_active"]
        for r in RJ.concurrent_intervals(intervals, "sd", "ed").collect()
    }
    for width in (3, 7, 100):
        got = {
            (r["pos"],): r["n_active"]
            for r in RJ.concurrent_intervals(
                intervals, "sd", "ed", bucket_width=width
            ).collect()
        }
        assert got == base, (width, got, base)


def test_range_join_rejects_outer(spark):
    import pytest as _pytest

    from ena_database_build_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(5,)], "p long")
    ivs = spark.createDataFrame([(1, 10)], "s long, e long")
    with _pytest.raises(ValueError, match="inner"):
        range_join(pts, ivs, "p", "s", "e", bucket_width=8, how="left")


def test_connected_components_raises_on_non_convergence(spark):
    import pytest as _pytest

    from ena_database_build_spark.operators.cc import connected_components

    # a 8-node path has diameter 7 > max_iter=2: must raise, not
    # silently return split components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "left_id long, right_id long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_range_join_matches_bruteforce_randomized(spark):
    """Randomized differential vs an all-pairs python model, with
    NEGATIVE coordinates (negative bucket indices must still cover
    every interval bucket), spans wider than many buckets, and
    degenerate single-point intervals."""
    import random

    rng = random.Random(19)
    pts = [(i, rng.randint(-200, 200)) for i in range(60)]
    ivs = []
    for i in range(25):
        s = rng.randint(-200, 180)
        e = s if i % 5 == 0 else s + rng.randint(0, 120)
        ivs.append((1000 + i, s, e))
    points = spark.createDataFrame(pts, "pid long, pos long")
    intervals = spark.createDataFrame(ivs, "iid long, sd long, ed long")
    for width in (3, 7, 64):
        out = RJ.range_join(
            points, intervals, "pos", "sd", "ed", bucket_width=width
        )
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        want = sorted(
            (pid, iid)
            for pid, pos in pts
            for iid, s, e in ivs
            if s <= pos <= e
        )
        assert got == want, width


def test_interval_overlap_matches_bruteforce_randomized(spark):
    """Randomized differential vs an all-pairs python model for the
    emit-exactly-once overlap join, negative coordinates included."""
    import random

    rng = random.Random(23)
    lv, rv = [], []
    for i in range(30):
        s = rng.randint(-150, 150)
        lv.append((i, s, s + rng.randint(0, 90)))
    for i in range(30):
        s = rng.randint(-150, 150)
        rv.append((500 + i, s, s + rng.randint(0, 90)))
    left = spark.createDataFrame(lv, "lid long, ls long, le long")
    right = spark.createDataFrame(rv, "rid long, rs long, re long")
    for width in (5, 32):
        out = RJ.interval_overlap_join(
            left, right, "ls", "le", "rs", "re", width
        )
        pairs = [(r["lid"], r["rid"]) for r in out.collect()]
        assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
        want = sorted(
            (lid, rid)
            for lid, ls, le in lv
            for rid, rs, re in rv
            if ls <= re and rs <= le
        )
        assert sorted(pairs) == want, width


def test_coverage_at_points_matches_range_join(spark):
    """coverage_at_points == range_join + groupBy count, PLUS explicit
    zero rows for uncovered probes; randomized with negative
    positions, wide spans, duplicate probe positions, and both the
    windowed and bucketed sweep."""
    import random

    rng = random.Random(29)
    pts = [(i, rng.randint(-200, 200)) for i in range(50)]
    ivs = []
    for i in range(25):
        s = rng.randint(-200, 180)
        e = s if i % 5 == 0 else s + rng.randint(0, 120)
        ivs.append((1000 + i, s, e))
    points = spark.createDataFrame(pts, "pid long, pos long")
    intervals = spark.createDataFrame(ivs, "iid long, sd long, ed long")
    want = {
        pid: sum(1 for _, s, e in ivs if s <= pos <= e)
        for pid, pos in pts
    }
    for width in (None, 7, 64):
        out = RJ.coverage_at_points(
            points, intervals, "pos", "sd", "ed", bucket_width=width
        )
        got = {r["pid"]: r["n_active"] for r in out.collect()}
        assert got == want, width


def test_coverage_at_points_grouped(spark):
    """Per-group sweeps stay independent: the same position covered in
    one group contributes nothing to another."""
    points = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 50), ("b", 3, 5)],
        "g string, pid long, pos long",
    )
    intervals = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 6), ("b", 100, 110)],
        "g string, sd long, ed long",
    )
    out = RJ.coverage_at_points(
        points, intervals, "pos", "sd", "ed", by=["g"], bucket_width=4
    )
    got = {r["pid"]: r["n_active"] for r in out.collect()}
    assert got == {1: 2, 2: 0, 3: 0}


def test_range_join_preaggregated_intervals_parity(spark):
    """The transit_payload rewrite rule: when every downstream statistic
    is a function of the interval's (start, end), pre-aggregating
    intervals to (start, end, cnt) below the range join and weighting
    the count must equal joining the raw intervals.  Randomized
    differential with duplicate intervals (the case the multiplicity
    carries)."""
    import random

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 120)) for i in range(40)]
    ivs = []
    for _ in range(150):
        s = rng.randint(0, 110)
        ivs.append((s, s + rng.randint(0, 25)))
    ivs += ivs[:60]  # force real duplicate-key multiplicity
    points = spark.createDataFrame(pts, "pid long, pos long")
    raw = spark.createDataFrame(ivs, "sd long, ed long")

    naive = (
        RJ.range_join(points, raw, "pos", "sd", "ed", bucket_width=16)
        .groupBy("pid")
        .agg(
            F.count("*").alias("n"),
            F.max(F.col("ed") - F.col("sd")).alias("mx"),
        )
    )
    pre = raw.groupBy("sd", "ed").agg(F.count("*").alias("cnt"))
    weighted = (
        RJ.range_join(points, pre, "pos", "sd", "ed", bucket_width=16)
        .groupBy("pid")
        .agg(
            F.sum("cnt").alias("n"),
            F.max(F.col("ed") - F.col("sd")).alias("mx"),
        )
    )
    a = {r["pid"]: (r["n"], r["mx"]) for r in naive.collect()}
    b = {r["pid"]: (r["n"], r["mx"]) for r in weighted.collect()}
    assert a == b


def test_bucketed_sweep_single_evaluation_of_inputs(spark):
    """r7 verdict #5: with bucket_width set AND the probe mark carried,
    the offsets branch must read the windowed frame through a
    ReusedExchange instead of re-executing the whole delta union.  The
    mark reference rides the offsets max_by ordering struct (a dummy
    aggregate gets pruned); this pins that the final AQE plan reuses
    the _bkt exchange — i.e. each input is evaluated exactly once."""
    points = spark.createDataFrame([(i,) for i in range(40)], "pos long")
    intervals = spark.createDataFrame(
        [(i, i + 9) for i in range(0, 60, 3)], "sd long, ed long"
    )
    out = RJ.coverage_at_positions(
        points, intervals, "pos", "sd", "ed", bucket_width=8
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in final, final
    # the reuse must be of the _bkt-partitioned exchange (the top of
    # the shared sweep subtree), not some smaller fragment
    import re

    m = re.search(r"ReusedExchange \[[^\]]*\], Exchange hashpartitioning\(_bkt", final)
    assert m, final


def test_coverage_null_handling_matches_inner_join_semantics(spark):
    """NULL probe positions are excluded from coverage_at_positions
    (no pos=NULL row) and come back as n_active=0 from
    coverage_at_points; intervals with a NULL endpoint contain
    nothing (r7 ADVICE)."""
    points = spark.createDataFrame(
        [(1, 5), (2, None), (3, 100)], "pid long, pos long"
    )
    intervals = spark.createDataFrame(
        [(0, 10), (None, 10), (4, None)], "sd long, ed long"
    )
    pos_rows = RJ.coverage_at_positions(
        points, intervals, "pos", "sd", "ed"
    ).collect()
    assert {r["pos"] for r in pos_rows} == {5, 100}
    got = {
        r["pid"]: r["n_active"]
        for r in RJ.coverage_at_points(
            points, intervals, "pos", "sd", "ed"
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0}


def test_sweep_forms_reject_fractional_position_columns(spark):
    """The long cast in the sweep forms would TRUNCATE fractional
    positions (0.7 counted at 0), silently diverging from range_join's
    native-value containment — so non-integral position columns raise
    (r7 ADVICE).  range_join itself stays fractional-safe: truncation
    only picks the bucket and the residual filter compares natives."""
    import pytest

    pts_f = spark.createDataFrame([(0.7,)], "pos double")
    ivs = spark.createDataFrame([(0, 10)], "sd long, ed long")
    ivs_f = spark.createDataFrame([(0.5, 0.6)], "sd double, ed double")
    pts = spark.createDataFrame([(1,)], "pos long")
    with pytest.raises(ValueError, match="integral"):
        RJ.coverage_at_positions(pts_f, ivs, "pos", "sd", "ed")
    with pytest.raises(ValueError, match="integral"):
        RJ.coverage_at_points(pts, ivs_f, "pos", "sd", "ed")
    with pytest.raises(ValueError, match="integral"):
        RJ.concurrent_intervals(ivs_f, "sd", "ed")
    # range_join on fractional columns: exact (residual filter native)
    got = RJ.range_join(
        spark.createDataFrame([(0.55,), (0.7,)], "p double"),
        ivs_f,
        "p",
        "sd",
        "ed",
        bucket_width=1,
    ).collect()
    assert [(r["p"]) for r in got] == [0.55]
