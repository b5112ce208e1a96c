"""SCD2 dimension build (operators/scd.py)."""

from pyspark.sql import functions as F

from ena_database_build_spark.operators import scd as SCD


def changes_df(spark):
    rows = [
        # key, ts, state, seq
        (1, 10, "free", 1),
        (1, 20, "free", 2),     # no-op change: collapses into episode 1
        (1, 30, "paid", 3),
        (1, 40, "free", 4),     # back to a previous state: NEW episode
        (2, 15, "paid", 5),
        (3, 5, None, 6),        # NULL state: excluded
        (None, 7, "free", 7),   # NULL key: excluded
        (4, None, "free", 8),   # NULL ts: excluded
    ]
    return spark.createDataFrame(
        rows, "k long, ts long, state string, seq long"
    )


def build(spark):
    return SCD.scd2_build(
        changes_df(spark), key_col="k", ts_col="ts",
        state_col="state", seq_col="seq",
    )


def test_episodes_and_current_flag(spark):
    got = sorted(
        (r.k, r.state, r.eff_from, r.eff_to, r.is_current)
        for r in build(spark).collect()
    )
    assert got == [
        (1, "free", 10, 30, False),
        (1, "free", 40, None, True),
        (1, "paid", 30, 40, False),
        (2, "paid", 15, None, True),
    ]


def test_same_ts_ties_break_by_seq(spark):
    rows = [(1, 10, "a", 2), (1, 10, "b", 1)]
    df = spark.createDataFrame(rows, "k long, ts long, state string, seq long")
    got = sorted(
        (r.state, r.eff_from, r.eff_to)
        for r in SCD.scd2_build(df, "k", "ts", "state", "seq").collect()
    )
    # seq 1 ("b") comes first, closed by seq 2 ("a") at the same ts
    assert got == [("a", 10, None), ("b", 10, 10)]


def test_snapshot(spark):
    scd = build(spark)
    at25 = {(r.k, r.state) for r in SCD.scd2_snapshot(scd, 25).collect()}
    assert at25 == {(1, "free"), (2, "paid")}
    at35 = {(r.k, r.state) for r in SCD.scd2_snapshot(scd, 35).collect()}
    assert at35 == {(1, "paid"), (2, "paid")}
    # snapshot yields at most one row per key at any instant
    assert SCD.scd2_snapshot(scd, 40).groupBy("k").count().where(
        F.col("count") > 1
    ).count() == 0


def test_single_shuffle_plan(spark):
    df = changes_df(spark)
    plan = (
        SCD.scd2_build(df, "k", "ts", "state", "seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both window passes must share ONE exchange (plus whatever the
    # local-relation scan needs): no second shuffle between lag and lead
    assert plan.count("Exchange hashpartitioning") == 1


def test_latest_snapshot_compaction(spark):
    rows = [
        # key, ts, seq, op, payload
        (1, 10, 1, "upsert", "a"),
        (1, 20, 2, "upsert", "b"),
        (2, 10, 3, "upsert", "c"),
        (2, 30, 4, "delete", "c"),   # newest change is a tombstone
        (3, 10, 6, "upsert", "x"),
        (3, 10, 5, "upsert", "y"),   # same ts: higher seq (6) wins
        (None, 10, 7, "upsert", "z"),
        (4, None, 8, "upsert", "w"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts long, seq long, op string, payload string"
    )
    got = sorted(
        (r.k, r.payload)
        for r in SCD.latest_snapshot(
            df, "k", "ts", "seq", op_col="op", delete_op="delete"
        ).collect()
    )
    assert got == [(1, "b"), (3, "x")]


def test_latest_snapshot_windowgrouplimit_plan(spark):
    rows = [(i % 5, i, i, "upsert", "p") for i in range(50)]
    df = spark.createDataFrame(
        rows, "k long, ts long, seq long, op string, payload string"
    )
    plan = (
        SCD.latest_snapshot(df, "k", "ts", "seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_merge_apply_upsert_delete_passthrough(spark):
    """MERGE semantics: untouched keys pass through, the newest change
    per key wins (upsert replaces, tombstone deletes even
    snapshot-resident keys), inserts of brand-new keys land."""
    from ena_database_build_spark.operators.scd import merge_apply

    snapshot = spark.createDataFrame(
        [(1, 100, 1, "active", 5.0), (2, 100, 2, "active", 6.0),
         (3, 100, 3, "active", 7.0)],
        "user_id long, ts_us long, event_id long, state string, value double",
    )
    changes = spark.createDataFrame(
        [
            (2, 200, 10, "upgraded", 9.0),   # update key 2
            (2, 150, 11, "stale", 1.0),      # older change: loses
            (3, 200, 12, "delete", 0.0),     # tombstone key 3
            (4, 200, 13, "new", 2.0),        # insert key 4
        ],
        "user_id long, ts_us long, event_id long, state string, value double",
    )
    out = {
        r.user_id: r
        for r in merge_apply(
            snapshot, changes, "user_id", "ts_us", "event_id",
            op_col="state", delete_op="delete",
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1].state == "active" and out[1].value == 5.0
    assert out[2].state == "upgraded" and out[2].value == 9.0
    assert out[4].state == "new"


def test_merge_apply_matches_pure_python_randomized(spark):
    """Randomized differential: a snapshot plus a shuffled changelog
    with duplicate keys, timestamp ties (seq breaks them), tombstones,
    and brand-new keys must merge exactly like the dict-based
    reference."""
    import random

    from ena_database_build_spark.operators.scd import merge_apply

    rng = random.Random(31)
    snap_rows = [
        (k, 0, 0, "base", float(k)) for k in range(30)
    ]
    ch_rows = []
    eid = 1000
    for _ in range(120):
        k = rng.randint(0, 45)  # keys 30..45 are inserts
        ts = rng.randint(1, 5)
        op = rng.choice(["up", "up", "up", "delete"])
        ch_rows.append((k, ts, eid, op, rng.random()))
        eid += 1
    rng.shuffle(ch_rows)
    snapshot = spark.createDataFrame(
        snap_rows,
        "k long, ts long, seq long, op string, val double",
    )
    changes = spark.createDataFrame(
        ch_rows, "k long, ts long, seq long, op string, val double"
    )
    got = {
        r.k: (r.ts, r.seq, r.op, r.val)
        for r in merge_apply(
            snapshot, changes, "k", "ts", "seq",
            op_col="op", delete_op="delete",
        ).collect()
    }

    latest = {}
    for k, ts, seq, op, val in ch_rows:
        cur = latest.get(k)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            latest[k] = (ts, seq, op, val)
    want = {}
    for k, ts, seq, op, val in snap_rows:
        if k not in latest:
            want[k] = (ts, seq, op, val)
    for k, (ts, seq, op, val) in latest.items():
        if op != "delete":
            want[k] = (ts, seq, op, val)
    assert got == want
