"""Funnel fold (operators/funnel.py): hand-computed scenarios,
strict-ordering semantics, partition independence."""

import datetime as dt

import pytest

from ena_database_build_spark.operators import funnel as FUN

T0 = dt.datetime(2024, 1, 1)


def ev(uid, minute, typ):
    return (uid, T0 + dt.timedelta(minutes=minute), typ)


ROWS = [
    # u1 completes the whole funnel in order
    ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "purchase"),
    # u2: purchase BEFORE the view/click -> only 2 steps count
    ev(2, 0, "purchase"), ev(2, 1, "view"), ev(2, 2, "click"),
    # u3: click only, no view first -> 0 steps
    ev(3, 0, "click"), ev(3, 1, "purchase"),
    # u4: view then same-instant click -> strict 'then' rejects it
    ev(4, 0, "view"), ev(4, 0, "click"),
    # u5: noise events interleaved, still completes
    ev(5, 0, "error"), ev(5, 1, "view"), ev(5, 2, "signup"),
    ev(5, 3, "click"), ev(5, 4, "error"), ev(5, 5, "purchase"),
]
STEPS = ["view", "click", "purchase"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, ts timestamp, event_type string"
    ).cache()


def test_stages_hand_computed(spark, events):
    got = {r.user_id: r.stage for r in FUN.funnel_stages(events, STEPS).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 3}


def test_counts(spark, events):
    got = {
        r.funnel_step: r.n_users
        for r in FUN.funnel_counts(events, STEPS).collect()
    }
    assert got == {1: 4, 2: 3, 3: 2}


def test_partition_independent(spark, events):
    a = FUN.funnel_counts(events.repartition(1), STEPS).collect()
    b = FUN.funnel_counts(events.repartition(11), STEPS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bounded_variant_hand_computed(spark, events):
    got = {
        r.user_id: r.stage
        for r in FUN.funnel_stages_bounded(events, STEPS).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 3}


def test_bounded_variant_matches_fold_randomized(spark):
    """funnel_stages_bounded is result-identical to the collect_list
    fold on a randomized corpus (seeded), including a bot user with
    3000 step events, repeated step types, and timestamp ties."""
    import random

    rng = random.Random(41)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = [
        (uid, T0 + dt.timedelta(seconds=rng.randint(0, 500)),
         rng.choice(types))
        for uid in range(80)
        for _ in range(rng.randint(1, 12))
    ]
    # pathological bot: floods the first step type
    rows += [
        (999, T0 + dt.timedelta(seconds=i % 400), "view")
        for i in range(3000)
    ]
    rows += [(999, T0 + dt.timedelta(seconds=450), "click")]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    for steps in (
        ["view", "click", "purchase"],
        ["view", "view", "click"],   # repeated step type
        ["purchase"],
    ):
        fold = {
            r.user_id: r.stage
            for r in FUN.funnel_stages(events, steps).collect()
        }
        bounded = {
            r.user_id: r.stage
            for r in FUN.funnel_stages_bounded(events, steps).collect()
        }
        assert bounded == fold, steps


def test_funnel_counts_empty_events_report_zero(spark):
    """SUM over zero rows is NULL — the report must still say 0 users
    per step on an empty event log (r8 empty-corpus sweep finding;
    matches SQL count semantics)."""
    from ena_database_build_spark.operators import funnel as FUN

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    for bounded in (False, True):
        got = {
            r.funnel_step: r.n_users
            for r in FUN.funnel_counts(
                ev, ["view", "click", "purchase"], bounded=bounded
            ).collect()
        }
        assert got == {1: 0, 2: 0, 3: 0}, bounded
