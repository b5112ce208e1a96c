"""Property differential for session windows: a plain-python
gap-merge model vs Spark's native ``session_window`` AND the round-9
bucketed twin (round 9).

The native form is Spark's own operator, so this test pins the
CONTRACT the engine (and the events_sessions DuckDB oracle, and the
bucketed twin's merge rule) all assume: sessions split strictly on
``next - prev > gap`` — an event EXACTLY gap after the previous one
merges — and a session's end is ``last_event + gap``.  If a Spark
upgrade ever changed that contract, this is the test that says so in
plain terms.

Timestamps are drawn as seconds with a tiny domain multiplier so
exactly-gap adjacencies, duplicate timestamps, and bucket-boundary
straddles (bucket = 1 h, ts span up to ~8 h) all occur routinely.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ena_database_build_spark.streaming import events as STR

GAP_S = 600

user = st.integers(min_value=0, max_value=2)
# multiples of 150 s up to ~8 h: gap-exact adjacency (600 = 4 steps)
# and duplicate timestamps are both common draws
ts_s = st.integers(min_value=0, max_value=200).map(lambda i: i * 150)
rows = st.lists(st.tuples(user, ts_s), min_size=1, max_size=25)


def _model(rws) -> list[tuple]:
    by_user: dict[int, list[int]] = {}
    for u, t in rws:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > GAP_S:
                out.append((u, start, prev + GAP_S, n))
                start, n = t, 0
            n += 1
            prev = t
        out.append((u, start, prev + GAP_S, n))
    return sorted(out)


def _run(fn, df) -> list[tuple]:
    return sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in fn(df, "10 minutes").collect()
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rws=rows)
def test_session_window_and_bucketed_match_model(spark, rws):
    df = spark.createDataFrame(
        [(u, t, 1.0) for u, t in rws], "user_id long, ts_s long, value double"
    ).select(
        "user_id", F.timestamp_seconds("ts_s").alias("ts"), "value"
    )
    want = _model(rws)
    assert _run(STR.session_aggregates, df) == want
    assert _run(STR.session_aggregates_bucketed, df) == want
